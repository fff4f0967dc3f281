"""Reference file-format readers (IO.hpp semantics)."""

from learnedspatial_spark.sources import readers


def test_rectangles_and_distance_csv(tmp_path):
    p = tmp_path / "rects.csv"
    p.write_text("1.5,-2.5,3.5,4.5\n-1.0,-1.0,1.0,1.0\n")
    assert readers.read_rectangles_csv(str(p)) == [
        (0, 1.5, -2.5, 3.5, 4.5), (1, -1.0, -1.0, 1.0, 1.0)]
    d = tmp_path / "dist.csv"
    d.write_text("48.85,2.35,10000\n")
    assert readers.read_distance_csv(str(d)) == [(0, 48.85, 2.35, 10000.0)]


def test_wkt_axis_quirk_and_escaped_commas(tmp_path):
    # WKT pairs are "lon lat"; reference stores x:=lat (IO.hpp:176-178)
    vx, vy = readers.parse_wkt_polygon("POLYGON((10 50, 11 51, 12 50, 10 50))")
    assert vx == [50.0, 51.0, 50.0, 50.0]  # latitudes
    assert vy == [10.0, 11.0, 12.0, 10.0]  # longitudes
    # auto-close open rings
    vx2, vy2 = readers.parse_wkt_polygon("POLYGON((0 0, 1 1, 2 0))")
    assert vx2[-1] == vx2[0] and vy2[-1] == vy2[0]
    # countries-style: WKT field 0 with escaped commas; else field 2
    f = tmp_path / "countries.csv"
    f.write_text("POLYGON((10 50\\, 11 51\\, 12 50\\, 10 50)),France\n")
    polys = readers.read_wkt_polygons(str(f))
    assert polys[0][0] == [50.0, 51.0, 50.0, 50.0]
    g = tmp_path / "other.csv"
    g.write_text("a,b,POLYGON((1 2\\, 3 4\\, 5 2\\, 1 2)),x\n")
    polys2 = readers.read_wkt_polygons(str(g))
    assert polys2[0][1] == [1.0, 3.0, 5.0, 1.0]


def test_readers_feed_engine_pip(spark, sf_dir, tmp_path):
    """File-loaded polygons run through the PIP join like generated ones."""
    import numpy as np

    from learnedspatial_spark.engine import SpatialEngine
    from oracle import oracle as orc
    from learnedspatial_spark.sources import points as points_src

    f = tmp_path / "polys.csv"
    f.write_text(
        "a,b,POLYGON((10 -20\\, 30 -20\\, 30 20\\, 10 20\\, 10 -20)),x\n"
        "a,b,POLYGON((-50 40\\, -20 40\\, -20 60\\, -50 60\\, -50 40)),x\n")
    polys = readers.read_wkt_polygons(str(f))
    eng = SpatialEngine(spark, sf_dir, scheme="fixed_grid")
    got = {r["polygon_id"]: r["cnt"] for r in eng.pip(polys).collect()}
    pid, x, y = points_src.points_np(sf_dir)
    want = orc.pip_counts(x, y, {g: (np.asarray(vx), np.asarray(vy)) for g, (vx, vy) in polys.items()})
    assert got == want
