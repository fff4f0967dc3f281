"""distance_join_pairs vs an O(n^2) NumPy brute-force oracle.

The adversarial inputs are the ones the blocking proof worries about:
points piled on the antimeridian seam (wrap adjacency, including the
merged fractional last cell), points near the poles (collapsed
single-cell bands), and radii large enough that the longitude bound
saturates.  Exact set equality, every time — the blocking is allowed to
over-generate candidates, never to drop a pair.
"""

import numpy as np
import pytest

from learnedspatial_spark.operators.distjoin import band_deg, distance_join_pairs
from learnedspatial_spark.operators.probes import haversine_m


def _corpus(seed: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    k = n // 4
    lat = np.concatenate([
        rng.uniform(-90.0, 90.0, n - 3 * k),
        np.clip(rng.normal(89.3, 0.5, k), -90.0, 89.999),   # north polar band
        np.clip(rng.normal(-89.3, 0.5, k), -89.999, 90.0),  # south polar band
        rng.uniform(-30.0, 30.0, k),                        # dense equator
    ])
    lon = np.concatenate([
        rng.uniform(-180.0, 180.0, n - 2 * k),
        179.0 + rng.uniform(0.0, 1.0, k),                   # seam east side
        -180.0 + rng.uniform(0.0, 1.0, k),                  # seam west side
    ])
    assert lat.shape == lon.shape == (n,)
    return lat, np.where(lon >= 180.0, lon - 360.0, lon)


def _brute_pairs(lat: np.ndarray, lon: np.ndarray, radius_m: float) -> set[tuple[int, int]]:
    la = (lat / 180.0) * np.pi
    lo = (lon / 180.0) * np.pi
    n = lat.shape[0]
    out = set()
    for i in range(n - 1):
        d = haversine_m(la[i], lo[i], la[i + 1:], lo[i + 1:])
        for j in np.flatnonzero(d <= radius_m):
            out.add((i, int(i + 1 + j)))
    return out


@pytest.mark.parametrize("seed,radius_m", [
    (7, 100_000.0),      # small radius: many bands, narrow cells
    (7, 2_000_000.0),    # huge radius: polar bands collapse, wide cells
    (11, 400_000.0),
])
def test_distance_join_matches_brute_force(spark, seed, radius_m):
    lat, lon = _corpus(seed, 600)
    df = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lon[i])) for i in range(len(lat))],
        "pid long, x double, y double",
    )
    rows = distance_join_pairs(df, radius_m).collect()
    got = [(r.l_pid, r.r_pid) for r in rows]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == _brute_pairs(lat, lon, radius_m)


def test_seam_and_pole_pairs_survive_blocking(spark):
    # hand-built adversarial pairs: across the antimeridian at several
    # latitudes (incl. inside the merged last lon cell), and across the
    # pole-adjacent collapsed bands.
    pts = [
        (0, 0.0, 179.95), (1, 0.0, -179.95),          # seam, equator
        (2, 60.0, 179.9), (3, 60.2, -179.9),          # seam, high lat
        (4, 89.9, 10.0), (5, 89.9, -170.0),           # both in a polar band
        (6, -89.95, 55.0), (7, -89.95, -125.0),       # antipodal lons at S pole
        (8, 45.0, 0.0), (9, 45.0, 2.0),               # plain mid-lat control
    ]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    lat = np.array([p[1] for p in pts])
    lon = np.array([p[2] for p in pts])
    for radius_m in (30_000.0, 200_000.0):
        got = {(r.l_pid, r.r_pid) for r in distance_join_pairs(df, radius_m).collect()}
        assert got == _brute_pairs(lat, lon, radius_m)


def test_boundary_distance_exactly_radius_is_kept(spark):
    # a pair at exactly the band-height latitude separation (the
    # boundary the SAFETY inflation exists for)
    r = 50_000.0
    dlat = band_deg(r) / (1.0 + 2.0**-10)  # un-inflated exact bound
    df = spark.createDataFrame(
        [(0, 10.0, 20.0), (1, 10.0 + dlat, 20.0)], "pid long, x double, y double")
    la = (np.array([10.0, 10.0 + dlat]) / 180.0) * np.pi
    lo = (np.array([20.0, 20.0]) / 180.0) * np.pi
    d = float(haversine_m(la[0], lo[0], la[1], lo[1]))
    got = {(r_.l_pid, r_.r_pid) for r_ in distance_join_pairs(df, r).collect()}
    assert got == ({(0, 1)} if d <= r else set())
    assert abs(d - r) < 1.0  # the fixture really does sit on the boundary
