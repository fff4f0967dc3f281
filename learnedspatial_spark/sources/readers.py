"""Readers for the reference's workload file formats.

The reference loads query workloads from CSV/WKT files (include/utils/
IO.hpp); these readers accept the same formats so a user of the reference
can point their existing files at this engine:

* rectangles CSV ``from_x,from_y,to_x,to_y``  (IO.hpp:70-103)
* distance CSV ``lat,long,distance_meters``   (IO.hpp:105-138, README.md:53)
* polygon CSV with a WKT field — field 0 for OSM/"countries" files else
  field 2, commas inside WKT escaped ``\\,`` (IO.hpp:140-215); vertices are
  read as ``lon lat`` pairs and stored x:=lat, y:=lon — the reference's
  axis quirk (IO.hpp:176-178) reproduced deliberately.

Query files are small (driver-side lists feeding the planners); the
readers parse driver-side and return the same plain tuples the workload
generators produce.
"""

from __future__ import annotations


def read_rectangles_csv(path: str) -> list[tuple]:
    out = []
    with open(path) as f:
        for qid, line in enumerate(s for s in (ln.strip() for ln in f) if s):
            fx, fy, tx, ty = (float(v) for v in line.split(",")[:4])
            out.append((qid, fx, fy, tx, ty))
    return out


def read_distance_csv(path: str) -> list[tuple]:
    out = []
    with open(path) as f:
        for qid, line in enumerate(s for s in (ln.strip() for ln in f) if s):
            lat, lon, dist = (float(v) for v in line.split(",")[:3])
            out.append((qid, lat, lon, dist))
    return out


def _split_escaped(line: str) -> list[str]:
    """CSV split honoring the reference's escaped commas ``\\,``
    (boost escaped_list_separator, IO.hpp:140-154)."""
    fields, cur, esc = [], [], False
    for ch in line:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == ",":
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur))
    return fields


def parse_wkt_polygon(wkt: str) -> tuple[list[float], list[float]]:
    """``POLYGON((lon lat, lon lat, ...))`` -> (vx=lats, vy=lons), the
    reference's x:=latitude convention (read_wkt, IO.hpp:156-189)."""
    body = wkt.strip()
    start = body.index("((") + 2
    end = body.rindex("))")
    vx, vy = [], []
    for pair in body[start:end].split(","):
        parts = pair.split()
        lon, lat = float(parts[0]), float(parts[1])
        vx.append(lat)
        vy.append(lon)
    if vx and (vx[0] != vx[-1] or vy[0] != vy[-1]):
        vx.append(vx[0])
        vy.append(vy[0])
    return vx, vy


def read_wkt_polygons(path: str, osm_mode: bool | None = None) -> dict[int, tuple[list[float], list[float]]]:
    """Polygon CSV -> {polygon_id: (vx, vy)}.  ``osm_mode`` (WKT in field 0)
    defaults to the reference's filename heuristic: 'countries' in the name
    (parse_wkt_polygons, IO.hpp:191-215)."""
    if osm_mode is None:
        osm_mode = "countries" in path
    field = 0 if osm_mode else 2
    polys = {}
    with open(path) as f:
        for gid, line in enumerate(s for s in (ln.strip() for ln in f) if s):
            fields = _split_escaped(line)
            polys[gid] = parse_wkt_polygon(fields[field])
    return polys
