"""Pure-NumPy single-node oracle for all engine query semantics.

Conventions (reference include/ds/geography/DataTypes.hpp:13-15):
``x`` = latitude, ``y`` = longitude.  All predicates inclusive
(DataTypes.hpp:54-56).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6378137.0  # include/queries/distance.h:8


def range_count(x, y, fx, fy, tx, ty) -> int:
    """Inclusive rectangle count (reference full-scan oracle,
    src/main.cpp:74-99 / FullScan.hpp:21-25)."""
    m = (x >= fx) & (x <= tx) & (y >= fy) & (y <= ty)
    return int(np.count_nonzero(m))


def range_materialize(x, y, fx, fy, tx, ty) -> np.ndarray:
    """Indices of points inside the inclusive rectangle."""
    return np.flatnonzero((x >= fx) & (x <= tx) & (y >= fy) & (y <= ty))


def point_lookup(x, y, pid, qx, qy):
    """Fetch-one semantics (src/main.cpp:416-450 early-outs at the first
    match): distributed engines have no 'first', so the engine defines the
    canonical row as min(pid) among exact matches; None if absent
    (SURVEY.md §7.3(e))."""
    m = (x == qx) & (y == qy)
    if not m.any():
        return None
    return int(pid[m].min())


def haversine_m(lat1r, lon1r, lat2r, lon2r):
    """HaversineD (include/queries/distance.h:25-30): meters, radian
    inputs, R=6378137."""
    u = np.sin((lat2r - lat1r) / 2.0)
    v = np.sin((lon2r - lon1r) / 2.0)
    s = np.sqrt(u * u + np.cos(lat1r) * np.cos(lat2r) * v * v)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.clip(s, 0.0, 1.0))


def distance_count(xr, yr, qxr, qyr, radius_m) -> int:
    """Radius-query count: inclusive refine HaversineD <= r over radian
    coordinates (include/queries/distance.h:36-45)."""
    return int(np.count_nonzero(haversine_m(qxr, qyr, xr, yr) <= radius_m))


def ray_cast_inside(px, py, vx, vy) -> np.ndarray:
    """Vectorized point-in-polygon ray cast, exact reference crossing rule
    (include/queries/join.h:30-35):

    for each edge (p1,p2):
      if p.y > min(y1,y2) and p.y <= max(y1,y2) and p.x <= max(x1,x2)
         and y1 != y2:
        xinters = (p.y - y1)*(x2 - x1)/(y2 - y1) + x1
        if x1 == x2 or p.x <= xinters: crossing
    inside = odd #crossings (join.h:37)

    ``vx, vy``: polygon vertex arrays (closed ring: consecutive vertices
    form edges, last->first implied closed in the input per
    DataTypes.hpp:92-105).  Returns bool mask over points.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1 = np.asarray(vx[:-1], dtype=np.float64)[None, :], np.asarray(vy[:-1], dtype=np.float64)[None, :]
    x2, y2 = np.asarray(vx[1:], dtype=np.float64)[None, :], np.asarray(vy[1:], dtype=np.float64)[None, :]
    cond = (py > np.minimum(y1, y2)) & (py <= np.maximum(y1, y2)) & (px <= np.maximum(x1, x2)) & (y1 != y2)
    with np.errstate(divide="ignore", invalid="ignore"):
        xinters = (py - y1) * (x2 - x1) / (y2 - y1) + x1
    crossing = cond & ((x1 == x2) | (px <= xinters))
    return (crossing.sum(axis=1) % 2).astype(bool)


def pip_counts(px, py, polygons) -> dict[int, int]:
    """Per-polygon contained-point counts (src/main.cpp:464-484).
    ``polygons``: dict polygon_id -> (vx, vy) closed-ring vertex arrays."""
    return {pid: int(ray_cast_inside(px, py, vx, vy).sum()) for pid, (vx, vy) in polygons.items()}


def pip_pairs(px, py, pids, polygons) -> list[tuple[int, int]]:
    """(polygon_id, point_id) containment pairs, sorted."""
    out = []
    for gid, (vx, vy) in polygons.items():
        inside = ray_cast_inside(px, py, vx, vy)
        out.extend((gid, int(p)) for p in pids[inside])
    return sorted(out)


def knn_euclidean(x, y, pid, qx, qy, k) -> list[int]:
    """kNN — new engine surface (the reference implements none,
    SURVEY.md §2.4): squared Euclidean distance in degree space, ties
    broken by (d2, x, y, pid); returns the k point ids in rank order."""
    d2 = (x - qx) ** 2 + (y - qy) ** 2
    order = np.lexsort((pid, y, x, d2))
    return [int(p) for p in pid[order[:k]]]
