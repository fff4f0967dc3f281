"""Deterministic (seeded) query-workload generators — FIXTURES.md §3-§7.

Every generator returns plain Python lists of tuples so the same literals
feed (a) Spark DataFrames and (b) inline VALUES clauses in the DuckDB
oracle SQL.  Floats are emitted with ``repr`` (shortest round-trip), which
both engines parse back to the identical double.

Reference workload formats: rectangles CSV (include/utils/IO.hpp:70-103),
distance CSV lat,lon,meters (IO.hpp:105-138), WKT polygons (IO.hpp:140-215).
"""

from __future__ import annotations

import math

import numpy as np

SEED = 8128  # the reference's own test seed (include/ds/radix_spline/example.cpp:87)

LAT_SPAN = 180.0
LON_SPAN = 360.0


def rectangles(n_per_tier: int = 40, seed: int = SEED) -> list[tuple]:
    """(query_id, from_x, from_y, to_x, to_y) at the reference's three
    selectivity tiers (README.md:50-55 workload axes) plus edge cases:
    degenerate (from==to), fully-outside, and the all-covering rectangle
    (exercises the contained-cell shortcut, Spline.hpp:67-75)."""
    rng = np.random.default_rng(seed)
    out: list[tuple] = []
    qid = 0
    # selectivity ~ area fraction; tiers ~1e-5%, 0.01%, 1%
    for frac in (1e-7, 1e-4, 1e-2):
        w_lat = LAT_SPAN * math.sqrt(frac)
        w_lon = LON_SPAN * math.sqrt(frac)
        for _ in range(n_per_tier):
            cx = float(rng.uniform(-90, 90))
            cy = float(rng.uniform(-180, 180))
            out.append((qid, cx - w_lat / 2, cy - w_lon / 2, cx + w_lat / 2, cy + w_lon / 2))
            qid += 1
    # edge cases
    out.append((qid, 10.0, 10.0, 10.0, 10.0)); qid += 1          # degenerate
    out.append((qid, 200.0, 300.0, 210.0, 310.0)); qid += 1      # fully outside
    out.append((qid, -90.0, -180.0, 90.0, 180.0)); qid += 1      # covers all
    out.append((qid, 5.0, -180.0, -5.0, 180.0)); qid += 1        # inverted (empty)
    return out


def distance_queries(n: int = 60, seed: int = SEED + 1) -> list[tuple]:
    """(query_id, x_deg, y_deg, radius_m); radii 100 m .. 500 km log-spaced,
    plus near-pole and antimeridian centers (Matuschek bbox edge cases,
    include/utils/GeographyUtils.hpp:108-152)."""
    rng = np.random.default_rng(seed)
    out = []
    for qid in range(n):
        lat = float(rng.uniform(-85, 85))
        lon = float(rng.uniform(-180, 180))
        r = float(10 ** rng.uniform(2, 5.7))
        out.append((qid, lat, lon, r))
    out.append((n, 89.9, 0.0, 100000.0))
    out.append((n + 1, -89.9, 10.0, 250000.0))
    out.append((n + 2, 0.0, 179.95, 50000.0))
    return out


def point_queries(x: np.ndarray, y: np.ndarray, n_hits: int = 60, n_misses: int = 20, seed: int = SEED + 2) -> list[tuple]:
    """(query_id, x, y): exact copies of corpus points (hits) + misses
    (FIXTURES.md §6)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(x.shape[0], size=min(n_hits, x.shape[0]), replace=False)
    out = [(int(q), float(x[i]), float(y[i])) for q, i in enumerate(idx)]
    base = len(out)
    for j in range(n_misses):
        out.append((base + j, float(rng.uniform(-90, 90)) + 1e-9, float(rng.uniform(-180, 180)) + 1e-9))
    return out


def polygons(n: int = 24, seed: int = SEED + 3) -> dict[int, tuple[list[float], list[float]]]:
    """polygon_id -> (vx, vy) closed rings (vx = latitudes).  Star-shaped
    (convex + concave) rings of 5..40 vertices around random centers, FIXTURES.md §5.
    Includes horizontal edges (y1 == y2 skip rule, include/queries/join.h:31)."""
    rng = np.random.default_rng(seed)
    polys: dict[int, tuple[list[float], list[float]]] = {}
    for gid in range(n):
        clat = float(rng.uniform(-60, 60))
        clon = float(rng.uniform(-150, 150))
        k = int(rng.integers(5, 40))
        theta = np.sort(rng.uniform(0, 2 * math.pi, size=k))
        r = rng.uniform(0.5, 1.0, size=k) * float(rng.uniform(2.0, 15.0))
        vx = (clat + r * np.sin(theta))
        vy = (clon + r * np.cos(theta))
        if gid % 5 == 0 and k >= 6:  # inject a horizontal edge (same y=lon)
            vy[1] = vy[2]
        vx = np.clip(vx, -89.9, 89.9)
        vy = np.clip(vy, -179.9, 179.9)
        vx = np.append(vx, vx[0])  # close the ring
        vy = np.append(vy, vy[0])
        polys[gid] = ([float(v) for v in vx], [float(v) for v in vy])
    return polys


def knn_queries(n: int = 30, seed: int = SEED + 4) -> list[tuple]:
    """(query_id, x, y, k) with k in {1, 10, 100} (FIXTURES.md §7)."""
    rng = np.random.default_rng(seed)
    ks = [1, 10, 100]
    return [
        (qid, float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180)), ks[qid % 3])
        for qid in range(n)
    ]


def values_clause(rows: list[tuple], columns: list[str]) -> str:
    """Render rows as an inline SQL relation: (VALUES (...),(...)) t(cols).
    Floats via repr -> exact round-trip in both engines."""
    def lit(v):
        if isinstance(v, float):
            return f"cast('{v!r}' as double)"
        return str(v)
    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({', '.join(columns)})"
