"""Tier-1: partitioner routing kernels — assignment/pruning invariants.

Invariant under test (the reference's correctness backbone): for every
scheme, every point inside a query rectangle lives in a cell returned by
``cells_for_rect`` (no pruning loss), and assignment is a total function.
"""

import numpy as np
import pytest

from learnedspatial_spark.operators.partitioning import (
    AdaptiveGridPartitioner,
    FixedGridPartitioner,
    KdTreePartitioner,
    MortonPartitioner,
    Partitioner,
    QuadtreePartitioner,
)

SEED = 8128


def _points(n=20000, dup=False):
    rng = np.random.default_rng(SEED)
    x = rng.uniform(-90, 90, size=n)
    y = rng.uniform(-180, 180, size=n)
    if dup:
        x = np.round(x * 3) / 3
        y = np.round(y * 3) / 3
    return x, y


def _build(scheme, x, y):
    if scheme == "fixed_grid":
        return FixedGridPartitioner.build(x.min(), x.max(), x.shape[0], 500)
    if scheme == "adaptive_grid":
        return AdaptiveGridPartitioner.build_from_sorted_x(np.sort(x), 500)
    if scheme == "kd_tree":
        return KdTreePartitioner.build_from_points(x, y, 500)
    if scheme == "quadtree":
        return QuadtreePartitioner.build_from_points(x, y, 500)
    if scheme == "morton":
        return MortonPartitioner(level=5)
    raise ValueError(scheme)


SCHEMES = ["fixed_grid", "adaptive_grid", "kd_tree", "quadtree", "morton"]


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("dup", [False, True])
def test_pruning_never_loses_points(scheme, dup):
    x, y = _points(dup=dup)
    p = _build(scheme, x, y)
    cells = p.assign_np(x, y)
    assert cells.min() >= 0
    rng = np.random.default_rng(SEED + 1)
    for _ in range(50):
        cx, cy = rng.uniform(-90, 90), rng.uniform(-180, 180)
        w, h = rng.uniform(0.01, 40), rng.uniform(0.01, 80)
        fx, fy, tx, ty = cx - w, cy - h, cx + w, cy + h
        cand = set(int(c) for c in p.cells_for_rect(fx, fy, tx, ty))
        inside = (x >= fx) & (x <= tx) & (y >= fy) & (y <= ty)
        assert set(np.unique(cells[inside]).tolist()) <= cand


@pytest.mark.parametrize("scheme", SCHEMES)
def test_spec_roundtrip(scheme):
    x, y = _points(n=3000)
    p = _build(scheme, x, y)
    q = Partitioner.from_spec(p.to_spec())
    np.testing.assert_array_equal(p.assign_np(x, y), q.assign_np(x, y))


def test_fixed_grid_formula_matches_reference():
    """cell = min(floor((x - xmin)/step), n-1) (FixedGrid.hpp:11-29)."""
    p = FixedGridPartitioner(xmin=0.0, xmax=10.0, n_cells=5)
    x = np.array([0.0, 1.9999, 2.0, 9.999, 10.0, 10.5])
    np.testing.assert_array_equal(p.assign_np(x), [0, 0, 1, 4, 4, 4])


def test_adaptive_grid_balance():
    """Equi-depth runs balanced within 1 (AdaptiveGrid.hpp:58) for distinct x."""
    rng = np.random.default_rng(SEED)
    x = rng.permutation(np.arange(10007, dtype=np.float64))
    p = AdaptiveGridPartitioner.build_from_sorted_x(np.sort(x), 100)
    cells = p.assign_np(x)
    counts = np.bincount(cells)
    assert counts.max() - counts.min() <= 1


def test_morton_hierarchy():
    p = MortonPartitioner(level=6)
    x, y = _points(n=5000)
    c6 = p.assign_np(x, y)
    p5 = MortonPartitioner(level=5)
    np.testing.assert_array_equal(p.parent(c6, 1), p5.assign_np(x, y))


def test_quadtree_leaf_size():
    x, y = _points(n=8000)
    p = QuadtreePartitioner.build_from_points(x, y, 500)
    cells = p.assign_np(x, y)
    assert np.bincount(cells).max() <= 500


def test_global_rank_matches_single_task_order(spark):
    """operators/ranking.with_global_rank must equal the rank a bare
    (single-task) sort would assign — heavy duplicate leading keys
    included (the bucketing is value-based, so ties never straddle
    buckets)."""
    import numpy as np
    from learnedspatial_spark.operators.ranking import with_global_rank
    rng = np.random.default_rng(77)
    n = 20000
    # few distinct x values -> massive ties; y/pid break them
    xs = rng.choice(np.linspace(-5, 5, 7), size=n)
    ys = rng.uniform(-100, 100, size=n)
    rows = [(int(i), float(xs[i]), float(ys[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "pid bigint, x double, y double").repartition(8)
    ranked = {r["pid"]: r["rank_x"]
              for r in with_global_rank(df, ["x", "y", "pid"], n_buckets=16).collect()}
    order = sorted(rows, key=lambda t: (t[1], t[2], t[0]))
    for want_rank, (pid, _, _) in enumerate(order, start=1):
        assert ranked[pid] == want_rank


def test_global_rank_nan_sorts_last(spark):
    """Spark orders NaN after +Infinity; the bucketed rank must agree."""
    import math

    import numpy as np
    from learnedspatial_spark.operators.ranking import with_global_rank
    rng = np.random.default_rng(5)
    rows = [(int(i), float(v), float(rng.uniform(-1, 1)))
            for i, v in enumerate(rng.uniform(-10, 10, size=500))]
    rows += [(1000 + i, math.nan, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "pid bigint, x double, y double").repartition(6)
    got = {r["pid"]: r["rank_x"]
           for r in with_global_rank(df, ["x", "y", "pid"], n_buckets=8).collect()}
    finite = sorted((r for r in rows if not math.isnan(r[1])),
                    key=lambda t: (t[1], t[2], t[0]))
    nans = sorted((r for r in rows if math.isnan(r[1])), key=lambda t: (t[2], t[0]))
    for want, (pid, _, _) in enumerate(finite + nans, start=1):
        assert got[pid] == want, (pid, got[pid], want)
