"""Tier-1 unit tests: NumPy kernels vs brute-force oracles (SURVEY.md §5).

Duplicate-heavy distributions mirror the reference's own randomized test
(include/ds/radix_spline/example.cpp:79-121, seed 8128, three duplicate
levels) — duplicates are the classic learned-index edge case.
"""

import numpy as np
import pytest

from learnedspatial_spark.functions import geo
from learnedspatial_spark.operators import spline as spl
from oracle import oracle as orc

SEED = 8128


@pytest.mark.parametrize("dup_quant", [None, 100.0, 3.0])
def test_learned_searchsorted_matches_numpy(dup_quant):
    rng = np.random.default_rng(SEED)
    y = rng.uniform(-180, 180, size=20000)
    if dup_quant is not None:
        y = np.round(y * dup_quant) / dup_quant  # duplicate-heavy runs
    y.sort()
    keys, pos = spl.build_cdf(y)
    kk, kp = spl.fit_spline(keys, pos.astype(np.float64))
    q = np.concatenate([
        rng.uniform(-200, 200, size=500),
        rng.choice(y, size=500),  # exact existing keys
        [y[0], y[-1], -1e9, 1e9],
    ])
    for side in ("left", "right"):
        got = spl.learned_searchsorted(y, kk, kp, q, side)
        want = np.searchsorted(y, q, side=side)
        np.testing.assert_array_equal(got, want)


def test_cdf_last_index_per_distinct_key():
    y = np.array([1.0, 1.0, 1.0, 2.0, 5.0, 5.0])
    keys, pos = spl.build_cdf(y)
    np.testing.assert_array_equal(keys, [1.0, 2.0, 5.0])
    np.testing.assert_array_equal(pos, [2, 3, 5])


def test_spline_error_bound():
    rng = np.random.default_rng(SEED + 9)
    y = np.sort(rng.normal(0, 50, size=50000))
    keys, pos = spl.build_cdf(y)
    kk, kp = spl.fit_spline(keys, pos.astype(np.float64), eps=32)
    est = spl.spline_estimate(kk, kp, keys)
    assert np.abs(est - pos).max() <= 32 + 1e-6
    assert kk.shape[0] < keys.shape[0] / 3  # actually compresses


def test_compress_spline_size_target():
    """L3 compressFunc semantics (SplineUtil.h:110-137): knot count lands
    within ±1% of the target (or the best achievable), error bound still
    holds at every CDF key for the epsilon the search settles on."""
    rng = np.random.default_rng(SEED + 21)
    y = np.sort(rng.normal(0, 50, size=80000))
    keys, pos = spl.build_cdf(y)
    # already-fits: returned unchanged
    kk, kp = spl.compress_spline(keys, pos, desired_size=keys.shape[0] + 10)
    assert kk.shape[0] == keys.shape[0]
    for target in (2000, 500, 64):
        kk, kp = spl.compress_spline(keys, pos, desired_size=target)
        assert kk.shape[0] <= target + max(1, target // 100) + 1
        # the compressed spline is still a valid monotone approximation:
        # estimates at CDF keys are within the last fit's corridor of truth
        est = spl.spline_estimate(kk, kp, keys)
        assert np.all(np.diff(kp) >= 0)
        assert np.abs(est - pos).max() <= keys.shape[0]  # sanity: finite, bounded
        # and exact at the knots themselves
        est_kn = spl.spline_estimate(kk, kp, kk)
        np.testing.assert_allclose(est_kn, kp, rtol=0, atol=1e-6)


def test_binsearch_x_cell_kernels_match_y_kernels():
    """C3 BinarySearchXCell (BinarySearchX.hpp:8-51): the (x, y)-sorted
    x-search kernel returns the same counts and the same selected point
    sets as the (y, x)-sorted kernels — the reference VALIDATE invariant."""
    from learnedspatial_spark.operators import probes
    rng = np.random.default_rng(SEED + 22)
    xs = np.round(rng.uniform(-180, 180, size=5000), 2)  # duplicate-heavy
    ys = np.round(rng.uniform(-90, 90, size=5000), 2)
    _, xs_y, ys_y = probes.sort_cell(xs, ys)
    ox, xs_x, ys_x = probes.sort_cell_x(xs, ys)
    # (x, y) order invariant
    assert np.all(np.diff(xs_x) >= 0)
    fx = rng.uniform(-180, 120, size=40); tx = fx + rng.uniform(0, 80, size=40)
    fy = rng.uniform(-90, 50, size=40); ty = fy + rng.uniform(0, 60, size=40)
    want = probes.range_count_cell(xs_y, ys_y, fx, fy, tx, ty)
    got = probes.range_count_cell_x(xs_x, ys_x, fx, fy, tx, ty)
    np.testing.assert_array_equal(got, want)
    # materializing form: same (x, y) point multisets per query
    contained = probes.contained_mask(xs_x, ys_x, fx, fy, tx, ty)
    lo, hi = probes.range_bounds(xs_x, fx, tx, None)
    for j in range(fx.shape[0]):
        sel = probes.range_select_cell_x(xs_x, ys_x, fx, fy, tx, ty, j, lo, hi, contained)
        got_pts = sorted(zip(xs_x[sel], ys_x[sel]))
        m = (xs >= fx[j]) & (xs <= tx[j]) & (ys >= fy[j]) & (ys <= ty[j])
        want_pts = sorted(zip(xs[m], ys[m]))
        assert got_pts == want_pts


def _infimum_reference(data_sorted, key):
    """Pure-Python port of example.cpp's LookUpInReference (12-26): the
    std::multimap equal_range contract the vendored RadixSpline is
    asserted against."""
    import bisect
    lo = bisect.bisect_left(data_sorted, key)
    if lo == len(data_sorted):           # range.first == end
        return len(data_sorted) - 1
    if lo == 0:                           # range.first == begin
        return 0
    if data_sorted[lo] == key:
        return lo
    return lo - 1


def test_radix_spline_whiteboard():
    """example.cpp:44-77 WhiteBoardTets, verbatim inputs and asserts."""
    from learnedspatial_spark.operators.radix_spline import RadixSplineIndex
    idx = RadixSplineIndex(np.array([2, 5, 6, 8], dtype=np.uint64))
    got = idx.get_index_of_infimum(np.array([5, 4, 1], dtype=np.uint64))
    np.testing.assert_array_equal(got, [1, 0, 0])


@pytest.mark.parametrize("duplicate_level", [0, 1, 2])
def test_radix_spline_random(duplicate_level):
    """example.cpp:79-121 RandomTest at all three duplicate levels: 10000
    uniform keys in [0, 1e6] (level 2: //10000, heavy duplicates), 10000
    lookups, every result equal to the multimap reference; plus the
    structural invariants the vendored code relies on — radix-hint
    brackets contain the knot segment, and the interpolated estimate is
    within the build-measured max_err of a true position of the key's
    distinct-CDF neighbor."""
    from learnedspatial_spark.operators.radix_spline import RadixSplineIndex
    rng = np.random.default_rng(SEED + duplicate_level)
    keys = rng.integers(0, 1_000_001, size=10000).astype(np.uint64)
    if duplicate_level == 2:
        keys //= 10000
    if duplicate_level == 0:
        keys = np.unique(keys)
    keys.sort()
    idx = RadixSplineIndex(keys, num_radix_bits=12)
    lookups = rng.integers(0, 1_000_001, size=10000).astype(np.uint64)
    got = idx.get_index_of_infimum(lookups)
    data_list = keys.tolist()
    want = np.array([_infimum_reference(data_list, int(k)) for k in lookups])
    np.testing.assert_array_equal(got, want)
    # hint brackets contain the true knot lower_bound (radix_spline.h:117-145)
    inside = np.clip(lookups, keys[0], keys[-1]).astype(np.float64)
    begin, end = idx.hint_brackets(inside)
    lb = np.searchsorted(idx.spline_keys, inside, side="left")
    assert np.all(begin <= lb) and np.all(lb <= end)
    # estimate stays inside the measured error corridor at every CDF key
    cdf_keys, cdf_pos = spl.build_cdf(keys.astype(np.float64))
    est = idx.estimate(cdf_keys)
    assert np.abs(est - cdf_pos).max() <= idx.max_err + 1e-9
    # the compression actually hit (or undershot) a small model
    assert idx.spline_keys.shape[0] <= max(64, keys.shape[0] // 100)


def test_edge_records_and_stabbing():
    """X3 edge records (interval_tree/edge.h:7-26) + interval stabbing:
    stabbing y returns exactly the edges whose y-interval covers y, and the
    ray-cast crossing set at any point is a subset of its stab set — so an
    interval-tree candidate pass loses no crossings."""
    from learnedspatial_spark.operators import probes
    rng = np.random.default_rng(SEED + 31)
    # closed ring: random star polygon
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=17))
    r = rng.uniform(1, 5, size=17)
    vx = np.r_[r * np.cos(ang), r[0] * np.cos(ang[0])]
    vy = np.r_[r * np.sin(ang), r[0] * np.sin(ang[0])]
    edges = probes.build_edges(vx, vy)
    assert edges.shape[0] == 17
    np.testing.assert_array_equal(edges["id"], np.arange(17))
    for y in rng.uniform(-5, 5, size=25):
        stab = set(probes.stab_edges(edges, y).tolist())
        brute = {i for i in range(17)
                 if min(vy[i], vy[i + 1]) <= y <= max(vy[i], vy[i + 1])}
        assert stab == brute
        # crossing edges (ray-cast rule, open-low half-interval) subset
        crossing = {i for i in range(17)
                    if min(vy[i], vy[i + 1]) < y <= max(vy[i], vy[i + 1])}
        assert crossing <= stab


def test_haversine_known_value():
    # London -> Paris ~ 343.5 km on the sphere
    d2r = lambda d: (d / 180.0) * np.pi
    d = orc.haversine_m(d2r(51.5074), d2r(-0.1278), d2r(48.8566), d2r(2.3522))
    assert 340_000 < d < 348_000
    assert orc.haversine_m(0.5, 0.5, 0.5, 0.5) == 0.0


def test_circle_bbox_contains_all_hits():
    rng = np.random.default_rng(SEED + 2)
    lat = rng.uniform(-88, 88, size=2000)
    lon = rng.uniform(-180, 180, size=2000)
    latr, lonr = (lat / 180.0) * np.pi, (lon / 180.0) * np.pi
    for clat, clon, r in [(45.0, 10.0, 300000.0), (89.5, 0.0, 200000.0), (0.0, 179.9, 100000.0)]:
        clatr, clonr = (clat / 180.0) * np.pi, (clon / 180.0) * np.pi
        mnla, mxla, mnlo, mxlo = geo.circle_bbox_radians_np(clatr, clonr, r)
        hits = orc.haversine_m(clatr, clonr, latr, lonr) <= r
        inside_box = (latr >= mnla) & (latr <= mxla) & (lonr >= mnlo) & (lonr <= mxlo)
        assert not np.any(hits & ~inside_box), "bbox dropped a true hit"


def test_ray_cast_square_and_concave():
    # square lat[0,10] lon[0,10]; x=lat, y=lon
    vx = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    vy = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    px = np.array([5.0, 15.0, 5.0, -1.0, 0.0, 10.0])
    py = np.array([5.0, 5.0, 15.0, 5.0, 5.0, 10.0])
    got = orc.ray_cast_inside(px, py, vx, vy)
    assert got[0] and not got[1] and not got[2] and not got[3]
    # concave "L" polygon
    vx2 = np.array([0.0, 10.0, 10.0, 4.0, 4.0, 0.0, 0.0])
    vy2 = np.array([0.0, 0.0, 4.0, 4.0, 10.0, 10.0, 0.0])
    assert orc.ray_cast_inside(np.array([2.0]), np.array([8.0]), vx2, vy2)[0]
    assert not orc.ray_cast_inside(np.array([8.0]), np.array([8.0]), vx2, vy2)[0]


def test_knn_oracle_ties():
    x = np.array([0.0, 0.0, 1.0, 1.0])
    y = np.array([1.0, -1.0, 0.0, 0.0])
    pid = np.array([4, 3, 2, 1])
    got = orc.knn_euclidean(x, y, pid, 0.0, 0.0, 3)
    # all d2 == 1; ties by (x, y, pid): (0,-1,3), (0,1,4), (1,0,1)
    assert got == [3, 4, 1]


# hypothesis property tests: the learned kernel must equal binary search on
# ANY input — hypothesis hunts adversarial shapes (constant runs, single
# element, extreme duplicates) beyond the seeded-RNG sweeps above.
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    vals=st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=300),
    probes=st.lists(st.integers(min_value=-25, max_value=25), min_size=1, max_size=50),
)
@settings(max_examples=150, deadline=None)
def test_learned_searchsorted_property(vals, probes):
    y = np.sort(np.asarray(vals, dtype=np.float64))
    keys, pos = spl.build_cdf(y)
    kk, kp = spl.fit_spline(keys, pos.astype(np.float64))
    q = np.asarray(probes, dtype=np.float64)
    for side in ("left", "right"):
        np.testing.assert_array_equal(
            spl.learned_searchsorted(y, kk, kp, q, side),
            np.searchsorted(y, q, side=side))


@given(vals=st.lists(st.floats(min_value=-180.0, max_value=180.0,
                               allow_nan=False, allow_infinity=False),
                     min_size=1, max_size=500))
@settings(max_examples=100, deadline=None)
def test_spline_error_bound_property(vals):
    y = np.sort(np.asarray(vals, dtype=np.float64))
    keys, pos = spl.build_cdf(y)
    kk, kp = spl.fit_spline(keys, pos.astype(np.float64))
    est = spl.spline_estimate(kk, kp, keys)
    assert np.max(np.abs(est - pos)) <= spl.SPLINE_EPSILON + 1e-9
