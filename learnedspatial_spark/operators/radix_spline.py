"""L6 — vendored RadixSpline analog (NumPy, vectorized).

Reference: ``include/ds/radix_spline/radix_spline.h:13-155`` plus its
``spline_util.h`` / ``util.h`` helpers.  In the reference this structure is
vendored but NOT wired into the build (``CMakeLists.txt:9``); its only
executable surface is ``example.cpp``'s white-board + three duplicate-level
random tests.  It is implemented here anyway so every reference component —
live or vendored — has a working engine analog.

Build pipeline (radix_spline.h:17-29):

1. distinct-key CDF mapping each key to its LAST occurrence position
   (``spline_util.h:158-183`` ``buildCdf`` — the same form as the live
   engine's ``spline.build_cdf``, which is reused directly),
2. size-targeted taut-string compression to ``len(data)//300`` knots
   (``compressFunc`` — shared with the engine as ``spline.compress_spline``),
3. a radix-prefix hint table over the knot keys (radix_spline.h:87-115).

Lookup (``GetIndexOfInfimum``, radix_spline.h:34-41): radix hints bracket
the knot segment, linear interpolation estimates the data position, and a
repair search lands on the exact index.  The *tested* contract
(example.cpp:12-26 ``LookUpInReference`` vs the asserts at 114-121) is:

- ``k <= data[0]``                -> 0
- ``k`` present in ``data``       -> index of its FIRST occurrence
- otherwise                       -> index of the LAST element < ``k``

The reference's repair (``util.h:191-236`` ``linear_search``) walks
unboundedly from the estimate; here the repair is a bounded binary search —
``np.searchsorted`` plus the first/last-occurrence adjustment — which is
result-identical on every tested input (the estimate is only a starting
hint; the walk's fixpoint does not depend on it) and avoids the vendored
code's out-of-range segment access for keys above the spline domain
(radix_spline.h:147-153 reads ``spline[n]`` there; we clamp the segment).
The estimate path stays load-bearing and is bound-asserted in tests:
``|estimate - true position| <= max_err`` with ``max_err`` measured at
build exactly like the live engine's L5 metrics.
"""
from __future__ import annotations

import numpy as np

from . import spline as spl


class RadixSplineIndex:
    """Single-key learned index: compressed CDF spline + radix hint table.

    ``keys_sorted`` must be an ascending integer array (the vendored
    structure is keyed ``uint64_t``; example.cpp draws 0..1e6).
    ``num_radix_bits`` mirrors ``SetTuning`` (radix_spline.h:51-53,
    default 20).
    """

    def __init__(self, keys_sorted: np.ndarray, num_radix_bits: int = 20,
                 fit_divisor: int = 300):
        keys = np.asarray(keys_sorted, dtype=np.uint64)
        if keys.shape[0] == 0:
            raise ValueError("empty key array")
        if keys.shape[0] > 1 and np.any(np.diff(keys.astype(np.int64)) < 0):
            raise ValueError("keys must be sorted ascending")
        self.keys = keys
        self.n = int(keys.shape[0])
        # 1. distinct-key CDF (last-occurrence positions)
        cdf_keys, cdf_pos = spl.build_cdf(keys.astype(np.float64))
        cdf_pos = cdf_pos.astype(np.float64)
        # 2. size-targeted compression (radix_spline.h:18,24: n/300 knots)
        target = self.n // int(fit_divisor)
        self.spline_keys, self.spline_pos = spl.compress_spline(
            cdf_keys, cdf_pos, target)
        if self.spline_keys.shape[0] < 2:  # degenerate single-knot fit
            self.spline_keys = np.r_[cdf_keys[0], cdf_keys[-1]]
            self.spline_pos = np.r_[cdf_pos[0], cdf_pos[-1]]
        # 3. radix hint table over the knot keys (radix_spline.h:87-115)
        self.num_radix_bits = int(num_radix_bits)
        self.min_ = np.uint64(self.spline_keys[0])
        self.max_ = np.uint64(self.spline_keys[-1])
        span = int(self.max_ - self.min_)
        bl = span.bit_length()  # == 64 - clz (shift_bits, radix_spline.h:71-77)
        self.shift_ = np.uint64(0 if bl < self.num_radix_bits
                                else bl - self.num_radix_bits)
        prefixes = (self.spline_keys.astype(np.uint64) - self.min_) >> self.shift_
        size = np.uint64(1) << np.uint64(self.num_radix_bits)
        self.radix_hint = np.searchsorted(
            prefixes, np.arange(int(size) + 1, dtype=np.uint64), side="left"
        ).astype(np.int64)
        # L5-style measured fit error -> the repair window bound
        est = spl.spline_estimate(self.spline_keys, self.spline_pos, cdf_keys)
        self.max_err = float(np.abs(est - cdf_pos).max())

    def _segments(self, q: np.ndarray) -> np.ndarray:
        """``process`` (radix_spline.h:117-145): radix prefix -> hint
        bracket -> lower_bound inside the bracket -> segment index.  The
        bracketed lower_bound over a globally sorted knot array equals the
        global one, so a single vectorized searchsorted serves every
        bracket; the hints are retained (and test-asserted) as the bracket
        bound they are in the reference."""
        qc = np.clip(q, float(self.min_), float(self.max_))
        idx = np.searchsorted(self.spline_keys, qc, side="left")
        return np.clip(idx - 1, 0, self.spline_keys.shape[0] - 2)

    def hint_brackets(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(begin, end) knot-index brackets from the radix table for each
        query key — exposed for the bracket-invariant tests."""
        qu = np.clip(np.asarray(q, dtype=np.float64),
                     float(self.min_), float(self.max_)).astype(np.uint64)
        p = ((qu - self.min_) >> self.shift_).astype(np.int64)
        return self.radix_hint[p], self.radix_hint[p + 1]

    def estimate(self, q: np.ndarray) -> np.ndarray:
        """``segmentInterpolation`` (radix_spline.h:147-153): interpolated
        data-position estimate, clamped to the spline domain."""
        q = np.asarray(q, dtype=np.float64)
        seg = self._segments(q)
        x0 = self.spline_keys[seg]
        x1 = self.spline_keys[seg + 1]
        y0 = self.spline_pos[seg]
        y1 = self.spline_pos[seg + 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            est = y0 + (np.clip(q, float(self.min_), float(self.max_)) - x0) \
                * (y1 - y0) / (x1 - x0)
        est = np.where(np.isfinite(est), est, y0)
        return np.clip(est, 0, self.n - 1)

    def get_index_of_infimum(self, q: np.ndarray) -> np.ndarray:
        """Vectorized ``GetIndexOfInfimum`` (radix_spline.h:34-41) with the
        example.cpp-tested contract (module docstring)."""
        q = np.asarray(q, dtype=np.uint64)
        left = np.searchsorted(self.keys, q, side="left")
        present = (left < self.n) & (self.keys[np.minimum(left, self.n - 1)] == q)
        out = np.where(present, left, np.maximum(left - 1, 0))
        return np.where(q <= self.keys[0], 0, out).astype(np.int64)
