#!/usr/bin/env python
"""No-Spark scaling probe for the range leg's saturation mechanism.

BENCH/ADJUDICATION_r5.md names the range leg's sub-target 4->16
efficiency "single-socket memory-bandwidth saturation" from a fitted
non-dividing term that GROWS with parallelism — an inference.  This
tool measures the mechanism directly, with zero Spark in the picture,
by running a FIXED total workload split across P worker processes at
two levels (default 4 and 16) and reporting the wall-clock efficiency
eff = wall_P / (4 * wall_4P) ... i.e. (wall_lo / wall_hi) / (hi/lo).

Two modes, timed interleaved (lo,hi,hi,lo — a mid-run host strike
degrades both levels instead of fabricating a one-sided result):

* ``streaming`` — each worker repeatedly range-scans a private
  above-LLC float64 array (``count_nonzero((a>=lo)&(a<=tx))``, the
  same compare+count instruction mix as the candidate-run scan) so
  every byte comes from DRAM.  Fixed total bytes across levels.  If
  the 4->16 efficiency here collapses, the socket's aggregate
  bandwidth is the ceiling for ANY byte-dominated job on this box.
* ``kernel`` — the engine's actual ``probes.range_count_cell`` over
  deterministic synthetic 8000-row cells at engine occupancy
  (~25 queries routed per cell, like 18k rects over 3600 cells): each
  cell's 64 KB sort arrays are re-probed by all of its queries, so
  the scans are largely cache-resident.  If THIS scales while
  streaming saturates, the saturating bytes are the per-job streaming
  (cache->Arrow->NumPy) traffic, not the probe kernel itself.

Workers build their data, meet a barrier, and only the probe phase is
timed (max(t_end) - min(t_start) across workers).  Page-touch
witnesses bracket every timing; gate with --max-wait-s as in
tools_adjudicate.py.  Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from tools_adjudicate import wait_quiet  # noqa: E402

ROWS = 8000  # per-cell occupancy of the scaling runs (partition_size)


# ---------------------------------------------------------------- workers

def _stream_worker(proc_id, n_procs, total_bytes, arr_bytes_total,
                   built, barrier, q):
    """Range-scan a private above-LLC array; fixed total bytes per level."""
    n = max(int(arr_bytes_total / n_procs / 8), 1_000_000)
    rng = np.random.default_rng(1000 + proc_id)
    a = rng.random(n)  # private: no page sharing between workers
    reps = max(int(total_bytes / n_procs / (n * 8)), 1)
    lo, hi = 0.25, 0.75
    np.count_nonzero((a >= lo) & (a <= hi))  # touch temporaries' pages
    built.wait()  # all builds done; main reads pt_open while we idle here
    barrier.wait()
    t0 = time.perf_counter()
    acc = 0
    for _ in range(reps):
        acc += int(np.count_nonzero((a >= lo) & (a <= hi)))
    t1 = time.perf_counter()
    q.put((proc_id, t0, t1, acc, reps * n * 8))


def _kernel_worker(proc_id, n_procs, n_cells, queries_per_cell, rounds,
                   built, barrier, q):
    """probes.range_count_cell over this worker's stride of cells.

    `rounds` full passes over the cells keep the level wall in seconds
    WITHOUT changing the per-call occupancy (each call stays at the
    engine's ~25 queries sharing one 64 KB cell)."""
    from learnedspatial_spark.operators import probes

    cells = []
    for cell in range(proc_id, n_cells, n_procs):
        rng = np.random.default_rng(cell)
        xs, ys = rng.random(ROWS), rng.random(ROWS)
        order = np.lexsort((xs, ys))
        xs_s, ys_s = xs[order], ys[order]
        qr = np.random.default_rng(10_000_000 + cell)
        fy = qr.uniform(0.0, 0.5, queries_per_cell)
        ty = fy + qr.uniform(0.2, 0.5, queries_per_cell)  # ~20-50% run
        fx = qr.uniform(0.1, 0.4, queries_per_cell)
        tx = fx + qr.uniform(0.2, 0.5, queries_per_cell)
        cells.append((xs_s, ys_s, fx, fy, tx, ty))
    if cells:  # warm the kernel path (imports, allocator)
        probes.range_count_cell(*cells[0])
    built.wait()  # all builds done; main reads pt_open while we idle here
    barrier.wait()
    t0 = time.perf_counter()
    acc = 0
    for _ in range(rounds):
        for xs_s, ys_s, fx, fy, tx, ty in cells:
            acc += int(probes.range_count_cell(
                xs_s, ys_s, fx, fy, tx, ty).sum())
    t1 = time.perf_counter()
    q.put((proc_id, t0, t1, acc, 0))


def run_level(mode: str, n_procs: int, n_cells: int, queries_per_cell: int,
              rounds: int, stream_total_gb: float,
              stream_resident_gb: float) -> dict:
    """One timed level; returns wall + checksum + bracketing witnesses."""
    ctx = mp.get_context("fork")
    built = ctx.Barrier(n_procs + 1)
    barrier = ctx.Barrier(n_procs + 1)
    q = ctx.Queue()
    if mode == "streaming":
        args = [(p, n_procs, stream_total_gb * 1e9,
                 stream_resident_gb * 1e9, built, barrier, q)
                for p in range(n_procs)]
        target = _stream_worker
    else:
        args = [(p, n_procs, n_cells, queries_per_cell, rounds, built,
                 barrier, q) for p in range(n_procs)]
        target = _kernel_worker
    procs = [ctx.Process(target=target, args=a) for a in args]
    for p in procs:
        p.start()
    built.wait()  # every worker finished its untimed build phase
    # the opening witness now runs with all workers idle at the second
    # barrier, so it brackets exactly the timed block (a witness taken
    # during the build phase reads depressed on a perfectly quiet host
    # and would misclassify the run as struck)
    pt_open = bench.host_bandwidth_gbs()[1]
    barrier.wait()  # timing starts now
    out = [q.get() for _ in range(n_procs)]
    for p in procs:
        p.join()
    pt_close = bench.host_bandwidth_gbs()[1]
    wall = max(t1 for _, _, t1, _, _ in out) - min(t0 for _, t0, _, _, _ in out)
    res = {"procs": n_procs, "wall_s": round(wall, 4),
           "checksum": sum(c for _, _, _, c, _ in out),
           "pagetouch_open": pt_open, "pagetouch_close": pt_close}
    sbytes = sum(b for _, _, _, _, b in out)
    if sbytes:
        res["aggregate_gbs"] = round(sbytes / wall / 1e9, 2)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["streaming", "kernel", "both"])
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--cells", type=int, default=3600)   # 28.8M points
    ap.add_argument("--queries-per-cell", type=int, default=25)
    ap.add_argument("--kernel-rounds", type=int, default=40,
                    help="repeat the kernel pass so the level wall is "
                         "seconds, not milliseconds")
    ap.add_argument("--stream-total-gb", type=float, default=48.0)
    ap.add_argument("--stream-resident-gb", type=float, default=3.2)
    ap.add_argument("--max-wait-s", type=float,
                    default=float(os.environ.get("MAX_WAIT_S", "0")))
    args = ap.parse_args()

    quiet, pt, waited = wait_quiet(args.max_wait_s)
    result = {"rows_per_cell": ROWS, "cells": args.cells,
              "queries_per_cell": args.queries_per_cell,
              "gate_quiet": quiet, "gate_pagetouch": pt,
              "gate_waited_s": waited, "modes": {}}
    modes = ["streaming", "kernel"] if args.mode == "both" else [args.mode]
    for mode in modes:
        # interleaved order: a strike degrades both levels together
        runs = [run_level(mode, n, args.cells, args.queries_per_cell,
                          args.kernel_rounds, args.stream_total_gb,
                          args.stream_resident_gb)
                for n in (args.lo, args.hi, args.hi, args.lo)]
        lo_best = min(runs[0], runs[3], key=lambda r: r["wall_s"])
        hi_best = min(runs[1], runs[2], key=lambda r: r["wall_s"])
        assert runs[0]["checksum"] == runs[3]["checksum"]
        assert runs[1]["checksum"] == runs[2]["checksum"]
        if mode == "kernel":  # identical total work across levels too
            assert runs[0]["checksum"] == runs[1]["checksum"]
        eff = (lo_best["wall_s"] / hi_best["wall_s"]) / (args.hi / args.lo)
        result["modes"][mode] = {"runs": runs,
                                 "wall_lo": lo_best["wall_s"],
                                 "wall_hi": hi_best["wall_s"],
                                 "efficiency": round(eff, 3)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
