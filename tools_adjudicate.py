#!/usr/bin/env python
"""Quiet-gated re-timing of one engine query — the adjudication tool.

When a single bench reading looks regressed (this VM's documented noise
band is 3-6x, CLAUDE.md), the method that has survived four rounds of
flagged "regressions" is: wait for the page-touch witness to go quiet,
warm the engine exactly as bench.py does, then time the one query
best-of-N with witnesses bracketing the timing block.  This script is
that method, checked in (BENCH/ADJUDICATION_r4.md / _r5.md used ad-hoc
copies of it for q_distance_count, q_knn, build_assign_quadtree).

Scope: re-times ONE code version.  For cross-ROUND A/B (old commit vs
new), clone the old commit to /tmp and run the two sides INTERLEAVED
(alternating order, one subprocess per timing) — the oscillating sick
mode otherwise fabricates 2-4x "regressions" on whichever side ran
during a strike (CLAUDE.md, BENCH/ADJUDICATION_r5.md).

Usage:
  python tools_adjudicate.py --query distance_count [--repeats 5]
      [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--max-wait-s 7200]

Prints ONE JSON line: {"query": ..., "quiet": ..., "walls": [...],
"best": ..., "pagetouch_open": ..., "pagetouch_close": ..., ...}.
A sick close witness means a strike may have hit mid-block: re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402

QUERIES = ("range_count", "distance_count", "pip", "knn",
           "range_materialize")


def wait_quiet(max_wait_s: float) -> tuple[bool, float, float]:
    """Drive-then-poll the page-touch witness until quiet (>= 1 GB/s).

    A sick reading triggers an ACTIVE recovery attempt first
    (bench.host_active_recovery — the idle-memory sick form dissipates
    under ~5 s of fresh allocations, measured 2026-08-19); only the
    persistent form falls through to the sleep loop, which retries the
    recovery each round.  Returns (quiet, last_pagetouch_gbs,
    waited_s); never sleeps when the host is already quiet.
    """
    waited = 0.0
    _, pt = bench.host_bandwidth_gbs()
    if pt < 1.0:
        bench.host_active_recovery()
        _, pt = bench.host_bandwidth_gbs()
    while pt < 1.0 and waited < max_wait_s:
        time.sleep(60)
        waited += 60
        bench.host_active_recovery()
        _, pt = bench.host_bandwidth_gbs()
    return pt >= 1.0, pt, waited


def adjudicate(spark, query: str, sf_dir: str, repeats: int = 5,
               cpus: int = 32, scheme: str = "fixed_grid",
               refine: str = "learned") -> dict:
    """Warm the engine exactly as bench.py does, then time `query`
    best-of-`repeats` with page-touch witnesses around the block."""
    from learnedspatial_spark.engine import SpatialEngine
    from learnedspatial_spark.sources import workloads as wl

    # warm the JVM + Arrow worker pool exactly as bench.py does, so the
    # timing measures the operator, not daemon startup
    spark.range(1000).selectExpr("sum(id)").collect()
    (spark.range(cpus * 4).repartition(cpus)
     .mapInPandas(lambda it: (pdf for pdf in it), schema="id bigint").count())

    eng = SpatialEngine(spark, sf_dir, scheme=scheme, refine=refine)
    eng.assigned_points().cache().count()
    eng.cell_stats()
    eng.fit_models()

    rects = wl.rectangles(n_per_tier=40)
    circles = wl.distance_queries(n=60)
    polys = wl.polygons(n=24)
    knnq = wl.knn_queries(n=30)
    runs = {
        "range_count": lambda: eng.range_count(rects).collect(),
        "distance_count": lambda: eng.distance_count(circles).collect(),
        "pip": lambda: eng.pip(polys).collect(),
        "knn": lambda: eng.knn(knnq).collect(),
        "range_materialize": lambda: eng.range_materialize(rects).count(),
    }
    run = runs[query]
    eng.range_count(rects[:2]).collect()  # warm probe path (worker imports)
    run()  # warm the adjudicated path itself

    pt_open = bench.host_bandwidth_gbs()[1]
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        walls.append(round(time.perf_counter() - t0, 4))
    pt_close = bench.host_bandwidth_gbs()[1]
    return {
        "query": query, "quiet": True, "walls": walls,
        "best": min(walls), "median": sorted(walls)[len(walls) // 2],
        "pagetouch_open": pt_open, "pagetouch_close": pt_close,
        "sf_dir": sf_dir, "cpus": cpus, "scheme": scheme, "refine": refine,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="distance_count", choices=QUERIES)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--max-wait-s", type=float,
                    default=float(os.environ.get("MAX_WAIT_S", "7200")))
    ap.add_argument("--scheme", default="fixed_grid")
    ap.add_argument("--refine", default="learned")
    args = ap.parse_args()

    quiet, pt, waited = wait_quiet(args.max_wait_s)
    if not quiet:
        print(json.dumps({"query": args.query, "quiet": False,
                          "pagetouch": pt, "waited_s": waited}))
        return

    from learnedspatial_spark.session import get_spark
    spark = get_spark("adjudicate", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    out = adjudicate(spark, args.query, args.sf_dir, repeats=args.repeats,
                     cpus=args.cpus, scheme=args.scheme, refine=args.refine)
    out["waited_s"] = waited
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
