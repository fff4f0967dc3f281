#!/usr/bin/env python
"""Quiet-gated wall measurement for the table x table spatial joins.

The round-5 operators (operators/distjoin.py: `distance_join_pairs`,
`knn_join`) are correctness-graded by their DuckDB twins; this tool
measures their sf0.1 walls with the same discipline as the rest of the
bench surface — drive-then-wait for a quiet page-touch witness
(tools_adjudicate.wait_quiet), warm the plan once, best-of-N, witnesses
bracketing the timed block — and times a single-node DuckDB baseline
(band-predicate self-join + exact haversine, the oracle's shape) on the
same input for the engine-vs-single-node comparison the other headline
queries carry.

Usage:
  python tools_distjoin_bench.py [--sf-dir /root/testdata/sf0.1]
      [--cpus 32] [--radius-m 25000] [--k 3] [--repeats 2]
      [--max-wait-s 3600] [--skip-duckdb]

Prints ONE JSON line.  A sick close witness means a strike may have
hit mid-block: re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402
from tools_adjudicate import wait_quiet  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--radius-m", type=float, default=25_000.0)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--max-wait-s", type=float, default=float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "3600")))
    ap.add_argument("--skip-duckdb", action="store_true")
    args = ap.parse_args()

    from learnedspatial_spark.operators.distjoin import (
        distance_join_pairs, knn_join)
    from learnedspatial_spark.session import get_spark
    from learnedspatial_spark.sources.points import points_df

    quiet, pt_gate, waited = wait_quiet(args.max_wait_s)
    spark = get_spark("distjoin_bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=2 * args.cpus)
    pts = points_df(spark, args.sf_dir)
    n = pts.count()

    jobs = {
        "pairs_count": lambda: distance_join_pairs(
            pts, args.radius_m).count(),
        "knn_count": lambda: knn_join(
            pts.where("pid % 10 = 0"), pts, args.k, args.radius_m).count(),
    }
    res = {"sf_dir": args.sf_dir, "cpus": args.cpus, "points": n,
           "radius_m": args.radius_m, "k": args.k,
           "gate_quiet": quiet, "gate_pagetouch": pt_gate,
           "gate_waited_s": waited}
    counts = {}
    for name, j in jobs.items():
        counts[name] = j()  # warm: plan + python worker pool
    res["rows"] = counts
    _, pt_open = bench.host_bandwidth_gbs()
    if pt_open < 1.0:  # drive the idle-memory sick form out (CLAUDE.md)
        bench.host_active_recovery()
        _, pt_open = bench.host_bandwidth_gbs()
    walls = {k: [] for k in jobs}
    for _ in range(args.repeats):
        for name, j in jobs.items():
            t0 = time.perf_counter()
            c = j()
            walls[name].append(round(time.perf_counter() - t0, 3))
            assert c == counts[name]
    _, pt_close = bench.host_bandwidth_gbs()
    res.update(pagetouch_open=pt_open, pagetouch_close=pt_close,
               walls=walls, best={k: min(v) for k, v in walls.items()})
    spark.stop()

    if not args.skip_duckdb:
        # single-node baseline: DuckDB's IEJoin on the latitude band
        # predicate + exact haversine — the same algorithmic shape as
        # the oracle twin, on all available cores
        import duckdb

        from learnedspatial_spark.operators.distjoin import band_deg
        from learnedspatial_spark.entrylib import haversine_m_sql
        from learnedspatial_spark.sources.points import POINTS_CTE
        from learnedspatial_spark.sqlcompat import flit

        bd = flit(band_deg(args.radius_m))
        hav = haversine_m_sql(
            "(l.x / cast(180 as double)) * pi()",
            "(l.y / cast(180 as double)) * pi()",
            "(r.x / cast(180 as double)) * pi()",
            "(r.y / cast(180 as double)) * pi()")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/lineitem.parquet')")
        q = (f"WITH {POINTS_CTE} SELECT count(*) FROM points l "
             f"JOIN points r ON l.pid < r.pid "
             f"AND r.x >= l.x - {bd} AND r.x <= l.x + {bd} "
             f"WHERE {hav} <= {flit(args.radius_m)}")
        duck = {}
        c0 = con.sql(q).fetchone()[0]  # warm
        assert c0 == counts["pairs_count"], (c0, counts["pairs_count"])
        t0 = time.perf_counter()
        con.sql(q).fetchone()
        duck["pairs_count"] = round(time.perf_counter() - t0, 3)
        _, pt_duck = bench.host_bandwidth_gbs()
        res.update(duckdb_walls=duck, pagetouch_duck_close=pt_duck)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
