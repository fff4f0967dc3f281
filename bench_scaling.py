#!/usr/bin/env python
"""Two-parallelism scaling run (north rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox evidence = identical job at
local[8] vs local[32] on the same input).

The measured job is the PIP-join refine workload (vectorized ray cast over
cells x polygons — the engine's heaviest embarrassingly-parallel kernel)
plus a learned range-count pass, on sf0.1 points.  Build/assignment runs
before the timer; the measured phase is query execution only, matching the
reference's build-vs-lookup split (src/main.cpp:129-130).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from learnedspatial_spark.session import get_spark
from learnedspatial_spark.engine import SpatialEngine
from learnedspatial_spark.sources import workloads as wl

cores = int(sys.argv[1])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(f"scale{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=max(cores, 32))
spark.range(1000).selectExpr("sum(id)").collect()  # warm worker pool

eng = SpatialEngine(spark, sf_dir, scheme="fixed_grid", refine="learned")
pts = eng.assigned_points().cache()
n = pts.count()
eng.cell_stats()
eng.fit_models()
polys = wl.polygons(n=600)
rects = wl.rectangles(n_per_tier=60)

# measured phase: refine-heavy query workload
t0 = time.perf_counter()
eng.pip(polys).collect()
eng.range_count(rects).collect()
wall = time.perf_counter() - t0
work_units = n * (len(polys) + len(rects))
print(json.dumps({{"cores": cores, "wall_sec": wall, "rows": n,
                   "work_units": work_units,
                   "throughput": work_units / wall}}))
spark.stop()
"""


def run(cores: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run([sys.executable, "-c", script, str(cores)],
                         capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run(8)
    r32 = run(32)
    eff = (r32["throughput"] / r8["throughput"]) / 4.0
    result = {
        "metric": "scaling efficiency local[8] -> local[32] (N -> 4N)",
        "sf_dir": sf_dir,
        "n8": r8, "n32": r32,
        "speedup": r32["throughput"] / r8["throughput"],
        "efficiency": round(eff, 4),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — engine measurements

## Scaling efficiency (north rule: >= 0.8 from N -> 4N executors)

Sandbox evidence per driver instruction: the identical job (PIP join with
600 polygons + 229 range-count queries over the learned fixed-grid index,
sf0.1 = {r8['rows']} points; build/assignment/model-fit excluded from the
timer) at two parallelism levels on the same input.

| parallelism | wall (s) | throughput (point-query units/s) |
|---|---|---|
| local[8]  (N)  | {r8['wall_sec']:.2f} | {r8['throughput']:.3e} |
| local[32] (4N) | {r32['wall_sec']:.2f} | {r32['throughput']:.3e} |

speedup (4N vs N): {result['speedup']:.2f}x
**scaling efficiency: {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Work is cell-granular (applyInPandas per cell over {r8['rows']} points /
~600 cells); tasks are independent, shuffle is one exchange on cell_id, so
efficiency carries to multi-executor clusters where each executor hosts
the same per-cell probes (no driver-side bottleneck: broadcast specs are
O(cells), results aggregate tree-wise).

## Headline suite (bench.py, sf0.1, local[32])

See BENCH_r*.json recorded by the driver; latest local run:
`python bench.py` prints the JSON line.
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
