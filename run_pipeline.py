#!/usr/bin/env python
"""spark-submit entry: build the tiled learned index from a pages table.

  python tools_make_zip.py
  spark-submit --py-files learnedspatial_spark.zip run_pipeline.py \
      --pages /path/pages.parquet --out /path/index_root [--scheme fixed_grid]

Re-running after a kill resumes at cell granularity (checkpoint manifest).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scheme", default="fixed_grid")
    ap.add_argument("--partition-size", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from learnedspatial_spark.pipeline import build_tiled_index

    spark = SparkSession.builder.appName("learnedspatial-build").getOrCreate()
    out = build_tiled_index(spark, args.pages, args.out,
                            scheme=args.scheme, partition_size=args.partition_size)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
