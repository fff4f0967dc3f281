"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: learned-index range-count workload over the
derived point table at sf0.001.  ``queries()``/``oracle_sql()`` — the full
operator surface from SURVEY.md §2 (+ training-data ops), each Spark job
paired with an independent DuckDB oracle; see learnedspatial_spark.entrylib.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from learnedspatial_spark import entrylib  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: learned-spline range-count
    over the fixed-grid partitioning (the reference's headline benchmark,
    src/main.cpp:134-191)."""
    from learnedspatial_spark.engine import SpatialEngine
    from learnedspatial_spark.sources import workloads as wl

    eng = SpatialEngine(spark, "/root/testdata/sf0.001", scheme="fixed_grid", refine="learned")
    return eng.range_count(wl.rectangles(n_per_tier=10))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entrylib.queries()


def oracle_sql() -> dict[str, str]:
    return entrylib.oracle_sql()
