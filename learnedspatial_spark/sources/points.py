"""Derived point table over the driver's synthetic parquet corpus.

The engine's primary input at production scale is a Common-Crawl-style
pages table (url, warc_ts, html, text, lang) from which coordinates are
extracted by Arrow UDFs (see learnedspatial_spark.extract).  For the
driver's correctness/bench harness we derive points from the largest
provided table (``lineitem``) with *pure integer arithmetic + one float64
division* so that Spark and the DuckDB oracle compute bit-identical
coordinates from the same parquet (SURVEY.md §5 tier 3).

x = latitude in [-90, 90), y = longitude in [-180, 180)  — the reference's
axis convention (include/ds/geography/DataTypes.hpp:13-15).  The modular
arithmetic scrambles TPC-H keys into a near-uniform distribution while the
1e-4-degree quantization produces the duplicate coordinates that are the
learned-index edge case (include/ds/radix_spline/example.cpp:79-121).
"""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ANSI SQL, valid in both Spark SQL and DuckDB — keep these in sync with
# nothing: they ARE the single source of truth.
#
# pid: the synthetic lineitem has duplicate (orderkey, linenumber) pairs
# (only the 6-column tuple is unique), and a row_number() over a global
# ORDER BY would force an Exchange SinglePartition into EVERY engine job
# (observed: it serialized all probes to one task).  Instead pid is a pure
# arithmetic 62-bit combination of the 6 columns — embarrassingly parallel,
# bit-identical in both engines (only *, +, %, floor), and verified unique
# at every sf (collision odds ~n^2/2^62).  floor(x*100 + 0.5) avoids
# engine-specific round() tie conventions.
_QC = "cast(floor(l_quantity * 100 + 0.5) as bigint)"
_PC = "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
_H1 = ("(l_orderkey * 2654435761 + l_linenumber * 40503 + l_partkey * 2246822519 + "
       f"l_suppkey * 3266489917 + {_QC} * 668265263 + {_PC} * 374761393) % 2147483647")
_H2 = ("(l_orderkey * 972663749 + l_linenumber * 2654435769 + l_partkey * 550024708 + "
       f"l_suppkey * 1013904223 + {_QC} * 1540483477 + {_PC} * 2246822507) % 2147483629")
PID_SQL = f"(({_H1}) * 2147483648 + ({_H2}))"
# float literals via cast('..' as double): Spark parses bare 10000.0 as
# DECIMAL and would divide under decimal semantics (see sqlcompat.flit)
LAT_SQL = ("((l_orderkey * 7919 + l_linenumber * 104729 + l_partkey * 13) % 1800000)"
           " / cast(10000 as double) - cast(90 as double)")
LON_SQL = ("((l_partkey * 7907 + l_suppkey * 15485863 + l_orderkey * 17) % 3600000)"
           " / cast(10000 as double) - cast(180 as double)")

# DuckDB CTE producing the identical points relation from the registered
# ``lineitem`` view (the driver pre-registers the parquet views).
POINTS_CTE = (
    f"points AS (SELECT {PID_SQL} AS pid, {LAT_SQL} AS x, {LON_SQL} AS y FROM lineitem)"
)


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the derivation: pure Column arithmetic (whole-stage
    codegen; the parquet scan prunes to the 4 key columns)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.expr(PID_SQL).alias("pid"),
        F.expr(LAT_SQL).alias("x"),
        F.expr(LON_SQL).alias("y"),
    )


def points_np(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NumPy side (oracle / driver-side splitter builds): same arithmetic
    via DuckDB so the doubles are bit-identical with both engines."""
    con = duckdb.connect()
    rel = con.sql(
        f"SELECT {PID_SQL} AS pid, {LAT_SQL} AS x, {LON_SQL} AS y "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') ORDER BY pid"
    )
    pid, x, y = rel.fetchnumpy().values()
    con.close()
    return pid.astype(np.int64), x.astype(np.float64), y.astype(np.float64)


def bbox(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) — GetBoundingBox analog
    (include/utils/Utils.hpp:59-82)."""
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())
