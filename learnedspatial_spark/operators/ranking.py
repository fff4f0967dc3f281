"""Scale-safe global ranking (distributed row_number).

A bare ``Window.orderBy(...)`` with no partition key pulls every row
through ONE task — fine at test scale, fatal at 100 TB.  The STR
partitioner (STRPartitioning.hpp:94-163 semantics) needs a global rank by
(x, y, tiebreak); this module computes the identical rank with a
range-bucketed two-phase plan:

1. value-bucket rows on the leading sort column using driver-computed
   separator literals (``approxQuantile`` — one bounded job; falls back to
   a single bucket on constant columns).  Bucketing is a pure function of
   the column VALUE, so ties on the leading column stay inside one bucket
   and cross-bucket order is total;
2. count rows per bucket (one aggregation job, O(#buckets) to the driver)
   and turn the counts into cumulative offsets;
3. rank within each bucket with a *partitioned* window (parallel across
   buckets) and add the bucket's offset.

Global rank = offset + local rank — bit-identical to the single-task
``row_number`` for any input, with no single-partition exchange.

Skew note: correctness requires value-based bucketing on the LEADING sort
column only (ties must stay inside one bucket), so a column with one
dominant value degenerates that bucket toward a single window partition —
the same worst case as the bare window, never worse.  At 100 TB, key
domains that skewed should pre-aggregate duplicates (rank of a (value,
count) run-length table) before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sqlcompat import flit


def with_global_rank(df: DataFrame, order_cols: list[str], rank_col: str = "rank_x",
                     n_buckets: int = 64, bucket_col: str = "_rank_bucket") -> DataFrame:
    """df + ``rank_col`` = 1-based global row_number over ``order_cols``
    (leading column must be numeric).  Triggers two small driver jobs
    eagerly (quantile sketch + per-bucket counts); the returned plan has no
    unpartitioned window."""
    lead = order_cols[0]
    # cache the input across the two eager driver jobs (quantile sketch +
    # bucket counts): persist keeps lineage (executor loss recomputes —
    # unlike localCheckpoint) and is dropped right after the counts job,
    # so nothing stays pinned; the returned plan recomputes the upstream
    # once at materialization, same as before this cache existed
    df = df.persist()
    seps = df.approxQuantile(lead, [i / n_buckets for i in range(1, n_buckets)], 0.001)
    seps = sorted(set(seps))
    if seps:
        terms = " + ".join(f"(case when {lead} >= {flit(s)} then 1 else 0 end)" for s in seps)
        # NaN sorts AFTER +Infinity in Spark's ordering AND compares as
        # greater than every value (`NaN >= sep` is TRUE in Spark SQL, not
        # false as in IEEE) — route NaN explicitly to its own final bucket
        # so the behavior is pinned rather than an artifact of Spark's
        # NaN-largest comparison semantics
        bucket = F.expr(
            f"cast(case when isnan(cast({lead} as double)) then {len(seps) + 1} "
            f"else {terms} end as bigint)")
    else:
        bucket = F.lit(0).cast("bigint")
    b = df.withColumn(bucket_col, bucket)
    cnts = {int(r[bucket_col]): int(r["cnt"])
            for r in b.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    df.unpersist(blocking=False)
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(cnts):
        offsets[k] = acc
        acc += cnts[k]
    # offsets as LONG literals: an int32 row_number + int32 offset literal
    # would wrap at 2^31 rows — exactly the scale this module exists for
    omap = F.create_map(*[c for k, v in offsets.items()
                          for c in (F.lit(k).cast("long"), F.lit(v).cast("long"))])
    w = Window.partitionBy(bucket_col).orderBy(*order_cols)
    return (b.withColumn(rank_col,
                         (F.row_number().over(w).cast("long")
                          + F.coalesce(omap[F.col(bucket_col)], F.lit(0).cast("long")))
                         .cast("bigint"))
            .drop(bucket_col))


def str_cell_ids(df: DataFrame, id_col: str, slice_cap: int, leaf: int,
                 cells_per_slice: int, n_buckets: int = 64) -> DataFrame:
    """STR tiling as data: df + ``cell_id`` from the two chained rankings
    (global (x, y, id) rank -> slice; per-slice (y, x, id) rank -> cell).
    The global rank uses the bucketed two-phase plan above; the per-slice
    rank is a *partitioned* window (parallel by construction)."""
    ranked = with_global_rank(df, ["x", "y", id_col], rank_col="_rank_x", n_buckets=n_buckets)
    ranked = ranked.withColumn("_slice_id", ((F.col("_rank_x") - 1) / slice_cap).cast("bigint"))
    w_y = Window.partitionBy("_slice_id").orderBy("y", "x", id_col)
    return (ranked.withColumn("_rank_y", F.row_number().over(w_y))
            .withColumn("cell_id",
                        F.col("_slice_id") * cells_per_slice
                        + ((F.col("_rank_y") - 1) / leaf).cast("bigint"))
            .drop("_rank_x", "_rank_y", "_slice_id"))
