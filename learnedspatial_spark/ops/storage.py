"""Table-storage seam: hive-partitioned parquet today, Iceberg in
production.

Every materialized engine artifact (the tiled point table, the model
table, the cell-stats table) goes through these functions — the single
point where the table format is chosen:

* sandbox (this container): hive-partitioned parquet directories; the
  partition column becomes directory structure, so candidate-cell
  predicates turn into ``PartitionFilters`` (pruned listing, asserted in
  PLANS.md);
* production with an Iceberg catalog: the same calls map 1:1 onto
  ``df.writeTo(table).partitionedBy(identity(col)).createOrReplace()`` /
  ``overwritePartitions()`` and ``spark.read.table(name)`` — cell_id as
  an identity partition gives the identical pruning, and the checkpoint
  manifest's idempotent per-cell overwrite maps onto Iceberg's
  snapshot-isolated ``overwritePartitions``.  The Iceberg runtime jar is
  not in this container, so the seam keeps the swap a one-module change
  (VERDICT r1 "keep the abstraction seam").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_col: str,
                      mode: str = "overwrite") -> None:
    """Materialize ``df`` partitioned by ``partition_col`` (the engine's
    cell key — the unit of pruning, checkpoint resume, and co-located
    joins)."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize an unpartitioned artifact table (models, stats)."""
    df.write.mode(mode).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Open a materialized table; filters on the partition column prune at
    the source (PartitionFilters here; Iceberg partition pruning in
    production)."""
    return spark.read.parquet(path)
