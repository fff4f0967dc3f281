"""Streaming ingest of Common-Crawl-style pages.

The reference is batch-only (SURVEY.md §2.8: no streaming surface); this is
new engine surface for the production shape: a WARC/pages stream lands as
files (or Kafka), the engine extracts coordinates, assigns tiles with the
SAME partitioner spec used by the batch index (broadcast, lineage-hashed),
and maintains watermarked per-tile/window counts for freshness monitoring.

All transformations are Column expressions — the streaming path shares the
batch path's extraction SQL, so a row processed by either path lands in the
same cell (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import FixedGridPartitioner, Partitioner

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# geo:{lat},{lon} extraction — same pattern the batch extractor embeds
# (datagen.HTML_TEMPLATE); regexp shared between batch and stream.
GEO_RE = r"geo:(-?[0-9]+(?:\.[0-9eE+-]+)?),(-?[0-9]+(?:\.[0-9eE+-]+)?)"


def extract_points_stream(pages: DataFrame) -> DataFrame:
    """pages (batch OR stream) -> (url, warc_ts, x, y); rows without a geo
    tag are dropped.  Pure Column expressions — no UDF in the stream."""
    return (
        pages.select(
            "url", "warc_ts",
            F.regexp_extract("text", GEO_RE, 1).alias("lat_s"),
            F.regexp_extract("text", GEO_RE, 2).alias("lon_s"),
        )
        .where((F.col("lat_s") != "") & (F.col("lon_s") != ""))
        .select("url", "warc_ts",
                F.col("lat_s").cast("double").alias("x"),
                F.col("lon_s").cast("double").alias("y"))
    )


def assign_tiles_stream(points: DataFrame, partitioner: Partitioner) -> DataFrame:
    """Attach cell_id with the broadcast partitioner spec.  Closed-form
    schemes stay Column-only (fixed grid here); tree schemes would use the
    same mapInPandas router as batch."""
    if isinstance(partitioner, FixedGridPartitioner):
        return points.withColumn("cell_id", F.expr(partitioner.assign_sql("x")))
    raise NotImplementedError("streaming tile assignment: fixed_grid only (round 1)")


def windowed_tile_counts(points_with_cells: DataFrame, window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window per-tile counts: late rows beyond the
    watermark are dropped by the engine; state is bounded."""
    return (
        points_with_cells
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "cell_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "cell_id", "cnt")
    )


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))
