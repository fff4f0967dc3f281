"""Arrow-batched extraction UDFs: html -> text, text -> (x, y).

The engine's production input is the pages table (url, warc_ts, html,
text, lang); points derive from it (BASELINE.json north_star).  Extraction
is an Arrow-batched pandas UDF (mapInPandas) — batches cross the JVM/Python
boundary once per ~64k rows, the per-row work is pure-Python string
stripping (no vectorizable form exists for tag stripping; the batch shape
keeps overhead amortized).  The invariant: output text is byte-identical
to the oracle extractor ``datagen.extract_text_bytes`` per url (tier-4
test, SURVEY.md §5).

Coordinate parse is Column-only (regexp_extract + cast) and shared with
the streaming path (streaming/ingest.py) so batch and stream agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datagen import extract_text_bytes
from .streaming.ingest import GEO_RE


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Recompute ``text`` from ``html`` (replaces the stored column; the
    two must agree byte-for-byte — tested)."""
    cols = pages.columns

    def fn(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["text"] = [extract_text_bytes(bytes(h)).decode("utf-8") for h in pdf["html"]]
            yield pdf

    schema = pages.schema
    return pages.mapInPandas(fn, schema=schema)[cols]


def points_from_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, x, y): coordinate parse from extracted text.  Rows
    without a geo tag drop out (a 100 TB crawl is mostly untagged — the
    filter prunes early, before any shuffle)."""
    return (
        pages.select(
            "url",
            F.regexp_extract("text", GEO_RE, 1).alias("lat_s"),
            F.regexp_extract("text", GEO_RE, 2).alias("lon_s"),
        )
        .where((F.col("lat_s") != "") & (F.col("lon_s") != ""))
        .select("url",
                F.col("lat_s").cast("double").alias("x"),
                F.col("lon_s").cast("double").alias("y"))
    )
