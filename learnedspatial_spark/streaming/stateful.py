"""Stateful streaming operators: first-seen dedup + rolling tile counts.

Training-data ingestion needs streaming exact dedup (a re-crawled url must
not re-enter the corpus).  The scale-correct state model is ONE state-store
entry per key, O(1) bytes each — the state store's own job is scaling by
entry count (RocksDB-backed on a real cluster).  The earlier design (hash
buckets whose GroupState accumulated every seen hash in an ``array<long>``)
grew O(corpus) bytes inside 64 rows — gigabyte state rows, then OOM.

``dedup_stream`` therefore defaults to Spark's native streaming
``dropDuplicates`` (JVM state, no Python in the loop) and keeps an
``applyInPandasWithState`` variant keyed BY the key itself (single boolean
state per key) as the engine's custom-state surface (the reference has no
streaming at all — SURVEY.md §2.8); the same pattern carries any custom
per-key streaming state (e.g. per-tile rolling point counts below).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "url string, warc_ts timestamp, x double, y double"
# one fixed-width value per key — never an array that grows with the corpus
STATE_SCHEMA = "seen boolean"


def _dedup_fn(key, pdf_iter, state: GroupState):
    """Group = one ``key_hash``.  First-seen selection is the head of the
    first non-empty batch — vectorized slicing, no per-row Python loop;
    state is a single boolean per key."""
    if state.exists:
        return
    first = None
    for pdf in pdf_iter:
        if len(pdf):
            first = pdf.iloc[:1][["url", "warc_ts", "x", "y"]]
            break   # remaining chunks are duplicates of this key — skip
    state.update((True,))
    if first is not None:
        yield first


def dedup_stream_within_watermark(points: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Bounded-state streaming dedup: drops re-crawls of a url whose event
    time falls within ``delay`` of the first sighting, and EXPIRES each
    key's state once the watermark passes it — state is O(distinct keys
    per watermark horizon), not O(all keys ever).  This is the form an
    unbounded crawl stream must run forever; pair it with a periodic
    batch ``dedup_exact`` compaction for the long tail (exact GLOBAL
    first-seen state grows with the corpus by definition — that variant
    is :func:`dedup_stream`)."""
    keyed = (points.withWatermark("warc_ts", delay)
             .withColumn("key_hash", F.xxhash64("url")))
    return (keyed.dropDuplicatesWithinWatermark(["key_hash"])
            .select("url", "warc_ts", "x", "y"))


ROLLING_OUTPUT_SCHEMA = "cell_id bigint, batch_rows bigint, total_rows bigint"
ROLLING_STATE_SCHEMA = "total bigint"


def _rolling_fn(key, pdf_iter, state: GroupState):
    total = state.get[0] if state.exists else 0
    batch = 0
    for pdf in pdf_iter:
        batch += len(pdf)
    total += batch
    state.update((total,))
    yield pd.DataFrame({"cell_id": [int(key[0])],
                        "batch_rows": [batch], "total_rows": [total]})


def rolling_tile_counts(points_with_cells: DataFrame) -> DataFrame:
    """Per-tile ROLLING point counts: each micro-batch emits (cell_id,
    batch_rows, total_rows-so-far).  The freshness/monitoring companion to
    the windowed counts — state is one counter per tile (bounded by
    #cells, the same O(#cells) budget as the model/stats tables), so it
    runs at any corpus scale.  Second ``applyInPandasWithState`` surface
    next to the first-seen dedup above."""
    return (points_with_cells.groupBy("cell_id")
            .applyInPandasWithState(
                _rolling_fn,
                outputStructType=ROLLING_OUTPUT_SCHEMA,
                stateStructType=ROLLING_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def dedup_stream(points: DataFrame, impl: str = "native") -> DataFrame:
    """points stream (url, warc_ts, x, y) -> first-seen rows only; the
    dedup identity is xxhash64(url).

    ``impl="native"`` (default — the 100 TB path): streaming
    ``dropDuplicates`` on the key hash.  Spark's streaming-dedup state
    store keeps ONE fixed-size entry per key, entirely JVM-side; no
    Python anywhere in the loop.

    ``impl="state"``: identical semantics on the engine's
    ``applyInPandasWithState`` surface, state keyed BY ``key_hash`` with
    one boolean per key — the custom-state template; its per-group Python
    call overhead makes it the extension path, not the production one.

    Exact global first-seen dedup inherently keeps state for every
    distinct key ever seen; both impls store O(1) bytes per key.  For
    time-bounded state use a watermark upstream with
    ``dropDuplicatesWithinWatermark``.
    """
    keyed = points.withColumn("key_hash", F.xxhash64("url"))
    if impl == "native":
        return keyed.dropDuplicates(["key_hash"]).select("url", "warc_ts", "x", "y")
    if impl != "state":
        raise ValueError(f"dedup_stream impl must be 'native' or 'state', got {impl!r}")
    return (
        keyed.groupBy("key_hash")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
