"""Custom stateful streaming operator: first-seen dedup on a pages stream.

Training-data ingestion needs streaming exact dedup (a re-crawled url must
not re-enter the corpus).  Implemented with ``applyInPandasWithState``:
the stream is grouped by a stable hash bucket of the key, each group's
GroupState holds the set of seen 64-bit key hashes, and only first-seen
rows are emitted.  State is bounded per bucket and survives micro-batches
(and restarts, with a checkpointLocation).

This is the engine's ``applyInPandasWithState`` surface (the reference has
no streaming at all — SURVEY.md §2.8); the same pattern carries any custom
per-key streaming state (e.g. per-tile rolling point counts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_BUCKETS = 64

OUTPUT_SCHEMA = "url string, warc_ts timestamp, x double, y double"
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(key, pdf_iter, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdf_iter:
        # stable 64-bit key hash computed JVM-side (xxhash64 column)
        mask = []
        for h in pdf["key_hash"]:
            h = int(h)
            if h in seen:
                mask.append(False)
            else:
                seen.add(h)
                mask.append(True)
        out = pdf.loc[mask, ["url", "warc_ts", "x", "y"]]
        if len(out):
            yield out
    state.update((list(seen),))


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


def dedup_stream(points: DataFrame) -> DataFrame:
    """points stream (url, warc_ts, x, y) -> first-seen rows only.

    Uses xxhash64(url) both as the dedup identity and (mod N_BUCKETS) as
    the state partition key — state per group stays small and hash-balanced
    at any corpus size.
    """
    keyed = points.withColumn("key_hash", F.xxhash64("url")) \
                  .withColumn("bucket", F.pmod(F.col("key_hash"), F.lit(N_BUCKETS)))
    return (
        keyed.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
