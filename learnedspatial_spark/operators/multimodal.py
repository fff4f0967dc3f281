"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.  The image/audio codec libraries are NOT in this
container, so the decode step is STUBBED behind a deterministic fake
(clearly marked) — the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is real and tested (tests/test_multimodal.py).

At 100 TB: payloads stay columnar in parquet/Iceberg; decode UDFs stream
Arrow batches (bounded memory per task via maxRecordsPerBatch); derived
features land in a sibling table partitioned by the same key so joins are
co-located.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id bigint, media_type string, payload binary, "
                "width int, height int, duration_ms int")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically wrap documents with a fake binary payload +
    metadata (test harness for the plumbing; payload = utf-8 text bytes)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
         .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
         .otherwise(F.lit("video/mp4")).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 60000).cast("int").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real deployments plug PIL/ffmpeg here.  Deterministic fake:
    sha256 bytes -> 8 float32 'features'.  Raises for unknown types like a
    real decoder would."""
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {media_type}")
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:32], dtype=np.uint32).astype(np.float32) / np.float32(2**32))


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """decode -> feature vector, Arrow-batched.  Output:
    (doc_id, media_type, feat array<float>, n_bytes)."""
    def fn(it):
        for pdf in it:
            feats = [
                _decode_stub(p, m).tolist()
                for p, m in zip(pdf["payload"].to_numpy(), pdf["media_type"].to_numpy())
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "feat": feats,
                "n_bytes": [len(p) for p in pdf["payload"].to_numpy()],
            })
    return media.mapInPandas(fn, schema="doc_id bigint, media_type string, feat array<float>, n_bytes bigint")


def resize_images(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Aspect-preserving resize for image rows.  Target dimensions are pure
    Column math (JVM-side; never upscale, clamp longest side to
    ``max_dim``); the pixel resample itself is the STUBBED decode step —
    deterministic sha256 fake standing in for PIL/opencv, so the Spark-side
    schema/batching is real and testable without codec libraries.  Output:
    (doc_id, width, height, out_w, out_h, resized binary)."""
    imgs = media.where(F.col("media_type") == "image/png")
    scale = F.least(F.lit(1.0), F.lit(float(max_dim)) / F.greatest("width", "height"))
    planned = imgs.select(
        "doc_id", "payload", "width", "height",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale)).cast("int").alias("out_w"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale)).cast("int").alias("out_h"),
    )

    def fn(it):
        for pdf in it:
            resized = [
                # STUB resample: digest of payload + target dims
                hashlib.sha256(bytes(p) + int(w).to_bytes(4, "big") + int(h).to_bytes(4, "big")).digest()
                for p, w, h in zip(pdf["payload"], pdf["out_w"], pdf["out_h"])
            ]
            out = pdf[["doc_id", "width", "height", "out_w", "out_h"]].copy()
            out["resized"] = resized
            yield out

    return planned.mapInPandas(
        fn, schema="doc_id bigint, width int, height int, out_w int, out_h int, resized binary")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp
    (pure Column math — sequence/explode; decode of the frame itself is the
    stubbed step)."""
    vids = media.where(F.col("media_type") == "video/mp4")
    return vids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
