"""Similarity search over the ``embeddings`` table (array<float> column).

Baseline: brute-force cosine top-k as pure Column expressions —
``aggregate(zip_with(...))`` folds sequentially JVM-side, giving the same
float64 left-fold DuckDB's ``list_cosine_similarity(double[])`` computes,
so results are bit-comparable for the correctness gate.

Scale path: LSH-bucketed ANN (random-hyperplane signs -> bucket join) so
the 100 TB case probes one bucket (+ optional neighbor buckets) instead of
the full corpus; brute-force refine inside buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine_col(a: str, b: str) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                     F.lit(0.0), lambda acc, v: acc + v)
    nb = F.aggregate(F.transform(b, lambda x: x.cast("double") * x.cast("double")),
                     F.lit(0.0), lambda acc, v: acc + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def brute_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k by cosine: (query_id, rnk, vec_id).  ``queries``:
    (query_id, qvec array<float/double>).  Broadcast the query side —
    candidate side streams; one window per query for top-k."""
    j = emb.crossJoin(F.broadcast(queries))
    scored = j.select(
        "query_id", "vec_id", _cosine_col("embedding", "qvec").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("bigint").alias("rnk"), "vec_id"))


def query_vectors(spark: SparkSession, sf_dir: str, n: int = 8) -> DataFrame:
    """Deterministic query set: the first n embeddings by vec_id (so the
    DuckDB oracle can reconstruct them from the same table)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (emb.orderBy("vec_id").limit(n)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")))


# ----------------------------------------------------------- LSH ANN ---

def _hyperplanes(dim: int, n_planes: int, seed: int = 8128) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                    n_planes: int = 8, dim: int = 64, seed: int = 8128) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets; probe only the
    query's bucket.  Recall < 1 by design — the scale path when brute force
    is too expensive; same output schema as brute_cosine_topk."""
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket_fn(col: str):
        def fn(it):
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.stack(pdf[col].to_numpy()).astype(np.float64)
                signs = (m @ planes.T) > 0
                b = np.zeros(m.shape[0], dtype=np.int64)
                for j in range(n_planes):
                    b |= signs[:, j].astype(np.int64) << j
                out = pdf[[c for c in pdf.columns if c != col]].copy()
                out["bucket"] = b
                out[col] = pdf[col]
                yield out
        return fn

    emb_b = emb.mapInPandas(bucket_fn("embedding"),
                            schema="vec_id bigint, label int, bucket bigint, embedding array<float>")
    q_b = queries.mapInPandas(bucket_fn("qvec"),
                              schema="query_id bigint, bucket bigint, qvec array<float>")
    j = emb_b.join(F.broadcast(q_b), "bucket")
    scored = j.select("query_id", "vec_id", _cosine_col("embedding", "qvec").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("bigint").alias("rnk"), "vec_id"))
