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


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_id_a < vec_id_b) with
    cosine >= threshold.  Exact baseline = self cross join with the same
    JVM fold as :func:`brute_cosine_topk` (DuckDB-bit-comparable, so the
    pair set is oracle-checkable).  Scale path at 100 TB = LSH-bucketed
    candidates (``lsh_bucket_topk`` machinery) or IVF cluster-local pairs
    (``ivf_topk`` assignment) so only same-bucket pairs are scored."""
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"))
    j = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    return (j.where(_cosine_col("ea", "eb") >= threshold)
            .select("vec_id_a", "vec_id_b"))


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


# ----------------------------------------------------------- IVF ANN ---

def _kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int = 8,
                 seed: int = 8128) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the IVF coarse
    quantizer).  Centroids are L2-normalized so assignment by max dot
    product == max cosine for normalized probes."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    idx = rng.choice(n, size=min(n_centroids, n), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, dim: int = 64,
             sample_rows: int = 4096, seed: int = 8128) -> DataFrame:
    """IVF approximate top-k: a coarse k-means quantizer (fit on a bounded
    deterministic driver sample — the only driver-side state, O(centroids x
    dim)) routes every vector to its nearest centroid ("inverted list");
    each query probes only its ``n_probe`` nearest lists.  At 100 TB the
    inverted-list id is the shuffle/partition key, the centroid matrix is a
    tiny broadcast, and per-query work drops from corpus-size to
    ~n_probe/n_centroids of it.  Output schema matches brute_cosine_topk;
    recall < 1 by design (tested with a recall floor, not equality)."""
    # deterministic sample: limit without ordering varies across runs /
    # partitionings, which would make centroids (hence recall) run-dependent
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64)
         for r in emb.select("vec_id", "embedding").orderBy("vec_id")
         .limit(sample_rows).select("embedding").collect()])
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = _kmeans_lite(sample, n_centroids, seed=seed)

    def assign_fn(col: str, topn: int):
        def fn(it):
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.stack(pdf[col].to_numpy()).astype(np.float64)
                mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                sims = mn @ cent.T
                lists = np.argsort(-sims, axis=1, kind="stable")[:, :topn]
                base = pdf[[c for c in pdf.columns if c != col]]
                frames = []
                for j in range(topn):
                    f = base.copy()
                    f["list_id"] = lists[:, j].astype(np.int64)
                    f[col] = pdf[col]
                    frames.append(f)
                yield pd.concat(frames)
        return fn

    emb_l = emb.select("vec_id", "embedding").mapInPandas(
        assign_fn("embedding", 1), schema="vec_id bigint, list_id bigint, embedding array<float>")
    q_l = queries.mapInPandas(
        assign_fn("qvec", n_probe), schema="query_id bigint, list_id bigint, qvec array<float>")
    j = emb_l.join(F.broadcast(q_l), "list_id")
    scored = j.select("query_id", "vec_id", _cosine_col("embedding", "qvec").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("bigint").alias("rnk"), "vec_id"))
