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
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot_col(a: str, b: str) -> F.Column:
    """Sequential-fold dot product (matches DuckDB's list_inner_product
    left fold bit-for-bit — the property the oracle gate relies on)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _sq_norm_col(col: str) -> F.Column:
    """Squared L2 norm as the same sequential fold.  Computed ONCE PER ROW
    (projected below the join) in every cosine path: higher-order-function
    folds evaluate INTERPRETED in Spark 4 with no common-subexpression
    reuse, so a per-pair cosine expression that mentions each norm twice
    (guard + value) pays FOUR norm folds per candidate pair — measured
    ~1.3x on embedding_neardup_lsh, and the gap grows with candidates per
    bucket.  Per-row projection leaves exactly one dot fold per pair."""
    return F.aggregate(F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _cosine_guarded(dot: F.Column, na: F.Column, nb: F.Column) -> F.Column:
    """Guarded cosine from a dot column and two PRECOMPUTED squared-norm
    columns: a zero-norm vector would make 0.0/0.0 = NaN, and NaN sorts
    GREATER than every number in both Spark and DuckDB — the zero vector
    would pass every >= threshold filter and take rank 1 in every top-k,
    and the oracle gate could not catch it (same NaN order both sides).
    Undefined direction ranks last instead: sentinel -2 < every real
    cosine.  The DuckDB twins mirror this exact arithmetic
    (entrylib._duck_cos); projecting the norms per row changes no value —
    it is the same fold, computed once."""
    return (F.when((na > F.lit(0.0)) & (nb > F.lit(0.0)),
                   dot / (F.sqrt(na) * F.sqrt(nb)))
            .otherwise(F.lit(-2.0)))


#: Row ceiling for the deliberately-all-pairs validation twins.  They are
#: the exact small-scale baselines of graded bucketed paths (LSH/IVF) —
#: correct at any size, but a cross join over a production corpus is a
#: plan nobody should run by accident.  100k rows keeps every test/bench
#: scale (sf0.001-0.1: <= 10k embeddings) far under the gate.
ALL_PAIRS_MAX_ROWS = 100_000


def _guard_all_pairs(emb: DataFrame, what: str, force: bool) -> DataFrame:
    """Fail fast when an all-pairs validation twin is pointed at a corpus
    too large for a cross join; returns the (possibly cached) input to use.

    The probe is a LIMIT-bounded count — CollectLimit short-circuits after
    ceiling+1 rows, so the guard stays cheap on exactly the
    production-size inputs it exists to refuse (a bare count() would scan
    the whole corpus first).  The probe is still one extra JOB over the
    upstream plan, so unless the input is already cached it is persisted
    FIRST: the probe's partial evaluation lands in the cache and the
    cross join that follows (which rescans its build side per stream
    partition anyway) reuses it instead of re-executing an arbitrarily
    expensive upstream pipeline.  Anything that passes the guard is
    <= ALL_PAIRS_MAX_ROWS rows, so the cache footprint is bounded by the
    same ceiling.  ``force=True`` skips probe and cache untouched —
    the explicit operator override."""
    if force:
        return emb
    cached_here = False
    if emb.storageLevel.useMemory or emb.storageLevel.useDisk:
        probe = emb  # caller already manages caching
    else:
        probe = emb.persist()
        cached_here = True
    if probe.limit(ALL_PAIRS_MAX_ROWS + 1).count() > ALL_PAIRS_MAX_ROWS:
        if cached_here:
            probe.unpersist()
        raise ValueError(
            f"{what} is the exact ALL-PAIRS validation twin (cross join, "
            f"O(n^2)): refusing > {ALL_PAIRS_MAX_ROWS} rows.  Use the "
            f"bucketed scale path (lsh_bucket_topk / ivf_topk / "
            f"embedding_neardup_lsh), or pass force=True to insist.")
    return probe


def brute_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                      force: bool = False) -> DataFrame:
    """Exact top-k by cosine: (query_id, rnk, vec_id).  ``queries``:
    (query_id, qvec array<float/double>).  Broadcast the query side —
    candidate side streams; one window per query for top-k.  Guarded
    against production-size corpora (see :func:`_guard_all_pairs`)."""
    emb = _guard_all_pairs(emb, "brute_cosine_topk", force)
    e = emb.withColumn("n2e", _sq_norm_col("embedding"))
    q = queries.withColumn("n2q", _sq_norm_col("qvec"))
    j = e.crossJoin(F.broadcast(q))
    scored = j.select(
        "query_id", "vec_id",
        _cosine_guarded(_dot_col("embedding", "qvec"),
                        F.col("n2e"), F.col("n2q")).alias("cos"))
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


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                            force: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_id_a < vec_id_b) with
    cosine >= threshold.  Exact baseline = self cross join with the same
    JVM fold as :func:`brute_cosine_topk` (DuckDB-bit-comparable, so the
    pair set is oracle-checkable).  Scale path at 100 TB = LSH-bucketed
    candidates (``lsh_bucket_topk`` machinery) or IVF cluster-local pairs
    (``ivf_topk`` assignment) so only same-bucket pairs are scored.
    Guarded against production-size corpora (see :func:`_guard_all_pairs`)."""
    emb = _guard_all_pairs(emb, "embedding_neardup_pairs", force)
    e = emb.select("vec_id", "embedding", _sq_norm_col("embedding").alias("n2"))
    a = e.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"),
                 F.col("n2").alias("n2a"))
    b = e.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"),
                 F.col("n2").alias("n2b"))
    j = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    return (j.where(_cosine_guarded(_dot_col("ea", "eb"),
                                    F.col("n2a"), F.col("n2b")) >= threshold)
            .select("vec_id_a", "vec_id_b"))


# ----------------------------------------------------------- LSH ANN ---

def _hyperplanes(dim: int, n_planes: int, seed: int = 8128) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def dot_literal_expr(col: str, weights: list[float]) -> str:
    """Sequential-fold dot product of an array column with a literal vector
    — ``aggregate(zip_with(...))`` folds left-to-right JVM-side, matching
    DuckDB's ``list_inner_product`` bit-for-bit (the property the oracle
    gate relies on)."""
    from ..sqlcompat import flit
    arr = "array(" + ", ".join(flit(w) for w in weights) + ")"
    return (f"aggregate(zip_with({col}, {arr}, (x, p) -> cast(x as double) * p), "
            f"cast(0 as double), (acc, v) -> acc + v)")


def lsh_bucket_expr(col: str, planes: list[list[float]]) -> str:
    """Random-hyperplane bucket id: bit j set iff dot(v, plane_j) > 0.
    Pure Column expression over literal planes — identical in DuckDB with
    list_inner_product."""
    from ..sqlcompat import flit
    zero = flit(0.0)
    terms = " + ".join(
        f"(case when ({dot_literal_expr(col, p)}) > {zero} then {1 << j} else 0 end)"
        for j, p in enumerate(planes))
    return f"cast({terms} as bigint)"


def lsh_bucket_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                    n_planes: int = 8, dim: int = 64, seed: int = 8128) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets; probe only the
    query's bucket.  Recall < 1 by design — the scale path when brute force
    is too expensive; same output schema as brute_cosine_topk.  Bucketing
    and scoring are pure JVM folds over literal planes, so the whole query
    has an exact DuckDB twin (entrylib)."""
    planes = _hyperplanes(dim, n_planes, seed).tolist()
    emb_b = (emb.withColumn("bucket", F.expr(lsh_bucket_expr("embedding", planes)))
             .withColumn("n2e", _sq_norm_col("embedding")))
    q_b = (queries.withColumn("bucket", F.expr(lsh_bucket_expr("qvec", planes)))
           .withColumn("n2q", _sq_norm_col("qvec")))
    j = emb_b.join(F.broadcast(q_b), "bucket")
    scored = j.select("query_id", "vec_id",
                      _cosine_guarded(_dot_col("embedding", "qvec"),
                                      F.col("n2e"), F.col("n2q")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("bigint").alias("rnk"), "vec_id"))


def embedding_neardup_lsh(emb: DataFrame, threshold: float = 0.9,
                          n_planes: int = 8, dim: int = 64, seed: int = 8128) -> DataFrame:
    """Bucketed embedding near-dup pairs — the 100 TB path GRADED by the
    contract: candidates only form inside one hyperplane bucket (equi-join
    on bucket, never a corpus x corpus nested-loop join), refined by the
    exact cosine fold.  Recall < 1 vs the all-pairs baseline by design
    (:func:`embedding_neardup_pairs` is the small-scale validation twin);
    the DuckDB oracle reproduces the identical bucketing, so the pair set
    is exact-checkable."""
    from ..sqlcompat import flit
    planes = _hyperplanes(dim, n_planes, seed).tolist()
    emb_b = (emb.withColumn("bucket", F.expr(lsh_bucket_expr("embedding", planes)))
             .withColumn("n2", _sq_norm_col("embedding")))
    a = emb_b.select("bucket", F.col("vec_id").alias("vec_id_a"),
                     F.col("embedding").alias("ea"), F.col("n2").alias("n2a"))
    b = emb_b.select("bucket", F.col("vec_id").alias("vec_id_b"),
                     F.col("embedding").alias("eb"), F.col("n2").alias("n2b"))
    return (a.join(b, "bucket")
            .where(F.col("vec_id_a") < F.col("vec_id_b"))
            .where(_cosine_guarded(_dot_col("ea", "eb"), F.col("n2a"), F.col("n2b"))
                   >= F.expr(flit(threshold)))
            # each vector lives in exactly one bucket -> pairs already unique
            .select("vec_id_a", "vec_id_b"))


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


def ivf_fit_centroids(sample: np.ndarray, n_centroids: int, seed: int = 8128) -> list[list[float]]:
    """Normalize the sample and run the deterministic mini k-means.  Shared
    by the engine (Spark-collected sample) and the oracle builder
    (DuckDB-fetched sample) — both hand in the same float64 rows, so the
    centroid literals match bit-for-bit."""
    sample = np.asarray(sample, dtype=np.float64)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    return _kmeans_lite(sample, n_centroids, seed=seed).tolist()


def ivf_scores_expr(col: str, centroids: list[list[float]]) -> str:
    """Array of fold dot products against the literal centroid matrix."""
    return "array(" + ", ".join(dot_literal_expr(col, c) for c in centroids) + ")"


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             sample_rows: int = 4096, seed: int = 8128,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: a coarse k-means quantizer (fit on a bounded
    deterministic driver sample — the only driver-side state, O(centroids x
    dim)) routes every vector to its nearest centroid ("inverted list");
    each query probes only its ``n_probe`` nearest lists.  At 100 TB the
    inverted-list id is the shuffle/partition key, the centroid matrix is a
    tiny literal broadcast, and per-query work drops from corpus-size to
    ~n_probe/n_centroids of it.  Assignment/probing are pure JVM folds over
    the centroid literals (argmax of raw dot products — scale-invariant, so
    no per-vector normalization is needed), giving the whole query an exact
    DuckDB twin.  Output schema matches brute_cosine_topk; recall < 1 by
    design (tested with a recall floor, not equality)."""
    if centroids is None:
        # deterministic sample: limit without ordering varies across runs /
        # partitionings, which would make centroids run-dependent
        sample = np.stack(
            [np.asarray(r[0], dtype=np.float64)
             for r in emb.select("vec_id", "embedding").orderBy("vec_id")
             .limit(sample_rows).select("embedding").collect()])
        centroids = ivf_fit_centroids(sample, n_centroids, seed)
    emb_l = (emb.select("vec_id", "embedding")
             .withColumn("scores", F.expr(ivf_scores_expr("embedding", centroids)))
             .withColumn("list_id",
                         F.expr("cast(array_position(scores, array_max(scores)) - 1 as bigint)"))
             .drop("scores")
             .withColumn("n2e", _sq_norm_col("embedding")))
    q_l = (queries
           .withColumn("scores", F.expr(ivf_scores_expr("qvec", centroids)))
           .withColumn("n2q", _sq_norm_col("qvec"))
           .select("query_id", "qvec", "n2q", F.posexplode("scores").alias("c", "s"))
           .withColumn("r", F.row_number().over(
               Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("c"))))
           .where(F.col("r") <= n_probe)
           .select("query_id", F.col("c").cast("bigint").alias("list_id"), "qvec", "n2q"))
    j = emb_l.join(F.broadcast(q_l), "list_id")
    scored = j.select("query_id", "vec_id",
                      _cosine_guarded(_dot_col("embedding", "qvec"),
                                      F.col("n2e"), F.col("n2q")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("bigint").alias("rnk"), "vec_id"))
