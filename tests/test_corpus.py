"""Semantic tests for the corpus-pipeline ops (operators/corpus.py):
decontamination flags real overlap, vocabulary stats match a Python
count, and mix sampling is the deterministic md5-bucket rule."""
import hashlib
from collections import Counter

import pytest

from learnedspatial_spark.operators import corpus

SF_DIR = "/root/testdata/sf0.001"


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint")


def test_contamination_flags_copied_text(spark):
    eval_text = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (7, eval_text, "en", len(eval_text)),               # eval doc (7 % 101 == 7)
        (1, "prefix " + eval_text[:40] + " suffix", "en", 53),  # copies 40 chars -> many shared 18-grams
        (2, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk", "en", 47),  # unrelated
    ]
    out = corpus.contamination_hits(_docs_df(spark, rows)).collect()
    flagged = {r["doc_id"]: r["n_hit_grams"] for r in out}
    assert 1 in flagged
    # 40-char copied window holds 40-18+1 = 23 distinct 18-grams
    assert flagged[1] == 23
    assert 2 not in flagged
    assert 7 not in flagged  # eval docs are excluded from the training side


def test_contamination_threshold(spark):
    eval_text = "abcdefghijklmnopqrstuvwxyz0123456789 abcdefghijklmnopqrstuvwxyz"
    rows = [
        (7, eval_text, "en", len(eval_text)),
        # exactly 20 chars of overlap -> 3 distinct 18-grams == min_hits
        (1, "XX" + eval_text[:20] + "YYqrstuvzzzz", "en", 34),
        # 19 chars -> 2 grams, below min_hits
        (2, "XX" + eval_text[:19] + "YYqrstuvzzzz", "en", 33),
    ]
    out = {r["doc_id"]: r["n_hit_grams"]
           for r in corpus.contamination_hits(_docs_df(spark, rows)).collect()}
    assert out == {1: 3}


def test_contamination_words_flags_shared_phrases(spark):
    """Word-level decontamination (the scale path): shared word 3-grams
    flag, and windows are WORD-aligned — a char-level overlap that does
    not cover whole words contributes nothing."""
    eval_text = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (7, eval_text, "en", len(eval_text)),
        # copies 5 consecutive words -> 3 distinct 3-grams >= min_hits(2)
        (1, "prefix quick brown fox jumps over suffix words here", "en", 51),
        # one shared 3-gram only -> below min_hits
        (2, "the quick brown elephant sits still near a pond", "en", 48),
        (3, "zz yy xx ww vv uu tt ss rr qq", "en", 29),
    ]
    out = {r["doc_id"]: r["n_hit_grams"]
           for r in corpus.contamination_hits_words(_docs_df(spark, rows)).collect()}
    assert out == {1: 3}
    # min_hits=1 admits the single-gram doc too
    out1 = {r["doc_id"]: r["n_hit_grams"]
            for r in corpus.contamination_hits_words(
                _docs_df(spark, rows), min_hits=1).collect()}
    assert out1 == {1: 3, 2: 1}


def test_vocab_stats_match_python(spark):
    rows = [
        (1, "Alpha beta  beta GAMMA", "en", 22),
        (2, "alpha\tgamma gamma gamma", "en", 23),
        (3, " beta ", "en", 6),
    ]
    out = {r["tok"]: (r["cnt"], r["df"])
           for r in corpus.vocab_stats_topk(_docs_df(spark, rows)).collect()}
    cnt, df = Counter(), Counter()
    for _, text, _, _ in rows:
        toks = [t for t in text.lower().split() if t]
        cnt.update(toks)
        df.update(set(toks))
    assert out == {t: (cnt[t], df[t]) for t in cnt}


def test_vocab_topk_boundary_deterministic(spark):
    # 4 tokens tied at cnt=1: top-2 must be the lexicographically first two
    rows = [(1, "dd bb cc aa", "en", 11)]
    out = [r["tok"] for r in corpus.vocab_stats_topk(_docs_df(spark, rows), k=2).collect()]
    assert out == ["aa", "bb"]


def test_mix_sample_rule_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r["doc_id"]: (r["lang"], r["band"], r["bucket"])
           for r in corpus.mix_sample(docs).collect()}
    expect = {}
    for row in docs.select("doc_id", "lang", "n_chars").collect():
        band = min(row["n_chars"] // 100, 5)
        rate = max({"en": 60, "de": 40}.get(row["lang"], 25) - 5 * band, 10)
        bucket = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:6], 16) % 100
        if bucket < rate:
            expect[row["doc_id"]] = (row["lang"], band, bucket)
    assert got == expect
    assert len(got) > 0


def test_mix_sample_deterministic_across_runs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, corpus.mix_sample(docs).collect()))
    b = sorted(map(tuple, corpus.mix_sample(docs).collect()))
    assert a == b


def _py_repetition(text, n=2):
    ws = text.strip().lower().split()
    grams = ([" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
             if len(ws) >= n else [" ".join(ws)])
    c = Counter(grams)
    return (len(grams), max(c.values()), sum(v for v in c.values() if v >= 2))


def test_repetition_stats_match_python(spark):
    rows = [
        (1, "a b a b a b c", "en", 13),          # heavy 2-gram repetition
        (2, "one two three four five", "en", 23),  # all distinct
        (3, "solo", "en", 4),                     # shorter than n
        (4, "x x x x", "en", 7),                  # single repeated gram
    ]
    out = {r["doc_id"]: (r["n_grams"], r["top_gram_cnt"], r["dup_gram_cnt"])
           for r in corpus.repetition_stats(_docs_df(spark, rows), n=2).collect()}
    assert out == {d: _py_repetition(t) for d, t, _, _ in rows}
    # doc 1: grams (a b, b a, a b, b a, a b, b c) -> top 'a b'=3, dup 3+2
    assert out[1] == (6, 3, 5)
    assert out[2] == (4, 1, 0)
    assert out[3] == (1, 1, 0)   # truncated single window


def test_span_dedup_flags_cross_document_copies(spark):
    span = " ".join(f"w{i}" for i in range(16))       # one full 16-word chunk
    uniq = " ".join(f"u{i}" for i in range(16))
    rows = [
        (1, span + " " + uniq, "en", 0),   # chunk0 == doc 2's chunk0, chunk1 unique
        (2, span, "en", 0),                # whole doc is the shared span
        (3, "totally different words here", "en", 0),  # 1 short chunk, unique
        (4, span + " " + span, "en", 0),   # self-repeat also counts as dup
    ]
    out = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
           for r in corpus.span_dedup_stats(_docs_df(spark, rows)).collect()}
    assert out == {1: (2, 1), 2: (1, 1), 3: (1, 0), 4: (2, 2)}


def test_repetition_span_adversarial_cross_engine_parity(spark):
    """NULL text, vertical tab (Java \\s vs RE2 \\s disagree on U+000B),
    tab/newline edges, all-whitespace: the Spark ops and their DuckDB
    oracle twins must agree row-for-row (the latent divergences a \\s-based
    tokenizer would have)."""
    import duckdb
    import pandas as pd
    from learnedspatial_spark import entrylib

    rows = [
        (1, None, "en", 0),                    # NULL text
        (2, "", "en", 0),                      # empty text
        (3, "   \t\n", "en", 3),               # all whitespace
        (4, "x a\x0bb y x a\x0bb y", "en", 13),  # vertical tab inside words
        (5, "\tx y\n", "en", 5),               # non-space edge whitespace
        (6, "a b a b a b", "en", 11),          # plain repetition control
        # eval-split doc (7 % 101 == 7) sharing vertical-tab-separated
        # phrases with doc 4: flags doc 4 iff BOTH engines split \x0b
        (7, "x a\x0bb y p q", "en", 13),
    ]
    sdf = _docs_df(spark, rows)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "n_chars"]))
    for name, op in (("repetition_stats", corpus.repetition_stats),
                     ("span_dedup_stats", corpus.span_dedup_stats),
                     # word-level decontamination shares the tokenizer and
                     # must survive the same adversarial whitespace (both
                     # sides run the default min_hits=2; doc 4 shares two
                     # vertical-tab-separated 3-grams with eval doc 7, so
                     # the join is exercised non-trivially)
                     ("contamination_hits_words", corpus.contamination_hits_words)):
        got = sorted(tuple(r) for r in op(sdf).collect())
        want = sorted(tuple(r) for r in con.sql(entrylib.oracle_sql()[name]).fetchall())
        assert got == want, (name, got, want)
    con.close()
