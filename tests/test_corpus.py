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
