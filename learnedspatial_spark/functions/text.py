"""Text-analysis functions for web-scale training-data pipelines.

New engine surface (the reference has no string functions at all,
SURVEY.md §2.8); required as first-class components for the 100 TB
training-data use case: language ID, quality scoring, token counting,
document fingerprinting.

Design rule: everything here is either (a) pure built-in Column
expressions (JVM, whole-stage codegen) or (b) batched NumPy inside pandas
UDFs.  The Column variants use only replace/length arithmetic so the
DuckDB oracle computes bit-identical values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker tokens: per-language function-word hit scores.  Scores
# are raw length deltas (multiples of marker length) — integer-exact in
# both engines, no division.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "pt": [" o ", " e ", " os "],
}
LANG_ORDER = ["en", "de", "fr", "es", "pt"]  # deterministic tie priority

STOPWORDS = [" the ", " a ", " and ", " of ", " to "]


def occurrence_score_sql(text_expr: str, marker: str) -> str:
    """length(text) - length(replace(text, marker, '')) — #occurrences x
    len(marker); integer, identical in Spark SQL and DuckDB."""
    esc = marker.replace("'", "''")
    return f"(length({text_expr}) - length(replace({text_expr}, '{esc}', '')))"


def token_count_sql(text_expr: str) -> str:
    """Whitespace token count = #single-space splits (split keeps empty
    strings in both engines — verified identical)."""
    return f"({occurrence_score_sql(text_expr, ' ')} + 1)"


def token_count_col(text: Column) -> Column:
    return F.size(F.split(text, " ", -1))


def quality_score_sql(text_expr: str) -> str:
    """Heuristic quality score from stopword mass, punctuation and length:
    ``(stop_mass * 1000 + dots * 10 + commas * 10) / nchars`` — one float64
    division of integers, bit-identical across engines."""
    stop = " + ".join(occurrence_score_sql(text_expr, s) for s in STOPWORDS)
    dots = occurrence_score_sql(text_expr, ".")
    commas = occurrence_score_sql(text_expr, ",")
    return (f"((({stop}) * 1000 + ({dots}) * 10 + ({commas}) * 10)"
            f" / cast(greatest(length({text_expr}), 1) as double))")


def langid_sql(text_expr: str) -> str:
    """N-gram/marker-heuristic language ID: argmax of per-language marker
    mass with deterministic priority tie-break (LANG_ORDER)."""
    scores = {
        lang: "(" + " + ".join(occurrence_score_sql(text_expr, m) for m in ms) + ")"
        for lang, ms in LANG_MARKERS.items()
    }
    expr = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1:]
        cond = " and ".join(f"{scores[lang]} >= {scores[o]}" for o in later)
        expr = f"(case when {cond} then '{lang}' else {expr} end)"
    return expr


def fingerprint_md5_sql(text_expr: str) -> str:
    """Full-document fingerprint: md5 hex (identical in both engines)."""
    return f"md5({text_expr})"


# ------------------------------------------------- NumPy/pandas kernels ---

def rolling_hash_np(texts: pd.Series, window: int = 16, mod: int = (1 << 61) - 1, base: int = 257) -> np.ndarray:
    """Rabin-Karp rolling-hash document fingerprint: min rolling hash over
    byte windows (a robust content-defined fingerprint; engine-only surface,
    checked rows-only by the driver)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.to_numpy()):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if b.shape[0] < window:
            h = np.uint64(0)
            for c in b:
                h = (h * np.uint64(base) + c) % np.uint64(mod)
            out[i] = h
            continue
        # rolling windows via cumulative polynomial trick (vectorized)
        powers = np.array([pow(base, window - 1 - j, mod) for j in range(window)], dtype=np.uint64)
        n_win = b.shape[0] - window + 1
        idx = np.arange(n_win)[:, None] + np.arange(window)[None, :]
        h = (b[idx].astype(np.object_) * powers[None, :].astype(np.object_)).sum(axis=1) % mod
        out[i] = np.uint64(h.min())
    return out


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Character shingles for Jaccard/minhash dedup."""
    if len(text) < n:
        return {text}
    return {text[i:i + n] for i in range(len(text) - n + 1)}
