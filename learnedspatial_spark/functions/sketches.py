"""Similarity sketches: MinHash, SimHash — vectorized NumPy kernels.

Used by the dedup operators (operators/dedup.py).  All hashing is
deterministic (fixed 64-bit multiplicative-xor mixers, no Python ``hash``)
so results are stable across executors, sessions and Python versions.
"""

from __future__ import annotations

import numpy as np

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mixer."""
    h = h.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & MASK64
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & MASK64
    return h ^ (h >> np.uint64(31))


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct char-n-gram shingles -> uint64 hashes (FNV over bytes then
    splitmix)."""
    data = text.encode("utf-8")
    if len(data) < n:
        data = data + b"\x00" * (n - len(data))
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    k = b.shape[0] - n + 1
    idx = np.arange(k)[:, None] + np.arange(n)[None, :]
    w = b[idx]
    h = np.full(k, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = (h ^ w[:, j]) * np.uint64(0x100000001B3)
    return np.unique(_mix64(h))


def token_shingle_hashes(text: str, n_tokens: int = 4) -> np.ndarray:
    """Distinct n-token shingles -> uint64 hashes.  Token shingles (not
    char n-grams) keep candidate sets sparse on small-vocabulary corpora:
    char 3-grams of same-vocab word salad are near-identical across all
    docs and blow the LSH bucket join up to O(n^2)."""
    toks = text.split(" ")
    if len(toks) < n_tokens:
        toks = toks + [""] * (n_tokens - len(toks))
    h = np.full(len(toks) - n_tokens + 1, 0xCBF29CE484222325, dtype=np.uint64)
    tok_h = np.array([_str_fnv(t) for t in toks], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n_tokens):
            h = (h ^ tok_h[j:j + h.shape[0]]) * np.uint64(0x100000001B3)
    return np.unique(_mix64(h))


_FNV_CACHE: dict[str, int] = {}


def _str_fnv(s: str) -> int:
    v = _FNV_CACHE.get(s)
    if v is None:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        v = h
        if len(_FNV_CACHE) < 1_000_000:  # bound executor memory
            _FNV_CACHE[s] = v
    return v


def get_shingles(text: str, n: int = 4, shingler: str = "token") -> np.ndarray:
    return token_shingle_hashes(text, n) if shingler == "token" else shingle_hashes(text, n)


def minhash_signature(text: str, num_perm: int = 64, n: int = 4, shingler: str = "token") -> np.ndarray:
    """MinHash signature: min over shingles of k universal-hash families
    ``mix(h ^ seed_i)``."""
    sh = get_shingles(text, n, shingler)
    seeds = _mix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    # (num_perm, n_shingles) via broadcast xor then mix; min per row
    hs = _mix64(sh[None, :] ^ seeds[:, None])
    return hs.min(axis=1)


def band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """LSH banding: hash each band of the signature to a bucket key; near
    duplicates share >=1 band key with high probability.  Vectorized FNV
    fold across all bands at once (row-count loops, not band loops)."""
    rows = sig.shape[0] // bands
    mat = sig[: bands * rows].reshape(bands, rows)
    h = np.full(bands, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = (h ^ mat[:, r]) * np.uint64(0x100000001B3)
    return _mix64(h) ^ np.arange(bands, dtype=np.uint64)


def simhash(text: str, n: int = 3) -> np.uint64:
    """64-bit SimHash over char shingles: sign of per-bit weight sums."""
    sh = shingle_hashes(text, n)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    word = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            word |= np.uint64(1) << np.uint64(i)
    return word


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted unique shingle-hash arrays."""
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union if union else 1.0
