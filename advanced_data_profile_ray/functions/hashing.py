"""Content hashing / sketch signatures for deduplication.

All pure numpy over arrays of python strings; used inside ``map_batches``
bodies (stages/dedup.py). Deterministic across processes (fixed seeds;
hashes via pandas' SipHash with its fixed key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MERSENNE_P = (1 << 61) - 1


def hash_strings(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit content hash of each string."""
    return pd.util.hash_array(values.astype(object), categorize=False)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes of one document (uint64)."""
    if len(text) < k:
        shingles = [text] if text else []
    else:
        shingles = [text[i : i + k] for i in range(len(text) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        pd.util.hash_array(np.array(shingles, dtype=object), categorize=False)
    )


class MinHasher:
    """m-permutation MinHash over 64-bit shingle hashes.

    sig_i(doc) = min over shingles x of (a_i * x + b_i) mod p  (p = 2^61-1),
    the standard universal-hash construction; seeds fixed so signatures are
    identical across workers/runs.
    """

    def __init__(self, num_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, MERSENNE_P, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE_P, num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; empty docs get all-max sentinel."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (shingle_hashes % MERSENNE_P).astype(np.uint64)
        # (m, s) = (a[:,None] * x[None,:] + b[:,None]) mod p — use python-int
        # safe modmul via float128-free approach: numpy uint64 overflow is
        # mod 2^64; combined with mod p afterwards this is still a fixed
        # deterministic universal-ish hash family (standard practice for
        # minhash at scale; exactness of the family is not required).
        prod = self.a[:, None] * x[None, :] + self.b[:, None]
        return (prod % np.uint64(MERSENNE_P)).min(axis=1)

    @staticmethod
    def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(bands,) uint64 — hash of each band's slice of the signature.
    Docs sharing any band hash become LSH candidates."""
    assert bands * rows == sig.size
    view = sig.reshape(bands, rows)
    out = np.empty(bands, dtype=np.uint64)
    for i in range(bands):
        out[i] = pd.util.hash_array(view[i].copy(), categorize=False).sum() % (1 << 63)
    return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash: weighted bit votes over token hashes."""
    if token_hashes.size == 0:
        return 0
    if weights is None:
        weights = np.ones(token_hashes.size)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.float64)
    votes = (weights[:, None] * (2 * bits - 1)).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def batch_window_hashes(texts, k: int):
    """64-bit polynomial hashes of every k-byte window of every doc in an
    Arrow string array, with ZERO per-doc Python: one pass over the
    concatenated data buffer, boundary-straddling windows masked via a
    diff/cumsum range trick, splitmix64 finalizer.

    Returns (hashes, doc_idx, seg_starts):
      hashes    — uint64, all valid windows in document order,
      doc_idx   — int64 doc index per hash,
      seg_starts — int64 start offset of each doc's (possibly empty)
                   hash segment; docs shorter than k contribute ONE hash
                   of their whole content.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    C = np.uint64(0x100000001B3)  # FNV-ish odd multiplier, wrapping
    if n == 0:
        z = np.empty(0, np.int64)
        return np.empty(0, np.uint64), z, z

    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buffers = texts.buffers()
    if pa.types.is_large_string(texts.type):
        offsets = np.frombuffer(buffers[1], dtype=np.int64,
                                count=n + 1, offset=texts.offset * 8)
    else:
        offsets = np.frombuffer(buffers[1], dtype=np.int32,
                                count=n + 1, offset=texts.offset * 4).astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8)[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    L = data.size
    lens = np.diff(offsets)

    # per-doc window counts: full windows for len>=k, one whole-doc hash
    # for 0<len<k (parity with the single-doc rolling_fingerprint)
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    hashes = np.empty(total, np.uint64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

    if L >= k:
        w = np.zeros(L - k + 1, dtype=np.uint64)
        for j in range(k):
            w = w * C + data[j: L - k + 1 + j]
        delta = np.zeros(L - k + 2, dtype=np.int64)
        bad_lo = np.maximum(offsets[1:] - k + 1, offsets[:-1])
        bad_hi = np.minimum(offsets[1:], L - k + 1)
        m = bad_lo < bad_hi
        np.add.at(delta, bad_lo[m], 1)
        np.add.at(delta, bad_hi[m], -1)
        valid = np.cumsum(delta[:-1]) == 0
        full = lens >= k
        hv = splitmix64(w[valid])
        # valid windows are already in document order; they fill the
        # segments of full-length docs exactly
        fill = np.repeat(full, counts)
        hashes[fill] = hv
    short = (lens > 0) & (lens < k)
    if short.any():
        idx = np.nonzero(short)[0]
        packed = np.zeros(idx.size, dtype=np.uint64)
        for j in range(int(lens[idx].max())):
            take = offsets[idx] + j
            ok = j < lens[idx]
            packed[ok] = packed[ok] * C + data[take[ok]]
        hashes[seg_starts[idx]] = splitmix64(packed)
    return hashes, doc_idx, seg_starts


def rolling_fingerprint(text: str, window: int = 16, keep_mod: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: hash every char window and
    keep hashes ≡ 0 (mod keep_mod) — a deterministic, alignment-robust
    ~1/keep_mod subset usable for containment/near-dup detection
    (Schleimer et al., "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — mod-p selection variant)."""
    if not text:
        return np.empty(0, np.uint64)
    if len(text) < window:
        return np.unique(hash_strings(np.array([text], dtype=object)))
    wins = np.array(
        [text[i : i + window] for i in range(len(text) - window + 1)], dtype=object
    )
    h = hash_strings(wins)
    kept = h[h % np.uint64(keep_mod) == 0]
    return np.unique(kept)
