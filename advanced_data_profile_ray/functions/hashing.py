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
