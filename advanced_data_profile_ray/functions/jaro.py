"""Jaro-Winkler string similarity, vectorized ACROSS pairs.

The classic Jaro matching loop is inherently sequential over character
positions (greedy first-unmatched-in-window assignment), but nothing
forces it to be sequential over PAIRS: this kernel loops over the <= L
character positions of the padded char matrices while every step runs
as a numpy boolean operation over all N pairs at once — the same
"loop over the short axis, vectorize the long one" shape as the
suite's edit-distance verify (dedup.edit_distance_pairs_ds). Semantics
are pinned to DuckDB's ``jaro_winkler_similarity`` (Winkler boost only
when jaro > 0.7, prefix weight 0.1, prefix capped at 4), verified
case-by-case in tests/test_similarity.py.

Fuzzy string scoring is the entity-resolution capability the reference
profiler approaches only through its exact duplicate flag
(Profiler.py:541); see SURVEY.md §2.7.
"""
from __future__ import annotations

import numpy as np

__all__ = ["jaro_winkler_pairs", "jaro_winkler_scalar"]


def _char_matrix(strings, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, width) int16 UTF-8 BYTE matrix padded with -1, plus byte
    lengths. Byte (not codepoint) semantics deliberately: DuckDB's
    jaro_winkler_similarity walks UTF-8 bytes, and the oracle twin
    must agree on multi-byte text too (verified by the é cases in the
    fuzz test)."""
    n = len(strings)
    out = np.full((n, width), -1, np.int16)
    lens = np.zeros(n, np.int64)
    for i, s in enumerate(strings):
        bs = s.encode("utf-8")
        ls = len(bs)
        lens[i] = ls
        if ls:
            out[i, :ls] = np.frombuffer(bs, dtype=np.uint8)
    return out, lens


def jaro_winkler_pairs(a_strings, b_strings) -> np.ndarray:
    """Jaro-Winkler similarity for each (a_strings[i], b_strings[i]).

    Returns float64 of the same length. Any empty side scores 0.0
    (including empty-vs-empty — DuckDB's convention, unlike some
    textbook variants that score two empties 1.0).
    """
    a_strings = ["" if s is None else str(s) for s in a_strings]
    b_strings = ["" if s is None else str(s) for s in b_strings]
    n = len(a_strings)
    if n == 0:
        return np.zeros(0, np.float64)
    wa = max(1, max(len(s.encode("utf-8")) for s in a_strings))
    wb = max(1, max(len(s.encode("utf-8")) for s in b_strings))
    A, la = _char_matrix(a_strings, wa)
    B, lb = _char_matrix(b_strings, wb)

    md = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    a_matched = np.zeros((n, wa), bool)
    b_matched = np.zeros((n, wb), bool)
    for i in range(wa):
        active = la > i
        if not active.any():
            break
        ai = A[:, i]
        lo = np.maximum(0, i - md)
        hi = np.minimum(lb, i + md + 1)
        found = np.zeros(n, bool)
        for j in range(int(lo.min()), int(hi.max()) if n else 0):
            if j >= wb:
                break
            ok = (active & ~found & (j >= lo) & (j < hi)
                  & ~b_matched[:, j] & (B[:, j] == ai))
            if ok.any():
                b_matched[ok, j] = True
                a_matched[ok, i] = True
                found |= ok

    m = a_matched.sum(axis=1).astype(np.int64)

    # Transpositions: matched chars of a in position order vs matched
    # chars of b in position order — scatter each into a rank-indexed
    # matrix (rank = cumulative matched count) and compare.
    max_m = int(m.max()) if n else 0
    t = np.zeros(n, np.int64)
    if max_m:
        seq_a = np.full((n, max_m), -1, np.int32)
        seq_b = np.full((n, max_m), -2, np.int32)
        rank_a = np.cumsum(a_matched, axis=1) - 1
        rank_b = np.cumsum(b_matched, axis=1) - 1
        rows_a, cols_a = np.nonzero(a_matched)
        seq_a[rows_a, rank_a[rows_a, cols_a]] = A[rows_a, cols_a]
        rows_b, cols_b = np.nonzero(b_matched)
        seq_b[rows_b, rank_b[rows_b, cols_b]] = B[rows_b, cols_b]
        valid = np.arange(max_m)[None, :] < m[:, None]
        t = ((seq_a != seq_b) & valid).sum(axis=1).astype(np.int64) // 2

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)

    # Winkler prefix boost: common prefix length (<= 4), applied only
    # when jaro > 0.7 — DuckDB's convention.
    pw = min(4, wa, wb)
    if pw:
        eq = (A[:, :pw] == B[:, :pw]) & (A[:, :pw] >= 0)
        # length of the leading all-True run
        ell = np.where(eq.all(axis=1), pw, eq.argmin(axis=1)).astype(
            np.float64)
    else:
        ell = np.zeros(n, np.float64)
    boost = jaro > 0.7
    return np.where(boost, jaro + ell * 0.1 * (1.0 - jaro), jaro)


def jaro_winkler_scalar(a: str, b: str) -> float:
    """Reference scalar implementation (used by tests as a cross-check
    of the vectorized kernel; O(len^2) per pair). Operates on UTF-8
    bytes, matching DuckDB."""
    a = a.encode("utf-8")
    b = b.encode("utf-8")
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    md = max(max(la, lb) // 2 - 1, 0)
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i, ca in enumerate(a):
        for j in range(max(0, i - md), min(lb, i + md + 1)):
            if not bm[j] and b[j] == ca:
                bm[j] = True
                am[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        ell = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            ell += 1
        jaro = jaro + ell * 0.1 * (1.0 - jaro)
    return jaro
