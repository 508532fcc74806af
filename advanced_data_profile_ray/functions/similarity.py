"""String-similarity kernels for fuzzy dictionary matching — the
data-cleaning companion to the referential checks (ST4): when a fact
column's distinct values drift from a canonical catalog (typos, case
slips), nearest-neighbor edit distance maps each observed value to its
closest catalog entry.

Levenshtein here is the bit-exact classic definition (unit insert /
delete / substitute), matching DuckDB's ``levenshtein()`` so oracle
twins hash-match.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Classic unit-cost edit distance, two-row numpy DP — O(len(a))
    memory, vectorized over the inner loop's substitution/insert/delete
    minimum (no per-cell Python)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # ensure b is the shorter row for memory (symmetry)
    if len(b) > len(a):
        a, b = b, a
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(bv.size + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a):
        cav = np.uint32(ord(ca))
        cur[0] = i + 1
        sub = prev[:-1] + (bv != cav)
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # insertion needs the running minimum (left neighbor) — a scan:
        # cur[j] = min(cur[j], cur[j-1]+1) left-to-right. numpy has no
        # monotone scan kernel; do it via the classic accumulate trick
        # on (cur - j): min-accumulate of shifted costs
        shifted = cur - np.arange(bv.size + 1)
        np.minimum.accumulate(shifted, out=shifted)
        cur = shifted + np.arange(bv.size + 1)
        prev, cur = cur, prev
    return int(prev[-1])


def nearest_by_levenshtein(values: list, candidates: list):
    """For each value, the closest candidate ≠ itself by edit distance,
    ties broken by the lexicographically smallest candidate. Returns
    (nearest: list[str], dist: list[int]). All-pairs over SMALL domains
    only (dictionary-repair: |values|·|candidates| ≤ ~10^6) — callers
    extract distinct values through a distributed exchange first."""
    nearest, dists = [], []
    cands = sorted(candidates)
    for v in values:
        best, bd = None, None
        for c in cands:
            if c == v:
                continue
            d = levenshtein(v, c)
            if bd is None or d < bd:
                best, bd = c, d
        nearest.append(best)
        dists.append(bd if bd is not None else -1)
    return nearest, dists
