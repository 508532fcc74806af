"""Misra-Gries / SpaceSaving-style heavy-hitter sketch.

Scale path for the reference's top-10 frequent values
(``col.value_counts().head(10)``, Profiler.py:634,645): per-batch exact
value counts (vectorized) folded into a bounded counter map; merge sums
counters then trims to capacity, tracking the maximum undercount so the
caller knows when top-k is exact. With capacity >> k and mildly skewed
data the top-k is exact (error == 0 at test scales).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd


class HeavyHitters:
    __slots__ = ("capacity", "counts", "error")

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self.counts: Counter = Counter()
        self.error = 0  # max possible undercount of any surviving key

    @classmethod
    def from_array(cls, arr: np.ndarray, capacity: int = 512) -> "HeavyHitters":
        sk = cls(capacity)
        if arr.size == 0:
            return sk
        vals, cnts = np.unique(arr, return_counts=True)
        if len(vals) > capacity:
            # keep only the top-capacity survivors vectorized (argpartition)
            # instead of building a full Counter then trimming — the trim
            # semantics are identical: error = max dropped count
            part = np.argpartition(cnts, -capacity)
            kept, dropped = part[-capacity:], part[:-capacity]
            sk.error = int(cnts[dropped].max())
            vals, cnts = vals[kept], cnts[kept]
        sk.counts = Counter(dict(zip(vals.tolist(), cnts.tolist())))
        return sk

    @classmethod
    def from_pairs(cls, vals: list, cnts: list, capacity: int = 512) -> "HeavyHitters":
        sk = cls(capacity)
        sk.counts = Counter(dict(zip(vals, cnts)))
        sk._trim()
        return sk

    def _trim(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        items = self.counts.most_common()
        kept = items[: self.capacity]
        dropped_max = items[self.capacity][1]
        self.error = max(self.error, dropped_max)
        self.counts = Counter(dict(kept))

    def merge(self, other: "HeavyHitters") -> "HeavyHitters":
        out = HeavyHitters(self.capacity)
        out.counts = self.counts + other.counts
        out.error = self.error + other.error
        out._trim()
        return out

    def top_k(self, k: int = 10) -> list[tuple]:
        """(value, count) sorted by count desc, then value asc (deterministic)."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return items[:k]

    def finalize(self, k: int = 10) -> dict:
        return {
            "top_k": [(v, int(c)) for v, c in self.top_k(k)],
            "max_undercount": int(self.error),
            "exact": self.error == 0,
        }
