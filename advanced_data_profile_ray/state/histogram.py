"""Fixed-bin histogram partial (deterministic merge = vector sum).

Replaces the reference's plotly-side histograms (Profiler.py:735-736,
780-794) with explicit, fixed bin edges so per-batch partials merge
deterministically; feeds the KS / PSI drift checks required by the north
rule (turn-length and role-frequency distributions).
"""

from __future__ import annotations

import numpy as np


class FixedHistogram:
    __slots__ = ("edges", "counts", "n_below", "n_above")

    def __init__(self, edges: np.ndarray):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = np.zeros(len(self.edges) - 1, dtype=np.int64)
        self.n_below = 0
        self.n_above = 0

    @classmethod
    def from_array(cls, arr: np.ndarray, edges: np.ndarray) -> "FixedHistogram":
        h = cls(edges)
        if arr.size == 0:
            return h
        x = arr.astype(np.float64, copy=False)
        h.n_below = int((x < h.edges[0]).sum())
        h.n_above = int((x > h.edges[-1]).sum())
        inside = x[(x >= h.edges[0]) & (x <= h.edges[-1])]
        h.counts, _ = np.histogram(inside, bins=h.edges)
        return h

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        assert np.array_equal(self.edges, other.edges)
        out = FixedHistogram(self.edges)
        out.counts = self.counts + other.counts
        out.n_below = self.n_below + other.n_below
        out.n_above = self.n_above + other.n_above
        return out

    @property
    def n(self) -> int:
        return int(self.counts.sum()) + self.n_below + self.n_above

    def pdf(self) -> np.ndarray:
        total = self.n
        if total == 0:
            return np.zeros_like(self.counts, dtype=np.float64)
        return self.counts / total

    def cdf(self) -> np.ndarray:
        """CDF evaluated at the right edge of each bin (includes n_below)."""
        total = self.n
        if total == 0:
            return np.zeros_like(self.counts, dtype=np.float64)
        return (self.n_below + np.cumsum(self.counts)) / total

    def finalize(self) -> dict:
        return {
            "edges": self.edges.tolist(),
            "counts": self.counts.tolist(),
            "n_below": self.n_below,
            "n_above": self.n_above,
        }
