"""Mergeable t-digest quantile sketch (Dunning's merging digest, vectorized).

Distributed replacement for the reference's exact ``col.median()`` /
``describe()`` percentiles (Profiler.py:650,706-721) and the data behind its
box / Q-Q / CDF plots (Profiler.py:738-767): all of those are quantile reads
against this sketch, so no global sort is ever needed.

Implementation: centroids (mean, weight) kept sorted by mean; compression
assigns each centroid to a k-scale bucket ``floor(k1(q_mid))`` with
``k1(q) = delta/(2*pi) * asin(2q - 1)`` and merges buckets with
``np.add.reduceat`` — fully vectorized, no per-value Python loop.
Merge = concatenate + recompress (associative up to sketch error; exact
quantile paths are used where the test oracle demands equality).
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "min", "max")

    def __init__(self, delta: int = 300):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = math.inf
        self.max = -math.inf

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    @classmethod
    def from_array(cls, arr: np.ndarray, delta: int = 300) -> "TDigest":
        sk = cls(delta)
        if arr.size == 0:
            return sk
        x = arr.astype(np.float64, copy=False)
        lo, hi = float(x.min()), float(x.max())
        sk.min, sk.max = lo, hi
        if lo == hi:
            # constant column (e.g. fixed-width id lengths): one centroid,
            # no O(n log n) sort
            sk.means = np.array([lo])
            sk.weights = np.array([float(x.size)])
            return sk
        x = np.sort(x)
        sk.means, sk.weights = sk._compress(x, np.ones_like(x))
        return sk

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """means must be sorted ascending; returns merged (means, weights)."""
        total = weights.sum()
        if means.size <= 1 or total == 0:
            return means, weights
        cumw = np.cumsum(weights)
        q_mid = (cumw - 0.5 * weights) / total
        # k1 scale function; clip to the open interval to keep asin finite.
        qc = np.clip(2.0 * q_mid - 1.0, -1.0, 1.0)
        k = (self.delta / (2.0 * math.pi)) * np.arcsin(qc)
        bucket = np.floor(k).astype(np.int64)
        # merge runs of equal bucket ids (means are sorted, buckets monotone)
        starts = np.flatnonzero(np.diff(bucket, prepend=bucket[0] - 1))
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        return msum / wsum, wsum

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        if means.size:
            order = np.argsort(means, kind="mergesort")
            out.means, out.weights = self._compress(means[order], weights[order])
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        return out

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cumw = np.cumsum(self.weights) - 0.5 * self.weights
        if target <= cumw[0]:
            return float(self.min)
        if target >= cumw[-1]:
            return float(self.max)
        return float(np.interp(target, cumw, self.means))

    def quantiles(self, qs) -> list:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if x <= self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        total = self.weights.sum()
        cumw = np.cumsum(self.weights) - 0.5 * self.weights
        pts = np.concatenate([[self.min], self.means, [self.max]])
        cw = np.concatenate([[0.0], cumw, [total]])
        return float(np.interp(x, pts, cw) / total)

    def finalize(self) -> dict:
        return {
            "p25": self.quantile(0.25),
            "median": self.quantile(0.5),
            "p75": self.quantile(0.75),
            "p95": self.quantile(0.95),
            "p99": self.quantile(0.99),
        }
