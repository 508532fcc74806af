"""Streaming central moments (n, mean, M2..M4, min, max, sum).

Replaces the reference's whole-column pandas calls — ``describe()`` /
``skew()`` / ``kurtosis()`` (Profiler.py:706-726) — with an algebraic
partial that merges across batches via the Chan/Pébay pairwise-update
formulas. ``finalize`` applies pandas' sample-bias corrections so results
match ``pd.Series.skew()`` / ``.kurtosis()`` / ``.std()`` exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Moments:
    n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    m4: float = 0.0
    min: float = math.inf
    max: float = -math.inf
    # Exact accumulated sum (Neumaier-compensated across merges).  The
    # incremental ``mean`` drifts ulps from plain sum/n, which flips a
    # 6-dp round against DuckDB's AVG(); ``avg`` derives from this sum.
    xsum: float = 0.0
    xc: float = 0.0

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "Moments":
        """Build from a 1-D numeric numpy array; NaNs must be pre-dropped."""
        n = int(arr.size)
        if n == 0:
            return cls()
        x = arr.astype(np.float64, copy=False)
        mean = float(x.mean())
        d = x - mean
        d2 = d * d
        # 80-bit accumulation, stored as a double-double pair: the batch
        # partial is exact to ~1e-19 relative, so the merged total collapses
        # to the correctly-rounded double sum (fsum semantics).
        ld = x.astype(np.longdouble).sum()
        xs = float(ld)
        return cls(
            n=n,
            mean=mean,
            m2=float(d2.sum()),
            m3=float((d2 * d).sum()),
            m4=float((d2 * d2).sum()),
            min=float(x.min()),
            max=float(x.max()),
            xsum=xs,
            xc=float(ld - xs),
        )

    def merge(self, o: "Moments") -> "Moments":
        if o.n == 0:
            return self
        if self.n == 0:
            return o
        na, nb = self.n, o.n
        n = na + nb
        delta = o.mean - self.mean
        d_n = delta / n
        mean = self.mean + d_n * nb
        m2 = self.m2 + o.m2 + delta * d_n * na * nb
        m3 = (
            self.m3
            + o.m3
            + (delta ** 3) * na * nb * (na - nb) / (n * n)
            + 3.0 * delta * (na * o.m2 - nb * self.m2) / n
        )
        m4 = (
            self.m4
            + o.m4
            + (delta ** 4) * na * nb * (na * na - na * nb + nb * nb) / (n ** 3)
            + 6.0 * (delta ** 2) * (na * na * o.m2 + nb * nb * self.m2) / (n * n)
            + 4.0 * delta * (na * o.m3 - nb * self.m3) / n
        )
        # Neumaier-compensated sum: exact regardless of merge order, so
        # the finalized avg rounds identically to a single plain sum.
        s = self.xsum + o.xsum
        if abs(self.xsum) >= abs(o.xsum):
            c = self.xc + o.xc + ((self.xsum - s) + o.xsum)
        else:
            c = self.xc + o.xc + ((o.xsum - s) + self.xsum)
        return Moments(
            n=n, mean=mean, m2=m2, m3=m3, m4=m4,
            min=min(self.min, o.min), max=max(self.max, o.max),
            xsum=s, xc=c,
        )

    # ---- finalized statistics ------------------------------------------

    @property
    def sum(self) -> float:
        return self.xsum + self.xc

    @property
    def avg(self) -> float:
        """Mean derived from the exact sum — matches SQL AVG() = SUM()/COUNT()."""
        return (self.xsum + self.xc) / self.n if self.n else float("nan")

    def var(self, ddof: int = 1) -> float:
        if self.n - ddof <= 0:
            return float("nan")
        return self.m2 / (self.n - ddof)

    def std(self, ddof: int = 1) -> float:
        v = self.var(ddof)
        return math.sqrt(v) if v == v else float("nan")

    def skew(self) -> float:
        """Sample-adjusted Fisher-Pearson G1 (matches pandas .skew())."""
        n = self.n
        if n < 3 or self.m2 <= 0:
            return float("nan")
        g1 = (self.m3 / n) / (self.m2 / n) ** 1.5
        return g1 * math.sqrt(n * (n - 1)) / (n - 2)

    def kurtosis(self) -> float:
        """Sample-adjusted excess kurtosis G2 (matches pandas .kurtosis())."""
        n = self.n
        if n < 4 or self.m2 <= 0:
            return float("nan")
        g2 = (self.m4 / n) / (self.m2 / n) ** 2 - 3.0
        return ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))

    def finalize(self) -> dict:
        return {
            "count": self.n,
            "mean": self.avg,
            "std": self.std(),
            "min": self.min if self.n else float("nan"),
            "max": self.max if self.n else float("nan"),
            "sum": self.sum,
            "skew": self.skew(),
            "kurtosis": self.kurtosis(),
        }
