"""Distribution-drift statistics: two-sample KS over fixed-bin histograms
and PSI over categorical frequency vectors.

The reference's distribution-fitting + KS code is dead
(Profiler.py:365-392, commented out); the north rule resurrects it as the
drift operator: KS on the turn-length histogram, PSI on role frequencies,
both computed from mergeable partials (FixedHistogram / ValueCounts) —
never from raw rows.
"""

from __future__ import annotations

import math

import numpy as np

from ..state.basic import ValueCounts
from ..state.histogram import FixedHistogram


def ks_statistic(current: FixedHistogram, baseline: FixedHistogram) -> float:
    """Two-sample KS statistic approximated at the shared bin edges
    (exact for the binned distributions; bins are fixed engine-wide so
    this is deterministic)."""
    assert np.array_equal(current.edges, baseline.edges), "histograms must share edges"
    if current.n == 0 or baseline.n == 0:
        return float("nan")
    return float(np.max(np.abs(current.cdf() - baseline.cdf())))


def ks_pvalue(d: float, n1: int, n2: int) -> float:
    """Asymptotic two-sample KS p-value (Kolmogorov distribution tail,
    standard series approximation)."""
    if not (d == d) or n1 == 0 or n2 == 0:
        return float("nan")
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam < 1e-9:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = ((-1) ** (k - 1)) * math.exp(-2.0 * (k * lam) ** 2)
        s += term
        if abs(term) < 1e-10:
            break
    return max(0.0, min(1.0, 2.0 * s))


def psi_from_counts(current: dict, baseline: dict, eps: float = 1e-4) -> float:
    """Population Stability Index over two categorical count maps.
    Categories = union of keys; zero shares are floored at ``eps``."""
    keys = sorted(set(current) | set(baseline), key=str)
    if not keys:
        return float("nan")
    c = np.array([current.get(k, 0) for k in keys], dtype=np.float64)
    b = np.array([baseline.get(k, 0) for k in keys], dtype=np.float64)
    if c.sum() == 0 or b.sum() == 0:
        return float("nan")
    p = np.maximum(c / c.sum(), eps)
    q = np.maximum(b / b.sum(), eps)
    return float(((p - q) * np.log(p / q)).sum())


def psi_from_histograms(current: FixedHistogram, baseline: FixedHistogram,
                        eps: float = 1e-4) -> float:
    assert np.array_equal(current.edges, baseline.edges)
    c = dict(enumerate(current.counts.tolist()))
    b = dict(enumerate(baseline.counts.tolist()))
    c[-1], c[len(current.counts)] = current.n_below, current.n_above
    b[-1], b[len(baseline.counts)] = baseline.n_below, baseline.n_above
    return psi_from_counts(c, b, eps)


def psi_from_value_counts(current: ValueCounts, baseline: ValueCounts,
                          eps: float = 1e-4) -> float:
    if current.overflow or baseline.overflow:
        return float("nan")
    return psi_from_counts(dict(current.counts), dict(baseline.counts), eps)


def exact_ks_from_value_counts(current: dict, baseline: dict) -> float:
    """EXACT two-sample KS from full per-value count maps — identical to
    the raw-sample statistic whenever the value domain is bounded enough
    for exact counts (low-cardinality columns; the continuous path stays
    ks_statistic over fixed-bin sketches). max over the union domain of
    |ECDF1 - ECDF2| evaluated at each distinct value."""
    keys = sorted(set(current) | set(baseline))
    if not keys:
        return float("nan")
    c = np.array([current.get(k, 0) for k in keys], dtype=np.float64)
    b = np.array([baseline.get(k, 0) for k in keys], dtype=np.float64)
    if c.sum() == 0 or b.sum() == 0:
        return float("nan")
    return float(np.max(np.abs(np.cumsum(c) / c.sum() - np.cumsum(b) / b.sum())))
