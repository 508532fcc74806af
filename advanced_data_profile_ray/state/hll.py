"""HyperLogLog cardinality sketch (dense, numpy registers).

Distributed replacement for the reference's exact ``col.nunique()``
(Profiler.py:633) at scales where an exact distinct count would shuffle the
whole column. Standard HLL (Flajolet et al. 2007) with linear-counting
small-range correction; merge = elementwise register max, which is
associative and commutative so partials merge in any order.

Hashing: numeric arrays via ``pandas.util.hash_array`` (SipHash, fixed
key); string arrays via polars' vectorized xxhash-family ``Series.hash``
(~50× faster than pandas on multi-KB strings — pandas walks Python
objects, polars hashes the Arrow buffers directly). Both deterministic
across processes within one environment. POLARS_MAX_THREADS is pinned to
1 before first import so Ray workers (1 CPU each) don't oversubscribe.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd


def _polars():
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a numpy array (any dtype)."""
    if values.dtype == object:
        pl = _polars()
        return pl.Series(values.astype(str)).hash(seed=0).to_numpy()
    return pd.util.hash_array(values, categorize=False)


def hash64_arrow(arr) -> np.ndarray:
    """64-bit hash of a pyarrow (chunked) array without materializing
    Python strings (polars reads the Arrow buffers zero-copy)."""
    pl = _polars()
    return pl.from_arrow(arr).hash(seed=0).to_numpy()


_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @classmethod
    def from_hashes(cls, hashes: np.ndarray, p: int = 12) -> "HyperLogLog":
        sk = cls(p)
        sk.update_hashes(hashes)
        return sk

    @classmethod
    def from_array(cls, arr: np.ndarray, p: int = 12) -> "HyperLogLog":
        return cls.from_hashes(hash64(arr), p)

    def update_hashes(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        w = h >> np.uint64(self.p)
        # rho = number of leading zeros in the (64-p)-bit word + 1
        #     = (64 - p) - bit_length(w) + 1.
        # w < 2**52 for p >= 12, so float64 conversion is exact and
        # np.frexp's exponent equals bit_length.
        bits = np.frexp(w.astype(np.float64))[1]  # 0 for w == 0
        rho = ((64 - self.p) - bits + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * math.log(m / zeros)  # linear counting
        return float(e)

    def finalize(self) -> dict:
        return {"distinct_estimate": self.estimate()}
