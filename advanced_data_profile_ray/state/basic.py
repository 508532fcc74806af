"""Small algebraic partials: null/blank counts, max length, min/max,
capped exact value counts, and the logical-type vote lattice.

These cover the reference's cheap per-column aggregates:
- null / non-null counts  (Profiler.py:604-605, 630-632)
- blank-vs-null split     (jinja_template.html:250-255 renders them apart;
  the north rule names "null/blank counts" as separate stats)
- max string length       (Profiler.py:591-592, 657)
- max decimal places      (Profiler.py:584-588, 652-654)
- min/max datetime        (Profiler.py:675-679)
- value histogram for entropy/categorical confidence (Profiler.py:262-282)
- logical type inference  (custom_data_type, Profiler.py:203-220)
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class NullBlank:
    total: int = 0
    null_count: int = 0
    blank_count: int = 0  # non-null strings that trim to ""

    def merge(self, o: "NullBlank") -> "NullBlank":
        return NullBlank(
            self.total + o.total,
            self.null_count + o.null_count,
            self.blank_count + o.blank_count,
        )

    def finalize(self) -> dict:
        nn = self.total - self.null_count
        return {
            "total": self.total,
            "null_count": self.null_count,
            "non_null_count": nn,
            "blank_count": self.blank_count,
            "null_pct": round(100.0 * self.null_count / self.total, 2) if self.total else 0.0,
        }


@dataclass
class MaxLen:
    max_len: int = 0
    max_decimal_places: int = 0

    def merge(self, o: "MaxLen") -> "MaxLen":
        return MaxLen(
            max(self.max_len, o.max_len),
            max(self.max_decimal_places, o.max_decimal_places),
        )


@dataclass
class MinMax:
    """Min/max over an orderable domain (numbers, timestamps-as-int64, strings)."""

    min: Any = None
    max: Any = None

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "MinMax":
        if arr.size == 0:
            return cls()
        return cls(arr.min(), arr.max())

    def merge(self, o: "MinMax") -> "MinMax":
        lo = self.min if o.min is None else (o.min if self.min is None else min(self.min, o.min))
        hi = self.max if o.max is None else (o.max if self.max is None else max(self.max, o.max))
        return MinMax(lo, hi)


@dataclass
class ValueCounts:
    """Exact value→count map, capped; degrades to overflow=True beyond cap.

    Entropy / categorical confidence (Profiler.py:262-282) and
    role-frequency drift need the full histogram; that is only sane for
    low-cardinality columns, so the cap bounds reducer memory and the
    overflow flag routes high-cardinality columns to the HLL/heavy-hitter
    sketches instead.
    """

    cap: int = 4096
    counts: Counter = field(default_factory=Counter)
    overflow: bool = False

    @classmethod
    def from_array(cls, arr: np.ndarray, cap: int = 4096) -> "ValueCounts":
        vc = cls(cap)
        if arr.size == 0:
            return vc
        vals, cnts = np.unique(arr, return_counts=True)
        if len(vals) > cap:
            vc.overflow = True
            return vc
        vc.counts = Counter(dict(zip(vals.tolist(), cnts.tolist())))
        return vc

    @classmethod
    def from_pairs(cls, vals: list, cnts: list, cap: int = 4096) -> "ValueCounts":
        """From precomputed (values, counts) — lets the batch fn reuse one
        arrow ``pc.value_counts`` call for both ValueCounts and
        HeavyHitters instead of np.unique over Python objects."""
        vc = cls(cap)
        if len(vals) > cap:
            vc.overflow = True
            return vc
        vc.counts = Counter(dict(zip(vals, cnts)))
        return vc

    def merge(self, o: "ValueCounts") -> "ValueCounts":
        out = ValueCounts(self.cap)
        out.overflow = self.overflow or o.overflow
        if not out.overflow:
            out.counts = self.counts + o.counts
            if len(out.counts) > out.cap:
                out.overflow = True
                out.counts = Counter()
        return out

    def entropy(self) -> float:
        """Shannon entropy (natural log) of the normalized value
        distribution, matching the reference's ``scipy.stats.entropy``
        over ``value_counts`` (Profiler.py:262-265)."""
        if self.overflow or not self.counts:
            return float("nan")
        p = np.array(list(self.counts.values()), dtype=np.float64)
        p = p / p.sum()
        return float(-(p * np.log(p)).sum())

    def distinct(self) -> int | None:
        return None if self.overflow else len(self.counts)


# Logical-type lattice (custom_data_type, Profiler.py:203-220):
#   empty < integer < float            (numeric branch)
#   empty < date < timestamp < string  (string branch)
# mixing the branches resolves to string.
_NUMERIC_RANK = {"empty": 0, "integer": 1, "float": 2}
_STRING_RANK = {"empty": 0, "date": 1, "timestamp": 2, "string": 3}


@dataclass
class TypeVote:
    logical_type: str = "empty"

    def merge(self, o: "TypeVote") -> "TypeVote":
        a, b = self.logical_type, o.logical_type
        if a == b:
            return TypeVote(a)
        if a == "empty":
            return TypeVote(b)
        if b == "empty":
            return TypeVote(a)
        if a in _NUMERIC_RANK and b in _NUMERIC_RANK:
            return TypeVote(a if _NUMERIC_RANK[a] >= _NUMERIC_RANK[b] else b)
        if a in _STRING_RANK and b in _STRING_RANK:
            return TypeVote(a if _STRING_RANK[a] >= _STRING_RANK[b] else b)
        return TypeVote("string")
