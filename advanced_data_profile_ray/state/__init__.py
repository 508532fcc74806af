"""Mergeable sketch/state library.

Every sketch implements the ``partial / merge / finalize`` protocol from
SURVEY.md §2.10: build from a batch (numpy/Arrow), merge associatively with
another instance of the same sketch, finalize into plain-Python stats.
All sketches are picklable (they ride inside Arrow ``binary`` columns
between the partial pass and the merge pass).
"""

from .moments import Moments
from .hll import HyperLogLog
from .tdigest import TDigest
from .heavy_hitters import HeavyHitters
from .histogram import FixedHistogram
from .basic import NullBlank, MaxLen, MinMax, ValueCounts, TypeVote
from .corr import CorrState
from .dateparts import DatePartCounts

__all__ = [
    "Moments",
    "HyperLogLog",
    "TDigest",
    "HeavyHitters",
    "FixedHistogram",
    "NullBlank",
    "MaxLen",
    "MinMax",
    "ValueCounts",
    "TypeVote",
    "CorrState",
    "DatePartCounts",
]
