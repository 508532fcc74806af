"""Date-part histogram partial: counts by year/month/day/hour/minute/
second of a temporal column.

Reference parity: the reference renders six date-component count plots
per datetime column (Profiler.py:780-794, one ``value_counts`` per
``dt.year/.month/.day/.hour/.minute/.second``). Here each batch
contributes six tiny Counter partials (arrow ``pc`` temporal kernels +
``value_counts`` — no per-row Python), merged additively; the finalized
histograms are bounded (years span the data range; month 12, day 31,
hour 24, minute/second 60 buckets).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

PARTS = ("year", "month", "day", "hour", "minute", "second")

_KERNELS = {
    "year": pc.year,
    "month": pc.month,
    "day": pc.day,
    "hour": pc.hour,
    "minute": pc.minute,
    "second": pc.second,
}


@dataclass
class DatePartCounts:
    counts: dict = field(default_factory=lambda: {p: {} for p in PARTS})

    @classmethod
    def from_timestamp(cls, ts: pa.Array | pa.ChunkedArray) -> "DatePartCounts":
        """Build from a non-null timestamp array (any unit)."""
        out = cls()
        for part in PARTS:
            vc = pc.value_counts(_KERNELS[part](ts))
            out.counts[part] = dict(
                zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
            )
        return out

    def merge(self, o: "DatePartCounts") -> "DatePartCounts":
        out = DatePartCounts()
        for part in PARTS:
            d = dict(self.counts.get(part, {}))
            for k, v in o.counts.get(part, {}).items():
                d[k] = d.get(k, 0) + v
            out.counts[part] = d
        return out

    def finalize(self) -> dict:
        """{part: {value: count}} with values in ascending order."""
        return {
            part: {int(k): int(v) for k, v in sorted(self.counts[part].items())}
            for part in PARTS
        }
