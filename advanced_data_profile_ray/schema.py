"""Canonical schemas + per-batch logical-type classification.

The transcript fact-table schema comes from BASELINE.json's input hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``.

Logical types reproduce the reference's ``custom_data_type``
(Profiler.py:203-220): {'empty','integer','float','string','date',
'timestamp'} with the same decision rules, but evaluated per Arrow batch
and merged across batches through the ``TypeVote`` lattice
(state/basic.py) instead of one whole-column pandas pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]


def _all_midnight(ts: pa.ChunkedArray | pa.Array) -> bool:
    """Reference rule: 'date' iff every parsed value has 00:00:00 time
    (Profiler.py:216-218)."""
    h = pc.hour(ts)
    m = pc.minute(ts)
    s = pc.second(ts)
    zero = pc.and_(pc.and_(pc.equal(h, 0), pc.equal(m, 0)), pc.equal(s, 0))
    res = pc.all(zero)
    return res.as_py() is not False  # all-null counts as True, like pandas .all()


def logical_type_of(arr: pa.ChunkedArray | pa.Array, sample_for_dates: int = 200,
                    column: str | None = None) -> str:
    """Classify one batch's column; merge across batches via TypeVote.
    ``column`` keys the worker-global date-format cache so repeat batches
    of one column try the known-winning strptime format first."""
    if len(arr) == 0 or arr.null_count == len(arr):
        return "empty"
    t = arr.type
    if pa.types.is_boolean(t) or pa.types.is_integer(t):
        # pandas is_numeric_dtype treats bool as numeric and %1==0 holds
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        vals = arr.drop_null()
        if pa.types.is_decimal(t):
            vals = pc.cast(vals, pa.float64())
        integral = pc.all(pc.equal(pc.floor(vals), vals)).as_py()
        return "integer" if integral else "float"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "date" if _all_midnight(arr.drop_null()) else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        from .functions.dates import try_parse_datetime_strings

        sample = arr.drop_null().slice(0, sample_for_dates)
        parsed = try_parse_datetime_strings(sample, column=column)
        if parsed is not None:
            return "date" if _all_midnight(parsed) else "timestamp"
        return "string"
    return "string"
