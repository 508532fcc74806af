"""Distributed as-of join (latest right row at-or-before each left row).

Ray Data has no join primitive for this; the scale shape here is the
standard sort-based as-of:

1. Tag both sides and UNION into skinny rows
   (key, time, side, left-id, right-payload) — side orders right(0)
   before left(1) so equal-time right rows are visible to left rows
   (SQL ASOF ``right.t <= left.t`` semantics).
2. ONE sort by (key, time, side) — the only exchange.
3. Per sorted block: vectorized last-right forward fill
   (np.maximum.accumulate over right positions), reset at key-run
   boundaries; every left row whose key-run begins inside the block is
   fully resolved in the task.
4. Left rows at the head of a block whose key straddles the boundary
   resolve through a driver carry scan over per-block boundary tuples
   (last right payload per block-tail key — 1 tiny row per block),
   exactly like ``window.sessionize_events`` stitches row numbers.

Reference has no joins at all (Profiler.py is single-table); this is a
training-data-pipeline extension named by the driver brief (as-of join)
with a DuckDB ``ASOF LEFT JOIN`` oracle twin in queries.ORACLE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fast_ops import run_bounds as _run_bounds


def tag_union_sorted(left_ds, right_ds, left_key: str, right_key: str,
                     left_time: str, right_time: str, left_id: str):
    """Shared prologue for the two-sided time operators (as-of join,
    range-count join): tag both sides into skinny (k, t, side, lid) rows
    — side 0 = right, 1 = left, so equal-time right rows sort before the
    left rows that may match them — union, right-size tiny-block inputs,
    and ONE sort by (k, t, side). Returns the materialized sorted
    Dataset."""
    import ray.data as rd  # noqa: F401 (documented return type)

    from .fast_ops import rightsize_blocks

    def _tag_left(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(batch[left_key], pa.int64()),
            "t": pc.cast(pc.cast(batch[left_time], pa.timestamp("us")), pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, np.int8)),
            "lid": pc.cast(batch[left_id], pa.int64()),
        })

    def _tag_right(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(batch[right_key], pa.int64()),
            "t": pc.cast(pc.cast(batch[right_time], pa.timestamp("us")), pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int8)),
            "lid": pa.nulls(batch.num_rows, pa.int64()),
        })

    tagged = left_ds.select_columns([left_key, left_time, left_id]).map_batches(
        _tag_left, batch_format="pyarrow"
    ).union(right_ds.select_columns([right_key, right_time]).map_batches(
        _tag_right, batch_format="pyarrow"
    ))
    try:
        rows = left_ds.count() + right_ds.count()  # metadata-only on reads
    except Exception:
        rows = None
    return rightsize_blocks(tagged, rows=rows).sort(["k", "t", "side"]).materialize()


def asof_join_latest(left_ds, right_ds, left_key: str, right_key: str,
                     left_time: str, right_time: str, left_id: str):
    """For every left row: the latest ``right_time`` with the same key
    and ``right_time <= left_time`` (null when none). Returns a Dataset
    of (``left_id``, ``asof_ts``) rows.

    Times are compared as timestamp[us]; both time columns are cast.
    """
    import ray
    import ray.data as rd

    s = tag_union_sorted(left_ds, right_ds, left_key, right_key,
                         left_time, right_time, left_id)
    refs = s.to_arrow_refs()
    out_schema = pa.schema([("lid", pa.int64()), ("asof_ts", pa.timestamp("us"))])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def _bounds(block: pa.Table):
        """(first_key, last_key, last right time of last_key in block or
        None, n_rows) — the carry alphabet."""
        n = block.num_rows
        if n == 0:
            return (None, None, None, 0)
        k = block["k"].to_numpy()
        side = block["side"].to_numpy()
        t = block["t"].to_numpy()
        tail = (k == k[-1]) & (side == 0)
        last_rt = int(t[tail][-1]) if tail.any() else None
        return (int(k[0]), int(k[-1]), last_rt, n)

    @ray.remote
    def _resolve(block: pa.Table, carry_ts):
        """Emit (lid, asof_ts) for the block's left rows; ``carry_ts`` is
        the latest right time of the block's FIRST key from prior blocks
        (or None)."""
        if block.num_rows == 0:
            return out_schema.empty_table()
        k = block["k"].to_numpy()
        side = block["side"].to_numpy()
        t = block["t"].to_numpy()
        n = k.size
        ridx = np.where(side == 0, np.arange(n), -1)
        last_right = np.maximum.accumulate(ridx)
        starts, widths = _run_bounds(k)
        run_start = np.repeat(starts, widths)
        resolved = last_right >= run_start
        left_mask = side == 1
        out_t = np.full(n, np.iinfo(np.int64).min, np.int64)
        ok = left_mask & resolved
        out_t[ok] = t[np.maximum(last_right[ok], 0)]
        # unresolved left rows in the FIRST run fall back to the carry;
        # unresolved rows of later runs have complete in-block history →
        # genuinely no match (null)
        null_mask = left_mask & ~resolved
        if carry_ts is not None and n and widths.size:
            first_run = np.arange(n) < widths[0]
            use_carry = null_mask & first_run
            out_t[use_carry] = carry_ts
            null_mask = null_mask & ~first_run
        lids = block["lid"].filter(pa.array(left_mask))
        vals = pa.array(out_t[left_mask].view("datetime64[us]"))
        nulls = pa.array(null_mask[left_mask])
        return pa.table({
            "lid": lids,
            "asof_ts": pc.if_else(nulls, pa.scalar(None, pa.timestamp("us")), vals),
        })

    infos = ray.get([_bounds.remote(r) for r in refs])
    carries, carry_key, carry_ts = [], object(), None
    for first, last, last_rt, n in infos:
        if n == 0:
            carries.append(None)
            continue
        carries.append(carry_ts if first == carry_key else None)
        if last_rt is not None:
            carry_key, carry_ts = last, last_rt
        elif first == last:
            # single-key block with no right rows: carry flows through
            if first != carry_key:
                carry_key, carry_ts = last, None
        else:
            carry_key, carry_ts = last, None
    out_refs = [_resolve.remote(r, c) for r, c in zip(refs, carries)]
    return rd.from_arrow_refs(out_refs)


def asof_join_next(left_ds, right_ds, left_key: str, right_key: str,
                   left_time: str, right_time: str, left_id: str):
    """FORWARD as-of: for every left row, the EARLIEST ``right_time``
    with the same key and ``right_time >= left_time`` (null when none) —
    the scheduling/"next event after" twin of ``asof_join_latest``.

    Implemented by TIME NEGATION: t → −t turns "earliest at-or-after"
    into "latest at-or-before" (equality included on both readings), so
    the backward machinery — one sort, vectorized last-right fill,
    O(blocks) carry stitch — is reused verbatim and the output negates
    back. Returns a Dataset of (``left_id`` as lid, asof_ts) rows."""

    def _negate(col):
        def _f(batch: pa.Table) -> pa.Table:
            t = pc.multiply(
                pc.cast(pc.cast(batch[col], pa.timestamp("us")), pa.int64()),
                pa.scalar(-1, pa.int64()))
            return batch.set_column(batch.schema.get_field_index(col),
                                    col, t)
        return _f

    out = asof_join_latest(
        left_ds.map_batches(_negate(left_time), batch_format="pyarrow"),
        right_ds.map_batches(_negate(right_time), batch_format="pyarrow"),
        left_key, right_key, left_time, right_time, left_id)

    def _unneg(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.multiply(pc.cast(batch["asof_ts"], pa.int64()),
                                pa.scalar(-1, pa.int64())),
                    pa.timestamp("us"))
        return pa.table({"lid": batch["lid"], "asof_ts": t})

    return out.map_batches(_unneg, batch_format="pyarrow")
