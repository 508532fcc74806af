"""Windowed / partitioned-order operators (row_number, sessionization).

Ray Data has no window functions. The naive portable pattern —
``groupby(key).map_groups(fn)`` — pays Ray's ~50µs/row Python reduce and
lands every hot key on one reducer. The scale path used here instead:

1. ONE global ``sort`` by (partition_key, *order_keys) — the only
   exchange; range partitioning spreads hot keys across block boundaries.
2. Per sorted block, row numbers are computed vectorized from the key's
   run boundaries (np.arange - repeat of segment starts): zero per-row
   Python.
3. A partition that straddles block edges is stitched by a driver carry
   scan over per-block boundary tuples (first/last key + segment sizes —
   2 tiny rows per block, never the data), exactly like
   ``fast_ops.sorted_groupby`` stitches edge groups.

Raw block-ref tasks (not map_batches) are used for steps 2-3 because
map_batches exposes no block ordinal, and the carry offset is per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _carry_offsets(infos: list) -> list:
    """Driver stitch: running row-count carry for partitions straddling
    consecutive sorted blocks. ``infos`` rows: (first_key, last_key,
    n_first_seg, n_last_seg, n_total) per block, in sorted block order.
    In sorted data first_key == last_key ⟹ the whole block is one
    partition, so the carry accumulates across any number of blocks."""
    offsets = []
    carry_key, carry_n = object(), 0  # sentinel unequal to any key
    for first, last, n_first, n_last, n_total in infos:
        if n_total == 0:
            offsets.append(0)
            continue
        off = carry_n if first == carry_key else 0
        offsets.append(off)
        if first == last:
            carry_key, carry_n = last, off + n_total
        else:
            carry_key, carry_n = last, n_last
    return offsets


def _run_bounds(keys: np.ndarray):
    """(starts, widths) of equal-key runs — shared impl in fast_ops."""
    from .fast_ops import run_bounds

    return run_bounds(keys)


def _block_row_numbers(keys: np.ndarray, offset: int, start: int) -> np.ndarray:
    """Vectorized per-partition row numbers for one sorted block; the
    first segment continues from ``offset`` rows in previous blocks."""
    starts, widths = _run_bounds(keys)
    n = keys.size
    rn = np.arange(n, dtype=np.int64) - np.repeat(starts, widths) + start
    if n and offset:
        rn[: widths[0]] += offset
    return rn


def row_number_within(ds, partition_key: str, order_keys: list, out_col: str = "row_number",
                      start: int = 0):
    """SQL ``ROW_NUMBER() OVER (PARTITION BY partition_key ORDER BY
    order_keys) - 1 + start`` as a distributed operator (see module doc)."""
    import ray
    import ray.data as rd

    s = ds.sort([partition_key] + order_keys).materialize()
    refs = s.to_arrow_refs()  # sorted block order
    if not refs:
        return s.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )

    @ray.remote
    def _bounds(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0, 0)
        k = block[partition_key].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        return (k[0], k[-1], int(widths[0]), int(widths[-1]), n)

    # zero-row blocks (the sort emits them for heavily-duplicated keys)
    # carry an EMPTY per-block schema — build their replacement from the
    # dataset schema instead of touching block columns
    empty_out = pa.schema(
        list(s.schema().base_schema) + [pa.field(out_col, pa.int64())]
    ).empty_table()

    @ray.remote
    def _number(block: pa.Table, offset: int):
        if block.num_rows == 0:
            return empty_out
        k = block[partition_key].to_numpy(zero_copy_only=False)
        rn = _block_row_numbers(k, offset, start)
        return block.append_column(out_col, pa.array(rn, pa.int64()))

    infos = ray.get([_bounds.remote(r) for r in refs])
    offsets = _carry_offsets(infos)
    out_refs = [_number.remote(r, off) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def windowed_count(ds, part_col: str, ts_col: str, id_col: str,
                   window_us: int):
    """Time-range windowed aggregate: for every row, the number of rows
    of the same partition with ``ts`` in ``[ts - window, ts]`` — SQL
    ``COUNT(*) OVER (PARTITION BY part ORDER BY ts RANGE BETWEEN
    <window> PRECEDING AND CURRENT ROW)`` including equal-``ts`` peers
    (all of them, exactly like RANGE framing).

    Distributed shape: ONE sort by (part, ts, id); partitions interior
    to a sorted block compute their counts vectorized in the block task
    (two searchsorted per run); the ≤2 partitions touching each block's
    edges ship their skinny (part, ts, id) rows to the driver and are
    counted there after stitching — same edge discipline as
    sessionize_events. Returns a Dataset of (id, n_window) rows.
    """
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    try:
        rows = ds.count()  # metadata-only on the raw read, pre-projection
    except Exception:
        rows = None
    s = rightsize_blocks(ds.select_columns([part_col, ts_col, id_col]),
                         rows=rows).sort(
        [part_col, ts_col, id_col]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "n_window": pa.array([], pa.int64())}))
    # types come from the DATASET schema: zero-row blocks (possible after
    # a repartition) carry an empty per-block schema
    ds_schema = s.schema().base_schema
    id_t = ds_schema.field(id_col).type
    edge_schema = pa.schema([(part_col, ds_schema.field(part_col).type),
                             (ts_col, ds_schema.field(ts_col).type),
                             (id_col, id_t)])

    def _run_counts(ts: np.ndarray, starts: np.ndarray, widths: np.ndarray,
                    lo_run: int, hi_run: int):
        """Window counts for rows of runs [lo_run, hi_run); ts int64,
        sorted within each run."""
        outs = []
        for r in range(lo_run, hi_run):
            a, b = starts[r], starts[r] + widths[r]
            seg = ts[a:b]
            left = np.searchsorted(seg, seg - window_us, side="left")
            right = np.searchsorted(seg, seg, side="right")  # peers included
            outs.append(right - left)
        return outs

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        empty = pa.table({"id": pa.array([], id_t),
                          "n_window": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty, edge_schema.empty_table()
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        starts, widths = _run_bounds(k)
        n_runs = starts.size
        counts = _run_counts(ts, starts, widths, 1, n_runs - 1)
        interior_idx = np.concatenate(
            [np.arange(starts[r], starts[r] + widths[r])
             for r in range(1, n_runs - 1)]) if n_runs > 2 else np.array([], np.int64)
        inner = pa.table({
            "id": block[id_col].take(pa.array(interior_idx, pa.int64())),
            "n_window": pa.array(
                np.concatenate(counts) if counts else np.array([], np.int64),
                pa.int64()),
        }) if interior_idx.size else empty
        edge_idx = []
        for r in {0, n_runs - 1}:
            edge_idx.extend(range(int(starts[r]), int(starts[r] + widths[r])))
        edge = block.select([part_col, ts_col, id_col]).take(
            pa.array(edge_idx, pa.int64()))
        return inner, edge

    @ray.remote
    def _edge_stitch(*tables):
        """Edge runs re-assemble + count in a TASK, never on the driver —
        a hot partition straddling many blocks stays off driver heap."""
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return pa.table({"id": pa.array([], id_t),
                             "n_window": pa.array([], pa.int64())})
        et = pa.concat_tables(nonempty).sort_by(
            [(part_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")])
        k = et[part_col].to_numpy(zero_copy_only=False)
        ts = et[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        starts, widths = _run_bounds(k)
        counts = _run_counts(ts, starts, widths, 0, starts.size)
        return pa.table({
            "id": et[id_col],
            "n_window": pa.array(np.concatenate(counts), pa.int64()),
        })

    results = [_block.remote(r) for r in refs]
    inner_refs = [r[0] for r in results]
    edge_ref = _edge_stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs(inner_refs + [edge_ref])


def range_count_join(left_ds, right_ds, left_key: str, right_key: str,
                     left_time: str, right_time: str, left_id: str,
                     window_us: int):
    """Range join (count form): for every left row, the number of right
    rows with the same key and time in ``[left_t, left_t + window)`` —
    SQL ``LEFT JOIN r ON r.k = l.k AND r.t >= l.t AND r.t < l.t + w``
    grouped per left row.

    Same distributed shape as windowed_count/asof_join_latest: tag+union
    both sides into skinny rows, ONE sort by (key, time, side), interior
    key-runs count vectorized in block tasks (two searchsorted against
    the run's right times), edge runs stitch on the driver.
    Returns a Dataset of (id, n_range) rows, one per left row.
    """
    import ray
    import ray.data as rd

    from .asof import tag_union_sorted

    s = tag_union_sorted(left_ds, right_ds, left_key, right_key,
                         left_time, right_time, left_id)
    refs = s.to_arrow_refs()
    out_schema = pa.schema([("id", pa.int64()), ("n_range", pa.int64())])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    def _count_runs(k, t, side, starts, widths, lo_run, hi_run):
        """(ids-not-needed) per-run counts for left rows of runs
        [lo_run, hi_run); returns (left_index_parts, count_parts).

        NOTE: a window is only complete for runs fully inside the block —
        callers route edge runs through the driver stitch. Unlike the
        trailing-window count, this looks FORWARD, so a run's tail could
        in principle need the next block; but since runs here are whole
        key-runs (interior to the block), all of the key's rows are
        present and the forward window is complete."""
        idx_parts, cnt_parts = [], []
        for r in range(lo_run, hi_run):
            a, b = starts[r], starts[r] + widths[r]
            seg_t = t[a:b]
            seg_side = side[a:b]
            rt = seg_t[seg_side == 0]
            lmask = seg_side == 1
            lt = seg_t[lmask]
            lo = np.searchsorted(rt, lt, side="left")
            hi = np.searchsorted(rt, lt + window_us, side="left")
            idx_parts.append(np.flatnonzero(lmask) + a)
            cnt_parts.append(hi - lo)
        return idx_parts, cnt_parts

    ds_schema = s.schema().base_schema  # zero-row blocks have empty schemas
    edge_schema = pa.schema([(f, ds_schema.field(f).type)
                             for f in ("k", "t", "side", "lid")])

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return out_schema.empty_table(), edge_schema.empty_table()
        k = block["k"].to_numpy()
        t = block["t"].to_numpy()
        side = block["side"].to_numpy()
        starts, widths = _run_bounds(k)
        n_runs = starts.size
        idx_parts, cnt_parts = _count_runs(k, t, side, starts, widths, 1, n_runs - 1)
        if idx_parts and sum(p.size for p in idx_parts):
            idx = np.concatenate(idx_parts)
            inner = pa.table({
                "id": block["lid"].take(pa.array(idx, pa.int64())),
                "n_range": pa.array(np.concatenate(cnt_parts), pa.int64()),
            })
        else:
            inner = out_schema.empty_table()
        edge_idx = []
        for r in {0, n_runs - 1}:
            edge_idx.extend(range(int(starts[r]), int(starts[r] + widths[r])))
        return inner, block.take(pa.array(edge_idx, pa.int64()))

    @ray.remote
    def _edge_stitch(*tables):
        """Edge runs re-assemble + count in a TASK, never on the driver —
        a hot partition straddling many blocks stays off driver heap."""
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [("k", "ascending"), ("t", "ascending"), ("side", "ascending")])
        k = et["k"].to_numpy()
        t = et["t"].to_numpy()
        side = et["side"].to_numpy()
        starts, widths = _run_bounds(k)
        idx_parts, cnt_parts = _count_runs(k, t, side, starts, widths, 0, starts.size)
        if not idx_parts or not sum(p.size for p in idx_parts):
            return out_schema.empty_table()
        idx = np.concatenate(idx_parts)
        return pa.table({
            "id": et["lid"].take(pa.array(idx, pa.int64())),
            "n_range": pa.array(np.concatenate(cnt_parts), pa.int64()),
        })

    results = [_block.remote(r) for r in refs]
    inner_refs = [r[0] for r in results]
    edge_ref = _edge_stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs(inner_refs + [edge_ref])


_SESSION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _shape_transcript_block(block: pa.Table, rn: np.ndarray) -> pa.Table:
    """Arrow-vectorized projection of a numbered events block into the
    transcript layout (conv_id from user_id, role/tool from event_type)."""
    ev = block["event_type"]
    if isinstance(ev, pa.ChunkedArray):
        ev = ev.combine_chunks()
    evn = ev.to_numpy(zero_copy_only=False)
    role = np.full(evn.size, "user", dtype=object)
    role[evn == "signup"] = "system"
    role[evn == "purchase"] = "assistant"
    err = evn == "error"
    role[err] = "tool"
    tool = np.where(err, evn, None)
    conv = pc.binary_join_element_wise(
        pa.scalar("c"),
        pc.utf8_lpad(pc.cast(block["user_id"], pa.string()), 8, padding="0"),
        pa.scalar(""),
    )
    return pa.table(
        {
            "conv_id": pc.cast(conv, pa.string()),
            "turn_idx": pa.array(rn.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pc.cast(block["props"], pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pc.cast(block["ts"], pa.timestamp("us")),
        }
    )


def sessionize_events(ds):
    """Derive the transcript fact table from the ``events`` table —
    deterministic and SQL-expressible (window-function twin in
    queries.ORACLE): conv_id from user_id, turn_idx by event order
    within user, role/tool mapped from event_type, text from props.

    One sort exchange; numbering + projection are fused into a single
    vectorized task per sorted block, so the output is ALREADY ordered by
    (conv_id, turn_idx): conv_id is order-isomorphic to user_id (zero-pad)
    and turn_idx follows the physical (ts, event_id) order within user.
    """
    import ray
    import ray.data as rd

    s = ds.sort(["user_id", "ts", "event_id"]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(_SESSION_SCHEMA.empty_table())

    @ray.remote
    def _bounds(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0, 0)
        k = block["user_id"].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        return (k[0], k[-1], int(widths[0]), int(widths[-1]), n)

    @ray.remote
    def _number_and_shape(block: pa.Table, offset: int):
        if block.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        k = block["user_id"].to_numpy(zero_copy_only=False)
        rn = _block_row_numbers(k, offset, start=0)
        return _shape_transcript_block(block, rn)

    infos = ray.get([_bounds.remote(r) for r in refs])
    # downstream consumers (queries.q_transcripts) rely on conv_id
    # ('c' + lpad(user_id, 8)) being ORDER-ISOMORPHIC to user_id, which
    # holds only for 0 <= user_id < 10^8 (utf8_lpad does not truncate, so
    # a 9-digit id or a '-' sign would break lexicographic order). The
    # sorted-block bounds are already on the driver — validate for free.
    nonempty = [(first, last) for first, last, _, _, n in infos if n]
    if nonempty:
        lo, hi = nonempty[0][0], nonempty[-1][1]
        if lo is not None and (int(lo) < 0 or int(hi) >= 10**8):
            raise ValueError(
                f"sessionize_events: user_id range [{lo}, {hi}] outside "
                "[0, 10^8) — conv_id zero-padding to 8 digits would not be "
                "order-isomorphic to user_id; widen the pad width")
    offsets = _carry_offsets(infos)
    out_refs = [_number_and_shape.remote(r, off) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
