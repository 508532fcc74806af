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
    """Driver stitch: running additive-measure carry for partitions
    straddling consecutive sorted blocks. ``infos`` rows: (first_key,
    last_key, m_first_seg, m_last_seg, m_total) per block, in sorted
    block order, where m is ANY additive measure — row counts for
    row_number, value sums for running_sum. Empty blocks are flagged by
    ``first_key is None`` (a nonempty block's measure may legitimately
    total zero). In sorted data first_key == last_key ⟹ the whole block
    is one partition, so the carry accumulates across any number of
    blocks."""
    offsets = []
    carry_key, carry_n = object(), 0  # sentinel unequal to any key
    for first, last, n_first, n_last, n_total in infos:
        if first is None:
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


def ntile_within(ds, part_col: str, order_keys: list, id_col: str,
                 n_buckets: int):
    """SQL ``NTILE(n) OVER (PARTITION BY part ORDER BY order_keys)`` as
    a distributed operator. NTILE needs BOTH the row number and the
    TOTAL partition size (the remainder rows go to the leading buckets),
    so the driver's bounds scan — which already yields row-number
    offsets — additionally accumulates the full size of every partition
    touching a block edge; interior partitions size locally. O(blocks)
    driver traffic. Returns a Dataset of (id, ntile) rows.
    """
    import ray
    import ray.data as rd

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), ("ntile", pa.int64())]).empty_table())
    base = s.schema().base_schema
    id_t = base.field(id_col).type
    out_schema = pa.schema([("id", id_t), ("ntile", pa.int64())])

    @ray.remote
    def _bounds(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0, 0)
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        return (k[0], k[-1], int(widths[0]), int(widths[-1]), n)

    @ray.remote
    def _tile(block: pa.Table, offset: int, first_total, last_total):
        if block.num_rows == 0:
            return out_schema.empty_table()
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        rn = _block_row_numbers(k, offset, start=0)
        sizes_per_run = widths.astype(np.int64).copy()
        sizes_per_run[0] = first_total
        sizes_per_run[-1] = last_total
        sizes = np.repeat(sizes_per_run, widths)
        q, r = sizes // n_buckets, sizes % n_buckets
        cut = r * (q + 1)
        bucket = np.where(rn < cut, rn // np.maximum(q + 1, 1),
                          r + (rn - cut) // np.maximum(q, 1)) + 1
        return pa.table({"id": block[id_col],
                         "ntile": pa.array(bucket, pa.int64())})

    infos = ray.get([_bounds.remote(r) for r in refs])
    offsets = _carry_offsets(infos)
    # full sizes of every partition that touches a block edge: each
    # block contributes its first/last segment rows (whole block when
    # single-run) to that partition's key — keys are unique per
    # partition in sorted data
    edge_totals: dict = {}
    for first, last, n_first, n_last, n_total in infos:
        if first is None:
            continue
        if first == last:
            edge_totals[first] = edge_totals.get(first, 0) + n_total
        else:
            edge_totals[first] = edge_totals.get(first, 0) + n_first
            edge_totals[last] = edge_totals.get(last, 0) + n_last
    out_refs = []
    for ref, off, info in zip(refs, offsets, infos):
        first, last = info[0], info[1]
        ft = edge_totals.get(first, 0) if first is not None else 0
        lt = edge_totals.get(last, 0) if last is not None else 0
        out_refs.append(_tile.remote(ref, off, ft, lt))
    return rd.from_arrow_refs(out_refs)


def running_sum(ds, part_col: str, order_keys: list, val_col: str,
                out_col: str = "running_sum"):
    """SQL ``SUM(val) OVER (PARTITION BY part ORDER BY order_keys ROWS
    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` as a distributed
    operator. Exact for integer ``val_col`` (the intended use: money as
    cents, counts); float inputs accumulate in float64 with the usual
    reassociation caveat. ``order_keys`` should end in a unique
    tiebreaker — ROWS framing is order-sensitive, and a non-total order
    would make the per-row prefix nondeterministic.

    Same shape as ``row_number_within``: ONE sort, per-block prefix sums
    vectorized off run boundaries, and a driver carry scan over
    per-block boundary tuples (first/last key + first/last segment SUM —
    the additive measure generalizes the row-count carry, so
    ``_carry_offsets`` is reused verbatim with sums in place of counts).
    Driver traffic is O(blocks), never the data.
    """
    import ray
    import ray.data as rd

    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    base = s.schema().base_schema
    val_t = base.field(val_col).type
    is_int = pa.types.is_integer(val_t)
    acc_np = np.int64 if is_int else np.float64
    acc_pa = pa.int64() if is_int else pa.float64()
    empty_out = pa.schema(list(base) + [pa.field(out_col, acc_pa)]).empty_table()

    @ray.remote
    def _bounds(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return (None, None, 0, 0, 0)
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col].to_numpy(zero_copy_only=False).astype(acc_np)
        starts, widths = _run_bounds(k)
        return (k[0], k[-1], v[: widths[0]].sum(), v[starts[-1]:].sum(),
                v.sum())

    @ray.remote
    def _accumulate(block: pa.Table, offset):
        if block.num_rows == 0:
            return empty_out
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col].to_numpy(zero_copy_only=False).astype(acc_np)
        starts, widths = _run_bounds(k)
        total = np.cumsum(v)
        base_ = np.repeat(total[starts] - v[starts], widths)
        rs = total - base_
        if offset:
            rs[: widths[0]] += offset
        return block.append_column(out_col, pa.array(rs.astype(acc_np), acc_pa))

    infos = ray.get([_bounds.remote(r) for r in refs])
    offsets = _carry_offsets(infos)
    out_refs = [_accumulate.remote(r, off) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def first_value_within(ds, part_col: str, order_keys: list, val_col: str,
                       out_col: str = "first_value"):
    """SQL ``FIRST_VALUE(val) OVER (PARTITION BY part ORDER BY
    order_keys)`` as a distributed operator (LAST_VALUE over the full
    frame = this operator under reversed order keys — compose, don't
    duplicate). ``order_keys`` should end in a unique tiebreaker so the
    partition's first row is well-defined.

    Same shape as ``running_sum``: ONE sort, per-block run firsts
    vectorized (``col.take(repeat(starts))`` — works for ANY value type,
    strings included), and a driver carry scan over per-block boundary
    tuples: the carried value for a partition straddling blocks is the
    value at the partition's FIRST row, threaded through single-run
    blocks. Driver traffic is O(blocks), never the data."""
    import ray
    import ray.data as rd

    s = ds.sort([part_col] + order_keys).materialize()
    sch = s.schema() or ds.schema()  # sorted-empty datasets report None
    base = sch.base_schema
    val_t = base.field(val_col).type
    empty_out = pa.schema(list(base) + [pa.field(out_col, val_t)]).empty_table()
    refs = s.to_arrow_refs()
    if not refs:
        # zero-block input: still emit the typed out_col so callers can
        # select it (ADVICE r03 — bare `return s` raised KeyError)
        return rd.from_arrow(empty_out)

    @ray.remote
    def _bounds(block: pa.Table):
        n = block.num_rows
        if n == 0:
            return (None, None, None, 0)
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, _ = _run_bounds(k)
        # first value of the LAST run: the only value the carry scan needs
        # (for a single-run block it equals the block's first value)
        vl = block[val_col][int(starts[-1])].as_py()
        return (k[0], k[-1], vl, starts.size)

    @ray.remote
    def _apply(block: pa.Table, inc):
        """inc: (has_carry, carried_first_value) for the block's first
        run when its partition began in an earlier block."""
        if block.num_rows == 0:
            return empty_out
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        out_idx = np.repeat(starts, widths)
        col = block[val_col].combine_chunks()
        out = col.take(pa.array(out_idx, pa.int64()))
        has_carry, cv = inc
        if has_carry:
            w0 = int(widths[0])
            head = pa.nulls(w0, val_t) if cv is None else pa.array(
                [cv] * w0, val_t)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            out = pa.concat_arrays([head, out.slice(w0)])
        return block.append_column(out_col, out)

    infos = ray.get([_bounds.remote(r) for r in refs])
    carry_key, carry_val, have = None, None, False
    incoming = []
    for fk, lk, vl, nruns in infos:
        if nruns == 0:
            incoming.append((False, None))
            continue
        cont = have and fk == carry_key
        incoming.append((cont, carry_val if cont else None))
        if nruns == 1 and cont:
            carry_key, carry_val, have = lk, carry_val, True
        else:
            carry_key, carry_val, have = lk, vl, True
    out_refs = [_apply.remote(r, inc) for r, inc in zip(refs, incoming)]
    return rd.from_arrow_refs(out_refs)


def forward_fill_within(ds, part_col: str, order_keys: list, val_col: str,
                        out_col: str = "filled"):
    """Forward fill / last-observation-carried-forward: each row gets
    the most recent non-null ``val_col`` of its partition at or before
    it — SQL ``LAST_VALUE(val IGNORE NULLS) OVER (PARTITION BY part
    ORDER BY order_keys ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW)``. ``order_keys`` should end in a unique tiebreaker.

    Same shape as ``first_value_within``: ONE sort; per block the fill
    is one ``np.maximum.accumulate`` over valid-row positions clamped at
    partition-run starts (fully vectorized, any value type via take);
    only rows BEFORE a block's first in-run non-null can depend on an
    earlier block, so blocks ship one boundary tuple — (first_key,
    last_key, last run's last non-null or None, whether the last run has
    one) — and a driver carry scan threads the last non-null through
    single-run all-null blocks. Driver traffic is O(blocks)."""
    import ray
    import ray.data as rd

    s = ds.sort([part_col] + order_keys).materialize()
    sch = s.schema() or ds.schema()
    base = sch.base_schema
    val_t = base.field(val_col).type
    empty_out = pa.schema(list(base) + [pa.field(out_col, val_t)]).empty_table()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(empty_out)

    @ray.remote
    def _bounds(block: pa.Table):
        """(first_key, last_key, last-run last non-null value,
        last-run-has-non-null, nruns)"""
        if block.num_rows == 0:
            return (None, None, None, False, 0)
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, _ = _run_bounds(k)
        col = block[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tail = col.slice(int(starts[-1]))
        valid = pc.is_valid(tail).to_numpy(zero_copy_only=False)
        nz = np.flatnonzero(valid)
        has = nz.size > 0
        lv = tail[int(nz[-1])].as_py() if has else None
        return (k[0], k[-1], lv, has, starts.size)

    @ray.remote
    def _apply(block: pa.Table, inc):
        """inc: (has_carry, carried value) for rows of the block's first
        run that precede its first in-run non-null."""
        if block.num_rows == 0:
            return empty_out
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        col = block[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = block.num_rows
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        last = np.maximum.accumulate(np.where(valid, idx, -1))
        run_start = np.repeat(starts, widths)
        have_local = last >= run_start
        out = col.take(pa.array(np.where(have_local, last, 0), pa.int64()))
        out = pc.if_else(pa.array(have_local), out, pa.nulls(n, val_t))
        has_carry, cv = inc
        if has_carry and cv is not None:
            # only the first run's pre-first-non-null rows inherit carry
            need = ~have_local & (run_start == starts[0])
            if need.any():
                if isinstance(out, pa.ChunkedArray):
                    out = out.combine_chunks()
                out = pc.if_else(pa.array(need),
                                 pa.array([cv] * n, val_t), out)
        return block.append_column(out_col, out)

    infos = ray.get([_bounds.remote(r) for r in refs])
    carry_key, carry_val, have = object(), None, False
    incoming = []
    for fk, lk, lv, has, nruns in infos:
        if nruns == 0:
            incoming.append((False, None))
            continue
        cont = have and fk == carry_key
        incoming.append((cont, carry_val if cont else None))
        if has:
            carry_key, carry_val, have = lk, lv, True
        elif nruns == 1 and cont:
            carry_key, carry_val, have = lk, carry_val, True
        else:
            # last run starts in this block and is all-null so far
            carry_key, carry_val, have = lk, None, True
    out_refs = [_apply.remote(r, inc) for r, inc in zip(refs, incoming)]
    return rd.from_arrow_refs(out_refs)


def rank_within(ds, part_col: str, order_col: str, id_col: str,
                dense: bool = False, include_size: bool = False,
                descending: bool = False):
    """SQL ``RANK()`` / ``DENSE_RANK() OVER (PARTITION BY part ORDER BY
    order_col)`` as a distributed operator. Unlike ROW_NUMBER, ranks are
    TIE-AWARE, so the cross-block carry tracks three quantities per open
    partition: rows seen, distinct values seen, and the global rank of
    the still-open value run (a value run straddling a block boundary
    must keep its start's rank).

    Shape: ONE sort by (part, order); per block, ranks come vectorized
    from the value-run boundaries inside each partition run; the driver
    then scans O(blocks) boundary tuples and hands each block a
    (row_offset, dense_offset, open-run rank) triple for its first
    partition segment. Returns a Dataset of (id, rank) rows; with
    ``include_size`` every row also carries its partition's TOTAL row
    count (edge-straddling partitions sized by the same driver scan, the
    ntile trick) — the building block for PERCENT_RANK.
    """
    import ray
    import ray.data as rd

    # descending=True ranks under ORDER BY order_col DESC (the carry
    # logic below only compares values for EQUALITY, so it is order-
    # agnostic) — the building block for CUME_DIST via n+1-rank_desc
    s = ds.sort([part_col, order_col],
                descending=[False, descending]).materialize()
    refs = s.to_arrow_refs()
    out_name = "dense_rank" if dense else "rank"
    extra = [("part_n", pa.int64())] if include_size else []
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), (out_name, pa.int64())]
            + extra).empty_table())
    base = s.schema().base_schema
    id_t = base.field(id_col).type
    out_schema = pa.schema([("id", id_t), (out_name, pa.int64())] + extra)

    @ray.remote
    def _bounds(block: pa.Table):
        """(first_key, first_val, last_key, last_val, rows_first_seg,
        rows_last_seg, distinct_first_seg, distinct_last_seg,
        rows_before_last_vrun_in_last_seg, single_run)"""
        if block.num_rows == 0:
            return None
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[order_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        a0, b0 = int(starts[0]), int(starts[0] + widths[0])
        al, bl = int(starts[-1]), int(starts[-1] + widths[-1])
        vs0, _ = _run_bounds(v[a0:b0])
        vsl, vwl = _run_bounds(v[al:bl])
        return (k[0], v[a0], k[-1], v[bl - 1], b0 - a0, bl - al,
                int(vs0.size), int(vsl.size), int(vsl[-1]),
                starts.size == 1)

    @ray.remote
    def _rank(block: pa.Table, row_off: int, dense_off: int, open_rank,
              first_total=0, last_total=0):
        # fully vectorized over ALL partition runs in the block: value
        # runs are the joint (part, value) change points; rank = row
        # distance from the value-run start to the partition start + 1,
        # dense = value-run ordinal within the partition — no per-run
        # Python even when a block holds thousands of tiny partitions
        if block.num_rows == 0:
            return out_schema.empty_table()
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[order_col].to_numpy(zero_copy_only=False)
        n = block.num_rows
        from .fast_ops import run_bounds_cols

        p_starts, p_widths = _run_bounds(k)
        c_starts, c_widths = run_bounds_cols([k, v])
        p_start_row = np.repeat(p_starts, p_widths)
        c_start_row = np.repeat(c_starts, c_widths)
        if dense:
            c_ord = np.repeat(np.arange(c_starts.size, dtype=np.int64),
                              c_widths)
            # c-run ordinal at each partition start, spread per row
            c_ord_at_pstart = c_ord[p_start_row]
            out = c_ord - c_ord_at_pstart + 1
            out[: p_widths[0]] += dense_off
        else:
            out = c_start_row - p_start_row + 1
            out[: p_widths[0]] += row_off
        if open_rank is not None:
            out[: c_widths[0]] = open_rank
        cols = {"id": block[id_col], out_name: pa.array(out, pa.int64())}
        if include_size:
            sizes_per_run = p_widths.astype(np.int64).copy()
            sizes_per_run[0] = first_total
            sizes_per_run[-1] = last_total
            cols["part_n"] = pa.array(np.repeat(sizes_per_run, p_widths),
                                      pa.int64())
        return pa.table(cols)

    infos = ray.get([_bounds.remote(r) for r in refs])
    # driver scan: per open partition carry (part, rows_so_far,
    # distinct_so_far, rank_of_open_value_run, last_val)
    adjust = []
    carry = None  # (part, n_rows, n_distinct, open_rank, last_val)
    for info in infos:
        if info is None:
            adjust.append((0, 0, None))
            continue
        (fk, fv, lk, lv, n_first, n_last, d_first, d_last,
         m_last, single) = info
        if carry is not None and carry[0] == fk:
            tie = fv == carry[4]
            row_off = carry[1]
            dense_off = carry[2] - (1 if tie else 0)
            open_rank = carry[3] if tie else None
        else:
            tie, row_off, dense_off, open_rank = False, 0, 0, None
        adjust.append((row_off, dense_off, open_rank))
        # update the carry for the partition left open at the block end
        if single:
            n_rows2 = row_off + n_first
            n_dist2 = dense_off + d_first
            if tie and d_first == 1:
                open2 = open_rank  # the whole block is one value run
            elif dense:
                open2 = n_dist2
            else:
                open2 = row_off + m_last + 1
        else:
            n_rows2 = n_last
            n_dist2 = d_last
            open2 = n_dist2 if dense else m_last + 1
        carry = (lk, n_rows2, n_dist2, open2, lv)
    # full sizes of edge-touching partitions (the ntile accumulation)
    edge_totals: dict = {}
    if include_size:
        for info in infos:
            if info is None:
                continue
            fk, lk = info[0], info[2]
            n_first, n_last, single = info[4], info[5], info[9]
            if single:
                edge_totals[fk] = edge_totals.get(fk, 0) + n_first
            else:
                edge_totals[fk] = edge_totals.get(fk, 0) + n_first
                edge_totals[lk] = edge_totals.get(lk, 0) + n_last
    out_refs = []
    for r, (ro, do, orank), info in zip(refs, adjust, infos):
        ft = lt = 0
        if include_size and info is not None:
            ft = edge_totals.get(info[0], 0)
            lt = edge_totals.get(info[2], 0)
        out_refs.append(_rank.remote(r, ro, do, orank, ft, lt))
    return rd.from_arrow_refs(out_refs)


def lag_values(ds, part_col: str, order_keys: list, val_col: str,
               id_col: str, descending: bool = False):
    """Per-row LAG: for every row, the ``val_col`` of the PREVIOUS row
    of its partition under ``order_keys`` (null for each partition's
    first row) — SQL ``LAG(val) OVER (PARTITION BY part ORDER BY
    order_keys)``. ``order_keys`` should end in a unique tiebreaker.
    ``descending=True`` reverses the order keys, which turns this into
    SQL ``LEAD(val)`` under the ascending order (the next row's value).

    Distributed shape: ONE sort; within a block every row's lag is a
    vectorized shift masked at run starts. Only each block's ROW ZERO
    can depend on another block (its predecessor is the previous block's
    last row when both belong to one partition), so blocks ship exactly
    one (first_key, first_id, last_key, last_val) tuple and the driver
    resolves the B boundary rows with a linear scan — O(blocks) driver
    traffic. Returns a Dataset of (id, prev) rows.
    """
    import ray
    import ray.data as rd

    s = ds.sort([part_col] + order_keys,
                descending=[False] + [descending] * len(order_keys)).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), ("prev", pa.int64())]).empty_table())
    base = s.schema().base_schema
    id_t = base.field(id_col).type
    val_t = base.field(val_col).type
    out_schema = pa.schema([("id", id_t), ("prev", val_t)])

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        # returns (inner rows except row 0, boundary info)
        if block.num_rows == 0:
            return out_schema.empty_table(), None
        k = block[part_col].to_numpy(zero_copy_only=False)
        starts, _ = _run_bounds(k)
        vals = block[val_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        n = block.num_rows
        # previous-row value, nulled at run starts; row 0 handled by the
        # driver carry (its run start already nulls it locally, and the
        # boundary fix-up replaces it when the partition continues)
        idx = np.arange(n, dtype=np.int64) - 1
        mask = np.zeros(n, dtype=bool)
        mask[starts] = True
        idx[mask] = 0
        prev = vals.take(pa.array(np.where(mask, np.zeros(n, np.int64), idx),
                                  pa.int64()))
        prev = pc.if_else(pa.array(~mask), prev, pa.nulls(n, val_t))
        inner = pa.table({"id": block[id_col].slice(1),
                          "prev": prev.slice(1)})
        info = (k[0], block[id_col][0].as_py(), k[-1], vals[-1])
        return inner, info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    # driver boundary scan: block b's row 0 lags the previous NONEMPTY
    # block's last value when the partition continues across the gap
    ids, prevs = [], []
    last_key, last_val = object(), None
    for info in infos:
        if info is None:
            continue
        first_k, first_id, lk, lv = info
        ids.append(first_id)
        prevs.append(last_val.as_py() if first_k == last_key else None)
        last_key, last_val = lk, lv
    edge = pa.table({"id": pa.array(ids, id_t),
                     "prev": pa.array(prevs, val_t)})
    return rd.from_arrow_refs([r[0] for r in results] + [ray.put(edge)])


def _adjacent_pair_reduce(ds, part_col: str, order_keys: list,
                          val_col: str, prev_name: str, cur_name: str,
                          ts_col: str | None = None):
    """Shared scaffold for the adjacent-pair family (transition_counts,
    pair_gap_stats): ONE sort by (part, *order_keys); each sorted block
    reduces its own adjacent pairs to a tiny (prev, cur, n[, gap sum,
    gap max]) partial (cardinality ≤ |value domain|², never rows); the B
    cross-block pairs are resolved by an O(blocks) driver boundary scan;
    the partials merge through one skinny ``sorted_groupby`` exchange.
    With ``ts_col`` (int64 µs) each pair additionally carries its time
    gap into sum/max aggregates. Returns (inner_ds, edge_table) in
    sorted_groupby's contract."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    base = (s.schema() or ds.schema()).base_schema
    val_t = base.field(val_col).type
    gap_fields = ([pa.field("sum_gap_us", pa.int64()),
                   pa.field("max_gap_us", pa.int64())] if ts_col else [])
    part_schema = pa.schema([pa.field(prev_name, val_t),
                             pa.field(cur_name, val_t),
                             pa.field("n", pa.int64())] + gap_fields)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        # sort can emit empty (schema-less) blocks on skewed keys — guard
        # BEFORE touching columns
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = (block[ts_col].to_numpy(zero_copy_only=False)
              if ts_col else None)
        starts, _ = _run_bounds(k)
        vals = block[val_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        n = block.num_rows
        info = (k[0], vals[0].as_py(), int(ts[0]) if ts_col else 0,
                k[-1], vals[n - 1].as_py(), int(ts[n - 1]) if ts_col else 0)
        # pair (i-1, i) exists for i in 1..n-1 unless row i starts a new
        # partition run
        keep = np.ones(max(n - 1, 0), dtype=bool)
        if starts.size > 1:
            keep[starts[1:] - 1] = False
        idx = np.nonzero(keep)[0]
        if idx.size == 0:
            # empty group_by can drop key columns — emit the typed empty
            return part_schema.empty_table(), info
        cols = {
            prev_name: vals.take(pa.array(idx, pa.int64())),
            cur_name: vals.take(pa.array(idx + 1, pa.int64())),
        }
        aggs = [([], "count_all")]
        if ts_col:
            cols["g"] = pa.array(ts[idx + 1] - ts[idx], pa.int64())
            aggs += [("g", "sum"), ("g", "max")]
        g = pa.table(cols).group_by([prev_name, cur_name],
                                    use_threads=False).aggregate(aggs)
        g = g.rename_columns(
            [{"count_all": "n", "g_sum": "sum_gap_us",
              "g_max": "max_gap_us"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    # driver boundary scan: block b's first row pairs with the previous
    # nonempty block's last row when both belong to one partition
    prevs, curs, gaps = [], [], []
    last_key, last_val, last_ts = object(), None, 0  # sentinel key
    for info in infos:
        if info is None:
            continue
        first_k, first_v, first_ts, lk, lv, lts = info
        if first_k == last_key:
            prevs.append(last_val)
            curs.append(first_v)
            gaps.append(first_ts - last_ts)
        last_key, last_val, last_ts = lk, lv, lts
    edge_cols = {prev_name: pa.array(prevs, val_t),
                 cur_name: pa.array(curs, val_t),
                 "n": pa.array([1] * len(prevs), pa.int64())}
    if ts_col:
        edge_cols["sum_gap_us"] = pa.array(gaps, pa.int64())
        edge_cols["max_gap_us"] = pa.array(gaps, pa.int64())
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(pa.table(edge_cols))])
    merge_aggs = [("n", "sum", "n")] + (
        [("sum_gap_us", "sum", "sum_gap_us"),
         ("max_gap_us", "max", "max_gap_us")] if ts_col else [])
    inner, edge_groups = sorted_groupby(partials, [prev_name, cur_name],
                                        merge_aggs)
    # an all-singleton input has zero pairs; sorting an empty dataset
    # yields zero blocks and a None schema, so pin the typed schema with
    # one empty block (harmless when nonempty)
    return inner.union(rd.from_arrow(part_schema.empty_table())), edge_groups


def transition_counts(ds, part_col: str, order_keys: list, val_col: str,
                      prev_name: str = "prev", cur_name: str = "cur"):
    """Markov transition counts: for every ADJACENT row pair within a
    partition under ``order_keys``, count (previous value, current value)
    occurrences — SQL ``LAG(val) OVER (PARTITION BY part ORDER BY ...)``
    followed by ``GROUP BY (prev, cur)``, but the per-row lag column is
    never materialized (see _adjacent_pair_reduce). Returns
    (inner_ds, edge_table) in sorted_groupby's contract."""
    return _adjacent_pair_reduce(ds, part_col, order_keys, val_col,
                                 prev_name, cur_name)


def pair_gap_stats(ds, part_col: str, order_keys: list, val_col: str,
                   ts_col: str, prev_name: str = "prev",
                   cur_name: str = "cur"):
    """Adjacent-pair GAP statistics per (previous value, current value)
    — the response-latency profile of a transcript table (how long the
    assistant takes after a user turn, per role transition): SQL
    ``LAG(val)`` and ``ts − LAG(ts) OVER (PARTITION BY part ORDER BY
    ...)`` followed by ``GROUP BY (prev, cur)`` with COUNT/SUM/MAX of
    the gap. transition_counts' distributed shape with int64 gap
    aggregates riding the same partials (see _adjacent_pair_reduce).
    ``ts_col`` must be int64 µs. Returns (inner_ds, edge_table) of
    (prev, cur, n, sum_gap_us, max_gap_us)."""
    return _adjacent_pair_reduce(ds, part_col, order_keys, val_col,
                                 prev_name, cur_name, ts_col=ts_col)


def trigram_counts(ds, part_col: str, order_keys: list, val_col: str,
                   names: tuple = ("v1", "v2", "v3")):
    """ORDER-3 SEQUENCE CENSUS: count every CONSECUTIVE value triple
    within a partition under ``order_keys`` — SQL ``LAG(val, 2)`` +
    ``LAG(val, 1)`` + ``GROUP BY (v1, v2, v3)``, the sequence-mining
    extension of transition_counts. Distributed shape: ONE sort by
    (part, *order_keys); each block reduces its fully-in-block triples
    to a ≤|domain|³ partial; the boundary stitch generalizes the
    adjacent-pair scan to depth 2 — each block ships only its first two
    and last two (key, value) rows, and the driver walks blocks once
    keeping a 2-row rolling tail, emitting exactly the triples whose
    3-row span crosses a block boundary (a triple can straddle THREE
    blocks when a 1-row block sits between two others; the rolling tail
    handles that case by construction). Partials merge through one
    skinny sorted_groupby. Returns (inner_ds, edge_table) in
    sorted_groupby's contract over (*names, n)."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    n1, n2, n3 = names
    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    base = (s.schema() or ds.schema()).base_schema
    val_t = base.field(val_col).type
    part_schema = pa.schema([pa.field(n1, val_t), pa.field(n2, val_t),
                             pa.field(n3, val_t),
                             pa.field("n", pa.int64())])

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[part_col].to_numpy(zero_copy_only=False)
        vals = block[val_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        n = block.num_rows
        head = [(k[i], vals[i].as_py()) for i in range(min(2, n))]
        tail = [(k[i], vals[i].as_py()) for i in range(max(0, n - 2), n)]
        info = (head, tail)
        if n < 3:
            return part_schema.empty_table(), info
        same = k[1:] == k[:-1]
        keep = same[1:] & same[:-1]  # k[i-2]==k[i-1]==k[i] for row i
        idx = np.nonzero(keep)[0]
        if idx.size == 0:
            return part_schema.empty_table(), info
        g = pa.table({
            n1: vals.take(pa.array(idx, pa.int64())),
            n2: vals.take(pa.array(idx + 1, pa.int64())),
            n3: vals.take(pa.array(idx + 2, pa.int64())),
        }).group_by([n1, n2, n3], use_threads=False).aggregate(
            [([], "count_all")])
        g = g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    # driver boundary scan: rolling 2-row tail of the concatenated
    # prefix; a window (tail + head) holds every candidate triple whose
    # span includes the boundary between prefix and the current block
    rows1, rows2, rows3 = [], [], []
    tail: list = []
    for info in infos:
        if info is None:
            continue
        head, btail = info
        win = tail + head
        for j in range(len(win) - 2):
            # cross-boundary triples only: at least one row from the
            # tail and one from the head (fully-in-block triples were
            # counted inside the block)
            if j < len(tail) and j + 2 >= len(tail):
                (ka, va), (kb, vb), (kc, vc) = win[j], win[j + 1], win[j + 2]
                if ka == kb and kb == kc:
                    rows1.append(va)
                    rows2.append(vb)
                    rows3.append(vc)
        tail = (tail + btail)[-2:] if len(btail) < 2 else btail
    edge_t = pa.table({n1: pa.array(rows1, val_t),
                       n2: pa.array(rows2, val_t),
                       n3: pa.array(rows3, val_t),
                       "n": pa.array([1] * len(rows1), pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(edge_t)])
    inner, edge_groups = sorted_groupby(partials, [n1, n2, n3],
                                        [("n", "sum", "n")])

    # zero-triple inputs reduce to COLUMN-LESS empty blocks (empty Arrow
    # group_by drops key columns), which poison downstream concatenation
    # — re-pin every block to the typed schema
    def _pin(tb: pa.Table) -> pa.Table:
        if tb.num_columns == 0:
            return part_schema.empty_table()
        return tb.select(part_schema.names).cast(part_schema)

    # an all-short-runs input also sorts to ZERO blocks (no schema at
    # all) — the trailing typed-empty union covers that case too
    return (inner.map_batches(_pin, batch_format="pyarrow")
            .union(rd.from_arrow(part_schema.empty_table())), edge_groups)


def pair_cooccurrence(ds, key_col: str, item_col: str):
    """ITEM CO-OCCURRENCE (market-basket): for every key (order,
    basket, document), emit all unordered pairs of its DISTINCT items
    and count pair frequency across keys — the support table of
    association mining. Input must be (key, item) rows, one per
    distinct pair (dedup upstream, e.g. via sorted_groupby).

    Distributed shape: ONE sort by (key, item); each block emits its
    in-run pairs fully vectorized (runs bucketed by width, pairs via
    np.triu_indices — items within a run are strictly increasing, so
    item_a < item_b by construction); a key straddling B blocks ships
    only its ≤B fragment item-lists to an O(blocks) driver scan, which
    cross-pairs consecutive fragments (sorted order across fragments
    makes prefix×fragment pairs already ordered). The pair counts merge
    through one skinny sorted_groupby. Returns (inner_ds, edge_table)
    over (item_a, item_b, n) in sorted_groupby's contract."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = (ds.select_columns([key_col, item_col])
         .sort([key_col, item_col]).materialize())
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    item_t = sch.base_schema.field(item_col).type if sch else pa.int64()
    part_schema = pa.schema([("item_a", item_t), ("item_b", item_t),
                             ("n", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(part_schema.empty_table()), None

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[key_col].to_numpy(zero_copy_only=False)
        v = block[item_col].to_numpy(zero_copy_only=False)
        starts, widths = _run_bounds(k)
        pas, pbs = [], []
        for w in np.unique(widths):
            if w < 2:
                continue
            sel = starts[widths == w]
            m = v[(sel[:, None] + np.arange(w)[None, :])]
            iu, ju = np.triu_indices(int(w), 1)
            pas.append(m[:, iu].ravel())
            pbs.append(m[:, ju].ravel())
        # boundary info: first/last run's key + item list (≤ run width)
        first_w = int(widths[0])
        last_s, last_w = int(starts[-1]), int(widths[-1])
        info = (k[0], v[:first_w].tolist(),
                k[-1], v[last_s:last_s + last_w].tolist(),
                starts.size == 1)
        if not pas:
            return part_schema.empty_table(), info
        t = pa.table({"item_a": pa.array(np.concatenate(pas), item_t),
                      "item_b": pa.array(np.concatenate(pbs), item_t)})
        g = t.group_by(["item_a", "item_b"],
                       use_threads=False).aggregate([([], "count_all")])
        g = g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    # driver scan: cross-pair consecutive fragments of straddling keys
    pas_e, pbs_e = [], []
    last_key, prefix = object(), []
    for info in infos:
        if info is None:
            continue
        fk, fitems, lk, litems, single = info
        if fk == last_key and prefix:
            # items are strictly increasing across the whole sorted run,
            # so every prefix item < every fragment item: pairs ordered
            for a in prefix:
                pas_e.extend([a] * len(fitems))
                pbs_e.extend(fitems)
        if lk == last_key:  # single-run block continuing the open run
            prefix = prefix + litems
        else:  # the open run closed in this block; a new one opens
            prefix = list(litems)
        last_key = lk
    edge_t = pa.table({"item_a": pa.array(pas_e, item_t),
                       "item_b": pa.array(pbs_e, item_t),
                       "n": pa.array([1] * len(pas_e), pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(edge_t)])
    return sorted_groupby(partials, ["item_a", "item_b"],
                          [("n", "sum", "n")])


def adjacent_gap_counts(ds, part_col: str, ts_col: str, order_col: str):
    """Per-partition adjacent-gap VALUE COUNTS: the multiset of LAG time
    deltas as (part, gap_us, w) rows — the exact-selection input for
    grouped gap quantiles (median inter-event gap per user), where
    pair_gap_stats' bounded (prev,cur) reduction cannot apply (the gap
    multiset itself is the payload). ONE sort by (part, ts, order); each
    block folds its in-run gaps to (part, gap) counts; the B cross-block
    boundary gaps join as weight-1 rows from an O(blocks) driver scan;
    one skinny sorted_groupby merges the partials. Returns
    (inner_ds, edge_table) in sorted_groupby's contract over
    (part_col, gap_us, w)."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = (ds.select_columns([part_col, ts_col, order_col])
         .sort([part_col, ts_col, order_col]).materialize())
    refs = s.to_arrow_refs()
    # None schema with nonempty refs = all-empty blocks (see
    # _partition_run_reduce) — treat as empty
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    part_schema = pa.schema([(part_col, part_t), ("gap_us", pa.int64()),
                             ("w", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(part_schema.empty_table()), None

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        n = block.num_rows
        starts, _ = _run_bounds(k)
        keep = np.ones(max(n - 1, 0), dtype=bool)
        if starts.size > 1:
            keep[starts[1:] - 1] = False
        gaps = (ts[1:] - ts[:-1])[keep]
        info = (k[0], int(ts[0]), k[-1], int(ts[-1]))
        if gaps.size == 0:
            return part_schema.empty_table(), info
        t = pa.table({part_col: pa.array(k[1:][keep], part_t),
                      "gap_us": pa.array(gaps, pa.int64())})
        g = t.group_by([part_col, "gap_us"],
                       use_threads=False).aggregate([([], "count_all")])
        g = g.rename_columns(
            [{"count_all": "w"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    parts_e, gaps_e = [], []
    last_key, last_ts = object(), 0
    for info in infos:
        if info is None:
            continue
        fk, fts, lk, lts = info
        if fk == last_key:
            parts_e.append(fk)
            gaps_e.append(fts - last_ts)
        last_key, last_ts = lk, lts
    edge_t = pa.table({part_col: pa.array(parts_e, part_t),
                       "gap_us": pa.array(gaps_e, pa.int64()),
                       "w": pa.array([1] * len(parts_e), pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(edge_t)])
    inner, edge = sorted_groupby(partials, [part_col, "gap_us"],
                                 [("w", "sum", "w")])
    return inner.union(rd.from_arrow(part_schema.empty_table())), edge


def order_conformance_census(ds, part_col: str, order_col: str,
                             ts_col: str):
    """ORDER-CONFORMANCE census: when each partition is replayed in
    ``order_col`` order (the stored ordering — event_id, turn_idx), does
    ``ts_col`` move monotonically non-decreasing? The north-rule "stable
    (conv_id, turn_idx) ordering" validator: an inversion means the
    surrogate order disagrees with wall-clock time. Distributed shape:
    ONE sort by (part, order); each block folds its in-run adjacent
    pairs to TWO tiny partials — a pairs-checked scalar and a
    (part, viol) table holding ONLY violating partitions (empty on
    conforming data, bounded by the violation count otherwise); the B
    cross-block pairs resolve via the usual O(blocks) driver boundary
    scan; violator partials merge through one skinny ``sorted_groupby``
    exchange that never carries conforming rows. Returns
    ``(pairs_checked:int, inner_ds, edge_table)`` where inner/edge hold
    (part_col, viol:int64) per violating partition."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = (ds.select_columns([part_col, order_col, ts_col])
         .sort([part_col, order_col]).materialize())
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    part_schema = pa.schema([(part_col, part_t), ("viol", pa.int64())])
    if not refs or sch is None:
        return 0, rd.from_arrow(part_schema.empty_table()), None

    @ray.remote(num_returns=3)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None, 0
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        n = block.num_rows
        starts, _ = _run_bounds(k)
        keep = np.ones(max(n - 1, 0), dtype=bool)
        if starts.size > 1:
            keep[starts[1:] - 1] = False
        info = (k[0], int(ts[0]), k[-1], int(ts[-1]))
        pairs = int(keep.sum())
        bad = (ts[1:] < ts[:-1]) & keep
        if not bad.any():
            return part_schema.empty_table(), info, pairs
        t = pa.table({part_col: pa.array(k[1:][bad], part_t)})
        g = t.group_by([part_col],
                       use_threads=False).aggregate([([], "count_all")])
        g = g.rename_columns(
            [{"count_all": "viol"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info, pairs

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    pairs_total = sum(ray.get([r[2] for r in results]))
    parts_e, last_key, last_ts = [], object(), 0
    for info in infos:
        if info is None:
            continue
        fk, fts, lk, lts = info
        if fk == last_key:
            pairs_total += 1
            if fts < last_ts:
                parts_e.append(fk)
        last_key, last_ts = lk, lts
    edge_t = pa.table({part_col: pa.array(parts_e, part_t),
                       "viol": pa.array([1] * len(parts_e), pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(edge_t)])
    inner, edge = sorted_groupby(partials, [part_col],
                                 [("viol", "sum", "viol")])
    return (pairs_total,
            inner.union(rd.from_arrow(part_schema.empty_table())), edge)


def rolling_agg_rows(ds, part_col: str, order_keys: list, val_col: str,
                     id_col: str, k: int, agg: str = "sum"):
    """ROWS-framed rolling aggregate: per row, the ``agg`` (sum, min,
    max or median) and count of the last ``k`` rows (current included)
    of its partition — SQL ``SUM/MIN/MAX/MEDIAN(val) OVER (PARTITION BY
    part ORDER BY order_keys ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW)`` plus the matching ``COUNT(*)``. ``order_keys`` must end in a
    unique tiebreaker (ROWS framing needs a total order). Exact for
    integer ``val_col`` with sum/min/max; median accumulates float64
    (interpolated midpoint on even windows, matching QUANTILE_CONT).

    Distributed shape (windowed_count's candidate/pool discipline, ROWS
    variant): ONE sort by (part, *order_keys); per block the rolling sum
    is one global cumsum + a clamped lower-bound gather, and min/max/
    median use a per-run sliding-window view + prefix accumulation. Rows
    of the block's FIRST run with fewer than k-1 in-block predecessors
    ship as CANDIDATES carrying their local agg/count; the LAST run's
    trailing min(k-1, len) rows ship as POOL. The stitch task walks each
    partition's shipped rows in (block, position) order and combines
    every candidate with the latest ≤ k-1 pool values of earlier blocks
    — a partition spanning B blocks ships O(B·k) rows, never its data.
    Median is not partial-combinable, but every value a candidate's
    window can need IS in the stitch: its in-block predecessors are
    themselves candidates (contiguous rows right before it in the
    (part, blk, pos) sort), so the stitch re-medians the explicit
    window. Returns a Dataset of (id, roll_<agg>, n_win) rows.
    """
    import ray
    import ray.data as rd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if agg not in ("sum", "min", "max", "median"):
        raise ValueError(f"agg must be sum/min/max/median, got {agg!r}")
    out_val = f"roll_{agg}"
    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), (out_val, pa.int64()),
             ("n_win", pa.int64())]).empty_table())
    base = s.schema().base_schema
    val_t = base.field(val_col).type
    is_int = pa.types.is_integer(val_t) and agg != "median"
    acc_np = np.int64 if is_int else np.float64
    acc_pa = pa.int64() if is_int else pa.float64()
    id_t = base.field(id_col).type
    out_schema = pa.schema([("id", id_t), (out_val, acc_pa),
                            ("n_win", pa.int64())])
    ship_schema = pa.schema([(part_col, base.field(part_col).type),
                             ("__blk", pa.int64()), ("__pos", pa.int64()),
                             ("__cand", pa.bool_()), ("__pool", pa.bool_()),
                             ("id", id_t), ("__v", acc_pa),
                             ("__nloc", acc_pa), ("__j", pa.int64())])

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, bno: int):
        if block.num_rows == 0:
            return out_schema.empty_table(), ship_schema.empty_table()
        n = block.num_rows
        key = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col].to_numpy(zero_copy_only=False).astype(acc_np)
        starts, widths = _run_bounds(key)
        run_start = np.repeat(starts, widths)
        idx = np.arange(n, dtype=np.int64)
        j = idx - run_start  # local index within the run
        lo = np.maximum(run_start, idx - k + 1)
        if agg == "sum":
            cs = np.cumsum(v)
            roll = cs - np.where(lo > 0, cs[lo - 1], 0)
        elif agg == "median":
            from numpy.lib.stride_tricks import sliding_window_view

            roll = np.empty(n, np.float64)
            for r in range(starts.size):
                a, b = int(starts[r]), int(starts[r] + widths[r])
                seg = v[a:b]
                w = seg.size
                head = min(k - 1, w)
                for i in range(head):  # growing prefixes, ≤ k-1 each
                    roll[a + i] = np.median(seg[: i + 1])
                if w >= k:
                    roll[a + k - 1:b] = np.median(
                        sliding_window_view(seg, k), axis=1)
        else:
            from numpy.lib.stride_tricks import sliding_window_view

            ufunc = np.minimum if agg == "min" else np.maximum
            roll = np.empty(n, v.dtype)
            for r in range(starts.size):
                a, b = int(starts[r]), int(starts[r] + widths[r])
                seg = v[a:b]
                w = seg.size
                head = min(k - 1, w)
                roll[a:a + head] = ufunc.accumulate(seg[:head])
                if w >= k:
                    roll[a + k - 1:b] = (
                        sliding_window_view(seg, k).min(axis=1)
                        if agg == "min"
                        else sliding_window_view(seg, k).max(axis=1))
        n_win = idx - lo + 1
        cand = np.zeros(n, dtype=bool)
        a0, b0 = int(starts[0]), int(starts[0] + widths[0])
        cand[a0:b0] = j[a0:b0] < k - 1
        pool = np.zeros(n, dtype=bool)
        al, bl = int(starts[-1]), int(starts[-1] + widths[-1])
        pool[max(al, bl - (k - 1)): bl] = True
        keep = ~cand
        inner = pa.table({
            "id": block[id_col].filter(pa.array(keep)),
            out_val: pa.array(roll[keep].astype(acc_np), acc_pa),
            "n_win": pa.array(n_win[keep], pa.int64()),
        })
        ship = cand | pool
        sidx = np.flatnonzero(ship)
        take = pa.array(sidx, pa.int64())
        shipped = pa.table({
            part_col: block[part_col].take(take),
            "__blk": pa.array(np.full(sidx.size, bno, np.int64)),
            "__pos": pa.array(sidx, pa.int64()),
            "__cand": pa.array(cand[sidx]),
            "__pool": pa.array(pool[sidx]),
            "id": block[id_col].take(take),
            "__v": pa.array(v[sidx].astype(acc_np), acc_pa),
            "__nloc": pa.array(roll[sidx].astype(acc_np), acc_pa),
            "__j": pa.array(j[sidx], pa.int64()),
        })
        return inner, shipped

    @ray.remote
    def _edge_stitch(*tables):
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [(part_col, "ascending"), ("__blk", "ascending"),
             ("__pos", "ascending")])
        key = et[part_col].to_numpy(zero_copy_only=False)
        blk = et["__blk"].to_numpy()
        cand = et["__cand"].to_numpy(zero_copy_only=False).astype(bool)
        pool = et["__pool"].to_numpy(zero_copy_only=False).astype(bool)
        v = et["__v"].to_numpy()
        nloc = et["__nloc"].to_numpy()
        j = et["__j"].to_numpy()
        starts, widths = _run_bounds(key)
        out_agg = nloc.copy()
        add_n = np.zeros(v.size, np.int64)
        for r in range(starts.size):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            ci = np.flatnonzero(cand[a:b]) + a
            if not ci.size:
                continue
            pi = np.flatnonzero(pool[a:b]) + a  # (blk, pos)-ordered
            pv, pb = v[pi], blk[pi]
            pcs = np.cumsum(pv) if agg == "sum" else None
            for c in ci:
                m = k - 1 - int(j[c])
                if m <= 0:
                    continue
                end = int(np.searchsorted(pb, blk[c], side="left"))
                take_n = min(m, end)
                if take_n <= 0:
                    continue
                if agg == "sum":
                    out_agg[c] = nloc[c] + pcs[end - 1] - (
                        pcs[end - 1 - take_n] if end - 1 - take_n >= 0 else 0)
                elif agg == "median":
                    # the candidate's in-block predecessors are the j[c]
                    # rows right before it in et (same part/blk,
                    # consecutive pos — all shipped, all cand); re-median
                    # the explicit window
                    tail = pv[end - take_n: end]
                    local = v[c - int(j[c]): c + 1]
                    out_agg[c] = np.median(np.concatenate([tail, local]))
                else:
                    tail = pv[end - take_n: end]
                    out_agg[c] = (min(nloc[c], tail.min()) if agg == "min"
                                  else max(nloc[c], tail.max()))
                add_n[c] = take_n
        ci = np.flatnonzero(cand)
        take = pa.array(ci, pa.int64())
        return pa.table({
            "id": et["id"].take(take),
            out_val: pa.array(out_agg[ci].astype(v.dtype), acc_pa),
            "n_win": pa.array(j[ci] + 1 + add_n[ci], pa.int64()),
        })

    results = [_block.remote(r, i) for i, r in enumerate(refs)]
    inner_refs = [r[0] for r in results]
    edge_ref = _edge_stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs(inner_refs + [edge_ref])


def rolling_sum_rows(ds, part_col: str, order_keys: list, val_col: str,
                     id_col: str, k: int):
    """Back-compat alias: rolling_agg_rows with agg="sum"."""
    return rolling_agg_rows(ds, part_col, order_keys, val_col, id_col, k,
                            agg="sum")


def windowed_count(ds, part_col: str, ts_col: str, id_col: str,
                   window_us: int):
    """Time-range windowed COUNT — ``windowed_agg`` without a value
    column; kept as the named operator the RANGE-frame COUNT oracle
    checks (see windowed_agg for the distributed shape)."""
    return windowed_agg(ds, part_col, ts_col, id_col, window_us)


def windowed_agg(ds, part_col: str, ts_col: str, id_col: str,
                 window_us: int, val_col: str | None = None,
                 out_col: str = "n_window", rows: int | None = None):
    """Time-range windowed aggregate: for every row, COUNT(*) (when
    ``val_col`` is None) or SUM(COALESCE(val, 0)) over rows of the same
    partition with ``ts`` in ``[ts - window, ts]`` — SQL
    ``COUNT(*)/SUM(COALESCE(v, 0)) OVER (PARTITION BY part ORDER BY ts
    RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)`` including ALL
    equal-``ts`` peers, exactly like RANGE framing. NULL values
    contribute 0, so an all-NULL frame yields 0 where bare SQL ``SUM``
    yields NULL — mirror with ``SUM(COALESCE(v, 0))`` in oracles. Pass
    an integer value column (e.g. money as cents) for an
    association-free exact sum.

    Distributed shape: ONE sort by (part, ts, id); every row's aggregate
    over the rows PRESENT IN ITS BLOCK comes from two searchsorted into
    the run's prefix sums. Rows whose window could involve other blocks
    — first-run rows within ``window_us`` of the segment start (trailing
    window may reach the previous block) and last-run rows tied with the
    segment's max ts (RANGE peers may continue into the next block) —
    ship as CANDIDATES carrying their local aggregate; rows within
    ``window_us`` of a block boundary ship as POOL rows carrying their
    value. The stitch task corrects each candidate from other blocks'
    pool rows inside its window — shipped volume is clipped by TIME
    DISTANCE from the boundary, so a hot partition spanning many blocks
    ships O(rows within one window of each boundary), not whole
    partitions. Returns a Dataset of (id, <out_col>) rows.
    """
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    if rows is None:
        try:
            # metadata-only on a raw read; pass ``rows`` when ``ds``
            # carries transforms (count() would execute the pipeline)
            rows = ds.count()
        except Exception:
            rows = None
    cols = [part_col, ts_col, id_col] + ([val_col] if val_col else [])
    s = rightsize_blocks(ds.select_columns(cols), rows=rows).sort(
        [part_col, ts_col, id_col]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), (out_col, pa.int64())]).empty_table())
    # types come from the DATASET schema: zero-row blocks (possible after
    # a repartition) carry an empty per-block schema
    ds_schema = s.schema().base_schema
    id_t = ds_schema.field(id_col).type
    if val_col is None:
        agg_t = pa.int64()
    else:
        vt = ds_schema.field(val_col).type
        agg_t = pa.int64() if pa.types.is_integer(vt) else pa.float64()
    agg_np = np.int64 if agg_t == pa.int64() else np.float64
    out_schema = pa.schema([("id", id_t), (out_col, agg_t)])
    ship_schema = pa.schema([(part_col, ds_schema.field(part_col).type),
                             ("__ts", pa.int64()), ("__blk", pa.int64()),
                             ("__cand", pa.bool_()), ("id", id_t),
                             ("__aloc", agg_t), ("__v", agg_t)])

    def _vals_of(block: pa.Table) -> np.ndarray:
        if val_col is None:
            return np.ones(block.num_rows, agg_np)
        arr = block[val_col]
        if arr.null_count:
            # SQL SUM ignores NULLs → 0 contribution; without this an
            # int64 null becomes INT64_MIN through to_numpy's NaN cast
            arr = pc.fill_null(arr, 0)
        return arr.to_numpy(zero_copy_only=False).astype(agg_np)

    def _run_aggs(ts: np.ndarray, v: np.ndarray, starts: np.ndarray,
                  widths: np.ndarray):
        """Per-row window aggregates over rows present in this array,
        all runs; ts int64, sorted within each run."""
        outs = []
        for r in range(starts.size):
            a, b = starts[r], starts[r] + widths[r]
            seg = ts[a:b]
            csum = np.concatenate([[0], np.cumsum(v[a:b])])
            left = np.searchsorted(seg, seg - window_us, side="left")
            right = np.searchsorted(seg, seg, side="right")  # peers included
            outs.append(csum[right] - csum[left])
        return np.concatenate(outs) if outs else np.array([], agg_np)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, bno: int):
        if block.num_rows == 0:
            return out_schema.empty_table(), ship_schema.empty_table()
        n = block.num_rows
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        v = _vals_of(block)
        starts, widths = _run_bounds(k)
        n_runs = starts.size
        aloc = _run_aggs(ts, v, starts, widths)
        cand = np.zeros(n, dtype=bool)
        ship = np.zeros(n, dtype=bool)
        # first run: trailing windows reaching before the segment start
        a0, b0 = int(starts[0]), int(starts[0] + widths[0])
        seg0 = ts[a0:b0]
        cand[a0:b0] = (seg0 - window_us) <= seg0[0]
        # last run: rows tied with the segment max may gain RANGE peers
        # from the next block; rows within window of the segment end are
        # pool rows for later blocks' candidates
        al, bl = int(starts[n_runs - 1]), int(starts[n_runs - 1] + widths[n_runs - 1])
        segl = ts[al:bl]
        cand[al:bl] |= segl == segl[-1]
        ship[a0:b0] = cand[a0:b0]
        ship[al:bl] |= segl >= segl[-1] - window_us
        keep = ~cand
        inner = pa.table({
            "id": block[id_col].filter(pa.array(keep)),
            out_col: pa.array(aloc[keep], agg_t),
        })
        sidx = np.flatnonzero(ship)
        take = pa.array(sidx, pa.int64())
        shipped = pa.table({
            part_col: block[part_col].take(take),
            "__ts": pa.array(ts[sidx], pa.int64()),
            "__blk": pa.array(np.full(sidx.size, bno, np.int64)),
            "__cand": pa.array(cand[sidx]),
            "id": block[id_col].take(take),
            "__aloc": pa.array(aloc[sidx], agg_t),
            "__v": pa.array(v[sidx], agg_t),
        })
        return inner, shipped

    @ray.remote
    def _edge_stitch(*tables):
        """Candidates correct in a TASK, never on the driver: per
        partition, aggregate pool rows from other blocks inside each
        candidate's window (pool is time-clipped, so input stays
        O(blocks × rows-per-window))."""
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [(part_col, "ascending"), ("__ts", "ascending")])
        k = et[part_col].to_numpy(zero_copy_only=False)
        ts = et["__ts"].to_numpy()
        blk = et["__blk"].to_numpy()
        cand = et["__cand"].to_numpy(zero_copy_only=False).astype(bool)
        aloc = et["__aloc"].to_numpy()
        v = et["__v"].to_numpy()
        starts, widths = _run_bounds(k)
        extra = np.zeros(ts.size, agg_np)
        for r in range(starts.size):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            ci = np.flatnonzero(cand[a:b]) + a
            if not ci.size:
                continue
            pts, pblk, pv = ts[a:b], blk[a:b], v[a:b]
            # group candidates by origin block: one masked (sorted) pool
            # per block value, vectorized searchsorted per group
            for bv in np.unique(blk[ci]):
                gi = ci[blk[ci] == bv]
                sel = pblk != bv
                mts = pts[sel]
                csum = np.concatenate([[0], np.cumsum(pv[sel])])
                lo = np.searchsorted(mts, ts[gi] - window_us, side="left")
                hi = np.searchsorted(mts, ts[gi], side="right")
                extra[gi] = csum[hi] - csum[lo]
        ci = np.flatnonzero(cand)
        take = pa.array(ci, pa.int64())
        return pa.table({
            "id": et["id"].take(take),
            out_col: pa.array(aloc[ci] + extra[ci], agg_t),
        })

    results = [_block.remote(r, i) for i, r in enumerate(refs)]
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

    Same distributed shape as windowed_count: tag+union both sides into
    skinny rows, ONE sort by (key, time, side); every left row's count
    over the right rows PRESENT IN ITS BLOCK is computed vectorized in
    the block task. Left rows whose forward window passes the segment
    end (last run) or that tie the segment start (first run — equal-ts
    right rows may sit in the previous block) ship as CANDIDATES with
    their local count; right rows within ``window_us`` of a boundary
    ship as POOL rows. The stitch task adds, per candidate, the pool
    right rows of the same key from OTHER blocks inside its window —
    shipped volume is clipped by TIME DISTANCE from the boundary, never
    whole partitions (round-2 next-round #7).
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

    ds_schema = s.schema().base_schema  # zero-row blocks have empty schemas
    lid_t = ds_schema.field("lid").type
    out_schema = pa.schema([("id", lid_t), ("n_range", pa.int64())])
    ship_schema = pa.schema([("k", ds_schema.field("k").type),
                             ("t", ds_schema.field("t").type),
                             ("side", ds_schema.field("side").type),
                             ("__blk", pa.int64()), ("__cand", pa.bool_()),
                             ("lid", lid_t), ("__nloc", pa.int64())])

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, bno: int):
        if block.num_rows == 0:
            return out_schema.empty_table(), ship_schema.empty_table()
        n = block.num_rows
        k = block["k"].to_numpy()
        t = block["t"].to_numpy()
        side = block["side"].to_numpy()
        starts, widths = _run_bounds(k)
        n_runs = starts.size
        # local forward-window counts for EVERY left row, all runs
        nloc = np.zeros(n, np.int64)
        for r in range(n_runs):
            a, b = starts[r], starts[r] + widths[r]
            seg_t = t[a:b]
            seg_side = side[a:b]
            rt = seg_t[seg_side == 0]
            li = np.flatnonzero(seg_side == 1)
            lt = seg_t[li]
            nloc[li + a] = (np.searchsorted(rt, lt + window_us, side="left")
                            - np.searchsorted(rt, lt, side="left"))
        cand = np.zeros(n, dtype=bool)
        ship = np.zeros(n, dtype=bool)
        left = side == 1
        # first run: left rows tying the segment start may have equal-ts
        # right rows in the previous block; right rows within window of
        # the start serve earlier blocks' candidates
        a0, b0 = int(starts[0]), int(starts[0] + widths[0])
        sl0 = slice(a0, b0)
        cand[sl0] = left[sl0] & (t[sl0] == t[a0])
        ship[sl0] = cand[sl0] | (~left[sl0] & (t[sl0] < t[a0] + window_us))
        # last run: left rows whose window passes the segment end may gain
        # right rows from the next block; right rows within window of the
        # end serve later blocks' candidates
        al, bl = int(starts[n_runs - 1]), int(starts[n_runs - 1] + widths[n_runs - 1])
        sll = slice(al, bl)
        cand[sll] |= left[sll] & (t[sll] + window_us > t[bl - 1])
        ship[sll] |= cand[sll] | (~left[sll] & (t[sll] + window_us > t[bl - 1]))
        keep = left & ~cand
        inner = pa.table({
            "id": block["lid"].filter(pa.array(keep)),
            "n_range": pa.array(nloc[keep], pa.int64()),
        })
        sidx = np.flatnonzero(ship)
        take = pa.array(sidx, pa.int64())
        shipped = pa.table({
            "k": block["k"].take(take),
            "t": block["t"].take(take),
            "side": block["side"].take(take),
            "__blk": pa.array(np.full(sidx.size, bno, np.int64)),
            "__cand": pa.array(cand[sidx]),
            "lid": block["lid"].take(take),
            "__nloc": pa.array(nloc[sidx], pa.int64()),
        })
        return inner, shipped

    @ray.remote
    def _edge_stitch(*tables):
        """Candidates correct in a TASK: per key, count pool right rows
        from other blocks inside each candidate's forward window."""
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [("k", "ascending"), ("t", "ascending")])
        k = et["k"].to_numpy()
        t = et["t"].to_numpy()
        side = et["side"].to_numpy()
        blk = et["__blk"].to_numpy()
        cand = et["__cand"].to_numpy(zero_copy_only=False).astype(bool)
        nloc = et["__nloc"].to_numpy()
        starts, widths = _run_bounds(k)
        extra = np.zeros(t.size, np.int64)
        for r in range(starts.size):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            ci = np.flatnonzero(cand[a:b]) + a
            if not ci.size:
                continue
            seg_right = (side[a:b] == 0)
            pts_all, pblk_all = t[a:b][seg_right], blk[a:b][seg_right]
            for bv in np.unique(blk[ci]):
                gi = ci[blk[ci] == bv]
                mts = pts_all[pblk_all != bv]
                lo = np.searchsorted(mts, t[gi], side="left")
                hi = np.searchsorted(mts, t[gi] + window_us, side="left")
                extra[gi] = hi - lo
        ci = np.flatnonzero(cand)
        take = pa.array(ci, pa.int64())
        return pa.table({
            "id": et["lid"].take(take),
            "n_range": pa.array(nloc[ci] + extra[ci], pa.int64()),
        })

    results = [_block.remote(r, i) for i, r in enumerate(refs)]
    inner_refs = [r[0] for r in results]
    edge_ref = _edge_stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs(inner_refs + [edge_ref])


def interval_overlap_counts(ds, key_col: str, ts_col: str, id_col: str,
                            half_window_us: int):
    """Fused interval-overlap self-count: for every row, the number of
    SAME-KEY rows (self included) whose timestamp lies in
    ``[t − w, t + w]``. Equal-length intervals ``[t, t + D]`` overlap
    exactly when their starts are within ``D`` of each other, so with
    ``w = D`` this IS the interval-overlap count — fused into ONE sort
    exchange where the two-range-join composition
    (|start_b ≤ end_a| − |end_b < start_a|) paid five (round-3 verdict
    item #5 on q_order_overlap_counts).

    Same distributed shape as range_count_join, one-sided and symmetric:
    ONE sort by (key, t); interior rows count via two searchsorteds per
    run in their block task. Rows whose ±w window can cross a block
    boundary (first/last run only) ship as candidates with their local
    count; boundary rows within w ship as pool; the stitch task adds,
    per candidate, the same-key pool rows of OTHER blocks inside its
    window — shipped volume clipped by time distance, never whole
    partitions. Returns a Dataset (id, n_overlap), one row per input
    row. ``ts_col`` must be int64-castable (µs)."""
    import ray
    import ray.data as rd

    def _skinny(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(batch[key_col], pa.int64()),
            "t": pc.cast(batch[ts_col], pa.int64()),
            "lid": batch[id_col],
        })

    s = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, id_col]))
    ).map_batches(_skinny, batch_format="pyarrow").sort(["k", "t"]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.schema(
            [("id", pa.int64()), ("n_overlap", pa.int64())]).empty_table())

    lid_t = s.schema().base_schema.field("lid").type
    out_schema = pa.schema([("id", lid_t), ("n_overlap", pa.int64())])
    ship_schema = pa.schema([("k", pa.int64()), ("t", pa.int64()),
                             ("__blk", pa.int64()), ("__cand", pa.bool_()),
                             ("lid", lid_t), ("__nloc", pa.int64())])
    w = int(half_window_us)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, bno: int):
        if block.num_rows == 0:
            return out_schema.empty_table(), ship_schema.empty_table()
        n = block.num_rows
        k = block["k"].to_numpy()
        t = block["t"].to_numpy()
        starts, widths = _run_bounds(k)
        n_runs = starts.size
        nloc = np.empty(n, np.int64)
        # vectorized fast path for 1- and 2-row runs (the bulk of a
        # per-customer keying — the per-run Python loop only pays for
        # runs wide enough to amortize it)
        w1 = np.flatnonzero(widths == 1)
        if w1.size:
            nloc[starts[w1]] = 1
        w2 = np.flatnonzero(widths == 2)
        if w2.size:
            s2 = starts[w2]
            within = (t[s2 + 1] - t[s2]) <= w
            nloc[s2] = 1 + within
            nloc[s2 + 1] = 1 + within
        for r in np.flatnonzero(widths >= 3):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            seg_t = t[a:b]
            nloc[a:b] = (np.searchsorted(seg_t, seg_t + w, side="right")
                         - np.searchsorted(seg_t, seg_t - w, side="left"))
        cand = np.zeros(n, dtype=bool)
        ship = np.zeros(n, dtype=bool)
        # first run: same-key rows in earlier blocks have ts ≤ t[a0] —
        # a row's backward window reaches them iff t − w ≤ t[a0]; local
        # rows with t ≤ t[a0] + w can serve earlier candidates
        a0 = int(starts[0])
        b0 = int(starts[0] + widths[0])
        sl0 = slice(a0, b0)
        cand[sl0] = t[sl0] - w <= t[a0]
        ship[sl0] = cand[sl0] | (t[sl0] <= t[a0] + w)
        # last run: mirror forward
        al = int(starts[n_runs - 1])
        bl = int(starts[n_runs - 1] + widths[n_runs - 1])
        sll = slice(al, bl)
        cand[sll] |= t[sll] + w >= t[bl - 1]
        ship[sll] |= cand[sll] | (t[sll] >= t[bl - 1] - w)
        keep = ~cand
        inner = pa.table({
            "id": block["lid"].filter(pa.array(keep)),
            "n_overlap": pa.array(nloc[keep], pa.int64()),
        })
        sidx = np.flatnonzero(ship)
        take = pa.array(sidx, pa.int64())
        shipped = pa.table({
            "k": block["k"].take(take),
            "t": block["t"].take(take),
            "__blk": pa.array(np.full(sidx.size, bno, np.int64)),
            "__cand": pa.array(cand[sidx]),
            "lid": block["lid"].take(take),
            "__nloc": pa.array(nloc[sidx], pa.int64()),
        })
        return inner, shipped

    @ray.remote
    def _edge_stitch(*tables):
        """Per candidate: add same-key pool rows from OTHER blocks
        inside its ±w window (local rows were already counted)."""
        nonempty = [t_ for t_ in tables if t_.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [("k", "ascending"), ("t", "ascending")])
        k = et["k"].to_numpy()
        t = et["t"].to_numpy()
        blk = et["__blk"].to_numpy()
        cand = et["__cand"].to_numpy(zero_copy_only=False).astype(bool)
        nloc = et["__nloc"].to_numpy()
        starts, widths = _run_bounds(k)
        extra = np.zeros(t.size, np.int64)
        for r in range(starts.size):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            ci = np.flatnonzero(cand[a:b]) + a
            if not ci.size:
                continue
            pts_all, pblk_all = t[a:b], blk[a:b]
            for bv in np.unique(blk[ci]):
                gi = ci[blk[ci] == bv]
                mts = pts_all[pblk_all != bv]
                lo = np.searchsorted(mts, t[gi] - w, side="left")
                hi = np.searchsorted(mts, t[gi] + w, side="right")
                extra[gi] = hi - lo
        ci = np.flatnonzero(cand)
        take = pa.array(ci, pa.int64())
        return pa.table({
            "id": et["lid"].take(take),
            "n_overlap": pa.array(nloc[ci] + extra[ci], pa.int64()),
        })

    results = [_block.remote(r, i) for i, r in enumerate(refs)]
    inner_refs = [r[0] for r in results]
    edge_ref = _edge_stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs(inner_refs + [edge_ref])


def _partition_run_reduce(ds, part_col: str, ts_col: str, order_col: str,
                          out_fields: list, run_agg, merge, emit,
                          val_col: str | None = None):
    """Shared scaffold for per-partition ordered-run reductions
    (session_gap_stats, sessionize — the LAG()-family primitives): ONE
    sort by (part, ts, order); every run interior to a sorted block
    finalizes via ``run_agg`` inside the block task; each block ships at
    most TWO tiny boundary fragments (pos, part, *agg values, first_ts,
    last_ts) with pos 0 = first run of a multi-run block (completes
    in-block), 1 = last run (may continue), 2 = single-run block; the
    driver carry-merges fragments in block order via ``merge`` — driver
    traffic is O(blocks), independent of partition sizes.

    ``run_agg(seg)``: int64-µs ts segment of one run → tuple of agg
    values, one per ``out_fields`` name. ``merge(carry_vals, frag_vals,
    boundary_gap_us)``: combine a continuing partition's accumulated
    values with its next fragment's. ``emit(vals)``: False drops a
    finished partition (e.g. HAVING COUNT(*) > 1) — applied identically
    to interior runs and carry-merged edge partitions.

    When ``val_col`` is given (an int64 measure column), ``run_agg``
    receives ``(ts_seg, val_seg)`` instead — value-weighted reductions
    (e.g. time-weighted averages) smuggle whatever boundary state they
    need (a run's last value) through their own ``out_fields``.

    Returns a Dataset (part_col, *out_fields) with int64 agg columns."""
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    try:
        rows = ds.count()  # metadata-only on the raw read
    except Exception:
        rows = None
    sel = [part_col, ts_col, order_col] + ([val_col] if val_col else [])
    s = rightsize_blocks(ds.select_columns(sel), rows=rows).sort(
        [part_col, ts_col, order_col]).materialize()
    refs = s.to_arrow_refs()
    # an all-empty input can surface as nonempty refs of empty blocks
    # with a None schema — treat it as the empty case
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    out_schema = pa.schema([(part_col, part_t)]
                           + [(f, pa.int64()) for f in out_fields])
    if not refs or sch is None:
        return rd.from_arrow(out_schema.empty_table())

    def _table(rows_):
        cols = {part_col: pa.array([r[0] for r in rows_], part_t)}
        for i, f in enumerate(out_fields):
            cols[f] = pa.array([r[1 + i] for r in rows_], pa.int64())
        return pa.table(cols)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return out_schema.empty_table(), []
        k = block[part_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        v = (block[val_col].to_numpy(zero_copy_only=False)
             if val_col else None)

        def _agg(a, b):
            return (run_agg(ts[a:b], v[a:b]) if val_col
                    else run_agg(ts[a:b]))

        starts, widths = _run_bounds(k)
        n_runs = starts.size
        inner_rows = []
        for r in range(1, n_runs - 1):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            vals = _agg(a, b)
            if emit(vals):
                inner_rows.append((k[a], *vals))
        frags = []
        edge_runs = [(0, 0)] if n_runs == 1 else [(0, 0), (n_runs - 1, 1)]
        for r, pos in edge_runs:
            a, b = int(starts[r]), int(starts[r] + widths[r])
            frags.append((2 if n_runs == 1 else pos, k[a].item()
                          if hasattr(k[a], "item") else k[a],
                          _agg(a, b), int(ts[a]), int(ts[b - 1])))
        return _table(inner_rows), frags

    results = [_block.remote(r) for r in refs]
    frag_lists = ray.get([r[1] for r in results])

    # driver carry-merge over ≤2 fragments per block, in sorted order
    finals = []

    def _finalize(c):
        if c is not None and emit(c[1]):
            finals.append((c[0], *c[1]))

    carry = None  # (part, vals, last_ts)
    for frags in frag_lists:
        for pos, part, vals, fts, lts in frags:
            if carry is not None and carry[0] == part:
                merged = (part, merge(carry[1], vals, fts - carry[2]), lts)
            else:
                _finalize(carry)
                merged = (part, vals, lts)
            if pos == 0:  # completes inside this block
                _finalize(merged)
                carry = None
            else:  # pos 1 or 2: may continue into the next block
                carry = merged
    _finalize(carry)
    return rd.from_arrow_refs([r[0] for r in results]
                              + [ray.put(_table(finals))])


def max_drawdown_within(ds, part_col: str, ts_col: str, order_col: str,
                        val_col: str):
    """Per-partition MAX DRAWDOWN of the running value sum — the
    peak-to-trough statistic ``MAX(MAX(cum) OVER w − cum)`` where ``cum
    = SUM(val) OVER (PARTITION BY part ORDER BY ts, order ROWS UNBOUNDED
    PRECEDING)``. Although order-sensitive, the fold is exactly
    mergeable: a segment reduces to (n, S=Σv, maxCum, minCum, D) and two
    ordered segments combine as ``D' = max(D_a, D_b, maxCum_a − (S_a +
    minCum_b))`` with maxCum/minCum shifted by the left segment's total,
    so the shared scaffold applies unchanged — ONE sort exchange,
    interior runs finalized in-block, O(blocks) driver boundary carry.
    ``val_col`` must be int64 (scale to cents beforehand); all
    arithmetic is EXACT int64. Returns a Dataset
    (part_col, n_events, drawdown)."""

    def _dd(seg, vseg):
        v = vseg.astype(np.int64, copy=False)
        cum = np.cumsum(v)
        runmax = np.maximum.accumulate(cum)
        return (int(seg.size), int(cum[-1]), int(cum.max()),
                int(cum.min()), int((runmax - cum).max()))

    def _merge(c, f, bg):
        return (c[0] + f[0], c[1] + f[1],
                max(c[2], c[1] + f[2]), min(c[3], c[1] + f[3]),
                max(c[4], f[4], c[2] - (c[1] + f[3])))

    out = _partition_run_reduce(
        ds, part_col, ts_col, order_col,
        ["n_events", "s", "maxc", "minc", "drawdown"],
        run_agg=_dd, merge=_merge, emit=lambda v: True, val_col=val_col)
    return out.select_columns([part_col, "n_events", "drawdown"])


def adjacent_equal_counts(ds, part_col: str, order_keys: list,
                          val_col: str):
    """Per-partition count of ADJACENT EQUAL values (``LAG(val) OVER
    (PARTITION BY part ORDER BY order) = val``, NULL-safe-false) — the
    stutter/repeated-row detector. Unlike transition_counts the value
    domain is unbounded (text), so blocks never group by value: the
    pair-equality mask is a zero-copy shifted Arrow compare reduced per
    run via cumsum segment differences, shipping ≤runs skinny
    (part, n>0) partials; the B cross-block pairs and the distinct-partition total
    resolve in an O(blocks) driver boundary scan. Returns
    ``(merged_ds, total_parts)`` where merged_ds is (part_col, n) rows
    for partitions with ≥1 repeat (sorted_groupby-merged) and
    total_parts counts ALL partitions, so the zero class is
    ``total_parts − merged rows`` without materializing it."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = ds.sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    part_schema = pa.schema([(part_col, part_t), ("n", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(part_schema.empty_table()), 0

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        n = block.num_rows
        starts, widths = _run_bounds(k)
        info = (k[0].item() if hasattr(k[0], "item") else k[0],
                v[0].as_py(),
                k[-1].item() if hasattr(k[-1], "item") else k[-1],
                v[n - 1].as_py(), int(starts.size))
        if n == 1:
            return part_schema.empty_table(), info
        eq = pc.fill_null(pc.equal(v.slice(0, n - 1), v.slice(1, n)),
                          False).to_numpy(zero_copy_only=False)
        # run r's pairs are eq[starts[r] : ends[r]-1] — the cross-run
        # pair index ends[r]-1 is excluded by construction, and a
        # width-1 run yields an empty (zero) segment instead of the
        # reduceat end-of-array pitfall
        ends = starts + widths
        c = np.concatenate(([0], np.cumsum(eq.astype(np.int64))))
        reps = c[ends - 1] - c[starts]
        keep = reps > 0
        return pa.table({part_col: pa.array(k[starts[keep]], part_t),
                         "n": pa.array(reps[keep], pa.int64())}), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    edge_parts, total_parts = [], 0
    last_k, last_v = object(), None  # sentinel never equals a real key
    for info in infos:
        if info is None:
            continue
        fk, fv, lk, lv, nruns = info
        total_parts += nruns
        if fk == last_k:
            total_parts -= 1  # partition continues across the boundary
            if fv is not None and fv == last_v:
                edge_parts.append(fk)
        last_k, last_v = lk, lv
    edge = pa.table({part_col: pa.array(edge_parts, part_t),
                     "n": pa.array([1] * len(edge_parts), pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results] + [ray.put(edge)])
    inner, egroups = sorted_groupby(partials, [part_col],
                                    [("n", "sum", "n")])
    merged = inner
    if egroups is not None and egroups.num_rows:
        merged = merged.union(rd.from_arrow(egroups))
    return merged.union(rd.from_arrow(part_schema.empty_table())), total_parts


def session_gap_stats(ds, part_col: str, ts_col: str, order_col: str):
    """Per-partition inter-event gap stats — the LAG() window twin: for
    every partition with ≥2 events, (n_events, max_gap_us) where gaps
    are consecutive ts differences under (ts, order_col) ordering, i.e.
    SQL ``MAX(epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY part
    ORDER BY ts, order))`` with ``HAVING COUNT(*) > 1``. Cross-block
    gaps are exactly the fragment boundary differences the shared
    scaffold hands to ``merge``. Returns a Dataset
    (part_col, n_events, max_gap_us)."""
    return _partition_run_reduce(
        ds, part_col, ts_col, order_col, ["n_events", "max_gap_us"],
        run_agg=lambda seg: (int(seg.size),
                             int(np.diff(seg).max()) if seg.size >= 2 else -1),
        merge=lambda c, f, bg: (c[0] + f[0], max(c[1], f[1], bg)),
        emit=lambda v: v[0] >= 2)


def time_weighted_sum(ds, part_col: str, ts_col: str, order_col: str,
                      val_col: str):
    """Per-partition TIME-WEIGHTED value aggregate — the sensor/metrics
    twin of AVG: each event's value holds from its ts until the next
    event (last event carries no duration), so the partition aggregate
    is Σ vᵢ·(tsᵢ₊₁−tsᵢ) over Σ dt. SQL: ``SUM(v·(LEAD(ts) OVER w − ts))``
    / ``SUM(LEAD(ts) OVER w − ts)`` with ``HAVING COUNT(*) >= 2``.

    ``val_col`` must be int64 (scale floats to cents beforehand); NULL
    values contribute ZERO weighted mass for their interval while the
    interval still counts toward the span — exactly SQL's SUM skipping
    NULL products while SUM(dt) keeps the row. Otherwise everything is
    EXACT int64 end-to-end. Overflow bound: a partition's
    Σ|v·dt| must stay under 2^63, i.e. max|v| · partition-ts-span(µs)
    < 9.2·10^18 — cents-scaled metrics over year-long spans sit ~5×
    under it (56k·3.2·10^13). A cross-block boundary interval is the
    carry fragment's LAST value × the boundary gap, which is why the
    run aggregate ships ``last_v`` as a field. Returns a Dataset
    (part_col, n_events, wsum, span_us)."""

    def _twa(seg, vseg):
        if vseg.dtype.kind == "f":  # nulls arrived as NaN → zero mass
            vseg = np.nan_to_num(vseg, nan=0.0).astype(np.int64)
        if seg.size < 2:
            return (int(seg.size), 0, 0, int(vseg[-1]))
        dt = np.diff(seg)
        return (int(seg.size), int(np.sum(vseg[:-1] * dt)),
                int(seg[-1] - seg[0]), int(vseg[-1]))

    out = _partition_run_reduce(
        ds, part_col, ts_col, order_col,
        ["n_events", "wsum", "span_us", "last_v"],
        run_agg=_twa,
        merge=lambda c, f, bg: (c[0] + f[0], c[1] + f[1] + c[3] * bg,
                                c[2] + f[2] + bg, f[3]),
        emit=lambda v: v[0] >= 2,
        val_col=val_col)
    return out.select_columns([part_col, "n_events", "wsum", "span_us"])


def alternation_stats(ds, part_col: str, ts_col: str, order_col: str,
                      val_col: str):
    """Per-partition adjacent SAME-VALUE pair census — the
    role-alternation conformance check of a transcript validation
    engine (does any adjacent turn pair within a conversation share a
    role?): for every partition with ≥2 rows, (n_turns, same_pairs)
    where same_pairs counts ordered-adjacent pairs with equal
    ``val_col``. SQL twin: ``SUM(CASE WHEN val = LAG(val) OVER
    (PARTITION BY part ORDER BY ts, order) THEN 1 ELSE 0 END)`` with
    ``HAVING COUNT(*) >= 2``. ``val_col`` must be int64 codes (encode
    categorical values with any fixed dictionary first — only equality
    of adjacent codes matters). Cross-block adjacency is exact: each
    run fragment smuggles its first/last code through its own agg
    fields and the carry-merge compares them (time_weighted_sum's
    last_v discipline). Returns a Dataset (part_col, n_turns,
    same_pairs)."""

    def _alt(seg, vseg):
        n = int(seg.size)
        same = int(np.count_nonzero(vseg[1:] == vseg[:-1])) if n >= 2 else 0
        return (n, same, int(vseg[0]), int(vseg[-1]))

    out = _partition_run_reduce(
        ds, part_col, ts_col, order_col,
        ["n_turns", "same_pairs", "first_v", "last_v"],
        run_agg=_alt,
        merge=lambda c, f, bg: (c[0] + f[0],
                                c[1] + f[1] + (1 if c[3] == f[2] else 0),
                                c[2], f[3]),
        emit=lambda v: v[0] >= 2,
        val_col=val_col)
    return out.select_columns([part_col, "n_turns", "same_pairs"])


def subsequence_match(ds, part_col: str, ts_col: str, order_col: str,
                      code_col: str, seq_len: int):
    """Per-partition ORDERED-SUBSEQUENCE match: does the partition's
    event stream contain codes 0,1,…,seq_len−1 in order (arbitrary gaps)
    — the funnel/sequential-pattern predicate. ``code_col`` is int64
    with the target steps coded 0..seq_len−1 and everything else
    negative.

    Distributed shape: subsequence progress is a deterministic automaton
    (state s advances to s+1 on code s), and automata COMPOSE — each
    block run reduces to its full state-transition map m[s] = exit state
    when entering at s (computed by greedy earliest-match searchsorted
    hops, one sorted index array per code); a continuing partition
    merges by function composition merged[s] = f.m[c.m[s]]. The carry is
    seq_len+1 ints regardless of partition size. Returns a Dataset
    (part_col, matched, n_rows) with matched ∈ {0,1} — SQL twin: the
    chained greedy MIN-position EXISTS cascade."""
    if not (1 <= seq_len <= 16):
        raise ValueError(f"seq_len must be in [1, 16], got {seq_len}")

    def _runs(seg, vseg):
        v = (np.nan_to_num(vseg, nan=-1.0) if vseg.dtype.kind == "f"
             else vseg).astype(np.int64)
        n = int(v.size)
        pos = [np.nonzero(v == c)[0] for c in range(seq_len)]
        m = []
        for s in range(seq_len):
            cur, p = s, -1
            while cur < seq_len:
                nxt = pos[cur]
                i = np.searchsorted(nxt, p + 1)
                if i >= nxt.size:
                    break
                p = int(nxt[i])
                cur += 1
            m.append(cur)
        # m[seq_len] = seq_len (already matched stays matched)
        return (*m, seq_len, n)

    def _merge(c, f, bg):
        return (*(f[c[s]] for s in range(seq_len)), seq_len,
                c[seq_len + 1] + f[seq_len + 1])

    out = _partition_run_reduce(
        ds, part_col, ts_col, order_col,
        [f"m{s}" for s in range(seq_len + 1)] + ["n_rows"],
        run_agg=_runs, merge=_merge,
        emit=lambda v: True,
        val_col=code_col)

    def _final(t: pa.Table) -> pa.Table:
        matched = pc.cast(pc.equal(t["m0"], seq_len), pa.int64())
        return pa.table({part_col: t[part_col], "matched": matched,
                         "n_rows": t["n_rows"]})

    return out.map_batches(_final, batch_format="pyarrow",
                           batch_size=131072)


def longest_run(ds, part_col: str, ts_col: str, order_col: str,
                flag_col: str):
    """Per-partition LONGEST CONSECUTIVE RUN of a boolean flag — the
    streak/missing-data-island aggregate (longest stretch of null-tool
    turns in a conversation, longest error streak in a log): SQL twin is
    the two-ROW_NUMBER gaps-and-islands construction. ``flag_col`` must
    be int64 0/1.

    Distributed shape: the classic max-subsegment combine — each block
    run reduces to (longest, prefix_len, suffix_len, n_rows) in one
    vectorized pass; a continuing partition merges as longest =
    max(c.longest, f.longest, c.suffix + f.prefix) with prefix/suffix
    extended through all-true fragments (prefix == n ⇔ the whole
    fragment is true). Partitions with no true row are dropped (the
    twin's WHERE flag=1 does the same). Returns a Dataset
    (part_col, longest_run, n_rows)."""

    def _runs(seg, vseg):
        v = (np.nan_to_num(vseg, nan=0.0) if vseg.dtype.kind == "f"
             else vseg).astype(bool)
        n = int(v.size)
        if not v.any():
            return (0, 0, 0, n)
        # boundaries of true-runs via diff over padded int array
        padded = np.empty(n + 2, dtype=np.int8)
        padded[0] = padded[-1] = 0
        padded[1:-1] = v
        d = np.diff(padded)
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        lengths = ends - starts
        prefix = int(lengths[0]) if starts[0] == 0 else 0
        suffix = int(lengths[-1]) if ends[-1] == n else 0
        return (int(lengths.max()), prefix, suffix, n)

    def _merge(c, f, bg):
        joined = c[2] + f[1]
        longest = max(c[0], f[0], joined)
        prefix = c[1] if c[1] < c[3] else c[3] + f[1]
        suffix = f[2] if f[2] < f[3] else f[3] + c[2]
        return (longest, prefix, suffix, c[3] + f[3])

    out = _partition_run_reduce(
        ds, part_col, ts_col, order_col,
        ["longest_run", "prefix_len", "suffix_len", "n_rows"],
        run_agg=_runs, merge=_merge,
        emit=lambda v: v[0] >= 1,
        val_col=flag_col)
    return out.select_columns([part_col, "longest_run", "n_rows"])


def interval_coverage(ds, part_col: str, ts_col: str, order_col: str,
                      length_us: int):
    """Per-partition INTERVAL UNION of fixed-length event intervals —
    the gaps-and-islands coverage aggregate: each event covers
    [ts, ts+length); overlapping/touching intervals merge into islands;
    returns per partition the island count and total covered
    microseconds. SQL twin: the classic cumulative-max island detection
    (prev_max = MAX(e) OVER (... ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING); new island iff s > prev_max) then per-island
    MAX(e)−MIN(s) sums. For sorted fixed-length intervals an island
    break is exactly gap > length, so a block's run reduces to one
    vectorized np.diff; a cross-block continuation subtracts the
    double-counted overlap max(0, length − boundary_gap) and cancels
    one island — both exact int64 from the scaffold's boundary gap.
    Returns a Dataset (part_col, n_islands, covered_us)."""
    if length_us <= 0:
        raise ValueError(f"length_us must be positive, got {length_us}")

    def _cov(seg):
        if seg.size == 1:
            return (1, int(length_us))
        d = np.diff(seg)
        breaks = d > length_us
        n = 1 + int(np.count_nonzero(breaks))
        # coverage = Σ islands (last − first + length); equivalently
        # span plus length minus the closed inter-island gaps' excess:
        # Σ min(d, length) over non-break gaps + n·length... simplest
        # exact form: total = Σ d[~breaks] + n·length
        return (n, int(d[~breaks].sum()) + n * int(length_us))

    return _partition_run_reduce(
        ds, part_col, ts_col, order_col, ["n_islands", "covered_us"],
        run_agg=_cov,
        merge=lambda c, f, bg: (
            (c[0] + f[0] - 1, c[1] + f[1] - (int(length_us) - bg))
            if bg <= length_us else (c[0] + f[0], c[1] + f[1])),
        emit=lambda v: True)


def sessionize(ds, part_col: str, ts_col: str, order_col: str,
               gap_us: int = 1_800_000_000):
    """Per-partition session census under an inactivity-gap rule — the
    sessionization primitive of event/training-data pipelines: a new
    session starts at a partition's first event and whenever the gap to
    the previous event exceeds ``gap_us`` (default 30 min). SQL twin:
    ``SUM(CASE WHEN lag IS NULL OR ts - lag > gap THEN 1 ELSE 0 END)
    OVER (PARTITION BY part ORDER BY ts, order)`` then GROUP BY part.
    A cross-block continuation cancels the continuing fragment's first
    session start iff the boundary gap is within ``gap_us``. Returns a
    Dataset (part_col, n_sessions, n_events)."""

    def _sessions(seg):
        if seg.size < 2:
            return (int(seg.size), int(seg.size))
        return (1 + int(np.count_nonzero(np.diff(seg) > gap_us)),
                int(seg.size))

    return _partition_run_reduce(
        ds, part_col, ts_col, order_col, ["n_sessions", "n_events"],
        run_agg=_sessions,
        merge=lambda c, f, bg: (c[0] + f[0] - (1 if bg <= gap_us else 0),
                                c[1] + f[1]),
        emit=lambda v: True)


def concat_group_strings(ds, part_col: str, order_keys: list,
                         text_col: str, sep: str = "\n"):
    """Ordered per-partition string concatenation — SQL ``STRING_AGG(text,
    sep ORDER BY order_keys)`` — the transcript→training-document
    assembly op (one document per conversation, turns joined in order).
    NULL text rows are dropped first (STRING_AGG semantics); partitions
    with zero non-null texts are omitted.

    Distributed shape: ONE sort by (part, *order_keys); per block every
    interior run concatenates via a zero-copy Arrow LargeListArray +
    ``pc.binary_join`` (no Python string loop); the ≤2 edge runs per
    block ship as (part, blk, pos, partial_text, n) fragment rows into a
    single stitch task that re-joins them in (blk, pos) order — text
    never flows through the driver, and only boundary-straddling
    partitions' text moves twice. Assumption (same as any groupby): one
    partition's text fits a worker; the stitch task holds only the
    edge-straddling partitions, O(blocks) fragments. Returns a Dataset
    (part_col, text_col, n_parts)."""
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    def _drop_null(t: pa.Table) -> pa.Table:
        return t.filter(t[text_col].is_valid() if not isinstance(
            t[text_col], pa.ChunkedArray)
            else pc.is_valid(t[text_col]))

    try:
        rows = ds.count()
    except Exception:
        rows = None
    s = rightsize_blocks(
        ds.select_columns([part_col, text_col] + order_keys).map_batches(
            _drop_null, batch_format="pyarrow"),
        rows=rows).sort([part_col] + order_keys).materialize()
    refs = s.to_arrow_refs()
    part_t = (s.schema().base_schema.field(part_col).type
              if refs else pa.string())
    out_schema = pa.schema([(part_col, part_t), (text_col, pa.string()),
                            ("n_parts", pa.int64())])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    frag_schema = pa.schema([(part_col, part_t), ("blk", pa.int64()),
                             ("pos", pa.int64()), (text_col, pa.string()),
                             ("n", pa.int64())])

    def _join_runs_table(keys, texts, starts, widths, sel, blk=None,
                         pos=None):
        """Concatenate the selected runs of a sorted block via one
        vectorized binary_join over a LargeListArray view."""
        # gather the selected runs' rows (runs need not be adjacent, so
        # build an explicit values-index; each arange is one run slice)
        idx = np.concatenate([np.arange(starts[r], starts[r] + widths[r])
                              for r in sel]) if len(sel) else np.zeros(0, np.int64)
        la = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(widths[sel])]),
                     pa.int64()),
            texts.take(pa.array(idx, pa.int64())))
        joined = pc.binary_join(la, sep)
        cols = {part_col: keys.take(pa.array(starts[sel], pa.int64()))}
        if blk is None:
            return pa.table({**cols, text_col: pc.cast(joined, pa.string()),
                             "n_parts": pa.array(widths[sel], pa.int64())})
        return pa.table({**cols,
                         "blk": pa.array([blk] * len(sel), pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         text_col: pc.cast(joined, pa.string()),
                         "n": pa.array(widths[sel], pa.int64())})

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, blk: int):
        if block.num_rows == 0:
            return out_schema.empty_table(), frag_schema.empty_table()
        k = block[part_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        texts = block[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        starts, widths = _run_bounds(k.to_numpy(zero_copy_only=False))
        n_runs = starts.size
        interior = np.arange(1, max(n_runs - 1, 1))
        inner = (_join_runs_table(k, texts, starts, widths, interior)
                 if interior.size else out_schema.empty_table())
        edge_sel = np.array([0] if n_runs == 1 else [0, n_runs - 1],
                            np.int64)
        frags = _join_runs_table(k, texts, starts, widths, edge_sel,
                                 blk=blk, pos=list(range(len(edge_sel))))
        return inner, frags

    results = [_block.remote(r, i) for i, r in enumerate(refs)]

    @ray.remote
    def _stitch(*frag_tables):
        t = pa.concat_tables([f for f in frag_tables if f.num_rows])
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[(part_col, "ascending"),
                                            ("blk", "ascending"),
                                            ("pos", "ascending")])
        t = t.take(idx)
        k = t[part_col].combine_chunks()
        texts = t[text_col].combine_chunks()
        starts, widths = _run_bounds(k.to_numpy(zero_copy_only=False))
        out = _join_runs_table(k, texts, starts, widths,
                               np.arange(starts.size))
        ns = t["n"].to_numpy()
        n_parts = np.add.reduceat(ns, starts)
        return out.set_column(out.schema.get_field_index("n_parts"),
                              "n_parts", pa.array(n_parts, pa.int64()))

    stitched = _stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs([r[0] for r in results] + [stitched])


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


def event_roles(evn: np.ndarray) -> np.ndarray:
    """Vectorized event_type → transcript role mapping (the CASE in
    queries._TRANSCRIPTS_SQL): click/view→user, signup→system,
    purchase→assistant, error→tool, else user."""
    role = np.full(evn.size, "user", dtype=object)
    role[evn == "signup"] = "system"
    role[evn == "purchase"] = "assistant"
    role[evn == "error"] = "tool"
    return role


def _shape_transcript_block(block: pa.Table, rn: np.ndarray) -> pa.Table:
    """Arrow-vectorized projection of a numbered events block into the
    transcript layout (conv_id from user_id, role/tool from event_type)."""
    ev = block["event_type"]
    if isinstance(ev, pa.ChunkedArray):
        ev = ev.combine_chunks()
    evn = ev.to_numpy(zero_copy_only=False)
    role = event_roles(evn)
    err = evn == "error"
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


def value_islands(ds, part_col: str, ts_col: str, order_col: str,
                  val_col: str):
    """GAPS-AND-ISLANDS / SCD2 interval build: collapse each partition's
    ordered event stream into maximal runs of consecutive equal
    ``val_col`` (islands), one output row per island —
    (part, val, start_us, end_us, n_events) with the timestamps as
    int64 epoch-µs. The SQL twin is the classic LAG change-flag +
    windowed SUM island id + GROUP BY.

    Distributed shape: ONE sort by (part, ts, order); every island
    interior to a sorted block finalizes inside the block task; each
    block ships at most TWO tiny boundary fragments and the driver
    carry-merges them in block order — O(blocks) driver traffic,
    independent of partition or island sizes (same discipline as
    ``_partition_run_reduce``, but runs break on part OR value change
    and the island's value rides the fragment).

    ``val_col`` must be non-null: SQL's ``val = LAG(val)`` treats NULL
    as never-equal, so map nulls to a sentinel upstream to keep the twin
    exact."""
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    try:
        rows = ds.count()  # metadata-only on a raw read
    except Exception:
        rows = None
    sel = [part_col, ts_col, order_col, val_col]
    # projection via a pyarrow map (zero-copy) rather than select_columns:
    # pandas-block inputs (rd.from_pandas) would otherwise surface a
    # PandasBlockSchema with no Arrow field types below
    proj = ds.map_batches(lambda t: t.select(sel), batch_format="pyarrow",
                          batch_size=None)
    s = rightsize_blocks(proj, rows=rows).sort(
        [part_col, ts_col, order_col]).materialize()
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    val_t = sch.base_schema.field(val_col).type if sch else pa.string()
    out_schema = pa.schema([(part_col, part_t), (val_col, val_t),
                            ("start_us", pa.int64()), ("end_us", pa.int64()),
                            ("n_events", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(out_schema.empty_table())

    def _table(rows_):
        return pa.table({
            part_col: pa.array([r[0] for r in rows_], part_t),
            val_col: pa.array([r[1] for r in rows_], val_t),
            "start_us": pa.array([r[2] for r in rows_], pa.int64()),
            "end_us": pa.array([r[3] for r in rows_], pa.int64()),
            "n_events": pa.array([r[4] for r in rows_], pa.int64()),
        })

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return out_schema.empty_table(), []
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        n = k.size
        # island boundaries: part OR value changes along the sorted order
        chg = np.flatnonzero((k[1:] != k[:-1]) | (v[1:] != v[:-1])) + 1
        starts = np.concatenate(([0], chg, [n]))
        n_runs = starts.size - 1
        # interior islands (never touch a block edge) finalize here —
        # build the columns vectorized, not via per-run Python rows
        if n_runs > 2:
            a = starts[1:-2]
            b = starts[2:-1]
            inner = pa.table({
                part_col: pa.array(k[a], part_t),
                val_col: pa.array(v[a], val_t),
                "start_us": pa.array(ts[a], pa.int64()),
                "end_us": pa.array(ts[b - 1], pa.int64()),
                "n_events": pa.array((b - a).astype(np.int64), pa.int64()),
            })
        else:
            inner = out_schema.empty_table()
        frags = []
        edge_runs = [(0, 2)] if n_runs == 1 else [(0, 0), (n_runs - 1, 1)]
        for r, pos in edge_runs:
            a, b = int(starts[r]), int(starts[r + 1])
            frags.append((pos,
                          k[a].item() if hasattr(k[a], "item") else k[a],
                          v[a].item() if hasattr(v[a], "item") else v[a],
                          int(ts[a]), int(ts[b - 1]), b - a))
        return inner, frags

    results = [_block.remote(r) for r in refs]
    frag_lists = ray.get([r[1] for r in results])

    finals = []
    carry = None  # (part, val, start_us, end_us, n)

    def _close(c):
        if c is not None:
            finals.append(c)

    for frags in frag_lists:
        for pos, part, val, fts, lts, cnt in frags:
            if carry is not None and carry[0] == part and carry[1] == val:
                merged = (part, val, carry[2], lts, carry[4] + cnt)
            else:
                _close(carry)
                merged = (part, val, fts, lts, cnt)
            if pos == 0:  # completes inside this block
                _close(merged)
                carry = None
            else:  # pos 1 or 2: may continue into the next block
                carry = merged
    _close(carry)
    return rd.from_arrow_refs([r[0] for r in results]
                              + [ray.put(_table(finals))])


def session_intervals(ds, part_col: str, ts_col: str, order_col: str,
                      val_col: str, gap_us: int):
    """PER-SESSION INTERVAL ROWS with the session's first (landing)
    value: sessions break on partition change OR an inter-event gap
    greater than ``gap_us`` under (ts, order) ordering. One output row
    per session — (part, landing, start_us, end_us, n_events) — the
    row-level companion to ``sessionize`` (which only returns per-part
    counts) and the substrate for bounce/landing analytics.

    Same distributed shape as ``value_islands``: ONE sort, interior
    sessions finalize in block tasks, ≤2 boundary fragments per block
    carry-merged on the driver in block order; the cross-block merge
    re-applies the gap rule to the boundary timestamps, so a session
    spanning any number of blocks stitches exactly."""
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    try:
        rows = ds.count()
    except Exception:
        rows = None
    # dedupe the projection: callers may reuse one column as ts, order
    # and/or value (e.g. day-streak composition)
    sel = list(dict.fromkeys([part_col, ts_col, order_col, val_col]))
    proj = ds.map_batches(lambda t: t.select(sel), batch_format="pyarrow",
                          batch_size=None)
    sort_keys = list(dict.fromkeys([part_col, ts_col, order_col]))
    s = rightsize_blocks(proj, rows=rows).sort(sort_keys).materialize()
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    part_t = sch.base_schema.field(part_col).type if sch else pa.int64()
    val_t = sch.base_schema.field(val_col).type if sch else pa.string()
    out_schema = pa.schema([(part_col, part_t), ("landing", val_t),
                            ("start_us", pa.int64()), ("end_us", pa.int64()),
                            ("n_events", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(out_schema.empty_table())

    def _table(rows_):
        return pa.table({
            part_col: pa.array([r[0] for r in rows_], part_t),
            "landing": pa.array([r[1] for r in rows_], val_t),
            "start_us": pa.array([r[2] for r in rows_], pa.int64()),
            "end_us": pa.array([r[3] for r in rows_], pa.int64()),
            "n_events": pa.array([r[4] for r in rows_], pa.int64()),
        })

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return out_schema.empty_table(), []
        k = block[part_col].to_numpy(zero_copy_only=False)
        v = block[val_col].to_numpy(zero_copy_only=False)
        ts = block[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        n = k.size
        chg = np.flatnonzero((k[1:] != k[:-1])
                             | ((ts[1:] - ts[:-1]) > gap_us)) + 1
        starts = np.concatenate(([0], chg, [n]))
        n_runs = starts.size - 1
        if n_runs > 2:
            a = starts[1:-2]
            b = starts[2:-1]
            inner = pa.table({
                part_col: pa.array(k[a], part_t),
                "landing": pa.array(v[a], val_t),
                "start_us": pa.array(ts[a], pa.int64()),
                "end_us": pa.array(ts[b - 1], pa.int64()),
                "n_events": pa.array((b - a).astype(np.int64), pa.int64()),
            })
        else:
            inner = out_schema.empty_table()
        frags = []
        edge_runs = [(0, 2)] if n_runs == 1 else [(0, 0), (n_runs - 1, 1)]
        for r, pos in edge_runs:
            a, b = int(starts[r]), int(starts[r + 1])
            frags.append((pos,
                          k[a].item() if hasattr(k[a], "item") else k[a],
                          v[a].item() if hasattr(v[a], "item") else v[a],
                          int(ts[a]), int(ts[b - 1]), b - a))
        return inner, frags

    results = [_block.remote(r) for r in refs]
    frag_lists = ray.get([r[1] for r in results])

    finals = []
    carry = None  # (part, landing, start_us, end_us, n)

    def _close(c):
        if c is not None:
            finals.append(c)

    for frags in frag_lists:
        for pos, part, val, fts, lts, cnt in frags:
            if (carry is not None and carry[0] == part
                    and fts - carry[3] <= gap_us):
                merged = (part, carry[1], carry[2], lts, carry[4] + cnt)
            else:
                _close(carry)
                merged = (part, val, fts, lts, cnt)
            if pos == 0:
                _close(merged)
                carry = None
            else:
                carry = merged
    _close(carry)
    return rd.from_arrow_refs([r[0] for r in results]
                              + [ray.put(_table(finals))])


def weighted_pair_dot(ds, key_col: str, item_col: str, w_col: str):
    """WEIGHTED ITEM-PAIR DOT PRODUCTS (item-item collaborative
    filtering): input rows (key, item, w) with one row per (key, item);
    for every unordered item pair, Σ over keys of w_a · w_b — the exact
    integer dot product between the items' key-indexed count vectors
    (cosine/Jaccard numerators). ``pair_cooccurrence`` is the unweighted
    special case; same distributed shape: ONE sort by (key, item),
    in-run pairs expand vectorized per block (item_a < item_b free from
    the sort), straddling keys ship ≤B tiny (items, weights) fragments
    to an O(blocks) driver cross-pair scan, one skinny sorted_groupby
    merges the partial dots. Returns (inner_ds, edge_table) over
    (item_a, item_b, dot) in sorted_groupby's contract. Weights must be
    int64 (exactness contract)."""
    import ray
    import ray.data as rd

    from .fast_ops import sorted_groupby

    s = (ds.map_batches(
        lambda t: t.select([key_col, item_col, w_col]),
        batch_format="pyarrow", batch_size=None)
        .sort([key_col, item_col]).materialize())
    refs = s.to_arrow_refs()
    sch = s.schema() if refs else None
    item_t = sch.base_schema.field(item_col).type if sch else pa.int64()
    part_schema = pa.schema([("item_a", item_t), ("item_b", item_t),
                             ("dot", pa.int64())])
    if not refs or sch is None:
        return rd.from_arrow(part_schema.empty_table()), None

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return part_schema.empty_table(), None
        k = block[key_col].to_numpy(zero_copy_only=False)
        v = block[item_col].to_numpy(zero_copy_only=False)
        w = block[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, widths = _run_bounds(k)
        pas, pbs, pds = [], [], []
        for width in np.unique(widths):
            if width < 2:
                continue
            sel = starts[widths == width]
            idx = sel[:, None] + np.arange(width)[None, :]
            mi = v[idx]
            mw = w[idx]
            iu, ju = np.triu_indices(int(width), 1)
            pas.append(mi[:, iu].ravel())
            pbs.append(mi[:, ju].ravel())
            pds.append((mw[:, iu] * mw[:, ju]).ravel())
        first_w = int(widths[0])
        last_s, last_w = int(starts[-1]), int(widths[-1])
        info = (k[0], v[:first_w].tolist(), w[:first_w].tolist(),
                k[-1], v[last_s:last_s + last_w].tolist(),
                w[last_s:last_s + last_w].tolist())
        if not pas:
            return part_schema.empty_table(), info
        t = pa.table({"item_a": pa.array(np.concatenate(pas), item_t),
                      "item_b": pa.array(np.concatenate(pbs), item_t),
                      "dot": pa.array(np.concatenate(pds), pa.int64())})
        g = t.group_by(["item_a", "item_b"],
                       use_threads=False).aggregate([("dot", "sum")])
        g = g.rename_columns(
            [{"dot_sum": "dot"}.get(c, c) for c in g.column_names]
        ).select(part_schema.names)
        return g.cast(part_schema), info

    results = [_block.remote(r) for r in refs]
    infos = ray.get([r[1] for r in results])
    pas_e, pbs_e, pds_e = [], [], []
    last_key, p_items, p_ws = object(), [], []
    for info in infos:
        if info is None:
            continue
        fk, fi, fw, lk, li, lw = info
        if fk == last_key and p_items:
            # sorted order across fragments: prefix items < fragment items
            for a, wa in zip(p_items, p_ws):
                pas_e.extend([a] * len(fi))
                pbs_e.extend(fi)
                pds_e.extend(wa * x for x in fw)
        if lk == last_key:
            p_items = p_items + li
            p_ws = p_ws + lw
        else:
            p_items = list(li)
            p_ws = list(lw)
        last_key = lk
    edge_t = pa.table({"item_a": pa.array(pas_e, item_t),
                       "item_b": pa.array(pbs_e, item_t),
                       "dot": pa.array(pds_e, pa.int64())})
    partials = rd.from_arrow_refs([r[0] for r in results]
                                  + [ray.put(edge_t)])
    return sorted_groupby(partials, ["item_a", "item_b"],
                          [("dot", "sum", "dot")])
