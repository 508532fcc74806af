"""Distributed sort-merge equi-join (big ⨝ big).

The broadcast lookup/semi joins (stages/referential.py) cover the
small-dimension side; this operator covers two LARGE sides where neither
fits a broadcast — the classic shuffle join, built on the same machinery
as the as-of/range operators:

1. Tag both sides into a union-schema table (key, side, left payload ∪
   right payload with nulls on the opposite side).
2. ONE sort by (key, side) — the only exchange; right rows sort before
   left rows within a key run.
3. Per sorted block: every key run interior to the block emits its
   left × right cross product vectorized (repeat/tile index build + two
   arrow takes) — INNER join semantics.
4. The ≤2 runs touching each block's edges re-assemble and join inside
   a ray task (never on the driver).

Partitioning assumption (documented per the driver brief): rows per join
key are bounded (e.g. lineitem ≤ 7 rows per orderkey) — a key whose
left×right product is huge belongs in a salted/broadcast plan instead.
Keys whose pair product exceeds ``max_pairs_per_key`` OR whose longer
side exceeds the derived ``edge_clip`` row bound are skipped with a
logged count rather than silently exploding a task; both bounds are
enforced identically on interior runs and block-straddling runs, so the
join result is a deterministic function of the data, never of where the
sort happened to place block boundaries.

The reference has no joins (Profiler.py is single-table); this closes
the §2.4 big-big gap with a TPC-H-Q3-shaped oracle twin
(queries.ORACLE['q3_shipping']).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fast_ops import run_bounds


def sorted_merge_join(left_ds, right_ds, left_key: str, right_key: str,
                      left_cols: list, right_cols: list,
                      max_pairs_per_key: int = 1_000_000,
                      rows_hint: int | None = None,
                      how: str = "inner"):
    """Equi-join returning a Dataset with ``left_cols + right_cols``
    (names must be disjoint). Keys compare as int64. ``how``: "inner",
    "left" (LEFT OUTER — unmatched left rows emit with nulls on the
    right payload) or "full" (FULL OUTER — unmatched rows of BOTH sides
    emit with nulls opposite). Null keys never match, like SQL; under
    the outer modes null-key rows still emit as unmatched (a second
    column-pruned pass over the owning side collects them — they never
    enter the sort exchange). Oversize/elongated keys are skipped under
    ALL modes (their rows on both sides) — the documented
    bounded-rows-per-key contract.

    Pass ``rows_hint`` (an upper bound is fine) whenever the inputs have
    transforms applied — ``count()`` on a transformed Dataset executes
    its whole pipeline, i.e. a full extra scan per side."""
    import ray
    import ray.data as rd

    from .fast_ops import rightsize_blocks

    # input validation raises (not assert: asserts vanish under python -O,
    # and an overlapping payload name would silently corrupt the join)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload column names must be disjoint: {sorted(overlap)}")
    reserved = {"__k", "__side"} & set(left_cols + right_cols)
    if reserved:
        raise ValueError(f"column names {sorted(reserved)} are reserved")
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}
    out_schema = pa.schema(
        [(c, l_types[c]) for c in left_cols] + [(c, r_types[c]) for c in right_cols]
    )

    def _tag_left(batch: pa.Table) -> pa.Table:
        # inner-join semantics: null keys never match — drop them here,
        # which also keeps __k.to_numpy() int64 (nullable ints convert to
        # float64 and collapse distinct keys above 2^53)
        batch = batch.filter(batch[left_key].is_valid())
        n = batch.num_rows
        cols = {"__k": pc.cast(batch[left_key], pa.int64()),
                "__side": pa.array(np.ones(n, np.int8))}
        for c in left_cols:
            cols[c] = batch[c]
        for c in right_cols:
            cols[c] = pa.nulls(n, r_types[c])
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch[right_key].is_valid())
        n = batch.num_rows
        cols = {"__k": pc.cast(batch[right_key], pa.int64()),
                "__side": pa.array(np.zeros(n, np.int8))}
        for c in left_cols:
            cols[c] = pa.nulls(n, l_types[c])
        for c in right_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    tagged = left_ds.select_columns(
        list(dict.fromkeys([left_key] + left_cols))
    ).map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(
            list(dict.fromkeys([right_key] + right_cols))
        ).map_batches(_tag_right, batch_format="pyarrow")
    )
    # without a hint the inputs are NOT counted: count() on a transformed
    # Dataset executes its whole pipeline (a full extra scan per side) —
    # callers wanting small-input coalescing pass rows_hint
    if rows_hint is not None:
        tagged = rightsize_blocks(tagged, rows=rows_hint)
    s = tagged.sort(["__k", "__side"]).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    # the bounded-rows-per-key contract: keys with one side longer than
    # edge_clip are skipped EVERYWHERE (interior runs and edge stitch
    # alike), so the result is a deterministic function of the data — not
    # of where block boundaries happened to land. Edge runs ship clipped
    # at this bound; true per-run side counts travel alongside, so the
    # skip decision is exact for straddling keys too.
    edge_clip = max(1024, 2 * int(max_pairs_per_key ** 0.5))

    def _ragged_ranges(starts_arr: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """concatenate(arange(s, s+c) for s, c in zip(starts, counts)) —
        fully vectorized (the per-run Python loop was the join's wall-time
        at many-tiny-runs workloads like the dedup verify exchange)."""
        total = int(counts.sum())
        if total == 0:
            return np.array([], np.int64)
        rep = np.repeat(np.arange(counts.size), counts)
        excl = np.concatenate([[0], np.cumsum(counts)[:-1]])
        return starts_arr[rep] + (np.arange(total, dtype=np.int64) - excl[rep])

    def _join_runs(block: pa.Table, lo_run: int, hi_run: int,
                   starts, widths, side: np.ndarray) -> pa.Table:
        if hi_run <= lo_run:
            return out_schema.empty_table()
        st = np.asarray(starts[lo_run:hi_run], dtype=np.int64)
        wd = np.asarray(widths[lo_run:hi_run], dtype=np.int64)
        # per-run right-row count: rows sort (key, side), right (side=0)
        # first within each run — prefix sums beat a per-run scan
        cs = np.concatenate([[0], np.cumsum(side == 0)])
        nr = cs[st + wd] - cs[st]
        nl = wd - nr
        both = (nl > 0) & (nr > 0)
        over = both & (nl * nr > max_pairs_per_key)
        elong = both & ~over & ((nl > edge_clip) | (nr > edge_clip))
        skipped = int(over.sum())
        elongated = int(elong.sum())
        if skipped or elongated:
            import logging

            logging.getLogger(__name__).warning(
                "sorted_merge_join: skipped %d keys whose pair product "
                "exceeds %d and %d elongated keys with one side longer "
                "than %d rows — such keys need a salted/broadcast plan",
                skipped, max_pairs_per_key, elongated, edge_clip)
        # matched cross products, all qualifying runs at once: output j of
        # run r pairs left row j//nr_r with right row j%nr_r (same l-major
        # order as the former repeat/tile per-run build)
        ok = both & ~over & ~elong
        p = np.where(ok, nl * nr, 0)
        total_m = int(p.sum())
        if total_m:
            rep = np.repeat(np.arange(p.size), p)
            excl = np.concatenate([[0], np.cumsum(p)[:-1]])
            j = np.arange(total_m, dtype=np.int64) - excl[rep]
            nr_rep = nr[rep]
            li_m = (st + nr)[rep] + j // nr_rep
            ri_m = st[rep] + j % nr_rep
        else:
            li_m = np.array([], np.int64)
            ri_m = np.array([], np.int64)
        li_n = np.array([], np.int64)  # LEFT/FULL: left rows of match-less keys
        ri_n = np.array([], np.int64)  # FULL: right rows of match-less keys
        if how in ("left", "full"):
            lonly = (nl > 0) & (nr == 0)
            li_n = _ragged_ranges((st + nr)[lonly], nl[lonly])
        if how == "full":
            ronly = (nr > 0) & (nl == 0)
            ri_n = _ragged_ranges(st[ronly], nr[ronly])
        if not li_m.size and not li_n.size and not ri_n.size:
            return out_schema.empty_table()
        # index layout: [matched | left-only (null right) | right-only
        # (null left)]; pa.array's mask=True marks nulls and Arrow take
        # propagates null indices to null output values
        total = li_m.size + li_n.size + ri_n.size
        l_vals = np.concatenate([li_m, li_n, np.zeros(ri_n.size, np.int64)])
        l_mask = np.zeros(total, dtype=bool)
        l_mask[li_m.size + li_n.size:] = True
        r_vals = np.concatenate([ri_m, np.zeros(li_n.size, np.int64), ri_n])
        r_mask = np.zeros(total, dtype=bool)
        r_mask[li_m.size: li_m.size + li_n.size] = True
        li = pa.array(l_vals, pa.int64(), mask=l_mask)
        ri = pa.array(r_vals, pa.int64(), mask=r_mask)
        cols = {c: block[c].take(li) for c in left_cols}
        cols.update({c: block[c].take(ri) for c in right_cols})
        return pa.table(cols)

    edge_schema = pa.schema([("__k", pa.int64()), ("__side", pa.int8())]
                            + list(out_schema))
    cnt_schema = pa.schema([("__k", pa.int64()), ("nl", pa.int64()),
                            ("nr", pa.int64())])

    @ray.remote(num_returns=3)
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return (out_schema.empty_table(), edge_schema.empty_table(),
                    cnt_schema.empty_table())
        k = block["__k"].to_numpy()
        side = block["__side"].to_numpy()
        starts, widths = run_bounds(k)
        n_runs = starts.size
        inner = _join_runs(block, 1, n_runs - 1, starts, widths, side)
        edge_idx, ck, cl, cr = [], [], [], []
        for r in {0, n_runs - 1}:
            a, b = int(starts[r]), int(starts[r] + widths[r])
            seg_side = side[a:b]
            ri = np.flatnonzero(seg_side == 0) + a
            li = np.flatnonzero(seg_side == 1) + a
            ck.append(int(k[a]))
            cl.append(int(li.size))
            cr.append(int(ri.size))
            edge_idx.append(li[:edge_clip])
            edge_idx.append(ri[:edge_clip])
        idx = np.sort(np.concatenate(edge_idx)) if edge_idx else np.array([], np.int64)
        counts = pa.table({"__k": pa.array(ck, pa.int64()),
                           "nl": pa.array(cl, pa.int64()),
                           "nr": pa.array(cr, pa.int64())})
        return inner, block.take(pa.array(idx, pa.int64())), counts

    @ray.remote
    def _edge_stitch(counts_refs, *tables):
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        import pandas as pd

        # refs nested in a list are NOT auto-resolved by ray.remote
        counts_tables = ray.get(list(counts_refs))
        true = pa.concat_tables([t for t in counts_tables if t.num_rows]) \
            .to_pandas().groupby("__k").sum()
        et = pa.concat_tables(nonempty).sort_by(
            [("__k", "ascending"), ("__side", "ascending")])
        k = et["__k"].to_numpy()
        side = et["__side"].to_numpy()
        starts, widths = run_bounds(k)
        keep_runs, elongated = [], 0
        for r in range(starts.size):
            key = int(k[starts[r]])
            nl = int(true.loc[key, "nl"])
            nr = int(true.loc[key, "nr"])
            if nl * nr > max_pairs_per_key:
                continue  # counted by _join_runs semantics: oversize skip
            if nl > edge_clip or nr > edge_clip:
                elongated += 1  # under the pair cap but rows were clipped
                continue
            keep_runs.append(r)
        if elongated:
            import logging

            logging.getLogger(__name__).warning(
                "sorted_merge_join: skipped %d elongated hot keys with one "
                "side longer than %d rows (bounded-rows-per-key contract)",
                elongated, edge_clip)
        parts = [_join_runs(et, r, r + 1, starts, widths, side)
                 for r in keep_runs]
        parts = [p for p in parts if p.num_rows]
        return pa.concat_tables(parts) if parts else out_schema.empty_table()

    results = [_block.remote(r) for r in refs]
    edge_ref = _edge_stitch.remote([r[2] for r in results],
                                   *[r[1] for r in results])
    out = rd.from_arrow_refs([r[0] for r in results] + [edge_ref])

    # SQL outer semantics for null-key rows: they never match, but they
    # DO emit with nulls opposite. They were dropped before the exchange
    # (a null sort key has no run), so collect them in a second
    # column-pruned pass over the owning side and union them in.
    def _null_key_rows(src, key, own_cols, other_types):
        def _fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_null(batch[key]))
            n = batch.num_rows
            cols = {c: batch[c] for c in own_cols}
            cols.update({c: pa.nulls(n, t) for c, t in other_types.items()})
            return pa.table(cols).select(out_schema.names)

        return src.select_columns(
            list(dict.fromkeys([key] + own_cols))
        ).map_batches(_fn, batch_format="pyarrow")

    if how in ("left", "full"):
        out = out.union(_null_key_rows(left_ds, left_key, left_cols, r_types))
    if how == "full":
        out = out.union(_null_key_rows(right_ds, right_key, right_cols, l_types))
    return out


def skew_resilient_join(left_ds, right_ds, left_key: str, right_key: str,
                        left_cols: list, right_cols: list,
                        hot_threshold: int = 1024,
                        rows_hint: int | None = None):
    """INNER equi-join that stays exact under KEY SKEW — the classic
    skew-join plan composed from this module's parts:

    1. One cheap key-count pass per side (``sorted_groupby`` over the
       key column only) finds HOT keys: left count > ``hot_threshold``
       (with the right side small for those keys — the fact⨝dim skew
       shape; a key hot on BOTH sides still pair-explodes by definition
       and keeps the bounded-product cap).
    2. Right-side rows of hot keys are fetched and BROADCAST once
       (``ray.put``); hot left rows join MAP-SIDE against them inside
       their own read tasks — the hot key's millions of rows never enter
       the sort exchange at all, so no reducer sees the skew.
    3. Cold keys flow through the ordinary ``sorted_merge_join``.
    4. Union of both paths.

    Compared to plain ``sorted_merge_join`` (which SKIPS elongated keys
    by contract), this operator keeps them — it trades one extra
    key-count exchange for totality under skew."""
    import ray
    import ray.data as rd

    import numpy as np

    from .fast_ops import sorted_groupby

    # 1. per-key left counts (skinny exchange over the key column only)
    inner_c, edge_c = sorted_groupby(
        left_ds.select_columns([left_key]), [left_key],
        [(None, "count_all", "n")])
    hot_parts = inner_c.map_batches(
        lambda t: t.filter(pc.greater(t["n"], hot_threshold)),
        batch_format="pyarrow").to_pandas()
    hot_keys = set(hot_parts[left_key].tolist())
    if edge_c is not None and edge_c.num_rows:
        ec = edge_c.to_pandas()
        hot_keys |= set(ec.loc[ec["n"] > hot_threshold, left_key].tolist())
    hot_arr = np.sort(np.array(sorted(hot_keys), dtype=np.int64))

    if not hot_keys:
        return sorted_merge_join(left_ds, right_ds, left_key, right_key,
                                 left_cols, right_cols,
                                 rows_hint=rows_hint)

    # 2. broadcast the right-side rows of the hot keys
    def _right_hot(batch: pa.Table) -> pa.Table:
        k = batch[right_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(hot_arr, k)
        idx[idx >= hot_arr.size] = 0
        mask = hot_arr[idx] == k
        return batch.filter(pa.array(mask)).select(
            list(dict.fromkeys([right_key] + right_cols)))

    hot_right = pa.concat_tables(
        [b for b in ray.get(
            right_ds.select_columns(
                list(dict.fromkeys([right_key] + right_cols))
            ).map_batches(_right_hot, batch_format="pyarrow").to_arrow_refs())
         if b.num_rows])
    hot_right = hot_right.sort_by([(right_key, "ascending")])
    hot_ref = ray.put(hot_right)
    r_schema = right_ds.schema().base_schema
    r_types = {c: r_schema.field(c).type for c in right_cols}

    # 3a. map-side join of hot left rows against the broadcast
    def _hot_left_join(batch: pa.Table) -> pa.Table:
        k = batch[left_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(hot_arr, k)
        idx[idx >= hot_arr.size] = 0
        mask = hot_arr[idx] == k
        sub = batch.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table(
                {c: pa.array([], l_types[c]) for c in left_cols}
                | {c: pa.array([], r_types[c]) for c in right_cols})
        rt = ray.get(hot_ref)
        rk = rt[right_key].to_numpy(zero_copy_only=False)
        sk = sub[left_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rk, sk, side="left")
        hi = np.searchsorted(rk, sk, side="right")
        cnt = hi - lo
        li = np.repeat(np.arange(sub.num_rows), cnt)
        ri = (np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)])
              if cnt.sum() else np.array([], np.int64))
        li_a = pa.array(li, pa.int64())
        ri_a = pa.array(ri, pa.int64())
        cols = {c: sub[c].take(li_a) for c in left_cols}
        cols.update({c: rt[c].take(ri_a) for c in right_cols})
        return pa.table(cols)

    l_schema = left_ds.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in left_cols}
    hot_out = left_ds.select_columns(
        list(dict.fromkeys([left_key] + left_cols))
    ).map_batches(_hot_left_join, batch_format="pyarrow")

    # 3b. cold keys through the ordinary sort-merge join
    def _drop_hot(key_name):
        def _fn(batch: pa.Table) -> pa.Table:
            k = batch[key_name].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            idx = np.searchsorted(hot_arr, k)
            idx[idx >= hot_arr.size] = 0
            return batch.filter(pa.array(hot_arr[idx] != k))

        return _fn

    cold = sorted_merge_join(
        left_ds.map_batches(_drop_hot(left_key), batch_format="pyarrow"),
        right_ds.map_batches(_drop_hot(right_key), batch_format="pyarrow"),
        left_key, right_key, left_cols, right_cols, rows_hint=rows_hint)
    return cold.union(hot_out)
