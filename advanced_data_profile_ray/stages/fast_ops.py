"""Vectorized sort-based group aggregation (the fast path around Ray's
row-iterating groupby).

Ray Data 2.49's ``groupby().aggregate()`` reduce walks Python rows
(`heapq.merge` over ``iter_rows`` in table_block.py:_combine_aggregated_blocks)
— ~50µs/row, which dominates any large shuffle. ``Dataset.sort`` however is
fully vectorized (pyarrow ``sort_indices`` + range partitioning), ~5-7×
faster at 1M rows and the gap grows with scale. So for large-N grouped
aggregations we:

1. pre-aggregate each input batch with **pyarrow's** ``Table.group_by``
   (C++ hash aggregation, zero Python per row),
2. ``ds.sort(keys)`` — the only exchange,
3. re-aggregate each sorted block with ``Table.group_by`` again, so every
   group is now whole within a block EXCEPT the (≤2 per block) groups
   touching block edges,
4. stitch the edge groups on the driver (≤ 2×num_blocks tiny rows) and
   union the corrected rows back.

The per-block output marks edge rows; algebraic aggs (count/sum/min/max)
re-merge exactly. Deterministic for a given sort (ties inside a block are
handled by group_by; across blocks by the driver merge).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_AGG_MERGE = {"count": "sum", "count_all": "sum", "sum": "sum", "min": "min", "max": "max"}


def _block_group_agg(keys: list, aggs: list):
    """Returns a map_batches body: arrow group_by + edge marking.

    aggs: list of (src_col, fn, out_name) with fn in count/sum/min/max.
    The output of stage-1 pre-agg feeds stage-3 with fn replaced by its
    merge fn and src = out_name.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_out(batch, keys, aggs)
        # count_all (null-safe row count) takes an empty target list
        spec = [([] if fn == "count_all" else src, fn) for src, fn, _ in aggs]
        g = batch.group_by(keys, use_threads=False).aggregate(spec)
        # arrow names outputs "<src>_<fn>" ("count_all" for row counts)
        rename = {
            (f"{src}_{fn}" if fn != "count_all" else "count_all"): out
            for src, fn, out in aggs
        }
        g = g.rename_columns([rename.get(c, c) for c in g.column_names])
        # canonical column order: arrow emits aggregates before keys, while
        # _empty_out builds keys first — normalize so empty and non-empty
        # blocks unify under Ray's schema check on sort/union/take
        return g.select(keys + [out for _, _, out in aggs])

    return _fn


def _empty_out(batch: pa.Table, keys: list, aggs: list) -> pa.Table:
    fields = [(k, batch.schema.field(k).type) for k in keys]
    out_types = {
        "count": pa.int64(),
        "sum": pa.int64(),
        "min": None,
        "max": None,
    }
    cols = {k: pa.array([], t) for k, t in fields}
    for src, fn, out in aggs:
        t = pa.int64() if fn in ("count", "count_all") else (
            batch.schema.field(src).type if src in batch.column_names else pa.int64()
        )
        cols[out] = pa.array([], t)
    return pa.table(cols)


def sorted_groupby(ds, keys: list, aggs: list, batch_size: int | None = 65536):
    """Vectorized grouped aggregation.

    Args:
        ds: input Dataset (only ``keys`` + agg source columns are shuffled;
            select beforehand).
        keys: group-key column names.
        aggs: list of (src_col, fn, out_name), fn in {count,sum,min,max}.

    Returns:
        (inner_ds, edge_table): ``inner_ds`` is a Dataset of fully-merged
        groups that never touch a block edge; ``edge_table`` is a small
        in-memory pyarrow.Table of driver-merged edge groups. The full
        result is their union (see ``sorted_groupby_to_table`` for small
        outputs, or union inner_ds with ray.data.from_arrow(edge_table)).
    """
    import ray
    import ray.data as rd

    # batch_size matters: testdata reads split into ~8k-row blocks (Ray's
    # 200-block read heuristic); 64k batches amortize per-task overhead and
    # cut the number of sort partitions ~8× (measured 4× wall-clock win)
    pre = ds.map_batches(
        _block_group_agg(keys, aggs), batch_format="pyarrow", batch_size=batch_size
    )
    merge_aggs = [(out, _AGG_MERGE[fn], out) for _, fn, out in aggs]
    s = pre.sort(keys)
    merged = s.map_batches(
        _block_group_agg(keys, merge_aggs), batch_format="pyarrow", batch_size=None
    )

    # split inner rows from edge rows per block: within a block the group_by
    # output is NOT sorted (hash order), so re-find the extreme key rows.
    def _tag_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__edge", pa.array([], pa.bool_()))
        idx = pc.sort_indices(batch, sort_keys=[(k, "ascending") for k in keys])
        first = idx[0].as_py()
        last = idx[-1].as_py()
        edge = [False] * batch.num_rows
        edge[first] = True
        edge[last] = True
        return batch.append_column("__edge", pa.array(edge, pa.bool_()))

    # materialize ONCE before the inner/edge split: both consumers below
    # would otherwise re-execute the lazy pipeline independently — and each
    # re-execution re-samples sort boundaries, so the edge set of one run
    # would not match the block layout of the other (loses straddling
    # groups) and the whole shuffle would run twice.
    tagged = merged.map_batches(
        _tag_edges, batch_format="pyarrow", batch_size=None
    ).materialize()
    inner = tagged.map_batches(
        lambda t: t.filter(pc.invert(t["__edge"])).drop_columns(["__edge"]),
        batch_format="pyarrow", batch_size=None,
    )
    # schema-preserving edge collection (take_all→from_pylist would
    # promote int32 aggregates to int64 and break later unions)
    edge_blocks = ray.get(
        tagged.map_batches(
            lambda t: t.filter(t["__edge"]).drop_columns(["__edge"]),
            batch_format="pyarrow", batch_size=None,
        ).to_arrow_refs()
    )
    edge_blocks = [b for b in edge_blocks if b.num_rows]

    if edge_blocks:
        et = pa.concat_tables(edge_blocks)
        spec = [(out, _AGG_MERGE[fn]) for _, fn, out in aggs]
        eg = et.group_by(keys, use_threads=False).aggregate(spec)
        rename = {f"{out}_{_AGG_MERGE[fn]}": out for _, fn, out in aggs}
        eg = eg.rename_columns([rename.get(c, c) for c in eg.column_names])
        # normalize column order to match inner
        order = keys + [out for _, _, out in aggs]
        edge_table = eg.select(order)
    else:
        edge_table = None
    return inner, edge_table




def run_bounds(keys):
    """(starts, widths) of equal-key runs in a sorted 1-D array — the
    single shared run-boundary helper for every sort-based operator
    (window/sessionize/asof/dedup edge machinery)."""
    import numpy as np

    n = keys.size
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    widths = np.diff(np.append(starts, n))
    return starts, widths


def run_starts(keys):
    """Run boundaries including the terminal index: [0, ...starts, n]."""
    import numpy as np

    starts, widths = run_bounds(keys)
    if starts.size == 0:
        return np.array([0, 0], np.int64) if keys.size == 0 else starts
    return np.append(starts, keys.size)


def run_bounds_cols(arrays: list):
    """(starts, widths) of equal-TUPLE runs across several aligned sorted
    arrays — the multi-key twin of run_bounds."""
    import numpy as np

    n = arrays[0].size
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for a in arrays:
        change |= a[1:] != a[:-1]
    starts = np.concatenate([[0], np.nonzero(change)[0] + 1]).astype(np.int64)
    widths = np.diff(np.append(starts, n))
    return starts, widths


def grouped_topk(ds, keys: list, order_col: str, k: int,
                 payload_cols: list | None = None,
                 tie_cols: list | None = None,
                 rows_hint: int | None = None):
    """Top-k rows PER GROUP by ``order_col`` DESC (ties broken by
    ``tie_cols`` ASC) — SQL ``QUALIFY ROW_NUMBER() OVER (PARTITION BY
    keys ORDER BY order_col DESC, tie_cols) <= k`` as a distributed
    operator (§2.6 generalization of the global top-k path).

    Shape: ONE sort by (keys ASC, order_col DESC, tie_cols ASC) — after
    it a group's rows are contiguous ACROSS blocks in final order, so
    every interior run takes its first k rows vectorized in the block
    task, and each edge run ships only its first min(k, len) rows (any
    global top-k row of a straddling group is necessarily among its
    fragment's first k). The stitch re-sorts the ≤ 2k rows per block and
    heads k per group — driver traffic is O(blocks × k), independent of
    group sizes. Returns a Dataset of keys + order_col + tie/payload
    columns."""
    import ray
    import ray.data as rd

    tie_cols = tie_cols or []
    payload_cols = payload_cols or []
    out_cols = list(dict.fromkeys(keys + [order_col] + tie_cols + payload_cols))
    sort_cols = keys + [order_col] + tie_cols
    desc = [False] * len(keys) + [True] + [False] * len(tie_cols)
    s = rightsize_blocks(ds.select_columns(out_cols), rows=rows_hint).sort(
        sort_cols, descending=desc).materialize()
    refs = s.to_arrow_refs()
    base = s.schema().base_schema
    out_schema = pa.schema([(c, base.field(c).type) for c in out_cols])
    stitch_keys = ([(c, "ascending") for c in keys]
                   + [(order_col, "descending")]
                   + [(c, "ascending") for c in tie_cols])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    def _head_per_run(t: pa.Table, karrs, lo_run: int, hi_run: int,
                      starts, widths):
        import numpy as np

        take = []
        for r in range(lo_run, hi_run):
            a = int(starts[r])
            take.append(np.arange(a, a + min(k, int(widths[r]))))
        if not take:
            return out_schema.empty_table()
        idx = pa.array(np.concatenate(take), pa.int64())
        return t.select(out_cols).take(idx)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table):
        import numpy as np

        if block.num_rows == 0:
            return out_schema.empty_table(), out_schema.empty_table()
        karrs = [block[c].to_numpy(zero_copy_only=False) for c in keys]
        starts, widths = run_bounds_cols(karrs)
        n_runs = starts.size
        inner = _head_per_run(block, karrs, 1, n_runs - 1, starts, widths)
        edge = _head_per_run(block, karrs, 0, 1, starts, widths)
        if n_runs > 1:
            last = _head_per_run(block, karrs, n_runs - 1, n_runs, starts, widths)
            edge = pa.concat_tables([edge, last])
        return inner, edge

    @ray.remote
    def _stitch(*tables):
        import numpy as np

        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(stitch_keys)
        karrs = [et[c].to_numpy(zero_copy_only=False) for c in keys]
        starts, widths = run_bounds_cols(karrs)
        return _head_per_run(et, karrs, 0, starts.size, starts, widths)

    results = [_block.remote(r) for r in refs]
    edge_ref = _stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs([r[0] for r in results] + [edge_ref])


def quantile_from_value_counts(v, n, q: float) -> float:
    """Interpolated quantile (PERCENTILE_CONT(q) / numpy 'linear') of
    the multiset where value ``v[i]`` occurs ``n[i]`` times; ``v`` must
    be sorted ascending with positive counts."""
    import numpy as np

    cum = np.cumsum(n)
    N = int(cum[-1])
    pos = q * (N - 1)  # 0-based fractional order-statistic position
    k1 = int(np.floor(pos))
    frac = pos - k1
    s1 = float(v[np.searchsorted(cum, k1 + 1, side="left")])
    if frac == 0.0 or k1 + 2 > N:
        return s1
    s2 = float(v[np.searchsorted(cum, k1 + 2, side="left")])
    return s1 * (1.0 - frac) + s2 * frac


def quantile_disc_from_value_counts(v, n, q: float) -> float:
    """Discrete quantile (PERCENTILE_DISC(q) / DuckDB quantile_disc): the
    smallest value whose cumulative share reaches ``q`` — the 1-based
    ceil(q·N) order statistic, never interpolated."""
    import math

    import numpy as np

    cum = np.cumsum(n)
    N = int(cum[-1])
    k = min(N, max(1, int(math.ceil(q * N))))
    return float(v[np.searchsorted(cum, k, side="left")])


def median_from_value_counts(v, n) -> float:
    """Interpolated median — quantile_from_value_counts at 0.5."""
    return quantile_from_value_counts(v, n, 0.5)


def grouped_quantiles(ds, group_col: str, val_col: str,
                      quantiles: list, names: list | None = None,
                      batch_size: int | None = 131072,
                      disc: bool = False) -> pa.Table:
    """EXACT interpolated quantiles (SQL PERCENTILE_CONT(p) / DuckDB
    quantile_cont) per group, computed from distributed VALUE COUNTS —
    the exact path for low/moderate-cardinality value domains
    (continuous data should use the profile's t-digest instead).

    Shape: per-batch (g, v, n) pre-agg (arrow group_by) → ONE sort by
    (g, v) → per sorted block, every g-run interior to the block
    computes all requested quantiles vectorized from the run's
    cumulative counts; the ≤2 g-runs touching block edges ship their
    skinny (g, v, n) rows to the driver stitch (bounded by distinct
    values per edge group). Returns a pa.Table
    (group_col, *names) sorted by group."""
    import numpy as np

    import ray

    names = names or [f"q{int(round(q * 100))}" for q in quantiles]
    if len(names) != len(quantiles):
        raise ValueError("names must match quantiles")
    qfn = quantile_disc_from_value_counts if disc else quantile_from_value_counts

    def _pre(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: batch[group_col],
                             val_col: batch[val_col],
                             "n": pa.array([], pa.int64())})
        g = batch.group_by([group_col, val_col], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names]
        ).select([group_col, val_col, "n"])

    pre = ds.select_columns([group_col, val_col]).map_batches(
        _pre, batch_format="pyarrow", batch_size=batch_size)
    s = pre.sort([group_col, val_col])
    base = s.schema().base_schema
    g_t = base.field(group_col).type

    def _sorted_counts(t: pa.Table) -> pa.Table:
        """Re-merge same-(g, v) rows split across batches/blocks and
        order rows (arrow group_by emits hash order)."""
        g2 = t.group_by([group_col, val_col], use_threads=False).aggregate(
            [("n", "sum")])
        return g2.rename_columns(
            [("n" if c == "n_sum" else c) for c in g2.column_names]
        ).sort_by([(group_col, "ascending"), (val_col, "ascending")])

    def _quantiles_of_runs(garr, varr, narr, starts, widths, lo, hi):
        gs, vals = [], []
        for r in range(lo, hi):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            gs.append(garr[a])
            vals.append([qfn(varr[a:b], narr[a:b], q)
                         for q in quantiles])
        return gs, vals

    def _result_table(gs, vals) -> pa.Table:
        cols = {group_col: pa.array(gs, g_t)}
        for j, nm in enumerate(names):
            cols[nm] = pa.array([v[j] for v in vals], pa.float64())
        return pa.table(cols)

    def _fused(t: pa.Table) -> pa.Table:
        empty_cols = {"kind": pa.array([], pa.int8()),
                      group_col: pa.array([], g_t),
                      val_col: pa.array([], pa.float64()),
                      "n": pa.array([], pa.int64())}
        for nm in names:
            empty_cols[nm] = pa.array([], pa.float64())
        if t.num_rows == 0:
            return pa.table(empty_cols)
        g2 = _sorted_counts(t)
        garr = g2[group_col].to_numpy(zero_copy_only=False)
        varr = g2[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        narr = g2["n"].to_numpy()
        starts, widths = run_bounds(garr)
        n_runs = starts.size
        gs, vals = _quantiles_of_runs(garr, varr, narr, starts, widths,
                                      1, n_runs - 1)
        edge_idx = []
        for r in {0, n_runs - 1}:
            edge_idx.extend(range(int(starts[r]), int(starts[r] + widths[r])))
        ne, nm_ = len(edge_idx), len(gs)
        take = pa.array(edge_idx, pa.int64())
        cols = {
            "kind": pa.array(np.concatenate(
                [np.zeros(nm_, np.int8), np.ones(ne, np.int8)])),
            group_col: pa.concat_arrays(
                [pa.array(gs, g_t), g2[group_col].take(take).combine_chunks()]),
            val_col: pa.concat_arrays(
                [pa.nulls(nm_, pa.float64()),
                 pa.array(varr[edge_idx], pa.float64())]),
            "n": pa.concat_arrays(
                [pa.nulls(nm_, pa.int64()), g2["n"].take(take).combine_chunks()]),
        }
        for j, nm in enumerate(names):
            cols[nm] = pa.concat_arrays(
                [pa.array([v[j] for v in vals], pa.float64()),
                 pa.nulls(ne, pa.float64())])
        return pa.table(cols)

    tables = [t for t in ray.get(s.map_batches(
        _fused, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()) if t.num_rows]
    out_parts, edge_parts = [], []
    for t in tables:
        kinds = t["kind"].to_numpy()
        mt = t.filter(pa.array(kinds == 0))
        if mt.num_rows:
            out_parts.append(mt.select([group_col] + names))
        et = t.filter(pa.array(kinds == 1))
        if et.num_rows:
            edge_parts.append(et.select([group_col, val_col, "n"]))
    if edge_parts:
        import numpy as np

        g2 = _sorted_counts(pa.concat_tables(edge_parts))
        garr = g2[group_col].to_numpy(zero_copy_only=False)
        varr = g2[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        narr = g2["n"].to_numpy()
        starts, widths = run_bounds(garr)
        gs, vals = _quantiles_of_runs(garr, varr, narr, starts, widths,
                                      0, starts.size)
        if gs:
            out_parts.append(_result_table(gs, vals))
    if not out_parts:
        cols = {group_col: pa.array([], g_t)}
        for nm in names:
            cols[nm] = pa.array([], pa.float64())
        return pa.table(cols)
    return pa.concat_tables(out_parts).sort_by([(group_col, "ascending")])


def grouped_median(ds, group_col: str, val_col: str,
                   batch_size: int | None = 131072) -> pa.Table:
    """EXACT interpolated median per group — grouped_quantiles at 0.5
    (kept as the named operator the DuckDB MEDIAN oracle checks)."""
    return grouped_quantiles(ds, group_col, val_col, [0.5], ["median"],
                             batch_size=batch_size)


def spread_blocks(ds, min_rows_per_block: int = 256, rows: int | None = None):
    """Widen task parallelism for CPU-heavy stages over small inputs.

    map_batches width is bounded by input BLOCK count, not batch_size — a
    small single-file corpus reads as a handful of blocks and runs heavy
    per-batch stages nearly serially. Repartition to ~rows/min_rows
    blocks (capped at 2×CPU). Large inputs (rows ≫ cap×min_rows) are
    returned untouched: the parquet reader already splits them into many
    blocks, and a repartition there would be a pointless full exchange.
    Parquet row counts are metadata-only, so ``count()`` is free on a
    fresh read.

    IMPORTANT: downstream map_batches must use ``batch_size=None``
    (batch = block) — any positive batch_size re-BUNDLES the spread
    blocks back into few fat batches and undoes the parallelism.

    Pass ``rows`` whenever the input has any op applied (even a
    projection): ``count()`` is metadata-only ONLY on a bare
    ``read_parquet`` — on a projected dataset it executes the whole
    read+project pipeline, i.e. a full extra corpus scan."""
    import ray

    cap = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    if rows is None:
        try:
            rows = ds.count()
        except Exception:
            return ds
    if rows is None or rows >= cap * min_rows_per_block * 16:
        return ds
    return ds.repartition(int(max(4, min(cap, rows // min_rows_per_block + 1))))


def rightsize_blocks(ds, rows: int | None = None, rows_per_block: int = 131072):
    """Coalesce a SMALL dataset's many tiny blocks before a sort-based
    operator: parquet reads split into hundreds of blocks regardless of
    size, and sort + per-block task rounds pay scheduling per block.
    ``rows`` may be passed when known; otherwise ``count()`` is used
    (metadata-only on fresh parquet reads). Large inputs are returned
    untouched — their reader blocks are already well-sized and an extra
    exchange would be waste."""
    import ray

    cap = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    if rows is None:
        try:
            rows = ds.count()
        except Exception:
            return ds
    if rows is None or rows >= cap * rows_per_block * 4:
        return ds
    return ds.repartition(int(max(4, min(cap, rows // rows_per_block + 1))))


def sorted_group_counts(ds, keys: list):
    """Grouped row counts via sorted_groupby (null-safe count_all)."""
    return sorted_groupby(ds, keys, [(None, "count_all", "n")])


def stratified_sample(ds, keys: list, id_col: str, n: int,
                      payload_cols: list | None = None,
                      salt: int = 2654435761, mod: int = 2 ** 32,
                      rows_hint: int | None = None):
    """Deterministic stratified sample: ``n`` rows PER group, chosen by
    a Knuth multiplicative hash of ``id_col`` — reproducible across
    runs/partitionings AND SQL-expressible (the oracle twin is
    ``QUALIFY ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
    (id*salt) % mod DESC, id) <= n``), unlike an RNG sample. Rides
    grouped_topk's one-sort exchange; the hash column never leaves the
    tasks' working set conceptually (it ships as the sort key only).
    ``id_col`` values must keep ``id * salt`` within int64."""
    def _hashed(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * salt) % mod  # int64 throughout, same as the SQL twin
        return t.append_column("__h", pa.array(h, pa.int64()))

    cols = list(dict.fromkeys(keys + [id_col] + (payload_cols or [])))
    hashed = ds.select_columns(cols).map_batches(
        _hashed, batch_format="pyarrow")
    out = grouped_topk(hashed, keys, "__h", n, tie_cols=[id_col],
                       payload_cols=payload_cols, rows_hint=rows_hint)
    return out.map_batches(lambda t: t.drop_columns(["__h"]),
                           batch_format="pyarrow")


def grouped_string_agg(ds, keys: list, val_col: str, order_keys: list,
                       sep: str = ",", rows_hint: int | None = None):
    """Order-sensitive grouped string concatenation — SQL
    ``STRING_AGG(val, sep ORDER BY order_keys)`` GROUP BY keys. The only
    order-sensitive grouped REDUCTION in the engine (top-k keeps rows;
    this folds them), so it rides the sorted-block shape: ONE sort by
    (keys, order_keys); every run interior to a block folds to a single
    (keys, joined-string) row vectorized via the Arrow binary-join
    kernel; the ≤ 2 edge runs per block ship their already-joined
    FRAGMENTS (one string per block, not their rows) and a tiny task
    joins fragments in block order.

    Partitioning assumption: per-group concatenated strings are bounded
    (they are materialized whole — a million-row group makes a
    million-element string wherever it is computed, including in SQL).
    Null values are skipped, like STRING_AGG."""
    import ray
    import ray.data as rd

    sort_cols = keys + order_keys
    need = list(dict.fromkeys(sort_cols + [val_col]))
    s = rightsize_blocks(ds.select_columns(need), rows=rows_hint).sort(
        sort_cols).materialize()
    refs = s.to_arrow_refs()
    base = s.schema().base_schema if refs else None
    key_types = ([(k, base.field(k).type) for k in keys] if refs
                 else [(k, pa.int64()) for k in keys])
    out_schema = pa.schema(key_types + [("agg", pa.string())])
    if not refs:
        return rd.from_arrow(out_schema.empty_table())
    frag_schema = pa.schema(key_types + [("__blk", pa.int64()),
                                         ("agg", pa.string())])

    def _fold_runs(block, lo, hi, starts, widths):
        """Fold runs [lo, hi) each to one joined string — ONE ListArray
        wrap + ONE binary_join kernel call, zero per-run Python."""
        import numpy as np

        if hi <= lo:
            return out_schema.empty_table()
        vals = block[val_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.cast(vals, pa.string())
        vmask = vals.is_valid().to_numpy(zero_copy_only=False)
        cv = np.concatenate([[0], np.cumsum(vmask)])  # valid-count prefix
        flat = vals.drop_null()
        sel_starts = starts[lo:hi]
        end = int(starts[hi - 1] + widths[hi - 1])
        base_off = int(cv[sel_starts[0]])
        offsets = np.concatenate([cv[sel_starts], [cv[end]]]) - base_off
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            flat.slice(base_off, int(cv[end]) - base_off))
        joined = pc.binary_join(la, pa.scalar(sep))
        take = pa.array(sel_starts, pa.int64())
        cols = {k: block[k].take(take) for k in keys}
        cols["agg"] = joined
        return pa.table(cols).select(out_schema.names)

    @ray.remote(num_returns=2)
    def _block(block: pa.Table, bno: int):
        import numpy as np

        if block.num_rows == 0:
            return out_schema.empty_table(), frag_schema.empty_table()
        karrs = [block[k].to_numpy(zero_copy_only=False) for k in keys]
        starts, widths = run_bounds_cols(karrs)
        n_runs = starts.size
        inner = _fold_runs(block, 1, n_runs - 1, starts, widths)
        frags = _fold_runs(block, 0, 1, starts, widths)
        if n_runs > 1:
            frags = pa.concat_tables(
                [frags, _fold_runs(block, n_runs - 1, n_runs, starts, widths)])
        frags = frags.add_column(
            len(keys), "__blk",
            pa.array([bno] * frags.num_rows, pa.int64())).select(
            frag_schema.names)
        return inner, frags

    @ray.remote
    def _stitch(*tables):
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return out_schema.empty_table()
        et = pa.concat_tables(nonempty).sort_by(
            [(k, "ascending") for k in keys] + [("__blk", "ascending")])
        karrs = [et[k].to_numpy(zero_copy_only=False) for k in keys]
        starts, widths = run_bounds_cols(karrs)
        import numpy as np

        frag = et["agg"]
        if isinstance(frag, pa.ChunkedArray):
            frag = frag.combine_chunks()
        rows = {k: [] for k in keys}
        joined = []
        for r in range(starts.size):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            parts = [p for p in frag.slice(a, b - a).to_pylist() if p != ""]
            for k, arr in zip(keys, karrs):
                rows[k].append(arr[a])
            joined.append(sep.join(parts))
        cols = {k: pa.array(rows[k], t) for k, t in key_types}
        cols["agg"] = pa.array(joined, pa.string())
        return pa.table(cols)

    results = [_block.remote(r, i) for i, r in enumerate(refs)]
    edge_ref = _stitch.remote(*[r[1] for r in results])
    return rd.from_arrow_refs([r[0] for r in results] + [edge_ref])


def distinct_values(ds, col: str, batch_size: int | None = 65536):
    """Exact distinct values of one column as a Dataset — per-batch
    dedup partials through ONE sorted_groupby exchange (the big-side
    build used by the composed semi/anti joins and set ops). Nulls are
    excluded, matching SQL DISTINCT-in-set-operation semantics for the
    join-based composition downstream."""
    import ray.data as rd

    src = ds.select_columns([col]).map_batches(
        lambda t: t.filter(t[col].is_valid()),
        batch_format="pyarrow", batch_size=batch_size)
    inner, edge = sorted_groupby(src, [col], [(None, "count_all", "__n")],
                                 batch_size=batch_size)
    out = inner.select_columns([col])
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge.select([col])))
    return out


def set_intersect(a_ds, a_col: str, b_ds, b_col: str,
                  rows_hint: int | None = None):
    """SQL ``SELECT a_col FROM a INTERSECT SELECT b_col FROM b`` —
    distinct both sides (one exchange each), then the inner sort-merge
    join; each key appears once per side so the join product is exactly
    the intersection. Returns a Dataset with column ``a_col``."""
    from .merge_join import sorted_merge_join

    da = distinct_values(a_ds, a_col)
    db = distinct_values(b_ds, b_col)
    if b_col == a_col:
        b_col = f"__r_{b_col}"
        db = db.map_batches(lambda t, n=b_col: t.rename_columns([n]),
                            batch_format="pyarrow")
    return sorted_merge_join(da, db, a_col, b_col, [a_col], [b_col],
                             rows_hint=rows_hint).select_columns([a_col])


def set_except(a_ds, a_col: str, b_ds, b_col: str,
               rows_hint: int | None = None):
    """SQL ``SELECT a_col FROM a EXCEPT SELECT b_col FROM b`` — distinct
    both sides, LEFT OUTER join, keep the null-matched left keys.
    Returns a Dataset with column ``a_col``."""
    import pyarrow.compute as _pc

    from .merge_join import sorted_merge_join

    da = distinct_values(a_ds, a_col)
    db = distinct_values(b_ds, b_col)
    if b_col == a_col:
        b_col = f"__r_{b_col}"
        db = db.map_batches(lambda t, n=b_col: t.rename_columns([n]),
                            batch_format="pyarrow")
    joined = sorted_merge_join(da, db, a_col, b_col, [a_col], [b_col],
                               how="left", rows_hint=rows_hint)
    return joined.map_batches(
        lambda t, rc=b_col, ac=a_col: t.filter(
            _pc.is_null(t[rc])).select([ac]),
        batch_format="pyarrow")


def pivoted_counts(ds, keys: list, pivot_col: str, categories: list,
                   prefix: str = "n_", batch_size: int | None = 65536):
    """Pivot / crosstab COUNT: one row per key combo, one int64 column
    per category — SQL ``COUNT(*) FILTER (WHERE pivot = cat)`` per
    category, GROUP BY keys. ``categories`` is caller-provided so the
    output schema is static (discover it first with an exact distinct
    pass when unknown); pivot values outside it — and nulls — simply
    count nowhere, exactly like the SQL FILTER form.

    Scale shape: each batch collapses to at most one partial row per
    (key, pivot) pair via arrow group_by, the pivot scatter into
    category columns is an if_else per category (no Python rows), and
    the skinny partials ride the standard sorted_groupby sum exchange.
    Returns a single Dataset (keys..., n_<cat>...)."""
    import ray.data as rd

    cats = list(categories)
    out_names = [f"{prefix}{c}" for c in cats]
    zero = pa.scalar(0, pa.int64())

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {k: pa.array([], batch.schema.field(k).type) for k in keys}
            for o in out_names:
                cols[o] = pa.array([], pa.int64())
            return pa.table(cols)
        g = batch.group_by(keys + [pivot_col], use_threads=False).aggregate(
            [([], "count_all")])
        n = g["count_all"]
        cols = {k: g[k] for k in keys}
        for c, o in zip(cats, out_names):
            hit = pc.fill_null(pc.equal(g[pivot_col], pa.scalar(c)), False)
            cols[o] = pc.if_else(hit, n, zero)
        return pa.table(cols)

    partials = ds.select_columns(
        list(dict.fromkeys(keys + [pivot_col]))
    ).map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    inner, edge = sorted_groupby(partials, keys,
                                 [(o, "sum", o) for o in out_names],
                                 batch_size=batch_size)
    if edge is not None and edge.num_rows:
        inner = inner.union(rd.from_arrow(edge))
    return inner


def salted_groupby(ds, keys: list, aggs: list, salt_buckets: int = 16,
                   batch_size: int = 65536) -> pa.Table:
    """Two-stage SALTED aggregation for skewed keys (north rule: 'salted
    repartition of hot conv_ids'): stage 1 groups by (keys..., __salt) so
    one hot key's rows spread over ``salt_buckets`` reducers in the
    exchange; stage 2 merges the ≤ salt_buckets partial rows per true key.

    Note on when to reach for this: every aggregation in this engine
    already pre-aggregates per batch (arrow group_by inside map_batches),
    which bounds a hot key's exchange contribution to one row per batch —
    usually enough. Salting is the belt-and-braces path for skew so
    extreme that even per-batch partials overload one reducer, and the
    named technique for non-algebraic per-key work.

    aggs: list of (src_col, fn, out_name), fn in {count, count_all, sum,
    min, max}. Returns the fully-merged pa.Table (keys..., outs...).
    """
    import numpy as np

    def _add_salt(batch: pa.Table) -> pa.Table:
        # deterministic uniform salt (row position, not RNG — identical
        # results run-to-run regardless of block arrival order)
        salt = np.arange(batch.num_rows, dtype=np.int32) % salt_buckets
        return batch.append_column("__salt", pa.array(salt, pa.int32()))

    cols_needed = list(dict.fromkeys(keys + [a[0] for a in aggs if a[0]]))
    salted = ds.select_columns(cols_needed).map_batches(
        _add_salt, batch_format="pyarrow", batch_size=batch_size
    )
    # stage 1: exchange keyed by (keys, salt) — hot keys fan out over
    # salt_buckets reducers
    inner1, edge1 = sorted_groupby(salted, keys + ["__salt"], aggs,
                                   batch_size=batch_size)
    sel = keys + ["__salt"] + [a[2] for a in aggs]
    stage2_in = inner1.select_columns(sel)
    if edge1 is not None and edge1.num_rows:
        import ray.data as rd

        stage2_in = stage2_in.union(rd.from_arrow(edge1.select(sel)))
    # stage 2: unsalt — a second (distributed) exchange merges the
    # ≤ salt_buckets partial rows per true key; the driver only sees the
    # final result
    merge_aggs = [(out, _AGG_MERGE[fn], out) for _, fn, out in aggs]
    inner2, edge2 = sorted_groupby(stage2_in.drop_columns(["__salt"]),
                                   keys, merge_aggs, batch_size=batch_size)
    import ray as _ray

    parts = [b for b in _ray.get(inner2.to_arrow_refs()) if b.num_rows]
    if edge2 is not None and edge2.num_rows:
        parts.append(edge2)
    if not parts:
        return None
    out = pa.concat_tables(
        [p.select(keys + [a[2] for a in aggs]) for p in parts],
        promote_options="default",
    )
    return out.sort_by([(k, "ascending") for k in keys])


def _mix_key_hashes(batch: pa.Table, keys: list) -> "np.ndarray":
    """Deterministic 64-bit hash of the key tuple per row (numpy uint64,
    wrap-around mixing; identical across processes via pandas SipHash)."""
    import numpy as np
    import pandas as pd

    from ..state.hll import hash64_arrow

    acc = None
    C = np.uint64(0x9E3779B97F4A7C15)
    for k in keys:
        col = batch[k]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash64_arrow(col).astype(np.uint64)
        else:
            vals = col.to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(vals, categorize=False).astype(np.uint64)
        acc = h if acc is None else (acc * C + h)  # wrapping mul/add
    return acc


def start_duplicate_keys_from_files(paths: list, keys: list,
                                    n_reducers: int | None = None,
                                    limit: int = 2_000_000) -> dict:
    """Launch the ENTIRE uniqueness pipeline WITHOUT blocking: map-side
    hash split, per-bucket dup-hash reduce, dup-set concat, exact verify
    re-read and per-bucket group/limit are all chained as dependent Ray
    tasks at call time, so every stage runs as soon as its inputs
    resolve — fully overlapped with whatever Dataset pipeline the caller
    executes next (round-5 scaling item: the verify pass used to start
    only after the fused pass finished, a serial ~3 s tail at 32 CPUs).
    ``finish_duplicate_keys_from_files`` just gathers.

    map (1 task / file): read ONLY the key columns, hash each key tuple
    to uint64, split by the top hash bits into ``n_reducers`` buckets
    (fixed boundaries — no sampling, deterministic, no skew: hashes are
    uniform). reduce (1 task / bucket): concat + np.unique(counts) →
    duplicate hashes. No edges, no stitching: each hash lands in exactly
    one reducer, so counts are exact by construction. verify (1 task /
    file, gated on the global dup-hash set): re-read keys, keep rows
    whose hash is a candidate, re-bucket; group/limit (1 task / bucket):
    exact group count, filter n>1, key-sort, clip to ``limit`` BEFORE
    anything reaches the driver. An empty dup-hash set short-circuits
    the verify tasks without re-reading any file.
    """
    import numpy as np
    import pyarrow.parquet as pq

    import ray

    if n_reducers is None:
        n_reducers = max(16, int(ray.cluster_resources().get("CPU", 8)))
    # power of two for cheap top-bit bucketing
    K = 1 << (n_reducers - 1).bit_length()
    shift = np.uint64(64 - (K - 1).bit_length()) if K > 1 else np.uint64(63)

    @ray.remote(num_returns=K)
    def _map_hashes(path):
        t = pq.read_table(path, columns=keys)
        h = _mix_key_hashes(t, keys)
        b = (h >> shift).astype(np.int64)
        order = np.argsort(b, kind="stable")
        hb = h[order]
        bounds = np.searchsorted(b[order], np.arange(K + 1))
        out = tuple(hb[bounds[i]:bounds[i + 1]] for i in range(K))
        return out if K > 1 else out[0]

    @ray.remote
    def _reduce_dups(*parts):
        nonempty = [p for p in parts if p.size]
        allh = np.concatenate(nonempty) if nonempty else np.empty(0, np.uint64)
        if allh.size == 0:
            return np.empty(0, np.uint64)
        u, c = np.unique(allh, return_counts=True)
        return u[c > 1]

    @ray.remote
    def _concat_dups(*parts):
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)

    @ray.remote(num_returns=K)
    def _verify_split(path, dups):
        if dups.size == 0:
            t = pq.read_schema(path).empty_table().select(keys)
            return (tuple(t for _ in range(K)) if K > 1 else t)
        t = pq.read_table(path, columns=keys)
        h = _mix_key_hashes(t, keys)
        pos = np.searchsorted(dups, h)
        pos[pos == dups.size] = 0
        mask = dups[pos] == h
        t = t.filter(pa.array(mask))
        h = h[mask]
        b = (h >> shift).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bounds = np.searchsorted(b[order], np.arange(K + 1))
        idx = pa.array(order, pa.int64())
        ts = t.take(idx)
        out = tuple(ts.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(K))
        return out if K > 1 else out[0]

    @ray.remote
    def _group_limit(*parts):
        nonempty = [p for p in parts if p.num_rows]
        if not nonempty:
            return None
        t = pa.concat_tables(nonempty)
        g = t.group_by(keys, use_threads=False).aggregate([([], "count_all")])
        g = g.rename_columns([("n" if c == "count_all" else c) for c in g.column_names])
        out = g.filter(pc.greater(g["n"], 1))
        if out.num_rows == 0:
            return None
        out = out.select(keys + ["n"]).sort_by([(k, "ascending") for k in keys])
        return out.slice(0, limit)

    map_refs = [_map_hashes.remote(p) for p in paths]
    if K == 1:
        map_refs = [[r] for r in map_refs]
    reduce_refs = [
        _reduce_dups.remote(*[map_refs[m][k] for m in range(len(paths))])
        for k in range(K)
    ]
    dups_ref = _concat_dups.remote(*reduce_refs)
    ver_refs = [_verify_split.remote(p, dups_ref) for p in paths]
    if K == 1:
        ver_refs = [[r] for r in ver_refs]
    bucket_refs = [
        _group_limit.remote(*[ver_refs[m][k] for m in range(len(paths))])
        for k in range(K)
    ]
    return {"bucket_refs": bucket_refs, "keys": keys, "limit": limit}


def finish_duplicate_keys_from_files(handle: dict, limit: int | None = None):
    """Gather the pipeline launched by start_duplicate_keys_from_files
    (every stage of which has been running concurrently with the
    caller's own work since launch). Returns pa.Table (keys..., n) or
    None when no duplicates exist. ``limit`` (≤ the start-time limit)
    clips the final driver-side merge."""
    import ray

    keys = handle["keys"]
    limit = handle["limit"] if limit is None else min(limit, handle["limit"])
    buckets = [b for b in ray.get(handle["bucket_refs"]) if b is not None]
    if not buckets:
        return None
    out = pa.concat_tables(buckets).sort_by([(k, "ascending") for k in keys])
    return out.slice(0, limit)


def duplicate_keys_from_files(paths: list, keys: list, n_reducers: int | None = None,
                              limit: int = 2_000_000):
    """Blocking wrapper: start + finish the file-backed uniqueness
    exchange (see start_duplicate_keys_from_files for the design)."""
    return finish_duplicate_keys_from_files(
        start_duplicate_keys_from_files(paths, keys, n_reducers, limit=limit)
    )


def duplicate_keys(ds, keys: list, limit: int = 2_000_000):
    """Keys whose group count > 1 — the uniqueness-check core. Returns a
    pyarrow.Table (keys..., n) materialized on the driver (duplicate sets
    are assumed small; counts are exact regardless).

    Two narrow passes, both over ONLY the key columns:

    1. hash pass — mix the key tuple to uint64 per row, pre-aggregate per
       batch (np.unique), exchange + sort the (hash, n) pairs (an int64
       sort, ~5× cheaper than sorting string tuples), re-aggregate per
       sorted block, keep rows with n>1 plus the 2 block-edge rows; the
       driver merges edges → candidate duplicate-hash set.
    2. verify pass — broadcast the candidate hash set, pull the actual
       key rows whose hash is in it, and group them EXACTLY on the driver
       (the candidate set is tiny: true dups + ~0 hash collisions at
       2^-64 pair rate), so collisions never inflate the result.
    """
    import numpy as np

    import ray

    narrow = ds.select_columns(keys)

    def _hash_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h = _mix_key_hashes(batch, keys)
        uniq, counts = np.unique(h, return_counts=True)
        # int64 view of the uint64 hash: keeps every downstream layer
        # (arrow sort, from_pylist inference) in signed-int territory
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    pre = narrow.map_batches(_hash_counts, batch_format="pyarrow", batch_size=65536)
    s = pre.sort("h")

    def _reagg_and_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__edge", pa.array([], pa.bool_()))
        g = batch.group_by(["h"], use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns([("n" if c == "n_sum" else c) for c in g.column_names])
        idx = pc.sort_indices(g, sort_keys=[("h", "ascending")])
        first, last = idx[0].as_py(), idx[-1].as_py()
        edge = [False] * g.num_rows
        edge[first] = True
        edge[last] = True
        edge_arr = pa.array(edge, pa.bool_())
        return g.append_column("__edge", edge_arr).filter(
            pc.or_(edge_arr, pc.greater(g["n"], 1))
        )

    # limit covers dups + 2 edge rows per block (num_blocks() would
    # trigger an extra execution, so the slack is folded into limit)
    rows = s.map_batches(
        _reagg_and_filter, batch_format="pyarrow", batch_size=None
    ).take(limit)
    if not rows:
        return None
    t = pa.Table.from_pylist(rows)
    edge_t = t.filter(t["__edge"])
    inner = t.filter(pc.invert(t["__edge"]))
    cand = {}
    for h, n in zip(inner["h"].to_pylist(), inner["n"].to_pylist()):
        cand[h] = cand.get(h, 0) + n
    for h, n in zip(edge_t["h"].to_pylist(), edge_t["n"].to_pylist()):
        cand[h] = cand.get(h, 0) + n
    dup_hashes = np.array(sorted(h for h, n in cand.items() if n > 1),
                          dtype=np.int64)
    if dup_hashes.size == 0:
        return None

    # pass 2: exact verification — recover the key rows behind the
    # candidate hashes and count them exactly on the driver
    ref = ray.put(dup_hashes)

    def _recover(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hs = ray.get(ref)
        h = _mix_key_hashes(batch, keys).view(np.int64)
        pos = np.searchsorted(hs, h)
        pos[pos == hs.size] = 0
        mask = hs[pos] == h
        return batch.filter(pa.array(mask))

    hit_rows = narrow.map_batches(
        _recover, batch_format="pyarrow", batch_size=65536
    ).take(limit)
    if not hit_rows:
        return None
    ht = pa.Table.from_pylist(hit_rows)
    g = ht.group_by(keys, use_threads=False).aggregate([([], "count_all")])
    g = g.rename_columns([("n" if c == "count_all" else c) for c in g.column_names])
    out = g.filter(pc.greater(g["n"], 1))
    if out.num_rows == 0:
        return None
    return out.select(keys + ["n"]).sort_by([(k, "ascending") for k in keys])


def _hll_sparse_estimate(rhos, m: int) -> float:
    """HLL estimate from the PRESENT registers only (absent = 0) —
    identical arithmetic to state.hll.HyperLogLog.estimate, so a sparse
    per-group sketch finalizes to the same number as the dense class."""
    import math

    import numpy as np

    from ..state.hll import _ALPHA

    alpha = _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
    inv_sum = float(np.ldexp(1.0, -rhos.astype(np.int64)).sum()) + (m - rhos.size)
    e = alpha * m * m / inv_sum
    zeros = m - rhos.size + int((rhos == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return float(e)


def grouped_hll_estimate(ds, group_col: str, val_col: str, p: int = 12,
                         batch_size: int | None = 131072) -> pa.Table:
    """APPROXIMATE grouped distinct count — one HyperLogLog sketch per
    group, carried through the exchange as SPARSE (group, register, rho)
    rows with max-merge. This is the fixed-size scale path next to the
    exact ``events_distinct_users`` exchange: per group the shuffle
    carries at most min(distinct, 2^p) skinny rows no matter how many
    input rows exist, so a 10^12-row table with 10^9-cardinality groups
    exchanges MBs, not the value domain. p=12 → ~1.6% standard error
    (requires p ≥ 12: the rho kernel's float64 bit-length trick needs
    w < 2^52, state/hll.py discipline). Nulls are excluded (SQL COUNT
    DISTINCT). Same sort/fused-run shape as grouped_quantiles: interior
    g-runs finalize inside the block task; the ≤2 edge runs per block
    ship their sparse registers to the driver stitch.

    Returns pa.Table (group_col, approx_distinct: float64) sorted by
    group; estimates are BIT-IDENTICAL to running state.hll.HyperLogLog
    over each group's values (asserted in tests)."""
    import numpy as np
    import ray

    from ..state.hll import hash64_arrow

    if p < 12:
        raise ValueError("p must be >= 12 (rho kernel contract)")
    m = 1 << p
    m_u = np.uint64(m - 1)
    p_u = np.uint64(p)

    def _pre(batch: pa.Table) -> pa.Table:
        empty = pa.table({group_col: batch[group_col],
                          "reg": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64())}) \
            if batch.num_rows == 0 else None
        if empty is not None:
            return empty
        # nulls drop on BOTH columns: SQL COUNT DISTINCT ignores null
        # values, and a null GROUP key would break np.unique's ordering —
        # callers needing a null group should fill it upstream
        keep = pc.and_(batch[val_col].is_valid(), batch[group_col].is_valid())
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return pa.table({group_col: sub[group_col],
                             "reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = hash64_arrow(sub[val_col]).astype(np.uint64, copy=False)
        reg = (h & m_u).astype(np.int64)
        w = h >> p_u
        bits = np.frexp(w.astype(np.float64))[1]
        rho = ((64 - p) - bits + 1).astype(np.int64)
        g_np = sub[group_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g_np, return_inverse=True)
        key = inv.astype(np.int64) * m + reg
        order = np.argsort(key, kind="stable")
        ks, rs = key[order], rho[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        kmax = np.maximum.reduceat(rs, starts)
        kk = ks[starts]
        g_out = uniq[(kk // m).astype(np.int64)]
        # pin the SOURCE column type: numpy inference would emit plain
        # string for a large_string/dictionary group column and split the
        # block schemas before the sort
        g_type = batch.schema.field(group_col).type
        return pa.table({group_col: pa.array(g_out, g_type),
                         "reg": pa.array(kk % m, pa.int64()),
                         "rho": pa.array(kmax, pa.int64())})

    pre = ds.select_columns([group_col, val_col]).map_batches(
        _pre, batch_format="pyarrow", batch_size=batch_size)
    s = pre.sort([group_col, "reg"])
    base = s.schema().base_schema
    g_t = base.field(group_col).type

    def _remerge(t: pa.Table) -> pa.Table:
        g2 = t.group_by([group_col, "reg"], use_threads=False).aggregate(
            [("rho", "max")])
        return g2.rename_columns(
            [("rho" if c == "rho_max" else c) for c in g2.column_names]
        ).sort_by([(group_col, "ascending"), ("reg", "ascending")])

    def _fused(t: pa.Table) -> pa.Table:
        empty_cols = {"kind": pa.array([], pa.int8()),
                      group_col: pa.array([], g_t),
                      "reg": pa.array([], pa.int64()),
                      "rho": pa.array([], pa.int64()),
                      "approx_distinct": pa.array([], pa.float64())}
        if t.num_rows == 0:
            return pa.table(empty_cols)
        g2 = _remerge(t)
        garr = g2[group_col].to_numpy(zero_copy_only=False)
        rarr = g2["rho"].to_numpy()
        starts, widths = run_bounds(garr)
        n_runs = starts.size
        gs, ests = [], []
        for r in range(1, n_runs - 1):
            a, b = int(starts[r]), int(starts[r] + widths[r])
            gs.append(garr[a])
            ests.append(_hll_sparse_estimate(rarr[a:b], m))
        edge_idx = []
        for r in {0, n_runs - 1}:
            edge_idx.extend(range(int(starts[r]), int(starts[r] + widths[r])))
        ne, nm_ = len(edge_idx), len(gs)
        take = pa.array(edge_idx, pa.int64())
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(nm_, np.int8), np.ones(ne, np.int8)])),
            group_col: pa.concat_arrays(
                [pa.array(gs, g_t),
                 g2[group_col].take(take).combine_chunks()]),
            "reg": pa.concat_arrays(
                [pa.nulls(nm_, pa.int64()),
                 g2["reg"].take(take).combine_chunks()]),
            "rho": pa.concat_arrays(
                [pa.nulls(nm_, pa.int64()),
                 g2["rho"].take(take).combine_chunks()]),
            "approx_distinct": pa.concat_arrays(
                [pa.array(ests, pa.float64()), pa.nulls(ne, pa.float64())]),
        })

    tables = [t for t in ray.get(s.map_batches(
        _fused, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()) if t.num_rows]
    out_parts, edge_parts = [], []
    for t in tables:
        kinds = t["kind"].to_numpy()
        mt = t.filter(pa.array(kinds == 0))
        if mt.num_rows:
            out_parts.append(mt.select([group_col, "approx_distinct"]))
        et = t.filter(pa.array(kinds == 1))
        if et.num_rows:
            edge_parts.append(et.select([group_col, "reg", "rho"]))
    if edge_parts:
        g2 = _remerge(pa.concat_tables(edge_parts))
        garr = g2[group_col].to_numpy(zero_copy_only=False)
        rarr = g2["rho"].to_numpy()
        starts, widths = run_bounds(garr)
        gs = [garr[int(a)] for a in starts]
        ests = [_hll_sparse_estimate(
            rarr[int(a):int(a + w)], m) for a, w in zip(starts, widths)]
        if gs:
            out_parts.append(pa.table({
                group_col: pa.array(gs, g_t),
                "approx_distinct": pa.array(ests, pa.float64())}))
    if not out_parts:
        return pa.table({group_col: pa.array([], g_t),
                         "approx_distinct": pa.array([], pa.float64())})
    return pa.concat_tables(out_parts).sort_by([(group_col, "ascending")])


