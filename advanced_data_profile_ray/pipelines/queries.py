"""The oracle-checked query suite over the driver's testdata tables.

Each entry couples a Ray-Data-first pipeline (``QUERIES[name]``, callable
``sf_dir -> DataFrame/Table/Dataset``) with an equivalent DuckDB SQL
string (``ORACLE[name]``) run side-by-side by the external driver at
sf=0.01 (row-count + schema + order-insensitive value-hash). Column names
are kept identical on both sides; float aggregates are rounded identically
on both sides so value hashes match.

These queries exercise every operator family from SURVEY.md §2 on real
tables: profile partials (nulls/stats/distinct/top-k), partial-aggregate
groupbys, uniqueness, referential semi/anti-joins, window functions
(sessionization), tumbling windows, dedup, text token stats, correlation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
LINEITEM_NUMERIC = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# profile-derived queries


def q_profile_null_counts(sf_dir: str) -> pd.DataFrame:
    """Per-column null / non-null counts of lineitem from the single
    profile pass (A4/A5, Profiler.py:604-605,630-632)."""
    from .profile import profile_dataset

    prof = profile_dataset(_read(sf_dir, "lineitem"))
    rows = []
    for name in sorted(prof.columns):
        f = prof.columns[name].finalize()
        rows.append(
            {"column": name, "null_count": f["null_count"],
             "non_null_count": f["non_null_count"]}
        )
    return pd.DataFrame(rows)


def q_numeric_stats(sf_dir: str) -> pd.DataFrame:
    """min/max/mean/std/count per numeric lineitem column from merged
    Moments partials (A9, Profiler.py:706-721)."""
    from .profile import profile_dataset
    from ..stages.profile_partial import ProfileConfig

    prof = profile_dataset(
        _read(sf_dir, "lineitem", LINEITEM_NUMERIC),
        ProfileConfig(columns=LINEITEM_NUMERIC, sketches=False),
    )
    rows = []
    for name in LINEITEM_NUMERIC:
        m = prof.columns[name].moments
        rows.append(
            {
                "column": name,
                "n": m.n,
                "avg_val": round(m.avg, 6),
                "std_val": round(m.std(), 6),
                "min_val": round(m.min, 6),
                "max_val": round(m.max, 6),
            }
        )
    return pd.DataFrame(rows)


def q_distinct_counts(sf_dir: str) -> pd.DataFrame:
    """Per-column distinct counts (A6) — the exact-modulo-hash shuffle
    path the profile's HLL approximates. ONE scan for all columns: per
    batch each column dedups to unique 64-bit value hashes, the skinny
    (col, h) rows go through one sorted_groupby exchange, and the
    distinct count per column is the group count — counted inside the
    blocks, never shipping values (or hashes) to the driver.

    Semantics (matching SQL COUNT(DISTINCT col), the oracle twin):
    - NULLs are excluded before hashing, exactly like COUNT DISTINCT.
    - Counts distinct 64-bit value hashes with no collision verify pass
      (unlike duplicate_keys_from_files, which verifies): a colliding
      pair undercounts by 1 at ~n²/2^65 expected pairs — ~3×10⁻⁸ even
      at a billion distinct values. Callers needing guaranteed exactness
      route through the uniqueness verify machinery instead."""
    from ..stages.fast_ops import sorted_groupby
    from ..state.hll import hash64_arrow

    cols = ["l_returnflag", "l_linestatus", "l_orderkey", "l_partkey", "l_suppkey"]
    ds = _read(sf_dir, "lineitem", cols)

    def _col_hashes(batch: pa.Table) -> pa.Table:
        outs_c, outs_h = [], []
        for ci, c in enumerate(cols):
            col = batch[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                h = hash64_arrow(col.drop_null()).view(np.int64)
            else:
                vals = col.to_numpy(zero_copy_only=False)
                vals = vals[~pd.isna(vals)]
                h = pd.util.hash_array(vals, categorize=False).view(np.int64)
            u = np.unique(h)
            outs_c.append(np.full(u.size, ci, dtype=np.int8))
            outs_h.append(u)
        return pa.table({
            "c": pa.array(np.concatenate(outs_c), pa.int8()),
            "h": pa.array(np.concatenate(outs_h), pa.int64()),
        })

    pre = ds.map_batches(_col_hashes, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["c", "h"], [(None, "count_all", "n")])

    def _group_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["c"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    counts = inner.map_batches(
        _group_counts, batch_format="pyarrow", batch_size=None
    ).to_pandas().groupby("c")["n"].sum()
    if edge is not None and edge.num_rows:
        for ci, n in edge.to_pandas().groupby("c").size().items():
            counts[ci] = counts.get(ci, 0) + n
    return pd.DataFrame(
        [{"column": c, "distinct_count": int(counts.get(ci, 0))}
         for ci, c in enumerate(cols)]
    )


def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped distinct count (COUNT(DISTINCT) GROUP BY twin):
    distinct users per event_type. Same shape as distinct_counts but
    grouped, and exact with no hash caveat — user_id is int64, so the
    (event_type, user_id) pairs dedup per batch (arrow group_by), one
    sorted_groupby exchange co-locates pairs, and the per-group distinct
    count is the group count, counted inside blocks."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def _pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"],
                              use_threads=False).aggregate([])

    pre = ds.map_batches(_pairs, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["event_type", "user_id"],
                                 [(None, "count_all", "n")])

    def _group_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    counts = inner.map_batches(
        _group_counts, batch_format="pyarrow", batch_size=None
    ).to_pandas().groupby("event_type")["n"].sum()
    if edge is not None and edge.num_rows:
        for et, n in edge.to_pandas().groupby("event_type").size().items():
            counts[et] = counts.get(et, 0) + n
    out = counts.reset_index().rename(columns={"n": "distinct_users"})
    out["distinct_users"] = out["distinct_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_mode_priority_by_status(sf_dir: str) -> pd.DataFrame:
    """Per-group MODE (most frequent value, ties to the smallest) by
    OPERATOR COMPOSITION: distributed (g, v, n) counts through
    sorted_groupby, then grouped_topk(k=1) over the count rows — two
    exchanges, no driver-side value domain. SQL QUALIFY twin."""
    import ray.data as rd

    from ..stages.fast_ops import grouped_topk, sorted_groupby

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def _pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderstatus", "o_orderpriority"],
                           use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    pre = ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["o_orderstatus", "o_orderpriority"],
                                 [("n", "sum", "n")])
    counts_ds = inner
    if edge is not None and edge.num_rows:
        counts_ds = counts_ds.union(rd.from_arrow(edge))
    out = grouped_topk(counts_ds, ["o_orderstatus"], "n", 1,
                       tie_cols=["o_orderpriority"]).to_pandas()
    out = out.rename(columns={"o_orderpriority": "mode_priority"})
    out["n"] = out["n"].astype("int64")
    return (out[["o_orderstatus", "mode_priority", "n"]]
            .sort_values("o_orderstatus").reset_index(drop=True))


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q6-shaped filtered aggregate exercising PREDICATE PUSHDOWN
    at the read: the row filter ships into read_parquet as a
    pyarrow.dataset expression, so non-qualifying row groups never leave
    storage and only the two needed columns decode — the brief's
    'prune at the read' requirement, demonstrated end-to-end."""
    import pyarrow.dataset as pads

    expr = ((pads.field("l_shipdate") >= pd.Timestamp("1997-01-01"))
            & (pads.field("l_shipdate") < pd.Timestamp("1998-01-01"))
            & (pads.field("l_discount") >= 0.02)
            & (pads.field("l_discount") <= 0.04)
            & (pads.field("l_quantity") < 24))
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"],
                         filter=expr)

    def _partial(batch: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(batch["l_extendedprice"],
                                 batch["l_discount"])).as_py() or 0.0
        return pa.table({"revenue": pa.array([rev], pa.float64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    return pd.DataFrame([{"revenue": round(float(parts["revenue"].sum()), 2),
                          "n_rows": int(parts["n"].sum())}])


def q4_priority_exists(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q4-shaped correlated EXISTS: count orders per priority in a
    half-year window having at least one line shipped > 60 days after
    the order date. The correlated date predicate means the semi join
    cannot pre-dedup the build side — composition is pushdown-filtered
    orders read → big⨝big sort-merge join → vectorized post-join filter
    → distinct (o_orderkey, priority) exchange → per-block priority
    partials summed on the driver (5 rows). (Adapted to this synthetic
    lineitem, which carries l_shipdate but not commit/receipt dates.)"""
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-07-01")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    # metadata-only counts of the raw files as the rows_hint upper bound
    hint = (_read(sf_dir, "orders", ["o_orderkey"]).count()
            + lines.count())
    joined = sorted_merge_join(
        orders, lines, "o_orderkey", "l_orderkey",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        ["l_shipdate"], rows_hint=hint)

    sixty_days = pa.scalar(60 * 86400 * 1_000_000, pa.duration("us"))

    def _late(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"],
                          pc.add(t["o_orderdate"], sixty_days))
        t = t.filter(pc.fill_null(keep, False))
        return t.select(["o_orderkey", "o_orderpriority"])

    late = joined.map_batches(_late, batch_format="pyarrow",
                              batch_size=131072)
    inner, edge = sorted_groupby(late, ["o_orderkey", "o_orderpriority"],
                                 [(None, "count_all", "n")])

    def _prio_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderkey",
                                                      "count")])
        return g.rename_columns(["o_orderpriority", "order_count"])

    parts = inner.map_batches(_prio_counts,
                              batch_format="pyarrow").to_pandas()
    if edge is not None and edge.num_rows:
        parts = pd.concat([parts, _prio_counts(edge).to_pandas()])
    out = (parts.groupby("o_orderpriority", as_index=False)["order_count"]
           .sum())
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_top_orderpriority(sf_dir: str) -> pd.DataFrame:
    """Full frequency table of a low-cardinality column (top-k A7 without
    tie ambiguity: k >= distinct)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    out = ds.groupby("o_orderpriority").count().to_pandas()
    return out.rename(columns={"count()": "n"})


# ---------------------------------------------------------------------------
# partial-aggregate groupbys (pre-aggregate per batch, then tiny shuffle)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pricing summary: per-batch pandas pre-aggregation
    inside map_batches, then a groupby-sum over the tiny partials — the
    canonical scale pattern for low-cardinality groupbys."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        one_minus_disc = pc.subtract(1.0, batch["l_discount"])
        disc_price = pc.multiply(batch["l_extendedprice"], one_minus_disc)
        charge = pc.multiply(disc_price, pc.add(1.0, batch["l_tax"]))
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "l_quantity": batch["l_quantity"],
            "l_extendedprice": batch["l_extendedprice"],
            "disc_price": disc_price,
            "charge": charge,
            "l_discount": batch["l_discount"],
        })
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("charge", "sum"),
             ("l_discount", "sum"), ([], "count_all")]
        )
        rename = {"l_quantity_sum": "sum_qty", "l_extendedprice_sum": "sum_base_price",
                  "disc_price_sum": "sum_disc_price", "charge_sum": "sum_charge",
                  "l_discount_sum": "sum_disc", "count_all": "count_order"}
        return g.rename_columns([rename.get(c, c) for c in g.column_names])

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
              "sum_disc", "count_order"])
        .to_pandas()
    )
    final.columns = [c.replace("sum(", "").replace(")", "") for c in final.columns]
    n = final["count_order"]
    out = pd.DataFrame(
        {
            "l_returnflag": final["l_returnflag"],
            "l_linestatus": final["l_linestatus"],
            "sum_qty": final["sum_qty"].round(2),
            "sum_base_price": final["sum_base_price"].round(2),
            "sum_disc_price": final["sum_disc_price"].round(2),
            "sum_charge": final["sum_charge"].round(2),
            "avg_qty": (final["sum_qty"] / n).round(6),
            "avg_price": (final["sum_base_price"] / n).round(6),
            "avg_disc": (final["sum_disc"] / n).round(6),
            "count_order": n.astype("int64"),
        }
    )
    return out


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate: events per (event_type, hour) with value
    sums — per-batch pre-aggregation then groupby-sum (SURVEY.md §2.9:
    windows live in batch land, not event-time streaming)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({"event_type": batch["event_type"], "hour": hour,
                      "value": batch["value"]})
        g = t.group_by(["event_type", "hour"], use_threads=False).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return g.rename_columns(
            [{"count_all": "n", "value_sum": "sum_value"}.get(c, c)
             for c in g.column_names]
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
    out = (
        partials.groupby(["event_type", "hour"]).sum(["n", "sum_value"]).to_pandas()
    )
    out = out.rename(columns={"sum(n)": "n", "sum(sum_value)": "sum_value"})
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out


def q_events_distinct_users_hll(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE grouped distinct (per-group HyperLogLog through a
    sparse (group, register, rho) max-merge exchange) — the fixed-size
    scale path beside the exact `events_distinct_users`: at most
    groups×2^p skinny rows shuffle no matter the input size. rows-only
    by nature (±1.6% at p=12); pytest asserts bit-identical parity with
    the dense sketch and <5% error vs truth."""
    from ..stages.fast_ops import grouped_hll_estimate

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    t = grouped_hll_estimate(ds, "event_type", "user_id", p=12)
    out = t.to_pandas()
    out["approx_distinct"] = out["approx_distinct"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_hopping(sf_dir: str) -> pd.DataFrame:
    """HOPPING (sliding) window aggregate: 2-hour windows advancing by
    1 hour — every event lands in TWO windows (its hour bucket and the
    one before it), so the per-batch map EMITS both window assignments
    as skinny rows before one grouped-count exchange. The window
    fan-out happens map-side (flat scatter, zero-copy concat of two
    shifted bucket columns); windows, not events, are the group domain.
    Output: window start, events per [start, start+2h) per type."""
    from ..stages.fast_ops import sorted_groupby
    import ray.data as rd

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    hour_us = 3_600_000_000

    def _scatter(batch: pa.Table) -> pa.Table:
        h = pc.cast(pc.floor_temporal(pc.cast(batch["ts"],
                                              pa.timestamp("us")),
                                      unit="hour"), pa.int64())
        prev = pc.subtract(h, pa.scalar(hour_us, pa.int64()))
        et = batch["event_type"]
        return pa.concat_tables([
            pa.table({"event_type": et, "win_start": h}),
            pa.table({"event_type": et, "win_start": prev})])

    pre = ds.map_batches(_scatter, batch_format="pyarrow",
                         batch_size=65536)
    inner, edge = sorted_groupby(pre, ["event_type", "win_start"],
                                 [(None, "count_all", "n")])
    res = inner
    if edge is not None and edge.num_rows:
        res = res.union(rd.from_arrow(edge))
    out = res.to_pandas()
    out["win_start"] = pd.to_datetime(out["win_start"], unit="us")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "win_start"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# uniqueness / referential


def q_dup_custkeys(sf_dir: str) -> pd.DataFrame:
    """Duplicate-key detection (A2 generalized): o_custkey groups with
    more than one order — the file-backed hash-partition exchange
    (uniqueness fast path)."""
    from ..stages.fast_ops import duplicate_keys_from_files

    dups = duplicate_keys_from_files([f"{sf_dir}/orders.parquet"], ["o_custkey"])
    if dups is None:  # clean input: no duplicate keys at all
        return pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    out = dups.to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


REF_PAIRS = [
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def q_referential_counts(sf_dir: str) -> pd.DataFrame:
    """Broadcast-hash semi-join pass counts for each fact→dim pair
    (SURVEY.md §2.4: small side broadcast, never a shuffle join).
    ONE scan per fact table — relations sharing a fact (the two lineitem
    keys) ride the same pass, same shape as the fused validation stage."""
    from ..pipelines.validate import (_cached_value_set, broadcast_value_set,
                                      value_set_mask)

    by_fact: dict = {}
    for name, fact, fcol, dim, dcol in REF_PAIRS:
        dim_vals = pq.read_table(f"{sf_dir}/{dim}.parquet", columns=[dcol])[dcol]
        ref = broadcast_value_set(dim_vals.combine_chunks())
        by_fact.setdefault(fact, []).append((name, fcol, ref))

    results: dict = {}
    for fact, specs in by_fact.items():
        def _count(batch: pa.Table, specs=specs) -> pa.Table:
            out = {}
            for i, (_, fcol, ref) in enumerate(specs):
                vs = _cached_value_set(ref)  # sorted numpy, built once/worker
                col = batch[fcol]
                nvalid = len(col) - col.null_count
                nulls = len(col) - nvalid
                matched = 0
                if vs.size and nvalid:
                    vals = col.drop_null().to_numpy(zero_copy_only=False)
                    matched = int(value_set_mask(vs, vals).sum())
                out[f"matched_{i}"] = pa.array([matched], pa.int64())
                out[f"orphan_{i}"] = pa.array([nvalid - matched], pa.int64())
                out[f"null_{i}"] = pa.array([nulls], pa.int64())
            return pa.table(out)

        cols = list(dict.fromkeys(fcol for _, fcol, _ in specs))
        agg = _read(sf_dir, fact, cols).map_batches(
            _count, batch_format="pyarrow", batch_size=131072
        ).sum([f"{m}_{i}" for i in range(len(specs))
               for m in ("matched", "orphan", "null")])
        for i, (name, _, _) in enumerate(specs):
            results[name] = {
                "matched": int(agg[f"sum(matched_{i})"]),
                "orphan": int(agg[f"sum(orphan_{i})"]),
                "null_count": int(agg[f"sum(null_{i})"]),
            }
    return pd.DataFrame(
        [{"relation": name, **results[name]}
         for name, *_ in REF_PAIRS]
    )


# ---------------------------------------------------------------------------
# transcripts (sessionization window + per-conv stats)


def q_transcripts(sf_dir: str):
    """The transcript fact table derived from events (window function +
    projection). Per-turn text equality under stable (conv_id, turn_idx)
    ordering is exactly the north-rule row invariant."""
    from ..stages.window import sessionize_events

    # sessionize_events emits blocks already ordered by (conv_id,
    # turn_idx) — conv_id is order-isomorphic to the user_id sort key
    # (VALIDATED inside sessionize_events: raises unless all user_ids
    # fit [0, 10^8), where 8-digit zero-padding preserves order) — so no
    # second sort exchange is needed for the ORDER BY twin.
    return sessionize_events(_read(sf_dir, "events"))


def q_conv_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation aggregate over the derived transcripts — THE
    skewed-key groupby (conv sizes are Zipf-ish), routed through the
    salted two-stage exchange (north rule: salted repartition of hot
    conv_ids; fast_ops.salted_groupby)."""
    from ..stages.fast_ops import salted_groupby
    from ..stages.window import sessionize_events

    ds = sessionize_events(_read(sf_dir, "events"))
    out = salted_groupby(
        ds, ["conv_id"],
        [(None, "count_all", "n_turns"), ("turn_idx", "max", "max_turn_idx"),
         ("tool", "count", "n_tool_turns")],
        salt_buckets=16,
    ).to_pandas()
    out["n_turns"] = out["n_turns"].astype("int64")
    out["n_tool_turns"] = out["n_tool_turns"].astype("int64")
    out["max_turn_idx"] = out["max_turn_idx"].astype("int32")
    return out[["conv_id", "n_turns", "max_turn_idx", "n_tool_turns"]]


def q_role_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov ROLE-TRANSITION counts over the derived transcripts (which
    role follows which within a conversation) — LAG + GROUP BY twin via
    stages.window.transition_counts: ONE sort exchange, per-block pair
    reduction to a ≤|roles|² partial, O(blocks) boundary stitch; the
    per-row lag column never materializes. Runs over a projected events
    read (user_id ↔ conv_id are 1:1 and (ts, event_id) IS the turn
    order, so transitions over user_id equal transitions over conv_id —
    props/text never leaves storage)."""
    from ..stages.window import event_roles, transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _roles(t: pa.Table) -> pa.Table:
        ev = t["event_type"]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        role = event_roles(ev.to_numpy(zero_copy_only=False))
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "role": pa.array(role, pa.string())})

    inner, edge = transition_counts(
        ds.map_batches(_roles, batch_format="pyarrow"),
        "user_id", ["ts_us", "event_id"], "role",
        prev_name="prev_role", cur_name="role")
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_role", "role"]).reset_index(drop=True)


def q_conv_documents(sf_dir: str) -> pd.DataFrame:
    """TRANSCRIPT → TRAINING DOCUMENT assembly: one document per
    conversation, non-null turn texts joined with newlines in turn
    order — SQL ``STRING_AGG(text, chr(10) ORDER BY turn_idx)``. The
    canonical corpus-prep step between a transcript fact table and the
    dedup/quality/tokenize stages. stages.window.concat_group_strings:
    one sort, zero-copy LargeList binary_join per block, edge runs
    re-joined in a single stitch task — text never crosses the driver."""
    from ..stages.window import concat_group_strings

    # assemble straight off the projected events read: turn_idx order IS
    # (ts, event_id) order within user, and user_id ↔ conv_id are 1:1,
    # so the transcript projection (and its extra sort) never runs —
    # ONE sort carrying only (user_id, ts, event_id, non-null props)
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    out = concat_group_strings(ds, "user_id", ["ts", "event_id"], "props",
                               sep="\n").to_pandas()
    # same bound sessionize_events enforces: zfill never truncates but
    # SQL lpad does, so ids outside [0, 10^8) would silently diverge
    if len(out) and (out["user_id"].min() < 0
                     or out["user_id"].max() >= 10**8):
        raise ValueError("conv_documents: user_id outside [0, 10^8) — "
                         "8-digit zero-padding would not match lpad")
    out["conv_id"] = "c" + out["user_id"].astype(str).str.zfill(8)
    out = out.rename(columns={"props": "doc", "n_parts": "n_text_turns"})
    out["n_text_turns"] = out["n_text_turns"].astype("int64")
    return (out[["conv_id", "doc", "n_text_turns"]]
            .sort_values("conv_id").reset_index(drop=True))


def q_response_latency(sf_dir: str) -> pd.DataFrame:
    """RESPONSE-LATENCY profile per role transition over the derived
    transcripts: for every adjacent turn pair within a conversation,
    COUNT / mean / MAX of the timestamp gap grouped by (prev_role,
    role) — the SLO-style check a transcript validation engine runs
    (is the assistant answering promptly after user turns?). Same
    distributed shape as role_transitions (stages.window.pair_gap_stats:
    one sort, per-block pair reduction to ≤|roles|² partials carrying
    int64 gap sums/maxes, O(blocks) boundary stitch); the mean is
    finalized driver-side from exact int64 sums."""
    from ..stages.window import event_roles, pair_gap_stats

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _roles(t: pa.Table) -> pa.Table:
        ev = t["event_type"]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        role = event_roles(ev.to_numpy(zero_copy_only=False))
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "role": pa.array(role, pa.string())})

    inner, edge = pair_gap_stats(
        ds.map_batches(_roles, batch_format="pyarrow"),
        "user_id", ["ts_us", "event_id"], "role", "ts_us",
        prev_name="prev_role", cur_name="role")
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["avg_gap_us"] = (out["sum_gap_us"].astype("float64")
                         / out["n"]).round(6)
    out["max_gap_us"] = out["max_gap_us"].astype("int64")
    return (out[["prev_role", "role", "n", "avg_gap_us", "max_gap_us"]]
            .sort_values(["prev_role", "role"]).reset_index(drop=True))


_ROLE_SPECIAL = pa.array(["signup", "purchase", "error"])
_ROLE_NAMES = ["user", "system", "assistant", "tool"]


def _role_code_batch(t: pa.Table) -> pa.Table:
    """(user_id, ts, event_id, code): the _TRANSCRIPTS_SQL role CASE
    collapsed to fixed int64 codes (click/view/else→0 user, signup→1
    system, purchase→2 assistant, error→3 tool) — the one dictionary
    role_alternation and conv_boundary_roles must share with the twin."""
    ev = t["event_type"]
    if isinstance(ev, pa.ChunkedArray):
        ev = ev.combine_chunks()
    code = pc.add(pc.cast(pc.fill_null(
        pc.index_in(ev, value_set=_ROLE_SPECIAL), -1), pa.int64()), 1)
    return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                     "event_id": t["event_id"], "code": code})


def q_role_alternation(sf_dir: str) -> pd.DataFrame:
    """ROLE-ALTERNATION conformance census over the derived transcripts
    — a first-class transcript validation check (north rule family): how
    many multi-turn conversations strictly alternate roles (no two
    adjacent turns share a role) vs not. stages.window.alternation_stats:
    ONE sort, per-block adjacent same-code counting per conversation
    run, O(blocks) boundary stitch comparing the carried last code with
    the next fragment's first code; the final bool census folds 2-row
    per-block partials. Roles ride as fixed int64 codes (only adjacent
    equality matters), so the sort never carries strings. Runs over a
    projected events read — user_id ↔ conv_id are 1:1 and (ts, event_id)
    IS the turn order, so the transcript projection never materializes."""
    from ..stages.window import alternation_stats

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    per_conv = alternation_stats(
        ds.map_batches(_role_code_batch, batch_format="pyarrow",
                       batch_size=131072),
        "user_id", "ts", "event_id", "code")

    def _census(t: pa.Table) -> pa.Table:
        alt = pc.equal(t["same_pairs"], 0)
        vc = pc.value_counts(alt)
        return pa.table({"alternating": vc.field("values"),
                         "n_convs": pc.cast(vc.field("counts"), pa.int64())})

    parts = per_conv.map_batches(
        _census, batch_format="pyarrow", batch_size=131072).to_pandas()
    out = (parts.groupby("alternating", as_index=False)["n_convs"].sum()
           .sort_values("alternating").reset_index(drop=True))
    out["n_convs"] = out["n_convs"].astype("int64")
    return out[["alternating", "n_convs"]]


def q_conv_size_gini(sf_dir: str) -> pd.DataFrame:
    """SKEW DIAGNOSTIC: Gini coefficient of conversation sizes — the
    one-number answer to "how hot are the hot conv_ids" that motivates
    the salted exchanges (north rule: salted repartition of hot
    conv_ids). Per-conversation turn counts fold through one grouped
    exchange; their value-counts histogram (≤ max-size distinct values)
    folds through a second; the driver applies gini_by_priority's exact
    tied-block identity (Σ i·x without per-row ranks) over the tiny
    histogram. Mirrors the twin's float cast placement exactly."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id"])
    si, se = sorted_groupby(ds, ["user_id"], [(None, "count_all", "sz")])
    sizes = si
    if se is not None and se.num_rows:
        sizes = sizes.union(rd.from_arrow(se))
    hi, he = sorted_groupby(sizes.select_columns(["sz"]), ["sz"],
                            [(None, "count_all", "cnt")])
    hist = hi.to_pandas()
    if he is not None and he.num_rows:
        hist = pd.concat([hist, he.to_pandas()], ignore_index=True)
    hist = hist.sort_values("sz").reset_index(drop=True)
    x = hist["sz"].to_numpy(dtype=np.int64)
    c = hist["cnt"].to_numpy(dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(c)[:-1]])
    s = int((x * (c * base + c * (c + 1) // 2)).sum())
    t = int((x * c).sum())
    n = int(c.sum())
    gini = round((2.0 * s - (n + 1.0) * t) / (n * 1.0 * t), 6)
    return pd.DataFrame({"gini": [gini],
                         "n_convs": pd.Series([n], dtype="int64"),
                         "total_turns": pd.Series([t], dtype="int64")})


def q_third_event_ts_per_user(sf_dir: str) -> pd.DataFrame:
    """NTH_VALUE window (n=3): each user's THIRD event timestamp — the
    remaining ordered-position window primitive beside FIRST/LAST/LAG.
    One sort through _partition_run_reduce smuggling the first three
    in-run timestamps; a continuing partition concatenate-truncates the
    carried prefix (the carry is ≤3 ints however long the partition).
    Users with fewer than 3 events drop, like the twin's WHERE."""
    from ..stages.window import _partition_run_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _first3(seg):
        v = [int(x) for x in seg[:3]] + [-1, -1, -1]
        return (int(seg.size), v[0], v[1], v[2])

    def _merge(c, f, bg):
        have = [x for x in (c[1], c[2], c[3]) if x >= 0]
        if len(have) < 3:
            have += [x for x in (f[1], f[2], f[3]) if x >= 0]
        have = (have + [-1, -1, -1])[:3]
        return (c[0] + f[0], have[0], have[1], have[2])

    out = _partition_run_reduce(
        ds, "user_id", "ts", "event_id", ["n", "t1", "t2", "t3"],
        run_agg=_first3, merge=_merge,
        emit=lambda v: v[0] >= 3).to_pandas()
    out["third_ts"] = pd.to_datetime(out["t3"], unit="us")
    out["n"] = out["n"].astype("int64")
    return (out[["user_id", "third_ts", "n"]]
            .sort_values("user_id").reset_index(drop=True))


def q_conv_boundary_roles(sf_dir: str) -> pd.DataFrame:
    """CONVERSATION BOUNDARY census: which role opens and which closes
    each conversation, counted over (first_role, last_role) — the
    FIRST_VALUE/LAST_VALUE conformance stat (a transcript corpus where
    conversations don't open with user turns or close with assistant
    turns is suspect). One sort through the shared
    _partition_run_reduce scaffold smuggling first/last role codes
    through the run fields; the ≤|roles|² census folds per-block
    partials on the driver."""
    from ..stages.window import _partition_run_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    roles = _ROLE_NAMES

    per_conv = _partition_run_reduce(
        ds.map_batches(_role_code_batch, batch_format="pyarrow",
                       batch_size=131072),
        "user_id", "ts", "event_id", ["n_turns", "first_c", "last_c"],
        run_agg=lambda seg, vseg: (int(seg.size), int(vseg[0]),
                                   int(vseg[-1])),
        merge=lambda c, f, bg: (c[0] + f[0], c[1], f[2]),
        emit=lambda v: True,
        val_col="code")

    def _census(t: pa.Table) -> pa.Table:
        g = t.select(["first_c", "last_c"]).group_by(
            ["first_c", "last_c"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n_convs"}.get(c, c) for c in g.column_names])

    parts = per_conv.map_batches(_census, batch_format="pyarrow",
                                 batch_size=131072).to_pandas()
    census = (parts.groupby(["first_c", "last_c"], as_index=False)
              ["n_convs"].sum())
    census["first_role"] = pd.Categorical.from_codes(
        census["first_c"].to_numpy(), roles).astype(str)
    census["last_role"] = pd.Categorical.from_codes(
        census["last_c"].to_numpy(), roles).astype(str)
    census["n_convs"] = census["n_convs"].astype("int64")
    return (census[["first_role", "last_role", "n_convs"]]
            .sort_values(["first_role", "last_role"])
            .reset_index(drop=True))


def q_funnel_subsequence(sf_dir: str) -> pd.DataFrame:
    """SEQUENTIAL-PATTERN funnel: users whose event stream contains
    view → click → purchase IN ORDER with arbitrary gaps (the unbounded
    cousin of funnel_view_purchase's 1-hour pair window). Distributed
    shape is stages.window.subsequence_match: per-block automaton
    state-transition maps composed across blocks — the carry is 4 ints
    per partition regardless of stream length; no self-joins, one
    sort."""
    from ..stages.window import subsequence_match

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    steps = pa.array(["view", "click", "purchase"])

    def _codes(t: pa.Table) -> pa.Table:
        ev = t["event_type"]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        code = pc.cast(pc.fill_null(pc.index_in(ev, value_set=steps), -1),
                       pa.int64())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "code": code})

    out = subsequence_match(
        ds.map_batches(_codes, batch_format="pyarrow", batch_size=131072),
        "user_id", "ts", "event_id", "code", seq_len=3).to_pandas()
    out = out[out["matched"] == 1][["user_id"]]
    return out.sort_values("user_id").reset_index(drop=True)


def q_conv_null_tool_runs(sf_dir: str) -> pd.DataFrame:
    """LONGEST NULL-TOOL STREAK per conversation — a missing-data-island
    validation stat (how long does a transcript go without tool calls).
    stages.window.longest_run: the classic distributed max-subsegment
    combine — one sort, per-block (longest, prefix, suffix, n) in one
    vectorized pass, O(blocks) boundary merge joining carry suffix with
    fragment prefix. Runs off the projected events read (tool is NULL ⇔
    event_type != 'error' in the transcript derivation)."""
    from ..stages.window import longest_run

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _flag(t: pa.Table) -> pa.Table:
        # null event_type derives a NULL tool in _TRANSCRIPTS_SQL's CASE,
        # so it EXTENDS the null-tool streak — fill_null(True) keeps the
        # engine on the twin's semantics if nulls ever appear
        f = pc.cast(pc.fill_null(
            pc.not_equal(t["event_type"], pa.scalar("error")), True),
            pa.int64())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "f": f})

    out = longest_run(
        ds.map_batches(_flag, batch_format="pyarrow", batch_size=131072),
        "user_id", "ts", "event_id", "f").to_pandas()
    if len(out) and (out["user_id"].min() < 0
                     or out["user_id"].max() >= 10**8):
        raise ValueError("conv_null_tool_runs: user_id outside [0, 10^8)")
    out["conv_id"] = "c" + out["user_id"].astype(str).str.zfill(8)
    out["longest_run"] = out["longest_run"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return (out[["conv_id", "longest_run", "n_rows"]]
            .sort_values("conv_id").reset_index(drop=True))


def q_time_weighted_value(sf_dir: str) -> pd.DataFrame:
    """TIME-WEIGHTED average value per user (each event's value holds
    until the next event) — the metrics/sensor aggregate plain AVG gets
    wrong on irregular sampling. stages.window.time_weighted_sum: one
    sort, exact int64 cents·µs sums per run, boundary intervals carried
    as (last value × boundary gap) through the O(blocks) stitch; the
    only float is the final display division, mirrored in the twin."""
    from ..stages.window import time_weighted_sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "vc": vc})

    out = time_weighted_sum(ds.map_batches(_pre, batch_format="pyarrow"),
                            "user_id", "ts", "event_id", "vc").to_pandas()
    out = out[out["span_us"] > 0].copy()
    out["twa_value"] = (out["wsum"]
                        / (out["span_us"] * 100.0)).round(6)
    out["n_events"] = out["n_events"].astype("int64")
    out["span_us"] = out["span_us"].astype("int64")
    return (out[["user_id", "n_events", "span_us", "twa_value"]]
            .sort_values("user_id").reset_index(drop=True))


def q_user_coverage(sf_dir: str) -> pd.DataFrame:
    """INTERVAL UNION per user: each event opens a 5-minute activity
    window; overlapping windows merge (gaps-and-islands) — per user the
    merged island count and total covered seconds. The distributed
    shape is stages.window.interval_coverage: ONE sort, vectorized
    in-block island reduction, O(blocks) boundary stitch with exact
    overlap subtraction; the SQL twin runs the classic cumulative-max
    island construction."""
    from ..stages.window import interval_coverage

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = interval_coverage(ds, "user_id", "ts", "event_id",
                            length_us=300_000_000).to_pandas()
    out["n_islands"] = out["n_islands"].astype("int64")
    out["covered_us"] = out["covered_us"].astype("int64")
    return (out[["user_id", "n_islands", "covered_us"]]
            .sort_values("user_id").reset_index(drop=True))


def q_tool_set_similarity(sf_dir: str) -> pd.DataFrame:
    """SET-SIMILARITY BY CENSUS: pairwise Jaccard similarity between
    users' event-type SETS, computed without any user×user join — users
    collapse to a ≤2^|types| bitmask census (two skinny exchanges:
    (user, type) dedup → per-user mask sum), and the all-pairs Jaccard
    runs over the tiny mask domain weighted by census counts. The
    pattern that makes set-similarity joins feasible at 10^9 users when
    the item domain is dictionary-sized. Exact integers; Jaccard
    divides two popcounts."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    types = ["click", "view", "signup", "purchase", "error"]
    tarr = pa.array(types)
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _code(t: pa.Table) -> pa.Table:
        ev = t["event_type"]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        c = pc.cast(pc.index_in(ev, value_set=tarr), pa.int64())
        return pa.table({"user_id": t["user_id"], "c": c})

    di, de = sorted_groupby(
        ds.map_batches(_code, batch_format="pyarrow", batch_size=131072),
        ["user_id", "c"], [(None, "count_all", "_n")])
    pairs = di
    if de is not None and de.num_rows:
        pairs = pairs.union(rd.from_arrow(de))

    def _pow2(t: pa.Table) -> pa.Table:
        bit = pc.shift_left(pa.scalar(1, pa.int64()), t["c"])
        return pa.table({"user_id": t["user_id"], "bit": bit})

    mi, me = sorted_groupby(
        pairs.map_batches(_pow2, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("bit", "sum", "m")])
    masks = mi
    if me is not None and me.num_rows:
        masks = masks.union(rd.from_arrow(me))

    def _census(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["m"])
        return pa.table({"m": vc.field("values"),
                         "n_users": pc.cast(vc.field("counts"), pa.int64())})

    cens = masks.map_batches(_census, batch_format="pyarrow",
                             batch_size=131072).to_pandas()
    cens = cens.groupby("m", as_index=False)["n_users"].sum()
    ms = cens["m"].to_numpy(dtype=np.int64)
    ns = cens["n_users"].to_numpy(dtype=np.int64)
    rows = []
    for i in range(len(ms)):
        for j in range(len(ms)):
            if ms[i] < ms[j]:
                inter = int(ms[i] & ms[j]).bit_count()
                union = int(ms[i] | ms[j]).bit_count()
                rows.append({"mask_a": int(ms[i]), "mask_b": int(ms[j]),
                             "n_pairs": int(ns[i]) * int(ns[j]),
                             "jaccard": round(inter / union, 6)})
    out = pd.DataFrame(rows,
                       columns=["mask_a", "mask_b", "n_pairs", "jaccard"])
    for c in ["mask_a", "mask_b", "n_pairs"]:
        out[c] = out[c].astype("int64")
    out["jaccard"] = out["jaccard"].astype("float64")
    return out.sort_values(["mask_a", "mask_b"]).reset_index(drop=True)


def q_value_hist(sf_dir: str) -> pd.DataFrame:
    """FIXED-BIN NUMERIC HISTOGRAM of event value (A24's numeric case —
    the date-part histograms are oracled elsewhere): integer cent
    buckets of width $5, so bin assignment is exact int arithmetic on
    both sides (floats never decide bin membership). Per-batch bucket
    counts fold to ≤\|bins\| partials per block, driver-merged."""
    ds = _read(sf_dir, "events", ["value"])

    def _partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.coalesce(batch["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        c = cents.to_numpy(zero_copy_only=False)
        bucket = np.floor_divide(c, 500)
        u, n = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby("bucket", as_index=False)["n"].sum()
           .sort_values("bucket").reset_index(drop=True))
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_user_breadth_hist(sf_dir: str) -> pd.DataFrame:
    """TWO-LEVEL DISTINCT aggregation: histogram of per-user event-type
    breadth (how many users touch exactly k distinct event types) —
    COUNT(DISTINCT) per group, then GROUP BY the count. Distributed
    shape: (user, type) dedup through one grouped exchange; the per-user
    breadth folds through a second exchange on the SAME user-prefixed
    key (cheap re-sort of already-clustered blocks); the ≤|types|-wide
    histogram folds per-block partials on the driver."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    pi, pe = sorted_groupby(ds, ["user_id", "event_type"],
                            [(None, "count_all", "_n")])
    pairs = pi
    if pe is not None and pe.num_rows:
        pairs = pairs.union(rd.from_arrow(pe))
    bi, be = sorted_groupby(pairs.select_columns(["user_id"]), ["user_id"],
                            [(None, "count_all", "breadth")])
    breadth = bi
    if be is not None and be.num_rows:
        breadth = breadth.union(rd.from_arrow(be))

    def _hist(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.cast(t["breadth"], pa.int64()))
        return pa.table({"breadth": vc.field("values"),
                         "n_users": pc.cast(vc.field("counts"), pa.int64())})

    parts = breadth.map_batches(_hist, batch_format="pyarrow",
                                batch_size=131072).to_pandas()
    out = (parts.groupby("breadth", as_index=False)["n_users"].sum()
           .sort_values("breadth").reset_index(drop=True))
    out["breadth"] = out["breadth"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_hourly_delta(sf_dir: str) -> pd.DataFrame:
    """AGGREGATE-THEN-WINDOW composition: hour-over-hour change of each
    event type's count — LAG over the aggregated (type, hour) series.
    One grouped exchange builds the series; the delta is a vectorized
    per-type diff over the aggregate output (hours×types rows, bounded
    by the time span — never the fact table). First-present-hour rows
    (no LAG) are dropped on both sides so the delta stays int64."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": batch["event_type"], "hour": hour})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [(None, "count_all", "n")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out = out.sort_values(["event_type", "hour"]).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["delta"] = out.groupby("event_type")["n"].diff()
    out = out.dropna(subset=["delta"])
    out["delta"] = out["delta"].astype("int64")
    return out[["event_type", "hour", "n", "delta"]].reset_index(drop=True)


def q_median_gap_by_user(sf_dir: str) -> pd.DataFrame:
    """EXACT per-user lower-median inter-event gap — grouped selection
    over a DERIVED (windowed) measure: the gap multiset extracts through
    stages.window.adjacent_gap_counts (one sort, in-block LAG-delta
    value counts, O(blocks) boundary gaps), then the weighted-median
    machinery (running_sum + broadcast per-group totals + the integer
    2·cum ≥ tot gate + grouped min) selects without ever materializing
    per-row gaps on the driver. The broadcast totals array is |users| —
    the documented driver bound of this path (the merge-join totals
    variant graduates it at 10^9 groups). All-integer; no
    QUANTILE_CONT interpolation ambiguity on either side."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import adjacent_gap_counts, running_sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    inner, edge = adjacent_gap_counts(ds, "user_id", "ts", "event_id")
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))
    vc = vc.materialize()  # consumed twice: totals pass + running_sum

    ti, te = sorted_groupby(vc.select_columns(["user_id", "w"]),
                            ["user_id"], [("w", "sum", "tot")])
    tot = ti.to_pandas()
    if te is not None and te.num_rows:
        tot = pd.concat([tot, te.to_pandas()], ignore_index=True)
    tot = tot.sort_values("user_id")
    keys = tot["user_id"].to_numpy(dtype=np.int64)
    tots = tot["tot"].to_numpy(dtype=np.int64)

    cum = running_sum(vc, "user_id", ["gap_us"], "w", out_col="cum")

    def _gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        k = t["user_id"].to_numpy(zero_copy_only=False)
        tot_row = tots[np.searchsorted(keys, k)]
        keep = 2 * t["cum"].to_numpy(zero_copy_only=False) >= tot_row
        return t.filter(pa.array(keep)).select(["user_id", "gap_us"])

    gi, ge = sorted_groupby(
        cum.map_batches(_gate, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("gap_us", "min", "median_gap_us")])
    out = gi.to_pandas()
    if ge is not None and ge.num_rows:
        out = pd.concat([out, ge.to_pandas()], ignore_index=True)
    out = out.merge(pd.DataFrame({"user_id": keys, "n_gaps": tots}),
                    on="user_id", how="left")
    out["median_gap_us"] = out["median_gap_us"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return (out[["user_id", "median_gap_us", "n_gaps"]]
            .sort_values("user_id").reset_index(drop=True))


def q_user_retention(sf_dir: str) -> pd.DataFrame:
    """COHORT RETENTION matrix: users grouped by their first active day,
    counted per (cohort_day, day_offset) — the classic training-corpus /
    product-analytics retention triangle. Distributed shape: distinct
    (user, day) pairs through one skinny sorted_groupby exchange, the
    per-user cohort day via first_value_within (FIRST_VALUE carry — no
    self-join back to the fact table), then one tiny (cohort, offset)
    count exchange. The fact table is never joined against itself."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import first_value_within

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _days(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        # epoch ts are nonnegative, so int64 truncation == floor division
        day = pc.divide(us, 86_400_000_000)
        return pa.table({"user_id": t["user_id"], "day": day})

    inner, edge = sorted_groupby(ds.map_batches(_days, batch_format="pyarrow"),
                                 ["user_id", "day"],
                                 [(None, "count_all", "__n")])
    pairs = inner.select_columns(["user_id", "day"])
    if edge is not None and edge.num_rows:
        pairs = pairs.union(rd.from_arrow(edge.select(["user_id", "day"])))

    fv = first_value_within(pairs, "user_id", ["day"], "day",
                            out_col="cohort_day")

    def _offsets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty group_by can drop key columns
            return pa.schema([("cohort_day", pa.int64()),
                              ("day_offset", pa.int64()),
                              ("n", pa.int64())]).empty_table()
        tt = pa.table({"cohort_day": t["cohort_day"],
                       "day_offset": pc.subtract(t["day"], t["cohort_day"])})
        g = tt.group_by(["cohort_day", "day_offset"],
                        use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names]
        ).select(["cohort_day", "day_offset", "n"])

    inner2, edge2 = sorted_groupby(
        fv.map_batches(_offsets, batch_format="pyarrow"),
        ["cohort_day", "day_offset"], [("n", "sum", "n_users")])
    out = inner2.to_pandas()
    if edge2 is not None and edge2.num_rows:
        out = pd.concat([out, edge2.to_pandas()], ignore_index=True)
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


def q_gini_by_priority(sf_dir: str) -> pd.DataFrame:
    """GINI COEFFICIENT of order value per priority class (inequality /
    concentration index — how skewed is spend across orders). Uses the
    sorted-values identity G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx), whose
    Σ i·x₍ᵢ₎ is computed WITHOUT per-row ranks: grouped value counts
    (one sorted_groupby exchange) + running_sum give each distinct value
    its preceding-row count b, and the tied block at that value
    contributes x·(c·b + c(c+1)/2) — exact int64 cents throughout, tie-
    order invariant (equal values make Σ i·x independent of tiebreak),
    one float expression per group at the very end mirroring the SQL
    twin's CAST placement. Bound: Σ i·x ≤ max_cents·n(n+1)/2 — int64-
    safe to ~10⁵ × the sf1 table at TPC-H price ranges."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import running_sum

    g = "o_orderpriority"

    def _cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({g: t[g], "cents": cents})

    pre = _read(sf_dir, "orders", [g, "o_totalprice"]).map_batches(
        _cents, batch_format="pyarrow")
    inner, edge = sorted_groupby(pre, [g, "cents"],
                                 [(None, "count_all", "cnt")])
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))
    cum = running_sum(vc, g, ["cents"], "cnt", out_col="cum")

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty group_by can drop key columns
            return pa.schema([(g, pa.string()), ("s", pa.int64()),
                              ("t", pa.int64()),
                              ("n", pa.int64())]).empty_table()
        x = t["cents"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        base = t["cum"].to_numpy(zero_copy_only=False) - c
        s = x * (c * base + c * (c + 1) // 2)  # Σ i·x over the tied block
        tt = pa.table({g: t[g], "s": pa.array(s, pa.int64()),
                       "t": pc.multiply(t["cents"], t["cnt"]), "n": t["cnt"]})
        out = tt.group_by([g], use_threads=False).aggregate(
            [("s", "sum"), ("t", "sum"), ("n", "sum")])
        return out.rename_columns(
            [c2.removesuffix("_sum") for c2 in out.column_names]
        ).select([g, "s", "t", "n"])

    inner2, edge2 = sorted_groupby(
        cum.map_batches(_partial, batch_format="pyarrow"),
        [g], [("s", "sum", "s"), ("t", "sum", "t"), ("n", "sum", "n")])
    out = inner2.to_pandas()
    if edge2 is not None and edge2.num_rows:
        out = pd.concat([out, edge2.to_pandas()], ignore_index=True)
    # float expression mirrors the oracle: 2.0*S, (n+1.0)*T, (n*1.0)*T
    s_f = out["s"].astype("float64")
    t_f = out["t"].astype("float64")
    n_f = out["n"].astype("float64")
    gini = (2.0 * s_f - (n_f + 1.0) * t_f) / ((n_f * 1.0) * t_f)
    res = pd.DataFrame({g: out[g], "gini": gini.round(6)})
    return res.sort_values(g).reset_index(drop=True)


def q_weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """GROUPED WEIGHTED MEDIAN (quantity-weighted median extended price
    per return flag): smallest value whose cumulative weight reaches
    half the group total — pure operator composition: grouped value
    counts with int64 weight sums (one exchange) → running_sum over the
    distinct (flag, cents) rows → broadcast per-flag totals (one tiny
    exchange; groups = |flags|) → map-side threshold filter → grouped
    min. Exact integer arithmetic end-to-end; the only float is the
    final cents→price division, mirrored in the SQL twin."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import running_sum

    g = "l_returnflag"

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({g: t[g], "c": cents,
                         "w": pc.cast(t["l_quantity"], pa.int64())})

    pre = _read(sf_dir, "lineitem",
                [g, "l_extendedprice", "l_quantity"]).map_batches(
        _pre, batch_format="pyarrow")
    inner, edge = sorted_groupby(pre, [g, "c"], [("w", "sum", "w")])
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))
    vc = vc.materialize()  # consumed twice: totals pass + running_sum

    ti, te = sorted_groupby(vc.select_columns([g, "w"]), [g],
                            [("w", "sum", "tot")])
    tot = ti.to_pandas()
    if te is not None and te.num_rows:
        tot = pd.concat([tot, te.to_pandas()], ignore_index=True)
    tot = tot.sort_values(g)
    keys = tot[g].to_numpy()
    tots = tot["tot"].to_numpy().astype(np.int64)

    cum = running_sum(vc, g, ["c"], "w", out_col="cum")

    def _gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({g: pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        k = t[g].to_numpy(zero_copy_only=False)
        tot_row = tots[np.searchsorted(keys, k)]
        keep = 2 * t["cum"].to_numpy(zero_copy_only=False) >= tot_row
        return t.filter(pa.array(keep)).select([g, "c"])

    gated = cum.map_batches(_gate, batch_format="pyarrow")
    mi, me = sorted_groupby(gated, [g], [("c", "min", "c")])
    out = mi.to_pandas()
    if me is not None and me.num_rows:
        out = pd.concat([out, me.to_pandas()], ignore_index=True)
    out["weighted_median_price"] = (out["c"] / 100.0).round(2)
    return (out[[g, "weighted_median_price"]].sort_values(g)
            .reset_index(drop=True))


def q_price_deciles_by_flag(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped deciles (d1..d9 of extended price per return flag)
    via distributed selection — the exact complement to the t-digest
    approximations (A8): grouped value counts (one exchange) →
    running_sum over distinct (flag, cents) rows → broadcast per-flag
    totals → map-side emission. Each distinct-value row covers deciles d
    with 10·(cum−w) < d·tot ≤ 10·cum, so every (flag, d) is emitted by
    EXACTLY one row globally — after running_sum the decile extraction
    is a zero-exchange vectorized map, one pass for all nine levels
    (never nine gate passes). Exact int64 arithmetic end-to-end; the SQL
    twin mirrors the identical 10·cum ≥ d·tot rule."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import running_sum

    g = "l_returnflag"

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({g: t[g], "c": cents})

    pre = _read(sf_dir, "lineitem", [g, "l_extendedprice"]).map_batches(
        _pre, batch_format="pyarrow")
    inner, edge = sorted_groupby(pre, [g, "c"], [("c", "count", "w")])
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))
    vc = vc.materialize()  # consumed twice: totals pass + running_sum

    ti, te = sorted_groupby(vc.select_columns([g, "w"]), [g],
                            [("w", "sum", "tot")])
    tot = ti.to_pandas()
    if te is not None and te.num_rows:
        tot = pd.concat([tot, te.to_pandas()], ignore_index=True)
    tot = tot.sort_values(g)
    keys = tot[g].to_numpy()
    tots = tot["tot"].to_numpy().astype(np.int64)

    cum = running_sum(vc, g, ["c"], "w", out_col="cum")

    def _emit(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(g, pa.string()), ("decile", pa.int64()),
                                ("c", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        k = t[g].to_numpy(zero_copy_only=False)
        tot_row = tots[np.searchsorted(keys, k)]
        cums = t["cum"].to_numpy(zero_copy_only=False)
        pcum = cums - t["w"].to_numpy(zero_copy_only=False)
        # deciles covered by this row: floor(10·pcum/tot) < d ≤ floor(10·cum/tot)
        d_lo = (10 * pcum) // tot_row + 1
        d_hi = np.minimum((10 * cums) // tot_row, 9)
        cnt = np.maximum(d_hi - d_lo + 1, 0).astype(np.int64)
        rep = np.repeat(np.arange(len(cnt)), cnt)
        offs = np.arange(cnt.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        return pa.table({
            g: pa.array(k[rep], pa.string()),
            "decile": pa.array(d_lo[rep] + offs, pa.int64()),
            "c": pa.array(t["c"].to_numpy(zero_copy_only=False)[rep],
                          pa.int64()),
        })

    out = cum.map_batches(_emit, batch_format="pyarrow").to_pandas()
    out["value"] = (out["c"] / 100.0).round(2)
    return (out[[g, "decile", "value"]].sort_values([g, "decile"])
            .reset_index(drop=True))


def q_conv_tool_ffill(sf_dir: str) -> pd.DataFrame:
    """Forward-fill / LOCF over the transcripts: each turn carries the
    most recent tool invoked earlier in its conversation (null until the
    first tool turn) — SQL LAST_VALUE(IGNORE NULLS) twin via
    stages.window.forward_fill_within: one sort, vectorized
    maximum.accumulate fill per block, O(blocks) last-non-null carry.
    The gap-fill shape every event/transcript feature pipeline needs
    (state-as-of-turn columns)."""
    from ..stages.window import forward_fill_within, sessionize_events

    ds = sessionize_events(_read(sf_dir, "events"))
    out = forward_fill_within(ds, "conv_id", ["turn_idx"], "tool",
                              out_col="tool_filled")
    res = out.select_columns(["conv_id", "turn_idx", "tool_filled"]).to_pandas()
    return (res.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def q_rolling_median_value(sf_dir: str) -> pd.DataFrame:
    """ROWS-framed ROLLING MEDIAN (7-event window of value per user) —
    the robust-smoothing window no partial-aggregate trick covers:
    median is not combinable, but every value a block-edge row's window
    needs is already in the O(blocks·k) candidate/pool stitch, so the
    stitch re-medians explicit windows (stages.window.rolling_agg_rows
    agg="median"); interior rows vectorize via sliding_window_view."""
    from ..stages.window import rolling_agg_rows

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"], "value": t["value"]})

    out = rolling_agg_rows(ds.map_batches(_us, batch_format="pyarrow"),
                           "user_id", ["ts_us", "event_id"], "value",
                           "event_id", k=7, agg="median").to_pandas()
    out = out.rename(columns={"id": "event_id"})
    out["roll_median"] = out["roll_median"].round(6)
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# documents: dedup, tokens, stats


def q_ks_drift(sf_dir: str) -> pd.DataFrame:
    """EXACT two-sample KS drift statistic (A26 with an oracle): the
    l_quantity distribution of open vs finished lineitems. One scan of
    per-batch (group, value) counts merges into exact ECDFs — the
    distributed path for low-cardinality drift columns; continuous
    columns use the fixed-bin sketch KS (functions.drift)."""
    from ..functions.drift import exact_ks_from_value_counts

    ds = _read(sf_dir, "lineitem", ["l_linestatus", "l_quantity"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_linestatus", "l_quantity"],
                           use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=131072
    ).to_pandas()
    merged = parts.groupby(["l_linestatus", "l_quantity"])["n"].sum()
    cur = merged.get("O", pd.Series(dtype="int64")).to_dict()
    base = merged.get("F", pd.Series(dtype="int64")).to_dict()
    ks = exact_ks_from_value_counts(cur, base)
    return pd.DataFrame([{"ks": round(ks, 6)}])


def q_psi_drift(sf_dir: str) -> pd.DataFrame:
    """PSI drift on a categorical frequency vector (the north-star's
    'PSI on role-frequency histograms' check, oracled): event_type
    shares of the late half of the window (current) vs the early half
    (baseline). Same distributed shape as ks_drift — one scan of
    per-batch (period, category) counts, PSI on the merged tiny vector
    (functions.drift.psi_from_counts, zero shares floored at 1e-4)."""
    from ..functions.drift import psi_from_counts

    cutoff = pa.scalar(pd.Timestamp("2024-01-15"), pa.timestamp("us"))
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _partial(batch: pa.Table) -> pa.Table:
        early = pc.cast(pc.less(batch["ts"], cutoff), pa.int8())
        t = pa.table({"event_type": batch["event_type"], "early": early})
        g = t.group_by(["event_type", "early"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=131072
    ).to_pandas()
    merged = parts.groupby(["early", "event_type"])["n"].sum()
    baseline = merged.get(1, pd.Series(dtype="int64")).to_dict()
    current = merged.get(0, pd.Series(dtype="int64")).to_dict()
    psi = psi_from_counts(current, baseline)
    return pd.DataFrame([{"psi": round(psi, 6)}])


def q3_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q3-shaped pipeline: the big⨝big SHUFFLE join (lineitem ⨝
    orders on orderkey via stages.merge_join.sorted_merge_join) composed
    with a broadcast semi-filter (BUILDING customers → orders) and a
    post-join grouped top-10 by revenue. Dates adapted to the synthetic
    data's 1995-2001 range; o_orderpriority stands in for TPC-H's
    o_shippriority (absent from the synthetic schema)."""
    from ..pipelines.validate import (broadcast_value_set, _cached_value_set,
                                      value_set_mask)
    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    cutoff = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
    seg_custkeys = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_custkeys = seg_custkeys.filter(
        pc.equal(seg_custkeys["c_mktsegment"], "BUILDING"))["c_custkey"]
    ref = broadcast_value_set(seg_custkeys.combine_chunks())

    def _filter_orders(batch: pa.Table) -> pa.Table:
        vs = _cached_value_set(ref)
        keep = pc.less(pc.cast(batch["o_orderdate"], pa.timestamp("us")), cutoff)
        sub = batch.filter(keep)
        ck = sub["o_custkey"].to_numpy(zero_copy_only=False)
        if len(sub):
            sub = sub.filter(pa.array(value_set_mask(vs, ck)))
        return sub.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    def _filter_lineitem(batch: pa.Table) -> pa.Table:
        keep = pc.greater(pc.cast(batch["l_shipdate"], pa.timestamp("us")), cutoff)
        sub = batch.filter(keep)
        rev = pc.multiply(sub["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), sub["l_discount"]))
        return pa.table({"l_orderkey": sub["l_orderkey"],
                         "revenue": pc.cast(rev, pa.float64())})

    orders_f = _read(sf_dir, "orders",
                     ["o_orderkey", "o_custkey", "o_orderdate"]
                     + ["o_orderpriority"]).map_batches(
        _filter_orders, batch_format="pyarrow", batch_size=131072)
    lineitem_f = _read(sf_dir, "lineitem",
                       ["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        _filter_lineitem, batch_format="pyarrow", batch_size=131072)

    # rows_hint: raw table counts (metadata-only) upper-bound the
    # filtered sides — counting the filtered Datasets would execute both
    # filter pipelines as extra full scans
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    joined = sorted_merge_join(
        lineitem_f, orders_f, "l_orderkey", "o_orderkey",
        ["l_orderkey", "revenue"], ["o_orderdate", "o_orderpriority"],
        rows_hint=hint,
    )
    inner, edge = sorted_groupby(
        joined, ["l_orderkey", "o_orderdate", "o_orderpriority"],
        [("revenue", "sum", "revenue")],
    )
    # per-block top-10 before the driver concat (result cardinality at
    # 100 TB is qualifying-orders-sized; only 10 rows ever matter).
    # Sort on ROUNDED revenue — the final order (and the oracle) compare
    # at 2dp, so an unrounded cut could drop a 2dp-tied row whose
    # tiebreak wins globally.
    def _topk(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("revenue"), "revenue",
                         pc.round(t["revenue"], 2))
        idx = pc.sort_indices(t, sort_keys=[("revenue", "descending"),
                                            ("o_orderdate", "ascending"),
                                            ("l_orderkey", "ascending")])
        return t.take(idx.slice(0, 10))

    parts = inner.map_batches(_topk, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        parts = pd.concat([parts, edge.to_pandas()], ignore_index=True)
    parts["revenue"] = parts["revenue"].round(2)
    out = parts.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                            ascending=[False, True, True]).head(10)
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    return out[["l_orderkey", "revenue", "o_orderdate",
                "o_orderpriority"]].reset_index(drop=True)


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q10-shaped composite: revenue from returned items per
    customer — two big⨝big sort-merge joins (lineitem⨝orders on
    orderkey, then grouped revenue⨝customer on custkey), a broadcast
    nation lookup, and a per-block top-20 so the driver merges k rows
    per block. Filters are applied in the map tasks before the first
    exchange (only R-flag lineitems and one order-date quarter ship)."""
    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join
    from ..stages.referential import broadcast_lookup_join
    import ray.data as rd

    lo = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-04-01"), pa.timestamp("us"))

    def _li(batch: pa.Table) -> pa.Table:
        # exact integer 10^-4 revenue units (see q5): float sums round
        # half-even while the SQL twin rounds half-away, and exact
        # half-cent group sums DO occur in this data
        sub = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        cents = pc.cast(pc.round(pc.multiply(sub["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), sub["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_orderkey": sub["l_orderkey"],
                         "rev4": pc.multiply(cents, disc)})

    def _ord(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["o_orderdate"], pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _ord, batch_format="pyarrow", batch_size=131072)
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    j = sorted_merge_join(li, orders, "l_orderkey", "o_orderkey",
                          ["rev4"], ["o_custkey"], rows_hint=hint)
    inner, edge = sorted_groupby(j, ["o_custkey"],
                                 [("rev4", "sum", "rev4")])
    rev = inner
    if edge is not None and edge.num_rows:
        rev = rev.union(rd.from_arrow(edge))

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    hint2 = cust.count() * 2
    j2 = sorted_merge_join(rev, cust, "o_custkey", "c_custkey",
                           ["rev4"], ["c_custkey", "c_name",
                                      "c_acctbal", "c_nationkey"],
                           rows_hint=hint2)
    dim = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    enriched = broadcast_lookup_join(j2, "c_nationkey", dim,
                                     "n_nationkey", ["n_name"])

    # per-block top-20 ON THE 2DP-ROUNDED value (q3's _topk lesson) —
    # rounding is exact integer half-away on the 10^-4-unit sums
    def _topk(t: pa.Table) -> pa.Table:
        import numpy as np

        cents = (t["rev4"].to_numpy() + 50) // 100
        t = t.drop_columns(["rev4"]).append_column(
            "revenue", pa.array(cents / 100.0, pa.float64()))
        idx = pc.sort_indices(t, sort_keys=[("revenue", "descending"),
                                            ("c_custkey", "ascending")])
        return t.take(idx.slice(0, 20))

    parts = enriched.map_batches(_topk, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    out = parts.sort_values(["revenue", "c_custkey"],
                            ascending=[False, True]).head(20)
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out[["c_custkey", "c_name", "revenue", "c_acctbal",
                "n_name"]].reset_index(drop=True)


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q5-shaped composite: revenue per nation where the ordering
    customer and the line's supplier share a nation — one big⨝big
    sort-merge join (lineitem⨝filtered orders on orderkey) + TWO
    broadcast dimension lookups (customer→nation, supplier→nation; at
    10^9-customer scale the customer lookup graduates to a second merge
    join — the supplier side stays a broadcast) + a 25-group partial
    aggregation. Revenue is computed in exact integer 10^-4 units
    (cents × cents) on BOTH sides, so the distributed sum is
    association-free and hash-identical to the SQL twin."""
    import ray.data as rd

    from ..stages.referential import broadcast_lookup_join

    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def _li(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "rev4": pc.multiply(cents, disc)})

    def _ord(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["o_orderdate"], pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _ord, batch_format="pyarrow", batch_size=131072)
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    from ..stages.merge_join import sorted_merge_join

    j = sorted_merge_join(li, orders, "l_orderkey", "o_orderkey",
                          ["l_suppkey", "rev4"], ["o_custkey"],
                          rows_hint=hint)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(j, "o_custkey", cust, "c_custkey",
                              ["c_nationkey"])
    j = broadcast_lookup_join(j, "l_suppkey", supp, "s_suppkey",
                              ["s_nationkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.equal(batch["c_nationkey"], batch["s_nationkey"]), False)
        sub = batch.filter(keep)
        g = sub.group_by(["s_nationkey"], use_threads=False).aggregate(
            [("rev4", "sum")])
        return g.rename_columns(
            ["rev4" if c == "rev4_sum" else c for c in g.column_names])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    agg = parts.groupby("s_nationkey", as_index=False)["rev4"].sum()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    # 2dp rounding in EXACT integer arithmetic (half away from zero on
    # the 10^-4-unit sum) — float .round() is half-even and flips on
    # exact half-cent sums, which this data does hit
    out["revenue"] = ((out["rev4"] + 50) // 100) / 100.0
    out = out.sort_values(["revenue", "n_name"], ascending=[False, True])
    return out[["n_name", "revenue"]].reset_index(drop=True)


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q18-shaped composite (HAVING-subquery semi join): orders
    whose total lineitem quantity exceeds 200 — one grouped-sum exchange
    with the HAVING filter applied inside the post-exchange map tasks
    (only qualifying keys survive), then two big⨝big sort-merge joins
    (orders for the header columns, customer for the name) and a
    per-block top-100 by total price."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    inner, edge = sorted_groupby(li, ["l_orderkey"],
                                 [("l_quantity", "sum", "sum_qty")])

    def _having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["sum_qty"], pa.scalar(200.0)))

    qual = inner.map_batches(_having, batch_format="pyarrow",
                             batch_size=None)
    if edge is not None and edge.num_rows:
        qual = qual.union(rd.from_arrow(_having(edge)))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    hint = orders.count() * 2
    j1 = sorted_merge_join(qual, orders, "l_orderkey", "o_orderkey",
                           ["sum_qty"],
                           ["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"], rows_hint=hint)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    hint2 = cust.count() * 2
    j2 = sorted_merge_join(j1, cust, "o_custkey", "c_custkey",
                           ["o_orderkey", "o_orderdate", "o_totalprice",
                            "sum_qty"], ["c_custkey", "c_name"],
                           rows_hint=hint2)

    def _topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("o_totalprice", "descending"),
                                            ("o_orderkey", "ascending")])
        return t.take(idx.slice(0, 100))

    parts = j2.map_batches(_topk, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out = parts.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True]).head(100)
    out["sum_qty"] = out["sum_qty"].round(2)
    for c in ("o_orderkey", "c_custkey"):
        out[c] = out[c].astype("int64")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]].reset_index(drop=True)


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q7-shaped composite (volume shipping between two nations):
    revenue by (supp_nation, cust_nation, ship year) for cross-nation
    trade between NATION_1 and NATION_2. Scale plan: the supplier
    roster is broadcast ONCE and lineitem is pruned map-side to the two
    nations' suppliers BEFORE the shuffle (≤2/25 of rows enter the
    join), then one big⨝big sort-merge join against orders, a customer
    nation lookup (broadcast here; graduates to a second merge join at
    10^9-customer scale), and a ≤8-group partial aggregation. Revenue
    in exact integer 10^-4 units end-to-end (Q5 discipline)."""
    from ..stages.merge_join import sorted_merge_join
    from ..stages.referential import broadcast_lookup_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    pair = {k for k, v in name_of.items() if v in ("NATION_3", "NATION_8")}
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"],
                                value_set=pa.array(sorted(pair))))

    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def _li(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["l_shipdate"], pa.timestamp("us"))
        batch = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        yr = pc.cast(pc.year(pc.cast(batch["l_shipdate"], pa.timestamp("us"))),
                     pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "l_year": yr,
                         "rev4": pc.multiply(cents, disc)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    # map-side prune: only the two nations' suppliers survive the lookup
    li = broadcast_lookup_join(li, "l_suppkey", supp, "s_suppkey",
                               ["s_nationkey"])
    li = li.map_batches(
        lambda t: t.filter(t["s_nationkey"].is_valid()).drop(["l_suppkey"]),
        batch_format="pyarrow", batch_size=131072)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + orders.count())
    j = sorted_merge_join(li, orders, "l_orderkey", "o_orderkey",
                          ["l_year", "rev4", "s_nationkey"],
                          ["o_custkey"], rows_hint=hint)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"],
                                value_set=pa.array(sorted(pair))))
    j = broadcast_lookup_join(j, "o_custkey", cust, "c_custkey",
                              ["c_nationkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.not_equal(batch["c_nationkey"],
                                         batch["s_nationkey"]), False)
        sub = batch.filter(keep)
        g = sub.group_by(["s_nationkey", "c_nationkey", "l_year"],
                         use_threads=False).aggregate([("rev4", "sum")])
        return g.rename_columns(
            ["rev4" if c == "rev4_sum" else c for c in g.column_names])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if parts.empty:  # no cross-nation trade: typed empty result
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                             "cust_nation": pd.Series([], dtype=object),
                             "l_year": pd.Series([], dtype="int64"),
                             "revenue": pd.Series([], dtype="float64")})
    agg = parts.groupby(["s_nationkey", "c_nationkey", "l_year"],
                        as_index=False)["rev4"].sum()
    agg["supp_nation"] = agg["s_nationkey"].map(name_of)
    agg["cust_nation"] = agg["c_nationkey"].map(name_of)
    agg["revenue"] = ((agg["rev4"] + 50) // 100) / 100.0
    agg["l_year"] = agg["l_year"].astype("int64")
    out = agg.sort_values(["supp_nation", "cust_nation", "l_year"])
    return out[["supp_nation", "cust_nation", "l_year",
                "revenue"]].reset_index(drop=True)


def q12_late_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q12-shaped composite (the reference tables carry no
    l_shipmode/l_receiptdate, so the late-line predicate is
    l_shipdate > o_orderdate + 90 days and the group key is the ship
    year): one big⨝big sort-merge join carrying the order date through
    the exchange, the lateness filter applied map-side AFTER the join,
    and conditional priority counts (CASE WHEN twin) from per-block
    Arrow group_by partials — the driver folds ≤years×blocks rows."""
    from ..stages.merge_join import sorted_merge_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    hint = li.count() + orders.count()
    j = sorted_merge_join(li, orders, "l_orderkey", "o_orderkey",
                          ["l_shipdate"],
                          ["o_orderdate", "o_orderpriority"],
                          rows_hint=hint)
    ninety_us = 90 * 86_400_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                       pa.int64())
        od = pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                     pa.int64())
        late = pc.greater(pc.subtract(ship, od), pa.scalar(ninety_us))
        sub = batch.filter(late)
        yr = pc.cast(pc.year(pc.cast(sub["l_shipdate"], pa.timestamp("us"))),
                     pa.int64())
        hipri = pc.is_in(sub["o_orderpriority"],
                         value_set=pa.array(["1-URGENT", "2-HIGH"]))
        t = pa.table({"l_year": yr,
                      "high_line_count": pc.cast(hipri, pa.int64()),
                      "low_line_count": pc.cast(pc.invert(hipri), pa.int64())})
        return t.group_by(["l_year"], use_threads=False).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        ).rename_columns(["l_year", "high_line_count", "low_line_count"])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"l_year": pd.Series([], dtype="int64"),
                             "high_line_count": pd.Series([], dtype="int64"),
                             "low_line_count": pd.Series([], dtype="int64")})
    out = parts.groupby("l_year", as_index=False)[
        ["high_line_count", "low_line_count"]].sum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("l_year").reset_index(drop=True)


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q14-shaped composite (promotion effect): share of one
    month's discounted revenue from PROMO-type parts. One big⨝big
    sort-merge join (date-filtered lineitem ⨝ part on partkey — part is
    big at 10^9-part scale, so no broadcast), numerator/denominator as
    exact integer 10^-4-unit sums; the single final division happens
    once on the driver over the two exact integers, so the double is
    bit-identical to the SQL twin's."""
    from ..stages.merge_join import sorted_merge_join

    lo = pa.scalar(pd.Timestamp("1996-09-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-10-01"), pa.timestamp("us"))

    def _li(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["l_shipdate"], pa.timestamp("us"))
        batch = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": batch["l_partkey"],
                         "rev4": pc.multiply(cents, disc)})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    hint = (_read(sf_dir, "lineitem", ["l_partkey"]).count()
            + part.count())
    j = sorted_merge_join(li, part, "l_partkey", "p_partkey",
                          ["rev4"], ["p_type"], rows_hint=hint)

    def _partial(batch: pa.Table) -> pa.Table:
        promo = pc.equal(batch["p_type"], pa.scalar("PROMO"))
        pr = pc.if_else(promo, batch["rev4"], pa.scalar(0, pa.int64()))
        return pa.table({
            "promo4": pa.array([pc.sum(pr).as_py() or 0], pa.int64()),
            "total4": pa.array([pc.sum(batch["rev4"]).as_py() or 0],
                               pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    promo4 = int(parts["promo4"].sum()) if not parts.empty else 0
    total4 = int(parts["total4"].sum()) if not parts.empty else 0
    if total4 == 0:  # SQL SUM over zero rows is NULL
        return pd.DataFrame({"promo_revenue": [None], "promo_rev": [None],
                             "total_rev": [None]}, dtype="float64")
    return pd.DataFrame({
        "promo_revenue": [round(100.0 * promo4 / total4, 6)],
        "promo_rev": [((promo4 + 50) // 100) / 100.0],
        "total_rev": [((total4 + 50) // 100) / 100.0]})


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q17-shaped composite (small-quantity-order revenue): average
    yearly revenue lost if Brand#13 orders below 20% of the part's mean
    quantity were not filled. Correlated aggregate by composition:
    lineitem is pruned map-side to the brand's parts (broadcast key set;
    graduates to a Bloom + merge join at 10^9-part scale), ONE grouped
    exchange computes per-part (Σqty, n), a big⨝big sort-merge join
    carries the threshold back to the rows, and the filter runs in
    EXACT integers (100·qty·n·5 < 100·Σqty·n-free form: q2·5·n < s2)
    so no float average ever decides membership."""
    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    brand_keys = part.filter(
        pc.equal(part["p_brand"], pa.scalar("Brand#13")))["p_partkey"]
    keyset = np.sort(brand_keys.to_numpy(zero_copy_only=False))
    import ray
    ref = ray.put(keyset)

    def _li(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, pk)
        pos_c = np.minimum(pos, max(ks.size - 1, 0))
        hit = ks.size > 0
        keep = (ks[pos_c] == pk) if hit else np.zeros(len(pk), bool)
        sub = batch.filter(pa.array(keep))
        q2 = pc.cast(pc.round(pc.multiply(sub["l_quantity"], 100.0),
                              round_mode="half_towards_infinity"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(sub["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": sub["l_partkey"],
                         "q2": q2, "cents": cents})

    # two consumers (grouped exchange + join left side): materialize the
    # brand-pruned rows ONCE (≈1/25 of lineitem, object-store-bounded and
    # spillable) instead of re-running the scan per consumer
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072).materialize()
    inner, edge = sorted_groupby(li, ["l_partkey"],
                                 [("q2", "sum", "s2"),
                                  (None, "count_all", "n")])
    per_part = inner
    if edge is not None and edge.num_rows:
        per_part = per_part.union(rd.from_arrow(edge))
    hint = _read(sf_dir, "lineitem", ["l_partkey"]).count() * 2
    j = sorted_merge_join(li, per_part, "l_partkey", "l_partkey",
                          ["q2", "cents"], ["s2", "n"], rows_hint=hint)

    def _partial(batch: pa.Table) -> pa.Table:
        # qty < 0.2 * (Σqty / n)  ⇔  5·q2·n < s2  (exact integers)
        lhs = pc.multiply(pc.multiply(batch["q2"], pa.scalar(5, pa.int64())),
                          batch["n"])
        keep = pc.less(lhs, batch["s2"])
        sub = pc.filter(batch["cents"], keep)
        s = pc.sum(sub).as_py() or 0
        return pa.table({"cents": pa.array([s], pa.int64()),
                         "n_rows": pa.array([len(sub)], pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    total_cents = int(parts["cents"].sum())
    # SQL SUM over zero rows is NULL, not 0 — mirror it
    if int(parts["n_rows"].sum()) == 0:
        return pd.DataFrame({"avg_yearly": [None]}, dtype="float64")
    return pd.DataFrame({"avg_yearly": [round(total_cents / 700.0, 6)]})


def q21_sole_late_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q21-shaped composite (suppliers who kept orders waiting):
    among finished ('F') multi-supplier orders, count per supplier the
    orders where THAT supplier was the only one to ship late (> 60 days
    after the order date; the testdata lineitem carries no
    commit/receipt dates, so lateness is anchored to o_orderdate). The
    EXISTS/NOT-EXISTS pair of the original collapses to per-order
    distinct-supplier census: n_supp > 1 AND n_late == 1.

    Scale plan: orders filter to 'F' map-side and carry only an int64
    lateness threshold into ONE big⨝big sort-merge join with lineitem;
    a (orderkey, suppkey) grouped exchange dedups supplier lines
    (MAX(late) per pair); a second exchange keyed on the same orderkey
    prefix folds the per-order census, smuggling the sole late supplier
    through MIN(supp-if-late-else-2^62); qualifying orders reduce
    through a third skinny exchange keyed on supplier; names broadcast
    from the small supplier table at the end. All predicates integer."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    _SENT = 1 << 62
    day_us = 86_400_000_000

    def _ord(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["o_orderstatus"], pa.scalar("F")))
        od = pc.cast(pc.cast(sub["o_orderdate"], pa.timestamp("us")),
                     pa.int64())
        return pa.table({"o_orderkey": sub["o_orderkey"],
                         "thresh_us": pc.add(od, pa.scalar(60 * day_us,
                                                           pa.int64()))})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"]).map_batches(
        _ord, batch_format="pyarrow", batch_size=131072)

    def _li(batch: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                       pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"], "ship_us": ship})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    j = sorted_merge_join(li, orders, "l_orderkey", "o_orderkey",
                          ["l_orderkey", "l_suppkey", "ship_us"],
                          ["thresh_us"], rows_hint=hint)

    def _late(batch: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(batch["ship_us"], batch["thresh_us"]),
                       pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"], "late": late})

    pairs_in, pairs_edge = sorted_groupby(
        j.map_batches(_late, batch_format="pyarrow", batch_size=131072),
        ["l_orderkey", "l_suppkey"], [("late", "max", "late")])
    pairs = pairs_in
    if pairs_edge is not None and pairs_edge.num_rows:
        pairs = pairs.union(rd.from_arrow(pairs_edge))

    def _census_prep(batch: pa.Table) -> pa.Table:
        late_key = pc.if_else(pc.equal(batch["late"], 1), batch["l_suppkey"],
                              pa.scalar(_SENT, pa.int64()))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "late": batch["late"], "late_key": late_key})

    per_in, per_edge = sorted_groupby(
        pairs.map_batches(_census_prep, batch_format="pyarrow",
                          batch_size=131072),
        ["l_orderkey"],
        [(None, "count_all", "n_supp"), ("late", "sum", "n_late"),
         ("late_key", "min", "late_supp")])
    per_order = per_in
    if per_edge is not None and per_edge.num_rows:
        per_order = per_order.union(rd.from_arrow(per_edge))

    def _qualify(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch["n_supp"], 1),
                       pc.equal(batch["n_late"], 1))
        return pa.table({"late_supp": pc.filter(batch["late_supp"], keep)})

    waits_in, waits_edge = sorted_groupby(
        per_order.map_batches(_qualify, batch_format="pyarrow",
                              batch_size=131072),
        ["late_supp"], [(None, "count_all", "numwait")])
    out = waits_in.to_pandas()
    if waits_edge is not None and waits_edge.num_rows:
        out = pd.concat([out, waits_edge.to_pandas()], ignore_index=True)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = out.merge(supp, left_on="late_supp", right_on="s_suppkey",
                    how="inner")
    out["numwait"] = out["numwait"].astype("int64")
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True]).head(10)
            [["s_name", "numwait"]].reset_index(drop=True))


def q_part_affinity_topk(sf_dir: str) -> pd.DataFrame:
    """MARKET-BASKET co-occurrence: the 10 part pairs most often
    ordered together — the association-mining support table.
    Composition: (order, part) dedup through one grouped exchange →
    stages.window.pair_cooccurrence (one sort, vectorized in-run
    triu pair emission, O(blocks × basket) fragment cross-pairs on the
    driver, one skinny pair-count exchange) → global top-10 on the
    driver over per-block top-k partials."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_partkey"],
                            [(None, "count_all", "_n")])
    pairs = di.select_columns(["l_orderkey", "l_partkey"])
    if de is not None and de.num_rows:
        pairs = pairs.union(
            rd.from_arrow(de.select(["l_orderkey", "l_partkey"])))
    ci, ce = pair_cooccurrence(pairs, "l_orderkey", "l_partkey")

    def _top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("item_a", pa.int64()),
                              ("item_b", pa.int64()),
                              ("n", pa.int64())]).empty_table()
        idx = pc.select_k_unstable(
            t, k=min(10, t.num_rows),
            sort_keys=[("n", "descending"), ("item_a", "ascending"),
                       ("item_b", "ascending")])
        return t.take(idx)

    tops = ci.map_batches(_top, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if ce is not None and ce.num_rows:
        tops = pd.concat([tops, _top(ce).to_pandas()], ignore_index=True)
    out = (tops.sort_values(["n", "item_a", "item_b"],
                            ascending=[False, True, True]).head(10)
           .rename(columns={"item_a": "part_a", "item_b": "part_b",
                            "n": "n_orders"}))
    for c in ["part_a", "part_b", "n_orders"]:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_order_reconciliation(sf_dir: str) -> pd.DataFrame:
    """CROSS-TABLE RECONCILIATION — the fact-vs-rollup consistency check
    a validation engine runs between a header table and its lines: per
    order status, how many orders have NO lineitems, how many disagree
    with the sum of their lines' extended prices, and the worst absolute
    discrepancy. One grouped exchange folds lineitem to per-order exact
    cents; a LEFT sort-merge join carries header totals; the ≤|status|
    census folds per-block partials. All integers — no float equality
    anywhere."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    def _li(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"], "c": cents})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    si, se = sorted_groupby(li, ["l_orderkey"], [("c", "sum", "line_cents")])
    sums = si
    if se is not None and se.num_rows:
        sums = sums.union(rd.from_arrow(se))

    def _ord(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_orderstatus": batch["o_orderstatus"],
                         "total_cents": cents})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"]).map_batches(
        _ord, batch_format="pyarrow", batch_size=131072)
    hint = (_read(sf_dir, "orders", ["o_orderkey"]).count()
            + _read(sf_dir, "lineitem", ["l_orderkey"]).count())
    j = sorted_merge_join(orders, sums, "o_orderkey", "l_orderkey",
                          ["o_orderstatus", "total_cents"], ["line_cents"],
                          rows_hint=hint, how="left")

    def _census(t: pa.Table) -> pa.Table:
        has = t["line_cents"].is_valid()
        diff = pc.abs(pc.subtract(t["total_cents"],
                                  pc.fill_null(t["line_cents"], 0)))
        diff = pc.if_else(has, diff, pa.scalar(0, pa.int64()))
        g = pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "no_lines": pc.cast(pc.invert(has), pa.int64()),
            "mismatch": pc.cast(pc.and_(has, pc.greater(diff, 0)), pa.int64()),
            "diff": diff,
        }).group_by(["o_orderstatus"], use_threads=False).aggregate(
            [("one", "sum"), ("no_lines", "sum"), ("mismatch", "sum"),
             ("diff", "max")])
        return g.rename_columns(
            [{"one_sum": "n_orders", "no_lines_sum": "n_no_lines",
              "mismatch_sum": "n_mismatch",
              "diff_max": "max_abs_diff_cents"}.get(c, c)
             for c in g.column_names])

    parts = j.map_batches(_census, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    out = parts.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), n_no_lines=("n_no_lines", "sum"),
        n_mismatch=("n_mismatch", "sum"),
        max_abs_diff_cents=("max_abs_diff_cents", "max"))
    for c in ["n_orders", "n_no_lines", "n_mismatch", "max_abs_diff_cents"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q8-shaped composite (national market share): NATION_8's
    share of EUROPE-customer revenue on ECONOMY parts per order year,
    1995-1996. Scale plan: part prunes to the type map-side then ONE
    big⨝big merge join tags qualifying lineitems; orders date-filter
    map-side BEFORE their join; customers prune to the region's nations
    by a broadcast nation⨝region key set BEFORE the third join;
    supplier nation rides a broadcast lookup (q7 discipline). Revenue
    in exact integer 10^-4 units; the share divides num/den ONCE on the
    driver per year, so the double is bit-identical to the SQL twin's."""
    from ..stages.merge_join import sorted_merge_join
    from ..stages.referential import broadcast_lookup_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    europe_key = int(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"].iloc[0])
    euro_nations = sorted(
        nat.loc[nat["n_regionkey"] == europe_key, "n_nationkey"])
    target_key = int(nat.loc[nat["n_name"] == "NATION_8",
                             "n_nationkey"].iloc[0])

    def _li(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_partkey": batch["l_partkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "rev4": pc.multiply(cents, disc)})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    def _part_econ(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.fill_null(pc.equal(t["p_type"], "ECONOMY"), False))
        return pa.table({"p_partkey": sub["p_partkey"],
                         "__econ": pa.array(np.ones(sub.num_rows, np.int8))})

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        _part_econ, batch_format="pyarrow", batch_size=None)
    hint = (_read(sf_dir, "lineitem", ["l_partkey"]).count()
            + _read(sf_dir, "part", ["p_partkey"]).count())
    j = sorted_merge_join(li, part, "l_partkey", "p_partkey",
                          ["l_orderkey", "l_suppkey", "rev4"], ["__econ"],
                          rows_hint=hint)

    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def _ord(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["o_orderdate"], pa.timestamp("us"))
        batch = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        yr = pc.cast(pc.year(pc.cast(batch["o_orderdate"],
                                     pa.timestamp("us"))), pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_custkey": batch["o_custkey"],
                         "o_year": yr})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _ord, batch_format="pyarrow", batch_size=131072)
    hint2 = hint  # same magnitude; an upper bound is fine
    j = sorted_merge_join(j, orders, "l_orderkey", "o_orderkey",
                          ["l_suppkey", "rev4"], ["o_custkey", "o_year"],
                          rows_hint=hint2)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"],
                                value_set=pa.array(euro_nations)))
    j = broadcast_lookup_join(j, "o_custkey", cust, "c_custkey",
                              ["c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(j, "l_suppkey", supp, "s_suppkey",
                              ["s_nationkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["c_nationkey"].is_valid())
        if batch.num_rows == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "num4": pa.array([], pa.int64()),
                             "den4": pa.array([], pa.int64())})
        is_t = pc.equal(batch["s_nationkey"], pa.scalar(target_key))
        num = pc.if_else(pc.fill_null(is_t, False), batch["rev4"],
                         pa.scalar(0, pa.int64()))
        t = pa.table({"o_year": batch["o_year"], "num4": num,
                      "den4": batch["rev4"]})
        g = t.group_by(["o_year"], use_threads=False).aggregate(
            [("num4", "sum"), ("den4", "sum")])
        return g.rename_columns(["num4" if c == "num4_sum" else
                                 "den4" if c == "den4_sum" else c
                                 for c in g.column_names])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"o_year": pd.Series([], dtype="int64"),
                             "mkt_share": pd.Series([], dtype="float64"),
                             "total_volume": pd.Series([], dtype="float64")})
    agg = parts.groupby("o_year", as_index=False)[["num4", "den4"]].sum()
    agg["mkt_share"] = (agg["num4"] / agg["den4"]).round(6)
    agg["total_volume"] = ((agg["den4"] + 50) // 100) / 100.0
    agg["o_year"] = agg["o_year"].astype("int64")
    return (agg.sort_values("o_year")[["o_year", "mkt_share",
                                       "total_volume"]]
            .reset_index(drop=True))


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q15-shaped composite (top supplier): supplier(s) with the
    maximum three-month revenue. Per-supplier revenue via per-block
    Arrow partials into ONE grouped exchange (exact integer 10^-4
    units); the global max and the (≤ handful of) max rows reduce over
    the grouped Dataset without collecting the supplier census, then
    names come from a key-pruned supplier read."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01"), pa.timestamp("us"))

    def _li(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["l_shipdate"], pa.timestamp("us"))
        batch = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"l_suppkey": batch["l_suppkey"],
                      "total4": pc.multiply(cents, disc)})
        g = t.group_by(["l_suppkey"], use_threads=False).aggregate(
            [("total4", "sum")])
        return g.rename_columns(["total4" if c == "total4_sum" else c
                                 for c in g.column_names])

    pre = _read(sf_dir, "lineitem",
                ["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["l_suppkey"],
                                 [("total4", "sum", "total4")])
    grouped = inner
    if edge is not None and edge.num_rows:
        grouped = grouped.union(rd.from_arrow(edge.cast(
            pa.schema([("l_suppkey", pa.int64()),
                       ("total4", pa.int64())]))))
    grouped = grouped.materialize()
    best = grouped.max("total4")
    if best is None:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series([], dtype="float64")})
    top = grouped.map_batches(
        lambda t: t.filter(pc.equal(t["total4"], pa.scalar(int(best)))),
        batch_format="pyarrow", batch_size=None).to_pandas()
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", sorted(top["l_suppkey"]))]).to_pandas()
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = ((out["total4"] + 50) // 100) / 100.0
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (out.sort_values("s_suppkey")[["s_suppkey", "s_name",
                                          "total_revenue"]]
            .reset_index(drop=True))


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q19-shaped composite (discounted revenue, disjunctive
    predicates; the reference tables carry no shipmode/shipinstruct, so
    the three OR arms pair brand+size ranges with quantity bands): part
    prunes map-side to the union of the arms' (brand, size) windows,
    ONE big⨝big merge join carries (brand, size) to the lines, the arm
    disjunction evaluates vectorized post-join, and the revenue sum
    reduces in exact integer 10^-4 units."""
    from ..stages.merge_join import sorted_merge_join

    ARMS = [("Brand#1", 1, 15, 1, 11),
            ("Brand#2", 1, 25, 10, 20),
            ("Brand#3", 1, 35, 20, 30)]

    def _part(batch: pa.Table) -> pa.Table:
        keep = None
        for brand, slo, shi, _, _ in ARMS:
            arm = pc.and_(pc.equal(batch["p_brand"], brand),
                          pc.and_(pc.greater_equal(batch["p_size"], slo),
                                  pc.less_equal(batch["p_size"], shi)))
            keep = arm if keep is None else pc.or_(keep, arm)
        return batch.filter(pc.fill_null(keep, False)).select(
            ["p_partkey", "p_brand", "p_size"])

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).map_batches(
        _part, batch_format="pyarrow", batch_size=None)

    def _li(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": batch["l_partkey"],
                         "l_quantity": batch["l_quantity"],
                         "rev4": pc.multiply(cents, disc)})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"]).map_batches(
        _li, batch_format="pyarrow", batch_size=131072)
    hint = (_read(sf_dir, "lineitem", ["l_partkey"]).count()
            + _read(sf_dir, "part", ["p_partkey"]).count())
    j = sorted_merge_join(li, part, "l_partkey", "p_partkey",
                          ["l_quantity", "rev4"], ["p_brand", "p_size"],
                          rows_hint=hint)

    def _partial(batch: pa.Table) -> pa.Table:
        keep = None
        for brand, slo, shi, qlo, qhi in ARMS:
            arm = pc.and_(
                pc.and_(pc.equal(batch["p_brand"], brand),
                        pc.and_(pc.greater_equal(batch["p_size"], slo),
                                pc.less_equal(batch["p_size"], shi))),
                pc.and_(pc.greater_equal(batch["l_quantity"], qlo),
                        pc.less_equal(batch["l_quantity"], qhi)))
            keep = arm if keep is None else pc.or_(keep, arm)
        sub = batch.filter(pc.fill_null(keep, False))
        return pa.table({
            "rev4": pa.array([pc.sum(sub["rev4"]).as_py() or 0], pa.int64()),
            "n": pa.array([sub.num_rows], pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if parts.empty or int(parts["n"].sum()) == 0:
        return pd.DataFrame({"revenue": [None]}, dtype="float64")
    total4 = int(parts["rev4"].sum())
    return pd.DataFrame({"revenue": [((total4 + 50) // 100) / 100.0]})


def q22_dormant_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q22-shaped composite (global sales opportunity): per-segment
    census of above-average-balance customers with NO event activity
    (every synthetic customer has orders, so the dormancy predicate
    anti-joins the events table instead). Scalar
    subquery broadcast (one (Σcents, n) pass over customer — the
    comparison cents·n > Σcents runs in exact integers, no float average
    decides membership), then a big⨝big ANTI join by composition
    (distinct order custkeys through one exchange, LEFT sort-merge join,
    keep null-matched), and per-segment exact-cents totals."""
    from ..stages.merge_join import sorted_merge_join
    import ray.data as rd

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])

    def _sums(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        pos = pc.filter(cents, pc.greater(cents, pa.scalar(0, pa.int64())))
        return pa.table({"s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    sums = cust.map_batches(_sums, batch_format="pyarrow",
                            batch_size=131072).to_pandas()
    s_tot, n_tot = int(sums["s"].sum()), int(sums["n"].sum())

    def _hi(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        batch = batch.append_column("cents", cents)
        keep = pc.greater(pc.multiply(cents, pa.scalar(n_tot, pa.int64())),
                          pa.scalar(s_tot, pa.int64()))
        return batch.filter(keep).select(
            ["c_custkey", "c_mktsegment", "cents"])

    hi_cust = cust.map_batches(_hi, batch_format="pyarrow",
                               batch_size=131072)

    from ..stages.fast_ops import distinct_values

    active = distinct_values(_read(sf_dir, "events", ["user_id"]),
                             "user_id")
    hint = cust.count() + _read(sf_dir, "events", ["user_id"]).count()
    j = sorted_merge_join(hi_cust, active, "c_custkey", "user_id",
                          ["c_mktsegment", "cents"], ["user_id"],
                          rows_hint=hint, how="left")

    def _partial(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_null(batch["user_id"]))
        if sub.num_rows == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "numcust": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        g = sub.group_by(["c_mktsegment"], use_threads=False).aggregate(
            [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(
            [("numcust" if c == "count_all" else
              "cents" if c == "cents_sum" else c) for c in g.column_names]
        ).select(["c_mktsegment", "numcust", "cents"])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "numcust": pd.Series([], dtype="int64"),
                             "totacctbal": pd.Series([], dtype="float64")})
    out = parts.groupby("c_mktsegment", as_index=False)[
        ["numcust", "cents"]].sum()
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["cents"] / 100.0
    return out[["c_mktsegment", "numcust", "totacctbal"]].sort_values(
        "c_mktsegment").reset_index(drop=True)


def _distinct_event_users(sf_dir: str):
    """Deduped event user_ids as a Dataset — big-side key dedup via one
    sorted_groupby exchange (the build side of the semi/anti joins;
    dedup first makes the join product ≤1 row per left row AND removes
    any oversize-key risk, since nr = 1 per key by construction)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    events = _read(sf_dir, "events", ["user_id"])
    inner, edge = sorted_groupby(events, ["user_id"],
                                 [(None, "count_all", "n")])
    users = inner.select_columns(["user_id"])
    if edge is not None and edge.num_rows:
        users = users.union(rd.from_arrow(edge.select(["user_id"])))
    return users


def q_orders_with_events(sf_dir: str) -> pd.DataFrame:
    """Big⨝big SEMI join by composition (EXISTS twin): orders whose
    customer produced ≥1 event — distinct event users through one
    exchange, then the inner sort-merge join (each left row matches at
    most once against the deduped build side)."""
    from ..stages.merge_join import sorted_merge_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    hint = orders.count() + _read(sf_dir, "events", ["user_id"]).count()
    joined = sorted_merge_join(
        orders, _distinct_event_users(sf_dir), "o_custkey", "user_id",
        ["o_orderkey", "o_custkey"], ["user_id"], rows_hint=hint,
    ).to_pandas()
    out = joined[["o_orderkey", "o_custkey"]].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_orders_without_events(sf_dir: str) -> pd.DataFrame:
    """Big⨝big ANTI join by composition (NOT EXISTS twin): LEFT OUTER
    against the deduped build side, keep the null-matched left rows."""
    from ..stages.merge_join import sorted_merge_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    hint = orders.count() + _read(sf_dir, "events", ["user_id"]).count()
    joined = sorted_merge_join(
        orders, _distinct_event_users(sf_dir), "o_custkey", "user_id",
        ["o_orderkey", "o_custkey"], ["user_id"],
        how="left", rows_hint=hint,
    ).to_pandas()
    out = joined[joined["user_id"].isna()][["o_orderkey", "o_custkey"]]
    out = out.astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_activity_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER big⨝big join: per-key order counts vs event counts,
    keys present on either side survive with zero-filled counts — the
    SQL FULL OUTER JOIN + COALESCE twin (stages.merge_join how='full').
    Both inputs are pre-aggregated through one sorted_groupby exchange
    each, so the join sides are distinct-keyed (nl = nr = 1)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    def _counts(table, key, out_key, out_n):
        src = _read(sf_dir, table, [key])
        inner, edge = sorted_groupby(src, [key], [(None, "count_all", out_n)])
        ds = inner
        if edge is not None and edge.num_rows:
            ds = ds.union(rd.from_arrow(edge))
        return ds.map_batches(
            lambda t, k=key, ok=out_key: t.rename_columns(
                [ok if c == k else c for c in t.column_names]),
            batch_format="pyarrow")

    o = _counts("orders", "o_custkey", "cust_k", "n_orders")
    e = _counts("events", "user_id", "user_k", "n_events")
    joined = sorted_merge_join(o, e, "cust_k", "user_k",
                               ["cust_k", "n_orders"],
                               ["user_k", "n_events"], how="full",
                               rows_hint=200_000)

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.coalesce(t["cust_k"], t["user_k"]),
            "n_orders": pc.fill_null(t["n_orders"], 0),
            "n_events": pc.fill_null(t["n_events"], 0),
        })

    out = joined.map_batches(_final, batch_format="pyarrow").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def q_stratified_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample (training-data op): 3 orders per
    order-priority stratum, chosen by a multiplicative hash of the key
    so the sample is reproducible and SQL-expressible
    (fast_ops.stratified_sample → grouped_topk exchange)."""
    from ..stages.fast_ops import stratified_sample

    out = stratified_sample(
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey"]),
        ["o_orderpriority"], "o_orderkey", n=3, rows_hint=100_000,
    ).to_pandas()
    out = out[["o_orderpriority", "o_orderkey"]]
    return out.sort_values(["o_orderpriority", "o_orderkey"]).reset_index(drop=True)


def q_custkeys_intersect(sf_dir: str) -> pd.DataFrame:
    """Set op INTERSECT by composition (§2.7): keys that ordered AND
    produced events — distinct each side through one exchange, inner
    sort-merge join (fast_ops.set_intersect). Nulls excluded on both
    sides (the SQL twin filters them; join-based sets drop null keys)."""
    from ..stages.fast_ops import set_intersect

    out = set_intersect(
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
        _read(sf_dir, "events", ["user_id"]), "user_id",
        rows_hint=100_000,
    ).to_pandas().rename(columns={"o_custkey": "k"})
    return out.sort_values("k").reset_index(drop=True)


def q_custkeys_except(sf_dir: str) -> pd.DataFrame:
    """Set op EXCEPT by composition (§2.7): keys that ordered but never
    produced an event (fast_ops.set_except)."""
    from ..stages.fast_ops import set_except

    out = set_except(
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
        _read(sf_dir, "events", ["user_id"]), "user_id",
        rows_hint=100_000,
    ).to_pandas().rename(columns={"o_custkey": "k"})
    return out.sort_values("k").reset_index(drop=True)


def q_order_linenumbers_agg(sf_dir: str) -> pd.DataFrame:
    """Order-sensitive grouped string concatenation — STRING_AGG(val,
    ',' ORDER BY ...) twin (fast_ops.grouped_string_agg): interior runs
    fold to one string per group with a single Arrow binary_join kernel
    call; edge runs ship ONE pre-joined fragment per block."""
    from ..stages.fast_ops import grouped_string_agg

    out = grouped_string_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]),
        ["l_orderkey"], "l_linenumber", ["l_linenumber"],
        rows_hint=700_000,
    ).to_pandas()
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    return out.sort_values("l_orderkey").reset_index(drop=True)


def q_priority_quantity_skewjoin(sf_dir: str) -> pd.DataFrame:
    """Skew-resilient join exercised on real data: lineitem⨝orders with
    hot_threshold=4, so orderkeys with ≥5 lineitems take the broadcast
    sideband (their rows never enter the sort exchange) while the rest
    take the ordinary merge join — identical result either way, grouped
    per order priority (stages.merge_join.skew_resilient_join)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import skew_resilient_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    hint = li.count() + orders.count()
    joined = skew_resilient_join(li, orders, "l_orderkey", "o_orderkey",
                                 ["l_quantity"], ["o_orderpriority"],
                                 hot_threshold=4, rows_hint=hint)
    inner, edge = sorted_groupby(joined, ["o_orderpriority"],
                                 [("l_quantity", "sum", "sum_qty"),
                                  (None, "count_all", "n_items")])
    out = inner
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge))
    df = out.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["n_items"] = df["n_items"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


def q_urgent_revenue_bloom(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter pre-join pruning (stages/bloom.py): build a Bloom
    filter over URGENT orderkeys (one bitmap partial per block, OR
    tree-merge, ray.put broadcast), prune lineitem by it BEFORE the sort
    exchange (~80% of probe rows never shuffle), then the exact
    sort-merge join eliminates the Bloom's false positives — result is
    exact. Aggregates per ship month over the pruned join."""
    import ray.data as rd

    from ..stages.bloom import bloom_prune, build_bloom
    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    urgent = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")),
        batch_format="pyarrow",
    )
    bloom_ref = build_bloom(urgent, "o_orderkey", num_bits=1 << 21)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_quantity", "l_shipdate"])
    pruned = bloom_prune(li, "l_orderkey", bloom_ref)
    # metadata-only counts (raw reads), ~20% of orders are URGENT
    hint = li.count() // 4 + _read(sf_dir, "orders", ["o_orderkey"]).count() // 4
    joined = sorted_merge_join(pruned, urgent, "l_orderkey", "o_orderkey",
                               ["l_quantity", "l_shipdate"],
                               ["o_orderpriority"], rows_hint=hint)

    def _month(batch: pa.Table) -> pa.Table:
        ym = pc.strftime(batch["l_shipdate"], format="%Y-%m")
        return pa.table({"ship_month": ym, "l_quantity": batch["l_quantity"]})

    monthly = joined.map_batches(_month, batch_format="pyarrow")
    inner, edge = sorted_groupby(monthly, ["ship_month"],
                                 [("l_quantity", "sum", "sum_qty"),
                                  (None, "count_all", "n_items")])
    out = inner
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge))
    df = out.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["n_items"] = df["n_items"].astype("int64")
    return df.sort_values("ship_month").reset_index(drop=True)


def q_orders_above_cust_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-subquery pattern by composition: orders strictly above
    their OWN customer's average order value — per-customer (sum, n)
    through one exchange, joined back to orders (big⨝big sort-merge),
    with the comparison done in exact integer arithmetic
    (cents·n > sum_cents·1 avoids float-division parity traps)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    cents_ds = _orders_cents(sf_dir)
    inner, edge = sorted_groupby(cents_ds, ["o_custkey"],
                                 [("cents", "sum", "sum_cents"),
                                  (None, "count_all", "n_orders")])
    per_cust = inner
    if edge is not None and edge.num_rows:
        per_cust = per_cust.union(rd.from_arrow(edge))
    per_cust = per_cust.map_batches(
        lambda t: t.rename_columns(
            ["cust_k" if c == "o_custkey" else c for c in t.column_names]),
        batch_format="pyarrow")

    joined = sorted_merge_join(cents_ds, per_cust, "o_custkey", "cust_k",
                               ["o_orderkey", "o_custkey", "cents"],
                               ["sum_cents", "n_orders"],
                               rows_hint=100_000)

    def _above(t: pa.Table) -> pa.Table:
        # cents > sum/n  ⟺  cents*n > sum (n > 0 always)
        lhs = pc.multiply(t["cents"], t["n_orders"])
        return t.filter(pc.greater(lhs, t["sum_cents"])).select(
            ["o_orderkey", "o_custkey"])

    out = joined.map_batches(_above, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q13_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q13-shaped pipeline exercising the LEFT OUTER big⨝big
    shuffle join: customer ⟕ orders on custkey (customers with no
    orders keep a null order side), per-customer order counts through
    sorted_groupby, then the tiny count-of-counts histogram — per-block
    value_counts partials, driver-merged over the ≤ max-orders-per-
    customer domain."""
    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    hint = cust.count() + orders.count()
    joined = sorted_merge_join(cust, orders, "c_custkey", "o_custkey",
                               ["c_custkey"], ["o_orderkey"],
                               how="left", rows_hint=hint)
    inner, edge = sorted_groupby(joined, ["c_custkey"],
                                 [("o_orderkey", "count", "c_count")])

    def _hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "n_custs": pa.array([], pa.int64())})
        vc = pc.value_counts(t["c_count"].combine_chunks())
        return pa.table({"c_count": vc.field("values"),
                         "n_custs": vc.field("counts").cast(pa.int64())})

    parts = inner.map_batches(_hist, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        parts = pd.concat([parts, _hist(edge).to_pandas()], ignore_index=True)
    out = parts.groupby("c_count", as_index=False)["n_custs"].sum()
    out = out.sort_values(["n_custs", "c_count"], ascending=[False, False])
    return out[["c_count", "n_custs"]].astype("int64").reset_index(drop=True)


def q_customer_nations(sf_dir: str) -> pd.DataFrame:
    """Broadcast enrichment (lookup) join (§2.4): append nation name to
    every customer row from the tiny nation dim — ray.put once, one
    sorted-key searchsorted per batch, no shuffle
    (stages.referential.broadcast_lookup_join)."""
    import pyarrow.parquet as pq

    from ..stages.referential import broadcast_lookup_join

    dim = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    out = broadcast_lookup_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_nationkey", dim, "n_nationkey", ["n_name"],
    ).to_pandas()
    out = out[["c_custkey", "n_name"]]
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_window_counts(sf_dir: str) -> pd.DataFrame:
    """Time-range windowed aggregate (§2 custom operator): per event, the
    number of same-user events in the trailing hour — SQL RANGE window
    twin. One sort exchange + vectorized per-run searchsorted; edge
    partitions stitch on the driver (stages.window.windowed_count)."""
    from ..stages.window import windowed_count

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = windowed_count(ds, "user_id", "ts", "event_id",
                         window_us=3_600_000_000).to_pandas()
    out = out.rename(columns={"id": "event_id", "n_window": "n_last_hour"})
    out["event_id"] = out["event_id"].astype("int64")
    out["n_last_hour"] = out["n_last_hour"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_window_spend(sf_dir: str) -> pd.DataFrame:
    """Time-range windowed SUM (RANGE frame): per event, total same-user
    `value` over the trailing hour in EXACT integer cents — windowed_agg
    with a value column (prefix-sum searchsorted per run, time-clipped
    candidate/pool edge stitch; same exchange as windowed_count)."""
    from ..stages.window import windowed_agg

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        return t.drop_columns(["value"]).append_column(
            "cents", pc.fill_null(c, 0))

    rows = _read(sf_dir, "events", ["event_id"]).count()  # metadata-only
    out = windowed_agg(ds.map_batches(_cents, batch_format="pyarrow"),
                       "user_id", "ts", "event_id",
                       window_us=3_600_000_000, val_col="cents",
                       out_col="cents_hour", rows=rows).to_pandas()
    out = out.rename(columns={"id": "event_id"})
    out["event_id"] = out["event_id"].astype("int64")
    out["spend_last_hour"] = out["cents_hour"] / 100.0
    return out[["event_id", "spend_last_hour"]].sort_values(
        "event_id").reset_index(drop=True)


def q_user_first_event(sf_dir: str) -> pd.DataFrame:
    """Per-row FIRST_VALUE window (string payload): every event carries
    the event_type of its user's FIRST event — one sort + per-run firsts
    + O(blocks) driver carry (stages.window.first_value_within)."""
    from ..stages.window import first_value_within

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out = first_value_within(ds, "user_id", ["ts", "event_id"],
                             "event_type", out_col="first_type").to_pandas()
    out = out[["event_id", "first_type"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_user_last_event(sf_dir: str) -> pd.DataFrame:
    """Per-row LAST_VALUE over the FULL frame by composition:
    first_value_within over NEGATED order keys (last under (ts, id) =
    first under (-ts, -id)) — zero new operator code, same exchange."""
    from ..stages.window import first_value_within

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _neg(t: pa.Table) -> pa.Table:
        ts_i = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return t.append_column(
            "neg_ts", pc.negate_checked(ts_i)).append_column(
            "neg_id", pc.negate_checked(t["event_id"]))

    out = first_value_within(
        ds.map_batches(_neg, batch_format="pyarrow"),
        "user_id", ["neg_ts", "neg_id"], "event_type",
        out_col="last_type").to_pandas()
    out = out[["event_id", "last_type"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_contamination(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination census (LLM-pipeline extension): docs
    0–49 act as the held-out benchmark; every other document reports how
    many of its 5-gram positions appear in the benchmark's distinct
    5-gram set (pipelines.text.contamination_check — broadcast sorted
    hash set, corpus never shuffled)."""
    from .text import contamination_check

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], pa.scalar(50, pa.int64()))),
        batch_format="pyarrow")
    corpus = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"],
                                            pa.scalar(50, pa.int64()))),
        batch_format="pyarrow")
    out = contamination_check(corpus, bench, "doc_id", "text",
                              n=5).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_order_overlap_counts(sf_dir: str) -> pd.DataFrame:
    """INTERVAL OVERLAP self-join (count form): treating each order as
    the 30-day interval [orderdate, orderdate+30d], count per order the
    same-customer orders whose intervals overlap. Equal-length intervals
    overlap exactly when their starts are within 30 days of each other,
    so the whole query is ONE fused symmetric window count
    (stages.window.interval_overlap_counts — one sort exchange; the
    round-2 composition |start_b ≤ end_a| − |end_b < start_a| paid two
    range joins plus a merge join for the identical result)."""
    from ..stages.window import interval_overlap_counts

    day30 = 30 * 86_400_000_000

    def _us(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "t_us": pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                            pa.int64())})

    base = _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _us, batch_format="pyarrow")
    out = interval_overlap_counts(base, "o_custkey", "t_us", "o_orderkey",
                                  half_window_us=day30).to_pandas()
    out = out.rename(columns={"id": "o_orderkey"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_table_diff(sf_dir: str) -> pd.DataFrame:
    """DATASET-VERSION DIFF (training-data hygiene): compare two derived
    versions of orders — A drops every 7th key, B drops every 11th and
    doubles the price on every 13th — and census rows as
    added/removed/changed/same. One FULL OUTER sort-merge join on the
    key with exact-integer cents payloads on both sides; the
    classification is a vectorized per-block partial (4 counters), so
    the driver folds blocks×4 numbers, never rows."""
    from ..stages.merge_join import sorted_merge_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _version(drop_mod: int, double_mod: int | None, kc: str, cc: str):
        def _fn(t: pa.Table) -> pa.Table:
            k_np = t["o_orderkey"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(k_np % drop_mod != 0))
            k = t["o_orderkey"]
            c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
            if double_mod is not None:
                k_np = k.to_numpy(zero_copy_only=False)
                c = pc.if_else(pa.array(k_np % double_mod == 0),
                               pc.multiply(c, pa.scalar(2, pa.int64())), c)
            return pa.table({kc: k, cc: c})
        return _fn

    a = orders.map_batches(_version(7, None, "ka", "ca"),
                           batch_format="pyarrow")
    b = orders.map_batches(_version(11, 13, "kb", "cb"),
                           batch_format="pyarrow")
    rows = _read(sf_dir, "orders", ["o_orderkey"]).count()
    j = sorted_merge_join(a, b, "ka", "kb", ["ka", "ca"], ["kb", "cb"],
                          rows_hint=rows * 2, how="full")

    def _census(t: pa.Table) -> pa.Table:
        a_null = pc.is_null(t["ka"]).to_numpy(zero_copy_only=False)
        b_null = pc.is_null(t["kb"]).to_numpy(zero_copy_only=False)
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        both = ~a_null & ~b_null
        changed = both & (ca != cb)
        return pa.table({
            "added": pa.array([int(a_null.sum())], pa.int64()),
            "removed": pa.array([int(b_null.sum())], pa.int64()),
            "changed": pa.array([int(changed.sum())], pa.int64()),
            "same": pa.array([int((both & ~changed).sum())], pa.int64())})

    parts = j.map_batches(_census, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    sums = parts.sum()
    out = pd.DataFrame({"status": ["added", "changed", "removed", "same"],
                        "n": [int(sums["added"]), int(sums["changed"]),
                              int(sums["removed"]), int(sums["same"])]})
    return out[out["n"] > 0].reset_index(drop=True)


def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL exact dedup (persistent hash index): ingest the
    document corpus in two waves (doc_id < 250, then the rest) into a
    fresh bucketed index; wave 2 dedups against wave 1 WITHOUT
    rescanning it. The union of kept ids equals the one-shot
    keep-first dedup (oracle: MIN(doc_id) per distinct text)."""
    import tempfile

    from .dedup import incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cut = pa.scalar(250, pa.int64())
    wave1 = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], cut)),
        batch_format="pyarrow")
    wave2 = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], cut)),
        batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="adp_dedup_idx_") as idx:
        k1, _ = incremental_exact_dedup(wave1, "doc_id", "text", idx,
                                        "wave1")
        k2, _ = incremental_exact_dedup(wave2, "doc_id", "text", idx,
                                        "wave2")
    keep = np.sort(np.concatenate(
        [k1["keep_id"].to_numpy(zero_copy_only=False),
         k2["keep_id"].to_numpy(zero_copy_only=False)]))
    return pd.DataFrame({"keep_id": pd.Series(keep, dtype="int64")})


def q_targeted_deletion(sf_dir: str) -> pd.DataFrame:
    """TARGETED DELETION (right-to-be-forgotten batch): every doc whose
    id is a multiple of 17 is tombstoned; the corpus is rewritten shard
    by shard through the resumable sink (sorted tombstone array
    broadcast once, searchsorted filter per shard, atomic per-file
    writes) and the surviving rows are read back for the oracle check."""
    import os
    import tempfile

    from ..sources.sink import delete_keys_from_shards

    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy(
        zero_copy_only=False)
    tomb = ids[ids % 17 == 0]
    with tempfile.TemporaryDirectory(prefix="adp_delete_") as out:
        delete_keys_from_shards([f"{sf_dir}/documents.parquet"], "doc_id",
                                tomb, out, columns=["doc_id", "n_chars"])
        files = [os.path.join(out, f) for f in sorted(os.listdir(out))
                 if f.endswith(".parquet")]
        kept = pa.concat_tables([pq.read_table(f) for f in files])
    out_df = kept.to_pandas()
    out_df["doc_id"] = out_df["doc_id"].astype("int64")
    out_df["n_chars"] = out_df["n_chars"].astype("int64")
    return out_df.sort_values("doc_id").reset_index(drop=True)


def _orders_cents(sf_dir: str):
    """orders with o_totalprice recast to exact integer cents — shared
    input of the cumulative/rolling window queries (integer accumulation
    makes the distributed prefix sums exact and association-free)."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        # half_towards_infinity (= half away from zero) matches DuckDB's
        # ROUND on doubles
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        return t.drop_columns(["o_totalprice"]).append_column("cents", c)

    return ds.map_batches(_cents, batch_format="pyarrow")


def q_window_counts_leading(sf_dir: str) -> pd.DataFrame:
    """LEADING time-range window (RANGE CURRENT ROW .. 1 HOUR FOLLOWING)
    by composition: windowed_count over NEGATED microsecond timestamps —
    a trailing window on -t is exactly a leading window on t, equal-ts
    peers included on both sides. Zero new operator code; the negated
    int64 column flows through the same sort exchange."""
    from ..stages.window import windowed_count

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _neg(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "neg_us": pc.multiply(us, pa.scalar(-1, pa.int64())),
                         "event_id": t["event_id"]})

    out = windowed_count(ds.map_batches(_neg, batch_format="pyarrow"),
                         "user_id", "neg_us", "event_id",
                         window_us=3_600_000_000).to_pandas()
    out = out.rename(columns={"id": "event_id", "n_window": "n_next_hour"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_running_spend(sf_dir: str) -> pd.DataFrame:
    """Per-customer running spend — ROWS-framed cumulative window (SQL
    ``SUM(...) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``, stages.window.running_sum)."""
    from ..stages.window import running_sum

    out = running_sum(_orders_cents(sf_dir), "o_custkey",
                      ["o_orderdate", "o_orderkey"],
                      "cents", out_col="run_cents")
    df = out.select_columns(["o_orderkey", "run_cents"]).to_pandas()
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q_rolling_spend(sf_dir: str) -> pd.DataFrame:
    """Per-customer trailing-7-order spend — ROWS-framed rolling window
    (SQL ``SUM/COUNT(*) OVER (... ROWS BETWEEN 6 PRECEDING AND CURRENT
    ROW)``, stages.window.rolling_sum_rows)."""
    from ..stages.window import rolling_sum_rows

    out = rolling_sum_rows(_orders_cents(sf_dir), "o_custkey",
                           ["o_orderdate", "o_orderkey"], "cents",
                           "o_orderkey", k=7).to_pandas()
    out = out.rename(columns={"id": "o_orderkey",
                              "roll_sum": "roll_cents"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_event_centered_sum(sf_dir: str) -> pd.DataFrame:
    """CENTERED window frame (ROWS 1 PRECEDING..1 FOLLOWING) by pure
    composition: centered = trailing₂(forward order) + trailing₂(
    reversed order) − own value — two rolling_sum_rows passes (the
    reversed leg rides negated order keys) merged on the row id, exact
    integer cents throughout. Zero new operator code."""
    from ..stages.merge_join import sorted_merge_join
    from ..stages.window import rolling_sum_rows

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        ts_i = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        cents = pc.fill_null(pc.cast(
            pc.round(pc.multiply(t["value"], 100.0),
                     round_mode="half_towards_infinity"), pa.int64()), 0)
        return pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                         "ts_i": ts_i,
                         "neg_ts": pc.negate_checked(ts_i),
                         "neg_id": pc.negate_checked(t["event_id"]),
                         "cents": cents})

    base = ds.map_batches(_prep, batch_format="pyarrow")
    fwd = rolling_sum_rows(base, "user_id", ["ts_i", "event_id"],
                           "cents", "event_id", k=2)
    bwd = rolling_sum_rows(base, "user_id", ["neg_ts", "neg_id"],
                           "cents", "event_id", k=2)
    rows = _read(sf_dir, "events", ["event_id"]).count()
    fwd = fwd.map_batches(
        lambda t: pa.table({"id": t["id"], "fsum": t["roll_sum"]}),
        batch_format="pyarrow")
    bwd = bwd.map_batches(
        lambda t: pa.table({"id_b": t["id"], "bsum": t["roll_sum"]}),
        batch_format="pyarrow")
    j1 = sorted_merge_join(fwd, bwd, "id", "id_b", ["id", "fsum"],
                           ["bsum"], rows_hint=rows * 2)
    own = base.map_batches(
        lambda t: pa.table({"id_o": t["event_id"], "own": t["cents"]}),
        batch_format="pyarrow")
    j2 = sorted_merge_join(j1, own, "id", "id_o", ["id", "fsum", "bsum"],
                           ["own"], rows_hint=rows * 2)

    def _final(t: pa.Table) -> pa.Table:
        c = pc.subtract(pc.add(t["fsum"], t["bsum"]), t["own"])
        return pa.table({"event_id": t["id"], "centered_cents": c})

    out = j2.map_batches(_final, batch_format="pyarrow").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["centered_spend"] = out["centered_cents"] / 100.0
    return out[["event_id", "centered_spend"]].sort_values(
        "event_id").reset_index(drop=True)


def q_funnel_view_purchase(sf_dir: str) -> pd.DataFrame:
    """CONVERSION FUNNEL by composition: users with a purchase within
    one hour AFTER a view — per view event, purchases in [t, t+1h)
    via ONE range_count_join; converted view events merge-join back to
    their user and the distinct-user exchange yields the funnel cohort.
    All existing operators, no driver row loops."""
    from ..stages.fast_ops import distinct_values
    from ..stages.merge_join import sorted_merge_join
    from ..stages.window import range_count_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def _typed(kind: str, cols):
        def _fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"],
                                     pa.scalar(kind))).select(cols)
        return _fn

    views = ev.map_batches(_typed("view", ["user_id", "ts", "event_id"]),
                           batch_format="pyarrow")
    buys = ev.map_batches(_typed("purchase", ["user_id", "ts"]),
                          batch_format="pyarrow")
    cnt = range_count_join(views, buys, "user_id", "user_id", "ts", "ts",
                           "event_id", window_us=3_600_000_000)
    conv = cnt.map_batches(
        lambda t: pa.table({"cid": t["id"].filter(
            pc.greater(t["n_range"], pa.scalar(0, pa.int64())))}),
        batch_format="pyarrow")
    rows = _read(sf_dir, "events", ["event_id"]).count()
    vmap = ev.map_batches(
        lambda t: pa.table({"vid": t["event_id"], "vuser": t["user_id"]}),
        batch_format="pyarrow")
    j = sorted_merge_join(conv, vmap, "cid", "vid", ["cid"], ["vuser"],
                          rows_hint=rows * 2)
    users = distinct_values(j.map_batches(
        lambda t: pa.table({"user_id": t["vuser"]}),
        batch_format="pyarrow"), "user_id").to_pandas()
    users["user_id"] = users["user_id"].astype("int64")
    return users.sort_values("user_id").reset_index(drop=True)


def q_order_rank(sf_dir: str) -> pd.DataFrame:
    """Tie-aware RANK within partition (window family): orders ranked
    by total price within their status — SQL RANK() twin
    (stages.window.rank_within; cross-block carry keeps a straddling
    value run's original rank)."""
    from ..stages.window import rank_within

    out = rank_within(_read(sf_dir, "orders",
                            ["o_orderstatus", "o_totalprice", "o_orderkey"]),
                      "o_orderstatus", "o_totalprice",
                      "o_orderkey").to_pandas()
    out = out.rename(columns={"id": "o_orderkey", "rank": "rnk"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_order_dense_rank(sf_dir: str) -> pd.DataFrame:
    """DENSE_RANK variant of q_order_rank (distinct-value numbering
    carried across blocks)."""
    from ..stages.window import rank_within

    out = rank_within(_read(sf_dir, "orders",
                            ["o_orderstatus", "o_totalprice", "o_orderkey"]),
                      "o_orderstatus", "o_totalprice", "o_orderkey",
                      dense=True).to_pandas()
    out = out.rename(columns={"id": "o_orderkey", "dense_rank": "rnk"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """List-column UNNEST aggregate: per-dimension mean over the
    embedding column — each batch collapses to one (dim, sum, n) partial
    via the zero-copy flat-buffer matrix gather (dedup._batch_vec_matrix,
    no row explosion ships anywhere), and the driver folds blocks × dim
    rows. The SQL twin UNNESTs WITH ORDINALITY."""
    from .dedup import _batch_vec_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        ids, mat = _batch_vec_matrix(t, "vec_id", "embedding")
        if ids is None:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "dim": pa.array(np.arange(1, mat.shape[1] + 1), pa.int64()),
            "s": pa.array(mat.sum(axis=0, dtype=np.float64), pa.float64()),
            "n": pa.array(np.full(mat.shape[1], mat.shape[0], np.int64)),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dim", as_index=False).sum()
    out = pd.DataFrame({"dim": agg["dim"].astype("int64"),
                        "mean_val": (agg["s"] / agg["n"]).round(6)})
    return out.sort_values("dim").reset_index(drop=True)


def q_props_json_sum(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction (§2.8): pull the integer field ``k``
    out of the JSON ``props`` column with the VECTORIZED Arrow regex
    kernel (pc.extract_regex — no per-row json.loads) and aggregate per
    event type; DuckDB's json_extract is the twin. The regex path is the
    scale-correct shape for fixed-schema extraction; a full JSON parse
    belongs in an actor stage only when the schema is dynamic."""
    from ..stages.fast_ops import sorted_groupby
    import ray.data as rd

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def _extract(t: pa.Table) -> pa.Table:
        hit = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<val>-?\d+)')
        val = pc.cast(pc.struct_field(hit, "val"), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "k": pc.fill_null(val, 0),
                         "has_k": pc.cast(val.is_valid(), pa.int64())})

    ex = ds.map_batches(_extract, batch_format="pyarrow")
    inner, edge = sorted_groupby(ex, ["event_type"],
                                 [("k", "sum", "sum_k"),
                                  ("has_k", "sum", "n_with_k")])
    out = inner
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge))
    df = out.to_pandas()
    for c in ("sum_k", "n_with_k"):
        df[c] = df[c].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


def q_events_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(day, event_type) — the multi-level aggregate
    computed from ONE exchange: the finest (day, type) counts come from
    the distributed sorted_groupby; the (day) and grand-total levels are
    derived from those partials with an arrow group_by on the already-
    aggregated result (days × types rows — ~10^5 at 100 TB, never the
    data), so no second scan and no second shuffle."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _day(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"day": day, "event_type": t["event_type"]})

    inner, edge = sorted_groupby(ds.map_batches(_day, batch_format="pyarrow"),
                                 ["day", "event_type"],
                                 [(None, "count_all", "n")])
    fine = inner.to_pandas()
    if edge is not None and edge.num_rows:
        fine = pd.concat([fine, edge.to_pandas()], ignore_index=True)
    per_day = fine.groupby("day", as_index=False)["n"].sum()
    per_day["event_type"] = pd.Series([None] * len(per_day), dtype=object)
    total = pd.DataFrame({"day": pd.Series([pd.NaT],
                                           dtype=fine["day"].dtype),
                          "event_type": pd.Series([None], dtype=object),
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, per_day[["day", "event_type", "n"]], total],
                    ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["day", "event_type"],
                           na_position="last").reset_index(drop=True)


def q_events_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(day, event_type) — all four grouping levels from
    the SAME single exchange as the ROLLUP: fine (day, type) counts via
    distributed sorted_groupby, then (day), (type) and grand-total
    levels derived from the aggregated partials on the driver (never a
    second scan of the data)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _day(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"day": day, "event_type": t["event_type"]})

    inner, edge = sorted_groupby(ds.map_batches(_day, batch_format="pyarrow"),
                                 ["day", "event_type"],
                                 [(None, "count_all", "n")])
    fine = inner.to_pandas()
    if edge is not None and edge.num_rows:
        fine = pd.concat([fine, edge.to_pandas()], ignore_index=True)
    per_day = fine.groupby("day", as_index=False)["n"].sum()
    per_day["event_type"] = pd.Series([None] * len(per_day), dtype=object)
    per_type = fine.groupby("event_type", as_index=False)["n"].sum()
    per_type["day"] = pd.Series([pd.NaT] * len(per_type),
                                dtype=fine["day"].dtype)
    total = pd.DataFrame({"day": pd.Series([pd.NaT],
                                           dtype=fine["day"].dtype),
                          "event_type": pd.Series([None], dtype=object),
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, per_day[["day", "event_type", "n"]],
                     per_type[["day", "event_type", "n"]], total],
                    ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["day", "event_type"],
                           na_position="last").reset_index(drop=True)


def q_keys_union(sf_dir: str) -> pd.DataFrame:
    """Set op UNION (distinct) by composition: all keys appearing as an
    order customer OR an event user — Dataset.union of the two key
    columns, then ONE distinct exchange (fast_ops.distinct_values)."""
    from ..stages.fast_ops import distinct_values

    o = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
    e = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
    out = distinct_values(o.union(e), "k").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def q_order_percent_rank(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK in exact integer micro-units: (rank-1)*10^6 //
    (n-1), avoiding the float-division rounding coin-flip entirely —
    rank_within(include_size=True) carries each row's full partition
    size via the same O(blocks) driver scan."""
    from ..stages.window import rank_within

    out = rank_within(_read(sf_dir, "orders",
                            ["o_orderstatus", "o_totalprice",
                             "o_orderkey"]),
                      "o_orderstatus", "o_totalprice", "o_orderkey",
                      include_size=True).to_pandas()
    rnk = out["rank"].to_numpy()
    n = out["part_n"].to_numpy()
    pr = np.where(n > 1, ((rnk - 1) * 1_000_000) // np.maximum(n - 1, 1), 0)
    res = pd.DataFrame({"o_orderkey": out["id"].astype("int64"),
                        "pr_micro": pr.astype("int64")})
    return res.sort_values("o_orderkey").reset_index(drop=True)


def q_events_hourly_dense(sf_dir: str) -> pd.DataFrame:
    """Gap-filled resample: hourly counts per event_type INCLUDING
    empty hours, zero-filled over the dense (hour × type) grid — SQL
    generate_series twin. The heavy count runs distributed
    (sorted_groupby over floor_temporal buckets); the dense grid is
    hours × categories — tiny by construction — so the fill itself is a
    driver-side left merge against the aggregated counts."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _bucket(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"h": h, "event_type": batch["event_type"]})

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow",
                              batch_size=131072)
    inner, edge = sorted_groupby(bucketed, ["h", "event_type"],
                                 [(None, "count_all", "n")])
    out = inner
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge))
    counts = out.to_pandas()
    counts["h"] = counts["h"].astype("datetime64[us]")
    hours = pd.date_range(counts["h"].min(), counts["h"].max(),
                          freq="h").astype("datetime64[us]")
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [hours, types], names=["h", "event_type"]).to_frame(index=False)
    dense = grid.merge(counts, on=["h", "event_type"], how="left")
    dense["n"] = dense["n"].fillna(0).astype("int64")
    return dense.sort_values(["h", "event_type"]).reset_index(drop=True)


def q_order_cume_dist(sf_dir: str) -> pd.DataFrame:
    """CUME_DIST in exact integer micro-units: rows-with-value ≤ mine
    per partition is n + 1 - RANK-under-DESC-order, so
    cd_micro = (n + 1 - rank_desc) * 10^6 // n — integer arithmetic
    end-to-end, no float-division parity risk (rank_within with
    descending=True + include_size)."""
    from ..stages.window import rank_within

    out = rank_within(_read(sf_dir, "orders",
                            ["o_orderstatus", "o_totalprice",
                             "o_orderkey"]),
                      "o_orderstatus", "o_totalprice", "o_orderkey",
                      include_size=True, descending=True).to_pandas()
    rnk = out["rank"].to_numpy()
    n = out["part_n"].to_numpy()
    cd = ((n + 1 - rnk) * 1_000_000) // n
    res = pd.DataFrame({"o_orderkey": out["id"].astype("int64"),
                        "cd_micro": cd.astype("int64")})
    return res.sort_values("o_orderkey").reset_index(drop=True)


_ROLLUP_ALL = "\x7f~ALL~"  # sort-exchange sentinel for rolled-up keys


def q_rollup_counts(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — counts + exact-cents
    revenue at all THREE aggregation levels through ONE exchange: the
    per-batch partial emits every level (rolled keys as a sentinel so
    null keys never enter the sort), one sorted_groupby sums them, the
    final map restores NULLs. A naive rollup pays one groupby per level;
    this pays one total."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k1": pa.array([], pa.string()),
                             "k2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        base = pa.table({"k1": t["l_returnflag"], "k2": t["l_linestatus"],
                         "cents": cents}).group_by(["k1", "k2"]).aggregate(
            [("cents", "sum"), ([], "count_all")]).rename_columns(
            ["k1", "k2", "cents", "n"])
        k1 = base["k1"]
        lvl1 = pa.table({"k1": k1,
                         "k2": pa.array([_ROLLUP_ALL] * base.num_rows),
                         "cents": base["cents"], "n": base["n"]}
                        ).group_by(["k1", "k2"]).aggregate(
            [("cents", "sum"), ("n", "sum")]).rename_columns(
            ["k1", "k2", "cents", "n"])
        lvl2 = pa.table({
            "k1": pa.array([_ROLLUP_ALL]), "k2": pa.array([_ROLLUP_ALL]),
            "cents": pa.array([pc.sum(base["cents"]).as_py() or 0],
                              pa.int64()),
            "n": pa.array([int(t.num_rows)], pa.int64())})
        cols = ["k1", "k2", "n", "cents"]
        return pa.concat_tables([base.select(cols), lvl1.select(cols),
                                 lvl2.select(cols)])

    pre = _read(sf_dir, "lineitem",
                ["l_returnflag", "l_linestatus", "l_extendedprice"]
                ).map_batches(_partial, batch_format="pyarrow")
    inner, edge = sorted_groupby(pre, ["k1", "k2"],
                                 [("n", "sum", "n"),
                                  ("cents", "sum", "cents")])
    both = inner
    if edge is not None and edge.num_rows:
        both = both.union(rd.from_arrow(edge))
    out = both.to_pandas()
    out["revenue"] = (out["cents"] / 100.0).round(2)
    out["l_returnflag"] = out["k1"].replace({_ROLLUP_ALL: None})
    out["l_linestatus"] = out["k2"].replace({_ROLLUP_ALL: None})
    out = out[["l_returnflag", "l_linestatus", "n", "revenue"]]
    return (out.sort_values(["l_returnflag", "l_linestatus"],
                            na_position="last")
            .reset_index(drop=True).astype({"n": "int64"}))


def q_order_quartile_tiles(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) within partition (window family): orders bucketed into
    price quartiles per status — the driver's bounds scan supplies both
    the row-number carry AND the full size of edge-straddling partitions
    (NTILE hands remainder rows to leading buckets, so sizes must be
    exact; stages.window.ntile_within)."""
    from ..stages.window import ntile_within

    out = ntile_within(_read(sf_dir, "orders",
                             ["o_orderstatus", "o_totalprice",
                              "o_orderkey"]),
                       "o_orderstatus", ["o_totalprice", "o_orderkey"],
                       "o_orderkey", n_buckets=4).to_pandas()
    out = out.rename(columns={"id": "o_orderkey", "ntile": "tile"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_event_lag(sf_dir: str) -> pd.DataFrame:
    """Per-row LAG (window family): each event's PREVIOUS same-user
    event timestamp, null for a user's first event — SQL LAG() OVER
    twin (stages.window.lag_values; O(blocks) boundary stitch)."""
    from ..stages.window import lag_values

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"]})

    out = lag_values(ds.map_batches(_us, batch_format="pyarrow"),
                     "user_id", ["ts_us", "event_id"], "ts_us",
                     "event_id").to_pandas()
    out = out.rename(columns={"id": "event_id", "prev": "prev_us"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_event_lead(sf_dir: str) -> pd.DataFrame:
    """Per-row LEAD (window family): each event's NEXT same-user event
    timestamp, null for a user's last event — SQL LEAD() OVER twin.
    Implemented as LAG under the REVERSED order (one descending sort,
    same O(blocks) boundary stitch; stages.window.lag_values)."""
    from ..stages.window import lag_values

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"]})

    out = lag_values(ds.map_batches(_us, batch_format="pyarrow"),
                     "user_id", ["ts_us", "event_id"], "ts_us",
                     "event_id", descending=True).to_pandas()
    out = out.rename(columns={"id": "event_id", "prev": "next_us"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped argmax (SQL FIRST_VALUE / arg_max semantics): each
    user's latest event (max ts, ties to the smaller event_id) with its
    type — oracled via the deterministic ROW_NUMBER twin. Rides the
    grouped top-k exchange at k=1 (per-block head-of-run take, edge
    runs stitched in a ray task; stages.fast_ops.grouped_topk)."""
    from ..stages.fast_ops import grouped_topk

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    out = grouped_topk(ds, ["user_id"], "ts", 1,
                       payload_cols=["event_type"],
                       tie_cols=["event_id"]).to_pandas()
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out.sort_values("user_id").reset_index(drop=True)


def q_lineitem_measures_melt(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT/melt reshape: the four lineitem measures unpivoted to
    (measure, value) rows inside map tasks (pure vectorized reshape —
    no exchange for the melt itself), then a grouped sum/count per
    measure — SQL UNPIVOT twin."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = pa.concat_arrays(
            [pc.cast(batch[c], pa.float64()).combine_chunks() for c in cols])
        names = pa.concat_arrays(
            [pa.array([c] * n, pa.string()) for c in cols])
        return pa.table({"measure": names, "value": vals})

    melted = ds.map_batches(_melt, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(melted, ["measure"],
                                 [("value", "sum", "sum_v"),
                                  (None, "count_all", "n")])
    out = inner
    if edge is not None and edge.num_rows:
        out = out.union(rd.from_arrow(edge))
    df = out.to_pandas()
    df["sum_v"] = df["sum_v"].round(2)
    df["n"] = df["n"].astype("int64")
    return df.sort_values("measure").reset_index(drop=True)


def q_rolling_max_spend(sf_dir: str) -> pd.DataFrame:
    """Trailing-7-order MAX spend per customer — the MIN/MAX rolling
    frame kernel (per-run sliding-window view + prefix extrema;
    stages.window.rolling_agg_rows(agg='max'))."""
    from ..stages.window import rolling_agg_rows

    out = rolling_agg_rows(_orders_cents(sf_dir), "o_custkey",
                           ["o_orderdate", "o_orderkey"], "cents",
                           "o_orderkey", k=7, agg="max").to_pandas()
    out = out.rename(columns={"id": "o_orderkey",
                              "roll_max": "max_cents"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_events_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Daily event-type crosstab — pivot COUNT (§2.6 extension,
    fast_ops.pivoted_counts): one row per day, one count column per
    event type, the COUNT(*) FILTER (WHERE ...) twin."""
    from ..stages.fast_ops import pivoted_counts

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _day(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"day": day, "event_type": t["event_type"]})

    ds = ds.map_batches(_day, batch_format="pyarrow")
    cats = ["click", "error", "purchase", "signup", "view"]
    out = pivoted_counts(ds, ["day"], "event_type", cats).to_pandas()
    return out.sort_values("day").reset_index(drop=True)


def q_asof_last_event(sf_dir: str) -> pd.DataFrame:
    """As-of join (§2 custom operator): for each order, the latest event
    of the same customer/user at or before the order date — sort-based
    distributed as-of with driver carry stitching (stages.asof)."""
    from ..stages.asof import asof_join_latest

    out = asof_join_latest(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "events", ["user_id", "ts"]),
        left_key="o_custkey", right_key="user_id",
        left_time="o_orderdate", right_time="ts", left_id="o_orderkey",
    ).to_pandas()
    out = out.rename(columns={"lid": "o_orderkey", "asof_ts": "last_event_ts"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_asof_next_event(sf_dir: str) -> pd.DataFrame:
    """FORWARD as-of join: for each order, the earliest event of the
    same customer/user at or after the order date — backward as-of
    machinery reused through time negation (stages.asof.asof_join_next);
    same one-sort/carry-stitch scale shape."""
    from ..stages.asof import asof_join_next

    out = asof_join_next(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "events", ["user_id", "ts"]),
        left_key="o_custkey", right_key="user_id",
        left_time="o_orderdate", right_time="ts", left_id="o_orderkey",
    ).to_pandas()
    out = out.rename(columns={"lid": "o_orderkey",
                              "asof_ts": "next_event_ts"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_range_join_counts(sf_dir: str) -> pd.DataFrame:
    """Range join (§2 custom operator): per order, the number of events
    of the same customer/user within 7 days from the order date —
    sort-based distributed interval-count (stages.window.range_count_join)."""
    from ..stages.window import range_count_join

    out = range_count_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "events", ["user_id", "ts"]),
        left_key="o_custkey", right_key="user_id",
        left_time="o_orderdate", right_time="ts", left_id="o_orderkey",
        window_us=7 * 86400 * 1_000_000,
    ).to_pandas()
    out = out.rename(columns={"id": "o_orderkey", "n_range": "n_week"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["n_week"] = out["n_week"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_user_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event gap stats (SQL LAG window twin): n_events +
    max gap in microseconds for users with >= 2 events — sort + interior
    runs finalized in block tasks + O(blocks) boundary-fragment carry
    (stages.window.session_gap_stats)."""
    from ..stages.window import session_gap_stats

    out = session_gap_stats(_read(sf_dir, "events",
                                  ["user_id", "ts", "event_id"]),
                            "user_id", "ts", "event_id").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["max_gap_us"] = out["max_gap_us"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Per-user sessionization under a 30-minute inactivity gap (the
    event-pipeline primitive; SQL twin = LAG + CASE new-session flag +
    SUM): sort + interior runs finalized in block tasks + O(blocks)
    boundary-fragment carry (stages.window.sessionize)."""
    from ..stages.window import sessionize

    out = sessionize(_read(sf_dir, "events",
                           ["user_id", "ts", "event_id"]),
                     "user_id", "ts", "event_id",
                     gap_us=1_800_000_000).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_docs_stats(sf_dir: str) -> pd.DataFrame:
    """Single-row document-table census from the profile pass."""
    from .profile import profile_dataset

    prof = profile_dataset(_read(sf_dir, "documents", ["text", "lang"]))
    text = prof.columns["text"].finalize()
    lang = prof.columns["lang"].finalize()
    return pd.DataFrame(
        [
            {
                "n_docs": text["total"],
                "null_text": text["null_count"],
                "blank_text": text["blank_count"],
                "distinct_langs": lang["distinct_count"],
                "max_text_len": text["max_length"],
            }
        ]
    )


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keep-first: min doc_id per distinct text (hash
    partition on content, per-group first — SURVEY.md §2.7)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.groupby("text").min("doc_id").to_pandas()
    out = out.rename(columns={"min(doc_id)": "doc_id"})[["doc_id"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_docs_tokens(sf_dir: str) -> pd.DataFrame:
    """Per-doc token/char counts (token counting — whitespace tokens),
    vectorized pandas str ops inside map_batches."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "token_count": df["text"].str.count(r"\S+").fillna(0).astype("int64"),
                "char_count": df["text"].str.len().fillna(0).astype("int64"),
            }
        )

    return ds.map_batches(_tok, batch_format="pandas")


def q_doc_packing(sf_dir: str) -> pd.DataFrame:
    """GPT-style concat-and-chunk sequence packing (training-data op):
    documents in doc_id order are conceptually concatenated and split
    into fixed 2048-token packs; each doc reports the packs its tokens
    land in — pack_first = (cum - n) // B and pack_last = (cum - 1) // B
    over the GLOBAL running token sum (stages.window.running_sum with a
    constant partition: the O(blocks) driver carry chains through every
    block while the blocks themselves number in parallel)."""
    from ..stages.window import running_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _tok(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.fill_null(
            pc.count_substring_regex(t["text"], pattern=r"\S+"), 0),
            pa.int64())
        return pa.table({
            "part": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": n,
        })

    toks = ds.map_batches(_tok, batch_format="pyarrow")
    rs = running_sum(toks, "part", ["doc_id"], "n_tokens", out_col="cum")

    def _packs(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy()
        n = t["n_tokens"].to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "pack_first": pa.array((cum - n) // 2048, pa.int64()),
            "pack_last": pa.array((cum - 1) // 2048, pa.int64()),
        })

    out = rs.map_batches(_packs, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# correlation


def _merged_gram_state(sf_dir: str, cols: list, batch_size: int = 65536):
    """Lineitem Gram partials via the shared pipelines.profile.gram_state
    (distributed tree merge; see its docstring for the scale notes)."""
    from .profile import gram_state

    return gram_state(_read(sf_dir, "lineitem", cols), cols,
                      batch_size=batch_size)


def q_corr_lineitem(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation of numeric lineitem pairs from streaming
    Gram-matrix partials (A17, Profiler.py:1019-1028), tree-merged."""
    cols = LINEITEM_NUMERIC
    st = _merged_gram_state(sf_dir, cols, batch_size=16384)
    corr = st.corr_matrix()
    rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                rows.append({"col_x": a, "col_y": b, "corr": round(float(corr[i, j]), 6)})
    return pd.DataFrame(rows)


def q_corpus_prep(sf_dir: str) -> pd.DataFrame:
    """END-TO-END CORPUS PREPARATION composite — the LLM-training data
    path as ONE streaming pipeline: quality gate (≥5 tokens, the
    reference's is_valid_text rule) → exact keep-first dedup (content
    hash through one grouped exchange; the token count rides the
    exchange as a hash-functional payload, so no join-back) → global
    concat-and-chunk packing into 512-token sequences (running_sum
    carry chain). Each stage is an oracle-green operator; this query
    checks their COMPOSITION against one SQL twin."""
    import ray.data as rd

    from ..functions.hashing import hash_strings
    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import running_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _gate(t: pa.Table) -> pa.Table:
        t = t.filter(t["text"].is_valid())
        n = pc.cast(pc.count_substring_regex(t["text"], pattern=r"\S+"),
                    pa.int64())
        t = t.append_column("n_tokens", n)
        t = t.filter(pc.greater_equal(n, pa.scalar(5, pa.int64())))
        h = hash_strings(t["text"].to_numpy(zero_copy_only=False))
        return pa.table({"h": pa.array(h.view(np.int64)),
                         "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_tokens": t["n_tokens"]})

    gated = ds.map_batches(_gate, batch_format="pyarrow",
                           batch_size=131072)
    # keep-first per content; n_tokens is hash-functional so min = its value
    inner, edge = sorted_groupby(
        gated, ["h"], [("doc_id", "min", "doc_id"),
                       ("n_tokens", "min", "n_tokens")])
    kept = inner.map_batches(
        lambda t: t.append_column(
            "part", pa.array(np.zeros(t.num_rows, np.int64))).drop(["h"]),
        batch_format="pyarrow")
    if edge is not None and edge.num_rows:
        et = edge.select(["doc_id", "n_tokens"]).append_column(
            "part", pa.array(np.zeros(edge.num_rows, np.int64)))
        kept = kept.union(rd.from_arrow(et))
    rs = running_sum(kept, "part", ["doc_id"], "n_tokens", out_col="cum")

    B = pa.scalar(512, pa.int64())

    def _packs(t: pa.Table) -> pa.Table:
        first = pc.divide(pc.subtract(t["cum"], t["n_tokens"]), B)
        last = pc.divide(pc.subtract(t["cum"], pa.scalar(1, pa.int64())), B)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
                         "pack_first": first, "pack_last": last})

    out = rs.map_batches(_packs, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _grouped_xy_moments(sf_dir: str, table: str, g: str, x: str, y: str):
    """Shared partial builder for the grouped bivariate family (Pearson
    correlation, OLS regression): per-batch per-group algebraic partials
    (n, Σx, Σy, Σx², Σy², Σxy) via one arrow group_by, ONE sorted_groupby
    sum exchange — the data never reaches the driver, only one 6-number
    partial per (group, block) enters the exchange. Pairwise-complete
    semantics (rows with either value null drop), matching SQL CORR /
    REGR_*. Returns the merged moments as a small pandas frame."""
    from ..stages.fast_ops import sorted_groupby

    def _partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(batch[x].is_valid(), batch[y].is_valid())
        sub = batch.filter(keep)
        xa = pc.cast(sub[x], pa.float64())
        ya = pc.cast(sub[y], pa.float64())
        t = pa.table({g: sub[g], "sx": xa, "sy": ya,
                      "sxx": pc.multiply(xa, xa),
                      "syy": pc.multiply(ya, ya),
                      "sxy": pc.multiply(xa, ya)})
        out = t.group_by([g], use_threads=False).aggregate(
            [([], "count_all"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return out.rename_columns(
            [("n" if c == "count_all" else c.removesuffix("_sum"))
             for c in out.column_names]
        ).select([g, "n", "sx", "sy", "sxx", "syy", "sxy"])

    pre = _read(sf_dir, table, [g, x, y]).map_batches(
        _partial, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(
        pre, [g], [("n", "sum", "n"), ("sx", "sum", "sx"),
                   ("sy", "sum", "sy"), ("sxx", "sum", "sxx"),
                   ("syy", "sum", "syy"), ("sxy", "sum", "sxy")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out = out.sort_values(g).reset_index(drop=True)
    # derive the shared scale-free moments both finalizers consume
    n = out["n"].to_numpy().astype(np.float64)
    sx = out["sx"].to_numpy()
    sy = out["sy"].to_numpy()
    out["cov"] = n * out["sxy"].to_numpy() - sx * sy
    out["vx"] = n * out["sxx"].to_numpy() - sx * sx
    out["vy"] = n * out["syy"].to_numpy() - sy * sy
    return out


def q_corr_by_returnflag(sf_dir: str) -> pd.DataFrame:
    """GROUPED Pearson correlation (CORR ... GROUP BY twin) finalized
    from the shared moment partials (one exchange, driver sees one row
    per group)."""
    x, y, g = "l_quantity", "l_extendedprice", "l_returnflag"
    t = _grouped_xy_moments(sf_dir, "lineitem", g, x, y)
    denom = np.sqrt(np.maximum(t["vx"].to_numpy(), 0.0)
                    * np.maximum(t["vy"].to_numpy(), 0.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where(denom > 0, t["cov"].to_numpy() / denom, np.nan)
    return pd.DataFrame({g: t[g], "corr": np.round(r, 6)})


def q_regr_by_flag(sf_dir: str) -> pd.DataFrame:
    """GROUPED OLS simple regression (price ~ quantity per return flag):
    slope / intercept / r² finalized from the SAME shared moment
    partials as the grouped correlation — REGR_SLOPE / REGR_INTERCEPT /
    REGR_R2 / REGR_COUNT twins (pairwise-complete n), one exchange, one
    6-number partial per (group, block). r² follows REGR_R2's
    convention: constant-y over varying x is a perfect fit (1.0)."""
    x, y, g = "l_quantity", "l_extendedprice", "l_returnflag"
    t = _grouped_xy_moments(sf_dir, "lineitem", g, x, y)
    n = t["n"].to_numpy().astype(np.float64)
    cov, vx, vy = (t[c].to_numpy() for c in ("cov", "vx", "vy"))
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(vx > 0, cov / vx, np.nan)
        intercept = (t["sy"].to_numpy() / n
                     - slope * (t["sx"].to_numpy() / n))
        r2 = np.where(vx > 0,
                      np.where(vy > 0, (cov * cov) / (vx * vy), 1.0),
                      np.nan)
    return pd.DataFrame({g: t[g], "n": t["n"].astype("int64"),
                         "slope": np.round(slope, 6),
                         "intercept": np.round(intercept, 6),
                         "r2": np.round(r2, 6)})


def q_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Grouped IQR (Tukey fence) outlier census: pass 1 computes exact
    per-group quartiles via the distributed value-counts exchange
    (grouped_quantiles), the tiny (group → fence) table broadcasts into
    pass 2's per-batch vectorized counts. Two scans, no row ever leaves
    its block."""
    from ..stages.fast_ops import grouped_quantiles

    g, v = "l_returnflag", "l_extendedprice"
    li = _read(sf_dir, "lineitem", [g, v])
    qt = grouped_quantiles(li, g, v, [0.25, 0.75], ["q1", "q3"])
    q1 = dict(zip(qt[g].to_pylist(), qt["q1"].to_pylist()))
    q3 = dict(zip(qt[g].to_pylist(), qt["q3"].to_pylist()))
    lo = {k: q1[k] - 1.5 * (q3[k] - q1[k]) for k in q1}
    hi = {k: q3[k] + 1.5 * (q3[k] - q1[k]) for k in q1}

    def _count(batch: pa.Table) -> pa.Table:
        ga = batch[g].to_numpy(zero_copy_only=False)
        va = batch[v].to_numpy(zero_copy_only=False)
        # vectorized fence lookup: per-UNIQUE-group dict access, then one
        # fancy index — no per-row Python in the hot path
        uniq, inv = np.unique(ga, return_inverse=True)
        lo_a = np.array([lo.get(k, -np.inf) for k in uniq])[inv]
        hi_a = np.array([hi.get(k, np.inf) for k in uniq])[inv]
        out_mask = (va < lo_a) | (va > hi_a)
        t = pa.table({g: batch[g],
                      "outliers": pa.array(out_mask.astype(np.int64)),
                      "n_rows": pa.array(np.ones(len(ga), np.int64))})
        r = t.group_by([g], use_threads=False).aggregate(
            [("outliers", "sum"), ("n_rows", "sum")])
        return r.rename_columns(
            [c.removesuffix("_sum") for c in r.column_names]
        ).select([g, "outliers", "n_rows"])

    parts = li.map_batches(_count, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = parts.groupby(g, as_index=False)[["outliers", "n_rows"]].sum()
    qdf = qt.to_pandas()
    out = out.merge(qdf, on=g)
    for c in ("outliers", "n_rows"):
        out[c] = out[c].astype("int64")
    for c in ("q1", "q3"):
        out[c] = out[c].round(6)
    return out[[g, "q1", "q3", "outliers", "n_rows"]].sort_values(
        g).reset_index(drop=True)


def q_price_p90_disc(sf_dir: str) -> pd.DataFrame:
    """PERCENTILE_DISC per group (discrete quantile — the actual
    order-statistic value, never interpolated): p50/p90 of extended
    price per return flag via the same distributed value-counts
    exchange as the CONT path (grouped_quantiles(disc=True))."""
    from ..stages.fast_ops import grouped_quantiles

    t = grouped_quantiles(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]),
        "l_returnflag", "l_extendedprice", [0.5, 0.9], ["p50", "p90"],
        disc=True)
    out = t.to_pandas()
    out["p50"] = out["p50"].round(2)
    out["p90"] = out["p90"].round(2)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_weighted_avg_discount(sf_dir: str) -> pd.DataFrame:
    """GROUPED WEIGHTED AVERAGE (price-weighted mean discount per return
    flag): both the numerator Σ(w·x) and denominator Σw accumulate as
    exact int64 (cents × discount-bp products), ONE sorted_groupby
    exchange, and the single float division per group happens over the
    two exact integers — so the double is bit-identical to the SQL
    twin's."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    g = "l_returnflag"

    def _partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        bp = pc.cast(pc.round(pc.multiply(batch["l_discount"], 10000.0),
                              round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({g: batch[g], "wx": pc.multiply(cents, bp),
                      "w": cents})
        out = t.group_by([g], use_threads=False).aggregate(
            [("wx", "sum"), ("w", "sum")])
        return out.rename_columns(
            [c.removesuffix("_sum") for c in out.column_names]
        ).select([g, "wx", "w"])

    pre = _read(sf_dir, "lineitem",
                [g, "l_extendedprice", "l_discount"]).map_batches(
        _partial, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, [g], [("wx", "sum", "wx"),
                                            ("w", "sum", "w")])

    def _finalize(t: pa.Table) -> pa.Table:
        wx = t["wx"].to_numpy().astype(np.float64)
        w = t["w"].to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(w != 0, wx / w / 10000.0, np.nan)
        return pa.table({g: t[g],
                         "wavg_discount": pa.array(np.round(avg, 9),
                                                   pa.float64())})

    res = inner.map_batches(_finalize, batch_format="pyarrow",
                            batch_size=None)
    if edge is not None and edge.num_rows:
        res = res.union(rd.from_arrow(_finalize(edge)))
    return res.to_pandas().sort_values(g).reset_index(drop=True)


def q_mad_by_flag(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per group — two exact grouped-median
    passes (distributed value counts): pass 1 per-group median, the
    tiny (group → median) map broadcasts into pass 2's derived
    |x − median_g| column, whose grouped median is the MAD. Robust
    dispersion for the profile surface; both passes are the oracle-green
    grouped_median machinery."""
    from ..stages.fast_ops import grouped_median

    g, v = "l_returnflag", "l_quantity"
    li = _read(sf_dir, "lineitem", [g, v])
    med = grouped_median(li, g, v)
    m_of = dict(zip(med[g].to_pylist(), med["median"].to_pylist()))

    def _absdev(batch: pa.Table) -> pa.Table:
        ga = batch[g].to_numpy(zero_copy_only=False)
        va = batch[v].to_numpy(zero_copy_only=False).astype(np.float64)
        # vectorized median lookup; a group absent from the median table
        # (all-null values) passes through as NaN and is dropped below,
        # matching the SQL twin's inner join on the median CTE
        uniq, inv = np.unique(ga, return_inverse=True)
        ma = np.array([m_of.get(k, np.nan) for k in uniq])[inv]
        dev = np.abs(va - ma)
        keep = ~np.isnan(dev)
        return pa.table({g: batch[g].filter(pa.array(keep)),
                         "absdev": pa.array(dev[keep], pa.float64())})

    dev = li.map_batches(_absdev, batch_format="pyarrow", batch_size=131072)
    mad = grouped_median(dev, g, "absdev").to_pandas()
    mad = mad.rename(columns={"median": "mad"})
    med_df = med.to_pandas()
    out = med_df.merge(mad, on=g)
    out["median"] = out["median"].round(6)
    out["mad"] = out["mad"].round(6)
    return out.sort_values(g).reset_index(drop=True)


# ---------------------------------------------------------------------------
# higher moments / outliers / decimal places / date parts / sort


def q_moments(sf_dir: str) -> pd.DataFrame:
    """Sample-adjusted skewness/kurtosis per numeric column from streaming
    M1..M4 partials (A10, Profiler.py:725-726; bias corrections match
    pandas and DuckDB)."""
    from .profile import profile_dataset
    from ..stages.profile_partial import ProfileConfig

    prof = profile_dataset(
        _read(sf_dir, "lineitem", LINEITEM_NUMERIC),
        ProfileConfig(columns=LINEITEM_NUMERIC),
    )
    rows = []
    for name in LINEITEM_NUMERIC:
        m = prof.columns[name].moments
        rows.append(
            {"column": name, "skew": round(m.skew(), 6),
             "kurt": round(m.kurtosis(), 6)}
        )
    return pd.DataFrame(rows)


def q_outlier_pct(sf_dir: str) -> pd.DataFrame:
    """Two-pass z-score outlier share (A11, Profiler.py:359-362,727):
    pass 1 merged moments → broadcast (mu, sigma); pass 2 vectorized
    |x-mu|/sigma > 3 count."""
    from .profile import profile_dataset
    from ..stages.profile_partial import ProfileConfig

    cols = LINEITEM_NUMERIC
    prof = profile_dataset(_read(sf_dir, "lineitem", cols),
                           ProfileConfig(columns=cols, sketches=False))
    stats = {c: (prof.columns[c].moments.avg, prof.columns[c].moments.std())
             for c in cols}

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for c in cols:
            mu, sd = stats[c]
            z = (df[c] - mu).abs() / sd
            row[c] = int((z > 3).sum())
        row["__n"] = len(df)
        return pd.DataFrame([row])

    parts = _read(sf_dir, "lineitem", cols).map_batches(
        _count, batch_format="pandas", batch_size=65536
    ).to_pandas().sum()
    n = parts["__n"]
    return pd.DataFrame(
        [{"column": c, "outlier_pct": round(100.0 * parts[c] / n, 6)} for c in cols]
    )


def q_decimal_places(sf_dir: str) -> pd.DataFrame:
    """Max decimal places per float column (A13, Profiler.py:584-588)."""
    from .profile import profile_dataset
    from ..stages.profile_partial import ProfileConfig

    cols = ["l_extendedprice", "l_discount", "l_tax"]
    prof = profile_dataset(_read(sf_dir, "lineitem", cols), ProfileConfig(columns=cols))
    return pd.DataFrame(
        [
            {"column": c, "max_decimal_places": prof.columns[c].maxlen.max_decimal_places}
            for c in cols
        ]
    )


def q_median_qty_by_flag(sf_dir: str) -> pd.DataFrame:
    """EXACT interpolated median per group (PERCENTILE_CONT(0.5) twin)
    from distributed value counts — the exact path the profile's
    t-digest approximates (A8 with an oracle). fast_ops.grouped_median:
    one (g, v) exchange, interior g-runs compute in block tasks."""
    from ..stages.fast_ops import grouped_median

    out = grouped_median(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]),
        "l_returnflag", "l_quantity",
    ).to_pandas()
    out["median_qty"] = out["median"].round(6)
    return out[["l_returnflag", "median_qty"]]


def q_qty_quartiles_by_status(sf_dir: str) -> pd.DataFrame:
    """EXACT per-group quartiles (PERCENTILE_CONT twin at 0.25/0.5/0.75)
    from ONE distributed value-counts pass — grouped_quantiles computes
    every requested quantile per interior g-run inside block tasks."""
    from ..stages.fast_ops import grouped_quantiles

    out = grouped_quantiles(
        _read(sf_dir, "lineitem", ["l_linestatus", "l_quantity"]),
        "l_linestatus", "l_quantity", [0.25, 0.5, 0.75],
        ["p25", "p50", "p75"],
    ).to_pandas()
    for c in ("p25", "p50", "p75"):
        out[c] = out[c].round(6)
    return out


def q_shipdate_parts(sf_dir: str) -> pd.DataFrame:
    """Date-part histogram (A24, Profiler.py:780-794): counts by
    (year, month) of l_shipdate via per-batch pre-aggregation."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate"])

    def _parts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            [df["l_shipdate"].dt.year.rename("y"), df["l_shipdate"].dt.month.rename("m")]
        ).size().reset_index(name="n")
        return g

    parts = ds.map_batches(_parts, batch_format="pandas", batch_size=65536)
    out = parts.groupby(["y", "m"]).sum(["n"]).to_pandas()
    out = out.rename(columns={"sum(n)": "n"})
    out["y"] = out["y"].astype("int64")
    out["m"] = out["m"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_events_hour_hist(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day histogram of events.ts through the profile's
    DatePartCounts sketch (A24 full date-part coverage,
    Profiler.py:780-794) — exercises the same single-pass partial that
    feeds the report's six per-component count plots."""
    from .profile import profile_dataset
    from ..stages.profile_partial import ProfileConfig

    prof = profile_dataset(_read(sf_dir, "events", ["ts"]),
                           ProfileConfig(columns=["ts"]))
    hours = prof.columns["ts"].date_parts.finalize()["hour"]
    return pd.DataFrame(
        [{"hour": h, "n": n} for h, n in hours.items()]
    ).astype({"hour": "int64", "n": "int64"})


def q_top_orders_per_customer(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (§2.6): each customer's 2 highest-value orders —
    ONE sort exchange, per-block head-k on interior runs, O(blocks×k)
    edge stitch (fast_ops.grouped_topk); SQL ROW_NUMBER QUALIFY twin."""
    from ..stages.fast_ops import grouped_topk

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, ["o_custkey"], "o_totalprice", 2,
                       tie_cols=["o_orderkey"], rows_hint=ds.count()).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    out = out.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
    return out[["o_custkey", "o_totalprice", "o_orderkey"]].reset_index(drop=True)


def q_sample_sorted(sf_dir: str) -> pd.DataFrame:
    """Global sort + limit (§2.6: genuine global top-k path)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = ds.sort(["l_orderkey", "l_linenumber"]).limit(100).to_pandas()
    out["l_quantity"] = out["l_quantity"].round(2)
    return out


def q_pca_importance(sf_dir: str) -> pd.DataFrame:
    """PCA feature importance from the merged correlation partials (A18,
    Profiler.py:1033-1065) — eigendecomposition on the driver over the
    tree-merged Gram state, rows never leave the cluster unaggregated.
    Rows-only check (not SQL-expressible)."""
    st = _merged_gram_state(sf_dir, LINEITEM_NUMERIC)
    imp = st.pca_importance(n_components=4)
    return pd.DataFrame(
        sorted(({"column": c, "importance": round(v, 6)} for c, v in imp.items()),
               key=lambda r: -r["importance"])
    )


def q_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the value distribution per low-cardinality
    column (A16, Profiler.py:262-282): distributed groupby-count builds
    the (small) histogram, entropy folds on the driver."""
    specs = [
        ("orders", ["o_orderpriority"]),
        ("lineitem", ["l_returnflag", "l_linestatus"]),
        ("customer", ["c_mktsegment"]),
    ]
    ordered = ["o_orderpriority", "l_returnflag", "l_linestatus", "c_mktsegment"]
    hists: dict = {}
    for table, cols in specs:
        # one scan per table: per-batch value_counts for every requested
        # column at once, merged on the driver (low-cardinality histograms)
        def _partial(batch: pa.Table, cols=cols) -> pa.Table:
            vals, ns, cs = [], [], []
            for c in cols:
                col = batch[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                vc = pc.value_counts(col)
                vals.append(vc.field("values").cast(pa.string()))
                ns.append(vc.field("counts"))
                cs.extend([c] * len(vc))
            return pa.table({"column": pa.array(cs, pa.string()),
                             "value": pa.concat_arrays(vals),
                             "n": pa.concat_arrays(ns)})

        parts = _read(sf_dir, table, cols).map_batches(
            _partial, batch_format="pyarrow", batch_size=131072
        ).to_pandas()
        for c, grp in parts.groupby("column"):
            hists[c] = grp.groupby("value")["n"].sum()
    rows = []
    for col in ordered:
        p = hists[col].to_numpy(dtype=np.float64)
        p = p / p.sum()
        rows.append({"column": col,
                     "entropy": round(float(-(p * np.log2(p)).sum()), 6)})
    return pd.DataFrame(rows)


def q_priority_entropy_by_status(sf_dir: str) -> pd.DataFrame:
    """GROUPED Shannon entropy — the per-segment generalization of A16
    (Profiler.py:262-282): how mixed is the order-priority distribution
    within each order status. Distributed shape: per-batch grouped
    value counts fold to ≤|status×priority| partials per block
    (_status_priority_hist, shared with the HHI query), the driver
    merges the tiny histogram and finalizes entropy per group — no
    wide exchange, one scan."""
    hist = _status_priority_hist(sf_dir)
    rows = []
    for status, grp in hist.groupby("o_orderstatus"):
        # deterministic fold order (sorted by priority value) — the twin
        # sums ≤5 doubles whose order DuckDB leaves unspecified; at 6 dp
        # the ≤1 ulp spread is far inside the rounding step (the A16
        # precedent: the global `entropy` query, green since r02)
        grp = grp.sort_values("o_orderpriority")
        n = grp["n"].to_numpy(dtype=np.float64)
        p = n / n.sum()
        rows.append({"o_orderstatus": status,
                     "entropy_bits": round(float(-(p * np.log2(p)).sum()), 6),
                     "n_orders": int(n.sum())})
    out = pd.DataFrame(rows).sort_values("o_orderstatus").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_event_value_share(sf_dir: str) -> pd.DataFrame:
    """RATIO-TO-REPORT window: each (hour, event_type) cell's share of
    its hour's total value — ``SUM(x) OVER (PARTITION BY hour)`` as a
    composition of ONE grouped exchange (exact int64 cents) + a tiny
    driver-side per-hour total; the share divides two exact integers so
    the float is bit-identical to the twin's."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        vc = pc.cast(pc.round(pc.multiply(
            pc.coalesce(batch["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"hour": hour, "event_type": batch["event_type"],
                         "vc": vc})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["hour", "event_type"], [("vc", "sum", "cents")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    tot = out.groupby("hour")["cents"].transform("sum")
    out["cents"] = out["cents"].astype("int64")
    out["share"] = (out["cents"] / tot).round(6)
    return (out[["hour", "event_type", "cents", "share"]]
            .sort_values(["hour", "event_type"]).reset_index(drop=True))


def q_event_type_nearest(sf_dir: str) -> pd.DataFrame:
    """FUZZY DICTIONARY MATCH: each distinct event_type's nearest other
    distinct value by Levenshtein edit distance — the typo-repair /
    catalog-reconciliation op next to the referential checks (ST4).
    Distributed shape: the distinct domain extracts through per-batch
    uniques folded on the driver (a dictionary-sized domain by
    construction); the all-pairs DP runs driver-side over |domain|²
    pairs (functions.similarity.levenshtein, bit-exact vs DuckDB's)."""
    ds = _read(sf_dir, "events", ["event_type"])

    def _uniq(batch: pa.Table) -> pa.Table:
        col = batch["event_type"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"v": col.unique()})

    from ..functions.similarity import nearest_by_levenshtein

    vals = sorted(ds.map_batches(_uniq, batch_format="pyarrow",
                                 batch_size=131072).to_pandas()["v"].unique())
    if len(vals) < 2:  # twin's a.v <> b.v join is empty on one value
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "nearest": pd.Series([], dtype=object),
                             "dist": pd.Series([], dtype="int64")})
    nearest, dist = nearest_by_levenshtein(vals, vals)
    out = pd.DataFrame({"event_type": vals, "nearest": nearest,
                        "dist": dist})
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _status_priority_hist(sf_dir: str) -> pd.DataFrame:
    """Merged (o_orderstatus, o_orderpriority, n) histogram from ONE
    scan of per-block grouped partials (≤|status×priority| rows per
    block) — shared by the grouped entropy and HHI queries."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderstatus", "o_orderpriority"],
                           use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    return (parts.groupby(["o_orderstatus", "o_orderpriority"],
                          as_index=False)["n"].sum())


def q_priority_hhi_by_status(sf_dir: str) -> pd.DataFrame:
    """HERFINDAHL–HIRSCHMAN concentration index of the priority mix per
    order status — entropy's market-concentration sibling with an
    all-integer numerator (HHI = Σnᵢ²/N²), so the single final division
    is bit-identical to the twin. Shares _status_priority_hist's
    one-scan partial shape with the grouped entropy."""
    hist = _status_priority_hist(sf_dir)
    rows = []
    for status, grp in hist.groupby("o_orderstatus"):
        n = grp["n"].to_numpy(dtype=np.int64)
        tot = int(n.sum())
        rows.append({"o_orderstatus": status,
                     "hhi": round(int((n * n).sum()) / (tot * tot), 6),
                     "n_orders": tot})
    out = pd.DataFrame(rows).sort_values("o_orderstatus").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_peak_hour_per_type(sf_dir: str) -> pd.DataFrame:
    """ARGMAX OVER AN AGGREGATE: each event type's busiest hour (ties →
    earliest hour) — the aggregate-then-argmax composition: one grouped
    exchange builds the (type, hour) series; grouped_topk (k=1, count
    DESC, hour ASC) selects without materializing the series on the
    driver."""
    import ray.data as rd

    from ..stages.fast_ops import grouped_topk, sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": batch["event_type"], "hour": hour})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [(None, "count_all", "n")])
    series = inner
    if edge is not None and edge.num_rows:
        series = series.union(rd.from_arrow(edge))

    def _hour_us(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "hour_us": pc.cast(pc.cast(t["hour"],
                                                    pa.timestamp("us")),
                                            pa.int64()),
                         "n": pc.cast(t["n"], pa.int64())})

    top = grouped_topk(
        series.map_batches(_hour_us, batch_format="pyarrow",
                           batch_size=131072),
        ["event_type"], "n", k=1, tie_cols=["hour_us"]).to_pandas()
    top["peak_hour"] = pd.to_datetime(top["hour_us"], unit="us")
    top["n"] = top["n"].astype("int64")
    return (top[["event_type", "peak_hour", "n"]]
            .sort_values("event_type").reset_index(drop=True))


def q_view_purchase_hourly_corr(sf_dir: str) -> pd.DataFrame:
    """CROSS-SERIES CORRELATION: Pearson corr between the hourly counts
    of views and purchases — the aggregate-then-correlate diagnostic
    (do the two activity series move together?). One grouped exchange
    builds the per-hour (views, purchases) table (absent cells are 0 on
    both sides via the shared hour spine); the corr folds the tiny
    series on the driver with the textbook estimator."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "purchase"]))
        sub = batch.filter(keep)
        hour = pc.floor_temporal(pc.cast(sub["ts"], pa.timestamp("us")),
                                 unit="hour")
        v = pc.cast(pc.equal(sub["event_type"], pa.scalar("view")),
                    pa.int64())
        p = pc.cast(pc.equal(sub["event_type"], pa.scalar("purchase")),
                    pa.int64())
        return pa.table({"hour": hour, "v": v, "p": p})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["hour"], [("v", "sum", "nv"), ("p", "sum", "np")])
    series = inner.to_pandas()
    if edge is not None and edge.num_rows:
        series = pd.concat([series, edge.to_pandas()], ignore_index=True)
    x = series["nv"].to_numpy(dtype=np.float64)
    y = series["np"].to_numpy(dtype=np.float64)
    xc, yc = x - x.mean(), y - y.mean()
    denom = np.sqrt((xc * xc).sum() * (yc * yc).sum())
    corr = round(float((xc * yc).sum() / denom), 6) if denom > 0 else None
    return pd.DataFrame({"corr_vp": [corr],
                         "n_hours": pd.Series([len(series)],
                                              dtype="int64")})


def q_chi2_type_dow(sf_dir: str) -> pd.DataFrame:
    """CHI-SQUARE independence contingency (event_type × day-of-week):
    observed count, expected count under independence, and the per-cell
    χ² contribution — the drift-style statistical test a validation
    engine runs on categorical×categorical structure. Distributed
    shape: per-batch grouped counts fold to ≤|types×7| partials per
    block, margins and cells finalize on the driver — one scan, no
    exchange. Per-cell floats are single expressions over exact integer
    margins ((r·c)/t then (n−e)²/e), so they are bit-identical to the
    SQL twin's — no float SUM whose order could differ."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _partial(batch: pa.Table) -> pa.Table:
        # DuckDB dayofweek: 0=Sunday..6=Saturday -> week_start=7 (Sunday)
        dow = pc.cast(pc.day_of_week(pc.cast(batch["ts"], pa.timestamp("us")),
                                     week_start=7), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "dow": dow})
        g = t.group_by(["event_type", "dow"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    cells = (parts.groupby(["event_type", "dow"], as_index=False)["n"].sum())
    row_m = cells.groupby("event_type")["n"].sum().to_dict()
    col_m = cells.groupby("dow")["n"].sum().to_dict()
    tot = int(cells["n"].sum())
    rows = []
    for _, r in cells.iterrows():
        e = (int(row_m[r["event_type"]]) * int(col_m[r["dow"]])) / tot
        n = int(r["n"])
        rows.append({"event_type": r["event_type"], "dow": int(r["dow"]),
                     "n": n, "expected": round(e, 6),
                     "chi2_contrib": round((n - e) * (n - e) / e, 6)})
    out = pd.DataFrame(rows).sort_values(["event_type", "dow"]).reset_index(drop=True)
    out["dow"] = out["dow"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_minmax_ts(sf_dir: str) -> pd.DataFrame:
    """Min/max datetime per event_type (A15, Profiler.py:675-679): ONE
    scan emitting both aggregates per batch (arrow group_by), driver-
    merged over the tiny (event_type × blocks) partials."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"], use_threads=False).aggregate(
            [("ts", "min"), ("ts", "max")]
        )
        return g.rename_columns(
            [{"ts_min": "min_ts", "ts_max": "max_ts"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=131072
    ).to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        min_ts=("min_ts", "min"), max_ts=("max_ts", "max")
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_non_ascii(sf_dir: str) -> pd.DataFrame:
    """Per-lang count of documents containing non-ASCII characters (M5,
    Profiler.py:226-228): vectorized Arrow regex per batch, pre-aggregated
    per (batch, lang), then a tiny groupby-sum."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _partial(batch: pa.Table) -> pa.Table:
        flag = pc.match_substring_regex(batch["text"], r"[^\x00-\x7F]")
        t = pa.table({"lang": batch["lang"],
                      "na": pc.cast(flag, pa.int64()),
                      "one": pa.array(np.ones(len(batch), dtype=np.int64))})
        df = t.to_pandas().groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
    out = parts.groupby("lang").sum(["na", "one"]).to_pandas()
    return out.rename(columns={"sum(na)": "non_ascii_docs", "sum(one)": "docs"})


# ---------------------------------------------------------------------------
# dedup / ANN / text-analysis queries (training-data extensions)


def q_dedup_exact_hash(sf_dir: str) -> pd.DataFrame:
    """Exact dedup via 64-bit content hash + vectorized sorted_groupby
    (the scale path; q_dedup_exact is the direct-groupby twin)."""
    from .dedup import exact_dedup_table

    out = exact_dedup_table(_read(sf_dir, "documents", ["doc_id", "text"]),
                            "doc_id", "text").to_pandas()
    return out.astype("int64")


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """NEAR-DUP CLUSTERING: connected components over the verified
    rare-word-Jaccard pair list — every near-dup pipeline's terminal
    step (pick one canonical doc per duplicate cluster). Pairs come from
    the distributed inverted-index exchange; the component labeling runs
    union-find on the driver over pairs only (pairs ≪ docs; the
    label-propagation graduation is documented in
    dedup.connected_components). Oracle: WITH RECURSIVE reachability,
    cluster_id = min reachable doc."""
    from .dedup import connected_components

    pairs = q_jaccard_near_dups(sf_dir)
    out = connected_components(pairs["id_a"].to_numpy(),
                               pairs["id_b"].to_numpy())
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out


def q_dedup_clusters_lp(sf_dir: str) -> pd.DataFrame:
    """DISTRIBUTED near-dup clustering: the same verified rare-word
    Jaccard pairs as q_dedup_clusters, labeled by dedup.label_propagation_ds
    — iterative min-label exchange (merge-join + grouped min per round,
    exact convergence witness inside the groupby) instead of driver
    union-find, for pair lists that outgrow one node. Shares the
    dedup_clusters WITH RECURSIVE oracle."""
    import ray.data as rd

    from .dedup import label_propagation_ds

    pairs = q_jaccard_near_dups(sf_dir)
    pds = rd.from_arrow(pa.table({
        "id_a": pa.array(pairs["id_a"].to_numpy(), pa.int64()),
        "id_b": pa.array(pairs["id_b"].to_numpy(), pa.int64())}))
    out = label_propagation_ds(pds).to_pandas()
    if out.empty:  # all-empty Ray blocks drop columns in to_pandas
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "cluster_id": "int64"}))


def q_jaccard_near_dups(sf_dir: str) -> pd.DataFrame:
    """Exact rare-word Jaccard near-dup (§2.7) — the deterministic,
    SQL-expressible member of the near-dup family (MinHash/SimHash are
    its probabilistic scale paths). Distributed rare-token inverted
    index; see dedup.jaccard_near_dups."""
    from .dedup import jaccard_near_dups

    out = jaccard_near_dups(_read(sf_dir, "documents", ["doc_id", "text"]),
                            "doc_id", "text", threshold=0.5, max_df=64)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return out


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 for the first 3 embeddings as queries;
    output (qid, id) only — ranks are float-stable, raw cosines are not
    bit-identical across engines."""
    from .ann import brute_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(v) for v in q.sort_by("vec_id")["embedding"].to_pylist()[:3]])
    out = brute_topk(_read(sf_dir, "embeddings"), "vec_id", "embedding", qm, k=10)
    return out[["qid", "id"]]


def q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF approximate top-k (rows-only check: recall-bounded, not exact)."""
    from .ann import ivf_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(v) for v in q.sort_by("vec_id")["embedding"].to_pylist()[:3]])
    return ivf_topk(_read(sf_dir, "embeddings"), "vec_id", "embedding", qm, k=10)


def q_top_docs_per_source(sf_dir: str) -> pd.DataFrame:
    """GROUPED TOP-K (training-data shape: best docs per source): the 2
    longest docs per source by (n_chars DESC, doc_id ASC) through
    fast_ops.grouped_topk — ONE sort exchange, per-block head-k per run,
    O(blocks × k) edge stitch. Oracle: ROW_NUMBER() ≤ k twin."""
    from ..stages.fast_ops import grouped_topk

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    t = grouped_topk(docs, ["source"], "n_chars", k=2,
                     tie_cols=["doc_id"],
                     rows_hint=_read(sf_dir, "documents",
                                     ["doc_id"]).count())
    out = t.to_pandas()[["source", "doc_id", "n_chars"]]
    return (out.sort_values(["source", "doc_id"]).reset_index(drop=True)
            .astype({"doc_id": "int64", "n_chars": "int64"}))


# Knuth multiplicative constant — the deterministic per-row sampling
# hash must be SQL-expressible so the oracle reproduces the exact sample
_SAMPLE_MULT = 2654435761
_SAMPLE_MOD = 1 << 32


def q_docs_ksample_per_source(sf_dir: str) -> pd.DataFrame:
    """EXACT-K DETERMINISTIC SAMPLE per source (eval-set carving shape:
    exactly 5 docs per provenance, reproducible forever): the k SMALLEST
    Knuth-multiplicative sampling keys per group — stratified_sample's
    per-row hash under grouped_topk's one-sort/edge-stitch machinery
    (negated key, since the operator heads DESC). Unlike rate-based
    sampling this guarantees the count; unlike ds.random_sample it is
    seedless-reproducible and SQL-mirrorable."""
    from ..stages.fast_ops import grouped_topk

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def _key(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        skey = (did * _SAMPLE_MULT) % _SAMPLE_MOD
        return pa.table({"source": t["source"], "doc_id": t["doc_id"],
                         "nkey": pa.array(-skey, pa.int64())})

    t = grouped_topk(
        ds.map_batches(_key, batch_format="pyarrow", batch_size=131072),
        ["source"], "nkey", k=5, tie_cols=["doc_id"],
        rows_hint=_read(sf_dir, "documents", ["doc_id"]).count())
    out = t.to_pandas()[["source", "doc_id"]]
    return (out.sort_values(["source", "doc_id"]).reset_index(drop=True)
            .astype({"doc_id": "int64"}))


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """DETERMINISTIC STRATIFIED SAMPLING (data-mixing shape: per-language
    keep rates): doc kept iff (doc_id · 2654435761) mod 2³² < rate(lang)
    · 2³², rate 0.5 for 'en' and 0.25 otherwise. ZERO exchange — the
    decision is pure per-row arithmetic, so sampling composes map-side
    with any downstream stage; per-lang (n_total, n_sampled) counts
    pre-aggregate per block and merge on the driver (≤ blocks×langs
    rows). doc_id·mult stays under 2⁶³ for doc_id < 3.5e9; a wider id
    domain salts via (doc_id mod 2³²) first (documented, not needed for
    the test tables)."""
    rates = {"en": 0.5}
    default_rate = 0.25

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                                 "n_total": pd.Series([], dtype="int64"),
                                 "n_sampled": pd.Series([], dtype="int64")})
        h = (df["doc_id"].to_numpy().astype(np.uint64)
             * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
        thr = np.floor(df["lang"].map(rates).fillna(default_rate)
                       * _SAMPLE_MOD).astype(np.uint64)
        keep = h < thr.to_numpy()
        # dropna=False: a NULL lang is a real stratum — the SQL twin's
        # GROUP BY lang emits it, and dropping it would lose its docs
        g = df.assign(__keep=keep.astype(np.int64)).groupby(
            "lang", sort=False, dropna=False)["__keep"].agg(["count", "sum"])
        return pd.DataFrame({"lang": g.index,
                             "n_total": g["count"].astype("int64"),
                             "n_sampled": g["sum"].astype("int64")})

    parts = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        _partial, batch_format="pandas").to_pandas()
    out = (parts.groupby("lang", sort=True, dropna=False)
           [["n_total", "n_sampled"]].sum().reset_index())
    return out.astype({"n_total": "int64", "n_sampled": "int64"})


def q_docs_above_p90(sf_dir: str) -> pd.DataFrame:
    """GLOBAL QUANTILE GATE (quality-threshold filtering): per-source
    count of docs with n_chars ≥ the global PERCENTILE_DISC(0.9) of
    n_chars. Exact quantile from ONE value-counts exchange
    (grouped_quantiles over a constant group), threshold broadcast into
    a map-side filter, grouped count through one skinny exchange."""
    import ray.data as rd

    from ..stages.fast_ops import grouped_quantiles, sorted_groupby

    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def _const(t: pa.Table) -> pa.Table:
        return pa.table({"__g": pa.array(np.zeros(t.num_rows, np.int8)),
                         "n_chars": t["n_chars"]})

    qt = grouped_quantiles(docs.map_batches(_const, batch_format="pyarrow"),
                           "__g", "n_chars", [0.9], names=["p90"],
                           disc=True)
    p90 = int(qt["p90"][0].as_py())

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_chars"], p90)).select(["source"])

    inner, edge = sorted_groupby(
        docs.map_batches(_filter, batch_format="pyarrow"),
        ["source"], [(None, "count_all", "n_above")])
    both = inner
    if edge is not None and edge.num_rows:
        both = both.union(rd.from_arrow(edge))
    out = both.to_pandas()
    return (out.sort_values("source").reset_index(drop=True)
            .astype({"n_above": "int64"}))


def q_epoch_mix(sf_dir: str) -> pd.DataFrame:
    """EPOCH-WEIGHTED DATA MIXING (training-data recipe): en×2.5,
    zh×1.25, others ×1 — per-lang input count vs mixed-row count after
    deterministic replication (pipelines.mix.epoch_mix: floor copies +
    hash-decided fractional copy, zero exchange). The oracle reproduces
    the identical hash arithmetic."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from .mix import epoch_mix

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    mixed = epoch_mix(docs, "lang", "doc_id",
                      weights={"en": 2.5, "zh": 1.25})

    def _counts(src, out_name):
        inner, edge = sorted_groupby(
            src.map_batches(lambda t: t.select(["lang"]),
                            batch_format="pyarrow"),
            ["lang"], [(None, "count_all", out_name)])
        both = inner
        if edge is not None and edge.num_rows:
            both = both.union(rd.from_arrow(edge))
        return both.to_pandas()

    n_docs = _counts(docs, "n_docs")
    n_mixed = _counts(mixed, "n_mixed")
    out = n_docs.merge(n_mixed, on="lang", how="outer")
    out["n_mixed"] = out["n_mixed"].fillna(0)
    return (out.sort_values("lang").reset_index(drop=True)
            .astype({"n_docs": "int64", "n_mixed": "int64"}))


def q_docs_pii_redacted(sf_dir: str) -> pd.DataFrame:
    """PII REDACTION (training-data scrubbing, §2.8 extension): emails /
    SSNs / phones / IPv4s → typed placeholders + per-doc redaction
    count; RE2 kernels on both the engine (pc.replace_substring_regex)
    and DuckDB (regexp_replace) sides, so the twin is exact. The oracle
    SQL is generated from the SAME pattern list the engine applies."""
    from .text import redact_pii

    out = redact_pii(_read(sf_dir, "documents", ["doc_id", "text"]),
                     "doc_id", "text").to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64", "n_redactions": "int64"}))


def _pii_redaction_sql() -> str:
    """Stepwise-CTE twin of text.redact_pii: count on the progressively
    redacted text, then replace — identical order, identical RE2
    pattern strings (imported, not copied)."""
    from .text import PII_PATTERNS

    prev_t = "text"
    ctes, counts = [], []
    for i, (_, pat, rep) in enumerate(PII_PATTERNS, start=1):
        carry = ", ".join([f"c{j}" for j in range(1, i)])
        carry = (carry + ", ") if carry else ""
        ctes.append(
            f"s{i} AS (SELECT doc_id, {carry}"
            f"COALESCE(LENGTH(regexp_extract_all({prev_t}, '{pat}')), 0) AS c{i}, "
            f"regexp_replace({prev_t}, '{pat}', '{rep}', 'g') AS t{i} "
            f"FROM {'documents' if i == 1 else f's{i - 1}'})")
        prev_t = f"t{i}"
        counts.append(f"c{i}")
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT doc_id, {prev_t} AS text_redacted, "
        + f"CAST({' + '.join(counts)} AS BIGINT) AS n_redactions "
        + f"FROM s{len(PII_PATTERNS)} ORDER BY doc_id")


def q_word_freqs(sf_dir: str) -> pd.DataFrame:
    from .text import word_frequencies

    return word_frequencies(_read(sf_dir, "documents", ["text"]), top_k=50)


def q_doc_pct_rank_in_source(sf_dir: str) -> pd.DataFrame:
    """GROUPED PERCENT_RANK: each document's length percentile within
    its source — per-partition rank normalization (the per-group cousin
    of the global order_percent_rank). row_number_within provides the
    distributed rank under the total order (n_chars, doc_id); per-source
    sizes broadcast as a sorted array (|sources| is dictionary-sized);
    the rank→percentile division is exact-int → float, bit-identical to
    the twin. Single-doc sources emit 0 like SQL PERCENT_RANK."""
    from ..stages.window import row_number_within

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    # per-source sizes via per-block value-count partials — the driver
    # folds ≤ blocks×|sources| tiny rows, never the source column
    def _sizes(t: pa.Table) -> pa.Table:
        col = t["source"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table({"source": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    sizes = (_read(sf_dir, "documents", ["source"])
             .map_batches(_sizes, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
             .groupby("source")["n"].sum())
    keys = np.array(sorted(sizes.index))
    ns = sizes.loc[keys].to_numpy(dtype=np.int64)

    rn = row_number_within(ds, "source", ["n_chars", "doc_id"],
                           out_col="rn")

    def _pct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "pct_rank": pa.array([], pa.float64())})
        src = t["source"].to_numpy(zero_copy_only=False)
        n = ns[np.searchsorted(keys, src)]
        r = t["rn"].to_numpy(zero_copy_only=False)
        pr = np.where(n > 1, r / np.maximum(n - 1, 1), 0.0)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "pct_rank": pa.array(np.round(pr, 6))})

    out = rn.map_batches(_pct, batch_format="pyarrow",
                         batch_size=131072).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_shingle_novelty_by_source(sf_dir: str) -> pd.DataFrame:
    """CROSS-SOURCE SHINGLE NOVELTY: per source, its distinct word
    3-gram count and how many of those shingles appear in NO other
    source — the provenance-overlap diagnostic of corpus mixing (a
    source with near-zero unique shingles is redundant; near-total
    uniqueness means no contamination). Distributed shape: per-block
    (shingle, source) dedup → one grouped exchange dedups globally →
    a second exchange on the shingle prefix counts sources per shingle
    (smuggling the owner through MIN(source) — valid exactly when the
    count is 1) → two skinny per-source censuses. No joins, no driver
    shingle sets."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _shingles(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z']+")
        rows_s, rows_src = [], []
        for src, t in zip(df["source"].to_numpy(), toks):
            if len(t) < 3:
                continue
            rows_s.extend(" ".join(t[i:i + 3]) for i in range(len(t) - 2))
            rows_src.extend([src] * (len(t) - 2))
        out = pd.DataFrame({"shingle": rows_s, "source": rows_src})
        return out.drop_duplicates()

    pairs_in, pairs_edge = sorted_groupby(
        ds.map_batches(_shingles, batch_format="pandas", batch_size=4096),
        ["shingle", "source"], [(None, "count_all", "_n")])
    pairs = pairs_in
    if pairs_edge is not None and pairs_edge.num_rows:
        pairs = pairs.union(rd.from_arrow(pairs_edge))
    pairs = pairs.materialize()  # consumed twice: per-shingle + per-source

    si, se = sorted_groupby(pairs.select_columns(["shingle", "source"]),
                            ["shingle"],
                            [(None, "count_all", "ns"),
                             ("source", "min", "only_source")])
    per_shingle = si
    if se is not None and se.num_rows:
        per_shingle = per_shingle.union(rd.from_arrow(se))

    def _uniq_census(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["ns"], 1))
        g = pa.table({"source": sub["only_source"]}).group_by(
            ["source"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n_unique_shingles"}.get(c, c)
             for c in g.column_names])

    uniq = per_shingle.map_batches(_uniq_census, batch_format="pyarrow",
                                   batch_size=131072).to_pandas()
    uniq = uniq.groupby("source", as_index=False)["n_unique_shingles"].sum()

    def _tot_census(t: pa.Table) -> pa.Table:
        g = pa.table({"source": t["source"]}).group_by(
            ["source"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n_shingles"}.get(c, c) for c in g.column_names])

    tot = pairs.map_batches(_tot_census, batch_format="pyarrow",
                            batch_size=131072).to_pandas()
    tot = tot.groupby("source", as_index=False)["n_shingles"].sum()
    out = tot.merge(uniq, on="source", how="left").fillna(0)
    out["n_shingles"] = out["n_shingles"].astype("int64")
    out["n_unique_shingles"] = out["n_unique_shingles"].astype("int64")
    return (out[["source", "n_shingles", "n_unique_shingles"]]
            .sort_values("source").reset_index(drop=True))


def _two_sample_length_hist(sf_dir: str):
    """Shared input of the two-sample tests (KS, Mann–Whitney): the
    per-length (count_src0, count_src1) histogram of document lengths
    through one grouped exchange. Returns (hist sorted by x with int64
    ca/cb columns, n_a, n_b)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _pre(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["source"], value_set=pa.array(["src0", "src1"]))
        sub = t.filter(keep)
        a = pc.cast(pc.equal(sub["source"], pa.scalar("src0")), pa.int64())
        b = pc.cast(pc.equal(sub["source"], pa.scalar("src1")), pa.int64())
        return pa.table({"x": sub["n_chars"], "a": a, "b": b})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["x"], [("a", "sum", "ca"), ("b", "sum", "cb")])
    hist = inner.to_pandas()
    if edge is not None and edge.num_rows:
        hist = pd.concat([hist, edge.to_pandas()], ignore_index=True)
    hist = hist.sort_values("x").reset_index(drop=True)
    return hist, int(hist["ca"].sum()), int(hist["cb"].sum())


def q_ks_two_sample_sources(sf_dir: str) -> pd.DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between src0's and
    src1's document-length distributions — the drift test (A26) with a
    fully SQL-mirrored exact path (ks_drift tests against a baseline
    artifact; this twin is self-contained). One grouped exchange builds
    the per-length (count_a, count_b) histogram (shared with the
    Mann–Whitney twin via _two_sample_length_hist); the sup|F₁−F₂| fold
    runs on the driver over the ≤|distinct lengths| histogram. Every
    float is an exact-int division; the max over them is
    order-independent."""
    hist, na, nb = _two_sample_length_hist(sf_dir)
    cuma = hist["ca"].cumsum().to_numpy(dtype=np.int64)
    cumb = hist["cb"].cumsum().to_numpy(dtype=np.int64)
    ks = round(float(np.abs(cuma / na - cumb / nb).max()), 6)
    return pd.DataFrame({"ks": [ks],
                         "n_a": pd.Series([na], dtype="int64"),
                         "n_b": pd.Series([nb], dtype="int64")})


def q_mannwhitney_sources(sf_dir: str) -> pd.DataFrame:
    """MANN–WHITNEY U (midrank form) between src0's and src1's document
    lengths — the rank-based two-sample test beside the KS sup-statistic,
    with ZERO floats: doubled midranks make the tied-rank sum exact
    int64 (a tied block at cumulative base with multiplicity c
    contributes ca·(2·base + c + 1)), and the reported statistic is
    2·U_a = R2_a − n_a(n_a+1). Shares the one-exchange histogram with
    ks_two_sample_sources (_two_sample_length_hist); the rank fold runs
    on the tiny distinct-value histogram."""
    hist, na, nb = _two_sample_length_hist(sf_dir)
    ca = hist["ca"].to_numpy(dtype=np.int64)
    cb = hist["cb"].to_numpy(dtype=np.int64)
    c = ca + cb
    base = np.concatenate([[0], np.cumsum(c)[:-1]])
    r2a = int((ca * (2 * base + c + 1)).sum())
    return pd.DataFrame({"u2_a": pd.Series([r2a - na * (na + 1)],
                                           dtype="int64"),
                         "n_a": pd.Series([na], dtype="int64"),
                         "n_b": pd.Series([nb], dtype="int64")})


def q_docs_dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """DUPLICATE-RATE ATTRIBUTION: per source, how many of its documents
    are corpus-wide exact duplicates (text appearing ≥2 times anywhere)
    — the per-provenance contamination census a corpus-prep pipeline
    reports before dedup. Distributed shape: (content-hash, source)
    counts through one grouped exchange; per-hash corpus totals through
    a second exchange on the hash prefix; a big⨝big sort-merge join
    carries totals back to the (hash, source) rows; the per-source
    census folds ≤|sources| partials per block on the driver. The twin
    groups raw text (equivalent partition; a 64-bit collision would
    mismatch with probability ~n²/2⁶⁵ — the distinct_counts
    discipline)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join
    from ..state.hll import hash64_arrow

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _hash(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash64_arrow(col).view(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "source": batch["source"]})

    hi, he = sorted_groupby(
        ds.map_batches(_hash, batch_format="pyarrow", batch_size=131072),
        ["h", "source"], [(None, "count_all", "n_hs")])
    n_hs = hi
    if he is not None and he.num_rows:
        n_hs = n_hs.union(rd.from_arrow(he))
    n_hs = n_hs.materialize()  # consumed twice: totals + join left side

    ti, te = sorted_groupby(n_hs.select_columns(["h", "n_hs"]), ["h"],
                            [("n_hs", "sum", "n_h")])
    n_h = ti
    if te is not None and te.num_rows:
        n_h = n_h.union(rd.from_arrow(te))

    rows_hint = ds.count() * 2
    j = sorted_merge_join(n_hs, n_h, "h", "h",
                          ["source", "n_hs"], ["n_h"], rows_hint=rows_hint)

    def _census(t: pa.Table) -> pa.Table:
        dup = pc.if_else(pc.greater(t["n_h"], 1), t["n_hs"],
                         pa.scalar(0, pa.int64()))
        g = pa.table({"source": t["source"], "n_docs": t["n_hs"],
                      "n_dup_docs": dup}).group_by(
            ["source"], use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum")])
        return g.rename_columns(
            [{"n_docs_sum": "n_docs", "n_dup_docs_sum": "n_dup_docs"}.get(c, c)
             for c in g.column_names])

    parts = j.map_batches(_census, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    out = (parts.groupby("source", as_index=False)[["n_docs", "n_dup_docs"]]
           .sum().sort_values("source").reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_dup_docs"] = out["n_dup_docs"].astype("int64")
    return out[["source", "n_docs", "n_dup_docs"]]


def q_word_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """ZIPF FIT of the corpus word distribution: OLS slope of log2(freq)
    vs log2(rank) over the top-500 words — the rank-frequency diagnostic
    for synthetic/degenerate corpora (natural language sits near −1).
    Reuses the word_freqs distributed shape (per-block token counts →
    one skinny word exchange → per-block top-k, driver merges k×blocks
    rows); the regression itself folds 500 points on the driver with
    the textbook cov/var estimator — REGR_SLOPE's exact definition."""
    from .text import word_frequencies

    top = word_frequencies(_read(sf_dir, "documents", ["text"]), top_k=500)
    if len(top) < 2:
        return pd.DataFrame({"zipf_slope": pd.Series([None], dtype="float64"),
                             "n_words": pd.Series([len(top)], dtype="int64")})
    x = np.log2(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log2(top["n"].to_numpy(dtype=np.float64))
    xc = x - x.mean()
    slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    return pd.DataFrame({"zipf_slope": [round(slope, 6)],
                         "n_words": pd.Series([len(top)], dtype="int64")})


def q_docs_quality(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality features (SQL-checkable subset)."""
    from .text import quality_scores

    out = quality_scores(_read(sf_dir, "documents", ["doc_id", "text"]),
                         "doc_id", "text").to_pandas()
    return out[["doc_id", "char_count", "token_count", "punct_ratio",
                "digit_ratio", "upper_ratio"]]


def q_docs_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style per-doc repetition quality rules (dup-word /
    top-word / dup-bigram fractions) — zero-exchange vectorized map;
    SQL twin unnests ``string_split(text, ' ')`` with the identical
    empty-token filter and division placement."""
    from .text import repetition_stats

    out = repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                           "doc_id", "text").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lm_surprisal(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM quality scores (CCNet/Gopher-style perplexity filter):
    Laplace bigram model built over the corpus in one skinny exchange,
    broadcast once, then zero-exchange per-doc integer micro-bit
    surprisal sums — exact int64 arithmetic, mirrored bit-for-bit by the
    SQL twin's FLOOR(-1e6·log2(...)) rule."""
    from .text import bigram_lm_surprisal

    out = bigram_lm_surprisal(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        "doc_id", "text").to_pandas()
    out["avg_surprisal_microbits"] = (
        out["total_surprisal_microbits"].astype("float64")
        / out["n_bigrams"].clip(lower=1)).round(6)
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_bigrams", "total_surprisal_microbits",
              "avg_surprisal_microbits"]])


def q_minhash_near_dups(sf_dir: str) -> pd.DataFrame:
    from .dedup import minhash_near_dups

    return minhash_near_dups(_read(sf_dir, "documents", ["doc_id", "text"]),
                             "doc_id", "text", threshold=0.7)


def q_simhash_near_dups(sf_dir: str) -> pd.DataFrame:
    from .dedup import simhash_near_dups

    return simhash_near_dups(_read(sf_dir, "documents", ["doc_id", "text"]),
                             "doc_id", "text", max_hamming=3)


def q_embedding_near_dups(sf_dir: str) -> pd.DataFrame:
    from .dedup import embedding_near_dups

    return embedding_near_dups(_read(sf_dir, "embeddings"), "vec_id",
                               "embedding", threshold=0.95)


def q_tfidf_top_ngrams(sf_dir: str) -> pd.DataFrame:
    from .text import tfidf_top_ngrams

    return tfidf_top_ngrams(_read(sf_dir, "documents", ["text"]), top_k=20)


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprint counts per doc (rows-only check: hash values
    are engine-internal; the per-doc count is stable and the containment
    primitive is oracle-tested in pytest on known-overlap corpora)."""
    from .text import fingerprints

    fp = fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]),
                      "doc_id", "text")
    out = fp.groupby("doc_id").count().to_pandas()
    out = out.rename(columns={"count()": "n_fingerprints"})
    out["n_fingerprints"] = out["n_fingerprints"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lang_histogram(sf_dir: str) -> pd.DataFrame:
    from .text import language_histogram

    return language_histogram(_read(sf_dir, "documents", ["text"]))


def q_readability(sf_dir: str) -> pd.DataFrame:
    from .text import readability_aggregate

    return pd.DataFrame([readability_aggregate(_read(sf_dir, "documents", ["text"]))])


# ---------------------------------------------------------------------------
# registry + oracle SQL


_NULLCOUNT_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, COUNT(*) - COUNT({c}) AS null_count, "
    f"COUNT({c}) AS non_null_count FROM lineitem"
    for c in sorted(LINEITEM_COLS)
)

_NUMSTATS_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, COUNT({c}) AS n, ROUND(AVG({c}), 6) AS avg_val, "
    f"ROUND(STDDEV({c}), 6) AS std_val, ROUND(MIN({c}), 6) AS min_val, "
    f"ROUND(MAX({c}), 6) AS max_val FROM lineitem"
    for c in LINEITEM_NUMERIC
)

_DISTINCT_UNION = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, COUNT(DISTINCT {c}) AS distinct_count FROM lineitem"
    for c in ["l_returnflag", "l_linestatus", "l_orderkey", "l_partkey", "l_suppkey"]
)

_REF_UNION = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
       COUNT(*) FILTER (f.{fcol} IS NOT NULL AND d.{dcol} IS NOT NULL) AS matched,
       COUNT(*) FILTER (f.{fcol} IS NOT NULL AND d.{dcol} IS NULL) AS orphan,
       COUNT(*) FILTER (f.{fcol} IS NULL) AS null_count
       FROM {fact} f LEFT JOIN {dim} d ON f.{fcol} = d.{dcol}"""
    for name, fact, fcol, dim, dcol in REF_PAIRS
)

# --- SQL twins for the text heuristics (round-2 next-round #8): the
# readability counters, the TF-IDF ranking, and the langid heuristic are
# all deterministic string predicates, so DuckDB can replay them. The
# langid twin is GENERATED from the same SCRIPT_PATTERNS/STOPWORDS
# constants the heuristic uses — one source of truth.

_READABILITY_SQL = r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
w AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-zà-ÿ'']+'))) AS word
  FROM d
),
ws AS (
  SELECT doc_id,
         LENGTH(regexp_extract_all(word, '[aeiouyà-ÿ]+')) AS grp,
         CASE WHEN LENGTH(regexp_extract_all(word, '[aeiouyà-ÿ]+')) > 1
                   AND word LIKE '%e' AND word NOT LIKE '%le'
              THEN 1 ELSE 0 END AS dropE
  FROM w
),
syl AS (SELECT doc_id, GREATEST(1, grp - dropE) AS s FROM ws),
sd AS (
  SELECT doc_id, COUNT(*) AS wcount, SUM(s) AS syls,
         SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS mono,
         SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS poly
  FROM syl GROUP BY doc_id
),
perdoc AS (
  SELECT d.doc_id, LENGTH(d.text) AS chars,
         GREATEST(LENGTH(regexp_extract_all(d.text, '[.!?]+')), 1) AS sentences,
         LENGTH(regexp_extract_all(d.text, '\S+')) >= 5 AS valid,
         COALESCE(sd.wcount, 0) AS wcount, COALESCE(sd.syls, 0) AS syls,
         COALESCE(sd.mono, 0) AS mono, COALESCE(sd.poly, 0) AS poly
  FROM d LEFT JOIN sd USING (doc_id)
)
SELECT CAST(SUM(chars) AS BIGINT) AS char_count,
       CAST(SUM(wcount) AS BIGINT) AS word_count,
       CAST(SUM(mono) AS BIGINT) AS monosyllable_count,
       CAST(SUM(poly) AS BIGINT) AS polysyllable_count,
       ROUND(COALESCE(SUM(CASE WHEN valid AND wcount > 0 THEN
           206.835 - 1.015 * (wcount * 1.0 / sentences)
                   - 84.6 * (syls * 1.0 / wcount) END)
         / NULLIF(SUM(CASE WHEN valid THEN 1 ELSE 0 END), 0), 0), 4)
         AS mean_flesch_reading_ease,
       CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS valid_docs,
       CAST(COUNT(*) AS BIGINT) AS docs
FROM perdoc
"""

_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9'']+')) AS tok,
         generate_subscripts(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9'']+'), 1) AS ord
  FROM documents
),
grams AS (
  SELECT doc_id, tok AS ngram FROM toks
  UNION ALL
  SELECT a.doc_id, a.tok || ' ' || b.tok
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  UNION ALL
  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
              JOIN toks c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2
),
agg AS (
  SELECT ngram, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df FROM grams
  GROUP BY ngram
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT ngram,
       ROUND(tf * (LN((1.0 + n_docs) / (1.0 + df)) + 1.0) / n_docs, 8)
         AS mean_tfidf
FROM agg, n
ORDER BY mean_tfidf DESC, ngram LIMIT 20
"""


def _lang_histogram_sql() -> str:
    """The langid-heuristic SQL twin, generated from the heuristic's own
    SCRIPT_PATTERNS / STOPWORDS / TOKEN_RE constants (functions.langid)
    so the two sides cannot drift. Unique-text domain (the Ray side
    dedups by 64-bit content hash — equal modulo 2^-64 collisions)."""
    from ..functions.langid import SCRIPT_PATTERNS, STOPWORDS, TOKEN_RE

    script_counts = ",\n         ".join(
        f"LENGTH(regexp_extract_all(sample, '{pat.pattern}')) AS n{i}"
        for i, (_, pat) in enumerate(SCRIPT_PATTERNS))
    greatest = ", ".join(f"n{i}" for i in range(len(SCRIPT_PATTERNS)))
    # strict first-wins argmax in SCRIPT_PATTERNS order (the heuristic's
    # `if n > best_n` loop): CASE tests in declaration order
    script_case = "\n              ".join(
        f"WHEN n{i} = best_n THEN '{lang}'"
        for i, (lang, _) in enumerate(SCRIPT_PATTERNS))
    sw_values = ",\n    ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(STOPWORDS)
        for w in sorted(STOPWORDS[lang]))
    return f"""
WITH uniq AS (SELECT DISTINCT text FROM documents WHERE text IS NOT NULL),
feat AS (
  SELECT text,
         array_to_string(list_slice(
           regexp_extract_all(text, '[^\\x00-\\x7F]'), 1, 512), '') AS sample
  FROM uniq
),
script AS (
  SELECT text, sample,
         {script_counts}
  FROM feat
),
scored AS (
  SELECT *, GREATEST({greatest}) AS best_n
  FROM script
),
script_pick AS (
  SELECT text,
         CASE WHEN sample <> '' AND best_n > 0 THEN
           CASE {script_case} END
         END AS script_lang
  FROM scored
),
tok AS (
  SELECT text,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE.pattern}')) AS tok
  FROM uniq
),
sw(lang, word) AS (
  VALUES
    {sw_values}
),
tokcnt AS (SELECT text, COUNT(*) AS n FROM tok GROUP BY text),
hits AS (
  SELECT t.text, sw.lang, COUNT(*) AS h
  FROM tok t JOIN sw ON t.tok = sw.word GROUP BY t.text, sw.lang
),
vote AS (
  SELECT text,
         CASE WHEN h > 0 THEN lang ELSE 'English' END AS lang
  FROM (
    SELECT h.text, h.lang, h.h,
           ROW_NUMBER() OVER (PARTITION BY h.text
                              ORDER BY h.h * 1.0 / tc.n DESC, h.lang ASC) AS rn
    FROM hits h JOIN tokcnt tc USING (text)
  ) WHERE rn = 1
)
SELECT detected_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT COALESCE(sp.script_lang, v.lang, 'English') AS detected_lang
  FROM uniq u
  LEFT JOIN script_pick sp USING (text)
  LEFT JOIN vote v USING (text)
)
GROUP BY detected_lang
ORDER BY n DESC, detected_lang
"""


_TRANSCRIPTS_SQL = """
SELECT 'c' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
       CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
            WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
            WHEN 'error' THEN 'tool' ELSE 'user' END AS role,
       props AS text,
       CASE WHEN event_type = 'error' THEN event_type END AS tool,
       ts
FROM events
"""

# ---------------------------------------------------------------------------
# round-5 continuation: digit-distribution / FD-discovery / Q2- and
# Q11-shaped composites


_BENFORD_EXPECTED = {1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910,
                     5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153,
                     9: 0.045757}


def q_benford_prices(sf_dir: str) -> pd.DataFrame:
    """BENFORD FIRST-DIGIT CENSUS over l_extendedprice — the classic
    digit-distribution data-quality / fraud screen (extends the
    profiler's histogram family A24, Profiler.py:744-760). Distributed
    shape: each block folds its prices to exact integer cents
    (half-away, the suite-wide convention) and bincounts the first
    significant digit — a 9-cell partial — so the exchange is ≤9 rows
    per block folded on the driver; the input is never shuffled.
    Shares and per-digit chi-square terms divide exact integers by the
    6dp Benford constants, so the floats are bit-identical to the SQL
    twin's."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def _partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        x = cents.to_numpy(zero_copy_only=False)
        x = x[x > 0].copy()
        while x.size and np.any(x >= 10):
            big = x >= 10
            x[big] //= 10
        counts = np.bincount(x, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    g = parts.groupby("digit", as_index=False)["n"].sum()
    g = g[g["n"] > 0].copy()
    total = int(g["n"].sum())
    g["n"] = g["n"].astype("int64")
    g["share"] = (g["n"] / total).round(6)
    g["expected"] = g["digit"].map(_BENFORD_EXPECTED)
    raw = g["n"] / total
    g["chi2_term"] = (((raw - g["expected"]) * (raw - g["expected"]))
                      / g["expected"]).round(6)
    return (g[["digit", "n", "share", "expected", "chi2_term"]]
            .sort_values("digit").reset_index(drop=True))


def q_fd_census(sf_dir: str) -> pd.DataFrame:
    """FUNCTIONAL-DEPENDENCY DISCOVERY CENSUS — for each candidate FD
    A→B, does A determine B? Holds iff distinct(A) == distinct(A,B)
    (the classic TANE-style check; extends the profiler's
    distinct/uniqueness family A6, Profiler.py:633-634). Distributed
    shape: ONE scan per table emits per-block-unique 64-bit value
    hashes of A and of the (A,B) pair as skinny (fd, kind, h) rows;
    the four tables' streams union into a SINGLE sorted_groupby
    exchange, and each distinct count is a group count, counted inside
    blocks. Same documented hash-collision caveat as distinct_counts
    (~n²/2^65 expected undercount pairs); the candidate columns are
    null-free key/dimension columns, so SQL COUNT(DISTINCT ...) null
    semantics never diverge."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from .dedup import _splitmix64

    fds = [
        ("customer", "c_custkey", "c_nationkey"),
        ("lineitem", "l_partkey", "l_suppkey"),
        ("orders", "o_custkey", "o_orderstatus"),
        ("orders", "o_orderkey", "o_custkey"),
    ]

    def _make_pre(i: int, a: str, b: str):
        def _pre(batch: pa.Table) -> pa.Table:
            ha = _hash64_col(batch[a]).astype(np.uint64, copy=False)
            hb = _hash64_col(batch[b]).astype(np.uint64, copy=False)
            hp = _splitmix64(ha + _splitmix64(hb))
            ul = np.unique(ha)
            up = np.unique(hp)
            return pa.table({
                "fd": pa.array(np.full(ul.size + up.size, i, np.int8)),
                "kind": pa.array(np.concatenate(
                    [np.zeros(ul.size, np.int8), np.ones(up.size, np.int8)])),
                "h": pa.array(np.concatenate([ul, up]).view(np.int64)),
            })
        return _pre

    pres = []
    for i, (tbl, a, b) in enumerate(fds):
        pres.append(_read(sf_dir, tbl, [a, b]).map_batches(
            _make_pre(i, a, b), batch_format="pyarrow", batch_size=131072))
    pre = pres[0].union(*pres[1:])
    inner, edge = sorted_groupby(pre, ["fd", "kind", "h"],
                                 [(None, "count_all", "n")])

    def _group_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["fd", "kind"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    counts = inner.map_batches(
        _group_counts, batch_format="pyarrow", batch_size=None
    ).to_pandas().groupby(["fd", "kind"])["n"].sum()
    if edge is not None and edge.num_rows:
        for key, n in edge.to_pandas().groupby(["fd", "kind"]).size().items():
            counts[key] = counts.get(key, 0) + n
    rows = []
    for i, (tbl, a, b) in enumerate(fds):
        n_lhs = int(counts.get((i, 0), 0))
        n_pair = int(counts.get((i, 1), 0))
        rows.append({"fd": f"{a}->{b}", "n_lhs": n_lhs, "n_pair": n_pair,
                     "holds": n_lhs == n_pair})
    return (pd.DataFrame(rows).sort_values("fd").reset_index(drop=True))


def q_cheapest_supplier_per_part(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q2-shaped correlated-min join-back (the testdata has no
    partsupp table, so lineitem is the part↔supplier price relation):
    every (part, supplier) pair that achieved the part's MINIMUM line
    price — ALL ties, not a tie-broken top-1 (vs peak_hour_per_type's
    argmax-k=1). Three skinny exchanges: a grouped-min per part, a
    big⨝big sort-merge join of the cents rows against the per-part
    mins with an equality filter, then a (part, supplier) distinct
    exchange. Prices compare as exact integer cents end-to-end."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def _cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"l_partkey": batch["l_partkey"],
                         "l_suppkey": batch["l_suppkey"], "cents": cents})

    # pre feeds both the grouped-min AND the join's left side — pin it
    # once so the lineitem scan + cents map never re-execute
    pre = li.map_batches(_cents, batch_format="pyarrow",
                         batch_size=131072).materialize()
    inner, edge = sorted_groupby(pre, ["l_partkey"],
                                 [("cents", "min", "min_cents")])
    mins = inner
    if edge is not None and edge.num_rows:
        mins = mins.union(rd.from_arrow(edge))

    n_li = _read(sf_dir, "lineitem", ["l_partkey"]).count()
    j = sorted_merge_join(pre, mins, "l_partkey", "l_partkey",
                          ["l_suppkey", "cents"], ["l_partkey", "min_cents"],
                          rows_hint=2 * n_li)

    def _at_min(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["cents"], t["min_cents"])
        return t.filter(keep).select(["l_partkey", "l_suppkey", "min_cents"])

    hits = j.map_batches(_at_min, batch_format="pyarrow", batch_size=None)
    d_inner, d_edge = sorted_groupby(hits, ["l_partkey", "l_suppkey"],
                                     [("min_cents", "min", "min_cents")])
    out = d_inner.to_pandas()
    if d_edge is not None and d_edge.num_rows:
        out = pd.concat([out, d_edge.to_pandas()], ignore_index=True)
    out["min_price"] = out["min_cents"].astype("int64") / 100.0
    return (out[["l_partkey", "l_suppkey", "min_price"]]
            .sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True))


def q_part_revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q11-shaped global-fraction HAVING: parts whose discounted
    revenue exceeds 1.2× the AVERAGE part's — the `HAVING SUM(x) >
    frac * (SELECT SUM(x) ...)` scalar-subquery shape, with a
    scale-invariant fraction (Q11's own 0.0001/SF trick). Distributed
    shape: one grouped-sum exchange per part (exact integer 10^-4
    units), materialized once (one row per part — dimension-bounded);
    the global total AND the part count fold over the SAME grouped
    result (never a second input scan), and the fraction filter
    compares exact integers (10·rev4·n_parts > 12·total) broadcast as
    scalars — int64 here; the int128 the SQL twin gets for free from
    HUGEINT sums bounds this at ~10^5 parts × 10^13 rev4 units, ample
    for the test scales and documented for the 100-TB case (divide
    total once, driver-side, before broadcasting). Only qualifying
    rows reach the driver."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": batch["l_partkey"],
                         "rev4": pc.multiply(cents, disc)})

    pre = li.map_batches(_rev, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["l_partkey"], [("rev4", "sum", "rev4")])
    grouped = inner.materialize()
    total = int(grouped.sum("rev4") or 0)
    n_parts = grouped.count()
    if edge is not None and edge.num_rows:
        total += int(pc.sum(edge["rev4"]).as_py() or 0)
        n_parts += edge.num_rows

    def _qualify(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(t["rev4"], pa.scalar(10 * n_parts, pa.int64()))
        return t.filter(pc.greater(lhs, pa.scalar(12 * total, pa.int64())))

    out = grouped.map_batches(_qualify, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        eq = _qualify(edge)
        if eq.num_rows:
            out = pd.concat([out, eq.to_pandas()], ignore_index=True)
    if out.empty:
        return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                             "revenue": pd.Series([], dtype="float64"),
                             "share": pd.Series([], dtype="float64")})
    out["rev4"] = out["rev4"].astype("int64")
    out["revenue"] = ((out["rev4"] + 50) // 100) / 100.0
    out["share"] = (out["rev4"] / total).round(6)
    return (out[["l_partkey", "revenue", "share"]]
            .sort_values(["share", "l_partkey"], ascending=[False, True])
            .reset_index(drop=True))


def q_ind_census(sf_dir: str) -> pd.DataFrame:
    """INCLUSION-DEPENDENCY DISCOVERY CENSUS — for each candidate IND
    A ⊆ B (values of column A contained in column B, across tables),
    report the distinct-LHS count and how many distinct LHS values are
    missing from the RHS. The cross-table sibling of fd_census (both
    are the profiler's dependency-discovery layer over A6/ST4; the
    referential checks count VIOLATING ROWS, this counts DISTINCT
    values — the discovery grain). Distributed shape: per-block-unique
    raw int64 values (no hashing — these are integer key columns, so
    the census is EXACT with no collision caveat) tagged with side
    flags, all eight column streams union into ONE sorted_groupby
    exchange on (ind, v) max-merging the flags; per-IND missing counts
    fold inside the post-exchange blocks."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    inds = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]

    def _make_pre(i: int, col: str, is_lhs: bool):
        def _pre(batch: pa.Table) -> pa.Table:
            v = np.unique(pc.cast(batch[col], pa.int64())
                          .to_numpy(zero_copy_only=False))
            flag = np.ones(v.size, np.int8) if is_lhs else np.zeros(v.size, np.int8)
            other = np.zeros(v.size, np.int8) if is_lhs else np.ones(v.size, np.int8)
            return pa.table({"ind": pa.array(np.full(v.size, i, np.int8)),
                             "v": pa.array(v),
                             "l": pa.array(flag), "r": pa.array(other)})
        return _pre

    pres = []
    for i, (lt, lc, rt, rc) in enumerate(inds):
        pres.append(_read(sf_dir, lt, [lc]).map_batches(
            _make_pre(i, lc, True), batch_format="pyarrow",
            batch_size=131072))
        pres.append(_read(sf_dir, rt, [rc]).map_batches(
            _make_pre(i, rc, False), batch_format="pyarrow",
            batch_size=131072))
    pre = pres[0].union(*pres[1:])
    inner, edge = sorted_groupby(pre, ["ind", "v"],
                                 [("l", "max", "has_l"),
                                  ("r", "max", "has_r")])

    def _fold(t: pa.Table) -> pa.Table:
        has_l = t["has_l"].to_numpy(zero_copy_only=False).astype(np.int64)
        has_r = t["has_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        ind = t["ind"].to_numpy(zero_copy_only=False)
        miss = has_l * (1 - has_r)
        out = (pd.DataFrame({"ind": ind, "n_lhs": has_l, "n_missing": miss})
               .groupby("ind", as_index=False).sum())
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = inner.map_batches(_fold, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        parts = pd.concat([parts, _fold(edge).to_pandas()],
                          ignore_index=True)
    agg = parts.groupby("ind", as_index=False)[["n_lhs", "n_missing"]].sum()
    lut = {i: f"{lc}<={rc}" for i, (lt, lc, rt, rc) in enumerate(inds)}
    rows = []
    for i, (lt, lc, rt, rc) in enumerate(inds):
        row = agg[agg["ind"] == i]
        n_lhs = int(row["n_lhs"].iloc[0]) if len(row) else 0
        n_missing = int(row["n_missing"].iloc[0]) if len(row) else 0
        rows.append({"ind": lut[i], "n_lhs": n_lhs, "n_missing": n_missing,
                     "contained": n_missing == 0})
    return pd.DataFrame(rows).sort_values("ind").reset_index(drop=True)


def q_hourly_autocorr(sf_dir: str) -> pd.DataFrame:
    """SEASONALITY DETECTION — autocorrelation of the hourly event-count
    series at lag 1 (momentum) and lag 24 (daily cycle). Distributed
    shape: ONE grouped exchange folds events to exact-int hourly counts
    (the aggregate grain — bounded by the time span, like
    events_hourly); the lag alignment and textbook Pearson fold run on
    the driver over that tiny series. Sparse-hour semantics: a lag pair
    exists iff BOTH hours have events (the SQL twin's self-join)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"hour": hour,
                         "one": pa.array(np.ones(batch.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["hour"], [("one", "sum", "n")])
    series = inner.to_pandas()
    if edge is not None and edge.num_rows:
        series = pd.concat([series, edge.to_pandas()], ignore_index=True)
    series["n"] = series["n"].astype("int64")
    series = series.sort_values("hour").reset_index(drop=True)

    rows = []
    for lag in (1, 24):
        shifted = series.copy()
        shifted["hour"] = shifted["hour"] - pd.Timedelta(hours=lag)
        m = series.merge(shifted, on="hour", suffixes=("_a", "_b"))
        x = m["n_a"].to_numpy(dtype=np.float64)
        y = m["n_b"].to_numpy(dtype=np.float64)
        if x.size >= 2:
            xc, yc = x - x.mean(), y - y.mean()
            denom = np.sqrt((xc * xc).sum() * (yc * yc).sum())
            acf = round(float((xc * yc).sum() / denom), 6) if denom > 0 else None
        else:
            acf = None
        rows.append({"lag_hours": lag, "acf": acf, "n_pairs": x.size})
    out = pd.DataFrame(rows)
    out["lag_hours"] = out["lag_hours"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


def _hash64_col(col) -> np.ndarray:
    """uint64 value hashes of an Arrow (chunked) column — strings via
    polars over the Arrow buffers, numerics via the pandas vectorized
    hash. Shared by the dependency-discovery family (fd_census,
    fd_strength); callers .view(np.int64) when an Arrow int64 column is
    needed."""
    from ..state.hll import hash64_arrow

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return hash64_arrow(col)
    return pd.util.hash_array(col.to_numpy(zero_copy_only=False),
                              categorize=False)


def _part_basket_pairs(sf_dir: str, min_support: int = 2):
    """Shared mining prelude of the market-basket family
    (part_graph_triangles, part_rules_topk): the distinct (order, part)
    relation — one grouped exchange, materialized because every caller
    consumes it at least twice — and its co-occurrence pair counts
    filtered to ``n >= min_support``. Returns
    (op_ds, support_pairs_inner_ds, support_pairs_edge_table_or_None);
    the support pairs keep their ``n`` column."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_partkey"],
                            [(None, "count_all", "_n")])
    op = di.select_columns(["l_orderkey", "l_partkey"])
    if de is not None and de.num_rows:
        op = op.union(rd.from_arrow(de.select(["l_orderkey", "l_partkey"])))
    op = op.materialize()
    ci, ce = pair_cooccurrence(op, "l_orderkey", "l_partkey")

    def _support(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"],
                                         pa.scalar(min_support, pa.int64())))

    si = ci.map_batches(_support, batch_format="pyarrow", batch_size=None)
    se = None
    if ce is not None and ce.num_rows:
        se = _support(ce)
        if not se.num_rows:
            se = None
    return op, si, se


def q_part_graph_triangles(sf_dir: str) -> pd.DataFrame:
    """GRAPH MOTIF COUNTING — triangles and the global clustering
    coefficient of the MIN-SUPPORT-2 part co-purchase graph (parts are
    adjacent when ≥2 orders contain both; support-1 edges on this
    uniform data are pure chance, and pruning them is the standard
    association-mining move — it is also what keeps exact motif
    counting tractable as the unpruned graph densifies toward complete:
    exact triangle counting is inherently Θ(Σ C(deg,2)) wedge work, 148M
    wedges / ~59 s at sf0.1 unpruned, measured). The MapReduce triangle
    count of Suri & Vassilvitskii (WWW'11), expressed as OPERATOR
    COMPOSITION with zero new exchange machinery: (1) distinct
    (order, part) exchange; (2) support-filtered edges u<v via
    pair_cooccurrence; (3) forward WEDGES via pair_cooccurrence AGAIN
    with the edge source u as the basket key — each (v, w, nw) row says
    nw vertices u<v<w see both, so every triangle is counted exactly
    once by its smallest vertex; (4) closure: wedge rows and
    edge-presence rows union into one sorted_groupby on the packed
    (v,w) key, triangles = Σ nw where the closing edge exists, folded
    per block; (5) degrees through one skinny exchange give Σ C(deg,2)
    wedges for the clustering coefficient. No all-pairs step anywhere;
    no intermediate ever leaves the object store."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    _op, si, se = _part_basket_pairs(sf_dir)

    def _drop_n(t: pa.Table) -> pa.Table:
        return t.select(["item_a", "item_b"])

    edges = si.map_batches(_drop_n, batch_format="pyarrow",
                           batch_size=131072)
    if se is not None:
        edges = edges.union(rd.from_arrow(_drop_n(se)))
    edges = edges.materialize()
    n_edges = edges.count()

    # wedges keyed by closing pair: u is the basket, forward neighbors
    # the items (they are distinct by the edge set's construction)
    wi, we = pair_cooccurrence(edges, "item_a", "item_b")

    # closure keys are the raw (v, w) pair — a multi-key exchange, NOT a
    # packed v*2^32+w int64 (packing is non-injective once item keys span
    # ≥2^32 and would silently merge distinct pairs)
    def _wedge_rows(t: pa.Table) -> pa.Table:
        nw = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": t["item_a"], "w": t["item_b"],
                         "nw": pa.array(nw),
                         "flag": pa.array(np.zeros(t.num_rows, np.int8))})

    def _edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["item_a"], "w": t["item_b"],
                         "nw": pa.array(np.zeros(t.num_rows, np.int64)),
                         "flag": pa.array(np.ones(t.num_rows, np.int8))})

    closure_in = wi.map_batches(_wedge_rows, batch_format="pyarrow",
                                batch_size=131072)
    if we is not None and we.num_rows:
        closure_in = closure_in.union(rd.from_arrow(_wedge_rows(we)))
    closure_in = closure_in.union(
        edges.map_batches(_edge_rows, batch_format="pyarrow",
                          batch_size=131072))
    ci, ce = sorted_groupby(closure_in, ["v", "w"],
                            [("nw", "sum", "nw"), ("flag", "max", "has_e")])

    def _tri_partial(t: pa.Table) -> pa.Table:
        nw = t["nw"].to_numpy(zero_copy_only=False).astype(np.int64)
        he = t["has_e"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"t": pa.array([int((nw * he).sum())], pa.int64())})

    n_tri = int(ci.map_batches(_tri_partial, batch_format="pyarrow",
                               batch_size=None).sum("t") or 0)
    if ce is not None and ce.num_rows:
        n_tri += int(_tri_partial(ce)["t"][0].as_py())

    # all-neighbor wedge total for the clustering coefficient
    def _endpoints(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["item_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array(np.concatenate([a, b])),
                         "one": pa.array(np.ones(2 * a.size, np.int64))})

    gi, ge = sorted_groupby(
        edges.map_batches(_endpoints, batch_format="pyarrow",
                          batch_size=131072),
        ["x"], [("one", "sum", "deg")])

    def _wedge_partial(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((deg * (deg - 1) // 2).sum())],
                                       pa.int64())})

    n_wedges = int(gi.map_batches(_wedge_partial, batch_format="pyarrow",
                                  batch_size=None).sum("w") or 0)
    if ge is not None and ge.num_rows:
        n_wedges += int(_wedge_partial(ge)["w"][0].as_py())

    clustering = (round(3.0 * n_tri / n_wedges, 6) if n_wedges > 0 else None)
    return pd.DataFrame({"n_edges": pd.Series([n_edges], dtype="int64"),
                         "n_wedges": pd.Series([n_wedges], dtype="int64"),
                         "n_triangles": pd.Series([n_tri], dtype="int64"),
                         "clustering": pd.Series([clustering],
                                                 dtype="float64")})


def q_value_pattern_census(sf_dir: str) -> pd.DataFrame:
    """VALUE-PATTERN (FORMAT) CENSUS — the classic profiler
    format-discovery pass: mask every string (uppercase→A, lowercase→a,
    digit→9, punctuation kept) and count the top 3 masks per column —
    how a profiler spots phone/date/id formats and format VIOLATIONS
    without enumerating values (extends the type-census M1 and
    max-string-length A12 family). Distributed shape: per-block masked
    group-counts fold to ≤|patterns| partials (format domains are tiny
    by nature), one skinny exchange, top-3 per column on the driver
    over the pattern domain. The mask runs as three vectorized Arrow
    regex replaces — no Python row loop."""
    from ..stages.fast_ops import sorted_groupby

    targets = [("customer", "c_name"), ("events", "props"),
               ("orders", "o_orderpriority")]

    def _mask(col, name: str):
        def _pre(batch: pa.Table) -> pa.Table:
            s = batch[col]
            m = pc.replace_substring_regex(s, pattern="[A-Z]",
                                           replacement="A")
            m = pc.replace_substring_regex(m, pattern="[a-z]",
                                           replacement="a")
            m = pc.replace_substring_regex(m, pattern="[0-9]",
                                           replacement="9")
            t = pa.table({"pattern": m})
            g = t.group_by(["pattern"], use_threads=False).aggregate(
                [([], "count_all")])
            g = g.rename_columns(
                [{"count_all": "n"}.get(c, c) for c in g.column_names])
            return pa.table({"column": pa.array([name] * g.num_rows),
                             "pattern": g["pattern"],
                             "n": pc.cast(g["n"], pa.int64())})
        return _pre

    pres = []
    for tbl, col in targets:
        pres.append(_read(sf_dir, tbl, [col]).map_batches(
            _mask(col, col), batch_format="pyarrow", batch_size=131072))
    pre = pres[0].union(*pres[1:])
    inner, edge = sorted_groupby(pre, ["column", "pattern"],
                                 [("n", "sum", "n")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out = (out.sort_values(["column", "n", "pattern"],
                           ascending=[True, False, True])
           .groupby("column", as_index=False).head(3))
    return out[["column", "pattern", "n"]].reset_index(drop=True)


def q_part_rules_topk(sf_dir: str) -> pd.DataFrame:
    """ASSOCIATION RULES (confidence + lift) — the step past
    part_affinity_topk's raw support: for every support-≥2 part pair,
    both directed rules a⇒b with confidence nab/na and lift
    nab·N/(na·nb); top 10 by lift. Distributed shape: distinct
    (order, part) exchange feeds pair_cooccurrence (support counts) and
    a skinny per-part order-count exchange; only the parts that appear
    in a support-filtered pair have their counts collected (broadcast
    is_in filter — the rule set is the SMALL mined output, never the
    item domain). Confidence/lift are single exact-int divisions,
    bit-identical to the twin."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    op, si, se = _part_basket_pairs(sf_dir)

    # total baskets N = number of distinct orders
    oi, oe = sorted_groupby(op, ["l_orderkey"], [(None, "count_all", "_c")])
    n_total = oi.count() + (oe.num_rows if oe is not None else 0)

    # per-part basket counts (kept as a Dataset; filtered below)
    ii, ie = sorted_groupby(op, ["l_partkey"], [(None, "count_all", "np")])

    pairs = si.to_pandas()
    if se is not None:
        pairs = pd.concat([pairs, se.to_pandas()], ignore_index=True)
    if pairs.empty:
        return pd.DataFrame({
            "antecedent": pd.Series([], dtype="int64"),
            "consequent": pd.Series([], dtype="int64"),
            "n_orders": pd.Series([], dtype="int64"),
            "confidence": pd.Series([], dtype="float64"),
            "lift": pd.Series([], dtype="float64")})

    needed = pa.array(np.unique(np.concatenate(
        [pairs["item_a"].to_numpy(np.int64),
         pairs["item_b"].to_numpy(np.int64)])))

    def _filter_counts(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["l_partkey"], value_set=needed))

    ic = ii.map_batches(_filter_counts, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if ie is not None and ie.num_rows:
        ic = pd.concat([ic, _filter_counts(ie).to_pandas()],
                       ignore_index=True)
    np_by_part = dict(zip(ic["l_partkey"].astype("int64"),
                          ic["np"].astype("int64")))

    rows = []
    for a, b, nab in zip(pairs["item_a"].astype("int64"),
                         pairs["item_b"].astype("int64"),
                         pairs["n"].astype("int64")):
        na, nb = np_by_part[a], np_by_part[b]
        lift = round(int(nab) * n_total / (na * nb), 6)
        rows.append({"antecedent": int(a), "consequent": int(b),
                     "n_orders": int(nab),
                     "confidence": round(int(nab) / na, 6), "lift": lift})
        rows.append({"antecedent": int(b), "consequent": int(a),
                     "n_orders": int(nab),
                     "confidence": round(int(nab) / nb, 6), "lift": lift})
    out = (pd.DataFrame(rows)
           .sort_values(["lift", "antecedent", "consequent"],
                        ascending=[False, True, True]).head(10))
    for c in ("antecedent", "consequent", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_part_skyline(sf_dir: str) -> pd.DataFrame:
    """SKYLINE (Pareto-dominance filter) — parts not dominated in
    (cheaper p_retailprice, larger p_size): the multi-criteria
    shortlist operator (BNL/sort-first-skyline, Börzsönyi et al.
    ICDE'01). Distributed shape: the classic two-phase skyline — each
    block computes its LOCAL skyline with a vectorized sort-scan
    (dominated-in-block ⇒ dominated-globally, so the union of local
    skylines is a small superset), and the exact global dominance pass
    runs on the driver over that candidate set (bounded by the Pareto
    front size × blocks, not the input). Prices compare as exact
    integer cents."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def _local(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["p_retailprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        size = pc.cast(batch["p_size"], pa.int64()).to_numpy(
            zero_copy_only=False)
        key = batch["p_partkey"].to_numpy(zero_copy_only=False)
        # sort by (price asc, size desc): earlier rows have price <= cur;
        # keep cur unless some earlier row has strictly larger size (that
        # row dominates: price <=, size >) — ties in both dims survive to
        # the exact driver pass
        order = np.lexsort((-size, cents))
        c, s, k = cents[order], size[order], key[order]
        run_max = np.maximum.accumulate(
            np.concatenate([[np.iinfo(np.int64).min], s[:-1]]))
        keep = s >= run_max
        return pa.table({"p_partkey": pa.array(k[keep]),
                         "cents": pa.array(c[keep]),
                         "p_size": pa.array(s[keep])})

    cand = ds.map_batches(_local, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    if cand.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "p_retailprice": pd.Series([], dtype="float64"),
                             "p_size": pd.Series([], dtype="int64")})
    c = cand["cents"].to_numpy(np.int64)
    s = cand["p_size"].to_numpy(np.int64)
    k = cand["p_partkey"].to_numpy(np.int64)
    order = np.lexsort((-s, c))
    c, s, k = c[order], s[order], k[order]
    # exact dominance over the candidate set: a row is dominated iff an
    # earlier row (price <=, after tie-sort size >=) is strictly better
    # in at least one dim — track (max size at strictly smaller price)
    # and (max size at equal price) separately
    keep = np.ones(c.size, bool)
    best_smaller = np.iinfo(np.int64).min  # max size over price < cur
    best_eq = np.iinfo(np.int64).min       # max size over price == cur
    prev_price = None
    for i in range(c.size):
        if prev_price is not None and c[i] != prev_price:
            best_smaller = max(best_smaller, best_eq)
            best_eq = np.iinfo(np.int64).min
        if best_smaller >= s[i] or best_eq > s[i]:
            keep[i] = False
        best_eq = max(best_eq, s[i])
        prev_price = c[i]
    out = pd.DataFrame({"p_partkey": k[keep], "p_size": s[keep],
                        "p_retailprice": c[keep] / 100.0})
    return (out[["p_partkey", "p_retailprice", "p_size"]]
            .sort_values("p_partkey").reset_index(drop=True))


def q_fd_strength(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE-FD STRENGTH — TANE's g3 error for candidate FDs
    A→B: the minimum fraction of rows to delete for the dependency to
    hold exactly (g3 = 1 − Σ_a max_b n(a,b) / N). The quantitative
    complement to fd_census's boolean verdict: 'o_custkey determines
    o_orderstatus for 1−g3 of rows'. Distributed shape: both FDs'
    streams union through TWO skinny exchanges — (fd, a, b)-counts,
    then per-(fd, a) [max, sum] — so Σ max (kept rows) and Σ sum
    (total rows) fold from the same second exchange; per-block partials
    only reach the driver. B-values hash to int64 (same documented
    collision caveat as distinct_counts; a collision can only merge two
    b-groups and nudge g3 down by ~n²/2^65)."""
    from ..stages.fast_ops import sorted_groupby

    fds = [
        ("lineitem", "l_partkey", "l_suppkey"),
        ("orders", "o_custkey", "o_orderstatus"),
    ]

    def _make_pre(i: int, a: str, b: str):
        def _pre(batch: pa.Table) -> pa.Table:
            return pa.table({
                "fd": pa.array(np.full(batch.num_rows, i, np.int8)),
                "a": pc.cast(batch[a], pa.int64()),
                "bh": pa.array(_hash64_col(batch[b]).view(np.int64)),
            })
        return _pre

    pres = []
    for i, (tbl, a, b) in enumerate(fds):
        pres.append(_read(sf_dir, tbl, [a, b]).map_batches(
            _make_pre(i, a, b), batch_format="pyarrow", batch_size=131072))
    pre = pres[0].union(*pres[1:])
    c_inner, c_edge = sorted_groupby(pre, ["fd", "a", "bh"],
                                     [(None, "count_all", "n")])
    import ray.data as rd

    counts = c_inner
    if c_edge is not None and c_edge.num_rows:
        counts = counts.union(rd.from_arrow(c_edge))
    m_inner, m_edge = sorted_groupby(counts, ["fd", "a"],
                                     [("n", "max", "mx"),
                                      ("n", "sum", "ns")])

    def _fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"fd": t["fd"].to_numpy(zero_copy_only=False),
                           "mx": t["mx"].to_numpy(zero_copy_only=False)
                           .astype(np.int64),
                           "ns": t["ns"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        g = df.groupby("fd", as_index=False)[["mx", "ns"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = m_inner.map_batches(_fold, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if m_edge is not None and m_edge.num_rows:
        parts = pd.concat([parts, _fold(m_edge).to_pandas()],
                          ignore_index=True)
    agg = parts.groupby("fd", as_index=False)[["mx", "ns"]].sum()
    rows = []
    for i, (tbl, a, b) in enumerate(fds):
        r = agg[agg["fd"] == i]
        kept = int(r["mx"].iloc[0]) if len(r) else 0
        n_rows = int(r["ns"].iloc[0]) if len(r) else 0
        g3 = round(1.0 - kept / n_rows, 6) if n_rows else None
        rows.append({"fd": f"{a}->{b}", "n_rows": n_rows, "kept": kept,
                     "g3": g3})
    return pd.DataFrame(rows).sort_values("fd").reset_index(drop=True)


def q_docs_upsert(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE (upsert) — the lakehouse MERGE INTO: every doc_id
    divisible by 13 gets its n_chars bumped by 1000 (matched → update)
    and five brand-new doc_ids arrive (unmatched → insert). Runs
    through the resumable sink's upsert (delete-matched via broadcast
    sorted keys + atomic delta shard append,
    sources/sink.py upsert_keys_into_shards) and reads the merged
    store back for the oracle check."""
    import os
    import tempfile

    from ..sources.sink import upsert_keys_into_shards

    base = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    ids = base["doc_id"].to_numpy(zero_copy_only=False)
    nch = base["n_chars"].to_numpy(zero_copy_only=False)
    upd = ids % 13 == 0
    new_ids = ids.max() + np.arange(1, 6, dtype=np.int64)
    delta = pa.table({
        "doc_id": pa.array(np.concatenate([ids[upd], new_ids]), pa.int64()),
        "n_chars": pa.array(np.concatenate(
            [nch[upd] + 1000, np.full(5, 42, np.int64)]), pa.int64()),
    })
    with tempfile.TemporaryDirectory(prefix="adp_upsert_") as out:
        upsert_keys_into_shards([f"{sf_dir}/documents.parquet"], "doc_id",
                                delta, out, columns=["doc_id", "n_chars"])
        files = [os.path.join(out, f) for f in sorted(os.listdir(out))
                 if f.endswith(".parquet")]
        merged = pa.concat_tables([pq.read_table(f) for f in files])
    out_df = merged.to_pandas()
    out_df["doc_id"] = out_df["doc_id"].astype("int64")
    out_df["n_chars"] = out_df["n_chars"].astype("int64")
    return out_df.sort_values("doc_id").reset_index(drop=True)


def q_hopping_distinct_users(sf_dir: str) -> pd.DataFrame:
    """WINDOWED DISTINCT COUNT — distinct users per 2-hour hopping
    window (1-hour hop): the missing composite between events_hopping
    (plain windowed counts) and events_distinct_users (global grouped
    distinct). Map-side window fan-out (each event scatters to its two
    covering windows) + per-block (window, user) dedup, then ONE
    exchange co-locates the pairs and the distinct count per window is
    the group count, counted inside blocks — exact, never shipping user
    ids to the driver."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    hour_us = 3_600_000_000

    def _scatter(batch: pa.Table) -> pa.Table:
        h = pc.cast(pc.floor_temporal(pc.cast(batch["ts"],
                                              pa.timestamp("us")),
                                      unit="hour"), pa.int64())
        prev = pc.subtract(h, pa.scalar(hour_us, pa.int64()))
        u = batch["user_id"]
        t = pa.concat_tables([
            pa.table({"win_start": h, "user_id": u}),
            pa.table({"win_start": prev, "user_id": u})])
        return t.group_by(["win_start", "user_id"],
                          use_threads=False).aggregate([])

    pre = ds.map_batches(_scatter, batch_format="pyarrow",
                         batch_size=65536)
    inner, edge = sorted_groupby(pre, ["win_start", "user_id"],
                                 [(None, "count_all", "_n")])

    def _group_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["win_start"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    counts = inner.map_batches(
        _group_counts, batch_format="pyarrow", batch_size=None
    ).to_pandas().groupby("win_start")["n"].sum()
    if edge is not None and edge.num_rows:
        for w, n in edge.to_pandas().groupby("win_start").size().items():
            counts[w] = counts.get(w, 0) + n
    out = counts.reset_index().rename(columns={"n": "distinct_users"})
    out["win_start"] = pd.to_datetime(out["win_start"], unit="us")
    out["distinct_users"] = out["distinct_users"].astype("int64")
    return out.sort_values("win_start").reset_index(drop=True)



def q9_profit_by_nation_year(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q9-shaped profit composite (no partsupp in the testdata, so
    p_retailprice is the unit-cost proxy): profit per (supplier nation,
    order year) = Σ rev4 − cost4 in exact 10^-4 units. One big⨝big
    sort-merge join (lineitem⨝orders for the year) + TWO broadcast
    dimension lookups (part→retail cents, supplier→nation) + a
    25×7-grain partial aggregation folded on the driver. Profit stays a
    BIGINT (negative-safe: DuckDB's // truncates toward zero while
    Python floors, so no integer re-rounding crosses the twin); the
    dollar view is one exact division."""
    from ..stages.merge_join import sorted_merge_join
    from ..stages.referential import broadcast_lookup_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])

    def _pre(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        qty = pc.cast(pc.round(pc.multiply(batch["l_quantity"], 100.0),
                               round_mode="half_towards_infinity"),
                      pa.int64())
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_partkey": batch["l_partkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "rev4": pc.multiply(cents, disc), "qty2": qty})

    pre = li.map_batches(_pre, batch_format="pyarrow", batch_size=131072)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    rc = pc.cast(pc.round(pc.multiply(part["p_retailprice"], 100.0),
                          round_mode="half_towards_infinity"), pa.int64())
    part = pa.table({"p_partkey": part["p_partkey"], "retail2": rc})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(pre, "l_partkey", part, "p_partkey",
                              ["retail2"])
    j = broadcast_lookup_join(j, "l_suppkey", supp, "s_suppkey",
                              ["s_nationkey"])

    def _profit(batch: pa.Table) -> pa.Table:
        cost4 = pc.multiply(batch["retail2"], batch["qty2"])
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "s_nationkey": batch["s_nationkey"],
                         "profit4": pc.subtract(batch["rev4"], cost4)})

    j = j.map_batches(_profit, batch_format="pyarrow", batch_size=131072)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def _year(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(pc.cast(batch["o_orderdate"],
                                    pa.timestamp("us"))), pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_year": y})

    orders = orders.map_batches(_year, batch_format="pyarrow",
                                batch_size=131072)
    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    jo = sorted_merge_join(j, orders, "l_orderkey", "o_orderkey",
                           ["s_nationkey", "profit4"], ["o_year"],
                           rows_hint=hint)

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["s_nationkey", "o_year"],
                           use_threads=False).aggregate([("profit4", "sum")])
        return g.rename_columns(
            ["profit4" if c == "profit4_sum" else c for c in g.column_names])

    parts = jo.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    agg = parts.groupby(["s_nationkey", "o_year"],
                        as_index=False)["profit4"].sum()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    out["profit4"] = out["profit4"].astype("int64")
    out["o_year"] = out["o_year"].astype("int64")
    out["profit"] = out["profit4"] / 10000.0
    return (out[["n_name", "o_year", "profit4", "profit"]]
            .sort_values(["n_name", "o_year"]).reset_index(drop=True))


def q16_supplier_part_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q16-shaped supplier-relationship census (lineitem stands in
    for partsupp): distinct suppliers per (brand, type, size), skipping
    PROMO-type parts and negative-balance ("complaint") suppliers.
    Distributed shape: part attributes broadcast into lineitem
    (dimension lookup), the exclusion supplier set broadcast as a
    filter, per-block (attrs, suppkey) dedup, ONE exchange, per-attrs
    distinct counted inside blocks."""
    from ..stages.fast_ops import sorted_groupby
    from ..stages.referential import broadcast_lookup_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = pc.cast(supp.filter(pc.less(supp["s_acctbal"],
                                      pa.scalar(0.0)))["s_suppkey"],
                  pa.int64()).combine_chunks()

    j = broadcast_lookup_join(li, "l_partkey", part, "p_partkey",
                              ["p_brand", "p_type", "p_size"])

    def _pre(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.fill_null(pc.not_equal(batch["p_type"],
                                      pa.scalar("PROMO")), False),
            pc.invert(pc.is_in(batch["l_suppkey"], value_set=bad)))
        sub = batch.filter(keep)
        g = sub.group_by(["p_brand", "p_type", "p_size", "l_suppkey"],
                         use_threads=False).aggregate([])
        return g

    pre = j.map_batches(_pre, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(
        pre, ["p_brand", "p_type", "p_size", "l_suppkey"],
        [(None, "count_all", "_n")])

    def _counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("supplier_cnt" if c == "count_all" else c)
             for c in g.column_names])

    out = inner.map_batches(_counts, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        eg = (edge.to_pandas()
              .groupby(["p_brand", "p_type", "p_size"]).size()
              .reset_index(name="supplier_cnt"))
        out = pd.concat([out, eg], ignore_index=True)
    out = out.groupby(["p_brand", "p_type", "p_size"],
                      as_index=False)["supplier_cnt"].sum()
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return (out.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


def q20_volume_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q20-shaped volume-supplier semi-join chain: suppliers whose
    1996 shipped quantity of ECONOMY-type parts is above the average
    qualifying supplier's (a scale-invariant stand-in for Q20's
    half-of-availqty threshold). Distributed shape: ECONOMY part keys
    broadcast as an is_in filter with the shipdate predicate map-side,
    one grouped-sum exchange per supplier (exact qty in 10^-2 units),
    the total and supplier count fold over the SAME grouped result, and
    the survivors broadcast-join the supplier names."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    econ = pc.cast(part.filter(pc.equal(part["p_type"],
                                        pa.scalar("ECONOMY")))["p_partkey"],
                   pa.int64()).combine_chunks()
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity",
                                    "l_shipdate"])

    def _pre(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["l_shipdate"], pa.timestamp("us"))
        keep = pc.and_(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)),
                       pc.is_in(batch["l_partkey"], value_set=econ))
        sub = batch.filter(keep)
        qc = pc.cast(pc.round(pc.multiply(sub["l_quantity"], 100.0),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        return pa.table({"l_suppkey": sub["l_suppkey"], "qc": qc})

    pre = li.map_batches(_pre, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["l_suppkey"], [("qc", "sum", "qc")])
    grouped = inner.materialize()
    total = int(grouped.sum("qc") or 0)
    ns = grouped.count()
    if edge is not None and edge.num_rows:
        total += int(pc.sum(edge["qc"]).as_py() or 0)
        ns += edge.num_rows

    def _qualify(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(t["qc"], pa.scalar(ns, pa.int64()))
        return t.filter(pc.greater(lhs, pa.scalar(total, pa.int64())))

    out = grouped.map_batches(_qualify, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        eq = _qualify(edge)
        if eq.num_rows:
            out = pd.concat([out, eq.to_pandas()], ignore_index=True)
    if out.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object)})
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
    out = out.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    return (out[["s_name"]].sort_values("s_name").reset_index(drop=True))


def q_embedding_label_centroids(sf_dir: str) -> pd.DataFrame:
    """PER-CLASS EMBEDDING CENTROIDS — the class-prototype table of
    embedding analytics (nearest-centroid classification, drift-by-class
    monitoring): mean vector per label. Distributed shape: each block
    gathers its vectors through the zero-copy flat-buffer matrix
    (dedup._batch_vec_matrix, no row explosion), label-partitioned sums
    collapse to ≤|labels|×dims partial rows per block, and the driver
    folds blocks × labels × dims — one scan, no exchange (the label
    domain is the class catalog, bounded by construction)."""
    from .dedup import _batch_vec_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def _partial(t: pa.Table) -> pa.Table:
        ids, mat = _batch_vec_matrix(t, "vec_id", "embedding")
        if ids is None:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(labels)
        dims = mat.shape[1]
        out_l, out_d, out_s, out_n = [], [], [], []
        for lb in uniq:
            rows = mat[labels == lb]
            out_l.append(np.full(dims, lb, np.int64))
            out_d.append(np.arange(1, dims + 1, dtype=np.int64))
            out_s.append(rows.sum(axis=0, dtype=np.float64))
            out_n.append(np.full(dims, rows.shape[0], np.int64))
        return pa.table({"label": pa.array(np.concatenate(out_l)),
                         "dim": pa.array(np.concatenate(out_d)),
                         "s": pa.array(np.concatenate(out_s)),
                         "n": pa.array(np.concatenate(out_n))})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["label", "dim"], as_index=False)[["s", "n"]].sum()
    out = pd.DataFrame({"label": agg["label"].astype("int64"),
                        "dim": agg["dim"].astype("int64"),
                        "mean_val": (agg["s"] / agg["n"]).round(6)})
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


def q_winsorized_price_mean(sf_dir: str) -> pd.DataFrame:
    """WINSORIZED MEAN (robust statistics, next to MAD/IQR): the mean of
    l_extendedprice with the tails clipped to the exact [p05, p95]
    PERCENTILE_DISC thresholds — the outlier-robust location estimate a
    profiler reports alongside the raw mean. Distributed shape: exact
    integer-cent thresholds from ONE value-counts exchange
    (grouped_quantiles over a constant group), broadcast into a
    map-side clip whose per-block (sum, n) partials fold on the driver;
    the cents dataset is materialized once and feeds both passes. The
    final mean is one int-sum division (sum < 2^53 at test scales;
    beyond that the partials carry exact int64 and only the display
    division would need splitting)."""
    from ..stages.fast_ops import grouped_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"__g": pa.array(np.zeros(t.num_rows, np.int8)),
                         "cents": c})

    cents = li.map_batches(_cents, batch_format="pyarrow",
                           batch_size=131072).materialize()
    qt = grouped_quantiles(cents, "__g", "cents", [0.05, 0.95],
                           names=["p05", "p95"], disc=True)
    p05 = int(qt["p05"][0].as_py())
    p95 = int(qt["p95"][0].as_py())

    def _clip_sum(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        cl = np.clip(c, p05, p95)
        return pa.table({"s": pa.array([int(cl.sum())], pa.int64()),
                         "n": pa.array([c.size], pa.int64())})

    parts = cents.map_batches(_clip_sum, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    total, n = int(parts["s"].sum()), int(parts["n"].sum())
    # 6dp rounding in EXACT integer arithmetic (half-up on the 10^-6-$
    # numerator): a float ROUND here sits on a tie boundary for real
    # sums and Python's correct-decimal rounding disagrees with the
    # twin's ROUND at the last digit (observed at sf0.01)
    mean6 = (total * 10000 + n // 2) // n
    return pd.DataFrame({
        "p05": [p05 / 100.0], "p95": [p95 / 100.0],
        "winsorized_mean": [mean6 / 1000000.0],
        "n_rows": pd.Series([n], dtype="int64")})


def q_nation_region_share(sf_dir: str) -> pd.DataFrame:
    """HIERARCHICAL RATIO-TO-PARENT — each supplier nation's revenue as
    a share of its REGION and of the TOTAL (the two-level rollup
    percent-of-parent every BI layer needs; extends event_value_share's
    single-level ratio-to-report). Distributed shape: supplier→nation
    broadcast into lineitem, 25-group exact-int partial sums fold on
    the driver, and the nation→region hierarchy (a 5×25 dimension
    snowflake) joins there; every share divides two exact integers."""
    from ..stages.referential import broadcast_lookup_join

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_suppkey": batch["l_suppkey"],
                         "rev4": pc.multiply(cents, disc)})

    pre = li.map_batches(_rev, batch_format="pyarrow", batch_size=131072)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = broadcast_lookup_join(pre, "l_suppkey", supp, "s_suppkey",
                              ["s_nationkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["s_nationkey"], use_threads=False).aggregate(
            [("rev4", "sum")])
        return g.rename_columns(
            ["rev4" if c == "rev4_sum" else c for c in g.column_names])

    parts = j.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    agg = parts.groupby("s_nationkey", as_index=False)["rev4"].sum()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    out = (agg.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
           .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    out["rev4"] = out["rev4"].astype("int64")
    reg_tot = out.groupby("r_name")["rev4"].transform("sum")
    total = int(out["rev4"].sum())
    out["revenue"] = ((out["rev4"] + 50) // 100) / 100.0
    out["share_of_region"] = (out["rev4"] / reg_tot).round(6)
    out["share_of_total"] = (out["rev4"] / total).round(6)
    return (out[["r_name", "n_name", "revenue", "share_of_region",
                 "share_of_total"]]
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def q_ship_latency_quantiles(sf_dir: str) -> pd.DataFrame:
    """JOIN-THEN-QUANTILE composite — median and p95 order→ship latency
    (days) per order priority: the SLA percentile table, and the only
    quantile that needs a BIG⨝BIG join first. One sort-merge join
    (lineitem⨝orders on orderkey) projecting just (priority,
    day-diff int), then grouped_quantiles' exact value-counts exchange
    (latency days are a small integer domain, the exact path's sweet
    spot)."""
    from ..stages.fast_ops import grouped_quantiles
    from ..stages.merge_join import sorted_merge_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def _li(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "ship": pc.cast(batch["l_shipdate"],
                                         pa.timestamp("us"))})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def _ord(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "odate": pc.cast(batch["o_orderdate"],
                                          pa.timestamp("us")),
                         "o_orderpriority": batch["o_orderpriority"]})

    hint = (_read(sf_dir, "lineitem", ["l_orderkey"]).count()
            + _read(sf_dir, "orders", ["o_orderkey"]).count())
    j = sorted_merge_join(
        li.map_batches(_li, batch_format="pyarrow", batch_size=131072),
        orders.map_batches(_ord, batch_format="pyarrow", batch_size=131072),
        "l_orderkey", "o_orderkey", ["ship"],
        ["odate", "o_orderpriority"], rows_hint=hint)

    def _lat(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.days_between(batch["odate"], batch["ship"]),
                    pa.int64())
        return pa.table({"o_orderpriority": batch["o_orderpriority"],
                         "lat": d})

    qt = grouped_quantiles(
        j.map_batches(_lat, batch_format="pyarrow", batch_size=131072),
        "o_orderpriority", "lat", [0.5, 0.95], names=["p50", "p95"],
        disc=True)
    out = qt.to_pandas()
    out["p50"] = out["p50"].astype("int64")
    out["p95"] = out["p95"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_dau_wau_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU/WAU STICKINESS — the product-analytics engagement ratio:
    per active day, distinct daily users over distinct users of the
    trailing 7-day window ending that day. Distributed shape: ONE
    global (day, user) distinct exchange (per-block dedup first), the
    deduped activity table materialized once; DAU counts fold per day
    inside blocks; the ×7 window scatter runs over the DEDUPED rows
    (≤ days×users, not events) into a second (window_end, user)
    distinct exchange for WAU. The ratio divides two exact integers."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _days(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(pc.cast(batch["ts"],
                                              pa.timestamp("us")),
                                      unit="day"), pa.int64())
        t = pa.table({"day": d, "user_id": batch["user_id"]})
        return t.group_by(["day", "user_id"],
                          use_threads=False).aggregate([])

    pre = ds.map_batches(_days, batch_format="pyarrow", batch_size=131072)
    inner, edge = sorted_groupby(pre, ["day", "user_id"],
                                 [(None, "count_all", "_n")])
    act = inner.select_columns(["day", "user_id"])
    if edge is not None and edge.num_rows:
        act = act.union(rd.from_arrow(edge.select(["day", "user_id"])))
    act = act.materialize()

    def _day_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["day"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    dau = (act.map_batches(_day_counts, batch_format="pyarrow",
                           batch_size=None).to_pandas()
           .groupby("day")["n"].sum())

    day_us = 86_400_000_000

    def _scatter(t: pa.Table) -> pa.Table:
        d = t["day"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        outs_e = [d + np.int64(i * day_us) for i in range(7)]
        return pa.table({"e": pa.array(np.concatenate(outs_e)),
                         "user_id": pa.array(np.tile(u, 7))})

    w_inner, w_edge = sorted_groupby(
        act.map_batches(_scatter, batch_format="pyarrow",
                        batch_size=131072),
        ["e", "user_id"], [(None, "count_all", "_n")])

    def _e_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["e"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    wau = (w_inner.map_batches(_e_counts, batch_format="pyarrow",
                               batch_size=None).to_pandas()
           .groupby("e")["n"].sum())
    if w_edge is not None and w_edge.num_rows:
        for e, n in w_edge.to_pandas().groupby("e").size().items():
            wau[e] = wau.get(e, 0) + n

    rows = []
    for day in sorted(dau.index):
        d_n, w_n = int(dau[day]), int(wau[day])
        rows.append({"day": pd.Timestamp(day, unit="us"),
                     "dau": d_n, "wau": w_n,
                     "stickiness": round(d_n / w_n, 6)})
    out = pd.DataFrame(rows)
    out["dau"] = out["dau"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    return out


def q_first_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """FIRST-TOUCH REVENUE ATTRIBUTION — every purchase's value credited
    to the channel (event_type) of its user's FIRST event: the marketing
    attribution composite. ONE exchange: first_value_within co-locates
    each user's stream and stamps the first event_type onto every row,
    so the purchase filter + exact-cent sums per first-touch channel
    fold map-side with no separate join."""
    from ..stages.window import first_value_within

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type", "value"])
    stamped = first_value_within(ds, "user_id", ["ts", "event_id"],
                                 "event_type", out_col="first_type")

    def _partial(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["event_type"],
                                    pa.scalar("purchase")))
        vc = pc.cast(pc.round(pc.multiply(
            pc.coalesce(sub["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"first_type": sub["first_type"], "vc": vc})
        g = t.group_by(["first_type"], use_threads=False).aggregate(
            [("vc", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"vc_sum": "vc", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = stamped.map_batches(_partial, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    agg = parts.groupby("first_type", as_index=False)[["vc", "n"]].sum()
    agg["attributed_revenue"] = ((agg["vc"].astype("int64") + 50)
                                 // 100) / 100.0
    agg["n_purchases"] = agg["n"].astype("int64")
    return (agg[["first_type", "attributed_revenue", "n_purchases"]]
            .sort_values("first_type").reset_index(drop=True))


_RULES = [
    # (rule name, target column, violation kernel over the coded batch)
    # thresholds are business expectations, not physical bounds — some
    # intentionally FIRE on valid TPC-H-shaped data (an expectation
    # census with only vacuous rules verifies nothing)
    ("qty_ge_1", "l_quantity"),
    ("qty_le_45", "l_quantity"),
    ("discount_le_6pct", "l_discount"),
    ("tax_le_4pct", "l_tax"),
    ("price_positive", "l_extendedprice"),
    ("returnflag_domain", "l_returnflag"),
    ("linestatus_domain", "l_linestatus"),
    ("shipdate_in_range", "l_shipdate"),
]


def q_rule_census(sf_dir: str) -> pd.DataFrame:
    """EXPECTATION-SUITE CENSUS (Great-Expectations-style rule pack over
    lineitem): eight declarative checks — range, domain, positivity,
    date-window — evaluated in ONE fused zero-exchange pass; each block
    folds all eight to an 8-row (rule, checked, violations) partial, so
    the driver merge is rules×blocks tiny and the fact table is read
    once with only the five touched columns. The reference profiler
    evaluates its checks one full-table pandas pass per rule
    (Profiler.py's per-column loops); here the rule pack shares a single
    scan. Numeric thresholds compare EXACT integer cents/units (the
    suite-wide half-away convention) so the census is bit-identical to
    the SQL twin. violation_share divides two exact int64s, rounded
    6dp."""
    cols = sorted({c for _, c in _RULES})
    ds = _read(sf_dir, "lineitem", cols)
    flag_dom = pa.array(["A", "N", "R"])
    status_dom = pa.array(["O", "F"])
    hi_ship = pa.scalar(np.datetime64("1998-09-01T00:00:00", "us"),
                        pa.timestamp("us"))

    def _partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(batch["l_quantity"],
                               round_mode="half_towards_infinity"),
                      pa.int64())
        disc = pc.cast(pc.round(pc.multiply(batch["l_discount"], 100.0),
                                round_mode="half_towards_infinity"),
                       pa.int64())
        tax = pc.cast(pc.round(pc.multiply(batch["l_tax"], 100.0),
                               round_mode="half_towards_infinity"),
                      pa.int64())
        price = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"],
                                             100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        ship = pc.cast(batch["l_shipdate"], pa.timestamp("us"))
        bad = {
            "qty_ge_1": pc.less(qty, 1),
            "qty_le_45": pc.greater(qty, 45),
            "discount_le_6pct": pc.greater(disc, 6),
            "tax_le_4pct": pc.greater(tax, 4),
            "price_positive": pc.less_equal(price, 0),
            "returnflag_domain": pc.invert(pc.is_in(
                batch["l_returnflag"], value_set=flag_dom)),
            "linestatus_domain": pc.invert(pc.is_in(
                batch["l_linestatus"], value_set=status_dom)),
            "shipdate_in_range": pc.greater_equal(ship, hi_ship),
        }
        names, checked, viols = [], [], []
        for rule, col in _RULES:
            names.append(rule)
            valid = pc.is_valid(batch[col])
            checked.append(pc.count(batch[col], mode="only_valid").as_py())
            v = pc.fill_null(pc.and_kleene(valid, bad[rule]), False)
            viols.append(pc.sum(pc.cast(v, pa.int64())).as_py() or 0)
        return pa.table({"rule": pa.array(names, pa.string()),
                         "checked": pa.array(checked, pa.int64()),
                         "violations": pa.array(viols, pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby("rule", as_index=False)[["checked", "violations"]]
           .sum().sort_values("rule").reset_index(drop=True))
    out["checked"] = out["checked"].astype("int64")
    out["violations"] = out["violations"].astype("int64")
    out["violation_share"] = (out["violations"] / out["checked"]).round(6)
    return out[["rule", "checked", "violations", "violation_share"]]


def q_events_freshness(sf_dir: str) -> pd.DataFrame:
    """PER-SOURCE FRESHNESS / STALENESS check: each event type's latest
    timestamp and its lag behind the globally freshest event — the
    standard "is any upstream feed stale?" monitor over a partitioned
    ingest. One grouped max exchange over the dictionary-sized type
    domain; the global high-water mark folds from that tiny aggregate on
    the driver (never a second scan), so staleness is an exact int64 µs
    difference of already-reduced values."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    inner, edge = sorted_groupby(ds, ["event_type"],
                                 [("ts", "max", "latest_ts")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out["latest_ts"] = out["latest_ts"].astype("datetime64[us]")
    hwm = out["latest_ts"].max()
    out["staleness_us"] = ((hwm - out["latest_ts"])
                           // pd.Timedelta(microseconds=1)).astype("int64")
    return (out[["event_type", "latest_ts", "staleness_us"]]
            .sort_values("event_type").reset_index(drop=True))


def q_hourly_volume_anomalies(sf_dir: str) -> pd.DataFrame:
    """VOLUME-ANOMALY flags: hours whose event count sits more than 3
    population-σ from that type's hourly mean — the drift/outage monitor
    over the aggregated series. One grouped exchange builds the
    (type, hour) counts (bounded by time span × type domain, never the
    fact table — the events_hourly_dense bound); the 3σ gate runs as the
    EXACT integer inequality (n·H − S)² > 9·(H·SS − S²) over per-type
    int64 sums, so flagging is bit-identical to the SQL twin with no
    float threshold ambiguity (int64-safe while n·H < 3·10⁹ — beyond
    that the gate graduates to the same identity in int128/HUGEINT,
    which DuckDB's SUM already uses). z is reported 6dp for humans; the
    gate never reads it."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": batch["event_type"], "hour": hour})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [(None, "count_all", "n")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    g = out.groupby("event_type")["n"].agg(
        nh="count", sn="sum", ssn=lambda s: int((s.astype(object) ** 2).sum()))
    g = g.reset_index()
    m = out.merge(g, on="event_type")
    lhs = (m["n"].astype(object) * m["nh"].astype(object)
           - m["sn"].astype(object)) ** 2
    rhs = 9 * (m["nh"].astype(object) * m["ssn"].astype(object)
               - m["sn"].astype(object) ** 2)
    m = m[lhs > rhs].copy()
    mean = m["sn"] / m["nh"]
    var = m["ssn"] / m["nh"] - (m["sn"] / m["nh"]) ** 2
    m["z"] = ((m["n"] - mean) / np.sqrt(var)).astype("float64").round(6)
    m["hour"] = m["hour"].astype("datetime64[us]")
    return (m[["event_type", "hour", "n", "z"]]
            .sort_values(["event_type", "hour"]).reset_index(drop=True))


def q_welch_t_sources(sf_dir: str) -> pd.DataFrame:
    """PAIRWISE WELCH t-TEST on document length across sources — the
    unequal-variance two-sample location test (extends the suite's
    two-sample family: exact KS, Mann-Whitney U). Zero-exchange
    distributed shape: each block folds (source, n, Σlen, Σlen²) exact
    int64 moment partials via an in-block Arrow groupby; the driver
    merges |sources| rows and forms all source pairs from the reduced
    table (pairs of AGGREGATES — never a row-level self-join). t and the
    Welch–Satterthwaite df derive from exact integer sums through the
    same expression tree as the SQL twin, rounded 6dp. int64-exact while
    Σlen² < 2⁶³ (~10¹² docs at 2k chars); past that the partial
    graduates to float128/HUGEINT like the twin's SUM."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch["n_chars"], batch["n_chars"])
        t = pa.table({"source": batch["source"], "x": batch["n_chars"],
                      "sq": sq})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [("x", "count"), ("x", "sum"), ("sq", "sum")])
        return g.rename_columns(
            [{"x_count": "n", "x_sum": "s1", "sq_sum": "s2"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    agg = (parts.groupby("source", as_index=False)[["n", "s1", "s2"]]
           .sum().sort_values("source").reset_index(drop=True))
    rows = []
    recs = list(agg.itertuples(index=False))
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            na, nb = int(a.n), int(b.n)
            if na < 2 or nb < 2:
                continue
            ma, mb = a.s1 / na, b.s1 / nb
            va = (a.s2 - a.s1 * a.s1 / na) / (na - 1)
            vb = (b.s2 - b.s1 * b.s1 / nb) / (nb - 1)
            se2 = va / na + vb / nb
            t_stat = (ma - mb) / np.sqrt(se2)
            df = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                             + (vb / nb) ** 2 / (nb - 1))
            rows.append((a.source, b.source, na, nb,
                         round(t_stat, 6), round(df, 6)))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                       "n_b", "t_stat", "df"]).astype(
        {"n_a": "int64", "n_b": "int64"})


def q_event_order_conformance(sf_dir: str) -> pd.DataFrame:
    """ORDER-CONFORMANCE census: replaying each user's stream in
    event_id (stored surrogate) order, does the wall-clock timestamp
    ever step BACKWARD? The north-rule "stable (conv_id, turn_idx)
    ordering" validator — on conforming ingest the violation count is
    zero and the census PROVES it over every adjacent pair.
    stages.window.order_conformance_census: one sort, per-block
    vectorized inversion scan, O(blocks) boundary stitch; only violating
    partitions ride the merge exchange, so the conforming case moves ~0
    rows after the sort."""
    from ..stages.window import order_conformance_census

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    pairs, inner, edge = order_conformance_census(
        ds, "user_id", "event_id", "ts")
    v = inner.to_pandas()
    if edge is not None and edge.num_rows:
        v = pd.concat([v, edge.to_pandas()], ignore_index=True)
    if v.empty or "user_id" not in v.columns:
        # a conforming corpus moves ZERO violator rows — an all-empty
        # merge can drop the key column entirely (empty-block class)
        viol_total, users = 0, 0
    else:
        v = v.groupby("user_id", as_index=False)["viol"].sum()
        viol_total = int(v["viol"].sum())
        users = int((v["viol"] > 0).sum())
    return pd.DataFrame({
        "pairs_checked": pd.Series([pairs], dtype="int64"),
        "violations": pd.Series([viol_total], dtype="int64"),
        "users_affected": pd.Series([users], dtype="int64"),
    })


def q_js_drift_roles(sf_dir: str) -> pd.DataFrame:
    """JENSEN–SHANNON divergence between the role-frequency (event-type)
    distributions of the corpus' earlier and later halves — the third
    member of the drift family (KS `ks_drift`, PSI `psi_drift`; north
    star names "distribution-drift checks … on role-frequency
    histograms"). Two zero-exchange scans: pass 1 folds per-block
    (min, max) ts partials to the exact int64 µs midpoint; pass 2 folds
    per-block (half, type) count partials (≤ 2×|types| rows each). JSD
    derives from exact integer counts; log terms ride the 6dp rounding
    margin like the entropy family."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _minmax(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"mn": pa.array([pc.min(us).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(us).as_py()], pa.int64())})

    mm = ds.map_batches(_minmax, batch_format="pyarrow",
                        batch_size=131072).to_pandas()
    mid = (int(mm["mn"].min()) + int(mm["mx"].max())) // 2

    def _counts(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        half = pc.if_else(pc.less_equal(us, pa.scalar(mid, pa.int64())),
                          pa.scalar("a"), pa.scalar("b"))
        t = pa.table({"half": half, "event_type": batch["event_type"]})
        g = t.group_by(["half", "event_type"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_counts, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    agg = (parts.groupby(["half", "event_type"], as_index=False)["n"].sum()
           .pivot(index="event_type", columns="half", values="n")
           .reindex(columns=["a", "b"]).fillna(0).astype("int64")
           .sort_index())
    na_tot, nb_tot = int(agg["a"].sum()), int(agg["b"].sum())
    p = agg["a"].to_numpy() / na_tot
    q = agg["b"].to_numpy() / nb_tot
    m = (p + q) / 2
    ta = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0) / m), 0.0)
    tb = np.where(q > 0, q * np.log(np.where(q > 0, q, 1.0) / m), 0.0)
    jsd = round(0.5 * ta.sum() + 0.5 * tb.sum(), 6)
    return pd.DataFrame({
        "n_baseline": pd.Series([na_tot], dtype="int64"),
        "n_current": pd.Series([nb_tot], dtype="int64"),
        "js_divergence": pd.Series([jsd], dtype="float64"),
    })


def q_monthly_revenue_mom(sf_dir: str) -> pd.DataFrame:
    """AGGREGATE-THEN-WINDOW with a RATIO: monthly discounted revenue
    and its month-over-month percent change. One grouped exchange to the
    month grain with the suite's exact cent² revenue convention; the MoM
    ratio divides the exact pre-scaling integers (never the rounded
    display values), so the 6dp percentage is bit-identical to the twin.
    First month drops on both sides (no LAG)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_discount"])

    def _pre(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(
            pc.cast(batch["l_shipdate"], pa.timestamp("us")), unit="month")
        pcents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"],
                                              100.0),
                                  round_mode="half_towards_infinity"),
                         pa.int64())
        dcents = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"month": month,
                         "rc": pc.multiply(pcents, dcents)})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["month"], [("rc", "sum", "rc")])
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out = (out.groupby("month", as_index=False)["rc"].sum()
           .sort_values("month").reset_index(drop=True))
    out["month"] = out["month"].astype("datetime64[us]")
    rc = out["rc"].astype("int64")
    out["revenue"] = ((rc + 50) // 100) / 100.0
    prev = rc.shift(1)
    out["mom_pct"] = (100.0 * (rc - prev) / prev).round(6)
    out = out.dropna(subset=["mom_pct"]).reset_index(drop=True)
    return out[["month", "revenue", "mom_pct"]]


def q_robust_outliers_by_flag(sf_dir: str) -> pd.DataFrame:
    """ROBUST (median/MAD) outlier gate per group — the
    non-parametric twin of the z-score screen (A11): rows where
    |x − median_g| > 3·MAD_g, counted per l_returnflag. Three passes:
    two grouped-median exchanges (the mad_by_flag machinery) and one
    zero-exchange counting scan with the tiny (flag → median, MAD) map
    broadcast into every block. Quantities are dyadic rationals
    (integers; medians at worst .5), so the float gate is EXACT on both
    engines — no threshold ambiguity."""
    from ..stages.fast_ops import grouped_median

    g, v = "l_returnflag", "l_quantity"
    li = _read(sf_dir, "lineitem", [g, v])
    med = grouped_median(li, g, v)
    m_of = dict(zip(med[g].to_pylist(), med["median"].to_pylist()))

    def _absdev(batch: pa.Table) -> pa.Table:
        ga = batch[g].to_numpy(zero_copy_only=False)
        va = batch[v].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(ga, return_inverse=True)
        ma = np.array([m_of.get(k, np.nan) for k in uniq])[inv]
        dev = np.abs(va - ma)
        keep = ~np.isnan(dev)
        return pa.table({g: batch[g].filter(pa.array(keep)),
                         "absdev": pa.array(dev[keep], pa.float64())})

    mad = grouped_median(
        li.map_batches(_absdev, batch_format="pyarrow", batch_size=131072),
        g, "absdev")
    mad_of = dict(zip(mad[g].to_pylist(), mad["median"].to_pylist()))

    def _gate(batch: pa.Table) -> pa.Table:
        ga = batch[g].to_numpy(zero_copy_only=False)
        va = batch[v].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(ga, return_inverse=True)
        ma = np.array([m_of.get(k, np.nan) for k in uniq])[inv]
        da = np.array([mad_of.get(k, np.nan) for k in uniq])[inv]
        out_mask = np.abs(va - ma) > 3.0 * da
        t = pa.table({g: batch[g],
                      "o": pa.array(out_mask.astype(np.int64))})
        gg = t.group_by([g], use_threads=False).aggregate(
            [("o", "sum"), ([], "count_all")])
        return gg.rename_columns(
            [{"o_sum": "n_outliers", "count_all": "n"}.get(c, c)
             for c in gg.column_names])

    parts = li.map_batches(_gate, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby(g, as_index=False)[["n_outliers", "n"]].sum()
           .sort_values(g).reset_index(drop=True))
    out["median"] = out[g].map(m_of).round(6)
    out["mad"] = out[g].map(mad_of).round(6)
    out["n"] = out["n"].astype("int64")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    out["outlier_share"] = (out["n_outliers"] / out["n"]).round(6)
    return out[[g, "median", "mad", "n", "n_outliers", "outlier_share"]]


def q_price_gmean_by_flag(sf_dir: str) -> pd.DataFrame:
    """GEOMETRIC and HARMONIC means of l_extendedprice per returnflag —
    the multiplicative/rate-correct location estimates (complete the
    suite's location family: mean, median, winsorized, trimmed-robust).
    Zero-exchange: each block folds (flag, n, Σln x, Σ1/x) partials via
    an in-block Arrow groupby; the driver merges |flags| rows and
    finalizes exp(Σln/n) and n/Σ(1/x). Positive-only domain guard
    mirrors the twin's WHERE x > 0. Log/reciprocal sums ride the 6dp
    rounding margin (entropy-family precedent; per-element libm
    differences are ~1 ulp)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def _partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["l_extendedprice"], 0.0)
        x = batch["l_extendedprice"].filter(keep)
        f = batch["l_returnflag"].filter(keep)
        t = pa.table({"f": f, "ln": pc.ln(x),
                      "inv": pc.divide(pa.scalar(1.0), x)})
        g = t.group_by(["f"], use_threads=False).aggregate(
            [("ln", "sum"), ("inv", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"ln_sum": "sln", "inv_sum": "sinv", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby("f", as_index=False)[["sln", "sinv", "n"]].sum()
           .sort_values("f").reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    out["gmean"] = np.exp(out["sln"] / out["n"]).round(6)
    out["hmean"] = (out["n"] / out["sinv"]).round(6)
    out = out.rename(columns={"f": "l_returnflag"})
    return out[["l_returnflag", "n", "gmean", "hmean"]]


def q_assoc_type_dow(sf_dir: str) -> pd.DataFrame:
    """CATEGORICAL ASSOCIATION strength (event_type × day-of-week):
    mutual information (nats) and Cramér's V — the effect-size
    companions to the suite's χ² independence test (`chi2_type_dow`).
    Same distributed shape: one zero-exchange scan folding ≤|types×7|
    contingency partials per block; margins and both statistics
    finalize on the driver. Every term is a single float expression
    over exact integer counts/margins (n·N / (r·c) ratios of exact
    int64 products), so the 6dp results match the SQL twin."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _partial(batch: pa.Table) -> pa.Table:
        dow = pc.cast(pc.day_of_week(pc.cast(batch["ts"], pa.timestamp("us")),
                                     week_start=7), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "dow": dow})
        g = t.group_by(["event_type", "dow"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    cells = parts.groupby(["event_type", "dow"], as_index=False)["n"].sum()
    row_m = cells.groupby("event_type")["n"].sum().to_dict()
    col_m = cells.groupby("dow")["n"].sum().to_dict()
    tot = int(cells["n"].sum())
    mi = chi2 = 0.0
    for _, r in cells.iterrows():
        n = int(r["n"])
        rm, cm = int(row_m[r["event_type"]]), int(col_m[r["dow"]])
        mi += (n / tot) * np.log((n * tot) / (rm * cm))
        e = (rm * cm) / tot
        chi2 += (n - e) * (n - e) / e
    k = min(len(row_m) - 1, len(col_m) - 1)
    v = float(np.sqrt(chi2 / (tot * k))) if k > 0 else 0.0
    return pd.DataFrame({
        "n": pd.Series([tot], dtype="int64"),
        "mi_nats": pd.Series([round(mi, 6)], dtype="float64"),
        "cramers_v": pd.Series([round(v, 6)], dtype="float64"),
    })


def q_top_parts_per_flag_ties(sf_dir: str) -> pd.DataFrame:
    """GROUPED TOP-K WITH TIES — SQL RANK() (not ROW_NUMBER) ≤ 3 per
    group, so revenue ties all surface: the tie-correct variant of
    `top_orders_per_customer`. Two exchanges: (flag, part) exact-cent²
    revenue sums, then stages.window.rank_within (descending,
    tie-aware cross-block carry) over the aggregate keyed by a packed
    flag·2⁴⁰+part int64 id (documented bound: partkey < 2⁴⁰ — beyond
    that the id becomes a two-column key through the same carry).
    Ranking compares EXACT integers, so tie groups are bit-identical to
    the twin's."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import rank_within

    flags = ["A", "N", "R"]
    farr = pa.array(flags)
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_partkey", "l_extendedprice",
                "l_discount"])

    def _pre(batch: pa.Table) -> pa.Table:
        pcents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"],
                                              100.0),
                                  round_mode="half_towards_infinity"),
                         pa.int64())
        dcents = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), batch["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "l_partkey": batch["l_partkey"],
                         "rc": pc.multiply(pcents, dcents)})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["l_returnflag", "l_partkey"], [("rc", "sum", "rc")])
    agg = inner
    if edge is not None and edge.num_rows:
        agg = agg.union(rd.from_arrow(edge))

    def _pack(t: pa.Table) -> pa.Table:
        fcode = pc.cast(pc.index_in(t["l_returnflag"], value_set=farr),
                        pa.int64())
        pid = pc.add(pc.shift_left(fcode, 40), t["l_partkey"])
        return pa.table({"fcode": fcode, "pid": pid, "rc": t["rc"]})

    packed = agg.map_batches(_pack, batch_format="pyarrow",
                             batch_size=131072).materialize()
    ranks = rank_within(packed, "fcode", "rc", "pid",
                        descending=True).to_pandas()
    top = ranks[ranks["rank"] <= 3].copy()
    top["l_returnflag"] = top["id"].to_numpy() >> 40
    top["l_returnflag"] = top["l_returnflag"].map(dict(enumerate(flags)))
    top["l_partkey"] = (top["id"] & ((1 << 40) - 1)).astype("int64")
    # recover the 9-ish winning revenues via a broadcast id filter —
    # never the whole aggregate table on the driver
    want = pa.array(top["id"].to_numpy(), pa.int64())
    hits = packed.map_batches(
        lambda t: t.filter(pc.is_in(t["pid"], value_set=want)),
        batch_format="pyarrow", batch_size=131072).to_pandas()
    top["rc"] = top["id"].map(hits.set_index("pid")["rc"]).astype("int64")
    top["revenue"] = ((top["rc"] + 50) // 100) / 100.0
    top["rnk"] = top["rank"].astype("int64")
    return (top[["l_returnflag", "l_partkey", "revenue", "rnk"]]
            .sort_values(["l_returnflag", "rnk", "l_partkey"])
            .reset_index(drop=True))


def q_dow_hour_heatmap(sf_dir: str) -> pd.DataFrame:
    """DAY-OF-WEEK × HOUR activity heatmap — the classic 7×24 seasonal
    usage grid (histogram family A24, rendered by the report layer).
    One zero-exchange scan: per-block ≤168-cell contingency partials,
    driver fold. Exact integer counts only."""
    ds = _read(sf_dir, "events", ["ts"])

    def _partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.timestamp("us"))
        dow = pc.cast(pc.day_of_week(ts, week_start=7), pa.int64())
        hr = pc.cast(pc.hour(ts), pa.int64())
        t = pa.table({"dow": dow, "hr": hr})
        g = t.group_by(["dow", "hr"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby(["dow", "hr"], as_index=False)["n"].sum()
           .sort_values(["dow", "hr"]).reset_index(drop=True))
    for c in ["dow", "hr", "n"]:
        out[c] = out[c].astype("int64")
    return out


def q_customer_ltv_deciles(sf_dir: str) -> pd.DataFrame:
    """CUSTOMER LIFETIME-VALUE DECILES — the aggregate-then-globally-
    rank composite (per-customer spend → deterministic global ordering
    → equal-width decile census): who holds the revenue. Two exchanges:
    (custkey) exact-cent spend sums, then ONE global sort via
    row_number_within on a constant partition key (the hot single
    partition is exactly the cross-block carry chain's design case —
    range partitioning spreads it; no driver materialization of the
    customer table). The decile label is the EXACT integer formula
    ((rn−1)·10)//n over a (spend, custkey)-deterministic row number, so
    tie placement is bit-identical to the twin (NTILE's ceil/floor split
    is deliberately avoided — its bucket-size convention differs from
    the fixed-width formula both engines share here)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import row_number_within

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _pre(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"o_custkey": batch["o_custkey"], "sc": cents})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["o_custkey"], [("sc", "sum", "sc")])
    spend = inner
    if edge is not None and edge.num_rows:
        spend = spend.union(rd.from_arrow(edge))

    def _const(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows,
                                                      np.int64)))

    numbered = row_number_within(
        spend.map_batches(_const, batch_format="pyarrow",
                          batch_size=131072),
        "g", ["sc", "o_custkey"], out_col="rn", start=1)
    n_total = numbered.count()

    def _census(t: pa.Table) -> pa.Table:
        dec = pc.divide(pc.multiply(pc.subtract(t["rn"], 1), 10),
                        pa.scalar(n_total, pa.int64()))
        tt = pa.table({"decile": dec, "sc": t["sc"]})
        g = tt.group_by(["decile"], use_threads=False).aggregate(
            [("sc", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"sc_sum": "sc", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = numbered.map_batches(_census, batch_format="pyarrow",
                                 batch_size=131072).to_pandas()
    out = (parts.groupby("decile", as_index=False)[["sc", "n"]].sum()
           .sort_values("decile").reset_index(drop=True))
    out["decile"] = out["decile"].astype("int64")
    out["n_customers"] = out["n"].astype("int64")
    sc = out["sc"].astype("int64")
    out["total_spend"] = ((sc + 50) // 100) / 100.0
    out["avg_spend"] = (sc / 100.0 / out["n_customers"]).round(6)
    return out[["decile", "n_customers", "total_spend", "avg_spend"]]


ORACLE: dict[str, str] = {
    "profile_null_counts": _NULLCOUNT_UNION,
    "numeric_stats": _NUMSTATS_UNION,
    "distinct_counts": _DISTINCT_UNION,
    "top_orderpriority": (
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority"
    ),
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
               ROUND(SUM(l_extendedprice) / COUNT(*), 6) AS avg_price,
               ROUND(SUM(l_discount) / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "dup_custkeys": (
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING COUNT(*) > 1"
    ),
    "referential_counts": _REF_UNION,
    "transcripts": _TRANSCRIPTS_SQL + " ORDER BY conv_id, turn_idx",
    "conv_stats": f"""
        WITH t AS ({_TRANSCRIPTS_SQL})
        SELECT conv_id, COUNT(*) AS n_turns,
               CAST(MAX(turn_idx) AS INTEGER) AS max_turn_idx,
               COUNT(tool) AS n_tool_turns
        FROM t GROUP BY conv_id
    """,
    "role_transitions": f"""
        WITH t AS ({_TRANSCRIPTS_SQL}),
        l AS (
            SELECT role,
                   LAG(role) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS prev_role
            FROM t
        )
        SELECT prev_role, role, COUNT(*) AS n
        FROM l WHERE prev_role IS NOT NULL
        GROUP BY prev_role, role
        ORDER BY prev_role, role
    """,
    "conv_documents": f"""
        WITH t AS ({_TRANSCRIPTS_SQL})
        SELECT conv_id,
               STRING_AGG(text, chr(10) ORDER BY turn_idx) AS doc,
               COUNT(text) AS n_text_turns
        FROM t GROUP BY conv_id
        HAVING COUNT(text) > 0
        ORDER BY conv_id
    """,
    "response_latency": f"""
        WITH t AS ({_TRANSCRIPTS_SQL}),
        l AS (
            SELECT role,
                   LAG(role) OVER w AS prev_role,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS d
            FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        )
        SELECT prev_role, role, COUNT(*) AS n,
               ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS avg_gap_us,
               CAST(MAX(d) AS BIGINT) AS max_gap_us
        FROM l WHERE prev_role IS NOT NULL
        GROUP BY prev_role, role
        ORDER BY prev_role, role
    """,
    "role_alternation": f"""
        WITH t AS ({_TRANSCRIPTS_SQL}),
        l AS (
            SELECT conv_id,
                   CASE WHEN role = LAG(role) OVER (PARTITION BY conv_id
                                                    ORDER BY turn_idx)
                        THEN 1 ELSE 0 END AS same
            FROM t
        ),
        p AS (
            SELECT conv_id, COUNT(*) AS n_turns, SUM(same) AS same_pairs
            FROM l GROUP BY conv_id HAVING COUNT(*) >= 2
        )
        SELECT (same_pairs = 0) AS alternating,
               CAST(COUNT(*) AS BIGINT) AS n_convs
        FROM p GROUP BY 1 ORDER BY 1
    """,
    "third_event_ts_per_user": """
        WITH e AS (
            SELECT user_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        )
        SELECT user_id, ts AS third_ts, CAST(n AS BIGINT) AS n
        FROM e WHERE rn = 3 ORDER BY user_id
    """,
    "conv_size_gini": """
        WITH sz AS (SELECT user_id, COUNT(*) AS n_turns
                    FROM events GROUP BY 1),
        r AS (SELECT n_turns,
                     ROW_NUMBER() OVER (ORDER BY n_turns) AS i
              FROM sz)
        SELECT ROUND((2.0 * SUM(i * n_turns)
                      - (COUNT(*) + 1.0) * SUM(n_turns))
                     / (COUNT(*) * 1.0 * SUM(n_turns)), 6) AS gini,
               CAST(COUNT(*) AS BIGINT) AS n_convs,
               CAST(SUM(n_turns) AS BIGINT) AS total_turns
        FROM r
    """,
    "conv_boundary_roles": f"""
        WITH t AS ({_TRANSCRIPTS_SQL}),
        b AS (
            SELECT conv_id,
                   FIRST_VALUE(role) OVER w AS first_role,
                   LAST_VALUE(role) OVER (PARTITION BY conv_id
                       ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS last_role,
                   ROW_NUMBER() OVER w AS rn
            FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        )
        SELECT first_role, last_role, CAST(COUNT(*) AS BIGINT) AS n_convs
        FROM b WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "funnel_subsequence": """
        WITH e AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS ord
            FROM events
        ),
        a AS (SELECT user_id, MIN(ord) AS i FROM e
              WHERE event_type = 'view' GROUP BY user_id),
        b AS (SELECT e.user_id, MIN(ord) AS j FROM e JOIN a USING (user_id)
              WHERE event_type = 'click' AND ord > a.i GROUP BY e.user_id),
        c AS (SELECT e.user_id FROM e JOIN b USING (user_id)
              WHERE event_type = 'purchase' AND ord > b.j GROUP BY e.user_id)
        SELECT user_id FROM c ORDER BY user_id
    """,
    "conv_null_tool_runs": f"""
        WITH t AS ({_TRANSCRIPTS_SQL}),
        m AS (
            SELECT conv_id,
                   CASE WHEN tool IS NULL THEN 1 ELSE 0 END AS f,
                   ROW_NUMBER() OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx)
                   - ROW_NUMBER() OVER (PARTITION BY conv_id, (tool IS NULL)
                                        ORDER BY turn_idx) AS grp
            FROM t
        ),
        r AS (SELECT conv_id, grp, COUNT(*) AS len
              FROM m WHERE f = 1 GROUP BY conv_id, grp),
        n AS (SELECT conv_id, COUNT(*) AS n_rows FROM t GROUP BY conv_id)
        SELECT r.conv_id, CAST(MAX(r.len) AS BIGINT) AS longest_run,
               CAST(MAX(n.n_rows) AS BIGINT) AS n_rows
        FROM r JOIN n USING (conv_id)
        GROUP BY r.conv_id ORDER BY conv_id
    """,
    "tool_set_similarity": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        codes AS (
            SELECT user_id,
                   CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                        WHEN 'signup' THEN 2 WHEN 'purchase' THEN 3
                        WHEN 'error' THEN 4 END AS c
            FROM d
        ),
        mask AS (SELECT user_id, SUM(1 << c) AS m FROM codes GROUP BY 1),
        census AS (SELECT m, COUNT(*) AS n_users FROM mask GROUP BY 1)
        SELECT CAST(a.m AS BIGINT) AS mask_a, CAST(b.m AS BIGINT) AS mask_b,
               CAST(a.n_users * b.n_users AS BIGINT) AS n_pairs,
               ROUND(CAST(bit_count(a.m & b.m) AS DOUBLE)
                     / bit_count(a.m | b.m), 6) AS jaccard
        FROM census a JOIN census b ON a.m < b.m
        ORDER BY mask_a, mask_b
    """,
    "docs_ksample_per_source": """
        SELECT source, doc_id FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 5
        ORDER BY source, doc_id
    """,
    "value_hist": """
        SELECT CAST(FLOOR(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)
                          / 500.0) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "user_breadth_hist": """
        SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM (SELECT user_id,
                     CAST(COUNT(DISTINCT event_type) AS BIGINT) AS breadth
              FROM events GROUP BY user_id)
        GROUP BY breadth ORDER BY breadth
    """,
    "hourly_delta": """
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        l AS (
            SELECT event_type, hour, n,
                   n - LAG(n) OVER (PARTITION BY event_type
                                    ORDER BY hour) AS delta
            FROM c
        )
        SELECT event_type, hour, CAST(n AS BIGINT) AS n,
               CAST(delta AS BIGINT) AS delta
        FROM l WHERE delta IS NOT NULL
        ORDER BY event_type, hour
    """,
    "median_gap_by_user": """
        WITH l AS (
            SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap
            FROM events
        ),
        c AS (SELECT user_id, gap AS gap_us, COUNT(*) AS w
              FROM l WHERE gap IS NOT NULL GROUP BY 1, 2),
        r AS (SELECT user_id, gap_us, w,
                     SUM(w) OVER (PARTITION BY user_id ORDER BY gap_us
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(w) OVER (PARTITION BY user_id) AS tot
              FROM c)
        SELECT user_id, CAST(MIN(gap_us) AS BIGINT) AS median_gap_us,
               CAST(MAX(tot) AS BIGINT) AS n_gaps
        FROM r WHERE 2 * cum >= tot
        GROUP BY user_id ORDER BY user_id
    """,
    "user_coverage": """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + 300000000 AS e, event_id
            FROM events
        ),
        m AS (
            SELECT user_id, s, e,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
            FROM e
        ),
        g AS (
            SELECT user_id, s, e,
                   SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS grp
            FROM m
        ),
        i AS (
            SELECT user_id, grp, MIN(s) AS s0, MAX(e) AS e1
            FROM g GROUP BY 1, 2
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
        FROM i GROUP BY user_id ORDER BY user_id
    """,
    "time_weighted_value": """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS tu,
                   CAST(ROUND(value * 100) AS BIGINT) AS vc, event_id
            FROM events
        ),
        l AS (
            SELECT user_id, vc,
                   LEAD(tu) OVER (PARTITION BY user_id
                                  ORDER BY tu, event_id) - tu AS dt
            FROM e
        ),
        a AS (
            SELECT user_id, COUNT(*) AS n_events,
                   SUM(vc * dt) AS wsum, SUM(dt) AS span_us
            FROM l GROUP BY user_id
            HAVING COUNT(*) >= 2 AND SUM(dt) > 0
        )
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
               CAST(span_us AS BIGINT) AS span_us,
               ROUND(CAST(wsum AS DOUBLE)
                     / (CAST(span_us AS DOUBLE) * 100.0), 6) AS twa_value
        FROM a ORDER BY user_id
    """,
    "user_retention": """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
            FROM events
        ),
        f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
               COUNT(*) AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "gini_by_priority": """
        WITH r AS (
            SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rn
            FROM orders
        )
        SELECT o_orderpriority,
               ROUND((2.0 * CAST(SUM(rn * cents) AS DOUBLE)
                      - (COUNT(*) + 1.0) * CAST(SUM(cents) AS DOUBLE))
                     / ((COUNT(*) * 1.0) * CAST(SUM(cents) AS DOUBLE)),
                     6) AS gini
        FROM r GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "weighted_median_price": """
        WITH vc AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
                   SUM(CAST(l_quantity AS BIGINT)) AS w
            FROM lineitem GROUP BY 1, 2
        ),
        cw AS (
            SELECT l_returnflag, c, w,
                   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum,
                   SUM(w) OVER (PARTITION BY l_returnflag) AS tot
            FROM vc
        )
        SELECT l_returnflag, ROUND(MIN(c) / 100.0, 2) AS weighted_median_price
        FROM cw WHERE 2 * cum >= tot
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "price_deciles_by_flag": """
        WITH vc AS (
            SELECT l_returnflag AS g,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
                   COUNT(*) AS w
            FROM lineitem GROUP BY 1, 2
        ),
        cw AS (
            SELECT g, c, w,
                   SUM(w) OVER (PARTITION BY g ORDER BY c) AS cum,
                   SUM(w) OVER (PARTITION BY g) AS tot
            FROM vc
        ),
        d AS (SELECT unnest(range(1, 10)) AS dec)
        SELECT g AS l_returnflag, CAST(dec AS BIGINT) AS decile,
               ROUND(MIN(c) / 100.0, 2) AS value
        FROM cw, d
        WHERE 10 * cum >= dec * tot
        GROUP BY g, dec
        ORDER BY g, dec
    """,
    "conv_tool_ffill": f"""
        WITH t AS ({_TRANSCRIPTS_SQL})
        SELECT conv_id, turn_idx,
               LAST_VALUE(tool IGNORE NULLS) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS tool_filled
        FROM t ORDER BY conv_id, turn_idx
    """,
    "rolling_median_value": """
        SELECT event_id, ROUND(MEDIAN(value) OVER w, 6) AS roll_median,
               COUNT(*) OVER w AS n_win
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "docs_stats": """
        SELECT COUNT(*) AS n_docs,
               COUNT(*) - COUNT(text) AS null_text,
               COUNT(*) FILTER (text IS NOT NULL AND TRIM(text, ' \t\n\r') = '') AS blank_text,
               COUNT(DISTINCT lang) AS distinct_langs,
               MAX(LENGTH(text)) AS max_text_len
        FROM documents
    """,
    "dedup_exact": (
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"
    ),
    "doc_packing": """
        WITH tok AS (
          SELECT doc_id,
                 COALESCE(CAST(LENGTH(regexp_extract_all(text, '\\S+'))
                               AS BIGINT), 0) AS n_tokens
          FROM documents),
        w AS (
          SELECT doc_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM tok)
        SELECT doc_id, n_tokens,
               (cum - n_tokens) // 2048 AS pack_first,
               (cum - 1) // 2048 AS pack_last
        FROM w ORDER BY doc_id
    """,
    "docs_tokens": """
        SELECT doc_id,
               CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT) AS token_count,
               CAST(LENGTH(text) AS BIGINT) AS char_count
        FROM documents
    """,
    "moments": "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column, ROUND(skewness({c}), 6) AS skew, "
        f"ROUND(kurtosis({c}), 6) AS kurt FROM lineitem"
        for c in LINEITEM_NUMERIC
    ),
    "outlier_pct": "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column,
            ROUND(100.0 * COUNT(*) FILTER (
              ABS({c} - (SELECT AVG({c}) FROM lineitem))
                / (SELECT STDDEV({c}) FROM lineitem) > 3) / COUNT(*), 6) AS outlier_pct
            FROM lineitem"""
        for c in LINEITEM_NUMERIC
    ),
    "decimal_places": "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column, CAST(MAX(LENGTH(RTRIM(SPLIT_PART(CAST({c} AS VARCHAR), '.', 2), '0'))) AS BIGINT) AS max_decimal_places FROM lineitem"
        for c in ["l_extendedprice", "l_discount", "l_tax"]
    ),
    "qty_quartiles_by_status": """
        SELECT l_linestatus,
               ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
               ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
               ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "median_qty_by_flag": """
        SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 6) AS median_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "shipdate_parts": """
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS y,
               CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS m,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1, 2
    """,
    "events_hour_hist": """
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "mode_priority_by_status": """
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY 1, 2)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY n DESC, o_orderpriority) = 1
        ORDER BY o_orderstatus
    """,
    "q4_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                                           + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """,
    "q3_shipping": """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    "ks_drift": """
        WITH x AS (
          SELECT l_quantity AS v,
                 CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS g
          FROM lineitem WHERE l_linestatus IN ('O', 'F')
        ),
        tot AS (SELECT SUM(g) AS n1, SUM(1 - g) AS n0 FROM x),
        s AS (
          SELECT v,
                 SUM(g)     OVER (ORDER BY v) AS c1,
                 SUM(1 - g) OVER (ORDER BY v) AS c0
          FROM x
        )
        SELECT ROUND(MAX(ABS(CAST(c1 AS DOUBLE) / (SELECT n1 FROM tot)
                           - CAST(c0 AS DOUBLE) / (SELECT n0 FROM tot))), 6) AS ks
        FROM s
    """,
    "event_lead": """
        SELECT event_id,
               EPOCH_US(LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS next_us
        FROM events ORDER BY event_id
    """,
    "latest_event_per_user": """
        SELECT user_id, ts, event_id, event_type
        FROM events
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id ASC) = 1
        ORDER BY user_id
    """,
    "lineitem_measures_melt": """
        WITH m AS (
          SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT 'l_discount', l_discount FROM lineitem
          UNION ALL
          SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT measure, ROUND(SUM(value), 2) AS sum_v, COUNT(*) AS n
        FROM m GROUP BY measure ORDER BY measure
    """,
    "psi_drift": """
        WITH c AS (
          SELECT event_type,
                 SUM(CASE WHEN ts <  TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS ce,
                 SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS cl
          FROM events GROUP BY 1
        ),
        tot AS (SELECT SUM(ce) AS ne, SUM(cl) AS nl FROM c)
        SELECT ROUND(SUM((p - q) * LN(p / q)), 6) AS psi
        FROM (
          SELECT GREATEST(CAST(cl AS DOUBLE) / (SELECT nl FROM tot), 1e-4) AS p,
                 GREATEST(CAST(ce AS DOUBLE) / (SELECT ne FROM tot), 1e-4) AS q
          FROM c
        )
    """,
    "orders_with_events": """
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
        ORDER BY o_orderkey
    """,
    "orders_without_events": """
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
        ORDER BY o_orderkey
    """,
    "activity_full_outer": """
        WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders
                   FROM orders GROUP BY 1),
             e AS (SELECT user_id AS k, COUNT(*) AS n_events
                   FROM events GROUP BY 1)
        SELECT COALESCE(o.k, e.k) AS k,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(e.n_events, 0) AS n_events
        FROM o FULL OUTER JOIN e ON o.k = e.k
        ORDER BY k
    """,
    "stratified_orders": """
        SELECT o_orderpriority, o_orderkey FROM orders
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY o_orderpriority
          ORDER BY (o_orderkey * 2654435761) % 4294967296 DESC, o_orderkey
        ) <= 3
        ORDER BY o_orderpriority, o_orderkey
    """,
    # revenue in exact integer 10^-4 units on both sides: the 2dp price
    # and 2dp discount factors are recast to integer cents before the
    # multiply, so the grouped sum is association-free (bit-identical
    # under any distribution) — ROUND(SUM(price*(1-disc)),2) in exact
    # decimal arithmetic
    "q5_local_supplier_volume": """
        SELECT n_name,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                 + 50) // 100) / 100.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "corpus_prep": """
        WITH tok AS (
            SELECT doc_id, text,
                   COALESCE(CAST(LENGTH(regexp_extract_all(text, '\\S+'))
                                 AS BIGINT), 0) AS n_tokens
            FROM documents WHERE text IS NOT NULL
        ),
        valid AS (SELECT * FROM tok WHERE n_tokens >= 5),
        kept AS (
            SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
            FROM valid GROUP BY text
        ),
        w AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM kept
        )
        SELECT doc_id, n_tokens,
               (cum - n_tokens) // 512 AS pack_first,
               (cum - 1) // 512 AS pack_last
        FROM w ORDER BY doc_id
    """,
    "corr_by_returnflag": """
        SELECT l_returnflag, ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "regr_by_flag": """
        SELECT l_returnflag,
               CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6)
                   AS intercept,
               ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "iqr_outliers": """
        WITH b AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS q1,
                   quantile_cont(l_extendedprice, 0.75) AS q3
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               ROUND(ANY_VALUE(b.q1), 6) AS q1,
               ROUND(ANY_VALUE(b.q3), 6) AS q3,
               CAST(SUM(CASE WHEN l.l_extendedprice < b.q1 - 1.5 * (b.q3 - b.q1)
                          OR l.l_extendedprice > b.q3 + 1.5 * (b.q3 - b.q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
               COUNT(*) AS n_rows
        FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    "price_p90_disc": """
        SELECT l_returnflag,
               ROUND(quantile_disc(l_extendedprice, 0.5), 2) AS p50,
               ROUND(quantile_disc(l_extendedprice, 0.9), 2) AS p90
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "weighted_avg_discount": """
        SELECT l_returnflag,
               ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_discount * 10000) AS BIGINT))
                     / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                            AS DOUBLE) / 10000.0, 9) AS wavg_discount
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "mad_by_flag": """
        WITH m AS (
            SELECT l_returnflag, MEDIAN(l_quantity) AS md
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               ROUND(ANY_VALUE(m.md), 6) AS median,
               ROUND(MEDIAN(ABS(l.l_quantity - m.md)), 6) AS mad
        FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    "q7_volume_shipping": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                 + 50) // 100) / 100.0 AS revenue
        FROM supplier, lineitem, orders, customer,
             nation sn, nation cn
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = sn.n_nationkey
          AND c_nationkey = cn.n_nationkey
          AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
               OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q12_late_shipments": """
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_year
        ORDER BY l_year
    """,
    "q14_promo_revenue": """
        SELECT ROUND(100.0 *
                 SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END)
                 / SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)),
                 6) AS promo_revenue,
               ((SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) + 50) // 100) / 100.0 AS promo_rev,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                 + 50) // 100) / 100.0 AS total_rev
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "q8_market_share": """
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN nation = 'NATION_8'
                              THEN volume4 ELSE 0 END) AS DOUBLE)
                     / SUM(volume4), 6) AS mkt_share,
               ((SUM(volume4) + 50) // 100) / 100.0 AS total_volume
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS volume4,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
              AND s_nationkey = n2.n_nationkey
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS total4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               ((total4 + 50) // 100) / 100.0 AS total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total4 = (SELECT MAX(total4) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q19_discounted_revenue": """
        SELECT ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                 + 50) // 100) / 100.0 AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30))
    """,
    "q17_small_quantity_revenue": """
        SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     / 700.0, 6) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
          AND CAST(ROUND(l_quantity * 100) AS BIGINT) * 5 *
              (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = p_partkey)
              < (SELECT SUM(CAST(ROUND(l2.l_quantity * 100) AS BIGINT))
                 FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "part_affinity_topk": """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        p AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey
        )
        SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM p GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b LIMIT 10
    """,
    "order_reconciliation": """
        WITH s AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS line_cents
            FROM lineitem GROUP BY 1
        )
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN s.l_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_no_lines,
               CAST(SUM(CASE WHEN s.l_orderkey IS NOT NULL AND
                        ABS(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                            - s.line_cents) > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_mismatch,
               CAST(COALESCE(MAX(CASE WHEN s.l_orderkey IS NOT NULL THEN
                        ABS(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                            - s.line_cents) END), 0)
                   AS BIGINT) AS max_abs_diff_cents
        FROM orders o LEFT JOIN s ON o.o_orderkey = s.l_orderkey
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    "q21_sole_late_supplier": """
        WITH j AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        pairs AS (
            SELECT l_orderkey, l_suppkey, MAX(late) AS late
            FROM j GROUP BY 1, 2
        ),
        per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
                   MIN(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
            FROM pairs GROUP BY 1
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
        WHERE p.n_supp > 1 AND p.n_late = 1
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
    "q22_dormant_customers": """
        WITH s AS (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
                   COUNT(*) AS n
            FROM customer
            WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
        )
        SELECT c_mktsegment, COUNT(*) AS numcust,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0
                   AS totacctbal
        FROM customer, s
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * s.n > s.s
          AND NOT EXISTS (SELECT 1 FROM events
                          WHERE user_id = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 200)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                 + 50) // 100) / 100.0 AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "custkeys_intersect": """
        SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL
        INTERSECT
        SELECT user_id FROM events WHERE user_id IS NOT NULL
        ORDER BY k
    """,
    "custkeys_except": """
        SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL
        EXCEPT
        SELECT user_id FROM events WHERE user_id IS NOT NULL
        ORDER BY k
    """,
    # exact-integer correlated comparison: cents*n > sum_cents is the
    # float-free form of price > AVG(price) per customer
    "order_linenumbers_agg": """
        SELECT l_orderkey,
               STRING_AGG(CAST(l_linenumber AS VARCHAR), ','
                          ORDER BY l_linenumber) AS agg
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    "priority_quantity_skewjoin": """
        SELECT o_orderpriority,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "urgent_revenue_bloom": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY 1
    """,
    "orders_above_cust_avg": """
        WITH c AS (
          SELECT o_custkey AS k,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents,
                 COUNT(*) AS n
          FROM orders GROUP BY 1)
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o JOIN c ON o.o_custkey = c.k
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * c.n > c.sum_cents
        ORDER BY o.o_orderkey
    """,
    "q13_customer_order_counts": """
        SELECT c_count, COUNT(*) AS n_custs FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        ) GROUP BY c_count ORDER BY n_custs DESC, c_count DESC
    """,
    "customer_nations": """
        SELECT c.c_custkey, n.n_name
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY c.c_custkey
    """,
    "range_join_counts": """
        SELECT o.o_orderkey, COUNT(e.ts) AS n_week
        FROM orders o LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
         AND e.ts < CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL 7 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "window_counts_leading": """
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN CURRENT ROW
                              AND INTERVAL 1 HOUR FOLLOWING) AS n_next_hour
        FROM events ORDER BY event_id
    """,
    "running_spend": """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_cents
        FROM orders ORDER BY o_orderkey
    """,
    "rolling_max_spend": """
        SELECT o_orderkey,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS max_cents,
               COUNT(*) OVER w AS n_win
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
    """,
    "rolling_spend": """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER w AS BIGINT) AS roll_cents,
               COUNT(*) OVER w AS n_win
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
    """,
    # (this DuckDB lacks WITH ORDINALITY; 1-based list indexing over a
    # generated dim range is the equivalent unnest-with-position form)
    "embedding_dim_stats": """
        WITH dims AS (SELECT UNNEST(range(1,
            (SELECT MAX(len(embedding)) + 1 FROM embeddings))) AS i)
        SELECT i AS dim, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
        FROM embeddings, dims WHERE i <= len(embedding)
        GROUP BY i ORDER BY dim
    """,
    "props_json_sum": """
        SELECT event_type,
               CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k')
                                      AS BIGINT), 0)) AS BIGINT) AS sum_k,
               COUNT(json_extract_string(props, '$.k')) AS n_with_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_rollup": """
        SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events
        GROUP BY ROLLUP(date_trunc('day', ts), event_type)
        ORDER BY day NULLS LAST, event_type NULLS LAST
    """,
    "events_cube": """
        SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events
        GROUP BY CUBE(date_trunc('day', ts), event_type)
        ORDER BY day NULLS LAST, event_type NULLS LAST
    """,
    "keys_union": """
        SELECT o_custkey AS k FROM orders
        UNION
        SELECT user_id FROM events
        ORDER BY k
    """,
    "order_percent_rank": """
        SELECT o_orderkey,
               CASE WHEN cnt > 1
                    THEN ((rnk - 1) * 1000000) // (cnt - 1)
                    ELSE 0 END AS pr_micro
        FROM (SELECT o_orderkey,
                     RANK() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice) AS rnk,
                     COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
              FROM orders)
        ORDER BY o_orderkey
    """,
    "events_hourly_dense": """
        WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                          date_trunc('hour', MAX(ts)) AS hi FROM events),
        g AS (SELECT UNNEST(generate_series((SELECT lo FROM b),
                                            (SELECT hi FROM b),
                                            INTERVAL 1 HOUR)) AS h),
        t AS (SELECT DISTINCT event_type FROM events),
        c AS (SELECT date_trunc('hour', ts) AS h, event_type,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2)
        SELECT g.h, t.event_type, COALESCE(c.n, 0) AS n
        FROM g CROSS JOIN t
        LEFT JOIN c ON c.h = g.h AND c.event_type = t.event_type
        ORDER BY 1, 2
    """,
    "order_cume_dist": """
        SELECT o_orderkey,
               ((cnt + 1 - rnk) * 1000000) // cnt AS cd_micro
        FROM (SELECT o_orderkey,
                     RANK() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC) AS rnk,
                     COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
              FROM orders)
        ORDER BY o_orderkey
    """,
    "rollup_counts": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    "order_quartile_tiles": """
        SELECT o_orderkey,
               NTILE(4) OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice, o_orderkey) AS tile
        FROM orders ORDER BY o_orderkey
    """,
    "order_rank": """
        SELECT o_orderkey,
               RANK() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice) AS rnk
        FROM orders ORDER BY o_orderkey
    """,
    "order_dense_rank": """
        SELECT o_orderkey,
               DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice) AS rnk
        FROM orders ORDER BY o_orderkey
    """,
    "event_lag": """
        SELECT event_id,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events ORDER BY event_id
    """,
    "events_type_pivot": """
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "asof_last_event": """
        SELECT o.o_orderkey,
               e.ts AS last_event_ts
        FROM orders o ASOF LEFT JOIN events e
          ON o.o_custkey = e.user_id
         AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP)
        ORDER BY o.o_orderkey
    """,
    "asof_next_event": """
        SELECT o.o_orderkey, MIN(e.ts) AS next_event_ts
        FROM orders o LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
    "events_sessions": """
        WITH g AS (
          SELECT user_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    "user_gap_stats": """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(MAX(gap) AS BIGINT) AS max_gap_us
        FROM g GROUP BY user_id HAVING COUNT(*) > 1 ORDER BY user_id
    """,
    "window_counts": """
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW) AS n_last_hour
        FROM events ORDER BY event_id
    """,
    "targeted_deletion": """
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id % 17 <> 0
        ORDER BY doc_id
    """,
    "incremental_dedup": """
        SELECT MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY text
        ORDER BY keep_id
    """,
    "table_diff": """
        WITH a AS (
            SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
            FROM orders WHERE o_orderkey % 7 <> 0
        ), b AS (
            SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   * CASE WHEN o_orderkey % 13 = 0 THEN 2 ELSE 1 END AS c
            FROM orders WHERE o_orderkey % 11 <> 0
        )
        SELECT CASE WHEN a.k IS NULL THEN 'added'
                    WHEN b.k IS NULL THEN 'removed'
                    WHEN a.c <> b.c THEN 'changed'
                    ELSE 'same' END AS status,
               COUNT(*) AS n
        FROM a FULL OUTER JOIN b ON a.k = b.k
        GROUP BY status
        HAVING COUNT(*) > 0
        ORDER BY status
    """,
    "events_hopping": """
        SELECT event_type, win_start, COUNT(*) AS n
        FROM (
            SELECT event_type,
                   UNNEST([date_trunc('hour', ts),
                           date_trunc('hour', ts) - INTERVAL 1 HOUR])
                       AS win_start
            FROM events
        )
        GROUP BY event_type, win_start
        ORDER BY event_type, win_start
    """,
    "order_overlap_counts": """
        SELECT a.o_orderkey, COUNT(*) AS n_overlap
        FROM orders a, orders b
        WHERE a.o_custkey = b.o_custkey
          AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
          AND a.o_orderdate <= b.o_orderdate + INTERVAL 30 DAY
        GROUP BY a.o_orderkey
        ORDER BY a.o_orderkey
    """,
    "contamination": """
        WITH tok AS (
            SELECT doc_id,
                   list_filter(regexp_extract_all(lower(text),
                                                  '[a-z0-9'']+'),
                               x -> x <> '') AS w
            FROM documents
        ), grams AS (
            SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ')
                       AS g
            FROM tok,
                 UNNEST(generate_series(1, greatest(len(w) - 4, 0)))
                     AS t(i)
        ), bench AS (
            SELECT DISTINCT g FROM grams WHERE doc_id < 50
        )
        SELECT g2.doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM grams g2 LEFT JOIN bench b ON g2.g = b.g
        WHERE g2.doc_id >= 50
        GROUP BY g2.doc_id
        ORDER BY g2.doc_id
    """,
    "event_centered_sum": """
        SELECT event_id,
               SUM(COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                   / 100.0 AS centered_spend
        FROM events ORDER BY event_id
    """,
    "funnel_view_purchase": """
        SELECT DISTINCT a.user_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'purchase'
         AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
        ORDER BY a.user_id
    """,
    "user_first_event": """
        SELECT event_id,
               FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   AS first_type
        FROM events ORDER BY event_id
    """,
    "user_last_event": """
        SELECT event_id,
               LAST_VALUE(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS last_type
        FROM events ORDER BY event_id
    """,
    "window_spend": """
        SELECT event_id,
               SUM(COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0))
                   OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW) / 100.0 AS spend_last_hour
        FROM events ORDER BY event_id
    """,
    # brute-force exact twin of the banded-hyperplane LSH path. The
    # engine's verify step is EXACT cosine over candidates, so engine
    # output ⊆ truth always (no false positives); banding sets recall,
    # which at this table's similarity ceiling (max pairwise cosine
    # 0.513 at sf0.01/sf0.001 — nothing near the 0.95 threshold) makes
    # the two sides exactly equal.
    "embedding_near_dups": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding)
                          AS DOUBLE), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        ORDER BY id_a, id_b
    """,
    "dedup_clusters": """
        WITH RECURSIVE words AS (
          SELECT DISTINCT doc_id,
                 UNNEST(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w
          FROM documents WHERE text IS NOT NULL
        ),
        rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 64),
        rw AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rw GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM rw a JOIN rw b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        ),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
        )
        SELECT u AS doc_id, MIN(v) AS cluster_id
        FROM reach GROUP BY u ORDER BY u
    """,
    # dedup_clusters_lp shares the recursive-reachability oracle: the
    # distributed label propagation must converge to the identical
    # min-reachable-id labeling
    "jaccard_near_dups": """
        WITH words AS (
          SELECT DISTINCT doc_id,
                 UNNEST(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w
          FROM documents WHERE text IS NOT NULL
        ),
        rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 64),
        rw AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rw GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM rw a JOIN rw b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        ORDER BY id_a, id_b
    """,
    "sample_sorted": """
        SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 2) AS l_quantity
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    "top_orders_per_customer": """
        SELECT o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderkey
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    "entropy": "\nUNION ALL\n".join(
        f"""SELECT '{col}' AS column, ROUND(-SUM(p * LOG2(p)), 6) AS entropy
            FROM (SELECT COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM {table}) AS p
                  FROM {table} GROUP BY {col})"""
        for table, col in [("orders", "o_orderpriority"),
                           ("lineitem", "l_returnflag"),
                           ("lineitem", "l_linestatus"),
                           ("customer", "c_mktsegment")]
    ),
    "priority_entropy_by_status": """
        WITH c AS (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT o_orderstatus,
               ROUND(-SUM(p * LOG2(p)), 6) AS entropy_bits,
               CAST(SUM(n) AS BIGINT) AS n_orders
        FROM (SELECT o_orderstatus, n,
                     n::DOUBLE / SUM(n) OVER (PARTITION BY o_orderstatus) AS p
              FROM c)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "event_value_share": """
        WITH e AS (
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS vc
            FROM events
        ),
        c AS (SELECT hour, event_type, SUM(vc) AS cents FROM e GROUP BY 1, 2)
        SELECT hour, event_type, CAST(cents AS BIGINT) AS cents,
               ROUND(CAST(cents AS DOUBLE)
                     / SUM(cents) OVER (PARTITION BY hour), 6) AS share
        FROM c ORDER BY hour, event_type
    """,
    "event_type_nearest": """
        WITH d AS (SELECT DISTINCT event_type AS v FROM events)
        SELECT a.v AS event_type, b.v AS nearest,
               CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist
        FROM d a JOIN d b ON a.v <> b.v
        QUALIFY ROW_NUMBER() OVER (PARTITION BY a.v
                                   ORDER BY levenshtein(a.v, b.v), b.v) = 1
        ORDER BY event_type
    """,
    "priority_hhi_by_status": """
        WITH c AS (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT o_orderstatus,
               ROUND(CAST(SUM(n * n) AS DOUBLE)
                     / (SUM(n) * SUM(n)), 6) AS hhi,
               CAST(SUM(n) AS BIGINT) AS n_orders
        FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "peak_hour_per_type": """
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hour AS peak_hour, CAST(n AS BIGINT) AS n
        FROM c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, hour) = 1
        ORDER BY event_type
    """,
    "view_purchase_hourly_corr": """
        WITH c AS (
            SELECT date_trunc('hour', ts) AS hour,
                   SUM(CAST(event_type = 'view' AS INT)) AS nv,
                   SUM(CAST(event_type = 'purchase' AS INT)) AS np
            FROM events WHERE event_type IN ('view', 'purchase')
            GROUP BY 1
        )
        SELECT ROUND(CORR(nv, np), 6) AS corr_vp,
               CAST(COUNT(*) AS BIGINT) AS n_hours
        FROM c
    """,
    "chi2_type_dow": """
        WITH c AS (
            SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        r AS (SELECT event_type, SUM(n) AS rn FROM c GROUP BY 1),
        k AS (SELECT dow, SUM(n) AS cn FROM c GROUP BY 1),
        t AS (SELECT SUM(n) AS tot FROM c)
        SELECT c.event_type, c.dow, CAST(c.n AS BIGINT) AS n,
               ROUND(CAST(r.rn * k.cn AS DOUBLE) / t.tot, 6) AS expected,
               ROUND((c.n - CAST(r.rn * k.cn AS DOUBLE) / t.tot)
                     * (c.n - CAST(r.rn * k.cn AS DOUBLE) / t.tot)
                     / (CAST(r.rn * k.cn AS DOUBLE) / t.tot), 6)
                   AS chi2_contrib
        FROM c JOIN r USING (event_type) JOIN k USING (dow), t
        ORDER BY c.event_type, c.dow
    """,
    "minmax_ts": """
        SELECT event_type, MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM events GROUP BY event_type
    """,
    "non_ascii": r"""
        SELECT lang,
               CAST(COUNT(*) FILTER (regexp_matches(text, '[^\x00-\x7F]')) AS BIGINT)
                 AS non_ascii_docs,
               COUNT(*) AS docs
        FROM documents GROUP BY lang
    """,
    "dedup_exact_hash": (
        "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents "
        "GROUP BY text ORDER BY keep_id"
    ),
    "ann_topk": """
        SELECT q.vec_id AS qid, e.vec_id AS id
        FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 3) q
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                          e.vec_id) <= 10
    """,
    "word_freqs": """
        SELECT w AS word, COUNT(*) AS n
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS w
              FROM documents)
        GROUP BY w ORDER BY n DESC, w LIMIT 50
    """,
    "doc_pct_rank_in_source": """
        SELECT doc_id, source,
               ROUND(PERCENT_RANK() OVER (PARTITION BY source
                                          ORDER BY n_chars, doc_id), 6)
                   AS pct_rank
        FROM documents ORDER BY doc_id
    """,
    "shingle_novelty_by_source": """
        WITH w AS (
            SELECT source, doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS w,
                   generate_subscripts(
                       regexp_extract_all(lower(text), '[a-z'']+'), 1) AS ord
            FROM documents
        ),
        sh0 AS (
            SELECT source,
                   w || ' ' || LEAD(w, 1) OVER d || ' '
                     || LEAD(w, 2) OVER d AS shingle
            FROM w WINDOW d AS (PARTITION BY doc_id ORDER BY ord)
        ),
        sh AS (SELECT DISTINCT source, shingle FROM sh0
               WHERE shingle IS NOT NULL),
        per AS (SELECT shingle, COUNT(*) AS ns FROM sh GROUP BY shingle)
        SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN p.ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique_shingles
        FROM sh s JOIN per p USING (shingle)
        GROUP BY s.source ORDER BY s.source
    """,
    "mannwhitney_sources": """
        WITH v AS (
            SELECT n_chars AS x,
                   CAST(source = 'src0' AS INT) AS a,
                   CAST(source = 'src1' AS INT) AS b
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        c AS (SELECT x, SUM(a) AS ca, SUM(b) AS cb, COUNT(*) AS c
              FROM v GROUP BY x),
        r AS (SELECT x, ca, c,
                     SUM(c) OVER (ORDER BY x) - c AS base
              FROM c),
        s AS (SELECT SUM(ca * (2 * base + c + 1)) AS r2a FROM r),
        t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM v)
        SELECT CAST(s.r2a - t.na * (t.na + 1) AS BIGINT) AS u2_a,
               CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b
        FROM s, t
    """,
    "ks_two_sample_sources": """
        WITH v AS (
            SELECT n_chars AS x,
                   CAST(source = 'src0' AS INT) AS a,
                   CAST(source = 'src1' AS INT) AS b
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        c AS (SELECT x, SUM(a) AS ca, SUM(b) AS cb FROM v GROUP BY x),
        r AS (
            SELECT SUM(ca) OVER (ORDER BY x) AS cuma,
                   SUM(cb) OVER (ORDER BY x) AS cumb
            FROM c
        ),
        t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM v)
        SELECT ROUND(MAX(ABS(CAST(cuma AS DOUBLE) / t.na
                              - CAST(cumb AS DOUBLE) / t.nb)), 6) AS ks,
               CAST(MAX(t.na) AS BIGINT) AS n_a,
               CAST(MAX(t.nb) AS BIGINT) AS n_b
        FROM r, t
    """,
    "docs_dup_rate_by_source": """
        WITH d AS (
            SELECT source, COUNT(*) OVER (PARTITION BY text) AS c
            FROM documents
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs
        FROM d GROUP BY source ORDER BY source
    """,
    "word_zipf_slope": """
        WITH w AS (
            SELECT w AS word, COUNT(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS w
                  FROM documents)
            GROUP BY w
        ),
        r AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk
            FROM w QUALIFY rnk <= 500
        )
        SELECT ROUND(REGR_SLOPE(LOG2(n), LOG2(rnk)), 6) AS zipf_slope,
               CAST(COUNT(*) AS BIGINT) AS n_words
        FROM r
    """,
    "docs_quality": """
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS char_count,
               CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT) AS token_count,
               ROUND(LENGTH(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0
                     / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
               ROUND(LENGTH(regexp_extract_all(text, '[0-9]')) * 1.0
                     / GREATEST(LENGTH(text), 1), 6) AS digit_ratio,
               ROUND(LENGTH(regexp_extract_all(text, '[A-Z]')) * 1.0
                     / GREATEST(LENGTH(text), 1), 6) AS upper_ratio
        FROM documents
    """,
    "docs_repetition": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
                 unnest(range(len(list_filter(string_split(text, ' '),
                                              x -> x <> '')))) AS i
          FROM documents
        ),
        wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w),
        per_word AS (
          SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
                 MAX(c) AS max_c
          FROM wc GROUP BY doc_id
        ),
        big AS (
          SELECT doc_id, w,
                 LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
          FROM toks
        ),
        bc AS (SELECT doc_id, pw, w, COUNT(*) AS c FROM big
               WHERE pw IS NOT NULL GROUP BY doc_id, pw, w),
        per_big AS (
          SELECT doc_id, SUM(c) AS n_big, COUNT(*) AS d_big
          FROM bc GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(pw.n_words, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(pw.n_distinct, 0) AS BIGINT) AS n_distinct_words,
               ROUND(CAST(COALESCE(pw.n_words, 0) - COALESCE(pw.n_distinct, 0)
                          AS DOUBLE)
                     / GREATEST(COALESCE(pw.n_words, 0), 1), 6) AS dup_word_frac,
               ROUND(CAST(COALESCE(pw.max_c, 0) AS DOUBLE)
                     / GREATEST(COALESCE(pw.n_words, 0), 1), 6) AS top_word_frac,
               CAST(COALESCE(pb.d_big, 0) AS BIGINT) AS n_distinct_bigrams,
               ROUND(CAST(COALESCE(pb.n_big, 0) - COALESCE(pb.d_big, 0)
                          AS DOUBLE)
                     / GREATEST(COALESCE(pb.n_big, 0), 1), 6) AS dup_bigram_frac
        FROM documents d
        LEFT JOIN per_word pw USING (doc_id)
        LEFT JOIN per_big pb USING (doc_id)
        ORDER BY d.doc_id
    """,
    "lm_surprisal": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
                 unnest(range(len(list_filter(string_split(text, ' '),
                                              x -> x <> '')))) AS i
          FROM documents
        ),
        uni AS (SELECT w, COUNT(*) AS cu FROM toks GROUP BY w),
        v AS (SELECT COUNT(*) AS v FROM uni),
        bpairs AS (
          SELECT doc_id, pw AS w1, w AS w2
          FROM (SELECT doc_id, w,
                       LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
                FROM toks)
          WHERE pw IS NOT NULL
        ),
        bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bpairs GROUP BY w1, w2),
        s AS (
          SELECT p.doc_id,
                 CAST(FLOOR(-1000000.0 * log2((bc.cb + 1.0) / (uni.cu + v.v)))
                      AS BIGINT) AS s
          FROM bpairs p
          JOIN bc ON p.w1 = bc.w1 AND p.w2 = bc.w2
          JOIN uni ON p.w1 = uni.w
          CROSS JOIN v
        ),
        agg AS (SELECT doc_id, COUNT(*) AS nb, SUM(s) AS tot
                FROM s GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(agg.nb, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(agg.tot, 0) AS BIGINT)
                   AS total_surprisal_microbits,
               ROUND(CAST(COALESCE(agg.tot, 0) AS DOUBLE)
                     / GREATEST(COALESCE(agg.nb, 0), 1), 6)
                   AS avg_surprisal_microbits
        FROM documents d LEFT JOIN agg USING (doc_id)
        ORDER BY d.doc_id
    """,
    "readability": _READABILITY_SQL,
    "tfidf_top_ngrams": _TFIDF_SQL,
    "lang_histogram": _lang_histogram_sql(),
    "corr_lineitem": "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
        f"ROUND(corr({a}, {b}), 6) AS corr FROM lineitem"
        for i, a in enumerate(LINEITEM_NUMERIC)
        for j, b in enumerate(LINEITEM_NUMERIC)
        if i < j
    ),
}

# the distributed label-propagation clustering must converge to the
# identical min-reachable-id labeling the union-find query produces
ORACLE["dedup_clusters_lp"] = ORACLE["dedup_clusters"]

ORACLE["top_docs_per_source"] = """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn <= 2 ORDER BY source, doc_id
"""

ORACLE["stratified_sample"] = """
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN (doc_id * 2654435761) % 4294967296 <
                CAST(FLOOR((CASE WHEN lang = 'en' THEN 0.5 ELSE 0.25 END)
                     * 4294967296) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang ORDER BY lang
"""

ORACLE["docs_pii_redacted"] = _pii_redaction_sql()

# identical hash arithmetic to pipelines.mix.epoch_mix: floor(w) copies
# + one more iff ((doc_id XOR salt)·mult) mod 2^32 < frac(w)·2^32
ORACLE["epoch_mix"] = """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(
             CASE lang WHEN 'en' THEN 2 WHEN 'zh' THEN 1 ELSE 1 END
             + CASE WHEN (xor(doc_id, 1482184749) * 2654435761) % 4294967296
                    < CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5
                            WHEN 'zh' THEN 0.25 ELSE 0.0 END)
                            * 4294967296) AS BIGINT)
                    THEN 1 ELSE 0 END
           ) AS BIGINT) AS n_mixed
    FROM documents GROUP BY lang ORDER BY lang
"""

ORACLE["docs_above_p90"] = """
    WITH t AS (SELECT PERCENTILE_DISC(0.9) WITHIN GROUP
                      (ORDER BY n_chars) AS p FROM documents)
    SELECT source, COUNT(*) AS n_above
    FROM documents, t WHERE n_chars >= t.p
    GROUP BY source ORDER BY source
"""

ORACLE["benford_prices"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem),
    d AS (SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM c WHERE cents > 0),
    g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    e(digit, expected) AS (VALUES
        (1, CAST(0.301030 AS DOUBLE)), (2, CAST(0.176091 AS DOUBLE)),
        (3, CAST(0.124939 AS DOUBLE)), (4, CAST(0.096910 AS DOUBLE)),
        (5, CAST(0.079181 AS DOUBLE)), (6, CAST(0.066947 AS DOUBLE)),
        (7, CAST(0.057992 AS DOUBLE)), (8, CAST(0.051153 AS DOUBLE)),
        (9, CAST(0.045757 AS DOUBLE))),
    t AS (SELECT SUM(n) AS total FROM g)
    SELECT g.digit, g.n, ROUND(g.n * 1.0 / t.total, 6) AS share, e.expected,
           ROUND((g.n * 1.0 / t.total - e.expected)
                 * (g.n * 1.0 / t.total - e.expected) / e.expected, 6)
               AS chi2_term
    FROM g JOIN e USING (digit) CROSS JOIN t ORDER BY g.digit
"""

ORACLE["fd_census"] = """
    SELECT 'c_custkey->c_nationkey' AS fd,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_lhs,
           CAST(COUNT(DISTINCT (c_custkey, c_nationkey)) AS BIGINT) AS n_pair,
           COUNT(DISTINCT c_custkey)
               = COUNT(DISTINCT (c_custkey, c_nationkey)) AS holds
    FROM customer
    UNION ALL
    SELECT 'l_partkey->l_suppkey',
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
           CAST(COUNT(DISTINCT (l_partkey, l_suppkey)) AS BIGINT),
           COUNT(DISTINCT l_partkey)
               = COUNT(DISTINCT (l_partkey, l_suppkey))
    FROM lineitem
    UNION ALL
    SELECT 'o_custkey->o_orderstatus',
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT (o_custkey, o_orderstatus)) AS BIGINT),
           COUNT(DISTINCT o_custkey)
               = COUNT(DISTINCT (o_custkey, o_orderstatus))
    FROM orders
    UNION ALL
    SELECT 'o_orderkey->o_custkey',
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(DISTINCT (o_orderkey, o_custkey)) AS BIGINT),
           COUNT(DISTINCT o_orderkey)
               = COUNT(DISTINCT (o_orderkey, o_custkey))
    FROM orders
    ORDER BY fd
"""

ORACLE["cheapest_supplier_per_part"] = """
    WITH c AS (SELECT l_partkey, l_suppkey,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem),
    m AS (SELECT l_partkey, MIN(cents) AS min_cents FROM c GROUP BY 1)
    SELECT DISTINCT c.l_partkey, c.l_suppkey,
           m.min_cents / 100.0 AS min_price
    FROM c JOIN m ON c.l_partkey = m.l_partkey AND c.cents = m.min_cents
    ORDER BY c.l_partkey, c.l_suppkey
"""

ORACLE["part_revenue_concentration"] = """
    WITH c AS (SELECT l_partkey,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS rev4
               FROM lineitem),
    g AS (SELECT l_partkey, SUM(rev4) AS rev4 FROM c GROUP BY 1),
    t AS (SELECT SUM(rev4) AS total, COUNT(*) AS np FROM g)
    SELECT g.l_partkey,
           ((g.rev4 + 50) // 100) / 100.0 AS revenue,
           ROUND(g.rev4 * 1.0 / t.total, 6) AS share
    FROM g CROSS JOIN t
    WHERE g.rev4 * t.np * 10 > t.total * 12
    ORDER BY share DESC, g.l_partkey
"""

ORACLE["ind_census"] = """
    SELECT 'l_orderkey<=o_orderkey' AS ind,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_lhs,
           CAST(COUNT(DISTINCT CASE WHEN l_orderkey NOT IN
                (SELECT o_orderkey FROM orders) THEN l_orderkey END)
                AS BIGINT) AS n_missing,
           COUNT(DISTINCT CASE WHEN l_orderkey NOT IN
                (SELECT o_orderkey FROM orders) THEN l_orderkey END) = 0
               AS contained
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey<=s_suppkey',
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN l_suppkey NOT IN
                (SELECT s_suppkey FROM supplier) THEN l_suppkey END)
                AS BIGINT),
           COUNT(DISTINCT CASE WHEN l_suppkey NOT IN
                (SELECT s_suppkey FROM supplier) THEN l_suppkey END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'o_custkey<=c_custkey',
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN o_custkey NOT IN
                (SELECT c_custkey FROM customer) THEN o_custkey END)
                AS BIGINT),
           COUNT(DISTINCT CASE WHEN o_custkey NOT IN
                (SELECT c_custkey FROM customer) THEN o_custkey END) = 0
    FROM orders
    UNION ALL
    SELECT 'user_id<=c_custkey',
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(COUNT(DISTINCT CASE WHEN user_id NOT IN
                (SELECT c_custkey FROM customer) THEN user_id END)
                AS BIGINT),
           COUNT(DISTINCT CASE WHEN user_id NOT IN
                (SELECT c_custkey FROM customer) THEN user_id END) = 0
    FROM events
    ORDER BY ind
"""

ORACLE["hourly_autocorr"] = """
    WITH h AS (SELECT date_trunc('hour', ts) AS hour,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1)
    SELECT CAST(1 AS BIGINT) AS lag_hours, ROUND(CORR(a.n, b.n), 6) AS acf,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM h a JOIN h b ON b.hour = a.hour + INTERVAL 1 HOUR
    UNION ALL
    SELECT CAST(24 AS BIGINT), ROUND(CORR(a.n, b.n), 6),
           CAST(COUNT(*) AS BIGINT)
    FROM h a JOIN h b ON b.hour = a.hour + INTERVAL 24 HOUR
    ORDER BY lag_hours
"""

ORACLE["part_graph_triangles"] = """
    WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    pe AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS n
           FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
    e AS (SELECT u, v FROM pe WHERE n >= 2),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
    d AS (SELECT x, COUNT(*) AS deg
          FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
          GROUP BY x),
    w AS (SELECT CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT)
              AS n_wedges
          FROM d),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM e e1 JOIN e e2 ON e2.u = e1.v
                    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT ne.n_edges, w.n_wedges, t.n_triangles,
           CASE WHEN w.n_wedges = 0 THEN NULL
                ELSE ROUND(t.n_triangles * 3.0 / w.n_wedges, 6)
           END AS clustering
    FROM ne, w, t
"""

ORACLE["value_pattern_census"] = """
    WITH m AS (
        SELECT 'c_name' AS "column",
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                   '[0-9]', '9', 'g') AS pattern
        FROM customer
        UNION ALL
        SELECT 'props',
               regexp_replace(regexp_replace(regexp_replace(
                   props, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                   '[0-9]', '9', 'g')
        FROM events
        UNION ALL
        SELECT 'o_orderpriority',
               regexp_replace(regexp_replace(regexp_replace(
                   o_orderpriority, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                   '[0-9]', '9', 'g')
        FROM orders
    ),
    g AS (SELECT "column", pattern, CAST(COUNT(*) AS BIGINT) AS n
          FROM m GROUP BY 1, 2)
    SELECT "column", pattern, n FROM g
    QUALIFY ROW_NUMBER() OVER (PARTITION BY "column"
                               ORDER BY n DESC, pattern ASC) <= 3
    ORDER BY "column", n DESC, pattern
"""

ORACLE["part_rules_topk"] = """
    WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    nt AS (SELECT COUNT(DISTINCT o) AS total FROM bp),
    ic AS (SELECT p, COUNT(*) AS np FROM bp GROUP BY p),
    pe AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS nab
           FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
    s AS (SELECT u, v, nab FROM pe WHERE nab >= 2),
    r AS (
        SELECT s.u AS antecedent, s.v AS consequent,
               CAST(s.nab AS BIGINT) AS n_orders,
               ROUND(s.nab * 1.0 / ia.np, 6) AS confidence,
               ROUND(s.nab * nt.total * 1.0 / (ia.np * ib.np), 6) AS lift
        FROM s JOIN ic ia ON ia.p = s.u JOIN ic ib ON ib.p = s.v
        CROSS JOIN nt
        UNION ALL
        SELECT s.v, s.u, CAST(s.nab AS BIGINT),
               ROUND(s.nab * 1.0 / ib.np, 6),
               ROUND(s.nab * nt.total * 1.0 / (ia.np * ib.np), 6)
        FROM s JOIN ic ia ON ia.p = s.u JOIN ic ib ON ib.p = s.v
        CROSS JOIN nt
    )
    SELECT antecedent, consequent, n_orders, confidence, lift
    FROM r ORDER BY lift DESC, antecedent, consequent LIMIT 10
"""

ORACLE["part_skyline"] = """
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice
               OR b.p_size > a.p_size))
    ORDER BY p_partkey
"""

ORACLE["fd_strength"] = """
    WITH c1 AS (SELECT l_partkey AS a, l_suppkey AS b, COUNT(*) AS n
                FROM lineitem GROUP BY 1, 2),
    m1 AS (SELECT a, MAX(n) AS mx, SUM(n) AS ns FROM c1 GROUP BY a),
    t1 AS (SELECT CAST(SUM(mx) AS BIGINT) AS kept,
                  CAST(SUM(ns) AS BIGINT) AS n_rows FROM m1),
    c2 AS (SELECT o_custkey AS a, o_orderstatus AS b, COUNT(*) AS n
           FROM orders GROUP BY 1, 2),
    m2 AS (SELECT a, MAX(n) AS mx, SUM(n) AS ns FROM c2 GROUP BY a),
    t2 AS (SELECT CAST(SUM(mx) AS BIGINT) AS kept,
                  CAST(SUM(ns) AS BIGINT) AS n_rows FROM m2)
    SELECT 'l_partkey->l_suppkey' AS fd, n_rows, kept,
           ROUND(1 - kept * 1.0 / n_rows, 6) AS g3 FROM t1
    UNION ALL
    SELECT 'o_custkey->o_orderstatus', n_rows, kept,
           ROUND(1 - kept * 1.0 / n_rows, 6) FROM t2
    ORDER BY fd
"""

ORACLE["docs_upsert"] = """
    WITH delta AS (
        SELECT doc_id, n_chars + 1000 AS n_chars
        FROM documents WHERE doc_id % 13 = 0
        UNION ALL
        SELECT (SELECT MAX(doc_id) FROM documents) + i,
               CAST(42 AS BIGINT)
        FROM range(1, 6) t(i)
    )
    SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars FROM documents WHERE doc_id % 13 <> 0
        UNION ALL SELECT doc_id, n_chars FROM delta
    ) ORDER BY doc_id
"""

ORACLE["hopping_distinct_users"] = """
    WITH w AS (
        SELECT date_trunc('hour', ts) AS win_start, user_id FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, user_id
        FROM events
    )
    SELECT win_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM w GROUP BY 1 ORDER BY 1
"""
ORACLE["q9_profit_by_nation_year"] = """
    SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                    - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                    * CAST(ROUND(l_quantity * 100) AS BIGINT))
                AS BIGINT) AS profit4,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                    - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                    * CAST(ROUND(l_quantity * 100) AS BIGINT))
                AS BIGINT) / 10000.0 AS profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE["q16_supplier_part_counts"] = """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLE["first_touch_attribution"] = """
    WITH f AS (
        SELECT user_id, event_type, value,
               FIRST_VALUE(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS first_type
        FROM events)
    SELECT first_type,
           ((SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) + 50)
            // 100) / 100.0 AS attributed_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM f WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
"""

ORACLE["dau_wau_stickiness"] = """
    WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
               FROM events),
    dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM d GROUP BY 1),
    w AS (SELECT day + i * INTERVAL 1 DAY AS e, user_id
          FROM d, range(0, 7) t(i)),
    wau AS (SELECT e, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM w GROUP BY 1)
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.e = dau.day ORDER BY dau.day
"""

ORACLE["ship_latency_quantiles"] = """
    SELECT o_orderpriority,
           CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY
                date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
               AS p50,
           CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY
                date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
               AS p95
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
"""

ORACLE["nation_region_share"] = """
    WITH r AS (
        SELECT s_nationkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS rev4
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1),
    j AS (SELECT r_name, n_name, rev4
          FROM r JOIN nation ON n_nationkey = s_nationkey
                 JOIN region ON r_regionkey = n_regionkey)
    SELECT r_name, n_name,
           ((rev4 + 50) // 100) / 100.0 AS revenue,
           ROUND(rev4 * 1.0 / SUM(rev4) OVER (PARTITION BY r_name), 6)
               AS share_of_region,
           ROUND(rev4 * 1.0 / SUM(rev4) OVER (), 6) AS share_of_total
    FROM j ORDER BY r_name, n_name
"""

ORACLE["winsorized_price_mean"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   AS cents FROM lineitem),
    t AS (SELECT PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY cents)
                     AS p05,
                 PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY cents)
                     AS p95
          FROM c),
    w AS (SELECT CASE WHEN cents < t.p05 THEN t.p05
                      WHEN cents > t.p95 THEN t.p95
                      ELSE cents END AS cl
          FROM c, t)
    SELECT t.p05 / 100.0 AS p05, t.p95 / 100.0 AS p95,
           CAST((SUM(w.cl) * 10000 + COUNT(*) // 2) // COUNT(*)
                AS BIGINT) / 1000000.0 AS winsorized_mean,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM w, t GROUP BY t.p05, t.p95
"""

ORACLE["embedding_label_centroids"] = """
    WITH dims AS (SELECT UNNEST(range(1,
        (SELECT MAX(len(embedding)) + 1 FROM embeddings))) AS i)
    SELECT CAST(label AS BIGINT) AS label, i AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
    FROM embeddings, dims WHERE i <= len(embedding)
    GROUP BY 1, 2 ORDER BY label, dim
"""

ORACLE["q20_volume_suppliers"] = """
    WITH q AS (
        SELECT l_suppkey,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qc
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'ECONOMY'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1),
    t AS (SELECT SUM(qc) AS total, COUNT(*) AS ns FROM q)
    SELECT s_name
    FROM supplier JOIN q ON s_suppkey = l_suppkey CROSS JOIN t
    WHERE q.qc * t.ns > t.total ORDER BY s_name
"""


ORACLE["customer_ltv_deciles"] = """
    WITH s AS (
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sc
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT sc, ROW_NUMBER() OVER (ORDER BY sc, o_custkey) AS rn,
               COUNT(*) OVER () AS n
        FROM s
    )
    SELECT ((rn - 1) * 10) // n AS decile,
           COUNT(*)::BIGINT AS n_customers,
           ((SUM(sc) + 50) // 100) / 100.0 AS total_spend,
           ROUND(SUM(sc) / 100.0 / COUNT(*), 6) AS avg_spend
    FROM r GROUP BY 1 ORDER BY 1
"""

ORACLE["assoc_type_dow"] = """
    WITH c AS (
        SELECT event_type, dayofweek(ts) AS dow, COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, SUM(n)::BIGINT AS rn FROM c GROUP BY 1),
    k AS (SELECT dow, SUM(n)::BIGINT AS cn FROM c GROUP BY 1),
    t AS (SELECT SUM(n)::BIGINT AS tot,
                 (SELECT COUNT(*) FROM r)::BIGINT AS nr,
                 (SELECT COUNT(*) FROM k)::BIGINT AS nc
          FROM c)
    SELECT t.tot AS n,
           ROUND(SUM((CAST(c.n AS DOUBLE) / t.tot)
                     * LN(CAST(c.n * t.tot AS DOUBLE)
                          / (r.rn * k.cn))), 6) AS mi_nats,
           ROUND(SQRT(SUM(POW(c.n - CAST(r.rn * k.cn AS DOUBLE) / t.tot, 2)
                          / (CAST(r.rn * k.cn AS DOUBLE) / t.tot))
                      / (t.tot * LEAST(t.nr - 1, t.nc - 1))), 6)
               AS cramers_v
    FROM c JOIN r USING (event_type) JOIN k USING (dow), t
    GROUP BY t.tot, t.nr, t.nc
"""

ORACLE["top_parts_per_flag_ties"] = """
    WITH a AS (
        SELECT l_returnflag, l_partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS rc
        FROM lineitem GROUP BY 1, 2
    ),
    rk AS (
        SELECT l_returnflag, l_partkey, rc,
               RANK() OVER (PARTITION BY l_returnflag
                            ORDER BY rc DESC) AS rnk
        FROM a
    )
    SELECT l_returnflag, l_partkey, ((rc + 50) // 100) / 100.0 AS revenue,
           CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= 3
    ORDER BY l_returnflag, rnk, l_partkey
"""

ORACLE["dow_hour_heatmap"] = """
    SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hr,
           COUNT(*)::BIGINT AS n
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE["js_drift_roles"] = """
    WITH b AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
        FROM events
    ),
    c AS (
        SELECT CASE WHEN epoch_us(ts) <= (SELECT mid FROM b)
                    THEN 'a' ELSE 'b' END AS half,
               event_type, COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT event_type,
               COALESCE(SUM(n) FILTER (half = 'a'), 0)::BIGINT AS na,
               COALESCE(SUM(n) FILTER (half = 'b'), 0)::BIGINT AS nb
        FROM c GROUP BY event_type
    ),
    t AS (
        SELECT (SELECT SUM(na) FROM p)::BIGINT AS ta,
               (SELECT SUM(nb) FROM p)::BIGINT AS tb
    )
    SELECT t.ta AS n_baseline, t.tb AS n_current,
           ROUND(0.5 * SUM(CASE WHEN p.na > 0 THEN
                     (CAST(p.na AS DOUBLE) / t.ta)
                     * LN((CAST(p.na AS DOUBLE) / t.ta)
                          / ((CAST(p.na AS DOUBLE) / t.ta
                              + CAST(p.nb AS DOUBLE) / t.tb) / 2))
                     ELSE 0 END)
                 + 0.5 * SUM(CASE WHEN p.nb > 0 THEN
                     (CAST(p.nb AS DOUBLE) / t.tb)
                     * LN((CAST(p.nb AS DOUBLE) / t.tb)
                          / ((CAST(p.na AS DOUBLE) / t.ta
                              + CAST(p.nb AS DOUBLE) / t.tb) / 2))
                     ELSE 0 END), 6) AS js_divergence
    FROM p, t GROUP BY t.ta, t.tb
"""

ORACLE["monthly_revenue_mom"] = """
    WITH m AS (
        SELECT date_trunc('month', l_shipdate) AS month,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS rc
        FROM lineitem GROUP BY 1
    ),
    l AS (
        SELECT month, rc, LAG(rc) OVER (ORDER BY month) AS prev
        FROM m
    )
    SELECT month, ((rc + 50) // 100) / 100.0 AS revenue,
           ROUND(100.0 * (rc - prev) / prev, 6) AS mom_pct
    FROM l WHERE prev IS NOT NULL
    ORDER BY month
"""

ORACLE["robust_outliers_by_flag"] = """
    WITH m AS (
        SELECT l_returnflag, MEDIAN(l_quantity) AS md
        FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
        SELECT l.l_returnflag, MEDIAN(ABS(l.l_quantity - m.md)) AS mad
        FROM lineitem l JOIN m USING (l_returnflag)
        GROUP BY l.l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(ANY_VALUE(m.md), 6) AS median,
           ROUND(ANY_VALUE(d.mad), 6) AS mad,
           COUNT(*)::BIGINT AS n,
           COALESCE(SUM(CASE WHEN ABS(l.l_quantity - m.md) > 3 * d.mad
                        THEN 1 END), 0)::BIGINT AS n_outliers,
           ROUND(CAST(COALESCE(SUM(CASE WHEN ABS(l.l_quantity - m.md)
                                    > 3 * d.mad THEN 1 END), 0) AS DOUBLE)
                 / COUNT(*), 6) AS outlier_share
    FROM lineitem l JOIN m USING (l_returnflag) JOIN d USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""

ORACLE["price_gmean_by_flag"] = """
    SELECT l_returnflag, COUNT(*)::BIGINT AS n,
           ROUND(EXP(SUM(LN(l_extendedprice)) / COUNT(*)), 6) AS gmean,
           ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 6) AS hmean
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag ORDER BY l_returnflag
"""

ORACLE["rule_census"] = """
    WITH coded AS (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
               CAST(ROUND(l_tax * 100) AS BIGINT) AS tax,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price,
               l_returnflag AS rf, l_linestatus AS ls,
               l_shipdate AS sd,
               l_quantity AS c_qty, l_discount AS c_disc, l_tax AS c_tax,
               l_extendedprice AS c_price
        FROM lineitem
    ),
    r AS (
        SELECT 'qty_ge_1' AS rule, COUNT(c_qty)::BIGINT AS checked,
               COALESCE(SUM(CASE WHEN qty < 1 THEN 1 END), 0)::BIGINT
                   AS violations FROM coded
        UNION ALL
        SELECT 'qty_le_45', COUNT(c_qty)::BIGINT,
               COALESCE(SUM(CASE WHEN qty > 45 THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'discount_le_6pct', COUNT(c_disc)::BIGINT,
               COALESCE(SUM(CASE WHEN disc > 6 THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'tax_le_4pct', COUNT(c_tax)::BIGINT,
               COALESCE(SUM(CASE WHEN tax > 4 THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'price_positive', COUNT(c_price)::BIGINT,
               COALESCE(SUM(CASE WHEN price <= 0 THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'returnflag_domain', COUNT(rf)::BIGINT,
               COALESCE(SUM(CASE WHEN rf IS NOT NULL
                        AND rf NOT IN ('A','N','R') THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'linestatus_domain', COUNT(ls)::BIGINT,
               COALESCE(SUM(CASE WHEN ls IS NOT NULL
                        AND ls NOT IN ('O','F') THEN 1 END), 0)::BIGINT
        FROM coded
        UNION ALL
        SELECT 'shipdate_in_range', COUNT(sd)::BIGINT,
               COALESCE(SUM(CASE WHEN sd >= TIMESTAMP '1998-09-01'
                        THEN 1 END), 0)::BIGINT
        FROM coded
    )
    SELECT rule, checked, violations,
           ROUND(CAST(violations AS DOUBLE) / checked, 6)
               AS violation_share
    FROM r ORDER BY rule
"""

ORACLE["events_freshness"] = """
    SELECT event_type, max(ts) AS latest_ts,
           CAST(epoch_us((SELECT max(ts) FROM events)) - epoch_us(max(ts))
                AS BIGINT) AS staleness_us
    FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLE["hourly_volume_anomalies"] = """
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, COUNT(*)::BIGINT AS nh, SUM(n) AS sn,
               SUM(n * n) AS ssn
        FROM c GROUP BY event_type
    )
    SELECT event_type, hour, n,
           ROUND((n - CAST(sn AS DOUBLE) / nh)
                 / SQRT(CAST(ssn AS DOUBLE) / nh
                        - (CAST(sn AS DOUBLE) / nh)
                          * (CAST(sn AS DOUBLE) / nh)), 6) AS z
    FROM c JOIN s USING (event_type)
    WHERE (n * nh - sn) * (n * nh - sn) > 9 * (nh * ssn - sn * sn)
    ORDER BY event_type, hour
"""

ORACLE["welch_t_sources"] = """
    WITH s AS (
        SELECT source, COUNT(n_chars)::BIGINT AS n,
               SUM(n_chars)::BIGINT AS s1,
               SUM(n_chars * n_chars)::BIGINT AS s2
        FROM documents GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           a.n AS n_a, b.n AS n_b,
           ROUND((CAST(a.s1 AS DOUBLE) / a.n - CAST(b.s1 AS DOUBLE) / b.n)
                 / SQRT(((a.s2 - CAST(a.s1 * a.s1 AS DOUBLE) / a.n)
                         / (a.n - 1)) / a.n
                        + ((b.s2 - CAST(b.s1 * b.s1 AS DOUBLE) / b.n)
                           / (b.n - 1)) / b.n), 6) AS t_stat,
           ROUND(POW(((a.s2 - CAST(a.s1 * a.s1 AS DOUBLE) / a.n)
                      / (a.n - 1)) / a.n
                     + ((b.s2 - CAST(b.s1 * b.s1 AS DOUBLE) / b.n)
                        / (b.n - 1)) / b.n, 2)
                 / (POW(((a.s2 - CAST(a.s1 * a.s1 AS DOUBLE) / a.n)
                         / (a.n - 1)) / a.n, 2) / (a.n - 1)
                    + POW(((b.s2 - CAST(b.s1 * b.s1 AS DOUBLE) / b.n)
                           / (b.n - 1)) / b.n, 2) / (b.n - 1)), 6) AS df
    FROM s a JOIN s b ON a.source < b.source
    WHERE a.n >= 2 AND b.n >= 2
    ORDER BY source_a, source_b
"""

ORACLE["event_order_conformance"] = """
    WITH l AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS p
        FROM events
    )
    SELECT COUNT(*) FILTER (p IS NOT NULL)::BIGINT AS pairs_checked,
           COUNT(*) FILTER (ts < p)::BIGINT AS violations,
           COUNT(DISTINCT user_id) FILTER (ts < p)::BIGINT
               AS users_affected
    FROM l
"""

QUERIES = {
    "profile_null_counts": q_profile_null_counts,
    "numeric_stats": q_numeric_stats,
    "distinct_counts": q_distinct_counts,
    "top_orderpriority": q_top_orderpriority,
    "q1_pricing_summary": q1_pricing_summary,
    "events_hourly": q_events_hourly,
    "events_hopping": q_events_hopping,
    "events_distinct_users_hll": q_events_distinct_users_hll,
    "dup_custkeys": q_dup_custkeys,
    "referential_counts": q_referential_counts,
    "transcripts": q_transcripts,
    "conv_stats": q_conv_stats,
    "role_transitions": q_role_transitions,
    "response_latency": q_response_latency,
    "role_alternation": q_role_alternation,
    "user_coverage": q_user_coverage,
    "median_gap_by_user": q_median_gap_by_user,
    "user_breadth_hist": q_user_breadth_hist,
    "tool_set_similarity": q_tool_set_similarity,
    "value_hist": q_value_hist,
    "docs_ksample_per_source": q_docs_ksample_per_source,
    "hourly_delta": q_hourly_delta,
    "conv_null_tool_runs": q_conv_null_tool_runs,
    "funnel_subsequence": q_funnel_subsequence,
    "conv_boundary_roles": q_conv_boundary_roles,
    "conv_size_gini": q_conv_size_gini,
    "third_event_ts_per_user": q_third_event_ts_per_user,
    "conv_documents": q_conv_documents,
    "price_deciles_by_flag": q_price_deciles_by_flag,
    "time_weighted_value": q_time_weighted_value,
    "user_retention": q_user_retention,
    "gini_by_priority": q_gini_by_priority,
    "weighted_median_price": q_weighted_median_price,
    "conv_tool_ffill": q_conv_tool_ffill,
    "rolling_median_value": q_rolling_median_value,
    "docs_stats": q_docs_stats,
    "dedup_exact": q_dedup_exact,
    "docs_tokens": q_docs_tokens,
    "doc_packing": q_doc_packing,
    "corpus_prep": q_corpus_prep,
    "corr_lineitem": q_corr_lineitem,
    "corr_by_returnflag": q_corr_by_returnflag,
    "regr_by_flag": q_regr_by_flag,
    "iqr_outliers": q_iqr_outliers,
    "mad_by_flag": q_mad_by_flag,
    "price_p90_disc": q_price_p90_disc,
    "weighted_avg_discount": q_weighted_avg_discount,
    "moments": q_moments,
    "outlier_pct": q_outlier_pct,
    "decimal_places": q_decimal_places,
    "qty_quartiles_by_status": q_qty_quartiles_by_status,
    "median_qty_by_flag": q_median_qty_by_flag,
    "shipdate_parts": q_shipdate_parts,
    "events_hour_hist": q_events_hour_hist,
    "user_gap_stats": q_user_gap_stats,
    "events_sessions": q_events_sessions,
    "window_counts": q_window_counts,
    "window_spend": q_window_spend,
    "user_first_event": q_user_first_event,
    "contamination": q_contamination,
    "order_overlap_counts": q_order_overlap_counts,
    "table_diff": q_table_diff,
    "incremental_dedup": q_incremental_dedup,
    "targeted_deletion": q_targeted_deletion,
    "user_last_event": q_user_last_event,
    "window_counts_leading": q_window_counts_leading,
    "running_spend": q_running_spend,
    "rolling_spend": q_rolling_spend,
    "event_centered_sum": q_event_centered_sum,
    "funnel_view_purchase": q_funnel_view_purchase,
    "rolling_max_spend": q_rolling_max_spend,
    "events_type_pivot": q_events_type_pivot,
    "event_lag": q_event_lag,
    "event_lead": q_event_lead,
    "latest_event_per_user": q_latest_event_per_user,
    "lineitem_measures_melt": q_lineitem_measures_melt,
    "order_rank": q_order_rank,
    "order_dense_rank": q_order_dense_rank,
    "order_quartile_tiles": q_order_quartile_tiles,
    "order_percent_rank": q_order_percent_rank,
    "order_cume_dist": q_order_cume_dist,
    "rollup_counts": q_rollup_counts,
    "events_hourly_dense": q_events_hourly_dense,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "keys_union": q_keys_union,
    "props_json_sum": q_props_json_sum,
    "embedding_dim_stats": q_embedding_dim_stats,
    "asof_last_event": q_asof_last_event,
    "asof_next_event": q_asof_next_event,
    "range_join_counts": q_range_join_counts,
    "orders_with_events": q_orders_with_events,
    "orders_without_events": q_orders_without_events,
    "q13_customer_order_counts": q13_customer_order_counts,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "priority_quantity_skewjoin": q_priority_quantity_skewjoin,
    "urgent_revenue_bloom": q_urgent_revenue_bloom,
    "order_linenumbers_agg": q_order_linenumbers_agg,
    "activity_full_outer": q_activity_full_outer,
    "custkeys_intersect": q_custkeys_intersect,
    "custkeys_except": q_custkeys_except,
    "stratified_orders": q_stratified_orders,
    "q10_returned_items": q10_returned_items,
    "q18_large_orders": q18_large_orders,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q7_volume_shipping": q7_volume_shipping,
    "q12_late_shipments": q12_late_shipments,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q21_sole_late_supplier": q21_sole_late_supplier,
    "order_reconciliation": q_order_reconciliation,
    "part_affinity_topk": q_part_affinity_topk,
    "q22_dormant_customers": q22_dormant_customers,
    "customer_nations": q_customer_nations,
    "ks_drift": q_ks_drift,
    "psi_drift": q_psi_drift,
    "q3_shipping": q3_shipping,
    "events_distinct_users": q_events_distinct_users,
    "mode_priority_by_status": q_mode_priority_by_status,
    "q4_priority_exists": q4_priority_exists,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top_orders_per_customer": q_top_orders_per_customer,
    "sample_sorted": q_sample_sorted,
    "pca_importance": q_pca_importance,
    "entropy": q_entropy,
    "priority_entropy_by_status": q_priority_entropy_by_status,
    "chi2_type_dow": q_chi2_type_dow,
    "priority_hhi_by_status": q_priority_hhi_by_status,
    "peak_hour_per_type": q_peak_hour_per_type,
    "view_purchase_hourly_corr": q_view_purchase_hourly_corr,
    "event_value_share": q_event_value_share,
    "event_type_nearest": q_event_type_nearest,
    "minmax_ts": q_minmax_ts,
    "non_ascii": q_non_ascii,
    # dedup / similarity / text extensions (entries without an ORACLE twin
    # get the driver's rows-only check; each is oracle-tested in pytest on
    # corpora with known duplicate structure instead)
    "dedup_exact_hash": q_dedup_exact_hash,
    "jaccard_near_dups": q_jaccard_near_dups,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_lp": q_dedup_clusters_lp,
    "top_docs_per_source": q_top_docs_per_source,
    "stratified_sample": q_stratified_sample,
    "docs_above_p90": q_docs_above_p90,
    "docs_pii_redacted": q_docs_pii_redacted,
    "epoch_mix": q_epoch_mix,
    "ann_topk": q_ann_topk,
    "ivf_topk": q_ivf_topk,
    "word_freqs": q_word_freqs,
    "word_zipf_slope": q_word_zipf_slope,
    "docs_dup_rate_by_source": q_docs_dup_rate_by_source,
    "ks_two_sample_sources": q_ks_two_sample_sources,
    "mannwhitney_sources": q_mannwhitney_sources,
    "shingle_novelty_by_source": q_shingle_novelty_by_source,
    "doc_pct_rank_in_source": q_doc_pct_rank_in_source,
    "docs_quality": q_docs_quality,
    "docs_repetition": q_docs_repetition,
    "lm_surprisal": q_lm_surprisal,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "embedding_near_dups": q_embedding_near_dups,
    "tfidf_top_ngrams": q_tfidf_top_ngrams,
    "lang_histogram": q_lang_histogram,
    "doc_fingerprints": q_doc_fingerprints,
    "readability": q_readability,
    "benford_prices": q_benford_prices,
    "fd_census": q_fd_census,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "part_revenue_concentration": q_part_revenue_concentration,
    "ind_census": q_ind_census,
    "hourly_autocorr": q_hourly_autocorr,
    "part_graph_triangles": q_part_graph_triangles,
    "value_pattern_census": q_value_pattern_census,
    "part_rules_topk": q_part_rules_topk,
    "part_skyline": q_part_skyline,
    "fd_strength": q_fd_strength,
    "docs_upsert": q_docs_upsert,
    "hopping_distinct_users": q_hopping_distinct_users,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_volume_suppliers": q20_volume_suppliers,
    "embedding_label_centroids": q_embedding_label_centroids,
    "winsorized_price_mean": q_winsorized_price_mean,
    "nation_region_share": q_nation_region_share,
    "ship_latency_quantiles": q_ship_latency_quantiles,
    "dau_wau_stickiness": q_dau_wau_stickiness,
    "first_touch_attribution": q_first_touch_attribution,
    "rule_census": q_rule_census,
    "events_freshness": q_events_freshness,
    "hourly_volume_anomalies": q_hourly_volume_anomalies,
    "welch_t_sources": q_welch_t_sources,
    "event_order_conformance": q_event_order_conformance,
    "js_drift_roles": q_js_drift_roles,
    "monthly_revenue_mom": q_monthly_revenue_mom,
    "robust_outliers_by_flag": q_robust_outliers_by_flag,
    "price_gmean_by_flag": q_price_gmean_by_flag,
    "assoc_type_dow": q_assoc_type_dow,
    "top_parts_per_flag_ties": q_top_parts_per_flag_ties,
    "dow_hour_heatmap": q_dow_hour_heatmap,
    "customer_ltv_deciles": q_customer_ltv_deciles,
}


# ---------------------------------------------------------------------------
# batch 7: rank/robust statistics + sequential validation monitors


def q_spearman_qty_disc_by_flag(sf_dir: str) -> pd.DataFrame:
    """SPEARMAN RANK CORRELATION (average-rank ties) of quantity vs
    discount per returnflag — the rank-based sibling of the Pearson
    family (corr_lineitem A17), robust to monotone transforms and the
    natural drift check for ordinal associations. Both variables live on
    tiny discrete domains (50 quantities x 11 discount cents), so the
    distributed shape is ONE zero-exchange contingency scan: each block
    folds a (flag, qty, disc_cents) count census (<= 1650 rows) via an
    in-block Arrow groupby; the driver merges censuses and derives
    DOUBLED average ranks (2*rank is always integral, even for tied
    averages) from the census margins. All six Pearson moments over the
    doubled ranks are exact Python big-ints — one float division at the
    end, identical expression tree to the SQL twin, rounded 6dp. Scale:
    the exchange payload is bounded by the value domains, never by rows;
    big-int moments never overflow."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount"])

    def _census(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]), pa.int64())
        d = pc.cast(pc.round(pc.multiply(batch["l_discount"],
                                         pa.scalar(100.0))), pa.int64())
        t = pa.table({"f": batch["l_returnflag"], "q": q, "d": d})
        g = t.group_by(["f", "q", "d"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    census = (parts.groupby(["f", "q", "d"], as_index=False)["cnt"].sum())
    rows = []
    for f, sub in census.groupby("f", sort=True):
        # doubled average ranks from prefix counts over each margin:
        # R2(v) = 2*cnt_lt(v) + cnt_eq(v) + 1  (exact int)
        r2 = {}
        for col in ("q", "d"):
            marg = sub.groupby(col)["cnt"].sum().sort_index()
            acc, m = 0, {}
            for v, c in marg.items():
                m[v] = 2 * acc + int(c) + 1
                acc += int(c)
            r2[col] = m
        n = sa = sb = saa = sbb = sab = 0
        for qv, dv, c in sub[["q", "d", "cnt"]].itertuples(index=False):
            a, b, c = r2["q"][qv], r2["d"][dv], int(c)
            n += c
            sa += c * a
            sb += c * b
            saa += c * a * a
            sbb += c * b * b
            sab += c * a * b
        num = n * sab - sa * sb
        da, db = n * saa - sa * sa, n * sbb - sb * sb
        sp = (round(float(num) / np.sqrt(float(da) * float(db)), 6)
              if da > 0 and db > 0 else None)
        rows.append({"l_returnflag": f, "n": n, "spearman": sp})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out


ORACLE["spearman_qty_disc_by_flag"] = """
    WITH c AS (
        SELECT l_returnflag AS f, CAST(ROUND(l_quantity) AS BIGINT) AS q,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
               COUNT(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1, 2, 3
    ),
    qr AS (
        SELECT f, q, 2 * SUM(c2) OVER (PARTITION BY f ORDER BY q)
                     - c2 + 1 AS a
        FROM (SELECT f, q, SUM(cnt)::BIGINT AS c2 FROM c GROUP BY 1, 2)
    ),
    dr AS (
        SELECT f, d, 2 * SUM(c2) OVER (PARTITION BY f ORDER BY d)
                     - c2 + 1 AS b
        FROM (SELECT f, d, SUM(cnt)::BIGINT AS c2 FROM c GROUP BY 1, 2)
    ),
    mm AS (
        SELECT c.f, c.cnt, qr.a, dr.b
        FROM c JOIN qr ON c.f = qr.f AND c.q = qr.q
               JOIN dr ON c.f = dr.f AND c.d = dr.d
    ),
    ag AS (
        SELECT f, SUM(cnt)::BIGINT AS n, SUM(cnt * a) AS sa,
               SUM(cnt * b) AS sb, SUM(cnt * a * a) AS saa,
               SUM(cnt * b * b) AS sbb, SUM(cnt * a * b) AS sab
        FROM mm GROUP BY 1
    )
    SELECT f AS l_returnflag, n,
           ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                 / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE)), 6) AS spearman
    FROM ag ORDER BY 1
"""
QUERIES["spearman_qty_disc_by_flag"] = q_spearman_qty_disc_by_flag


def q_cusum_peak_by_type(sf_dir: str) -> pd.DataFrame:
    """CUSUM CHANGE-POINT detector over each event type's hourly volume
    series — where does the cumulative count deviate furthest from a
    uniform-rate null? (the classic level-shift localizer that
    complements hourly_volume_anomalies' pointwise 3-sigma gate). The
    statistic D_k = n_hours*prefix_k - k*total is EXACT int64 (zero at
    both ends, extremal at the change point); peak = max |D_k| with the
    earliest hour breaking ties. Distributed shape: ONE (type, hour)
    count exchange folds the stream to the aggregate grain — bounded by
    the time span times |types|, like events_hourly — and the
    driver-side scan runs on that reduced census (hourly_autocorr
    precedent). int64-exact while n_hours*total < 2^63 (~10^13 events
    per type over a decade of hours)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": batch["event_type"], "hour": hour,
                         "one": pa.array(np.ones(batch.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [("one", "sum", "n")])
    series = inner.to_pandas()
    if edge is not None and edge.num_rows:
        series = pd.concat([series, edge.to_pandas()], ignore_index=True)
    series["n"] = series["n"].astype("int64")

    rows = []
    for etype, sub in series.groupby("event_type", sort=True):
        sub = sub.sort_values("hour").reset_index(drop=True)
        cn = sub["n"].to_numpy(np.int64)
        m = int(cn.size)
        tot = int(cn.sum())
        p = np.cumsum(cn)
        k = np.arange(1, m + 1, dtype=np.int64)
        dabs = np.abs(m * p - k * tot)
        i = int(np.argmax(dabs))  # first max == earliest hour (sorted)
        rows.append({"event_type": etype, "n_hours": m, "total": tot,
                     "peak_hour": sub["hour"].iloc[i],
                     "d_max": int(dabs[i])})
    out = pd.DataFrame(rows)
    for c in ("n_hours", "total", "d_max"):
        out[c] = out[c].astype("int64")
    return out


ORACLE["cusum_peak_by_type"] = """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hour,
               COUNT(*) OVER (PARTITION BY event_type)::BIGINT AS nh,
               SUM(n) OVER (PARTITION BY event_type)::BIGINT AS tot,
               SUM(n) OVER (PARTITION BY event_type
                            ORDER BY hour)::BIGINT AS p,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY hour)::BIGINT AS k
        FROM h
    ),
    d AS (
        SELECT event_type, hour, nh, tot,
               ABS(nh * p - k * tot)::BIGINT AS dabs,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(nh * p - k * tot) DESC,
                                           hour) AS rn
        FROM w
    )
    SELECT event_type, nh AS n_hours, tot AS total, hour AS peak_hour,
           dabs AS d_max
    FROM d WHERE rn = 1 ORDER BY event_type
"""
QUERIES["cusum_peak_by_type"] = q_cusum_peak_by_type


def q_source_wilson_short_docs(sf_dir: str) -> pd.DataFrame:
    """WILSON LOWER BOUND of each source's short-document rate
    (n_chars < 100) — the small-sample-corrected quality ranking: a
    source with 2/10 short docs must NOT outrank one with 30/1000, which
    a raw proportion gets wrong. Zero-exchange distributed shape
    (welch_t_sources family): each block folds (source, n, n_short)
    exact int64 partials via an in-block Arrow groupby; the driver
    merges |sources| rows and evaluates the Wilson interval (z = 1.96)
    through the identical expression tree as the SQL twin, rounded
    6dp."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _partial(batch: pa.Table) -> pa.Table:
        short = pc.cast(pc.less(batch["n_chars"],
                                pa.scalar(100, pa.int64())), pa.int64())
        t = pa.table({"source": batch["source"], "short": short})
        g = t.group_by(["source"], use_threads=False).aggregate(
            [([], "count_all"), ("short", "sum")])
        return g.rename_columns(
            [{"count_all": "n", "short_sum": "k"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    agg = (parts.groupby("source", as_index=False)[["n", "k"]].sum()
           .sort_values("source").reset_index(drop=True))
    z = 1.96
    rows = []
    for source, n, k in agg.itertuples(index=False):
        n, k = int(n), int(k)
        p = k / n
        lb = ((p + z * z / (2 * n)
               - z * np.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)))
              / (1 + z * z / n))
        rows.append({"source": source, "n_docs": n, "n_short": k,
                     "wilson_lb": round(float(lb), 6)})
    out = pd.DataFrame(rows)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_short"] = out["n_short"].astype("int64")
    return out


ORACLE["source_wilson_short_docs"] = """
    WITH s AS (
        SELECT source, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)::BIGINT AS k
        FROM documents GROUP BY 1
    )
    SELECT source, n AS n_docs, k AS n_short,
           ROUND((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
                  - 1.96 * SQRT((CAST(k AS DOUBLE) / n)
                                * (1 - CAST(k AS DOUBLE) / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_lb
    FROM s ORDER BY source
"""
QUERIES["source_wilson_short_docs"] = q_source_wilson_short_docs


def q_trend_mk_daily(sf_dir: str) -> pd.DataFrame:
    """MANN-KENDALL MONOTONIC-TREND test per event type over its daily
    volume series: S = sum of sign(c_j - c_i) over ordered day pairs
    (exact integer), plus the ties-adjusted Kendall tau-b (days are
    distinct so only value ties enter the correction). The
    non-parametric drift monitor for "is volume drifting up/down" that
    needs no distributional assumption — complements CUSUM (level
    shift) and the 3-sigma gate (pointwise). Distributed shape: ONE
    (type, day) count exchange to the bounded aggregate grain; the
    O(days^2) pair scan runs on the reduced census (hundreds of rows per
    type regardless of event count — hourly_autocorr precedent)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"event_type": batch["event_type"], "day": day,
                         "one": pa.array(np.ones(batch.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "day"], [("one", "sum", "n")])
    series = inner.to_pandas()
    if edge is not None and edge.num_rows:
        series = pd.concat([series, edge.to_pandas()], ignore_index=True)
    series["n"] = series["n"].astype("int64")

    rows = []
    for etype, sub in series.groupby("event_type", sort=True):
        cn = (sub.sort_values("day")["n"].to_numpy(np.int64))
        m = int(cn.size)
        iu = np.triu_indices(m, 1)
        s = int(np.sign(cn[None, :] - cn[:, None])[iu].sum())
        n0 = m * (m - 1) // 2
        _, vc = np.unique(cn, return_counts=True)
        n2 = int((vc * (vc - 1) // 2).sum())
        tau = (round(float(s) / np.sqrt(float(n0) * float(n0 - n2)), 6)
               if n0 > 0 and n0 > n2 else None)
        rows.append({"event_type": etype, "n_days": m, "s_stat": s,
                     "tau_b": tau})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["s_stat"] = out["s_stat"].astype("int64")
    return out


ORACLE["trend_mk_daily"] = """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               SUM(CASE WHEN b.n > a.n THEN 1
                        WHEN b.n < a.n THEN -1 ELSE 0 END)::BIGINT AS s_stat
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1
    ),
    m AS (SELECT event_type, COUNT(*)::BIGINT AS m FROM d GROUP BY 1),
    t AS (
        SELECT event_type, SUM(c * (c - 1) // 2)::BIGINT AS n2
        FROM (SELECT event_type, n, COUNT(*)::BIGINT AS c
              FROM d GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT m.event_type, m.m AS n_days, s.s_stat,
           ROUND(CAST(s.s_stat AS DOUBLE)
                 / SQRT(CAST(m.m * (m.m - 1) // 2 AS DOUBLE)
                        * CAST(m.m * (m.m - 1) // 2 - t.n2 AS DOUBLE)), 6)
               AS tau_b
    FROM m JOIN s USING (event_type) JOIN t USING (event_type)
    ORDER BY 1
"""
QUERIES["trend_mk_daily"] = q_trend_mk_daily


# ---------------------------------------------------------------------------
# batch 8: sequence mining + privacy validation census


def q_event_trigrams(sf_dir: str) -> pd.DataFrame:
    """ORDER-3 SEQUENCE CENSUS over each user's event stream: counts of
    every consecutive event-type triple — the sequence-mining step up
    from role_transitions' Markov pairs (detects looping patterns a
    bigram census cannot, e.g. view→view→view hammering vs browsing).
    stages.window.trigram_counts: ONE sort exchange, per-block triple
    reduction to a ≤|types|³ partial, depth-2 rolling-tail boundary
    stitch (a triple straddling THREE blocks is handled); the LAG
    columns never materialize."""
    from ..stages.window import trigram_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "v": t["event_type"]})

    inner, edge = trigram_counts(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "user_id", ["ts_us", "event_id"], "v")
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    if out.empty or "v1" not in out.columns:
        # an all-short-runs corpus has zero triples; Ray's to_pandas
        # drops columns on an all-empty dataset (empty-block class)
        return pd.DataFrame({"v1": pd.Series([], dtype=object),
                             "v2": pd.Series([], dtype=object),
                             "v3": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["v1", "v2", "v3"]).reset_index(drop=True)


ORACLE["event_trigrams"] = """
    WITH l AS (
        SELECT user_id, event_type AS v3,
               LAG(event_type, 1) OVER w AS v2,
               LAG(event_type, 2) OVER w AS v1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT v1, v2, v3, COUNT(*)::BIGINT AS n
    FROM l WHERE v1 IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""
QUERIES["event_trigrams"] = q_event_trigrams


def q_role_transition_entropy(sf_dir: str) -> pd.DataFrame:
    """CONDITIONAL ENTROPY of the role-transition matrix: per previous
    role, H(next | prev) in bits — the one-number "how degenerate is the
    dialogue flow" monitor (0 bits = deterministic next role, log2|roles|
    = uniform). Reuses role_transitions' distributed shape
    (stages.window.transition_counts, ONE sort exchange, ≤|roles|²
    partials); the driver folds entropy from EXACT integer counts via
    H = log2(N) − Σ n·log2(n)/N — the numerically stable form shared
    with the SQL twin (entropy family precedent, A16)."""
    from ..stages.window import event_roles, transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _roles(t: pa.Table) -> pa.Table:
        ev = t["event_type"]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        role = event_roles(ev.to_numpy(zero_copy_only=False))
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "role": pa.array(role, pa.string())})

    inner, edge = transition_counts(
        ds.map_batches(_roles, batch_format="pyarrow"),
        "user_id", ["ts_us", "event_id"], "role",
        prev_name="prev_role", cur_name="role")
    counts = inner.to_pandas()
    if edge is not None and edge.num_rows:
        counts = pd.concat([counts, edge.to_pandas()], ignore_index=True)
    counts["n"] = counts["n"].astype("int64")
    rows = []
    for prev, sub in counts.groupby("prev_role", sort=True):
        cn = sub.groupby("role")["n"].sum().to_numpy(np.int64)
        total = int(cn.sum())
        h = float(np.log2(float(total))
                  - (cn.astype(np.float64) * np.log2(cn.astype(np.float64))
                     ).sum() / total)
        rows.append({"prev_role": prev, "n": total,
                     "h_bits": round(h, 6)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out


ORACLE["role_transition_entropy"] = (
    f"""
    WITH t AS ({_TRANSCRIPTS_SQL}),
    l AS (
        SELECT role,
               LAG(role) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS prev_role
        FROM t
    ),
    c AS (
        SELECT prev_role, role, COUNT(*)::BIGINT AS n
        FROM l WHERE prev_role IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT prev_role, SUM(n)::BIGINT AS total FROM c GROUP BY 1)
    SELECT c.prev_role, tot.total AS n,
           ROUND(LOG2(CAST(tot.total AS DOUBLE))
                 - SUM(CAST(c.n AS DOUBLE) * LOG2(CAST(c.n AS DOUBLE)))
                   / tot.total, 6) AS h_bits
    FROM c JOIN tot USING (prev_role)
    GROUP BY c.prev_role, tot.total ORDER BY c.prev_role
"""
)
QUERIES["role_transition_entropy"] = q_role_transition_entropy


def q_k_anonymity_census(sf_dir: str) -> pd.DataFrame:
    """K-ANONYMITY CENSUS over the (nation, market segment)
    quasi-identifier on customers — the privacy-validation gate a
    training-data release pipeline runs before shipping: how many QI
    equivalence classes exist, how small is the smallest, and how many
    rows sit in classes below k=5 (re-identifiable under linkage).
    Distributed shape: ONE skinny (nationkey, mktsegment) count exchange
    to the QI-class grain (bounded by the QI domain, never by rows); the
    four-number census folds from that reduced table."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["c_nationkey", "c_mktsegment"], [("one", "sum", "sz")])
    g = inner.to_pandas()
    if edge is not None and edge.num_rows:
        g = pd.concat([g, edge.to_pandas()], ignore_index=True)
    sz = g["sz"].astype("int64")
    k = 5
    return pd.DataFrame({
        "n_groups": pd.Series([len(sz)], dtype="int64"),
        "min_group_size": pd.Series([int(sz.min())], dtype="int64"),
        "groups_below_k": pd.Series([int((sz < k).sum())], dtype="int64"),
        "rows_at_risk": pd.Series([int(sz[sz < k].sum())], dtype="int64"),
    })


ORACLE["k_anonymity_census"] = """
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS sz
        FROM customer GROUP BY 1, 2
    )
    SELECT COUNT(*)::BIGINT AS n_groups,
           MIN(sz) AS min_group_size,
           SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END)::BIGINT AS groups_below_k,
           COALESCE(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END), 0)::BIGINT
               AS rows_at_risk
    FROM g
"""
QUERIES["k_anonymity_census"] = q_k_anonymity_census


def q_l_diversity_census(sf_dir: str) -> pd.DataFrame:
    """L-DIVERSITY CENSUS — k-anonymity's sibling: within each
    (orderstatus, order year) quasi-identifier class, how many DISTINCT
    sensitive values (order priority) appear? A class can be large yet
    reveal its sensitive attribute if every member shares one value.
    Distributed shape: ONE (status, year, priority) count exchange to
    the joint grain (bounded by the attribute domains); the per-class
    distinct census and the four-number summary fold from that reduced
    table."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderdate", "o_orderpriority"])

    def _pre(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us"))),
                     pa.int64())
        return pa.table({"st": t["o_orderstatus"], "yr": yr,
                         "sv": t["o_orderpriority"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["st", "yr", "sv"], [("one", "sum", "cnt")])
    d = inner.to_pandas()
    if edge is not None and edge.num_rows:
        d = pd.concat([d, edge.to_pandas()], ignore_index=True)
    d["cnt"] = d["cnt"].astype("int64")
    g = (d.groupby(["st", "yr"]).agg(l=("sv", "size"), sz=("cnt", "sum"))
         .reset_index())
    lmin = 3
    return pd.DataFrame({
        "n_groups": pd.Series([len(g)], dtype="int64"),
        "min_l": pd.Series([int(g["l"].min())], dtype="int64"),
        "groups_below_l": pd.Series([int((g["l"] < lmin).sum())],
                                    dtype="int64"),
        "rows_at_risk": pd.Series([int(g.loc[g["l"] < lmin, "sz"].sum())],
                                  dtype="int64"),
    })


ORACLE["l_diversity_census"] = """
    WITH d AS (
        SELECT o_orderstatus AS st, year(o_orderdate) AS yr,
               o_orderpriority AS sv, COUNT(*)::BIGINT AS cnt
        FROM orders GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT st, yr, COUNT(*)::BIGINT AS l, SUM(cnt)::BIGINT AS sz
        FROM d GROUP BY 1, 2
    )
    SELECT COUNT(*)::BIGINT AS n_groups,
           MIN(l) AS min_l,
           SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END)::BIGINT AS groups_below_l,
           COALESCE(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END), 0)::BIGINT
               AS rows_at_risk
    FROM g
"""
QUERIES["l_diversity_census"] = q_l_diversity_census


# ---------------------------------------------------------------------------
# batch 9: entity resolution + robust trend + corpus keyness


def q_customer_name_matches(sf_dir: str) -> pd.DataFrame:
    """EDIT-DISTANCE-1 SIMILARITY SELF-JOIN on customer names — the
    entity-resolution fuzzy-match operator (dirty-key detection the
    reference's exact duplicate flag, Profiler.py:541, cannot see).
    Exact: deletion-neighborhood blocking (a pair at lev<=1 always
    shares a hashed deletion key) -> single bucket sort exchange ->
    pair-dedup exchange -> two sorted-merge joins attach names ->
    vectorized char-matrix lev<=1 verify in map tasks. Candidate pairs
    never land on the driver; the oracle twin is the quadratic
    cross-join DuckDB can afford only at test scale. The stage's
    documented min-length-2 contract (sub-2-char strings degenerate
    into one giant deletion bucket) is mirrored by the twin's length
    filter — a no-op on customer names, which are fixed-width."""
    from .dedup import edit_distance_pairs_ds

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = edit_distance_pairs_ds(ds, "c_custkey", "c_name",
                                 rows_hint=int(ds.count())).to_pandas()
    if out.empty:
        return pd.DataFrame({"a_name": pd.Series([], dtype=object),
                             "b_name": pd.Series([], dtype=object)})
    a = out["name_a"].to_numpy(object)
    b = out["name_b"].to_numpy(object)
    df = pd.DataFrame({"a_name": np.minimum(a, b),
                       "b_name": np.maximum(a, b)})
    # names are unique per customer, so id pairs <-> name pairs are 1:1;
    # the strict a_name < b_name mirrors the oracle's anti-reflexive join
    df = df[df["a_name"] != df["b_name"]]
    return df.sort_values(["a_name", "b_name"]).reset_index(drop=True)


ORACLE["customer_name_matches"] = """
    SELECT a.c_name AS a_name, b.c_name AS b_name
    FROM customer a, customer b
    WHERE a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
      AND length(a.c_name) >= 2 AND length(b.c_name) >= 2
    ORDER BY 1, 2
"""
QUERIES["customer_name_matches"] = q_customer_name_matches


def q_theil_sen_daily(sf_dir: str) -> pd.DataFrame:
    """THEIL-SEN ROBUST TREND SLOPE per event type over its daily
    volume series: the median of all pairwise slopes
    (n_j - n_i) / (day_j - day_i) — the robust (29%-breakdown)
    complement to Mann-Kendall's direction test (trend_mk_daily):
    MK says WHETHER volume drifts, Theil-Sen says HOW FAST, immune to
    outlier days a least-squares fit would chase. Distributed shape:
    ONE (type, day) count exchange to the bounded census; the O(days^2)
    slope scan runs on the reduced table. The median interpolation is
    written as lo + (hi - lo) * 0.5 — DuckDB's quantile_cont expression
    — so the 6dp-rounded value matches the oracle bit-for-bit."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"event_type": batch["event_type"], "day": day,
                         "one": pa.array(np.ones(batch.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "day"], [("one", "sum", "n")])
    series = inner.to_pandas()
    if edge is not None and edge.num_rows:
        series = pd.concat([series, edge.to_pandas()], ignore_index=True)
    series["n"] = series["n"].astype("int64")

    rows = []
    for etype, sub in series.groupby("event_type", sort=True):
        sub = sub.sort_values("day")
        cn = sub["n"].to_numpy(np.int64)
        dd = (sub["day"].to_numpy("datetime64[us]").astype("int64")
              // 86_400_000_000)
        m = int(cn.size)
        if m < 2:
            rows.append({"event_type": etype, "n_days": m, "slope": None})
            continue
        iu, ju = np.triu_indices(m, 1)
        sl = np.sort((cn[ju] - cn[iu]).astype(np.float64)
                     / (dd[ju] - dd[iu]).astype(np.float64))
        k = sl.size
        lo, hi = sl[(k - 1) // 2], sl[k // 2]
        rows.append({"event_type": etype, "n_days": m,
                     "slope": round(float(lo + (hi - lo) * 0.5), 6)})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["slope"] = out["slope"].astype("float64")
    return out


ORACLE["theil_sen_daily"] = """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT a.event_type,
               CAST(b.n - a.n AS DOUBLE)
                   / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS sl
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    m AS (SELECT event_type, COUNT(*)::BIGINT AS n_days FROM d GROUP BY 1)
    SELECT m.event_type, m.n_days,
           ROUND(q.med, 6) AS slope
    FROM m LEFT JOIN (SELECT event_type, quantile_cont(sl, 0.5) AS med
                      FROM p GROUP BY 1) q USING (event_type)
    ORDER BY 1
"""
QUERIES["theil_sen_daily"] = q_theil_sen_daily


def q_keyness_by_source(sf_dir: str) -> pd.DataFrame:
    """DUNNING G² KEYNESS CENSUS: for every (source, token) with a
    global token count >= 20, the log-likelihood-ratio keyness of that
    token in the source vs the rest of the corpus — the standard
    "distinctive vocabulary" statistic of corpus linguistics (what makes
    source X read differently), sharper than TF-IDF for common words.
    Distributed shape: per-block (source, token) count partials (same
    tokenizer as word_freqs: [a-z']+ on lowercased text) -> ONE grouped
    exchange to the vocab x sources grain; margins, totals and the G²
    terms finalize from exact integer counts on the reduced census with
    a single-expression float tree mirrored in the oracle."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z']+")
        ex = pd.DataFrame({"source": df["source"].to_numpy().repeat(
            toks.str.len().to_numpy()),
            "token": np.concatenate([np.asarray(t, dtype=object)
                                     for t in toks]) if len(toks) else
            np.array([], dtype=object)})
        g = ex.groupby(["source", "token"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    inner, edge = sorted_groupby(
        ds.map_batches(_counts, batch_format="pandas", batch_size=65536),
        ["source", "token"], [("n", "sum", "n")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    c["n"] = c["n"].astype("int64")

    src_tot = c.groupby("source")["n"].sum()
    tok_tot = c.groupby("token")["n"].sum()
    n_tot = int(c["n"].sum())
    c = c[c["token"].map(tok_tot).ge(20)].copy()
    a = c["n"].to_numpy(np.float64)
    ct = c["source"].map(src_tot).to_numpy(np.float64)
    tt = c["token"].map(tok_tot).to_numpy(np.float64)
    b = tt - a
    d = float(n_tot) - ct
    term1 = a * np.log(a / (ct * tt / float(n_tot)))
    term2 = np.where(b > 0, b * np.log(
        np.where(b > 0, b, 1.0) / (d * tt / float(n_tot))), 0.0)
    c["g2"] = np.round(2.0 * (term1 + term2), 6)
    c["n"] = c["n"].astype("int64")
    return (c[["source", "token", "n", "g2"]]
            .sort_values(["source", "token"]).reset_index(drop=True))


ORACLE["keyness_by_source"] = """
    WITH w AS (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS token
        FROM documents
    ),
    c AS (SELECT source, token, COUNT(*)::BIGINT AS n FROM w GROUP BY 1, 2),
    s AS (SELECT source, SUM(n)::BIGINT AS c_tot FROM c GROUP BY 1),
    t AS (SELECT token, SUM(n)::BIGINT AS t_tot FROM c GROUP BY 1),
    g AS (SELECT SUM(n)::BIGINT AS n_tot FROM c)
    SELECT c.source, c.token, c.n,
           ROUND(2.0 * (
               CAST(c.n AS DOUBLE) * ln(CAST(c.n AS DOUBLE)
                   / (CAST(s.c_tot AS DOUBLE) * CAST(t.t_tot AS DOUBLE)
                      / CAST(g.n_tot AS DOUBLE)))
             + CASE WHEN t.t_tot - c.n > 0 THEN
                   CAST(t.t_tot - c.n AS DOUBLE)
                   * ln(CAST(t.t_tot - c.n AS DOUBLE)
                        / ((CAST(g.n_tot AS DOUBLE) - CAST(s.c_tot AS DOUBLE))
                           * CAST(t.t_tot AS DOUBLE)
                           / CAST(g.n_tot AS DOUBLE)))
               ELSE 0.0 END), 6) AS g2
    FROM c JOIN s USING (source) JOIN t USING (token) CROSS JOIN g
    WHERE t.t_tot >= 20
    ORDER BY 1, 2
"""
QUERIES["keyness_by_source"] = q_keyness_by_source


# ---------------------------------------------------------------------------
# batch 10: SCD2 islands + corpus overlap + cluster-size census


def q_user_type_intervals(sf_dir: str) -> pd.DataFrame:
    """SCD2 / GAPS-AND-ISLANDS interval build: each user's event stream
    collapsed into maximal runs of consecutive equal event_type, one row
    per island with its validity interval — the slowly-changing-dimension
    reconstruction every warehouse pipeline needs (and the LAG
    change-flag + windowed SUM + GROUP BY twin in SQL).
    stages.window.value_islands: ONE sort exchange, interior islands
    finalize in block tasks, O(blocks) boundary fragments carry-merged on
    the driver — island and partition sizes never bound driver memory."""
    from ..stages.window import value_islands

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    out = value_islands(ds, "user_id", "ts", "event_id",
                        "event_type").to_pandas()
    if out.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype=object),
            "start_ts": pd.Series([], dtype="datetime64[us]"),
            "end_ts": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64")})
    out["start_ts"] = out.pop("start_us").astype("datetime64[us]")
    out["end_ts"] = out.pop("end_us").astype("datetime64[us]")
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["user_id", "event_type", "start_ts", "end_ts", "n_events"]]
            .sort_values(["user_id", "start_ts"]).reset_index(drop=True))


ORACLE["user_type_intervals"] = """
    WITH t AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = LAG(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 0 ELSE 1 END AS brk
        FROM events
    ),
    i AS (
        SELECT user_id, ts, event_type,
               SUM(brk) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS isl
        FROM t
    )
    SELECT user_id, MIN(event_type) AS event_type,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           COUNT(*)::BIGINT AS n_events
    FROM i GROUP BY user_id, isl
    ORDER BY user_id, start_ts
"""
QUERIES["user_type_intervals"] = q_user_type_intervals


def q_source_token_overlap(sf_dir: str) -> pd.DataFrame:
    """PAIRWISE CORPUS OVERLAP MATRIX: exact Jaccard similarity between
    every two sources' distinct token vocabularies — the
    provenance-redundancy diagnostic before mixing corpora (two sources
    with jaccard ~1 contribute one voice twice). Distributed shape:
    per-block (source, token) distinct partials -> ONE grouped exchange
    to the bounded vocab x sources census; the |sources|² pair scan runs
    on the reduced table (set algebra over dictionary-sized domains,
    never the text)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z']+")
        ex = pd.DataFrame({
            "source": df["source"].to_numpy().repeat(
                toks.str.len().to_numpy()),
            "token": np.concatenate(
                [np.asarray(t, dtype=object) for t in toks])
            if len(toks) else np.array([], dtype=object)})
        out = ex.drop_duplicates(ignore_index=True)
        out["one"] = np.ones(len(out), dtype=np.int64)
        return out

    inner, edge = sorted_groupby(
        ds.map_batches(_distinct, batch_format="pandas", batch_size=65536),
        ["source", "token"], [("one", "sum", "n")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)

    sets = {s: set(g["token"]) for s, g in c.groupby("source")}
    rows = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a]) + len(sets[b]) - inter
            rows.append({"a_source": a, "b_source": b,
                         "n_inter": inter, "n_union": union,
                         "jaccard": round(float(inter) / float(union), 6)})
    if not rows:  # disjoint vocabularies: the inner-join twin is empty
        return pd.DataFrame({"a_source": pd.Series([], dtype=object),
                             "b_source": pd.Series([], dtype=object),
                             "n_inter": pd.Series([], dtype="int64"),
                             "n_union": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    out = pd.DataFrame(rows)
    out["n_inter"] = out["n_inter"].astype("int64")
    out["n_union"] = out["n_union"].astype("int64")
    return out


ORACLE["source_token_overlap"] = """
    WITH w AS (
        SELECT DISTINCT source,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS tok
        FROM documents
    ),
    s AS (SELECT source, COUNT(*)::BIGINT AS n FROM w GROUP BY 1),
    i AS (
        SELECT a.source AS sa, b.source AS sb, COUNT(*)::BIGINT AS inter
        FROM w a JOIN w b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT sa AS a_source, sb AS b_source, i.inter AS n_inter,
           (x.n + y.n - i.inter) AS n_union,
           ROUND(CAST(i.inter AS DOUBLE)
                 / CAST(x.n + y.n - i.inter AS DOUBLE), 6) AS jaccard
    FROM i JOIN s x ON x.source = i.sa JOIN s y ON y.source = i.sb
    ORDER BY 1, 2
"""
QUERIES["source_token_overlap"] = q_source_token_overlap


def q_dedup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """NEAR-DUP CLUSTER-SIZE CENSUS: the distribution of duplicate-
    cluster sizes from the verified rare-word-Jaccard clustering — the
    one-glance dedup health metric (a few huge clusters = template spam;
    many pairs = crawl echo). Reuses the q_dedup_clusters composition;
    the census folds from the (doc, cluster) labeling, bounded by
    cluster count."""
    cl = q_dedup_clusters(sf_dir)
    if cl.empty:
        return pd.DataFrame({"cluster_size": pd.Series([], dtype="int64"),
                             "n_clusters": pd.Series([], dtype="int64")})
    sizes = cl.groupby("cluster_id").size()
    census = sizes.value_counts().sort_index()
    return pd.DataFrame({"cluster_size": census.index.astype("int64"),
                         "n_clusters": census.to_numpy(np.int64)})


ORACLE["dedup_cluster_sizes"] = """
    WITH RECURSIVE words AS (
      SELECT DISTINCT doc_id,
             UNNEST(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 64),
    rw AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rw GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM rw a JOIN rw b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    lab AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
    cs AS (SELECT cluster_id, COUNT(*)::BIGINT AS cluster_size
           FROM lab GROUP BY 1)
    SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
    FROM cs GROUP BY 1 ORDER BY 1
"""
QUERIES["dedup_cluster_sizes"] = q_dedup_cluster_sizes


# ---------------------------------------------------------------------------
# batch 11: session-level analytics + RFM segmentation


def q_session_landing(sf_dir: str) -> pd.DataFrame:
    """SESSION LANDING / BOUNCE CENSUS: per landing event type (the
    first event of each 30-minute-gap session), how many sessions start
    there and what fraction end immediately (n_events == 1) — the
    product-analytics staple bounce rate, here as a validation signal
    (a spiking bounce rate on one entry point flags broken data or a
    broken flow). stages.window.session_intervals: ONE sort exchange,
    per-session rows finalize in block tasks with the landing value
    carried through O(blocks) boundary fragments; the census folds from
    per-block partials over the bounded landing-type domain."""
    from ..stages.window import session_intervals

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    sess = session_intervals(ds, "user_id", "ts", "event_id",
                             "event_type", gap_us=1_800_000_000)

    def _census(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.equal(t["n_events"], 1), pa.int64())
        tt = pa.table({"landing": t["landing"], "b": b})
        g = tt.group_by(["landing"], use_threads=False).aggregate(
            [("b", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"b_sum": "nb", "count_all": "ns"}.get(c, c)
             for c in g.column_names])

    parts = sess.map_batches(_census, batch_format="pyarrow",
                             batch_size=131072).to_pandas()
    out = (parts.groupby("landing", as_index=False)[["ns", "nb"]].sum()
           .sort_values("landing").reset_index(drop=True))
    out["n_sessions"] = out["ns"].astype("int64")
    out["n_bounces"] = out["nb"].astype("int64")
    out["bounce_rate"] = np.round(
        out["n_bounces"].to_numpy(np.float64)
        / out["n_sessions"].to_numpy(np.float64), 6)
    return (out.rename(columns={"landing": "landing_type"})
            [["landing_type", "n_sessions", "n_bounces", "bounce_rate"]])


ORACLE["session_landing"] = """
    WITH t AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        <= 1800000000
                    THEN 0 ELSE 1 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(brk) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS sid
        FROM t
    ),
    f AS (
        SELECT user_id, sid, event_type,
               FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sid
                                             ORDER BY ts, event_id)
                   AS landing
        FROM s
    ),
    g AS (SELECT user_id, sid, MIN(landing) AS landing,
                 COUNT(*)::BIGINT AS n
          FROM f GROUP BY 1, 2)
    SELECT landing AS landing_type, COUNT(*)::BIGINT AS n_sessions,
           SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM g GROUP BY 1 ORDER BY 1
"""
QUERIES["session_landing"] = q_session_landing


def q_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM SEGMENTATION CENSUS (recency / frequency / monetary): each
    user's last-activity timestamp, event count and exact-cent spend are
    quintile-ranked globally and the 5×5×5 segment census reported —
    the classic CRM cohort cut. Distributed shape: ONE user-grain
    exchange reduces the stream to per-user aggregates; THREE global
    sorts via row_number_within's constant-partition carry chain rank
    the reduced table (never the driver — the ltv_deciles precedent);
    quintile labels are the EXACT integer formula ((rn−1)·5)//n under
    deterministic (metric, user_id) tie order, so placement is
    bit-identical to the ROW_NUMBER twin (NTILE deliberately avoided)."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import row_number_within

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.coalesce(t["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "last_us": us, "one": pa.array(
                             np.ones(t.num_rows, np.int64)),
                         "cents": cents})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id"],
        [("last_us", "max", "last_us"), ("one", "sum", "n"),
         ("cents", "sum", "cents")])
    users = inner
    if edge is not None and edge.num_rows:
        users = users.union(rd.from_arrow(edge))

    def _const(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows,
                                                      np.int64)))

    ranked = users.map_batches(_const, batch_format="pyarrow",
                               batch_size=131072)
    ranked = row_number_within(ranked, "g", ["last_us", "user_id"],
                               out_col="r_rn", start=1)
    ranked = row_number_within(ranked, "g", ["n", "user_id"],
                               out_col="f_rn", start=1)
    ranked = row_number_within(ranked, "g", ["cents", "user_id"],
                               out_col="m_rn", start=1)
    nu = ranked.count()

    def _census(t: pa.Table) -> pa.Table:
        cols = {}
        for q, rn in (("r_q", "r_rn"), ("f_q", "f_rn"), ("m_q", "m_rn")):
            cols[q] = pc.divide(pc.multiply(pc.subtract(t[rn], 1), 5),
                                pa.scalar(nu, pa.int64()))
        g = pa.table(cols).group_by(["r_q", "f_q", "m_q"],
                                    use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ranked.map_batches(_census, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
    out = (parts.groupby(["r_q", "f_q", "m_q"], as_index=False)["n"].sum()
           .sort_values(["r_q", "f_q", "m_q"]).reset_index(drop=True))
    out = out.rename(columns={"n": "n_users"})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


ORACLE["rfm_segments"] = """
    WITH u AS (
        SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT ROW_NUMBER() OVER (ORDER BY last_us, user_id) AS r_rn,
               ROW_NUMBER() OVER (ORDER BY n, user_id) AS f_rn,
               ROW_NUMBER() OVER (ORDER BY cents, user_id) AS m_rn,
               COUNT(*) OVER () AS nu
        FROM u
    )
    SELECT CAST(((r_rn - 1) * 5) // nu AS BIGINT) AS r_q,
           CAST(((f_rn - 1) * 5) // nu AS BIGINT) AS f_q,
           CAST(((m_rn - 1) * 5) // nu AS BIGINT) AS m_q,
           COUNT(*)::BIGINT AS n_users
    FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""
QUERIES["rfm_segments"] = q_rfm_segments


def q_type_cosine_similarity(sf_dir: str) -> pd.DataFrame:
    """ITEM-ITEM COLLABORATIVE-FILTERING SIMILARITY: cosine between
    event types over their user-count vectors ("users who do A also do
    B") — the classic recommender similarity, computed EXACTLY: integer
    dot products and sums of squares, one float division at the end.
    Distributed shape: one (user, type) count exchange reduces the
    stream; stages.window.weighted_pair_dot expands per-user pair
    products in block tasks (ONE more sort exchange, O(blocks) fragment
    stitch) and merges partial dots; per-type Σn² folds from per-block
    partials over the bounded type domain."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import weighted_pair_dot

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id", "event_type"], [("one", "sum", "n")])
    census = inner
    if edge is not None and edge.num_rows:
        census = census.union(rd.from_arrow(edge))
    census = census.materialize()

    # per-type sum of squared user-counts (bounded |types| partials)
    def _ss(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        tt = pa.table({"event_type": t["event_type"],
                       "sq": pc.multiply(n, n)})
        g = tt.group_by(["event_type"], use_threads=False).aggregate(
            [("sq", "sum")])
        return g.rename_columns(
            [{"sq_sum": "ss"}.get(c, c) for c in g.column_names])

    ss = (census.map_batches(_ss, batch_format="pyarrow",
                             batch_size=131072).to_pandas()
          .groupby("event_type")["ss"].sum())

    d_inner, d_edge = weighted_pair_dot(census, "user_id", "event_type",
                                        "n")
    dots = d_inner.to_pandas()
    if d_edge is not None and d_edge.num_rows:
        dots = pd.concat([dots, d_edge.to_pandas()], ignore_index=True)
    dots["dot"] = dots["dot"].astype("int64")
    ssa = dots["item_a"].map(ss).to_numpy(np.float64)
    ssb = dots["item_b"].map(ss).to_numpy(np.float64)
    dots["cosine"] = np.round(
        dots["dot"].to_numpy(np.float64) / np.sqrt(ssa * ssb), 6)
    out = dots.rename(columns={"item_a": "a_type", "item_b": "b_type"})
    return (out[["a_type", "b_type", "dot", "cosine"]]
            .sort_values(["a_type", "b_type"]).reset_index(drop=True))


ORACLE["type_cosine_similarity"] = """
    WITH m AS (
        SELECT user_id, event_type, COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               SUM(a.n * b.n)::BIGINT AS dot
        FROM m a JOIN m b USING (user_id)
        WHERE a.event_type < b.event_type
        GROUP BY 1, 2
    ),
    s AS (SELECT event_type, SUM(n * n)::BIGINT AS ss FROM m GROUP BY 1)
    SELECT ta AS a_type, tb AS b_type, p.dot,
           ROUND(CAST(p.dot AS DOUBLE)
                 / sqrt(CAST(x.ss AS DOUBLE) * CAST(y.ss AS DOUBLE)), 6)
               AS cosine
    FROM p JOIN s x ON x.event_type = ta JOIN s y ON y.event_type = tb
    ORDER BY 1, 2
"""
QUERIES["type_cosine_similarity"] = q_type_cosine_similarity


def q_psi_weekly_types(sf_dir: str) -> pd.DataFrame:
    """PSI DRIFT TIME SERIES: Population Stability Index of the
    event-type mix for EVERY week against the first week — the
    production drift monitor as a trend, not a single gate (the
    north-star names PSI on categorical histograms; psi_drift is its
    two-period gate, this is the per-period series that shows WHEN the
    mix moved). One zero-exchange scan of per-block (week, type) count
    partials; the weeks × types census folds on the driver (bounded by
    the calendar, not the row count) and each week's PSI uses the same
    1e-4-floored share formula as the twin."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _partial(batch: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                               unit="week")
        t = pa.table({"week": wk, "event_type": batch["event_type"]})
        g = t.group_by(["week", "event_type"],
                       use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [("n" if c == "count_all" else c) for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    census = (parts.groupby(["week", "event_type"], as_index=False)["n"]
              .sum())
    weeks = sorted(census["week"].unique())
    # single-week (or empty) input: the oracle's grid excludes the
    # baseline week, so the result set is empty — return it typed
    if len(weeks) < 2:
        return pd.DataFrame({"week": pd.Series([], dtype="datetime64[us]"),
                             "psi": pd.Series([], dtype="float64")})
    base = census[census["week"] == weeks[0]].set_index("event_type")["n"]
    nb = float(base.sum())
    types = sorted(census["event_type"].unique())
    rows = []
    for wk in weeks[1:]:
        cur = census[census["week"] == wk].set_index("event_type")["n"]
        nc = float(cur.sum())
        p = np.maximum(np.array([cur.get(t, 0) for t in types],
                                dtype=np.float64) / nc, 1e-4)
        q = np.maximum(np.array([base.get(t, 0) for t in types],
                                dtype=np.float64) / nb, 1e-4)
        rows.append({"week": wk,
                     "psi": round(float(((p - q) * np.log(p / q)).sum()),
                                  6)})
    out = pd.DataFrame(rows)
    out["week"] = out["week"].astype("datetime64[us]")
    return out


ORACLE["psi_weekly_types"] = """
    WITH c AS (
        SELECT date_trunc('week', ts) AS week, event_type,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    b0 AS (SELECT MIN(week) AS w0 FROM c),
    base AS (SELECT event_type, n FROM c, b0 WHERE week = w0),
    nb AS (SELECT SUM(n) AS s FROM base),
    grid AS (
        SELECT w.week, t.event_type
        FROM (SELECT DISTINCT week FROM c, b0 WHERE week <> w0) w
        CROSS JOIN (SELECT DISTINCT event_type FROM c) t
    ),
    cur AS (
        SELECT g.week, g.event_type, COALESCE(c.n, 0) AS n
        FROM grid g LEFT JOIN c ON c.week = g.week
                              AND c.event_type = g.event_type
    ),
    nc AS (SELECT week, SUM(n) AS s FROM cur GROUP BY 1)
    SELECT cur.week,
           ROUND(SUM((GREATEST(CAST(cur.n AS DOUBLE) / nc.s, 1e-4)
                      - GREATEST(CAST(COALESCE(base.n, 0) AS DOUBLE)
                                 / (SELECT s FROM nb), 1e-4))
                     * LN(GREATEST(CAST(cur.n AS DOUBLE) / nc.s, 1e-4)
                          / GREATEST(CAST(COALESCE(base.n, 0) AS DOUBLE)
                                     / (SELECT s FROM nb), 1e-4))), 6)
               AS psi
    FROM cur
    JOIN nc USING (week)
    LEFT JOIN base ON base.event_type = cur.event_type
    GROUP BY cur.week
    ORDER BY cur.week
"""
QUERIES["psi_weekly_types"] = q_psi_weekly_types


def q_wow_aligned_delta(sf_dir: str) -> pd.DataFrame:
    """WEEK-OVER-WEEK ALIGNED DELTA: each (type, day) daily volume vs
    the SAME WEEKDAY one week earlier — the seasonality-aware volume
    check (a Monday compared to last Monday, not to Sunday; naive
    day-over-day deltas alarm every weekend). One (type, day) count
    exchange to the bounded census; the 7-day self-alignment runs on
    the reduced table. pct_change is NULL when no prior-week row
    exists, mirroring the LEFT JOIN twin."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(batch["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"event_type": batch["event_type"], "day": day,
                         "one": pa.array(np.ones(batch.num_rows,
                                                 np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "day"], [("one", "sum", "n")])
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)
    census["n"] = census["n"].astype("int64")
    census["day"] = census["day"].astype("datetime64[us]")

    prev = census.copy()
    prev["day"] = prev["day"] + pd.Timedelta(days=7)
    out = census.merge(prev, on=["event_type", "day"], how="left",
                       suffixes=("", "_prev"))
    out = out.rename(columns={"n_prev": "n_prev_week"})
    np_ = out["n_prev_week"].to_numpy(np.float64)
    n_ = out["n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        pct = np.round((n_ - np_) / np_, 6)
    out["pct_change"] = pct
    out["n_prev_week"] = out["n_prev_week"].astype("Int64").astype("float64")
    return (out[["event_type", "day", "n", "n_prev_week", "pct_change"]]
            .sort_values(["event_type", "day"]).reset_index(drop=True))


ORACLE["wow_aligned_delta"] = """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.day, a.n,
           CAST(b.n AS DOUBLE) AS n_prev_week,
           ROUND((CAST(a.n AS DOUBLE) - CAST(b.n AS DOUBLE))
                 / CAST(b.n AS DOUBLE), 6) AS pct_change
    FROM d a LEFT JOIN d b
      ON a.event_type = b.event_type
     AND b.day = a.day - INTERVAL 7 DAY
    ORDER BY 1, 2
"""
QUERIES["wow_aligned_delta"] = q_wow_aligned_delta


def q_key_candidate_census(sf_dir: str) -> pd.DataFrame:
    """CANDIDATE-KEY DISCOVERY CENSUS: for a lattice of column sets over
    lineitem, the exact distinct count vs row count and the is-key
    verdict — the uniqueness-profiling step up from single-column A6
    (the reference profiles per-column uniqueness only,
    Profiler.py:633,643-644; composite keys need the pair lattice).
    Distributed shape: per combo, one skinny exchange over per-block
    DEDUPED key partials (composites pack injectively into int64 from
    their bounded domains — multipliers documented per combo); the
    census is |combos| small exchanges, never a row-level shuffle."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    n_rows = int(ds.count())

    # packers: injective over TPC-H domains (linenumber ∈ [1,7] < 16;
    # suppkey < partkey cardinality bound — 2^20 headroom at sf100)
    combos = {
        "l_orderkey": lambda t: pc.cast(t["l_orderkey"], pa.int64()),
        "l_partkey": lambda t: pc.cast(t["l_partkey"], pa.int64()),
        "l_orderkey,l_linenumber": lambda t: pc.add(
            pc.multiply(pc.cast(t["l_orderkey"], pa.int64()),
                        pa.scalar(16, pa.int64())),
            pc.cast(t["l_linenumber"], pa.int64())),
        "l_partkey,l_suppkey": lambda t: pc.add(
            pc.multiply(pc.cast(t["l_partkey"], pa.int64()),
                        pa.scalar(1 << 20, pa.int64())),
            pc.cast(t["l_suppkey"], pa.int64())),
    }

    rows = []
    for name, packer in combos.items():
        def _dedup(t: pa.Table, packer=packer) -> pa.Table:
            u = pc.unique(packer(t))
            return pa.table({"k": u,
                             "one": pa.array(np.ones(len(u), np.int64))})

        inner, edge = sorted_groupby(
            ds.map_batches(_dedup, batch_format="pyarrow",
                           batch_size=131072),
            ["k"], [("one", "sum", "m")])
        n_distinct = int(inner.count()) + (int(edge.num_rows)
                                           if edge is not None else 0)
        rows.append({"key_cols": name, "n_rows": n_rows,
                     "n_distinct": n_distinct,
                     "is_key": n_distinct == n_rows})
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("key_cols").reset_index(drop=True)


ORACLE["key_candidate_census"] = """
    WITH n AS (SELECT COUNT(*)::BIGINT AS n_rows FROM lineitem)
    SELECT * FROM (
        SELECT 'l_orderkey' AS key_cols, n.n_rows,
               COUNT(DISTINCT l_orderkey)::BIGINT AS n_distinct,
               COUNT(DISTINCT l_orderkey) = n.n_rows AS is_key
        FROM lineitem, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'l_partkey', n.n_rows,
               COUNT(DISTINCT l_partkey)::BIGINT,
               COUNT(DISTINCT l_partkey) = n.n_rows
        FROM lineitem, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'l_orderkey,l_linenumber', n.n_rows,
               COUNT(DISTINCT (l_orderkey, l_linenumber))::BIGINT,
               COUNT(DISTINCT (l_orderkey, l_linenumber)) = n.n_rows
        FROM lineitem, n GROUP BY n.n_rows
        UNION ALL
        SELECT 'l_partkey,l_suppkey', n.n_rows,
               COUNT(DISTINCT (l_partkey, l_suppkey))::BIGINT,
               COUNT(DISTINCT (l_partkey, l_suppkey)) = n.n_rows
        FROM lineitem, n GROUP BY n.n_rows
    ) ORDER BY key_cols
"""
QUERIES["key_candidate_census"] = q_key_candidate_census


def q_partition_fingerprints(sf_dir: str) -> pd.DataFrame:
    """PARTITION RECONCILIATION FINGERPRINTS: per hash bucket of
    user_id, the row count and an order-independent modular checksum of
    event ids — the cheap cross-copy reconciliation primitive (two
    copies of a partition agree iff (n_rows, fingerprint) agree; the
    north-star's per-partition lineage+metrics made comparable). One
    zero-exchange scan of per-block (bucket, n, Σ) int64 partials; the
    ≤16-row census folds on the driver. The checksum is exact integer
    arithmetic — SUM(((id mod p)·2654435761) mod p) mod p, p = 1e9+7 —
    identical on both engines for ANY int64 id (the pre-multiply mod
    keeps every product < 2^63; terms < p, partial sums < 2^63)."""
    P = 1_000_000_007
    M = 2_654_435_761
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # user_id % 16 (ids are non-negative); reduce the id mod P
        # BEFORE the multiply so (id%P)·M < 2^63 for ANY int64 id —
        # terms < P, so block sums of 131072 terms stay far under 2^63
        tt = pa.table({"bucket": pa.array(uid % 16, pa.int64()),
                       "term": pa.array(((eid % P) * M) % P, pa.int64())})
        g = tt.group_by(["bucket"], use_threads=False).aggregate(
            [("term", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"term_sum": "s", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby("bucket", as_index=False)[["s", "n"]].sum()
           .sort_values("bucket").reset_index(drop=True))
    out["n_rows"] = out["n"].astype("int64")
    out["fingerprint"] = (out["s"].astype("int64") % P).astype("int64")
    out["bucket"] = out["bucket"].astype("int64")
    return out[["bucket", "n_rows", "fingerprint"]]


ORACLE["partition_fingerprints"] = """
    SELECT (user_id % 16)::BIGINT AS bucket, COUNT(*)::BIGINT AS n_rows,
           (SUM(((event_id % 1000000007) * 2654435761) % 1000000007)
            % 1000000007)::BIGINT AS fingerprint
    FROM events GROUP BY 1 ORDER BY 1
"""
QUERIES["partition_fingerprints"] = q_partition_fingerprints


def q_events_ohlc_daily(sf_dir: str) -> pd.DataFrame:
    """DAILY OHLC BARS per event type: open (value of the first event
    by (ts, event_id)), high, low, close (last event's value) and count
    — the time-series bar primitive (monitoring dashboards, financial
    rollups), with DETERMINISTIC tie handling: open/close resolve
    equal-timestamp ties by event_id on both engines, and all four
    prices ride exact integer cents until the final display division.
    Distributed shape: grouped_topk at k=1 twice (ascending leg rides
    negated order keys through the same DESC machinery) + one grouped
    min/max/count exchange, all on the (type, day) grain."""
    from ..stages.fast_ops import grouped_topk, sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        tsus = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        cents = pc.cast(pc.round(pc.multiply(
            pc.coalesce(t["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        eid = pc.cast(t["event_id"], pa.int64())
        return pa.table({"event_type": t["event_type"], "day": day,
                         "ts_us": tsus,
                         "neg_us": pc.multiply(tsus, pa.scalar(-1, pa.int64())),
                         "event_id": eid,
                         "neg_id": pc.multiply(eid, pa.scalar(-1, pa.int64())),
                         "cents": cents})

    prep = ds.map_batches(_pre, batch_format="pyarrow",
                          batch_size=131072).materialize()

    opens = grouped_topk(prep, ["event_type", "day"], "neg_us", 1,
                         payload_cols=["cents"], tie_cols=["event_id"]
                         ).to_pandas()[["event_type", "day", "cents"]]
    closes = grouped_topk(prep, ["event_type", "day"], "ts_us", 1,
                          payload_cols=["cents"], tie_cols=["neg_id"]
                          ).to_pandas()[["event_type", "day", "cents"]]
    # only (keys + cents) ride the min/max/count exchange — the rank
    # helper columns would otherwise shuffle ~32 dead bytes per row
    inner, edge = sorted_groupby(
        prep.map_batches(
            lambda t: t.select(["event_type", "day", "cents"]),
            batch_format="pyarrow", batch_size=None),
        ["event_type", "day"],
        [("cents", "max", "hi"), ("cents", "min", "lo"),
         (None, "count_all", "n")])
    agg = inner.to_pandas()
    if edge is not None and edge.num_rows:
        agg = pd.concat([agg, edge.to_pandas()], ignore_index=True)

    out = (agg.merge(opens.rename(columns={"cents": "o_c"}),
                     on=["event_type", "day"])
           .merge(closes.rename(columns={"cents": "c_c"}),
                  on=["event_type", "day"]))
    out["day"] = out["day"].astype("datetime64[us]")
    for src, dst in (("o_c", "open"), ("hi", "high"), ("lo", "low"),
                     ("c_c", "close")):
        out[dst] = (out[src].astype("int64") / 100.0).round(2)
    out["n"] = out["n"].astype("int64")
    return (out[["event_type", "day", "open", "high", "low", "close", "n"]]
            .sort_values(["event_type", "day"]).reset_index(drop=True))


ORACLE["events_ohlc_daily"] = """
    WITH e AS (
        SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
               CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS cents
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, day
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    ),
    agg AS (SELECT event_type, day, MAX(cents) AS hi, MIN(cents) AS lo,
                   COUNT(*)::BIGINT AS n
            FROM e GROUP BY 1, 2)
    SELECT a.event_type, a.day,
           ROUND(o.cents / 100.0, 2) AS open,
           ROUND(a.hi / 100.0, 2) AS high,
           ROUND(a.lo / 100.0, 2) AS low,
           ROUND(c.cents / 100.0, 2) AS close,
           a.n
    FROM agg a
    JOIN (SELECT event_type, day, cents FROM r WHERE rn_a = 1) o
      USING (event_type, day)
    JOIN (SELECT event_type, day, cents FROM r WHERE rn_d = 1) c
      USING (event_type, day)
    ORDER BY 1, 2
"""
QUERIES["events_ohlc_daily"] = q_events_ohlc_daily


def q_out_of_order_census(sf_dir: str) -> pd.DataFrame:
    """OUT-OF-ORDER ARRIVAL CENSUS (watermark diagnostics): treating
    event_id as ingestion order, an event is LATE when its timestamp
    precedes the running maximum of everything ingested before it; the
    census reports the late count, the worst and total lateness in
    exact integer µs — what sizes a streaming watermark. Distributed
    shape: ONE sort by event_id, then a two-phase prefix-max: block
    tasks report (first, max) ts, the driver folds the O(blocks) carry
    chain of preceding-block maxima, and a second wave of block tasks
    counts lateness against (in-block prefix max ∨ carried max) — no
    per-row data ever reaches the driver."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    s = ds.sort("event_id").materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return pd.DataFrame([{"n_events": 0, "n_late": 0,
                              "max_lateness_us": 0,
                              "total_lateness_us": 0}]).astype("int64")

    @ray.remote
    def _maxes(block: pa.Table):
        if block.num_rows == 0:
            return None
        ts = block["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        return int(ts.max())

    block_max = ray.get([_maxes.remote(r) for r in refs])
    carries = []
    cur = None
    for m in block_max:
        carries.append(cur)
        if m is not None:
            cur = m if cur is None else max(cur, m)

    @ray.remote
    def _census(block: pa.Table, carry):
        if block.num_rows == 0:
            return (0, 0, 0, 0)
        ts = block["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        # running max of STRICTLY PRECEDING rows: shift the prefix max
        prefix = np.maximum.accumulate(ts)
        prev = np.empty_like(prefix)
        prev[0] = carry if carry is not None else np.iinfo(np.int64).min
        prev[1:] = prefix[:-1]
        if carry is not None:
            prev = np.maximum(prev, carry)
        late = ts < prev
        lateness = np.where(late, prev - ts, 0)
        return (int(ts.size), int(late.sum()),
                int(lateness.max()) if ts.size else 0,
                int(lateness.sum()))

    parts = ray.get([_census.remote(r, c) for r, c in zip(refs, carries)])
    n = sum(p[0] for p in parts)
    nl = sum(p[1] for p in parts)
    mx = max((p[2] for p in parts), default=0)
    tot = sum(p[3] for p in parts)
    return pd.DataFrame([{"n_events": n, "n_late": nl,
                          "max_lateness_us": mx,
                          "total_lateness_us": tot}]).astype("int64")


ORACLE["out_of_order_census"] = """
    WITH r AS (
        SELECT epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS mx
        FROM events
    )
    SELECT COUNT(*)::BIGINT AS n_events,
           SUM(CASE WHEN us < mx THEN 1 ELSE 0 END)::BIGINT AS n_late,
           COALESCE(MAX(CASE WHEN us < mx THEN mx - us END), 0)::BIGINT
               AS max_lateness_us,
           COALESCE(SUM(CASE WHEN us < mx THEN mx - us ELSE 0 END),
                    0)::BIGINT AS total_lateness_us
    FROM r
"""
QUERIES["out_of_order_census"] = q_out_of_order_census


def q_conv_template_census(sf_dir: str) -> pd.DataFrame:
    """CONVERSATION TEMPLATE CENSUS: the 10 most repeated event-type
    SEQUENCES across conversations — template/spam detection for agent
    transcripts (identically-shaped conversations are the first dedup
    signal before any text hashing; the sequence string is the
    conversation's shape fingerprint). Distributed shape: ONE sort
    feeds stages.window.concat_group_strings (per-conv sequence
    assembly in block tasks, O(blocks) edge stitch), ONE grouped
    exchange counts sequence multiplicity, top-10 with deterministic
    (n DESC, sequence ASC) tiebreak folds from the reduced census."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import concat_group_strings

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    seqs = concat_group_strings(ds, "user_id", ["ts", "event_id"],
                                "event_type", sep=",")

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({"sequence": t["event_type"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        seqs.map_batches(_pre, batch_format="pyarrow", batch_size=65536),
        ["sequence"], [("one", "sum", "n_convs")])
    # top-10 fold: per-block local top-10 partials, then the driver
    # resolves the global head — never the full census on one node
    def _local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("n_convs", "descending"),
                          ("sequence", "ascending")])[:10]
        return t.take(idx)

    parts = inner.map_batches(_local_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if edge is not None and edge.num_rows:
        parts = pd.concat([parts, edge.to_pandas()], ignore_index=True)
    parts["n_convs"] = parts["n_convs"].astype("int64")
    out = (parts.sort_values(["n_convs", "sequence"],
                             ascending=[False, True]).head(10)
           .reset_index(drop=True))
    return out[["sequence", "n_convs"]]


ORACLE["conv_template_census"] = """
    WITH s AS (
        SELECT user_id,
               STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT seq AS sequence, COUNT(*)::BIGINT AS n_convs
    FROM s GROUP BY 1 ORDER BY n_convs DESC, sequence LIMIT 10
"""
QUERIES["conv_template_census"] = q_conv_template_census


def q_user_streaks(sf_dir: str) -> pd.DataFrame:
    """LONGEST ACTIVE-DAY STREAK CENSUS: per user, the longest run of
    CONSECUTIVE calendar days with at least one event, reported as a
    (streak_len, n_users) census — the engagement/retention staple
    (and the SQL gaps-and-islands classic: day minus ROW_NUMBER()
    constant-group trick in the twin). Pure composition, zero new
    operator code: one (user, day) distinct exchange reduces the
    stream; stages.window.session_intervals with gap_us = 1 day turns
    consecutive-day runs into islands (a 2-day hole breaks, 1-day step
    continues); one grouped max and a bounded census fold finish."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import session_intervals

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "day": day,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id", "day"], [("one", "sum", "m")])
    days = inner
    if edge is not None and edge.num_rows:
        days = days.union(rd.from_arrow(edge))

    streaks = session_intervals(days, "user_id", "day", "day", "day",
                                gap_us=86_400_000_000)
    s_inner, s_edge = sorted_groupby(
        streaks.map_batches(
            lambda t: t.select(["user_id", "n_events"]),
            batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("n_events", "max", "max_streak")])
    per_user = s_inner.to_pandas()
    if s_edge is not None and s_edge.num_rows:
        per_user = pd.concat([per_user, s_edge.to_pandas()],
                             ignore_index=True)
    per_user = (per_user.groupby("user_id")["max_streak"].max()
                .astype("int64"))
    census = per_user.value_counts().sort_index()
    return pd.DataFrame({"streak_len": census.index.astype("int64"),
                         "n_users": census.to_numpy(np.int64)})


ORACLE["user_streaks"] = """
    WITH d AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    i AS (
        SELECT user_id, day,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    g AS (
        SELECT user_id, COUNT(*)::BIGINT AS len
        FROM i GROUP BY user_id, day - rn * INTERVAL 1 DAY
    ),
    m AS (SELECT user_id, MAX(len) AS max_streak FROM g GROUP BY 1)
    SELECT max_streak AS streak_len, COUNT(*)::BIGINT AS n_users
    FROM m GROUP BY 1 ORDER BY 1
"""
QUERIES["user_streaks"] = q_user_streaks


def q_events_missing_days(sf_dir: str) -> pd.DataFrame:
    """CALENDAR COMPLETENESS CENSUS: per event type, the span of days
    between its first and last activity, how many days actually have
    events, and how many are MISSING — the feed-gap detector (a type
    that skips days signals an upstream outage the volume anomaly gate
    can miss when surrounding days are normal). One (type, day) count
    exchange to the bounded census; span arithmetic is exact integer
    day counts on the reduced table."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        return pa.table({"event_type": t["event_type"], "day": day,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "day"], [("one", "sum", "n")])
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)

    rows = []
    for etype, sub in census.groupby("event_type", sort=True):
        days = sub["day"].astype("datetime64[us]").astype("int64").to_numpy()
        span = int((days.max() - days.min()) // 86_400_000_000) + 1
        obs = int(sub["day"].nunique())
        rows.append({"event_type": etype, "span_days": span,
                     "observed_days": obs, "missing_days": span - obs})
    out = pd.DataFrame(rows)
    for c in ("span_days", "observed_days", "missing_days"):
        out[c] = out[c].astype("int64")
    return out


ORACLE["events_missing_days"] = """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day FROM events
        GROUP BY 1, 2
    )
    SELECT event_type,
           (datediff('day', MIN(day), MAX(day)) + 1)::BIGINT AS span_days,
           COUNT(*)::BIGINT AS observed_days,
           (datediff('day', MIN(day), MAX(day)) + 1
            - COUNT(*))::BIGINT AS missing_days
    FROM d GROUP BY 1 ORDER BY 1
"""
QUERIES["events_missing_days"] = q_events_missing_days


def q_cosine_range_search(sf_dir: str) -> pd.DataFrame:
    """EXACT COSINE RANGE (radius) SEARCH: every embedding within
    cosine >= 0.25 of the first three vectors — the threshold sibling
    of ann_topk and the exactly-oracled member of the vector family
    (list_cosine_similarity twin; pairs-only output, the ann_topk
    precedent, because raw cosines are not bit-identical across
    engines — the data's nearest cosine sits >= 1.7e-4 from the
    threshold at every test SF, orders of magnitude beyond cross-engine
    accumulation noise, so MEMBERSHIP is stable). Broadcast query
    matrix, per-batch float64 matmul, output-bounded emission."""
    from .ann import cosine_range_search

    q = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    q = q.sort_by("vec_id")
    qm = np.stack([np.asarray(v) for v in q["embedding"].to_pylist()[:3]])
    qids = np.asarray(q["vec_id"].to_pylist()[:3], dtype=np.int64)
    out = cosine_range_search(_read(sf_dir, "embeddings"), "vec_id",
                              "embedding", qm, qids, 0.25).to_pandas()
    out["qid"] = out["qid"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values(["qid", "vec_id"]).reset_index(drop=True)


ORACLE["cosine_range_search"] = """
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe FROM embeddings
        WHERE vec_id < 3
    )
    SELECT q.qid, e.vec_id
    FROM embeddings e, q
    WHERE e.vec_id <> q.qid
      AND list_cosine_similarity(e.embedding, q.qe) >= 0.25
    ORDER BY 1, 2
"""
QUERIES["cosine_range_search"] = q_cosine_range_search


def q_quantized_topk(sf_dir: str) -> pd.DataFrame:
    """INT8-quantized cosine top-10 for the first 3 query embeddings —
    rows-only check (quantization is a model choice; recall >= 0.9 vs
    the exact brute force is pinned by pytest). 4x memory cut is the
    scale path when the embedding column is the working set."""
    from .ann import quantized_topk

    q = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qm = np.stack([np.asarray(v)
                   for v in q.sort_by("vec_id")["embedding"]
                   .to_pylist()[:3]])
    out = quantized_topk(_read(sf_dir, "embeddings"), "vec_id",
                         "embedding", qm, k=10)
    return out[["qid", "id"]]


QUERIES["quantized_topk"] = q_quantized_topk


def q_hourly_bursts(sf_dir: str) -> pd.DataFrame:
    """BURST DETECTION: hours whose event volume exceeds 3× the median
    of the trailing 24 OBSERVED hours (same type, current hour
    excluded) — the rate-spike monitor robust to the level shifts that
    break the 3σ gate (median, not mean, absorbs prior bursts).
    Distributed shape: ONE (type, hour) count exchange to the bounded
    census; the trailing-median scan runs per type on the reduced
    table. The median of trailing int counts is dyadic-rational (avg of
    two middles), so the engine/oracle values are exactly equal; the
    window is ROWS over observed hours, identical on both sides."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": t["event_type"], "hour": hour,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [("one", "sum", "n")])
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)
    census["n"] = census["n"].astype("int64")
    census["hour"] = census["hour"].astype("datetime64[us]")
    census = census.sort_values(["event_type", "hour"]).reset_index(
        drop=True)

    med = (census.groupby("event_type")["n"]
           .apply(lambda s: s.shift(1).rolling(24, min_periods=1).median())
           .reset_index(level=0, drop=True))
    census["med"] = np.round(med.to_numpy(np.float64), 6)
    out = census[census["n"] > 3.0 * census["med"]].copy()
    return (out[["event_type", "hour", "n", "med"]]
            .sort_values(["event_type", "hour"]).reset_index(drop=True))


ORACLE["hourly_bursts"] = """
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, hour, n,
               ROUND(median(n) OVER (PARTITION BY event_type ORDER BY hour
                                     ROWS BETWEEN 24 PRECEDING
                                     AND 1 PRECEDING), 6) AS med
        FROM c
    )
    SELECT event_type, hour, n, med
    FROM m WHERE n > 3.0 * med
    ORDER BY 1, 2
"""
QUERIES["hourly_bursts"] = q_hourly_bursts


def q_events_hourly_interp(sf_dir: str) -> pd.DataFrame:
    """GAP-FILLED HOURLY SERIES: each type's hourly volume on the DENSE
    hour grid between its first and last activity, missing hours
    linearly interpolated between the nearest observed neighbors — the
    series-repair step before any FFT/autocorr/forecast consumer that
    assumes a regular grid. One (type, hour) count exchange; the dense
    grid is bounded by calendar × types (events_hourly_dense precedent)
    and fills on the driver with the exact interpolation expression the
    twin uses: prev + (next − prev) · k/m, rounded at 6dp."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                 unit="hour")
        return pa.table({"event_type": t["event_type"], "hour": hour,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["event_type", "hour"], [("one", "sum", "n")])
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)
    census["n"] = census["n"].astype("int64")
    census["hour"] = census["hour"].astype("datetime64[us]")

    rows = []
    for etype, sub in census.groupby("event_type", sort=True):
        sub = sub.sort_values("hour")
        hrs = (sub["hour"].astype("int64").to_numpy()
               // 3_600_000_000)
        ns = sub["n"].to_numpy(np.float64)
        full = np.arange(hrs[0], hrs[-1] + 1)
        obs_idx = np.searchsorted(hrs, full)  # right neighbor index
        observed = np.isin(full, hrs)
        # prev/next observed neighbors for each grid hour
        nxt = obs_idx
        prv = np.where(observed, obs_idx, obs_idx - 1)
        filled = np.where(
            observed, ns[nxt],
            np.round(ns[prv] + (ns[nxt] - ns[prv])
                     * (full - hrs[prv]) / (hrs[nxt] - hrs[prv]), 6))
        rows.append(pd.DataFrame({
            "event_type": etype,
            "hour": (full * 3_600_000_000).astype("datetime64[us]"),
            "filled": filled,
            "interpolated": ~observed}))
    out = pd.concat(rows, ignore_index=True)
    return (out.sort_values(["event_type", "hour"])
            .reset_index(drop=True))


ORACLE["events_hourly_interp"] = """
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
             FROM c GROUP BY 1),
    grid AS (
        SELECT s.event_type,
               unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS hour
        FROM span s
    ),
    g AS (
        SELECT grid.event_type, grid.hour, c.n
        FROM grid LEFT JOIN c USING (event_type, hour)
    ),
    f AS (
        SELECT event_type, hour, n,
               last_value(n IGNORE NULLS) OVER w AS prev_n,
               last_value(CASE WHEN n IS NOT NULL THEN hour END
                          IGNORE NULLS) OVER w AS prev_h,
               first_value(n IGNORE NULLS) OVER w2 AS next_n,
               first_value(CASE WHEN n IS NOT NULL THEN hour END
                           IGNORE NULLS) OVER w2 AS next_h
        FROM g
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour,
           CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                ELSE ROUND(CAST(prev_n AS DOUBLE)
                     + (CAST(next_n AS DOUBLE) - CAST(prev_n AS DOUBLE))
                       * datediff('hour', prev_h, hour)
                       / datediff('hour', prev_h, next_h), 6) END AS filled,
           (n IS NULL) AS interpolated
    FROM f ORDER BY 1, 2
"""
QUERIES["events_hourly_interp"] = q_events_hourly_interp


def q_km_lifetimes(sf_dir: str) -> pd.DataFrame:
    """KAPLAN–MEIER TIME-TO-CONVERSION TABLE: survival time = days from
    a user's first event to their first PURCHASE; users who never
    purchase are right-CENSORED at their last observed day. For every
    time with at least one conversion: the at-risk count (users with
    T >= t), conversions, censored exits, and the KM step factor
    1 − d/n — the survival-analysis primitive (honest conversion
    curves; naive "avg days to purchase" ignores the users still
    running). Distributed shape: ONE user-grain exchange reduces the
    stream to (first day, last day, first purchase day) triples inside
    sorted_groupby partials; the (T, censored) census is bounded by the
    calendar and the risk-set suffix sums fold on the driver. All
    counts exact int64; the step factor is a single division."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    BIG = np.iinfo(np.int64).max

    def _pre(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["ts"], pa.timestamp("us")), unit="day"), pa.int64())
        is_p = pc.equal(t["event_type"], "purchase")
        pday = pc.if_else(is_p, day, pa.scalar(BIG, pa.int64()))
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "d0": day, "d1": day, "p": pday})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("d0", "min", "d0"), ("d1", "max", "d1"),
                      ("p", "min", "p")])
    u = inner.to_pandas()
    if edge is not None and edge.num_rows:
        u = pd.concat([u, edge.to_pandas()], ignore_index=True)
    day_us = 86_400_000_000
    censored = u["p"].astype("int64") == BIG
    end = np.where(censored, u["d1"].astype("int64"),
                   u["p"].astype("int64"))
    t_days = pd.Series((end - u["d0"].astype("int64")) // day_us,
                       dtype="int64")

    census = (pd.DataFrame({"t": t_days, "c": censored})
              .groupby(["t", "c"]).size().reset_index(name="n"))
    d = census.pivot_table(index="t", columns="c", values="n",
                           aggfunc="sum", fill_value=0)
    d_t = d[False] if False in d.columns else pd.Series(0, index=d.index)
    c_t = d[True] if True in d.columns else pd.Series(0, index=d.index)
    tab = pd.DataFrame({"t": d.index.astype("int64"),
                        "d_t": d_t.to_numpy(np.int64),
                        "c_t": c_t.to_numpy(np.int64)}).sort_values(
        "t", ascending=False)
    tab["n_risk"] = (tab["d_t"] + tab["c_t"]).cumsum()
    tab = tab.sort_values("t")
    out = tab[tab["d_t"] > 0].copy()
    out["step_factor"] = np.round(
        1.0 - out["d_t"].to_numpy(np.float64)
        / out["n_risk"].to_numpy(np.float64), 6)
    out = out.rename(columns={"t": "lifetime_days", "d_t": "n_events",
                              "c_t": "n_censored"})
    for c in ("lifetime_days", "n_risk", "n_events", "n_censored"):
        out[c] = out[c].astype("int64")
    return (out[["lifetime_days", "n_risk", "n_events", "n_censored",
                 "step_factor"]].reset_index(drop=True))


ORACLE["km_lifetimes"] = """
    WITH u AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS d0,
               MAX(date_trunc('day', ts)) AS d1,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN date_trunc('day', ts) END) AS p
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT datediff('day', d0,
                        CASE WHEN p IS NULL THEN d1 ELSE p END)::BIGINT AS t,
               (p IS NULL) AS censored
        FROM u
    ),
    d AS (
        SELECT t,
               SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d_t,
               SUM(CASE WHEN censored THEN 1 ELSE 0 END)::BIGINT AS c_t
        FROM l GROUP BY 1
    ),
    r AS (
        SELECT t, d_t, c_t,
               SUM(d_t + c_t) OVER (ORDER BY t DESC)::BIGINT AS n_risk
        FROM d
    )
    SELECT t AS lifetime_days, n_risk, d_t AS n_events, c_t AS n_censored,
           ROUND(1.0 - CAST(d_t AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)
               AS step_factor
    FROM r WHERE d_t > 0 ORDER BY 1
"""
QUERIES["km_lifetimes"] = q_km_lifetimes


def q_cumulative_unique_users(sf_dir: str) -> pd.DataFrame:
    """CUMULATIVE-UNIQUE-USERS GROWTH CURVE: per day, how many users
    appeared for the FIRST time and the running total of distinct users
    ever seen — the acquisition curve (running COUNT(DISTINCT) is the
    textbook expensive window; first-seen reduction makes it one cheap
    exchange). Distributed shape: ONE user-grain exchange reduces the
    stream to first-seen days; the day census and its prefix sum fold
    on the driver (bounded by the calendar)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["ts"], pa.timestamp("us")), unit="day"), pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "d0": day})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("d0", "min", "d0")])
    u = inner.to_pandas()
    if edge is not None and edge.num_rows:
        u = pd.concat([u, edge.to_pandas()], ignore_index=True)
    census = (u.groupby("d0").size().sort_index())
    out = pd.DataFrame({
        "day": census.index.to_numpy("int64").astype("datetime64[us]"),
        "new_users": census.to_numpy(np.int64),
        "total_users": census.cumsum().to_numpy(np.int64)})
    return out


ORACLE["cumulative_unique_users"] = """
    WITH f AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS d0
        FROM events GROUP BY 1
    ),
    c AS (SELECT d0 AS day, COUNT(*)::BIGINT AS new_users
          FROM f GROUP BY 1)
    SELECT day, new_users,
           SUM(new_users) OVER (ORDER BY day)::BIGINT AS total_users
    FROM c ORDER BY day
"""
QUERIES["cumulative_unique_users"] = q_cumulative_unique_users


def q_did_value_by_cohort(sf_dir: str) -> pd.DataFrame:
    """DIFFERENCE-IN-DIFFERENCES: mean event value (exact cents) for
    treatment (odd user_id) vs control (even) cohorts, before vs after
    the window midpoint — the quasi-experimental effect estimate
    DiD = (T_post − T_pre) − (C_post − C_pre), immune to cohort level
    differences and common time trends. One zero-exchange scan of
    (cohort, period, n, Σcents) int64 partials; the four means and the
    estimate are single-expression float divisions of exact sums."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.coalesce(t["value"], pa.scalar(0.0)), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        tt = pa.table({"treat": pa.array((uid % 2).astype(np.int64)),
                       "us": us, "cents": cents})
        return tt

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072)

    # window midpoint from exact integer min/max fold (one pass over
    # the tiny per-block extrema)
    def _extrema(t: pa.Table) -> pa.Table:
        return pa.table({"lo": pa.array([pc.min(t["us"]).as_py()],
                                        pa.int64()),
                         "hi": pa.array([pc.max(t["us"]).as_py()],
                                        pa.int64())})

    parts = parts.materialize()
    ex = parts.map_batches(_extrema, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    mid = (int(ex["lo"].min()) + int(ex["hi"].max())) // 2

    def _census(t: pa.Table) -> pa.Table:
        post = pc.cast(pc.greater_equal(t["us"], pa.scalar(mid, pa.int64())),
                       pa.int64())
        tt = pa.table({"treat": t["treat"], "post": post,
                       "cents": t["cents"]})
        g = tt.group_by(["treat", "post"], use_threads=False).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"cents_sum": "s", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    cen = (parts.map_batches(_census, batch_format="pyarrow",
                             batch_size=None).to_pandas()
           .groupby(["treat", "post"], as_index=False)[["s", "n"]].sum())
    m = {(int(r.treat), int(r.post)):
         float(r.s) / 100.0 / float(r.n) for r in cen.itertuples()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    out = cen.copy()
    out["mean_value"] = np.round(
        out["s"].astype("float64") / 100.0 / out["n"].astype("float64"), 6)
    out["did_estimate"] = round(did, 6)
    out["treat"] = out["treat"].astype("int64")
    out["post"] = out["post"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out[["treat", "post", "n", "mean_value", "did_estimate"]]
            .sort_values(["treat", "post"]).reset_index(drop=True))


ORACLE["did_value_by_cohort"] = """
    WITH b AS (
        SELECT (user_id % 2)::BIGINT AS treat,
               CASE WHEN epoch_us(ts) >=
                    ((SELECT MIN(epoch_us(ts)) FROM events)
                     + (SELECT MAX(epoch_us(ts)) FROM events)) // 2
                    THEN 1 ELSE 0 END::BIGINT AS post,
               CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS cents
        FROM events
    ),
    c AS (
        SELECT treat, post, SUM(cents)::BIGINT AS s, COUNT(*)::BIGINT AS n
        FROM b GROUP BY 1, 2
    ),
    m AS (SELECT treat, post,
                 CAST(s AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS mv
          FROM c)
    SELECT c.treat, c.post, c.n,
           ROUND(CAST(c.s AS DOUBLE) / 100.0 / CAST(c.n AS DOUBLE), 6)
               AS mean_value,
           ROUND(((SELECT mv FROM m WHERE treat = 1 AND post = 1)
                  - (SELECT mv FROM m WHERE treat = 1 AND post = 0))
                 - ((SELECT mv FROM m WHERE treat = 0 AND post = 1)
                    - (SELECT mv FROM m WHERE treat = 0 AND post = 0)), 6)
               AS did_estimate
    FROM c ORDER BY 1, 2
"""
QUERIES["did_value_by_cohort"] = q_did_value_by_cohort


def q_dow_profile_outliers(sf_dir: str) -> pd.DataFrame:
    """WEEKDAY-PROFILE DAY OUTLIERS: each day's event-type mix tested
    (chi²) against its own WEEKDAY's aggregate profile — the "this
    Tuesday doesn't look like Tuesdays" detector that volume gates miss
    when totals are normal but composition shifted. One (day, type)
    count exchange to the bounded census; the weekday profiles and the
    per-day chi² (Σ (obs − n·p)²/(n·p), exact integer inputs, single
    float expression mirrored in the twin) fold on the reduced table;
    flagged days have chi² > 15 (df≈4, p≈0.005)."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _pre(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["ts"], pa.timestamp("us")), unit="day"), pa.int64())
        return pa.table({"day": day, "event_type": t["event_type"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["day", "event_type"], [("one", "sum", "n")])
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)
    census["n"] = census["n"].astype("int64")
    epoch_day = census["day"].astype("int64") // 86_400_000_000
    census["dow"] = ((epoch_day + 3) % 7 + 1).astype("int64")  # ISO dow

    prof = (census.groupby(["dow", "event_type"])["n"].sum()
            .rename("tp").reset_index())
    dtot = prof.groupby("dow")["tp"].sum().rename("dt").reset_index()
    m = census.merge(prof, on=["dow", "event_type"]).merge(dtot, on="dow")
    day_n = census.groupby("day")["n"].sum().rename("dn").reset_index()
    m = m.merge(day_n, on="day")
    exp = (m["dn"].astype("float64") * m["tp"].astype("float64")
           / m["dt"].astype("float64"))
    m["term"] = (m["n"].astype("float64") - exp) ** 2 / exp
    chi = (m.groupby(["day", "dow", "dn"])["term"].sum()
           .rename("chi2").reset_index())
    chi["chi2"] = np.round(chi["chi2"].to_numpy(np.float64), 6)
    out = chi[chi["chi2"] > 15.0].copy()
    out["day"] = (out["day"].astype("int64")).astype("datetime64[us]")
    out = out.rename(columns={"dn": "n"})
    out["n"] = out["n"].astype("int64")
    return (out[["day", "dow", "n", "chi2"]]
            .sort_values("day").reset_index(drop=True))


ORACLE["dow_profile_outliers"] = """
    WITH c AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    cd AS (SELECT *, isodow(day)::BIGINT AS dow FROM c),
    prof AS (SELECT dow, event_type, SUM(n)::BIGINT AS tp
             FROM cd GROUP BY 1, 2),
    dtot AS (SELECT dow, SUM(tp)::BIGINT AS dt FROM prof GROUP BY 1),
    dayn AS (SELECT day, SUM(n)::BIGINT AS dn FROM c GROUP BY 1),
    t AS (
        SELECT cd.day, cd.dow, dayn.dn,
               POWER(CAST(cd.n AS DOUBLE)
                     - CAST(dayn.dn AS DOUBLE) * CAST(prof.tp AS DOUBLE)
                       / CAST(dtot.dt AS DOUBLE), 2)
               / (CAST(dayn.dn AS DOUBLE) * CAST(prof.tp AS DOUBLE)
                  / CAST(dtot.dt AS DOUBLE)) AS term
        FROM cd
        JOIN prof USING (dow, event_type)
        JOIN dtot USING (dow)
        JOIN dayn USING (day)
    )
    SELECT day, dow, dn AS n, ROUND(SUM(term), 6) AS chi2
    FROM t GROUP BY 1, 2, 3
    HAVING ROUND(SUM(term), 6) > 15.0
    ORDER BY 1
"""
QUERIES["dow_profile_outliers"] = q_dow_profile_outliers


def q_auc_value_purchase(sf_dir: str) -> pd.DataFrame:
    """ROC-AUC of `value` as a ranking score for purchase-vs-view —
    the model-evaluation statistic in its exact rank-sum form
    (AUC = U⁺/(n⁺·n⁻), the Mann–Whitney identity), not a sampled or
    binned estimate. Distributed shape: ONE grouped exchange collapses
    the stream to the per-distinct-value (n_pos, n_neg) histogram —
    the same reduced-census discipline as mannwhitney_sources — and
    the doubled-midrank fold (a tied block at cumulative base b with
    multiplicity c has doubled midrank 2b + c + 1, exact int64) runs
    on the driver over the bounded histogram. A single float division
    at the end, mirrored operation-for-operation by the twin."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "view"])),
            pc.is_valid(t["value"]))
        sub = t.filter(keep)
        p = pc.cast(pc.equal(sub["event_type"], pa.scalar("purchase")),
                    pa.int64())
        return pa.table({"v": sub["value"], "p": p,
                         "one": pa.array(np.ones(sub.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["v"], [("p", "sum", "np"), ("one", "sum", "n")])
    hist = inner.to_pandas()
    if edge is not None and edge.num_rows:
        hist = pd.concat([hist, edge.to_pandas()], ignore_index=True)
    hist = hist.sort_values("v").reset_index(drop=True)
    cp = hist["np"].to_numpy(np.int64)
    c = hist["n"].to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(c)[:-1]])
    r2p = int((cp * (2 * base + c + 1)).sum())
    n_pos = int(cp.sum())
    n_neg = int(c.sum()) - n_pos
    auc = round((r2p - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6)
    return pd.DataFrame({"auc": [auc],
                         "n_pos": pd.Series([n_pos], dtype="int64"),
                         "n_neg": pd.Series([n_neg], dtype="int64")})


ORACLE["auc_value_purchase"] = """
    WITH s AS (
        SELECT value AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ),
    rk AS (
        SELECT pos,
               2 * RANK() OVER (ORDER BY v)
                 + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
        FROM s
    ),
    agg AS (
        SELECT SUM(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS r2p,
               SUM(pos) AS np, SUM(1 - pos) AS nn
        FROM rk
    )
    SELECT ROUND((r2p - np * (np + 1)) / (2.0 * np * nn), 6) AS auc,
           CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
    FROM agg
"""
QUERIES["auc_value_purchase"] = q_auc_value_purchase


def q_value_decile_lift(sf_dir: str) -> pd.DataFrame:
    """DECILE LIFT CHART of `value` against purchase conversion — the
    campaign-targeting companion to the AUC: rank all view/purchase
    events by value, cut into ten equal-width global deciles, report
    each decile's conversion rate and its lift over the base rate.
    Distributed shape: ONE global sort exchange via row_number_within
    on a constant partition key with the deterministic (value,
    event_id) order — the customer_ltv_deciles composition — then a
    per-block decile census folded on the driver. The decile label is
    the exact integer formula ((rn−1)·10)//n shared with the twin
    (NTILE's ceil/floor convention deliberately avoided)."""
    import ray.data as rd

    from ..stages.window import row_number_within

    ds = _read(sf_dir, "events", ["event_type", "value", "event_id"])

    def _pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "view"])),
            pc.is_valid(t["value"]))
        sub = t.filter(keep)
        p = pc.cast(pc.equal(sub["event_type"], pa.scalar("purchase")),
                    pa.int64())
        return pa.table({"v": sub["value"], "event_id": sub["event_id"],
                         "p": p,
                         "g": pa.array(np.zeros(sub.num_rows, np.int64))})

    numbered = row_number_within(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "g", ["v", "event_id"], out_col="rn", start=1)
    n_total = numbered.count()

    def _census(t: pa.Table) -> pa.Table:
        dec = pc.divide(pc.multiply(pc.subtract(t["rn"], 1), 10),
                        pa.scalar(n_total, pa.int64()))
        tt = pa.table({"decile": dec, "p": t["p"]})
        g = tt.group_by(["decile"], use_threads=False).aggregate(
            [("p", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"p_sum": "np", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = numbered.map_batches(_census, batch_format="pyarrow",
                                 batch_size=131072).to_pandas()
    out = (parts.groupby("decile", as_index=False)[["np", "n"]].sum()
           .sort_values("decile").reset_index(drop=True))
    out["decile"] = out["decile"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["n_purchase"] = out["np"].astype("int64")
    np_tot = int(out["n_purchase"].sum())
    base = np_tot / n_total
    rate = (out["n_purchase"].to_numpy(np.float64)
            / out["n"].to_numpy(np.float64))
    out["rate"] = np.round(rate, 6)
    out["lift"] = np.round(rate / base, 6)
    return out[["decile", "n", "n_purchase", "rate", "lift"]]


ORACLE["value_decile_lift"] = """
    WITH s AS (
        SELECT value AS v, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ),
    rn AS (
        SELECT pos, ROW_NUMBER() OVER (ORDER BY v, event_id) AS rn,
               COUNT(*) OVER () AS nt, SUM(pos) OVER () AS npt
        FROM s
    ),
    d AS (
        SELECT ((rn - 1) * 10) // nt AS decile,
               COUNT(*)::BIGINT AS n, SUM(pos)::BIGINT AS n_purchase,
               MAX(nt) AS nt, MAX(npt) AS npt
        FROM rn GROUP BY 1
    )
    SELECT decile, n, n_purchase,
           ROUND(CAST(n_purchase AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS rate,
           ROUND((CAST(n_purchase AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE)), 6)
               AS lift
    FROM d ORDER BY decile
"""
QUERIES["value_decile_lift"] = q_value_decile_lift


def q_customer_name_jw(sf_dir: str) -> pd.DataFrame:
    """JARO-WINKLER-SCORED FUZZY MATCH on customer names: the
    edit-distance-1 entity-resolution join (customer_name_matches)
    upgraded from a boolean verdict to a graded similarity score —
    the form a merge-review queue actually consumes. Distributed
    shape: identical exact deletion-neighborhood blocking + bucket /
    pair-dedup exchanges (edit_distance_pairs_ds); the Jaro-Winkler
    kernel (functions/jaro.py, vectorized ACROSS pairs — the position
    loop is the short axis) runs inside map tasks over the verified
    pair blocks. Scores are pinned to DuckDB's
    jaro_winkler_similarity semantics (boost >0.7, p=0.1, ℓ≤4),
    fuzz-verified in tests/test_similarity.py."""
    from ..functions.jaro import jaro_winkler_pairs
    from .dedup import edit_distance_pairs_ds

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    pairs = edit_distance_pairs_ds(ds, "c_custkey", "c_name",
                                   rows_hint=int(ds.count()))

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        a = df["name_a"].to_numpy(object)
        b = df["name_b"].to_numpy(object)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        jw = np.round(jaro_winkler_pairs(lo, hi), 6)
        return pd.DataFrame({"a_name": lo, "b_name": hi, "jw": jw})

    out = pairs.map_batches(_score, batch_format="pandas",
                            batch_size=65536).to_pandas()
    if out.empty:
        return pd.DataFrame({"a_name": pd.Series([], dtype=object),
                             "b_name": pd.Series([], dtype=object),
                             "jw": pd.Series([], dtype="float64")})
    out = out[out["a_name"] != out["b_name"]]
    return out.sort_values(["a_name", "b_name"]).reset_index(drop=True)


ORACLE["customer_name_jw"] = """
    SELECT a.c_name AS a_name, b.c_name AS b_name,
           ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
    FROM customer a, customer b
    WHERE a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
      AND length(a.c_name) >= 2 AND length(b.c_name) >= 2
    ORDER BY 1, 2
"""
QUERIES["customer_name_jw"] = q_customer_name_jw


def q_logit_purchase_value(sf_dir: str) -> pd.DataFrame:
    """LOGISTIC REGRESSION (purchase ~ standardized value) fit by
    distributed IRLS/Newton — the iterative-algorithm shape (fixed
    pass count, per-pass gradient/Hessian partials, driver-side 2×2
    solve) that SQL cannot express; registered rows-only with a
    numpy-parity pytest as the correctness witness
    (tests/test_similarity.py). Distributed shape: one moments pass
    (n, Σx, Σx²) then EIGHT map_batches passes each emitting a
    5-component partial [Σg₀, Σg₁, ΣH₀₀, ΣH₀₁, ΣH₁₁] per block —
    ZERO exchanges; the driver folds partials with math.fsum
    (correctly-rounded, order-independent, so the fit is stable
    under any block schedule) and solves the 2×2 closed form. The
    bounded (x, y) feature table is materialized once so the eight
    Newton passes don't re-scan parquet — at 10¹²-turn scale this is
    the checkpoint-the-features pattern (sources/sink.py), not a
    driver collect."""
    import math

    from ray.data import Dataset  # noqa: F401 (doc anchor)

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "view"])),
            pc.is_valid(t["value"]))
        sub = t.filter(keep)
        y = pc.cast(pc.equal(sub["event_type"], pa.scalar("purchase")),
                    pa.float64())
        return pa.table({"x": pc.cast(sub["value"], pa.float64()),
                         "y": y})

    feat = ds.map_batches(_pre, batch_format="pyarrow",
                          batch_size=131072).materialize()

    def _mom(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([float(len(x))]),
                         "s": pa.array([float(x.sum())]),
                         "ss": pa.array([float((x * x).sum())])})

    mp = feat.map_batches(_mom, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    n = math.fsum(mp["n"])
    mu = math.fsum(mp["s"]) / n
    var = math.fsum(mp["ss"]) / n - mu * mu
    sd = math.sqrt(var) if var > 0 else 1.0

    beta = np.zeros(2, np.float64)
    for _ in range(8):
        b0, b1 = float(beta[0]), float(beta[1])

        def _partial(t: pa.Table, b0=b0, b1=b1) -> pa.Table:
            x = (t["x"].to_numpy(zero_copy_only=False) - mu) / sd
            y = t["y"].to_numpy(zero_copy_only=False)
            p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
            r = y - p
            w = p * (1.0 - p)
            return pa.table({"g0": pa.array([float(r.sum())]),
                             "g1": pa.array([float((r * x).sum())]),
                             "h00": pa.array([float(w.sum())]),
                             "h01": pa.array([float((w * x).sum())]),
                             "h11": pa.array([float((w * x * x).sum())])})

        pp = feat.map_batches(_partial, batch_format="pyarrow",
                              batch_size=131072).to_pandas()
        g0 = math.fsum(pp["g0"])
        g1 = math.fsum(pp["g1"])
        h00 = math.fsum(pp["h00"])
        h01 = math.fsum(pp["h01"])
        h11 = math.fsum(pp["h11"])
        det = h00 * h11 - h01 * h01
        beta[0] += (h11 * g0 - h01 * g1) / det
        beta[1] += (h00 * g1 - h01 * g0) / det

    b0, b1 = float(beta[0]), float(beta[1])

    def _loss(t: pa.Table) -> pa.Table:
        x = (t["x"].to_numpy(zero_copy_only=False) - mu) / sd
        y = t["y"].to_numpy(zero_copy_only=False)
        z = b0 + b1 * x
        # log(1+e^z) - y*z, computed stably
        ll = np.logaddexp(0.0, z) - y * z
        return pa.table({"l": pa.array([float(ll.sum())])})

    lp = feat.map_batches(_loss, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    logloss = math.fsum(lp["l"]) / n
    return pd.DataFrame({"n": pd.Series([int(n)], dtype="int64"),
                         "intercept": [round(b0, 6)],
                         "coef": [round(b1, 6)],
                         "logloss": [round(logloss, 6)]})


QUERIES["logit_purchase_value"] = q_logit_purchase_value


def q_source_ttr(sf_dir: str) -> pd.DataFrame:
    """VOCABULARY RICHNESS per source: type-token ratio and Herdan's C
    (ln V / ln N) — the lexical-diversity census that separates a
    boilerplate-heavy source from genuinely varied text (TTR shrinks
    with corpus size; Herdan's C is the size-robust companion).
    Distributed shape: per-block (source, token) COUNT partials with
    the suite's shared tokenizer (lower + [a-z']+, the word_freqs /
    source_token_overlap convention) -> ONE grouped exchange to the
    bounded vocab x source census; totals and distinct counts fold on
    the reduced table. Single-float expressions mirrored by the twin."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z']+")
        ex = pd.DataFrame({
            "source": df["source"].to_numpy().repeat(
                toks.str.len().to_numpy()),
            "token": np.concatenate(
                [np.asarray(t, dtype=object) for t in toks])
            if len(toks) else np.array([], dtype=object)})
        g = ex.groupby(["source", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    inner, edge = sorted_groupby(
        ds.map_batches(_tok, batch_format="pandas", batch_size=65536),
        ["source", "token"], [("n", "sum", "n")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    if c.empty:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "n_vocab": pd.Series([], dtype="int64"),
                             "ttr": pd.Series([], dtype="float64"),
                             "herdan_c": pd.Series([], dtype="float64")})
    g = (c.groupby("source")
         .agg(n_tokens=("n", "sum"), n_vocab=("n", "size"))
         .reset_index().sort_values("source").reset_index(drop=True))
    g["n_tokens"] = g["n_tokens"].astype("int64")
    g["n_vocab"] = g["n_vocab"].astype("int64")
    nt = g["n_tokens"].to_numpy(np.float64)
    nv = g["n_vocab"].to_numpy(np.float64)
    g["ttr"] = np.round(nv / nt, 6)
    g["herdan_c"] = np.round(np.log(nv) / np.log(nt), 6)
    return g[["source", "n_tokens", "n_vocab", "ttr", "herdan_c"]]


ORACLE["source_ttr"] = """
    WITH w AS (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS tok
        FROM documents
    ),
    c AS (
        SELECT source, COUNT(*)::BIGINT AS n_tokens,
               COUNT(DISTINCT tok)::BIGINT AS n_vocab
        FROM w GROUP BY 1
    )
    SELECT source, n_tokens, n_vocab,
           ROUND(CAST(n_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS ttr,
           ROUND(LN(CAST(n_vocab AS DOUBLE))
                 / LN(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c
    FROM c ORDER BY source
"""
QUERIES["source_ttr"] = q_source_ttr


def q_gap_expfit_ks(sf_dir: str) -> pd.DataFrame:
    """EXPONENTIAL-FIT GOODNESS OF FIT on pooled inter-event gaps: fit
    Exp(1/mean) to the second-granularity gap distribution by moment
    matching and report the one-sample KS distance — the
    arrival-process validation check (a Poisson stream fits; bursty or
    bot traffic shows a large D). Distributed shape: the gap multiset
    extracts through adjacent_gap_counts (one sort exchange, in-block
    LAG-delta counts, O(blocks) boundary carry), a second skinny
    exchange collapses to the bounded per-second census, and the KS
    fold (step CDF vs 1 − e^(−x/mean), both sides of each step) runs
    on the reduced table. Mean from exact int64 sums; the float
    expressions mirror the twin operation-for-operation."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import adjacent_gap_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    inner, edge = adjacent_gap_counts(ds, "user_id", "ts", "event_id")
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))

    def _to_sec(t: pa.Table) -> pa.Table:
        gs = pc.divide(t["gap_us"], pa.scalar(1_000_000, pa.int64()))
        tt = pa.table({"gap_s": gs, "w": t["w"]})
        g = tt.group_by(["gap_s"], use_threads=False).aggregate(
            [("w", "sum")])
        return g.rename_columns(
            [{"w_sum": "w"}.get(c, c) for c in g.column_names])

    gi, ge = sorted_groupby(
        vc.map_batches(_to_sec, batch_format="pyarrow", batch_size=131072),
        ["gap_s"], [("w", "sum", "w")])
    census = gi.to_pandas()
    if ge is not None and ge.num_rows:
        census = pd.concat([census, ge.to_pandas()], ignore_index=True)
    census = (census.groupby("gap_s", as_index=False)["w"].sum()
              .sort_values("gap_s").reset_index(drop=True))
    x = census["gap_s"].to_numpy(np.int64)
    w = census["w"].to_numpy(np.int64)
    n = int(w.sum())
    mean = float((x * w).sum()) / float(n)
    cum = np.cumsum(w)
    fexp = 1.0 - np.exp(-(x.astype(np.float64) / mean))
    hi = np.abs(cum / float(n) - fexp)
    lo = np.abs((cum - w) / float(n) - fexp)
    ks = round(float(np.maximum(hi, lo).max()), 6)
    return pd.DataFrame({"n_gaps": pd.Series([n], dtype="int64"),
                         "mean_gap_s": [round(mean, 6)],
                         "ks": [ks]})


ORACLE["gap_expfit_ks"] = """
    WITH g AS (
        SELECT (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
               // 1000000 AS gap_s
        FROM events
    ),
    c AS (SELECT gap_s, COUNT(*)::BIGINT AS w FROM g
          WHERE gap_s IS NOT NULL GROUP BY 1),
    m AS (SELECT CAST(SUM(gap_s * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
                     AS mean_s,
                 SUM(w)::BIGINT AS n FROM c),
    k AS (SELECT gap_s, w, SUM(w) OVER (ORDER BY gap_s) AS cum FROM c)
    SELECT (SELECT n FROM m) AS n_gaps,
           ROUND((SELECT mean_s FROM m), 6) AS mean_gap_s,
           ROUND(MAX(GREATEST(
               ABS(CAST(cum AS DOUBLE) / CAST((SELECT n FROM m) AS DOUBLE)
                   - (1 - EXP(-(CAST(gap_s AS DOUBLE)
                                / (SELECT mean_s FROM m))))),
               ABS(CAST(cum - w AS DOUBLE)
                   / CAST((SELECT n FROM m) AS DOUBLE)
                   - (1 - EXP(-(CAST(gap_s AS DOUBLE)
                                / (SELECT mean_s FROM m))))))), 6) AS ks
    FROM k
"""
QUERIES["gap_expfit_ks"] = q_gap_expfit_ks


def q_knn_label_purity(sf_dir: str) -> pd.DataFrame:
    """k-NN NEIGHBORHOOD PURITY of the embedding space (k=10): per
    label, the fraction of each vector's ten nearest cosine neighbors
    that share its label — the embedding-quality eval that says
    whether the space actually clusters by label before anyone trusts
    an ANN dedup or retrieval built on it. Distributed shape: the
    corpus matrix broadcasts ONCE via ray.put (the referential
    small-side pattern; at 10^12 scale the corpus side is the IVF
    index and this exact form is its oracle baseline, the ann_topk
    precedent) while the query side STREAMS through map_batches —
    per-batch float64 matmul, self column masked, top-k by
    argpartition (membership only; the data's min k-th/(k+1)-th gap
    is >= 3.5e-7 at every SF, orders beyond cross-engine float noise,
    so the set is stable — the cosine_range_search argument), per-block
    (label, same, n) partials fold on the driver. The twin casts to
    DOUBLE[] so DuckDB scores in float64 too."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    corpus = pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"]
                           ).sort_by("vec_id")
    ids = np.asarray(corpus["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in corpus["embedding"].to_pylist()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    labels = np.asarray(corpus["label"].to_pylist(), dtype=np.int64)
    ref = ray.put((ids, mat, labels))
    k = 10

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        c_ids, c_mat, c_lab = ray.get(ref)
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                           1e-12)
        sims = q @ c_mat.T
        rows = np.arange(len(df))
        own = np.searchsorted(c_ids, df["vec_id"].to_numpy(np.int64))
        sims[rows, own] = -np.inf
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        same = (c_lab[top]
                == df["label"].to_numpy(np.int64)[:, None]).sum(axis=1)
        out = pd.DataFrame({"label": df["label"].astype("int64"),
                            "same": same.astype("int64")})
        g = out.groupby("label", as_index=False).agg(
            same=("same", "sum"), n_vecs=("same", "size"))
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=8192).to_pandas()
    out = (parts.groupby("label", as_index=False)[["same", "n_vecs"]]
           .sum().sort_values("label").reset_index(drop=True))
    out["label"] = out["label"].astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["purity"] = np.round(
        out["same"].to_numpy(np.float64)
        / (10.0 * out["n_vecs"].to_numpy(np.float64)), 6)
    return out[["label", "n_vecs", "purity"]]


ORACLE["knn_label_purity"] = """
    WITH p AS (
        SELECT a.vec_id AS qid, a.label AS qlabel, b.label AS nlabel,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                            b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    s AS (
        SELECT qid, qlabel,
               SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)::BIGINT
                   AS same
        FROM p WHERE rn <= 10 GROUP BY 1, 2
    )
    SELECT qlabel AS label, COUNT(*)::BIGINT AS n_vecs,
           ROUND(CAST(SUM(same) AS DOUBLE) / (10.0 * COUNT(*)), 6)
               AS purity
    FROM s GROUP BY 1 ORDER BY 1
"""
QUERIES["knn_label_purity"] = q_knn_label_purity


def q_part_pagerank(sf_dir: str) -> pd.DataFrame:
    """PAGERANK over the part co-purchase graph (damping 0.85, 10
    power iterations) — the iterative-graph centrality op beside the
    suite's label propagation: which parts sit at the hubs of the
    basket graph. Distributed shape: distinct (order, part) through
    one grouped exchange; pair_cooccurrence builds the undirected
    distinct-edge set (one sort exchange); the bounded node/degree
    arrays broadcast ONCE via ray.put and each iteration is a SINGLE
    zero-exchange map_batches pass over the materialized edge blocks —
    per-block bincount of r[src]/deg[src] into dst, nonzero-compressed
    partials folded on the driver (the bounded-domain census pattern;
    at 10^9 nodes the rank vector graduates to a partitioned layout
    like label_propagation_ds's documented upgrade). The twin is the
    same fixed-iteration recursion as a recursive CTE with
    aggregation; both sides round to 6dp after iteration 10."""
    import ray
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_partkey"],
                            [(None, "count_all", "_n")])
    pairs = di.select_columns(["l_orderkey", "l_partkey"])
    if de is not None and de.num_rows:
        pairs = pairs.union(
            rd.from_arrow(de.select(["l_orderkey", "l_partkey"])))
    ci, ce = pair_cooccurrence(pairs, "l_orderkey", "l_partkey")
    edges = ci.select_columns(["item_a", "item_b"])
    if ce is not None and ce.num_rows:
        edges = edges.union(rd.from_arrow(ce.select(["item_a", "item_b"])))
    edges = edges.materialize()  # consumed 11x: degree pass + 10 iters

    def _deg(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False)
        b = t["item_b"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "d": pa.array(cnt.astype(np.int64))})

    degp = edges.map_batches(_deg, batch_format="pyarrow",
                             batch_size=131072).to_pandas()
    fold = degp.groupby("node")["d"].sum()
    nodes = fold.index.to_numpy(np.int64)  # sorted
    dvec = fold.to_numpy(np.int64)
    nn = float(len(nodes))
    if not len(nodes):
        return pd.DataFrame({"part": pd.Series([], dtype="int64"),
                             "pagerank": pd.Series([], dtype="float64")})
    topo = ray.put((nodes, dvec))
    r = np.full(len(nodes), 1.0 / nn)
    for _ in range(10):
        rref = ray.put(r)

        def _contrib(t: pa.Table, rref=rref) -> pa.Table:
            t_nodes, t_dvec = ray.get(topo)
            rv = ray.get(rref)
            a = t["item_a"].to_numpy(zero_copy_only=False)
            b = t["item_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(t_nodes, a)
            ib = np.searchsorted(t_nodes, b)
            src = np.concatenate([ia, ib])
            dst = np.concatenate([ib, ia])
            sums = np.bincount(dst, weights=rv[src] / t_dvec[src],
                               minlength=len(t_nodes))
            nz = np.nonzero(sums)[0]
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "c": pa.array(sums[nz])})

        parts = edges.map_batches(_contrib, batch_format="pyarrow",
                                  batch_size=131072).to_pandas()
        contrib = np.zeros(len(nodes), np.float64)
        agg = parts.groupby("i")["c"].sum()
        contrib[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.float64)
        r = 0.15 / nn + 0.85 * contrib
    return pd.DataFrame({"part": pd.Series(nodes, dtype="int64"),
                         "pagerank": np.round(r, 6)})


ORACLE["part_pagerank"] = """
    WITH RECURSIVE
    op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e2 AS (SELECT DISTINCT a.p AS src, b.p AS dst
           FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
    deg AS (SELECT src, COUNT(*)::BIGINT AS d FROM e2 GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM deg),
    pr(iter, node, r) AS (
        SELECT 0, src, 1.0 / (SELECT nn FROM n) FROM deg
        UNION ALL
        SELECT p.iter + 1, e2.dst,
               0.15 / (SELECT nn FROM n) + 0.85 * SUM(p.r / deg.d)
        FROM pr p
        JOIN e2 ON e2.src = p.node
        JOIN deg ON deg.src = p.node
        WHERE p.iter < 10
        GROUP BY 1, 2
    )
    SELECT node AS part, ROUND(r, 6) AS pagerank
    FROM pr WHERE iter = 10 ORDER BY 1
"""
QUERIES["part_pagerank"] = q_part_pagerank


def q_weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    top-k), deterministic: the 200 documents drawn with probability
    proportional to length, via priority −ln(u)/w where u is the
    per-row Knuth-hash uniform the suite's epoch_mix already twins
    bit-for-bit in SQL (same salt/multiplier; id domain < 2³¹
    contract). The reproducible weighted corpus subsample every
    mixing/eval pipeline needs — reruns and resumed runs pick the
    SAME sample. Distributed shape: zero exchanges — per-block
    vectorized priority + per-block top-k partials, driver merge of
    ≤ blocks×k rows (the brute_topk discipline). Priority is one ln
    and one division on both sides; the k-th/(k+1)-th priority gap is
    ~1/n, orders beyond cross-engine libm noise, so membership is
    stable (the cosine_range_search argument)."""
    from .mix import MIX_MOD, MIX_MULT, MIX_SALT

    k = 200
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def _pri(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["n_chars"], 0)
        sub = t.filter(keep)
        ids = sub["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids ^ np.uint64(MIX_SALT)) * np.uint64(MIX_MULT)) \
            % np.uint64(MIX_MOD)
        u = (h.astype(np.float64) + 0.5) / float(MIX_MOD)
        w = sub["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        pri = -np.log(u) / w
        kk = min(k, len(pri))
        if not kk:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "pri": pa.array([], pa.float64())})
        part = np.argpartition(pri, kk - 1)[:kk]
        return pa.table({
            "doc_id": pa.array(
                sub["doc_id"].to_numpy(zero_copy_only=False)[part]),
            "n_chars": pa.array(
                sub["n_chars"].to_numpy(zero_copy_only=False)[part]),
            "pri": pa.array(pri[part])})

    parts = ds.map_batches(_pri, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.sort_values(["pri", "doc_id"]).head(k)
           .sort_values("doc_id").reset_index(drop=True))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out[["doc_id", "n_chars"]]


ORACLE["weighted_sample_docs"] = """
    WITH h AS (
        SELECT doc_id, n_chars,
               ((xor(doc_id, 1482184749) * 2654435761) % 4294967296
                + 0.5) / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0
    ),
    p AS (SELECT doc_id, n_chars, -LN(u) / n_chars AS pri FROM h)
    SELECT doc_id, n_chars FROM (
        SELECT * FROM p ORDER BY pri, doc_id LIMIT 200
    ) ORDER BY doc_id
"""
QUERIES["weighted_sample_docs"] = q_weighted_sample_docs


def q_tool_conformance_census(sf_dir: str) -> pd.DataFrame:
    """TOOL-CALL PROTOCOL CONFORMANCE over the derived transcripts: a
    `tool` turn is well-formed only if the immediately preceding turn
    in its conversation is an `assistant` turn (a tool result with no
    tool call above it is a corrupt transcript) — the transcript-grammar
    validation check beside role_alternation and conv_boundary_roles.
    Distributed shape: the (prev_role, role) adjacency census through
    pair_gap_stats' ONE sort exchange (fixed int64 role codes, the
    shared _role_code_batch dictionary); conforming = the
    assistant→tool cell, total tool turns from a zero-exchange count
    (conversation-OPENING tool turns have no prev and are
    nonconforming by definition, which the subtraction captures)."""
    from ..stages.window import pair_gap_stats

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def _codes(t: pa.Table) -> pa.Table:
        r = _role_code_batch(t)
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": r["user_id"], "ts_us": us,
                         "event_id": r["event_id"], "code": r["code"]})

    coded = ds.map_batches(_codes, batch_format="pyarrow",
                           batch_size=131072)
    inner, edge = pair_gap_stats(coded, "user_id", ["ts_us", "event_id"],
                                 "code", "ts_us",
                                 prev_name="prev_c", cur_name="cur_c")
    census = inner.to_pandas()
    if edge is not None and edge.num_rows:
        census = pd.concat([census, edge.to_pandas()], ignore_index=True)
    census = census.groupby(["prev_c", "cur_c"], as_index=False)["n"].sum()
    # tool = code 3 (error events), assistant = code 2 (purchase)
    good = int(census.loc[(census["prev_c"] == 2)
                          & (census["cur_c"] == 3), "n"].sum())

    def _tools(t: pa.Table) -> pa.Table:
        n = pc.sum(pc.cast(pc.equal(t["event_type"], pa.scalar("error")),
                           pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    total = int(ds.map_batches(_tools, batch_format="pyarrow",
                               batch_size=131072).to_pandas()["n"].sum())
    rate = round(good / total, 6) if total else 0.0
    return pd.DataFrame({
        "n_tool_turns": pd.Series([total], dtype="int64"),
        "n_conforming": pd.Series([good], dtype="int64"),
        "n_nonconforming": pd.Series([total - good], dtype="int64"),
        "conforming_rate": [rate]})


ORACLE["tool_conformance_census"] = f"""
    WITH t AS ({_TRANSCRIPTS_SQL}),
    x AS (
        SELECT role,
               LAG(role) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS prev
        FROM t
    )
    SELECT COUNT(*)::BIGINT AS n_tool_turns,
           SUM(CASE WHEN prev = 'assistant' THEN 1 ELSE 0 END)::BIGINT
               AS n_conforming,
           SUM(CASE WHEN prev = 'assistant' THEN 0 ELSE 1 END)::BIGINT
               AS n_nonconforming,
           ROUND(CAST(SUM(CASE WHEN prev = 'assistant' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS conforming_rate
    FROM x WHERE role = 'tool'
"""
QUERIES["tool_conformance_census"] = q_tool_conformance_census


def q_user_value_ewma(sf_dir: str) -> pd.DataFrame:
    """DISTRIBUTED EWMA (α = 0.2, zero-seeded) of each user's value
    stream under (ts, event_id) order — the LINEAR-RECURRENCE SCAN
    s_t = 0.8·s_{t−1} + 0.2·x_t, the one window shape LAG/SUM frames
    cannot express but a streaming validation engine needs (per-entity
    smoothed level at end of stream). Distributed shape: the recurrence
    is an affine map s → a·s + b per segment, and affine maps COMPOSE
    associatively — each in-block run folds to (a, b) = (0.8^m,
    Σ 0.2·0.8^{m−i}·x_i) vectorized, and _partition_run_reduce's
    O(blocks) boundary carry composes fragments in order:
    (a₁,b₁)∘(a₂,b₂) = (a₁a₂, a₂b₁ + b₂). The float pair rides the
    scaffold's int64 fields as IEEE bit patterns (exact). Values go
    through the suite's cent convention on both sides; the twin is the
    zero-seed closed form Σ 0.2·0.8^{n−i}·x_i."""
    from ..stages.window import _partition_run_reduce

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t["value"]))
        cents = pc.cast(pc.round(pc.multiply(sub["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"user_id": sub["user_id"], "ts": sub["ts"],
                         "event_id": sub["event_id"], "cents": cents})

    fb = lambda f: np.float64(f).view(np.int64).item()   # noqa: E731
    bf = lambda i: np.int64(i).view(np.float64).item()   # noqa: E731

    def _run(ts_seg, vseg):
        m = vseg.size
        x = vseg.astype(np.float64) / 100.0
        w = 0.2 * np.power(0.8, (m - 1) - np.arange(m, dtype=np.float64))
        return (fb(0.8 ** m), fb(float((w * x).sum())), m)

    def _merge(c, f, _gap):
        a1, b1 = bf(c[0]), bf(c[1])
        a2, b2 = bf(f[0]), bf(f[1])
        return (fb(a1 * a2), fb(a2 * b1 + b2), c[2] + f[2])

    out = _partition_run_reduce(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "user_id", "ts", "event_id", ["a_bits", "b_bits", "n_events"],
        run_agg=_run, merge=_merge, emit=lambda v: True,
        val_col="cents").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["ewma"] = np.round(
        out["b_bits"].to_numpy(np.int64).view(np.float64), 6)
    return (out[["user_id", "n_events", "ewma"]]
            .sort_values("user_id").reset_index(drop=True))


ORACLE["user_value_ewma"] = """
    WITH r AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) / 100.0 AS x,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(SUM(0.2 * POWER(0.8, n - rn) * x), 6) AS ewma
    FROM r GROUP BY user_id ORDER BY user_id
"""
QUERIES["user_value_ewma"] = q_user_value_ewma


def q_segment_price_percentile(sf_dir: str) -> pd.DataFrame:
    """MARKET-SEGMENT PRICE POSITIONING: the average GLOBAL percentile
    (RANK-based percent_rank) of order value per customer market
    segment — does a segment buy from the top or bottom of the price
    distribution. Distributed shape: rank(v) − 1 = #{values < v}, so
    Σ(rank−1) per segment needs NO global sort — ONE grouped exchange
    builds the distinct-price census, its cumulative-lt table
    broadcasts (bounded by distinct prices; the two-sample-histogram
    discipline), the customer→segment dim broadcasts via ray.put (true
    small side), and a zero-exchange pass over orders emits per-block
    (segment, Σ cnt_lt, n) exact-int partials. One float division at
    the end, mirrored by the twin."""
    import ray

    from ..stages.fast_ops import sorted_groupby

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64())
        return pa.table({"cents": c,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    ci, ce = sorted_groupby(
        orders.map_batches(_cents, batch_format="pyarrow",
                           batch_size=131072),
        ["cents"], [("one", "sum", "w")])
    census = ci.to_pandas()
    if ce is not None and ce.num_rows:
        census = pd.concat([census, ce.to_pandas()], ignore_index=True)
    census = (census.groupby("cents", as_index=False)["w"].sum()
              .sort_values("cents").reset_index(drop=True))
    vals = census["cents"].to_numpy(np.int64)
    w = census["w"].to_numpy(np.int64)
    n_total = int(w.sum())
    cnt_lt = np.concatenate([[0], np.cumsum(w)[:-1]])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]
                         ).sort_by("c_custkey")
    ckeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    segs = np.asarray(cust["c_mktsegment"].to_pylist(), dtype=object)
    ref = ray.put((vals, cnt_lt, ckeys, segs))

    def _partial(t: pa.Table) -> pa.Table:
        b_vals, b_lt, b_ck, b_seg = ray.get(ref)
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        lt = b_lt[np.searchsorted(b_vals, c)]
        seg = b_seg[np.searchsorted(
            b_ck, t["o_custkey"].to_numpy(zero_copy_only=False))]
        df = pd.DataFrame({"segment": seg, "s_lt": lt})
        g = df.groupby("segment", as_index=False).agg(
            s_lt=("s_lt", "sum"), n_orders=("s_lt", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = orders.map_batches(_partial, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
    out = (parts.groupby("segment", as_index=False)[["s_lt", "n_orders"]]
           .sum().sort_values("segment").reset_index(drop=True))
    out["n_orders"] = out["n_orders"].astype("int64")
    out["avg_pct_rank"] = np.round(
        out["s_lt"].to_numpy(np.float64)
        / (float(n_total - 1) * out["n_orders"].to_numpy(np.float64)), 6)
    return out[["segment", "n_orders", "avg_pct_rank"]]


ORACLE["segment_price_percentile"] = """
    WITH r AS (
        SELECT o_custkey, RANK() OVER (ORDER BY o_totalprice) AS rnk,
               COUNT(*) OVER () AS n
        FROM orders
    ),
    j AS (SELECT c.c_mktsegment AS segment, r.rnk, r.n
          FROM r JOIN customer c ON c.c_custkey = r.o_custkey)
    SELECT segment, COUNT(*)::BIGINT AS n_orders,
           ROUND(CAST(SUM(rnk - 1) AS DOUBLE)
                 / (CAST(MAX(n) - 1 AS DOUBLE) * COUNT(*)), 6)
               AS avg_pct_rank
    FROM j GROUP BY 1 ORDER BY 1
"""
QUERIES["segment_price_percentile"] = q_segment_price_percentile


def q_repeat_order_value_corr(sf_dir: str) -> pd.DataFrame:
    """SEQUENTIAL DEPENDENCE of order value: Pearson r between each
    order's total and the SAME customer's previous order total (LAG
    pairs under (o_orderdate, o_orderkey) order) — does big spend
    predict big next spend, the repeat-purchase autocorrelation a
    forecasting validation wants. Distributed shape: lag_values' one
    sort exchange emits (orderkey, prev_cents); ONE sort-merge join
    attaches the current value; per-block float64 Gram partials
    (n, Σp, Σc, Σpc, Σp², Σc²) fold with fsum on the driver — the
    corr_lineitem Gram discipline applied to a windowed pair stream.
    The twin is DuckDB's corr() over the same LAG pairs (round-6
    equality, the corr_lineitem precedent)."""
    import math

    from ..stages.merge_join import sorted_merge_join
    from ..stages.window import lag_values

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        d = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                    pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "d_us": d,
                         "o_orderkey": t["o_orderkey"], "cents": cents})

    pre = orders.map_batches(_pre, batch_format="pyarrow",
                             batch_size=131072).materialize()
    lagged = lag_values(pre, "o_custkey", ["d_us", "o_orderkey"],
                        "cents", "o_orderkey")

    def _drop_first(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["prev"]))

    pairs = sorted_merge_join(
        lagged.map_batches(_drop_first, batch_format="pyarrow",
                           batch_size=131072),
        pre.select_columns(["o_orderkey", "cents"]),
        "id", "o_orderkey", ["prev"], ["cents"],
        rows_hint=int(pre.count()) * 2)

    def _gram(t: pa.Table) -> pa.Table:
        p = t["prev"].to_numpy(zero_copy_only=False) / 100.0
        c = t["cents"].to_numpy(zero_copy_only=False) / 100.0
        return pa.table({
            "n": pa.array([float(len(p))]),
            "sp": pa.array([float(p.sum())]),
            "sc": pa.array([float(c.sum())]),
            "spc": pa.array([float((p * c).sum())]),
            "sp2": pa.array([float((p * p).sum())]),
            "sc2": pa.array([float((c * c).sum())])})

    g = pairs.map_batches(_gram, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    n = math.fsum(g["n"])
    sp, sc = math.fsum(g["sp"]), math.fsum(g["sc"])
    spc = math.fsum(g["spc"])
    sp2, sc2 = math.fsum(g["sp2"]), math.fsum(g["sc2"])
    num = n * spc - sp * sc
    den = math.sqrt((n * sp2 - sp * sp) * (n * sc2 - sc * sc))
    r = round(num / den, 6) if den > 0 else float("nan")
    return pd.DataFrame({"n_pairs": pd.Series([int(n)], dtype="int64"),
                         "corr_prev_next": [r]})


ORACLE["repeat_order_value_corr"] = """
    WITH l AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS cur,
               LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    )
    SELECT COUNT(*)::BIGINT AS n_pairs,
           ROUND(corr(prev, cur), 6) AS corr_prev_next
    FROM l WHERE prev IS NOT NULL
"""
QUERIES["repeat_order_value_corr"] = q_repeat_order_value_corr


def q_knn_mean_cos_census(sf_dir: str) -> pd.DataFrame:
    """EMBEDDING ISOLATION SCORES: every vector's MEAN cosine to its 10
    nearest neighbors — the kNN-distance outlier census (low scores =
    isolated points a near-dup or retrieval index will mis-serve;
    knn_label_purity's unsupervised sibling). Same distributed shape:
    corpus broadcast once via ray.put, query side streams, per-batch
    float64 matmul with the self column masked; the top-10 SET is
    membership-stable (min k-gap ≥ 3.5e-7 at every SF) and the mean is
    a single 10-term sum + one division — selection-free full census,
    so no top-k boundary rides on float noise at all. Twin casts to
    DOUBLE[] (float64 on both sides)."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]
                           ).sort_by("vec_id")
    ids = np.asarray(corpus["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in corpus["embedding"].to_pylist()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    ref = ray.put((ids, mat))
    k = 10

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        c_ids, c_mat = ray.get(ref)
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                           1e-12)
        sims = q @ c_mat.T
        rows = np.arange(len(df))
        own = np.searchsorted(c_ids, df["vec_id"].to_numpy(np.int64))
        sims[rows, own] = -np.inf
        top = -np.partition(-sims, k - 1, axis=1)[:, :k]
        return pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "mean_topk_cos": np.round(top.sum(axis=1) / float(k), 6)})

    out = ds.map_batches(_partial, batch_format="pandas",
                         batch_size=8192).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


ORACLE["knn_mean_cos_census"] = """
    WITH p AS (
        SELECT a.vec_id AS qid,
               list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                            b.vec_id) AS rn
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT qid AS vec_id, ROUND(SUM(cos) / 10.0, 6) AS mean_topk_cos
    FROM p WHERE rn <= 10 GROUP BY 1 ORDER BY 1
"""
QUERIES["knn_mean_cos_census"] = q_knn_mean_cos_census


def q_open_orders_daily(sf_dir: str) -> pd.DataFrame:
    """OPEN-ORDER BALANCE over time (interval counting): for every day
    the step count of orders placed but not yet fully shipped — an
    order is open on day d iff o_orderdate ≤ d < its max l_shipdate —
    the inventory/backlog monitor built WITHOUT expanding intervals to
    days (the classic +1/−1 delta trick). Distributed shape: per-order
    close date through one grouped exchange (max shipdate); a
    sort-merge join attaches o_orderdate; per-block (day, ±1) delta
    censuses fold on the driver (bounded by the calendar) and one
    prefix sum walks the step function. Orders with no lineitems never
    open — the INNER join both sides share. All-integer."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.merge_join import sorted_merge_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def _ship(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                    pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "ship_us": d})

    si, se = sorted_groupby(
        li.map_batches(_ship, batch_format="pyarrow", batch_size=131072),
        ["l_orderkey"], [("ship_us", "max", "close_us")])
    closes = si
    if se is not None and se.num_rows:
        closes = closes.union(rd.from_arrow(se))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def _open(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                    pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"], "open_us": d})

    j = sorted_merge_join(
        closes, orders.map_batches(_open, batch_format="pyarrow",
                                   batch_size=131072),
        "l_orderkey", "o_orderkey", ["close_us"], ["open_us"],
        rows_hint=int(orders.count()) * 2)

    day_us = 86_400_000_000

    def _deltas(t: pa.Table) -> pa.Table:
        o = t["open_us"].to_numpy(zero_copy_only=False) // day_us
        c = t["close_us"].to_numpy(zero_copy_only=False) // day_us
        days = np.concatenate([o, c])
        deltas = np.concatenate([np.ones(len(o), np.int64),
                                 np.full(len(c), -1, np.int64)])
        df = pd.DataFrame({"day": days, "delta": deltas})
        g = df.groupby("day", as_index=False)["delta"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = j.map_batches(_deltas, batch_format="pyarrow",
                          batch_size=131072).to_pandas()
    census = (parts.groupby("day", as_index=False)["delta"].sum()
              .sort_values("day").reset_index(drop=True))
    census = census[census["delta"] != 0]
    out = pd.DataFrame({
        "day": (census["day"].to_numpy(np.int64) * day_us)
        .astype("datetime64[us]"),
        "n_open": np.cumsum(census["delta"].to_numpy(np.int64))})
    out["n_open"] = out["n_open"].astype("int64")
    return out.reset_index(drop=True)


ORACLE["open_orders_daily"] = """
    WITH c AS (
        SELECT l_orderkey, MAX(l_shipdate) AS close_d
        FROM lineitem GROUP BY 1
    ),
    iv AS (
        SELECT date_trunc('day', o.o_orderdate) AS open_day,
               date_trunc('day', c.close_d) AS close_day
        FROM orders o JOIN c ON c.l_orderkey = o.o_orderkey
    ),
    d AS (
        SELECT open_day AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT close_day AS day, -1 AS delta FROM iv
    ),
    g AS (SELECT day, SUM(delta)::BIGINT AS delta FROM d GROUP BY 1
          HAVING SUM(delta) <> 0)
    SELECT day, SUM(delta) OVER (ORDER BY day)::BIGINT AS n_open
    FROM g ORDER BY day
"""
QUERIES["open_orders_daily"] = q_open_orders_daily


def q_fd_violation_witnesses(sf_dir: str) -> pd.DataFrame:
    """MATERIALIZED FD-VIOLATION ROWS (the north rule's violation-row
    mandate applied to the near-FD family): every order whose lines
    DISAGREE on l_returnflag, with the lexicographic min/max flags as
    witnesses — fd_census says HOW MANY keys break the dependency,
    this says WHICH, with evidence a human can act on. Distributed
    shape: distinct (orderkey, flag) pairs through one grouped
    exchange; a second skinny exchange on the same key folds
    (n_flags, min, max); violations = n_flags > 1, filtered in map
    tasks before any driver materialization."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_returnflag"],
                            [(None, "count_all", "_n")])
    pairs = di.select_columns(["l_orderkey", "l_returnflag"])
    if de is not None and de.num_rows:
        pairs = pairs.union(
            rd.from_arrow(de.select(["l_orderkey", "l_returnflag"])))
    gi, ge = sorted_groupby(
        pairs, ["l_orderkey"],
        [(None, "count_all", "n_flags"), ("l_returnflag", "min", "flag_min"),
         ("l_returnflag", "max", "flag_max")])

    def _viol(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_flags"], 1))

    out = gi.map_batches(_viol, batch_format="pyarrow",
                         batch_size=131072).to_pandas()
    if ge is not None and ge.num_rows:
        out = pd.concat([out, _viol(ge).to_pandas()], ignore_index=True)
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["n_flags"] = out["n_flags"].astype("int64")
    return (out[["l_orderkey", "n_flags", "flag_min", "flag_max"]]
            .sort_values("l_orderkey").reset_index(drop=True))


ORACLE["fd_violation_witnesses"] = """
    SELECT l_orderkey,
           COUNT(DISTINCT l_returnflag)::BIGINT AS n_flags,
           MIN(l_returnflag) AS flag_min,
           MAX(l_returnflag) AS flag_max
    FROM lineitem GROUP BY 1
    HAVING COUNT(DISTINCT l_returnflag) > 1
    ORDER BY 1
"""
QUERIES["fd_violation_witnesses"] = q_fd_violation_witnesses


def q_first_response_quantiles(sf_dir: str) -> pd.DataFrame:
    """TIME-TO-FIRST-RESPONSE SLO over the derived transcripts: per
    conversation, first assistant turn ts minus first user turn ts
    (both present, response strictly after), then the exact
    PERCENTILE_DISC p50/p90 of that latency — the conversational SLA
    check. Distributed shape: one grouped exchange folds each conv to
    (min user ts, min assistant ts) via null-skipping conditional
    mins; the latency value census is a second skinny exchange and the
    discrete quantile gate (smallest value with cum ≥ ⌈q·n⌉) runs on
    the bounded census — no per-conv rows ever reach the driver."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        r = _role_code_batch(t)
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        is_u = pc.equal(r["code"], pa.scalar(0, pa.int64()))
        is_a = pc.equal(r["code"], pa.scalar(2, pa.int64()))
        return pa.table({
            "user_id": t["user_id"],
            "u_ts": pc.if_else(is_u, us, pa.scalar(None, pa.int64())),
            "a_ts": pc.if_else(is_a, us, pa.scalar(None, pa.int64()))})

    gi, ge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("u_ts", "min", "first_u"),
                      ("a_ts", "min", "first_a")])
    conv = gi

    def _lat(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t["first_u"]),
                               pc.is_valid(t["first_a"])),
                       pc.greater(t["first_a"], t["first_u"]))
        sub = t.filter(keep)
        lat = pc.subtract(sub["first_a"], sub["first_u"])
        tt = pa.table({"lat_us": lat})
        g = tt.group_by(["lat_us"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "w"}.get(c, c) for c in g.column_names])

    li = conv.map_batches(_lat, batch_format="pyarrow",
                          batch_size=131072)
    if ge is not None and ge.num_rows:
        li = li.union(rd.from_arrow(_lat(ge)))
    census = (li.to_pandas().groupby("lat_us", as_index=False)["w"].sum()
              .sort_values("lat_us").reset_index(drop=True))
    x = census["lat_us"].to_numpy(np.int64)
    w = census["w"].to_numpy(np.int64)
    n = int(w.sum())
    cum = np.cumsum(w)

    def _disc(q: float) -> int:
        # PERCENTILE_DISC: smallest value with cum >= ceil(q * n)
        need = -(-int(q * 1000) * n // 1000)  # ceil(q*n) with exact ints
        return int(x[np.searchsorted(cum, need)])

    return pd.DataFrame({
        "n_convs": pd.Series([n], dtype="int64"),
        "p50_us": pd.Series([_disc(0.5)], dtype="int64"),
        "p90_us": pd.Series([_disc(0.9)], dtype="int64")})


ORACLE["first_response_quantiles"] = f"""
    WITH t AS ({_TRANSCRIPTS_SQL}),
    c AS (
        SELECT conv_id,
               MIN(CASE WHEN role = 'user'
                        THEN epoch_us(ts) END) AS first_u,
               MIN(CASE WHEN role = 'assistant'
                        THEN epoch_us(ts) END) AS first_a
        FROM t GROUP BY 1
    ),
    l AS (SELECT first_a - first_u AS lat_us FROM c
          WHERE first_u IS NOT NULL AND first_a IS NOT NULL
            AND first_a > first_u)
    SELECT COUNT(*)::BIGINT AS n_convs,
           PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY lat_us)::BIGINT
               AS p50_us,
           PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY lat_us)::BIGINT
               AS p90_us
    FROM l
"""
QUERIES["first_response_quantiles"] = q_first_response_quantiles


def q_user_first_path_census(sf_dir: str) -> pd.DataFrame:
    """FIRST-PATH DISCOVERY census: the top-20 opening event-type paths
    (each user's first up-to-3 events in (ts, event_id) order, joined
    with '>') — the onboarding-funnel discovery companion to
    funnel_subsequence's fixed pattern. Distributed shape: grouped
    top-k at k=3 via grouped_topk's ONE sort exchange (ascending order
    smuggled as DESC of the negated int64 timestamp); the surviving
    ≤3·|users| rows assemble paths and census on the driver (the
    conv-census bound); top-20 under the deterministic (n DESC, path)
    tie-break both sides share."""
    from ..stages.fast_ops import grouped_topk

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def _neg(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "neg_us": pc.negate(us),
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    top = grouped_topk(
        ds.map_batches(_neg, batch_format="pyarrow", batch_size=131072),
        ["user_id"], "neg_us", 3, payload_cols=["event_type"],
        tie_cols=["event_id"]).to_pandas()
    top = top.sort_values(["user_id", "neg_us", "event_id"],
                          ascending=[True, False, True])
    paths = (top.groupby("user_id")["event_type"]
             .agg(lambda s: ">".join(s)).rename("path").reset_index())
    census = (paths.groupby("path", as_index=False).size()
              .rename(columns={"size": "n_users"}))
    census["n_users"] = census["n_users"].astype("int64")
    return (census.sort_values(["n_users", "path"],
                               ascending=[False, True]).head(20)
            .reset_index(drop=True)[["path", "n_users"]])


ORACLE["user_first_path_census"] = """
    WITH e AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id,
               STRING_AGG(event_type, '>' ORDER BY rn) AS path
        FROM e WHERE rn <= 3 GROUP BY 1
    )
    SELECT path, COUNT(*)::BIGINT AS n_users
    FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20
"""
QUERIES["user_first_path_census"] = q_user_first_path_census


def q_cohort_ltv_curve(sf_dir: str) -> pd.DataFrame:
    """COHORT LTV CURVES: cumulative purchase revenue per (first-seen
    week cohort, weeks-since-first-seen offset) — the retention
    triangle's revenue twin, the curve a data-mixing decision reads
    before upweighting a cohort. Distributed shape: ONE
    first_value_within exchange stamps every event with its user's
    first timestamp (no user-dim join, the user_retention pattern);
    purchases fold to per-block (cohort_week, offset, cents) partials;
    the bounded weeks×offsets census prefixes on the driver. Exact
    cents throughout; one division at display."""
    from ..stages.window import first_value_within

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def _us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "us": us,
                         "event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value": t["value"]})

    stamped = first_value_within(
        ds.map_batches(_us, batch_format="pyarrow", batch_size=131072),
        "user_id", ["us", "event_id"], "us", out_col="first_us")

    day_us = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["event_type"], pa.scalar("purchase")),
                       pc.is_valid(t["value"]))
        sub = t.filter(keep)
        if sub.num_rows == 0:
            return pa.table({"cohort_day": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        first_day = (sub["first_us"].to_numpy(zero_copy_only=False)
                     // day_us)
        ev_day = sub["us"].to_numpy(zero_copy_only=False) // day_us
        # cohort = Monday of the first-seen week (epoch day 0 = Thu;
        # +3 aligns Monday to multiples of 7, matching date_trunc week)
        cohort = (first_day + 3) // 7 * 7 - 3
        off = (ev_day - cohort) // 7
        cents = pc.cast(pc.round(pc.multiply(sub["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"cohort_day": cohort, "week_offset": off,
                           "cents": cents})
        g = df.groupby(["cohort_day", "week_offset"],
                       as_index=False)["cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = stamped.map_batches(_partial, batch_format="pyarrow",
                                batch_size=131072).to_pandas()
    census = (parts.groupby(["cohort_day", "week_offset"],
                            as_index=False)["cents"].sum()
              .sort_values(["cohort_day", "week_offset"])
              .reset_index(drop=True))
    census["cum_cents"] = census.groupby("cohort_day")["cents"].cumsum()
    out = pd.DataFrame({
        "cohort_week": (census["cohort_day"].to_numpy(np.int64) * day_us)
        .astype("datetime64[us]"),
        "week_offset": census["week_offset"].astype("int64"),
        "revenue": (census["cents"].to_numpy(np.int64) / 100.0).round(2),
        "cum_revenue": (census["cum_cents"].to_numpy(np.int64)
                        / 100.0).round(2)})
    return out.reset_index(drop=True)


ORACLE["cohort_ltv_curve"] = """
    WITH f AS (
        SELECT user_id, ts, event_type, value,
               FIRST_VALUE(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS first_ts
        FROM events
    ),
    p AS (
        SELECT date_trunc('week', first_ts) AS cohort_week,
               (datediff('day', date_trunc('week', first_ts),
                         date_trunc('day', ts))) // 7 AS week_offset,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM f WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    g AS (SELECT cohort_week, week_offset, SUM(cents)::BIGINT AS cents
          FROM p GROUP BY 1, 2)
    SELECT cohort_week, week_offset,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(SUM(cents) OVER (PARTITION BY cohort_week
                                  ORDER BY week_offset) / 100.0, 2)
               AS cum_revenue
    FROM g ORDER BY 1, 2
"""
QUERIES["cohort_ltv_curve"] = q_cohort_ltv_curve


def q_conv_role_ratio_hist(sf_dir: str) -> pd.DataFrame:
    """CONVERSATION BALANCE census: histogram of the per-conversation
    assistant-to-user turn ratio in exact integer decile buckets
    (⌊10·n_assistant/n_user⌋, capped at 10) — the corpus-shape check
    that catches assistant-dominated or user-spam conversations before
    training. Distributed shape: per-conv conditional role counts
    through ONE grouped exchange; the bucket census folds per-block
    partials (≤12 buckets). All-integer — no float ratio anywhere."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        r = _role_code_batch(t)
        u = pc.cast(pc.equal(r["code"], pa.scalar(0, pa.int64())),
                    pa.int64())
        a = pc.cast(pc.equal(r["code"], pa.scalar(2, pa.int64())),
                    pa.int64())
        return pa.table({"user_id": t["user_id"], "u": u, "a": a})

    gi, ge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("u", "sum", "n_user"), ("a", "sum", "n_asst")])
    conv = gi.to_pandas()
    if ge is not None and ge.num_rows:
        conv = pd.concat([conv, ge.to_pandas()], ignore_index=True)
    conv = conv[conv["n_user"] > 0]
    bucket = np.minimum(10 * conv["n_asst"].to_numpy(np.int64)
                        // conv["n_user"].to_numpy(np.int64), 10)
    out = (pd.DataFrame({"ratio_decile": bucket})
           .groupby("ratio_decile", as_index=False).size()
           .rename(columns={"size": "n_convs"}))
    out["ratio_decile"] = out["ratio_decile"].astype("int64")
    out["n_convs"] = out["n_convs"].astype("int64")
    return out.sort_values("ratio_decile").reset_index(drop=True)


ORACLE["conv_role_ratio_hist"] = f"""
    WITH t AS ({_TRANSCRIPTS_SQL}),
    c AS (
        SELECT conv_id,
               SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
               SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                   AS n_asst
        FROM t GROUP BY 1
    )
    SELECT LEAST(10 * n_asst // n_user, 10)::BIGINT AS ratio_decile,
           COUNT(*)::BIGINT AS n_convs
    FROM c WHERE n_user > 0
    GROUP BY 1 ORDER BY 1
"""
QUERIES["conv_role_ratio_hist"] = q_conv_role_ratio_hist


def q_linenumber_gap_census(sf_dir: str) -> pd.DataFrame:
    """LINE-NUMBERING INTEGRITY: orders whose lineitem count disagrees
    with their max l_linenumber (deleted/duplicated lines leave gaps or
    overlaps in the 1..n numbering) — the intra-table sibling of
    order_reconciliation's cross-table check, with materialized
    violation rows. Distributed shape: ONE grouped exchange folds each
    order to (count, max_linenumber, distinct via min); the violation
    filter runs in map tasks; a one-row census summarizes. All-integer."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    gi, ge = sorted_groupby(
        ds, ["l_orderkey"],
        [(None, "count_all", "n_lines"),
         ("l_linenumber", "max", "max_ln"),
         ("l_linenumber", "min", "min_ln")])

    def _viol(t: pa.Table) -> pa.Table:
        bad = pc.or_(pc.not_equal(t["n_lines"], t["max_ln"]),
                     pc.not_equal(t["min_ln"], pa.scalar(1, pa.int64())))
        return t.filter(bad)

    out = gi.map_batches(_viol, batch_format="pyarrow",
                         batch_size=131072).to_pandas()
    if ge is not None and ge.num_rows:
        out = pd.concat([out, _viol(ge).to_pandas()], ignore_index=True)
    for c in ["l_orderkey", "n_lines", "max_ln", "min_ln"]:
        out[c] = out[c].astype("int64")
    return (out[["l_orderkey", "n_lines", "min_ln", "max_ln"]]
            .sort_values("l_orderkey").reset_index(drop=True))


ORACLE["linenumber_gap_census"] = """
    SELECT l_orderkey, COUNT(*)::BIGINT AS n_lines,
           MIN(l_linenumber)::BIGINT AS min_ln,
           MAX(l_linenumber)::BIGINT AS max_ln
    FROM lineitem GROUP BY 1
    HAVING COUNT(*) <> MAX(l_linenumber) OR MIN(l_linenumber) <> 1
    ORDER BY 1
"""
QUERIES["linenumber_gap_census"] = q_linenumber_gap_census


def q_part_degree_distribution(sf_dir: str) -> pd.DataFrame:
    """DEGREE DISTRIBUTION of the part co-purchase graph with a log-log
    OLS slope — the scale-free-ness diagnostic that says whether
    part_pagerank's graph has hubs (slope steepness) before anyone
    trusts centrality on it. Distributed shape: the pagerank edge
    pipeline (distinct (order, part) exchange → pair_cooccurrence sort
    exchange) feeds per-block node-degree partials; the (degree,
    n_nodes) census and the word_zipf_slope-style OLS fold run on the
    reduced table. Slope floats are single expressions over exact int
    census cells, mirrored by the twin."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_partkey"],
                            [(None, "count_all", "_n")])
    pairs = di.select_columns(["l_orderkey", "l_partkey"])
    if de is not None and de.num_rows:
        pairs = pairs.union(
            rd.from_arrow(de.select(["l_orderkey", "l_partkey"])))
    ci, ce = pair_cooccurrence(pairs, "l_orderkey", "l_partkey")
    edges = ci.select_columns(["item_a", "item_b"])
    if ce is not None and ce.num_rows:
        edges = edges.union(rd.from_arrow(ce.select(["item_a", "item_b"])))

    def _deg(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False)
        b = t["item_b"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "d": pa.array(cnt.astype(np.int64))})

    degp = edges.map_batches(_deg, batch_format="pyarrow",
                             batch_size=131072).to_pandas()
    deg = degp.groupby("node")["d"].sum()
    census = (deg.rename("degree").reset_index()
              .groupby("degree", as_index=False).size()
              .rename(columns={"size": "n_nodes"})
              .sort_values("degree").reset_index(drop=True))
    lx = np.log(census["degree"].to_numpy(np.float64))
    ly = np.log(census["n_nodes"].to_numpy(np.float64))
    k = float(len(census))
    sx, sy = float(lx.sum()), float(ly.sum())
    sxx, sxy = float((lx * lx).sum()), float((lx * ly).sum())
    slope = ((k * sxy - sx * sy) / (k * sxx - sx * sx)
             if k > 1 and (k * sxx - sx * sx) != 0 else 0.0)
    census["degree"] = census["degree"].astype("int64")
    census["n_nodes"] = census["n_nodes"].astype("int64")
    census["loglog_slope"] = round(slope, 6)
    return census[["degree", "n_nodes", "loglog_slope"]]


ORACLE["part_degree_distribution"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    e2 AS (SELECT DISTINCT a.p AS src, b.p AS dst
           FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
    deg AS (SELECT src, COUNT(*)::BIGINT AS d FROM e2 GROUP BY 1),
    c AS (SELECT d AS degree, COUNT(*)::BIGINT AS n_nodes
          FROM deg GROUP BY 1),
    f AS (
        SELECT COUNT(*)::DOUBLE AS k, SUM(LN(degree)) AS sx,
               SUM(LN(n_nodes)) AS sy,
               SUM(LN(degree) * LN(degree)) AS sxx,
               SUM(LN(degree) * LN(n_nodes)) AS sxy
        FROM c
    )
    SELECT degree, n_nodes,
           ROUND(CASE WHEN k > 1 AND (k * sxx - sx * sx) <> 0
                      THEN (k * sxy - sx * sy) / (k * sxx - sx * sx)
                      ELSE 0.0 END, 6) AS loglog_slope
    FROM c, f ORDER BY degree
"""
QUERIES["part_degree_distribution"] = q_part_degree_distribution


def q_p90_gap_by_user(sf_dir: str) -> pd.DataFrame:
    """EXACT per-user P90 inter-event gap (PERCENTILE_DISC 0.9, lower
    discrete) — median_gap_by_user's tail sibling, the per-entity SLO
    tail a latency validation reads. Same grouped-selection shape: the
    gap multiset extracts through adjacent_gap_counts (one sort,
    in-block LAG-delta counts, O(blocks) boundary carry), then the
    weighted-selection machinery (running_sum + broadcast per-group
    totals) with the integer gate 10·cum ≥ 9·tot replacing the median's
    2·cum ≥ tot, and a grouped min picks the witness value. All-integer;
    no interpolation ambiguity on either side."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import adjacent_gap_counts, running_sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    inner, edge = adjacent_gap_counts(ds, "user_id", "ts", "event_id")
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))
    vc = vc.materialize()  # consumed twice: totals pass + running_sum

    ti, te = sorted_groupby(vc.select_columns(["user_id", "w"]),
                            ["user_id"], [("w", "sum", "tot")])
    tot = ti.to_pandas()
    if te is not None and te.num_rows:
        tot = pd.concat([tot, te.to_pandas()], ignore_index=True)
    tot = tot.sort_values("user_id")
    keys = tot["user_id"].to_numpy(dtype=np.int64)
    tots = tot["tot"].to_numpy(dtype=np.int64)

    cum = running_sum(vc, "user_id", ["gap_us"], "w", out_col="cum")

    def _gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "gap_us": pa.array([], pa.int64())})
        k = t["user_id"].to_numpy(zero_copy_only=False)
        tot_row = tots[np.searchsorted(keys, k)]
        keep = 10 * t["cum"].to_numpy(zero_copy_only=False) >= 9 * tot_row
        return t.filter(pa.array(keep)).select(["user_id", "gap_us"])

    gi, ge = sorted_groupby(
        cum.map_batches(_gate, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("gap_us", "min", "p90_gap_us")])
    out = gi.to_pandas()
    if ge is not None and ge.num_rows:
        out = pd.concat([out, ge.to_pandas()], ignore_index=True)
    out = out.merge(pd.DataFrame({"user_id": keys, "n_gaps": tots}),
                    on="user_id", how="left")
    out["p90_gap_us"] = out["p90_gap_us"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return (out[["user_id", "p90_gap_us", "n_gaps"]]
            .sort_values("user_id").reset_index(drop=True))


ORACLE["p90_gap_by_user"] = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    v AS (SELECT user_id, gap_us FROM g WHERE gap_us IS NOT NULL)
    SELECT user_id,
           PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY gap_us)::BIGINT
               AS p90_gap_us,
           COUNT(*)::BIGINT AS n_gaps
    FROM v GROUP BY 1 ORDER BY 1
"""
QUERIES["p90_gap_by_user"] = q_p90_gap_by_user


def q_emd_value_by_type(sf_dir: str) -> pd.DataFrame:
    """EXACT 1-WASSERSTEIN (earth-mover) DISTANCE between each event
    type's value distribution and the global value distribution — the
    drift metric that, unlike KS's sup-statistic, weights HOW FAR mass
    moved, and unlike PSI needs no binning choice. Distributed shape:
    per-block (event_type, cents) count partials fold in-block, then ONE
    skinny grouped exchange to the bounded (type x distinct-cents)
    census; the EMD fold runs on the driver over the reduced table. The
    arithmetic is exact to the last step: EMD = sum_i |F_t(v_i) -
    F_g(v_i)| * dv_i is evaluated as integer sum_i |cum_t*N - cum_g*n_t|
    * (v_{i+1}-v_i) (bounded by N*n_t*range < 2^53 at every SF), with
    ONE float division by n_t*N*100 at the end — the SQL twin carries
    the identical integer expression through HUGEINT sums, so the 6dp
    rounding can never disagree."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _census(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        v = pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0))),
                    pa.int64())
        g = pa.table({"t": t["event_type"], "v": v}).group_by(
            ["t", "v"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    inner, edge = sorted_groupby(
        ds.map_batches(_census, batch_format="pyarrow", batch_size=131072),
        ["t", "v"], [("cnt", "sum", "cnt")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    if c.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "emd": pd.Series([], dtype="float64")})
    c = c.sort_values(["t", "v"]).reset_index(drop=True)
    g = c.groupby("v")["cnt"].sum().sort_index()
    support = g.index.to_numpy(dtype=np.int64)
    cum_g = g.to_numpy(dtype=np.int64).cumsum()
    big_n = int(cum_g[-1])
    dv = np.diff(support)  # contribution span of each support point i<m
    rows = []
    for t, sub in c.groupby("t", sort=True):
        cnt_t = np.zeros(len(support), dtype=np.int64)
        cnt_t[np.searchsorted(support, sub["v"].to_numpy(np.int64))] = (
            sub["cnt"].to_numpy(np.int64))
        cum_t = cnt_t.cumsum()
        n_t = int(cum_t[-1])
        num = int((np.abs(cum_t[:-1] * big_n - cum_g[:-1] * n_t)
                   * dv).sum()) if len(support) > 1 else 0
        emd = round(float(num) / float(n_t * big_n * 100), 6)
        rows.append({"event_type": t, "n": n_t, "emd": emd})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out


ORACLE["emd_value_by_type"] = """
    WITH c AS (
        SELECT event_type AS t, CAST(ROUND(value * 100) AS BIGINT) AS v,
               COUNT(*)::BIGINT AS cnt
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (SELECT v, SUM(cnt)::BIGINT AS gcnt FROM c GROUP BY 1),
    tot AS (SELECT SUM(gcnt)::BIGINT AS n FROM g),
    gc AS (
        SELECT v, SUM(gcnt) OVER (ORDER BY v)::BIGINT AS cum_g,
               LEAD(v) OVER (ORDER BY v) AS nxt
        FROM g
    ),
    ty AS (SELECT t, SUM(cnt)::BIGINT AS n_t FROM c GROUP BY 1),
    p AS (
        SELECT grid.t, grid.n_t, grid.v, grid.cum_g, grid.nxt,
               SUM(COALESCE(c.cnt, 0)) OVER (
                   PARTITION BY grid.t ORDER BY grid.v)::BIGINT AS cum_t
        FROM (SELECT ty.t, ty.n_t, gc.v, gc.cum_g, gc.nxt
              FROM ty CROSS JOIN gc) grid
        LEFT JOIN c ON c.t = grid.t AND c.v = grid.v
    ),
    num AS (
        SELECT t, SUM(ABS(cum_t * (SELECT n FROM tot)
                          - cum_g * n_t) * (nxt - v)) AS s
        FROM p WHERE nxt IS NOT NULL GROUP BY 1
    )
    SELECT ty.t AS event_type, ty.n_t AS n,
           ROUND(CAST(COALESCE(num.s, 0) AS DOUBLE)
                 / CAST(ty.n_t * (SELECT n FROM tot) * 100 AS DOUBLE), 6)
               AS emd
    FROM ty LEFT JOIN num ON ty.t = num.t ORDER BY 1
"""
QUERIES["emd_value_by_type"] = q_emd_value_by_type


def q_t_closeness_census(sf_dir: str) -> pd.DataFrame:
    """T-CLOSENESS CENSUS — the third rung of the privacy-validation
    ladder after k_anonymity_census and l_diversity_census (same QI
    classes: order status x order year; sensitive attribute: order
    priority, ordinal under its '1-URGENT'..'5-LOW' prefix order). A
    class can be large AND diverse yet still leak if its sensitive
    distribution sits far from the table's: t-closeness bounds the
    ordered-EMD between the class and global distributions, normalized
    by (m-1) adjacent steps. Distributed shape: the SAME one-exchange
    (status, year, priority) census as l_diversity; the per-class EMD
    fold runs on the bounded grid at the driver. Exact to the last
    step: the 0.2 threshold gate is the INTEGER comparison 5*num >
    (m-1)*n_c*N (no float ever decides membership), and max_t is a
    max over single-division floats mirrored verbatim by the twin."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderdate", "o_orderpriority"])

    def _pre(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us"))),
                     pa.int64())
        g = pa.table({"st": t["o_orderstatus"], "yr": yr,
                      "sv": t["o_orderpriority"]}).group_by(
            ["st", "yr", "sv"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["st", "yr", "sv"], [("cnt", "sum", "cnt")])
    d = inner.to_pandas()
    if edge is not None and edge.num_rows:
        d = pd.concat([d, edge.to_pandas()], ignore_index=True)
    if d.empty:
        return pd.DataFrame({"n_groups": pd.Series([0], dtype="int64"),
                             "max_t": pd.Series([None], dtype="float64"),
                             "groups_above_t": pd.Series([0], dtype="int64"),
                             "rows_at_risk": pd.Series([0], dtype="int64")})
    d["cnt"] = d["cnt"].astype("int64")
    gl = d.groupby("sv")["cnt"].sum().sort_index()
    svs = list(gl.index)
    m = len(svs)
    cum_g = gl.to_numpy(dtype=np.int64).cumsum()
    big_n = int(cum_g[-1])
    max_t, n_groups, above, at_risk = 0.0, 0, 0, 0
    for (st, yr), sub in d.groupby(["st", "yr"], sort=True):
        cnt_c = np.zeros(m, dtype=np.int64)
        idx = pd.Index(svs).get_indexer(sub["sv"])
        cnt_c[idx] = sub["cnt"].to_numpy(np.int64)
        cum_c = cnt_c.cumsum()
        n_c = int(cum_c[-1])
        num = int(np.abs(cum_c[:-1] * big_n - cum_g[:-1] * n_c).sum())
        n_groups += 1
        if m > 1:
            t_val = float(num) / float((m - 1) * n_c * big_n)
            max_t = max(max_t, t_val)
            if 5 * num > (m - 1) * n_c * big_n:
                above += 1
                at_risk += n_c
    return pd.DataFrame({
        "n_groups": pd.Series([n_groups], dtype="int64"),
        "max_t": pd.Series([round(max_t, 6)], dtype="float64"),
        "groups_above_t": pd.Series([above], dtype="int64"),
        "rows_at_risk": pd.Series([at_risk], dtype="int64")})


ORACLE["t_closeness_census"] = """
    WITH d AS (
        SELECT o_orderstatus AS st, year(o_orderdate) AS yr,
               o_orderpriority AS sv, COUNT(*)::BIGINT AS cnt
        FROM orders GROUP BY 1, 2, 3
    ),
    g AS (SELECT sv, SUM(cnt)::BIGINT AS gcnt FROM d GROUP BY 1),
    mm AS (SELECT COUNT(*)::BIGINT AS m FROM g),
    tot AS (SELECT SUM(gcnt)::BIGINT AS n FROM g),
    gc AS (SELECT sv, SUM(gcnt) OVER (ORDER BY sv)::BIGINT AS cum_g,
                  ROW_NUMBER() OVER (ORDER BY sv) AS rn
           FROM g),
    cls AS (SELECT st, yr, SUM(cnt)::BIGINT AS n_c FROM d GROUP BY 1, 2),
    p AS (
        SELECT grid.st, grid.yr, grid.n_c, grid.cum_g, grid.rn,
               SUM(COALESCE(d.cnt, 0)) OVER (
                   PARTITION BY grid.st, grid.yr
                   ORDER BY grid.sv)::BIGINT AS cum_c
        FROM (SELECT cls.st, cls.yr, cls.n_c, gc.sv, gc.cum_g, gc.rn
              FROM cls CROSS JOIN gc) grid
        LEFT JOIN d ON d.st = grid.st AND d.yr = grid.yr
                   AND d.sv = grid.sv
    ),
    num AS (
        SELECT st, yr, n_c,
               COALESCE(SUM(CASE WHEN rn < (SELECT m FROM mm)
                   THEN ABS(cum_c * (SELECT n FROM tot) - cum_g * n_c)
                   ELSE 0 END), 0) AS num
        FROM p GROUP BY 1, 2, 3
    )
    SELECT COUNT(*)::BIGINT AS n_groups,
           ROUND(COALESCE(MAX(CASE WHEN (SELECT m FROM mm) > 1 THEN
               CAST(num AS DOUBLE)
               / CAST(((SELECT m FROM mm) - 1) * n_c
                      * (SELECT n FROM tot) AS DOUBLE) END), 0.0), 6)
               AS max_t,
           SUM(CASE WHEN (SELECT m FROM mm) > 1 AND 5 * num >
               ((SELECT m FROM mm) - 1) * n_c * (SELECT n FROM tot)
               THEN 1 ELSE 0 END)::BIGINT AS groups_above_t,
           SUM(CASE WHEN (SELECT m FROM mm) > 1 AND 5 * num >
               ((SELECT m FROM mm) - 1) * n_c * (SELECT n FROM tot)
               THEN n_c ELSE 0 END)::BIGINT AS rows_at_risk
    FROM num
"""
QUERIES["t_closeness_census"] = q_t_closeness_census


def q_kendall_tau_qty_disc_by_flag(sf_dir: str) -> pd.DataFrame:
    """KENDALL TAU-B of quantity vs discount per returnflag — the
    concordance-based rank correlation beside Spearman (same census,
    different statistic: tau counts pairwise order agreements, so it is
    the one reported for small ordinal domains and is robust to the
    midrank convention entirely). Distributed shape: the IDENTICAL
    zero-exchange (flag, qty, disc_cents) contingency scan as
    spearman_qty_disc_by_flag (<=1650 census rows); concordant /
    discordant / tie counts then fold on the driver via an O(cells^2)
    broadcast over the bounded census — pairs are NEVER enumerated
    row-wise (n^2 of the census side, not of the data). Exact int64
    throughout (C, D, and the tie corrections are integer); ONE final
    division mirrored verbatim by the twin's expression tree."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount"])

    def _census(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]), pa.int64())
        d = pc.cast(pc.round(pc.multiply(batch["l_discount"],
                                         pa.scalar(100.0))), pa.int64())
        t = pa.table({"f": batch["l_returnflag"], "q": q, "d": d})
        g = t.group_by(["f", "q", "d"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    census = parts.groupby(["f", "q", "d"], as_index=False)["cnt"].sum()
    rows = []
    for f, sub in census.groupby("f", sort=True):
        q = sub["q"].to_numpy(np.int64)
        d = sub["d"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        # pairwise cell comparison over the bounded census grid
        qa, qb = q[:, None], q[None, :]
        da, db = d[:, None], d[None, :]
        w = c[:, None] * c[None, :]
        conc = int(w[(qa < qb) & (da < db)].sum())
        disc = int(w[(qa < qb) & (da > db)].sum())
        n0 = n * (n - 1) // 2
        tq = sub.groupby("q")["cnt"].sum().to_numpy(np.int64)
        td = sub.groupby("d")["cnt"].sum().to_numpy(np.int64)
        n1 = int((tq * (tq - 1) // 2).sum())
        n2 = int((td * (td - 1) // 2).sum())
        den = float(n0 - n1) * float(n0 - n2)
        tau = (round(float(conc - disc) / np.sqrt(den), 6)
               if n0 > n1 and n0 > n2 else None)
        rows.append({"l_returnflag": f, "n": n, "tau_b": tau})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out


ORACLE["kendall_tau_qty_disc_by_flag"] = """
    WITH c AS (
        SELECT l_returnflag AS f, CAST(ROUND(l_quantity) AS BIGINT) AS q,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
               COUNT(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1, 2, 3
    ),
    cd AS (
        SELECT a.f,
               SUM(CASE WHEN a.q < b.q AND a.d < b.d
                   THEN a.cnt * b.cnt ELSE 0 END) AS conc,
               SUM(CASE WHEN a.q < b.q AND a.d > b.d
                   THEN a.cnt * b.cnt ELSE 0 END) AS disc
        FROM c a JOIN c b ON a.f = b.f GROUP BY 1
    ),
    nn AS (SELECT f, SUM(cnt)::BIGINT AS n FROM c GROUP BY 1),
    t1 AS (
        SELECT f, SUM(c2 * (c2 - 1) // 2) AS n1
        FROM (SELECT f, q, SUM(cnt)::BIGINT AS c2 FROM c GROUP BY 1, 2)
        GROUP BY 1
    ),
    t2 AS (
        SELECT f, SUM(c2 * (c2 - 1) // 2) AS n2
        FROM (SELECT f, d, SUM(cnt)::BIGINT AS c2 FROM c GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT nn.f AS l_returnflag, nn.n,
           ROUND(CAST(cd.conc - cd.disc AS DOUBLE)
                 / SQRT(CAST(nn.n * (nn.n - 1) // 2 - t1.n1 AS DOUBLE)
                        * CAST(nn.n * (nn.n - 1) // 2 - t2.n2 AS DOUBLE)),
                 6) AS tau_b
    FROM nn JOIN cd USING (f) JOIN t1 USING (f) JOIN t2 USING (f)
    ORDER BY 1
"""
QUERIES["kendall_tau_qty_disc_by_flag"] = q_kendall_tau_qty_disc_by_flag


def q_cliffs_delta_sources(sf_dir: str) -> pd.DataFrame:
    """CLIFF'S DELTA effect size between src0's and src1's document
    lengths — the nonparametric companion the two-sample suite was
    missing: KS answers "are they different", Mann-Whitney gives the
    test statistic, delta = (#(a>b) - #(a<b)) / (na*nb) says HOW LARGE
    the stochastic dominance is on [-1, 1]. Shares the ONE-exchange
    per-length (ca, cb) histogram with ks_two_sample_sources
    (_two_sample_length_hist); the dominance fold is exact int64 over
    cumulative counts on the bounded census (never pairwise over rows).
    ONE final division, mirrored by the twin."""
    hist, na, nb = _two_sample_length_hist(sf_dir)
    ca = hist["ca"].to_numpy(np.int64)
    cb = hist["cb"].to_numpy(np.int64)
    cumb = cb.cumsum()
    below = np.concatenate([[0], cumb[:-1]])  # b strictly below each x
    gt = int((ca * below).sum())              # pairs with a > b
    lt = int((ca * (nb - cumb)).sum())        # pairs with a < b
    delta = (round(float(gt - lt) / float(na * nb), 6)
             if na > 0 and nb > 0 else None)
    return pd.DataFrame({"delta": pd.Series([delta], dtype="float64"),
                         "n_a": pd.Series([na], dtype="int64"),
                         "n_b": pd.Series([nb], dtype="int64")})


ORACLE["cliffs_delta_sources"] = """
    WITH h AS (
        SELECT n_chars AS x,
               SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT
                   AS ca,
               SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT
                   AS cb
        FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1
    ),
    cd AS (
        SELECT SUM(CASE WHEN a.x > b.x THEN a.ca * b.cb ELSE 0 END) AS gt,
               SUM(CASE WHEN a.x < b.x THEN a.ca * b.cb ELSE 0 END) AS lt
        FROM h a CROSS JOIN h b
    ),
    nn AS (SELECT SUM(ca)::BIGINT AS na, SUM(cb)::BIGINT AS nb FROM h)
    SELECT ROUND(CAST(cd.gt - cd.lt AS DOUBLE)
                 / CAST(nn.na * nn.nb AS DOUBLE), 6) AS delta,
           nn.na AS n_a, nn.nb AS n_b
    FROM cd, nn
"""
QUERIES["cliffs_delta_sources"] = q_cliffs_delta_sources


_BM25_TERMS = ["hash", "join", "merge"]  # fixed 3-term query, term order


def q_bm25_docs(sf_dir: str) -> pd.DataFrame:
    """BM25 RELEVANCE SCORING of every document against a fixed 3-term
    query — the search-shaped text operator (Lucene-form idf, k1=1.2,
    b=0.75) a retrieval/quality pipeline runs to mine topical subsets
    from a corpus. Distributed shape: pass 1 is a ZERO-exchange
    map_batches folding 5-number partials (doc count, token count, and
    per-query-term distinct-doc frequencies) on the driver; pass 2
    re-streams documents with the broadcast (N, avgdl, idf) constants
    and computes per-doc scores vectorized (explode + groupby inside
    the block, never a Python row loop). No top-k cut — every matching
    doc is scored, so there is no rank-boundary float instability; the
    twin mirrors the per-term expression tree verbatim and sums the
    three pivoted contributions in the same fixed term order."""
    import math

    tok_re = r"[a-z']+"  # the word_freqs / source_ttr tokenizer convention

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    terms = _BM25_TERMS

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(tok_re)
        out = {"n_docs": [len(df)],
               "n_tokens": [int(toks.str.len().sum())]}
        for t in terms:
            out[f"df_{t}"] = [int(toks.apply(lambda l: t in l).sum())]
        return pd.DataFrame(out)

    st = (ds.map_batches(_stats, batch_format="pandas",
                         batch_size=65536).to_pandas().sum())
    big_n = int(st["n_docs"])
    avgdl = float(st["n_tokens"]) / float(big_n)
    idf = {t: math.log(1.0 + (big_n - int(st[f"df_{t}"]) + 0.5)
                       / (int(st[f"df_{t}"]) + 0.5)) for t in terms}

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(tok_re)
        dl = toks.str.len().to_numpy(np.int64)
        ex = pd.DataFrame({
            "i": np.arange(len(df)).repeat(dl),
            "tok": np.concatenate(
                [np.asarray(t, dtype=object) for t in toks])
            if len(toks) else np.array([], dtype=object)})
        ex = ex[ex["tok"].isin(terms)]
        tf = ex.groupby(["i", "tok"]).size().unstack(fill_value=0)
        score = np.zeros(len(df), np.float64)
        nt = np.zeros(len(df), np.int64)
        for t in terms:  # fixed term order = the twin's + order
            if t not in tf.columns:
                continue
            tfv = np.zeros(len(df), np.int64)
            tfv[tf.index.to_numpy()] = tf[t].to_numpy(np.int64)
            norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
            with np.errstate(invalid="ignore"):
                contrib = idf[t] * (tfv * 2.2) / (tfv + norm)
            score = score + np.where(tfv > 0, contrib, 0.0)
            nt += (tfv > 0).astype(np.int64)
        keep = nt > 0
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[keep],
                             "source": df["source"].to_numpy()[keep],
                             "n_terms": nt[keep],
                             "score": np.round(score[keep], 6)})

    out = (ds.map_batches(_score, batch_format="pandas",
                          batch_size=65536).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_terms"] = out["n_terms"].astype("int64")
    return out[["doc_id", "source", "n_terms", "score"]]


ORACLE["bm25_docs"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS tok
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY 1),
    st AS (
        SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n,
               (SELECT COUNT(*) FROM tok)::BIGINT AS tt
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM tok
        WHERE tok IN ('hash', 'join', 'merge') GROUP BY 1, 2
    ),
    df AS (
        SELECT tok, COUNT(DISTINCT doc_id)::BIGINT AS df FROM tok
        WHERE tok IN ('hash', 'join', 'merge') GROUP BY 1
    ),
    co AS (
        SELECT tf.doc_id, tf.tok, tf.tf, dl.dl,
               LN(1.0 + ((SELECT n FROM st) - df.df + 0.5)
                  / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                   / (CAST((SELECT tt FROM st) AS DOUBLE)
                      / CAST((SELECT n FROM st) AS DOUBLE)))))
                   AS contrib
        FROM tf JOIN dl USING (doc_id) JOIN df ON tf.tok = df.tok
    ),
    piv AS (
        SELECT doc_id,
               MAX(CASE WHEN tok = 'hash' THEN contrib END) AS c1,
               MAX(CASE WHEN tok = 'join' THEN contrib END) AS c2,
               MAX(CASE WHEN tok = 'merge' THEN contrib END) AS c3,
               COUNT(*)::BIGINT AS n_terms
        FROM co GROUP BY 1
    )
    SELECT p.doc_id, d.source, p.n_terms,
           ROUND(COALESCE(c1, 0) + COALESCE(c2, 0) + COALESCE(c3, 0), 6)
               AS score
    FROM piv p JOIN documents d USING (doc_id) ORDER BY p.doc_id
"""
QUERIES["bm25_docs"] = q_bm25_docs


def q_docs_all_terms_search(sf_dir: str) -> pd.DataFrame:
    """MULTI-TERM AND SEARCH census: per source, how many documents
    contain ALL THREE query terms ('join', 'hash', 'scan') — the
    inverted-index conjunctive query shape, evaluated streaming: each
    block tokenizes its docs once, tests membership of the 3-term set
    vectorized, and folds a (source, n_docs, n_matched) census; ONE
    driver fold over <=|sources| x blocks partials, zero exchanges.
    Integer-exact; zero-match sources still report their doc counts."""
    tok_re = r"[a-z']+"
    ds = _read(sf_dir, "documents", ["source", "text"])
    terms = ("join", "hash", "scan")

    def _census(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(tok_re)
        sets = toks.apply(set)
        hit = sets.apply(lambda s: all(t in s for t in terms))
        g = pd.DataFrame({"source": df["source"],
                          "m": hit.astype(np.int64)})
        out = g.groupby("source").agg(n_docs=("m", "size"),
                                      n_matched=("m", "sum"))
        return out.reset_index()

    parts = ds.map_batches(_census, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = (parts.groupby("source", as_index=False)[["n_docs", "n_matched"]]
           .sum().sort_values("source").reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_matched"] = out["n_matched"].astype("int64")
    return out


ORACLE["docs_all_terms_search"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS tok
        FROM documents
    ),
    hit AS (
        SELECT doc_id FROM tok WHERE tok IN ('join', 'hash', 'scan')
        GROUP BY 1 HAVING COUNT(DISTINCT tok) = 3
    )
    SELECT d.source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_matched
    FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
    GROUP BY 1 ORDER BY 1
"""
QUERIES["docs_all_terms_search"] = q_docs_all_terms_search


def _dup_span_gram_counts(sf_dir: str):
    """Shared exchange of the duplicate-span family: per-document
    DISTINCT strided 32-char grams (stride 8 — the winnowing-style
    subsample that keeps any >=39-char repeated span detectable while
    cutting exchange rows 8x vs every-position suffix grams), counted
    per gram through ONE grouped exchange. Because a document is one
    row (never split across blocks), per-doc set-dedup inside the block
    makes (gram, doc) pairs globally distinct, so a plain count per
    gram IS the distinct-document frequency — no second exchange.
    Returns the (g, n_docs) Dataset plus its edge table."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _grams(df: pd.DataFrame) -> pd.DataFrame:
        gs = []
        for txt in df["text"].fillna("").to_numpy():
            if len(txt) >= 32:
                gs.extend({txt[i:i + 32]
                           for i in range(0, len(txt) - 31, 8)})
        return pd.DataFrame({"g": np.array(gs, dtype=object),
                             "one": np.ones(len(gs), np.int64)})

    return sorted_groupby(
        ds.map_batches(_grams, batch_format="pandas", batch_size=65536),
        ["g"], [("one", "sum", "n_docs")])


_DUP_SPAN_GRAM_SQL = """
        SELECT DISTINCT doc_id, substring(text, i, 32) AS g
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, length(text) - 31, 8)) AS i
              FROM documents WHERE length(text) >= 32)
"""


def q_duplicate_spans_census(sf_dir: str) -> pd.DataFrame:
    """DUPLICATE-SPAN CENSUS — the exact-substring contamination
    profile (the Lee et al. "Deduplicating Training Data" shape): how
    many distinct 32-char strided grams occur in exactly k documents,
    for every k. A corpus with heavy boilerplate shows a fat k>=2 tail;
    dedup acceptance tests read this table before and after. One gram
    exchange (shared _dup_span_gram_counts), then a per-block
    (n_docs -> n_grams) census partial folds on the driver — the wide
    gram table never lands anywhere. All-integer."""
    import ray.data as rd

    inner, edge = _dup_span_gram_counts(sf_dir)
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))

    def _hist(t: pa.Table) -> pa.Table:
        g = t.select(["n_docs"]).group_by(
            ["n_docs"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n_grams"}.get(c, c) for c in g.column_names])

    parts = vc.map_batches(_hist, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    out = (parts.groupby("n_docs", as_index=False)["n_grams"].sum()
           .sort_values("n_docs").reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_grams"] = out["n_grams"].astype("int64")
    return out


ORACLE["duplicate_spans_census"] = f"""
    WITH gr AS ({_DUP_SPAN_GRAM_SQL}),
    c AS (SELECT g, COUNT(*)::BIGINT AS n_docs FROM gr GROUP BY 1)
    SELECT n_docs, COUNT(*)::BIGINT AS n_grams
    FROM c GROUP BY 1 ORDER BY 1
"""
QUERIES["duplicate_spans_census"] = q_duplicate_spans_census


def q_top_duplicate_spans(sf_dir: str) -> pd.DataFrame:
    """TOP DUPLICATE SPANS: the 10 strided 32-char grams shared by the
    most documents — the actionable witness list next to
    duplicate_spans_census (these are the boilerplate strings a dedup
    pass would strip). Same shared gram exchange; per-block top-10 by
    (n_docs DESC, gram ASC) partials, driver merges <=10 x blocks rows.
    Deterministic lexicographic tie-break on the gram string."""
    import ray.data as rd

    inner, edge = _dup_span_gram_counts(sf_dir)
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))

    def _topk(t: pa.Table) -> pa.Table:
        df = t.select(["g", "n_docs"]).to_pandas()
        df = df.sort_values(["n_docs", "g"],
                            ascending=[False, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = vc.map_batches(_topk, batch_format="pyarrow",
                           batch_size=262144).to_pandas()
    out = (parts.sort_values(["n_docs", "g"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.rename(columns={"g": "gram"})[["gram", "n_docs"]]


ORACLE["top_duplicate_spans"] = f"""
    WITH gr AS ({_DUP_SPAN_GRAM_SQL}),
    c AS (SELECT g, COUNT(*)::BIGINT AS n_docs FROM gr GROUP BY 1)
    SELECT g AS gram, n_docs FROM c
    ORDER BY n_docs DESC, g LIMIT 10
"""
QUERIES["top_duplicate_spans"] = q_top_duplicate_spans


def q_quantile_normalized_lengths(sf_dir: str) -> pd.DataFrame:
    """QUANTILE NORMALIZATION of document lengths across sources — the
    cross-source calibration step (map each source's value to the
    GLOBAL value at the same within-source quantile) that makes
    per-source features comparable before mixing; the ML-preprocessing
    classic, here with PERCENTILE_DISC (lower-discrete) semantics so
    every output is an integer from the global support. Distributed
    shape: ONE (source, n_chars) census exchange (bounded by sources x
    distinct lengths, never rows); the global census is its margin; the
    mapping fold is a vectorized searchsorted over the INTEGER gate
    cum_g(u) * n_s >= r_s(v) * N on the driver — no float ever decides
    a mapping. The twin evaluates the same gate as a correlated MIN."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _pre(t: pa.Table) -> pa.Table:
        g = t.select(["source", "n_chars"]).group_by(
            ["source", "n_chars"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["source", "n_chars"], [("cnt", "sum", "cnt")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    if c.empty:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "n_chars": pd.Series([], dtype="int64"),
                             "norm_chars": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    c = c.sort_values(["source", "n_chars"]).reset_index(drop=True)
    c["cnt"] = c["cnt"].astype("int64")
    g = c.groupby("n_chars")["cnt"].sum().sort_index()
    support = g.index.to_numpy(np.int64)
    cum_g = g.to_numpy(np.int64).cumsum()
    big_n = int(cum_g[-1])
    outs = []
    for s, sub in c.groupby("source", sort=True):
        r = sub["cnt"].to_numpy(np.int64).cumsum()
        n_s = int(r[-1])
        # first global support index with cum_g * n_s >= r * N
        idx = np.searchsorted(cum_g * n_s, r * big_n, side="left")
        outs.append(pd.DataFrame({
            "source": s, "n_chars": sub["n_chars"].to_numpy(np.int64),
            "norm_chars": support[idx],
            "n": sub["cnt"].to_numpy(np.int64)}))
    out = pd.concat(outs, ignore_index=True)
    for col in ("n_chars", "norm_chars", "n"):
        out[col] = out[col].astype("int64")
    return out


ORACLE["quantile_normalized_lengths"] = """
    WITH c AS (
        SELECT source AS s, n_chars AS v, COUNT(*)::BIGINT AS cnt
        FROM documents GROUP BY 1, 2
    ),
    sc AS (
        SELECT s, v, cnt,
               SUM(cnt) OVER (PARTITION BY s ORDER BY v)::BIGINT AS r
        FROM c
    ),
    ns AS (SELECT s, SUM(cnt)::BIGINT AS n_s FROM c GROUP BY 1),
    g AS (SELECT v, SUM(cnt)::BIGINT AS gcnt FROM c GROUP BY 1),
    gc AS (SELECT v, SUM(gcnt) OVER (ORDER BY v)::BIGINT AS cum FROM g),
    tot AS (SELECT SUM(gcnt)::BIGINT AS n FROM g)
    SELECT sc.s AS source, sc.v AS n_chars,
           (SELECT MIN(gc.v) FROM gc
            WHERE gc.cum * ns.n_s >= sc.r * (SELECT n FROM tot))
               AS norm_chars,
           sc.cnt AS n
    FROM sc JOIN ns USING (s) ORDER BY 1, 2
"""
QUERIES["quantile_normalized_lengths"] = q_quantile_normalized_lengths


def q_hapax_by_source(sf_dir: str) -> pd.DataFrame:
    """HAPAX LEGOMENA census per source: how much of each source's
    vocabulary occurs exactly once WITHIN the source — the
    lexical-tail diagnostic beside source_ttr (a template-generated
    source has almost no hapax; OCR noise inflates it). Same ONE
    (source, token) exchange as source_ttr (shared tokenizer
    convention); the hapax fold runs on the reduced census. One float
    division per source, mirrored by the twin."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["text", "source"])

    def _tok(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z']+")
        ex = pd.DataFrame({
            "source": df["source"].to_numpy().repeat(
                toks.str.len().to_numpy()),
            "token": np.concatenate(
                [np.asarray(t, dtype=object) for t in toks])
            if len(toks) else np.array([], dtype=object)})
        g = ex.groupby(["source", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    inner, edge = sorted_groupby(
        ds.map_batches(_tok, batch_format="pandas", batch_size=65536),
        ["source", "token"], [("n", "sum", "n")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    if c.empty:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "n_vocab": pd.Series([], dtype="int64"),
                             "n_hapax": pd.Series([], dtype="int64"),
                             "hapax_ratio": pd.Series([], dtype="float64")})
    c["hap"] = (c["n"] == 1).astype(np.int64)
    g = (c.groupby("source")
         .agg(n_vocab=("n", "size"), n_hapax=("hap", "sum"))
         .reset_index().sort_values("source").reset_index(drop=True))
    g["n_vocab"] = g["n_vocab"].astype("int64")
    g["n_hapax"] = g["n_hapax"].astype("int64")
    g["hapax_ratio"] = np.round(
        g["n_hapax"].to_numpy(np.float64) / g["n_vocab"].to_numpy(np.float64),
        6)
    return g[["source", "n_vocab", "n_hapax", "hapax_ratio"]]


ORACLE["hapax_by_source"] = """
    WITH w AS (
        SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS tok
        FROM documents
    ),
    c AS (SELECT source, tok, COUNT(*)::BIGINT AS n FROM w GROUP BY 1, 2),
    g AS (
        SELECT source, COUNT(*)::BIGINT AS n_vocab,
               SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        FROM c GROUP BY 1
    )
    SELECT source, n_vocab, n_hapax,
           ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_vocab AS DOUBLE), 6)
               AS hapax_ratio
    FROM g ORDER BY 1
"""
QUERIES["hapax_by_source"] = q_hapax_by_source


def q_bigram_pmi_census(sf_dir: str) -> pd.DataFrame:
    """POINTWISE MUTUAL INFORMATION of adjacent event-type bigrams
    within each user's stream — which follow-pairs are over- or
    under-represented vs independence (the sequence-association
    diagnostic next to role_transition_entropy's disorder measure).
    Distributed shape: stages.window.transition_counts' ONE sort
    exchange reduces to the <=|types|^2 bigram census with O(blocks)
    boundary stitch; margins and PMI fold on the bounded census at the
    driver. PMI = ln(n_xy * T / (n_x * n_y)) evaluated float-exactly in
    the twin's operation order (every operand < 2^53)."""
    import math

    from ..stages.window import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    inner, edge = transition_counts(
        ds.map_batches(_pre, batch_format="pyarrow"),
        "user_id", ["ts_us", "event_id"], "event_type",
        prev_name="prev_type", cur_name="event_type")
    out = inner.to_pandas()
    if edge is not None and edge.num_rows:
        out = pd.concat([out, edge.to_pandas()], ignore_index=True)
    out = (out.groupby(["prev_type", "event_type"], as_index=False)["n"]
           .sum())
    out["n"] = out["n"].astype("int64")
    total = int(out["n"].sum())
    nx = out.groupby("prev_type")["n"].sum()
    ny = out.groupby("event_type")["n"].sum()
    pmi = [round(math.log(float(n) * float(total)
                          / (float(nx[p]) * float(ny[c]))), 6)
           for p, c, n in out[["prev_type", "event_type", "n"]]
           .itertuples(index=False)]
    out["pmi"] = pd.Series(pmi, dtype="float64")
    return (out.sort_values(["prev_type", "event_type"])
            .reset_index(drop=True))


ORACLE["bigram_pmi_census"] = """
    WITH lagged AS (
        SELECT LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type,
               event_type
        FROM events
    ),
    c AS (
        SELECT prev_type, event_type, COUNT(*)::BIGINT AS n
        FROM lagged WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n)::BIGINT AS t FROM c),
    mx AS (SELECT prev_type, SUM(n)::BIGINT AS nx FROM c GROUP BY 1),
    my AS (SELECT event_type, SUM(n)::BIGINT AS ny FROM c GROUP BY 1)
    SELECT c.prev_type, c.event_type, c.n,
           ROUND(LN(CAST(c.n AS DOUBLE) * CAST((SELECT t FROM tot) AS DOUBLE)
                    / (CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE))), 6)
               AS pmi
    FROM c JOIN mx USING (prev_type) JOIN my USING (event_type)
    ORDER BY 1, 2
"""
QUERIES["bigram_pmi_census"] = q_bigram_pmi_census


def q_anova_lengths_by_source(sf_dir: str) -> pd.DataFrame:
    """ONE-WAY ANOVA F-statistic of document length across ALL sources
    — the k-group generalization of welch_t_sources (that one compares
    two sources; a drift monitor over twenty needs the omnibus test).
    Distributed shape: per-block (source, n, sum, sum_sq) int64 partials
    fold through ONE skinny grouped exchange (lengths are integers, so
    every moment is exact); SSB/SSW derive from the merged per-group
    moments on the driver in the twin's exact expression order:
    F = (SSB / (k-1)) / (SSW / (N-k)) with SSB = sum(s_i^2/n_i) - S^2/N
    evaluated in DOUBLE — every integer operand < 2^53 at any SF here,
    and the division sequence is mirrored verbatim."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _pre(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        g = pa.table({"source": t["source"], "n": pa.array(
            np.ones(t.num_rows, np.int64)), "s": x,
            "ss": pc.multiply(x, x)}).group_by(
            ["source"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(
            [{"n_sum": "n", "s_sum": "s", "ss_sum": "ss"}.get(c, c)
             for c in g.column_names])

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["source"], [("n", "sum", "n"), ("s", "sum", "s"),
                     ("ss", "sum", "ss")])
    g = inner.to_pandas()
    if edge is not None and edge.num_rows:
        g = pd.concat([g, edge.to_pandas()], ignore_index=True)
    g = g.groupby("source", as_index=False)[["n", "s", "ss"]].sum()
    k = len(g)
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    ss_tot = int(g["ss"].sum())
    sb = float(sum(float(si * si) / float(ni)
                   for si, ni in zip(g["s"].astype(int), g["n"].astype(int))))
    ssb = sb - float(s_tot * s_tot) / float(n_tot)
    ssw = float(ss_tot) - sb
    f = (round((ssb / float(k - 1)) / (ssw / float(n_tot - k)), 6)
         if k > 1 and n_tot > k and ssw > 0 else None)
    return pd.DataFrame({"f_stat": pd.Series([f], dtype="float64"),
                         "k": pd.Series([k], dtype="int64"),
                         "n": pd.Series([n_tot], dtype="int64")})


ORACLE["anova_lengths_by_source"] = """
    WITH g AS (
        SELECT source, COUNT(*)::BIGINT AS n,
               SUM(n_chars)::BIGINT AS s,
               SUM(n_chars * n_chars)::BIGINT AS ss
        FROM documents GROUP BY 1
    ),
    agg AS (
        SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS n_tot,
               SUM(s)::BIGINT AS s_tot, SUM(ss)::BIGINT AS ss_tot,
               SUM(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) AS sb
        FROM g
    )
    SELECT ROUND((sb - CAST(s_tot * s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                 / CAST(k - 1 AS DOUBLE)
                 / ((CAST(ss_tot AS DOUBLE) - sb)
                    / CAST(n_tot - k AS DOUBLE)), 6) AS f_stat,
           k, n_tot AS n
    FROM agg
"""
QUERIES["anova_lengths_by_source"] = q_anova_lengths_by_source


def q_kruskal_wallis_lengths(sf_dir: str) -> pd.DataFrame:
    """KRUSKAL–WALLIS H across ALL sources' document lengths — the
    rank-based omnibus companion to anova_lengths_by_source (robust to
    the heavy right tail real corpora have), with the tie-corrected
    statistic. Distributed shape: ONE (source, length) census exchange
    (bounded by sources x distinct lengths); the rank fold uses DOUBLED
    midranks so every per-group rank sum R2_i = sum cnt*(2*base+c+1) is
    EXACT int64 (the mannwhitney_sources discipline, k groups instead
    of 2), and the tie term sum(t^3-t) is exact too. H and its
    correction are evaluated in the twin's expression order with every
    integer operand < 2^53."""
    from ..stages.fast_ops import sorted_groupby

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _pre(t: pa.Table) -> pa.Table:
        g = t.select(["source", "n_chars"]).group_by(
            ["source", "n_chars"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["source", "n_chars"], [("cnt", "sum", "cnt")])
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    c = c.groupby(["source", "n_chars"], as_index=False)["cnt"].sum()
    c["cnt"] = c["cnt"].astype("int64")
    g = c.groupby("n_chars")["cnt"].sum().sort_index()
    support = g.index.to_numpy(np.int64)
    c2 = g.to_numpy(np.int64)
    base = np.concatenate([[0], c2.cumsum()[:-1]])
    r2v = 2 * base + c2 + 1  # doubled midrank of each distinct length
    big_n = int(c2.sum())
    k = c["source"].nunique()
    pos = np.searchsorted(support, c["n_chars"].to_numpy(np.int64))
    c["r2c"] = c["cnt"].to_numpy(np.int64) * r2v[pos]
    per = c.groupby("source").agg(ni=("cnt", "sum"),
                                  r2=("r2c", "sum")).reset_index()
    sum_term = float(sum(float(r2 * r2) / float(ni)
                         for r2, ni in zip(per["r2"].astype(int),
                                           per["ni"].astype(int))))
    tsum = int((c2.astype(object) ** 3 - c2.astype(object)).sum())
    h = None
    if k > 1 and big_n > 2:
        h = (12.0 / float(big_n * (big_n + 1)) * (sum_term / 4.0)
             - 3.0 * float(big_n + 1))
        denom = 1.0 - float(tsum) / float(big_n ** 3 - big_n)
        h = round(h / denom, 6) if denom > 0 else None
    return pd.DataFrame({"h_stat": pd.Series([h], dtype="float64"),
                         "k": pd.Series([k], dtype="int64"),
                         "n": pd.Series([big_n], dtype="int64")})


ORACLE["kruskal_wallis_lengths"] = """
    WITH c AS (
        SELECT source, n_chars AS v, COUNT(*)::BIGINT AS cnt
        FROM documents GROUP BY 1, 2
    ),
    g AS (SELECT v, SUM(cnt)::BIGINT AS c2 FROM c GROUP BY 1),
    gr AS (
        SELECT v, 2 * (SUM(c2) OVER (ORDER BY v) - c2) + c2 + 1 AS r2v
        FROM g
    ),
    per AS (
        SELECT c.source, SUM(c.cnt)::BIGINT AS ni,
               SUM(c.cnt * gr.r2v)::BIGINT AS r2
        FROM c JOIN gr ON c.v = gr.v GROUP BY 1
    ),
    tot AS (
        SELECT SUM(c2)::BIGINT AS n,
               SUM(c2 * c2 * c2 - c2)::BIGINT AS tsum
        FROM g
    ),
    agg AS (
        SELECT COUNT(*)::BIGINT AS k,
               SUM(CAST(r2 * r2 AS DOUBLE) / CAST(ni AS DOUBLE))
                   AS sum_term
        FROM per
    )
    SELECT ROUND((12.0 / CAST(tot.n * (tot.n + 1) AS DOUBLE)
                  * (agg.sum_term / 4.0)
                  - 3.0 * CAST(tot.n + 1 AS DOUBLE))
                 / (1.0 - CAST(tot.tsum AS DOUBLE)
                    / CAST(tot.n * tot.n * tot.n - tot.n AS DOUBLE)), 6)
               AS h_stat,
           agg.k, tot.n AS n
    FROM tot, agg
"""
QUERIES["kruskal_wallis_lengths"] = q_kruskal_wallis_lengths


def q_part_bfs_layers(sf_dir: str) -> pd.DataFrame:
    """BFS HOP-DISTANCE CENSUS from the smallest part key over the part
    co-purchase graph: how many parts sit at each shortest-path
    distance from the seed — the reachability/diameter diagnostic
    beside part_pagerank's centrality and part_graph_triangles' local
    density. Distributed shape: the SAME distinct->pair_cooccurrence
    edge build (two exchanges), edges materialized once; each BFS round
    is a ZERO-exchange map_batches pass over the edge blocks with the
    broadcast frontier bitmap (ray.put once per round), per-block
    newly-reached index sets folded on the driver. Rounds = graph
    diameter (bounded 30, matching the twin's recursion guard).
    All-integer output; unreachable parts are absent on both sides."""
    import ray
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import pair_cooccurrence

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    di, de = sorted_groupby(ds, ["l_orderkey", "l_partkey"],
                            [(None, "count_all", "_n")])
    pairs = di.select_columns(["l_orderkey", "l_partkey"])
    if de is not None and de.num_rows:
        pairs = pairs.union(
            rd.from_arrow(de.select(["l_orderkey", "l_partkey"])))
    ci, ce = pair_cooccurrence(pairs, "l_orderkey", "l_partkey")
    edges = ci.select_columns(["item_a", "item_b"])
    if ce is not None and ce.num_rows:
        edges = edges.union(rd.from_arrow(ce.select(["item_a", "item_b"])))
    edges = edges.materialize()  # consumed once per BFS round

    def _nodes(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False)
        b = t["item_b"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([a, b])), pa.int64())})

    np_parts = edges.map_batches(_nodes, batch_format="pyarrow",
                                 batch_size=131072).to_pandas()
    if np_parts.empty:
        return pd.DataFrame({"hop": pd.Series([], dtype="int64"),
                             "n_nodes": pd.Series([], dtype="int64")})
    nodes = np.unique(np_parts["node"].to_numpy(np.int64))
    node_ref = ray.put(nodes)
    dist = np.full(len(nodes), -1, np.int64)
    dist[0] = 0  # seed = smallest part key in the edge set
    frontier = np.zeros(len(nodes), bool)
    frontier[0] = True
    hop = 0
    while frontier.any() and hop < 30:
        fref = ray.put(frontier)

        def _expand(t: pa.Table, fref=fref) -> pa.Table:
            nv = ray.get(node_ref)
            fv = ray.get(fref)
            a = np.searchsorted(nv, t["item_a"].to_numpy(
                zero_copy_only=False))
            b = np.searchsorted(nv, t["item_b"].to_numpy(
                zero_copy_only=False))
            reached = np.unique(np.concatenate([b[fv[a]], a[fv[b]]]))
            return pa.table({"i": pa.array(reached, pa.int64())})

        parts = edges.map_batches(_expand, batch_format="pyarrow",
                                  batch_size=131072).to_pandas()
        reached = np.unique(parts["i"].to_numpy(np.int64)) if len(parts) \
            else np.array([], np.int64)
        new = reached[dist[reached] < 0] if len(reached) else reached
        frontier = np.zeros(len(nodes), bool)
        if len(new) == 0:
            break
        hop += 1
        dist[new] = hop
        frontier[new] = True
    seen = dist >= 0
    hops, cnts = np.unique(dist[seen], return_counts=True)
    return pd.DataFrame({"hop": pd.Series(hops, dtype="int64"),
                         "n_nodes": pd.Series(cnts, dtype="int64")})


ORACLE["part_bfs_layers"] = """
    WITH RECURSIVE
    op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e2 AS (SELECT DISTINCT a.p AS src, b.p AS dst
           FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
    seed AS (SELECT MIN(src) AS s FROM e2),
    bfs(node, hop) AS (
        SELECT s, 0 FROM seed
        UNION
        SELECT e2.dst, b.hop + 1
        FROM bfs b JOIN e2 ON e2.src = b.node WHERE b.hop < 30
    ),
    mh AS (SELECT node, MIN(hop)::BIGINT AS hop FROM bfs GROUP BY 1)
    SELECT hop, COUNT(*)::BIGINT AS n_nodes
    FROM mh GROUP BY 1 ORDER BY 1
"""
QUERIES["part_bfs_layers"] = q_part_bfs_layers


def q_event_type_stationary(sf_dir: str) -> pd.DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain — where
    a user's session settles in the long run, the model-based summary
    on top of bigram counts (role_transitions gives the raw matrix;
    this gives its fixed point, damped like part_pagerank so reducible
    chains still converge). Distributed shape: transition_counts' ONE
    sort exchange reduces the stream to the <=|types|^2 bigram census;
    the 10 damped power iterations run on that bounded matrix at the
    driver — no further exchange. The twin runs the identical
    fixed-iteration recursion as a recursive CTE; both sides start
    uniform and round to 6dp after iteration 10."""
    from ..stages.window import transition_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _pre(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts_us": us,
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    inner, edge = transition_counts(
        ds.map_batches(_pre, batch_format="pyarrow"),
        "user_id", ["ts_us", "event_id"], "event_type",
        prev_name="src", cur_name="dst")
    c = inner.to_pandas()
    if edge is not None and edge.num_rows:
        c = pd.concat([c, edge.to_pandas()], ignore_index=True)
    c = c.groupby(["src", "dst"], as_index=False)["n"].sum()
    if c.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "stationary": pd.Series([], dtype="float64")})
    types = sorted(set(c["src"]) | set(c["dst"]))
    k = len(types)
    idx = {t: i for i, t in enumerate(types)}
    row_tot = c.groupby("src")["n"].sum()
    p = np.zeros((k, k), np.float64)
    for s, d, n in c.itertuples(index=False):
        p[idx[s], idx[d]] = float(n) / float(int(row_tot[s]))
    r = np.full(k, 1.0 / k)
    for _ in range(10):
        r = 0.15 / k + 0.85 * (r @ p)
    return pd.DataFrame({"event_type": types,
                         "stationary": np.round(r, 6)})


ORACLE["event_type_stationary"] = """
    WITH RECURSIVE
    lagged AS (
        SELECT LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS src,
               event_type AS dst
        FROM events
    ),
    c AS (SELECT src, dst, COUNT(*)::BIGINT AS n FROM lagged
          WHERE src IS NOT NULL GROUP BY 1, 2),
    ty AS (SELECT DISTINCT t FROM (SELECT src AS t FROM c
                                   UNION ALL SELECT dst FROM c)),
    kk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM ty),
    rt AS (SELECT src, SUM(n)::BIGINT AS tot FROM c GROUP BY 1),
    pr(iter, t, r) AS (
        SELECT 0, t, 1.0 / (SELECT k FROM kk) FROM ty
        UNION ALL
        SELECT p.iter + 1, ty.t,
               0.15 / (SELECT k FROM kk)
               + 0.85 * COALESCE(SUM(p.r * (CAST(c.n AS DOUBLE)
                                            / CAST(rt.tot AS DOUBLE))), 0)
        FROM pr p
        CROSS JOIN ty
        LEFT JOIN c ON c.src = p.t AND c.dst = ty.t
        LEFT JOIN rt ON rt.src = p.t
        WHERE p.iter < 10
        GROUP BY p.iter, ty.t
    )
    SELECT t AS event_type, ROUND(r, 6) AS stationary
    FROM pr WHERE iter = 10 ORDER BY 1
"""
QUERIES["event_type_stationary"] = q_event_type_stationary


def q_burstiness_by_user(sf_dir: str) -> pd.DataFrame:
    """BURSTINESS INDEX (Goh–Barabási B = (sigma-mu)/(sigma+mu)) of
    each user's inter-event gaps at second granularity — the
    arrival-process shape diagnostic between gap_expfit_ks's global
    goodness-of-fit and user_gap_stats' raw moments: B ~ -1 for
    clockwork bots, ~0 for Poisson users, -> +1 for bursty humans.
    Distributed shape: adjacent_gap_counts' ONE sort exchange to the
    per-(user, gap) census, a second skinny exchange folds exact int64
    (n, sum, sum_sq) per user; B is evaluated from the EXACT integer
    variance numerator as (sqrt(n*ss - s*s) - s) / (sqrt(n*ss - s*s)
    + s) — algebraically (sigma-mu)/(sigma+mu) with every pre-sqrt
    operand an exact integer on both sides."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import adjacent_gap_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    inner, edge = adjacent_gap_counts(ds, "user_id", "ts", "event_id")
    vc = inner
    if edge is not None and edge.num_rows:
        vc = vc.union(rd.from_arrow(edge))

    def _mom(t: pa.Table) -> pa.Table:
        g = pc.cast(pc.divide(t["gap_us"], pa.scalar(1_000_000,
                                                     pa.int64())),
                    pa.int64())
        w = t["w"]
        return pa.table({"user_id": t["user_id"], "n": w,
                         "s": pc.multiply(w, g),
                         "ss": pc.multiply(pc.multiply(w, g), g)})

    gi, ge = sorted_groupby(
        vc.map_batches(_mom, batch_format="pyarrow", batch_size=131072),
        ["user_id"], [("n", "sum", "n"), ("s", "sum", "s"),
                      ("ss", "sum", "ss")])
    m = gi.to_pandas()
    if ge is not None and ge.num_rows:
        m = pd.concat([m, ge.to_pandas()], ignore_index=True)
    m = m.groupby("user_id", as_index=False)[["n", "s", "ss"]].sum()
    m = m[(m["n"] >= 2) & (m["s"] > 0)].reset_index(drop=True)
    b = []
    for n, s, ss in m[["n", "s", "ss"]].astype(int).itertuples(index=False):
        root = np.sqrt(float(n * ss - s * s))
        b.append(round((root - float(s)) / (root + float(s)), 6))
    out = pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                        "n_gaps": m["n"].astype("int64"),
                        "burstiness": pd.Series(b, dtype="float64")})
    return out.sort_values("user_id").reset_index(drop=True)


ORACLE["burstiness_by_user"] = """
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))
               // 1000000 AS gap_s
        FROM events
    ),
    m AS (
        SELECT user_id, COUNT(*)::BIGINT AS n, SUM(gap_s)::BIGINT AS s,
               SUM(gap_s * gap_s)::BIGINT AS ss
        FROM g WHERE gap_s IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n AS n_gaps,
           ROUND((SQRT(CAST(n * ss - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
                 / (SQRT(CAST(n * ss - s * s AS DOUBLE))
                    + CAST(s AS DOUBLE)), 6) AS burstiness
    FROM m WHERE n >= 2 AND s > 0 ORDER BY 1
"""
QUERIES["burstiness_by_user"] = q_burstiness_by_user


def q_trimmed_mean_qty_by_flag(sf_dir: str) -> pd.DataFrame:
    """5%-TRIMMED MEAN of quantity per returnflag — the robust location
    estimate that DROPS the k = floor(n/20) smallest and largest values
    (winsorized_price_mean's sibling, which clamps instead). The
    discrete domain makes it census-shaped: ONE zero-exchange
    contingency scan to the <=|flags| x 50 quantity census, then an
    exact integer fold — per-cell trim overlap is LEAST(cnt,
    GREATEST(0, k - below)) on each side, the trimmed sum stays int64,
    and ONE division finishes. Twin mirrors with window cumulative
    counts."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _census(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        g = pa.table({"f": t["l_returnflag"], "q": q}).group_by(
            ["f", "q"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    census = parts.groupby(["f", "q"], as_index=False)["cnt"].sum()
    rows = []
    for f, sub in census.groupby("f", sort=True):
        sub = sub.sort_values("q")
        q = sub["q"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        k = n // 20
        cum = c.cumsum()
        below = cum - c
        above = n - cum
        lo = np.minimum(c, np.maximum(0, k - below))
        hi = np.minimum(c, np.maximum(0, k - above))
        keep = c - lo - hi
        denom = n - 2 * k
        tm = (round(float(int((q * keep).sum())) / float(denom), 6)
              if denom > 0 else None)
        rows.append({"l_returnflag": f, "n": n, "trimmed_mean": tm})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    return out


ORACLE["trimmed_mean_qty_by_flag"] = """
    WITH c AS (
        SELECT l_returnflag AS f, CAST(ROUND(l_quantity) AS BIGINT) AS q,
               COUNT(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    w AS (
        SELECT f, q, cnt,
               SUM(cnt) OVER (PARTITION BY f ORDER BY q)::BIGINT AS cum,
               SUM(cnt) OVER (PARTITION BY f)::BIGINT AS n
        FROM c
    ),
    t AS (
        SELECT f, n, q,
               cnt - LEAST(cnt, GREATEST(0, n // 20 - (cum - cnt)))
                   - LEAST(cnt, GREATEST(0, n // 20 - (n - cum))) AS keep
        FROM w
    )
    SELECT f AS l_returnflag, n,
           ROUND(CAST(SUM(q * keep) AS DOUBLE)
                 / CAST(n - 2 * (n // 20) AS DOUBLE), 6) AS trimmed_mean
    FROM t GROUP BY 1, 2 ORDER BY 1
"""
QUERIES["trimmed_mean_qty_by_flag"] = q_trimmed_mean_qty_by_flag


def q_systematic_sample_orders(sf_dir: str) -> pd.DataFrame:
    """SYSTEMATIC SAMPLING: every 500th order by o_orderkey rank (rows
    where row_number % 500 == 1) — the deterministic eval-split carve
    that, unlike hash sampling (stratified_sample / epoch_mix), gives
    exactly-even coverage of the key space and a reproducible row
    count. Distributed shape: ONE global sort exchange assigns row
    numbers (row_number_within on a constant partition — the
    value_decile_lift composition); the modulo filter is map-side.
    All-integer output."""
    from ..stages.window import row_number_within

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "cents": pc.cast(pc.round(pc.multiply(
                             t["o_totalprice"], pa.scalar(100.0))),
                             pa.int64()),
                         "g": pa.array(np.zeros(t.num_rows, np.int64))})

    numbered = row_number_within(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "g", ["o_orderkey"], out_col="rn", start=1)

    def _pick(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.subtract(t["rn"], pc.multiply(pc.divide(
            pc.subtract(t["rn"], 1), pa.scalar(500, pa.int64())),
            pa.scalar(500, pa.int64()))), pa.scalar(1, pa.int64()))
        sub = t.filter(keep)
        return sub.select(["rn", "o_orderkey", "cents"])

    out = (numbered.map_batches(_pick, batch_format="pyarrow",
                                batch_size=131072).to_pandas()
           .sort_values("rn").reset_index(drop=True))
    out = out.rename(columns={"cents": "total_cents"})
    for col in ("rn", "o_orderkey", "total_cents"):
        out[col] = out[col].astype("int64")
    return out


ORACLE["systematic_sample_orders"] = """
    WITH r AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders
    )
    SELECT rn, o_orderkey, total_cents
    FROM r WHERE (rn - 1) % 500 = 0 ORDER BY rn
"""
QUERIES["systematic_sample_orders"] = q_systematic_sample_orders


def q_max_drawdown_by_user(sf_dir: str) -> pd.DataFrame:
    """MAX DRAWDOWN of each user's cumulative event value — the
    peak-to-trough risk statistic (MAX over positions of running-max −
    running-sum), SQL's double-window ``MAX(MAX(cum) OVER w − cum)``.
    The fold is exactly mergeable despite being order-sensitive: a
    segment reduces to (n, S=Σv, maxCum, minCum, D) and two segments
    combine as D' = max(D_a, D_b, maxCum_a − (S_a + minCum_b)), so the
    shared ``stages.window.max_drawdown_within`` scaffold applies
    unchanged — ONE (user, ts, order) sort exchange, interior runs
    finalized in-block, O(blocks) driver boundary carry. All arithmetic
    is EXACT int64 cents (NULL value ⇒ zero mass, matching
    SUM-skips-NULL cum semantics)."""
    from ..stages.window import max_drawdown_within

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _pre(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(
            pc.fill_null(t["value"], 0.0), pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "vc": vc})

    out = max_drawdown_within(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "user_id", "ts", "event_id", "vc")
    res = (out.to_pandas()
           .rename(columns={"drawdown": "drawdown_cents"})
           .sort_values("user_id").reset_index(drop=True))
    for c in ("user_id", "n_events", "drawdown_cents"):
        res[c] = res[c].astype("int64")
    return res


ORACLE["max_drawdown_by_user"] = """
    WITH e AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS vc
        FROM events
    ),
    c AS (
        SELECT user_id, ts, event_id,
               SUM(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS cum
        FROM e
    ),
    m AS (
        SELECT user_id, cum,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS runmax
        FROM c
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_events,
           MAX(runmax - cum)::BIGINT AS drawdown_cents
    FROM m GROUP BY 1 ORDER BY 1
"""
QUERIES["max_drawdown_by_user"] = q_max_drawdown_by_user


def q_part_rank_fusion(sf_dir: str) -> pd.DataFrame:
    """RECIPROCAL RANK FUSION (RRF, k=60) of two part rankings — by
    exact-cent revenue and by line count — the standard multi-signal
    ranking combiner (search/recsys result fusion). Three skinny
    exchanges after the fact-table pass: ONE (partkey) sorted_groupby
    folds both measures, then two tie-aware global RANK() exchanges
    (rank_within on a constant partition, descending over exact int64
    measures so tie groups are bit-identical to the twin), and the rank
    columns re-merge through one more skinny sorted_groupby (each side
    contributes its rank, zero for the other — SUM restores the pair).
    The fused score 1/(60+r₁)+1/(60+r₂) is two float divisions of exact
    ints added once on both engines, so even the sort-by-score is
    bit-identical; top-20 ties break on partkey."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import rank_within

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "rc": cents,
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    inner, edge = sorted_groupby(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        ["l_partkey"], [("rc", "sum", "rc"), ("n", "sum", "n")])
    agg = inner
    if edge is not None and edge.num_rows:
        agg = agg.union(rd.from_arrow(edge))

    def _const(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows,
                                                      np.int64)))

    packed = agg.map_batches(_const, batch_format="pyarrow",
                             batch_size=131072).materialize()
    r_rev = rank_within(packed, "g", "rc", "l_partkey", descending=True)
    r_cnt = rank_within(packed, "g", "n", "l_partkey", descending=True)

    def _tag(which: str):
        def _f(t: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table({"partkey": t["id"],
                             "r_rev": t["rank"] if which == "rev" else z,
                             "r_cnt": t["rank"] if which == "cnt" else z})
        return _f

    both = r_rev.map_batches(_tag("rev"), batch_format="pyarrow").union(
        r_cnt.map_batches(_tag("cnt"), batch_format="pyarrow"))
    minner, medge = sorted_groupby(
        both, ["partkey"],
        [("r_rev", "sum", "r_rev"), ("r_cnt", "sum", "r_cnt")])
    merged = minner
    if medge is not None and medge.num_rows:
        merged = merged.union(rd.from_arrow(medge))

    def _score(t: pa.Table) -> pa.Table:
        s = pc.add(
            pc.divide(pa.scalar(1.0),
                      pc.cast(pc.add(t["r_rev"], 60), pa.float64())),
            pc.divide(pa.scalar(1.0),
                      pc.cast(pc.add(t["r_cnt"], 60), pa.float64())))
        return t.append_column("score", s)

    top = (merged.map_batches(_score, batch_format="pyarrow")
           .sort(["score", "partkey"], descending=[True, False])
           .limit(20).to_pandas())
    top["rrf"] = top["score"].round(6)
    out = top[["partkey", "r_rev", "r_cnt", "rrf"]].reset_index(drop=True)
    for c in ("partkey", "r_rev", "r_cnt"):
        out[c] = out[c].astype("int64")
    return out


ORACLE["part_rank_fusion"] = """
    WITH m AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT
                   AS rc,
               COUNT(*)::BIGINT AS n
        FROM lineitem GROUP BY 1
    ),
    r AS (
        SELECT partkey,
               RANK() OVER (ORDER BY rc DESC)::BIGINT AS r_rev,
               RANK() OVER (ORDER BY n DESC)::BIGINT AS r_cnt
        FROM m
    )
    SELECT partkey, r_rev, r_cnt,
           ROUND(1.0 / (60 + r_rev) + 1.0 / (60 + r_cnt), 6) AS rrf
    FROM r
    ORDER BY 1.0 / (60 + r_rev) + 1.0 / (60 + r_cnt) DESC, partkey
    LIMIT 20
"""
QUERIES["part_rank_fusion"] = q_part_rank_fusion


def q_repeated_turn_census(sf_dir: str) -> pd.DataFrame:
    """REPEATED-TURN (stutter) census — how many conversations contain
    N adjacent turn pairs with IDENTICAL text, the transcript-quality
    twin of ``LAG(text) OVER (PARTITION BY conv ORDER BY turn) = text``
    (duplicated assistant/tool turns are a classic agent-loop defect;
    the reference's whole-row duplicate check, Profiler.py:541, is the
    single-table ancestor). Runs over events (user_id ↔ conv_id are 1:1
    and (ts, event_id) IS the turn order, role_transitions' precedent).
    Shape (``stages.window.adjacent_equal_counts``): ONE (user, ts,
    order) sort; per block the pair-equality mask is a zero-copy shifted
    Arrow compare reduced per run, shipping ≤runs skinny (user, n)
    partials; the B cross-block pairs resolve in an O(blocks) driver
    boundary scan; one skinny sorted_groupby merges per-user totals and
    a ≤|distinct n|-cell census finishes. Convs with ZERO repeats are
    counted from run arithmetic (Σruns − boundary joins), never
    materialized."""
    from ..stages.window import adjacent_equal_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "props"])
    merged, total_convs = adjacent_equal_counts(
        ds, "user_id", ["ts", "event_id"], "props")

    cens_schema = pa.schema([("n", pa.int64()), ("conv_count", pa.int64())])

    def _census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # typed empty: group_by drops key columns
            return cens_schema.empty_table()
        g = t.group_by(["n"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "conv_count"}.get(c, c)
             for c in g.column_names]).select(cens_schema.names)

    cens = (merged.map_batches(_census, batch_format="pyarrow")
            .to_pandas().groupby("n", as_index=False)["conv_count"].sum())
    affected = int(cens["conv_count"].sum())
    out = pd.concat([pd.DataFrame({"n_repeats": [0],
                                   "conv_count": [total_convs - affected]}),
                     cens.rename(columns={"n": "n_repeats"})],
                    ignore_index=True)
    out = out[out["conv_count"] > 0].sort_values(
        "n_repeats").reset_index(drop=True)
    for c in ("n_repeats", "conv_count"):
        out[c] = out[c].astype("int64")
    return out


ORACLE["repeated_turn_census"] = """
    WITH l AS (
        SELECT user_id,
               CASE WHEN LAG(props) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) = props
                    THEN 1 ELSE 0 END AS rep
        FROM events
    ),
    p AS (
        SELECT user_id, SUM(rep)::BIGINT AS n_repeats
        FROM l GROUP BY 1
    )
    SELECT n_repeats, COUNT(*)::BIGINT AS conv_count
    FROM p GROUP BY 1 ORDER BY 1
"""
QUERIES["repeated_turn_census"] = q_repeated_turn_census


def q_hodges_lehmann_qty(sf_dir: str) -> pd.DataFrame:
    """HODGES–LEHMANN pseudo-median of quantity per returnflag — the
    rank-based robust location estimate (median of all N(N+1)/2 Walsh
    averages (xᵢ+xⱼ)/2, i≤j; the estimator dual to the Wilcoxon
    signed-rank test, completing the robust-location family next to
    the trimmed/winsorized means). The naive form is O(n²) pairs; the
    ≤50-value integer domain makes it census-shaped: ONE zero-exchange
    (flag, q) contingency scan, then the Walsh-sum distribution is the
    census SELF-CONVOLUTION (|domain|² cells, exact int64 pair weights
    c_a·c_b and c_a(c_a+1)/2 on the diagonal) and the lower median is
    the smallest doubled-sum s with cum ≥ ⌈T/2⌉ — all integer until one
    final halving. Twin mirrors with a census self-join + window
    cumsum."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def _census(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        g = pa.table({"f": t["l_returnflag"], "q": q}).group_by(
            ["f", "q"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "cnt"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    census = parts.groupby(["f", "q"], as_index=False)["cnt"].sum()
    rows = []
    for f, sub in census.groupby("f", sort=True):
        q = sub["q"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        s = q[:, None] + q[None, :]
        w = c[:, None] * c[None, :]
        iu = np.triu_indices(len(q), k=1)
        sums = np.concatenate([s[iu], 2 * q])
        wts = np.concatenate([w[iu], c * (c + 1) // 2])
        order = np.argsort(sums, kind="stable")
        sums, wts = sums[order], wts[order]
        tot = int(wts.sum())
        k = (tot + 1) // 2
        cum = np.cumsum(wts)
        hl = float(sums[np.searchsorted(cum, k)]) / 2.0
        rows.append({"l_returnflag": f, "n_pairs": tot, "hl": hl})
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["hl"] = out["hl"].astype("float64")
    return out


ORACLE["hodges_lehmann_qty"] = """
    WITH c AS (
        SELECT l_returnflag AS f, CAST(ROUND(l_quantity) AS BIGINT) AS q,
               COUNT(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    p AS (
        SELECT a.f, a.q + b.q AS s,
               CASE WHEN a.q < b.q THEN a.cnt * b.cnt
                    ELSE a.cnt * (a.cnt + 1) // 2 END AS w
        FROM c a JOIN c b ON a.f = b.f AND a.q <= b.q
    ),
    g AS (SELECT f, s, SUM(w)::BIGINT AS w FROM p GROUP BY 1, 2),
    cw AS (
        SELECT f, s,
               SUM(w) OVER (PARTITION BY f ORDER BY s)::BIGINT AS cum,
               SUM(w) OVER (PARTITION BY f)::BIGINT AS tot
        FROM g
    )
    SELECT f AS l_returnflag, MAX(tot)::BIGINT AS n_pairs,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN s END)
                AS DOUBLE) / 2 AS hl
    FROM cw GROUP BY f ORDER BY f
"""
QUERIES["hodges_lehmann_qty"] = q_hodges_lehmann_qty


def q_theil_by_priority(sf_dir: str) -> pd.DataFrame:
    """THEIL T inequality index of order value per priority — the
    entropy-based inequality measure (decomposable counterpart to
    `gini_by_priority`: T = (1/N)Σ(xᵢ/μ)ln(xᵢ/μ)). Unlike Gini it needs
    NO ranks, so the whole statistic is a zero-exchange fold: per block
    an in-block Arrow groupby emits ≤|priorities| (n, Σx, Σx·ln x)
    partials over exact int64 cents; the driver merges and finalizes
    T = Σx·ln x / S − ln(S/N). Float ln-sums ride the 6dp rounding
    margin (entropy-family precedent — per-element libm agrees to
    ~1 ulp; SUM association differs at ~1e-16 relative)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        x = pc.cast(cents, pa.float64())
        g = pa.table({
            "o_orderpriority": t["o_orderpriority"], "s": cents,
            "xlnx": pc.multiply(x, pc.ln(x)),
        }).group_by(["o_orderpriority"], use_threads=False).aggregate(
            [("s", "sum"), ("xlnx", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"s_sum": "s", "xlnx_sum": "xlnx", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    out = (parts.groupby("o_orderpriority", as_index=False)
           [["s", "xlnx", "n"]].sum()
           .sort_values("o_orderpriority").reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    s = out["s"].to_numpy(np.float64)
    out["theil"] = (out["xlnx"].to_numpy() / s
                    - np.log(s / out["n"].to_numpy())).round(6)
    return out[["o_orderpriority", "n", "theil"]]


ORACLE["theil_by_priority"] = """
    WITH c AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n,
           ROUND(SUM(CAST(cents AS DOUBLE) * LN(CAST(cents AS DOUBLE)))
                     / CAST(SUM(cents) AS DOUBLE)
                 - LN(CAST(SUM(cents) AS DOUBLE) / COUNT(*)), 6) AS theil
    FROM c GROUP BY 1 ORDER BY 1
"""
QUERIES["theil_by_priority"] = q_theil_by_priority


def q_order_value_runs_test(sf_dir: str) -> pd.DataFrame:
    """WALD–WOLFOWITZ RUNS TEST for randomness of the order-value
    sequence in date order — are above-mean orders clustered in time?
    (The nonparametric sequence-randomness omnibus, completing the
    suite's test family next to ANOVA/KW/KS.) Two passes over orders:
    pass 1 is a zero-exchange exact (Σcents, N) fold; pass 2 derives
    the above-mean flag by the EXACT integer comparison cents·N vs S
    (mean ties excluded on both sides; documented bound N·max_cents <
    2⁶³, ≈1.6·10¹¹ rows at this price domain — beyond that the compare
    becomes quotient+remainder), then `stages.window.transition_counts`
    over ONE constant-partition (date, key) sort exchange reduces the
    sequence to a 2×2 transition census: runs R = 1 + Σ_{prev≠cur},
    n₁/n₂ fall out of the same 4 cells + the first row. The z-statistic
    is one float expression over exact ints, 6dp-rounded on both
    sides."""
    import ray.data as rd

    from ..stages.window import transition_counts

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])

    def _sums(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"s": pa.array([pc.sum(cents).as_py() or 0],
                                       pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    tot = ds.map_batches(_sums, batch_format="pyarrow",
                         batch_size=131072).to_pandas().sum()
    S, N = int(tot["s"]), int(tot["n"])

    def _flag(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        lhs = pc.multiply(cents, pa.scalar(N, pa.int64()))
        keep = pc.not_equal(lhs, pa.scalar(S, pa.int64()))
        sub = pa.table({
            "g": pa.array(np.zeros(t.num_rows, np.int64)),
            "d": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "k": t["o_orderkey"],
            "up": pc.cast(pc.greater(lhs, pa.scalar(S, pa.int64())),
                          pa.int64()),
        }).filter(keep)
        return sub

    flagged = ds.map_batches(_flag, batch_format="pyarrow",
                             batch_size=131072).materialize()
    # n1/n2 and the first element from a zero-exchange fold
    def _cnt(t: pa.Table) -> pa.Table:
        return pa.table({"n1": pa.array([pc.sum(t["up"]).as_py() or 0],
                                        pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    cnt = flagged.map_batches(_cnt, batch_format="pyarrow").to_pandas().sum()
    n1, n_kept = int(cnt["n1"]), int(cnt["n"])
    n2 = n_kept - n1
    inner, edge = transition_counts(flagged, "g", ["d", "k"], "up")
    trans = inner.to_pandas()
    if edge is not None and edge.num_rows:
        trans = pd.concat([trans, edge.to_pandas()], ignore_index=True)
    trans = trans.groupby(["prev", "cur"], as_index=False)["n"].sum()
    switches = int(trans.loc[trans["prev"] != trans["cur"], "n"].sum())
    runs = switches + 1 if n_kept else 0
    nn = n1 + n2
    z = None
    if nn >= 2:
        mu = 2.0 * n1 * n2 / nn + 1.0
        var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nn)
               / (float(nn) * nn * (nn - 1.0)))
        if var > 0:
            z = round((runs - mu) / np.sqrt(var), 6)
    return pd.DataFrame({"n1": pd.Series([n1], dtype="int64"),
                         "n2": pd.Series([n2], dtype="int64"),
                         "runs": pd.Series([runs], dtype="int64"),
                         "z": pd.Series([z], dtype="float64")})


ORACLE["order_value_runs_test"] = """
    WITH c AS (
        SELECT o_orderdate, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    s AS (SELECT SUM(cents)::BIGINT AS S, COUNT(*)::BIGINT AS N FROM c),
    f AS (
        SELECT o_orderdate, o_orderkey,
               (cents * (SELECT N FROM s) > (SELECT S FROM s)) AS up
        FROM c
        WHERE cents * (SELECT N FROM s) != (SELECT S FROM s)
    ),
    l AS (
        SELECT up, LAG(up) OVER (ORDER BY o_orderdate, o_orderkey) AS pu
        FROM f
    ),
    agg AS (
        SELECT SUM(CASE WHEN up THEN 1 ELSE 0 END)::BIGINT AS n1,
               SUM(CASE WHEN up THEN 0 ELSE 1 END)::BIGINT AS n2,
               (1 + SUM(CASE WHEN pu IS NOT NULL AND pu != up
                             THEN 1 ELSE 0 END))::BIGINT AS runs
        FROM l
    )
    SELECT n1, n2, runs,
           ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1.0))),
                 6) AS z
    FROM agg
"""
QUERIES["order_value_runs_test"] = q_order_value_runs_test


def q_order_value_autocorr(sf_dir: str) -> pd.DataFrame:
    """LAG-1 SERIAL CORRELATION of the date-ordered order-value
    sequence — Pearson r over consecutive pairs (xᵢ, xᵢ₊₁), the raw-
    sequence companion to `hourly_autocorr` (which correlates the
    aggregated hourly series) and the runs test (which only signs the
    sequence). ONE global (date, key) sort; each block reduces its
    adjacent pairs to six sums (n, Σa, Σb, Σa², Σb², Σab) — cent
    products ≤ 3·10¹⁵ are EXACTLY representable doubles (< 2⁵³), so
    per-element math is exact and only the Σ association differs from
    the twin (≈1e-16 relative, far under the 6dp output rounding);
    the B cross-block pairs come from an O(blocks) driver boundary
    scan over (first, last) values. The twin mirrors the same explicit
    sum formula (not CORR(), whose streaming accumulation rounds
    differently)."""
    import ray

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])

    def _pre(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"d": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                         "k": t["o_orderkey"], "v": cents})

    s = (ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072)
         .sort(["d", "k"]).materialize())
    refs = s.to_arrow_refs()

    @ray.remote
    def _block(block: pa.Table):
        if block.num_rows == 0:
            return None
        v = block["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        a, b = v[:-1], v[1:]
        return (int(a.size), float(a.sum()), float(b.sum()),
                float((a * a).sum()), float((b * b).sum()),
                float((a * b).sum()), float(v[0]), float(v[-1]))

    parts = [p for p in ray.get([_block.remote(r) for r in refs])
             if p is not None]
    n = sa = sb = saa = sbb = sab = 0.0
    last = None
    for np_, a_, b_, aa_, bb_, ab_, first_v, last_v in parts:
        if last is not None:  # the block-straddling pair
            n += 1; sa += last; sb += first_v
            saa += last * last; sbb += first_v * first_v
            sab += last * first_v
        n += np_; sa += a_; sb += b_; saa += aa_; sbb += bb_; sab += ab_
        last = last_v
    r = None
    if n >= 2:
        den = np.sqrt(n * saa - sa * sa) * np.sqrt(n * sbb - sb * sb)
        if den > 0:
            r = round((n * sab - sa * sb) / den, 6)
    return pd.DataFrame({"n_pairs": pd.Series([int(n)], dtype="int64"),
                         "r": pd.Series([r], dtype="float64")})


ORACLE["order_value_autocorr"] = """
    WITH c AS (
        SELECT o_orderdate, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ),
    l AS (
        SELECT CAST(v AS DOUBLE) AS a,
               CAST(LEAD(v) OVER (ORDER BY o_orderdate, o_orderkey)
                    AS DOUBLE) AS b
        FROM c
    ),
    p AS (SELECT a, b FROM l WHERE b IS NOT NULL),
    g AS (
        SELECT COUNT(*)::BIGINT AS n, SUM(a) AS sa, SUM(b) AS sb,
               SUM(a * a) AS saa, SUM(b * b) AS sbb, SUM(a * b) AS sab
        FROM p
    )
    SELECT n AS n_pairs,
           ROUND((n * sab - sa * sb)
                 / (SQRT(n * saa - sa * sa) * SQRT(n * sbb - sb * sb)),
                 6) AS r
    FROM g
"""
QUERIES["order_value_autocorr"] = q_order_value_autocorr


def q_weekday_seasonality_strength(sf_dir: str) -> pd.DataFrame:
    """WEEKDAY SEASONALITY STRENGTH of event volume — η² (correlation
    ratio): the share of day-to-day count variance explained by the
    day-of-week, the one-number answer to "how weekly is this feed?"
    (the variance-decomposition companion to `dow_profile_outliers`'
    per-cell χ² and `anova_lengths_by_source`'s F). ONE zero-exchange
    scan folds per-block (day, n) census partials (calendar-bounded:
    ≤ span days regardless of row count); the driver groups the tiny
    census by ISO weekday and finalizes η² = (Σ_g S_g²/c_g − S²/N) /
    (Σn² − S²/N) — exact int64 sums, three float divisions mirrored
    verbatim by the twin."""
    ds = _read(sf_dir, "events", ["ts"])

    def _census(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        g = pa.table({"day": day}).group_by(
            ["day"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    daily = parts.groupby("day", as_index=False)["n"].sum()
    daily["dow"] = daily["day"].dt.dayofweek.astype("int64") + 1  # ISO
    g = daily.groupby("dow")["n"].agg(
        sg="sum", cg="count", s2=lambda x: int((x.astype(object) ** 2).sum()))
    S = int(g["sg"].sum()); N = int(g["cg"].sum()); snn = int(g["s2"].sum())
    ssb_part = float((g["sg"].astype(float) ** 2 / g["cg"]).sum())
    corr = float(S) * S / N
    eta2 = round((ssb_part - corr) / (snn - corr), 6) if snn > corr else None
    return pd.DataFrame({"n_days": pd.Series([N], dtype="int64"),
                         "eta2": pd.Series([eta2], dtype="float64")})


ORACLE["weekday_seasonality_strength"] = """
    WITH d AS (
        SELECT date_trunc('day', ts) AS day, COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT isodow(day)::BIGINT AS dow, SUM(n)::BIGINT AS sg,
               COUNT(*)::BIGINT AS cg, SUM(n * n)::BIGINT AS s2
        FROM d GROUP BY 1
    ),
    t AS (
        SELECT SUM(sg)::BIGINT AS S, SUM(cg)::BIGINT AS N,
               SUM(s2)::BIGINT AS snn,
               SUM(CAST(sg AS DOUBLE) * sg / cg) AS ssb_part
        FROM g
    )
    SELECT N AS n_days,
           ROUND((ssb_part - CAST(S AS DOUBLE) * S / N)
                 / (snn - CAST(S AS DOUBLE) * S / N), 6) AS eta2
    FROM t
"""
QUERIES["weekday_seasonality_strength"] = q_weekday_seasonality_strength


def q_fano_by_type(sf_dir: str) -> pd.DataFrame:
    """FANO FACTOR (variance-to-mean ratio of DAILY counts) per event
    type — the count-dispersion index: ≈1 for Poisson arrivals, >1 for
    bursty/clumped feeds (the count-domain dual of the inter-event-gap
    `burstiness_by_user`; `weekday_seasonality_strength` asks how much
    of this dispersion the weekday explains). ONE zero-exchange scan
    folds per-block (type, day, n) census partials (≤ |types|·span
    cells); the driver finalizes the sample variance over exact int64
    Σn/Σn² per type and ONE division per type. Days with zero events
    of a type are absent on both sides (identical census convention)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _census(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                unit="day")
        g = pa.table({"event_type": t["event_type"], "day": day}).group_by(
            ["event_type", "day"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            [{"count_all": "n"}.get(c, c) for c in g.column_names])

    parts = ds.map_batches(_census, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    daily = parts.groupby(["event_type", "day"], as_index=False)["n"].sum()
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        n = sub["n"].to_numpy(np.int64)
        k = int(n.size)
        s = int(n.sum())
        s2 = int((n.astype(object) ** 2).sum())
        fano = None
        if k >= 2 and s > 0:
            var = (float(s2) - float(s) * s / k) / (k - 1.0)
            fano = round(var / (float(s) / k), 6)
        rows.append({"event_type": et, "n_days": k, "fano": fano})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["fano"] = out["fano"].astype("float64")
    return out


ORACLE["fano_by_type"] = """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, COUNT(*)::BIGINT AS n_days,
           ROUND(((SUM(n * n)::BIGINT - CAST(SUM(n) AS DOUBLE)
                       * SUM(n) / COUNT(*))
                  / (COUNT(*) - 1.0))
                 / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS fano
    FROM d GROUP BY 1 ORDER BY 1
"""
QUERIES["fano_by_type"] = q_fano_by_type


def q_customer_spend_slope(sf_dir: str) -> pd.DataFrame:
    """PER-CUSTOMER SPEND TREND — OLS slope of order value (cents) over
    the customer's 1-based order sequence: is each customer spending
    more or less per successive order? (The grouped sequence-regression
    member of the trend family: `theil_sen_daily` is a global robust
    trend, `regr_by_flag` regresses value-on-value.) Two exchanges: ONE
    (cust, date, key) sort assigns within-customer order indexes
    (stages.window.row_number_within), then in-block Arrow groupbys
    fold exact int64 (n, Σi, Σi², Σv, Σiv) partials through ONE skinny
    sorted_groupby merge; the slope (nΣiv − ΣiΣv)/(nΣi² − (Σi)²) is
    EXACT-integer up to its single final division, so ties and signs
    are bit-identical to the twin. Customers with one order are
    excluded (denominator 0) on both sides."""
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby
    from ..stages.window import row_number_within

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def _pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "d": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "k": t["o_orderkey"],
            "v": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    numbered = row_number_within(
        ds.map_batches(_pre, batch_format="pyarrow", batch_size=131072),
        "o_custkey", ["d", "k"], out_col="i", start=1)

    def _partial(t: pa.Table) -> pa.Table:
        i = t["i"]
        g = pa.table({
            "o_custkey": t["o_custkey"], "si": i,
            "sii": pc.multiply(i, i), "sv": t["v"],
            "siv": pc.multiply(i, t["v"]),
        }).group_by(["o_custkey"], use_threads=False).aggregate(
            [("si", "sum"), ("sii", "sum"), ("sv", "sum"),
             ("siv", "sum"), ([], "count_all")])
        return g.rename_columns(
            [{"si_sum": "si", "sii_sum": "sii", "sv_sum": "sv",
              "siv_sum": "siv", "count_all": "n"}.get(c, c)
             for c in g.column_names])

    inner, edge = sorted_groupby(
        numbered.map_batches(_partial, batch_format="pyarrow",
                             batch_size=131072),
        ["o_custkey"],
        [("si", "sum", "si"), ("sii", "sum", "sii"), ("sv", "sum", "sv"),
         ("siv", "sum", "siv"), ("n", "sum", "n")])
    agg = inner
    if edge is not None and edge.num_rows:
        agg = agg.union(rd.from_arrow(edge))

    def _slope(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["n"], 2)
        sub = t.filter(keep)
        num = pc.subtract(pc.multiply(sub["n"], sub["siv"]),
                          pc.multiply(sub["si"], sub["sv"]))
        den = pc.subtract(pc.multiply(sub["n"], sub["sii"]),
                          pc.multiply(sub["si"], sub["si"]))
        slope = pc.round(pc.divide(pc.cast(num, pa.float64()),
                                   pc.cast(den, pa.float64())), 6)
        return pa.table({"o_custkey": sub["o_custkey"], "n": sub["n"],
                         "slope": slope})

    out = (agg.map_batches(_slope, batch_format="pyarrow")
           .to_pandas().sort_values("o_custkey").reset_index(drop=True))
    for c in ("o_custkey", "n"):
        out[c] = out[c].astype("int64")
    return out


ORACLE["customer_spend_slope"] = """
    WITH r AS (
        SELECT o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                   ::BIGINT AS i
        FROM orders
    ),
    g AS (
        SELECT o_custkey, COUNT(*)::BIGINT AS n, SUM(i)::BIGINT AS si,
               SUM(i * i)::BIGINT AS sii, SUM(v)::BIGINT AS sv,
               SUM(i * v)::BIGINT AS siv
        FROM r GROUP BY 1
    )
    SELECT o_custkey, n,
           ROUND(CAST(n * siv - si * sv AS DOUBLE)
                 / CAST(n * sii - si * si AS DOUBLE), 6) AS slope
    FROM g WHERE n >= 2 ORDER BY 1
"""
QUERIES["customer_spend_slope"] = q_customer_spend_slope
