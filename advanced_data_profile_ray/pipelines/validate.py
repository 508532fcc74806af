"""The constraint-validation engine: schema + uniqueness + referential +
range + null/blank + distribution-drift checks over a transcript Dataset,
with pass/fail verdicts and materialized violation rows in stable
(conv_id, turn_idx) order (north rule).

Pass structure (SURVEY.md §3 rebuild lifecycle — at most 3 data passes):
1. one narrow streaming profile pass (sketch partials, no shuffle),
2. one hash-partitioned groupby shuffle for (conv_id, turn_idx) uniqueness,
3. one broadcast actor-pool pass for referential checks + row-level
   range/null filters (no shuffle; dimension sides are ray.put once).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.drift import ks_pvalue, ks_statistic, psi_from_value_counts
from ..stages.profile_partial import ProfileConfig
from ..stages.referential import AntiJoinFilter, SemiJoinCounter
from .profile import TableProfile, profile_dataset

# Engine-wide fixed histogram edges (deterministic merges + drift KS):
# text length in characters, log-ish coverage of typical turn lengths.
TEXT_LEN_EDGES = np.concatenate([np.arange(0, 512, 16), np.arange(512, 4097, 128)]).astype(float)

# default ts validity range, from the reference's validate_date
# (Profiler.py:139-144): years 1900..2100, as µs since epoch
TS_MIN_US = -2208988800000000  # 1900-01-01
TS_MAX_US = 4133980799999999   # 2100-12-31 23:59:59.999999


def transcript_profile_config() -> ProfileConfig:
    # skip exact value-count/heavy-hitter maps on the free-text column:
    # its per-batch np.unique would sort multi-KB strings for a map that
    # overflows immediately anyway (HLL still tracks text cardinality;
    # length moments/histogram/t-digest still computed)
    return ProfileConfig(
        histogram_edges={"text": TEXT_LEN_EDGES}, skip_values=("text",)
    )


@dataclass
class CheckVerdict:
    check: str
    passed: bool
    stats: dict = field(default_factory=dict)
    violation_count: int = 0
    violations = None  # ray.data.Dataset | None (not in repr/eq)

    def to_dict(self) -> dict:
        return {
            "check": self.check,
            "passed": bool(self.passed),
            "violation_count": int(self.violation_count),
            "stats": self.stats,
        }


# ---------------------------------------------------------------------------
# individual checks


def uniqueness_check(ds, keys=("conv_id", "turn_idx"), materialize_limit: int = 1_000_000,
                     paths: list | None = None):
    """Hash-partitioned exchange on the key; groups with n>1 are duplicate
    keys. The key pair is fine-grained (hash(conv_id, turn_idx)), so hot
    conv_ids do NOT skew this shuffle (SURVEY.md §4). Violation rows are
    recovered with a broadcast semi-join of the (small) duplicate key set —
    no second shuffle.

    ``paths``: when the dataset is a plain Parquet read, pass its file
    list to take the raw-task hash-shuffle fast path (fixed bucket
    boundaries, no sort, reads only the key columns). Callers passing a
    DERIVED dataset must leave paths=None (the files wouldn't reflect the
    transformed rows)."""
    from ..stages.fast_ops import duplicate_keys, duplicate_keys_from_files

    keys = list(keys)
    # vectorized group count over ONLY the key columns — never pushes the
    # wide text column through the exchange
    if paths:
        dup_table = duplicate_keys_from_files(paths, keys, limit=materialize_limit)
    else:
        dup_table = duplicate_keys(ds, keys, limit=materialize_limit)
    return _uniqueness_verdict(ds, keys, dup_table)


def _uniqueness_verdict(ds, keys: list, dup_table) -> CheckVerdict:
    dup_rows = dup_table.to_pylist() if dup_table is not None else []
    n_dup_groups = len(dup_rows)
    extra = sum(r["n"] - 1 for r in dup_rows)

    verdict = CheckVerdict(
        check=f"unique({', '.join(keys)})",
        passed=n_dup_groups == 0,
        stats={"duplicate_key_groups": n_dup_groups, "surplus_rows": int(extra)},
        violation_count=int(extra),
    )
    if n_dup_groups:
        import ray

        # NB: "\x1f" separator, not "\x00" — pandas' hashtable paths
        # (factorize/groupby) silently truncate strings at embedded NULs
        keyset = {tuple(r[k] for k in keys) for r in dup_rows}
        packed = pa.array(["\x1f".join(map(str, t)) for t in sorted(keyset, key=str)])
        ref = ray.put(packed)

        class _DupFilter:
            def __init__(self):
                self.keyset = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                parts = [pc.cast(batch[k], pa.string()) for k in keys]
                combined = parts[0]
                for p in parts[1:]:
                    combined = pc.binary_join_element_wise(combined, p, "\x1f")
                return batch.filter(pc.is_in(combined, value_set=self.keyset))

        verdict.violations = ds.map_batches(
            _DupFilter, batch_format="pyarrow", concurrency=(1, _cluster_cpus())
        ).sort(keys)
    return verdict


def turn_contiguity_check(ds, conv_col: str = "conv_id",
                          idx_col: str = "turn_idx",
                          sample_limit: int = 10_000):
    """Structural transcript check: each conversation's turn indexes must
    be exactly 0..n−1. Combined with the uniqueness check (all
    (conv, idx) distinct), per-conversation ``count = n ∧ min = 0 ∧
    max = n−1`` is equivalent to contiguity, so ONE skinny
    sorted_groupby exchange over the two key columns decides every
    conversation — no per-row materialization, violation rows are the
    failing (conv_id, n_turns, min_idx, max_idx) summaries themselves
    (capped at ``sample_limit``)."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.fast_ops import sorted_groupby

    inner, edge = sorted_groupby(
        ds.select_columns([conv_col, idx_col]), [conv_col],
        [(None, "count_all", "n_turns"), (idx_col, "min", "min_idx"),
         (idx_col, "max", "max_idx")])

    def _bad(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_turns"], pa.int64())
        bad = pc.or_(
            pc.not_equal(pc.cast(t["min_idx"], pa.int64()),
                         pa.scalar(0, pa.int64())),
            pc.not_equal(pc.cast(t["max_idx"], pa.int64()),
                         pc.subtract(n, pa.scalar(1, pa.int64()))))
        return t.filter(bad)

    bad_ds = inner.map_batches(_bad, batch_format="pyarrow",
                               batch_size=None)
    if edge is not None and edge.num_rows:
        bad_ds = bad_ds.union(rd.from_arrow(_bad(edge)))
    # two consumers (count + sample) over a tiny derived set
    bad_ds = bad_ds.materialize()
    n_bad = bad_ds.count()
    v = CheckVerdict(
        check=f"turn_contiguity({conv_col}, {idx_col})",
        passed=n_bad == 0,
        stats={"violating_conversations": int(n_bad)},
        violation_count=int(n_bad),
    )
    if n_bad:
        v.violations = bad_ds.limit(sample_limit)
    return v


def referential_check(ds, column: str, dim_values, check_name: str | None = None):
    """Broadcast-hash semi/anti-join of ``ds[column]`` against the small
    dimension value list (ray.put once, hash set per actor — never a
    shuffle join)."""
    import ray

    vals = list(dim_values)
    ref = ray.put(vals)
    # pass counts only need the fact column; violations (below) keep full rows
    counts = ds.select_columns([column]).map_batches(
        SemiJoinCounter,
        fn_constructor_args=(column, ref),
        batch_format="pyarrow",
        batch_size=65536,  # fewer is_in calls: arrow re-hashes the value set per call
        concurrency=(1, _cluster_cpus()),
    )
    agg = counts.sum(["matched", "orphan", "null"])
    matched, orphan, nulls = (
        int(agg["sum(matched)"]),
        int(agg["sum(orphan)"]),
        int(agg["sum(null)"]),
    )
    verdict = CheckVerdict(
        check=check_name or f"referential({column})",
        passed=orphan == 0,
        stats={"matched": matched, "orphan": orphan, "null": nulls},
        violation_count=orphan,
    )
    if orphan:
        verdict.violations = ds.map_batches(
            AntiJoinFilter,
            fn_constructor_args=(column, ref),
            batch_format="pyarrow",
            concurrency=(1, _cluster_cpus()),
        ).sort(["conv_id", "turn_idx"])
    return verdict


def ts_range_check(ds, column: str = "ts", lo_us: int = TS_MIN_US, hi_us: int = TS_MAX_US):
    """Row-level semantic range check (validate_date, Profiler.py:139-144)
    as a vectorized filter; violations keep stable transcript order."""
    lo = pa.scalar(lo_us, pa.timestamp("us"))
    hi = pa.scalar(hi_us, pa.timestamp("us"))

    def _bad(batch: pa.Table) -> pa.Table:
        col = batch[column]
        bad = pc.and_(
            col.is_valid(),
            pc.or_(pc.less(col, lo), pc.greater(col, hi)),
        )
        return batch.filter(bad)

    def _bad_count(batch: pa.Table) -> pa.Table:
        col = batch[column]
        bad = pc.and_(col.is_valid(), pc.or_(pc.less(col, lo), pc.greater(col, hi)))
        return pa.table({"n": pa.array([pc.sum(bad).as_py() or 0], pa.int64())})

    violations = ds.map_batches(_bad, batch_format="pyarrow")
    # count over the narrow column only; the violation row Dataset stays lazy
    n = int(
        ds.select_columns([column])
        .map_batches(_bad_count, batch_format="pyarrow")
        .sum("n")
    )
    verdict = CheckVerdict(
        check=f"ts_in_range({column})",
        passed=n == 0,
        stats={"out_of_range": int(n)},
        violation_count=int(n),
    )
    if n:
        verdict.violations = violations.sort(["conv_id", "turn_idx"])
    return verdict


def null_blank_check(profile: TableProfile, column: str,
                     max_null_pct: float = 100.0, max_blank_pct: float = 100.0):
    """Verdict over the profile pass's null/blank partials — no extra
    data pass (the north rule names null/blank counts as separate stats)."""
    if column not in profile.columns:
        # zero-row input produces zero partial batches → no columns;
        # the check passes vacuously
        return CheckVerdict(
            check=f"null_blank({column})", passed=True,
            stats={"null_count": 0, "blank_count": 0,
                   "null_pct": 0.0, "blank_pct": 0.0},
        )
    f = profile.columns[column].finalize()
    total = max(1, f["total"])
    null_pct = 100.0 * f["null_count"] / total
    blank_pct = 100.0 * f["blank_count"] / total
    return CheckVerdict(
        check=f"null_blank({column})",
        passed=(null_pct <= max_null_pct) and (blank_pct <= max_blank_pct),
        stats={
            "null_count": f["null_count"],
            "blank_count": f["blank_count"],
            "null_pct": round(null_pct, 4),
            "blank_pct": round(blank_pct, 4),
        },
        violation_count=f["null_count"] + f["blank_count"],
    )


def drift_check(current: TableProfile, baseline: TableProfile,
                ks_threshold: float = 0.1, psi_threshold: float = 0.2):
    """KS on the turn-length histogram of ``text`` + PSI on the ``role``
    frequency vector, both straight from merged partials."""
    cur_h = current.columns["text"].histogram
    base_h = baseline.columns["text"].histogram
    ks = ks_statistic(cur_h, base_h)
    pval = ks_pvalue(ks, cur_h.n, base_h.n)
    psi = psi_from_value_counts(current.columns["role"].vc, baseline.columns["role"].vc)
    passed = (ks == ks and ks <= ks_threshold) and (psi == psi and psi <= psi_threshold)
    return CheckVerdict(
        check="drift(text_length_ks, role_psi)",
        passed=passed,
        stats={
            "ks_statistic": round(ks, 6),
            "ks_pvalue": round(pval, 6),
            "role_psi": round(psi, 6),
            "ks_threshold": ks_threshold,
            "psi_threshold": psi_threshold,
        },
    )


# ---------------------------------------------------------------------------
# fused single-pass: profile partials + ts-range count + referential
# counters in ONE wide map_batches (saves the extra narrow passes —
# at 100 TB that is 3 fewer scans of the fact table's key/ts columns and
# 3 fewer rounds of task scheduling over ~10^5 blocks)


class FusedValidationStage:
    """Actor-pool stage emitting (column, state) partial rows: per-column
    ColumnProfile partials PLUS SumState counters for the ts-range check
    and each broadcast referential check. Rows ride the same tree-merge
    as the plain profile pass (merge_stage is state-agnostic)."""

    def __init__(self, cfg: ProfileConfig, ref_specs, ts_col: str | None,
                 lo_us: int = TS_MIN_US, hi_us: int = TS_MAX_US):
        import ray

        self.cfg = cfg
        self.ts_col = ts_col
        self.lo = pa.scalar(lo_us, pa.timestamp("us"))
        self.hi = pa.scalar(hi_us, pa.timestamp("us"))
        # ref_specs: [(check_name, column, ObjectRef | list)] — value sets
        # materialized ONCE per actor (broadcast-hash, never a shuffle)
        self.checks = []
        for name, column, ref in ref_specs:
            vals = ray.get(ref) if not isinstance(ref, (set, list, tuple)) else ref
            self.checks.append((name, column, pa.array(sorted(set(vals)))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.profile_partial import ColumnProfile, SumState
        from ..stages.referential import _typed_set

        names, states = [], []
        cols = self.cfg.columns or batch.column_names
        for name in cols:
            prof = ColumnProfile.from_batch(name, batch[name], self.cfg)
            names.append(name)
            states.append(pickle.dumps(prof, protocol=pickle.HIGHEST_PROTOCOL))
        names.append("__table__")
        states.append(
            pickle.dumps({"row_count": batch.num_rows, "byte_size": batch.nbytes})
        )
        if self.ts_col is not None and self.ts_col in batch.column_names:
            col = batch[self.ts_col]
            bad = pc.and_(
                col.is_valid(),
                pc.or_(pc.less(col, self.lo), pc.greater(col, self.hi)),
            )
            names.append(f"__check__ts_in_range({self.ts_col})")
            states.append(pickle.dumps(
                SumState({"out_of_range": int(pc.sum(bad).as_py() or 0)})
            ))
        for name, column, value_set in self.checks:
            col = batch[column]
            valid = col.is_valid()
            if len(value_set):
                inset = pc.is_in(col, value_set=_typed_set(value_set, col))
                matched = int(pc.sum(pc.and_(valid, inset)).as_py() or 0)
            else:
                matched = 0
            nulls = len(col) - int(pc.sum(valid).as_py() or 0)
            names.append(f"__check__{name}")
            states.append(pickle.dumps(
                SumState({"matched": matched, "null": nulls,
                          "orphan": len(col) - matched - nulls})
            ))
        return pa.table({"column": pa.array(names, pa.string()),
                         "state": pa.array(states, pa.binary())})


def _cluster_cpus() -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        return 8


# worker-process-global cache of broadcast value sets, keyed by ObjectRef.
# Ray reuses worker processes across tasks, so a plain task-pool stage gets
# actor-style once-per-worker init WITHOUT actor-pool scheduling (autoscaling
# actor pools ramp up slowly and serialized this stage; task pools schedule
# at full cluster width immediately).
_VALUESET_CACHE: dict = {}


def _cached_value_set(ref) -> "np.ndarray":
    """Worker-cached broadcast value set as a SORTED numpy array (see
    broadcast_value_set). Accepts legacy list/pa.Array refs too."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _VALUESET_CACHE:
        vals = ray.get(ref) if not isinstance(ref, (set, list, tuple, pa.Array, np.ndarray)) else ref
        if isinstance(vals, np.ndarray):
            arr = vals  # pre-sorted by broadcast_value_set
        else:
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if isinstance(vals, pa.Array):
                arr = pc.unique(vals).to_numpy(zero_copy_only=False)
            else:
                arr = np.asarray(list(dict.fromkeys(vals)))
            if arr.dtype == object:
                arr = arr.astype(np.str_)
            arr = np.sort(arr)
        _VALUESET_CACHE[key] = arr
    return _VALUESET_CACHE[key]


def value_set_mask(value_set: "np.ndarray", vals: "np.ndarray") -> "np.ndarray":
    """Boolean membership of ``vals`` in a SORTED value set via
    searchsorted — the one shared implementation of the broadcast
    semi-join membership test (pc.is_in rebuilds its hash table per
    call; this is exact and O(n log |set|) with no per-batch build).
    Handles dtype alignment and the empty-set case."""
    if value_set.size == 0 or vals.size == 0:
        return np.zeros(vals.size, dtype=bool)
    if vals.dtype == object:
        vals = vals.astype(np.str_)
    elif vals.dtype != value_set.dtype and value_set.dtype.kind in "iuf":
        vals = vals.astype(value_set.dtype, copy=False)
    pos = np.minimum(np.searchsorted(value_set, vals), value_set.size - 1)
    return value_set[pos] == vals


def broadcast_value_set(vals) -> "object":
    """ray.put a SORTED numpy array dimension side for the fused
    referential membership test. Sorted-array + np.searchsorted per batch
    is exact and O(batch·log|dim|) with NO per-batch hash-table build —
    pc.is_in re-hashes the whole value set on every call, which costs
    ~0.5s/batch against a multi-million-key roster."""
    import ray

    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if isinstance(vals, pa.Array):
        arr = pc.unique(vals).to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(list(dict.fromkeys(vals)))
    if arr.dtype == object:
        arr = arr.astype(np.str_)
    return ray.put(np.sort(arr))


def _make_fused_fn(cfg: ProfileConfig, ref_specs, ts_col: str | None,
                   lo_us: int = TS_MIN_US, hi_us: int = TS_MAX_US):
    """Task-pool body for the fused pass (closure captures ObjectRefs —
    Ray serializes them into each task; value sets build once per worker
    via _VALUESET_CACHE)."""
    lo = pa.scalar(lo_us, pa.timestamp("us"))
    hi = pa.scalar(hi_us, pa.timestamp("us"))

    def _fn(batch: pa.Table) -> pa.Table:
        from ..stages.profile_partial import ColumnProfile, SumState
        from ..stages.referential import _typed_set

        names, states = [], []
        cols = cfg.columns or batch.column_names
        for name in cols:
            prof = ColumnProfile.from_batch(name, batch[name], cfg)
            names.append(name)
            states.append(pickle.dumps(prof, protocol=pickle.HIGHEST_PROTOCOL))
        names.append("__table__")
        states.append(
            pickle.dumps({"row_count": batch.num_rows, "byte_size": batch.nbytes})
        )
        if ts_col is not None and ts_col in batch.column_names:
            col = batch[ts_col]
            bad = pc.and_(
                col.is_valid(), pc.or_(pc.less(col, lo), pc.greater(col, hi))
            )
            names.append(f"__check__ts_in_range({ts_col})")
            states.append(pickle.dumps(
                SumState({"out_of_range": int(pc.sum(bad).as_py() or 0)})
            ))
        for name, column, ref in ref_specs:
            value_set = _cached_value_set(ref)  # sorted numpy array
            col = batch[column]
            nvalid = len(col) - col.null_count
            nulls = len(col) - nvalid
            if value_set.size and nvalid:
                vals = col.drop_null().to_numpy(zero_copy_only=False)
                matched = int(value_set_mask(value_set, vals).sum())
            else:
                matched = 0
            names.append(f"__check__{name}")
            states.append(pickle.dumps(
                SumState({"matched": matched, "null": nulls,
                          "orphan": len(col) - matched - nulls})
            ))
        return pa.table({"column": pa.array(names, pa.string()),
                         "state": pa.array(states, pa.binary())})

    return _fn


def _fused_pass(ds, cfg: ProfileConfig, ref_specs, ts_col,
                batch_size: int | None = 262144, fanin: int = 32):
    """Run the fused stage + tree merge; returns (TableProfile, counters)
    where counters maps '__check__*' names to their summed dicts."""
    from ..stages.profile_partial import merge_partial_rows, merge_stage

    parts = ds.map_batches(
        _make_fused_fn(cfg, ref_specs, ts_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    # distributed merge level WITHOUT a repartition barrier: batch_size
    # coalescing pulls ~4k partial rows per merge task (order-agnostic,
    # associative merge), so the driver folds ≤ cols×num_merge_tasks rows
    parts = parts.map_batches(
        merge_stage, batch_format="pyarrow", batch_size=4096
    )
    rows = parts.take_all()
    names, blobs = merge_partial_rows(
        [r["column"] for r in rows], [r["state"] for r in rows]
    )
    merged = dict(zip(names, (pickle.loads(b) for b in blobs)))
    table_meta = merged.pop("__table__", {"row_count": 0, "byte_size": 0})
    counters = {n[len("__check__"):]: merged.pop(n).d
                for n in [k for k in merged if k.startswith("__check__")]}
    profile = TableProfile(columns=merged, row_count=table_meta["row_count"],
                           byte_size=table_meta["byte_size"])
    return profile, counters


# ---------------------------------------------------------------------------
# the full engine


@dataclass
class ValidationReport:
    profile: TableProfile
    verdicts: list

    @property
    def passed(self) -> bool:
        return all(v.passed for v in self.verdicts)

    def to_dict(self) -> dict:
        return {
            "passed": self.passed,
            "verdicts": [v.to_dict() for v in self.verdicts],
            "table": self.profile.finalize()["table"],
        }

    def write_violations(self, out_dir: str) -> dict:
        """One parquet directory per failing check (resumable layout —
        never one giant file)."""
        import os

        written = {}
        for v in self.verdicts:
            if v.violations is not None:
                path = os.path.join(out_dir, v.check.replace("(", "_").replace(")", "").replace(", ", "_"))
                v.violations.write_parquet(path)
                written[v.check] = path
        return written


def validate_transcripts(
    ds,
    valid_conv_ids=None,
    valid_tools=None,
    baseline: TableProfile | None = None,
    max_text_null_pct: float = 5.0,
    max_text_blank_pct: float = 5.0,
    fused: bool = True,
    paths: list | None = None,
    check_turn_contiguity: bool = False,
) -> ValidationReport:
    """Full engine. ``fused=True`` (default) computes profile partials,
    the ts-range count, and both referential counters in ONE wide pass;
    only the uniqueness shuffle (narrow: key columns) is a second pass.
    Violation rows are constructed lazily and only for failing checks.
    ``fused=False`` keeps the one-pass-per-check layout (same verdicts).
    ``check_turn_contiguity=True`` adds the structural 0..n−1 turn-index
    check (one extra skinny exchange; opt-in so the headline surface
    matches the reference's check set)."""
    if not fused:
        profile = profile_dataset(ds, transcript_profile_config())
        verdicts = [
            uniqueness_check(ds, paths=paths),
            ts_range_check(ds),
            null_blank_check(profile, "text", max_text_null_pct, max_text_blank_pct),
        ]
        if valid_conv_ids is not None:
            verdicts.append(referential_check(ds, "conv_id", valid_conv_ids))
        if valid_tools is not None:
            verdicts.append(referential_check(ds, "tool", valid_tools))
        if baseline is not None:
            verdicts.append(drift_check(profile, baseline))
        if check_turn_contiguity:
            verdicts.append(turn_contiguity_check(ds))
        return ValidationReport(profile=profile, verdicts=verdicts)

    import ray

    ref_specs = []
    refs = {}
    if valid_conv_ids is not None:
        refs["conv_id"] = broadcast_value_set(valid_conv_ids)
        ref_specs.append(("referential(conv_id)", "conv_id", refs["conv_id"]))
    if valid_tools is not None:
        refs["tool"] = broadcast_value_set(valid_tools)
        ref_specs.append(("referential(tool)", "tool", refs["tool"]))

    # kick off the uniqueness hash exchange BEFORE the fused pass — the
    # raw tasks run concurrently with the Dataset pipeline, so the job's
    # wall time is max(pass, exchange) + verify instead of their sum
    uniq_handle = None
    if paths:
        from ..stages.fast_ops import (
            finish_duplicate_keys_from_files,
            start_duplicate_keys_from_files,
        )

        uniq_handle = start_duplicate_keys_from_files(paths, ["conv_id", "turn_idx"])

    profile, counters = _fused_pass(ds, transcript_profile_config(),
                                    ref_specs, ts_col="ts")
    if uniq_handle is not None:
        dup_table = finish_duplicate_keys_from_files(uniq_handle)
        uniq_verdict = _uniqueness_verdict(ds, ["conv_id", "turn_idx"], dup_table)
    else:
        uniq_verdict = uniqueness_check(ds)
    verdicts = [
        uniq_verdict,
        null_blank_check(profile, "text", max_text_null_pct, max_text_blank_pct),
    ]

    ts_stats = counters.get("ts_in_range(ts)", {"out_of_range": 0})
    n_bad_ts = int(ts_stats["out_of_range"])
    ts_verdict = CheckVerdict(
        check="ts_in_range(ts)", passed=n_bad_ts == 0,
        stats={"out_of_range": n_bad_ts}, violation_count=n_bad_ts,
    )
    if n_bad_ts:
        lo = pa.scalar(TS_MIN_US, pa.timestamp("us"))
        hi = pa.scalar(TS_MAX_US, pa.timestamp("us"))

        def _bad(batch: pa.Table) -> pa.Table:
            col = batch["ts"]
            return batch.filter(pc.and_(
                col.is_valid(), pc.or_(pc.less(col, lo), pc.greater(col, hi))
            ))

        ts_verdict.violations = (
            ds.map_batches(_bad, batch_format="pyarrow")
            .sort(["conv_id", "turn_idx"])
        )
    verdicts.insert(1, ts_verdict)

    for name, column, _ref in ref_specs:
        st = counters.get(name, {"matched": 0, "orphan": 0, "null": 0})
        v = CheckVerdict(
            check=name, passed=st["orphan"] == 0,
            stats={"matched": int(st["matched"]), "orphan": int(st["orphan"]),
                   "null": int(st["null"])},
            violation_count=int(st["orphan"]),
        )
        if st["orphan"]:
            v.violations = ds.map_batches(
                AntiJoinFilter,
                fn_constructor_args=(column, refs[column]),
                batch_format="pyarrow",
                concurrency=(1, _cluster_cpus()),
            ).sort(["conv_id", "turn_idx"])
        verdicts.append(v)

    if baseline is not None:
        verdicts.append(drift_check(profile, baseline))
    if check_turn_contiguity:
        verdicts.append(turn_contiguity_check(ds))
    return ValidationReport(profile=profile, verdicts=verdicts)


def save_profile(profile: TableProfile, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(profile, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_profile(path: str) -> TableProfile:
    with open(path, "rb") as f:
        return pickle.load(f)
