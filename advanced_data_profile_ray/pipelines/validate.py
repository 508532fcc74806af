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


def uniqueness_check(ds, keys=("conv_id", "turn_idx"), materialize_limit: int = 1_000_000):
    """Hash-partitioned groupby on the key; groups with n>1 are duplicate
    keys. The key pair is fine-grained (hash(conv_id, turn_idx)), so hot
    conv_ids do NOT skew this shuffle (SURVEY.md §4). Violation rows are
    recovered with a broadcast semi-join of the (small) duplicate key set —
    no second shuffle."""
    from ..stages.fast_ops import duplicate_keys

    keys = list(keys)
    # vectorized sort-based group count (fast_ops) over ONLY the key
    # columns — never pushes the wide text column through the exchange
    dup_table = duplicate_keys(ds, keys, limit=materialize_limit)
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
            _DupFilter, batch_format="pyarrow", concurrency=(1, 4)
        ).sort(keys)
    return verdict


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
        concurrency=(1, 4),
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
            concurrency=(1, 4),
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
) -> ValidationReport:
    profile = profile_dataset(ds, transcript_profile_config())
    verdicts = [
        uniqueness_check(ds),
        ts_range_check(ds),
        null_blank_check(profile, "text", max_text_null_pct, max_text_blank_pct),
    ]
    if valid_conv_ids is not None:
        verdicts.append(referential_check(ds, "conv_id", valid_conv_ids))
    if valid_tools is not None:
        verdicts.append(referential_check(ds, "tool", valid_tools))
    if baseline is not None:
        verdicts.append(drift_check(profile, baseline))
    return ValidationReport(profile=profile, verdicts=verdicts)


def save_profile(profile: TableProfile, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(profile, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_profile(path: str) -> TableProfile:
    with open(path, "rb") as f:
        return pickle.load(f)
