"""Per-partition profile checkpointing with lineage — resumable runs.

North-rule requirement: "checkpoints per-partition profile sketches so
runs resume with full per-partition lineage and metrics". Design
(SURVEY.md §4 'Checkpoint / resume'):

- partition = one input parquet file (the natural shard of a 100 TB
  layout); all PENDING partitions are profiled in ONE Ray pass using
  ``read_parquet(include_paths=True)`` — partial sketch rows are keyed
  (partition, column) so per-partition profiles fall out of the same
  single streaming pass, no per-file job loop.
- checkpoint = ``<dir>/<sha1(path)>.ckpt`` written atomically
  (tmp + rename) containing the pickled per-column sketch bundle plus
  lineage: input path, file size, row count, engine version.
- resume = rerun the same call; partitions with a valid checkpoint
  (matching input size) are NOT re-read — their sketches load from disk
  and merge into the table profile.

The merged TableProfile is identical whether computed fresh or resumed
(sketch merges are associative; asserted in tests/test_checkpoint.py).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import pyarrow as pa

from . import __version__
from .pipelines.profile import TableProfile
from .stages.profile_partial import ColumnProfile, ProfileConfig


def _ckpt_path(checkpoint_dir: str, input_path: str) -> str:
    h = hashlib.sha1(input_path.encode()).hexdigest()[:16]
    return os.path.join(checkpoint_dir, f"{h}.ckpt")


def _write_atomic(path: str, payload: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def _input_fingerprint(input_path: str) -> dict:
    """Lineage identity of an input parquet file: size + mtime_ns + a
    footer hash over structural metadata AND per-column-chunk statistics
    (min/max/null_count) + data page offsets/sizes. Size alone misses
    same-size rewrites (common for fixed-width / regenerated data); the
    stats-bearing footer hash catches a same-size same-mtime rewrite
    with different values unless the writer both omits statistics and
    reproduces identical page layout — one metadata read, no data scan."""
    st = os.stat(input_path)
    fp = {"input_size": st.st_size, "input_mtime_ns": st.st_mtime_ns}
    try:
        import pyarrow.parquet as pq

        md = pq.read_metadata(input_path)
        parts = [
            str(md.num_rows).encode(),
            str(md.num_row_groups).encode(),
            md.created_by.encode() if md.created_by else b"",
            str(md.serialized_size).encode(),
        ]
        # per-column-chunk content identity: min/max/null_count statistics
        # plus data page offsets and compressed sizes — a same-size,
        # same-layout rewrite with different VALUES moves the stats (and
        # almost always the page byte offsets/sizes), so it invalidates
        # the checkpoint where structural metadata alone would not
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            parts.append(str(rg.total_byte_size).encode())
            for j in range(rg.num_columns):
                col = rg.column(j)
                s = col.statistics
                parts.append(
                    f"{col.path_in_schema}:{col.data_page_offset}:"
                    f"{col.total_compressed_size}:"
                    f"{(s.min, s.max, s.null_count) if s is not None else None}"
                    .encode(errors="replace")
                )
        fp["footer_sha1"] = hashlib.sha1(b"|".join(parts)).hexdigest()
    except Exception:
        fp["footer_sha1"] = None
    return fp


def load_checkpoint(checkpoint_dir: str, input_path: str) -> dict | None:
    """Returns the checkpoint dict if present AND its lineage still
    matches the input file (size + mtime + footer hash), else None."""
    p = _ckpt_path(checkpoint_dir, input_path)
    if not os.path.exists(p):
        return None
    try:
        with open(p, "rb") as f:
            ck = pickle.load(f)
    except Exception:
        return None
    lin = ck.get("lineage", {})
    fp = _input_fingerprint(input_path)
    for k, v in fp.items():
        if lin.get(k) != v:
            return None  # input changed since checkpoint → recompute
    return ck


def save_checkpoint(checkpoint_dir: str, input_path: str,
                    columns: dict, row_count: int, byte_size: int) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    ck = {
        "lineage": {
            "input_path": input_path,
            "engine_version": __version__,
            **_input_fingerprint(input_path),
        },
        "metrics": {"row_count": row_count, "byte_size": byte_size},
        "columns": columns,  # name -> ColumnProfile (picklable sketches)
    }
    _write_atomic(
        _ckpt_path(checkpoint_dir, input_path),
        pickle.dumps(ck, protocol=pickle.HIGHEST_PROTOCOL),
    )


def profile_partitioned(
    paths: list,
    checkpoint_dir: str,
    cfg: ProfileConfig | None = None,
    batch_size: int = 32768,
):
    """Profile a list of parquet files with per-partition checkpoints.

    Returns (table_profile, per_partition) where per_partition maps
    input path -> {"profile": {col: ColumnProfile}, "metrics": {...},
    "lineage": {...}, "resumed": bool}.
    """
    import ray.data as rd

    cfg = cfg or ProfileConfig()
    paths = sorted(paths)
    done: dict = {}
    pending: list = []
    for p in paths:
        ck = load_checkpoint(checkpoint_dir, p)
        if ck is not None:
            done[p] = ck
        else:
            pending.append(p)

    fresh: dict = {}
    if pending:
        ds = rd.read_parquet(pending, include_paths=True)
        partial_fn = _partitioned_partial_fn(cfg)
        rows = (
            ds.map_batches(partial_fn, batch_format="pyarrow", batch_size=batch_size)
            .map_batches(_merge_partitioned, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        # driver fold per (partition, column)
        acc: dict = {}
        for r in rows:
            key = (r["partition"], r["column"])
            st = pickle.loads(r["state"])
            if key in acc:
                prev = acc[key]
                if r["column"] == "__table__":
                    st = {
                        "row_count": prev["row_count"] + st["row_count"],
                        "byte_size": prev["byte_size"] + st["byte_size"],
                    }
                else:
                    st = prev.merge(st)
            acc[key] = st
        for p in pending:
            cols = {
                c: st for (part, c), st in acc.items()
                if part == p and c != "__table__"
            }
            meta = acc.get((p, "__table__"), {"row_count": 0, "byte_size": 0})
            save_checkpoint(checkpoint_dir, p, cols, meta["row_count"], meta["byte_size"])
            fresh[p] = load_checkpoint(checkpoint_dir, p)

    # merge everything into the table profile
    merged_cols: dict = {}
    row_count = 0
    byte_size = 0
    per_partition: dict = {}
    for p in paths:
        ck = done.get(p) or fresh[p]
        per_partition[p] = {
            "profile": ck["columns"],
            "metrics": ck["metrics"],
            "lineage": ck["lineage"],
            "resumed": p in done,
        }
        row_count += ck["metrics"]["row_count"]
        byte_size += ck["metrics"]["byte_size"]
        for name, st in ck["columns"].items():
            merged_cols[name] = st if name not in merged_cols else merged_cols[name].merge(st)
    return TableProfile(columns=merged_cols, row_count=row_count, byte_size=byte_size), per_partition


def _partitioned_partial_fn(cfg: ProfileConfig):
    """Like stages.profile_partial.make_partial_fn but keyed by the
    source file (the ``path`` column from include_paths=True)."""

    def _fn(batch: pa.Table) -> pa.Table:
        path_col = batch["path"]
        data = batch.drop_columns(["path"])
        cols = cfg.columns or data.column_names
        parts, col_names, states = [], [], []
        # a batch may span files at block boundaries: group by path value
        uniq = path_col.unique().to_pylist()
        for pth in uniq:
            mask = pa.compute.equal(path_col, pth)
            sub = data.filter(mask)
            for name in cols:
                prof = ColumnProfile.from_batch(name, sub[name], cfg)
                parts.append(pth)
                col_names.append(name)
                states.append(pickle.dumps(prof, protocol=pickle.HIGHEST_PROTOCOL))
            parts.append(pth)
            col_names.append("__table__")
            states.append(pickle.dumps({"row_count": sub.num_rows, "byte_size": sub.nbytes}))
        return pa.table(
            {
                "partition": pa.array(parts, pa.string()),
                "column": pa.array(col_names, pa.string()),
                "state": pa.array(states, pa.binary()),
            }
        )

    return _fn


def _merge_partitioned(batch: pa.Table) -> pa.Table:
    """Within-block merge keyed (partition, column) — bounds the rows the
    driver folds to O(blocks × partitions-per-block × columns)."""
    acc: dict = {}
    for part, col, blob in zip(
        batch["partition"].to_pylist(),
        batch["column"].to_pylist(),
        batch["state"].to_pylist(),
    ):
        st = pickle.loads(blob)
        key = (part, col)
        if key in acc:
            prev = acc[key]
            if col == "__table__":
                st = {
                    "row_count": prev["row_count"] + st["row_count"],
                    "byte_size": prev["byte_size"] + st["byte_size"],
                }
            else:
                st = prev.merge(st)
        acc[key] = st
    parts = [k[0] for k in acc]
    cols = [k[1] for k in acc]
    blobs = [pickle.dumps(v, protocol=pickle.HIGHEST_PROTOCOL) for v in acc.values()]
    return pa.table(
        {
            "partition": pa.array(parts, pa.string()),
            "column": pa.array(cols, pa.string()),
            "state": pa.array(blobs, pa.binary()),
        }
    )


def partition_verdicts(per_partition: dict, baseline: TableProfile | None = None,
                       max_text_null_pct: float = 5.0) -> dict:
    """Per-partition pass/fail verdicts from checkpointed sketches (no
    re-read): null/blank gate per partition + drift vs baseline when
    given (north rule: per-partition pass/fail)."""
    from .functions.drift import ks_statistic, psi_from_value_counts

    out = {}
    for path, info in per_partition.items():
        cols = info["profile"]
        verdict: dict = {"partition": path, "metrics": info["metrics"],
                         "resumed": info["resumed"], "checks": {}}
        if "text" in cols:
            nb = cols["text"].nullblank.finalize()
            verdict["checks"]["null_blank(text)"] = {
                "passed": nb["null_pct"] <= max_text_null_pct,
                **{k: nb[k] for k in ("null_count", "blank_count", "null_pct")},
            }
        if baseline is not None and "text" in cols and cols["text"].histogram is not None:
            ks = ks_statistic(cols["text"].histogram, baseline.columns["text"].histogram)
            psi = psi_from_value_counts(cols["role"].vc, baseline.columns["role"].vc) \
                if "role" in cols and cols["role"].vc is not None else float("nan")
            verdict["checks"]["drift"] = {
                "passed": bool(ks == ks and ks <= 0.15),
                "ks_statistic": round(ks, 6),
                "role_psi": round(psi, 6) if psi == psi else None,
            }
        verdict["passed"] = all(c["passed"] for c in verdict["checks"].values())
        out[path] = verdict
    return out
