"""Resumable partitioned Parquet sink.

Scale contract (driver brief "Resumable output"): output is one file per
input shard — never one giant file — written atomically (tmp + rename),
so a failed or interrupted run re-invoked with the same arguments skips
every finished partition and only recomputes the missing ones.

Shape: one raw Ray task per input shard (read shard → optional Arrow
transform → write). Raw tasks, not Dataset.write_parquet, because resume
semantics need a 1:1 shard→file mapping with per-file completion
markers, which the streaming writer does not expose. Each task touches
one shard only; the driver holds nothing but per-shard status rows.
"""

from __future__ import annotations

import os


def _out_paths(out_dir: str, paths: list) -> dict:
    """input path -> output path. Basename stems are used when unique;
    if two shards share a basename (common with date-partitioned
    layouts like 2024/part0.parquet vs 2025/part0.parquet), EVERY output
    name gets a short path-hash suffix — a silent collision would drop
    one shard's data and then 'resume' past the loss forever."""
    import hashlib

    stems = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    unique = len(set(stems)) == len(stems)
    out = {}
    for p, stem in zip(paths, stems):
        if not unique:
            stem = f"{stem}_{hashlib.sha1(p.encode()).hexdigest()[:8]}"
        out[p] = os.path.join(out_dir, f"{stem}.parquet")
    return out


def write_partitioned_parquet(paths: list, out_dir: str, batch_fn=None,
                              columns: list | None = None,
                              overwrite: bool = False) -> dict:
    """Transform + write each input shard to ``out_dir/<stem>.parquet``.

    Args:
        paths: input parquet shard paths (one output file per shard).
        batch_fn: optional ``pa.Table -> pa.Table`` transform applied to
            the whole shard inside the task (vectorized Arrow).
        columns: column projection pushed into the shard read.
        overwrite: when False (default), shards whose output file already
            exists are SKIPPED — this is the resume path.

    Returns {"written": [...], "skipped": [...], "rows_written": n}.
    """
    import pyarrow.parquet as pq

    import ray

    os.makedirs(out_dir, exist_ok=True)
    mapping = _out_paths(out_dir, sorted(paths))
    pending, skipped = [], []
    for p, out in mapping.items():
        if not overwrite and os.path.exists(out):
            skipped.append(out)
        else:
            pending.append((p, out))

    @ray.remote
    def _one(src: str, dst: str) -> int:
        t = pq.read_table(src, columns=columns)
        if batch_fn is not None:
            t = batch_fn(t)
        tmp = dst + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, dst)  # atomic: a crash never leaves a partial file
        return t.num_rows

    rows = ray.get([_one.remote(src, dst) for src, dst in pending])
    return {
        "written": [dst for _, dst in pending],
        "skipped": skipped,
        "rows_written": int(sum(rows)),
    }


def dataset_to_partitioned(ds, out_dir: str, overwrite: bool = False):
    """Streaming Dataset sink: ``ds.write_parquet`` into ``out_dir``
    (many block-sized files, never one giant file). Not per-shard
    resumable — use write_partitioned_parquet when inputs are file
    shards; this is the generic streaming path for derived Datasets."""
    if overwrite and os.path.isdir(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    return out_dir


def delete_keys_from_shards(paths: list, key_col: str, keys,
                            out_dir: str, columns: list | None = None,
                            overwrite: bool = False) -> dict:
    """Targeted row deletion (right-to-be-forgotten batch): rewrite each
    shard WITHOUT the rows whose ``key_col`` is in the tombstone set —
    the per-shard, resumable shape of a 100-TB delete. The tombstone
    keys broadcast ONCE as a sorted array via ``ray.put`` (zero-copy in
    every task); each task searchsorted-filters its own shard and writes
    atomically through ``write_partitioned_parquet``, so a crashed run
    re-invoked with the same arguments skips finished shards. Null keys
    are never deleted (SQL NOT IN semantics against non-null tombstones)."""
    import numpy as np
    import pyarrow as pa
    import ray

    tomb = np.asarray(keys)
    if tomb.dtype == object:  # string keys: uniform numpy string compare
        tomb = tomb.astype(np.str_)
    tomb = np.sort(tomb)
    ref = ray.put(tomb)

    def _fn(t: "pa.Table") -> "pa.Table":
        tk = ray.get(ref)
        if tk.size == 0 or t.num_rows == 0:
            return t
        col = t[key_col]
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        hit = np.zeros(t.num_rows, bool)
        if valid.any():
            k = col.to_numpy(zero_copy_only=False)[valid]
            if k.dtype == object:
                k = k.astype(np.str_)
            pos = np.minimum(np.searchsorted(tk, k), tk.size - 1)
            hit[valid] = tk[pos] == k
        return t.filter(pa.array(~hit))

    return write_partitioned_parquet(paths, out_dir, batch_fn=_fn,
                                     columns=columns, overwrite=overwrite)


def upsert_keys_into_shards(paths: list, key_col: str, delta,
                            out_dir: str, columns: list | None = None,
                            overwrite: bool = False) -> dict:
    """CDC MERGE (upsert): matched base rows are replaced by the delta's,
    unmatched delta rows are inserted — the lakehouse MERGE INTO shape
    over an unclustered shard layout, where an upsert is exactly
    delete-matched + append-delta: each base shard rewrites WITHOUT the
    delta's keys (sorted-key broadcast, same machinery as
    delete_keys_from_shards), and the delta lands as its own atomic
    shard. Resumable like every sink op: a re-invoked run skips finished
    base shards AND a finished delta shard. ``delta`` is an in-memory
    pyarrow.Table (the delta is the SMALL side of a CDC merge by
    definition; a shard-sized delta would be pre-partitioned upstream
    and merged per partition)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = os.path.join(out_dir, "_delta_upsert.parquet")
    # the reserved delta name must never collide with a rewritten base
    # shard: a silent collision either drops every delta row (the append
    # sees the base output and "resumes" past it) or clobbers the base
    # shard under overwrite — the exact permanent-loss class _out_paths
    # guards against for base stems
    if dst in _out_paths(out_dir, sorted(paths)).values():
        raise ValueError(
            "a base shard maps to the reserved delta output name "
            f"{dst!r}; rename the input shard")
    keys = delta[key_col].drop_null().to_numpy(zero_copy_only=False)
    res = delete_keys_from_shards(paths, key_col, keys, out_dir,
                                  columns=columns, overwrite=overwrite)
    if columns is not None:
        delta = delta.select(columns)
    if overwrite or not os.path.exists(dst):
        tmp = dst + ".tmp"
        pq.write_table(delta, tmp)
        os.replace(tmp, dst)
        res["written"].append(dst)
        res["rows_written"] = int(res["rows_written"]) + delta.num_rows
    else:
        res["skipped"].append(dst)
    return res
