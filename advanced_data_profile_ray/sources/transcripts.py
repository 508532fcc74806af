"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2).

Generates the north-rule fact table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` with seeded numpy (vectorized — no per-row Python in
the hot path), Zipf-skewed conversation sizes (hot conv_ids exercise skew
handling) and rate-controlled violation injection:

- duplicate (conv_id, turn_idx) pairs         → uniqueness check
- conv_ids missing from the dim_conv roster   → referential check
- tools missing from the dim_tool catalog     → referential check
- null / blank text                           → null/blank counts
- ts outside [1900, 2100]                     → range check
- role-frequency + turn-length distribution shifts → KS / PSI drift

Everything is derived from a single integer seed; same seed → identical
table, which is what the resume/oracle tests rely on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import ROLES, TRANSCRIPT_SCHEMA

# deterministic word pool for text synthesis
_WORDS = np.array(
    [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu", "data", "model",
        "check", "value", "table", "batch", "stream", "merge", "shard",
    ]
)
_NON_ASCII_SNIPPETS = np.array(["привет мир", "你好世界", "こんにちは", "мир данных"])

TOOL_CATALOG = [f"tool_{i:03d}" for i in range(50)]
BASE_ROLE_PROBS = np.array([0.40, 0.40, 0.05, 0.15])  # user/assistant/system/tool
EPOCH_2020_US = 1577836800000000  # 2020-01-01 in µs


@dataclass
class ViolationConfig:
    dup_pair_rate: float = 0.0
    orphan_conv_rate: float = 0.0
    orphan_tool_rate: float = 0.0
    null_text_rate: float = 0.02
    blank_text_rate: float = 0.01
    ts_out_of_range_rate: float = 0.0
    role_probs: np.ndarray = field(default_factory=lambda: BASE_ROLE_PROBS.copy())
    text_len_scale: float = 1.0


CLEAN = ViolationConfig()
DIRTY = ViolationConfig(
    dup_pair_rate=0.005,
    orphan_conv_rate=0.01,
    orphan_tool_rate=0.02,
    ts_out_of_range_rate=0.005,
)


def gen_transcripts(
    n_convs: int = 2000,
    seed: int = 42,
    cfg: ViolationConfig | None = None,
    mean_turns: float = 10.0,
    conv_offset: int = 0,
) -> pa.Table:
    """``conv_offset`` shifts the conv-id range to [offset, offset+n_convs)
    so independent shards can be generated in parallel with disjoint
    conversations (see write_transcript_dataset_sharded)."""
    cfg = cfg or CLEAN
    rng = np.random.default_rng(seed)

    # Zipf-skewed conversation sizes (hot conv_ids), clipped
    sizes = np.minimum(rng.zipf(1.5, n_convs), int(mean_turns * 40))
    sizes = np.maximum(sizes, 1)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(conv_offset, conv_offset + n_convs), sizes)
    conv_id = np.char.add("c", np.char.zfill(conv_ord.astype(str), 8))
    # contiguous 0..k-1 turn_idx within each conversation
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    role = np.array(ROLES)[rng.choice(4, n, p=cfg.role_probs / cfg.role_probs.sum())]

    # text: sampled word sequences, log-normal word counts
    wc = np.maximum(1, rng.lognormal(np.log(12 * cfg.text_len_scale), 0.6, n).astype(np.int64))
    flat = _WORDS[rng.integers(0, len(_WORDS), int(wc.sum()))]
    bounds = np.cumsum(wc)[:-1]
    text = np.array([" ".join(chunk) for chunk in np.split(flat, bounds)], dtype=object)
    # ~1% non-ASCII suffix
    na_mask = rng.uniform(size=n) < 0.01
    text[na_mask] = text[na_mask] + " " + rng.choice(_NON_ASCII_SNIPPETS, int(na_mask.sum()))
    # null / blank injection
    null_mask = rng.uniform(size=n) < cfg.null_text_rate
    blank_mask = (~null_mask) & (rng.uniform(size=n) < cfg.blank_text_rate)
    text[blank_mask] = rng.choice(np.array(["", "   ", "\t"]), int(blank_mask.sum()))

    # tool: only for tool-role turns; orphan fraction outside the catalog
    tool = np.full(n, None, dtype=object)
    tmask = role == "tool"
    tool[tmask] = np.array(TOOL_CATALOG, dtype=object)[
        rng.integers(0, len(TOOL_CATALOG), int(tmask.sum()))
    ]
    orphan_tool = tmask & (rng.uniform(size=n) < cfg.orphan_tool_rate)
    tool[orphan_tool] = np.char.add(
        "ghost_tool_", rng.integers(0, 99, int(orphan_tool.sum())).astype(str)
    ).astype(object)

    # ts: per-conv start + monotone non-decreasing increments (seconds-scale)
    conv_start = EPOCH_2020_US + rng.integers(0, 365 * 24 * 3600, n_convs) * 1_000_000
    incr = rng.integers(1, 120, n) * 1_000_000
    incr[turn_idx == 0] = 0
    ts = np.repeat(conv_start, sizes) + _grouped_cumsum(incr, starts, sizes)
    oor = rng.uniform(size=n) < cfg.ts_out_of_range_rate
    # out-of-range: year 1800 or 2200
    ts[oor] = np.where(
        rng.uniform(size=int(oor.sum())) < 0.5,
        -5364662400000000,  # 1800-01-01
        7258118400000000,   # 2200-01-01
    )

    # orphan conv_ids: rewrite some conversations to ids outside the roster
    orphan_conv = rng.uniform(size=n) < cfg.orphan_conv_rate
    conv_id = conv_id.astype(object)
    conv_id[orphan_conv] = np.char.add(
        "zz_orphan_", rng.integers(0, 9999, int(orphan_conv.sum())).astype(str)
    ).astype(object)

    text_pa = pa.array(np.where(null_mask, None, text), pa.string())
    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": text_pa,
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )

    # duplicate (conv_id, turn_idx) injection: append copies of sampled rows
    if cfg.dup_pair_rate > 0:
        k = int(round(n * cfg.dup_pair_rate))
        if k:
            idx = rng.choice(n, k, replace=False)
            table = pa.concat_tables([table, table.take(np.sort(idx))])
    return table


def _grouped_cumsum(x: np.ndarray, starts: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each group start (vectorized)."""
    c = np.cumsum(x)
    offsets = np.repeat(c[starts] - x[starts], sizes)
    return c - offsets


def dim_conv_roster(n_convs: int) -> pa.Table:
    """F2 dim_conv: the roster of valid conv_ids (covers the clean ids)."""
    ids = np.char.add("c", np.char.zfill(np.arange(n_convs).astype(str), 8))
    return pa.table({"conv_id": pa.array(ids, pa.string())})


def dim_tool_catalog() -> pa.Table:
    return pa.table(
        {
            "tool": pa.array(TOOL_CATALOG, pa.string()),
            "owner": pa.array([f"team_{i % 5}" for i in range(len(TOOL_CATALOG))], pa.string()),
        }
    )


def write_transcript_dataset(
    out_dir: str,
    n_convs: int = 2000,
    seed: int = 42,
    cfg: ViolationConfig | None = None,
    n_files: int = 8,
) -> list[str]:
    """Write the synthetic table as n_files parquet shards (row-range
    partitioned) so reads are parallel and per-partition lineage exists."""
    os.makedirs(out_dir, exist_ok=True)
    table = gen_transcripts(n_convs, seed, cfg)
    n = table.num_rows
    paths = []
    for i in range(n_files):
        lo = i * n // n_files
        hi = (i + 1) * n // n_files
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path)
        paths.append(path)
    return paths


def write_transcript_dataset_sharded(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    cfg: ViolationConfig | None = None,
    n_files: int = 64,
    parallel: bool = True,
) -> list[str]:
    """Shard-independent generation: each file covers a disjoint conv-id
    range and is generated from its own derived seed, so (a) driver RAM is
    bounded by ONE shard regardless of total size, and (b) shards generate
    in parallel as Ray tasks. Deterministic: same (n_convs, seed, cfg,
    n_files) → identical bytes, any parallelism."""
    os.makedirs(out_dir, exist_ok=True)
    per = [n_convs * (i + 1) // n_files - n_convs * i // n_files for i in range(n_files)]
    offsets = [n_convs * i // n_files for i in range(n_files)]
    paths = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(n_files)]

    def _write_one(i: int) -> str:
        t = gen_transcripts(per[i], seed=seed * 100003 + i, cfg=cfg,
                            conv_offset=offsets[i])
        pq.write_table(t, paths[i])
        return paths[i]

    if parallel:
        import ray

        if ray.is_initialized():
            fn = ray.remote(_write_one)
            ray.get([fn.remote(i) for i in range(n_files)])
            return paths
    for i in range(n_files):
        _write_one(i)
    return paths
