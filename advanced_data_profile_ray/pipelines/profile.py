"""Table profiling pipeline: read → one map_batches partial pass →
tree merge → TableProfile.

Replaces the reference's phase 1-4 single-process pandas flow
(Profiler.py:514-916). The whole profile is ONE streaming pass over the
data (no shuffle): each batch emits pickled sketch partials per column,
a repartition+map_batches level merges them (bounded fan-in, still
distributed), and the driver folds the ≤ fanin×(n_cols+1) survivors.
At 10^12 rows the driver never sees more than fanin×cols tiny rows.
"""

from __future__ import annotations

import json
import math
import pickle
from dataclasses import dataclass

from ..stages.profile_partial import (
    ColumnProfile,
    ProfileConfig,
    make_partial_fn,
    merge_partial_rows,
    merge_stage,
)

DEFAULT_BATCH_SIZE = 32768  # larger batches amortize per-batch sketch builds;
# kept below 64k so batch × concurrency of wide text columns stays in heap
MERGE_FANIN = 32


@dataclass
class TableProfile:
    columns: dict            # name -> ColumnProfile
    row_count: int
    byte_size: int

    def finalize(self, top_k: int = 10) -> dict:
        cols = [self.columns[n].finalize(top_k) for n in self.columns]
        type_census: dict = {}
        for c in cols:
            type_census[c["logical_type"]] = type_census.get(c["logical_type"], 0) + 1
        total_cells = self.row_count * len(cols)
        total_nulls = sum(c["null_count"] for c in cols)
        return {
            "table": {
                "row_count": self.row_count,
                "column_count": len(cols),
                "byte_size": self.byte_size,
                "total_null_values": total_nulls,
                "total_not_null_values": total_cells - total_nulls,
                "type_census": type_census,  # phase-2 column census, Profiler.py:608-622
                "zero_pct_columns": sum(
                    1 for c in cols if c["null_count"] == c["total"]
                ),
                "full_pct_columns": sum(1 for c in cols if c["null_count"] == 0),
            },
            "columns": cols,
        }

    def to_json(self, path: str, top_k: int = 10) -> None:
        with open(path, "w") as f:
            json.dump(self.finalize(top_k), f, indent=2, default=_json_default)


def _json_default(o):
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        v = float(o)
        return None if math.isnan(v) else v
    if isinstance(o, float) and math.isnan(o):
        return None
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def profile_dataset(ds, cfg: ProfileConfig | None = None,
                    batch_size: int = DEFAULT_BATCH_SIZE,
                    fanin: int = MERGE_FANIN) -> TableProfile:
    """Profile a ray.data.Dataset in one streaming pass.

    ``fanin`` bounds both the distributed merge level's output block count
    and the number of partial rows the driver folds; at genuinely huge
    block counts add more merge levels by lowering target block counts in
    a loop — the merge body (`merge_stage`) is level-agnostic.
    """
    cfg = cfg or ProfileConfig()
    parts = ds.map_batches(
        make_partial_fn(cfg), batch_format="pyarrow", batch_size=batch_size,
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
    return TableProfile(
        columns=merged,
        row_count=table_meta["row_count"],
        byte_size=table_meta["byte_size"],
    )


def gram_state(ds, cols: list, batch_size: int = 65536):
    """Streaming Gram-matrix partials over ``cols`` merged through the
    SAME distributed tree-merge level the fused profile pass uses
    (merge_stage): one pickled CorrState per input batch → merge tasks
    fold ~4k partials each → the driver folds only the merge-task
    outputs, never one blob per input block (A17/A18 backbone,
    Profiler.py:1019-1065). Returns the merged CorrState (or None on an
    empty dataset); ``.corr_matrix()`` gives Pearson pairs, its
    eigendecomposition the PCA importances."""
    import numpy as np
    import pyarrow as pa

    from ..state.corr import CorrState

    def _partial(df) -> pa.Table:
        st = CorrState.from_matrix(df[cols].to_numpy(dtype=np.float64), cols)
        return pa.table({"column": pa.array(["__gram__"], pa.string()),
                         "state": pa.array([pickle.dumps(st)], pa.binary())})

    rows = (
        ds.map_batches(_partial, batch_format="pandas", batch_size=batch_size)
        .map_batches(merge_stage, batch_format="pyarrow", batch_size=4096)
        .take_all()
    )
    st = None
    for r in rows:
        s = pickle.loads(r["state"])
        st = s if st is None else st.merge(s)
    return st


def profile_parquet(path: str, columns: list | None = None,
                    cfg: ProfileConfig | None = None, **kw) -> TableProfile:
    import ray.data as rd

    ds = rd.read_parquet(path, columns=columns)
    if cfg is None and columns:
        cfg = ProfileConfig(columns=columns)
    return profile_dataset(ds, cfg, **kw)
