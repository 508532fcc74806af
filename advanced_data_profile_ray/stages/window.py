"""Windowed / partitioned-order operators (row_number, per-group sort).

Ray Data has no window functions; the portable pattern (ray_guide.md
"Streaming-shaped workloads") is ``groupby(key).map_groups(fn)`` with the
ordering done per group in pandas. The groupby is a hash shuffle on the
partition key — the one place transcript skew (hot conv_ids) matters, so
group bodies must be O(group) with vectorized pandas, never quadratic.
"""

from __future__ import annotations

import pandas as pd


def row_number_within(ds, partition_key: str, order_keys: list, out_col: str = "row_number",
                      start: int = 0):
    """SQL ``ROW_NUMBER() OVER (PARTITION BY partition_key ORDER BY
    order_keys) - 1 + start`` as a Ray Data operator."""

    def _number(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_keys, kind="mergesort")
        g[out_col] = range(start, start + len(g))
        return g

    return ds.groupby(partition_key).map_groups(_number, batch_format="pandas")


def sessionize_events(ds):
    """Derive the transcript fact table from the ``events`` table —
    deterministic and SQL-expressible (window-function twin in
    queries.ORACLE): conv_id from user_id, turn_idx by event order
    within user, role/tool mapped from event_type, text from props."""
    import numpy as np
    import pyarrow as pa

    ROLE_MAP = {
        "click": "user",
        "view": "user",
        "signup": "system",
        "purchase": "assistant",
        "error": "tool",
    }

    numbered = row_number_within(
        ds, "user_id", ["ts", "event_id"], out_col="turn_idx"
    )

    def _shape(df: pd.DataFrame) -> pa.Table:
        role = df["event_type"].map(ROLE_MAP).fillna("user")
        # explicit Arrow types: a batch with no tool turns would otherwise
        # infer an all-NaN float64 `tool` column (block schema divergence
        # + NaN-vs-null mismatches downstream)
        tool = np.where(role.to_numpy() == "tool",
                        df["event_type"].to_numpy(dtype=object), None)
        return pa.table(
            {
                "conv_id": pa.array(
                    ("c" + df["user_id"].astype(str).str.zfill(8)).to_numpy(dtype=object),
                    pa.string(),
                ),
                "turn_idx": pa.array(df["turn_idx"].to_numpy(), pa.int32()),
                "role": pa.array(role.to_numpy(dtype=object), pa.string()),
                "text": pa.array(df["props"].to_numpy(dtype=object), pa.string()),
                "tool": pa.array(tool, pa.string()),
                "ts": pa.array(df["ts"].to_numpy(), pa.timestamp("us")),
            }
        )

    return numbered.map_batches(_shape, batch_format="pandas")
