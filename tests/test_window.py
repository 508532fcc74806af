"""Windowed aggregate: RANGE-frame parity vs DuckDB, with partitions
forced across block boundaries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_windowed_count_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_count

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "user_id": pa.array(np.sort(rng.integers(0, 40, n)), pa.int64()),
        "ts": pa.array(
            pd.to_datetime(rng.integers(0, 3_600 * 12, n), unit="s"),
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    # 25 blocks of 200 rows: most users straddle block edges
    ds = rd.from_arrow(t).repartition(25)
    got = (
        windowed_count(ds, "user_id", "ts", "event_id", window_us=3_600_000_000)
        .to_pandas().rename(columns={"id": "event_id", "n_window": "n_last_hour"})
        .sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW) AS n_last_hour
        FROM events ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_windowed_count_equal_ts_peers(ray_session):
    """RANGE framing counts ALL equal-ts peers, including later rows."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_count

    ts = pd.to_datetime([0, 0, 0, 7200], unit="s")
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
    })
    got = (
        windowed_count(rd.from_arrow(t), "user_id", "ts", "event_id",
                       window_us=3_600_000_000)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["n_window"].tolist() == [3, 3, 3, 1]
