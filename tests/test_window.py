"""Windowed aggregate: RANGE-frame parity vs DuckDB, with partitions
forced across block boundaries."""

import duckdb
import numpy as np
import pytest
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


def test_range_count_join_matches_duckdb(ray_session):
    """Interval-count join vs DuckDB, keys forced across block edges."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import range_count_join

    rng = np.random.default_rng(17)
    n_l, n_r = 2000, 3000
    left = pa.table({
        "k": pa.array(rng.integers(0, 20, n_l), pa.int64()),
        "lt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
                       pa.timestamp("us")),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 20, n_r), pa.int64()),
        "rt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
                       pa.timestamp("us")),
    })
    got = (
        range_count_join(rd.from_arrow(left).repartition(15),
                         rd.from_arrow(right).repartition(11),
                         "k", "k", "lt", "rt", "lid",
                         window_us=86_400_000_000)
        .to_pandas().rename(columns={"id": "lid", "n_range": "n"})
        .sort_values("lid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.lid, COUNT(r.rt) AS n
        FROM l LEFT JOIN r ON r.k = l.k
          AND r.rt >= l.lt AND r.rt < l.lt + INTERVAL 1 DAY
        GROUP BY l.lid ORDER BY l.lid
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_windowed_count_hot_partition_many_blocks(ray_session):
    """ONE partition spanning every block, dense ts ties at boundaries,
    window smaller than a block's time span: the time-clipped edge
    shipping (candidates + pool rows only, round-2 #7) must still give
    exact RANGE-frame counts."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_count

    rng = np.random.default_rng(11)
    n = 6000
    # many duplicate timestamps (ties straddle block edges), one user
    secs = np.sort(rng.integers(0, 1200, n))  # ~5 rows per second
    t = pa.table({
        "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
        "ts": pa.array(pd.to_datetime(secs, unit="s"), pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    got = (
        windowed_count(rd.from_arrow(t).repartition(30), "user_id", "ts",
                       "event_id", window_us=30_000_000)  # 30s window
        .to_pandas().rename(columns={"id": "event_id", "n_window": "n"})
        .sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 30 SECOND PRECEDING
                              AND CURRENT ROW) AS n
        FROM events ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_range_count_join_hot_key_many_blocks(ray_session):
    """One hot key spanning every block with ts ties at boundaries —
    exactness under the time-clipped candidate/pool stitch."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import range_count_join

    rng = np.random.default_rng(29)
    n_l, n_r = 3000, 4000
    left = pa.table({
        "k": pa.array(np.zeros(n_l, np.int64), pa.int64()),
        "lt": pa.array(pd.to_datetime(np.sort(rng.integers(0, 900, n_l)),
                                      unit="s"), pa.timestamp("us")),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(np.zeros(n_r, np.int64), pa.int64()),
        "rt": pa.array(pd.to_datetime(rng.integers(0, 900, n_r), unit="s"),
                       pa.timestamp("us")),
    })
    got = (
        range_count_join(rd.from_arrow(left).repartition(20),
                         rd.from_arrow(right).repartition(20),
                         "k", "k", "lt", "rt", "lid",
                         window_us=20_000_000)  # 20s window
        .to_pandas().rename(columns={"id": "lid", "n_range": "n"})
        .sort_values("lid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.lid, COUNT(r.rt) AS n
        FROM l LEFT JOIN r ON r.k = l.k
          AND r.rt >= l.lt AND r.rt < l.lt + INTERVAL 20 SECOND
        GROUP BY l.lid ORDER BY l.lid
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_sessionize_rejects_unpaddable_user_ids(ray_session):
    """conv_id = 'c' + lpad(user_id, 8) is only order-isomorphic to
    user_id for ids in [0, 10^8); out-of-range ids must raise instead of
    silently breaking ORDER BY parity (round-2 advice)."""
    import pytest
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import sessionize_events

    t = pa.table({
        "user_id": pa.array([5, 10**8], pa.int64()),
        "ts": pa.array(pd.to_datetime([0, 1], unit="s"), pa.timestamp("us")),
        "event_id": pa.array([0, 1], pa.int64()),
        "event_type": pa.array(["click", "click"], pa.string()),
        "props": pa.array(["a", "b"], pa.string()),
    })
    with pytest.raises(ValueError, match="order-isomorphic"):
        sessionize_events(rd.from_arrow(t)).to_pandas()


def test_row_number_fully_duplicate_keys(ray_session):
    """The sort emits zero-row empty-schema blocks for heavily-duplicated
    keys; row numbering must survive them (review finding)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import row_number_within

    t = pa.table({"k": pa.array([7] * 50, pa.int64()),
                  "v": pa.array([1] * 50, pa.int64())})
    out = row_number_within(rd.from_arrow(t).repartition(8), "k", ["v"],
                            out_col="rn").to_pandas()
    assert sorted(out["rn"]) == list(range(50))


def test_running_sum_matches_duckdb(ray_session):
    """Cumulative ROWS-framed sum vs the SQL window twin, with hot
    partitions forced to straddle many sorted blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import running_sum

    rng = np.random.default_rng(11)
    n = 4000
    # one hot partition (id 3) spanning many blocks + normal ones
    part = np.where(rng.random(n) < 0.4, 3, rng.integers(0, 40, n))
    order = rng.permutation(n)
    val = rng.integers(-50, 50, n)  # negatives: prefix sums may hit 0
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(order, pa.int64()),
                  "v": pa.array(val, pa.int64())})
    out = running_sum(rd.from_arrow(t).repartition(23), "g", ["o"], "v",
                      out_col="rs").to_pandas()
    want = duckdb.connect().execute("""
        SELECT g, o, SUM(v) OVER (PARTITION BY g ORDER BY o
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        FROM t ORDER BY g, o
    """).fetch_df()
    got = out.sort_values(["g", "o"]).reset_index(drop=True)[["g", "o", "rs"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_running_sum_zero_sum_block(ray_session):
    """A block whose values sum to zero must still propagate the carry —
    the empty-block sentinel is the key, not the measure total."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import running_sum

    # single partition: values +1, -1 repeated → many interior blocks
    # total exactly 0; running sum alternates 1, 0, 1, 0, ...
    n = 400
    v = np.tile([1, -1], n // 2)
    t = pa.table({"g": pa.array([5] * n, pa.int64()),
                  "o": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(v, pa.int64())})
    out = running_sum(rd.from_arrow(t).repartition(16), "g", ["o"], "v",
                      out_col="rs").to_pandas().sort_values("o")
    expect = np.tile([1, 0], n // 2)
    assert (out["rs"].to_numpy() == expect).all()


def test_rolling_sum_rows_matches_duckdb(ray_session):
    """ROWS-framed rolling sum/count vs the SQL window twin, hot
    partitions straddling many sorted blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import rolling_sum_rows

    rng = np.random.default_rng(17)
    n = 3000
    part = np.where(rng.random(n) < 0.5, 9, rng.integers(0, 25, n))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(rng.integers(-30, 70, n), pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = rolling_sum_rows(rd.from_arrow(t).repartition(21), "g", ["o"],
                           "v", "rid", k=5).to_pandas()
    want = duckdb.connect().execute("""
        SELECT rid AS id, SUM(v) OVER w AS roll_sum, COUNT(*) OVER w AS n_win
        FROM t WINDOW w AS (PARTITION BY g ORDER BY o
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY id
    """).fetch_df()
    got = out.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_sum_rows_deep_tail_reach(ray_session):
    """A candidate whose k-1 predecessors live more than one block back:
    one partition of 60 rows forced into ~30 tiny blocks with k=9 — the
    stitch must concatenate pool fragments across several blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import rolling_sum_rows

    n, k = 60, 9
    t = pa.table({"g": pa.array([1] * n, pa.int64()),
                  "o": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(np.arange(1, n + 1), pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = rolling_sum_rows(rd.from_arrow(t).repartition(30), "g", ["o"],
                           "v", "rid", k=k).to_pandas().sort_values("id")
    # v = 1..n → rolling sum of last k values at row i (0-based) is the
    # sum of the arithmetic run
    vals = np.arange(1, n + 1)
    expect = np.array([vals[max(0, i - k + 1): i + 1].sum() for i in range(n)])
    assert (out["roll_sum"].to_numpy() == expect).all()
    assert (out["n_win"].to_numpy()
            == np.minimum(np.arange(n) + 1, k)).all()


def test_lag_values_matches_duckdb(ray_session):
    """Per-row LAG vs the SQL window twin, including a hot partition
    spanning many blocks and single-row partitions."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import lag_values

    rng = np.random.default_rng(31)
    n = 2500
    part = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 60, n))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = lag_values(rd.from_arrow(t).repartition(19), "g", ["o", "rid"],
                     "o", "rid").to_pandas()
    want = duckdb.connect().execute("""
        SELECT rid AS id, LAG(o) OVER (PARTITION BY g ORDER BY o, rid) AS prev
        FROM t ORDER BY id
    """).fetch_df()
    got = out.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("dense", [False, True])
def test_rank_within_matches_duckdb(ray_session, dense):
    """RANK/DENSE_RANK vs SQL with heavy ties: order values drawn from a
    5-value set so value runs straddle many block boundaries, plus a hot
    partition spanning most blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import rank_within

    rng = np.random.default_rng(41)
    n = 3000
    part = np.where(rng.random(n) < 0.5, 2, rng.integers(0, 12, n))
    val = rng.integers(0, 5, n)  # few distinct values → long tie runs
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "v": pa.array(val, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = rank_within(rd.from_arrow(t).repartition(27), "g", "v", "rid",
                      dense=dense).to_pandas()
    fn = "DENSE_RANK" if dense else "RANK"
    col = "dense_rank" if dense else "rank"
    want = duckdb.connect().execute(f"""
        SELECT rid AS id, {fn}() OVER (PARTITION BY g ORDER BY v) AS "{col}"
        FROM t ORDER BY id
    """).fetch_df()
    got = out.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ntile_within_matches_duckdb(ray_session):
    """NTILE(n) vs SQL: remainder rows must land in the LEADING buckets,
    which requires exact partition sizes even for partitions straddling
    many blocks — one hot partition + several non-divisible sizes."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import ntile_within

    rng = np.random.default_rng(53)
    n = 2700
    part = np.where(rng.random(n) < 0.4, 4, rng.integers(0, 35, n))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    for nb in (3, 7):
        out = ntile_within(rd.from_arrow(t).repartition(24), "g",
                           ["o", "rid"], "rid", n_buckets=nb).to_pandas()
        want = duckdb.connect().execute(f"""
            SELECT rid AS id, NTILE({nb}) OVER (PARTITION BY g
              ORDER BY o, rid) AS ntile
            FROM t ORDER BY id
        """).fetch_df()
        got = out.sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("agg", ["min", "max"])
def test_rolling_agg_minmax_matches_duckdb(ray_session, agg):
    """Rolling MIN/MAX frames vs SQL: per-run sliding-window kernel plus
    the cross-block pool combine, hot partition spanning many blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import rolling_agg_rows

    rng = np.random.default_rng(61)
    n = 2500
    part = np.where(rng.random(n) < 0.5, 6, rng.integers(0, 20, n))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = rolling_agg_rows(rd.from_arrow(t).repartition(22), "g", ["o"],
                           "v", "rid", k=6, agg=agg).to_pandas()
    want = duckdb.connect().execute(f"""
        SELECT rid AS id, {agg.upper()}(v) OVER w AS roll_{agg},
               COUNT(*) OVER w AS n_win
        FROM t WINDOW w AS (PARTITION BY g ORDER BY o
          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        ORDER BY id
    """).fetch_df()
    got = out.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_windowed_agg_sum_hot_partition_many_blocks(ray_session):
    """windowed_agg with a value column: exact integer RANGE-frame SUM
    across one hot partition spanning 30 blocks with boundary ts ties."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_agg

    rng = np.random.default_rng(13)
    n = 6000
    secs = np.sort(rng.integers(0, 1200, n))
    vals = rng.integers(-50, 500, n)
    t = pa.table({
        "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
        "ts": pa.array(pd.to_datetime(secs, unit="s"), pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })
    got = (
        windowed_agg(rd.from_arrow(t).repartition(30), "user_id", "ts",
                     "event_id", window_us=30_000_000, val_col="v",
                     out_col="s")
        .to_pandas().rename(columns={"id": "event_id"})
        .sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        SELECT event_id,
               SUM(v) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 30 SECOND PRECEDING
                            AND CURRENT ROW) AS s
        FROM events ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_windowed_agg_float_values_multi_partition(ray_session):
    """Float value column across many partitions: sums match DuckDB to
    float tolerance (association differs across blocks)."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_agg

    rng = np.random.default_rng(17)
    n = 4000
    users = rng.integers(0, 25, n)
    secs = rng.integers(0, 3600, n)
    order = np.lexsort((secs, users))
    t = pa.table({
        "user_id": pa.array(users[order], pa.int64()),
        "ts": pa.array(pd.to_datetime(secs[order], unit="s"),
                       pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.normal(10.0, 3.0, n), pa.float64()),
    })
    got = (
        windowed_agg(rd.from_arrow(t).repartition(16), "user_id", "ts",
                     "event_id", window_us=120_000_000, val_col="v",
                     out_col="s")
        .to_pandas().rename(columns={"id": "event_id"})
        .sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        SELECT event_id,
               SUM(v) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 2 MINUTE PRECEDING
                            AND CURRENT ROW) AS s
        FROM events ORDER BY event_id
    """).df()
    np.testing.assert_allclose(got["s"].to_numpy(), want["s"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_first_value_threads_through_single_run_blocks(ray_session):
    """A partition spanning MANY blocks (middle blocks single-run) must
    carry the partition's first value through every block, for a string
    payload; interleaved small partitions keep run logic honest."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import first_value_within

    rng = np.random.default_rng(23)
    n = 5000
    users = np.sort(np.concatenate(
        [np.zeros(4000, np.int64), rng.integers(1, 40, 1000)]))
    seq = np.arange(n)
    vals = np.array([f"t{v}" for v in rng.integers(0, 9, n)], dtype=object)
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "val": pa.array(vals, pa.string()),
    })
    got = (
        first_value_within(rd.from_arrow(t).repartition(25), "user_id",
                           ["seq"], "val", out_col="fv")
        .to_pandas().sort_values("seq").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT user_id, seq, val,
               FIRST_VALUE(val) OVER (PARTITION BY user_id ORDER BY seq)
                   AS fv
        FROM t ORDER BY seq
    """).df()
    pd.testing.assert_frame_equal(
        got[["seq", "fv"]].reset_index(drop=True),
        want[["seq", "fv"]].astype({"seq": "int64"}))


def test_windowed_agg_int_nulls_contribute_zero(ray_session):
    """Null int values must contribute 0 (SQL SUM ignores NULLs), not
    INT64_MIN through the NaN cast."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import windowed_agg

    t = pa.table({
        "u": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(pd.to_datetime([0, 10, 20], unit="s"),
                       pa.timestamp("us")),
        "id": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([5, None, 7], pa.int64()),
    })
    out = (windowed_agg(rd.from_arrow(t), "u", "ts", "id",
                        window_us=60_000_000, val_col="v", out_col="s")
           .to_pandas().sort_values("id"))
    assert out["s"].tolist() == [5, 5, 12]


def test_interval_overlap_counts_stitching(ray_session):
    """Fused symmetric window count vs brute force, with tiny blocks so
    nearly every key run straddles block boundaries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import (
        interval_overlap_counts,
    )

    rng = np.random.default_rng(19)
    n = 4000
    keys = rng.integers(0, 25, n).astype(np.int64)   # long runs
    ts = rng.integers(0, 1000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    w = 40
    t = pa.table({"k": pa.array(keys), "t": pa.array(ts),
                  "id": pa.array(ids)})
    ds = rd.from_arrow(t).repartition(50)  # 80-row blocks
    got = (interval_overlap_counts(ds, "k", "t", "id", half_window_us=w)
           .to_pandas().sort_values("id").reset_index(drop=True))

    want = np.empty(n, np.int64)
    for i in range(n):
        same = keys == keys[i]
        want[i] = int(((ts[same] >= ts[i] - w) & (ts[same] <= ts[i] + w)).sum())
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        pd.DataFrame({"id": ids, "n_overlap": want}))


def test_partition_run_reduce_random_sweep(ray_session):
    """Shared scaffold (_partition_run_reduce) under adversarial shapes:
    many SINGLE-event partitions (gap stats' HAVING filter must drop
    them even when they land on block boundaries), mixed run widths,
    and block counts 1 / 7 / 40 — both primitives vs pandas oracles."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import (
        session_gap_stats, sessionize)

    rng = np.random.default_rng(11)
    GAP = 1_000_000
    rows = []
    eid = 0
    for user in range(60):
        n_ev = int(rng.choice([1, 1, 2, 3, 17]))  # many singletons
        t = int(rng.integers(0, GAP))
        for _ in range(n_ev):
            t += int(rng.choice([GAP // 3, GAP * 2]))
            rows.append((user, t, eid))
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id"])
    srt = df.sort_values(["user_id", "ts_us", "event_id"])
    want_gap = (srt.groupby("user_id")
                .agg(n_events=("ts_us", "size"),
                     max_gap_us=("ts_us", lambda s: s.diff().max()))
                .reset_index())
    want_gap = want_gap[want_gap["n_events"] >= 2].reset_index(drop=True)
    want_sess = (srt.groupby("user_id")
                 .agg(n_sessions=("ts_us",
                                  lambda s: 1 + int((s.diff() > GAP).sum())),
                      n_events=("ts_us", "size"))
                 .reset_index())
    t = pa.table({
        "user_id": pa.array(df["user_id"], pa.int64()),
        "ts": pa.array(pd.to_datetime(df["ts_us"], unit="us"),
                       pa.timestamp("us")),
        "event_id": pa.array(df["event_id"], pa.int64()),
    })
    for blocks in (1, 7, 40):
        ds = rd.from_arrow(t).random_shuffle(seed=blocks).repartition(blocks)
        got_gap = (session_gap_stats(ds, "user_id", "ts", "event_id")
                   .to_pandas().sort_values("user_id")
                   .reset_index(drop=True))
        pd.testing.assert_frame_equal(got_gap.astype("int64"),
                                      want_gap.astype("int64"))
        ds = rd.from_arrow(t).random_shuffle(seed=blocks).repartition(blocks)
        got_sess = (sessionize(ds, "user_id", "ts", "event_id", gap_us=GAP)
                    .to_pandas().sort_values("user_id")
                    .reset_index(drop=True))
        pd.testing.assert_frame_equal(got_sess.astype("int64"),
                                      want_sess.astype("int64"))


def test_sessionize_boundary_stitch(ray_session):
    """sessionize must count sessions exactly when a user's run straddles
    many tiny sorted blocks: a cross-block continuation cancels the
    continuing fragment's first session start iff the boundary gap is
    within the threshold. Brute-force numpy oracle over a 3-user corpus
    with planted gap structure, forced through 40 blocks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import sessionize

    rng = np.random.default_rng(7)
    GAP = 1_000_000  # 1s in us
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = 0
        for _ in range(500):
            # ~30% of steps exceed the gap -> new session
            t += int(rng.choice([GAP // 2, GAP * 3], p=[0.7, 0.3]))
            rows.append((user, t, eid))
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id"])
    want = (
        df.sort_values(["user_id", "ts_us", "event_id"])
        .groupby("user_id")
        .agg(n_sessions=("ts_us", lambda s: 1 + int((s.diff() > GAP).sum())),
             n_events=("ts_us", "size"))
        .reset_index()
    )
    t = pa.table({
        "user_id": pa.array(df["user_id"], pa.int64()),
        "ts": pa.array(pd.to_datetime(df["ts_us"], unit="us"),
                       pa.timestamp("us")),
        "event_id": pa.array(df["event_id"], pa.int64()),
    })
    ds = rd.from_arrow(t).random_shuffle(seed=3).repartition(40)
    got = (sessionize(ds, "user_id", "ts", "event_id", gap_us=GAP)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        want.astype("int64").sort_values("user_id").reset_index(drop=True))


def test_transition_counts_matches_duckdb(ray_session):
    """Markov transition counts vs the LAG + GROUP BY twin, with a hot
    partition spanning many blocks (boundary pairs resolved by the
    driver stitch) and single-row partitions (no pairs)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import transition_counts

    rng = np.random.default_rng(47)
    n = 3000
    part = np.where(rng.random(n) < 0.35, 9, rng.integers(0, 80, n))
    vals = rng.choice(["a", "b", "c", "d"], n)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(vals, pa.string())})
    inner, edge = transition_counts(rd.from_arrow(t).repartition(27),
                                    "g", ["o"], "v",
                                    prev_name="prev", cur_name="cur")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = got.sort_values(["prev", "cur"]).reset_index(drop=True)
    want = duckdb.connect().execute("""
        WITH l AS (SELECT v, LAG(v) OVER (PARTITION BY g ORDER BY o) AS p
                   FROM t)
        SELECT p AS prev, v AS cur, COUNT(*) AS n FROM l
        WHERE p IS NOT NULL GROUP BY p, v ORDER BY p, v
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_transition_counts_single_row_partitions(ray_session):
    """All-singleton partitions produce zero pairs — typed empty result,
    no KeyError from empty group_by blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import transition_counts

    t = pa.table({"g": pa.array(np.arange(50), pa.int64()),
                  "o": pa.array(np.zeros(50), pa.int64()),
                  "v": pa.array(["x"] * 50, pa.string())})
    inner, edge = transition_counts(rd.from_arrow(t).repartition(7),
                                    "g", ["o"], "v")
    assert inner.count() == 0
    assert edge is None or edge.num_rows == 0
    # the typed-empty union pins the schema even though every block is
    # empty (ray to_pandas drops columns on all-empty blocks — assert at
    # the Dataset level, which is the operator's contract)
    assert inner.schema().names == ["prev", "cur", "n"]


def test_rolling_median_matches_duckdb(ray_session):
    """Rolling MEDIAN (non-combinable agg): the stitch re-medians
    explicit windows from shipped candidate+pool rows; hot partition
    forced across many blocks, plus partitions shorter than k."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import rolling_agg_rows

    rng = np.random.default_rng(53)
    n = 2200
    part = np.where(rng.random(n) < 0.45, 3, rng.integers(0, 70, n))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(rng.normal(size=n), pa.float64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    out = rolling_agg_rows(rd.from_arrow(t).repartition(24), "g",
                           ["o", "rid"], "v", "rid", k=5,
                           agg="median").to_pandas()
    want = duckdb.connect().execute("""
        SELECT rid AS id, MEDIAN(v) OVER w AS roll_median,
               COUNT(*) OVER w AS n_win
        FROM t
        WINDOW w AS (PARTITION BY g ORDER BY o, rid
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY id
    """).fetch_df()
    got = out.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_forward_fill_matches_duckdb(ray_session):
    """LOCF vs LAST_VALUE(IGNORE NULLS): ~60% nulls force carries
    through all-null block prefixes and all-null single-run blocks."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import forward_fill_within

    rng = np.random.default_rng(59)
    n = 2600
    part = np.where(rng.random(n) < 0.4, 5, rng.integers(0, 40, n))
    raw = rng.integers(0, 1000, n)
    vals = np.where(rng.random(n) < 0.6, None, raw.astype(object))
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(list(vals), pa.int64())})
    out = forward_fill_within(rd.from_arrow(t).repartition(26), "g", ["o"],
                              "v", out_col="f").to_pandas()
    want = duckdb.connect().execute("""
        SELECT g, o, v,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY g ORDER BY o
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
        FROM t ORDER BY g, o
    """).fetch_df()
    got = out.sort_values(["g", "o"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_forward_fill_all_null_column(ray_session):
    """A partition with zero non-nulls stays all-null end to end."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import forward_fill_within

    t = pa.table({"g": pa.array([1] * 40, pa.int64()),
                  "o": pa.array(np.arange(40), pa.int64()),
                  "v": pa.array([None] * 40, pa.string())})
    out = forward_fill_within(rd.from_arrow(t).repartition(9), "g", ["o"],
                              "v", out_col="f").to_pandas()
    assert out["f"].isna().all()


def test_pair_gap_stats_matches_duckdb(ray_session):
    """Adjacent-pair gap stats (count/sum/max of ts deltas per
    (prev, cur) value pair) vs the LAG twin, with a hot partition
    spanning many blocks so boundary gaps flow through the stitch."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import pair_gap_stats

    rng = np.random.default_rng(53)
    n = 3000
    part = np.where(rng.random(n) < 0.35, 9, rng.integers(0, 80, n))
    vals = rng.choice(["a", "b", "c"], n)
    ts = rng.integers(0, 10**9, n)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(vals, pa.string())})
    inner, edge = pair_gap_stats(rd.from_arrow(t).repartition(27),
                                 "g", ["ts", "o"], "v", "ts",
                                 prev_name="prev", cur_name="cur")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = got.sort_values(["prev", "cur"]).reset_index(drop=True)
    want = duckdb.connect().execute("""
        WITH l AS (SELECT v, LAG(v) OVER w AS p, ts - LAG(ts) OVER w AS d
                   FROM t WINDOW w AS (PARTITION BY g ORDER BY ts, o))
        SELECT p AS prev, v AS cur, COUNT(*) AS n,
               SUM(d) AS sum_gap_us, MAX(d) AS max_gap_us
        FROM l WHERE p IS NOT NULL GROUP BY p, v ORDER BY p, v
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pair_gap_stats_single_row_partitions(ray_session):
    """All-singleton partitions: zero pairs, typed empty result."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import pair_gap_stats

    t = pa.table({"g": pa.array(np.arange(50), pa.int64()),
                  "ts": pa.array(np.zeros(50), pa.int64()),
                  "v": pa.array(["x"] * 50, pa.string())})
    inner, edge = pair_gap_stats(rd.from_arrow(t).repartition(7),
                                 "g", ["ts"], "v", "ts")
    assert inner.count() == 0
    assert edge is None or edge.num_rows == 0
    # ray to_pandas drops columns on all-empty blocks — assert the typed
    # schema at the Dataset level, which is the operator's contract
    assert inner.schema().names == ["prev", "cur", "n", "sum_gap_us",
                                    "max_gap_us"]


def test_time_weighted_sum_matches_duckdb(ray_session):
    """Time-weighted sums vs the LEAD twin: hot partition spanning many
    blocks (boundary intervals = carry's last value × boundary gap),
    all-tie partitions (span 0 kept, caller filters), singletons
    dropped by the n>=2 emit rule."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import time_weighted_sum

    rng = np.random.default_rng(59)
    n = 2500
    part = np.where(rng.random(n) < 0.3, 7, rng.integers(0, 60, n))
    ts = rng.integers(0, 10**7, n)
    ts[part == 11] = 42  # an all-tie partition: span 0
    v = rng.integers(-500, 500, n)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(v, pa.int64())})
    got = (time_weighted_sum(rd.from_arrow(t).repartition(23),
                             "g", "ts", "o", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH l AS (SELECT g, v,
                          epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dt
                   FROM t WINDOW w AS (PARTITION BY g ORDER BY ts, o))
        SELECT g, COUNT(*) AS n_events,
               COALESCE(SUM(v * dt), 0) AS wsum,
               COALESCE(SUM(dt), 0) AS span_us
        FROM l GROUP BY g HAVING COUNT(*) >= 2 ORDER BY g
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_concat_group_strings_matches_duckdb(ray_session):
    """Ordered STRING_AGG vs DuckDB with a hot partition spanning many
    blocks (edge fragments re-joined in the stitch task), null texts
    dropped mid-run, and an all-null partition omitted entirely."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import concat_group_strings

    rng = np.random.default_rng(61)
    n = 2000
    part = np.where(rng.random(n) < 0.3, 5, rng.integers(0, 50, n))
    texts = np.array([f"w{i}" for i in range(n)], dtype=object)
    texts[rng.random(n) < 0.15] = None
    texts[part == 13] = None  # all-null partition
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "txt": pa.array(texts, pa.string())})
    got = (concat_group_strings(rd.from_arrow(t).repartition(19),
                                "g", ["o"], "txt", sep="\n")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        SELECT g, STRING_AGG(txt, chr(10) ORDER BY o) AS txt,
               COUNT(txt) AS n_parts
        FROM t GROUP BY g HAVING COUNT(txt) > 0 ORDER BY g
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_time_weighted_sum_null_values(ray_session):
    """NULL values contribute zero mass for their interval while the
    interval still counts toward the span — SQL SUM-skip semantics."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import time_weighted_sum

    t = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                  "ts": pa.array([0, 10, 30], pa.timestamp("us")),
                  "o": pa.array([0, 1, 2], pa.int64()),
                  "v": pa.array([5, None, 7], pa.int64())})
    got = time_weighted_sum(rd.from_arrow(t), "g", "ts", "o", "v").to_pandas()
    assert got["n_events"].tolist() == [3]
    assert got["wsum"].tolist() == [5 * 10 + 0 * 20]
    assert got["span_us"].tolist() == [30]


def test_alternation_stats_matches_duckdb(ray_session):
    """Adjacent same-value pair census vs the LAG twin: a hot partition
    spanning many blocks (cross-block same-pairs detected via the
    carried last/first codes), ts ties broken by the order column,
    singletons dropped by the n>=2 emit rule."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import alternation_stats

    rng = np.random.default_rng(61)
    n = 3000
    part = np.where(rng.random(n) < 0.35, 9, rng.integers(0, 80, n))
    ts = rng.integers(0, 500, n)  # heavy ts ties -> order col matters
    code = rng.integers(0, 3, n)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "c": pa.array(code, pa.int64())})
    got = (alternation_stats(rd.from_arrow(t).repartition(29),
                             "g", "ts", "o", "c")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH l AS (SELECT g,
                          CASE WHEN c = LAG(c) OVER (PARTITION BY g
                                                     ORDER BY ts, o)
                               THEN 1 ELSE 0 END AS same
                   FROM t)
        SELECT g, COUNT(*) AS n_turns, SUM(same) AS same_pairs
        FROM l GROUP BY g HAVING COUNT(*) >= 2 ORDER BY g
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_alternation_stats_boundary_same_pair(ray_session):
    """A same-code pair that straddles a block boundary must be counted
    exactly once (two single-run blocks of one partition)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import alternation_stats

    t1 = pa.table({"g": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([10, 20], pa.timestamp("us")),
                   "o": pa.array([0, 1], pa.int64()),
                   "c": pa.array([0, 2], pa.int64())})
    t2 = pa.table({"g": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([30, 40], pa.timestamp("us")),
                   "o": pa.array([2, 3], pa.int64()),
                   "c": pa.array([2, 0], pa.int64())})
    ds = rd.from_arrow([t1, t2])
    got = alternation_stats(ds, "g", "ts", "o", "c").to_pandas()
    assert got["n_turns"].tolist() == [4]
    assert got["same_pairs"].tolist() == [1]


def test_interval_coverage_matches_duckdb(ray_session):
    """Interval union vs DuckDB's cumulative-max island construction:
    hot partition spanning many blocks (cross-block overlap subtracted
    exactly once), duplicate timestamps, singletons."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import interval_coverage

    rng = np.random.default_rng(67)
    n = 3000
    L = 1000
    part = np.where(rng.random(n) < 0.35, 5, rng.integers(0, 70, n))
    ts = rng.integers(0, 40_000, n)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64())})
    got = (interval_coverage(rd.from_arrow(t).repartition(31),
                             "g", "ts", "o", length_us=L)
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute(f"""
        WITH e AS (SELECT g, epoch_us(ts) AS s, epoch_us(ts) + {L} AS e, o
                   FROM t),
        m AS (SELECT g, s, e,
                     MAX(e) OVER (PARTITION BY g ORDER BY s, o
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS pm
              FROM e),
        x AS (SELECT g, s, e,
                     SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                         OVER (PARTITION BY g ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS grp
              FROM m),
        i AS (SELECT g, grp, MIN(s) AS s0, MAX(e) AS e1 FROM x GROUP BY 1, 2)
        SELECT g, COUNT(*) AS n_islands, SUM(e1 - s0) AS covered_us
        FROM i GROUP BY g ORDER BY g
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_adjacent_gap_counts_matches_duckdb(ray_session):
    """Gap value-counts vs the LAG twin: hot partition spanning blocks
    (boundary gaps enter as weight-1 rows exactly once), duplicate
    gaps collapse to weights."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import adjacent_gap_counts

    rng = np.random.default_rng(71)
    n = 2500
    part = np.where(rng.random(n) < 0.4, 3, rng.integers(0, 50, n))
    ts = rng.integers(0, 2_000, n)  # small domain -> many repeated gaps
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64())})
    inner, edge = adjacent_gap_counts(rd.from_arrow(t).repartition(27),
                                      "g", "ts", "o")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = got.sort_values(["g", "gap_us"]).reset_index(drop=True)
    got["w"] = got["w"].astype("int64")
    want = duckdb.connect().execute("""
        WITH l AS (SELECT g, epoch_us(ts) - LAG(epoch_us(ts))
                              OVER (PARTITION BY g ORDER BY ts, o) AS gap
                   FROM t)
        SELECT g, gap AS gap_us, COUNT(*) AS w
        FROM l WHERE gap IS NOT NULL GROUP BY 1, 2 ORDER BY g, gap_us
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_longest_run_matches_duckdb(ray_session):
    """Max-subsegment combine vs the two-ROW_NUMBER islands twin: hot
    partition spanning many blocks (carry suffix + fragment prefix
    joins), all-true and all-false fragments, no-true partitions
    dropped."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import longest_run

    rng = np.random.default_rng(73)
    n = 3000
    part = np.where(rng.random(n) < 0.4, 2, rng.integers(0, 60, n))
    flag = (rng.random(n) < 0.7).astype(np.int64)
    flag[part == 13] = 0  # an all-false partition: dropped
    flag[part == 17] = 1  # an all-true partition
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(rng.integers(0, 10**6, n),
                                 pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "f": pa.array(flag, pa.int64())})
    got = (longest_run(rd.from_arrow(t).repartition(33), "g", "ts", "o", "f")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH m AS (
            SELECT g, f,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY ts, o)
                   - ROW_NUMBER() OVER (PARTITION BY g, f ORDER BY ts, o)
                       AS grp
            FROM t
        ),
        r AS (SELECT g, grp, COUNT(*) AS len
              FROM m WHERE f = 1 GROUP BY g, grp),
        c AS (SELECT g, COUNT(*) AS n_rows FROM t GROUP BY g)
        SELECT r.g, MAX(r.len) AS longest_run, MAX(c.n_rows) AS n_rows
        FROM r JOIN c USING (g) GROUP BY r.g ORDER BY r.g
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_subsequence_match_matches_duckdb(ray_session):
    """Automaton composition vs the greedy MIN-position cascade: hot
    partition spanning many blocks (state maps compose), partitions
    with steps out of order, partial progress, and no steps at all."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import subsequence_match

    rng = np.random.default_rng(79)
    n = 4000
    part = np.where(rng.random(n) < 0.35, 4, rng.integers(0, 80, n))
    # codes: steps 0/1/2 sparse among noise (-1)
    code = rng.choice([-1, -1, -1, 0, 1, 2], size=n).astype(np.int64)
    t = pa.table({"g": pa.array(part, pa.int64()),
                  "ts": pa.array(rng.integers(0, 10**6, n),
                                 pa.timestamp("us")),
                  "o": pa.array(rng.permutation(n), pa.int64()),
                  "c": pa.array(code, pa.int64())})
    got = (subsequence_match(rd.from_arrow(t).repartition(37),
                             "g", "ts", "o", "c", seq_len=3)
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.connect().execute("""
        WITH e AS (SELECT g, c,
                          ROW_NUMBER() OVER (PARTITION BY g
                                             ORDER BY ts, o) AS ord
                   FROM t),
        a AS (SELECT g, MIN(ord) AS i FROM e WHERE c = 0 GROUP BY g),
        b AS (SELECT e.g, MIN(ord) AS j FROM e JOIN a USING (g)
              WHERE c = 1 AND ord > a.i GROUP BY e.g),
        f AS (SELECT DISTINCT e.g FROM e JOIN b USING (g)
              WHERE c = 2 AND ord > b.j)
        SELECT g FROM f ORDER BY g
    """).fetch_df()
    assert got[got["matched"] == 1]["g"].tolist() == want["g"].tolist()
    # n_rows sanity: every partition appears exactly once with its size
    sizes = pd.Series(part).value_counts().sort_index()
    assert got["n_rows"].tolist() == sizes.tolist()


def test_new_primitives_empty_and_singleton(ray_session):
    """Degenerate inputs for the round-5 primitives: empty datasets
    return typed empty results; singleton partitions obey each
    operator's emit rule (alternation drops, coverage emits one island,
    longest_run drops all-false, subsequence reports no match)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import (
        alternation_stats,
        interval_coverage,
        longest_run,
        subsequence_match,
    )

    empty = pa.table({"g": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.timestamp("us")),
                      "o": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    e = rd.from_arrow(empty)
    assert alternation_stats(e, "g", "ts", "o", "v").count() == 0
    assert interval_coverage(e, "g", "ts", "o", 100).count() == 0
    assert longest_run(e, "g", "ts", "o", "v").count() == 0
    assert subsequence_match(e, "g", "ts", "o", "v", 2).count() == 0

    one = pa.table({"g": pa.array([7], pa.int64()),
                    "ts": pa.array([5], pa.timestamp("us")),
                    "o": pa.array([0], pa.int64()),
                    "v": pa.array([0], pa.int64())})
    s = rd.from_arrow(one)
    # alternation needs >= 2 turns -> dropped
    assert alternation_stats(s, "g", "ts", "o", "v").count() == 0
    cov = interval_coverage(s, "g", "ts", "o", 100).to_pandas()
    assert cov["n_islands"].tolist() == [1]
    assert cov["covered_us"].tolist() == [100]
    # flag 0 -> no true run -> dropped; flag 1 -> run of one
    assert longest_run(s, "g", "ts", "o", "v").count() == 0
    m = subsequence_match(s, "g", "ts", "o", "v", 2).to_pandas()
    assert m["matched"].tolist() == [0]  # code 0 reaches state 1 of 2

    with pytest.raises(ValueError):
        interval_coverage(s, "g", "ts", "o", 0)
    with pytest.raises(ValueError):
        subsequence_match(s, "g", "ts", "o", "v", 0)


def test_pair_cooccurrence_matches_duckdb(ray_session):
    """Basket pair counts vs the self-join twin: hot baskets spanning
    many blocks (multi-fragment cross-pairs accumulate through the
    prefix), singleton baskets, many repartitions."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import pair_cooccurrence

    rng = np.random.default_rng(89)
    # distinct (key, item) rows, hot key 3 with a huge basket
    rows = set()
    for _ in range(2500):
        k = 3 if rng.random() < 0.3 else int(rng.integers(0, 120))
        rows.add((k, int(rng.integers(0, 40 if k != 3 else 400))))
    k = np.array([r[0] for r in rows], np.int64)
    v = np.array([r[1] for r in rows], np.int64)
    t = pa.table({"g": pa.array(k), "i": pa.array(v)})
    inner, edge = pair_cooccurrence(rd.from_arrow(t).repartition(41),
                                    "g", "i")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = (got.sort_values(["item_a", "item_b"]).reset_index(drop=True)
           .astype("int64"))
    want = duckdb.connect().execute("""
        SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n
        FROM t a JOIN t b ON a.g = b.g AND a.i < b.i
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_order_conformance_census_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import (
        order_conformance_census)

    rng = np.random.default_rng(11)
    n = 6000
    users = np.sort(rng.integers(0, 60, n))
    order = np.arange(n, dtype=np.int64)
    # mostly-monotone timestamps per user, with planted backward steps
    base = np.cumsum(rng.integers(1, 50, n))
    flip = rng.random(n) < 0.08
    ts_s = base - flip * rng.integers(100, 10_000, n)
    t = pa.table({
        "u": pa.array(users, pa.int64()),
        "oid": pa.array(order, pa.int64()),
        "ts": pa.array(pd.to_datetime(ts_s, unit="s"), pa.timestamp("us")),
    })
    # 30 blocks of 200 rows: partitions straddle boundaries, so both the
    # in-block scan and the driver boundary stitch carry violations
    pairs, inner, edge = order_conformance_census(
        rd.from_arrow(t).repartition(30), "u", "oid", "ts")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = (got.groupby("u", as_index=False)["viol"].sum()
           .sort_values("u").reset_index(drop=True))

    want = duckdb.sql("""
        WITH l AS (SELECT u, ts,
                          LAG(ts) OVER (PARTITION BY u ORDER BY oid) p
                   FROM t)
        SELECT u, COUNT(*) FILTER (ts < p)::BIGINT AS viol
        FROM l GROUP BY u HAVING COUNT(*) FILTER (ts < p) > 0
        ORDER BY u
    """).df()
    want_pairs = duckdb.sql(
        "SELECT COUNT(*)::BIGINT FROM (SELECT u, LAG(ts) OVER "
        "(PARTITION BY u ORDER BY oid) p FROM t) WHERE p IS NOT NULL"
    ).fetchone()[0]
    assert pairs == want_pairs
    got = got[got["viol"] > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"u": "int64", "viol": "int64"}),
        want.astype({"u": "int64", "viol": "int64"}))


def test_order_conformance_census_conforming_input(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import (
        order_conformance_census)

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "oid": pa.array([0, 1, 2, 0, 1], pa.int64()),
        "ts": pa.array(pd.to_datetime([10, 20, 30, 5, 6], unit="s"),
                       pa.timestamp("us")),
    })
    pairs, inner, edge = order_conformance_census(
        rd.from_arrow(t).repartition(3), "u", "oid", "ts")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    assert pairs == 3
    viol = int(got["viol"].sum()) if "viol" in got.columns and len(got) else 0
    assert viol == 0


def test_trigram_counts_cross_block_matches_duckdb(ray_session):
    """trigram_counts vs the LAG(·,1)/LAG(·,2) twin on a many-tiny-block
    layout: repartition(40) over 200 rows forces runs to straddle
    blocks constantly, including 1-row middle blocks (a triple spanning
    THREE blocks), exercising the depth-2 rolling-tail stitch."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import trigram_counts

    rng = np.random.default_rng(7)
    n = 200
    users = np.sort(rng.integers(0, 12, n))  # short and long runs mixed
    t = pa.table({
        "u": pa.array(users, pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.choice(["a", "b", "c"], n), pa.string()),
    })
    inner, edge = trigram_counts(rd.from_arrow(t).repartition(40),
                                 "u", ["o"], "v")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = (got.groupby(["v1", "v2", "v3"], as_index=False)["n"].sum()
           .sort_values(["v1", "v2", "v3"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH l AS (
            SELECT v AS v3, LAG(v, 1) OVER w AS v2, LAG(v, 2) OVER w AS v1
            FROM t WINDOW w AS (PARTITION BY u ORDER BY o)
        )
        SELECT v1, v2, v3, COUNT(*)::BIGINT AS n
        FROM l WHERE v1 IS NOT NULL GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    got["n"] = got["n"].astype("int64")
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_trigram_counts_all_short_runs(ray_session):
    """Every partition has < 3 rows: zero triples, typed empty result
    (the zero-triple schema-pinning path)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import trigram_counts

    t = pa.table({
        "u": pa.array([0, 0, 1, 2, 2, 3], pa.int64()),
        "o": pa.array(np.arange(6), pa.int64()),
        "v": pa.array(list("abcdef"), pa.string()),
    })
    inner, edge = trigram_counts(rd.from_arrow(t).repartition(4),
                                 "u", ["o"], "v")
    # Ray's to_pandas drops columns on an all-empty dataset; the typed
    # contract lives in the Dataset schema (callers guard the frame)
    assert set(inner.schema().names) == {"v1", "v2", "v3", "n"}
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    assert len(got) == 0


def test_value_islands_cross_block_stitch(ray_session):
    """An island spanning THREE sorted blocks (middle block is a single
    run) must stitch into one interval; interiors, block-edge merges and
    the no-merge value change are all checked against a pandas oracle."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import value_islands

    # user 1: A A A | A A | A B B  -> island A x5? no: 3+2+1=6 A then 2 B
    # user 2 starts mid-block to exercise the part-change close
    rows = []
    seq = ([(1, "A")] * 6 + [(1, "B")] * 2 + [(2, "B")] * 3
           + [(2, "A")] * 1 + [(2, "A")] * 2)
    for i, (u, v) in enumerate(seq):
        rows.append({"user_id": u, "ts": np.datetime64(1_000_000 * i, "us"),
                     "event_id": i, "event_type": v})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(5)
    got = (value_islands(ds, "user_id", "ts", "event_id", "event_type")
           .to_pandas().sort_values(["user_id", "start_us"])
           .reset_index(drop=True))

    # pandas oracle: LAG change flag + cumsum island id
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    brk = ((df["user_id"] != df["user_id"].shift())
           | (df["event_type"] != df["event_type"].shift())).cumsum()
    exp = (df.assign(isl=brk,
                     us=df["ts"].astype("datetime64[us]").astype("int64"))
           .groupby(["user_id", "isl"])
           .agg(event_type=("event_type", "first"), start_us=("us", "min"),
                end_us=("us", "max"), n_events=("us", "size"))
           .reset_index().drop(columns="isl")
           .sort_values(["user_id", "start_us"]).reset_index(drop=True))
    exp["n_events"] = exp["n_events"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["user_id", "event_type", "start_us", "end_us", "n_events"]],
        exp[["user_id", "event_type", "start_us", "end_us", "n_events"]])
    # the 6-row A island must be ONE stitched row
    assert ((got["user_id"] == 1) & (got["event_type"] == "A")
            & (got["n_events"] == 6)).sum() == 1


def test_session_intervals_cross_block_landing_carry(ray_session):
    """A session spanning several sorted blocks must stitch into one row
    that keeps the FIRST block's landing value; a boundary gap larger
    than gap_us must NOT merge. Pandas LAG-flag oracle."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import session_intervals

    gap = 1_000_000  # 1s
    rows = []
    t = 0
    # user 1: 7 events 0.5s apart (one session, landing "A"), then a 5s
    # gap, then 2 events (second session, landing "C")
    seq = [("A", 0), ("B", 500_000), ("B", 500_000), ("B", 500_000),
           ("B", 500_000), ("B", 500_000), ("B", 500_000),
           ("C", 5_000_000), ("A", 500_000)]
    for i, (v, dt) in enumerate(seq):
        t += dt
        rows.append({"user_id": 1, "ts": np.datetime64(t, "us"),
                     "event_id": i, "event_type": v})
    # user 2: single event right at the end
    rows.append({"user_id": 2, "ts": np.datetime64(0, "us"),
                 "event_id": 99, "event_type": "Z"})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(6)
    got = (session_intervals(ds, "user_id", "ts", "event_id",
                             "event_type", gap_us=gap)
           .to_pandas().sort_values(["user_id", "start_us"])
           .reset_index(drop=True))

    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    us = df["ts"].astype("datetime64[us]").astype("int64")
    brk = ((df["user_id"] != df["user_id"].shift())
           | ((us - us.shift()) > gap)).cumsum()
    exp = (df.assign(sid=brk, us=us)
           .groupby(["user_id", "sid"])
           .agg(landing=("event_type", "first"), start_us=("us", "min"),
                end_us=("us", "max"), n_events=("us", "size"))
           .reset_index().drop(columns="sid")
           .sort_values(["user_id", "start_us"]).reset_index(drop=True))
    exp["n_events"] = exp["n_events"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["user_id", "landing", "start_us", "end_us", "n_events"]],
        exp[["user_id", "landing", "start_us", "end_us", "n_events"]])
    assert ((got["user_id"] == 1) & (got["landing"] == "A")
            & (got["n_events"] == 7)).sum() == 1


def test_weighted_pair_dot_cross_block(ray_session):
    """weighted_pair_dot vs a brute-force pandas dot on a layout where
    one key's item list straddles three blocks (prefix x fragment driver
    cross-pairs) and weights exceed 1."""
    import itertools

    import ray.data as rd

    from advanced_data_profile_ray.stages.window import weighted_pair_dot

    rng = np.random.default_rng(11)
    rows = []
    for key in range(30):
        items = rng.choice(20, size=rng.integers(1, 9), replace=False)
        for it in items:
            rows.append({"k": key, "item": int(it),
                         "w": int(rng.integers(1, 6))})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(7)
    inner, edge = weighted_pair_dot(ds, "k", "item", "w")
    got = inner.to_pandas()
    if edge is not None and edge.num_rows:
        got = pd.concat([got, edge.to_pandas()], ignore_index=True)
    got = (got.groupby(["item_a", "item_b"], as_index=False)["dot"].sum()
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))

    acc = {}
    for _, g in df.groupby("k"):
        g = g.sort_values("item")
        for (ia, wa), (ib, wb) in itertools.combinations(
                zip(g["item"], g["w"]), 2):
            acc[(ia, ib)] = acc.get((ia, ib), 0) + wa * wb
    exp = (pd.DataFrame([(a, b, d) for (a, b), d in acc.items()],
                        columns=["item_a", "item_b", "dot"])
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_max_drawdown_within_forced_stitch(ray_session):
    """Drawdown fold vs DuckDB's double-window definition with
    partitions forced across 25 sorted blocks — exercises the
    (S, maxCum, minCum, D) merge algebra on every boundary shape
    (including all-negative and single-row partitions)."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import max_drawdown_within

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table({
        "user_id": pa.array(np.sort(rng.integers(0, 37, n)), pa.int64()),
        "ts": pa.array(
            pd.to_datetime(rng.permutation(n) * 1000, unit="us"),
            pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        # signed values so drawdowns are nontrivial; one single-row user
        "v": pa.array(rng.integers(-500, 400, n), pa.int64()),
    })
    single = pa.table({"user_id": pa.array([99], pa.int64()),
                       "ts": pa.array([pd.Timestamp("2020-01-01")],
                                      pa.timestamp("us")),
                       "event_id": pa.array([n], pa.int64()),
                       "v": pa.array([-7], pa.int64())})
    full = pa.concat_tables([t, single])
    ds = rd.from_arrow(full).repartition(25)
    got = (max_drawdown_within(ds, "user_id", "ts", "event_id", "v")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("e", full)
    want = con.execute("""
        WITH c AS (
            SELECT user_id, ts, event_id,
                   SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
               MAX(runmax - cum)::BIGINT AS drawdown
        FROM m GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_adjacent_equal_counts_forced_stitch(ray_session):
    """Planted stutters (adjacent equal text) with partitions forced
    across 20 sorted blocks: per-partition repeat counts, the
    cross-block boundary pair, NULL-safe equality, and the distinct-
    partition total must all match the quadratic definition."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import adjacent_equal_counts

    rng = np.random.default_rng(13)
    n = 4000
    users = np.sort(rng.integers(0, 50, n))
    # small text domain + planted nulls → many adjacent repeats and
    # null-vs-null adjacencies (which must NOT count)
    vocab = np.array(["a", "b", "c", None], dtype=object)
    texts = vocab[rng.integers(0, 4, n)]
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                                 pa.timestamp("us")),
                  "event_id": pa.array(np.arange(n), pa.int64()),
                  "txt": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(20)
    merged, total = adjacent_equal_counts(ds, "user_id",
                                          ["ts", "event_id"], "txt")
    got = (merged.to_pandas().groupby("user_id", as_index=False)["n"].sum()
           .sort_values("user_id").reset_index(drop=True))

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    exp_counts = {}
    for uid, g in df.groupby("user_id"):
        v = g["txt"].tolist()
        c = sum(1 for a, b in zip(v, v[1:])
                if a is not None and b is not None and a == b)
        if c:
            exp_counts[uid] = c
    exp = (pd.DataFrame({"user_id": list(exp_counts),
                         "n": list(exp_counts.values())})
           .sort_values("user_id").reset_index(drop=True))
    assert total == df["user_id"].nunique()
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
