"""As-of join: DuckDB ASOF LEFT JOIN parity with keys forced across many
sorted-block boundaries (carry-chain stress)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_asof_join_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.asof import asof_join_latest

    rng = np.random.default_rng(9)
    n_l, n_r = 3000, 2000
    left = pa.table({
        "k": pa.array(rng.integers(0, 25, n_l), pa.int64()),
        "lt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
                       pa.timestamp("us")),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 25, n_r), pa.int64()),
        "rt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
                       pa.timestamp("us")),
    })
    # key 24 gets NO right rows at all -> nulls
    right = right.filter(pa.compute.not_equal(right["k"], 24))
    got = (
        asof_join_latest(rd.from_arrow(left).repartition(17),
                         rd.from_arrow(right).repartition(13),
                         left_key="k", right_key="k",
                         left_time="lt", right_time="rt", left_id="lid")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.lid, r.rt AS asof_ts
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.rt <= l.lt
        ORDER BY l.lid
    """).df()
    assert got["asof_ts"].isna().sum() > 0  # nulls actually exercised
    pd.testing.assert_frame_equal(
        got.astype({"lid": "int64"}),
        want.astype({"lid": "int64"}))


def test_asof_equal_time_match(ray_session):
    """right.t == left.t matches (<= semantics)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.asof import asof_join_latest

    ts = pd.to_datetime([100], unit="s")
    left = pa.table({"k": pa.array([1], pa.int64()),
                     "lt": pa.array(ts, pa.timestamp("us")),
                     "lid": pa.array([0], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "rt": pa.array(ts, pa.timestamp("us"))})
    got = asof_join_latest(rd.from_arrow(left), rd.from_arrow(right),
                           "k", "k", "lt", "rt", "lid").to_pandas()
    assert got["asof_ts"][0] == ts[0]


def test_asof_join_next_matches_duckdb(ray_session):
    """Forward as-of (earliest right at-or-after, by time negation) vs a
    MIN() join twin, with a key that has no right rows (nulls), keys
    forced across block boundaries, and equal-time rows matching."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.asof import asof_join_next

    rng = np.random.default_rng(21)
    n_l, n_r = 3000, 2000
    left = pa.table({
        "k": pa.array(rng.integers(0, 25, n_l), pa.int64()),
        "lt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
                       pa.timestamp("us")),
        "lid": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 25, n_r), pa.int64()),
        "rt": pa.array(pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
                       pa.timestamp("us")),
    })
    right = right.filter(pa.compute.not_equal(right["k"], 24))
    got = (
        asof_join_next(rd.from_arrow(left).repartition(17),
                       rd.from_arrow(right).repartition(13),
                       left_key="k", right_key="k",
                       left_time="lt", right_time="rt", left_id="lid")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.lid, MIN(r.rt) AS asof_ts
        FROM l LEFT JOIN r ON r.k = l.k AND r.rt >= l.lt
        GROUP BY l.lid ORDER BY l.lid
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_next_equal_time(ray_session):
    """right_time == left_time must match (>= is inclusive both ways
    through the negation)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.asof import asof_join_next

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "lt": pa.array(pd.to_datetime([100], unit="s"),
                                    pa.timestamp("us")),
                     "lid": pa.array([0], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "rt": pa.array(pd.to_datetime([100, 200], unit="s"),
                                     pa.timestamp("us"))})
    got = asof_join_next(rd.from_arrow(left), rd.from_arrow(right),
                         "k", "k", "lt", "rt", "lid").to_pandas()
    assert got["asof_ts"].tolist() == [pd.Timestamp("1970-01-01 00:01:40")]
