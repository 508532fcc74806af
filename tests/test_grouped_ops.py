"""Grouped distributed operators: per-group top-k, exact grouped
median, max-gap session stats — DuckDB parity with groups forced across
block boundaries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_grouped_topk_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_topk

    rng = np.random.default_rng(41)
    n = 5000
    t = pa.table({
        "g": pa.array(np.sort(rng.integers(0, 120, n)), pa.int64()),
        "v": pa.array(rng.normal(size=n).round(6)),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    got = (
        grouped_topk(rd.from_arrow(t).repartition(17), ["g"], "v", 3,
                     tie_cols=["id"])
        .to_pandas().sort_values(["g", "v", "id"],
                                 ascending=[True, False, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT g, v, id FROM t
        QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) <= 3
        ORDER BY g, v DESC, id
    """).df()
    pd.testing.assert_frame_equal(got, want.astype({"g": "int64", "id": "int64"}))


def test_grouped_median_matches_duckdb(ray_session):
    """Exact interpolated median per group (even and odd group sizes,
    duplicate values, groups straddling blocks) vs DuckDB MEDIAN."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_median

    rng = np.random.default_rng(47)
    n = 20000
    t = pa.table({
        "g": pa.array(rng.integers(0, 37, n), pa.int64()),
        # low-cardinality values with heavy duplication (the value-counts
        # path's target shape)
        "v": pa.array(rng.integers(1, 50, n).astype("float64") / 2.0),
    })
    got = grouped_median(rd.from_arrow(t).repartition(21), "g", "v").to_pandas()
    got["median"] = got["median"].round(6)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT g, ROUND(MEDIAN(v), 6) AS median FROM t GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(got, want.astype({"g": "int64"}))


def test_grouped_topk_string_keys_and_ties(ray_session):
    """String group keys + string tie columns (the mode-query shape)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_topk

    t = pa.table({
        "g": pa.array(["b", "b", "a", "a", "a", "c"], pa.string()),
        "n": pa.array([5, 5, 9, 9, 2, 1], pa.int64()),
        "v": pa.array(["y", "x", "q", "p", "r", "z"], pa.string()),
    })
    got = grouped_topk(rd.from_arrow(t).repartition(3), ["g"], "n", 1,
                       tie_cols=["v"]).to_pandas().sort_values("g")
    # ties broken by v ascending: a->(9,'p'), b->(5,'x'), c->(1,'z')
    assert list(zip(got["g"], got["n"], got["v"])) == [
        ("a", 9, "p"), ("b", 5, "x"), ("c", 1, "z")]


def test_sorted_merge_left_join_empty_right(ray_session):
    """LEFT OUTER against an empty right side keeps every left row."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "lv": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"rk": pa.array([], pa.int64()),
                      "rv": pa.array([], pa.int64())})
    got = sorted_merge_join(rd.from_arrow(left), rd.from_arrow(right),
                            "k", "rk", ["k", "lv"], ["rv"],
                            how="left").to_pandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3]
    assert got["rv"].isna().all()


def test_session_gap_stats_matches_duckdb(ray_session):
    """Max inter-event gap per user (LAG twin), with one hot user
    spanning many blocks and duplicate timestamps at boundaries."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import session_gap_stats

    rng = np.random.default_rng(53)
    n = 6000
    users = np.sort(np.concatenate([
        np.zeros(3000, np.int64),                 # one hot user
        rng.integers(1, 80, n - 3000),            # many small users
    ]))
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(pd.to_datetime(rng.integers(0, 5000, n), unit="s"),
                       pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    got = (
        session_gap_stats(rd.from_arrow(t).repartition(23),
                          "user_id", "ts", "event_id")
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(MAX(gap) AS BIGINT) AS max_gap_us
        FROM g GROUP BY user_id HAVING COUNT(*) > 1 ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_grouped_topk_hot_group_many_blocks(ray_session):
    """A single group spanning every block: top-k must come out exact
    even though every block only ships its first k rows."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_topk

    rng = np.random.default_rng(43)
    n = 4000
    t = pa.table({
        "g": pa.array(np.zeros(n, np.int64), pa.int64()),
        "v": pa.array(rng.permutation(n).astype("float64")),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    got = grouped_topk(rd.from_arrow(t).repartition(16), ["g"], "v", 5,
                       tie_cols=["id"]).to_pandas()
    got = got.sort_values("v", ascending=False).reset_index(drop=True)
    assert len(got) == 5
    assert got["v"].tolist() == [float(n - 1 - i) for i in range(5)]


def test_pivoted_counts_matches_duckdb(ray_session):
    """Crosstab counts vs COUNT(*) FILTER twins; null pivot values and
    values outside the category list count nowhere."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import pivoted_counts

    rng = np.random.default_rng(5)
    n = 2000
    g = rng.integers(0, 30, n)
    cats = np.array(["a", "b", "c", "zz"], dtype=object)  # zz not pivoted
    pv = cats[rng.integers(0, 4, n)]
    pv[rng.random(n) < 0.05] = None
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "p": pa.array(pv, pa.string())})
    out = pivoted_counts(rd.from_arrow(t).repartition(13), ["g"], "p",
                         ["a", "b", "c"]).to_pandas()
    want = duckdb.connect().execute("""
        SELECT g, COUNT(*) FILTER (WHERE p = 'a') AS n_a,
               COUNT(*) FILTER (WHERE p = 'b') AS n_b,
               COUNT(*) FILTER (WHERE p = 'c') AS n_c
        FROM t GROUP BY g ORDER BY g
    """).fetch_df()
    got = out.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_string_agg_matches_duckdb(ray_session):
    """Order-sensitive STRING_AGG with groups straddling blocks, null
    values skipped, and string keys."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_string_agg

    rng = np.random.default_rng(71)
    n = 1500
    g = rng.integers(0, 40, n)
    v = rng.integers(0, 1000, n).astype(object)
    v[rng.random(n) < 0.05] = None  # STRING_AGG skips nulls
    o = rng.permutation(n)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64()),
                  "o": pa.array(o, pa.int64())})
    out = grouped_string_agg(rd.from_arrow(t).repartition(17), ["g"],
                             "v", ["o"], rows_hint=n).to_pandas()
    want = duckdb.connect().execute("""
        SELECT g, STRING_AGG(CAST(v AS VARCHAR), ',' ORDER BY o) AS agg
        FROM t GROUP BY g ORDER BY g
    """).fetch_df()
    got = out.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_hll_matches_dense_sketch_and_truth(ray_session):
    """Per-group sparse-exchange HLL estimates are BIT-IDENTICAL to the
    dense HyperLogLog class over each group's values, and within 5% of
    exact cardinality at p=12."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import grouped_hll_estimate
    from advanced_data_profile_ray.state.hll import HyperLogLog, hash64_arrow

    rng = np.random.default_rng(31)
    gs, vs = [], []
    truth = {}
    for gi, (g, card) in enumerate([("a", 17), ("b", 1000), ("c", 20000)]):
        n = card * 3
        vals = rng.integers(0, card, n)  # ~card distinct, with repeats
        gs.extend([g] * n)
        # fixed per-group offset — hash(g) is PYTHONHASHSEED-randomized
        # and made the 5% error-bound check a fresh random trial per run
        vs.extend((vals + gi * 1_000_000).tolist())
        truth[g] = len(set(vs[-n:]))
    t = pa.table({"g": pa.array(gs), "v": pa.array(vs, pa.int64())})
    got = grouped_hll_estimate(rd.from_arrow(t).repartition(13), "g", "v",
                               p=12)
    est = dict(zip(got["g"].to_pylist(), got["approx_distinct"].to_pylist()))
    assert set(est) == {"a", "b", "c"}
    for g in est:
        mask = pa.array(np.array(gs, dtype=object) == g)
        vals = t.filter(mask)["v"]
        ref = HyperLogLog.from_hashes(hash64_arrow(vals), p=12).estimate()
        assert est[g] == ref  # identical arithmetic, sparse vs dense
        # 5% relative, with ±2 absolute slack for tiny groups where a
        # single register collision exceeds 5% (card 16 → one collision
        # is 6%)
        assert abs(est[g] - truth[g]) <= max(0.05 * truth[g], 2)


def test_price_deciles_emission_rule(ray_session, tmp_path):
    """Exact grouped deciles: each (group, decile) is emitted by exactly
    one distinct-value row (the 10·(cum−w) < d·tot ≤ 10·cum rule), and
    the values match DuckDB's cumulative selection on a duplicate-heavy
    skewed sample — incl. a group so skewed one value covers many
    deciles at once."""
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(11)
    flags = np.concatenate([
        np.repeat("A", 4000), np.repeat("N", 300), np.repeat("R", 7)])
    price = np.concatenate([
        np.round(rng.choice([1.0, 2.5, 2.5, 9.99, 100.0], 4000), 2),
        np.full(300, 42.42),      # one value covers ALL nine deciles
        np.round(rng.uniform(1, 10, 7), 2),
    ])
    t = pa.table({"l_returnflag": pa.array(flags.astype(object)),
                  "l_extendedprice": pa.array(price, pa.float64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")

    got = QUERIES["price_deciles_by_flag"](str(tmp_path))
    # exactly one row per (flag, decile)
    assert len(got) == 27
    assert not got.duplicated(["l_returnflag", "decile"]).any()
    assert (got[got.l_returnflag == "N"]["value"] == 42.42).all()

    want = duckdb.connect().execute("""
        WITH vc AS (SELECT l_returnflag AS g,
                           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
                           COUNT(*) AS w
                    FROM t GROUP BY 1, 2),
        cw AS (SELECT g, c,
                      SUM(w) OVER (PARTITION BY g ORDER BY c) AS cum,
                      SUM(w) OVER (PARTITION BY g) AS tot
               FROM vc),
        d AS (SELECT unnest(range(1, 10)) AS dec)
        SELECT g AS l_returnflag, CAST(dec AS BIGINT) AS decile,
               ROUND(MIN(c) / 100.0, 2) AS value
        FROM cw, d WHERE 10 * cum >= dec * tot
        GROUP BY g, dec ORDER BY g, dec
    """).fetch_df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_regr_by_flag_degenerate_groups(ray_session, tmp_path):
    """REGR_* twin semantics on degenerate groups: constant-y over
    varying x is a perfect fit (r2 = 1.0, REGR_R2's convention), n is
    pairwise-complete (REGR_COUNT), and constant-x gives NULL slope."""
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import ORACLE, QUERIES

    t = pa.table({
        "l_returnflag": pa.array(["A"] * 4 + ["N"] * 3 + ["R"] * 3),
        "l_quantity": pa.array([1.0, 2, 3, None, 1, 2, 3, 5, 5, 5],
                               pa.float64()),
        "l_extendedprice": pa.array([10.0, 20, 30, 40, 7, 7, 7, 1, 2, 3],
                                    pa.float64()),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = QUERIES["regr_by_flag"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    want = con.sql(ORACLE["regr_by_flag"]).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    assert got.set_index("l_returnflag").loc["N", "r2"] == 1.0
    assert got.set_index("l_returnflag").loc["A", "n"] == 3
