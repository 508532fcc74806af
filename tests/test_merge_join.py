"""Sort-merge equi-join: DuckDB INNER JOIN parity with keys straddling
many sorted blocks, one-sided keys, and duplicate keys on both sides."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_sorted_merge_join_matches_duckdb(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    rng = np.random.default_rng(23)
    n_l, n_r = 4000, 1500
    left = pa.table({
        "k": pa.array(rng.integers(0, 300, n_l), pa.int64()),
        "lv": pa.array(rng.normal(size=n_l).round(6)),
    })
    # keys 250..299 exist only on the left (dropped from output);
    # keys repeat on both sides (cross products per key)
    right = pa.table({
        "rk": pa.array(rng.integers(0, 250, n_r), pa.int64()),
        "rv": pa.array(np.arange(n_r), pa.int64()),
    })
    got = (
        sorted_merge_join(rd.from_arrow(left).repartition(19),
                          rd.from_arrow(right).repartition(7),
                          "k", "rk", ["k", "lv"], ["rv"])
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.rk
        ORDER BY l.k, l.lv, r.rv
    """).df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "rv": "int64"}),
        want.astype({"k": "int64", "rv": "int64"}))


def test_sorted_merge_left_join_matches_duckdb(ray_session):
    """LEFT OUTER mode: unmatched left keys keep a null right payload,
    with left-only keys both interior to blocks and straddling edges."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    rng = np.random.default_rng(31)
    n_l, n_r = 3000, 800
    # left keys 0..299, right only 0..149: half the keys are unmatched
    left = pa.table({
        "k": pa.array(rng.integers(0, 300, n_l), pa.int64()),
        "lv": pa.array(np.arange(n_l), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.integers(0, 150, n_r), pa.int64()),
        "rv": pa.array(np.arange(n_r), pa.int64()),
    })
    got = (
        sorted_merge_join(rd.from_arrow(left).repartition(13),
                          rd.from_arrow(right).repartition(5),
                          "k", "rk", ["k", "lv"], ["rv"], how="left")
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.rk
        ORDER BY l.k, l.lv, r.rv
    """).df()
    got["rv"] = got["rv"].astype("float64")  # nulls -> NaN on both sides
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "lv": "int64"}),
        want.astype({"k": "int64", "lv": "int64", "rv": "float64"}))


def test_sorted_merge_join_oversize_key_skipped(ray_session):
    """A key whose pair product exceeds the cap is skipped, not exploded."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    left = pa.table({"k": pa.array([1] * 200 + [2], pa.int64()),
                     "lv": pa.array(range(201), pa.int64())})
    right = pa.table({"rk": pa.array([1] * 200 + [2], pa.int64()),
                      "rv": pa.array(range(201), pa.int64())})
    got = sorted_merge_join(rd.from_arrow(left), rd.from_arrow(right),
                            "k", "rk", ["k", "lv"], ["rv"],
                            max_pairs_per_key=1000).to_pandas()
    # key 1 (200x200 = 40000 pairs) skipped; key 2 (1x1) survives
    assert got["k"].tolist() == [2]


def test_sorted_merge_join_elongated_key_deterministic(ray_session):
    """A key under the pair cap but with one side longer than edge_clip
    must be skipped identically whether its run is interior to one block
    or straddles block boundaries (round-2 advice: output must be a
    function of the data, not of block layout)."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    # max_pairs 1.1M -> edge_clip = 2*sqrt(1.1e6) ~= 2097; key 1 is
    # elongated (2500 x 1 = 2500 pairs, far under the cap) and key 2 normal
    left = pa.table({"k": pa.array([1] * 2500 + [2] * 3, pa.int64()),
                     "lv": pa.array(range(2503), pa.int64())})
    right = pa.table({"rk": pa.array([1, 2], pa.int64()),
                      "rv": pa.array([100, 200], pa.int64())})
    outs = []
    for parts in (1, 13):  # interior run vs straddling runs
        got = sorted_merge_join(
            rd.from_arrow(left).repartition(parts), rd.from_arrow(right),
            "k", "rk", ["k", "lv"], ["rv"], max_pairs_per_key=1_100_000,
        ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # elongated key 1 dropped in BOTH layouts; key 2 fully joined
    assert outs[0]["k"].tolist() == [2, 2, 2]


def test_full_outer_join_matches_duckdb(ray_session):
    """FULL OUTER mode: unmatched rows of both sides emit with nulls
    opposite, and null-key rows on either side survive as unmatched —
    exact SQL semantics, groups forced across block boundaries."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import sorted_merge_join

    rng = np.random.default_rng(23)
    nl, nr = 900, 700
    lk = rng.integers(0, 300, nl).astype(object)
    rk = rng.integers(150, 450, nr).astype(object)
    lk[rng.random(nl) < 0.04] = None  # null keys: emit, never match
    rk[rng.random(nr) < 0.04] = None
    left = pa.table({"lk": pa.array(lk, pa.int64()),
                     "lv": pa.array(np.arange(nl), pa.int64())})
    right = pa.table({"rk": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(nr) * 10, pa.int64())})
    out = sorted_merge_join(
        rd.from_arrow(left).repartition(9),
        rd.from_arrow(right).repartition(7),
        "lk", "rk", ["lk", "lv"], ["rk", "rv"], how="full",
        rows_hint=nl + nr,
    ).to_pandas()
    con = duckdb.connect()
    con.register("ltab", left.to_pandas())
    con.register("rtab", right.to_pandas())
    want = con.execute("""
        SELECT l.lk, l.lv, r.rk, r.rv
        FROM ltab l FULL OUTER JOIN rtab r ON l.lk = r.rk
    """).fetch_df()
    key = ["lk", "lv", "rk", "rv"]
    got = out[key].sort_values(key, na_position="last").reset_index(drop=True)
    want = want[key].sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skew_resilient_join_matches_duckdb(ray_session):
    """A hot key far beyond the merge join's bounded-rows-per-key cap
    joins exactly via the broadcast sideband; cold keys take the sort
    path. Plain sorted_merge_join SKIPS the hot key by contract — the
    skew plan must not."""
    import duckdb
    import ray.data as rd

    from advanced_data_profile_ray.stages.merge_join import (
        skew_resilient_join, sorted_merge_join)

    rng = np.random.default_rng(83)
    n_hot, n_cold = 30000, 5000
    lk = np.concatenate([np.full(n_hot, 777), rng.integers(0, 900, n_cold)])
    left = pa.table({"lk": pa.array(lk, pa.int64()),
                     "lv": pa.array(np.arange(lk.size), pa.int64())})
    rk = np.concatenate([[777, 777, 777], rng.integers(0, 900, 800)])
    right = pa.table({"rk": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(rk.size) * 7, pa.int64())})
    out = skew_resilient_join(
        rd.from_arrow(left).repartition(16), rd.from_arrow(right).repartition(6),
        "lk", "rk", ["lk", "lv"], ["rv"], hot_threshold=1000,
        rows_hint=lk.size + rk.size,
    ).to_pandas()
    con = duckdb.connect()
    con.register("ltab", left.to_pandas())
    con.register("rtab", right.to_pandas())
    want = con.execute("""
        SELECT l.lk, l.lv, r.rv FROM ltab l JOIN rtab r ON l.lk = r.rk
    """).fetch_df()
    key = ["lk", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)  # 90k hot pairs + cold pairs, none skipped
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: the plain merge join DOES skip the hot key at these caps
    plain = sorted_merge_join(
        rd.from_arrow(left).repartition(16), rd.from_arrow(right).repartition(6),
        "lk", "rk", ["lk", "lv"], ["rv"],
        max_pairs_per_key=250_000, rows_hint=lk.size + rk.size,
    ).to_pandas()
    assert len(plain) < len(want)
