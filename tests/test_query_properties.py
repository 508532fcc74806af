"""Property tests for the continuation-session operators: the
distributed composition must equal a brute-force single-process oracle
on arbitrary small inputs (extends §2.10's merge-invariant strategy to
the skyline / triangle / winsorized primitives)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from advanced_data_profile_ray.pipelines.queries import (
    q_part_graph_triangles,
    q_part_skyline,
    q_winsorized_price_mean,
)


def _brute_skyline(pts):
    """All points not dominated by any other (cheaper price, larger
    size, strict in at least one)."""
    keep = []
    for i, (k, p, s) in enumerate(pts):
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for j, (_, p2, s2) in enumerate(pts) if j != i)
        if not dominated:
            keep.append((k, p, s))
    return sorted(keep)


@given(st.lists(st.tuples(st.integers(0, 20),       # price cents (tiny domain → ties)
                          st.integers(0, 5)),       # size
                min_size=1, max_size=40))
@settings(max_examples=25, deadline=None)
def test_skyline_matches_bruteforce(ray_session, tmp_path_factory, data):
    tmp = tmp_path_factory.mktemp("sky")
    pts = [(i, p, s) for i, (p, s) in enumerate(data)]
    t = pa.table({
        "p_partkey": pa.array([k for k, _, _ in pts], pa.int64()),
        "p_retailprice": pa.array([p / 100.0 for _, p, _ in pts],
                                  pa.float64()),
        "p_size": pa.array([s for _, _, s in pts], pa.int64()),
    })
    pq.write_table(t, str(tmp / "part.parquet"))
    out = q_part_skyline(str(tmp))
    got = sorted(zip(out["p_partkey"].astype(int),
                     (out["p_retailprice"] * 100).round().astype(int),
                     out["p_size"].astype(int)))
    assert got == _brute_skyline(pts)


def _brute_triangles(edges):
    es = set(edges)
    nodes = sorted({x for e in edges for x in e})
    tri = 0
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) not in es:
                continue
            for w in nodes[nodes.index(v) + 1:]:
                if (v, w) in es and (u, w) in es:
                    tri += 1
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(edges), wedges, tri


@given(st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
               min_size=0, max_size=20))
@settings(max_examples=25, deadline=None)
def test_triangles_match_bruteforce(ray_session, tmp_path_factory, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    tmp = tmp_path_factory.mktemp("tri")
    rows_o, rows_p = [], []
    oid = 1
    for u, v in edges:  # two orders per edge -> survives support-2
        for _ in range(2):
            rows_o.extend([oid, oid])
            rows_p.extend([u, v])
            oid += 1
    if not rows_o:  # empty graph still needs a readable parquet file
        rows_o, rows_p = [1], [0]
        edges = []
    t = pa.table({"l_orderkey": pa.array(rows_o, pa.int64()),
                  "l_partkey": pa.array(rows_p, pa.int64())})
    pq.write_table(t, str(tmp / "lineitem.parquet"))
    out = q_part_graph_triangles(str(tmp))
    n_edges, wedges, tri = _brute_triangles(edges)
    assert out.iloc[0]["n_edges"] == n_edges
    assert out.iloc[0]["n_wedges"] == wedges
    assert out.iloc[0]["n_triangles"] == tri


@given(st.lists(st.integers(1, 10_000), min_size=3, max_size=200))
@settings(max_examples=25, deadline=None)
def test_winsorized_mean_matches_numpy(ray_session, tmp_path_factory,
                                       cents):
    tmp = tmp_path_factory.mktemp("win")
    t = pa.table({"l_extendedprice": pa.array(
        [c / 100.0 for c in cents], pa.float64())})
    pq.write_table(t, str(tmp / "lineitem.parquet"))
    out = q_winsorized_price_mean(str(tmp))
    arr = np.sort(np.array(cents, dtype=np.int64))
    n = arr.size
    # PERCENTILE_DISC(q): smallest value with cumulative share >= q
    p05 = arr[int(np.ceil(0.05 * n)) - 1 if 0.05 * n == int(0.05 * n)
              else int(np.floor(0.05 * n))]
    p95 = arr[int(np.ceil(0.95 * n)) - 1 if 0.95 * n == int(0.95 * n)
              else int(np.floor(0.95 * n))]
    clipped = np.clip(arr, p05, p95)
    total = int(clipped.sum())
    mean6 = (total * 10000 + n // 2) // n
    assert out.iloc[0]["p05"] == pytest.approx(p05 / 100.0)
    assert out.iloc[0]["p95"] == pytest.approx(p95 / 100.0)
    assert out.iloc[0]["winsorized_mean"] == pytest.approx(mean6 / 1e6)
    assert out.iloc[0]["n_rows"] == n


def test_out_of_order_census_planted(ray_session, tmp_path):
    """Planted out-of-order arrivals whose running max crosses block
    boundaries — verified against the exact quadratic definition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(5)
    n = 5000
    # mostly increasing ts with 10% shuffled backwards by up to 1000s
    base = np.cumsum(rng.integers(0, 3_000_000, n))
    late = rng.random(n) < 0.1
    ts = base - np.where(late, rng.integers(1, 1_000_000_000, n), 0)
    t = pa.table({"event_id": pa.array(np.arange(n), pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "events.parquet")

    out = QUERIES["out_of_order_census"](str(tmp_path))

    prev = np.empty(n, dtype=np.int64)
    prev[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(ts.astype(np.int64)[:-1], out=prev[1:])
    is_late = ts < prev
    lateness = np.where(is_late, prev - ts, 0)
    assert out["n_events"].iat[0] == n
    assert out["n_late"].iat[0] == int(is_late.sum()) > 0
    assert out["max_lateness_us"].iat[0] == int(lateness.max())
    assert out["total_lateness_us"].iat[0] == int(lateness.sum())


def test_conv_template_census_planted(ray_session, tmp_path):
    """Planted repeated event-type sequences: 40 convs share template A,
    25 share template B, the rest are unique — the census must count
    and rank them exactly (DuckDB STRING_AGG twin in-test)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rng = np.random.default_rng(9)
    rows = []
    eid = 0

    def add_conv(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": np.datetime64(uid * 10_000_000 + i * 1000,
                                             "us"),
                         "event_type": et})
            eid += 1

    uid = 0
    for _ in range(40):
        add_conv(uid, ["view", "click", "purchase"]); uid += 1
    for _ in range(25):
        add_conv(uid, ["view", "view"]); uid += 1
    for _ in range(30):
        n = int(rng.integers(4, 9))
        add_conv(uid, list(rng.choice(
            ["view", "click", "purchase", "refund", "login"], n))); uid += 1
    t = pa.table(pd.DataFrame(rows))
    pq.write_table(t, tmp_path / "events.parquet")

    got = QUERIES["conv_template_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["conv_template_census"]).fetchdf()
    con.close()
    assert got["sequence"].tolist() == exp["seq" if "seq" in exp else
                                           "sequence"].tolist()
    assert got["n_convs"].tolist() == exp["n_convs"].tolist()
    assert got["n_convs"].iat[0] == 40 and got["n_convs"].iat[1] == 25


def test_degenerate_inputs_return_typed_empty(ray_session, tmp_path):
    """Review regressions: single-week events (psi_weekly_types) and
    disjoint source vocabularies (source_token_overlap) must return
    typed EMPTY frames like their inner-join/grid oracles, not crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    t = pa.table({"event_id": pa.array(range(10), pa.int64()),
                  "user_id": pa.array([1] * 10, pa.int64()),
                  "ts": pa.array([np.datetime64("2024-01-01T00:00:00",
                                                "us")] * 10),
                  "event_type": pa.array(["view"] * 10),
                  "value": pa.array([1.0] * 10)})
    pq.write_table(t, tmp_path / "events.parquet")
    psi = QUERIES["psi_weekly_types"](str(tmp_path))
    assert psi.shape == (0, 2) and list(psi.columns) == ["week", "psi"]

    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["alpha beta", "gamma delta"]),
                   "source": pa.array(["s1", "s2"]),
                   "lang": pa.array(["en", "en"]),
                   "n_chars": pa.array([10, 11], pa.int64())})
    pq.write_table(t2, tmp_path / "documents.parquet")
    ov = QUERIES["source_token_overlap"](str(tmp_path))
    assert ov.shape == (0, 5)


def test_km_lifetimes_censoring_planted(ray_session, tmp_path):
    """Planted non-purchasers must enter the risk set and exit as
    censored at their last observed day — DuckDB twin in-test (the
    driver testdata has zero censored users, so this path is pinned
    here)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0

    def add(uid, day, et):
        nonlocal eid
        rows.append({"event_id": eid, "user_id": uid,
                     "ts": np.datetime64("2024-01-01", "us")
                     + np.timedelta64(day, "D").astype("timedelta64[us]"),
                     "event_type": et, "value": 1.0})
        eid += 1

    # 10 converters at t=2, 5 at t=5, 8 censored at t=3, 4 censored t=7
    uid = 0
    for _ in range(10):
        add(uid, 0, "view"); add(uid, 2, "purchase"); uid += 1
    for _ in range(5):
        add(uid, 0, "view"); add(uid, 5, "purchase"); uid += 1
    for _ in range(8):
        add(uid, 0, "view"); add(uid, 3, "click"); uid += 1
    for _ in range(4):
        add(uid, 0, "view"); add(uid, 7, "click"); uid += 1
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["km_lifetimes"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["km_lifetimes"]).fetchdf()
    con.close()
    assert got.shape == exp.shape == (2, 5)
    assert (got.values == exp[got.columns].values).all()
    # t=2: all 27 at risk, 10 deaths; t=5: risk = 27-10-8 = 9, 5 deaths
    assert got.loc[0].tolist()[:4] == [2, 27, 10, 0]
    assert got.loc[1].tolist()[:4] == [5, 9, 5, 0]


def test_dow_profile_outliers_planted(ray_session, tmp_path):
    """A planted composition-shifted day (same volume, skewed type mix)
    must be flagged while normal days are not — DuckDB twin in-test
    (driver testdata flags no days, so the >15 path is pinned here)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0
    base = np.datetime64("2024-01-01", "us")
    for day in range(21):
        # normal mix: 40 view / 40 click / 20 purchase
        mix = [("view", 40), ("click", 40), ("purchase", 20)]
        if day == 9:  # planted: all purchase, same total volume
            mix = [("view", 0), ("click", 0), ("purchase", 100)]
        for et, cnt in mix:
            for i in range(cnt):
                rows.append({"event_id": eid, "user_id": eid % 7,
                             "ts": base + np.timedelta64(day, "D")
                             .astype("timedelta64[us]")
                             + np.timedelta64(i, "s")
                             .astype("timedelta64[us]"),
                             "event_type": et, "value": 1.0})
                eid += 1
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["dow_profile_outliers"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["dow_profile_outliers"]).fetchdf()
    con.close()
    assert len(got) >= 1
    flagged = got["day"].astype("datetime64[us]").tolist()
    assert (base + np.timedelta64(9, "D").astype("timedelta64[us]")
            in flagged)
    assert got.shape == exp.shape
    assert (got["chi2"].to_numpy() == exp["chi2"].to_numpy()).all()


def test_source_ttr_planted_extremes(ray_session, tmp_path):
    """A source repeating one token has TTR -> 1/N and Herdan C -> 0;
    a source of all-unique tokens has TTR = 1 and Herdan C = 1 —
    DuckDB twin in-test on the same planted table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    docs = []
    for i in range(10):
        docs.append({"doc_id": i, "source": "boiler",
                     "text": "the " * 50, "lang": "en", "n_chars": 200})
    # letter-only tokens: the suite tokenizer is [a-z']+, digits split
    uniq = " ".join(
        "tok" + "".join(chr(ord("a") + (j // 26 ** p) % 26)
                        for p in range(3))
        for j in range(500))
    docs.append({"doc_id": 100, "source": "varied", "text": uniq,
                 "lang": "en", "n_chars": len(uniq)})
    pq.write_table(pa.table(pd.DataFrame(docs)),
                   tmp_path / "documents.parquet")

    got = QUERIES["source_ttr"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["source_ttr"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    b = got[got["source"] == "boiler"].iloc[0]
    v = got[got["source"] == "varied"].iloc[0]
    assert b["n_vocab"] == 1 and b["n_tokens"] == 500
    assert b["ttr"] == round(1 / 500, 6) and b["herdan_c"] == 0.0
    assert v["ttr"] == 1.0 and v["herdan_c"] == 1.0


def test_gap_expfit_ks_planted(ray_session, tmp_path):
    """Constant gaps (degenerate distribution) score a large KS against
    the exponential fit (D = 1 - 1/e at the single step, ~0.632);
    geometric-spread gaps score much lower — and the engine matches
    the DuckDB twin exactly on both tables."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    base = np.datetime64("2024-01-01", "us")

    def build(gaps, d):
        rows = []
        eid = 0
        for uid in range(40):
            t = base
            rows.append({"event_id": eid, "user_id": uid, "ts": t,
                         "event_type": "view", "value": 1.0})
            eid += 1
            for g in gaps:
                t = t + np.timedelta64(int(g) * 1_000_000, "us")
                rows.append({"event_id": eid, "user_id": uid, "ts": t,
                             "event_type": "view", "value": 1.0})
                eid += 1
        d.mkdir()
        pq.write_table(pa.table(pd.DataFrame(rows)),
                       d / "events.parquet")

    build([60] * 20, tmp_path / "const")
    # quantiles of Exp(mean 60): -60*ln(1-p) at p = (i+0.5)/20
    ps = (np.arange(20) + 0.5) / 20
    build(np.maximum(1, np.round(-60 * np.log(1 - ps))).astype(int),
          tmp_path / "expish")

    got_c = QUERIES["gap_expfit_ks"](str(tmp_path / "const"))
    got_e = QUERIES["gap_expfit_ks"](str(tmp_path / "expish"))
    for sub, got in [("const", got_c), ("expish", got_e)]:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{sub}/events.parquet')")
        exp = con.execute(ORACLE["gap_expfit_ks"]).fetchdf()
        con.close()
        assert (got.values == exp[got.columns].values).all(), sub
    assert got_c["ks"].iloc[0] > 0.6          # 1 - 1/e ≈ 0.632
    assert got_e["ks"].iloc[0] < 0.15
    assert int(got_c["n_gaps"].iloc[0]) == 40 * 20


def test_knn_label_purity_planted_clusters(ray_session, tmp_path):
    """Well-separated planted clusters score purity 1.0 per label;
    randomly relabeled vectors collapse toward 1/n_labels — engine
    matches the DuckDB twin exactly on both tables."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rng = np.random.RandomState(3)
    centers = rng.normal(0, 1, (4, 16)) * 10
    vecs, labs = [], []
    for lab in range(4):
        for _ in range(30):
            vecs.append(centers[lab] + rng.normal(0, 0.05, 16))
            labs.append(lab)
    vecs = np.asarray(vecs, np.float32)

    def build(labels, d):
        d.mkdir()
        t = pa.table({
            "vec_id": pa.array(range(len(labels)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32())})
        pq.write_table(t, d / "embeddings.parquet")

    build(labs, tmp_path / "clean")
    build(list(rng.permutation(labs)), tmp_path / "shuffled")

    for sub, bound in [("clean", None), ("shuffled", 0.6)]:
        got = QUERIES["knn_label_purity"](str(tmp_path / sub))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{sub}/embeddings.parquet')")
        exp = con.execute(ORACLE["knn_label_purity"]).fetchdf()
        con.close()
        assert (got.values == exp[got.columns].values).all(), sub
        if bound is None:
            assert (got["purity"] == 1.0).all()
        else:
            assert got["purity"].mean() < bound


def test_part_pagerank_planted_hub(ray_session, tmp_path):
    """A planted star-plus-chain basket graph must rank the hub part
    highest, match the in-test DuckDB recursive-CTE twin exactly, and
    sum to ~1 (PageRank is a distribution over the co-purchase
    graph)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    # hub part 1 co-ordered with 2..9 (star); chain 10-11-12
    for i, other in enumerate(range(2, 10)):
        rows.append({"l_orderkey": 100 + i, "l_partkey": 1})
        rows.append({"l_orderkey": 100 + i, "l_partkey": other})
    rows += [{"l_orderkey": 200, "l_partkey": 10},
             {"l_orderkey": 200, "l_partkey": 11},
             {"l_orderkey": 201, "l_partkey": 11},
             {"l_orderkey": 201, "l_partkey": 12}]
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "lineitem.parquet")

    got = QUERIES["part_pagerank"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["part_pagerank"]).fetchdf()
    con.close()
    assert got.shape == exp.shape == (12, 2)
    assert (got["part"].to_numpy() == exp["part"].to_numpy()).all()
    assert (got["pagerank"].to_numpy() == exp["pagerank"].to_numpy()).all()
    top = got.loc[got["pagerank"].idxmax(), "part"]
    assert top == 1
    assert abs(got["pagerank"].sum() - 1.0) < 1e-3


def test_weighted_sample_docs_planted(ray_session, tmp_path):
    """Deterministic Efraimidis-Spirakis: two runs return the identical
    sample, the in-test DuckDB twin agrees exactly, and 100x-weighted
    docs are drawn far above their uniform share."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    n = 5000
    # doc_ids 0..499 are heavy (n_chars 10000), the rest light (100)
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_chars": np.where(np.arange(n) < 500, 10000, 100).astype(
            np.int64)})
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")

    got1 = QUERIES["weighted_sample_docs"](str(tmp_path))
    got2 = QUERIES["weighted_sample_docs"](str(tmp_path))
    assert got1.equals(got2)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["weighted_sample_docs"]).fetchdf()
    con.close()
    assert len(got1) == 200
    assert (got1["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    heavy = int((got1["doc_id"] < 500).sum())
    # heavy docs hold 500*10000 / (500*10000 + 4500*100) ≈ 92% of the
    # total weight; uniform would give 10%. Expect a strong majority.
    assert heavy > 140, heavy


def test_tool_conformance_census_planted(ray_session, tmp_path):
    """Planted protocol violations — a tool turn after a user turn and
    a conversation OPENING with a tool turn — are both counted
    nonconforming; the in-test DuckDB LAG twin agrees exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    # role map: click/view->user, signup->system, purchase->assistant,
    # error->tool
    rows = []
    eid = 0

    def add(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": np.datetime64(uid * 10_000_000 + i * 1000,
                                             "us"),
                         "event_type": et, "value": 1.0,
                         "props": "{}"})
            eid += 1

    add(0, ["view", "purchase", "error"])            # conforming tool
    add(1, ["view", "error"])                        # tool after user: bad
    add(2, ["error", "view"])                        # opens with tool: bad
    add(3, ["view", "purchase", "error", "error"])   # ok + tool-after-tool
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["tool_conformance_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["tool_conformance_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert int(got["n_tool_turns"].iloc[0]) == 5
    assert int(got["n_conforming"].iloc[0]) == 2
    assert int(got["n_nonconforming"].iloc[0]) == 3


def test_user_value_ewma_cross_block(ray_session, tmp_path):
    """One user with a 200k-row stream (spans many sorted blocks, so
    the affine (a, b) carry composes across fragments) must equal the
    sequential numpy recurrence to 1e-6 and the in-test closed-form
    DuckDB twin exactly; a planted constant stream converges to the
    constant."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rng = np.random.RandomState(12)
    n = 200_000
    vals = np.round(rng.gamma(2.0, 30.0, n), 2)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(np.concatenate(
            [np.zeros(n - 50, np.int64), np.ones(50, np.int64)])),
        "ts": pa.array(np.arange(n) * 1_000_000, pa.timestamp("us")),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.concatenate([vals[:n - 50],
                                          np.full(50, 7.25)]))})
    pq.write_table(t, tmp_path / "events.parquet")

    got = QUERIES["user_value_ewma"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["user_value_ewma"]).fetchdf()
    con.close()
    assert got.shape == exp.shape == (2, 3)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["ewma"].to_numpy() == exp["ewma"].to_numpy()).all()

    s = 0.0
    for x in vals[:n - 50]:
        s = 0.8 * s + 0.2 * x
    assert abs(got.loc[got["user_id"] == 0, "ewma"].iloc[0] - s) < 1e-6
    # 50 iterations of 0.8-decay from 0 toward 7.25: 7.25*(1-0.8^50)
    assert abs(got.loc[got["user_id"] == 1, "ewma"].iloc[0]
               - 7.25 * (1 - 0.8 ** 50)) < 1e-6


def test_segment_price_percentile_planted(ray_session, tmp_path):
    """Planted segments: BUDGET customers hold the globally cheapest
    orders (avg percentile near 0), LUXURY the most expensive (near 1)
    — and the census matches the in-test RANK twin exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    cust = pd.DataFrame({
        "c_custkey": np.arange(20, dtype=np.int64),
        "c_mktsegment": ["BUDGET"] * 10 + ["LUXURY"] * 10})
    orders = []
    ok = 0
    for ck in range(20):
        for j in range(5):
            price = (10.0 + ok * 0.25) if ck < 10 else (1000.0 + ok * 0.25)
            orders.append({"o_orderkey": ok, "o_custkey": ck,
                           "o_orderdate": np.datetime64("2024-01-01", "us")
                           + np.timedelta64(j, "D").astype(
                               "timedelta64[us]"),
                           "o_totalprice": price})
            ok += 1
    pq.write_table(pa.table(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.table(pd.DataFrame(orders)),
                   tmp_path / "orders.parquet")

    got = QUERIES["segment_price_percentile"](str(tmp_path))
    con = duckdb.connect()
    for t in ["customer", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    exp = con.execute(ORACLE["segment_price_percentile"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    b = got[got["segment"] == "BUDGET"]["avg_pct_rank"].iloc[0]
    l = got[got["segment"] == "LUXURY"]["avg_pct_rank"].iloc[0]
    assert b < 0.3 and l > 0.7


def test_repeat_order_value_corr_planted(ray_session, tmp_path):
    """Customers whose order values step up by a constant each repeat
    purchase produce near-perfect lag correlation; the engine's Gram
    fold matches DuckDB's corr() on the same pairs to 6dp."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rng = np.random.RandomState(8)
    orders = []
    ok = 0
    for ck in range(200):
        base = float(rng.randint(50, 5000))
        for j in range(6):
            orders.append({"o_orderkey": ok, "o_custkey": ck,
                           "o_orderdate": np.datetime64("2024-01-01", "us")
                           + np.timedelta64(j * 7, "D").astype(
                               "timedelta64[us]"),
                           "o_totalprice": round(base + 10.0 * j, 2)})
            ok += 1
    pq.write_table(pa.table(pd.DataFrame(orders)),
                   tmp_path / "orders.parquet")

    got = QUERIES["repeat_order_value_corr"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    exp = con.execute(ORACLE["repeat_order_value_corr"]).fetchdf()
    con.close()
    assert int(got["n_pairs"].iloc[0]) == 200 * 5
    assert got["corr_prev_next"].iloc[0] == exp["corr_prev_next"].iloc[0]
    assert got["corr_prev_next"].iloc[0] > 0.99


def test_knn_mean_cos_census_planted_outlier(ray_session, tmp_path):
    """A planted isolated vector scores a far lower mean top-10 cosine
    than cluster members; the census matches the in-test twin exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rng = np.random.RandomState(4)
    center = rng.normal(0, 1, 16)
    vecs = [center + rng.normal(0, 0.05, 16) for _ in range(40)]
    vecs.append(-10.0 * center)  # vec_id 40: isolated antipode
    t = pa.table({
        "vec_id": pa.array(range(41), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    pq.write_table(t, tmp_path / "embeddings.parquet")

    got = QUERIES["knn_mean_cos_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    exp = con.execute(ORACLE["knn_mean_cos_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    iso = got.loc[got["vec_id"] == 40, "mean_topk_cos"].iloc[0]
    rest = got.loc[got["vec_id"] != 40, "mean_topk_cos"]
    assert iso < -0.9 and rest.min() > 0.9


def test_open_orders_daily_planted_steps(ray_session, tmp_path):
    """Hand-built intervals with overlaps produce the exact known step
    function (and match the in-test delta/window twin)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    d0 = np.datetime64("2024-01-01", "us")
    # order k opens day k, closes day k + span
    spans = {0: 5, 1: 2, 2: 4, 3: 1}
    orders = [{"o_orderkey": k, "o_orderdate": d0 + k * day}
              for k in spans]
    lines = []
    for k, span in spans.items():
        # two lines; max shipdate decides the close
        lines.append({"l_orderkey": k, "l_shipdate": d0 + (k + 1) * day})
        lines.append({"l_orderkey": k,
                      "l_shipdate": d0 + (k + span) * day})
    pq.write_table(pa.table(pd.DataFrame(orders)),
                   tmp_path / "orders.parquet")
    pq.write_table(pa.table(pd.DataFrame(lines)),
                   tmp_path / "lineitem.parquet")

    got = QUERIES["open_orders_daily"](str(tmp_path))
    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    exp = con.execute(ORACLE["open_orders_daily"]).fetchdf()
    con.close()
    assert (got["n_open"].to_numpy() == exp["n_open"].to_numpy()).all()
    # day-by-day truth: open on d iff open_day <= d < close_day
    days = {int((d0 + i * day - d0) / day): 0 for i in range(9)}
    for k, span in spans.items():
        for d in range(k, k + span):
            days[d] += 1
    step = got.set_index(got["day"].astype("datetime64[us]"))["n_open"]
    for i in range(9):
        d = d0 + i * day
        # step function: value at the latest step point <= d
        vals = step[step.index <= d]
        cur = int(vals.iloc[-1]) if len(vals) else 0
        assert cur == days[i], (i, cur, days[i])


def test_fd_violation_witnesses_planted(ray_session, tmp_path):
    """Planted mixed-flag orders are each materialized with their
    min/max witnesses; clean orders are absent."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    for ok in range(50):
        flags = ["A", "R"] if ok % 5 == 0 else ["N", "N"]
        if ok == 7:
            flags = ["A", "N", "R"]
        for i, f in enumerate(flags):
            rows.append({"l_orderkey": ok, "l_returnflag": f})
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "lineitem.parquet")

    got = QUERIES["fd_violation_witnesses"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["fd_violation_witnesses"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert set(got["l_orderkey"]) == {0, 5, 7, 10, 15, 20, 25, 30, 35,
                                      40, 45}
    r7 = got[got["l_orderkey"] == 7].iloc[0]
    assert (r7["n_flags"], r7["flag_min"], r7["flag_max"]) == (3, "A", "R")


def test_first_response_quantiles_planted(ray_session, tmp_path):
    """Planted conversations with latencies 1..20 s: PERCENTILE_DISC
    p50 = 10 s, p90 = 18 s; a conv whose assistant precedes the user
    and a conv with no assistant are both excluded."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0

    def add(uid, seq):
        nonlocal eid
        for off_s, et in seq:
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": np.datetime64(uid * 10**9
                                             + off_s * 1_000_000, "us"),
                         "event_type": et, "value": 1.0, "props": "{}"})
            eid += 1

    for i in range(1, 21):  # latency i seconds
        add(i, [(0, "view"), (i, "purchase")])
    add(100, [(0, "purchase"), (5, "view")])   # assistant first: excluded
    add(101, [(0, "view"), (3, "click")])      # no assistant: excluded
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["first_response_quantiles"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["first_response_quantiles"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert int(got["n_convs"].iloc[0]) == 20
    assert int(got["p50_us"].iloc[0]) == 10 * 1_000_000
    assert int(got["p90_us"].iloc[0]) == 18 * 1_000_000


def test_user_first_path_census_planted(ray_session, tmp_path):
    """Planted opening paths (30 users view>click>purchase, 20
    view>view, 5 single-event) are censused exactly, later events
    ignored; matches the in-test STRING_AGG twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0

    def add(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": np.datetime64(uid * 10**7 + i * 1000,
                                             "us"),
                         "event_type": et})
            eid += 1

    uid = 0
    for _ in range(30):
        add(uid, ["view", "click", "purchase", "refund", "error"])
        uid += 1
    for _ in range(20):
        add(uid, ["view", "view"]); uid += 1
    for _ in range(5):
        add(uid, ["signup"]); uid += 1
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["user_first_path_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["user_first_path_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    d = dict(zip(got["path"], got["n_users"]))
    assert d == {"view>click>purchase": 30, "view>view": 20, "signup": 5}


def test_cohort_ltv_curve_planted(ray_session, tmp_path):
    """Two planted cohorts with known weekly purchase amounts produce
    the exact cumulative curves (and match the in-test window twin)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    # 2024-01-01 is a Monday; cohort A first seen that week,
    # cohort B the following week
    d0 = np.datetime64("2024-01-01", "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    rows = []
    eid = 0

    def add(uid, off_days, et, val):
        nonlocal eid
        rows.append({"event_id": eid, "user_id": uid,
                     "ts": d0 + off_days * day, "event_type": et,
                     "value": val})
        eid += 1

    for uid in (1, 2):         # cohort A: first seen Mon/Tue wk0
        add(uid, uid - 1, "view", 0.0)
        add(uid, 2, "purchase", 10.0)      # wk offset 0
        add(uid, 9, "purchase", 5.0)       # wk offset 1
    add(3, 7, "view", 0.0)     # cohort B: first seen Mon wk1
    add(3, 8, "purchase", 100.0)           # wk offset 0
    add(3, 21, "purchase", 1.0)            # wk offset 2
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["cohort_ltv_curve"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["cohort_ltv_curve"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    a = got[got["cohort_week"] == pd.Timestamp("2024-01-01")]
    assert a["revenue"].tolist() == [20.0, 10.0]
    assert a["cum_revenue"].tolist() == [20.0, 30.0]
    b = got[got["cohort_week"] == pd.Timestamp("2024-01-08")]
    assert b["week_offset"].tolist() == [0, 2]
    assert b["cum_revenue"].tolist() == [100.0, 101.0]


def test_conv_role_ratio_hist_planted(ray_session, tmp_path):
    """Planted conversations with known assistant:user ratios land in
    the exact integer buckets (0.5 -> 5, 2.0 -> cap 10, 0 -> 0);
    conversations with no user turns are excluded."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0

    def add(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append({"event_id": eid, "user_id": uid,
                         "ts": np.datetime64(uid * 10**7 + i * 1000,
                                             "us"),
                         "event_type": et, "value": 1.0, "props": "{}"})
            eid += 1

    for uid in range(10):       # ratio 1/2 -> bucket 5
        add(uid, ["view", "view", "purchase"])
    for uid in range(10, 14):   # ratio 2 -> bucket 10 (cap)
        add(uid, ["view", "purchase", "purchase"])
    for uid in range(14, 17):   # no assistant -> bucket 0
        add(uid, ["view", "click"])
    add(17, ["purchase", "error"])  # no user turns: excluded
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["conv_role_ratio_hist"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["conv_role_ratio_hist"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    d = dict(zip(got["ratio_decile"], got["n_convs"]))
    assert d == {0: 3, 5: 10, 10: 4}


def test_linenumber_gap_census_planted(ray_session, tmp_path):
    """Planted numbering defects — a gap (1,2,4), a duplicate (1,1,2),
    a zero start (0,1) — are each materialized; clean 1..n orders are
    absent."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    for ok, lns in [(1, [1, 2, 3]), (2, [1, 2, 4]), (3, [1, 1, 2]),
                    (4, [0, 1]), (5, [1])]:
        for ln in lns:
            rows.append({"l_orderkey": ok, "l_linenumber": ln})
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "lineitem.parquet")

    got = QUERIES["linenumber_gap_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["linenumber_gap_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert set(got["l_orderkey"]) == {2, 3, 4}


def test_p90_gap_by_user_planted(ray_session, tmp_path):
    """A user with gaps 1..10 s: PERCENTILE_DISC(0.9) = 9 s (the
    smallest value with cumulative share >= 0.9); matches the in-test
    twin exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    eid = 0
    t = 0
    rows.append({"event_id": eid, "user_id": 1,
                 "ts": np.datetime64(0, "us")})
    eid += 1
    for g in range(1, 11):
        t += g * 1_000_000
        rows.append({"event_id": eid, "user_id": 1,
                     "ts": np.datetime64(t, "us")})
        eid += 1
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")

    got = QUERIES["p90_gap_by_user"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["p90_gap_by_user"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert int(got["p90_gap_us"].iloc[0]) == 9 * 1_000_000
    assert int(got["n_gaps"].iloc[0]) == 10


def test_part_degree_distribution_planted(ray_session, tmp_path):
    """A planted star graph (hub degree 8, leaves degree 1) produces
    the exact two-cell census; twin agrees including the slope."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    for i, leaf in enumerate(range(2, 10)):
        rows.append({"l_orderkey": 100 + i, "l_partkey": 1})
        rows.append({"l_orderkey": 100 + i, "l_partkey": leaf})
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "lineitem.parquet")

    got = QUERIES["part_degree_distribution"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["part_degree_distribution"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    d = dict(zip(got["degree"], got["n_nodes"]))
    assert d == {1: 8, 8: 1}


def test_emd_value_by_type_planted(ray_session, tmp_path):
    """Two types at value 1.0 and 3.0 (two rows each): the global mix is
    half-half, so each type's distribution is 0.5 mass moved distance
    2.0 => EMD exactly 1.0 for both; matches the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "event_type": ["A", "A", "B", "B"],
        "value": [1.0, 1.0, 3.0, 3.0],
    })
    pq.write_table(pa.table(df), tmp_path / "events.parquet")

    got = QUERIES["emd_value_by_type"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["emd_value_by_type"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert got.set_index("event_type")["emd"].to_dict() == {
        "A": 1.0, "B": 1.0}


def test_t_closeness_census_planted(ray_session, tmp_path):
    """Two single-year classes, each concentrated on ONE of two global
    priorities (global is half-half, m=2): per-class ordered EMD is 0.5
    — above the 0.2 gate, so both classes and all 4 rows are at risk;
    matches the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderstatus": ["O", "O", "O", "O"],
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-06-01", "2025-01-01", "2025-06-01"]),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW", "5-LOW"],
    })
    pq.write_table(pa.table(df), tmp_path / "orders.parquet")

    got = QUERIES["t_closeness_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    exp = con.execute(ORACLE["t_closeness_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert float(got["max_t"].iloc[0]) == 0.5
    assert int(got["groups_above_t"].iloc[0]) == 2
    assert int(got["rows_at_risk"].iloc[0]) == 4


def test_kendall_tau_planted_monotone(ray_session, tmp_path):
    """A perfectly concordant staircase gives tau_b = 1; a perfectly
    discordant one gives -1 (no ties anywhere, so tau_b = tau_a); both
    match the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "l_returnflag": ["A"] * 5 + ["B"] * 5,
        "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.0] * 2,
        "l_discount": [0.01, 0.02, 0.03, 0.04, 0.05,
                       0.05, 0.04, 0.03, 0.02, 0.01],
    })
    pq.write_table(pa.table(df), tmp_path / "lineitem.parquet")

    got = QUERIES["kendall_tau_qty_disc_by_flag"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["kendall_tau_qty_disc_by_flag"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert got.set_index("l_returnflag")["tau_b"].to_dict() == {
        "A": 1.0, "B": -1.0}


def test_cliffs_delta_planted_dominance(ray_session, tmp_path):
    """src0 lengths all strictly above src1's => delta = +1; with one
    shared value the tied pair contributes 0 and delta = 7/9; both
    checked against the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "doc_id": range(6),
        "source": ["src0"] * 3 + ["src1"] * 3,
        "n_chars": [10, 11, 12, 5, 6, 7],
    })
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["cliffs_delta_sources"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["cliffs_delta_sources"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert float(got["delta"].iloc[0]) == 1.0

    df.loc[3, "n_chars"] = 10  # one tie: 8 gt, 0 lt, 1 tie -> 8/9
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["cliffs_delta_sources"](str(tmp_path))
    assert float(got["delta"].iloc[0]) == round(8 / 9, 6)


def test_bm25_docs_planted(ray_session, tmp_path):
    """Two tiny docs with hand-checkable tf/dl: scores match both the
    in-test twin and a from-scratch BM25 computation (k1=1.2, b=0.75,
    Lucene idf); a doc with no query term is absent from the output."""
    import math

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["s0", "s0", "s1"],
        "text": ["hash join hash", "merge sort", "plain words only"],
    })
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["bm25_docs"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["bm25_docs"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert list(got["doc_id"]) == [0, 1]
    # doc 0: tf(hash)=2 tf(join)=1, dl=3; N=3, tt=8, avgdl=8/3
    avgdl = 8 / 3
    idf = lambda dfreq: math.log(1.0 + (3 - dfreq + 0.5) / (dfreq + 0.5))
    norm = 1.2 * (0.25 + 0.75 * (3 / avgdl))
    s0 = idf(1) * (2 * 2.2) / (2 + norm) + idf(1) * (1 * 2.2) / (1 + norm)
    assert float(got.loc[0, "score"]) == round(s0, 6)
    assert int(got.loc[0, "n_terms"]) == 2


def test_docs_all_terms_search_planted(ray_session, tmp_path):
    """Only the doc containing ALL of join/hash/scan counts as matched;
    sources with zero matches still report their doc totals."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["s0", "s0", "s1"],
        "text": ["scan then hash then join", "hash join only", "scan"],
    })
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["docs_all_terms_search"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["docs_all_terms_search"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert got.set_index("source")["n_matched"].to_dict() == {
        "s0": 1, "s1": 0}


def test_duplicate_spans_planted(ray_session, tmp_path):
    """Two documents sharing one exact 40-char boilerplate prefix (so
    its strided 32-grams at offsets 0 and 8 both repeat) and otherwise
    distinct text: the census shows exactly two grams at n_docs=2, and
    those grams lead top_duplicate_spans; both match the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    boiler = "<<<standard legal disclaimer v1>>>####"  # 38 chars
    boiler = boiler + "XY"  # 40 chars
    a = boiler + "unique tail one " + "a" * 20
    b = boiler + "another ending entirely " + "b" * 20
    df = pd.DataFrame({"doc_id": [0, 1], "text": [a, b]})
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    for name in ("duplicate_spans_census", "top_duplicate_spans"):
        got = QUERIES[name](str(tmp_path))
        exp = con.execute(ORACLE[name]).fetchdf()
        assert (got.values == exp[got.columns].values).all(), name
    con.close()

    census = QUERIES["duplicate_spans_census"](str(tmp_path))
    assert int(census.set_index("n_docs").loc[2, "n_grams"]) == 2
    top = QUERIES["top_duplicate_spans"](str(tmp_path))
    assert list(top["n_docs"].head(2)) == [2, 2]
    assert set(top["gram"].head(2)) == {a[0:32], a[8:40]}


def test_quantile_normalized_lengths_planted(ray_session, tmp_path):
    """Two sources with identical shape on shifted supports: src0's
    k-th smallest maps to the GLOBAL discrete quantile at the same
    within-source rank. With src0={10,20,30} and src1={100,200,300},
    global support is {10,20,30,100,200,300}: src0's ranks 1/3, 2/3,
    3/3 map to 20, 100, 300 (first global value whose cumulative share
    reaches the rank); matches the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "doc_id": range(6),
        "source": ["src0"] * 3 + ["src1"] * 3,
        "n_chars": [10, 20, 30, 100, 200, 300],
    })
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["quantile_normalized_lengths"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["quantile_normalized_lengths"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    m = got[got["source"] == "src0"].set_index("n_chars")["norm_chars"]
    assert m.to_dict() == {10: 20, 20: 100, 30: 300}


def test_hapax_by_source_planted(ray_session, tmp_path):
    """One source all-repeats (zero hapax), one all-unique words
    (ratio 1.0); matches the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "source": ["s0", "s1"],
        "text": ["spam spam spam eggs eggs", "one two three four"],
    })
    pq.write_table(pa.table(df), tmp_path / "documents.parquet")
    got = QUERIES["hapax_by_source"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(ORACLE["hapax_by_source"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert got.set_index("source")["hapax_ratio"].to_dict() == {
        "s0": 0.0, "s1": 1.0}


def test_bigram_pmi_census_planted(ray_session, tmp_path):
    """A deterministic A->B alternation: observed bigrams are only
    A->B and B->A, so both get positive PMI = ln(T * n / (nx * ny));
    cross-checked against the in-test twin and a hand computation."""
    import math

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    n = 9
    df = pd.DataFrame({
        "event_id": range(n),
        "user_id": [1] * n,
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "event_type": ["A", "B"] * 4 + ["A"],
    })
    pq.write_table(pa.table(df), tmp_path / "events.parquet")
    got = QUERIES["bigram_pmi_census"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["bigram_pmi_census"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    # 8 bigrams: A->B x4, B->A x4; nx = {A:4, B:4}, ny = {B:4, A:4}
    want = round(math.log(4.0 * 8.0 / (4.0 * 4.0)), 6)
    assert set(np.round(got["pmi"], 6)) == {want}


def test_anova_kruskal_planted(ray_session, tmp_path):
    """Three groups with zero within-group variance and distinct means:
    ANOVA's SSW = 0 (engine reports None rather than dividing by zero)
    — so shift one value; with groups {1,1,2} {5,5,6} {9,9,10} both
    statistics are large and both match their in-test twins; identical
    groups give F ~ 0 and H ~ 0."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    def write(vals):
        rows = [(i, s, v) for i, (s, v) in enumerate(vals)]
        df = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
        pq.write_table(pa.table(df), tmp_path / "documents.parquet")

    sep = [("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 5), ("b", 6),
           ("c", 9), ("c", 9), ("c", 10)]
    write(sep)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    for name in ("anova_lengths_by_source", "kruskal_wallis_lengths"):
        got = QUERIES[name](str(tmp_path))
        exp = con.execute(ORACLE[name]).fetchdf()
        assert (got.values == exp[got.columns].values).all(), name
    con.close()
    f = float(QUERIES["anova_lengths_by_source"](str(tmp_path))
              ["f_stat"].iloc[0])
    h = float(QUERIES["kruskal_wallis_lengths"](str(tmp_path))
              ["h_stat"].iloc[0])
    assert f > 50.0   # clearly separated means
    assert h > 6.0    # above the chi2(2) 5% critical value

    mixed = [("a", v) for v in (1, 5, 9)] + [("b", v) for v in (1, 5, 9)] \
        + [("c", v) for v in (1, 5, 9)]
    write(mixed)
    f2 = float(QUERIES["anova_lengths_by_source"](str(tmp_path))
               ["f_stat"].iloc[0])
    h2 = float(QUERIES["kruskal_wallis_lengths"](str(tmp_path))
               ["h_stat"].iloc[0])
    assert abs(f2) < 1e-6 and abs(h2) < 1e-6


def test_part_bfs_layers_planted_chain(ray_session, tmp_path):
    """A pure chain 1-2-3-...-8 (each order pairs adjacent parts):
    exactly one node per hop 0..7 from the seed (the smallest part);
    matches the in-test twin — the deep-graph case that exercises one
    frontier broadcast per round."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    for i in range(1, 8):  # order i contains parts i and i+1
        rows.append({"l_orderkey": i, "l_partkey": i})
        rows.append({"l_orderkey": i, "l_partkey": i + 1})
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "lineitem.parquet")
    got = QUERIES["part_bfs_layers"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["part_bfs_layers"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert list(got["hop"]) == list(range(8))
    assert list(got["n_nodes"]) == [1] * 8


def test_event_type_stationary_planted(ray_session, tmp_path):
    """An absorbing-ish chain A->B->B->...: with damping, B's
    stationary mass dominates A's; matches the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    n = 12
    df = pd.DataFrame({
        "event_id": range(n),
        "user_id": [1] * n,
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "event_type": ["A"] + ["B"] * (n - 1),
    })
    pq.write_table(pa.table(df), tmp_path / "events.parquet")
    got = QUERIES["event_type_stationary"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["event_type_stationary"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    s = got.set_index("event_type")["stationary"]
    assert s["B"] > 0.8 and s["A"] < 0.2


def test_burstiness_by_user_planted(ray_session, tmp_path):
    """A clockwork user (constant 10s gaps) has sigma=0 => B=-1; a
    two-valued bursty user (1s and 99s gaps) has B>0 ... (sigma=49 vs
    mu=50 gives (49-50)/(49+50) slightly negative; use 0s/100s: sigma
    = mu = 50 => B=0; instead plant gaps {0,0,0,1000} where sigma>mu
    => B>0). Both match the in-test twin."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    rows = []
    t = 0
    for i, g in enumerate([10, 10, 10, 10]):  # user 1: clockwork
        rows.append({"event_id": len(rows), "user_id": 1,
                     "ts": np.datetime64(t, "us")})
        t += g * 1_000_000
    rows.append({"event_id": len(rows), "user_id": 1,
                 "ts": np.datetime64(t, "us")})
    t = 0
    for g in [0, 0, 0, 1000]:  # user 2: one huge burst gap
        rows.append({"event_id": len(rows), "user_id": 2,
                     "ts": np.datetime64(t, "us")})
        t += g * 1_000_000
    rows.append({"event_id": len(rows), "user_id": 2,
                 "ts": np.datetime64(t, "us")})
    pq.write_table(pa.table(pd.DataFrame(rows)),
                   tmp_path / "events.parquet")
    got = QUERIES["burstiness_by_user"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(ORACLE["burstiness_by_user"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    b = got.set_index("user_id")["burstiness"]
    assert b[1] == -1.0
    # gaps {0,0,0,1000}: B = (sqrt(3e6)-1000)/(sqrt(3e6)+1000) ~ 0.268
    assert b[2] == round((np.sqrt(3e6) - 1000) / (np.sqrt(3e6) + 1000), 6)


def test_trimmed_and_systematic_planted(ray_session, tmp_path):
    """Trimmed mean with n=20, k=1: drops exactly the min and max
    (1 and 100 from [1, 2..19 pattern, 100]); systematic sampling
    picks ranks 1, 501, ... — both match their in-test twins."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import (ORACLE,
                                                             QUERIES)

    qty = [1.0] + [float(v) for v in range(2, 20)] + [100.0]
    li = pd.DataFrame({"l_returnflag": ["A"] * 20, "l_quantity": qty})
    pq.write_table(pa.table(li), tmp_path / "lineitem.parquet")
    got = QUERIES["trimmed_mean_qty_by_flag"](str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    exp = con.execute(ORACLE["trimmed_mean_qty_by_flag"]).fetchdf()
    assert (got.values == exp[got.columns].values).all()
    assert float(got["trimmed_mean"].iloc[0]) == round(
        sum(range(2, 20)) / 18, 6)

    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, 1202, dtype=np.int64) * 7,
        "o_totalprice": np.arange(1, 1202, dtype=np.float64)})
    pq.write_table(pa.table(orders), tmp_path / "orders.parquet")
    got = QUERIES["systematic_sample_orders"](str(tmp_path))
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    exp = con.execute(ORACLE["systematic_sample_orders"]).fetchdf()
    con.close()
    assert (got.values == exp[got.columns].values).all()
    assert list(got["rn"]) == [1, 501, 1001]
    assert list(got["o_orderkey"]) == [7, 501 * 7, 1001 * 7]


def test_order_value_runs_test_planted(ray_session, tmp_path):
    """Planted sequences pin the runs-test semantics: a perfectly
    ALTERNATING above/below sequence maximizes runs (R = N, z > 0,
    anti-clustered) and a BLOCK sequence (all lows then all highs)
    minimizes them (R = 2, z < 0, clustered); both cross 10 blocks'
    worth of rows so the constant-partition transition stitch is
    exercised."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    n = 2000
    dates = pd.date_range("2024-01-01", periods=n, freq="h")

    def run(prices):
        df = pd.DataFrame({"o_orderkey": np.arange(n, dtype=np.int64),
                           "o_orderdate": dates,
                           "o_totalprice": prices})
        pq.write_table(pa.table(df), tmp_path / "orders.parquet")
        return QUERIES["order_value_runs_test"](str(tmp_path))

    alt = run(np.where(np.arange(n) % 2 == 0, 10.0, 1000.0))
    assert alt["n1"].iat[0] == alt["n2"].iat[0] == n // 2
    assert alt["runs"].iat[0] == n          # every step switches
    assert alt["z"].iat[0] > 30             # extreme anti-clustering

    blk = run(np.where(np.arange(n) < n // 2, 10.0, 1000.0))
    assert blk["runs"].iat[0] == 2          # one switch in the middle
    assert blk["z"].iat[0] < -30            # extreme clustering
