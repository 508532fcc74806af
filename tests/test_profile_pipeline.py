"""Profile pipeline vs pandas ground truth on real testdata parquet
(SURVEY.md §5.1/§5.3 analog: the distributed profile must reproduce the
reference's whole-column pandas numbers)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem_profile(ray_session):
    from advanced_data_profile_ray.pipelines.profile import profile_parquet

    prof = profile_parquet(f"{SF_DIR}/lineitem.parquet", batch_size=1000)
    return prof, pd.read_parquet(f"{SF_DIR}/lineitem.parquet")


def test_row_count_and_width(lineitem_profile):
    prof, df = lineitem_profile
    assert prof.row_count == len(df)
    assert len(prof.columns) == len(df.columns)


def test_null_counts(lineitem_profile):
    prof, df = lineitem_profile
    for col in df.columns:
        f = prof.columns[col].finalize()
        assert f["null_count"] == int(df[col].isnull().sum()), col
        assert f["total"] == len(df)


def test_numeric_stats_match_pandas(lineitem_profile):
    prof, df = lineitem_profile
    s = df["l_quantity"]
    st = prof.columns["l_quantity"].finalize()["stats"]
    assert st["mean"] == pytest.approx(s.mean(), rel=1e-12)
    assert st["std"] == pytest.approx(s.std(), rel=1e-10)
    assert st["min"] == s.min() and st["max"] == s.max()
    assert st["skew"] == pytest.approx(s.skew(), rel=1e-8)
    assert st["kurtosis"] == pytest.approx(s.kurtosis(), rel=1e-8)


def test_distinct_and_top_values(lineitem_profile):
    prof, df = lineitem_profile
    f = prof.columns["l_returnflag"].finalize()
    assert f["distinct_count"] == df["l_returnflag"].nunique()
    vc = df["l_returnflag"].value_counts()
    got = dict(f["top_values"]["top_k"])
    for val, cnt in vc.items():
        assert got[val] == cnt


def test_quantiles_close(lineitem_profile):
    prof, df = lineitem_profile
    q = prof.columns["l_extendedprice"].finalize()["quantiles"]
    exact = df["l_extendedprice"].quantile([0.25, 0.5, 0.75])
    spread = df["l_extendedprice"].max() - df["l_extendedprice"].min()
    assert abs(q["median"] - exact[0.5]) < 0.02 * spread
    assert abs(q["p25"] - exact[0.25]) < 0.02 * spread


def test_logical_types(lineitem_profile):
    prof, df = lineitem_profile
    types = {c: prof.columns[c].finalize()["logical_type"] for c in df.columns}
    assert types["l_orderkey"] == "integer"
    assert types["l_quantity"] in ("integer", "float")
    assert types["l_extendedprice"] == "float"
    assert types["l_returnflag"] == "string"
    assert types["l_shipdate"] in ("date", "timestamp")


def test_timestamp_minmax(lineitem_profile):
    prof, df = lineitem_profile
    f = prof.columns["l_shipdate"].finalize()
    assert f["min_ts_us"] == df["l_shipdate"].min().value // 1000
    assert f["max_ts_us"] == df["l_shipdate"].max().value // 1000


def test_string_max_length_and_uniqueness(lineitem_profile):
    prof, df = lineitem_profile
    f = prof.columns["l_returnflag"].finalize()
    assert f["max_length"] == df["l_returnflag"].astype(str).map(len).max()
    f2 = prof.columns["l_orderkey"].finalize()
    expected = round(100.0 * df["l_orderkey"].nunique() / len(df), 2)
    assert f2["uniqueness_index"] == expected


def test_categorical_confidence_on_flag(lineitem_profile):
    prof, df = lineitem_profile
    f = prof.columns["l_returnflag"].finalize()
    vc = df["l_returnflag"].value_counts()
    p = (vc / vc.sum()).values  # scipy.stats.entropy normalizes pk
    ent = float(-(p * np.log(p)).sum())
    assert f["categorical_confidence"] == pytest.approx(
        round(max(0, 100 - ent * 10), 2), abs=0.01
    )


def test_table_finalize_census(lineitem_profile):
    prof, df = lineitem_profile
    fin = prof.finalize()
    assert fin["table"]["row_count"] == len(df)
    assert fin["table"]["total_null_values"] == int(df.isnull().sum().sum())
    assert fin["table"]["full_pct_columns"] == int((df.notnull().all()).sum())


def test_events_profile_props_and_nulls(ray_session):
    from advanced_data_profile_ray.pipelines.profile import profile_parquet

    prof = profile_parquet(f"{SF_DIR}/events.parquet", batch_size=300)
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for col in df.columns:
        f = prof.columns[col].finalize()
        assert f["null_count"] == int(df[col].isnull().sum()), col
    f = prof.columns["event_type"].finalize()
    assert f["distinct_count"] == df["event_type"].nunique()


def test_gram_state_shared_helper(ray_session):
    """pipelines.profile.gram_state (the shared Gram tree-merge behind
    the corr queries and the --corr CLI pass): matches numpy corrcoef on
    a multi-block dataset; returns None on an empty dataset."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import gram_state

    rng = np.random.default_rng(83)
    a = rng.normal(size=500)
    b = 0.6 * a + rng.normal(size=500)
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    st = gram_state(rd.from_arrow(t).repartition(7), ["a", "b"],
                    batch_size=64)
    got = st.corr_matrix()
    want = np.corrcoef(np.vstack([a, b]))
    assert abs(got[0, 1] - want[0, 1]) < 1e-9

    empty = pa.table({"a": pa.array([], pa.float64()),
                      "b": pa.array([], pa.float64())})
    assert gram_state(rd.from_arrow(empty), ["a", "b"]) is None
