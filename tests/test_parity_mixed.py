"""F3 `profiler_parity` fixture (FIXTURES.md): one column per reference
logical type, profiled end-to-end; every phase-2/3 field the reference
would compute is asserted against the pandas one-liner it replaces
(SURVEY.md §5.3 — the reference itself can't run here: its module import
loads fastText/spaCy models that aren't in this container)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mixed_table(n: int = 5000, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    qty = np.round(rng.uniform(0, 100, n), 2)
    qty[rng.random(n) < 0.05] = np.nan
    price = rng.uniform(0, 1, n) * 1e4 + rng.random(n) * 1e-8  # >6 decimals
    cats = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"])
    note_words = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur"]
    notes = np.array(
        [
            " ".join(rng.choice(note_words, rng.integers(2, 9)))
            + (" привет" if i % 97 == 0 else "")
            for i in range(n)
        ],
        dtype=object,
    )
    base = np.datetime64("2024-01-01")
    dates = base + rng.integers(0, 365, n).astype("timedelta64[D]")
    ts_strings = np.array(
        [
            f"2024-{m:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
            for m, d, h, mi, s in zip(
                rng.integers(1, 13, n), rng.integers(1, 29, n),
                rng.integers(0, 24, n), rng.integers(0, 60, n),
                rng.integers(0, 60, n),
            )
        ],
        dtype=object,
    )
    skewed = rng.lognormal(0.0, 1.0, n)
    return pa.table(
        {
            "id_int": pa.array(np.arange(n), pa.int64()),
            "qty_float": pa.array(qty, pa.float64()),
            "price_double": pa.array(price, pa.float64()),
            "category": pa.array(cats[rng.integers(0, 8, n)], pa.string()),
            "note": pa.array(notes, pa.string()),
            "event_date": pa.array(
                [str(d) for d in dates], pa.string()  # '%Y-%m-%d' strings
            ),
            "event_ts": pa.array(ts_strings, pa.string()),
            "all_null": pa.array([None] * n, pa.string()),
            "skewed_num": pa.array(skewed, pa.float64()),
        }
    )


@pytest.fixture(scope="module")
def mixed_profile(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset

    table = _mixed_table()
    prof = profile_dataset(rd.from_arrow(table), batch_size=1024)
    return table, prof


def test_logical_types_match_reference_rules(mixed_profile):
    _, prof = mixed_profile
    fin = {c["column"]: c for c in prof.finalize()["columns"]}
    assert fin["id_int"]["logical_type"] == "integer"
    assert fin["qty_float"]["logical_type"] == "float"
    assert fin["price_double"]["logical_type"] == "float"
    assert fin["category"]["logical_type"] == "string"
    assert fin["note"]["logical_type"] == "string"
    assert fin["event_date"]["logical_type"] == "date"       # all-midnight rule
    assert fin["event_ts"]["logical_type"] == "timestamp"    # format-search path
    assert fin["all_null"]["logical_type"] == "empty"


def test_double_subtype_flag(mixed_profile):
    _, prof = mixed_profile
    fin = {c["column"]: c for c in prof.finalize()["columns"]}
    assert fin["price_double"].get("subtype") == "double"    # >6 decimal places
    assert fin["qty_float"].get("subtype") is None           # ≤2 decimals
    assert fin["qty_float"]["max_decimal_places"] <= 2


def test_null_blank_and_counts_match_pandas(mixed_profile):
    table, prof = mixed_profile
    df = table.to_pandas()
    fin = {c["column"]: c for c in prof.finalize()["columns"]}
    for col in df.columns:
        assert fin[col]["null_count"] == int(df[col].isnull().sum()), col
    assert fin["all_null"]["null_count"] == len(df)


def test_moments_match_pandas(mixed_profile):
    table, prof = mixed_profile
    s = table.to_pandas()["skewed_num"]
    stats = prof.columns["skewed_num"].moments
    assert stats.mean == pytest.approx(s.mean(), rel=1e-9)
    assert stats.std() == pytest.approx(s.std(), rel=1e-9)
    assert stats.skew() == pytest.approx(s.skew(), rel=1e-8)
    assert stats.kurtosis() == pytest.approx(s.kurtosis(), rel=1e-8)


def test_categorical_confidence_only_on_low_cardinality(mixed_profile):
    _, prof = mixed_profile
    fin = {c["column"]: c for c in prof.finalize()["columns"]}
    # 8 distinct / 5000 rows → distinct_ratio < 0.1 → confidence > 0
    assert fin["category"]["categorical_confidence"] > 0
    # unique ints → no categorical annotation
    assert fin["id_int"]["categorical_confidence"] == 0


def test_uniqueness_index_and_distinct(mixed_profile):
    table, prof = mixed_profile
    fin = {c["column"]: c for c in prof.finalize()["columns"]}
    # unique ints exceed the exact value-count cap → HLL estimate path
    # (distinct_is_estimate flag set; ±2% standard error at p=12)
    assert fin["id_int"].get("distinct_is_estimate") is True
    assert fin["id_int"]["distinct_count"] == pytest.approx(table.num_rows, rel=0.02)
    assert fin["id_int"]["uniqueness_index"] == pytest.approx(100.0, rel=0.02)
    # low-cardinality column stays on the exact path
    assert fin["category"]["distinct_count"] == 8
    assert fin["category"].get("distinct_is_estimate") is None


def test_outlier_pct_matches_pandas_zscore(mixed_profile, ray_session):
    import ray.data as rd

    table, prof = mixed_profile
    s = table.to_pandas()["skewed_num"]
    mu, sd = prof.columns["skewed_num"].moments.mean, prof.columns["skewed_num"].moments.std()
    expected = float((np.abs((s - s.mean()) / s.std(ddof=1)) > 3).mean() * 100)

    def count(df):
        z = (df["skewed_num"] - mu).abs() / sd
        return pd.DataFrame({"bad": [int((z > 3).sum())], "n": [len(df)]})

    parts = (
        rd.from_arrow(table.select(["skewed_num"]))
        .map_batches(count, batch_format="pandas", batch_size=1024)
        .to_pandas()
        .sum()
    )
    got = 100.0 * parts["bad"] / parts["n"]
    assert got == pytest.approx(expected, abs=1e-9)


def test_whole_row_duplicates_detected(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import duplicate_keys

    table = _mixed_table(n=1000)
    dup_rows = table.slice(10, 5)
    with_dups = pa.concat_tables([table, dup_rows])
    cols = ["id_int", "category", "event_date"]  # identifying subset
    dups = duplicate_keys(rd.from_arrow(with_dups).select_columns(cols), cols)
    assert dups is not None and dups.num_rows == 5
    assert set(dups["id_int"].to_pylist()) == set(range(10, 15))
    # clean table has none
    assert duplicate_keys(rd.from_arrow(table).select_columns(cols), cols) is None
