"""Every QUERIES entry vs its DuckDB ORACLE twin on sf0.001 AND sf0.01
— the local mirror of the driver's CORRECTNESS gate (row count + schema
+ sorted value equality). sf0.01 is the gate's own scale factor; sf0.001
additionally exercises the small/empty-intermediate edge class (empty
Ray blocks losing columns, SUM-over-zero-rows NULL semantics)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", params=SF_DIRS,
                ids=[d.rsplit("/", 1)[1] for d in SF_DIRS])
def sf_env(request):
    sf_dir = request.param
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield sf_dir, c
    c.close()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _family(s: pd.Series) -> str:
    """Dtype family — the driver's value hash stringifies values, so an
    int64 engine column vs a float64 oracle column ("0" vs "0.0") is a
    hash FAIL even when every value is numerically equal. The mirror must
    be strict at this level (VERDICT r03 item 2)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "obj"


def _value_hash(df: pd.DataFrame) -> str:
    """Canonical exact string hash over the canonicalized frame — mirrors
    the driver's sorted-columns value hash ("0" != "0.0")."""
    import hashlib

    parts = []
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            vals = ["nan" if pd.isna(v) else repr(float(v)) for v in s]
        elif pd.api.types.is_integer_dtype(s):
            vals = [str(int(v)) for v in s]
        else:
            vals = [
                "None" if v is None or (isinstance(v, float) and pd.isna(v))
                else str(v)
                for v in s
            ]
        parts.append("\x1f".join(vals))
    return hashlib.sha256("\x1e".join(parts).encode()).hexdigest()


def all_query_names():
    from advanced_data_profile_ray.pipelines.queries import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    return sorted(QUERIES)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(ray_session, sf_env, name):
    from advanced_data_profile_ray.pipelines.queries import ORACLE, QUERIES

    sf_dir, con = sf_env
    ours = _canon(_to_pandas(QUERIES[name](sf_dir)))
    if name not in ORACLE:
        assert len(ours) >= 0  # rows-only check
        return
    want = _canon(con.execute(ORACLE[name]).fetch_df())
    assert list(ours.columns) == list(want.columns), (
        f"{name}: column mismatch {list(ours.columns)} vs {list(want.columns)}"
    )
    assert len(ours) == len(want), f"{name}: row count {len(ours)} vs {len(want)}"
    for c in ours.columns:
        fo, fw = _family(ours[c]), _family(want[c])
        assert fo == fw, (
            f"{name}.{c}: dtype-family mismatch engine={fo} oracle={fw} "
            f"(driver value hash would FAIL: '0' vs '0.0')"
        )
    pd.testing.assert_frame_equal(ours, want, check_dtype=False, atol=0, rtol=0)
    assert _value_hash(ours) == _value_hash(want), f"{name}: value-hash mismatch"
