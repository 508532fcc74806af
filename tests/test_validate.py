"""Constraint-validation engine vs DuckDB oracles on synthesized
transcripts (SURVEY.md §5.4): injected violations must produce exact
pass/fail verdicts and byte-identical violation rows under stable
(conv_id, turn_idx) ordering."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from advanced_data_profile_ray.sources.transcripts import (
    CLEAN,
    DIRTY,
    TOOL_CATALOG,
    ViolationConfig,
    dim_conv_roster,
    dim_tool_catalog,
    gen_transcripts,
)


@pytest.fixture(scope="module")
def dirty_table():
    return gen_transcripts(n_convs=500, seed=7, cfg=DIRTY)


@pytest.fixture(scope="module")
def clean_table():
    return gen_transcripts(n_convs=500, seed=7, cfg=CLEAN)


@pytest.fixture(scope="module")
def ddb(dirty_table):
    con = duckdb.connect()
    con.register("t", dirty_table)
    return con


def test_generator_deterministic():
    a = gen_transcripts(100, seed=3, cfg=DIRTY)
    b = gen_transcripts(100, seed=3, cfg=DIRTY)
    assert a.equals(b)
    c = gen_transcripts(100, seed=4, cfg=DIRTY)
    assert not a.equals(c)


def test_clean_passes_everything(ray_session, clean_table):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import validate_transcripts

    roster = dim_conv_roster(500)["conv_id"].to_pylist()
    report = validate_transcripts(
        rd.from_arrow(clean_table),
        valid_conv_ids=roster,
        valid_tools=TOOL_CATALOG,
    )
    assert report.passed, [v.to_dict() for v in report.verdicts if not v.passed]


def test_uniqueness_matches_oracle(ray_session, dirty_table, ddb):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import uniqueness_check

    v = uniqueness_check(rd.from_arrow(dirty_table))
    oracle = ddb.execute(
        """SELECT COUNT(*) AS groups, SUM(n - 1) AS surplus FROM
           (SELECT conv_id, turn_idx, COUNT(*) n FROM t
            GROUP BY conv_id, turn_idx HAVING COUNT(*) > 1)"""
    ).fetchone()
    assert not v.passed
    assert v.stats["duplicate_key_groups"] == oracle[0]
    assert v.stats["surplus_rows"] == oracle[1]
    # violation ROWS: exact equality incl. per-turn text, stable order
    got = v.violations.to_pandas()
    want = ddb.execute(
        """SELECT t.* FROM t
           JOIN (SELECT conv_id, turn_idx FROM t GROUP BY conv_id, turn_idx
                 HAVING COUNT(*) > 1) d USING (conv_id, turn_idx)
           ORDER BY conv_id, turn_idx"""
    ).fetch_df()
    got = got.sort_values(["conv_id", "turn_idx", "text"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx", "text"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_referential_matches_oracle(ray_session, dirty_table, ddb):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import referential_check

    roster = dim_conv_roster(500)["conv_id"].to_pylist()
    v = referential_check(rd.from_arrow(dirty_table), "conv_id", roster)
    orphan = ddb.execute(
        "SELECT COUNT(*) FROM t WHERE conv_id IS NOT NULL AND conv_id NOT LIKE 'c%'"
    ).fetchone()[0]
    assert v.violation_count == orphan
    assert not v.passed
    rows = v.violations.to_pandas()
    assert len(rows) == orphan
    assert rows["conv_id"].str.startswith("zz_orphan_").all()
    # stable ordering check
    assert rows[["conv_id", "turn_idx"]].equals(
        rows[["conv_id", "turn_idx"]].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )

    v2 = referential_check(rd.from_arrow(dirty_table), "tool", TOOL_CATALOG)
    orphan_tools = ddb.execute(
        "SELECT COUNT(*) FROM t WHERE tool IS NOT NULL AND tool LIKE 'ghost_tool_%'"
    ).fetchone()[0]
    assert v2.violation_count == orphan_tools
    matched = ddb.execute(
        "SELECT COUNT(*) FROM t WHERE tool IS NOT NULL AND tool NOT LIKE 'ghost_tool_%'"
    ).fetchone()[0]
    assert v2.stats["matched"] == matched


def test_ts_range_matches_oracle(ray_session, dirty_table, ddb):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import ts_range_check

    v = ts_range_check(rd.from_arrow(dirty_table))
    oor = ddb.execute(
        """SELECT COUNT(*) FROM t
           WHERE ts < TIMESTAMP '1900-01-01'
              OR ts > TIMESTAMP '2100-12-31 23:59:59.999999'"""
    ).fetchone()[0]
    assert v.violation_count == oor
    assert not v.passed


def test_null_blank_check(ray_session, dirty_table, ddb):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.pipelines.validate import (
        null_blank_check,
        transcript_profile_config,
    )

    prof = profile_dataset(rd.from_arrow(dirty_table), transcript_profile_config())
    v = null_blank_check(prof, "text", max_null_pct=50, max_blank_pct=50)
    nulls = ddb.execute("SELECT COUNT(*) FROM t WHERE text IS NULL").fetchone()[0]
    # engine blank = trims to empty under unicode whitespace; spell the
    # whitespace set explicitly for DuckDB (bare TRIM strips spaces only)
    blanks = ddb.execute(
        "SELECT COUNT(*) FROM t WHERE text IS NOT NULL AND TRIM(text, ' \t\n\r') = ''"
    ).fetchone()[0]
    assert v.stats["null_count"] == nulls
    assert v.stats["blank_count"] == blanks
    assert v.passed  # generous thresholds

    v2 = null_blank_check(prof, "text", max_null_pct=0.0)
    assert not v2.passed


def test_drift_detects_shift(ray_session, clean_table):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.pipelines.validate import (
        drift_check,
        transcript_profile_config,
    )

    cfg = transcript_profile_config()
    base = profile_dataset(rd.from_arrow(clean_table), cfg)

    # same distribution, different seed → no drift
    same = profile_dataset(
        rd.from_arrow(gen_transcripts(500, seed=99, cfg=CLEAN)), cfg
    )
    v_same = drift_check(same, base)
    assert v_same.passed, v_same.stats

    # shifted text length + role frequencies → drift
    shifted_cfg = ViolationConfig(
        text_len_scale=2.5, role_probs=np.array([0.10, 0.70, 0.05, 0.15])
    )
    shifted = profile_dataset(
        rd.from_arrow(gen_transcripts(500, seed=99, cfg=shifted_cfg)), cfg
    )
    v_shift = drift_check(shifted, base)
    assert not v_shift.passed
    assert v_shift.stats["ks_statistic"] > 0.1
    assert v_shift.stats["role_psi"] > 0.2


def test_full_report_on_dirty(ray_session, dirty_table):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import validate_transcripts

    roster = dim_conv_roster(500)["conv_id"].to_pylist()
    report = validate_transcripts(
        rd.from_arrow(dirty_table),
        valid_conv_ids=roster,
        valid_tools=TOOL_CATALOG,
    )
    d = report.to_dict()
    assert not d["passed"]
    by_name = {v["check"]: v for v in d["verdicts"]}
    assert not by_name["unique(conv_id, turn_idx)"]["passed"]
    assert not by_name["referential(conv_id)"]["passed"]
    assert not by_name["referential(tool)"]["passed"]
    assert not by_name["ts_in_range(ts)"]["passed"]
    assert by_name["null_blank(text)"]["passed"]


def test_dim_tables():
    assert dim_tool_catalog().num_rows == len(TOOL_CATALOG)
    assert dim_conv_roster(10)["conv_id"].to_pylist()[0] == "c00000000"


def test_file_backed_uniqueness_matches_sort_path(ray_session, dirty_table, tmp_path_factory):
    """duplicate_keys_from_files (raw-task hash shuffle) must agree
    exactly with the Dataset sort path AND the DuckDB oracle."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import (
        duplicate_keys,
        duplicate_keys_from_files,
    )
    from advanced_data_profile_ray.sources.transcripts import write_transcript_dataset

    out = tmp_path_factory.mktemp("uniq_files")
    paths = write_transcript_dataset(str(out), n_convs=500, seed=7, cfg=DIRTY,
                                     n_files=5)
    keys = ["conv_id", "turn_idx"]
    via_files = duplicate_keys_from_files(paths, keys)
    via_sort = duplicate_keys(rd.read_parquet(paths), keys)
    assert via_files is not None and via_sort is not None
    # file path preserves parquet's int32 turn_idx; sort path promotes to
    # int64 via from_pylist — compare values, not physical types
    for col in ("conv_id", "turn_idx", "n"):
        assert via_files[col].to_pylist() == via_sort[col].to_pylist()

    con = duckdb.connect()
    con.register("t", dirty_table)
    truth = con.execute(
        "SELECT conv_id, turn_idx, COUNT(*) AS n FROM t GROUP BY 1,2 "
        "HAVING COUNT(*) > 1 ORDER BY 1,2"
    ).fetch_arrow_table()
    assert via_files.num_rows == truth.num_rows
    assert via_files["n"].to_pylist() == truth["n"].to_pylist()
    assert via_files["conv_id"].to_pylist() == truth["conv_id"].to_pylist()


def test_empty_dataset_validation(ray_session, tmp_path):
    """Zero-row input: profile has no columns (documented contract),
    every check passes vacuously, nothing crashes."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import validate_transcripts
    from advanced_data_profile_ray.sources.transcripts import gen_transcripts

    empty = gen_transcripts(2, seed=1).slice(0, 0)
    p = str(tmp_path / "empty.parquet")
    pq.write_table(empty, p)
    report = validate_transcripts(
        rd.read_parquet(p), valid_conv_ids=["c00000000"], valid_tools=["t"],
        paths=[p],
    )
    assert report.passed, [v.to_dict() for v in report.verdicts if not v.passed]
    assert all(v.violation_count == 0 for v in report.verdicts)


def test_all_null_tool_column(ray_session):
    """A batch column that is entirely null must not break the fused
    referential counter (nulls are counted separately, not as orphans)."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import validate_transcripts

    t = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user"]),
        "text": pa.array(["a", "b", "c"]),
        "tool": pa.array([None, None, None], pa.string()),
        "ts": pa.array([1, 2, 3], pa.timestamp("us")),
    })
    report = validate_transcripts(rd.from_arrow(t), valid_conv_ids=["c1", "c2"],
                                  valid_tools=["tool_000"])
    d = {v.check: v for v in report.verdicts}
    assert d["referential(tool)"].passed
    assert d["referential(tool)"].stats == {"matched": 0, "orphan": 0, "null": 3}
    assert d["referential(conv_id)"].stats["matched"] == 3


def test_salted_groupby_matches_oracle(ray_session, dirty_table, ddb):
    """Salted two-stage aggregation (north rule: salted repartition of
    hot conv_ids) must agree exactly with DuckDB on the Zipf-skewed
    per-conv aggregation, for any salt_buckets."""
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import salted_groupby

    want = ddb.execute(
        """SELECT conv_id, COUNT(*) AS n_turns, MAX(turn_idx) AS max_turn,
                  COUNT(tool) AS n_tool
           FROM t GROUP BY conv_id ORDER BY conv_id"""
    ).fetch_df()
    for buckets in (1, 16):
        got = salted_groupby(
            rd.from_arrow(dirty_table), ["conv_id"],
            [(None, "count_all", "n_turns"), ("turn_idx", "max", "max_turn"),
             ("tool", "count", "n_tool")],
            salt_buckets=buckets,
        ).to_pandas()
        assert len(got) == len(want)
        assert got["conv_id"].tolist() == want["conv_id"].tolist()
        assert got["n_turns"].astype("int64").tolist() == want["n_turns"].astype("int64").tolist()
        assert got["max_turn"].astype("int64").tolist() == want["max_turn"].astype("int64").tolist()
        assert got["n_tool"].astype("int64").tolist() == want["n_tool"].astype("int64").tolist()


def test_broadcast_lookup_join_nulls(ray_session):
    """Missing and null fact keys take NULL payloads (LEFT JOIN)."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.referential import broadcast_lookup_join

    fact = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                     "k": pa.array([10, 99, None, 20], pa.int64())})
    dim = pa.table({"dk": pa.array([20, 10], pa.int64()),
                    "name": pa.array(["twenty", "ten"], pa.string())})
    out = broadcast_lookup_join(rd.from_arrow(fact), "k", dim, "dk", ["name"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert out["name"].tolist() == ["ten", None, None, "twenty"]


def test_exact_ks_from_value_counts_matches_scipy_formula():
    """Exact KS from count maps equals the brute ECDF max-diff."""
    import numpy as np

    from advanced_data_profile_ray.functions.drift import exact_ks_from_value_counts

    rng = np.random.default_rng(4)
    a = rng.integers(0, 30, 4000)
    b = np.concatenate([rng.integers(0, 30, 3000), rng.integers(10, 40, 1000)])
    cur = dict(zip(*np.unique(a, return_counts=True)))
    base = dict(zip(*np.unique(b, return_counts=True)))
    grid = np.unique(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(np.sort(a), grid, side="right") / a.size
    ecdf_b = np.searchsorted(np.sort(b), grid, side="right") / b.size
    want = float(np.max(np.abs(ecdf_a - ecdf_b)))
    got = exact_ks_from_value_counts(
        {int(k): int(v) for k, v in cur.items()},
        {int(k): int(v) for k, v in base.items()})
    assert abs(got - want) < 1e-12
    assert got > 0.05  # the injected shift is detected


def test_broadcast_lookup_join_empty_dim(ray_session):
    """Empty dimension table -> every payload null (review finding:
    searchsorted on an empty key array raised IndexError)."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.referential import broadcast_lookup_join

    fact = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "k": pa.array([10, None], pa.int64())})
    dim = pa.table({"dk": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string())})
    out = broadcast_lookup_join(rd.from_arrow(fact), "k", dim, "dk", ["name"]) \
        .to_pandas()
    assert out["name"].isna().all()


def test_turn_contiguity_check(ray_session):
    """Gapped / nonzero-start conversations fail; contiguous ones pass."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import (
        turn_contiguity_check,
    )

    rows = []
    for conv, idxs in [("c1", [0, 1, 2]),        # clean
                       ("c2", [0, 1, 3]),        # gap
                       ("c3", [1, 2]),           # nonzero start
                       ("c4", [0])]:             # single-turn clean
        rows += [{"conv_id": conv, "turn_idx": i, "text": "t"} for i in idxs]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    v = turn_contiguity_check(ds)
    assert not v.passed
    assert v.stats["violating_conversations"] == 2
    bad = v.violations.to_pandas()
    assert sorted(bad["conv_id"]) == ["c2", "c3"]

    clean = rd.from_arrow(pa.Table.from_pylist(
        [{"conv_id": c, "turn_idx": i} for c in ("a", "b")
         for i in range(4)]))
    assert turn_contiguity_check(clean).passed
