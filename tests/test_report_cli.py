"""Report emitters (S3 parity: JSON + gzipped HTML with sketch-derived
plot data) and the CLI entry points (EP1/EP2 parity: main.py:56-68,
Profiler.py:1115-1145)."""

import gzip
import json
import os

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def profiled(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset

    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "x": pa.array(rng.lognormal(0, 1, 4000)),
            "s": pa.array((rng.integers(0, 5, 4000)).astype(str)),
        }
    )
    return profile_dataset(rd.from_arrow(t), batch_size=512)


def test_plot_data_from_sketches(profiled):
    from advanced_data_profile_ray.report import (
        box_plot_data,
        cdf_plot_data,
        qq_plot_data,
    )

    col = profiled.columns["x"]
    box = box_plot_data(col)
    assert box["min"] <= box["q1"] <= box["median"] <= box["q3"] <= box["max"]
    qq = qq_plot_data(col)
    assert len(qq["theoretical"]) == len(qq["sample"]) == 50
    assert qq["sample"] == sorted(qq["sample"])  # quantiles are monotone
    cdf = cdf_plot_data(col)
    assert cdf["value"][0] <= cdf["value"][-1]
    assert cdf["cum_freq"][0] == 0.0 and cdf["cum_freq"][-1] == 1.0


def test_norm_ppf_accuracy():
    """Acklam approximation vs known standard-normal quantiles."""
    from advanced_data_profile_ray.report import _norm_ppf

    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)
    assert _norm_ppf(0.975) == pytest.approx(1.959964, abs=1e-5)
    assert _norm_ppf(0.0013498980316301) == pytest.approx(-3.0, abs=1e-5)


def test_json_and_html_reports(profiled, tmp_path):
    from advanced_data_profile_ray.report import write_html_report, write_json_report

    jpath = str(tmp_path / "p.json")
    write_json_report(profiled, jpath)
    d = json.load(open(jpath))
    assert d["table"]["row_count"] == 4000
    cols = {c["column"] for c in d["columns"]}
    assert cols == {"x", "s"}
    assert any("plots" in c for c in d["columns"])

    hpath = write_html_report(profiled, str(tmp_path / "p.html"))
    assert hpath.endswith(".gz")
    doc = gzip.open(hpath, "rt").read()
    assert "<table" in doc and "rows=4000" in doc


def test_cli_profile_and_validate(ray_session, tmp_path):
    """Drive both CLI commands in-process (the CLI owns ray.init but
    guards on is_initialized, so the session fixture's Ray is reused)."""
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.cli import main
    from advanced_data_profile_ray.sources.transcripts import (
        DIRTY,
        gen_transcripts,
    )

    src = str(tmp_path / "input_myschema_mytable.parquet")
    pq.write_table(gen_transcripts(100, seed=5, cfg=DIRTY), src)
    out = str(tmp_path / "out")

    # CLI owns shutdown in main(); stub it out so the shared test session
    # survives (only the CLI is allowed to shut down its own session)
    import ray

    real_shutdown = ray.shutdown
    ray.shutdown = lambda *a, **k: None
    try:
        rc = main(["profile", src, "-o", out])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "profile_myschema_mytable.json"))

        rc = main(["validate", src, "-o", out, "--check-tools"])
        assert rc == 1  # DIRTY data must fail validation
        verdicts = json.load(open(os.path.join(out, "verdicts.json")))
        assert verdicts["passed"] is False
        names = {v["check"] for v in verdicts["verdicts"]}
        assert "unique(conv_id, turn_idx)" in names
        assert os.path.isdir(os.path.join(out, "violations"))
    finally:
        ray.shutdown = real_shutdown


def test_read_any_jsonl(ray_session, tmp_path):
    """JSONL source path: the adaptive reader streams newline-delimited
    JSON through the same profile pipeline as CSV/Parquet."""
    import json

    from advanced_data_profile_ray.cli import read_any
    from advanced_data_profile_ray.pipelines.profile import profile_dataset

    p = tmp_path / "events.jsonl"
    with open(p, "w") as f:
        for i in range(50):
            f.write(json.dumps({"user_id": i % 7, "value": i * 1.5,
                                "tag": None if i % 10 == 0 else f"t{i%3}"})
                    + "\n")
    ds = read_any([str(p)])
    prof = profile_dataset(ds)
    fin = prof.finalize()["table"]
    assert fin["row_count"] == 50
    assert prof.columns["tag"].finalize()["null_count"] == 5


def test_derive_table_name():
    from advanced_data_profile_ray.cli import derive_table_name

    assert derive_table_name("/x/input_sales_orders.csv") == ("sales", "orders")
    assert derive_table_name("plain.parquet") == ("default", "plain")


def test_cli_query_subcommand(ray_session, tmp_path, capsys):
    from advanced_data_profile_ray.cli import main

    # --list prints the registry with oracle markers
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "benford_prices" in out and out.count("\n") > 150

    # run a query to parquet
    dst = str(tmp_path / "res.parquet")
    rc = main(["query", "benford_prices",
               "--sf-dir", "/root/testdata/sf0.001", "-o", dst])
    assert rc == 0
    import pyarrow.parquet as pq

    t = pq.read_table(dst)
    assert t.num_rows == 9 and "chi2_term" in t.column_names

    # unknown name -> suggestion + exit 2
    assert main(["query", "bennford"]) == 2
    assert "did you mean" in capsys.readouterr().err
