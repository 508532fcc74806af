"""CLI entry points — the rebuild of the reference's two drivers
(main.py:56-68 and Profiler.py __main__:1115-1145), ``ray job submit``-able.

    python -m advanced_data_profile_ray.cli profile <parquet-or-csv...> [-o DIR]
    python -m advanced_data_profile_ray.cli validate <parquet...> --baseline p.pkl [-o DIR]

Owns its Ray session (guarded init, shutdown at exit) — the only places
allowed to, besides bench.py and the test fixture.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def derive_table_name(path: str) -> tuple[str, str]:
    """Schema/table from filename like the reference's
    ``input_<schema>_<table>.csv`` convention (Profiler.py:1125-1129),
    falling back to the stem."""
    stem = os.path.splitext(os.path.basename(path))[0]
    m = re.match(r"input_([^_]+)_(.+)", stem)
    if m:
        return m.group(1), m.group(2)
    return "default", stem


def read_any(paths: list):
    """CSV / JSONL / Parquet → Dataset (the reference's adaptive CSV
    read S1 maps to Ray's block-based readers — no RAM-threshold
    special case needed; blocks stream)."""
    import ray.data as rd

    if all(p.endswith(".csv") for p in paths):
        return rd.read_csv(paths)
    if all(p.endswith((".json", ".jsonl", ".ndjson")) for p in paths):
        return rd.read_json(paths)
    return rd.read_parquet(paths)


def cmd_profile(args) -> int:
    from .pipelines.profile import profile_dataset
    from .report import write_html_report, write_json_report

    _init_ray()
    os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    ds = read_any(args.paths)
    prof = profile_dataset(ds)
    corr = None
    if getattr(args, "corr", False):
        # fifth_phase parity (Profiler.py:997-1077): one extra streaming
        # pass builds the Gram partials; heatmap renders driver-side
        from .pipelines.profile import gram_state

        num_cols = [n for n, c in prof.columns.items()
                    if c.finalize().get("logical_type") in ("integer", "float")]
        if len(num_cols) >= 2:
            st = gram_state(ds.select_columns(num_cols), num_cols)
            if st is not None:
                corr = (num_cols, st.corr_matrix())
    schema, table = derive_table_name(args.paths[0])
    base = os.path.join(args.output, f"profile_{schema}_{table}")
    write_json_report(prof, base + ".json")
    html_path = write_html_report(prof, base + ".html", corr=corr)
    fin = prof.finalize()["table"]
    print(
        f"profiled {fin['row_count']} rows x {fin['column_count']} cols "
        f"in {time.time()-t0:.1f}s -> {base}.json, {html_path}"
    )
    return 0


def cmd_validate(args) -> int:
    from .pipelines.validate import load_profile, validate_transcripts
    from .report import write_html_report, write_json_report
    from .sources.transcripts import TOOL_CATALOG

    _init_ray()
    os.makedirs(args.output, exist_ok=True)
    ds = read_any(args.paths)
    baseline = load_profile(args.baseline) if args.baseline else None
    roster = None
    if args.roster:
        import pyarrow.parquet as pq

        roster = pq.read_table(args.roster)["conv_id"].to_pylist()
    report = validate_transcripts(
        ds, valid_conv_ids=roster,
        valid_tools=TOOL_CATALOG if args.check_tools else None,
        baseline=baseline,
        paths=[p for p in args.paths if p.endswith(".parquet")] or None,
    )
    with open(os.path.join(args.output, "verdicts.json"), "w") as f:
        json.dump(report.to_dict(), f, indent=2)
    report.write_violations(os.path.join(args.output, "violations"))
    write_json_report(report.profile, os.path.join(args.output, "profile.json"),
                      report.verdicts)
    write_html_report(report.profile, os.path.join(args.output, "report.html"),
                      report.verdicts)
    print(f"validation {'PASSED' if report.passed else 'FAILED'} -> {args.output}")
    return 0 if report.passed else 1


def cmd_query(args) -> int:
    """Run any registered query pipeline by name over a testdata-shaped
    directory — the whole §2 registry as a user-facing tool. ``--list``
    prints names (with ✓ for oracle-twinned entries)."""
    from .pipelines.queries import ORACLE, QUERIES

    if args.list or not args.name:
        for name in sorted(QUERIES):
            mark = "✓" if name in ORACLE else " "
            print(f"{mark} {name}")
        return 0
    if args.name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(args.name, QUERIES, n=3)
        print(f"unknown query {args.name!r}"
              + (f"; did you mean: {', '.join(close)}" if close else ""),
              file=sys.stderr)
        return 2
    _init_ray()
    t0 = time.time()
    res = QUERIES[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    wall = time.time() - t0
    if args.output:
        res.to_parquet(args.output, index=False)
        print(f"{args.name}: {len(res)} rows in {wall:.2f}s -> {args.output}")
    else:
        with pd.option_context("display.max_rows", args.max_rows,
                               "display.width", 200):
            print(res)
        print(f"# {args.name}: {len(res)} rows in {wall:.2f}s")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="advanced_data_profile_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("profile", help="profile tables to JSON+HTML reports")
    pp.add_argument("paths", nargs="+")
    pp.add_argument("-o", "--output", default="output")
    pp.add_argument("--corr", action="store_true",
                    help="add a correlation heatmap (one extra pass; "
                         "the reference's fifth_phase)")
    pp.set_defaults(fn=cmd_profile)

    pv = sub.add_parser("validate", help="run the transcript validation engine")
    pv.add_argument("paths", nargs="+")
    pv.add_argument("-o", "--output", default="output")
    pv.add_argument("--baseline", help="baseline profile pickle for drift")
    pv.add_argument("--roster", help="dim_conv parquet for referential check")
    pv.add_argument("--check-tools", action="store_true")
    pv.set_defaults(fn=cmd_validate)

    pq_ = sub.add_parser("query", help="run a registered query pipeline "
                                       "by name (see --list)")
    pq_.add_argument("name", nargs="?", default=None)
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq_.add_argument("-o", "--output", help="write result parquet here "
                                            "instead of printing")
    pq_.add_argument("--max-rows", type=int, default=50)
    pq_.add_argument("--list", action="store_true")
    pq_.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
