#!/usr/bin/env python
"""Benchmark harness (driver-run per round; see BASELINE.md).

Headline: end-to-end transcript validation throughput (profiled
turns/sec) over a deterministic synthetic transcript table sized to the
scale factor, plus per-query timings of the oracle-checked suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns": n, "turns_per_sec": r}

``--scaling`` runs the headline job in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (north-rule two-cluster-size criterion,
evidenced at two parallelism levels per driver instruction).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE_ROOT = os.environ.get("ADP_BENCH_CACHE", "/tmp/adp_bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_transcripts_dir() -> tuple[str, int]:
    """Deterministic synthetic transcript parquet sized to the sf dir
    (cached across runs so both scaling levels read identical input)."""
    import pyarrow.parquet as pq

    lineitem_rows = pq.ParquetFile(f"{SF_DIR}/lineitem.parquet").metadata.num_rows
    # 3× lineitem rows of conversations (~54M turns at sf0.1): sized so the
    # headline job is COMPUTE-bound at 32 CPUs — scaling efficiency measured
    # on a seconds-long job only measures fixed scheduling overhead
    n_convs = max(1000, lineitem_rows * 3)
    # 64 files regardless of NUM_CPUS: both scaling levels must read the
    # IDENTICAL input, and 2×max-parallelism map tasks keep the uniqueness
    # hash-shuffle fast path fully wide at 32 CPUs
    n_files = 64
    out_dir = os.path.join(CACHE_ROOT, f"transcripts_sh_c{n_convs}_s42_f{n_files}_dirty")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        from advanced_data_profile_ray.sources.transcripts import (
            DIRTY,
            write_transcript_dataset_sharded,
        )

        t0 = time.time()
        write_transcript_dataset_sharded(out_dir, n_convs=n_convs, seed=42,
                                         cfg=DIRTY, n_files=n_files)
        open(marker, "w").close()
        log(f"generated bench transcripts in {time.time()-t0:.1f}s -> {out_dir}")
    total = 0
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
    return out_dir, total


def run_headline() -> dict:
    import ray
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.validate import validate_transcripts
    from advanced_data_profile_ray.sources.transcripts import TOOL_CATALOG

    data_dir, n_turns = bench_transcripts_dir()
    # roster = the generator's conv universe (clean ids are c0..c{n_convs});
    # derived from lineitem rows exactly like bench_transcripts_dir
    import pyarrow.parquet as pq

    n_convs = max(1000, pq.ParquetFile(f"{SF_DIR}/lineitem.parquet").metadata.num_rows * 3)

    # untimed warm-up: touch the data (page cache) AND run a trivial
    # map_batches so the Ray worker pool is spawned and the library is
    # imported in every worker before the timed section — we benchmark
    # compute+shuffle on a warm cluster, not process cold-start
    import pyarrow as pa

    def _touch(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    rd.read_parquet(data_dir).map_batches(
        _touch, batch_format="pyarrow", batch_size=None
    ).sum("n")

    # vectorized roster build (dim_conv universe) — input prep, untimed
    import numpy as np
    import pyarrow as pa

    roster = pa.array(
        np.char.add("c", np.char.zfill(np.arange(n_convs).astype(str), 8))
    )
    paths = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # min-of-3: the sandbox host has high run-to-run variance (page-cache
    # churn / VM noise, observed 1.5x ambient swings between identical
    # runs); min is the least-noise estimate of engine cost
    wall = None
    for _ in range(3):
        t0 = time.time()
        # FIXED 128 blocks (2/CPU at the 32-CPU leg) so both scaling legs
        # execute the IDENTICAL plan and only resources vary — and because
        # per-block fixed cost (profile-partial emit + merge fan-in) is
        # the measured overhead at the default 256 read blocks:
        # 30.5→22.5 s @8 CPUs, 9.2→8.1 s @32 (fused pass, min-of-2).
        # ADP_BENCH_BLOCKS=0 restores the reader default (for A/Bs).
        nb = int(os.environ.get("ADP_BENCH_BLOCKS", "128"))
        ds = (rd.read_parquet(data_dir, override_num_blocks=nb)
              if nb else rd.read_parquet(data_dir))
        report = validate_transcripts(
            ds, valid_conv_ids=roster, valid_tools=TOOL_CATALOG,
            max_text_null_pct=5.0, max_text_blank_pct=5.0, paths=paths,
        )
        # force verdict computation (validation engine already consumed
        # the pipelines; to_dict touches every verdict)
        _ = report.to_dict()
        run_wall = time.time() - t0
        wall = run_wall if wall is None else min(wall, run_wall)
    return {"seconds": wall, "turns": n_turns, "turns_per_sec": n_turns / wall}


NORMALIZER_QUERY = "q1_pricing_summary"
NORMALIZER_EVERY = 10


def run_queries() -> tuple[dict, list]:
    from advanced_data_profile_ray.pipelines.queries import QUERIES

    import ray.data

    def run_once(fn) -> float:
        t0 = time.time()
        res = fn(SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()  # force execution
        return time.time() - t0

    # min-of-2 per query: host noise spikes (±30% run-to-run, documented
    # in BASELINE.md) can triple a single-run number; min is the
    # least-noise estimate of engine cost. Queries whose FIRST run is
    # already long (≥4 s) keep the single measurement — the relative
    # noise on long runs is smaller, and at 110 queries an unconditional
    # second rep would double a multi-minute suite for little signal.
    #
    # Normalizer: a pinned reference query (q1, ~0.65 s quiet) is re-run
    # every NORMALIZER_EVERY queries and its times recorded IN the bench
    # artifact — host-noise bursts on this VM last minutes and previously
    # made whole alphabetic runs of queries read 3-10x slow with no code
    # change (BENCH_r04 tail); a per-slot normalizer makes every recorded
    # number attributable to engine vs ambient window after the fact.
    timings = {}
    norm_fn = QUERIES.get(NORMALIZER_QUERY)
    norm_samples: list = []

    def sample_normalizer(pos: int):
        if norm_fn is None:
            return
        norm_samples.append({"at": pos, "sec": round(run_once(norm_fn), 3)})

    sample_normalizer(0)
    for i, (name, fn) in enumerate(sorted(QUERIES.items()), start=1):
        best = None
        for rep in range(2):
            dt = run_once(fn)
            best = dt if best is None else min(best, dt)
            if dt >= 4.0:
                break
        timings[name] = round(best, 3)
        if i % NORMALIZER_EVERY == 0:
            sample_normalizer(i)
    sample_normalizer(len(QUERIES))
    return timings, norm_samples


def host_probe() -> float:
    """Single-thread matmul seconds (fixed input) — ambient-throughput
    calibration recorded alongside every bench: this host swings ~3× in
    CPU speed between identical runs minutes apart (BASELINE.md), so a
    wall-clock number is only interpretable next to its probe. Quiet
    baseline ≈ 3.2 s."""
    import numpy as np

    a = np.random.default_rng(0).normal(size=(2000, 2000))
    t0 = time.time()
    for _ in range(3):
        a @ a
    return round(time.time() - t0, 2)


def wait_for_quiet_host(threshold: float = 4.2,
                        max_wait: float | None = None) -> dict:
    """Bounded wait for a quiet host window before the timed legs: this
    VM's ambient single-thread speed swings ~2.5x for tens of minutes
    (BASELINE.md), and the driver records ONE bench run per round — a
    run landing in a slow window reads as an engine regression. Poll the
    matmul probe (quiet ≈ 3.2 s) every 20 s until it drops under
    ``threshold`` or ``max_wait`` (env ADP_BENCH_MAX_WAIT, default 900 s
    -- r4's 360 s cap expired mid-burst and the round artifact recorded
    a noisy window) elapses, then proceed regardless; every probe is recorded in the
    output so a still-slow window stays attributable."""
    if max_wait is None:
        max_wait = float(os.environ.get("ADP_BENCH_MAX_WAIT", "900"))
    t0 = time.time()
    probes = []
    while True:
        p = host_probe()
        probes.append(p)
        if p <= threshold or (time.time() - t0) + 20 > max_wait:
            return {"waited_sec": round(time.time() - t0, 1), "probes": probes}
        log(f"host busy (probe {p}s > {threshold}s quiet bar); waiting")
        time.sleep(20)


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    quiet = wait_for_quiet_host()
    probe_before = quiet["probes"][-1]
    headline = run_headline()
    if os.environ.get("ADP_BENCH_SKIP_QUERIES"):
        queries, norm_samples = {}, []
    else:
        queries, norm_samples = run_queries()
    ray.shutdown()

    print(
        json.dumps(
            {
                "metric": "transcript_validation_wall_seconds",
                "value": round(headline["seconds"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "turns": headline["turns"],
                "turns_per_sec": round(headline["turns_per_sec"], 1),
                # pinned-query normalizer: q1 re-timed every 10 queries;
                # "at"=N means after the Nth query alphabetically. Quiet
                # band for q1 is ~0.6-0.8 s; a sample far above it marks
                # the surrounding queries as taken in a noisy host window.
                "normalizer": {"query": NORMALIZER_QUERY,
                               "samples": norm_samples},
                "host_probe_sec": {"before": probe_before, "after": host_probe(),
                                   "quiet_baseline": 3.2,
                                   "quiet_wait_sec": quiet["waited_sec"],
                                   "wait_probes": quiet["probes"]},
            }
        )
    )


def scaling():
    """Same headline job in fresh processes at 8 and 32 CPUs."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            ADP_BENCH_SKIP_QUERIES="1",
            PYTHONPATH=REPO,
            # interleaved min-of-2 is the noise defense here; a long
            # per-leg quiet wait would quadruple and still race the noise
            ADP_BENCH_MAX_WAIT=os.environ.get("ADP_BENCH_MAX_WAIT", "90"),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32

    # INTERLEAVED min-of-2 per level: the sandbox host shows large
    # run-to-run variance (page-cache churn / turbo & thermal state / VM
    # noise) that consistently penalizes whichever leg runs later —
    # alternating lo/hi exposes both levels to the same host states; min
    # is the least-noise estimate of the engine's actual cost.
    results: dict = {lo_cpus: [], hi_cpus: []}
    for _ in range(2):
        for ncpu in (lo_cpus, hi_cpus):
            results[ncpu].append(run(ncpu))
            time.sleep(10)
    lo = min(results[lo_cpus], key=lambda r: r["value"])
    hi = min(results[hi_cpus], key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "turns": lo["turns"],
                "turns_per_sec_8": lo["turns_per_sec"],
                "turns_per_sec_32": hi["turns_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "host_probe_sec_8": lo.get("host_probe_sec"),
                "host_probe_sec_32": hi.get("host_probe_sec"),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
