"""Checkpoint/resume: partial run → resume must (a) not recompute done
partitions, (b) produce an identical final profile, (c) carry full
per-partition lineage + metrics (SURVEY.md §5.6)."""

import os

import pytest

from advanced_data_profile_ray.sources.transcripts import DIRTY, write_transcript_dataset


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_data")
    paths = write_transcript_dataset(str(d), n_convs=300, seed=21, cfg=DIRTY, n_files=6)
    return paths


def test_resume_identical_and_skips_done(ray_session, shards, tmp_path):
    from advanced_data_profile_ray.checkpoint import profile_partitioned
    from advanced_data_profile_ray.pipelines.validate import transcript_profile_config

    ckdir = str(tmp_path / "ck")
    cfg = transcript_profile_config()

    # phase 1: profile only the first 3 shards (simulated interrupted run)
    prof_a, parts_a = profile_partitioned(shards[:3], ckdir, cfg)
    assert all(not v["resumed"] for v in parts_a.values())
    mtimes = {f: os.path.getmtime(os.path.join(ckdir, f)) for f in os.listdir(ckdir)}
    assert len(mtimes) == 3

    # phase 2: full run resumes — first 3 skipped, last 3 computed
    prof_b, parts_b = profile_partitioned(shards, ckdir, cfg)
    resumed = {p: v["resumed"] for p, v in parts_b.items()}
    assert sum(resumed.values()) == 3
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckdir, f)) == t  # untouched

    # fresh run in a clean dir must match the resumed profile exactly
    prof_c, _ = profile_partitioned(shards, str(tmp_path / "ck2"), cfg)
    fin_b, fin_c = prof_b.finalize(), prof_c.finalize()
    assert fin_b["table"] == fin_c["table"]
    for cb, cc in zip(fin_b["columns"], fin_c["columns"]):
        assert cb == cc, cb.get("column")


def test_lineage_and_metrics(ray_session, shards, tmp_path):
    from advanced_data_profile_ray.checkpoint import profile_partitioned

    prof, parts = profile_partitioned(shards, str(tmp_path / "ck"),
                                      None)
    import pyarrow.parquet as pq

    total = 0
    for p, info in parts.items():
        assert info["lineage"]["input_path"] == p
        assert info["lineage"]["input_size"] == os.path.getsize(p)
        want_rows = pq.ParquetFile(p).metadata.num_rows
        assert info["metrics"]["row_count"] == want_rows
        total += want_rows
    assert prof.row_count == total


def test_changed_input_invalidates(ray_session, shards, tmp_path):
    from advanced_data_profile_ray.checkpoint import load_checkpoint, profile_partitioned

    ckdir = str(tmp_path / "ck")
    profile_partitioned(shards[:1], ckdir, None)
    assert load_checkpoint(ckdir, shards[0]) is not None
    # append a byte → size changes → checkpoint invalid
    stat = os.stat(shards[0])
    try:
        with open(shards[0], "ab") as f:
            f.write(b"x")
        assert load_checkpoint(ckdir, shards[0]) is None
    finally:
        os.truncate(shards[0], stat.st_size)
        # content and size are back to the original: restore mtime so the
        # full fingerprint (size + mtime + footer) matches again
        os.utime(shards[0], ns=(stat.st_atime_ns, stat.st_mtime_ns))
    assert load_checkpoint(ckdir, shards[0]) is not None


def test_same_size_rewrite_invalidates(ray_session, shards, tmp_path):
    """A same-size rewrite with different content must NOT resume stale
    sketches — the mtime/footer legs of the fingerprint catch what a
    size-only check misses."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.checkpoint import load_checkpoint, profile_partitioned

    ckdir = str(tmp_path / "ck")
    profile_partitioned(shards[:1], ckdir, None)
    assert load_checkpoint(ckdir, shards[0]) is not None
    stat = os.stat(shards[0])
    backup = str(tmp_path / "backup.parquet")
    shutil.copy2(shards[0], backup)
    try:
        # rewrite with different content, then pad to the exact old size
        # and restore the old mtime — only the footer hash can tell
        t = pq.read_table(shards[0])
        pq.write_table(t.slice(0, max(1, t.num_rows // 2)), shards[0])
        with open(shards[0], "ab") as f:
            f.write(b"\0" * max(0, stat.st_size - os.path.getsize(shards[0])))
        os.utime(shards[0], ns=(stat.st_atime_ns, stat.st_mtime_ns))
        assert load_checkpoint(ckdir, shards[0]) is None
    finally:
        shutil.copy2(backup, shards[0])
        os.utime(shards[0], ns=(stat.st_atime_ns, stat.st_mtime_ns))


def test_partition_verdicts(ray_session, shards, tmp_path):
    from advanced_data_profile_ray.checkpoint import partition_verdicts, profile_partitioned
    from advanced_data_profile_ray.pipelines.validate import transcript_profile_config

    prof, parts = profile_partitioned(shards, str(tmp_path / "ck"),
                                      transcript_profile_config())
    verdicts = partition_verdicts(parts, baseline=prof)
    assert len(verdicts) == len(shards)
    for path, v in verdicts.items():
        assert "null_blank(text)" in v["checks"]
        assert "drift" in v["checks"]
        # each shard's distribution ≈ the whole table's (same generator)
        assert v["checks"]["drift"]["passed"], (path, v)
