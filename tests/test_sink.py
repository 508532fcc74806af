"""Resumable partitioned sink: skip-finished semantics + atomicity."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _make_shards(tmp_path, n=4, rows=100):
    paths = []
    for i in range(n):
        t = pa.table({"x": pa.array(range(i * rows, (i + 1) * rows), pa.int64())})
        p = str(tmp_path / f"shard_{i:03d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def test_write_and_resume(ray_session, tmp_path):
    from advanced_data_profile_ray.sources.sink import write_partitioned_parquet

    paths = _make_shards(tmp_path)
    out_dir = str(tmp_path / "out")

    def double(t: pa.Table) -> pa.Table:
        return t.set_column(0, "x", pc.multiply(t["x"], 2))

    r1 = write_partitioned_parquet(paths, out_dir, batch_fn=double)
    assert len(r1["written"]) == 4 and not r1["skipped"]
    assert r1["rows_written"] == 400

    # resume: nothing recomputed
    r2 = write_partitioned_parquet(paths, out_dir, batch_fn=double)
    assert not r2["written"] and len(r2["skipped"]) == 4
    assert r2["rows_written"] == 0

    # delete one output -> only that shard recomputes
    victim = r1["written"][1]
    os.remove(victim)
    r3 = write_partitioned_parquet(paths, out_dir, batch_fn=double)
    assert r3["written"] == [victim] and len(r3["skipped"]) == 3

    # content check: transform applied, one file per shard
    t = pq.read_table(victim)
    assert t["x"][0].as_py() == 200  # shard 1 starts at 100, doubled
    assert not any(f.endswith(".tmp") for f in os.listdir(out_dir))


def test_dataset_to_partitioned(ray_session, tmp_path):
    import ray.data as rd

    from advanced_data_profile_ray.sources.sink import dataset_to_partitioned

    ds = rd.range(1000).repartition(8)
    out = dataset_to_partitioned(ds, str(tmp_path / "dsout"))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) > 1  # never one giant file
    total = sum(pq.ParquetFile(os.path.join(out, f)).metadata.num_rows for f in files)
    assert total == 1000


def test_duplicate_basenames_do_not_collide(ray_session, tmp_path):
    """Shards with equal basenames in different dirs each keep their data
    (review finding: silent collision would drop one shard forever)."""
    import os

    from advanced_data_profile_ray.sources.sink import write_partitioned_parquet

    paths = []
    for year in ("2024", "2025"):
        d = tmp_path / year
        d.mkdir()
        t = pa.table({"x": pa.array([int(year)] * 10, pa.int64())})
        p = str(d / "part0.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out_dir = str(tmp_path / "out")
    r = write_partitioned_parquet(paths, out_dir)
    assert len(r["written"]) == 2 and r["rows_written"] == 20
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(files) == 2
    vals = sorted(pq.read_table(os.path.join(out_dir, f))["x"][0].as_py()
                  for f in files)
    assert vals == [2024, 2025]
    r2 = write_partitioned_parquet(paths, out_dir)
    assert not r2["written"] and len(r2["skipped"]) == 2


def test_delete_keys_resume_skips_finished_shards(ray_session, tmp_path):
    """Tombstone deletion drops exactly the keyed rows per shard; a
    second invocation (resume) rewrites nothing."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.sources.sink import delete_keys_from_shards

    paths = []
    for s in range(3):
        t = pa.table({"k": pa.array(np.arange(s * 10, s * 10 + 10)),
                      "v": pa.array(np.arange(10))})
        p = str(tmp_path / f"shard{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "out")
    tomb = np.array([0, 5, 12, 25, 29, 999])
    r1 = delete_keys_from_shards(paths, "k", tomb, out)
    assert len(r1["written"]) == 3 and not r1["skipped"]
    kept = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in sorted(os.listdir(out))]
    )["k"].to_numpy()
    want = np.setdiff1d(np.arange(30), tomb)
    assert sorted(kept) == sorted(want)
    r2 = delete_keys_from_shards(paths, "k", tomb, out)
    assert not r2["written"] and len(r2["skipped"]) == 3


def test_delete_keys_string_keys_with_nulls(ray_session, tmp_path):
    """String tombstones delete the right rows; null keys survive
    (documented SQL NOT IN semantics) instead of crashing searchsorted."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from advanced_data_profile_ray.sources.sink import delete_keys_from_shards

    t = pa.table({"k": pa.array(["a", "b", None, "c", "d"], pa.string()),
                  "v": pa.array([1, 2, 3, 4, 5])})
    p = str(tmp_path / "s.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "out")
    delete_keys_from_shards([p], "k", ["b", "d", "zz"], out)
    kept = pq.read_table(os.path.join(out, "s.parquet"))
    assert kept["v"].to_pylist() == [1, 3, 4]


def test_upsert_merge_and_resume(ray_session, tmp_path):
    from advanced_data_profile_ray.sources.sink import upsert_keys_into_shards

    paths = _make_shards(tmp_path, n=3, rows=50)  # x in 0..149
    out_dir = str(tmp_path / "merged")
    # update x=10,120 (flag them by adding 1000), insert x=500,501
    delta = pa.table({"x": pa.array([10, 120, 500, 501], pa.int64())})

    r1 = upsert_keys_into_shards(paths, "x", delta, out_dir)
    # 3 rewritten base shards + 1 delta shard
    assert len(r1["written"]) == 4 and not r1["skipped"]

    files = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.endswith(".parquet"))
    merged = pa.concat_tables([pq.read_table(f) for f in files])
    xs = sorted(merged["x"].to_pylist())
    # matched keys appear exactly once (replaced), inserts present
    assert xs == sorted(set(range(150)) | {500, 501})
    assert xs.count(10) == 1 and xs.count(120) == 1

    # resume: everything (incl. the delta shard) skips
    r2 = upsert_keys_into_shards(paths, "x", delta, out_dir)
    assert not r2["written"] and len(r2["skipped"]) == 4
    assert r2["rows_written"] == 0


def test_upsert_rejects_reserved_shard_name(ray_session, tmp_path):
    import pytest as _pytest

    from advanced_data_profile_ray.sources.sink import upsert_keys_into_shards

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "_delta_upsert.parquet")
    pq.write_table(t, p)
    delta = pa.table({"x": pa.array([2], pa.int64())})
    with _pytest.raises(ValueError, match="reserved delta output name"):
        upsert_keys_into_shards([p], "x", delta, str(tmp_path / "out"))
