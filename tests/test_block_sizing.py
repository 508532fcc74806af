"""spread_blocks / rightsize_blocks behavior: widen small inputs, leave
large ones untouched, and survive empty datasets."""

import pyarrow as pa


def test_spread_blocks_widens_small(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import spread_blocks

    ds = rd.from_arrow(pa.table({"x": list(range(5000))}))  # 1 block
    out = spread_blocks(ds, min_rows_per_block=256)
    n_batches = len(out.map_batches(
        lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas())
    assert n_batches >= 8  # widened well past the single input block
    assert out.count() == 5000


def test_rightsize_blocks_coalesces_tiny(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import rightsize_blocks

    ds = rd.from_arrow(pa.table({"x": list(range(2000))})).repartition(100)
    out = rightsize_blocks(ds, rows=2000)
    n_batches = len(out.map_batches(
        lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas())
    assert n_batches <= 8
    assert out.count() == 2000


def test_rightsize_blocks_skips_large(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.fast_ops import rightsize_blocks

    ds = rd.range(100)
    # declared huge -> returned untouched (same plan object)
    assert rightsize_blocks(ds, rows=10**12) is ds
