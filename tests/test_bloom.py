"""Bloom-filter pre-join pruning (stages/bloom.py): no false negatives,
bounded false-positive rate, and prune-before-join exactness."""

import numpy as np
import pyarrow as pa
import pytest


def _ds_from_keys(keys, col="k"):
    import ray.data as rd

    return rd.from_arrow(pa.table({col: pa.array(keys, pa.int64())}))


def test_bloom_no_false_negatives(ray_session):
    import ray

    from advanced_data_profile_ray.stages.bloom import bloom_contains, build_bloom

    keys = np.arange(-5000, 5000, dtype=np.int64)
    ref = build_bloom(_ds_from_keys(keys), "k", num_bits=1 << 17)
    bloom = ray.get(ref)
    assert bloom_contains(bloom, keys).all()


def test_bloom_fpp_bounded(ray_session):
    import ray

    from advanced_data_profile_ray.stages.bloom import bloom_contains, build_bloom

    n = 10_000
    keys = np.arange(n, dtype=np.int64)
    # m/n ≈ 13 bits per key, k=7 → theoretical fpp ≈ 0.5%
    ref = build_bloom(_ds_from_keys(keys), "k", num_bits=1 << 17)
    bloom = ray.get(ref)
    absent = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fpp = bloom_contains(bloom, absent).mean()
    assert fpp < 0.02, fpp


def test_bloom_prune_keeps_all_build_keys_and_drops_nulls(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.stages.bloom import bloom_prune, build_bloom

    build = _ds_from_keys(list(range(0, 100, 2)))  # evens 0..98
    probe = rd.from_arrow(pa.table({
        "k": pa.array(list(range(100)) + [None, None], pa.int64()),
        "v": pa.array([f"r{i}" for i in range(100)] + ["n1", "n2"]),
    }))
    ref = build_bloom(build, "k", num_bits=1 << 12)
    kept = bloom_prune(probe, "k", ref).to_pandas()
    kept_keys = set(kept["k"].tolist())
    # every even key survives (no false negatives); nulls never survive
    assert set(range(0, 100, 2)) <= kept_keys
    assert not kept["k"].isna().any()
    # pruning is subset-of-probe: payload column travels untouched
    assert (kept["v"] == "r" + kept["k"].astype(int).astype(str)).all()


def test_bloom_num_bits_validation(ray_session):
    from advanced_data_profile_ray.stages.bloom import build_bloom

    with pytest.raises(ValueError):
        build_bloom(_ds_from_keys([1]), "k", num_bits=100)
