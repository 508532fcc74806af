"""Multimodal stage plumbing: schema round-trip, actor-pool decode →
feature pipeline, frame explosion, strict-mode stub behavior."""

import numpy as np
import pytest

from advanced_data_profile_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSample,
    ImageDecode,
    ImageFeatures,
    synth_media_table,
)


def test_synth_schema():
    t = synth_media_table(16)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert synth_media_table(16).equals(t)  # deterministic


def test_decode_feature_pipeline(ray_session):
    import ray.data as rd

    t = synth_media_table(48)
    ds = rd.from_arrow(t)
    images = ds.map_batches(
        lambda b: b.filter(__import__("pyarrow").compute.equal(b["kind"], "image")),
        batch_format="pyarrow",
    )
    feats = (
        images.map_batches(ImageDecode, batch_format="pyarrow", batch_size=16,
                           concurrency=2)
        .map_batches(ImageFeatures, batch_format="pyarrow", batch_size=16,
                     concurrency=2)
        .to_pandas()
    )
    n_images = sum(1 for k in t["kind"].to_pylist() if k == "image")
    assert len(feats) == n_images
    f0 = np.asarray(feats["features"][0])
    assert f0.shape == (14,)  # 3 means + 3 stds + 8 hist bins
    assert abs(f0[6:].sum() - 1.0) < 1e-5  # histogram normalized


def test_decode_deterministic(ray_session):
    import ray.data as rd

    t = synth_media_table(8)
    out1 = rd.from_arrow(t).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=8, concurrency=1
    ).to_pandas()
    out2 = rd.from_arrow(t).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=8, concurrency=1
    ).to_pandas()
    assert (np.stack(out1["pixels"]) == np.stack(out2["pixels"])).all()


def test_frame_sample_explosion(ray_session):
    import ray.data as rd

    t = synth_media_table(32)
    frames = rd.from_arrow(t).map_batches(
        FrameSample, fn_constructor_kwargs={"every_ms": 5000},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    durs = dict(zip(t["media_id"].to_pylist(), t["duration_ms"].to_pylist()))
    want = sum(max(1, d // 5000) for d in durs.values())
    assert len(frames) == want
    per = frames.groupby("media_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
    assert (per["max"] == per["count"] - 1).all()


def test_strict_mode_raises(ray_session):
    import ray
    import ray.data as rd

    t = synth_media_table(4)
    with pytest.raises(Exception) as ei:
        rd.from_arrow(t).map_batches(
            ImageDecode, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", batch_size=4, concurrency=1,
        ).count()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
