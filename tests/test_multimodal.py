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


def test_real_ppm_decode_and_resize(ray_session):
    """ImageDecode really decodes binary PPM and nearest-resizes it."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.multimodal import (
        decode_ppm,
        encode_ppm,
        nearest_resize,
    )

    img = np.zeros((8, 6, 3), np.uint8)
    img[:4, :, 0] = 200  # top half red
    img[4:, :, 2] = 123  # bottom half blue
    payload = encode_ppm(img)
    assert (decode_ppm(payload) == img).all()
    # comments + arbitrary whitespace in the header
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n  ")
    assert (decode_ppm(commented) == img).all()

    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        ImageDecode, fn_constructor_kwargs={"target_size": (4, 4)},
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).to_pandas()
    px = np.asarray(out["pixels"][0], dtype=np.uint8).reshape(4, 4, 3)
    assert (px == nearest_resize(img, 4, 4)).all()
    assert (px[0, :, 0] == 200).all() and (px[3, :, 2] == 123).all()


def test_real_bmp_decode_and_resize(ray_session):
    """decode_bmp handles row padding, bottom-up AND top-down layouts,
    BGR order; ImageDecode picks it up end-to-end."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.multimodal import (
        ImageDecode,
        decode_bmp,
        encode_bmp,
        nearest_resize,
    )

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (7, 5, 3), np.uint8)  # odd width → padding
    payload = encode_bmp(img)
    assert (decode_bmp(payload) == img).all()

    # top-down variant: negative height, rows not flipped
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # natural order
    body = rows.tobytes()
    td = (b"BM" + (54 + len(body)).to_bytes(4, "little")
          + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
          + (40).to_bytes(4, "little") + w.to_bytes(4, "little")
          + (-h).to_bytes(4, "little", signed=True)
          + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
          + b"\x00" * 24 + body)
    assert (decode_bmp(td) == img).all()

    # truncated / non-BMP payloads refuse cleanly
    assert decode_bmp(payload[:40]) is None
    assert decode_bmp(b"JUNK" * 20) is None

    out = rd.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
    })).map_batches(
        ImageDecode, fn_constructor_kwargs={"target_size": (4, 4)},
        batch_format="pyarrow", batch_size=8, concurrency=1,
    ).to_pandas()
    px = np.asarray(out["pixels"][0], dtype=np.uint8).reshape(4, 4, 3)
    assert (px == nearest_resize(img, 4, 4)).all()


def test_real_wav_decode(ray_session):
    """AudioDecode really decodes PCM WAV via the stdlib wave module."""
    import io
    import wave

    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.multimodal import AudioDecode

    rate = 8000
    tgrid = np.arange(rate)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * tgrid / rate) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(sine.tobytes())
    t = pa.table({
        "media_id": pa.array([7, 8], pa.int64()),
        "payload": pa.array([buf.getvalue(), b"not a wav"], pa.binary()),
    })
    out = rd.from_arrow(t).map_batches(
        AudioDecode, batch_format="pyarrow", batch_size=8, concurrency=1,
    ).to_pandas().set_index("media_id")
    assert out.loc[7, "sample_rate"] == rate
    assert out.loc[7, "duration_ms"] == 1000
    assert abs(out.loc[7, "rms"] - 20000 / np.sqrt(2)) < 100
    # 440 Hz crosses zero ~880 times/sec -> zcr ~ 0.11
    assert 0.09 < out.loc[7, "zcr"] < 0.13
    assert np.isnan(out.loc[8, "rms"])  # non-WAV -> nulls (non-strict)


def test_y4m_frame_sample_real_demux(ray_session):
    """A real Y4M stream demuxes to the right frames at the right
    sampling interval, and the emitted PPM frames feed ImageDecode."""
    import numpy as np
    import pyarrow as pa

    from advanced_data_profile_ray.stages.multimodal import (
        FrameSample,
        decode_ppm,
        decode_y4m,
        encode_y4m_mono,
    )

    # 30 frames at 10 fps, each filled with its own index value
    frames = [np.full((8, 6), i, np.uint8) for i in range(30)]
    payload = encode_y4m_mono(frames, fps=10)
    w, h, fps, parsed = decode_y4m(payload)
    assert (w, h, fps, len(parsed)) == (6, 8, 10.0, 30)

    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "duration_ms": pa.array([3000], pa.int32()),
    })
    out = FrameSample(every_ms=500, strict=True)(batch)
    # 10 fps × 0.5 s = every 5th frame → sources 0,5,10,15,20,25
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3, 4, 5]
    fills = []
    for p in out["payload"].to_pylist():
        img = decode_ppm(p)
        assert img.shape == (8, 6, 3)
        assert (img == img[0, 0, 0]).all()
        fills.append(int(img[0, 0, 0]))
    assert fills == [0, 5, 10, 15, 20, 25]


def test_frame_sample_strict_rejects_compressed(ray_session):
    import pyarrow as pa
    import pytest

    from advanced_data_profile_ray.stages.multimodal import FrameSample

    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"\x00\x00\x00 ftypmp42"], pa.binary()),
        "duration_ms": pa.array([2000], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        FrameSample(every_ms=1000, strict=True)(batch)


def test_y4m_unsupported_chroma_distinct_error(ray_session):
    """A REAL Y4M stream with unsupported chroma (C422) is distinguished
    from 'not Y4M': strict mode raises UnsupportedY4MChroma (naming the
    chroma, not 'compressed codec'); non-strict SKIPS the stream (no
    frames) instead of byte-slice-stubbing it into bogus frames."""
    import pyarrow as pa
    import pytest

    from advanced_data_profile_ray.stages.multimodal import (
        FrameSample,
        UnsupportedY4MChroma,
        decode_y4m,
    )

    # valid YUV4MPEG2 header, chroma 422 (w*h + 2*(w/2*h) per frame)
    payload = (b"YUV4MPEG2 W4 H2 F10:1 C422\n"
               + b"FRAME\n" + bytes(4 * 2 + 2 * (2 * 2)))
    with pytest.raises(UnsupportedY4MChroma, match="C422"):
        decode_y4m(payload)

    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "duration_ms": pa.array([2000], pa.int32()),
    })
    with pytest.raises(UnsupportedY4MChroma, match="C422"):
        FrameSample(every_ms=1000, strict=True)(batch)
    out = FrameSample(every_ms=1000, strict=False)(batch)
    assert out.num_rows == 0  # skipped, not stubbed


def test_first_value_within_empty_input(ray_session):
    """Zero-block input still yields the typed out_col (ADVICE r03)."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.stages.window import first_value_within

    t = pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_id": pa.array([], pa.int64()),
        "v": pa.array([], pa.string()),
    })
    out = first_value_within(rd.from_arrow(t), "user_id",
                             ["ts", "event_id"], "v", out_col="first_v")
    # Ray's to_pandas drops columns on all-empty blocks; assert on the
    # Dataset schema, which is what select_columns(out_col) consults
    assert "first_v" in out.schema().names
    assert out.count() == 0
    assert out.select_columns(["first_v"]).count() == 0  # no KeyError
