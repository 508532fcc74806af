"""Multimodal (image/audio/video) column stages.

Contract (driver instruction): media ride as opaque ``binary`` columns
with typed metadata columns alongside; decode / feature-extract / resize
/ frame-sample are actor-pool ``map_batches`` stages. The image/audio
codec libraries are NOT in this container, so the codec call itself is
stubbed — either a clearly-marked ``NotImplementedError`` (strict mode)
or a deterministic fake decoder — while all the Ray-side plumbing
(schema, batch sizing, actor signature, zero-copy binary handling,
output layout) is real and tested.

Batch-size guidance: binary payloads are large — callers should pass a
SMALL batch_size (e.g. 64-256) so batch × concurrency fits worker heaps;
blocks of big binaries are what DataContext.target_max_block_size guards.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),        # images/video: declared dims
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),  # audio/video
    ]
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes → (h, w, 3) uint8 derived
    from a seeded hash of the payload. Stands in for PIL/libjpeg."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


class ImageDecode:
    """Actor-pool stage: binary payload → decoded pixel tensor column.

    ``strict=True`` raises NotImplementedError at the codec boundary —
    the behavior a production build replaces with a real decoder (PIL /
    torchvision); ``strict=False`` substitutes the deterministic fake so
    downstream stages stay testable."""

    def __init__(self, strict: bool = False, target_size: tuple = (32, 32)):
        self.strict = strict
        self.h, self.w = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; install a "
                "decoder (PIL/libjpeg) and replace ImageDecode._decode"
            )
        payloads = batch["payload"].to_pylist()
        pixels = np.stack(
            [_fake_pixels(p or b"", self.h, self.w) for p in payloads]
        )
        flat = pixels.reshape(len(payloads), -1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), pa.uint8()), flat.shape[1]
                ),
                "height": pa.array([self.h] * len(payloads), pa.int32()),
                "width": pa.array([self.w] * len(payloads), pa.int32()),
            }
        )


class ImageFeatures:
    """Actor-pool stage: pixel tensors → feature vector (channel means /
    stds + 8-bin luminance histogram) — the shape of a real embedding
    stage (model load would live in __init__)."""

    def __init__(self):
        self.bins = np.linspace(0, 256, 9)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        flat = np.asarray(batch["pixels"].combine_chunks().flatten()).reshape(n, h, w, 3)
        feats = []
        for img in flat:
            lum = img.mean(axis=2)
            hist, _ = np.histogram(lum, bins=self.bins)
            f = np.concatenate(
                [img.mean(axis=(0, 1)), img.std(axis=(0, 1)), hist / lum.size]
            )
            feats.append(f.astype(np.float32))
        mat = np.stack(feats)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float32()), mat.shape[1]
                ),
            }
        )


class FrameSample:
    """Actor-pool stage: video payload → every-k-th frame payload rows
    (1 input row → n output rows). Frame extraction is stubbed as byte
    slices; the row-explosion plumbing is the real part."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video codec not available; replace FrameSample frame cut "
                "with a real demuxer (pyav/ffmpeg)"
            )
        ids, frame_idx, payloads = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n_frames = max(1, (dur or 0) // self.every_ms)
            payload = payload or b""
            step = max(1, len(payload) // n_frames)
            for i in range(n_frames):
                ids.append(mid)
                frame_idx.append(i)
                payloads.append(payload[i * step : (i + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def synth_media_table(n: int = 64, seed: int = 9) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                [{"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[k] for k in kinds],
                pa.string(),
            ),
            "width": pa.array(rng.integers(64, 1920, n), pa.int32()),
            "height": pa.array(rng.integers(64, 1080, n), pa.int32()),
            "duration_ms": pa.array(rng.integers(0, 60_000, n), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
