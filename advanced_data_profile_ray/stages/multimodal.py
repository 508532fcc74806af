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


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """REAL image decode for binary PPM (P6) — pure numpy, no codec lib.
    Returns (h, w, 3) uint8, or None when the payload isn't P6."""
    if not payload or not payload.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment running to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    data = payload[pos + 1: pos + 1 + w * h * 3]  # single whitespace after maxval
    if len(data) < w * h * 3:
        return None
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM payload (test/synthesis helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """REAL image decode for uncompressed 24/32-bit BI_RGB BMP — pure
    numpy struct parsing, no codec lib. Handles 4-byte row padding,
    bottom-up (positive height) and top-down (negative height) layouts,
    and BGR(A)→RGB channel order. Returns (h, w, 3) uint8 or None when
    the payload isn't a supported BMP."""
    if len(payload) < 54 or not payload.startswith(b"BM"):
        return None
    off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:  # BITMAPINFOHEADER or larger
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = ((w * bytes_pp + 3) // 4) * 4
    if off < 0 or len(payload) < off + stride * h:
        return None
    data = np.frombuffer(payload, np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = data[:, : w * bytes_pp].reshape(h, w, bytes_pp)[:, :, :3][:, :, ::-1]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → uncompressed 24-bit bottom-up BMP payload
    (test/synthesis helper; rows padded to 4 bytes, RGB→BGR)."""
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    file_hdr = (b"BM" + (54 + len(body)).to_bytes(4, "little")
                + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") * 2
           + (0).to_bytes(4, "little") * 2)
    return file_hdr + dib + body


def nearest_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """REAL nearest-neighbor resize — one fancy-index, no loops."""
    sh, sw = img.shape[:2]
    rows = np.minimum((np.arange(h) * sh) // h, sh - 1)
    cols = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return img[rows[:, None], cols[None, :]]


class ImageDecode:
    """Actor-pool stage: binary payload → decoded + resized pixel tensor.

    The codec boundary is REAL for binary PPM (decode_ppm) and
    uncompressed 24/32-bit BMP (decode_bmp) — both pure numpy — with
    nearest-neighbor resize to ``target_size``. Other formats
    (JPEG/PNG) need a codec lib absent from this container:
    ``strict=True`` raises NotImplementedError on the first such payload
    (production replaces the fallback with PIL/torchvision);
    ``strict=False`` substitutes the deterministic fake so downstream
    stages stay testable."""

    def __init__(self, strict: bool = False, target_size: tuple = (32, 32)):
        self.strict = strict
        self.h, self.w = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = []
        for p in payloads:
            img = decode_ppm(p or b"")
            if img is None:
                img = decode_bmp(p or b"")
            if img is not None:
                out.append(nearest_resize(img, self.h, self.w))
            elif self.strict:
                raise NotImplementedError(
                    "non-PPM image codec not available in this environment; "
                    "install a decoder (PIL/libjpeg) and extend ImageDecode"
                )
            else:
                out.append(_fake_pixels(p or b"", self.w, self.h))
        flat = np.stack(out).reshape(len(payloads), -1)
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


class AudioDecode:
    """Actor-pool stage: WAV payload → sample stats. REAL decode via the
    stdlib ``wave`` module + numpy (PCM 16-bit mono/stereo): no external
    codec needed. Non-WAV payloads raise in strict mode or emit nulls.

    Emits (media_id, sample_rate, n_samples, duration_ms, rms, zcr) —
    the feature shape a real embedding stage would extend in __init__."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        rates, counts, durs, rms, zcr = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            try:
                with wave.open(io.BytesIO(p or b"")) as wf:
                    rate = wf.getframerate()
                    n = wf.getnframes()
                    raw = wf.readframes(n)
                    width = wf.getsampwidth()
                    ch = wf.getnchannels()
                if width == 1:
                    # WAV stores 8-bit PCM UNSIGNED (midpoint 128)
                    x = np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0
                else:
                    dt = {2: np.int16, 4: np.int32}[width]
                    x = np.frombuffer(raw, dt).astype(np.float64)
                if ch > 1:
                    x = x.reshape(-1, ch).mean(axis=1)
                rates.append(rate)
                counts.append(x.size)
                durs.append(int(1000 * x.size / rate) if rate else 0)
                rms.append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
                zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                           if x.size > 1 else 0.0)
            except Exception:
                if self.strict:
                    raise NotImplementedError(
                        "non-WAV audio codec not available; install a decoder "
                        "(soundfile/ffmpeg) and extend AudioDecode")
                rates.append(None)
                counts.append(None)
                durs.append(None)
                rms.append(None)
                zcr.append(None)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "duration_ms": pa.array(durs, pa.int32()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
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


class UnsupportedY4MChroma(NotImplementedError):
    """A real YUV4MPEG2 stream with chroma subsampling this pure-byte
    demuxer doesn't parse (C422/C411/10-bit)."""


def decode_y4m(payload: bytes):
    """REAL video demux for YUV4MPEG2 (.y4m) — the standard uncompressed
    video interchange format; pure byte parsing, no codec lib. Returns
    ``(width, height, fps, [frame_bytes, ...])`` with one entry per
    FRAME section (mono = W·H luma bytes, C420 = W·H·1.5, C444 = W·H·3),
    or None when the payload isn't Y4M. A REAL Y4M stream whose chroma
    subsampling we don't parse (C422/C411/10-bit) raises
    UnsupportedY4MChroma rather than returning None, so callers can tell
    "not Y4M at all" from "Y4M we can't demux" (ADVICE r03). Only the
    stream-header parameters W/H/F/C are interpreted; unknown parameters
    pass through."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    fps_num, fps_den = 25, 1
    fmt = b"420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == b"C":
                fmt = val
        except ValueError:
            return None
    if w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        return None
    if fmt.startswith(b"mono"):
        fsize = w * h
    elif fmt.startswith(b"420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    elif fmt.startswith(b"444"):
        fsize = w * h * 3
    else:
        raise UnsupportedY4MChroma(
            f"unsupported Y4M chroma C{fmt.decode('ascii', 'replace')}"
        )
    frames, pos = [], nl + 1
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            break
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            break
        start = fnl + 1
        if start + fsize > len(payload):
            break
        frames.append(payload[start:start + fsize])
        pos = start + fsize
    return w, h, fps_num / fps_den, frames


def encode_y4m_mono(frames, fps: int = 10) -> bytes:
    """[(h, w) uint8 luma frame, ...] → Y4M mono payload (test/synthesis
    helper — the encoder side of decode_y4m)."""
    h, w = frames[0].shape
    head = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)
    return head + b"".join(
        b"FRAME\n" + f.astype(np.uint8).tobytes() for f in frames)


class FrameSample:
    """Actor-pool stage: video payload → every-k-th frame rows (1 input
    row → n output rows). Y4M payloads get a REAL demux (decode_y4m):
    frames are selected at ``every_ms`` intervals from the stream's own
    fps and re-encoded as PPM images (luma replicated to RGB for mono /
    420's Y plane), so the output rows feed ImageDecode/ImageFeatures
    directly. Compressed containers (mp4/webm) stay behind the strict
    boundary — slicing bytes can't substitute for a real demuxer — and
    in non-strict mode fall back to deterministic byte-slice stubs so
    the row-explosion plumbing stays exercised."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, payloads = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            payload = payload or b""
            try:
                demux = decode_y4m(payload)
            except UnsupportedY4MChroma:
                # real Y4M we can't demux: strict mode surfaces the
                # precise reason; non-strict skips (no frames) instead of
                # byte-slicing a real stream into bogus frames
                if self.strict:
                    raise
                continue
            if demux is not None:
                w, h, fps, frames = demux
                step = max(1, int(round(fps * self.every_ms / 1000.0)))
                for out_i, fi in enumerate(range(0, len(frames), step)):
                    luma = np.frombuffer(frames[fi][: w * h],
                                         np.uint8).reshape(h, w)
                    rgb = np.repeat(luma[:, :, None], 3, axis=2)
                    ids.append(mid)
                    frame_idx.append(out_i)
                    payloads.append(encode_ppm(rgb))
                continue
            if self.strict:
                raise NotImplementedError(
                    "compressed video codec not available; Y4M demuxes "
                    "for real — replace the fallback with pyav/ffmpeg "
                    "for mp4/webm"
                )
            n_frames = max(1, (dur or 0) // self.every_ms)
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
