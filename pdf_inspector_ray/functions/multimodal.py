"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode step is STUBBED — image/audio libraries are not in this
container. ``decode_stub=True`` (default) runs a deterministic fake decoder
(byte histogram + pseudo-dimensions) so the Ray-side plumbing — schema,
batch size, actor signature, output layout — is real and tested;
``decode_stub=False`` raises NotImplementedError exactly where a real
decoder (PIL / ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),    # "image" | "audio" | "video"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("meta_width", pa.int32()),     # typed metadata columns
    ("meta_height", pa.int32()),
    ("meta_duration_ms", pa.int32()),
])


MEDIA_GENERATOR_VERSION = 2  # bump when synthesize_media_table output changes


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests.

    Payload bytes are drawn from the printable-ASCII range so the column
    stays opaque ``binary`` for the engine while DuckDB's VARCHAR-only
    ``sha256`` can still hash the identical bytes — that makes the driver
    oracle an INDEPENDENT recomputation, not a frozen golden."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "media_type", "payload",
                            "meta_width", "meta_height", "meta_duration_ms")}
    for i in range(n):
        t = types[i % 3]
        size = int(rng.integers(64, 2048))
        payload = rng.integers(0x20, 0x7f, size=size, dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["meta_width"].append(int(rng.integers(16, 4096)) if t != "audio" else 0)
        rows["meta_height"].append(int(rng.integers(16, 4096)) if t != "audio" else 0)
        rows["meta_duration_ms"].append(int(rng.integers(100, 600000)) if t != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool UDF (``map_batches(Cls, concurrency=N, batch_size=B)``):
    decode → feature-extract. Stateful setup (a real model load) belongs in
    ``__init__``; here it's the feature dimensionality + stub flag.

    Large binary payloads ⇒ keep ``batch_size`` small (16-64) so
    batch × concurrency fits the worker heap (SURVEY.md §4.2).
    """

    FEATURE_DIM = 32

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # real decoder gated behind an import-try: when PIL is installed the
        # image path decodes for real; otherwise the stub stays in charge
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.decode_stub:
            if self._pil is not None and media_type == "image":
                import io
                img = self._pil.open(io.BytesIO(payload)).convert("L")
                arr = np.asarray(img, dtype=np.uint8).ravel()
                hist, _ = np.histogram(arr, bins=self.FEATURE_DIM,
                                       range=(0, 256))
                return hist.astype(np.float64) / (hist.sum() or 1)
            raise NotImplementedError(
                "real media decoding requires PIL (images) / ffmpeg "
                "(audio+video) — not in this container; run with "
                "decode_stub=True")
        # Deterministic fake decode: byte histogram, normalized
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=self.FEATURE_DIM, range=(0, 256))
        total = hist.sum() or 1
        return hist.astype(np.float64) / total

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = []
        digests = []
        for p, t in zip(payloads, types):
            if p is None:
                feats.append(None)
                digests.append(None)
                continue
            feats.append(self._decode(p, t).tolist())
            digests.append(hashlib.sha256(p).hexdigest())
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "payload_sha256": pa.array(digests, pa.string()),
            "features": pa.array(feats, pa.list_(pa.float64())),
            "n_bytes": pa.array([len(p) if p else 0 for p in payloads], pa.int64()),
        })


def resize_stub(batch: pa.Table, target: tuple[int, int] = (224, 224)) -> pa.Table:
    """Resize plumbing: passes payload through, rewrites typed metadata.
    A real implementation decodes + resamples; the Ray-side contract
    (schema in / schema out, zero-copy passthrough of untouched columns)
    is what this pins."""
    n = len(batch)
    return (batch
            .set_column(batch.schema.get_field_index("meta_width"),
                        "meta_width", pa.array([target[0]] * n, pa.int32()))
            .set_column(batch.schema.get_field_index("meta_height"),
                        "meta_height", pa.array([target[1]] * n, pa.int32())))


def frame_sample_stub(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plumbing: one output row per sampled frame
    (flat_map-style expansion inside map_batches)."""
    out = {"media_id": [], "frame_idx": [], "frame_ts_ms": []}
    for mid, mtype, dur in zip(batch["media_id"].to_pylist(),
                               batch["media_type"].to_pylist(),
                               batch["meta_duration_ms"].to_pylist()):
        if mtype != "video" or not dur:
            continue
        for fi, ts in enumerate(range(0, dur, every_ms)):
            out["media_id"].append(mid)
            out["frame_idx"].append(fi)
            out["frame_ts_ms"].append(ts)
    return pa.table({
        "media_id": pa.array(out["media_id"], pa.int64()),
        "frame_idx": pa.array(out["frame_idx"], pa.int32()),
        "frame_ts_ms": pa.array(out["frame_ts_ms"], pa.int32()),
    })


# -- REAL decode path: self-contained public formats -------------------------
#
# The container has no PIL/ffmpeg, but two ubiquitous formats need neither:
# 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + padded
# bottom-up BGR rows) and RIFF/WAVE 16-bit PCM (stdlib ``wave``). Both are
# decoded FOR REAL below — header parse, padding, row order, channel order —
# so the decode seam stops being a stub for images and audio; only video
# containers remain gated.

REAL_MEDIA_GENERATOR_VERSION = 2  # v2: golden_thumb integer thumbnails


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    import struct
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    image_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                       2835, 2835, 0, 0)
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    import struct
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, planes, bpp, comp, _, _, _, _, _) = struct.unpack_from(
        "<IiiHHIIiiII", payload, 14)
    if hdr_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    stride = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (int16 mono samples, rate)."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError("only 16-bit mono PCM supported")
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()),
                                dtype="<i2")
    return samples, rate


def _image_stats(arr: np.ndarray) -> dict:
    """The decoder's image feature formula — shared verbatim with corpus
    synthesis so golden columns are IEEE-identical by construction."""
    h, w, _ = arr.shape
    f = arr.astype(np.float64)
    # 8×8 nearest-neighbor thumbnail of the grayscale plane
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    gray = f.mean(axis=2)
    thumb = gray[np.ix_(ys, xs)]
    return {
        "width": w, "height": h,
        "mean_r": f[:, :, 0].mean(), "mean_g": f[:, :, 1].mean(),
        "mean_b": f[:, :, 2].mean(), "thumb_mean": thumb.mean(),
    }


def _image_thumb_sums(arr: np.ndarray) -> np.ndarray:
    """8×8 nearest-neighbor thumbnail of the CHANNEL-SUM plane
    (r+g+b per sampled pixel, 0..765) — integer end to end, so the
    thumbnail export is exact across engines (no IEEE division
    anywhere). Shared verbatim with corpus synthesis."""
    h, w, _ = arr.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    return arr.astype(np.int32).sum(axis=2)[np.ix_(ys, xs)]


def _audio_stats(samples: np.ndarray, rate: int) -> dict:
    f = samples.astype(np.float64)
    return {
        "rate": rate, "n_samples": len(samples),
        "duration_ms": len(samples) * 1000 // rate,
        "rms": float(np.sqrt((f * f).mean())) if len(f) else 0.0,
        "peak": int(np.abs(samples).max()) if len(samples) else 0,
    }


_REAL_STAT_COLS = (("width", pa.int32()), ("height", pa.int32()),
                   ("mean_r", pa.float64()), ("mean_g", pa.float64()),
                   ("mean_b", pa.float64()), ("thumb_mean", pa.float64()),
                   ("rate", pa.int32()), ("n_samples", pa.int64()),
                   ("duration_ms", pa.int64()), ("rms", pa.float64()),
                   ("peak", pa.int32()))


def synthesize_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic BMP/WAV corpus with ``golden_*`` stat columns frozen
    from the RAW arrays before encoding — the pipeline decodes the bytes
    and must reproduce them exactly (both formats are lossless)."""
    rng = np.random.default_rng(seed)
    rows: dict[str, list] = {"media_id": [], "media_type": [],
                             "payload": [], "golden_thumb": []}
    for name, _ in _REAL_STAT_COLS:
        rows[f"golden_{name}"] = []
    for i in range(n):
        stats: dict = {name: None for name, _ in _REAL_STAT_COLS}
        thumb = None
        if i % 2 == 0:
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_bmp(arr)
            stats.update(_image_stats(arr))
            thumb = _image_thumb_sums(arr).ravel().tolist()  # row-major
            mtype = "image"
        else:
            rate = int(rng.choice([8000, 16000, 44100]))
            n_s = int(rng.integers(200, 4000))
            samples = rng.integers(-(1 << 15), 1 << 15, size=n_s,
                                   dtype=np.int16)
            payload = encode_wav(samples, rate)
            stats.update(_audio_stats(samples, rate))
            mtype = "audio"
        rows["media_id"].append(i)
        rows["media_type"].append(mtype)
        rows["payload"].append(payload)
        rows["golden_thumb"].append(thumb)
        for name, _ in _REAL_STAT_COLS:
            rows[f"golden_{name}"].append(stats[name])
    cols = {"media_id": pa.array(rows["media_id"], pa.int64()),
            "media_type": pa.array(rows["media_type"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary())}
    for name, typ in _REAL_STAT_COLS:
        cols[f"golden_{name}"] = pa.array(rows[f"golden_{name}"], typ)
    cols["golden_thumb"] = pa.array(rows["golden_thumb"],
                                    pa.list_(pa.int32()))
    return pa.table(cols)


class MediaThumbs:
    """Actor-pool thumbnail export: BMP payload → 64 long-form rows
    (media_id, py, px, gray_sum) from the 8×8 nearest-neighbor
    channel-sum thumbnail — integer-exact (no IEEE division), so the
    oracle can compare every pixel. Non-image and corrupt payloads emit
    no rows (the stats/error surface is ``RealMediaDecoder``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        sums: list[np.ndarray] = []
        for mid, mtype, payload in zip(batch["media_id"].to_pylist(),
                                       batch["media_type"].to_pylist(),
                                       batch["payload"].to_pylist()):
            if mtype != "image" or payload is None:
                continue
            try:
                thumb = _image_thumb_sums(decode_bmp(payload))
            except Exception:  # noqa: BLE001 — skip undecodable
                continue
            ids.append(mid)
            sums.append(thumb.ravel())
        n = len(ids)
        grid = np.arange(64)
        return pa.table({
            "media_id": pa.array(np.repeat(np.asarray(ids, np.int64), 64)
                                 if n else [], pa.int64()),
            "py": pa.array(np.tile(grid // 8, n), pa.int64()),
            "px": pa.array(np.tile(grid % 8, n), pa.int64()),
            "gray_sum": pa.array(
                np.concatenate(sums) if n else [], pa.int64()),
        })


class RealMediaDecoder:
    """Actor-pool decode stage for the self-contained formats: BMP →
    image stats, WAV → audio stats. Per-payload decode is irreducibly
    per-row (like the PDF parse); all inner math is numpy. Unknown or
    corrupt payloads surface in ``error`` instead of raising — one bad
    byte string must never kill a 100-TB job."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name, _ in _REAL_STAT_COLS}
        errors: list = []
        for mtype, payload in zip(batch["media_type"].to_pylist(),
                                  batch["payload"].to_pylist()):
            stats: dict = {name: None for name, _ in _REAL_STAT_COLS}
            err = None
            try:
                if payload is None:
                    err = "null payload"
                elif mtype == "image":
                    stats.update(_image_stats(decode_bmp(payload)))
                elif mtype == "audio":
                    stats.update(_audio_stats(*decode_wav(payload)))
                else:
                    err = f"undecodable media_type {mtype!r}"
            except Exception as e:  # noqa: BLE001 — error column contract
                err = f"{type(e).__name__}: {e}"
            errors.append(err)
            for name in out:
                out[name].append(stats[name])
        cols = {"media_id": batch["media_id"],
                "media_type": batch["media_type"]}
        for name, typ in _REAL_STAT_COLS:
            cols[name] = pa.array(out[name], typ)
        cols["error"] = pa.array(errors, pa.string())
        return pa.table(cols)
