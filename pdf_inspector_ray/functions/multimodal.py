"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode is REAL for every self-contained public format: 24-bit BMP and
PNG (zlib + full filter set) images, RIFF PCM WAV audio, and RIFF/AVI
video with uncompressed DIB frames — all pure numpy/stdlib, no PIL or
ffmpeg. ``MediaFeatureExtractor(decode_stub=True)`` (default) keeps the
deterministic byte-histogram fake for the OPAQUE synthetic corpus whose
payloads are random bytes, not encodings; with ``decode_stub=False`` it
decodes the real formats above and raises ValueError on anything else.
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
            # REAL decode (r5): self-contained codecs in this module.
            # PIL, when present, takes priority for images so exotic
            # formats work too; otherwise BMP/PNG are decoded natively.
            if media_type == "image":
                if self._pil is not None:
                    import io
                    img = self._pil.open(io.BytesIO(payload)).convert("L")
                    gray = np.asarray(img, dtype=np.float64)
                else:
                    gray = decode_image(payload).mean(axis=2)
                arr = gray.ravel()
            elif media_type == "audio":
                samples, _ = decode_wav(payload)
                arr = (samples.astype(np.int32) // 256 + 128).astype(
                    np.float64)
            elif media_type == "video":
                frames, _ = decode_avi(payload)
                arr = frames[0].astype(np.float64).mean(axis=2).ravel()
            else:
                raise ValueError(f"undecodable media_type {media_type!r}")
            hist, _ = np.histogram(arr, bins=self.FEATURE_DIM,
                                   range=(0, 256))
            return hist.astype(np.float64) / (hist.sum() or 1)
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




# -- REAL decode path: self-contained public formats -------------------------
#
# The container has no PIL/ffmpeg, but two ubiquitous formats need neither:
# 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + padded
# bottom-up BGR rows) and RIFF/WAVE 16-bit PCM (stdlib ``wave``). Both are
# decoded FOR REAL below — header parse, padding, row order, channel order —
# so the decode seam stops being a stub for images and audio; only video
# containers remain gated.

REAL_MEDIA_GENERATOR_VERSION = 3  # v3: PNG images, real AVI-DIB video rows


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
    if len(payload) < 54:
        raise ValueError("BMP payload shorter than its headers")
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, planes, bpp, comp, _, _, _, _, _) = struct.unpack_from(
        "<IiiHHIIiiII", payload, 14)
    if hdr_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    if w <= 0 or h == 0 or w * abs(h) > 64_000_000:
        raise ValueError(f"implausible BMP geometry {w}x{h}")
    stride = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (public spec: IHDR/IDAT/IEND,
    zlib-deflated scanlines). Rows cycle through filter types 0-4 so a
    decoder must implement the full filter set to round-trip."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        ft = y % 5
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            enc = (row - left) & 0xFF
        elif ft == 2:  # Up
            enc = (row - prev) & 0xFF
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            enc = (row - (left + prev) // 2) & 0xFF
        else:  # Paeth
            left = np.concatenate([np.zeros(3, np.int32), row[:-3]])
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = left + prev - ul
            pa_, pb_, pcc = (np.abs(p - left), np.abs(p - prev),
                             np.abs(p - ul))
            pred = np.where((pa_ <= pb_) & (pa_ <= pcc), left,
                            np.where(pb_ <= pcc, prev, ul))
            enc = (row - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB. Pure numpy + stdlib zlib: chunk
    walk, zlib inflate, full filter-set (None/Sub/Up/Average/Paeth)
    reconstruction. Supports 8-bit non-interlaced grayscale (0), RGB (2)
    and RGBA (6); grayscale broadcast to 3 channels, alpha dropped."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            if length < 13:
                raise ValueError("short IHDR")
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data[:13])
            if depth != 8 or ctype not in (0, 2, 6) or comp or filt or ilace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype})")
            if w == 0 or h == 0 or w * h > 64_000_000:
                raise ValueError(f"implausible PNG geometry {w}x{h}")
            ch = {0: 1, 2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    expected = h * (w * ch + 1)
    try:
        # bounded inflate: a crafted tiny IDAT must not balloon past the
        # geometry the IHDR promises (deflate-bomb containment)
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ft == 0:
            row = line
        elif ft == 2:
            row = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            row = np.zeros(stride, dtype=np.int32)
            # left-dependent filters are sequential per pixel; loop over
            # the width in channel-sized strides (h, w ≤ thumbnails here)
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa_, pb_, pcc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (left if pa_ <= pb_ and pa_ <= pcc
                            else up if pb_ <= pcc else ul)
                row[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = row
        prev = row
    pix = out.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(pix, 3, axis=2)
    return pix[:, :, :3].copy()


_AVI_US = 1_000_000


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """(f, h, w, 3) uint8 RGB frames → RIFF/AVI bytes with uncompressed
    DIB ('00db') video frames — the public AVI container spec, no codec
    library needed (frames are BMP-style bottom-up padded BGR rows)."""
    import struct
    f, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def dib(arr: np.ndarray) -> bytes:
        bgr = arr[::-1, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    avih = struct.pack("<IIIIIIIIIIIIII", _AVI_US // fps, frame_bytes * fps,
                       0, 0x10, f, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0,
                       0, 1, fps, 0, f, frame_bytes, 0xFFFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    strl = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl = (b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
            + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl)
    movi_payload = b"".join(b"00db" + struct.pack("<I", frame_bytes)
                            + dib(frames[i]) for i in range(f))
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_payload)) + b"movi" \
        + movi_payload
    idx = b"idx1" + struct.pack("<I", 16 * f) + b"".join(
        b"00db" + struct.pack("<III", 0x10, 4 + i * (8 + frame_bytes),
                              frame_bytes) for i in range(f))
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/AVI-DIB bytes → ((f, h, w, 3) uint8 RGB frames, fps). Walks
    the RIFF chunk tree: avih for the frame clock, strf
    (BITMAPINFOHEADER) for geometry, LIST movi '00db'/'00dc' chunks for
    the uncompressed bottom-up BGR frame bitmaps."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    us_per_frame = w = h = bpp = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal us_per_frame, w, h, bpp
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            (length,) = struct.unpack_from("<I", buf, pos + 4)
            data_start = pos + 8
            if data_start + length > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(buf, data_start + 4, data_start + length)
            elif tag == b"avih" and length >= 4:
                us_per_frame = struct.unpack_from("<I", buf, data_start)[0]
            elif tag == b"strf" and length >= 40:
                _, w, h, _, bpp = struct.unpack_from("<IiiHH", buf,
                                                     data_start)
            elif tag in (b"00db", b"00dc"):
                if w is None or bpp != 24:
                    raise ValueError("AVI frame before/without 24-bit strf")
                if w <= 0 or h == 0 or w * abs(h) > 64_000_000:
                    raise ValueError(f"implausible AVI geometry {w}x{h}")
                stride = (w * 3 + 3) & ~3
                hh = abs(h)
                if length < stride * hh:
                    raise ValueError("short AVI frame chunk")
                rows = np.frombuffer(buf, dtype=np.uint8, count=stride * hh,
                                     offset=data_start).reshape(hh, stride)
                bgr = rows[:, :w * 3].reshape(hh, w, 3)
                if h > 0:
                    bgr = bgr[::-1]
                frames.append(bgr[:, :, ::-1].copy())
            pos = data_start + length + (length & 1)  # word-aligned

    walk(payload, 12, min(len(payload), 8 + struct.unpack_from(
        "<I", payload, 4)[0]))
    if not frames or not us_per_frame:
        raise ValueError("AVI has no decodable frames")
    return np.stack(frames), round(_AVI_US / us_per_frame)


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
    """RIFF/WAVE PCM bytes → (int16 mono samples, rate). Malformed
    containers surface as ValueError (the decode-seam contract), not as
    stdlib wave.Error/EOFError."""
    import io
    import wave
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
                raise ValueError("only 16-bit mono PCM supported")
            rate = wf.getframerate()
            samples = np.frombuffer(wf.readframes(wf.getnframes()),
                                    dtype="<i2")
    except (wave.Error, EOFError, RuntimeError) as e:
        # stdlib wave/chunk raise wave.Error, EOFError, and (on seeks past
        # a mutated chunk boundary) a bare RuntimeError
        raise ValueError(f"malformed WAV: {e}") from e
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


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched image decode: BMP or PNG → (h, w, 3) uint8 RGB."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    raise ValueError("unknown image payload (not BMP or PNG)")


def _video_stats(frames: np.ndarray, fps: int) -> dict:
    f, h, w, _ = frames.shape
    return {"width": w, "height": h, "n_frames": f, "fps": fps,
            "duration_ms": f * 1000 // fps}


#: canonical frame-sampling cadence shared by the generator's goldens,
#: the VideoFrameSampler stage and the SQL oracle
FRAME_EVERY_MS = 400


def _frame_sample_plan(n_frames: int, fps: int,
                       every_ms: int = FRAME_EVERY_MS):
    """(frame indices, timestamps ms) sampled every ``every_ms`` over the
    clip: ts = 0, every_ms, …  < duration; the frame shown at ts is
    ``floor(ts·fps/1000)`` (clipped) — integer arithmetic only, so the
    plan is engine/SQL-exact."""
    duration_ms = n_frames * 1000 // fps
    ts = np.arange(0, duration_ms, every_ms, dtype=np.int64)
    idx = np.minimum(ts * fps // 1000, n_frames - 1)
    return idx, ts


_REAL_STAT_COLS = (("width", pa.int32()), ("height", pa.int32()),
                   ("mean_r", pa.float64()), ("mean_g", pa.float64()),
                   ("mean_b", pa.float64()), ("thumb_mean", pa.float64()),
                   ("rate", pa.int32()), ("n_samples", pa.int64()),
                   ("duration_ms", pa.int64()), ("rms", pa.float64()),
                   ("peak", pa.int32()), ("n_frames", pa.int32()),
                   ("fps", pa.int32()))


def synthesize_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic real-format corpus with ``golden_*`` stat columns
    frozen from the RAW arrays before encoding — the pipeline decodes
    the bytes and must reproduce them exactly (all formats here are
    lossless). v3: even rows are images alternating BMP/PNG encodings
    (identical raw-array goldens, different real codec under test), odd
    rows are WAV audio, and ``n // 4`` AVI-DIB video rows are appended
    with per-frame mean goldens sampled on the ``FRAME_EVERY_MS`` plan."""
    rng = np.random.default_rng(seed)
    rows: dict[str, list] = {"media_id": [], "media_type": [],
                             "payload": [], "golden_thumb": [],
                             "golden_fr_ts": [], "golden_fr_r": [],
                             "golden_fr_g": [], "golden_fr_b": []}
    for name, _ in _REAL_STAT_COLS:
        rows[f"golden_{name}"] = []

    def emit(i, mtype, payload, stats, thumb=None, fr=None):
        rows["media_id"].append(i)
        rows["media_type"].append(mtype)
        rows["payload"].append(payload)
        rows["golden_thumb"].append(thumb)
        for key in ("ts", "r", "g", "b"):
            rows[f"golden_fr_{key}"].append(
                fr[key].tolist() if fr is not None else None)
        for name, _ in _REAL_STAT_COLS:
            rows[f"golden_{name}"].append(stats.get(name))

    for i in range(n):
        stats: dict = {name: None for name, _ in _REAL_STAT_COLS}
        if i % 2 == 0:
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_bmp(arr) if i % 4 == 0 else encode_png(arr)
            stats.update(_image_stats(arr))
            emit(i, "image", payload, stats,
                 thumb=_image_thumb_sums(arr).ravel().tolist())
        else:
            rate = int(rng.choice([8000, 16000, 44100]))
            n_s = int(rng.integers(200, 4000))
            samples = rng.integers(-(1 << 15), 1 << 15, size=n_s,
                                   dtype=np.int16)
            payload = encode_wav(samples, rate)
            stats.update(_audio_stats(samples, rate))
            emit(i, "audio", payload, stats)
    for j in range(n // 4):
        stats = {name: None for name, _ in _REAL_STAT_COLS}
        fps = int(rng.choice([5, 10, 25]))
        f = int(rng.integers(3, 16))
        h = int(rng.integers(8, 24))
        w = int(rng.integers(8, 24))
        frames = rng.integers(0, 256, size=(f, h, w, 3), dtype=np.uint8)
        stats.update(_video_stats(frames, fps))
        idx, ts = _frame_sample_plan(f, fps)
        means = frames[idx].astype(np.float64).reshape(len(idx), -1, 3)
        fr = {"ts": ts.astype(np.int32),
              "r": means[:, :, 0].mean(axis=1),
              "g": means[:, :, 1].mean(axis=1),
              "b": means[:, :, 2].mean(axis=1)}
        emit(n + j, "video", encode_avi(frames, fps), stats, fr=fr)

    cols = {"media_id": pa.array(rows["media_id"], pa.int64()),
            "media_type": pa.array(rows["media_type"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary())}
    for name, typ in _REAL_STAT_COLS:
        cols[f"golden_{name}"] = pa.array(rows[f"golden_{name}"], typ)
    cols["golden_thumb"] = pa.array(rows["golden_thumb"],
                                    pa.list_(pa.int32()))
    cols["golden_fr_ts"] = pa.array(rows["golden_fr_ts"],
                                    pa.list_(pa.int32()))
    for key in ("r", "g", "b"):
        cols[f"golden_fr_{key}"] = pa.array(rows[f"golden_fr_{key}"],
                                            pa.list_(pa.float64()))
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
                thumb = _image_thumb_sums(decode_image(payload))
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
    """Actor-pool decode stage for the self-contained formats: BMP/PNG →
    image stats, WAV → audio stats, AVI-DIB → video geometry/clock
    stats. Per-payload decode is irreducibly
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
                    stats.update(_image_stats(decode_image(payload)))
                elif mtype == "audio":
                    stats.update(_audio_stats(*decode_wav(payload)))
                elif mtype == "video":
                    stats.update(_video_stats(*decode_avi(payload)))
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


class VideoFrameSampler:
    """Actor-pool REAL video frame sampling (replaces the r4 stub): AVI
    payload → decode_avi → frames at the ``FRAME_EVERY_MS`` plan → one
    row per sampled frame with per-channel means computed from the RAW
    decoded arrays. The container is lossless, so the means are
    bit-identical to the goldens the generator froze from the arrays
    BEFORE encoding — the oracle checks real decoding, not metadata
    arithmetic. Non-video / corrupt payloads emit no rows (the stats and
    error surface is ``RealMediaDecoder``)."""

    def __init__(self, every_ms: int = FRAME_EVERY_MS):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        fidx: list[np.ndarray] = []
        fts: list[np.ndarray] = []
        means: list[np.ndarray] = []
        for mid, mtype, payload in zip(batch["media_id"].to_pylist(),
                                       batch["media_type"].to_pylist(),
                                       batch["payload"].to_pylist()):
            if mtype != "video" or payload is None:
                continue
            try:
                frames, fps = decode_avi(payload)
            except Exception:  # noqa: BLE001 — skip undecodable
                continue
            idx, ts = _frame_sample_plan(len(frames), fps, self.every_ms)
            m = frames[idx].astype(np.float64).reshape(len(idx), -1, 3)
            ids.extend([mid] * len(idx))
            fidx.append(np.arange(len(idx), dtype=np.int32))
            fts.append(ts)
            means.append(m.mean(axis=1))
        mm = (np.concatenate(means) if means
              else np.zeros((0, 3), np.float64))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(
                np.concatenate(fidx) if fidx else [], pa.int32()),
            "frame_ts_ms": pa.array(
                np.concatenate(fts).astype(np.int32) if fts else [],
                pa.int32()),
            "mean_r": pa.array(mm[:, 0], pa.float64()),
            "mean_g": pa.array(mm[:, 1], pa.float64()),
            "mean_b": pa.array(mm[:, 2], pa.float64()),
        })


class ResizeImages:
    """Actor-pool REAL resize (replaces the r4 metadata stub): decode the
    image payload (BMP or PNG), nearest-neighbor resample to ``target``,
    re-encode as BMP, then DECODE THE OWN OUTPUT and emit per-pixel
    channel sums — proving the whole decode→resample→encode loop, not
    just the resample. With the default 8×8 target and the
    ``_image_thumb_sums`` sampling grid, the output equals the frozen
    golden_thumb values exactly (integer math end to end)."""

    def __init__(self, target: tuple[int, int] = (8, 8)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        ids: list[int] = []
        sums: list[np.ndarray] = []
        for mid, mtype, payload in zip(batch["media_id"].to_pylist(),
                                       batch["media_type"].to_pylist(),
                                       batch["payload"].to_pylist()):
            if mtype != "image" or payload is None:
                continue
            try:
                arr = decode_image(payload)
            except Exception:  # noqa: BLE001 — skip undecodable
                continue
            h, w, _ = arr.shape
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            resized = arr[np.ix_(ys, xs)]          # real NN resample
            reencoded = encode_bmp(resized)        # real bytes out
            back = decode_bmp(reencoded)           # prove the round trip
            ids.append(mid)
            sums.append(back.astype(np.int32).sum(axis=2).ravel())
        n = len(ids)
        grid = np.arange(th * tw)
        return pa.table({
            "media_id": pa.array(np.repeat(np.asarray(ids, np.int64),
                                           th * tw) if n else [],
                                 pa.int64()),
            "py": pa.array(np.tile(grid // tw, n), pa.int64()),
            "px": pa.array(np.tile(grid % tw, n), pa.int64()),
            "resized_sum": pa.array(
                np.concatenate(sums) if n else [], pa.int64()),
        })
