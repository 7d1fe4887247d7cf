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
