"""Synthetic multi-turn transcript corpus (FIXTURES.md §1).

Schema matches BASELINE.json ``input_hint`` exactly:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]`` plus a ``pdf_sha256:string`` companion column recording
payload identity. ``text`` carries PDF bytes latin-1-decoded to string.

Deterministic: seed-fixed numpy RNG, no wall clock. Conversation sizes are
Zipf-distributed (a=1.5, clamped to [1, 2000]) so a few mega-conversations
exercise the skew-salting path; rows are written in a seeded shuffle so the
stable-ordering restore is actually tested; ~5% of rows carry a truncated
payload to exercise the error column.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .pdfgen import fixture_pool

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
GENERATOR_VERSION = 2  # bump when build_transcript_table output changes

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("pdf_sha256", pa.string()),
])

_ROLES = ("user", "assistant", "tool")


def build_transcript_table(n_turns: int, seed: int = 42,
                           corrupt_frac: float = 0.05) -> pa.Table:
    """Build the corpus as one Arrow table (use for tests / small scales)."""
    rng = np.random.default_rng(seed)
    pool = fixture_pool()
    pool_names = sorted(pool)
    payloads = [pool[n] for n in pool_names]
    payload_strs = [p.decode("latin-1") for p in payloads]
    corrupt_strs = [s[: max(10, len(s) // 3)] + "\x00TRUNCATED"
                    for s in payload_strs]
    payload_hashes = [hashlib.sha256(p).hexdigest() for p in payloads]
    corrupt_hashes = ["corrupt:" + h for h in payload_hashes]

    # Zipf conversation sizes until we cover n_turns (vectorized draws)
    conv_sizes: list[int] = []
    total = 0
    while total < n_turns:
        draws = np.minimum(np.maximum(rng.zipf(1.5, size=4096), 1), 2000)
        for size in draws:
            size = int(min(size, n_turns - total))
            conv_sizes.append(size)
            total += size
            if total >= n_turns:
                break

    sizes = np.asarray(conv_sizes, dtype=np.int64)
    conv_idx = np.repeat(np.arange(len(sizes)), sizes)
    ends = np.cumsum(sizes)
    turn_idxs = np.arange(len(conv_idx)) - np.repeat(ends - sizes, sizes)
    n = len(conv_idx)

    payload_idx = rng.integers(0, len(payloads), size=n)
    corrupt = rng.random(n) < corrupt_frac
    # dictionary-style assembly: index into the small payload pools
    text_choice = payload_idx + corrupt.astype(np.int64) * len(payloads)
    text_pool = np.array(payload_strs + corrupt_strs, dtype=object)
    hash_pool = np.array(payload_hashes + corrupt_hashes, dtype=object)

    perm = rng.permutation(n)  # seeded shuffle: ordering must be restored
    conv_names = np.array([f"conv-{i:06d}" for i in range(len(sizes))],
                          dtype=object)
    roles_pool = np.array(_ROLES, dtype=object)
    roles = roles_pool[np.arange(n) % 3]
    tools = np.where(roles == "tool", "pdf_reader", "")
    ts = EPOCH_US + 60_000_000 * np.arange(n, dtype=np.int64)

    table = pa.table({
        "conv_id": pa.array(conv_names[conv_idx[perm]], pa.string()),
        "turn_idx": pa.array(turn_idxs[perm].astype(np.int32), pa.int32()),
        "role": pa.array(roles[perm], pa.string()),
        "text": pa.array(text_pool[text_choice[perm]], pa.string()),
        "tool": pa.array(tools[perm].astype(object), pa.string()),
        "ts": pa.array(ts[perm], pa.timestamp("us")),
        "pdf_sha256": pa.array(hash_pool[text_choice[perm]], pa.string()),
    }, schema=SCHEMA)
    return table


def write_transcript_corpus(out_dir: str, n_turns: int, seed: int = 42,
                            corrupt_frac: float = 0.05,
                            rows_per_file: int = 12_500) -> list[str]:
    """Write the corpus as one-or-more parquet files (row-group sized for
    streaming reads). Returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    table = build_transcript_table(n_turns, seed=seed, corrupt_frac=corrupt_frac)
    paths = []
    for start in range(0, table.num_rows, rows_per_file):
        chunk = table.slice(start, rows_per_file)
        path = os.path.join(out_dir, f"transcripts-{start // rows_per_file:05d}.parquet")
        pq.write_table(chunk, path, row_group_size=8192)
        paths.append(path)
    return paths


def golden_expectations(table: pa.Table) -> dict[str, tuple]:
    """Per-payload golden results: sha256 -> (pdf_type, markdown, error_kind).

    Runs the per-document library once per distinct payload — this is the
    oracle the pipeline output is compared against (per-turn text equality
    under stable turn ordering)."""
    from ..pdfi.objects import PdfError
    from ..pdfi.process import process_pdf_mem

    out: dict[str, tuple] = {}
    seen: dict[str, str] = {}
    for text, h in zip(table["text"].to_pylist(), table["pdf_sha256"].to_pylist()):
        if h in out:
            continue
        data = text.encode("latin-1")
        try:
            r = process_pdf_mem(data)
            out[h] = (r.pdf_type, r.markdown, None)
        except PdfError as e:
            out[h] = (None, None, e.kind)
        seen[h] = text
    return out
