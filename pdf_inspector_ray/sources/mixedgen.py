"""Mixed PDF/HTML payload corpus for the routed main-content-extraction
pipeline (the north rule's unified shape: HTML boilerplate strip + PDF
parse behind one router).

Rows carry a ``text`` payload that is either PDF bytes (latin-1-decoded),
a truncated/corrupt PDF, or an HTML page; golden_* columns freeze what the
right per-document extractor produces so the driver can oracle the routed
distributed pipeline.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MIXED_GENERATOR_VERSION = 3  # v3: pool gained f32 (bogus image-codec filter)


def build_mixed_table(n_rows: int, seed: int = 42) -> pa.Table:
    from ..pdfi.html import extract_main_content
    from ..pdfi.objects import PdfError
    from ..pdfi.process import process_pdf_mem
    from .htmlgen import html_fixture_pool
    from .transcripts import _payload_pools

    pdf_strs, corrupt_strs, _, _ = _payload_pools()
    html_pool = [html_fixture_pool()[k] for k in sorted(html_fixture_pool())]

    # one golden per distinct pool payload, computed by the SAME library
    # the routed stage calls
    payloads: list[str] = []
    goldens: list[tuple] = []  # (kind, markdown, error_kind)
    for s in pdf_strs + corrupt_strs:
        payloads.append(s)
        try:
            r = process_pdf_mem(s.encode("latin-1"))
            goldens.append(("pdf", r.markdown, None))
        except PdfError as e:
            goldens.append(("pdf", None, e.kind))
    for h in html_pool:
        payloads.append(h)
        try:
            r = extract_main_content(h)
            goldens.append(("html", r.markdown, None))
        except Exception:
            goldens.append(("html", None, "Parse"))

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(payloads), size=n_rows)
    text_pool = np.array(payloads, dtype=object)
    kind_pool = np.array([g[0] for g in goldens], dtype=object)
    md_pool = np.array([g[1] for g in goldens], dtype=object)
    err_pool = np.array([g[2] for g in goldens], dtype=object)
    return pa.table({
        "doc_id": pa.array(range(n_rows), pa.int64()),
        "text": pa.array(text_pool[idx], pa.string()),
        "golden_kind": pa.array(kind_pool[idx], pa.string()),
        "golden_markdown": pa.array(md_pool[idx], pa.large_string()),
        "golden_error_kind": pa.array(err_pool[idx], pa.string()),
    })


def write_mixed_corpus(out_dir: str, n_rows: int, seed: int = 42,
                       rows_per_file: int = 4000) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    table = build_mixed_table(n_rows, seed=seed)
    paths = []
    for start in range(0, table.num_rows, rows_per_file):
        path = os.path.join(out_dir,
                            f"mixed-{start // rows_per_file:05d}.parquet")
        pq.write_table(table.slice(start, rows_per_file), path,
                       row_group_size=4000)
        paths.append(path)
    return paths
