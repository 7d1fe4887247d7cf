"""HTML main-content extraction stage (SB) + the payload router.

``html_extract_batch`` is a stateless ``map_batches`` UDF over an ``html``
string column. ``sniff_payload_kind`` routes mixed corpora (PDF bytes vs
HTML markup vs unknown) so one pipeline can fan both payload kinds through
the right extractor — the general "main-content extraction" shape of the
north rule.
"""

from __future__ import annotations

import pyarrow as pa

from ..pdfi.html import extract_main_content

HTML_FIELDS = [
    ("title", pa.string()),
    ("main_text", pa.large_string()),
    ("markdown", pa.large_string()),
    ("n_blocks", pa.int32()),
    ("n_content_blocks", pa.int32()),
    ("boilerplate_ratio", pa.float64()),
    ("error_kind", pa.string()),
]


def sniff_payload_kind(payload: str | bytes) -> str:
    """'pdf' | 'html' | 'unknown' from the payload head."""
    head = payload[:1024]
    if isinstance(head, str):
        head_b = head.encode("latin-1", "replace")
    else:
        head_b = bytes(head)
    if b"%PDF" in head_b:
        return "pdf"
    stripped = head_b.lstrip()
    if (stripped[:1] == b"<"
            or b"<html" in head_b.lower()
            or b"<!doctype" in head_b.lower()):
        return "html"
    return "unknown"


def html_extract_batch(batch: pa.Table, html_column: str = "html") -> pa.Table:
    col = batch[html_column]
    n = len(col)
    cols: list[list] = [[None] * n for _ in HTML_FIELDS]
    for i in range(n):
        val = col[i].as_py()
        if val is None:
            cols[6][i] = "Io"
            continue
        try:
            r = extract_main_content(val)
        except Exception as e:  # poison-pill guard
            cols[6][i] = "Parse"
            continue
        cols[0][i] = r.title
        cols[1][i] = r.text
        cols[2][i] = r.markdown
        cols[3][i] = r.n_blocks
        cols[4][i] = r.n_content_blocks
        cols[5][i] = r.boilerplate_ratio
    out = batch
    for (name, typ), vals in zip(HTML_FIELDS, cols):
        out = out.append_column(pa.field(name, typ), pa.array(vals, typ))
    return out


def route_payload_batch(batch: pa.Table, payload_column: str = "text") -> pa.Table:
    """Append a ``payload_kind`` column (pdf/html/unknown)."""
    col = batch[payload_column]
    kinds = [sniff_payload_kind(col[i].as_py() or "") for i in range(len(col))]
    return batch.append_column(
        pa.field("payload_kind", pa.string()), pa.array(kinds, pa.string()))
