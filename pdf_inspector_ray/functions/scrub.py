"""Text scrubbing: regex redaction (PII-style) and normalization.

Training-data pipelines scrub PII and normalize text before anything
else touches it. Both operators here are stateless, fully vectorized
``map_batches`` stages built on Arrow's RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex``) — the same
regex engine DuckDB's ``regexp_replace`` / ``regexp_extract_all`` use,
so a SQL twin is bit-identical by construction (same dialect, same
leftmost-earliest non-overlapping match semantics).

Redaction rules apply SEQUENTIALLY: each rule sees the text as left by
the previous one, and its match count is measured on that same state
(mirror in SQL with nested ``regexp_replace`` and
``len(regexp_extract_all(<state>, pat))``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# PII-ish default rules, RE2-safe (no lookaround). Order matters: URLs
# first (an email inside a URL is the URL's problem), then emails, then
# long digit runs (phone-ish).
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d() .-]{6,}\d", "<PHONE>"),
)


def regex_redact(ds, rules=PII_RULES, text_column: str = "text",
                 id_column: str = "doc_id"):
    """(doc_id, text → redacted ``clean_text``, per-rule + total match
    counts). Counts are int64; column names ``n_rule{i}`` in rule order
    plus ``n_redactions``."""

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch[text_column]
        counts = []
        for pat, repl in rules:
            counts.append(pc.cast(pc.count_substring_regex(txt, pat),
                                  pa.int64()))
            txt = pc.replace_substring_regex(txt, pat, repl)
        total = counts[0]
        for c in counts[1:]:
            total = pc.add(total, c)
        cols = {id_column: pc.cast(batch[id_column], pa.int64()),
                "clean_text": txt}
        for i, c in enumerate(counts):
            cols[f"n_rule{i}"] = c
        cols["n_redactions"] = total
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def normalize_text(ds, text_column: str = "text",
                   id_column: str = "doc_id"):
    """Canonical text form: lowercase, collapse all whitespace runs to a
    single space, trim the ends. Emits (doc_id, norm_text, n_chars_norm).
    SQL twin: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""

    def norm(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(batch[text_column])
        txt = pc.replace_substring_regex(txt, r"\s+", " ")
        txt = pc.utf8_trim_whitespace(txt)
        return pa.table({
            id_column: pc.cast(batch[id_column], pa.int64()),
            "norm_text": txt,
            "n_chars_norm": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")
