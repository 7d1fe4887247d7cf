"""Golden-compare join (SURVEY.md §2.7): per-turn equality of a pipeline
output against a golden table, as a broadcast join.

Small-side broadcast: the golden table is ``ray.put`` once and read inside
every ``map_batches`` task — no shuffle of the big side. At corpus scale
(golden too big to broadcast) swap for a hash join on (conv_id, turn_idx);
the comparison kernel is the same.
"""

from __future__ import annotations

import pyarrow as pa


def compare_to_golden(ds, golden: pa.Table,
                      key_columns: tuple[str, ...] = ("conv_id", "turn_idx"),
                      value_columns: tuple[str, ...] = ("pdf_type", "markdown",
                                                        "error_kind")):
    """Returns a dataset of per-row verdicts: keys + ``match:bool`` +
    ``mismatch_column`` (first differing column, null when matched)."""
    import ray

    lookup: dict[tuple, tuple] = {}
    key_arrays = [golden[c].to_pylist() for c in key_columns]
    val_arrays = [golden[c].to_pylist() for c in value_columns]
    for i in range(golden.num_rows):
        lookup[tuple(a[i] for a in key_arrays)] = tuple(a[i] for a in val_arrays)
    lookup_ref = ray.put(lookup)

    def check(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = [batch[c].to_pylist() for c in key_columns]
        vals = [batch[c].to_pylist() for c in value_columns]
        n = len(batch)
        match = [False] * n
        mismatch: list = [None] * n
        for i in range(n):
            key = tuple(a[i] for a in keys)
            expected = lk.get(key)
            if expected is None:
                mismatch[i] = "__missing_key__"
                continue
            ok = True
            for ci, col in enumerate(value_columns):
                if vals[ci][i] != expected[ci]:
                    mismatch[i] = col
                    ok = False
                    break
            match[i] = ok
        out = {c: batch[c] for c in key_columns}
        out["match"] = pa.array(match, pa.bool_())
        out["mismatch_column"] = pa.array(mismatch, pa.string())
        return pa.table(out)

    return ds.map_batches(check, batch_format="pyarrow")


def equality_rate(verdicts) -> float:
    """Aggregate per-turn equality rate from a verdict dataset."""
    import pyarrow.compute as pc

    total = 0
    matched = 0
    for batch in verdicts.iter_batches(batch_format="pyarrow"):
        total += batch.num_rows
        matched += pc.sum(pc.cast(batch["match"], pa.int64())).as_py() or 0
    return matched / total if total else 1.0
