"""Partition-granular lineage + resumable output (SURVEY.md §4.2).

Layout: ``out_dir/part={id}/data.parquet`` + ``out_dir/part={id}/_lineage.json``.
The lineage sidecar records partition id, row count, per-turn content hash,
and wall time; a restarted run lists completed partition ids and filters
them out of the input plan before execution — no reprocessing, byte-identical
final output.

The writer runs inside ``groupby(part).map_groups`` so each salted bucket is
written by exactly one task, and the sidecar is written only after the data
file is durably renamed into place (crash between the two ⇒ partition is
retried, never half-counted).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def lineage_path(out_dir: str, part: int) -> str:
    return os.path.join(partition_dir(out_dir, part), "_lineage.json")


def list_completed_partitions(out_dir: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        try:
            part = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if os.path.exists(os.path.join(out_dir, name, "_lineage.json")):
            done.add(part)
    return done


def content_hash(table: pa.Table, columns: list[str]) -> str:
    """Order-sensitive content hash over the named columns (Arrow IPC
    serialization hashed at C speed — a Python per-row loop here costs
    tens of core-seconds per million rows)."""
    import pyarrow.ipc as ipc

    cols = [c for c in columns if c in table.column_names]
    sub = table.select(cols).combine_chunks()
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, sub.schema) as writer:
        writer.write_table(sub)
    h = hashlib.sha256(sink.getvalue().to_pybytes())
    return h.hexdigest()


def _count_errors(group: pa.Table) -> int:
    if "error_kind" not in group.column_names:
        return 0
    import pyarrow.compute as pc

    valid = pc.sum(pc.cast(pc.is_valid(group["error_kind"]), pa.int64()))
    return int(valid.as_py() or 0)


def write_partition(group: pa.Table, out_dir: str,
                    hash_columns: list[str] | None = None) -> pa.Table:
    """map_groups writer: persist one salted bucket, return its lineage row.

    The group arrives already sorted by (conv_id, turn_idx) from
    ordering.sort_within_group.
    """
    start = time.perf_counter()
    if group.num_rows == 0:
        return pa.table({"part": pa.array([], pa.int32()),
                         "rows": pa.array([], pa.int64()),
                         "content_sha256": pa.array([], pa.string()),
                         "wall_ms": pa.array([], pa.int64()),
                         "skipped": pa.array([], pa.bool_())})
    part = int(group["part"][0].as_py())
    pdir = partition_dir(out_dir, part)
    lpath = lineage_path(out_dir, part)
    if os.path.exists(lpath):
        # resume: partition already completed — skip, report lineage as-is
        with open(lpath) as f:
            rec = json.load(f)
        return pa.table({"part": [part], "rows": [rec["rows"]],
                         "content_sha256": [rec["content_sha256"]],
                         "wall_ms": [0], "skipped": [True]})
    os.makedirs(pdir, exist_ok=True)
    hash_cols = hash_columns or ["conv_id", "turn_idx", "pdf_type", "markdown",
                                 "error_kind"]
    chash = content_hash(group, hash_cols)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    pq.write_table(group, tmp, row_group_size=8192)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    rec = {
        "part": part,
        "rows": group.num_rows,
        "row_range": {
            "conv_id_min": group["conv_id"][0].as_py(),
            "conv_id_max": group["conv_id"][-1].as_py(),
        },
        "content_sha256": chash,
        "wall_ms": int((time.perf_counter() - start) * 1000),
        "error_rows": _count_errors(group),
    }
    tmp_lineage = lpath + ".tmp"
    with open(tmp_lineage, "w") as f:
        json.dump(rec, f)
    os.replace(tmp_lineage, lpath)
    return pa.table({"part": [part], "rows": [group.num_rows],
                     "content_sha256": [chash], "wall_ms": [rec["wall_ms"]],
                     "skipped": [False]})


# -- file-based shuffle (map-side shards + per-partition finalize) ----------
#
# The object-store sort shuffle is a post-extraction barrier whose reduce
# cost scales with data (~1.7% of total work × 4 at the reducer count we
# use) and caps N→4N efficiency near 0.71. Instead, the map side splits
# each extracted block by `part` and appends parquet shard files while
# extraction is still streaming (fully overlapped); the finalize step is
# one task per partition: read that partition's shards, sort, write
# data.parquet + lineage. On a multi-node cluster the shard root must be
# shared storage (object store / NFS) — the standard external-shuffle
# layout; locally it's /tmp.

def finalize_partition(part: int, shard_root: str, out_dir: str,
                       hash_columns: list[str] | None = None) -> dict:
    """Reduce-side: one partition's shards → sorted data.parquet + lineage."""
    import glob as _glob

    import pyarrow.compute as pc

    lpath = lineage_path(out_dir, part)
    if os.path.exists(lpath):
        with open(lpath) as f:
            rec = json.load(f)
        return {"part": part, "rows": rec["rows"],
                "content_sha256": rec["content_sha256"], "wall_ms": 0,
                "skipped": True}
    start = time.perf_counter()
    shard_files = sorted(_glob.glob(os.path.join(shard_root, f"part={part}", "*.parquet")))
    if not shard_files:
        return {"part": part, "rows": 0, "content_sha256": "", "wall_ms": 0,
                "skipped": False}
    table = pa.concat_tables([pq.read_table(f) for f in shard_files])
    order = pc.sort_indices(table, sort_keys=[("conv_id", "ascending"),
                                              ("turn_idx", "ascending")])
    table = table.take(order)
    pdir = partition_dir(out_dir, part)
    os.makedirs(pdir, exist_ok=True)
    hash_cols = hash_columns or ["conv_id", "turn_idx", "pdf_type", "markdown",
                                 "error_kind"]
    chash = content_hash(table, hash_cols)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    pq.write_table(table, tmp, row_group_size=8192)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    rec = {
        "part": part,
        "rows": table.num_rows,
        "row_range": {
            "conv_id_min": table["conv_id"][0].as_py(),
            "conv_id_max": table["conv_id"][-1].as_py(),
        },
        "content_sha256": chash,
        "wall_ms": int((time.perf_counter() - start) * 1000),
        "error_rows": _count_errors(table),
    }
    tmp_lineage = lpath + ".tmp"
    with open(tmp_lineage, "w") as f:
        json.dump(rec, f)
    os.replace(tmp_lineage, lpath)
    return {"part": part, "rows": table.num_rows, "content_sha256": chash,
            "wall_ms": rec["wall_ms"], "skipped": False}


def filter_completed(batch: pa.Table, completed: frozenset[int]) -> pa.Table:
    """SB filter UDF: drop rows whose salted partition already finished."""
    if not completed:
        return batch
    import pyarrow.compute as pc
    mask = pc.invert(pc.is_in(
        batch["part"], value_set=pa.array(sorted(completed), pa.int32())))
    return batch.filter(mask)


def aggregate_metrics(out_dir: str) -> dict:
    """Global metrics from the per-partition sidecars (no dataset pass)."""
    parts = sorted(list_completed_partitions(out_dir))
    total_rows = 0
    total_errors = 0
    wall_ms = 0
    for p in parts:
        with open(lineage_path(out_dir, p)) as f:
            rec = json.load(f)
        total_rows += rec.get("rows", 0)
        total_errors += rec.get("error_rows", 0)
        wall_ms += rec.get("wall_ms", 0)
    return {"partitions": len(parts), "rows": total_rows,
            "error_rows": total_errors, "partition_wall_ms_sum": wall_ms}
