"""Flagship pipeline: read → extract (fused classify+extract actor pool) →
salted ordering → partitioned resumable write.

Ray Data shape (SURVEY.md §3.1): the only data movement is the read, the
one conv_id shuffle, and the write. Extraction is embarrassingly parallel
per turn → no key needed; the ordering restore is the single shuffle.

Never calls ``ray.init`` — the session is owned by the driver / bench / tests.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import ray.data

from ..pdfi.detect import DetectionConfig
from ..pdfi.markdown import MarkdownOptions
from ..stages.classify import classify_batch
from ..stages.extract_stage import ExtractRender
from ..state.checkpoint import filter_completed, list_completed_partitions, write_partition
from .ordering import add_salted_partition, restore_turn_order, sort_within_group

# Sized for a 32-core local node; on a multi-node cluster `concurrency`
# scales with the cluster and the streaming executor backpressures the read.
DEFAULT_BATCH_SIZE = 64          # PDF parse cost dominates; small batches keep
                                 # actor heartbeats short (SURVEY.md §4.2)
DEFAULT_CONCURRENCY = (2, 32)

# The canonical pipeline input schema (BASELINE.json input_hint +
# pdf_sha256 sidecar). read_transcripts prunes to these by default so
# corpus sidecar columns (golden_* oracles) never leave storage.
INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                 "pdf_sha256"]


def sized_concurrency(mode: str = "single-node") -> int:
    """Fixed actor-pool size for the current cluster.

    ``mode="single-node"`` (default): slack = ``max(2, cpus//16)`` — on one
    node the non-parse work (read tasks, finalize) needs only a couple of
    cores once the map-side shard write is fused into the extract actors;
    measured at 32 CPUs: pool 24 → 115 s, pool 30 → 95 s warm (r3), with
    no deadlock (2 free cores keep the read/finalize tasks flowing).

    ``mode="scaling"``: slack = ``max(2, cpus//4)`` — PER-NODE slack
    emulation for the N→4N measurement: "32 CPUs" stands in for 4 nodes
    of 8, and a real 4-node cluster pays the read/shuffle slack on every
    node, so the pool FRACTION must be equal at both scales or the
    efficiency ratio partly measures slack amortization instead of
    scaling. (r2 note kept for posterity: an AUTOSCALING pool ((min,max))
    under a downstream all-to-all is starved by Ray's per-operator
    resource reservation — observed ~2 active actors of 8; an all-CPUs
    fixed pool deadlocks against the read/shuffle tasks.)"""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    slack = max(2, cpus // 4) if mode == "scaling" else max(2, cpus // 16)
    return max(2, cpus - slack)


def read_transcripts(path: Union[str, list[str]],
                     columns: Optional[list[str]] = None,
                     num_blocks: Optional[int] = None) -> ray.data.Dataset:
    """Column-pruned parquet read (only ship what the stage needs).

    ``num_blocks``: block granularity. Coarse blocks (≈4× the actor pool)
    cut the ordering shuffle's map-side object count (blocks × buckets tiny
    slices) — measured ~10% end-to-end at 32 CPUs — while staying fine
    enough that the pool doesn't straggle."""
    if columns is None:
        columns = INPUT_COLUMNS
    if num_blocks is None:
        return ray.data.read_parquet(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=num_blocks)


def classify_pipeline(ds: ray.data.Dataset,
                      config: Optional[DetectionConfig] = None) -> ray.data.Dataset:
    """detect-pdf equivalent: stateless classification only (SB)."""
    return ds.map_batches(
        classify_batch,
        fn_kwargs={"config": config} if config else {},
        batch_format="pyarrow",
    )


def extract_pipeline(ds: ray.data.Dataset,
                     detection_config: Optional[DetectionConfig] = None,
                     markdown_options: Optional[MarkdownOptions] = None,
                     batch_size: int = DEFAULT_BATCH_SIZE,
                     concurrency=DEFAULT_CONCURRENCY,
                     use_payload_cache: bool = True) -> ray.data.Dataset:
    """inspect→classify→extract over every turn (AB actor pool)."""
    return ds.map_batches(
        ExtractRender,
        fn_constructor_kwargs={
            "detection_config": detection_config,
            "markdown_options": markdown_options,
            "use_payload_cache": use_payload_cache,
        },
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )


def flagship(ds: ray.data.Dataset,
             ordering: str = "sort",
             num_buckets: int = 64,
             **extract_kwargs) -> ray.data.Dataset:
    """extract + stable turn ordering; returns the ordered dataset."""
    extracted = extract_pipeline(ds, **extract_kwargs)
    return restore_turn_order(extracted, strategy=ordering,
                              num_buckets=num_buckets)


def run_to_partitioned_output(ds: ray.data.Dataset,
                              out_dir: str,
                              num_buckets: int = 64,
                              resume: bool = True,
                              drop_payload: bool = True,
                              payload_column: str = "text",
                              shuffle: str = "file",
                              **extract_kwargs) -> dict:
    """The full resumable job: salt → (skip completed parts) → extract →
    repartition by salted bucket → per-partition sort + write with lineage.

    Salting happens BEFORE extraction so a resumed run skips the expensive
    parse for completed partitions, not just the write.

    ``shuffle="file"`` (default): map tasks append per-partition parquet
    shards while extraction streams (overlapped), then one finalize task
    per partition reads+sorts+writes — no object-store all-to-all, no
    post-extraction barrier beyond the per-partition reads. On multi-node,
    point the shard root at shared storage. ``shuffle="object"``: Ray's
    sort-based groupby exchange (simpler, but its reduce runs post-barrier
    and costs ~2% of total work × the reducer imbalance).
    """
    import shutil
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    completed = frozenset(list_completed_partitions(out_dir)) if resume else frozenset()

    salted = ds.map_batches(
        add_salted_partition,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow")
    if completed:
        salted = salted.map_batches(
            filter_completed, fn_kwargs={"completed": completed},
            batch_format="pyarrow")

    if shuffle == "object":
        extracted = extract_pipeline(salted, **extract_kwargs)
        if drop_payload:
            # don't move the raw payload through the shuffle — the markdown
            # is the product; the payload stays in the input parquet
            extracted = extracted.drop_columns([payload_column])
        ordered_written = extracted.groupby("part").map_groups(
            lambda g: write_partition(sort_within_group(g), out_dir),
            batch_format="pyarrow")
        lineage = ordered_written.to_pandas()  # tiny: one row per partition
        written = int((~lineage["skipped"]).sum()) if len(lineage) else 0
    elif shuffle == "file":
        from ..stages.extract_stage import ExtractAndShard
        from ..state.checkpoint import finalize_partition

        run_nonce = uuid.uuid4().hex[:12]
        shard_root = os.path.join(out_dir, f"_shards-{run_nonce}")
        os.makedirs(shard_root, exist_ok=True)
        batch_size = extract_kwargs.pop("batch_size", DEFAULT_BATCH_SIZE)
        concurrency = extract_kwargs.pop("concurrency", DEFAULT_CONCURRENCY)
        manifests = salted.map_batches(
            ExtractAndShard,
            fn_constructor_kwargs={
                "shard_root": shard_root,
                "drop_columns": [payload_column] if drop_payload else [],
                **extract_kwargs,
            },
            batch_size=None,  # whole block per call: one shard per (block, part)
            concurrency=concurrency,
            num_cpus=1,
            batch_format="pyarrow")
        # consume manifests (tiny) to drive the map side to completion
        touched_parts = sorted({
            p for b in manifests.iter_batches(batch_format="pyarrow")
            for p in b["part"].to_pylist()})
        finalize_ds = ray.data.from_items(
            [{"part": p} for p in touched_parts])
        import pyarrow as pa

        def _finalize(batch: pa.Table) -> pa.Table:
            recs = [finalize_partition(int(p), shard_root, out_dir)
                    for p in batch["part"].to_pylist()]
            return pa.table({
                "part": pa.array([r["part"] for r in recs], pa.int32()),
                "rows": pa.array([r["rows"] for r in recs], pa.int64()),
                "skipped": pa.array([r["skipped"] for r in recs], pa.bool_()),
            })

        lineage = finalize_ds.map_batches(
            _finalize, batch_size=1, batch_format="pyarrow").to_pandas()
        written = int((~lineage["skipped"]).sum()) if len(lineage) else 0
        shutil.rmtree(shard_root, ignore_errors=True)
    else:
        raise ValueError(f"unknown shuffle strategy {shuffle!r}")

    from ..state.checkpoint import aggregate_metrics
    metrics = aggregate_metrics(out_dir)
    metrics["partitions_written_this_run"] = written
    metrics["partitions_skipped_this_run"] = len(completed)
    return metrics


def conv_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation transcript profile: turn count, tool-call count,
    total text codepoints, max turn_idx — the corpus-curation signals a
    transcript pipeline filters on (conversation length caps, tool-heavy
    sessions, truncated conversations).

    Per-batch Arrow group_by partials shrink the exchange to one row per
    (batch, conv_id); the final groupby sums/maxes the partials, so a
    mega-conversation costs its partial count, never its rows. All
    integer arithmetic (utf8_length == DuckDB length(): codepoints).

    SQL twin: COUNT(*) / SUM(CASE tool<>'') / SUM(length(text)) /
    MAX(turn_idx) GROUP BY conv_id."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(
            pc.coalesce(batch["text"], pa.scalar(""))), pa.int64())
        tool_call = pc.cast(pc.not_equal(
            pc.coalesce(batch["tool"], pa.scalar("")), pa.scalar("")),
            pa.int64())
        t = pa.table({
            "conv_id": batch["conv_id"],
            "n_turns": pa.array(np.ones(len(batch), np.int64)),
            "n_tool_calls": tool_call,
            "sum_chars": n_chars,
            "max_turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
        })
        return (t.group_by(["conv_id"]).aggregate(
            [("n_turns", "sum"), ("n_tool_calls", "sum"),
             ("sum_chars", "sum"), ("max_turn_idx", "max")])
            .rename_columns(["conv_id", "n_turns", "n_tool_calls",
                             "sum_chars", "max_turn_idx"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("conv_id")
              .aggregate(Sum("n_turns", alias_name="n_turns"),
                         Sum("n_tool_calls", alias_name="n_tool_calls"),
                         Sum("sum_chars", alias_name="sum_chars"),
                         Max("max_turn_idx", alias_name="max_turn_idx")))


def conv_turn_gaps(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation cadence: number of inter-turn gaps, their total
    and max in microseconds, under turn_idx order — the signal used to
    split stalled agent sessions and cap runaway tool loops.

    One shuffle (groupby conv_id); the per-group pass is a numpy argsort
    + diff — all int64, so the twin (SUM/MAX over LAG differences)
    matches exactly. Single-turn conversations report 0 gaps with
    NULL total/max, like SQL aggregates over an empty LAG set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["conv_id"]),
                       pc.and_(pc.is_valid(batch["turn_idx"]),
                               pc.is_valid(batch["ts"])))
        batch = batch.filter(keep)
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def sweep(group: pa.Table) -> pa.Table:
        idx = group["turn_idx"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        gaps = np.diff(ts[np.argsort(idx)])
        n = len(gaps)
        return pa.table({
            "conv_id": group["conv_id"][:1],
            "n_gaps": pa.array([n], pa.int64()),
            "sum_gap_us": pa.array([int(gaps.sum()) if n else None],
                                   pa.int64()),
            "max_gap_us": pa.array([int(gaps.max()) if n else None],
                                   pa.int64()),
        })

    return (ds.map_batches(prefilter, batch_format="pyarrow")
              .groupby("conv_id")
              .map_groups(sweep, batch_format="pyarrow"))
