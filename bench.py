#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the flagship extraction twice in fresh subprocesses
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency T_32 / (4 * T_8) — the sandbox stand-in for the north
rule's N→4N-node criterion.

The extract stage runs with the payload LRU cache DISABLED here so the
number is honest per-turn parse throughput, not cache-hit rate (transcript
bench corpora repeat a small fixture pool; real corpora mostly don't).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
# Large corpus at sf0.1 so per-turn parse work dominates the fixed
# post-barrier tail (ordering-shuffle reduce + partition writes, ~12s at
# 32 cpus) and the N→4N efficiency reflects steady-state throughput:
# 1.5M turns ≈ 37 core-minutes of parse work
BENCH_TURNS = {"0.001": 1000, "0.01": 4000, "0.1": 1_500_000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else "0.1"


def _bench_corpus(sf_dir: str) -> str:
    """Transcript corpus for the bench scale (built once, cached in /tmp)."""
    import hashlib

    from pdf_inspector_ray.sources.pdfgen import fixture_pool
    from pdf_inspector_ray.sources.transcripts import (
        GENERATOR_VERSION, write_transcript_corpus)

    sf = _sf_of(sf_dir)
    n_turns = BENCH_TURNS.get(sf, 20000)
    digest = hashlib.md5(
        b"".join(v for _, v in sorted(fixture_pool().items())),
        usedforsecurity=False).hexdigest()[:10] + f"v{GENERATOR_VERSION}"
    out = f"/tmp/pdf_inspector_ray_bench/sf{sf}-{digest}-n{n_turns}"
    marker = os.path.join(out, "_complete")
    if not os.path.exists(marker):
        # goldens are the driver-correctness surface, not a bench input —
        # at 1.5M rows materializing golden markdown would dominate build
        write_transcript_corpus(out, n_turns, include_goldens=False)
        with open(marker, "w") as f:
            f.write("ok")
    return out


# -- pinned-conditions protocol (VERDICT r02 fix #1) -------------------------
# The r2 driver bench read 11% slower than the builder's same-harness runs.
# Unpinned conditions (cold page cache, background load, clock state) are the
# plausible causes; this protocol removes or records each of them so driver
# and builder numbers are comparable:
#   * pre-warm: the corpus files are read once before timing, so every run
#     measures warm-cache throughput (the steady-state condition);
#   * conditions: load average and a calibrated spin-loop clock probe are
#     recorded in the output JSON next to the timings;
#   * repeats: the headline extract runs GRAFT_BENCH_REPEATS (default 3)
#     times and reports the MEDIAN, with per-run values recorded;
#   * read pruning is asserted (the corpus scan must project exactly the
#     input columns) and recorded.

def _exchange_parts(est_rows: int, rows_per_part: int = 20_000) -> int:
    """~rows_per_part rows per hash partition (bounds per-task memory at
    scale; floor 16 keeps toy inputs off the 256× per-task launch floor)."""
    return max(16, min(256, est_rows // rows_per_part))


def _footer_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(path).metadata.num_rows


def _prewarm_files(path: str) -> float:
    """Read every file under ``path`` once (page-cache warm); returns GB."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            with open(fp, "rb", buffering=1 << 20) as fh:
                while True:
                    chunk = fh.read(1 << 24)
                    if not chunk:
                        break
                    total += len(chunk)
    return round(total / 1e9, 3)


def _clock_probe(n: int = 2_000_000) -> float:
    """Calibrated spin-loop rate (Mops/s) — a cheap proxy for the clock the
    benchmarked cores actually run at (turbo state, background load)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    return round(n / (time.perf_counter() - t0) / 1e6, 1)


def _conditions(corpus: str, sf_dir: str) -> dict:
    la1, la5, la15 = os.getloadavg()
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "clock_probe_mops": _clock_probe(),
        "prewarmed_gb": round(_prewarm_files(corpus)
                              + _prewarm_files(sf_dir), 3),
    }


def run_benchmarks(sf_dir: str, num_cpus: int,
                   extract_repeats: int | None = None) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True)
    try:
        import shutil
        import statistics

        import ray.data

        from pdf_inspector_ray.pipelines.flagship import (
            classify_pipeline, read_transcripts, run_to_partitioned_output,
            sized_concurrency)

        corpus = _bench_corpus(sf_dir)
        if extract_repeats is None:
            extract_repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
        conditions = _conditions(corpus, sf_dir)
        queries: dict[str, float] = {}
        # single-node pool by default; the scaling entry point sets
        # GRAFT_POOL_MODE=scaling for per-node slack emulation (see
        # sized_concurrency docstring)
        pool_mode = os.environ.get("GRAFT_POOL_MODE", "single-node")
        pool = sized_concurrency(mode=pool_mode)
        conditions["pool_mode"] = pool_mode
        conditions["pool_actors"] = pool

        # read-plan pruning assert: the corpus scan must project exactly
        # the pipeline input columns (golden_* etc. never leave storage)
        from pdf_inspector_ray.pipelines.flagship import INPUT_COLUMNS
        probe_schema = read_transcripts(corpus).schema().names
        assert list(probe_schema) == list(INPUT_COLUMNS), probe_schema
        conditions["read_columns"] = list(probe_schema)

        # Warmup (untimed): a run of the same pipeline absorbs the
        # fresh-process penalty (actor-pool startup, bytecode/import warm,
        # CPU governor ramp) that made first runs ~20% slower than
        # steady-state regardless of pool size — the very effect behind
        # the unexplained r2 driver-vs-builder extract discrepancy.
        # r3 evidence (BENCH_r03 extract_runs[0] 108.9 vs median 96.0)
        # showed the ramp can outlast a 150k-turn warmup, so it is 400k
        # now (~25 s) — VERDICT r3 #7 wants runs[0] within ~5% of median.
        warm_dir = f"/tmp/pdf_inspector_ray_bench_out/warmup{num_cpus}"
        shutil.rmtree(warm_dir, ignore_errors=True)
        run_to_partitioned_output(
            read_transcripts(corpus, num_blocks=4 * num_cpus).limit(400_000),
            warm_dir, num_buckets=max(16, num_cpus * 2), resume=False,
            use_payload_cache=False, concurrency=pool)
        shutil.rmtree(warm_dir, ignore_errors=True)

        # Headline: the full resumable job — extract (fixed actor pool) →
        # salted ordering → partitioned parquet write with lineage, all
        # distributed (the driver only orchestrates). Median of N runs.
        extract_runs: list[float] = []
        n_turns = 0
        for rep in range(max(1, extract_repeats)):
            out_dir = f"/tmp/pdf_inspector_ray_bench_out/cpus{num_cpus}"
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            ds = read_transcripts(corpus, num_blocks=4 * num_cpus)
            metrics = run_to_partitioned_output(
                ds, out_dir, num_buckets=max(16, num_cpus * 2), resume=False,
                use_payload_cache=False, concurrency=pool)
            n_turns = metrics["rows"]
            extract_runs.append(round(time.perf_counter() - t0, 3))
        queries["extract_ordered"] = round(statistics.median(extract_runs), 3)
        conditions["extract_runs"] = extract_runs

        # q_classify: detection-only pass (count() = distributed consume;
        # pulling every block to the driver would serialize the tail)
        t0 = time.perf_counter()
        ds = read_transcripts(corpus, num_blocks=4 * num_cpus)
        classify_pipeline(ds).count()
        queries["classify"] = round(time.perf_counter() - t0, 3)

        # documents-table operators at the requested sf
        docs_path = os.path.join(sf_dir, "documents.parquet")
        if os.path.exists(docs_path):
            from pdf_inspector_ray.functions.dedup import (
                exact_dedup, minhash_lsh_candidates)
            from pdf_inspector_ray.functions.text_stats import quality_batch

            t0 = time.perf_counter()
            dd = exact_dedup(ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"]))
            dd.count()
            queries["exact_dedup"] = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            mh = minhash_lsh_candidates(ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"]))
            mh.count()
            queries["minhash_lsh"] = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            q = ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"]).map_batches(
                quality_batch, batch_format="pyarrow")
            sum(b.num_rows for b in q.iter_batches(batch_format="pyarrow"))
            queries["quality"] = round(time.perf_counter() - t0, 3)

        events_path = os.path.join(sf_dir, "events.parquet")
        if os.path.exists(events_path):
            from pdf_inspector_ray.functions.relational import (
                asof_join_events, hopping_window_counts, session_windows,
                windowed_event_counts)

            t0 = time.perf_counter()
            ev = ray.data.read_parquet(events_path)
            windowed_event_counts(ev).count()
            hopping_window_counts(
                ray.data.read_parquet(events_path)).count()
            asof_join_events(ray.data.read_parquet(events_path),
                             left_type="purchase", right_type="signup").count()
            session_windows(ray.data.read_parquet(events_path)).count()
            queries["events_suite"] = round(time.perf_counter() - t0, 3)

        if os.path.exists(events_path):
            from pdf_inspector_ray.functions.relational import (
                distinct_count, running_totals)

            t0 = time.perf_counter()
            running_totals(ray.data.read_parquet(
                events_path,
                columns=["event_id", "ts", "user_id", "value"])).count()
            distinct_count(ray.data.read_parquet(
                events_path, columns=["event_type", "user_id"]),
                "event_type", "user_id").count()
            queries["windows_suite"] = round(time.perf_counter() - t0, 3)

        if os.path.exists(docs_path):
            from pdf_inspector_ray.functions.decontam import (
                contaminated_train_docs)
            from pdf_inspector_ray.functions.text_stats import (
                repetition_stats_batch)

            gram_parts = _exchange_parts(_footer_rows(docs_path) * 200)
            t0 = time.perf_counter()
            contaminated_train_docs(
                ray.data.read_parquet(docs_path,
                                      columns=["doc_id", "text"]),
                k=3, num_partitions=gram_parts).count()
            contaminated_train_docs(
                ray.data.read_parquet(docs_path,
                                      columns=["doc_id", "text"]),
                k=3, bloom_prescreen=True,
                num_partitions=gram_parts).count()
            ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"]).map_batches(
                repetition_stats_batch, batch_format="pyarrow").count()
            queries["curation_suite"] = round(time.perf_counter() - t0, 3)

            # round-3 text operators: exact similarity join (prefix
            # filtering), chunking, redaction, tf-idf — one timed pass
            from pdf_inspector_ray.functions.dedup import (
                jaccard_prefix_candidates)
            from pdf_inspector_ray.functions.scrub import regex_redact
            from pdf_inspector_ray.functions.text_stats import (
                chunk_documents, tfidf_top_terms, token_count_batch)

            t0 = time.perf_counter()
            jaccard_prefix_candidates(
                ray.data.read_parquet(docs_path,
                                      columns=["doc_id", "text"]),
                threshold=0.7,
                num_partitions=gram_parts).count()
            chunk_documents(ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"])).count()
            regex_redact(ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"])).count()
            tfidf_top_terms(
                ray.data.read_parquet(docs_path,
                                      columns=["doc_id", "text"]),
                n_docs=_footer_rows(docs_path)).count()
            ray.data.read_parquet(
                docs_path, columns=["doc_id", "text"]).map_batches(
                token_count_batch, batch_format="pyarrow").count()
            queries["text_ops_suite"] = round(time.perf_counter() - t0, 3)

        orders_path = os.path.join(sf_dir, "orders.parquet")
        if os.path.exists(orders_path) and os.path.exists(events_path):
            from pdf_inspector_ray.functions.relational import (
                order_priority_revenue, range_join, session_windows)

            li_path = os.path.join(sf_dir, "lineitem.parquet")
            join_parts = _exchange_parts(_footer_rows(li_path))
            ev_parts = _exchange_parts(_footer_rows(events_path))
            t0 = time.perf_counter()
            order_priority_revenue(
                ray.data.read_parquet(
                    orders_path, columns=["o_orderkey", "o_orderpriority"]),
                ray.data.read_parquet(
                    li_path,
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount"]),
                num_partitions=join_parts).count()
            sessions = session_windows(ray.data.read_parquet(
                events_path, columns=["event_id", "ts", "user_id", "value"])
            ).select_columns(["user_id", "session_start", "session_end"])
            import pyarrow as _pa
            range_join(
                ray.data.read_parquet(
                    events_path, columns=["event_id", "ts", "user_id"]),
                sessions, key="user_id", left_ts="ts",
                right_start="session_start", right_end="session_end",
                num_partitions=ev_parts,
                right_schema=[("user_id", _pa.int64()),
                              ("session_start", _pa.timestamp("us")),
                              ("session_end", _pa.timestamp("us"))]).count()
            import pyarrow.parquet as _pq

            from pdf_inspector_ray.functions.relational import (
                revenue_by_nation, top_revenue_orders)
            li_cols = ["l_orderkey", "l_extendedprice", "l_discount"]
            revenue_by_nation(
                ray.data.read_parquet(
                    os.path.join(sf_dir, "customer.parquet"),
                    columns=["c_custkey", "c_nationkey"]),
                ray.data.read_parquet(
                    orders_path, columns=["o_orderkey", "o_custkey"]),
                ray.data.read_parquet(li_path, columns=li_cols),
                _pq.read_table(os.path.join(sf_dir, "nation.parquet")),
                _pq.read_table(os.path.join(sf_dir, "region.parquet")),
                num_partitions=join_parts,
            ).count()
            top_revenue_orders(ray.data.read_parquet(
                li_path, columns=li_cols)).count()
            import pyarrow.compute as _pc

            from pdf_inspector_ray.functions.relational import (
                shipping_priority)
            cutoff = _pa.scalar(867_715_200_000_000, _pa.timestamp("us"))
            shipping_priority(
                ray.data.read_parquet(
                    os.path.join(sf_dir, "customer.parquet"),
                    columns=["c_custkey", "c_mktsegment"],
                    filter=_pc.field("c_mktsegment") == "BUILDING"),
                ray.data.read_parquet(
                    orders_path,
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_orderpriority"],
                    filter=_pc.field("o_orderdate") < cutoff),
                ray.data.read_parquet(
                    li_path,
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"],
                    filter=_pc.field("l_shipdate") > cutoff),
                num_partitions=join_parts)
            queries["joins_suite"] = round(time.perf_counter() - t0, 3)

        if os.path.exists(events_path) and os.path.exists(docs_path):
            from pdf_inspector_ray.functions.relational import (
                latest_event_per_user, melt, mode_per_group, set_op_ids)
            from pdf_inspector_ray.functions.sketch import heavy_hitters
            from pdf_inspector_ray.functions.text_stats import (
                dense_rank_column)

            t0 = time.perf_counter()
            heavy_hitters(
                ray.data.read_parquet(events_path, columns=["user_id"]),
                "user_id", min_count=75,
                n_rows_hint=_footer_rows(events_path))
            latest_event_per_user(ray.data.read_parquet(
                events_path,
                columns=["event_id", "ts", "user_id", "event_type"])).count()
            mode_per_group(ray.data.read_parquet(
                events_path, columns=["event_type", "user_id"]),
                "event_type", "user_id").count()
            melt(ray.data.read_parquet(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_orderkey", "l_linenumber", "l_quantity",
                         "l_extendedprice", "l_discount", "l_tax"]),
                id_cols=["l_orderkey", "l_linenumber"],
                value_cols=["l_quantity", "l_extendedprice",
                            "l_discount", "l_tax"]).count()
            set_op_ids(
                ray.data.read_parquet(docs_path, columns=["doc_id"]),
                ray.data.read_parquet(docs_path, columns=["doc_id"]),
                "doc_id", "intersect").count()
            dense_rank_column(ray.data.read_parquet(
                docs_path, columns=["doc_id", "n_chars"]),
                "n_chars").count()
            queries["analytics_suite"] = round(time.perf_counter() - t0, 3)

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        if os.path.exists(emb_path):
            import pyarrow.parquet as pq

            from pdf_inspector_ray.functions.dedup import (
                embedding_neardup_candidates)
            from pdf_inspector_ray.functions.similarity import brute_force_topk

            qv = pq.read_table(emb_path).slice(0, 1)["embedding"][0].as_py()
            t0 = time.perf_counter()
            brute_force_topk(ray.data.read_parquet(emb_path), qv, k=10)
            queries["topk_similar"] = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            embedding_neardup_candidates(
                ray.data.read_parquet(emb_path), axis_aligned=True).count()
            queries["embedding_neardup"] = round(time.perf_counter() - t0, 3)

            import numpy as _np

            from pdf_inspector_ray.functions.similarity import kmeans_assign
            head = pq.read_table(emb_path, columns=["vec_id", "embedding"],
                                 filters=[("vec_id", "<", 8)])
            order = _np.argsort(
                head["vec_id"].to_numpy(zero_copy_only=False))
            cents = _np.asarray(head["embedding"].to_pylist(),
                                dtype=_np.float64)[order]
            t0 = time.perf_counter()
            kmeans_assign(ray.data.read_parquet(
                emb_path, columns=["vec_id", "embedding"]), cents).count()
            queries["kmeans_assign"] = round(time.perf_counter() - t0, 3)

        # media_suite: REAL decode work (BMP/PNG/WAV/AVI codecs, frame
        # sampling, resize round-trip) over an sf-scaled corpus — r4's
        # media bench was "fake-cheap" because the video path was a stub
        media_n = {"0.001": 100, "0.01": 400, "0.1": 2000}.get(
            _sf_of(sf_dir), 400)
        from pdf_inspector_ray.functions.multimodal import (
            REAL_MEDIA_GENERATOR_VERSION, RealMediaDecoder, ResizeImages,
            VideoFrameSampler, synthesize_real_media_table)
        media_dir = (f"/tmp/pdfi_bench_media_v{REAL_MEDIA_GENERATOR_VERSION}"
                     f"-n{media_n}")
        marker = os.path.join(media_dir, "_complete")
        if not os.path.exists(marker):
            import pyarrow.parquet as _pq
            os.makedirs(media_dir, exist_ok=True)
            _pq.write_table(synthesize_real_media_table(media_n),
                            os.path.join(media_dir, "media-00000.parquet"))
            with open(marker, "w") as f:
                f.write("ok")
        t0 = time.perf_counter()
        media_ds = ray.data.read_parquet(
            media_dir, columns=["media_id", "media_type", "payload"])
        media_ds.map_batches(RealMediaDecoder, batch_size=32,
                             concurrency=(1, num_cpus // 4 or 1),
                             batch_format="pyarrow").count()
        media_ds.map_batches(VideoFrameSampler, batch_size=16,
                             concurrency=(1, num_cpus // 4 or 1),
                             batch_format="pyarrow").count()
        media_ds.map_batches(ResizeImages, batch_size=32,
                             concurrency=(1, num_cpus // 4 or 1),
                             batch_format="pyarrow").count()
        queries["media_suite"] = round(time.perf_counter() - t0, 3)

        total = round(sum(queries.values()), 3)
        return {
            "metric": "pipeline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": float(_sf_of(sf_dir)),
            "num_cpus": num_cpus,
            "bench_turns": n_turns,
            "turns_per_sec": round(n_turns / queries["extract_ordered"], 1)
            if queries.get("extract_ordered") else None,
            "conditions": conditions,
        }
    finally:
        ray.shutdown()


def _spawn_spinners(n: int) -> list:
    """nice-19 busy loops that keep the chip at its all-core clock without
    stealing measurable CPU from the benchmarked Ray instance.

    Why: on one box, "8 busy cores" turbo ~1.22x higher per-core clock
    than "30 busy cores" (measured), so a bare 8-vs-32 comparison
    conflates CPU count with clock speed. Real N→4N NODE scaling is
    iso-clock — every node runs at its own all-core frequency. Loading
    the idle cores during the small-scale phase restores the iso-clock
    condition the north rule's metric is defined over."""
    procs = []
    code = "while True:\n    pass\n"
    for _ in range(max(0, n)):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code],
            preexec_fn=lambda: os.nice(19),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    return procs


def run_scaling(sf_dir: str, base_cpus: int = 8, big_cpus: int = 32) -> dict:
    """Same job at two parallelism levels in fresh processes; reports
    throughput at both + efficiency = tput_big / (scale * tput_base).
    The small-scale phase runs with the remaining cores loaded (see
    _spawn_spinners) so both phases execute at the chip's all-core clock."""
    total_cores = os.cpu_count() or big_cpus
    results = {}
    for cpus in (base_cpus, big_cpus):
        spinners = _spawn_spinners(total_cores - cpus)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--single", "--cpus", str(cpus)],
                # one extract run per scale: the scaling metric is a ratio
                # of two same-protocol runs, and the spinner processes make
                # long repeats costly
                env={**os.environ, "GRAFT_SF_DIR": sf_dir,
                     "GRAFT_BENCH_REPEATS": os.environ.get(
                         "GRAFT_BENCH_REPEATS", "1"),
                     # per-node slack emulation: equal pool FRACTION at
                     # both scales so the ratio measures scaling, not
                     # slack amortization
                     "GRAFT_POOL_MODE": "scaling"},
                capture_output=True, text=True, timeout=3600)
        finally:
            for s in spinners:
                s.kill()
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[cpus] = json.loads(line)
        except json.JSONDecodeError:
            raise RuntimeError(
                f"bench subprocess (cpus={cpus}) failed:\n{proc.stdout}\n{proc.stderr}")
    tput_base = results[base_cpus]["turns_per_sec"]
    tput_big = results[big_cpus]["turns_per_sec"]
    scale = big_cpus / base_cpus
    efficiency = tput_big / (scale * tput_base) if tput_base else None
    return {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3) if efficiency else None,
        "unit": "ratio",
        "queries": {
            f"turns_per_sec_cpus{base_cpus}": tput_base,
            f"turns_per_sec_cpus{big_cpus}": tput_big,
            f"extract_sec_cpus{base_cpus}":
                results[base_cpus]["queries"]["extract_ordered"],
            f"extract_sec_cpus{big_cpus}":
                results[big_cpus]["queries"]["extract_ordered"],
        },
        # full per-query timings at both scales so later rounds can grade
        # regressions per pipeline, not just the suite total
        "per_scale": {str(c): results[c]["queries"] for c in results},
        "sf": results[big_cpus]["sf"],
        "num_cpus": big_cpus,
        "scale_factor": scale,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    print(json.dumps(run_benchmarks(sf_dir, cpus)))


if __name__ == "__main__":
    main()
