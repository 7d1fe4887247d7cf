"""Payload-LRU probe (VERDICT r3 #8): measures per-actor extract
throughput with the payload cache OFF vs ON at controlled
attachment-repeat profiles, grounding the 100-TB projection for corpora
where attachments repeat across turns (bench.py keeps the cache OFF for
honesty because the bench corpus repeats a tiny fixture pool — a ~100%
hit rate would overstate parse throughput).

The cache lives inside each actor (``ExtractRender._result_cache``), so
the probe runs the UDF directly in-process — one actor's stream, no Ray
— which isolates the cache effect from actor-pool startup and host
clock drift (interleaved OFF/ON repeats, min of 3). The sequence-exact
LRU-256 hit rate is reported next to each timing; fleet throughput
multiplies by the pool size as usual.

Profiles: N turns drawn from D distinct seeded prose PDFs with
popularity uniform / Zipf(a) — Zipf heads model boilerplate attachments
(forms, headers) that dominate real transcript corpora.

Usage: python tools/payload_cache_probe.py [n_turns] [n_distinct]
"""

from __future__ import annotations

import json
import sys
import time
from collections import OrderedDict

import numpy as np
import pyarrow as pa


def _lru_hit_rate(seq: np.ndarray, size: int = 256) -> float:
    lru: OrderedDict = OrderedDict()
    hits = 0
    for k in seq.tolist():
        if k in lru:
            hits += 1
            lru.move_to_end(k)
        else:
            lru[k] = None
            if len(lru) > size:
                lru.popitem(last=False)
    return hits / len(seq)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    sys.path.insert(0, ".")
    from pdf_inspector_ray.sources.pdfgen import make_prose_pdf
    from pdf_inspector_ray.stages.extract_stage import ExtractRender

    rng = np.random.default_rng(4)
    pool = np.array([make_prose_pdf(s).decode("latin-1")
                     for s in range(d)], dtype=object)

    def profile(name: str):
        if name == "uniform":
            return rng.integers(0, d, size=n)
        a = float(name.split("-")[1])
        z = rng.zipf(a, size=n)
        return (z - 1) % d

    def run(idx: np.ndarray, use_cache: bool) -> float:
        udf = ExtractRender(use_payload_cache=use_cache)
        t0 = time.perf_counter()
        for lo in range(0, len(idx), 1000):
            batch = pa.table({"text": pa.array(pool[idx[lo:lo + 1000]],
                                               pa.string())})
            udf(batch)
        return time.perf_counter() - t0

    results = {}
    run(profile("uniform")[:2000], False)  # untimed warmup
    for prof in ("uniform", "zipf-1.1", "zipf-1.4"):
        idx = profile(prof)
        # interleave OFF/ON repeats, min of 2: host frequency drift over
        # sustained load otherwise biases whichever config runs later
        times: dict[bool, list[float]] = {False: [], True: []}
        for _ in range(2):
            for cache in (False, True):
                times[cache].append(run(idx, cache))
        t_off, t_on = min(times[False]), min(times[True])
        results[prof] = {
            "distinct_frac": round(len(np.unique(idx)) / n, 4),
            "lru256_hit_rate": round(_lru_hit_rate(idx), 4),
            "off_sec": round(t_off, 2), "on_sec": round(t_on, 2),
            "speedup": round(t_off / t_on, 2),
            "docs_per_sec_core_on": round(n / t_on, 1),
        }
    print(json.dumps({"n_turns": n, "n_distinct_pool": d,
                      "profiles": results}))


if __name__ == "__main__":
    main()
