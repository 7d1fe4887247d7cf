"""Skew-salting probe (VERDICT r3 #6): joins a Zipf-skewed left table
(hottest key ~30% of rows) against a dimension table with and without
``hot_keys`` salting, reports wall time and the exchange's per-partition
row spread under both plans. Paste the JSON line into BASELINE.md.

Usage: python tools/skew_probe.py [n_rows] [num_cpus]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 ignore_reinit_error=True)
    import ray.data

    sys.path.insert(0, ".")
    from pdf_inspector_ray.functions.relational import (PART_MULT,
                                                        SALT_MULT,
                                                        hash_join)

    rng = np.random.default_rng(97)
    zipf = rng.zipf(1.25, size=n)
    key = np.where(zipf == 1, 1, 1 + (zipf % 997)).astype(np.int64)
    hot_share = float((key == 1).mean())
    left = pa.table({"k": pa.array(key, pa.int64()),
                     "lv": pa.array(np.arange(n), pa.int64())})
    rkey = np.arange(1, 998, dtype=np.int64)
    right = pa.table({"rk": pa.array(rkey, pa.int64()),
                      "rv": pa.array(rkey * 10, pa.int64())})

    num_partitions, salt = 64, 8

    def run(hot_keys):
        t0 = time.perf_counter()
        out = hash_join(ray.data.from_arrow(left).repartition(cpus),
                        ray.data.from_arrow(right), on="k", right_on="rk",
                        num_partitions=num_partitions,
                        hot_keys=hot_keys, salt=salt)
        rows = out.count()
        return time.perf_counter() - t0, rows

    # warmup (Ray task launch amortization), then measure each plan
    run(None)
    t_plain, rows_plain = run(None)
    t_salted, rows_salted = run([1])
    assert rows_plain == rows_salted == n

    k64 = key.astype(np.uint64)
    with np.errstate(over="ignore"):
        part_plain = (k64 * np.uint64(PART_MULT)) % np.uint64(num_partitions)
        salt_idx = np.zeros(n, dtype=np.uint64)
        is_hot = key == 1
        salt_idx[is_hot] = (np.arange(n, dtype=np.uint64)[is_hot]
                            % np.uint64(salt))
        part_salted = ((k64 * np.uint64(PART_MULT)
                        + salt_idx * np.uint64(SALT_MULT))
                       % np.uint64(num_partitions))
    hist_p = np.bincount(part_plain.astype(int), minlength=num_partitions)
    hist_s = np.bincount(part_salted.astype(int), minlength=num_partitions)
    print(json.dumps({
        "n_left_rows": n, "hot_share": round(hot_share, 4),
        "num_partitions": num_partitions, "salt": salt,
        "plain_sec": round(t_plain, 2), "salted_sec": round(t_salted, 2),
        "plain_max_part_share": round(float(hist_p.max()) / n, 4),
        "salted_max_part_share": round(float(hist_s.max()) / n, 4),
        "plain_p99_over_median": round(
            float(np.quantile(hist_p, 0.99)) / max(np.median(hist_p), 1), 2),
        "salted_p99_over_median": round(
            float(np.quantile(hist_s, 0.99)) / max(np.median(hist_s), 1), 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
