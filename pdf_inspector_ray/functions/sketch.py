"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
constant-memory cardinality operator for 100-TB streams where exact
``distinct_count`` (one shuffle of all pairs) is overkill.

Dataflow: per batch, values dedupe locally and fold into (bucket,
max rho) register rows — at most ``m = 2**b`` rows leave a batch no
matter its size; one tiny ``groupby(bucket).max(rho)`` merges them
(registers are a max-monoid, so merging is associative, idempotent and
order-free — the same property that lets two CLUSTERS' sketches merge
by row-wise max). The driver-side estimator touches only m rows.

The hash is the corpus-wide md5 basis (first 16 hex chars → uint64,
the ``assign_split_batch`` scheme widened to 64 bits) so the registers
are EXACTLY reproducible in SQL — the DuckDB twin recomputes every
register value, making the sketch itself oracle-checkable, not just
its estimate. At production scale swap the per-unique md5 loop for a
vectorized 64-bit hash (e.g. polars xxhash) and keep the same register
algebra; the md5 basis is what buys the exact SQL twin here.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.compute as pc

HLL_B = 10  # 2**10 = 1024 registers → ~3.3% standard error


def hll_registers(ds, column: str, b: int = HLL_B):
    """(bucket, rho) HyperLogLog registers over the distinct values of
    ``column``: bucket = top ``b`` hash bits, rho = 1 + leading zeros of
    the remaining ``64−b`` bits. Hash collisions are part of the sketch
    definition (both the estimate's error model and the SQL twin see the
    same hashed multiset), so register equality is exact."""
    from ray.data.aggregate import Max

    suffix_bits = 64 - b
    mask = (1 << suffix_bits) - 1

    def batch_regs(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        for v in pc.unique(batch[column]).to_pylist():
            if v is None:
                continue
            h = int(hashlib.md5(str(v).encode(),
                                usedforsecurity=False).hexdigest()[:16], 16)
            bucket = h >> suffix_bits
            w = h & mask
            rho = suffix_bits - w.bit_length() + 1 if w else suffix_bits + 1
            if rho > regs.get(bucket, 0):
                regs[bucket] = rho
        return pa.table({"bucket": pa.array(list(regs), pa.int64()),
                         "rho": pa.array(list(regs.values()), pa.int64())})

    return (ds.map_batches(batch_regs, batch_format="pyarrow")
              .groupby("bucket").aggregate(Max("rho", alias_name="rho")))


def hll_estimate(registers: pa.Table, b: int = HLL_B) -> float:
    """Cardinality estimate from a register table — driver-side, m rows.
    Standard HLL with the small-range (linear counting) correction."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    rhos = registers["rho"].to_pylist()
    zeros = m - len(rhos)
    denom = zeros + sum(2.0 ** -r for r in rhos)
    est = alpha * m * m / denom
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_counters(ds, column: str, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH):
    """Count-min sketch (Cormode & Muthukrishnan 2005) counters over
    ``column``: ``depth`` independent md5-salted hash rows × ``width``
    buckets. Per batch, local value counts fold into at most
    depth×width counter rows regardless of batch size; one tiny
    ``groupby((depth, bucket)).sum`` merges them — counters are a
    sum-monoid, so cross-cluster sketches merge by row-wise addition.
    Like ``hll_registers``, the md5 basis makes every counter exactly
    recomputable in SQL (the oracle checks the sketch, not an estimate);
    swap in a vectorized hash at production scale, same algebra."""
    from ray.data.aggregate import Sum

    def batch_counters(batch: pa.Table) -> pa.Table:
        vc = batch[column].value_counts()
        vals = vc.field("values").to_pylist()
        counts = vc.field("counts").to_pylist()
        acc: dict[tuple[int, int], int] = {}
        for v, c in zip(vals, counts):
            if v is None:
                continue
            s = str(v)
            for d in range(depth):
                h = int(hashlib.md5(f"{d}:{s}".encode(),
                                    usedforsecurity=False)
                        .hexdigest()[:16], 16)
                key = (d, h % width)
                acc[key] = acc.get(key, 0) + c
        return pa.table({
            "depth": pa.array([k[0] for k in acc], pa.int64()),
            "bucket": pa.array([k[1] for k in acc], pa.int64()),
            "cnt": pa.array(list(acc.values()), pa.int64()),
        })

    return (ds.map_batches(batch_counters, batch_format="pyarrow")
              .groupby(["depth", "bucket"])
              .aggregate(Sum("cnt", alias_name="cnt")))


def cms_query(counters: pa.Table, value, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> int:
    """Point frequency estimate: min over the value's ``depth`` counters
    (never underestimates; overestimate bounded by collisions)."""
    lut = {(d, b): c for d, b, c in zip(counters["depth"].to_pylist(),
                                        counters["bucket"].to_pylist(),
                                        counters["cnt"].to_pylist())}
    s = str(value)
    return min(lut.get(
        (d, int(hashlib.md5(f"{d}:{s}".encode(),
                            usedforsecurity=False).hexdigest()[:16], 16)
         % width), 0) for d in range(depth))


def hll_registers_by_group(ds, group_column: str, column: str,
                           b: int = HLL_B):
    """Per-group HyperLogLog registers — COUNT(DISTINCT …) GROUP BY at
    sketch cost: ≤ m register rows per (batch, group) leave any batch,
    merged by one ``groupby((group, bucket)).max`` exchange. Registers
    per group merge exactly like the global sketch's (max-monoid), so a
    100-TB job's per-shard grouped sketches union by row-wise max."""
    from ray.data.aggregate import Max

    suffix_bits = 64 - b
    mask = (1 << suffix_bits) - 1

    def batch_regs(batch: pa.Table) -> pa.Table:
        pairs = (pa.table({"g": batch[group_column], "v": batch[column]})
                 .group_by(["g", "v"]).aggregate([]))
        regs: dict[tuple, int] = {}
        for g, v in zip(pairs["g"].to_pylist(), pairs["v"].to_pylist()):
            if v is None or g is None:
                continue
            h = int(hashlib.md5(str(v).encode(),
                                usedforsecurity=False).hexdigest()[:16], 16)
            bucket = h >> suffix_bits
            w = h & mask
            rho = suffix_bits - w.bit_length() + 1 if w else suffix_bits + 1
            key = (g, bucket)
            if rho > regs.get(key, 0):
                regs[key] = rho
        return pa.table({
            group_column: pa.array([k[0] for k in regs]),
            "bucket": pa.array([k[1] for k in regs], pa.int64()),
            "rho": pa.array(list(regs.values()), pa.int64()),
        })

    return (ds.map_batches(batch_regs, batch_format="pyarrow")
              .groupby([group_column, "bucket"])
              .aggregate(Max("rho", alias_name="rho")))
