"""HyperLogLog / count-min sketch tests: exact register parity vs the
DuckDB twin (hash61: multiply-add mod 2^61-1 with xorshift, HUGEINT
intermediates in SQL), estimate accuracy vs true cardinality, the
max-monoid merge law that makes cross-cluster sketch union trivial,
and scalar-vs-vectorized parity of the modular-arithmetic fold."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_inspector_ray.functions.sketch import (CMS_CD, HASH61_A1, HASH61_A2,
                                                HASH61_B1, HASH61_B2, M61,
                                                hash61, hash61_scalar,
                                                hll_estimate, hll_registers,
                                                mulmod61)


def _hash61_sql(src: str, carry: str = "") -> str:
    return f"""
    h1 AS (SELECT CAST((CAST(x AS HUGEINT) * {HASH61_A1} + {HASH61_B1})
                       % {M61} AS BIGINT) AS h{carry} FROM {src}),
    h1x AS (SELECT xor(h, h >> 29) AS h{carry} FROM h1),
    h2 AS (SELECT CAST((CAST(h AS HUGEINT) * {HASH61_A2} + {HASH61_B2})
                       % {M61} AS BIGINT) AS h{carry} FROM h1x),
    hf AS (SELECT xor(h, h >> 37) AS h{carry} FROM h2)"""


def _regs_pd(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("bucket").reset_index(drop=True)


def test_hash61_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-2**62, 2**62, size=20_000),
        np.array([0, 1, -1, M61, M61 - 1, M61 + 1, 2**62, -(2**62), 7919],
                 dtype=np.int64),
    ]).astype(np.int64)
    vec = hash61(vals)
    sc = np.array([hash61_scalar(int(v)) for v in vals], dtype=np.uint64)
    assert np.array_equal(vec, sc)
    # mulmod61 against arbitrary-precision ints on edge values
    xs = np.array([0, 1, M61 - 1, M61, (1 << 31) - 1, 1 << 31, 1 << 60],
                  dtype=np.uint64)
    for a in (1, 2, HASH61_A1, HASH61_A2, M61 - 1):
        got = mulmod61(xs, a)
        exp = np.array([(int(x) * a) % M61 for x in xs], dtype=np.uint64)
        assert np.array_equal(got, exp), a


def test_hll_registers_match_duckdb(ray_session):
    import ray.data
    rng = np.random.default_rng(31)
    vals = rng.integers(0, 10**9, size=60_000)  # ~59k distinct
    t = pa.table({"user_id": pa.array(vals, pa.int64())})
    out = _regs_pd(hll_registers(ray.data.from_arrow(t).repartition(6),
                                 "user_id"))
    exp = duckdb.sql(f"""
        WITH x AS (
            SELECT DISTINCT ((user_id % {M61}) + {M61}) % {M61} AS x FROM t
        ), {_hash61_sql('x')}, parts AS (
            SELECT h >> 51 AS bucket, h & ((1::BIGINT << 51) - 1) AS w
            FROM hf
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(MAX(CASE WHEN w = 0 THEN 52
                             ELSE 51 - length(bin(w)) + 1 END)
                    AS BIGINT) AS rho
        FROM parts GROUP BY bucket ORDER BY bucket
    """).df()
    assert len(out) == 1024  # 59k distinct fills every register
    pd.testing.assert_frame_equal(out, exp.astype({"bucket": "int64",
                                                   "rho": "int64"}))


def test_hll_estimate_accuracy(ray_session):
    import ray.data
    for n, seed in ((500, 1), (20_000, 2), (300_000, 3)):
        vals = np.arange(n, dtype=np.int64) * 7919 + seed  # n distinct
        t = pa.table({"user_id": pa.array(vals, pa.int64())})
        regs = hll_registers(ray.data.from_arrow(t).repartition(4),
                             "user_id").take_all()
        est = hll_estimate(pa.table({
            "bucket": pa.array([r["bucket"] for r in regs], pa.int64()),
            "rho": pa.array([r["rho"] for r in regs], pa.int64())}))
        # m=1024 → ~3.3% standard error; 10% is a 3-sigma bound
        assert abs(est - n) / n < 0.10, (n, est)


def test_hll_registers_merge_is_max(ray_session):
    import ray.data
    rng = np.random.default_rng(17)
    a = rng.integers(0, 10**8, size=5_000)
    b_ = rng.integers(0, 10**8, size=5_000)
    ta = pa.table({"user_id": pa.array(a, pa.int64())})
    tb = pa.table({"user_id": pa.array(b_, pa.int64())})
    tall = pa.table({"user_id": pa.array(np.concatenate([a, b_]),
                                         pa.int64())})
    ra = _regs_pd(hll_registers(ray.data.from_arrow(ta), "user_id"))
    rb = _regs_pd(hll_registers(ray.data.from_arrow(tb), "user_id"))
    rall = _regs_pd(hll_registers(ray.data.from_arrow(tall), "user_id"))
    merged = (pd.concat([ra, rb]).groupby("bucket", as_index=False)["rho"]
              .max().sort_values("bucket").reset_index(drop=True))
    pd.testing.assert_frame_equal(merged, rall)


def test_cms_counters_match_duckdb(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.sketch import cms_counters

    cd_values = ", ".join(f"({d}, {cd}, {dd})"
                          for d, (cd, dd) in enumerate(CMS_CD))
    rng = np.random.default_rng(43)
    vals = rng.zipf(1.5, size=30_000) % 5000  # skewed, with hot keys
    t = pa.table({"user_id": pa.array(vals, pa.int64())})
    out = (cms_counters(ray.data.from_arrow(t).repartition(5), "user_id")
           .to_pandas().sort_values(["depth", "bucket"])
           .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH x AS (
            SELECT ((user_id % {M61}) + {M61}) % {M61} AS x, COUNT(*) AS c
            FROM t WHERE user_id IS NOT NULL GROUP BY 1
        ), {_hash61_sql('x', ', c')}, g AS (
            SELECT d.d AS depth,
                   CAST(((CAST(h AS HUGEINT) * d.cd + d.dd) % {M61})
                        % 1024 AS BIGINT) AS bucket, c
            FROM hf CROSS JOIN (VALUES {cd_values}) d(d, cd, dd)
        )
        SELECT CAST(depth AS BIGINT) AS depth, bucket,
               CAST(SUM(c) AS BIGINT) AS cnt
        FROM g GROUP BY depth, bucket ORDER BY depth, bucket
    """).df()
    pd.testing.assert_frame_equal(
        out.astype({"depth": "int64", "bucket": "int64", "cnt": "int64"}),
        exp.astype({"depth": "int64", "bucket": "int64", "cnt": "int64"}))


def test_cms_point_query_bounds(ray_session):
    import ray.data
    from collections import Counter

    from pdf_inspector_ray.functions.sketch import cms_counters, cms_query

    rng = np.random.default_rng(11)
    vals = np.concatenate([np.full(2_000, 7),       # one hot key
                           rng.integers(0, 400, size=8_000)])
    true = Counter(vals.tolist())
    t = pa.table({"user_id": pa.array(vals, pa.int64())})
    counters = pa.table(
        {c: [r[c] for r in cms_counters(
            ray.data.from_arrow(t).repartition(3), "user_id").take_all()]
         for c in ("depth", "bucket", "cnt")})
    n = len(vals)
    for v in (7, 0, 100, 399):
        est = cms_query(counters, v)
        assert est >= true[v]                       # never underestimates
        # classic bound: overestimate ≤ 2e/width · n w.h.p.
        assert est - true[v] <= (2 * np.e / 1024) * n


def test_sketches_on_string_column_md5_fallback(ray_session):
    """Non-integer columns take the documented md5 slow path; registers
    must still merge and estimate sanely."""
    import ray.data
    from pdf_inspector_ray.functions.sketch import cms_counters, cms_query

    vals = [f"u{i % 800}" for i in range(6_000)]
    t = pa.table({"k": pa.array(vals)})
    regs = hll_registers(ray.data.from_arrow(t).repartition(3), "k")
    est = hll_estimate(pa.Table.from_pandas(regs.to_pandas()))
    assert abs(est - 800) / 800 < 0.15
    counters = pa.Table.from_pandas(
        cms_counters(ray.data.from_arrow(t).repartition(3), "k").to_pandas())
    assert cms_query(counters, "u5") >= 6_000 // 800


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    """Two-pass heavy hitters must return EXACTLY the GROUP BY/HAVING
    set — including a planted hitter spread thin across many batches
    (the completeness risk the pigeonhole bound covers) and a value
    just below threshold."""
    import ray.data
    from collections import Counter

    from pdf_inspector_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    # background: ~6k distinct values with small counts
    bg = rng.integers(10_000, 16_000, size=40_000)
    # planted: value 7 appears exactly 120× (≥ threshold) spread evenly;
    # value 8 appears 99× (just below threshold 100)
    vals = np.concatenate([bg, np.full(120, 7), np.full(99, 8)])
    vals = vals[rng.permutation(len(vals))]  # thin spread across batches
    true = Counter(vals.tolist())
    min_count = 100
    expected = sorted(((v, c) for v, c in true.items() if c >= min_count),
                      key=lambda t: (-t[1], t[0]))
    t = pa.table({"k": pa.array(vals, pa.int64())})
    out = heavy_hitters(ray.data.from_arrow(t).repartition(64), "k",
                        min_count=min_count, n_rows_hint=len(vals))
    got = list(zip(out["value"].to_pylist(), out["cnt"].to_pylist()))
    assert got == expected
    assert (7, 120) in got and all(v != 8 for v, _ in got)


def test_heavy_hitters_empty_and_nulls(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.sketch import heavy_hitters

    t = pa.table({"k": pa.array([None, None, 1, 1, 2], pa.int64())})
    out = heavy_hitters(ray.data.from_arrow(t), "k", min_count=2,
                        n_rows_hint=5)
    assert (list(zip(out["value"].to_pylist(), out["cnt"].to_pylist()))
            == [(1, 2)])
    none_hit = heavy_hitters(ray.data.from_arrow(t), "k", min_count=10,
                             n_rows_hint=5)
    assert none_hit.num_rows == 0


def test_hll_registers_by_group_consistent_with_global(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.sketch import (hll_estimate,
                                                    hll_registers_by_group)

    rng = np.random.default_rng(53)
    groups = rng.choice(["a", "b"], size=40_000, p=[0.8, 0.2])
    vals = rng.integers(0, 15_000, size=40_000)
    t = pa.table({"event_type": pa.array(groups.tolist()),
                  "user_id": pa.array(vals, pa.int64())})
    regs = (hll_registers_by_group(
                ray.data.from_arrow(t).repartition(5),
                "event_type", "user_id")
            .to_pandas())
    for g in ("a", "b"):
        sub = regs[regs["event_type"] == g]
        est = hll_estimate(pa.table({
            "bucket": pa.array(sub["bucket"], pa.int64()),
            "rho": pa.array(sub["rho"], pa.int64())}))
        true = len(set(vals[groups == g]))
        assert abs(est - true) / true < 0.10, (g, true, est)
    # a group's registers must equal a standalone sketch of its rows
    from pdf_inspector_ray.functions.sketch import hll_registers
    only_a = t.filter(pa.array(groups == "a"))
    ga = (hll_registers(ray.data.from_arrow(only_a), "user_id")
          .to_pandas().sort_values("bucket").reset_index(drop=True))
    sub_a = (regs[regs["event_type"] == "a"][["bucket", "rho"]]
             .sort_values("bucket").reset_index(drop=True))
    pd.testing.assert_frame_equal(sub_a, ga)


def test_seeded_sample_n_deterministic_and_uniformish(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.sketch import (hash61_scalar,
                                                    seeded_sample_n)

    ids = np.arange(10_000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    a = seeded_sample_n(ray.data.from_arrow(t).repartition(7), "doc_id", 40)
    b = seeded_sample_n(ray.data.from_arrow(t).repartition(3), "doc_id", 40)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()  # rerun-stable
    # matches the scalar-hash brute force exactly
    exp = sorted(ids.tolist(), key=lambda i: (hash61_scalar(i), i))[:40]
    assert sorted(a["doc_id"].to_pylist()) == sorted(exp)


def test_heavy_hitters_sizing_contract(ray_session):
    """ADVICE r4: no silent caps — blind sizing and cap-busting hints
    raise; an explicit undersized m warns instead of silently missing
    hitters; non-integer columns raise TypeError up front."""
    import warnings

    import ray.data

    from pdf_inspector_ray.functions.sketch import HH_M_CAP, heavy_hitters

    t = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="n_rows_hint"):
        heavy_hitters(ds, "k", min_count=2)
    with pytest.raises(ValueError, match="HH_M_CAP"):
        heavy_hitters(ds, "k", min_count=1, n_rows_hint=HH_M_CAP)
    with pytest.warns(RuntimeWarning, match="pigeonhole"):
        # (m+1)*min_count = 4 < n_rows_hint = 5 — guarantee broken
        heavy_hitters(ds, "k", min_count=2, n_rows_hint=5, m=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # well-sized explicit m: no warning
        out = heavy_hitters(ds, "k", min_count=2, n_rows_hint=4, m=8)
    assert out["value"].to_pylist() == [1]
    ts = ray.data.from_arrow(pa.table({"k": pa.array(["x", "x"])}))
    with pytest.raises(TypeError, match="integer column"):
        heavy_hitters(ts, "k", min_count=1, n_rows_hint=2)


def test_seeded_sample_n_null_ids_dropped(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.sketch import seeded_sample_n

    t = pa.table({"doc_id": pa.array([1, None, 2, None, 3], pa.int64())})
    out = seeded_sample_n(ray.data.from_arrow(t), "doc_id", 10)
    assert sorted(out["doc_id"].to_pylist()) == [1, 2, 3]
