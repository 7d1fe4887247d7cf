"""Benchmark-decontamination tests: the distributed gram-join pipeline
(functions/decontam.py) against a brute-force per-doc Python oracle and
the DuckDB SQL twin shipped in ``oracle_sql()``."""
import hashlib
import re

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_inspector_ray.functions.decontam import (_gram_rows,
                                                  contaminated_train_docs)


def _bp(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10000


def _brute_force(docs: dict[int, str], k: int, train_bp=8000, eval_bp=9000):
    """Per-doc Python recomputation: distinct word k-grams, train docs
    counted per gram shared with ANY eval doc."""
    grams = {}
    for doc_id, text in docs.items():
        toks = [t for t in re.split(r"\s+", text) if t]
        grams[doc_id] = {" ".join(toks[i:i + k])
                         for i in range(len(toks) - k + 1)}
    eval_grams = set()
    for doc_id, g in grams.items():
        if _bp(doc_id) >= eval_bp:
            eval_grams |= g
    out = {}
    for doc_id, g in grams.items():
        if _bp(doc_id) < train_bp:
            hits = len(g & eval_grams)
            if hits:
                out[doc_id] = hits
    return out


def _random_docs(n_docs: int, seed: int, vocab: int = 40) -> dict[int, str]:
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    return {i: " ".join(rng.choice(words, size=rng.integers(0, 25)))
            for i in range(n_docs)}


def test_gram_rows_masks_document_boundaries():
    texts = pa.chunked_array([["a b c d", "c d e", "  x  ", ""]])
    idx, grams = _gram_rows(texts, 3)
    # "c d e" ends doc 0 + starts doc 1 only if windows leaked across rows
    assert grams.to_pylist() == ["a b c", "b c d", "c d e"]
    assert idx.tolist() == [0, 0, 1]
    # short docs (row 2: one token) and empty docs emit nothing


def test_contaminated_train_docs_matches_brute_force(ray_session):
    import ray.data
    docs = _random_docs(300, seed=11)
    # edge cases: whitespace runs, short and empty docs on both splits
    eval_ids = [i for i in docs if _bp(i) >= 9000]
    train_ids = [i for i in docs if _bp(i) < 8000]
    docs[eval_ids[0]] = "  alpha\tbeta \n gamma  delta "
    docs[train_ids[0]] = "alpha beta gamma"          # exactly one 3-gram hit
    docs[train_ids[1]] = "alpha beta"                # < k tokens: no gram
    docs[train_ids[2]] = ""                          # empty: no gram
    # duplicate gram inside one doc must count once (distinct grams)
    docs[train_ids[3]] = "beta gamma delta x beta gamma delta"
    expected = _brute_force(docs, k=3)
    assert docs[train_ids[0]] and expected.get(train_ids[0]) == 1
    assert expected.get(train_ids[3]) == 1

    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    out = (contaminated_train_docs(
               ray.data.from_arrow(t).repartition(4), k=3)
           .to_pandas().set_index("doc_id")["n_hits"].to_dict())
    assert out == expected


def test_contaminated_train_docs_matches_duckdb(ray_session):
    import ray.data
    docs = _random_docs(250, seed=3, vocab=8)
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    out = (contaminated_train_docs(ray.data.from_arrow(t), k=4,
                                   num_partitions=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 10000 AS bp,
                   list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> '') AS w
            FROM t
        ), split AS (
            SELECT doc_id, bp >= 9000 AS is_eval, w FROM toks
            WHERE bp < 8000 OR bp >= 9000
        ), grams AS (
            SELECT DISTINCT doc_id, is_eval,
                   array_to_string(list_slice(w, g.i, g.i + 3), ' ') AS gram
            FROM split, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) g
        ), contaminating AS (SELECT DISTINCT gram FROM grams WHERE is_eval)
        SELECT p.doc_id, COUNT(*) AS n_hits
        FROM grams p JOIN contaminating c USING (gram)
        WHERE NOT p.is_eval
        GROUP BY p.doc_id ORDER BY doc_id
    """).df()
    assert len(out) > 5, "corpus too clean to exercise the join"
    pd.testing.assert_frame_equal(out.astype({"n_hits": "int64"}),
                                  exp.astype({"n_hits": "int64"}))


def test_bloom_primitives_no_false_negatives():
    from pdf_inspector_ray.functions.decontam import (_bloom_positions,
                                                      _bloom_set,
                                                      _bloom_test)
    rng = np.random.default_rng(7)
    m_bits, n_hashes = 1 << 16, 4
    members = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    others = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    bitmap = np.zeros(m_bits >> 6, dtype=np.uint64)
    _bloom_set(bitmap, _bloom_positions(members, m_bits, n_hashes))
    assert _bloom_test(bitmap,
                       _bloom_positions(members, m_bits, n_hashes)).all()
    # 500 keys × 4 probes in 64Ki bits → fp ≈ (2000/65536)^4 ≈ 1e-6;
    # a loose bound still catches a broken probe scheme
    fp = _bloom_test(bitmap, _bloom_positions(others, m_bits, n_hashes))
    assert fp.mean() < 0.01


def test_bloom_prescreen_path_matches_exact(ray_session):
    import ray.data
    docs = _random_docs(400, seed=19, vocab=10)
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    ds = ray.data.from_arrow(t).repartition(4)
    exact = (contaminated_train_docs(ds, k=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bloom = (contaminated_train_docs(ds, k=3, bloom_prescreen=True,
                                     m_bits=1 << 18)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(exact) > 10
    pd.testing.assert_frame_equal(bloom, exact)


def test_bloom_prescreen_shrinks_exchange():
    """A tight filter must drop (nearly) every clean train gram while
    keeping every contaminated one — checked at the primitive level so
    the assertion covers what the prescreen actually ships."""
    from pdf_inspector_ray.functions.decontam import (_bloom_positions,
                                                      _bloom_set,
                                                      _bloom_test,
                                                      _gram_hash)
    eval_grams = pa.array([f"e{i} x y" for i in range(1000)])
    clean_train = pa.array([f"t{i} u v" for i in range(20000)])
    m_bits, n_hashes = 1 << 18, 4
    bitmap = np.zeros(m_bits >> 6, dtype=np.uint64)
    _bloom_set(bitmap, _bloom_positions(_gram_hash(eval_grams),
                                        m_bits, n_hashes))
    kept = _bloom_test(bitmap, _bloom_positions(_gram_hash(clean_train),
                                                m_bits, n_hashes))
    assert kept.mean() < 0.02  # ≥98% of the clean exchange disappears
    shared = _bloom_test(bitmap, _bloom_positions(_gram_hash(eval_grams),
                                                  m_bits, n_hashes))
    assert shared.all()


def test_val_split_docs_never_participate(ray_session):
    import ray.data
    # a gram present ONLY in (train, val) pairs must not count
    val_id = next(i for i in range(10000) if 8000 <= _bp(i) < 9000)
    train_id = next(i for i in range(10000) if _bp(i) < 8000)
    shared = "unique quantum flux marker"
    t = pa.table({"doc_id": pa.array([val_id, train_id], pa.int64()),
                  "text": pa.array([shared, shared])})
    out = contaminated_train_docs(ray.data.from_arrow(t), k=4).to_pandas()
    assert len(out) == 0
