"""Training-data operator tests: dedup (planted duplicates), similarity
recall, text stats, multimodal plumbing, windowed aggregates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_with_dups() -> pa.Table:
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before the night falls down")
    docs = []
    rng = np.random.default_rng(7)
    words = base.split()
    for i in range(40):
        perm = rng.permutation(words).tolist()
        docs.append(" ".join(perm))
    # planted exact dup: 40 == 3
    docs.append(docs[3])
    # planted near dup of 5 (one word changed)
    w = docs[5].split()
    w[4] = "altered"
    docs.append(" ".join(w))
    return pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                     "text": pa.array(docs, pa.string())})


def test_exact_dedup(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.dedup import exact_dedup

    t = _docs_with_dups()
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == t.num_rows - 1  # one exact dup removed
    # representative is the min doc_id
    assert 3 in set(out.doc_id) and 40 not in set(out.doc_id)


def test_minhash_finds_near_dups(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        minhash_lsh_candidates, ngram_jaccard, verify_pairs_jaccard)

    t = _docs_with_dups()
    ds = ray.data.from_arrow(t)
    pairs = minhash_lsh_candidates(ds, bands=32)  # high recall for the test
    lookup = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    verified = verify_pairs_jaccard(pairs, lookup, threshold=0.5).to_pandas()
    got = {tuple(sorted(p)) for p in zip(verified.doc_a, verified.doc_b)}
    assert (3, 40) in got          # exact dup pair found
    assert (5, 41) in got          # near dup pair found
    # verification kernel sanity
    assert ngram_jaccard(lookup[3], lookup[40]) == 1.0
    assert ngram_jaccard(lookup[5], lookup[41]) > 0.5


def test_simhash_and_hamming(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        hamming64, simhash64, simhash_candidates)

    t = _docs_with_dups()
    assert simhash64(t["text"][3].as_py()) == simhash64(t["text"][40].as_py())
    assert hamming64(simhash64(t["text"][5].as_py()),
                     simhash64(t["text"][41].as_py())) <= 16
    pairs = simhash_candidates(ray.data.from_arrow(t)).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs.doc_a, pairs.doc_b)}
    assert (3, 40) in got


def test_brute_force_topk_recall(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.similarity import brute_force_topk

    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((300, 16))
    q = vecs[17]  # query = an existing vector → top-1 must be itself
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    res = brute_force_topk(ray.data.from_arrow(t), q.tolist(), k=5)
    ids = res["vec_id"].to_pylist()
    assert ids[0] == 17
    # exact ground truth via numpy
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    truth = np.argsort(-(vn @ qn))[:5].tolist()
    # float32 storage rounds; compare sets
    assert set(ids) == set(truth)


def test_ivf_topk_overlaps_brute_force(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((400, 16))
    q = vecs[3]
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    bf = set(brute_force_topk(ds, q.tolist(), k=10)["vec_id"].to_pylist())
    ivf = set(ivf_topk(ray.data.from_arrow(t), q.tolist(), k=10,
                       n_clusters=8, nprobe=4)["vec_id"].to_pylist())
    assert 3 in ivf
    assert len(bf & ivf) >= 5  # approximate, but substantial overlap


def test_text_stats_kernels():
    from pdf_inspector_ray.functions.text_stats import (
        doc_stats_batch, lang_id_batch, quality_batch)

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["the cat and the dog 123",
                                    "der hund und die katze"], pa.string())})
    stats = doc_stats_batch(t)
    assert stats["n_chars_computed"].to_pylist() == [23, 22]
    assert stats["n_ws_tokens"].to_pylist() == [6, 5]
    langs = lang_id_batch(t)
    assert langs["lang_pred"].to_pylist() == ["en", "de"]
    q = quality_batch(t)
    assert q["stopword_count"].to_pylist() == [3, 0]


def test_media_plumbing(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.multimodal import (
        MediaFeatureExtractor, synthesize_media_table)

    t = synthesize_media_table(60)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MediaFeatureExtractor, batch_size=16,
                         concurrency=(1, 2), batch_format="pyarrow").to_pandas()
    assert len(out) == 60
    assert all(len(f) == MediaFeatureExtractor.FEATURE_DIM
               for f in out.features)
    # decode stub off → the REAL decode path rejects junk with ValueError
    ex = MediaFeatureExtractor(decode_stub=False)
    if ex._pil is None:
        with pytest.raises(ValueError):
            ex._decode(b"xx", "image")
    with pytest.raises(ValueError):
        ex._decode(b"xx", "subspace")


def test_windowed_events(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.relational import windowed_event_counts

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["ts", "event_type", "value"])
    out = windowed_event_counts(ds, window="hour").to_pandas()
    assert out.n_events.sum() == 1000
    assert (out.groupby(["window_start", "event_type"]).size() == 1).all()


def test_asof_join(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.relational import asof_join_events

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    out = asof_join_events(ds, "purchase", "signup").to_pandas()
    assert len(out) > 0
    # prior ts never after the event ts
    got = out.dropna(subset=["prior_ts"])
    assert (got.prior_ts <= got.ts).all()


def test_session_windows(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.relational import session_windows

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])
    out = session_windows(ds, gap_minutes=30).to_pandas()
    assert out.n_events.sum() == 1000
    assert (out.session_start <= out.session_end).all()
    # sessions of one user never overlap
    for _, grp in out.groupby("user_id"):
        g = grp.sort_values("session_start")
        assert (g.session_start.iloc[1:].values
                > g.session_end.iloc[:-1].values).all()


def test_embedding_neardup_with_verification(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        embedding_neardup_candidates, verify_pairs_cosine)

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((120, 32))
    vecs[77] = vecs[11] + rng.standard_normal(32) * 0.01  # planted near-dup
    t = pa.table({"vec_id": pa.array(range(120), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    cands = embedding_neardup_candidates(ray.data.from_arrow(t), dim=32)
    lookup = {i: vecs[i] for i in range(120)}
    verified = verify_pairs_cosine(cands, lookup, threshold=0.95).to_pandas()
    got = {tuple(sorted(p)) for p in zip(verified.doc_a, verified.doc_b)}
    assert (11, 77) in got
    assert (verified.cos_sim >= 0.95).all()


def test_ivf_topk_recall_vs_exact(ray_session):
    """IVF with a seeded random centroid sample must reach >=0.9 recall of
    the exact top-10 at sf0.01 (VERDICT r01 fix #9)."""
    import ray.data

    from pdf_inspector_ray.functions.similarity import (
        brute_force_topk, ivf_topk)

    path = "/root/testdata/sf0.01/embeddings.parquet"
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    q = t["embedding"][0].as_py()
    bf = set(brute_force_topk(
        ray.data.read_parquet(path), q, k=10)["vec_id"].to_pylist())
    iv = set(ivf_topk(
        ray.data.read_parquet(path), q, k=10, nprobe=8)["vec_id"].to_pylist())
    assert len(bf & iv) / 10 >= 0.9


def test_connected_components_and_kept_docs(ray_session):
    """Label propagation over a chain + a separate pair + isolated nodes:
    components get min-id labels, dedup keeps one doc per component."""
    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        connected_components, neardup_kept_docs)

    # chain 1-2-3-4 (diameter 3 → needs >1 propagation round), pair 10-11
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 3, 10], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 11], pa.int64()),
    }))
    comp = connected_components(pairs)
    labels = {r["node"]: r["label"] for r in comp.take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 10, 11, 99], pa.int64()),
    }))
    kept = sorted(r["doc_id"] for r in neardup_kept_docs(docs, comp).take_all())
    assert kept == [1, 5, 10, 99]


def test_value_quantiles_matches_duckdb(ray_session):
    """Pin value_quantiles to DuckDB's quantile_disc rule (rank ceil(q·n)−1).

    Uses sizes NOT divisible by 20 so ceil(q·n)−1 and floor(q·(n−1))
    disagree — the sf0.01 corpus has exactly 500 docs, which masked the
    old (wrong) floor rule.
    """
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.text_stats import value_quantiles

    rng = np.random.default_rng(7)
    for n in (5003, 502, 11):
        vals = rng.integers(0, 300, size=n)
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        out = value_quantiles(ds, "v")
        con = duckdb.connect()
        tbl = pa.table({"v": pa.array(vals, pa.int64())})  # noqa: F841
        con.register("t", tbl)
        for q in (0.25, 0.5, 0.75, 0.95):
            want = con.execute(
                f"select quantile_disc(v, {q}) from t").fetchone()[0]
            assert out[f"q{int(q*100)}"][0].as_py() == want, (n, q)


def test_top_terms_exact(ray_session):
    import collections

    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.text_stats import top_terms

    docs = ["a b b c", "b c c  d", " a a b "] * 10 + ["zz yy", "yy"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    out = top_terms(ds, k=3)
    counts = collections.Counter(w for d in docs for w in d.split())
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = list(zip(out["term"].to_pylist(), out["cnt"].to_pylist()))
    assert got == expected


def test_hopping_window_counts(ray_session):
    """Each event must appear in exactly window/hop overlapping windows."""
    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.relational import hopping_window_counts

    hour = 3_600_000_000
    ts = [hour // 2 + 1, hour + 5, 2 * hour]  # µs offsets
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
    }))
    out = {r["window_start"].timestamp() * 1e6: (r["n_events"], r["sum_value"])
           for r in hopping_window_counts(ds).take_all()}
    total_events = sum(n for n, _ in out.values())
    assert total_events == 2 * len(ts)  # window/hop = 2 windows per event
    # event at hour+5 is in windows starting at hour and hour-30min
    assert out[float(hour)][0] >= 1


def test_minhash_replica_stress_exact_candidate_count(ray_session):
    """10× replicated corpus: every replica cluster (C(10,2)=45 pairs per
    doc) and every cross-replica near-dup combo must surface exactly once —
    pins recall, pair dedup, and that MAX_BUCKET does not bite on dense
    duplicate clusters."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from pdf_inspector_ray.functions.dedup import minhash_lsh_candidates

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"])
    tables = [pa.table({
        "doc_id": pa.array([d + r * 10000 for d in t["doc_id"].to_pylist()],
                           pa.int64()),
        "text": t["text"],
    }) for r in range(10)]
    ds = ray.data.from_arrow(pa.concat_tables(tables)).repartition(8)
    n = minhash_lsh_candidates(ds).count()
    # 500 docs × C(10,2) replica pairs + 25 near-dup pairs × 10×10 combos
    assert n == 500 * 45 + 25 * 100


def test_verify_pairs_jaccard_distributed_matches_broadcast(ray_session):
    """The join-based corpus-scale verifier must produce exactly the
    broadcast verifier's output."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        minhash_lsh_candidates, verify_pairs_jaccard,
        verify_pairs_jaccard_distributed)

    path = "/root/testdata/sf0.01/documents.parquet"
    docs_t = pq.read_table(path, columns=["doc_id", "text"])
    lookup = dict(zip(docs_t["doc_id"].to_pylist(),
                      docs_t["text"].to_pylist()))
    cands = minhash_lsh_candidates(
        ray.data.read_parquet(path, columns=["doc_id", "text"]))
    bc = verify_pairs_jaccard(cands, lookup).to_pandas()
    cands2 = minhash_lsh_candidates(
        ray.data.read_parquet(path, columns=["doc_id", "text"]))
    docs_ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    dist = verify_pairs_jaccard_distributed(cands2, docs_ds).to_pandas()

    def canon(df):
        return sorted(map(tuple, df[["doc_a", "doc_b", "jaccard"]]
                          .values.tolist()))

    assert canon(bc) == canon(dist)


def test_label_centroids_match_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from pdf_inspector_ray.functions.similarity import label_centroids

    path = "/root/testdata/sf0.001/embeddings.parquet"
    out = label_centroids(
        ray.data.read_parquet(path, columns=["label", "embedding"])).to_pandas()
    t = pq.read_table(path)
    V = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    labels = np.asarray(t["label"].to_pylist())
    for lab in np.unique(labels):
        mean = V[labels == lab].mean(axis=0)
        got = (out[out.label == lab].sort_values("pos")["mean_v"]
               .to_numpy())
        assert np.allclose(got, np.round(mean, 6), atol=1e-6)


def test_oversized_bucket_split_preserves_radius_recall():
    """ADVICE r02 (medium): oversized buckets must not truncate. Direct
    unit test of _pairs_from_bucket_block: 600 docs share one simhash
    band byte (>> MAX_BUCKET=256); every pair within hamming<=bands-1
    must still be emitted, by the pigeonhole subkey split."""
    from pdf_inspector_ray.functions.dedup import (
        MAX_BUCKET, _bucket_key, _pairs_from_bucket_block, hamming64)

    assert MAX_BUCKET == 256
    rng = np.random.default_rng(3)
    bands, width = 8, 8
    band0 = 0xA5  # shared low byte -> all in band-0 bucket key(0, 0xA5)
    hashes = []
    n_base = 60
    bases = [(int(rng.integers(0, 1 << 56)) << 8) | band0
             for _ in range(n_base)]
    for b in bases:
        hashes.append(b)
        for _ in range(9):  # 9 perturbations of <=3 high bits each
            h = b
            for bit in rng.choice(np.arange(8, 64), size=3, replace=False):
                if rng.random() < 0.7:
                    h ^= 1 << int(bit)
            hashes.append(h)
    n = len(hashes)
    assert n == 600
    group = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "bucket": pa.array([_bucket_key(0, 0xA5)] * n, pa.uint64()),
        "subkey": pa.array(hashes, pa.uint64()),
        "part": pa.array([0] * n, pa.int32()),
    })
    out = _pairs_from_bucket_block(group, n_chunks=bands,
                                   own_band_width=width)
    got = set(zip(out["doc_a"].to_pylist(), out["doc_b"].to_pylist()))
    required = {(i, j) for i in range(n) for j in range(i + 1, n)
                if hamming64(hashes[i], hashes[j]) <= bands - 1}
    assert len(required) > 1000  # the test actually exercises the split
    missing = required - got
    assert not missing, f"{len(missing)} within-radius pairs dropped"


def test_simhash_clique_beyond_max_bucket(ray_session):
    """A 300-doc identical-text clique (> MAX_BUCKET) must produce ALL
    C(300,2) verified pairs — the old truncation capped it at C(256,2)."""
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        simhash64, simhash_candidates, verify_pairs_hamming)

    text = "identical duplicate document body repeated many times over"
    uniq = [f"totally unrelated filler text number {i} with extra words {i*7}"
            for i in range(20)]
    docs = [text] * 300 + uniq
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    pairs = simhash_candidates(ray.data.from_arrow(t))
    sh = {i: simhash64(d) for i, d in enumerate(docs)}
    verified = verify_pairs_hamming(pairs, sh, max_hamming=7).to_pandas()
    clique = {(a, b) for a, b in zip(verified.doc_a, verified.doc_b)
              if a < 300 and b < 300}
    assert len(clique) == 300 * 299 // 2


def test_verify_pairs_hamming_drops_missing_ids(ray_session):
    """ADVICE r02: a pair with ids missing from the sidecar must be
    dropped, not verified against sentinel hashes."""
    import ray.data

    from pdf_inspector_ray.functions.dedup import verify_pairs_hamming

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 1, 7, 9], pa.int64()),
        "doc_b": pa.array([2, 3, 8, 1], pa.int64()),
    }))
    sh = {1: 0b1010, 2: 0b1010, 3: 0b1011}  # 7,8,9 missing
    out = verify_pairs_hamming(pairs, sh, max_hamming=7).to_pandas()
    got = set(zip(out.doc_a, out.doc_b))
    assert got == {(1, 2), (1, 3)}


def test_ngram_jaccard_empty_texts_score_zero():
    """ADVICE r02: blank-vs-blank scores 0.0 to match the SQL oracle's
    empty-gram-union exclusion."""
    from pdf_inspector_ray.functions.dedup import ngram_jaccard

    assert ngram_jaccard("", "") == 0.0
    assert ngram_jaccard("   ", " \t ") == 0.0
    assert ngram_jaccard("", "hello world there") == 0.0
    assert ngram_jaccard("a b c d", "a b c d") == 1.0


def test_topk_boundary_ties_keep_smallest_id(ray_session):
    """ADVICE r02: candidates that round to the same 6-dp sim at the k
    boundary must resolve by vec_id asc — including across batches."""
    import ray.data

    from pdf_inspector_ray.functions.similarity import brute_force_topk

    # 40 vectors: 10 distinct "tie groups" of 4 identical vectors each,
    # interleaved so batches see ties at every prune boundary.
    rng = np.random.default_rng(11)
    base = rng.standard_normal((10, 8))
    vecs = np.repeat(base, 4, axis=0)
    ids = list(range(40))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(8)
    q = base[0].tolist()
    res = brute_force_topk(ds, q, k=6)
    got = list(zip(res["vec_id"].to_pylist(), res["cos_sim"].to_pylist()))
    # exact global order on rounded sims
    vn = vecs.astype(np.float32).astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q)
    sims = np.round(vn @ qn, 6)
    order = sorted(range(40), key=lambda i: (-sims[i], i))[:6]
    want = [(i, sims[i]) for i in order]
    assert got == want


def test_neardup_kept_docs_distributed_matches_broadcast(ray_session):
    """VERDICT r02 fix #2: the anti-join path must equal the broadcast
    path on a corpus with a forced-large (80%) duplicate rate, without
    the driver materializing the dropped-id set."""
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        connected_components, neardup_kept_docs)

    # 500 docs in 100 components of 5 → 400 dropped (80%)
    pairs = pa.table({
        "doc_a": pa.array([c * 5 for c in range(100) for _ in range(4)],
                          pa.int64()),
        "doc_b": pa.array([c * 5 + i for c in range(100)
                           for i in range(1, 5)], pa.int64()),
    })
    comp = connected_components(ray.data.from_arrow(pairs))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(520), pa.int64()),  # 20 singletons too
        "text": pa.array([f"doc {i}" for i in range(520)], pa.string()),
    })).repartition(8)
    kept_b = sorted(r["doc_id"] for r in
                    neardup_kept_docs(docs, comp,
                                      distributed=False).take_all())
    kept_d = sorted(r["doc_id"] for r in
                    neardup_kept_docs(docs, comp,
                                      distributed=True).take_all())
    assert kept_b == kept_d
    want = sorted([c * 5 for c in range(100)] + list(range(500, 520)))
    assert kept_d == want
    # gate: tiny dropped set → broadcast; forced-low limit → distributed
    auto = sorted(r["doc_id"] for r in
                  neardup_kept_docs(docs, comp,
                                    broadcast_limit=10).take_all())
    assert auto == want


def test_distributed_verifiers_match_broadcast_sf01(ray_session):
    """VERDICT r02 fix #5: the join-based hamming/cosine/jaccard verifiers
    must equal the broadcast ones at sf0.1 (the scale the driver does NOT
    test), so the size-gated query path is provably interchangeable."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        embedding_neardup_candidates, simhash_batch, simhash_candidates,
        verify_pairs_cosine, verify_pairs_cosine_distributed,
        verify_pairs_hamming, verify_pairs_hamming_distributed,
        verify_pairs_jaccard, verify_pairs_jaccard_distributed)

    sf = "/root/testdata/sf0.1"
    doc_path = f"{sf}/documents.parquet"
    emb_path = f"{sf}/embeddings.parquet"

    # -- hamming over simhash candidates -------------------------------
    docs_t = pq.read_table(doc_path, columns=["doc_id", "text"])
    sh_t = simhash_batch(docs_t)
    lookup = dict(zip(sh_t["doc_id"].to_pylist(),
                      sh_t["simhash"].to_pylist()))
    cands = simhash_candidates(
        ray.data.read_parquet(doc_path, columns=["doc_id", "text"]))
    bc = verify_pairs_hamming(cands, lookup, max_hamming=7).to_pandas()
    cands2 = simhash_candidates(
        ray.data.read_parquet(doc_path, columns=["doc_id", "text"]))
    dist = verify_pairs_hamming_distributed(
        cands2, ray.data.from_arrow(sh_t), max_hamming=7).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b", "hamming"]]
                                .values.tolist()))
    assert key(bc) == key(dist) and len(bc) > 0

    # -- cosine over embedding candidates ------------------------------
    emb_t = pq.read_table(emb_path)
    vectors = {i: np.asarray(v, dtype=np.float64) for i, v in
               zip(emb_t["vec_id"].to_pylist(),
                   emb_t["embedding"].to_pylist())}
    ec = embedding_neardup_candidates(ray.data.read_parquet(emb_path),
                                      axis_aligned=True)
    bc2 = verify_pairs_cosine(ec, vectors, threshold=0.3).to_pandas()
    ec2 = embedding_neardup_candidates(ray.data.read_parquet(emb_path),
                                       axis_aligned=True)
    dist2 = verify_pairs_cosine_distributed(
        ec2, ray.data.read_parquet(emb_path), threshold=0.3).to_pandas()
    key2 = lambda df: sorted(map(tuple, df[["doc_a", "doc_b", "cos_sim"]]
                                 .values.tolist()))
    assert key2(bc2) == key2(dist2) and len(bc2) > 0


# -- generic large-large hash join ------------------------------------------

def _join_sides():
    rng = np.random.default_rng(11)
    left = pa.table({
        "okey": pa.array(range(100), pa.int64()),
        "priority": pa.array([f"P{i % 5}" for i in range(100)], pa.string()),
    })
    # ~3 right rows per key, keys 20..119 so both sides have unmatched keys
    rk = np.repeat(np.arange(20, 120), 3)
    right = pa.table({
        "lkey": pa.array(rk, pa.int64()),
        "amount": pa.array(np.round(rng.uniform(1, 100, len(rk)), 2),
                           pa.float64()),
    })
    return left, right


def test_hash_join_inner_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import hash_join

    left, right = _join_sides()
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="okey", right_on="lkey", num_partitions=8).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("""
        SELECT okey, priority, amount FROM l JOIN r ON okey = lkey
    """).df()
    key = lambda df: sorted(map(tuple, df[["okey", "priority", "amount"]]
                                .values.tolist()))
    assert key(out) == key(exp)
    assert len(out) == 240  # keys 20..99 x 3


def test_hash_join_outer_semi_anti(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import hash_join

    left, right = _join_sides()

    louter = hash_join(ray.data.from_arrow(left),
                       ray.data.from_arrow(right), on="okey",
                       right_on="lkey", join_type="left outer",
                       num_partitions=8).to_pandas()
    # unmatched left keys 0..19 appear once with null amount
    unmatched = louter[louter["amount"].isna()]
    assert sorted(unmatched["okey"]) == list(range(20))
    assert len(louter) == 240 + 20

    semi = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="okey", right_on="lkey", join_type="left semi",
                     num_partitions=8).to_pandas()
    assert sorted(semi["okey"]) == list(range(20, 100))
    assert list(semi.columns) == ["okey", "priority"]

    anti = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="okey", right_on="lkey", join_type="left anti",
                     num_partitions=8).to_pandas()
    assert sorted(anti["okey"]) == list(range(20))


def test_hash_join_salted_matches_unsalted(ray_session):
    """Skew salting must not change ANY allowed join's result: hot left
    rows spread over salt sub-partitions, hot right rows replicate into
    all of them, so every pair still meets exactly once."""
    import ray.data
    from pdf_inspector_ray.functions.relational import hash_join

    rng = np.random.default_rng(29)
    # 70% of left rows hit key 42 (the hot key); right has multiplicity 3
    # on it so inner-join fan-out is exercised, plus unmatched rows on
    # both sides for the outer/semi/anti paths
    lkey = np.where(rng.random(4000) < 0.7, 42,
                    rng.integers(0, 50, size=4000))
    left = pa.table({"k": pa.array(lkey, pa.int64()),
                     "lv": pa.array(np.arange(4000), pa.int64())})
    rkey = np.concatenate([[42, 42, 42], np.arange(30, 60)])
    right = pa.table({"rk": pa.array(rkey, pa.int64()),
                      "rv": pa.array(np.arange(len(rkey)), pa.int64())})

    for jt in ("inner", "left outer", "left semi", "left anti"):
        plain = (hash_join(ray.data.from_arrow(left).repartition(4),
                           ray.data.from_arrow(right), on="k",
                           right_on="rk", join_type=jt, num_partitions=16)
                 .to_pandas())
        salted = (hash_join(ray.data.from_arrow(left).repartition(4),
                            ray.data.from_arrow(right), on="k",
                            right_on="rk", join_type=jt, num_partitions=16,
                            hot_keys=[42], salt=4)
                  .to_pandas())
        cols = list(plain.columns)
        pd.testing.assert_frame_equal(
            plain.sort_values(cols).reset_index(drop=True),
            salted.sort_values(cols).reset_index(drop=True))

    with pytest.raises(ValueError, match="replicates"):
        hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  on="k", right_on="rk", join_type="right outer",
                  hot_keys=[42])


def test_hash_join_salting_balances_zipf_skew(ray_session):
    """VERDICT r3 #6: at real Zipf skew (hottest key ≈30% of rows) the
    salted exchange must (a) produce the identical result and (b) cut
    the hottest partition's row share by ≈ the salt factor. The spread
    is computed with the join's own partitioner constants
    (relational.PART_MULT/SALT_MULT), so it measures the real exchange."""
    import ray.data
    from pdf_inspector_ray.functions.relational import (PART_MULT,
                                                        SALT_MULT,
                                                        hash_join)

    rng = np.random.default_rng(97)
    n = 60_000
    zipf = rng.zipf(1.25, size=n)
    key = np.where(zipf == 1, 1, 1 + (zipf % 997)).astype(np.int64)
    hot_share = (key == 1).mean()
    assert 0.2 < hot_share < 0.45, hot_share  # genuinely skewed input
    left = pa.table({"k": pa.array(key, pa.int64()),
                     "lv": pa.array(np.arange(n), pa.int64())})
    rkey = np.arange(1, 998, dtype=np.int64)
    right = pa.table({"rk": pa.array(rkey, pa.int64()),
                      "rv": pa.array(rkey * 10, pa.int64())})

    num_partitions, salt = 64, 8
    plain = (hash_join(ray.data.from_arrow(left).repartition(8),
                       ray.data.from_arrow(right), on="k", right_on="rk",
                       num_partitions=num_partitions)
             .to_pandas())
    salted = (hash_join(ray.data.from_arrow(left).repartition(8),
                        ray.data.from_arrow(right), on="k", right_on="rk",
                        num_partitions=num_partitions,
                        hot_keys=[1], salt=salt)
              .to_pandas())
    cols = list(plain.columns)
    pd.testing.assert_frame_equal(
        plain.sort_values(cols).reset_index(drop=True),
        salted.sort_values(cols).reset_index(drop=True))

    # exchange balance: left-row partition histogram under both plans
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
    max_plain = np.bincount(part_plain.astype(int),
                            minlength=num_partitions).max() / n
    max_salted = np.bincount(part_salted.astype(int),
                             minlength=num_partitions).max() / n
    assert max_plain >= hot_share          # hot key pins one partition
    assert max_salted < hot_share / 2      # salting spreads it ≥2× (≈salt×)
    assert max_salted < max_plain / 2


def test_hash_join_column_collision_raises(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import hash_join

    left, _ = _join_sides()
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(ray.data.from_arrow(left), ray.data.from_arrow(left),
                  on="okey")


def test_order_priority_revenue_matches_duckdb(ray_session):
    import os

    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import order_priority_revenue

    sf = "/root/testdata/sf0.001"
    orders = ray.data.read_parquet(
        os.path.join(sf, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])
    lineitem = ray.data.read_parquet(
        os.path.join(sf, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    out = order_priority_revenue(orders, lineitem).to_pandas()

    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM '{sf}/orders.parquet' JOIN '{sf}/lineitem.parquet'
            ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """).df()
    out = out.sort_values("o_orderpriority").reset_index(drop=True)
    assert list(out["o_orderpriority"]) == list(exp["o_orderpriority"])
    assert np.allclose(out["revenue"], exp["revenue"], atol=0.02)


def test_revenue_by_nation_matches_duckdb(ray_session):
    import os

    import duckdb
    import pyarrow.parquet as pq
    import ray.data
    from pdf_inspector_ray.functions.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    customer = ray.data.read_parquet(
        os.path.join(sf, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    lineitem = ray.data.read_parquet(
        os.path.join(sf, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    nation = pq.read_table(os.path.join(sf, "nation.parquet"))
    region = pq.read_table(os.path.join(sf, "region.parquet"))
    out = (revenue_by_nation(customer, orders, lineitem, nation, region,
                             region_name="EUROPE")
           .to_pandas().sort_values("n_name").reset_index(drop=True))

    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM '{sf}/customer.parquet'
        JOIN '{sf}/nation.parquet' ON c_nationkey = n_nationkey
        JOIN '{sf}/region.parquet' ON n_regionkey = r_regionkey
        JOIN '{sf}/orders.parquet' ON o_custkey = c_custkey
        JOIN '{sf}/lineitem.parquet' ON l_orderkey = o_orderkey
        WHERE r_name = 'EUROPE'
        GROUP BY n_name ORDER BY n_name
    """).df()
    assert len(out) > 0 and list(out["n_name"]) == list(exp["n_name"])
    assert np.allclose(out["revenue"], exp["revenue"], atol=0.02)


def test_repetition_stats_matches_brute_force():
    import re
    from collections import Counter

    from pdf_inspector_ray.functions.text_stats import repetition_stats_batch

    texts = ["a b a b a", "x y z", "", "  q  q\tq ", "solo",
             "w1 w2 w1 w2 w1 w2 w1 w2"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_stats_batch(t).to_pandas()
    for i, text in enumerate(texts):
        toks = [x for x in re.split(r"\s+", text) if x]
        row = out.iloc[i]
        assert row["n_words"] == len(toks)
        assert row["top_word_count"] == (max(Counter(toks).values())
                                         if toks else 0)
        for k, (ncol, fcol) in ((2, ("n_2grams", "dup_2gram_frac")),
                                (3, ("n_3grams", "dup_3gram_frac"))):
            grams = [" ".join(toks[j:j + k])
                     for j in range(len(toks) - k + 1)]
            assert row[ncol] == len(grams)
            exp = ((len(grams) - len(set(grams))) / len(grams)
                   if grams else 0.0)
            assert row[fcol] == exp


def test_top_revenue_orders_matches_duckdb(ray_session):
    import os

    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import top_revenue_orders

    sf = "/root/testdata/sf0.001"
    lineitem = ray.data.read_parquet(
        os.path.join(sf, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    out = top_revenue_orders(lineitem, k=50).to_pandas()
    exp = duckdb.sql(f"""
        WITH rev AS (
            SELECT l_orderkey,
                   SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount))
                                  * 100 + 0.5) AS BIGINT)) AS cents
            FROM '{sf}/lineitem.parquet' GROUP BY l_orderkey
        )
        SELECT l_orderkey, CAST(cents AS DOUBLE) / 100 AS revenue
        FROM rev ORDER BY revenue DESC, l_orderkey LIMIT 50
    """).df()
    # limit feeds from the sorted stream — row ORDER itself must match,
    # and integer-cents accumulation makes values exactly equal
    assert list(out["l_orderkey"]) == list(exp["l_orderkey"])
    assert list(out["revenue"]) == list(exp["revenue"])


def test_extract_json_int_edge_cases():
    from pdf_inspector_ray.functions.json_ops import extract_json_int_batch

    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "props": ['{"k": 42}', '{"k":-7, "j": 1}', '{"j": 5}',
                  'not json', '', '{ "k" : 0 }'],
    })
    out = extract_json_int_batch(t).to_pandas()
    assert out["k"][0] == 42 and out["k"][1] == -7 and out["k"][5] == 0
    assert out["k"][2:5].isna().all()


def test_json_int_sum_by_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.json_ops import json_int_sum_by_group

    rng = np.random.default_rng(23)
    groups = rng.choice(["a", "b", "c"], size=200)
    vals = rng.integers(-50, 50, size=200)
    props = [f'{{"k": {v}}}' if i % 7 else '{"other": 1}'
             for i, v in enumerate(vals)]
    t = pa.table({"event_type": pa.array(groups.tolist()),
                  "props": pa.array(props)})
    out = (json_int_sum_by_group(ray.data.from_arrow(t).repartition(3),
                                 "event_type")
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    exp = duckdb.sql(r"""
        SELECT event_type,
               SUM(TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                   AS BIGINT)) AS sum_v,
               COUNT(TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                     AS BIGINT)) AS n_v
        FROM t GROUP BY event_type ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(
        out.astype({"sum_v": "int64", "n_v": "int64"}),
        exp.astype({"sum_v": "int64", "n_v": "int64"}))


def test_range_join_basic_and_unmatched(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import range_join

    # two keys in the same hash partition + one key with no intervals;
    # probes at exact boundaries, inside, in gaps, and before any interval
    left = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "ts": pa.array([5, 10, 15, 20, 25, 7, 99, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "win_start": pa.array([5, 18, 6], pa.int64()),
        "win_end": pa.array([12, 22, 8], pa.int64()),
    })
    out = range_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right.rename_columns(
            ["user_id", "win_start", "win_end"])),
        key="user_id", left_ts="ts", right_start="win_start",
        right_end="win_end", num_partitions=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    # matched: e0 (ts=5 start-boundary), e1 (ts=10 inside), e3 (ts=20),
    #          e5 (user2 ts=7); dropped: e2 (gap 15), e4 (after), e6
    #          (user2 ts=99), e7 (user3: no intervals)
    assert list(out["event_id"]) == [0, 1, 3, 5]
    assert list(out["win_start"]) == [5, 5, 18, 6]
    assert list(out["win_end"]) == [12, 12, 22, 8]


def test_range_join_matches_duckdb_on_random(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import range_join

    rng = np.random.default_rng(3)
    n_keys = 17
    ivs = []
    for k in range(n_keys):
        t = 0
        for _ in range(rng.integers(0, 5)):
            t += int(rng.integers(5, 30))
            s, e = t, t + int(rng.integers(1, 10))
            ivs.append((k, s, e))
            t = e
    right = pa.table({
        "k": pa.array([i[0] for i in ivs], pa.int64()),
        "s": pa.array([i[1] for i in ivs], pa.int64()),
        "e": pa.array([i[2] for i in ivs], pa.int64()),
    })
    left = pa.table({
        "row_id": pa.array(range(400), pa.int64()),
        "k": pa.array(rng.integers(0, n_keys, 400), pa.int64()),
        "t": pa.array(rng.integers(0, 150, 400), pa.int64()),
    })
    out = range_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     key="k", left_ts="t", right_start="s", right_end="e",
                     num_partitions=8).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("""
        SELECT row_id, l.k, t, s, e FROM l JOIN r
            ON l.k = r.k AND l.t BETWEEN r.s AND r.e
    """).df()
    key = lambda df: sorted(map(tuple, df[["row_id", "s", "e"]]
                                .values.tolist()))
    assert key(out) == key(exp) and len(out) > 0


def test_assign_split_deterministic_and_matches_duckdb():
    import duckdb
    import hashlib
    from pdf_inspector_ray.functions.text_stats import assign_split_batch

    batch = pa.table({"doc_id": pa.array(range(501), pa.int64())})
    out = assign_split_batch(batch)
    out2 = assign_split_batch(batch)
    assert out.equals(out2)  # stable
    con = duckdb.connect()
    con.register("d", batch)
    exp = con.execute("""
        SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10000 AS bp
        FROM d ORDER BY doc_id
    """).df()
    assert list(out["split_bp"].to_pylist()) == list(exp["bp"])
    # fractions roughly honored
    splits = out["split"].to_pylist()
    assert 0.7 < splits.count("train") / len(splits) < 0.9
    assert {"train", "val", "test"} == set(splits)


def test_top_terms_by_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import top_terms_by_group

    rng = np.random.default_rng(13)
    vocab = {"en": ["the", "fox", "dog", "runs"],
             "fr": ["le", "renard", "chien"],
             "de": ["der", "fuchs", "hund"]}
    rows = []
    for i in range(120):
        lang = ["en", "fr", "de"][i % 3]
        words = rng.choice(vocab[lang], size=rng.integers(3, 12)).tolist()
        rows.append((lang, " ".join(words)))
    docs = pa.table({"lang": pa.array([r[0] for r in rows]),
                     "text": pa.array([r[1] for r in rows])})
    out = top_terms_by_group(ray.data.from_arrow(docs),
                             group_column="lang", k=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(r"""
        WITH toks AS (
            SELECT lang, unnest(list_filter(
                regexp_split_to_array(text, '\s+'), w -> w <> '')) AS term
            FROM documents
        ), counts AS (
            SELECT lang, term, COUNT(*) AS cnt FROM toks GROUP BY lang, term
        )
        SELECT lang, term, cnt FROM counts
        QUALIFY row_number() OVER
            (PARTITION BY lang ORDER BY cnt DESC, term ASC) <= 2
    """).df()
    key = lambda df: sorted(map(tuple, df[["lang", "term", "cnt"]]
                                .values.tolist()))
    assert key(out) == key(exp)
    assert len(out) == 6  # 2 per language


def test_hash_join_and_range_join_null_keys_dropped(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import hash_join, range_join

    left = pa.table({
        "okey": pa.array([1, None, 3], pa.int64()),
        "lval": pa.array(["a", "b", "c"], pa.string()),
    })
    right = pa.table({
        "rkey": pa.array([1, 3, None], pa.int64()),
        "rval": pa.array([10, 30, 99], pa.int64()),
    })
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="okey", right_on="rkey",
                    num_partitions=4).to_pandas()
    assert sorted(out["okey"]) == [1, 3]  # null keys never match

    ev = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([5, None, 7], pa.int64()),
        "user_id": pa.array([1, 1, None], pa.int64()),
    })
    iv = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "s": pa.array([0, None], pa.int64()),
        "e": pa.array([10, None], pa.int64()),
    })
    out2 = range_join(ray.data.from_arrow(ev), ray.data.from_arrow(iv),
                      key="user_id", left_ts="ts", right_start="s",
                      right_end="e", num_partitions=4).to_pandas()
    assert list(out2["event_id"]) == [0]  # null ts/key/bounds all dropped


def test_rolling_fingerprint_vectorized_matches_scalar():
    import random
    from pdf_inspector_ray.functions.text_stats import (
        _rolling_fingerprint, _rolling_fingerprint_scalar)

    rng = random.Random(11)
    cases = ["", "a", "x" * 15, "x" * 16, "x" * 17, "é" * 40,
             "\xff" * 500,            # 0xff bytes maximize table entries
             "￿" * 300]          # 3-byte utf-8, all-0xbf/0xef tails
    for _ in range(150):
        n = rng.randint(0, 500)
        cases.append("".join(chr(rng.randint(0, 0x2FFF)) for _ in range(n)))
    for t in cases:
        assert _rolling_fingerprint(t) == _rolling_fingerprint_scalar(t), repr(t[:30])


def test_running_totals_window(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import running_totals

    t = pa.table({
        "event_id": pa.array([3, 1, 2, 10, 11], pa.int64()),
        "ts": pa.array([200, 100, 100, 50, 40], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([1.25, 2.5, 0.999, 10.0, None], pa.float64()),
    })
    out = (running_totals(ray.data.from_arrow(t)).to_pandas()
           .sort_values(["user_id", "rn"]).reset_index(drop=True))
    # user 1 order: (100,1) (100,2) (200,3) — ties broken by event_id
    u1 = out[out.user_id == 1]
    assert list(u1.event_id) == [1, 2, 3]
    assert list(u1.rn) == [1, 2, 3]
    # cents: floor(2.5*100)=250, floor(0.999*100)=99, floor(1.25*100)=125
    assert list(u1.cum_cents) == [250, 349, 474]
    assert pd.isna(u1.gap_us.iloc[0]) and list(u1.gap_us.iloc[1:]) == [0, 100]
    u2 = out[out.user_id == 2]
    assert list(u2.event_id) == [11, 10]      # ts order 40 < 50
    assert list(u2.cum_cents) == [0, 1000]    # null value -> 0 cents


def test_distinct_count_ignores_nulls(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import distinct_count

    t = pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "user_id": pa.array([1, 1, None, 2, 3], pa.int64()),
    })
    out = (distinct_count(ray.data.from_arrow(t), "event_type", "user_id",
                          alias="n_users").to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    assert list(out.event_type) == ["a", "b"]
    assert list(out.n_users) == [1, 2]


def test_grouped_quantiles_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import grouped_quantiles

    rng = np.random.default_rng(5)
    # group sizes NOT divisible by 20 — exercises the ceil(q·n)−1 rule
    langs = ["en"] * 37 + ["de"] * 13 + ["fr"] * 101
    vals = rng.integers(0, 50, size=len(langs))
    t = pa.table({"lang": pa.array(langs), "n_chars": pa.array(vals, pa.int64())})
    out = (grouped_quantiles(ray.data.from_arrow(t), "lang", "n_chars")
           .to_pandas().sort_values("lang").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT lang, quantile_disc(n_chars, 0.25) AS q25,
               quantile_disc(n_chars, 0.50) AS q50,
               quantile_disc(n_chars, 0.75) AS q75,
               quantile_disc(n_chars, 0.95) AS q95
        FROM t GROUP BY lang ORDER BY lang
    """).df()
    pd.testing.assert_frame_equal(out.astype({"q25": "int64", "q50": "int64",
                                              "q75": "int64", "q95": "int64"}),
                                  exp.astype({"q25": "int64", "q50": "int64",
                                              "q75": "int64", "q95": "int64"}))


def test_term_doc_frequency_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import term_doc_frequency

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(400)]
    texts += ["", "  ", "w0 w0 w0"]  # dup terms in one doc count once
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (term_doc_frequency(ray.data.from_arrow(t).repartition(5),
                              min_df=3)
           .to_pandas().sort_values("term").reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH toks AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '') AS w FROM t
        ), pairs AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM toks)
        SELECT term, COUNT(*) AS df FROM pairs
        GROUP BY term HAVING COUNT(*) >= 3 ORDER BY term
    """).df()
    assert len(out) > 50
    pd.testing.assert_frame_equal(out.astype({"df": "int64"}),
                                  exp.astype({"df": "int64"}))


def test_tfidf_top_terms_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import tfidf_top_terms

    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(120)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(300)]
    texts += ["", "w0 w1"]  # short/empty docs; ties (equal tf, equal df)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (tfidf_top_terms(ray.data.from_arrow(t).repartition(4),
                           n_docs=t.num_rows, k=3, min_df=2)
           .to_pandas().sort_values(["doc_id", "term"])
           .reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH toks AS (
            SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '') AS w FROM t
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(w) AS term FROM toks)
            GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, term FROM tf)
            GROUP BY term HAVING COUNT(*) >= 2
        )
        SELECT doc_id, term, tf,
               tf * (CAST((SELECT COUNT(*) FROM t) AS DOUBLE) / df)
                   AS score
        FROM tf JOIN df USING (term)
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) <= 3
        ORDER BY doc_id, term
    """).df()
    assert len(out) > 500
    pd.testing.assert_frame_equal(
        out.astype({"tf": "int64"}), exp.astype({"tf": "int64"}))


def test_jaccard_prefix_candidates_complete(ray_session):
    """Prefix filtering is EXACT-recall: every pair with J >= tau that a
    brute-force sweep finds must appear in the candidate set, across
    thresholds, including short (<k tokens), empty and duplicate docs."""
    import itertools

    import ray.data

    from pdf_inspector_ray.functions.dedup import (
        jaccard_prefix_candidates, ngram_jaccard, verify_pairs_jaccard)

    rng = np.random.default_rng(97)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(120):
        base = list(rng.choice(vocab, size=rng.integers(5, 25)))
        texts.append(" ".join(base))
        if rng.random() < 0.5:  # planted near-dup: light edit
            mut = base.copy()
            if rng.random() < 0.5 and len(mut) > 6:
                del mut[rng.integers(0, len(mut))]
            else:
                mut[rng.integers(0, len(mut))] = str(
                    rng.choice(vocab))
            texts.append(" ".join(mut))
    texts += ["", "   ", "one", "one two", "one two", "a b c",
              texts[0], texts[0]]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    lookup = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for tau in (0.5, 0.8):
        truth = {
            (a, b)
            for a, b in itertools.combinations(sorted(lookup), 2)
            if round(ngram_jaccard(lookup[a], lookup[b]), 6) >= tau
        }
        cands = jaccard_prefix_candidates(
            ray.data.from_arrow(t).repartition(4), threshold=tau)
        c = cands.to_pandas()
        got_cands = {tuple(sorted(p)) for p in zip(c.doc_a, c.doc_b)}
        assert truth <= got_cands, (tau, truth - got_cands)
        verified = verify_pairs_jaccard(cands, lookup,
                                        threshold=tau).to_pandas()
        got = {tuple(sorted(p))
               for p in zip(verified.doc_a, verified.doc_b)}
        assert got == truth, (tau, got ^ truth)


def test_regex_redact_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.scrub import PII_RULES, regex_redact

    texts = [
        "contact me at bob.smith+spam@example.co.uk or on +1 (555) 123-4567",
        "see https://example.com/a?b=c&d=e and http://foo.bar/baz too",
        "no pii here at all",
        "",
        "double email a@b.io c@d.org and url https://x.y inside text",
        "digits 1234567890 and short 123 should differ",
        "unicode café ÉMAIL über@straße.de maybe",
        "a@b.io a@b.io a@b.io",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (regex_redact(ray.data.from_arrow(t).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    p0, p1, p2 = (p for p, _ in PII_RULES)
    exp = duckdb.sql(f"""
        WITH s0 AS (SELECT doc_id, text AS t0 FROM t),
        s1 AS (SELECT doc_id, len(regexp_extract_all(t0, '{p0}')) AS n_rule0,
                      regexp_replace(t0, '{p0}', '<URL>', 'g') AS t1 FROM s0),
        s2 AS (SELECT doc_id, n_rule0,
                      len(regexp_extract_all(t1, '{p1}')) AS n_rule1,
                      regexp_replace(t1, '{p1}', '<EMAIL>', 'g') AS t2 FROM s1),
        s3 AS (SELECT doc_id, n_rule0, n_rule1,
                      len(regexp_extract_all(t2, '{p2}')) AS n_rule2,
                      regexp_replace(t2, '{p2}', '<PHONE>', 'g') AS t3 FROM s2)
        SELECT doc_id, t3 AS clean_text, n_rule0, n_rule1, n_rule2,
               n_rule0 + n_rule1 + n_rule2 AS n_redactions
        FROM s3 ORDER BY doc_id
    """).df()
    assert out.n_redactions.sum() > 5
    pd.testing.assert_frame_equal(
        out, exp.astype({c: "int64" for c in
                         ("n_rule0", "n_rule1", "n_rule2", "n_redactions")}))


def test_normalize_text_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.scrub import normalize_text

    texts = ["  Hello   WORLD \t\n mixed\tCase  ", "", "  \t ", "Éclair CAFÉ",
             "one", "a  b\r\nc"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (normalize_text(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql(r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                   AS norm_text,
               length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS n_chars_norm
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        out, exp.astype({"n_chars_norm": "int64"}))


def test_rollup_agg_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import rollup_agg

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table({
        "status": pa.array(rng.choice(["A", "B", "C"], n).tolist()),
        "prio": pa.array(rng.choice(["1-HI", "2-LO"], n).tolist()),
        "price": pa.array(np.round(rng.uniform(1, 900, n), 2)),
    })
    out = (pa.Table.from_pandas(
        rollup_agg(ray.data.from_arrow(t).repartition(4),
                   ["status", "prio"], "price").to_pandas())
           .to_pandas().sort_values(["status", "prio"], na_position="first")
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT status, prio,
               CAST(SUM(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               COUNT(*) AS n_rows
        FROM t GROUP BY ROLLUP(status, prio)
        ORDER BY status NULLS FIRST, prio NULLS FIRST
    """).df()
    assert len(out) == 3 * 2 + 3 + 1
    pd.testing.assert_frame_equal(out, exp.astype({"n_rows": "int64"}))


def test_pivot_counts_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import pivot_counts

    rng = np.random.default_rng(11)
    n = 600
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["click", "view", "buy", "other"], n).tolist()),
    })
    out = (pivot_counts(ray.data.from_arrow(t).repartition(5),
                        "user_id", "event_type", ["click", "view", "buy"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'view') AS n_view,
               COUNT(*) FILTER (event_type = 'buy') AS n_buy
        FROM t GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(
        out, exp.astype({c: "int64" for c in ("n_click", "n_view", "n_buy")}))


def test_value_histogram_and_grouped_topk_match_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import (
        grouped_topk, value_histogram)

    rng = np.random.default_rng(5)
    n = 700
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "event_id": pa.array(range(n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(-40, 200, n), 3)),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    hist = (value_histogram(ds, "value", 25.0)
            .to_pandas().sort_values("bin").reset_index(drop=True))
    exp_h = duckdb.sql("""
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, COUNT(*) AS n
        FROM t GROUP BY 1 ORDER BY bin
    """).df()
    pd.testing.assert_frame_equal(hist, exp_h.astype({"n": "int64"}))

    # force value ties so the tie_column path is exercised
    t2 = t.set_column(2, "value",
                      pa.array(np.round(t["value"].to_numpy() / 50) * 50.0))
    top = (grouped_topk(ray.data.from_arrow(t2).repartition(4),
                        "user_id", "value", 3, "event_id")
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True))
    exp_t = duckdb.sql("""
        SELECT user_id, event_id, value FROM t2
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY value DESC, event_id) <= 3
        ORDER BY user_id, event_id
    """).df()
    pd.testing.assert_frame_equal(top, exp_t)


def test_real_media_decode_reproduces_goldens(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.multimodal import (
        RealMediaDecoder, _REAL_STAT_COLS, synthesize_real_media_table)

    t = synthesize_real_media_table(80, seed=9)
    ds = ray.data.from_arrow(t.select(["media_id", "media_type", "payload"]))
    out = (ds.map_batches(RealMediaDecoder, batch_size=16,
                          concurrency=(1, 2), batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out.error.isna().all()
    golden = t.to_pandas().sort_values("media_id").reset_index(drop=True)
    for name, _ in _REAL_STAT_COLS:
        got, exp = out[name], golden[f"golden_{name}"]
        assert ((got == exp) | (got.isna() & exp.isna())).all(), name


def test_real_media_decode_corrupt_payloads():
    from pdf_inspector_ray.functions.multimodal import RealMediaDecoder

    batch = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "media_type": pa.array(["image", "audio", "video", "image"]),
        "payload": pa.array([b"notabmp", b"RIFFgarbage", b"x", None],
                            pa.binary()),
    })
    out = RealMediaDecoder()(batch).to_pandas()
    assert out.error.notna().all()  # every row surfaced an error
    assert out.width.isna().all()


def test_chunk_documents_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import chunk_documents

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(0, 200, size=150)]
    texts += ["", "one", " ".join(["x"] * 64), " ".join(["y"] * 65),
              " ".join(["z"] * 48)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (chunk_documents(ray.data.from_arrow(t).repartition(4),
                           chunk_tokens=64, stride=48)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> '') AS w
            FROM t
        ), wins AS (
            SELECT doc_id, w, len(w) AS n,
                   CASE WHEN len(w) = 0 THEN 0
                        ELSE (greatest(len(w) - 64, 0) + 47) // 48 + 1
                   END AS n_win
            FROM toks)
        SELECT doc_id, i - 1 AS chunk_idx,
               array_to_string(w[(i-1)*48 + 1 : least((i-1)*48 + 64, n)],
                               ' ') AS chunk_text,
               least((i-1)*48 + 64, n) - (i-1)*48 AS n_tokens
        FROM wins, unnest(generate_series(1, n_win)) AS u(i)
        ORDER BY doc_id, chunk_idx
    """).df()
    assert len(out) > 200
    pd.testing.assert_frame_equal(
        out, exp.astype({"chunk_idx": "int64", "n_tokens": "int64"}))
    # coverage invariant: every token of every doc appears in >= 1 chunk
    back = out.groupby("doc_id").n_tokens.sum()
    assert (back.loc[3] if 3 in back.index else 0) >= 0  # smoke


def test_token_count_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import (
        BPE_TOKEN_PATTERN, token_count_batch)

    texts = ["I don't know, it's fine — really!", "", "   ",
             "word1 2words 3.14 naïve café's", "ALL CAPS 123 !!!",
             "tabs\tand\nnewlines  here"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (ray.data.from_arrow(t)
           .map_batches(token_count_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    sql_pat = BPE_TOKEN_PATTERN.replace("'", "''")
    exp = duckdb.sql(f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '{sql_pat}')) AS n_bpe_tokens
        FROM t ORDER BY doc_id
    """).df()
    assert out.n_bpe_tokens.sum() > out.n_ws_tokens.sum()
    pd.testing.assert_frame_equal(
        out, exp.astype({"n_ws_tokens": "int64", "n_bpe_tokens": "int64"}))


def test_quantize_embeddings_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.similarity import quantize_embeddings

    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    vecs[:, 3] = 7.5  # degenerate dim (mx == mn) → q = 0
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    out = (quantize_embeddings(ray.data.from_arrow(t).repartition(3),
                               dim=8)
           .to_pandas().sort_values(["vec_id", "dim"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH flat AS (
            SELECT vec_id, u.i - 1 AS dim,
                   CAST(embedding[u.i] AS DOUBLE) AS x
            FROM t, unnest(generate_series(1, len(embedding))) AS u(i)
        ), rng AS (
            SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM flat GROUP BY dim
        )
        SELECT vec_id, dim,
               CAST(CASE WHEN mx = mn THEN 0
                    ELSE least(floor((x - mn) / (mx - mn) * 255), 255)
               END AS BIGINT) AS q
        FROM flat JOIN rng USING (dim)
        ORDER BY vec_id, dim
    """).df()
    assert (out[out.dim == 3].q == 0).all()
    assert out.q.max() == 255 and out.q.min() == 0
    pd.testing.assert_frame_equal(out, exp.astype({"dim": "int64",
                                                   "q": "int64"}))


def test_percent_rank_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import percent_rank_column

    rng = np.random.default_rng(13)
    vals = np.concatenate([rng.integers(0, 50, 300),
                           np.full(20, 7)])  # heavy ties
    t = pa.table({"doc_id": pa.array(range(len(vals)), pa.int64()),
                  "n_chars": pa.array(vals, pa.int64())})
    out = (percent_rank_column(ray.data.from_arrow(t).repartition(4),
                               "n_chars")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT doc_id, n_chars,
               percent_rank() OVER (ORDER BY n_chars) AS pct_rank
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(out, exp.astype({"n_chars": "int64"}))


def test_funnel_conversion_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import funnel_conversion

    rng = np.random.default_rng(41)
    n = 800
    base = np.datetime64("2024-01-01", "us")
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 30 * 86_400_000_000, n)
                       .astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["signup", "purchase", "click"], n).tolist()),
    })
    out = (funnel_conversion(ray.data.from_arrow(t).repartition(4),
                             "signup", "purchase",
                             within_us=3 * 86_400_000_000)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT e.event_id, e.user_id,
               EXISTS (SELECT 1 FROM t p
                       WHERE p.user_id = e.user_id
                         AND p.event_type = 'purchase'
                         AND p.ts > e.ts
                         AND p.ts <= e.ts + INTERVAL 3 DAY)
                   AS converted
        FROM t e WHERE e.event_type = 'signup' ORDER BY e.event_id
    """).df()
    assert out.converted.any() and not out.converted.all()
    pd.testing.assert_frame_equal(out, exp)


def test_cube_agg_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import cube_agg

    rng = np.random.default_rng(8)
    n = 300
    t = pa.table({
        "status": pa.array(rng.choice(["A", "B"], n).tolist()),
        "prio": pa.array(rng.choice(["1", "2", "3"], n).tolist()),
        "price": pa.array(np.round(rng.uniform(1, 500, n), 2)),
    })
    out = (cube_agg(ray.data.from_arrow(t).repartition(3),
                    ["status", "prio"], "price")
           .to_pandas()
           .sort_values(["status", "prio"], na_position="first")
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT status, prio,
               CAST(SUM(CAST(floor(price * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               COUNT(*) AS n_rows
        FROM t GROUP BY CUBE(status, prio)
        ORDER BY status NULLS FIRST, prio NULLS FIRST
    """).df()
    assert len(out) == 2 * 3 + 2 + 3 + 1
    pd.testing.assert_frame_equal(out, exp.astype({"n_rows": "int64"}))


def test_grouped_moments_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import grouped_moments

    rng = np.random.default_rng(77)
    n = 900
    t = pa.table({
        "grp": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
        "value": pa.array(np.round(rng.uniform(-5, 500, n), 3)),
    })
    out = (grouped_moments(ray.data.from_arrow(t).repartition(5),
                           "grp", "value")
           .to_pandas().sort_values("grp").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH q AS (SELECT grp,
                          CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                   FROM t),
        a AS (SELECT grp, CAST(SUM(v) AS DOUBLE) AS sx,
                     CAST(SUM(v * v) AS DOUBLE) AS sxx,
                     CAST(COUNT(*) AS DOUBLE) AS nf, COUNT(*) AS n
              FROM q GROUP BY grp)
        SELECT grp, n, (sx / nf) / 1000 AS mean_value,
               (sxx / nf - (sx / nf) * (sx / nf)) / 1000000 AS var_value
        FROM a ORDER BY grp
    """).df()
    pd.testing.assert_frame_equal(out, exp.astype({"n": "int64"}),
                                  check_exact=True)
    # sanity vs numpy (loose: fixed-point quantization)
    ref = t.to_pandas().groupby("grp").value.var(ddof=0)
    assert np.allclose(out.set_index("grp").var_value, ref, rtol=1e-4)


def test_inverted_index_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import inverted_index

    rng = np.random.default_rng(55)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25)))
             for _ in range(250)] + ["", "solo"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (inverted_index(ray.data.from_arrow(t).repartition(4), min_df=2)
           .to_pandas().sort_values("term").reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH pairs AS (
            SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS term
                FROM t)
        )
        SELECT term,
               array_to_string(list(doc_id ORDER BY doc_id), ',')
                   AS postings,
               COUNT(*) AS df
        FROM pairs GROUP BY term HAVING COUNT(*) >= 2
        ORDER BY term
    """).df()
    assert "solo" not in set(out.term)  # df=1 pruned
    pd.testing.assert_frame_equal(out, exp.astype({"df": "int64"}))


def test_top_collocations_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import top_collocations

    rng = np.random.default_rng(88)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 60)))
             for _ in range(200)]
    texts += ["pair one pair one pair one pair one pair one",  # planted
              "", "single"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (top_collocations(ray.data.from_arrow(t).repartition(4),
                            k=15, min_count=3)
           .to_pandas().reset_index(drop=True))
    exp = duckdb.sql(r"""
        WITH toks AS (
            SELECT list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> '') AS w FROM t
        ), bi AS (
            SELECT w[i] AS a, w[i+1] AS b, COUNT(*) AS c
            FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
            GROUP BY 1, 2
        ), uni AS (
            SELECT term, COUNT(*) AS c FROM (
                SELECT unnest(w) AS term FROM toks) GROUP BY term
        ), tot AS (
            SELECT CAST((SELECT SUM(c) FROM bi) AS DOUBLE) AS n_bi,
                   CAST((SELECT SUM(c) FROM uni) AS DOUBLE) AS n_uni
        )
        SELECT bi.a, bi.b, bi.c,
               (CAST(bi.c AS DOUBLE) / tot.n_bi)
                   * (tot.n_uni / CAST(ua.c AS DOUBLE))
                   * (tot.n_uni / CAST(ub.c AS DOUBLE)) AS score
        FROM bi, tot
        JOIN uni ua ON ua.term = bi.a
        JOIN uni ub ON ub.term = bi.b
        WHERE bi.c >= 3
        ORDER BY score DESC, bi.a, bi.b LIMIT 15
    """).df()
    assert out.iloc[0].a == "pair" and out.iloc[0].b == "one"
    pd.testing.assert_frame_equal(out, exp.astype({"c": "int64"}))


def test_approx_quantiles_within_bin_width(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.text_stats import approx_quantiles

    rng = np.random.default_rng(3)
    vals = rng.lognormal(3.0, 1.2, size=20_000)
    t = pa.table({"value": pa.array(vals, pa.float64())})
    out = approx_quantiles(ray.data.from_arrow(t).repartition(6),
                           "value", qs=(0.25, 0.5, 0.9),
                           num_bins=4096).to_pandas()
    width = (vals.max() - vals.min()) / 4096
    for q, col in [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]:
        exact = np.sort(vals)[int(np.ceil(q * len(vals))) - 1]
        assert abs(out[col][0] - exact) <= width + 1e-9, (q, out[col][0],
                                                          exact)


def test_cohort_retention_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import cohort_retention

    rng = np.random.default_rng(66)
    n = 1500
    base = np.datetime64("2023-11-29", "us")  # a Wednesday
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 80, n), pa.int64()),
        # 180-day span → many cohorts, many offsets, year boundary
        "ts": pa.array(base + rng.integers(0, 180 * 86_400_000_000, n)
                       .astype("timedelta64[us]")),
    })
    out = (cohort_retention(ray.data.from_arrow(t).repartition(5))
           .to_pandas().sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH f AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
            FROM t GROUP BY user_id
        ), r AS (
            SELECT DISTINCT e.user_id, f.cohort_week,
                   date_diff('week', f.cohort_week,
                             date_trunc('week', e.ts)) AS week_offset
            FROM t e JOIN f USING (user_id)
        )
        SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
               week_offset, COUNT(*) AS n_users
        FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert len(out) > 30 and out.cohort_week.nunique() > 3
    out["cohort_week"] = out.cohort_week.astype("datetime64[us]")
    exp["cohort_week"] = exp.cohort_week.astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        out, exp.astype({"week_offset": "int64", "n_users": "int64"}))


def test_event_transitions_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import event_transitions

    rng = np.random.default_rng(99)
    n = 1200
    base = np.datetime64("2024-03-01", "us")
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(base + rng.integers(0, 10 * 86_400_000_000, n)
                       .astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b", "c", "d"],
                                          n).tolist()),
    })
    out = (event_transitions(ray.data.from_arrow(t).repartition(4))
           .to_pandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH s AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS next_type
            FROM t
        )
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert out.n.sum() == n - 40  # n_events − one tail per user
    pd.testing.assert_frame_equal(out, exp.astype({"n": "int64"}))


def test_neardup_cluster_sizes_shapes(ray_session):
    """Cluster-size histogram over a designed component structure:
    a 4-chain, a triangle, and two isolated pairs → sizes {4:1, 3:1,
    2:2}."""
    import ray.data

    from pdf_inspector_ray.functions.dedup import connected_components

    pairs = pa.table({
        "doc_a": pa.array([1, 2, 3, 10, 11, 20, 30], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 11, 12, 21, 31], pa.int64()),
    })  # chain 1-2-3-4; triangle-ish 10-11-12; pairs 20-21, 30-31
    comp = connected_components(ray.data.from_arrow(pairs))
    sizes = (comp.to_pandas().groupby("label").size()
             .value_counts().sort_index())
    assert sizes.to_dict() == {2: 2, 3: 1, 4: 1}


def test_kmeans_assign_matches_bruteforce(ray_session):
    """Assignment must equal the numpy argmax over ROUNDED cosine sims
    with smallest-centroid tie-break — including an exact duplicate of a
    centroid (sim 1.0 tie with itself only) and a vector equidistant
    from two centroids (rounded tie → smaller centroid id wins)."""
    import ray.data

    from pdf_inspector_ray.functions.similarity import (_normalize,
                                                        kmeans_assign)

    rng = np.random.default_rng(5)
    cents = rng.normal(size=(4, 8))
    vecs = np.vstack([rng.normal(size=(50, 8)), cents[2],
                      # equidistant from centroids 0 and 1: their mean
                      (cents[0] / np.linalg.norm(cents[0])
                       + cents[1] / np.linalg.norm(cents[1]))])
    t = pa.table({"vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs.tolist())})
    out = (kmeans_assign(ray.data.from_arrow(t).repartition(3), cents)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    sims = np.round(_normalize(vecs) @ _normalize(cents).T, 6)
    expected = np.argmax(sims, axis=1)
    assert out["centroid_id"].to_numpy().tolist() == expected.tolist()
    assert out["centroid_id"].iloc[50] == 2  # duplicate → its centroid


def test_shipping_priority_matches_duckdb(ray_session):
    """Q3-flavored top-k on synthetic rows with revenue ties across the
    limit boundary (tie-break by orderkey must agree with the twin)."""
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import shipping_priority

    rng = np.random.default_rng(13)
    n_orders = 400
    cust = pa.table({"c_custkey": pa.array(np.arange(40), pa.int64())})
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 80, n_orders), pa.int64()),
        "o_orderdate": pa.array(
            np.full(n_orders, 800_000_000_000_000), pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [f"{i % 3}-P" for i in range(n_orders)]),
    })
    li_key = rng.integers(0, n_orders, 3000)
    price = rng.integers(100, 200, 3000) * 1.0  # integer prices → exact
    li = pa.table({
        "l_orderkey": pa.array(li_key, pa.int64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(np.zeros(3000), pa.float64()),
    })
    out = shipping_priority(
        ray.data.from_arrow(cust), ray.data.from_arrow(orders),
        ray.data.from_arrow(li), limit=10, num_partitions=16).to_pandas()
    exp = duckdb.sql("""
        SELECT l.l_orderkey AS o_orderkey,
               CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
                   AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM cust c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN li l ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """).df()
    pd.testing.assert_frame_equal(out, exp)


def test_latest_event_per_user_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import latest_event_per_user

    rng = np.random.default_rng(21)
    n = 5000
    ev = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n) * 1_000_000,
                       pa.timestamp("us")),  # many exact-ts ties per user
        "user_id": pa.array(
            np.where(rng.random(n) < 0.02, None,
                     rng.integers(0, 80, n)).astype(object)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
    })
    out = (latest_event_per_user(ray.data.from_arrow(ev).repartition(6))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT event_id, ts, user_id, event_type
        FROM ev WHERE user_id IS NOT NULL
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(
        out.astype({"user_id": "int64"}), exp.astype({"user_id": "int64"}))


def test_melt_roundtrip_and_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import melt

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "b": pa.array([10, 20, 30], pa.int64()),
    })
    out = (melt(ray.data.from_arrow(t), id_cols=["id"],
                value_cols=["a", "b"])
           .to_pandas().sort_values(["id", "metric"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, 'a' AS metric, CAST(a AS DOUBLE) AS value FROM t
        UNION ALL
        SELECT id, 'b', CAST(b AS DOUBLE) FROM t
        ORDER BY id, metric
    """).df()
    pd.testing.assert_frame_equal(out, exp)


def test_set_op_ids_intersect_except(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.relational import set_op_ids

    left = pa.table({"k": pa.array([1, 2, 2, 3, None, 7], pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 3, 4, None], pa.int64())})
    inter = set_op_ids(ray.data.from_arrow(left).repartition(3),
                       ray.data.from_arrow(right), "k", "intersect")
    assert sorted(r["k"] for r in inter.take_all()) == [2, 3]
    exc = set_op_ids(ray.data.from_arrow(left).repartition(3),
                     ray.data.from_arrow(right), "k", "except")
    assert sorted(r["k"] for r in exc.take_all()) == [1, 7]


def test_dense_rank_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import dense_rank_column

    rng = np.random.default_rng(8)
    t = pa.table({
        "doc_id": pa.array(np.arange(2000), pa.int64()),
        "n_chars": pa.array(rng.integers(0, 120, 2000), pa.int64()),
    })
    out = (dense_rank_column(ray.data.from_arrow(t).repartition(5),
                             "n_chars")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT doc_id, n_chars,
               dense_rank() OVER (ORDER BY n_chars) AS drank
        FROM t ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(out, exp.astype({"drank": "int64"}))


def test_media_thumbs_exact_and_skips(ray_session):
    """Thumbnail export is integer-exact vs direct computation on the
    raw array; audio / corrupt / null payloads emit no rows."""
    import ray.data

    from pdf_inspector_ray.functions.multimodal import (MediaThumbs,
                                                        _image_thumb_sums,
                                                        encode_bmp,
                                                        encode_wav)

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "media_type": pa.array(["image", "audio", "image", "image"]),
        "payload": pa.array([encode_bmp(arr),
                             encode_wav(np.zeros(100, np.int16), 8000),
                             b"not a bmp", None], pa.binary()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(MediaThumbs, batch_format="pyarrow", concurrency=2)
           .to_pandas().sort_values(["py", "px"]).reset_index(drop=True))
    assert set(out["media_id"]) == {0}
    assert len(out) == 64
    expected = _image_thumb_sums(arr)
    got = out["gray_sum"].to_numpy().reshape(8, 8)
    assert np.array_equal(got, expected)


def test_mode_per_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import mode_per_group

    rng = np.random.default_rng(33)
    n = 20_000
    ev = pa.table({
        "event_type": pa.array(
            rng.choice(["a", "b", "c", "d"], n).tolist()),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
    })
    out = (mode_per_group(ray.data.from_arrow(ev).repartition(7),
                          "event_type", "user_id")
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH pc_ AS (
            SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ev GROUP BY 1, 2
        )
        SELECT event_type, user_id AS mode_value, cnt AS mode_count
        FROM pc_
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY cnt DESC, user_id ASC) = 1
        ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(out, exp)


def test_new_ops_survive_all_empty_batches(ray_session):
    """r3 lesson: every operator must survive batches that are entirely
    empty or all-null (hypothesis found a real crash in the chunker;
    this pins the r4 ops)."""
    import ray.data

    from pdf_inspector_ray.functions.relational import (
        latest_event_per_user, melt, mode_per_group, set_op_ids)
    from pdf_inspector_ray.functions.sketch import seeded_sample_n
    from pdf_inspector_ray.functions.text_stats import dense_rank_column

    nulls = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([0, 1], pa.timestamp("us")),
        "user_id": pa.array([None, None], pa.int64()),
        "event_type": pa.array(["a", "b"]),
    })
    assert latest_event_per_user(
        ray.data.from_arrow(nulls).repartition(2)).count() == 0

    empty_docs = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_chars": pa.array([], pa.int64()),
    })
    assert dense_rank_column(ray.data.from_arrow(empty_docs),
                             "n_chars").count() == 0
    assert seeded_sample_n(ray.data.from_arrow(empty_docs),
                           "doc_id", 5).num_rows == 0
    assert melt(ray.data.from_arrow(empty_docs), id_cols=["doc_id"],
                value_cols=["n_chars"]).count() == 0
    one = pa.table({"doc_id": pa.array([7], pa.int64())})
    assert set_op_ids(ray.data.from_arrow(empty_docs.select(["doc_id"])),
                      ray.data.from_arrow(one), "doc_id",
                      "intersect").count() == 0
    assert (mode_per_group(ray.data.from_arrow(nulls), "event_type",
                           "user_id").count() == 0)


def test_grouped_covariance_exact_vs_duckdb(ray_session):
    """Covariance/correlation must be BIT-identical to the twin: exact
    integer partials, float only in the mirrored final ops. Negative
    values and a constant-x group (corr undefined → null) included."""
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.relational import grouped_covariance

    rng = np.random.default_rng(41)
    n = 30_000
    g = rng.choice(["A", "B", "C"], n)
    x = rng.integers(-50, 50, n).astype(np.float64) + 0.75  # floor matters
    y = (x * 3 + rng.normal(0, 20, n)).round(2)
    x[g == "C"] = 7.2  # constant after floor → zero variance → corr null
    t = pa.table({"grp": pa.array(g.tolist()),
                  "x": pa.array(x, pa.float64()),
                  "y": pa.array(y, pa.float64())})
    out = (grouped_covariance(ray.data.from_arrow(t).repartition(6),
                              "grp", "x", "y")
           .to_pandas().sort_values("grp").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH p AS (
            SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CAST(FLOOR(x) AS BIGINT)) AS HUGEINT) AS sx,
                   CAST(SUM(CAST(FLOOR(y) AS BIGINT)) AS HUGEINT) AS sy,
                   CAST(SUM(CAST(FLOOR(x) AS BIGINT)
                            * CAST(FLOOR(y) AS BIGINT)) AS HUGEINT) AS sxy,
                   CAST(SUM(CAST(FLOOR(x) AS BIGINT)
                            * CAST(FLOOR(x) AS BIGINT)) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(FLOOR(y) AS BIGINT)
                            * CAST(FLOOR(y) AS BIGINT)) AS HUGEINT) AS syy
            FROM t GROUP BY grp
        )
        SELECT grp, CAST(n AS BIGINT) AS n_rows,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * n AS DOUBLE) AS cov,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) AS corr
        FROM p ORDER BY grp
    """).df()
    # engine emits None for zero variance; DuckDB x/0.0 emits inf/nan
    exp.loc[~np.isfinite(exp["corr"]), "corr"] = None
    pd.testing.assert_frame_equal(out, exp)


def test_grouped_mad_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_inspector_ray.functions.text_stats import grouped_mad

    rng = np.random.default_rng(77)
    n = 8000
    t = pa.table({
        "lang": pa.array(rng.choice(["en", "de", "fr"], n).tolist()),
        "n_chars": pa.array(rng.integers(0, 300, n), pa.int64()),
    })
    out = grouped_mad(ray.data.from_arrow(t).repartition(5),
                      "lang", "n_chars").to_pandas()
    exp = duckdb.sql("""
        WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med
                   FROM t GROUP BY lang)
        SELECT d.lang, m.med AS median,
               quantile_disc(abs(d.n_chars - m.med), 0.5) AS mad
        FROM t d JOIN m USING (lang)
        GROUP BY d.lang, m.med ORDER BY d.lang
    """).df()
    pd.testing.assert_frame_equal(
        out, exp.astype({"median": "int64", "mad": "int64"}))


def test_explode_tokens_positions_and_empties(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.text_stats import explode_tokens

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a  b c", "", "   ", "x"]),
    })
    out = (explode_tokens(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values(["doc_id", "pos"])
           .reset_index(drop=True))
    assert list(zip(out["doc_id"], out["pos"], out["token"])) == [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (4, 1, "x")]


def test_resample_daily_counts_gap_fill(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.relational import resample_daily_counts

    day = 86_400_000_000
    ev = pa.table({
        "ts": pa.array([0, 10, 3 * day, 3 * day + 5, 3 * day],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "a", None]),
    })
    out = (resample_daily_counts(ray.data.from_arrow(ev).repartition(2))
           .to_pandas())
    assert len(out) == 8  # 4 days x 2 types, gap days zero-filled
    assert out["n_events"].sum() == 4  # null-type row dropped
    a_counts = out[out.event_type == "a"].sort_values("day")[
        "n_events"].tolist()
    assert a_counts == [1, 0, 0, 2]


def test_resample_daily_counts_null_ts_dropped(ray_session):
    """ADVICE r4: a null ts used to NaN-poison the int64 numpy
    conversion and crash the batch — now dropped like null event_type."""
    import ray.data

    from pdf_inspector_ray.functions.relational import resample_daily_counts

    day = 86_400_000_000
    ev = pa.table({
        "ts": pa.array([0, None, day, None], pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b", None]),
    })
    out = resample_daily_counts(ray.data.from_arrow(ev)).to_pandas()
    assert out["n_events"].sum() == 2  # both null-ts rows dropped
    assert len(out) == 4  # 2 days x 2 types


def test_dense_rank_null_values_dropped(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.text_stats import dense_rank_column

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n": pa.array([10, None, 20], pa.int64())})
    out = dense_rank_column(ray.data.from_arrow(t), "n").to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    assert dict(zip(out["doc_id"], out["drank"])) == {1: 1, 3: 2}


def test_grouped_mad_null_rows_dropped(ray_session):
    import ray.data

    from pdf_inspector_ray.functions.text_stats import grouped_mad

    t = pa.table({"g": pa.array(["a", "a", "a", None, "a"]),
                  "v": pa.array([1, 5, 9, 7, None], pa.int64())})
    out = grouped_mad(ray.data.from_arrow(t), "g", "v")
    assert out["g"].to_pylist() == ["a"]
    assert out["median"].to_pylist() == [5]
    assert out["mad"].to_pylist() == [4]


def test_ivf_distributed_build_partition_invariant(ray_session):
    """The distributed IVF build must produce BIT-IDENTICAL centroids
    however Ray splits the blocks (hash-ranked seeded sample + exact
    fixed-point Lloyd partials) — the property that lets the oracle
    sidecar and the query share one index without coordination."""
    import ray.data

    from pdf_inspector_ray.functions.similarity import (
        build_ivf_index_distributed)

    path = "/root/testdata/sf0.001/embeddings.parquet"
    a = build_ivf_index_distributed(ray.data.read_parquet(path))
    b = build_ivf_index_distributed(
        ray.data.read_parquet(path).repartition(7))
    assert np.array_equal(a.centroids, b.centroids)


def test_png_avi_codecs_roundtrip():
    """Real PNG (all five filter types) and AVI-DIB codecs must be
    lossless, and reject corrupt payloads with ValueError."""
    from pdf_inspector_ray.functions.multimodal import (decode_avi,
                                                        decode_png,
                                                        encode_avi,
                                                        encode_png)

    rng = np.random.default_rng(11)
    for (h, w) in [(1, 1), (6, 3), (48, 31)]:  # h >= 5 cycles filters 0-4
        a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)
    fr = rng.integers(0, 256, size=(5, 9, 13, 3), dtype=np.uint8)
    dec, fps = decode_avi(encode_avi(fr, 25))
    assert fps == 25 and np.array_equal(dec, fr)
    good = encode_png(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
    for bad in (b"", b"\x89PNG\r\n\x1a\nxx", good[:len(good) // 2],
                good[:30]):
        with pytest.raises((ValueError, Exception)):
            decode_png(bad)
    avi = encode_avi(fr, 10)
    for bad in (b"", b"RIFF\x04\x00\x00\x00AVI ", avi[:100]):
        with pytest.raises(ValueError):
            decode_avi(bad)


def test_real_media_decode_matches_goldens():
    """RealMediaDecoder, VideoFrameSampler and ResizeImages must
    reproduce the golden stats frozen from the RAW arrays before
    encoding — real decoding of BMP, PNG, WAV and AVI, not metadata."""
    import pdf_inspector_ray.functions.multimodal as m

    t = m.synthesize_real_media_table(24)
    out = m.RealMediaDecoder()(t)
    assert out["error"].to_pylist() == [None] * len(t)
    for name, _ in m._REAL_STAT_COLS:
        assert out[name].to_pylist() == t[f"golden_{name}"].to_pylist(), name

    fr = m.VideoFrameSampler()(t)
    got: dict = {}
    for i in range(fr.num_rows):
        got.setdefault(fr["media_id"][i].as_py(), []).append(
            (fr["frame_ts_ms"][i].as_py(), fr["mean_r"][i].as_py(),
             fr["mean_g"][i].as_py(), fr["mean_b"][i].as_py()))
    n_video = 0
    for row in range(len(t)):
        ts = t["golden_fr_ts"][row].as_py()
        if ts is None:
            continue
        n_video += 1
        want = list(zip(ts, t["golden_fr_r"][row].as_py(),
                        t["golden_fr_g"][row].as_py(),
                        t["golden_fr_b"][row].as_py()))
        assert got[t["media_id"][row].as_py()] == want
    assert n_video == 24 // 4

    rz = m.ResizeImages()(t)
    by: dict = {}
    for i in range(rz.num_rows):
        by.setdefault(rz["media_id"][i].as_py(), []).append(
            rz["resized_sum"][i].as_py())
    for row in range(len(t)):
        th = t["golden_thumb"][row].as_py()
        if th is not None:
            assert by[t["media_id"][row].as_py()] == th


def test_rolling_event_stats_rows_frame(ray_session):
    """Bounded ROWS frame: sums/means cover only the last `window` rows,
    null ts rows are dropped, null values count as 0 cents."""
    import ray.data
    from pdf_inspector_ray.functions.relational import rolling_event_stats

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 10, 11], pa.int64()),
        "ts": pa.array([100, 100, 200, 300, 400, 50, None],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, None, 7.5, 1.0],
                          pa.float64()),
    })
    out = (rolling_event_stats(ray.data.from_arrow(t), window=3).to_pandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    u1 = out[out.user_id == 1]
    # order by (ts, event_id): 1,2,3,4,5; cents 100,200,300,400,0
    assert list(u1.event_id) == [1, 2, 3, 4, 5]
    assert list(u1.roll_cents) == [100, 300, 600, 900, 700]
    assert list(u1.roll_avg) == [1.0, 1.5, 2.0, 3.0, 700.0 / 300.0]
    u2 = out[out.user_id == 2]                    # null-ts row 11 dropped
    assert list(u2.event_id) == [10]
    assert list(u2.roll_cents) == [750]

    with pytest.raises(ValueError):
        rolling_event_stats(ray.data.from_arrow(t), window=0)


def test_neardup_best_docs_picks_argmax(ray_session):
    """Quality-aware cluster dedup keeps the (stopword_count DESC,
    n_chars DESC, doc_id ASC) argmax per component — NOT the min id —
    and the distributed mask path equals the broadcast path."""
    import ray.data
    from pdf_inspector_ray.functions.dedup import (connected_components,
                                                   neardup_best_docs)

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 10], pa.int64()),
        "doc_b": pa.array([2, 3, 11], pa.int64()),
    }))
    comp = connected_components(pairs)
    ids = [1, 2, 3, 5, 10, 11, 99]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64())}))
    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "stopword_count": pa.array([0, 5, 5, 9, 2, 2, 0], pa.int64()),
        "n_chars": pa.array([10, 10, 30, 1, 4, 9, 1], pa.int64()),
    }))
    # {1,2,3}: stop ties 5/5 -> n_chars 30 wins -> 3; {10,11}: 11 wins
    kept = sorted(r["doc_id"] for r in
                  neardup_best_docs(docs, comp, scores).take_all())
    assert kept == [3, 5, 11, 99]
    kept_d = sorted(r["doc_id"] for r in
                    neardup_best_docs(docs, comp, scores,
                                      distributed=True).take_all())
    assert kept_d == kept


def test_neardup_best_docs_pair_free_corpus(ray_session):
    """Zero verified pairs -> schema-less empty components dataset ->
    every doc is kept (regression: _attach_side_column crashed on
    schema()=None)."""
    import ray.data
    from pdf_inspector_ray.functions.dedup import (connected_components,
                                                   neardup_best_docs)

    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    comp = connected_components(pairs)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64())}))
    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "stopword_count": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([1, 2, 3], pa.int64())}))
    kept = sorted(r["doc_id"] for r in
                  neardup_best_docs(docs, comp, scores).take_all())
    assert kept == [1, 2, 3]


def test_weighted_avg_by_group_exact(ray_session):
    """SUM(v*w)/SUM(w) per group in exact integer cents; non-integral
    weights are rejected by the safe Arrow cast, not truncated."""
    import ray.data
    from pdf_inspector_ray.functions.relational import weighted_avg_by_group

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b"], pa.string()),
        "v": pa.array([10.00, 20.00, 5.555, None], pa.float64()),
        "w": pa.array([1.0, 3.0, 2.0, 9.0], pa.float64()),
    })
    out = (weighted_avg_by_group(ray.data.from_arrow(t), "g", "v", "w")
           .to_pandas().sort_values("g").reset_index(drop=True))
    # a: (1000*1 + 2000*3) / (100*4) = 17.5; b: floor(555.5+0.5)=556 cents
    assert list(out.g) == ["a", "b"]
    assert list(out.w_avg) == [17.5, 556.0 * 2 / (100.0 * 2)]

    bad = pa.table({
        "g": pa.array(["a"], pa.string()),
        "v": pa.array([1.0], pa.float64()),
        "w": pa.array([1.5], pa.float64()),   # non-integral weight
    })
    with pytest.raises(Exception):
        weighted_avg_by_group(ray.data.from_arrow(bad), "g", "v",
                              "w").take_all()


def test_quantile_cont_matches_duckdb(ray_session):
    """Interpolated quantiles over a duplicate-heavy multiset must equal
    DuckDB's quantile_cont bit-for-bit (convex-combination rule)."""
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import quantile_cont_values

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, 503).astype(np.int64)   # heavy duplicates
    t = pa.table({"x": pa.array(vals, pa.int64())})
    got = quantile_cont_values(
        ray.data.from_arrow(t).repartition(7), "x",
        qs=(0.25, 0.5, 0.75, 0.95, 0.33)).to_pydict()
    con = duckdb.connect()
    con.register("t", t)
    for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"),
                    (0.95, "q95"), (0.33, "q33")):
        want = con.execute(
            f"SELECT quantile_cont(x, {q}) FROM t").fetchone()[0]
        assert got[name][0] == want, (name, got[name][0], want)


def test_pack_sequences_prefix_sum_partition_invariant(ray_session):
    """The distributed prefix sum must be a pure function of the data:
    identical offsets/pack ids at any partitioning, exact greedy-start
    bin assignment under global id order."""
    import ray.data
    from pdf_inspector_ray.functions.text_stats import pack_sequences

    t = pa.table({
        "doc_id": pa.array([4, 0, 7, 2, 11, 9], pa.int64()),
        "n_chars": pa.array([5, 3, 10, 4, 2, 6], pa.int64()),
    })
    # id order: 0(3) 2(4) 4(5) 7(10) 9(6) 11(2) -> starts 0,3,7,12,22,28
    want_start = [0, 3, 7, 12, 22, 28]
    want_pack = [s // 10 for s in want_start]
    for parts in (1, 3):
        out = (pack_sequences(ray.data.from_arrow(t).repartition(parts),
                              bin_budget=10, shard_size=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.doc_id) == [0, 2, 4, 7, 9, 11]
        assert list(out.start_offset) == want_start, parts
        assert list(out.pack_id) == want_pack, parts

    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_arrow(t), bin_budget=0)


def test_ntile_by_group_matches_sql_rule(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import ntile_by_group

    rng = np.random.default_rng(11)
    t = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "lang": pa.array(rng.choice(["en", "fr", "xx"], 300)),
        "n_chars": pa.array(rng.integers(0, 50, 300), pa.int64()),
    })
    for parts in (1, 4):
        out = (ntile_by_group(ray.data.from_arrow(t).repartition(parts),
                              "lang", "n_chars", "doc_id", n=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("d", t)
        want = con.execute("""
            SELECT doc_id, lang,
                   NTILE(4) OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS bucket
            FROM d ORDER BY doc_id""").df()
        assert list(out.bucket) == list(want.bucket), parts

    # tiny group (g < n): every row its own 1-row tile, buckets 1..g
    tiny = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "en"]),
        "n_chars": pa.array([9, 3], pa.int64()),
    })
    out = (ntile_by_group(ray.data.from_arrow(tiny), "lang", "n_chars",
                          "doc_id", n=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out.bucket) == [2, 1]  # doc 2 has fewer chars -> tile 1


def test_share_of_total_exact_division(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import share_of_total

    t = pa.table({
        "g": pa.array(["a", "b", "a", None, "c"]),
        "v": pa.array([1.25, 2.50, 0.25, 99.0, 6.00]),
    })
    out = share_of_total(ray.data.from_arrow(t), "g", "v")
    d = {r["g"]: (r["sum_cents"], r["share"]) for r in out.to_pylist()}
    assert d["a"] == (150, 150 / 1000.0)
    assert d["b"] == (250, 250 / 1000.0)
    assert d["c"] == (600, 600 / 1000.0)
    assert None not in d  # null group dropped like SQL GROUP BY+WHERE


def test_collect_distinct_sorted_profile(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import collect_distinct_sorted

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "click", "view", "buy", None,
                                "signup"]),
    })
    out = (collect_distinct_sorted(
        ray.data.from_arrow(t).repartition(3), "user_id", "event_type")
        .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert list(out.vals) == ["click,view", "buy", "signup"]
    assert list(out.n_vals) == [2, 1, 1]


def test_dedup_consecutive_keeps_run_heads(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import dedup_consecutive

    ts = pa.array(np.arange(7).astype("datetime64[s]").astype(
        "datetime64[us]"))
    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 1], pa.int64()),
        # user 1 stream: a a b b a ; user 2: a a
        "event_type": pa.array(["a", "a", "b", "b", "a", "a", "a"]),
    })
    for parts in (1, 3):
        out = (dedup_consecutive(ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        # kept: 0 (head of a-run), 2 (b-run), 6 (a after b), 4 (user 2 head)
        assert list(out.event_id) == [0, 2, 4, 6], parts
        assert list(out.event_type) == ["a", "b", "a", "a"], parts


def test_argmin_by_group_deterministic_ties(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import argmin_by_group

    t = pa.table({
        "p_partkey": pa.array([5, 3, 9, 1, 7], pa.int64()),
        "p_brand": pa.array(["x", "x", "x", "y", "y"]),
        # brand x: price tie 2.0 between keys 5 and 3 -> key 3 wins
        "p_retailprice": pa.array([2.0, 2.0, 8.0, 4.0, 4.0]),
    })
    for parts in (1, 3):
        out = (argmin_by_group(ray.data.from_arrow(t).repartition(parts),
                               "p_brand", "p_retailprice", "p_partkey")
               .to_pandas().sort_values("p_brand").reset_index(drop=True))
        assert list(out.p_partkey) == [3, 1], parts
        assert list(out.p_retailprice) == [2.0, 4.0], parts


def test_cume_dist_by_group_tie_fractions(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import cume_dist_by_group

    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "lang": pa.array(["en"] * 4 + ["fr"]),
        "n_chars": pa.array([10, 10, 20, 5, 1], pa.int64()),
    })
    out = (cume_dist_by_group(ray.data.from_arrow(t).repartition(2),
                              "lang", "n_chars", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # en: 5 -> 1/4; the two 10s share 3/4; 20 -> 4/4. fr singleton -> 1.
    assert list(out.cd) == [0.75, 0.75, 1.0, 0.25, 1.0]


def test_dedup_consecutive_matches_duckdb_on_random(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        collect_distinct_sorted, dedup_consecutive)

    rng = np.random.default_rng(23)
    n = 3000
    ev = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array((rng.integers(0, 10**7, n) * 1000)
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["a", "b", "c", None], n, p=[0.45, 0.35, 0.15, 0.05])),
    })
    con = duckdb.connect()
    con.register("events", ev)

    out = (dedup_consecutive(ray.data.from_arrow(ev).repartition(5))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = con.execute("""
        WITH e AS (SELECT * FROM events WHERE event_type IS NOT NULL),
        w AS (SELECT *, lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM e)
        SELECT event_id, event_type FROM w
        WHERE prev IS NULL OR prev <> event_type
        ORDER BY event_id""").df()
    assert list(out.event_id) == list(want.event_id)
    assert list(out.event_type) == list(want.event_type)

    out2 = (collect_distinct_sorted(ray.data.from_arrow(ev).repartition(5),
                                    "user_id", "event_type")
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    want2 = con.execute("""
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                   AS vals
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id ORDER BY user_id""").df()
    assert list(out2.vals) == list(want2.vals)


def test_levenshtein_matches_reference_dp_and_duckdb():
    """The vectorized row-DP levenshtein equals a cell-by-cell reference
    DP on random byte strings, handles empty/unicode edges, and agrees
    with DuckDB's byte-based levenshtein() (the oracle twin)."""
    import duckdb
    import numpy as np

    from pdf_inspector_ray.functions.dedup import levenshtein

    def ref(a: str, b: str) -> int:
        aa, bb = a.encode("utf-8"), b.encode("utf-8")
        prev = list(range(len(bb) + 1))
        for i, ca in enumerate(aa):
            cur = [i + 1]
            for j, cb in enumerate(bb):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert levenshtein("", "") == 0
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("é", "a") == 2  # UTF-8 bytes, not codepoints

    rng = np.random.default_rng(7)
    alpha = "abcde é"
    cases = []
    for _ in range(60):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 20)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 20)))
        cases.append((a, b))
        assert levenshtein(a, b) == ref(a, b)

    con = duckdb.connect()
    for a, b in cases[:20]:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_verify_pairs_levenshtein(ray_session):
    """Pair texts attach via the reduce-side joins and the cap slices
    codepoints on both sides before the DP."""
    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.dedup import verify_pairs_levenshtein

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["hello world", "hello wurld", "x" * 100 + "tail"],
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 3], pa.int64()),
        "doc_b": pa.array([2, 3], pa.int64()),
    }))
    out = (verify_pairs_levenshtein(pairs, docs, cap=64)
           .to_pandas().sort_values("doc_a").reset_index(drop=True))
    assert list(out.columns) == ["doc_a", "doc_b", "lev"]
    assert out.lev.tolist() == [1, 0]  # cap=64 hides the differing tail


def test_winsorized_sum_by_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.text_stats import winsorized_sum_by_group

    rng = np.random.default_rng(31)
    n = 4000
    t = pa.table({
        "lang": pa.array(rng.choice(["en", "fr", "zh", None], n,
                                    p=[0.5, 0.3, 0.15, 0.05])),
        "n_chars": pa.array(rng.integers(1, 1000, n), pa.int64()),
    })
    out = (winsorized_sum_by_group(
               ray.data.from_arrow(t).repartition(5), "lang", "n_chars")
           .to_pandas().sort_values("lang").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
        WITH q AS (
            SELECT lang, quantile_disc(n_chars, 0.1) AS lo,
                   quantile_disc(n_chars, 0.9) AS hi
            FROM documents WHERE lang IS NOT NULL GROUP BY lang)
        SELECT d.lang, q.lo, q.hi,
               CAST(SUM(least(greatest(d.n_chars, q.lo), q.hi)) AS BIGINT)
                   AS winsorized_sum,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM documents d JOIN q USING (lang)
        GROUP BY d.lang, q.lo, q.hi ORDER BY d.lang""").df()
    assert out.lang.tolist() == want.lang.tolist()
    assert out.lo.tolist() == want.lo.tolist()
    assert out.hi.tolist() == want.hi.tolist()
    assert out.winsorized_sum.tolist() == want.winsorized_sum.tolist()
    assert out.n_rows.tolist() == want.n_rows.tolist()


def test_vocab_size_by_group_partition_invariant(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.text_stats import vocab_size_by_group

    t = pa.table({
        "source": pa.array(["web", "web", "pdf", "pdf", None]),
        "text": pa.array(["a b  c", "b c d", "x", None, "zz"]),
    })
    for parts in (1, 4):
        out = (vocab_size_by_group(ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("source").reset_index(drop=True))
        # pdf: {x}; web: {a,b,c,d}; null source / null text dropped
        assert out.source.tolist() == ["pdf", "web"], parts
        assert out.n_terms.tolist() == [1, 4], parts


def test_event_kgrams_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import event_kgrams

    rng = np.random.default_rng(47)
    n = 3000
    ev = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array((rng.integers(0, 10**6, n) * 1000)
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["a", "b", "c", None], n, p=[0.4, 0.35, 0.2, 0.05])),
    })
    out = (event_kgrams(ray.data.from_arrow(ev).repartition(5),
                        k=3, min_count=2)
           .to_pandas().sort_values("gram").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH e AS (SELECT * FROM events WHERE event_type IS NOT NULL),
        w AS (SELECT lag(event_type, 2) OVER win AS p2,
                     lag(event_type, 1) OVER win AS p1,
                     event_type AS cur
              FROM e WINDOW win AS (
                  PARTITION BY user_id ORDER BY ts, event_id))
        SELECT p2 || '>' || p1 || '>' || cur AS gram,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM w WHERE p2 IS NOT NULL
        GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY gram""").df()
    assert out.gram.tolist() == want.gram.tolist()
    assert out.n.tolist() == want.n.tolist()


def test_merge_intervals_by_group_islands(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import merge_intervals_by_group

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        # user 1: [0,10] [5,8] (nested) [10,20] (touching -> merges)
        #         [30,40] -> 2 islands covering 20 + 10 = 30
        # user 2: [0,5] [6,7] -> 2 islands covering 5 + 1 = 6
        "s": pa.array([0, 5, 10, 30, 0, 6], pa.int64()),
        "e": pa.array([10, 8, 20, 40, 5, 7], pa.int64()),
    })
    for parts in (1, 3):
        out = (merge_intervals_by_group(
                   ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert out.n_intervals.tolist() == [2, 2], parts
        assert out.covered.tolist() == [30, 6], parts


def test_prefix_contained_docs_exact(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.dedup import prefix_contained_docs

    base = "alpha beta gamma delta "  # > 16 chars
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            base,                     # 0: prefix of 1 and 2 -> contained
            base + "epsilon",         # 1: prefix of 2 -> contained
            base + "epsilon zeta",    # 2: maximal
            base[:10],                # 3: < min_len -> out of scope
            "unrelated text entirely here",  # 4: different bucket
            base,                     # 5: duplicate of 0 -> contained
        ]),
    })
    for parts in (1, 3):
        out = (prefix_contained_docs(
                   ray.data.from_arrow(t).repartition(parts))
               .to_pandas())
        assert sorted(out.doc_id.tolist()) == [0, 1, 5], parts


def test_late_orders_by_priority_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import late_orders_by_priority

    rng = np.random.default_rng(53)
    n_orders, n_lines = 300, 1200
    orders = pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_orderdate": pa.array((rng.integers(0, 10**6, n_orders)
                                 * 1_000_000).astype("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "5-LOW"], n_orders)),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_lines),
                               pa.int64()),
        "l_shipdate": pa.array((rng.integers(0, 10**6, n_lines)
                                * 1_000_000).astype("datetime64[us]")),
    })
    out = (late_orders_by_priority(
               ray.data.from_arrow(orders).repartition(3),
               ray.data.from_arrow(lineitem).repartition(4),
               num_partitions=5)
           .to_pandas().sort_values("o_orderpriority")
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    want = con.execute("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""").df()
    assert out.o_orderpriority.tolist() == want.o_orderpriority.tolist()
    assert out.late_order_count.tolist() == want.n.tolist()


def test_priority_counts_by_linestatus_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        priority_counts_by_linestatus)

    rng = np.random.default_rng(59)
    n_orders, n_lines = 200, 900
    orders = pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"], n_orders)),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_lines),
                               pa.int64()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_lines)),
    })
    out = (priority_counts_by_linestatus(
               ray.data.from_arrow(orders).repartition(3),
               ray.data.from_arrow(lineitem).repartition(4),
               num_partitions=5)
           .to_pandas().sort_values("l_linestatus").reset_index(drop=True))
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    want = con.execute("""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                             ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS lo
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus ORDER BY l_linestatus""").df()
    assert out.l_linestatus.tolist() == want.l_linestatus.tolist()
    assert out.high_line_count.tolist() == want.hi.tolist()
    assert out.low_line_count.tolist() == want.lo.tolist()


def test_longest_run_by_group_hand_case(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import longest_run_by_group

    ts = pa.array(np.arange(8).astype("datetime64[s]").astype(
        "datetime64[us]"))
    t = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 2], pa.int64()),
        # user 1: a a a b a -> runs (3,1,1), 3 runs, max 3
        # user 2: b b None -> null dropped -> 1 run of 2
        "event_type": pa.array(["a", "a", "a", "b", "a",
                                "b", "b", None]),
    })
    for parts in (1, 3):
        out = (longest_run_by_group(
                   ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert out.n_runs.tolist() == [3, 1], parts
        assert out.max_run.tolist() == [3, 2], parts


def test_iqr_outlier_docs_integer_fences(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.text_stats import iqr_outlier_docs

    # n=7 -> quantile_disc ranks ceil(0.25*7)-1=1 and ceil(0.75*7)-1=5:
    # q1=100, q3=104, IQR=4 -> half-IQR fences (2v < 196 | 2v > 212),
    # i.e. v < 98 or v > 106: 10 is low, 200 is high, the rest inside
    t = pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "lang": pa.array(["en"] * 7),
        "n_chars": pa.array([10, 100, 101, 102, 103, 104, 200],
                            pa.int64()),
    })
    for parts in (1, 3):
        out = (iqr_outlier_docs(ray.data.from_arrow(t).repartition(parts),
                                "lang", "n_chars")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out.doc_id.tolist() == [0, 6], parts
        assert out.side.tolist() == ["low", "high"], parts


def test_rolling_active_users_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import rolling_active_users

    rng = np.random.default_rng(61)
    n = 2000
    ev = pa.table({
        "ts": pa.array((rng.integers(0, 40 * 86_400, n) * 1_000_000)
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
    })
    out = (rolling_active_users(ray.data.from_arrow(ev).repartition(4))
           .to_pandas().sort_values("day").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                           user_id FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n
        FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day ORDER BY d.day""").df()
    assert out.day.tolist() == want.day.tolist()
    assert out.active_users.tolist() == want.n.tolist()


def test_source_vocab_jaccard_hand_case(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.text_stats import source_vocab_jaccard

    t = pa.table({
        "source": pa.array(["web", "web", "pdf", "book"]),
        # vocab: web={a,b,c}, pdf={b,c,d}, book={x}
        "text": pa.array(["a b", "b c", "b c d", "x"]),
    })
    for parts in (1, 4):
        out = (source_vocab_jaccard(ray.data.from_arrow(t)
                                    .repartition(parts))
               .to_pandas().sort_values(["source_a", "source_b"])
               .reset_index(drop=True))
        rows = {(r.source_a, r.source_b): (r.inter_terms, r.union_terms,
                                           r.jaccard)
                for r in out.itertuples()}
        assert rows[("pdf", "web")] == (2, 4, 0.5), parts
        assert ("book", "pdf") not in rows  # disjoint pairs never meet
        assert len(rows) == 1, parts


def test_funnel_steps_strict_order(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import funnel_steps

    def ev(uid, sec, typ):
        return (uid, np.datetime64(sec, "s").astype("datetime64[us]"), typ)

    rows = [
        # user 1: full funnel in order
        ev(1, 0, "signup"), ev(1, 10, "view"), ev(1, 20, "purchase"),
        # user 2: purchase BEFORE view -> stops at view
        ev(2, 0, "signup"), ev(2, 5, "purchase"), ev(2, 10, "view"),
        # user 3: view only, no signup -> reaches nothing
        ev(3, 0, "view"),
        # user 4: view at SAME ts as signup -> strict > rejects it
        ev(4, 0, "signup"), ev(4, 0, "view"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "event_type": pa.array([r[2] for r in rows]),
    })
    for parts in (1, 3):
        out = funnel_steps(ray.data.from_arrow(t).repartition(parts))
        assert out["stage"].to_pylist() == ["signup", "view", "purchase"]
        # signup: users 1,2,4; view: 1,2; purchase: 1
        assert out["n_users"].to_pylist() == [3, 2, 1], parts


def test_event_type_cooccurrence_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        event_type_cooccurrence)

    rng = np.random.default_rng(67)
    n = 2500
    ev = pa.table({
        "ts": pa.array((rng.integers(0, 20 * 86_400, n) * 1_000_000)
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "view", "purchase", "error"], n)),
    })
    out = (event_type_cooccurrence(ray.data.from_arrow(ev).repartition(4))
           .to_pandas().sort_values(["type_a", "type_b"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH b AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day, event_type
                   FROM events)
        SELECT a.event_type AS type_a, c.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM b a JOIN b c ON a.user_id = c.user_id AND a.day = c.day
                         AND a.event_type < c.event_type
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert out.type_a.tolist() == want.type_a.tolist()
    assert out.type_b.tolist() == want.type_b.tolist()
    assert out.support.tolist() == want.support.tolist()


def test_revenue_by_brand_cents_exact(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import revenue_by_brand

    rng = np.random.default_rng(71)
    n_parts, n_lines = 50, 800
    part = pa.table({
        "p_partkey": pa.array(range(n_parts), pa.int64()),
        "p_brand": pa.array([f"B{int(k) % 5}" for k in range(n_parts)]),
    })
    lineitem = pa.table({
        "l_partkey": pa.array(rng.integers(0, n_parts, n_lines),
                              pa.int64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(1, 1000, n_lines), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_lines), 2)),
    })
    out = (revenue_by_brand(ray.data.from_arrow(lineitem).repartition(4),
                            ray.data.from_arrow(part).repartition(2),
                            num_partitions=5)
           .to_pandas().sort_values("p_brand").reset_index(drop=True))
    con = duckdb.connect()
    con.register("part", part)
    con.register("lineitem", lineitem)
    want = con.execute("""
        SELECT p_brand,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""").df()
    assert out.p_brand.tolist() == want.p_brand.tolist()
    assert out.revenue_cents.tolist() == want.cents.tolist()
    assert out.n_lines.tolist() == want.n.tolist()


def test_supplier_revenue_broadcast_dims(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import supplier_revenue

    rng = np.random.default_rng(73)
    n_lines = 600
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s-one", "s-two", "s-three"]),
        "s_nationkey": pa.array([0, 0, 1], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["FRANCE", "KENYA"]),
    })
    lineitem = pa.table({
        "l_suppkey": pa.array(rng.integers(1, 4, n_lines), pa.int64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(1, 500, n_lines), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_lines), 2)),
    })
    out = (supplier_revenue(ray.data.from_arrow(lineitem).repartition(4),
                            supplier, nation)
           .to_pandas().sort_values("s_suppkey").reset_index(drop=True))
    con = duckdb.connect()
    con.register("supplier", supplier)
    con.register("nation", nation)
    con.register("lineitem", lineitem)
    want = con.execute("""
        SELECT s.s_suppkey, s.s_name, n.n_name,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3 ORDER BY 1""").df()
    assert out.s_suppkey.tolist() == want.s_suppkey.tolist()
    assert out.s_name.tolist() == want.s_name.tolist()
    assert out.n_name.tolist() == want.n_name.tolist()
    assert out.revenue_cents.tolist() == want.cents.tolist()
    assert out.n_lines.tolist() == want.n.tolist()


def test_daily_event_deltas_gap_is_a_drop(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import daily_event_deltas

    day = 86_400_000_000
    ts = pa.array(np.array([0, 0, 0, 2 * day, 2 * day], np.int64)
                  .astype("datetime64[us]"))
    t = pa.table({"ts": ts,
                  "event_type": pa.array(["a", "a", "b", "a", "b"])})
    out = (daily_event_deltas(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values(["event_type", "day"])
           .reset_index(drop=True))
    # dense grid: 3 days x 2 types; day1 is zero-filled
    assert out.n_events.tolist() == [2, 0, 1, 1, 0, 1]
    d = out.delta.tolist()
    assert np.isnan(d[0]) and np.isnan(d[3])  # first day per type: NULL
    assert d[1:3] == [-2.0, 1.0] and d[4:] == [-1.0, 1.0]


def test_hourly_top_event_tie_break(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import hourly_top_event

    hour = 3_600_000_000
    ts = pa.array(np.array([0, 1, 2, hour, hour + 1, hour + 2],
                           np.int64).astype("datetime64[us]"))
    t = pa.table({
        "ts": ts,
        # hour 0: b,b,a -> b wins on count; hour 1: a,b tie +c -> a wins
        "event_type": pa.array(["b", "b", "a", "b", "a", "c"]),
    })
    for parts in (1, 3):
        out = (hourly_top_event(ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("hour").reset_index(drop=True))
        assert out.top_type.tolist() == ["b", "a"], parts
        assert out.n.tolist() == [2, 1], parts


def test_conversion_latency_quantiles_hand_case(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        conversion_latency_quantiles)

    def ev(uid, sec, typ):
        return (uid, np.datetime64(sec, "s").astype("datetime64[us]"), typ)

    rows = [
        ev(1, 0, "signup"), ev(1, 10, "purchase"),   # lat 10
        ev(2, 0, "signup"), ev(2, 30, "purchase"),   # lat 30
        ev(3, 0, "signup"), ev(3, 50, "purchase"),   # lat 50
        ev(4, 0, "signup"),                          # never converts
        ev(5, 10, "purchase"), ev(5, 20, "signup"),  # purchase BEFORE
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "event_type": pa.array([r[2] for r in rows]),
    })
    for parts in (1, 3):
        out = conversion_latency_quantiles(
            ray.data.from_arrow(t).repartition(parts))
        assert out["n_converted"].to_pylist() == [3], parts
        # n=3: p50 rank ceil(1.5)-1=1 -> 30; p90 rank ceil(2.7)-1=2 -> 50
        assert out["p50_s"].to_pylist() == [30], parts
        assert out["p90_s"].to_pylist() == [50], parts


def test_event_pair_lift_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import event_pair_lift

    rng = np.random.default_rng(79)
    n = 2000
    ev = pa.table({
        "ts": pa.array((rng.integers(0, 15 * 86_400, n) * 1_000_000)
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 35, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "view", "purchase"], n, p=[0.5, 0.4, 0.1])),
    })
    out = (event_pair_lift(ray.data.from_arrow(ev).repartition(4))
           .to_pandas().sort_values(["type_a", "type_b"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH b AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day, event_type
                   FROM events),
        nb AS (SELECT COUNT(*) AS n FROM (
                   SELECT DISTINCT user_id, day FROM b)),
        singles AS (SELECT event_type, COUNT(*) AS n
                    FROM b GROUP BY event_type),
        pairs AS (SELECT a.event_type AS type_a, c.event_type AS type_b,
                         CAST(COUNT(*) AS BIGINT) AS support
                  FROM b a JOIN b c ON a.user_id = c.user_id
                                   AND a.day = c.day
                                   AND a.event_type < c.event_type
                  GROUP BY 1, 2)
        SELECT type_a, type_b, support,
               CAST(support * nb.n AS DOUBLE) / (sa.n * sb.n) AS lift
        FROM pairs, nb
        JOIN singles sa ON sa.event_type = type_a
        JOIN singles sb ON sb.event_type = type_b
        ORDER BY 1, 2""").df()
    assert out.type_a.tolist() == want.type_a.tolist()
    assert out.support.tolist() == want.support.tolist()
    assert out.lift.tolist() == want.lift.tolist()  # bit-exact division


def test_orders_by_month_calendar_truncation(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import orders_by_month

    rng = np.random.default_rng(83)
    n = 500
    # spread over ~14 months so year boundaries are crossed
    orders = pa.table({
        "o_orderdate": pa.array((rng.integers(0, 425, n) * 86_400
                                 * 1_000_000).astype("datetime64[us]")),
        "o_totalprice": pa.array(np.round(rng.uniform(10, 9999, n), 2)),
    })
    out = (orders_by_month(ray.data.from_arrow(orders).repartition(4))
           .to_pandas().sort_values("month").reset_index(drop=True))
    con = duckdb.connect()
    con.register("orders", orders)
    want = con.execute("""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                   AS month,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1 ORDER BY 1""").df()
    assert out.month.tolist() == want.month.tolist()
    assert out.n_orders.tolist() == want.n.tolist()
    assert out.revenue_cents.tolist() == want.cents.tolist()


def test_customer_rfm_partials(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import customer_rfm

    d = lambda s: np.datetime64(s, "D").astype("datetime64[us]")
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, None], pa.int64()),
        "o_orderdate": pa.array([d(10), d(20), d(5), d(7)]),
        "o_totalprice": pa.array([100.00, 50.50, 9.99, 1.0]),
    })
    for parts in (1, 3):
        out = (customer_rfm(ray.data.from_arrow(orders).repartition(parts))
               .to_pandas().sort_values("o_custkey")
               .reset_index(drop=True))
        assert out.o_custkey.tolist() == [1, 2], parts
        assert out.last_order.tolist() == [d(20), d(5)], parts
        assert out.n_orders.tolist() == [2, 1], parts
        assert out.spend_cents.tolist() == [15050, 999], parts


def test_null_audit_counts(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import null_audit

    t = pa.table({
        "a": pa.array([1, None, 3, None], pa.int64()),
        "b": pa.array(["x", "y", None, "z"]),
    })
    for parts in (1, 4):
        out = null_audit(ray.data.from_arrow(t).repartition(parts),
                         ["a", "b"])
        assert out["n_rows"].to_pylist() == [4], parts
        assert out["n_null_a"].to_pylist() == [2], parts
        assert out["n_null_b"].to_pylist() == [1], parts


def test_events_weekday_profile_sunday_zero(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import events_weekday_profile

    day = 86_400_000_000
    # epoch day 0 = Thursday (dow 4); days 3 and 10 = Sundays (dow 0)
    ts = pa.array(np.array([0, 3 * day, 3 * day, 10 * day], np.int64)
                  .astype("datetime64[us]"))
    t = pa.table({"ts": ts,
                  "event_type": pa.array(["a", "a", "b", "a"])})
    out = (events_weekday_profile(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values(["dow", "event_type"])
           .reset_index(drop=True))
    assert out.dow.tolist() == [0, 0, 4]
    assert out.event_type.tolist() == ["a", "b", "a"]
    assert out.n.tolist() == [2, 1, 1]  # a on both Sundays


def test_order_interarrival_quantiles(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        order_interarrival_quantiles)

    d = lambda s: np.datetime64(s, "D").astype("datetime64[us]")
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        # cust 1 gaps: 10, 20; cust 2 gap: 5; cust 3: single order
        "o_orderdate": pa.array([d(0), d(10), d(30), d(100), d(105),
                                 d(7)]),
    })
    for parts in (1, 3):
        out = order_interarrival_quantiles(
            ray.data.from_arrow(orders).repartition(parts))
        assert out["n_gaps"].to_pylist() == [3], parts
        # sorted gaps [5,10,20]: p50 rank ceil(1.5)-1=1 -> 10;
        # p90 rank ceil(2.7)-1=2 -> 20
        assert out["p50_d"].to_pylist() == [10], parts
        assert out["p90_d"].to_pylist() == [20], parts


def test_source_simpson_diversity_exact(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.text_stats import (
        source_simpson_diversity)

    t = pa.table({
        "source": pa.array(["web", "web", "pdf"]),
        # web tokens: a a a b (n_a=3, n_b=1) -> pairs 6, N=4 ->
        # simpson = 1 - 6/12 = 0.5 ; pdf: x y -> 1 - 0/2 = 1.0
        "text": pa.array(["a a a", "b", "x y"]),
    })
    for parts in (1, 3):
        out = (source_simpson_diversity(
                   ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("source").reset_index(drop=True))
        assert out.source.tolist() == ["pdf", "web"], parts
        assert out.pairs_same.tolist() == [0, 6], parts
        assert out.n_tokens.tolist() == [2, 4], parts
        assert out.simpson.tolist() == [1.0, 0.5], parts


def test_zipf_topk_share_tie_break(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.text_stats import zipf_topk_share

    t = pa.table({
        "source": pa.array(["web"] * 2),
        # counts: a=3, b=2, c=1, d=1 -> k=2 head = a,b = 5 of 7
        "text": pa.array(["a a a b", "b c d"]),
    })
    for parts in (1, 2):
        out = (zipf_topk_share(ray.data.from_arrow(t).repartition(parts),
                               k=2).to_pandas())
        assert out.topk_tokens.tolist() == [5], parts
        assert out.n_tokens.tolist() == [7], parts
        assert out.topk_share.tolist() == [5 / 7], parts


def test_customers_by_region_broadcast(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import customers_by_region

    nation = pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["FRANCE", "KENYA", "PERU"]),
        "n_regionkey": pa.array([0, 1, 1], pa.int64()),
    })
    region = pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EUROPE", "AFRICA"]),
    })
    customer = pa.table({
        "c_nationkey": pa.array([0, 0, 1, 2, 2, 2], pa.int64()),
    })
    for parts in (1, 3):
        out = (customers_by_region(
                   ray.data.from_arrow(customer).repartition(parts),
                   nation, region)
               .to_pandas().sort_values(["r_name", "n_name"])
               .reset_index(drop=True))
        assert out.r_name.tolist() == ["AFRICA", "AFRICA", "EUROPE"], parts
        assert out.n_name.tolist() == ["KENYA", "PERU", "FRANCE"], parts
        assert out.n_customers.tolist() == [1, 3, 2], parts


def test_embedding_dim_minmax_exact(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.similarity import embedding_dim_minmax

    rng = np.random.default_rng(97)
    vecs = rng.standard_normal((50, 4)).astype(np.float32)
    t = pa.table({"embedding": pa.array(list(vecs))})
    for parts in (1, 4):
        out = (embedding_dim_minmax(
                   ray.data.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("dim").reset_index(drop=True))
        assert out.dim.tolist() == [1, 2, 3, 4], parts
        assert out.mn.tolist() == vecs.min(axis=0).tolist(), parts
        assert out.mx.tolist() == vecs.max(axis=0).tolist(), parts
        assert str(out.mn.dtype) == "float32", parts


def test_user_activity_gini_closed_form(ray_session):
    import duckdb
    import ray.data
    from pdf_inspector_ray.functions.relational import user_activity_gini

    rng = np.random.default_rng(101)
    n = 3000
    ev = pa.table({"user_id": pa.array(
        rng.zipf(1.6, n).clip(max=200).astype(np.int64))})
    out = user_activity_gini(ray.data.from_arrow(ev).repartition(5))
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events
                    GROUP BY user_id),
        r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM uc),
        s AS (SELECT CAST(SUM(i*n) AS BIGINT) S,
                     CAST(SUM(n) AS BIGINT) T,
                     CAST(COUNT(*) AS BIGINT) nu FROM r)
        SELECT nu, T, S,
               (2.0 * S) / (nu * T) - (nu + 1.0) / nu AS gini
        FROM s""").df()
    assert out["n_users"].to_pylist() == [int(want["nu"][0])]
    assert out["n_events"].to_pylist() == [int(want["T"][0])]
    # run-of-ties closed form == ROW_NUMBER sum, independent of tie order
    assert out["rank_weighted_sum"].to_pylist() == [int(want["S"][0])]
    assert out["gini"].to_pylist() == [float(want.gini[0])]


def test_top_customer_per_nation_ties(ray_session):
    import ray.data
    from pdf_inspector_ray.functions.relational import (
        top_customer_per_nation)

    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["FRANCE", "KENYA"]),
    })
    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1], pa.int64()),
    })
    orders = pa.table({
        # cust 1 and 2 TIE at 100.00 -> smaller custkey 1 wins FRANCE;
        # cust 4 (50+60) beats cust 3 (100) in KENYA
        "o_custkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
        "o_totalprice": pa.array([100.0, 100.0, 100.0, 50.0, 60.0]),
    })
    for parts in (1, 3):
        out = (top_customer_per_nation(
                   ray.data.from_arrow(orders).repartition(parts),
                   ray.data.from_arrow(customer).repartition(2),
                   nation, num_partitions=4)
               .to_pandas().sort_values("n_name").reset_index(drop=True))
        assert out.n_name.tolist() == ["FRANCE", "KENYA"], parts
        assert out.top_custkey.tolist() == [1, 4], parts
        assert out.spend_cents.tolist() == [10000, 11000], parts
