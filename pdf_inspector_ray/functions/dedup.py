"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB):
* exact — hash text per batch (map_batches), hash-partition ``groupby`` on
  the digest, keep min doc_id per group. One shuffle, keys are uniform
  digests → no skew.
* MinHash/SimHash/embedding-LSH — signature per doc (map_batches, numpy),
  ``flat_map`` to (band_hash, doc_id) bucket rows, ``groupby`` bucket,
  emit candidate pairs per bucket, dedupe pairs, then verify candidates
  exactly (Jaccard / hamming / cosine). Buckets are hashes → uniform; the
  only skew risk is a giant duplicate cluster, capped by MAX_BUCKET.

All signatures are seed-fixed (numpy default_rng(seed)) → deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MAX_BUCKET = 256  # cap pair expansion in a pathological bucket (logged)

_log = __import__("logging").getLogger(__name__)


# -- exact ------------------------------------------------------------------

def exact_dedup(ds, text_column: str = "text"):
    """Dataset → (text_md5, doc_id=min) one row per distinct text."""
    import pyarrow.compute as pc

    def add_md5(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8"), usedforsecurity=False).hexdigest()
                if t is not None else None for t in texts]
        return pa.table({
            "text_md5": pa.array(md5s, pa.string()),
            "doc_id": batch["doc_id"],
        })

    def keep_first(group: pa.Table) -> pa.Table:
        min_id = pc.min(group["doc_id"]).as_py()
        return pa.table({
            "text_md5": [group["text_md5"][0].as_py()],
            "doc_id": pa.array([min_id], group["doc_id"].type),
        })

    return (ds.map_batches(add_md5, batch_format="pyarrow")
              .groupby("text_md5")
              .map_groups(keep_first, batch_format="pyarrow"))


# -- minhash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Seeded minhash over word shingles (k-word n-grams)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self._word_cache: dict[str, np.uint64] = {}

    # vectorized shingle hashing (VERDICT r01 fix #5): md5 once per UNIQUE
    # word (cached across docs — vocabulary repeats heavily), then a numpy
    # polynomial rolling combination over the word-hash array. Seed-stable
    # and batch-composition-independent: a word's hash is a pure function
    # of the word.
    _WORD_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mixing constant

    def _word_hash(self, word: str) -> np.uint64:
        h = self._word_cache.get(word)
        if h is None:
            h = np.uint64(int.from_bytes(
                hashlib.md5(word.encode(), usedforsecurity=False).digest()[:8],
                "big"))
            if len(self._word_cache) < 1_000_000:
                self._word_cache[word] = h
        return h

    def shingles(self, text: str) -> np.ndarray:
        words = text.split()
        k = self.shingle_k
        wh = np.fromiter((self._word_hash(w) for w in words),
                         dtype=np.uint64, count=len(words))
        if len(words) < k:
            if not words:
                return np.zeros(1, dtype=np.uint64)
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for h in wh:
                    acc = acc * self._WORD_POLY + h
            return np.array([acc], dtype=np.uint64)
        n = len(words) - k + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(k):  # k is tiny (3); the vector ops are the loop
                acc = acc * self._WORD_POLY + wh[j:j + n]
        return acc

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) via broadcasting, min over shingles
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)


class MinHashSignatures:
    """Actor-pool UDF: text → minhash signature + LSH band hashes."""

    def __init__(self, num_perm: int = 128, bands: int = 16,
                 shingle_k: int = 3, seed: int = 42,
                 text_column: str = "text"):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, shingle_k, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        out_doc: list[int] = []
        out_band: list[int] = []
        out_bucket: list[int] = []
        out_subkey: list[int] = []
        for doc_id, text in zip(doc_ids, texts):
            if text is None:
                continue
            sig = self.hasher.signature(text)
            digests = [
                hashlib.md5(
                    sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                    .tobytes(), usedforsecurity=False).digest()
                for b in range(self.bands)]
            for band in range(self.bands):
                # subkey: one byte from each of the next 8 bands' digests —
                # the oversized-bucket splitter (_expand_members) separates
                # members along OTHER bands' agreement, so a near-dup pair
                # split apart here still had those bands' own buckets as
                # catch paths (P(disagree all 8 neighbor bytes) ≈
                # (1−J^rows)^8 ≈ 1.5% at J=0.8, ≪ that at clique J≈1 where
                # oversized buckets actually occur). Identical-signature
                # cliques share every byte and are never split — no drops.
                sub = 0
                for i in range(8):
                    nb = digests[(band + 1 + i) % self.bands]
                    sub |= nb[0] << (i * 8)
                out_doc.append(doc_id)
                out_band.append(band)
                # uint64 bucket key: band in the top 16 bits, first 48
                # digest bits below (distinct digests colliding in 48 bits
                # merely MERGE two buckets → a few extra candidates that
                # exact verification removes; never a recall loss)
                out_bucket.append(_bucket_key(
                    band, int.from_bytes(digests[band][:6], "big")))
                out_subkey.append(sub)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(out_bucket, pa.uint64()),
            "subkey": pa.array(out_subkey, pa.uint64()),
        })


# Coarse hash partitions for the pair machinery: a groupby on the RAW
# bucket/pair key makes Ray call the group UDF once per tiny group (tens of
# thousands of Python calls); grouping on hash(key) % P instead co-locates
# whole key families so each UDF call processes ~n/P rows vectorized.
PAIR_PARTITIONS = 256


def _bucket_key(band: int, payload48: int) -> int:
    """uint64 bucket key: band index in the top 16 bits, 48 payload bits
    below. Numeric keys keep the partitioner and the per-partition sort
    fully vectorized (the old string keys cost a Python crc32 per bucket
    ROW — one per (doc, band) — in the shuffle's map side)."""
    return (band << 48) | (payload48 & ((1 << 48) - 1))


def _add_bucket_part(batch: pa.Table) -> pa.Table:
    key = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        part = (((key ^ (key >> np.uint64(29))) * np.uint64(2654435761))
                % np.uint64(PAIR_PARTITIONS)).astype(np.int32)
    return batch.append_column(pa.field("part", pa.int32()),
                               pa.array(part, pa.int32()))


_EMPTY_PAIRS = pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})


def _emit_all_pairs(mem: np.ndarray, a_out: list, b_out: list) -> None:
    if len(mem) < 2:
        return
    ii, jj = np.triu_indices(len(mem), 1)
    a_out.append(mem[ii])
    b_out.append(mem[jj])


def _expand_members(ids: np.ndarray, keys: np.ndarray, free_bits: np.ndarray,
                    n_chunks: int, a_out: list, b_out: list) -> None:
    """Pair expansion for one bucket's (unique) members, splitting
    oversized groups by additional ``subkey`` bits instead of truncating
    (ADVICE r02: MAX_BUCKET truncation silently dropped candidate pairs).

    ``keys`` is a per-member uint64 subkey; ``free_bits`` the subkey bit
    positions not yet conditioned on; the free bits are partitioned into
    ``n_chunks`` disjoint chunks and each member is recursed into every
    chunk's value-subgroup (duplicate emissions are removed downstream by
    ``_dedupe_pairs``).

    For simhash — subkey = the full 64-bit simhash, ``n_chunks = bands``,
    free bits = everything outside the bucket's own band — this preserves
    the hamming-radius guarantee EXACTLY: a pair with hamming ≤ bands−1
    differs in at most bands−1 of the ``n_chunks`` disjoint chunks, so it
    agrees on at least one chunk at every level (pigeonhole) and stays
    co-grouped until its group is small enough to emit all pairs.
    Identical-subkey groups (true duplicate cliques) bottom out and emit
    the full clique — the quadratic output of a genuine clique is the
    honest answer, never a drop.
    """
    if (len(ids) <= MAX_BUCKET or len(free_bits) == 0
            or len(np.unique(keys)) <= 1):
        _emit_all_pairs(ids, a_out, b_out)
        return
    chunks = [c for c in np.array_split(free_bits, n_chunks) if len(c)]
    for i, chunk in enumerate(chunks):
        rest = (np.concatenate([c for j, c in enumerate(chunks) if j != i])
                if len(chunks) > 1 else np.array([], dtype=free_bits.dtype))
        sub = np.zeros(len(keys), dtype=np.uint64)
        for b in chunk:
            sub = (sub << np.uint64(1)) | ((keys >> np.uint64(b)) & np.uint64(1))
        order = np.argsort(sub, kind="stable")
        svals = sub[order]
        bounds = np.nonzero(svals[1:] != svals[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(svals)]])
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sel = order[s:e]
            _expand_members(ids[sel], keys[sel], rest, n_chunks, a_out, b_out)


def _pairs_from_bucket_block(group: pa.Table, n_chunks: int = 8,
                             own_band_width: int | None = None) -> pa.Table:
    """All buckets of one coarse partition → candidate pairs. Bucket runs
    are found vectorized after a sort; small runs expand via
    np.triu_indices; runs over MAX_BUCKET split by extra ``subkey`` bits
    (``_expand_members``) when the bucket rows carry one, else cap+log
    (legacy fallback for subkey-less callers).

    ``own_band_width``: when the subkey embeds the bucket's own band bits
    at ``[band*width, (band+1)*width)`` (simhash: subkey = full hash;
    embeddings: subkey = full sign pattern), those bits are excluded from
    the split — the members already agree there. ``None`` means the subkey
    is built entirely from out-of-band material (minhash neighbor-band
    digest bytes) and all 64 bits are free."""
    if group.num_rows == 0:
        return _EMPTY_PAIRS
    buckets = group["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids_raw = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids_raw, buckets))
    buckets = buckets[order]
    ids = ids_raw[order]
    has_subkey = "subkey" in group.column_names
    keys = (group["subkey"].to_numpy(zero_copy_only=False)
            .astype(np.uint64)[order] if has_subkey else None)
    change = np.nonzero(buckets[1:] != buckets[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(buckets)]])
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        mem, first = np.unique(ids[s:e], return_index=True)
        if len(mem) < 2:
            continue
        if len(mem) <= MAX_BUCKET:
            _emit_all_pairs(mem, a_out, b_out)
            continue
        if has_subkey:
            mkeys = keys[s:e][first]
            if own_band_width:
                band = int(buckets[s] >> np.uint64(48))
                lo, hi = band * own_band_width, (band + 1) * own_band_width
                free = np.array([b for b in range(64) if not lo <= b < hi],
                                dtype=np.int64)
            else:
                free = np.arange(64, dtype=np.int64)
            _expand_members(mem, mkeys, free, n_chunks, a_out, b_out)
        else:
            dropped = (len(mem) * (len(mem) - 1)
                       - MAX_BUCKET * (MAX_BUCKET - 1)) // 2
            _log.warning(
                "LSH bucket %r has %d members > MAX_BUCKET=%d and no subkey; "
                "dropping %d candidate pairs", buckets[s], len(mem),
                MAX_BUCKET, dropped)
            _emit_all_pairs(mem[:MAX_BUCKET], a_out, b_out)
    if not a_out:
        return _EMPTY_PAIRS
    return pa.table({
        "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
        "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
    })


def _bucket_pairs(buckets_ds, n_chunks: int = 8,
                  own_band_width: int | None = None):
    """(doc_id, bucket[, subkey]) rows → deduped candidate pairs via the
    coarse partition scheme above (two skew-free shuffles total)."""
    import functools
    fn = functools.partial(_pairs_from_bucket_block, n_chunks=n_chunks,
                           own_band_width=own_band_width)
    pairs = (buckets_ds.map_batches(_add_bucket_part, batch_format="pyarrow")
                       .groupby("part")
                       .map_groups(fn, batch_format="pyarrow"))
    return _dedupe_pairs(pairs)


def _dedupe_pairs(pairs_ds):
    """Drop duplicate (doc_a, doc_b) rows produced by multiple bands/tables:
    coarse-partition groupby, then a vectorized arrow distinct per block."""

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * np.uint64(2654435761) + b)
                    % np.uint64(PAIR_PARTITIONS)).astype(np.int32)
        return batch.append_column(pa.field("part", pa.int32()),
                                   pa.array(part, pa.int32()))

    def distinct(group: pa.Table) -> pa.Table:
        return (group.select(["doc_a", "doc_b"])
                     .group_by(["doc_a", "doc_b"]).aggregate([]))

    return (pairs_ds.map_batches(add_part, batch_format="pyarrow")
                    .groupby("part")
                    .map_groups(distinct, batch_format="pyarrow")
                    .select_columns(["doc_a", "doc_b"]))


def minhash_lsh_candidates(ds, num_perm: int = 128, bands: int = 32,
                           shingle_k: int = 3, seed: int = 42,
                           text_column: str = "text"):
    """Dataset → candidate near-dup pairs (doc_a < doc_b), deduped.

    Default 32 bands × 4 rows: at the verification threshold J = 0.8 the
    per-pair miss probability is (1 − 0.8⁴)³² ≈ 5·10⁻⁸ — the Jaccard
    ground-truth oracle match is then deterministic in practice (16 × 8
    leaves ~5% miss at exactly J = 0.8). The wider bands admit more
    sub-threshold candidates, which the exact-Jaccard verify prunes."""
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k, "seed": seed,
                               "text_column": text_column},
        concurrency=(1, 8), batch_format="pyarrow")
    # subkey = neighbor-band digest bytes; oversized buckets split along
    # them (8 chunks of 8 bits = one neighbor band each) instead of
    # truncating — see MinHashSignatures.__call__ for the recall argument.
    return _bucket_pairs(sigs, n_chunks=8, own_band_width=None)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verification kernel for LSH pairs)."""
    def grams(t: str) -> set:
        words = t.split()
        if len(words) < k:
            return {" ".join(words)} if words else set()
        return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
    ga, gb = grams(text_a), grams(text_b)
    # Two empty/whitespace-only texts score 0.0, matching the DuckDB
    # Jaccard oracle CTE, which excludes pairs with an empty gram union
    # (ADVICE r02: returning 1.0 here made blank-doc pairs appear in the
    # Ray output but not the oracle's).
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


def verify_pairs_jaccard(pairs_ds, docs_lookup: dict[int, str],
                         threshold: float = 0.8, k: int = 3):
    """Verify candidate pairs with exact Jaccard. ``docs_lookup`` is the
    broadcast small side (ray.put once; read in every task) — for genuinely
    huge corpora swap for a join on doc_id instead."""
    import ray

    lookup_ref = ray.put(docs_lookup)

    def verify(batch: pa.Table, lookup=None) -> pa.Table:
        lk = ray.get(lookup_ref) if lookup is None else lookup
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        sims = [ngram_jaccard(lk.get(x, ""), lk.get(y, ""), k) for x, y in zip(a, b)]
        t = batch.append_column(
            pa.field("jaccard", pa.float64()),
            pa.array([round(s, 6) for s in sims], pa.float64()))
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["jaccard"], pa.scalar(threshold)))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -- simhash ----------------------------------------------------------------

_SIMHASH_HASHER: MinHasher | None = None


def simhash64(text: str, shingle_k: int = 3) -> int:
    """64-bit SimHash over word-``shingle_k``-gram features (vectorized:
    shingle hashes from the shared MinHasher kernel, bit unpack + sum in
    numpy). Shingle features — not unigrams — so the hamming distance of a
    near-dup pair tracks its n-gram Jaccard: on the synthetic corpus true
    pairs (J>=0.8) land at hamming<=7 while random pairs sit >=18, which
    banded bucketing with 8 bands separates exactly."""
    global _SIMHASH_HASHER
    if _SIMHASH_HASHER is None or _SIMHASH_HASHER.shingle_k != shingle_k:
        _SIMHASH_HASHER = MinHasher(num_perm=1, shingle_k=shingle_k)
    sh = _SIMHASH_HASHER.shingles(text)
    bits = np.unpackbits(
        sh.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch[text_column].to_pylist()
    hashes = [simhash64(t) if t is not None else None for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(hashes, pa.uint64()),
    })


def simhash_candidates(ds, text_column: str = "text", bands: int = 8,
                       probe_bits: int = 0):
    """Near-dup candidates by banded simhash.

    The contract banding can actually GUARANTEE is hamming-radius recall:
    every pair with hamming < ``bands`` shares at least one band chunk
    (pigeonhole over the 64/bands-bit chunks) — so downstream callers
    should verify candidates with exact hamming (``verify_pairs_hamming``,
    max_hamming = bands − 1), not a text-similarity threshold (a J ≥ 0.8
    shingle pair can sit at hamming 15 and legitimately escape banding).
    ``probe_bits=1`` additionally emits every 1-bit-flipped chunk variant
    (flips meet in the middle → tolerance 2 bits/band, guarantee
    3·bands − 1) at (1 + width) × the bucket rows AND sharply higher
    bucket occupancy — only worth it for narrow radii on huge corpora.
    At billion-doc scale drop to 4 bands × 16 bits (hamming ≤ 3) so
    per-bucket occupancy stays bounded.

    Oversized buckets (> MAX_BUCKET members) are NOT truncated (ADVICE
    r02): each bucket row carries the full simhash as ``subkey`` and
    ``_expand_members`` recursively splits big buckets into ``bands``
    disjoint chunks of the out-of-band bits — a pair with hamming ≤
    bands−1 agrees on at least one chunk at every level (pigeonhole), so
    the radius-recall guarantee holds at ANY corpus size (the old cap
    broke it beyond ~65k docs, when >256 docs per 2048 possible buckets
    becomes expected). The guarantee statement assumes the default
    ``probe_bits=0``."""
    width = 64 // bands

    def to_buckets(batch: pa.Table) -> pa.Table:
        out_doc, out_bucket, out_hash = [], [], []
        for doc_id, h in zip(batch["doc_id"].to_pylist(),
                             batch["simhash"].to_pylist()):
            if h is None:
                continue
            for band in range(bands):
                chunk = (h >> (band * width)) & ((1 << width) - 1)
                probes = [chunk]
                if probe_bits >= 1:
                    probes.extend(chunk ^ (1 << b) for b in range(width))
                for p in probes:
                    out_doc.append(doc_id)
                    out_bucket.append(_bucket_key(band, p))
                    out_hash.append(h)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "bucket": pa.array(out_bucket, pa.uint64()),
            "subkey": pa.array(out_hash, pa.uint64()),
        })

    sigs = ds.map_batches(simhash_batch,
                          fn_kwargs={"text_column": text_column},
                          batch_format="pyarrow")
    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")
    return _bucket_pairs(buckets, n_chunks=bands, own_band_width=width)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def verify_pairs_hamming(pairs_ds, simhashes: dict[int, int],
                         max_hamming: int = 7):
    """Verify candidate pairs with exact simhash hamming distance.
    ``simhashes`` is the broadcast small side (ray.put once); swap for a
    join on doc_id at corpus scale."""
    import ray

    sh_ref = ray.put(simhashes)

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lk = ray.get(sh_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        # A pair with either id missing from the simhash sidecar is
        # DROPPED (hamming = null), never verified against a sentinel
        # (ADVICE r02: the old 0 / 1<<63 defaults were hamming-1 apart, so
        # a doubly-missing pair passed verification spuriously).
        dist = [hamming64(lk[x], lk[y]) if x in lk and y in lk else None
                for x, y in zip(a, b)]
        t = batch.append_column(pa.field("hamming", pa.int32()),
                                pa.array(dist, pa.int32()))
        return t.filter(pc.less_equal(t["hamming"],
                                      pa.scalar(max_hamming, pa.int32())))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -- embedding cosine near-dup ---------------------------------------------

class HyperplaneLSH:
    """Multi-table random-hyperplane sign buckets for cosine near-dup
    (VERDICT r01 fix #2: L independent tables, candidate buckets unioned —
    standard OR-amplified cosine LSH; a single table misses near-dups that
    straddle one hyperplane).

    ``axis_aligned=True`` uses the standard-basis coordinates as planes
    (table t = dims [t*b, (t+1)*b)) — a deterministic quantizer that an
    external system (the driver's DuckDB oracle) can reproduce exactly.
    """

    def __init__(self, dim: int, num_tables: int = 8, planes_per_table: int = 8,
                 seed: int = 42, axis_aligned: bool = False):
        self.num_tables = num_tables
        self.planes_per_table = planes_per_table
        self.axis_aligned = axis_aligned
        if axis_aligned:
            assert num_tables * planes_per_table <= dim, \
                "axis-aligned tables must fit in the embedding dims"
            self.planes = np.eye(dim)[: num_tables * planes_per_table]
        else:
            rng = np.random.default_rng(seed)
            self.planes = rng.standard_normal(
                (num_tables * planes_per_table, dim)).astype(np.float64)

    def bucket_ids(self, vecs: np.ndarray) -> list[list[int]]:
        """Per-row list of uint64 bucket keys (table index in the top 16
        bits, sign-pattern bits below), one per table."""
        signs = (vecs @ self.planes.T) >= 0  # (n, T*b)
        b = self.planes_per_table
        weights = 1 << np.arange(b, dtype=np.uint64)
        out = []
        for t in range(self.num_tables):
            chunk = signs[:, t * b:(t + 1) * b].astype(np.uint64) @ weights
            out.append([_bucket_key(t, int(v)) for v in chunk])
        return [list(row) for row in zip(*out)]


def embedding_neardup_candidates(ds, dim: int = 64, num_tables: int = 8,
                                 planes_per_table: int = 8, seed: int = 42,
                                 axis_aligned: bool = False):
    """embeddings table → candidate pairs sharing ANY table's bucket,
    deduped across tables. One flat_map-style expansion (T rows per vec),
    one bucket groupby, one pair-dedup groupby — all keys are uniform
    hashes so the shuffles are skew-free."""
    lsh = HyperplaneLSH(dim, num_tables, planes_per_table, seed, axis_aligned)

    def to_buckets(batch: pa.Table) -> pa.Table:
        from pdf_inspector_ray.functions.similarity import _to_matrix
        vecs = _to_matrix(batch["embedding"])
        if vecs.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.uint64()),
                             "subkey": pa.array([], pa.uint64())})
        # subkey = the full multi-table sign pattern (≤64 bits), table t at
        # bits [t·b, (t+1)·b) — oversized buckets split along OTHER
        # tables' sign bits instead of truncating; pairs split apart
        # disagree with every other table and had only this bucket as a
        # catch path anyway (multi-table OR), while near-identical
        # vectors (the realistic oversized-bucket content) share all sign
        # bits and are never split.
        signs = (vecs @ lsh.planes.T) >= 0  # (n, T*b)
        b = lsh.planes_per_table
        wb = np.uint64(1) << np.arange(b, dtype=np.uint64)
        # (n, T) bucket matrix: per table, sign bits -> payload; key =
        # (t << 48) | payload — all numpy, no per-row Python
        payload = (signs.reshape(len(vecs), lsh.num_tables, b)
                   .astype(np.uint64) @ wb)
        tkeys = (np.arange(lsh.num_tables, dtype=np.uint64)
                 << np.uint64(48))
        buckets = tkeys[None, :] | (payload & np.uint64((1 << 48) - 1))
        nbits = min(64, signs.shape[1])
        weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        subkeys = signs[:, :nbits].astype(np.uint64) @ weights
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        T = lsh.num_tables
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, T), pa.int64()),
            "bucket": pa.array(buckets.ravel(), pa.uint64()),
            "subkey": pa.array(np.repeat(subkeys, T), pa.uint64()),
        })

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    return _bucket_pairs(buckets, n_chunks=num_tables,
                         own_band_width=planes_per_table)


def verify_pairs_cosine(pairs_ds, vectors: dict[int, "np.ndarray"],
                        threshold: float = 0.9):
    """Verify candidate pairs with exact cosine similarity. ``vectors`` is
    the broadcast small side (ray.put once); swap for a join at corpus
    scale."""
    import ray

    norm = {k: np.asarray(v, dtype=np.float64) for k, v in vectors.items()}
    for k, v in norm.items():
        n = np.linalg.norm(v)
        norm[k] = v / n if n else v
    vec_ref = ray.put(norm)

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lk = ray.get(vec_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        sims = []
        for x, y in zip(a, b):
            va, vb = lk.get(x), lk.get(y)
            sims.append(round(float(va @ vb), 6)
                        if va is not None and vb is not None else 0.0)
        t = batch.append_column(pa.field("cos_sim", pa.float64()),
                                pa.array(sims, pa.float64()))
        return t.filter(pc.greater_equal(t["cos_sim"], pa.scalar(threshold)))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# -- corpus-level dedup: components over verified pairs ---------------------

def connected_components(pairs_ds, num_partitions: int = 16,
                         max_iters: int = 32):
    """Verified near-dup pairs (doc_a, doc_b) → (node, label) with label =
    min doc_id of each connected component, for every doc that appears in
    a pair.

    Distributed iterative min-label propagation: per round, one hash join
    (labels onto edge sources) + one groupby-min — both shuffle only the
    EDGE-sized data (the near-dup pair set, a small fraction of the
    corpus), never the corpus itself. Converges in O(component diameter)
    rounds; near-dup clusters are dense (band collisions ≈ cliques) so
    2-4 rounds is typical. The per-round ``materialize()`` pins the small
    label/edge sets so each iteration reads the previous result instead of
    re-executing the whole lineage — this is the documented exception to
    "never materialize mid-pipeline" (tiny side only).
    """
    import pyarrow.compute as pc

    def to_edges(batch: pa.Table) -> pa.Table:
        a, b = batch["doc_a"], batch["doc_b"]
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    edges = pairs_ds.map_batches(to_edges,
                                 batch_format="pyarrow").materialize()

    from ray.data.aggregate import Min

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "label": batch["src"]})

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
                   .groupby("node")
                   .aggregate(Min("label", alias_name="label"))
                   .materialize())
    # Reduce-side hash join, hand-rolled with the coarse-partition pattern:
    # edge rows and label rows are tagged, unioned, co-located by
    # hash(key) % P, and matched vectorized inside one map_groups call per
    # partition. (Dataset.join would express this too, but as of Ray
    # 2.49 its finalize loses the schema of empty right partitions.)
    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"key": batch["src"], "dst": batch["dst"],
                         "label": pa.nulls(n, pa.int64())})

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"key": batch["node"], "dst": pa.nulls(n, pa.int64()),
                         "label": batch["label"]})

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((key * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(pa.field("part", pa.int32()),
                                   pa.array(part, pa.int32()))

    def probe(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_label = pc.is_valid(group["label"])
        lab = group.filter(is_label)
        edge = group.filter(pc.invert(is_label))
        if edge.num_rows == 0 or lab.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"node": edge["dst"],
                         "label": _lookup_by_key(edge["key"], lab["key"],
                                                 lab["label"])})

    prev_sum = None
    for _ in range(max_iters):
        tagged = (edges.map_batches(tag_edges, batch_format="pyarrow")
                       .union(labels.map_batches(tag_labels,
                                                 batch_format="pyarrow")))
        cand = (tagged.map_batches(add_part, batch_format="pyarrow")
                      .groupby("part")
                      .map_groups(probe, batch_format="pyarrow"))
        labels = (labels.union(cand)
                        .groupby("node")
                        .aggregate(Min("label", alias_name="label"))
                        .materialize())
        cur = labels.sum("label")  # monotone non-increasing per node
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels


def _anti_join_ids(docs_ds, drop_ds, id_column: str = "doc_id",
                   drop_column: str = "node",
                   num_partitions: int = PAIR_PARTITIONS):
    """Reduce-side LEFT ANTI join: keep the ``docs_ds`` rows whose
    ``id_column`` does NOT appear in ``drop_ds[drop_column]``. Tagged
    union + coarse hash(id) co-partition + vectorized ``pc.is_in`` probe —
    the same machinery as ``_attach_texts`` (Ray 2.49 ``Dataset.join``
    loses the schema of empty right partitions). Nothing is ever
    collected on the driver; both sides stream through one shuffle."""
    import pyarrow.compute as pc

    doc_schema = [(f.name, f.type) for f in docs_ds.schema().base_schema]

    def tag_docs(batch: pa.Table) -> pa.Table:
        t = batch.append_column(pa.field("__key", pa.int64()),
                                pc.cast(batch[id_column], pa.int64()))
        return t.append_column(pa.field("__isdrop", pa.bool_()),
                               pa.nulls(len(batch), pa.bool_()))

    def tag_drops(batch: pa.Table) -> pa.Table:
        cols = {name: pa.nulls(len(batch), typ) for name, typ in doc_schema}
        cols["__key"] = pc.cast(batch[drop_column], pa.int64())
        cols["__isdrop"] = pa.array([True] * len(batch), pa.bool_())
        return pa.table(cols)

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch["__key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((key * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(pa.field("__part", pa.int32()),
                                   pa.array(part, pa.int32()))

    def probe(group: pa.Table) -> pa.Table:
        is_drop = pc.is_valid(group["__isdrop"])
        docs = group.filter(pc.invert(is_drop))
        drops = group.filter(is_drop)
        if docs.num_rows and drops.num_rows:
            keep = pc.invert(pc.is_in(docs["__key"],
                                      value_set=drops["__key"].combine_chunks()))
            docs = docs.filter(keep)
        return pa.table({name: docs[name] for name, _ in doc_schema})

    tagged = (docs_ds.map_batches(tag_docs, batch_format="pyarrow")
                     .union(drop_ds.map_batches(tag_drops,
                                                batch_format="pyarrow")))
    return (tagged.map_batches(add_part, batch_format="pyarrow")
                  .groupby("__part")
                  .map_groups(probe, batch_format="pyarrow"))


# Above this many dropped ids the broadcast-set path risks driver memory;
# the anti-join path streams instead. At 100 TB with a 20-30% dup rate the
# dropped set is billions of ids — the join is the only viable shape.
NEARDUP_BROADCAST_LIMIT = 2_000_000


def neardup_kept_docs(docs_ds, components, id_column: str = "doc_id",
                      distributed: bool | None = None,
                      broadcast_limit: int = NEARDUP_BROADCAST_LIMIT):
    """Corpus-level near-dup dedup: keep each component's min doc_id plus
    every doc not in any pair.

    Default = size-gated (VERDICT r02 fix #2): the dropped-id count is
    read from the (already materialized, edge-sized) components dataset;
    below ``broadcast_limit`` the ids are broadcast once with ``ray.put``
    and applied as a per-batch mask (no shuffle), above it — or with
    ``distributed=True`` — a reduce-side left anti join streams both
    sides through one co-partition shuffle with NO driver-side collect.
    Both paths are pinned equal in tests."""
    import pyarrow.compute as pc
    import ray

    def to_dropped(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch["label"], batch["node"])
        return pa.table({"node": batch["node"].filter(mask)})

    dropped_ds = components.map_batches(to_dropped, batch_format="pyarrow")
    return _mask_dropped_ids(docs_ds, dropped_ds, id_column=id_column,
                             distributed=distributed,
                             broadcast_limit=broadcast_limit)


def _mask_dropped_ids(docs_ds, dropped_ds, id_column: str = "doc_id",
                      distributed: bool | None = None,
                      broadcast_limit: int = NEARDUP_BROADCAST_LIMIT):
    """Filter ``docs_ds`` down to rows whose id is NOT in
    ``dropped_ds["node"]`` — the shared tail of every cluster-dedup
    operator. Size-gated: below ``broadcast_limit`` the (edge-sized)
    dropped ids are broadcast once with ``ray.put`` and applied as a
    per-batch ``pc.is_in`` mask (no shuffle); above it a reduce-side
    left anti join streams both sides with no driver-side collect."""
    import pyarrow.compute as pc
    import ray

    if distributed is None:
        distributed = dropped_ds.count() > broadcast_limit
    if distributed:
        return _anti_join_ids(docs_ds, dropped_ds, id_column=id_column)

    chunks = [batch["node"].combine_chunks()
              for batch in dropped_ds.iter_batches(batch_format="pyarrow")]
    dropped = (pc.unique(pa.concat_arrays(chunks)) if chunks
               else pa.array([], pa.int64()))
    dropped_ref = ray.put(dropped)

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(dropped_ref)
        mask = pc.invert(pc.is_in(batch[id_column], value_set=drop))
        return batch.filter(mask)

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def neardup_best_docs(docs_ds, components, score_ds,
                      id_column: str = "doc_id",
                      score_columns: tuple = ("stopword_count", "n_chars"),
                      distributed: bool | None = None,
                      broadcast_limit: int = NEARDUP_BROADCAST_LIMIT,
                      num_partitions: int = PAIR_PARTITIONS):
    """Quality-aware near-dup dedup: instead of keeping each component's
    MIN doc_id (``neardup_kept_docs``), keep the component member that
    maximizes the quality score — DESC on each ``score_columns`` entry in
    order, ties broken by min id — plus every doc not in any component.
    This is the curation shape real pipelines want: when a template
    cluster holds one full article and nine boilerplate stubs, min-id
    keeps whichever crawled first; argmax-by-quality keeps the article.

    Scores must be integer columns (exact comparisons, hash-stable
    twins). Dataflow: the (edge-sized) components attach their scores via
    ``_attach_side_column`` reduce-side joins — only component members,
    never the corpus, pay the join — then ONE tiny groupby(label) picks
    the winner per component and emits the losers as dropped ids, applied
    with the same size-gated mask / anti-join tail as
    ``neardup_kept_docs``. At 100 TB every exchange here is bounded by
    the verified-pair set, not the corpus."""
    import pyarrow.compute as pc

    # A pair-free corpus yields an empty, schema-less components dataset
    # (Ray 2.49 reports schema()=None); nothing is dropped.
    if components.schema() is None:
        return docs_ds

    labeled = components
    for col in score_columns:
        labeled = _attach_side_column(labeled, score_ds, "node", col,
                                      src_key=id_column, src_col=col,
                                      out_type=pa.int64(),
                                      num_partitions=num_partitions)

    cols = tuple(score_columns)

    def pick_dropped(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64())})
        node = group["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [node]
        # np.lexsort sorts by the LAST key first: append scores in
        # reverse so the FIRST score column is the primary sort, negated
        # for DESC; a missing score (doc absent from score_ds) sorts
        # last via -1.
        for col in reversed(cols):
            s = pc.coalesce(group[col], pa.scalar(-1, pa.int64()))
            keys.append(-s.to_numpy(zero_copy_only=False).astype(np.int64))
        order = np.lexsort(tuple(keys))
        return pa.table({"node": pa.array(node[order[1:]], pa.int64())})

    dropped_ds = (labeled.groupby("label")
                         .map_groups(pick_dropped, batch_format="pyarrow"))
    return _mask_dropped_ids(docs_ds, dropped_ds, id_column=id_column,
                             distributed=distributed,
                             broadcast_limit=broadcast_limit)


# -- distributed pair verification (the corpus-scale path) ------------------

def _lookup_by_key(probe_keys, src_keys, src_vals) -> pa.Array:
    """Vectorized left-join lookup: for each int64 key in ``probe_keys``
    return the ``src_vals`` element whose ``src_keys`` entry matches, else
    null. numpy argsort+searchsorted on the keys, one Arrow ``take`` with
    null indices for the misses — no Python per-row probe, and it works
    for ANY value type (Acero's hash join rejects nested payload columns
    like ``list<float>`` embeddings, which this path must carry)."""
    vals = src_vals.combine_chunks() if isinstance(
        src_vals, pa.ChunkedArray) else src_vals
    n = len(probe_keys)
    if len(src_keys) == 0:
        return pa.nulls(n, vals.type)
    sk = np.asarray(src_keys.to_numpy(zero_copy_only=False), dtype=np.int64)
    pk = np.asarray(probe_keys.to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    order = np.argsort(sk, kind="stable")
    sk_sorted = sk[order]
    pos = np.searchsorted(sk_sorted, pk)
    pos_c = np.minimum(pos, len(sk_sorted) - 1)
    found = sk_sorted[pos_c] == pk
    idx = order[pos_c].astype(np.float64)
    idx[~found] = np.nan  # null indices -> null output rows
    return vals.take(pa.array(idx, pa.int64(), from_pandas=True))


def _attach_side_column(pairs_ds, src_ds, pair_key: str, out_col: str,
                        src_key: str = "doc_id", src_col: str = "text",
                        out_type: "pa.DataType | None" = None,
                        num_partitions: int = PAIR_PARTITIONS):
    """Reduce-side hash join: attach ``src_ds[src_col]`` of the row whose
    ``src_key`` equals the pair's ``pair_key`` to each pair row as
    ``out_col``. Tagged union + coarse hash(key) co-partition +
    vectorized probe — the same pattern as connected_components
    (Dataset.join's empty-partition schema bug). Works for any attachable
    type (text, uint64 simhash, list<float> embedding)."""
    import pyarrow.compute as pc

    if out_type is None:
        out_type = pa.large_string()

    def tag_pairs(batch: pa.Table) -> pa.Table:
        t = batch.append_column(pa.field("__key", pa.int64()),
                                batch[pair_key])
        return t.append_column(pa.field("__side", out_type),
                               pa.nulls(len(batch), out_type))

    def tag_src(batch: pa.Table) -> pa.Table:
        cols = {name: pa.nulls(len(batch), typ)
                for name, typ in pair_schema}
        cols["__key"] = batch[src_key]
        cols["__side"] = pc.cast(batch[src_col], out_type)
        return pa.table(cols)

    # pair schema must be known to make src rows union-compatible
    pair_schema = [(f.name, f.type) for f in pairs_ds.schema().base_schema]

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch["__key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((key * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(pa.field("__part", pa.int32()),
                                   pa.array(part, pa.int32()))

    def probe(group: pa.Table) -> pa.Table:
        is_src = pc.is_valid(group["__side"])
        srcs = group.filter(is_src)
        pairs = group.filter(pc.invert(is_src))
        if pairs.num_rows == 0:
            empty = {f: pa.array([], t) for f, t in pair_schema}
            empty[out_col] = pa.array([], out_type)
            return pa.table(empty)
        out = {f: pairs[f] for f, _ in pair_schema}
        out[out_col] = _lookup_by_key(pairs["__key"], srcs["__key"],
                                      srcs["__side"])
        return pa.table(out)

    tagged = (pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
                      .union(src_ds.map_batches(tag_src,
                                                batch_format="pyarrow")))
    return (tagged.map_batches(add_part, batch_format="pyarrow")
                  .groupby("__part")
                  .map_groups(probe, batch_format="pyarrow"))


def _attach_texts(pairs_ds, docs_ds, pair_key: str, out_col: str,
                  num_partitions: int = PAIR_PARTITIONS):
    return _attach_side_column(pairs_ds, docs_ds, pair_key, out_col,
                               src_key="doc_id", src_col="text",
                               out_type=pa.large_string(),
                               num_partitions=num_partitions)


def verify_pairs_jaccard_distributed(pairs_ds, docs_ds,
                                     threshold: float = 0.8, k: int = 3):
    """Join-based exact-Jaccard verification — the corpus-scale variant of
    ``verify_pairs_jaccard`` (whose broadcast dict assumes the doc texts
    fit one object). Two reduce-side joins attach text_a then text_b
    (shuffling only pair rows + the doc texts), then the same vectorized
    Jaccard filter. ``docs_ds`` must have (doc_id, text)."""
    import pyarrow.compute as pc

    with_a = _attach_texts(pairs_ds, docs_ds, "doc_a", "__text_a")
    with_ab = _attach_texts(with_a, docs_ds, "doc_b", "__text_b")

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["__text_a"].to_pylist()
        b = batch["__text_b"].to_pylist()
        sims = [ngram_jaccard(x or "", y or "", k) for x, y in zip(a, b)]
        t = batch.append_column(
            pa.field("jaccard", pa.float64()),
            pa.array([round(s, 6) for s in sims], pa.float64()))
        t = t.filter(pc.greater_equal(t["jaccard"], pa.scalar(threshold)))
        drop = [c for c in ("__text_a", "__text_b") if c in t.column_names]
        for c in drop:
            t = t.remove_column(t.schema.get_field_index(c))
        return t

    return with_ab.map_batches(verify, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.int32)


def verify_pairs_hamming_distributed(pairs_ds, simhash_ds,
                                     max_hamming: int = 7):
    """Join-based exact-hamming verification — the corpus-scale variant of
    ``verify_pairs_hamming`` (whose broadcast dict assumes the simhash
    sidecar fits one object). Two reduce-side joins attach the simhashes,
    then a vectorized SWAR popcount filter. Pairs with either id missing
    from the sidecar are dropped. ``simhash_ds`` must have
    (doc_id, simhash:uint64)."""
    import pyarrow.compute as pc

    with_a = _attach_side_column(pairs_ds, simhash_ds, "doc_a", "__sh_a",
                                 src_col="simhash", out_type=pa.uint64())
    with_ab = _attach_side_column(with_a, simhash_ds, "doc_b", "__sh_b",
                                  src_col="simhash", out_type=pa.uint64())

    def verify(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch["__sh_a"]),
                        pc.is_valid(batch["__sh_b"]))
        t = batch.filter(valid)
        a = t["__sh_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["__sh_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ham = _popcount64(np.bitwise_xor(a, b))
        t = t.append_column(pa.field("hamming", pa.int32()),
                            pa.array(ham, pa.int32()))
        t = t.filter(pc.less_equal(t["hamming"],
                                   pa.scalar(max_hamming, pa.int32())))
        for c in ("__sh_a", "__sh_b"):
            t = t.remove_column(t.schema.get_field_index(c))
        return t

    return with_ab.map_batches(verify, batch_format="pyarrow")


def verify_pairs_cosine_distributed(pairs_ds, emb_ds,
                                    threshold: float = 0.9,
                                    id_column: str = "vec_id",
                                    embedding_column: str = "embedding"):
    """Join-based exact-cosine verification — the corpus-scale variant of
    ``verify_pairs_cosine``. Two reduce-side joins attach the vectors
    (shuffling only pair rows + the referenced embeddings), then a
    vectorized normalized-dot filter. Pairs with either vector missing
    are dropped."""
    import pyarrow.compute as pc

    vec_t = pa.list_(pa.float64())
    src = emb_ds.map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b[id_column], pa.int64()),
                            "vec": pc.cast(b[embedding_column], vec_t)}),
        batch_format="pyarrow")
    with_a = _attach_side_column(pairs_ds, src, "doc_a", "__v_a",
                                 src_col="vec", out_type=vec_t)
    with_ab = _attach_side_column(with_a, src, "doc_b", "__v_b",
                                  src_col="vec", out_type=vec_t)

    def verify(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch["__v_a"]),
                        pc.is_valid(batch["__v_b"]))
        t = batch.filter(valid)
        if t.num_rows:
            from pdf_inspector_ray.functions.similarity import _to_matrix
            va = _to_matrix(t["__v_a"])
            vb = _to_matrix(t["__v_b"])
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            sims = np.round((va * vb).sum(axis=1) / (na * nb), 6)
        else:
            sims = np.zeros(0)
        t = t.append_column(pa.field("cos_sim", pa.float64()),
                            pa.array(sims, pa.float64()))
        t = t.filter(pc.greater_equal(t["cos_sim"], pa.scalar(threshold)))
        for c in ("__v_a", "__v_b"):
            t = t.remove_column(t.schema.get_field_index(c))
        return t

    return with_ab.map_batches(verify, batch_format="pyarrow")


# -- exact set-similarity join (AllPairs / PPJoin prefix filtering) ----------

def _doc_gram_rows(batch: pa.Table, text_column: str, id_column: str,
                   k: int) -> pa.Table:
    """One batch of docs → DISTINCT (doc_id, gram, sz) rows, where ``sz``
    is the doc's distinct-gram count. Gram semantics match
    ``ngram_jaccard`` (and the SQL oracle CTE): word k-grams for docs
    with ≥ k tokens, the whole whitespace-joined text as a single gram
    for docs with 1..k−1 tokens, nothing for empty docs. Distinct within
    the batch IS globally distinct — a doc lives in exactly one row."""
    import pyarrow.compute as pc

    from pdf_inspector_ray.functions.decontam import _gram_rows

    texts = batch[text_column]  # ChunkedArray — _gram_rows requires it
    ids = pc.cast(batch[id_column], pa.int64()).to_numpy(
        zero_copy_only=False)
    idx, grams = _gram_rows(texts, k)
    t = (pa.table({"row": pa.array(idx, pa.int64()), "gram": grams})
         .group_by(["row", "gram"]).aggregate([]))
    rows = t["row"].to_numpy(zero_copy_only=False)
    gram_arr = t["gram"].combine_chunks()

    # short docs (0 < tokens < k): single whole-text gram
    tok_lists = pc.split_pattern_regex(texts, r"\s+")
    reps = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    rr = np.repeat(np.arange(len(texts)), reps)
    ne = pc.not_equal(pc.list_flatten(tok_lists),
                      "").to_numpy(zero_copy_only=False)
    counts = np.bincount(rr[ne], minlength=len(texts)).astype(np.int64)
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        extra = pa.array([" ".join(texts[i].as_py().split())
                          for i in short], pa.string())
        rows = np.concatenate([rows, short])
        gram_arr = pa.concat_arrays([gram_arr, extra])
    sz = np.bincount(rows, minlength=len(texts)).astype(np.int64)
    return pa.table({
        id_column: pa.array(ids[rows], pa.int64()),
        "gram": gram_arr,
        "sz": pa.array(sz[rows], pa.int64()),
    })


def _prefix_pairs_block(group: pa.Table, threshold: float) -> pa.Table:
    """All prefix-posting buckets of one coarse partition → candidate
    pairs, with the PPJoin LENGTH filter: a pair only qualifies when
    sz_small ≥ τ·sz_big (else J ≤ sz_small/sz_big < τ), so each member
    pairs only with the sz-window [sz, sz/τ] above it — this, not a
    cap, bounds a hot posting list. No pair is ever dropped: exactness
    is the contract."""
    if group.num_rows == 0:
        return _EMPTY_PAIRS
    bkt = group["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    szs = group["sz"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((ids, szs, bkt))
    bkt, ids, szs = bkt[order], ids[order], szs[order]
    change = np.nonzero(bkt[1:] != bkt[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(bkt)]])
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        m_ids, m_szs = ids[s:e], szs[s:e]
        # a doc can reach one bucket via two hash-colliding grams — dedupe
        m_ids, first = np.unique(m_ids, return_index=True)
        m_szs = m_szs[first]
        o = np.lexsort((m_ids, m_szs))
        m_ids, m_szs = m_ids[o], m_szs[o]
        hi = np.searchsorted(m_szs, m_szs / threshold, side="right")
        # vectorized window expansion: member i pairs with [i+1, hi_i)
        lo = np.arange(len(m_ids)) + 1
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if not total:
            continue
        left = np.repeat(m_ids, counts)
        j_idx = (np.repeat(lo, counts)
                 + np.arange(total)
                 - np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]),
                             counts))
        right = m_ids[j_idx]
        a_out.append(np.minimum(left, right))
        b_out.append(np.maximum(left, right))
    if not a_out:
        return _EMPTY_PAIRS
    return pa.table({
        "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
        "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
    })


def jaccard_prefix_candidates(ds, threshold: float = 0.8, k: int = 3,
                              text_column: str = "text",
                              id_column: str = "doc_id",
                              num_partitions: int = PAIR_PARTITIONS):
    """EXACT-recall candidate pairs for word-k-gram Jaccard ≥ τ via
    prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    Search", WWW'07; Xiao et al. PPJoin) — the non-probabilistic sibling
    of ``minhash_lsh_candidates``: every pair with J ≥ τ is emitted
    (completeness is a theorem, not a probability), false candidates die
    in exact verification.

    Dataflow (three skew-free shuffles, all gram/doc-keyed):
      1. docs → distinct (doc, gram, sz) rows → co-partition by
         hash(gram): per-partition df counting is GLOBAL df (all copies
         of a gram land together).
      2. re-partition by hash(doc): per doc, order grams by the global
         (df asc, gram asc) order — rarest first — and keep only the
         PREFIX of length sz − ⌈τ·sz⌉ + 1. Any pair with J ≥ τ must
         share a gram inside both prefixes (with the length filter
         |y| ≥ τ|x|, the required overlap ⌈τ(|x|+|y|)/(1+τ)⌉ ≥ ⌈τ|x|⌉,
         so missing the prefix bounds overlap below it).
      3. prefix rows → bucket by gram hash → windowed pair expansion
         with the length filter, then global pair dedup.

    The prefix cuts candidate volume by ~1/(1−τ)·df-ordering: common
    grams (huge posting lists) sit last in the order and enter only the
    prefixes of docs that are mostly MADE of common grams."""
    import functools

    import pyarrow.compute as pc

    from pdf_inspector_ray.functions.decontam import _gram_hash

    def to_rows(batch: pa.Table) -> pa.Table:
        t = _doc_gram_rows(batch, text_column, id_column, k)
        h = (_gram_hash(t["gram"].combine_chunks()) if t.num_rows
             else np.zeros(0, dtype=np.uint64))
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    _ROWS_SCHEMA = pa.schema([(id_column, pa.int64()),
                              ("gram", pa.string()), ("sz", pa.int64()),
                              ("df", pa.int64())])

    def with_df(group: pa.Table) -> pa.Table:
        """Per gram-partition: attach each gram's GLOBAL df."""
        if group.num_rows == 0:
            return _ROWS_SCHEMA.empty_table()
        enc = group["gram"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            id_column: group[id_column], "gram": group["gram"],
            "sz": group["sz"],
            "df": pa.array(df[codes], pa.int64()),
        })

    def add_doc_part(batch: pa.Table) -> pa.Table:
        key = batch[id_column].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((key * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__dpart", pa.array(part, pa.int32()))

    _PREFIX_SCHEMA = pa.schema([("doc_id", pa.int64()),
                                ("bucket", pa.uint64()),
                                ("sz", pa.int64())])

    def prefix_rows(group: pa.Table) -> pa.Table:
        """Per doc-partition: keep each doc's df-order prefix. The
        (doc, df, gram) multi-key sort runs in Arrow C++ — gram strings
        never materialize into Python."""
        if group.num_rows == 0:
            return _PREFIX_SCHEMA.empty_table()
        order = pc.sort_indices(group, sort_keys=[
            (id_column, "ascending"), ("df", "ascending"),
            ("gram", "ascending")])  # global order = (df asc, gram asc)
        g = group.take(order)
        doc = g[id_column].to_numpy(zero_copy_only=False)
        sz = g["sz"].to_numpy(zero_copy_only=False)
        run_start = np.flatnonzero(np.concatenate(
            [[True], doc[1:] != doc[:-1]]))
        rank = np.arange(len(doc)) - np.repeat(
            run_start,
            np.diff(np.concatenate([run_start, [len(doc)]])))
        p = sz - np.ceil(threshold * sz) + 1
        kept = g.filter(pa.array(rank < p))
        h = _gram_hash(kept["gram"].combine_chunks())
        return pa.table({
            "doc_id": pc.cast(kept[id_column], pa.int64()),
            "bucket": pa.array(h, pa.uint64()),
            "sz": pc.cast(kept["sz"], pa.int64()),
        })

    rows = (ds.map_batches(to_rows, batch_format="pyarrow")
              .groupby("__part").map_groups(with_df,
                                            batch_format="pyarrow")
              .map_batches(add_doc_part, batch_format="pyarrow")
              .groupby("__dpart").map_groups(prefix_rows,
                                             batch_format="pyarrow"))

    def block_part(batch: pa.Table) -> pa.Table:
        key = batch["bucket"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = (((key ^ (key >> np.uint64(29)))
                     * np.uint64(2654435761))
                    % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    expand = functools.partial(_prefix_pairs_block, threshold=threshold)
    pairs = (rows.map_batches(block_part, batch_format="pyarrow")
                 .groupby("part").map_groups(expand,
                                             batch_format="pyarrow"))
    return _dedupe_pairs(pairs)


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance over UTF-8 BYTES — the same definition
    as DuckDB's ``levenshtein()`` (probed empirically:
    levenshtein('é','a') = 2, i.e. byte- not codepoint-based), so the
    integer result is oracle-exact by construction. Row-DP with the
    sequential insert chain closed in vector form: each row computes
    the delete/substitute candidates in one numpy step, then resolves
    cur[j] = min_k<=j (cand[k] + (j-k)) via ``np.minimum.accumulate`` on
    (cand - j) — O(len(a)) numpy ops total, no per-cell Python."""
    aa = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    la, lb = len(aa), len(bb)
    if not la:
        return lb
    if not lb:
        return la
    steps = np.arange(lb + 1, dtype=np.int64)
    prev = steps.copy()
    for i in range(la):
        cand = np.minimum(prev[1:] + 1, prev[:-1] + (bb != aa[i]))
        seq = np.concatenate(([np.int64(i + 1)], cand)) - steps
        prev = np.minimum.accumulate(seq) + steps
    return int(prev[-1])


def verify_pairs_levenshtein(pairs_ds, docs_ds, cap: int = 64,
                             alias: str = "lev"):
    """Attach the exact edit distance of the two docs' first ``cap``
    codepoints to each candidate pair — the cheap lexical-proximity
    check a near-dup pipeline runs between LSH candidacy and expensive
    full-text verification. Texts are attached via the reduce-side
    ``_attach_side_column`` joins (pairs pay the join, never the
    corpus); the cap bounds the per-pair DP at O(cap²) regardless of
    document length, and is mirrored by ``substr(text, 1, cap)`` in the
    SQL twin (both sides slice codepoints)."""
    import pyarrow.compute as pc

    if pairs_ds.schema() is None:  # pair-free corpus (Ray empty-ds quirk)
        return pairs_ds

    with_a = _attach_side_column(pairs_ds, docs_ds, "doc_a", "__text_a")
    with_b = _attach_side_column(with_a, docs_ds, "doc_b", "__text_b")

    def compute(batch: pa.Table) -> pa.Table:
        ta = batch["__text_a"].to_pylist()
        tb = batch["__text_b"].to_pylist()
        lev = [levenshtein((x or "")[:cap], (y or "")[:cap])
               for x, y in zip(ta, tb)]
        out = batch.drop_columns(["__text_a", "__text_b"])
        return out.append_column(alias, pa.array(lev, pa.int64()))

    return with_b.map_batches(compute, batch_format="pyarrow")


def prefix_contained_docs(ds, text_column: str = "text",
                          id_column: str = "doc_id", min_len: int = 16):
    """Docs whose full text is a STRICT prefix of another doc's text —
    the cheap cousin of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): truncated re-crawls
    and stale partial snapshots are prefix-contained in their superset
    document and should be dropped.

    Dataflow: bucket by the first ``min_len`` codepoints (a strict
    prefix pair necessarily shares them, so the bucket groupby is an
    exact candidate partition — no recall loss); within each bucket,
    sort the UNIQUE texts and test each against only its immediate
    successor. That adjacency test is exact, not a heuristic: in any
    lexicographic order, every string strictly between a prefix ``s``
    and its superstring ``t`` itself starts with ``s``, so ``s`` is a
    prefix of some bucket-mate iff it is a prefix of its immediate
    sorted successor. Per-bucket work is O(u log u) on u unique texts,
    vectorized (numpy unique + elementwise startswith), never all-pairs.

    Docs shorter than ``min_len`` are out of scope (mirror the SQL twin
    with ``len(text) >= min_len``; they're covered by ``exact_dedup``).
    At corpus scale pick ``min_len`` long enough that boilerplate
    headers don't pile into one hot bucket — the bucket key is the
    partition key."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.is_valid(batch[text_column]),
                       pc.greater_equal(
                           pc.utf8_length(batch[text_column]), min_len))
        batch = batch.filter(keep)
        bucket = pc.utf8_slice_codeunits(batch[text_column], 0, min_len)
        return pa.table({"bucket": bucket,
                         "doc_id": batch[id_column],
                         "text": batch[text_column]})

    def find(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        texts = group["text"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(texts, return_inverse=True)
        if len(uniq) < 2:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        u = uniq.astype(str)  # U-dtype for the vectorized char kernels
        contained = np.zeros(len(u), dtype=bool)
        lens = np.char.str_len(u)
        contained[:-1] = (lens[1:] > lens[:-1]) & np.char.startswith(
            u[1:], u[:-1])
        out = ids[contained[inv]]
        return pa.table({"doc_id": pa.array(np.sort(out), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(find, batch_format="pyarrow"))
