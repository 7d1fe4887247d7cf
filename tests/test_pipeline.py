"""Ray pipeline tests: per-turn text equality under stable turn ordering,
error-column discipline, salted-vs-sort agreement, resume semantics."""

import shutil

import pyarrow as pa
import pytest

from pdf_inspector_ray.sources.transcripts import (
    build_transcript_table,
    golden_expectations,
    write_transcript_corpus,
)

N_TURNS = 300


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_transcript_corpus(str(d), N_TURNS)
    return str(d)


@pytest.fixture(scope="module")
def corpus_table():
    return build_transcript_table(N_TURNS)


@pytest.fixture(scope="module")
def goldens(corpus_table):
    return golden_expectations(corpus_table)


@pytest.fixture(scope="module")
def flagship_df(ray_session, corpus_dir):
    from pdf_inspector_ray.pipelines.flagship import flagship, read_transcripts

    ds = read_transcripts(corpus_dir)
    return flagship(ds, concurrency=(1, 4)).to_pandas()


def test_row_count_preserved(flagship_df):
    assert len(flagship_df) == N_TURNS


def test_stable_turn_ordering(flagship_df):
    ordered = flagship_df[["conv_id", "turn_idx"]]
    resorted = ordered.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert ordered.reset_index(drop=True).equals(resorted)


def test_per_turn_text_equality(flagship_df, goldens):
    """THE correctness gate: every turn's (pdf_type, markdown, error) must
    equal the per-document golden call for its payload."""
    for _, row in flagship_df.iterrows():
        h = row["pdf_sha256"]
        is_corrupt = h.startswith("corrupt:")
        gtype, gmd, gerr = goldens[h]
        if is_corrupt:
            # corrupt payloads may either parse (truncation after objects)
            # or error; golden call decides
            pass
        assert row["pdf_type"] == gtype or (
            row["pdf_type"] is None and gtype is None), row["conv_id"]
        assert row["error_kind"] == gerr, (row["conv_id"], row["turn_idx"])
        assert row["markdown"] == gmd or (
            row["markdown"] is None and gmd is None), \
            (row["conv_id"], row["turn_idx"])


def test_error_column_discipline(flagship_df):
    errs = flagship_df[flagship_df.error_kind.notna()]
    assert len(errs) > 0  # ~5% corrupt payloads must surface
    assert set(errs.error_kind.unique()) <= {"Io", "Parse", "Encrypted",
                                             "InvalidStructure"}
    assert errs.markdown.isna().all()


def test_salted_equals_sorted(ray_session, corpus_dir, flagship_df):
    from pdf_inspector_ray.pipelines.flagship import flagship, read_transcripts

    ds = read_transcripts(corpus_dir)
    salted = flagship(ds, ordering="salted", num_buckets=8,
                      concurrency=(1, 4)).to_pandas()
    cols = ["conv_id", "turn_idx", "pdf_type", "markdown", "error_kind"]
    a = flagship_df[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = salted[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_salted_within_bucket_order(ray_session, corpus_dir):
    from pdf_inspector_ray.pipelines.flagship import read_transcripts
    from pdf_inspector_ray.pipelines.ordering import restore_turn_order

    ds = read_transcripts(corpus_dir)
    out = restore_turn_order(ds, strategy="salted", num_buckets=8)
    for batch in out.iter_batches(batch_format="pyarrow"):
        df = batch.to_pandas() if isinstance(batch, pa.Table) else batch
        for _, grp in df.groupby("part"):
            s = grp[["conv_id", "turn_idx"]].reset_index(drop=True)
            assert s.equals(
                s.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_resume_skips_completed(ray_session, corpus_dir, tmp_path):
    from pdf_inspector_ray.pipelines.flagship import (
        read_transcripts, run_to_partitioned_output)

    out_dir = str(tmp_path / "out")
    m1 = run_to_partitioned_output(read_transcripts(corpus_dir), out_dir,
                                   num_buckets=8, concurrency=(1, 4))
    assert m1["rows"] == N_TURNS
    assert m1["partitions_written_this_run"] == m1["partitions"]
    # second run: everything skipped, outputs unchanged
    import glob
    import hashlib
    before = {p: hashlib.sha256(open(p, "rb").read()).hexdigest()
              for p in sorted(glob.glob(out_dir + "/part=*/data.parquet"))}
    m2 = run_to_partitioned_output(read_transcripts(corpus_dir), out_dir,
                                   num_buckets=8, concurrency=(1, 4))
    assert m2["partitions_written_this_run"] == 0
    assert m2["partitions_skipped_this_run"] == m1["partitions"]
    after = {p: hashlib.sha256(open(p, "rb").read()).hexdigest()
             for p in sorted(glob.glob(out_dir + "/part=*/data.parquet"))}
    assert before == after


def test_partial_resume(ray_session, corpus_dir, tmp_path):
    """Kill-after-k simulation: delete some partitions' lineage, re-run,
    only those partitions are reprocessed and the result is identical."""
    import glob
    import os

    from pdf_inspector_ray.pipelines.flagship import (
        read_transcripts, run_to_partitioned_output)

    out_dir = str(tmp_path / "out2")
    run_to_partitioned_output(read_transcripts(corpus_dir), out_dir,
                              num_buckets=8, concurrency=(1, 4))
    parts = sorted(glob.glob(out_dir + "/part=*"))
    # simulate crash: nuke half the partitions
    for p in parts[: len(parts) // 2]:
        shutil.rmtree(p)
    m = run_to_partitioned_output(read_transcripts(corpus_dir), out_dir,
                                  num_buckets=8, concurrency=(1, 4))
    assert m["rows"] == N_TURNS
    assert m["partitions_written_this_run"] == len(parts) // 2
    assert not any(os.path.exists(p + "/.data.parquet.tmp") for p in parts)


def test_classify_pipeline(ray_session, corpus_dir):
    from pdf_inspector_ray.pipelines.flagship import (
        classify_pipeline, read_transcripts)

    out = classify_pipeline(read_transcripts(corpus_dir)).to_pandas()
    assert len(out) == N_TURNS
    ok = out[out.error_kind.isna()]
    assert set(ok.pdf_type.unique()) <= {"TextBased", "Scanned",
                                         "ImageBased", "Mixed"}


def test_golden_compare_join(ray_session, corpus_dir, flagship_df, corpus_table):
    """SURVEY §2.7 golden-compare join: 100% per-turn equality rate when
    comparing the pipeline against itself-as-golden."""
    import pyarrow as pa
    import ray.data

    from pdf_inspector_ray.functions.compare import compare_to_golden, equality_rate

    golden = pa.Table.from_pandas(
        flagship_df[["conv_id", "turn_idx", "pdf_type", "markdown",
                     "error_kind"]])
    ds = ray.data.from_pandas(flagship_df)
    verdicts = compare_to_golden(ds, golden)
    assert equality_rate(verdicts) == 1.0
    # perturb one golden row -> rate drops below 1 and names the column
    bad = golden.set_column(
        golden.schema.get_field_index("markdown"), "markdown",
        pa.array(["XX"] + golden["markdown"].to_pylist()[1:],
                 golden["markdown"].type))
    verdicts2 = compare_to_golden(ray.data.from_pandas(flagship_df), bad).to_pandas()
    assert (~verdicts2["match"]).sum() >= 1
    assert "markdown" in set(verdicts2.loc[~verdicts2["match"], "mismatch_column"])


def test_mega_conversation_salting_splits_buckets():
    """A 2000-turn mega-conversation must land in MULTIPLE buckets (no
    single reducer gets the whole conversation) and remain reconstructable
    from (conv_id, turn_idx)."""
    from pdf_inspector_ray.pipelines.ordering import DEFAULT_STRIDE, stable_bucket

    buckets = {stable_bucket("conv-000000", t // DEFAULT_STRIDE, 16)
               for t in range(2000)}
    assert len(buckets) == min(16, -(-2000 // DEFAULT_STRIDE))  # 4 blocks -> 4 buckets
    # deterministic across calls/processes (md5-based, not hash())
    again = {stable_bucket("conv-000000", t // DEFAULT_STRIDE, 16)
             for t in range(2000)}
    assert buckets == again


def test_golden_columns_match_stage_outputs(corpus_table):
    """The frozen golden_* oracle columns must equal what the classify and
    extract stages produce for the same payloads (the driver's DuckDB twin
    SELECTs these columns back, so drift here = a red CORRECTNESS row)."""
    from pdf_inspector_ray.stages.classify import classify_batch
    from pdf_inspector_ray.stages.extract_stage import ExtractRender

    inp = corpus_table.select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "pdf_sha256"])
    classified = classify_batch(inp)
    for out_col, g_col in [
        ("pdf_type", "golden_pdf_type"), ("page_count", "golden_page_count"),
        ("pages_sampled", "golden_pages_sampled"),
        ("pages_with_text", "golden_pages_with_text"),
        ("confidence", "golden_confidence"), ("title", "golden_title"),
        ("ocr_recommended", "golden_ocr_recommended"),
        ("error_kind", "golden_error_kind"),
    ]:
        assert classified[out_col].to_pylist() == corpus_table[g_col].to_pylist(), out_col
    extracted = ExtractRender()(inp)
    for out_col, g_col in [
        ("pdf_type", "golden_x_pdf_type"),
        ("page_count", "golden_x_page_count"),
        ("markdown", "golden_markdown"),
        ("error_kind", "golden_x_error_kind"),
    ]:
        assert extracted[out_col].to_pylist() == corpus_table[g_col].to_pylist(), out_col


def test_payload_pool_goldens_cover_corpus(corpus_table):
    from pdf_inspector_ray.sources.transcripts import payload_pool_goldens

    goldens = payload_pool_goldens()
    hashes = set(corpus_table["pdf_sha256"].to_pylist())
    assert hashes <= set(goldens)


def test_orphan_shards_from_crashed_run_are_ignored(ray_session, corpus_dir,
                                                    tmp_path):
    """A run that died after writing map-side shards (but before finalize)
    leaves an orphan _shards-<nonce> dir; a later run must produce correct
    output regardless (each run uses its own nonce-scoped shard root)."""
    import glob
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_inspector_ray.pipelines.flagship import (
        read_transcripts, run_to_partitioned_output)

    out_dir = str(tmp_path / "out")
    os.makedirs(os.path.join(out_dir, "_shards-deadbeefcafe", "part=0"),
                exist_ok=True)
    pq.write_table(
        pa.table({"conv_id": pa.array(["bogus"], pa.string()),
                  "turn_idx": pa.array([0], pa.int32()),
                  "part": pa.array([0], pa.int32())}),
        os.path.join(out_dir, "_shards-deadbeefcafe", "part=0",
                     "bogus.parquet"))

    m = run_to_partitioned_output(read_transcripts(corpus_dir), out_dir,
                                  num_buckets=8, concurrency=(1, 4))
    assert m["rows"] == N_TURNS
    # output contains no bogus rows
    rows = sum(pq.read_table(p).num_rows
               for p in glob.glob(out_dir + "/part=*/data.parquet"))
    assert rows == N_TURNS
    for p in glob.glob(out_dir + "/part=*/data.parquet"):
        t = pq.read_table(p, columns=["conv_id"])
        assert "bogus" not in set(t["conv_id"].to_pylist())


def test_salting_splits_mega_conversation():
    """A 2000-turn conversation must spread over multiple salted buckets
    with each bucket holding at most `stride` of its turns — the skew
    guarantee the ordering shuffle relies on."""
    import collections

    import pyarrow as pa

    from pdf_inspector_ray.pipelines.ordering import (
        DEFAULT_STRIDE, add_salted_partition)

    n = 2000
    batch = pa.table({
        "conv_id": pa.array(["conv-mega"] * n, pa.string()),
        "turn_idx": pa.array(range(n), pa.int32()),
    })
    parts = add_salted_partition(batch, num_buckets=16)["part"].to_pylist()
    counts = collections.Counter(parts)
    assert len(counts) >= 3  # spread across buckets
    assert max(counts.values()) <= 2 * DEFAULT_STRIDE  # no hot reducer


def test_conv_stats_partials(ray_session):
    import pyarrow as pa
    import ray.data
    from pdf_inspector_ray.pipelines.flagship import conv_stats

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
        "text": pa.array(["héllo", "xy", None, "zzz"]),
        "tool": pa.array(["", "pdf_reader", "pdf_reader", None]),
    })
    out = (conv_stats(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    assert list(out.n_turns) == [3, 1]
    assert list(out.n_tool_calls) == [2, 0]
    assert list(out.sum_chars) == [7, 3]  # utf8 codepoints, null -> 0
    assert list(out.max_turn_idx) == [2, 0]


def test_conv_turn_gaps_single_turn_null(ray_session):
    import pyarrow as pa
    import ray.data
    from pdf_inspector_ray.pipelines.flagship import conv_turn_gaps

    ts = pa.array([0, 5_000_000, 7_000_000, 99],
                  pa.timestamp("us"))
    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"]),
        # turn order deliberately scrambled vs row order
        "turn_idx": pa.array([2, 0, 1, 0], pa.int32()),
        "ts": ts,
    })
    out = (conv_turn_gaps(ray.data.from_arrow(t).repartition(2))
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    # conv a ordered by turn_idx: ts 5s, 7s, 0s -> gaps +2s, -7s
    import pandas as pd
    assert list(out.n_gaps) == [2, 0]
    assert out.sum_gap_us[0] == -5_000_000 and pd.isna(out.sum_gap_us[1])
    assert out.max_gap_us[0] == 2_000_000 and pd.isna(out.max_gap_us[1])
