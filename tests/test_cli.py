"""CLI surface tests (reference bins pdf2md / detect_pdf parity:
exit codes 1/2, --json fields)."""

import json
import subprocess
import sys

import pytest

from pdf_inspector_ray.sources.pdfgen import fixture_pool


@pytest.fixture(scope="module")
def pdf_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfs")
    pool = fixture_pool()
    paths = {}
    for name in ("f01_tj_simple", "f06_scanned", "f18_corrupt",
                 "f08_multicolumn", "f05_differences"):
        p = d / f"{name}.pdf"
        p.write_bytes(pool[name])
        paths[name] = str(p)
    return paths


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "pdf_inspector_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)


def test_detect_json(pdf_files):
    r = _run("detect", pdf_files["f01_tj_simple"], "--json")
    assert r.returncode == 0
    out = json.loads(r.stdout)
    assert out["pdf_type"] == "text_based"
    assert out["title"] == "Annual Report"
    assert out["page_count"] == 1


def test_pdf2md_stdout(pdf_files):
    r = _run("pdf2md", pdf_files["f01_tj_simple"])
    assert r.returncode == 0
    assert "# Annual Report" in r.stdout


def test_pdf2md_json(pdf_files):
    r = _run("pdf2md", pdf_files["f01_tj_simple"], "--json")
    out = json.loads(r.stdout)
    assert out["pdf_type"] == "text_based"
    assert out["markdown"].startswith("# Annual Report")


def test_pdf2md_ocr_exit_2(pdf_files):
    r = _run("pdf2md", pdf_files["f06_scanned"])
    assert r.returncode == 2
    assert "OCR" in r.stderr


def test_pdf2md_error_exit_1(pdf_files):
    r = _run("pdf2md", pdf_files["f18_corrupt"])
    assert r.returncode == 1
    assert "Error" in r.stderr


def test_output_file(pdf_files, tmp_path):
    out = tmp_path / "out.md"
    r = _run("pdf2md", pdf_files["f01_tj_simple"], str(out))
    assert r.returncode == 0
    assert out.read_text().startswith("# Annual Report")


def test_debug_pages(pdf_files):
    r = _run("debug", "pages", pdf_files["f08_multicolumn"], "1-1")
    assert r.returncode == 0
    assert "=== PAGE 1" in r.stdout
    assert "Spanning Title" in r.stdout


def test_debug_ygaps_paragraph_marker(pdf_files):
    r = _run("debug", "ygaps", pdf_files["f01_tj_simple"])
    assert r.returncode == 0
    assert "<<PARA>>" in r.stdout  # the fixture's inter-paragraph gap
    assert "Base font size" in r.stderr


def test_debug_ligatures_differences(pdf_files):
    r = _run("debug", "ligatures", pdf_files["f05_differences"])
    assert r.returncode == 0
    assert "Differences" in r.stdout
    assert "eacute" in r.stdout


def test_debug_order(pdf_files):
    r = _run("debug", "order", pdf_files["f08_multicolumn"], "1",
             "--contains", "line", "--x-window", "300", "400")
    assert r.returncode == 0
    assert "Y range" in r.stdout


def test_run_files_over_pdf_directory(ray_session, tmp_path):
    """S1 at corpus scale: a directory of raw PDF files drives the full
    resumable job via read_binary_files; output markdown must equal the
    per-document library's."""
    import glob

    import pyarrow.parquet as pq

    from pdf_inspector_ray.cli import main
    from pdf_inspector_ray.pdfi.process import process_pdf_mem
    from pdf_inspector_ray.sources.pdfgen import fixture_pool

    pool = fixture_pool()
    in_dir = tmp_path / "pdfs"
    in_dir.mkdir()
    names = ["f01_tj_simple", "f08_multicolumn", "f09_headers_lists_code"]
    for name in names:
        (in_dir / f"{name}.pdf").write_bytes(pool[name])
    out_dir = tmp_path / "out"
    rc = main(["run-files", "--input", str(in_dir),
               "--output", str(out_dir), "--num-buckets", "4",
               "--max-actors", "2"])
    assert rc == 0
    files = glob.glob(str(out_dir / "part=*" / "data.parquet"))
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    got = dict(zip(t["conv_id"].to_pylist(), t["markdown"].to_pylist()))
    assert set(got) == {f"{n}.pdf" for n in names}
    for name in names:
        want = process_pdf_mem(pool[name]).markdown
        assert got[f"{name}.pdf"] == want, name
