"""Frozen golden outputs (tests/golden/): full-markdown byte equality per
fixture. This is the per-turn text-equality contract at the per-document
level — any heuristic drift fails here first.

Regenerate deliberately (after a reviewed behavior change) with:
    python -c "..."  # see git history of tests/golden/
"""

import json
import os

import pytest

from pdf_inspector_ray.pdfi.objects import PdfError
from pdf_inspector_ray.pdfi.process import process_pdf_mem
from pdf_inspector_ray.sources.pdfgen import fixture_pool

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(GOLDEN_DIR, "meta.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pool():
    return fixture_pool()


def test_all_fixtures_covered(meta, pool):
    assert set(meta) == set(pool)


def test_frozen_metadata(meta, pool):
    for name, data in sorted(pool.items()):
        expected = meta[name]
        try:
            r = process_pdf_mem(data)
            assert expected["error_kind"] is None, name
            assert r.pdf_type == expected["pdf_type"], name
            assert r.page_count == expected["page_count"], name
            assert round(r.detection.confidence, 4) == expected["confidence"], name
            assert r.detection.pages_with_text == expected["pages_with_text"], name
            assert r.detection.ocr_recommended == expected["ocr_recommended"], name
        except PdfError as e:
            assert e.kind == expected["error_kind"], name


def test_frozen_markdown(meta, pool):
    for name, data in sorted(pool.items()):
        path = os.path.join(GOLDEN_DIR, f"{name}.md")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            expected_md = f.read()
        r = process_pdf_mem(data)
        assert r.markdown == expected_md, f"{name}: markdown drift"
