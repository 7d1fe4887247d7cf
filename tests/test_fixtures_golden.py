"""Golden behavior of the per-document library over the fixture pool
(FIXTURES.md §2): classification labels, routing, and key markdown features
per feature axis."""

import pytest

from pdf_inspector_ray.pdfi.detect import detect_pdf_type_mem
from pdf_inspector_ray.pdfi.objects import PdfError
from pdf_inspector_ray.pdfi.process import process_pdf_mem
from pdf_inspector_ray.sources.pdfgen import fixture_pool


@pytest.fixture(scope="module")
def pool():
    return fixture_pool()


@pytest.fixture(scope="module")
def results(pool):
    out = {}
    for name, data in pool.items():
        try:
            out[name] = process_pdf_mem(data)
        except PdfError as e:
            out[name] = e
    return out


EXPECTED_TYPES = {
    "f01_tj_simple": "TextBased",
    "f02_tj_arraykern": "TextBased",
    "f03_type0_tounicode": "TextBased",
    "f04_onebyte_cmap": "TextBased",
    "f05_differences": "TextBased",
    "f06_scanned": "Scanned",
    "f07_mixed_template": "Mixed",
    "f08_multicolumn": "TextBased",
    "f09_headers_lists_code": "TextBased",
    "f10_table_smallfont": "TextBased",
    "f11_table_bodyfont": "TextBased",
    "f12_links_images": "TextBased",
    "f13_form_xobject": "TextBased",
    "f14_dropcap_ligatures": "TextBased",
    "f15_pagenumbers_toc": "TextBased",
    "f16_cjk": "TextBased",
    "f17_multipage_table": "TextBased",
    "f19_xrefstream": "TextBased",
    "f20_manypages": "TextBased",
    "f22_textops": "TextBased",
    "f23_dropcap_captions": "TextBased",
    "f24_chaotic_order": "TextBased",
    "f25_type3_font": "TextBased",
    "f26_incremental_update": "TextBased",
    "f27_three_columns": "TextBased",
    "f28_lzw": "TextBased",
    "f29_ascii85": "TextBased",
    "f30_runlength": "TextBased",
    "f31_filter_chain": "TextBased",
    "f32_bogus_image_filter": "TextBased",
}


def test_classification_labels(results):
    for name, expected in EXPECTED_TYPES.items():
        r = results[name]
        assert not isinstance(r, PdfError), f"{name}: {r}"
        assert r.pdf_type == expected, f"{name}: got {r.pdf_type}"


def test_corrupt_raises_typed_error(pool):
    with pytest.raises(PdfError):
        process_pdf_mem(pool["f18_corrupt"])


def test_encrypted_raises_encrypted_kind(pool):
    with pytest.raises(PdfError) as ei:
        process_pdf_mem(pool["f21_encrypted"])
    assert ei.value.kind == "Encrypted"


def test_manypages_sampling(results):
    d = results["f20_manypages"].detection
    assert d.pages_sampled == 5       # max_pages_to_sample
    assert d.pages_with_text == 4     # pages 1,3,5,7 text; 12 image-only
    assert d.confidence == pytest.approx(0.8)


def test_scanned_routes_early(results):
    r = results["f06_scanned"]
    assert r.markdown is None
    assert r.detection.ocr_recommended is True
    assert r.detection.confidence == pytest.approx(0.95)


def test_mixed_template_best_effort(results):
    r = results["f07_mixed_template"]
    assert r.markdown is not None  # best-effort extraction
    assert r.detection.ocr_recommended is True
    assert r.detection.confidence == pytest.approx(0.5)  # template_ratio=1.0


def test_title_extraction(results):
    assert results["f01_tj_simple"].detection.title == "Annual Report"


def test_tj_kern_spacing(results):
    md = results["f02_tj_arraykern"].markdown
    # -300 and -120 insert spaces (threshold 111.2); -50 and -80 do not
    assert "Hello world" in md
    assert "worldlings" in md
    assert "alpha betagamma" in md


def test_cid_tounicode_decode(results):
    md = results["f03_type0_tounicode"].markdown
    assert "HELLO WORLD" in md
    assert "KERN GAP" in md   # TJ -400 kern
    assert "abc" in md        # bfrange array form


def test_onebyte_cmap_no_cjk_garbage(results):
    md = results["f04_onebyte_cmap"].markdown
    assert "By Payment Received" in md
    assert "䉹" not in md


def test_differences_encoding(results):
    md = results["f05_differences"].markdown
    assert "café" in md
    assert "mañana" in md
    assert "—" in md


def test_multicolumn_reading_order(results):
    md = results["f08_multicolumn"].markdown
    assert md.index("left column line 24") < md.index("right column line 0")
    assert md.startswith("# Spanning Title")


def test_heading_tiers(results):
    md = results["f09_headers_lists_code"].markdown
    assert "# Document Title Level One" in md
    assert "## Section Heading Level Two" in md
    assert "### Subsection Level Three" in md
    assert "- First bullet item" in md


def test_smallfont_table(results):
    md = results["f10_table_smallfont"].markdown
    assert "| Region" in md
    assert "| ---" in md
    assert "| North" in md and "12.5" in md


def test_bodyfont_table_and_paragraph_negative(results):
    md = results["f11_table_bodyfont"].markdown
    assert "| Part" in md and "NA555" in md
    # paragraph page must not become a table: exactly one separator line
    assert "ordinary paragraph" in md
    sep_lines = [l for l in md.splitlines() if l.startswith("| ---")]
    assert len(sep_lines) == 1


def test_links_and_images(results):
    md = results["f12_links_images"].markdown
    assert "[https://example.com/spec](https://example.com/spec)" in md
    assert "![Image: Im1](image)" in md


def test_form_xobject_text(results):
    md = results["f13_form_xobject"].markdown
    assert "Stamped form text" in md


def test_ligatures_and_hyphen_fix(results):
    md = results["f14_dropcap_ligatures"].markdown
    assert "first flower" in md           # ﬁ/ﬂ expanded
    assert "micro-services" in md         # spaced hyphen rejoined


def test_page_numbers_and_dot_leaders(results):
    md = results["f15_pagenumbers_toc"].markdown
    assert " ... " in md                  # dot leaders collapsed
    # standalone page-number items filtered (extractor) or lines removed
    for line in md.splitlines():
        assert line.strip() not in ("1", "2")


def test_cjk_no_spurious_spaces(results):
    md = results["f16_cjk"].markdown
    assert "日本語のテキスト抽出" in md


def test_multipage_table_merge(results):
    md = results["f17_multipage_table"].markdown
    # continuation merge: ONE header, all 12 data rows
    assert md.count("| Code") == 1
    assert "X000" in md and "X011" in md


def test_textops_tstar_quote_tm(results):
    md = results["f22_textops"].markdown
    assert "# Scaled Title Line" in md         # Tm scale 2 -> 24pt -> H1
    assert "second line via Tstar" in md       # T* advanced the line
    assert "line from quote op" in md          # ' operator shows text
    # T*/' lines are distinct lines (joined as one paragraph, in order)
    assert md.index("first line via Td") < md.index("second line via Tstar")


def test_standalone_dropcap_merge(results):
    md = results["f23_dropcap_captions"].markdown
    assert "When the winter came" in md       # W merged into the paragraph
    assert "\nW\n" not in md                  # no orphan drop-cap line


def test_captions_own_line(results):
    md = results["f23_dropcap_captions"].markdown
    assert "Figure 3: seasonal temperature trends\n" in md
    assert "Source: village records office\n" in md


def test_utf16be_title(results):
    assert results["f23_dropcap_captions"].detection.title == "Über Winter"


def test_differences_bullets(results):
    md = results["f23_dropcap_captions"].markdown
    assert "- first bullet point" in md
    assert "- second bullet point" in md


def test_chaotic_order_y_sorted(results):
    md = results["f24_chaotic_order"].markdown
    order = [md.index(f"{w} line of the document body")
             for w in ("first", "second", "third", "fourth", "fifth", "sixth")]
    assert order == sorted(order)
    assert "form kernedtext" in md             # TJ inside a form XObject


def test_incremental_update_overrides(results):
    md = results["f26_incremental_update"].markdown
    assert "# Updated Report" in md
    assert "incremental update appended" in md
    assert "first paragraph of the report" not in md   # old body replaced


def test_three_column_reading_order(results):
    md = results["f27_three_columns"].markdown
    assert (md.index("alpha col line 24") < md.index("beta col line 0")
            < md.index("beta col line 24") < md.index("gamma col line 0"))
    assert "Spanning footer line" in md


def test_determinism(pool):
    a = process_pdf_mem(pool["f09_headers_lists_code"]).markdown
    b = process_pdf_mem(pool["f09_headers_lists_code"]).markdown
    assert a == b
