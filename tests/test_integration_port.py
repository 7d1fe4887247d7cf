"""Behavioral ports of /root/reference/tests/integration_tests.rs
(the builder-level subset that pins heuristics; Rust-type tests like
Clone/Debug have no Python equivalent)."""

from pdf_inspector_ray.pdfi.detect import DetectionConfig
from pdf_inspector_ray.pdfi.extract import (
    TextItem,
    TextLine,
    group_into_lines,
    is_bold_font,
    is_italic_font,
)
from pdf_inspector_ray.pdfi.markdown import (
    MarkdownOptions,
    to_markdown,
    to_markdown_from_items,
    to_markdown_from_lines,
)


def make_text_item(text, x, y, font_size, page, font="Helvetica"):
    return TextItem(text, x, y, len(text) * font_size * 0.5, font_size,
                    font, font_size, page, is_bold_font(font),
                    is_italic_font(font))


def test_detection_config_default():
    c = DetectionConfig()
    assert c.max_pages_to_sample == 5
    assert c.min_text_ops_per_page == 3
    assert abs(c.text_page_ratio_threshold - 0.6) < 0.001


def test_text_line_text_method():
    line = TextLine([make_text_item("Hello", 100.0, 700.0, 12.0, 1),
                     make_text_item("World", 160.0, 700.0, 12.0, 1)],
                    700.0, 1)
    assert line.text() == "Hello World"


def test_text_line_empty():
    assert TextLine([], 700.0, 1).text() == ""


def test_group_into_lines_empty():
    assert group_into_lines([]) == []


def test_group_into_lines_same_line():
    items = [make_text_item("A", 100.0, 700.0, 12.0, 1),
             make_text_item("B", 120.0, 700.0, 12.0, 1),
             make_text_item("C", 140.0, 700.0, 12.0, 1)]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "A B C"


def test_group_into_lines_multiple_pages():
    items = [make_text_item("Page1Text", 100.0, 700.0, 12.0, 1),
             make_text_item("Page2Text", 100.0, 700.0, 12.0, 2)]
    lines = group_into_lines(items)
    assert len(lines) == 2
    assert lines[0].page == 1 and lines[1].page == 2


def test_group_into_lines_sorting_by_x():
    items = [make_text_item("Third", 200.0, 700.0, 12.0, 1),
             make_text_item("First", 50.0, 700.0, 12.0, 1),
             make_text_item("Second", 100.0, 700.0, 12.0, 1)]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "First Second Third"


def test_to_markdown_bullet_variations():
    for bullet in ("• Item", "○ Item", "● Item", "◦ Item"):
        md = to_markdown(bullet, MarkdownOptions())
        assert "- Item" in md, bullet
    for bullet in ("- Item", "* Item"):
        md = to_markdown(bullet, MarkdownOptions())
        assert bullet in md


def test_to_markdown_no_list_detection():
    md = to_markdown("• Item", MarkdownOptions(detect_lists=False))
    assert "•" in md


def test_to_markdown_code_keywords():
    for code in ("import foo", "export default", "const x = 5;",
                 "let y = 10;", "function test() {", "class MyClass {",
                 "def func():", "pub fn main() {", "async fn process() {",
                 "impl Trait {", "=> value", "-> Result", ":: io::Result"):
        md = to_markdown(code, MarkdownOptions())
        assert "```" in md, code


def test_to_markdown_no_code_detection():
    md = to_markdown("const x = 5;", MarkdownOptions(detect_code=False))
    assert "```" not in md


def test_non_code_text():
    md = to_markdown("This is regular text about programming.", MarkdownOptions())
    assert "```" not in md


def test_letter_list_items():
    md = to_markdown("a. Letter item", MarkdownOptions())
    assert "a. Letter item" in md


def test_markdown_from_items_empty():
    assert to_markdown_from_items([], MarkdownOptions()) == ""


def test_markdown_from_items_header_detection():
    items = [make_text_item("Title", 100.0, 750.0, 24.0, 1),
             make_text_item("Body text one", 100.0, 700.0, 12.0, 1),
             make_text_item("Body text two", 100.0, 680.0, 12.0, 1),
             make_text_item("Body text three", 100.0, 660.0, 12.0, 1)]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "# Title" in md
    assert "Body text" in md


def test_single_heading_tier_becomes_h1():
    items = [make_text_item("Section Title", 100.0, 700.0, 18.0, 1),
             make_text_item("body text one", 100.0, 650.0, 12.0, 1),
             make_text_item("body text two", 100.0, 630.0, 12.0, 1),
             make_text_item("body text three", 100.0, 610.0, 12.0, 1)]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "# Section Title" in md


def test_header_tier_ladder():
    items = [make_text_item("H1 Title", 100.0, 850.0, 24.0, 1),
             make_text_item("H2 Title", 100.0, 800.0, 18.0, 1),
             make_text_item("H3 Title", 100.0, 750.0, 15.0, 1),
             make_text_item("H4 Title", 100.0, 700.0, 14.5, 1),
             make_text_item("body text one", 100.0, 650.0, 12.0, 1),
             make_text_item("body text two", 100.0, 630.0, 12.0, 1),
             make_text_item("body text three", 100.0, 610.0, 12.0, 1)]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "# H1 Title" in md
    assert "## H2 Title" in md
    assert "### H3 Title" in md
    assert "#### H4 Title" in md


def test_monospace_font_names():
    for font in ("Courier", "Consolas", "Monaco", "Menlo", "Fira Code",
                 "JetBrains Mono", "Inconsolata", "DejaVu Sans Mono",
                 "Liberation Mono", "Fixed", "Terminal"):
        items = [make_text_item("code", 100.0, 700.0, 12.0, 1, font=font)]
        md = to_markdown_from_items(items, MarkdownOptions())
        assert "```" in md, font


def test_markdown_from_items_page_breaks():
    items = [make_text_item("Content on first page", 100.0, 700.0, 12.0, 1),
             make_text_item("Content on second page", 100.0, 700.0, 12.0, 2)]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "---" not in md
    assert "Content on first page" in md
    assert "Content on second page" in md


def test_markdown_from_lines_basic():
    lines = [TextLine([make_text_item("First", 100.0, 700.0, 12.0, 1)], 700.0, 1),
             TextLine([make_text_item("Second", 100.0, 680.0, 12.0, 1)], 680.0, 1)]
    md = to_markdown_from_lines(lines, MarkdownOptions())
    assert "First" in md and "Second" in md


def test_trailing_newline():
    md = to_markdown("Content", MarkdownOptions())
    assert md.endswith("\n")
    assert not md.endswith("\n\n")


# -- ports of integration_tests.rs:489-732 remainder ------------------------

def test_file_entry_points_nonexistent_file():
    """integration_tests.rs:489-506: every file-path entry point surfaces a
    missing path as a structured error, never a raw OSError."""
    import pytest

    from pdf_inspector_ray.pdfi.objects import PdfError
    from pdf_inspector_ray.pdfi.process import detect_pdf_type, process_pdf

    for fn in (process_pdf, detect_pdf_type):
        with pytest.raises(PdfError) as e:
            fn("/nonexistent/file.pdf")
        assert e.value.kind == "Io"


def test_detection_config_custom():
    c = DetectionConfig(max_pages_to_sample=10, min_text_ops_per_page=5,
                        text_page_ratio_threshold=0.8)
    assert c.max_pages_to_sample == 10
    assert c.min_text_ops_per_page == 5
    assert abs(c.text_page_ratio_threshold - 0.8) < 0.001


def test_markdown_options_default():
    o = MarkdownOptions()
    assert o.detect_headers and o.detect_lists and o.detect_code
    assert o.base_font_size is None


def test_markdown_options_custom():
    o = MarkdownOptions(detect_headers=False, detect_lists=True,
                        detect_code=False, base_font_size=14.0,
                        remove_page_numbers=False, format_urls=False,
                        fix_hyphenation=False, detect_bold=False,
                        detect_italic=False, include_images=False,
                        include_links=False)
    assert not o.detect_headers and o.detect_lists and not o.detect_code
    assert o.base_font_size == 14.0
    assert not (o.remove_page_numbers or o.format_urls or o.fix_hyphenation
                or o.detect_bold or o.detect_italic or o.include_images
                or o.include_links)


def test_to_markdown_basic_and_multiline():
    md = to_markdown("Hello World", MarkdownOptions())
    assert "Hello World" in md
    md = to_markdown("Line one\nLine two\nLine three", MarkdownOptions())
    assert "Line one" in md and "Line two" in md and "Line three" in md


def test_to_markdown_lists():
    md = to_markdown("• First\n• Second\n• Third", MarkdownOptions())
    assert "- First" in md and "- Second" in md and "- Third" in md
    md = to_markdown("- One\n- Two\n- Three", MarkdownOptions())
    assert "- One" in md and "- Two" in md
    md = to_markdown("1. First\n2. Second\n3. Third", MarkdownOptions())
    assert "1. First" in md and "2. Second" in md


def test_numbered_list_variations():
    for item in ("1. First", "2) Second", "10. Tenth"):
        md = to_markdown(item, MarkdownOptions())
        assert md.strip(), item


def test_code_syntax_patterns():
    for code in ("=> value", "-> Result", ":: io::Result"):
        md = to_markdown(code, MarkdownOptions())
        assert "```" in md, code


def test_code_special_chars():
    md = to_markdown("if (x > 0) { return y; }", MarkdownOptions())
    assert "```" in md


def test_to_markdown_empty_and_whitespace_lines():
    md = to_markdown("Para one\n\nPara two", MarkdownOptions())
    assert "Para one" in md and "Para two" in md
    md = to_markdown("Content\n   \nMore content", MarkdownOptions())
    assert "Content" in md and "More content" in md


def test_excessive_newlines_preserved_in_plain_text():
    md = to_markdown("Para one\n\n\n\n\nPara two", MarkdownOptions())
    assert "Para one" in md and "Para two" in md


def test_group_into_lines_different_lines():
    items = [make_text_item("Line1", 100.0, 700.0, 12.0, 1),
             make_text_item("Line2", 100.0, 680.0, 12.0, 1),
             make_text_item("Line3", 100.0, 660.0, 12.0, 1)]
    lines = group_into_lines(items)
    assert [ln.text() for ln in lines] == ["Line1", "Line2", "Line3"]


def test_group_into_lines_y_tolerance():
    items = [make_text_item("A", 100.0, 700.0, 12.0, 1),
             make_text_item("B", 150.0, 700.0, 12.0, 1)]
    lines = group_into_lines(items)
    assert len(lines) == 1
    assert lines[0].text() == "A B"


def test_markdown_from_items_single():
    md = to_markdown_from_items(
        [make_text_item("Hello", 100.0, 700.0, 12.0, 1)], MarkdownOptions())
    assert "Hello" in md


def test_markdown_from_items_h2_detection():
    items = [make_text_item("Title", 100.0, 750.0, 24.0, 1),
             make_text_item("Subtitle", 100.0, 700.0, 18.0, 1),
             make_text_item("body text one", 100.0, 650.0, 12.0, 1),
             make_text_item("body text two", 100.0, 630.0, 12.0, 1),
             make_text_item("body text three", 100.0, 610.0, 12.0, 1)]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "## Subtitle" in md


def test_markdown_from_items_monospace_code():
    items = [make_text_item("let x = 5", 100.0, 700.0, 12.0, 1, font="Courier")]
    md = to_markdown_from_items(items, MarkdownOptions())
    assert "```" in md and "let x = 5" in md


def test_text_line_single_item():
    line = TextLine([make_text_item("Single", 100.0, 700.0, 12.0, 1)],
                    700.0, 1)
    assert line.text() == "Single"
