"""Conformance ports of /root/reference/src/markdown.rs:1622-1688 tests."""

from pdf_inspector_ray.pdfi.markdown import (
    MarkdownOptions,
    detect_header_level,
    format_list_item,
    is_code_like,
    is_list_item,
    to_markdown,
)


def test_is_list_item():
    assert is_list_item("• Item one")
    assert is_list_item("- Item two")
    assert is_list_item("* Item three")
    assert is_list_item("1. First")
    assert is_list_item("2) Second")
    assert is_list_item("a. Letter item")
    assert not is_list_item("Regular text")


def test_format_list_item():
    assert format_list_item("• Item") == "- Item"
    assert format_list_item("- Item") == "- Item"
    assert format_list_item("1. First") == "1. First"


def test_is_code_like():
    assert is_code_like("const x = 5;")
    assert is_code_like("function foo() {")
    assert is_code_like("import React from 'react'")
    assert not is_code_like("This is regular text.")


def test_detect_header_level():
    tiers = [24.0, 18.0, 15.0]
    assert detect_header_level(24.0, 12.0, tiers) == 1
    assert detect_header_level(18.0, 12.0, tiers) == 2
    assert detect_header_level(15.0, 12.0, tiers) == 3
    assert detect_header_level(12.0, 12.0, tiers) is None

    tiers = [15.0]
    assert detect_header_level(15.0, 12.0, tiers) == 1
    assert detect_header_level(14.0, 12.0, tiers) is None
    assert detect_header_level(12.0, 12.0, tiers) is None

    tiers = []
    assert detect_header_level(24.0, 12.0, tiers) == 1
    assert detect_header_level(18.0, 12.0, tiers) == 2
    assert detect_header_level(15.0, 12.0, tiers) == 3
    assert detect_header_level(14.5, 12.0, tiers) == 4
    assert detect_header_level(14.0, 12.0, tiers) is None
    assert detect_header_level(12.0, 12.0, tiers) is None

    tiers = [20.0]
    assert detect_header_level(13.0, 12.0, tiers) is None


def test_to_markdown():
    text = "• First item\n• Second item\n\nRegular paragraph."
    md = to_markdown(text, MarkdownOptions())
    assert "- First item" in md
    assert "- Second item" in md


def test_merge_continuation_tables_three_pages():
    """markdown.rs:267-368: a chain of 3 consecutive table-only pages with
    matching column counts merges into the first page's table."""
    from pdf_inspector_ray.pdfi.markdown import merge_continuation_tables

    def md_table(rows):
        out = ["| A   | B   |", "| --- | --- |"]
        out += [f"| {a}   | {b}   |" for a, b in rows]
        return "\n".join(out) + "\n"

    page_tables = {
        1: [(700.0, md_table([("a1", "b1")]))],
        2: [(700.0, md_table([("a2", "b2")]))],
        3: [(700.0, md_table([("a3", "b3")]))],
    }
    merge_continuation_tables(page_tables, {1, 2, 3})
    assert set(page_tables) == {1}
    merged = page_tables[1][0][1]
    assert "a1" in merged and "a2" in merged and "a3" in merged
    sep_lines = [l for l in merged.splitlines() if l.startswith("| ---")]
    assert len(sep_lines) == 1  # single separator row survives


def test_merge_continuation_stops_on_column_mismatch():
    from pdf_inspector_ray.pdfi.markdown import merge_continuation_tables

    two_col = "| A | B |\n| --- | --- |\n| x | y |\n"
    three_col = "| A | B | C |\n| --- | --- | --- |\n| x | y | z |\n"
    page_tables = {1: [(700.0, two_col)], 2: [(700.0, three_col)]}
    merge_continuation_tables(page_tables, {1, 2})
    assert set(page_tables) == {1, 2}  # no merge across differing widths


def test_merge_continuation_requires_table_only_pages():
    from pdf_inspector_ray.pdfi.markdown import merge_continuation_tables

    t = "| A | B |\n| --- | --- |\n| x | y |\n"
    page_tables = {1: [(700.0, t)], 2: [(700.0, t)]}
    merge_continuation_tables(page_tables, {2})  # page 1 has text -> no chain
    assert set(page_tables) == {1, 2}
