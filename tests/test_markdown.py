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
