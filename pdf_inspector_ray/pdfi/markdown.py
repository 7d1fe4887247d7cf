"""Markdown conversion with structure detection.

Port of /root/reference/src/markdown.rs: MarkdownOptions (markdown.rs:16-56),
items→markdown pipeline (markdown.rs:116-239), font stats / heading tiers /
paragraph threshold (markdown.rs:1034-1170), drop-cap + heading merges
(markdown.rs:895-1027), the renderer state machine with Y-ordered table and
image insertion (markdown.rs:424-713), continuation-table merge
(markdown.rs:267-368), and the clean_markdown post-pass (markdown.rs:1353-1620).

Regexes are compiled at module import (the reference uses once_cell::Lazy) —
one compile per worker process.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from .extract import (
    ITEM_IMAGE,
    ITEM_LINK,
    ITEM_TEXT,
    TextItem,
    TextLine,
    group_into_lines,
)
from .tables import detect_tables, table_to_markdown


@dataclass
class MarkdownOptions:
    """markdown.rs:16-56 — the reference's extension surface; exposed as
    pipeline parameters in stages/extract.py."""

    detect_headers: bool = True
    detect_lists: bool = True
    detect_code: bool = True
    base_font_size: Optional[float] = None
    remove_page_numbers: bool = True
    format_urls: bool = True
    fix_hyphenation: bool = True
    detect_bold: bool = True
    detect_italic: bool = True
    include_images: bool = True
    include_links: bool = True


# -- plain-text → markdown (legacy, markdown.rs:60-113) ---------------------

def to_markdown(text: str, options: Optional[MarkdownOptions] = None) -> str:
    options = options or MarkdownOptions()
    out: list[str] = []
    in_list = False
    in_code_block = False
    for line in text.splitlines():
        trimmed = line.strip()
        if not trimmed:
            if in_list:
                in_list = False
            if in_code_block:
                out.append("```\n")
                in_code_block = False
            out.append("\n")
            continue
        if options.detect_lists and is_list_item(trimmed):
            out.append(format_list_item(trimmed))
            out.append("\n")
            in_list = True
            continue
        if options.detect_code and is_code_like(trimmed):
            if not in_code_block:
                out.append("```\n")
                in_code_block = True
            out.append(trimmed)
            out.append("\n")
            continue
        elif in_code_block:
            out.append("```\n")
            in_code_block = False
        out.append(trimmed)
        out.append("\n")
    if in_code_block:
        out.append("```\n")
    return "".join(out)


# -- items → markdown (markdown.rs:116-239) ---------------------------------

def to_markdown_from_items(items: list[TextItem],
                           options: Optional[MarkdownOptions] = None) -> str:
    options = options or MarkdownOptions()
    if not items:
        return ""

    images: list[TextItem] = []
    links: list[TextItem] = []
    text_items: list[TextItem] = []
    for item in items:
        if item.item_type == ITEM_IMAGE:
            if options.include_images:
                images.append(item)
        elif item.item_type == ITEM_LINK:
            if options.include_links:
                links.append(item)
        else:
            text_items.append(item)

    base_size = options.base_font_size
    if base_size is None:
        base_size = _most_common_size_from_items(text_items)

    table_item_idxs: set[int] = set()
    page_tables: dict[int, list[tuple[float, str]]] = {}
    page_images: dict[int, list[tuple[float, str]]] = {}

    for img in images:
        name = img.text
        if name.startswith("[Image: ") and name.endswith("]"):
            name = name[len("[Image: "):-1]
        page_images.setdefault(img.page, []).append(
            (img.y, f"![Image: {name}](image)\n"))

    # Pre-group by page with global indices (markdown.rs:177-211)
    page_groups: dict[int, list[tuple[int, TextItem]]] = {}
    for gi, item in enumerate(text_items):
        page_groups.setdefault(item.page, []).append((gi, item))

    for page in sorted(page_groups):
        group = page_groups[page]
        page_items = [it for _, it in group]
        tables = detect_tables(page_items, base_size)
        for table in tables:
            for idx in table.item_indices:
                if idx < len(group):
                    table_item_idxs.add(group[idx][0])
            table_y = table.rows[0] if table.rows else 0.0
            page_tables.setdefault(page, []).append((table_y, table_to_markdown(table)))

    non_table_items = [it for gi, it in enumerate(text_items)
                       if gi not in table_item_idxs]

    pages_with_text = {i.page for i in non_table_items}
    table_only_pages = {p for p in page_tables if p not in pages_with_text}
    merge_continuation_tables(page_tables, table_only_pages)

    lines = group_into_lines(non_table_items)
    return _render_lines(lines, options, page_tables, page_images)


def _most_common_size_from_items(items: list[TextItem]) -> float:
    """markdown.rs:242-259: per-item mode of sizes >=9pt, 0.1pt buckets."""
    counts: dict[int, int] = {}
    for item in items:
        if item.font_size >= 9.0:
            key = int(item.font_size * 10.0)
            counts[key] = counts.get(key, 0) + 1
    if not counts:
        return 12.0
    best = max(counts.items(), key=lambda kv: kv[1])[0]
    return best / 10.0


def calculate_font_stats(lines: list[TextLine]) -> float:
    """markdown.rs:1034-1055: per-line (first item) mode."""
    counts: dict[int, int] = {}
    for line in lines:
        if line.items:
            fs = line.items[0].font_size
            if fs >= 9.0:
                key = int(fs * 10.0)
                counts[key] = counts.get(key, 0) + 1
    if not counts:
        return 12.0
    best = max(counts.items(), key=lambda kv: kv[1])[0]
    return best / 10.0


def merge_continuation_tables(
    page_tables: dict[int, list[tuple[float, str]]],
    table_only_pages: set[int],
) -> None:
    """markdown.rs:267-368."""
    sorted_pages = sorted(page_tables)
    if len(sorted_pages) < 2:
        return
    i = 0
    while i < len(sorted_pages):
        first_page = sorted_pages[i]
        first_tables = page_tables.get(first_page)
        if not first_tables or len(first_tables) != 1:
            i += 1
            continue
        if first_page not in table_only_pages:
            i += 1
            continue
        first_col_count = count_table_columns(first_tables[0][1])
        if first_col_count == 0:
            i += 1
            continue
        continuation_pages: list[int] = []
        j = i + 1
        while j < len(sorted_pages):
            next_page = sorted_pages[j]
            prev_page = continuation_pages[-1] if continuation_pages else first_page
            if next_page != prev_page + 1:
                break
            if next_page not in table_only_pages:
                break
            next_tables = page_tables.get(next_page)
            if not next_tables or len(next_tables) != 1:
                break
            if count_table_columns(next_tables[0][1]) != first_col_count:
                break
            continuation_pages.append(next_page)
            j += 1
        if continuation_pages:
            extra_rows = []
            for cont_page in continuation_pages:
                table_md = page_tables[cont_page][0][1]
                for line_idx, line in enumerate(table_md.splitlines()):
                    if line_idx >= 2:
                        extra_rows.append(line + "\n")
            y, md = page_tables[first_page][0]
            page_tables[first_page][0] = (y, md + "".join(extra_rows))
            for cont_page in continuation_pages:
                del page_tables[cont_page]
            i = j
        else:
            i += 1


def count_table_columns(table_md: str) -> int:
    """markdown.rs:371-381."""
    lines = table_md.splitlines()
    if len(lines) >= 2 and "---" in lines[1]:
        pipes = lines[1].count("|")
        return pipes - 1 if pipes >= 2 else 0
    return 0


# -- renderer state machine (markdown.rs:424-713) ---------------------------

class _Renderer:
    def __init__(self, options: MarkdownOptions,
                 page_tables: dict[int, list[tuple[float, str]]],
                 page_images: dict[int, list[tuple[float, str]]]):
        self.options = options
        self.page_tables = page_tables
        self.page_images = page_images
        self.out: list[str] = []
        self.in_paragraph = False
        self.inserted_tables: set[tuple[int, int]] = set()
        self.inserted_images: set[tuple[int, int]] = set()

    def push(self, s: str) -> None:
        self.out.append(s)

    def ends_with(self, s: str) -> bool:
        joined = "".join(self.out[-4:]) if self.out else ""
        return joined.endswith(s)

    def pop_char(self) -> None:
        if self.out and self.out[-1]:
            self.out[-1] = self.out[-1][:-1]
            if not self.out[-1]:
                self.out.pop()

    def flush_page(self, page: int) -> None:
        """markdown.rs:384-421."""
        for idx, (_, table_md) in enumerate(self.page_tables.get(page, [])):
            if (page, idx) not in self.inserted_tables:
                if self.in_paragraph:
                    self.push("\n\n")
                    self.in_paragraph = False
                self.push("\n")
                self.push(table_md)
                self.push("\n")
                self.inserted_tables.add((page, idx))
        for idx, (_, image_md) in enumerate(self.page_images.get(page, [])):
            if (page, idx) not in self.inserted_images:
                if self.in_paragraph:
                    self.push("\n\n")
                    self.in_paragraph = False
                self.push("\n")
                self.push(image_md)
                self.push("\n")
                self.inserted_images.add((page, idx))


def _render_lines(lines: list[TextLine], options: MarkdownOptions,
                  page_tables: dict[int, list[tuple[float, str]]],
                  page_images: dict[int, list[tuple[float, str]]]) -> str:
    if not lines and not page_tables and not page_images:
        return ""

    base_size = options.base_font_size or calculate_font_stats(lines)
    lines = merge_drop_caps(lines, base_size)
    heading_tiers = compute_heading_tiers(lines, base_size)
    lines = merge_heading_lines(lines, base_size, heading_tiers)
    para_threshold = compute_paragraph_threshold(lines, base_size)

    r = _Renderer(options, page_tables, page_images)
    current_page = 0
    prev_y = float("inf")
    in_list = False
    last_list_x: Optional[float] = None

    all_content_pages = sorted(set(page_tables) | set(page_images))

    for line in lines:
        if line.page != current_page:
            if current_page > 0:
                r.flush_page(current_page)
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push("\n\n")
            for p in all_content_pages:
                if p <= current_page:
                    continue
                if p >= line.page:
                    break
                r.flush_page(p)
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push("\n\n")
            current_page = line.page
            prev_y = float("inf")

        for idx, (table_y, table_md) in enumerate(page_tables.get(current_page, [])):
            if table_y > line.y and (current_page, idx) not in r.inserted_tables:
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push("\n")
                r.push(table_md)
                r.push("\n")
                r.inserted_tables.add((current_page, idx))

        for idx, (image_y, image_md) in enumerate(page_images.get(current_page, [])):
            if image_y > line.y and (current_page, idx) not in r.inserted_images:
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push("\n")
                r.push(image_md)
                r.push("\n")
                r.inserted_images.add((current_page, idx))

        y_gap = prev_y - line.y
        is_para_break = y_gap > para_threshold
        if is_para_break and r.in_paragraph:
            r.push("\n\n")
            r.in_paragraph = False
        prev_y = line.y

        text = line.text_with_formatting(options.detect_bold, options.detect_italic)
        trimmed = text.strip()
        plain_text = line.text()
        plain_trimmed = plain_text.strip()
        if not trimmed:
            continue

        if is_caption_line(plain_trimmed):
            if r.in_paragraph:
                r.push("\n\n")
                r.in_paragraph = False
            r.push(trimmed)
            r.push("\n\n")
            continue

        if (options.detect_headers and len(plain_trimmed) > 3
                and len(plain_trimmed.split()) <= 15):
            line_font_size = line.items[0].font_size if line.items else base_size
            header_level = detect_header_level(line_font_size, base_size, heading_tiers)
            if header_level is not None:
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push("#" * header_level + " " + plain_trimmed + "\n\n")
                in_list = False
                continue

        if options.detect_lists and is_list_item(plain_trimmed):
            if r.in_paragraph:
                r.push("\n\n")
                r.in_paragraph = False
            r.push(format_list_item(trimmed))
            r.push("\n")
            in_list = True
            last_list_x = line.items[0].x if line.items else None
            continue
        elif in_list:
            line_x = line.items[0].x if line.items else None
            is_continuation = False
            if last_list_x is not None and line_x is not None:
                x_ok = last_list_x - 5.0 <= line_x <= last_list_x + 50.0
                y_ok = y_gap < base_size * 7.0
                is_continuation = x_ok and y_ok and not is_list_item(plain_trimmed)
            if is_continuation:
                if r.ends_with("\n"):
                    r.pop_char()
                    r.push(" ")
                r.push(trimmed)
                r.push("\n")
                continue
            else:
                in_list = False
                last_list_x = None

        if options.detect_code:
            if any(is_monospace_font(i.font) for i in line.items):
                if r.in_paragraph:
                    r.push("\n\n")
                    r.in_paragraph = False
                r.push(f"```\n{plain_trimmed}\n```\n")
                continue

        if r.in_paragraph:
            r.push(" ")
        r.push(trimmed)
        r.in_paragraph = True

    r.flush_page(current_page)
    for p in all_content_pages:
        if p <= current_page:
            continue
        r.flush_page(p)

    if r.in_paragraph:
        r.push("\n")

    return clean_markdown("".join(r.out), options)


def to_markdown_from_lines(lines: list[TextLine],
                           options: Optional[MarkdownOptions] = None) -> str:
    """markdown.rs:716-890 (tables/images-free variant)."""
    options = options or MarkdownOptions()
    if not lines:
        return ""
    return _render_lines(lines, options, {}, {})


# -- merges (markdown.rs:895-1027) ------------------------------------------

def merge_heading_lines(lines: list[TextLine], base_size: float,
                        heading_tiers: list[float]) -> list[TextLine]:
    """markdown.rs:901-948."""
    if not lines:
        return lines
    result: list[TextLine] = []
    for line in lines:
        line_font = line.items[0].font_size if line.items else base_size
        line_level = detect_header_level(line_font, base_size, heading_tiers)
        should_merge = False
        if result and line_level is not None:
            prev = result[-1]
            prev_font = prev.items[0].font_size if prev.items else base_size
            prev_level = detect_header_level(prev_font, base_size, heading_tiers)
            y_gap = prev.y - line.y
            should_merge = (
                prev.page == line.page
                and prev_level == line_level
                and 0.0 < y_gap < line_font * 2.0
            )
        if should_merge:
            prev = result[-1]
            if line.items:
                space_item = line.items[0].clone()
                space_item.text = " " + space_item.text.lstrip()
                prev.items.append(space_item)
                prev.items.extend(line.items[1:])
        else:
            result.append(line)
    return result


def merge_drop_caps(lines: list[TextLine], base_size: float) -> list[TextLine]:
    """markdown.rs:950-1027."""
    result: list[TextLine] = []
    for line in lines:
        text = line.text()
        trimmed = text.strip()
        first_size = line.items[0].font_size if line.items else 0.0
        is_drop_cap = (
            len(trimmed) <= 2
            and first_size >= base_size * 2.5
            and bool(trimmed)
            and trimmed[0].isupper()
        )
        if is_drop_cap:
            drop_char = trimmed[0]
            target_idx: Optional[int] = None
            for idx, prev_line in enumerate(result):
                if prev_line.page != line.page:
                    continue
                prev_trimmed = prev_line.text().strip()
                if prev_trimmed and prev_trimmed[0].islower():
                    if idx == 0:
                        is_para_start = True
                    else:
                        before_trimmed = result[idx - 1].text().strip()
                        is_para_start = not (
                            bool(before_trimmed) and before_trimmed[0].islower()
                        )
                    if is_para_start:
                        target_idx = idx
                        break
            if target_idx is not None and result[target_idx].items:
                first_item = result[target_idx].items[0]
                first_item.text = drop_char + first_item.text.strip()
            continue
        result.append(line)
    return result


# -- thresholds + classifiers (markdown.rs:1057-1350) -----------------------

def compute_paragraph_threshold(lines: list[TextLine], base_size: float) -> float:
    """markdown.rs:1065-1101."""
    fallback = base_size * 1.8
    gaps: list[float] = []
    prev: Optional[tuple[int, float]] = None
    for line in lines:
        if prev is not None and line.page == prev[0]:
            gap = prev[1] - line.y
            if 0.0 < gap < base_size * 10.0:
                gaps.append(gap)
        prev = (line.page, line.y)
    if len(gaps) < 5:
        return fallback
    gaps.sort()
    median = gaps[len(gaps) // 2]
    return max(median * 1.3, base_size * 1.5)


def compute_heading_tiers(lines: list[TextLine], base_size: float) -> list[float]:
    """markdown.rs:1106-1132."""
    heading_sizes = [
        line.items[0].font_size
        for line in lines
        if line.items and base_size and line.items[0].font_size / base_size >= 1.2
    ]
    heading_sizes.sort(reverse=True)
    tiers: list[float] = []
    for size in heading_sizes:
        if not any(abs(t - size) < 0.5 for t in tiers):
            tiers.append(size)
    return tiers[:4]


def detect_header_level(font_size: float, base_size: float,
                        heading_tiers: list[float]) -> Optional[int]:
    """markdown.rs:1137-1170."""
    if not base_size:
        return None
    ratio = font_size / base_size
    if ratio < 1.2:
        return None
    if heading_tiers:
        for i, tier_size in enumerate(heading_tiers):
            if abs(font_size - tier_size) < 0.5:
                return i + 1
        if ratio >= 1.5:
            return min(len(heading_tiers) + 1, 4)
        return None
    if ratio >= 2.0:
        return 1
    if ratio >= 1.5:
        return 2
    if ratio >= 1.25:
        return 3
    return 4


_CAPTION_PREFIXES = (
    "Figure ", "Figura ", "Fig. ", "Fig ", "Table ", "Tabela ",
    "Source:", "Fonte:", "Source ", "Fonte ", "Note:", "Nota:",
    "Chart ", "Gráfico ", "Graph ", "Diagram ", "Image ", "Imagem ",
    "Photo ", "Foto ",
)


def is_caption_line(text: str) -> bool:
    """markdown.rs:1173-1214."""
    trimmed = text.strip()
    if trimmed.startswith(_CAPTION_PREFIXES):  # tuple form: one C-level call
        return True
    return trimmed.lower().startswith(("figure ", "table ", "source:"))


def is_list_item(text: str) -> bool:
    """markdown.rs:1217-1255."""
    trimmed = text.lstrip()
    if (trimmed.startswith("• ") or trimmed.startswith("- ")
            or trimmed.startswith("* ") or trimmed.startswith("○ ")
            or trimmed.startswith("● ") or trimmed.startswith("◦ ")):
        return True
    first_chars = trimmed[:5]
    if any(c.isdigit() and c.isascii() for c in first_chars):
        for i, c in enumerate(first_chars):
            if c in ".)":
                prefix = first_chars[:i]
                if prefix and all(ch.isdigit() and ch.isascii() for ch in prefix):
                    return True
                break
    if len(trimmed) >= 2:
        first, second = trimmed[0], trimmed[1]
        if first.isalpha() and first.isascii() and second in ".)":
            return True
        if first == "(" and len(trimmed) >= 3 and trimmed[2] == ")":
            return True
    return False


def format_list_item(text: str) -> str:
    """markdown.rs:1258-1275."""
    trimmed = text.lstrip()
    for bullet in "•○●◦":
        if trimmed.startswith(bullet):
            return "- " + trimmed[1:].lstrip()
    if trimmed.startswith("- ") or trimmed.startswith("* "):
        return trimmed
    return trimmed


_CODE_PATTERNS = (
    "import ", "export ", "from ", "const ", "let ", "var ", "function ",
    "class ", "def ", "pub fn ", "fn ", "async fn ", "impl ",
    "=> ", "-> ", ":: ", ":= ",
)


def is_code_like(text: str) -> bool:
    """markdown.rs:1278-1327."""
    trimmed = text.strip()
    for pattern in _CODE_PATTERNS:
        if trimmed.startswith(pattern):
            return True
    special = sum(1 for c in trimmed if c in "{}()[];=<>")
    if special >= 3 and len(trimmed) < 200:
        return True
    return trimmed.endswith(";") or trimmed.endswith("{") or trimmed.endswith("}")


_MONO_PATTERNS = (
    "courier", "consolas", "monaco", "menlo", "mono", "fixed", "terminal",
    "typewriter", "source code", "fira code", "jetbrains", "inconsolata",
    "dejavu sans mono", "liberation mono",
)


def is_monospace_font(font_name: str) -> bool:
    """markdown.rs:1330-1350."""
    lower = font_name.lower()
    return any(p in lower for p in _MONO_PATTERNS)


# -- post-processing (markdown.rs:1353-1620) --------------------------------

_DOT_LEADER_RE = re.compile(r"\.{4,}")
_SPACED_HYPHEN_RE = re.compile(
    r"([a-zA-ZáàâãéèêíïóôõöúçñÁÀÂÃÉÈÊÍÏÓÔÕÖÚÇÑ]) - "
    r"([a-zA-ZáàâãéèêíïóôõöúçñÁÀÂÃÉÈÊÍÏÓÔÕÖÚÇÑ])"
)
_URL_RE = re.compile(r"https?://[^\s<>\)\]]+[^\s<>\)\]\.\,;]")


def clean_markdown(text: str, options: MarkdownOptions) -> str:
    """markdown.rs:1353-1382."""
    text = _DOT_LEADER_RE.sub(" ... ", text)
    if options.fix_hyphenation:
        text = _SPACED_HYPHEN_RE.sub(r"\1-\2", text)
    if options.remove_page_numbers:
        text = remove_page_numbers(text)
    if options.format_urls:
        text = format_urls(text)
    while "\n\n\n" in text:
        text = text.replace("\n\n\n", "\n\n")
    text = text.strip()
    return text + "\n"


def remove_page_numbers(text: str) -> str:
    """markdown.rs:1414-1449."""
    lines = text.split("\n")
    result: list[str] = []
    n = len(lines)
    for i, line in enumerate(lines):
        trimmed = line.strip()
        if is_page_number_line(trimmed):
            prev_is_break = i > 0 and lines[i - 1].strip() == "---"
            next_is_break = i + 1 < n and lines[i + 1].strip() == "---"
            prev_is_empty = i > 0 and not lines[i - 1].strip()
            next_is_empty = i + 1 < n and not lines[i + 1].strip()
            is_isolated = (
                (prev_is_break or prev_is_empty or i == 0)
                and (next_is_break or next_is_empty or i + 1 == n)
            )
            before_break = i + 1 < n and (
                lines[i + 1].strip() == "---"
                or (i + 2 < n and not lines[i + 1].strip()
                    and lines[i + 2].strip() == "---")
            )
            if is_isolated or before_break:
                continue
        result.append(line)
    return "\n".join(result)


def is_page_number_line(trimmed: str) -> bool:
    """markdown.rs:1452-1512."""
    if not trimmed:
        return False
    if len(trimmed) <= 4 and all(c.isdigit() and c.isascii() for c in trimmed):
        return True
    lower = trimmed.lower()
    if lower.startswith("page"):
        rest = lower[4:].strip()
        if rest == "of" or rest.startswith("of "):
            return True
        if rest and rest[0].isdigit() and rest[0].isascii():
            return True
        if not rest or all(
            w == "of" or all(c.isdigit() and c.isascii() for c in w)
            for w in rest.split()
        ):
            return True
    of_idx = trimmed.find(" of ")
    if of_idx != -1:
        before = trimmed[:of_idx].strip()
        after = trimmed[of_idx + 4:].strip()
        if (before and after
                and all(c.isdigit() and c.isascii() for c in before)
                and all(c.isdigit() and c.isascii() for c in after)):
            return True
    if len(trimmed) >= 3 and trimmed.startswith("-") and trimmed.endswith("-"):
        inner = trimmed[1:-1].strip()
        if inner and all(c.isdigit() and c.isascii() for c in inner):
            return True
    return False


def format_urls(text: str) -> str:
    """markdown.rs:1515-1620 (the char-boundary gymnastics are unnecessary
    in Python — str slicing is always on char boundaries)."""
    result: list[str] = []
    last_end = 0
    for mat in _URL_RE.finditer(text):
        start = mat.start()
        url = mat.group(0)
        before = text[max(0, start - 2):start]
        already_linked = before.endswith("](")
        prefix = text[:start]
        inside_link_text = prefix.count("[") > prefix.count("]")
        if already_linked or inside_link_text:
            result.append(text[last_end:mat.end()])
        else:
            result.append(text[last_end:start])
            result.append(f"[{url}]({url})")
        last_end = mat.end()
    result.append(text[last_end:])
    return "".join(result)
