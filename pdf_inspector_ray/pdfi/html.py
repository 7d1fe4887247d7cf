"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule covers main-content extraction generally (HTML boilerplate
strip, PDF/layout parse, DOM heuristics); the reference engine handles the
PDF axis — this module supplies the HTML axis with the same design rules:
pure per-document function, deterministic, no external deps (stdlib
``html.parser``).

Algorithm (jusText/Readability-family, reimplemented from the published
ideas, not any codebase):
1. Parse into a DOM-ish block list: block-level boundaries split text runs;
   ``script/style/nav/header/footer/aside/form`` subtrees are boilerplate
   by tag; headings/list items/paragraphs tracked with their tag context.
2. Per block compute text length, link-density (chars inside <a> / chars),
   and stopword-ish density (short-word ratio).
3. Classify: long low-link-density blocks = content; short or link-heavy
   blocks = boilerplate; short blocks adjacent to content with low link
   density are rescued (the jusText "near-good" rule).
4. Emit main text (paragraphs joined) or markdown (headings → #, list
   items → -).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional

_DROP_SUBTREES = frozenset(
    "script style noscript svg nav header footer aside form iframe".split())
_BLOCK_TAGS = frozenset(
    "p div section article main h1 h2 h3 h4 h5 h6 li ul ol table tr td th "
    "blockquote pre br hr dd dt figure figcaption".split())
_HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

MIN_CONTENT_CHARS = 80       # long block threshold
MAX_LINK_DENSITY = 0.33      # content blocks must be mostly non-anchor text
SHORT_RESCUE_CHARS = 25      # near-good rescue minimum


@dataclass
class Block:
    texts: list[str] = field(default_factory=list)
    link_chars: int = 0
    tag: str = "p"           # originating block tag (p/h1/li/...)
    label: str = ""          # "content" | "boilerplate" (after classify)

    @property
    def text(self) -> str:
        return " ".join(" ".join(self.texts).split())

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        n = self.n_chars
        return self.link_chars / n if n else 1.0


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = [Block()]
        self._drop_depth = 0
        self._anchor_depth = 0
        self._title_parts: list[str] = []
        self._in_title = False

    def _new_block(self, tag: str = "p") -> None:
        if self.blocks[-1].text:
            self.blocks.append(Block(tag=tag))
        else:
            self.blocks[-1].tag = tag

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREES:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            self._anchor_depth += 1
        elif tag in _BLOCK_TAGS:
            self._new_block(tag if tag in _HEADING_TAGS or tag == "li" else "p")

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREES:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = False
        elif tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._new_block()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._in_title:
            self._title_parts.append(data)
            return
        if not data.strip():
            return
        blk = self.blocks[-1]
        blk.texts.append(data)
        if self._anchor_depth:
            blk.link_chars += len(" ".join(data.split()))

    @property
    def title(self) -> Optional[str]:
        t = " ".join(" ".join(self._title_parts).split())
        return t or None


def segment_blocks(html_text: str) -> tuple[list[Block], Optional[str]]:
    parser = _BlockParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        pass  # html.parser is forgiving; belt-and-braces for exotic input
    blocks = [b for b in parser.blocks if b.text]
    return blocks, parser.title


def classify_blocks(blocks: list[Block]) -> None:
    """Two-pass jusText-style labeling with near-good rescue."""
    for b in blocks:
        if b.tag in _HEADING_TAGS:
            b.label = "content" if b.link_density <= MAX_LINK_DENSITY else "boilerplate"
        elif b.n_chars >= MIN_CONTENT_CHARS and b.link_density <= MAX_LINK_DENSITY:
            b.label = "content"
        else:
            b.label = "boilerplate"
    # rescue short low-link blocks adjacent to content
    n = len(blocks)
    for i, b in enumerate(blocks):
        if b.label == "content":
            continue
        if b.n_chars < SHORT_RESCUE_CHARS or b.link_density > MAX_LINK_DENSITY:
            continue
        prev_ok = i > 0 and blocks[i - 1].label == "content"
        next_ok = i + 1 < n and blocks[i + 1].label == "content"
        if prev_ok or next_ok:
            b.label = "content"


@dataclass
class HtmlExtractResult:
    title: Optional[str]
    text: str
    markdown: str
    n_blocks: int
    n_content_blocks: int
    boilerplate_ratio: float


def extract_main_content(html_text: str) -> HtmlExtractResult:
    blocks, title = segment_blocks(html_text)
    classify_blocks(blocks)
    content = [b for b in blocks if b.label == "content"]
    text = "\n\n".join(b.text for b in content)
    md_parts: list[str] = []
    for b in content:
        if b.tag in _HEADING_TAGS:
            level = int(b.tag[1])
            md_parts.append("#" * level + " " + b.text)
        elif b.tag == "li":
            md_parts.append("- " + b.text)
        else:
            md_parts.append(b.text)
    markdown = "\n\n".join(md_parts)
    if markdown:
        markdown += "\n"
    total_chars = sum(b.n_chars for b in blocks) or 1
    boiler_chars = sum(b.n_chars for b in blocks if b.label != "content")
    return HtmlExtractResult(
        title=title,
        text=text,
        markdown=markdown,
        n_blocks=len(blocks),
        n_content_blocks=len(content),
        boilerplate_ratio=boiler_chars / total_chars,
    )
