"""Deterministic synthetic PDF fixtures (FIXTURES.md §2).

A tiny classic-xref PDF writer plus one builder function per feature axis the
reference exercises. No wall-clock, no randomness beyond an explicit seed —
byte-identical output across runs, so golden outputs stay stable.
"""

from __future__ import annotations

import zlib


class PdfWriter:
    """Classic xref-table PDF writer. Object 0 is the free head."""

    def __init__(self):
        self.objects: list[bytes | None] = [None]  # index = obj num

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects) - 1

    def reserve(self) -> int:
        self.objects.append(b"")
        return len(self.objects) - 1

    def set(self, num: int, body: bytes) -> None:
        self.objects[num] = body

    def stream(self, dict_extra: bytes, data: bytes, compress: bool = False) -> bytes:
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        return (
            b"<< " + filt + b"/Length %d " % len(data) + dict_extra + b" >>\n"
            b"stream\n" + data + b"\nendstream"
        )

    def build(self, root_num: int, info_num: int | None = None) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for num, body in enumerate(self.objects):
            if num == 0 or body is None:
                continue
            while len(offsets) <= num:
                offsets.append(0)
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            out += body
            out += b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objects)
        out += b"xref\n0 %d\n" % n
        out += b"0000000000 65535 f \n"
        for num in range(1, n):
            out += b"%010d 00000 n \n" % (offsets[num] if num < len(offsets) else 0)
        trailer = b"trailer\n<< /Size %d /Root %d 0 R" % (n, root_num)
        if info_num:
            trailer += b" /Info %d 0 R" % info_num
        trailer += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
        out += trailer
        return bytes(out)


# Approximate Helvetica advance widths (thousandths of em) for the printable
# ASCII range — used when a fixture wants real width metrics.
_HELVETICA = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278, "0": 556, "1": 556, "2": 556, "3": 556, "4": 556,
    "5": 556, "6": 556, "7": 556, "8": 556, "9": 556, ":": 278, ";": 278,
    "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015, "A": 667, "B": 667,
    "C": 722, "D": 722, "E": 667, "F": 611, "G": 778, "H": 722, "I": 278,
    "J": 500, "K": 667, "L": 556, "M": 833, "N": 722, "O": 778, "P": 667,
    "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
    "X": 667, "Y": 667, "Z": 611, "[": 278, "\\": 278, "]": 278, "^": 469,
    "_": 556, "`": 333, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
    "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500, "l": 222,
    "m": 833, "n": 556, "o": 556, "p": 556, "q": 556, "r": 333, "s": 500,
    "t": 278, "u": 556, "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}


def _font_simple(w: PdfWriter, base: bytes, with_widths: bool = True) -> int:
    if with_widths:
        widths = b"[" + b" ".join(
            b"%d" % _HELVETICA.get(chr(c), 556) for c in range(32, 127)
        ) + b"]"
        return w.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /" + base
            + b" /FirstChar 32 /LastChar 126 /Widths " + widths + b" >>"
        )
    return w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /" + base + b" >>")


def _page(w: PdfWriter, parent: int, content: int, extra: bytes = b"",
          resources: bytes = b"") -> int:
    return w.add(
        b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] " % parent
        + b"/Contents %d 0 R " % content + resources + extra + b" >>"
    )


def _pages_tree(w: PdfWriter, pages_num: int, kids: list[int]) -> None:
    kids_bytes = b" ".join(b"%d 0 R" % k for k in kids)
    w.set(pages_num, b"<< /Type /Pages /Kids [" + kids_bytes + b"] /Count %d >>" % len(kids))


def _catalog(w: PdfWriter, pages_num: int) -> int:
    return w.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)


def _esc(s: str) -> bytes:
    return s.encode("latin-1").replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _tj_lines(lines: list[tuple[float, float, float, str]], font: bytes = b"F1") -> bytes:
    """Lines of (x, y, size, text) rendered as BT/Tf/Td/Tj blocks."""
    out = bytearray()
    for x, y, size, text in lines:
        out += b"BT /%s %g Tf %g %g Td (%s) Tj ET\n" % (font, size, x, y, _esc(text))
    return bytes(out)


def f01_tj_simple() -> bytes:
    """1 page, Helvetica, Tj show-text, Td moves; plus a Title in /Info."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 720, 24, "Annual Report"),
        (72, 680, 12, "This is the first paragraph of the report. It contains"),
        (72, 666, 12, "several plain lines of body text for extraction."),
        (72, 638, 12, "A second paragraph follows after a larger gap to test"),
        (72, 624, 12, "paragraph break detection in the renderer."),
    ]
    content = w.add(w.stream(b"", _tj_lines(body)))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    root = _catalog(w, pages)
    info = w.add(b"<< /Title (Annual Report) >>")
    return w.build(root, info)


def f02_tj_arraykern() -> bytes:
    """TJ arrays with kerns straddling the space threshold.

    Helvetica space width 278 → threshold clamp(0.4*278, 80, 200) = 111.2.
    Kern -300 inserts a space; -50 does not (extractor.rs:1112-1147).
    """
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    content_data = (
        b"BT /F1 12 Tf 72 700 Td [(Hello) -300 (world) -50 (lings)] TJ ET\n"
        b"BT /F1 12 Tf 72 680 Td [(alpha) -120 (beta) -80 (gamma)] TJ ET\n"
        b"BT /F1 12 Tf 72 660 Td [(kerned) -200 (pair)] TJ ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def _tounicode_stream(entries: dict[int, str], codespace: tuple[str, str],
                      bfranges: list[tuple[str, str, str]] | None = None,
                      src_hex_width: int = 4) -> bytes:
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"1 begincodespacerange",
        b"<%s> <%s>" % (codespace[0].encode(), codespace[1].encode()),
        b"endcodespacerange",
    ]
    if entries:
        lines.append(b"%d beginbfchar" % len(entries))
        for cid, s in entries.items():
            dst = "".join(f"{ord(c):04X}" for c in s)
            lines.append(b"<%0*X> <%s>" % (src_hex_width, cid, dst.encode()))
        lines.append(b"endbfchar")
    for rng in bfranges or []:
        lines.append(b"1 beginbfrange")
        lines.append(b"<%s> <%s> %s" % (rng[0].encode(), rng[1].encode(), rng[2].encode()))
        lines.append(b"endbfrange")
    lines += [b"endcmap", b"CMapName currentdict /CMap defineresource pop", b"end", b"end"]
    return b"\n".join(lines)


def _type0_font(w: PdfWriter, base: bytes, tounicode_num: int,
                dw: int = 1000, w_array: bytes = b"") -> int:
    desc = w.add(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /" + base
        + b" /DW %d " % dw + (b"/W " + w_array + b" " if w_array else b"")
        + b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>"
    )
    return w.add(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /" + base
        + b" /Encoding /Identity-H /DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>"
        % (desc, tounicode_num)
    )


def _hex_tj(cids: list[int], width: int = 4) -> bytes:
    return b"<" + b"".join(b"%0*X" % (width, c) for c in cids) + b">"


def f03_type0_tounicode() -> bytes:
    """Identity-H CID font with ToUnicode bfchar + bfrange (both forms)."""
    w = PdfWriter()
    pages = w.reserve()
    # CIDs: 3=space, 0x24..0x3D = A..Z via bfrange <0024><003D><0041>,
    # bfchar extras, and an array-form bfrange for a,b,c
    cmap = _tounicode_stream(
        {0x0003: " ", 0x0101: "!", 0x0102: "?"},
        ("0000", "FFFF"),
        bfranges=[
            ("0024", "003D", "<0041>"),
            ("0050", "0052", "[<0061> <0062> <0063>]"),
        ],
    )
    tounicode = w.add(w.stream(b"", cmap))
    warr = b"[3 [278] 36 61 556 80 82 500]"
    font = _type0_font(w, b"NotoSans-Regular", tounicode, dw=600, w_array=warr)
    # "HELLO WORLD" → H=0x24+7=0x2B,E=0x28,L=0x2F,O=0x32 ...
    def word(s):
        return [0x24 + (ord(c) - ord("A")) for c in s]
    cids = word("HELLO") + [3] + word("WORLD")
    content_data = (
        b"BT /F1 14 Tf 72 700 Td " + _hex_tj(cids) + b" Tj ET\n"
        b"BT /F1 14 Tf 72 680 Td [" + _hex_tj(word("KERN")) + b" -400 "
        + _hex_tj(word("GAP")) + b"] TJ ET\n"
        b"BT /F1 14 Tf 72 660 Td " + _hex_tj([0x50, 0x51, 0x52]) + b" Tj ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f04_onebyte_cmap() -> bytes:
    """Codespace <0000><FFFF> but 1-byte entries — CJK-garbage regression
    (tounicode.rs:89-109, test 714-733)."""
    w = PdfWriter()
    pages = w.reserve()
    entries = {c: chr(c) for c in range(0x20, 0x7F)}
    cmap = _tounicode_stream(entries, ("0000", "FFFF"), src_hex_width=2)
    tounicode = w.add(w.stream(b"", cmap))
    font = w.add(
        b"<< /Type /Font /Subtype /TrueType /BaseFont /EmbeddedSubset"
        b" /FirstChar 32 /LastChar 126 /ToUnicode %d 0 R >>" % tounicode
    )
    content_data = (
        b"BT /F1 12 Tf 72 700 Td (By Payment Received) Tj ET\n"
        b"BT /F1 12 Tf 72 680 Td (PR 2026 totals) Tj ET\n"
        b"BT /F1 12 Tf 72 660 Td (Confirmation line) Tj ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f05_differences() -> bytes:
    """Type1 with Encoding /Differences incl. uniXXXX names
    (extractor.rs:425-469; glyph_names.rs:314-335)."""
    w = PdfWriter()
    pages = w.reserve()
    enc = w.add(
        b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences "
        b"[ 200 /eacute /uni00F1 /bullet 210 /emdash ] >>"
    )
    font = w.add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom-Regular "
        b"/Encoding %d 0 R >>" % enc
    )
    # bytes: "caf\xc8" where 0xC8=200 → é ; 0xC9=201 → ñ ; 0xCA=202 → • ; 0xD2=210 → —
    content_data = (
        b"BT /F1 12 Tf 72 700 Td (caf\xc8 ma\xc9ana) Tj ET\n"
        b"BT /F1 12 Tf 72 680 Td (dash\xd2here) Tj ET\n"
        b"BT /F1 12 Tf 72 660 Td (plain ascii line) Tj ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f06_scanned(pages_n: int = 2) -> bytes:
    """Pages with a single large image XObject, zero text ops → Scanned."""
    w = PdfWriter()
    pages = w.reserve()
    kids = []
    for i in range(pages_n):
        img_data = bytes([(i * 37 + j) % 251 for j in range(256)])
        img = w.add(w.stream(
            b"/Type /XObject /Subtype /Image /Width 1700 /Height 2200 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8", img_data))
        content = w.add(w.stream(b"", b"q 612 0 0 792 0 0 cm /Im0 Do Q\n"))
        kids.append(_page(
            w, pages, content,
            resources=b"/Resources << /XObject << /Im0 %d 0 R >> >> " % img))
    _pages_tree(w, pages, kids)
    return w.build(_catalog(w, pages))


def f07_mixed_template() -> bytes:
    """Text + full-page background image on each page → Mixed/template."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    kids = []
    for i in range(2):
        img = w.add(w.stream(
            b"/Type /XObject /Subtype /Image /Width 1275 /Height 1650 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8", b"\x00" * 300))
        body = _tj_lines([
            (72, 700, 12, f"Form field value {i} one"),
            (72, 680, 12, f"Form field value {i} two"),
            (72, 660, 12, f"Form field value {i} three"),
            (72, 640, 12, f"Form field value {i} four"),
        ])
        content = w.add(w.stream(b"", b"q 612 0 0 792 0 0 cm /Bg0 Do Q\n" + body))
        kids.append(_page(
            w, pages, content,
            resources=b"/Resources << /Font << /F1 %d 0 R >> /XObject << /Bg0 %d 0 R >> >> "
            % (font, img)))
    _pages_tree(w, pages, kids)
    return w.build(_catalog(w, pages))


def f08_multicolumn() -> bytes:
    """Two-column layout with a spanning title (extractor.rs:2010-2186)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    lines = [(72, 730, 20, "Spanning Title Across Both Columns Here Wide")]
    # left column x=72..~200, right column x=332..~460 → gutter ~200..332.
    # 25 lines/column so the spanning title's single gutter crossing stays
    # under the 5% noise threshold (detect_columns, extractor.rs:2055-2057).
    for i in range(25):
        y = 700 - i * 14
        lines.append((72, y, 10, f"left column line {i} with words"))
        lines.append((332, y, 10, f"right column line {i} more text"))
    content = w.add(w.stream(b"", _tj_lines(lines)))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f09_headers_lists_code() -> bytes:
    """Heading tiers 24/18/15pt, bullets/numbered/letter lists + continuation,
    Courier code line (markdown.rs:1106-1170, 1217-1275, 1330-1350)."""
    w = PdfWriter()
    pages = w.reserve()
    helv = _font_simple(w, b"Helvetica")
    courier = _font_simple(w, b"Courier")
    lines = [
        (72, 740, 24, "Document Title Level One"),
        (72, 700, 18, "Section Heading Level Two"),
        (72, 668, 15, "Subsection Level Three"),
        (72, 640, 12, "• First bullet item"),
        (72, 626, 12, "• Second bullet item that wraps to"),
        (78, 612, 12, "a continuation line indented"),
        (72, 598, 12, "1. Numbered item one"),
        (72, 584, 12, "2. Numbered item two"),
        (72, 570, 12, "a) Letter item alpha"),
    ]
    body = _tj_lines([(x, y, s, t.replace("•", "\xb7")) for x, y, s, t in lines])
    # Use actual bullet char via octal escape \225? Simpler: use Differences-free latin-1 bullet 0x95? The
    # reference looks for '•' (U+2022). Latin-1 fallback maps byte 0x95 to U+0095, not bullet.
    # So emit bullets through a ToUnicode'd font instead: keep ASCII "- " bullets for f09.
    lines = [
        (72, 740, 24, "Document Title Level One"),
        (72, 700, 18, "Section Heading Level Two"),
        (72, 668, 15, "Subsection Level Three"),
        (72, 640, 12, "- First bullet item"),
        (72, 626, 12, "- Second bullet item that wraps to"),
        (78, 612, 12, "a continuation line indented"),
        (72, 598, 12, "1. Numbered item one"),
        (72, 584, 12, "2. Numbered item two"),
        (72, 570, 12, "Normal paragraph text after the lists ends here."),
    ]
    body = _tj_lines(lines)
    code = b"BT /F2 10 Tf 72 540 Td (let x = compute\\(42\\);) Tj ET\n"
    content = w.add(w.stream(b"", body + code))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> " % (helv, courier))
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def _grid_lines(x0: float, y0: float, rows: list[list[str]], size: float,
                col_w: float = 90, row_h: float = 16) -> list[tuple]:
    out = []
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            out.append((x0 + c * col_w, y0 - r * row_h, size, cell))
    return out


def f10_table_smallfont() -> bytes:
    """8pt 4x4 numeric grid on 12pt body (tables.rs pass 1)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 740, 12, "Quarterly results are summarized in the table below."),
        (72, 726, 12, "All figures are reported in millions of dollars."),
        (72, 712, 12, "See accompanying notes for the full methodology."),
        (72, 698, 12, "Revenue grew across all four regions this year."),
        (72, 684, 12, "Operating margins remained stable quarter over quarter."),
        (72, 670, 12, "The board approved the updated capital plan."),
    ]
    grid = _grid_lines(72, 600, [
        ["Region", "Q1", "Q2", "Q3"],
        ["North", "12.5", "13.1", "14.0"],
        ["South", "8.2", "8.9", "9.4"],
        ["West", "21.0", "22.4", "23.9"],
    ], 8.0)
    content = w.add(w.stream(b"", _tj_lines(body + grid)))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f11_table_bodyfont() -> bytes:
    """Body-font 4x4 table (strict pass) + a paragraph page (negative)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    # page 1: body-font grid, 12pt everywhere
    body1 = [
        (72, 740, 12, "Parts catalog for the current program year."),
        (72, 726, 12, "Each part number maps to voltage and current."),
    ]
    grid = _grid_lines(72, 680, [
        ["Part", "Volts", "Amps", "Pins"],
        ["NA555", "5V", "200mA", "8"],
        ["NE556", "12V", "150mA", "14"],
        ["LM358", "9V", "40mA", "8"],
        ["LM324", "3V", "20mA", "14"],
    ], 12.0, col_w=110, row_h=18)
    c1 = w.add(w.stream(b"", _tj_lines(body1 + grid)))
    p1 = _page(w, pages, c1, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    # page 2: plain paragraphs (must NOT be detected as a table)
    para = []
    texts = [
        "This is an ordinary paragraph of body text that should never be",
        "mistaken for a table by the body font detection pass even though",
        "it has many lines of similar length stacked vertically in a page.",
        "Words vary in position line to line so column alignment is low.",
        "The strict detector requires three aligned x clusters per row and",
        "consistent positions across rows which prose does not exhibit.",
    ]
    for i, t in enumerate(texts):
        para.append((72, 700 - i * 14, 12, t))
    c2 = w.add(w.stream(b"", _tj_lines(para)))
    p2 = _page(w, pages, c2, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [p1, p2])
    return w.build(_catalog(w, pages))


def f12_links_images() -> bytes:
    """Link annotation (Rect + URI action) + inline image placement."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    img = w.add(w.stream(
        b"/Type /XObject /Subtype /Image /Width 200 /Height 100 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8", b"\x80" * 64))
    action = w.add(b"<< /S /URI /URI (https://example.com/spec) >>")
    annot = w.add(
        b"<< /Type /Annot /Subtype /Link /Rect [72 690 200 704] /A %d 0 R >>" % action)
    body = _tj_lines([
        (72, 720, 12, "Visit the specification at the link below."),
        (72, 692, 12, "https://example.com/spec"),
        (72, 660, 12, "An illustrative figure follows this paragraph."),
    ])
    content = w.add(w.stream(b"", body + b"q 200 0 0 100 72 520 cm /Im1 Do Q\n"))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R >> /XObject << /Im1 %d 0 R >> >> "
        % (font, img),
        extra=b"/Annots [%d 0 R] " % annot)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f13_form_xobject() -> bytes:
    """Text inside a Form XObject with its own fonts (extractor.rs:1375-1629)."""
    w = PdfWriter()
    pages = w.reserve()
    helv = _font_simple(w, b"Helvetica")
    form_font = _font_simple(w, b"Times-Bold")
    form_content = (
        b"BT /FF1 14 Tf 10 20 Td (Stamped form text) Tj ET\n"
        b"BT /FF1 10 Tf 10 5 Td (secondary form line) Tj ET\n"
    )
    form = w.add(w.stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 200 40] "
        b"/Resources << /Font << /FF1 %d 0 R >> >>" % form_font, form_content))
    body = _tj_lines([
        (72, 720, 12, "Main page text before the form."),
        (72, 700, 12, "Another main line of content here."),
        (72, 680, 12, "A third line to satisfy detection."),
    ])
    content = w.add(w.stream(b"", body + b"q 1 0 0 1 72 560 cm /Fm1 Do Q\n"))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R >> /XObject << /Fm1 %d 0 R >> >> "
        % (helv, form))
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f14_dropcap_ligatures() -> bytes:
    """3x drop cap; fi/fl ligatures via ToUnicode; hyphen-split words."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    # ligature font: 1-byte cmap mapping 0x01→U+FB01(fi) 0x02→U+FB02(fl)
    entries = {c: chr(c) for c in range(0x20, 0x7F)}
    entries[0x01] = "ﬁ"
    entries[0x02] = "ﬂ"
    cmap = _tounicode_stream(entries, ("00", "FF"), src_hex_width=2)
    tounicode = w.add(w.stream(b"", cmap))
    ligfont = w.add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /LigSerif"
        b" /ToUnicode %d 0 R >>" % tounicode)
    body = (
        b"BT /F1 36 Tf 72 700 Td (O) Tj ET\n"
        b"BT /F1 12 Tf 95 700 Td (nce upon a time the story began with a) Tj ET\n"
        b"BT /F1 12 Tf 72 686 Td (second line continuing the paragraph flow.) Tj ET\n"
        b"BT /F2 12 Tf 72 660 Td (the \x01rst \x02ower blooms) Tj ET\n"
        b"BT /F1 12 Tf 72 646 Td (compound word split like micro - services here) Tj ET\n"
    )
    content = w.add(w.stream(b"", body))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> " % (font, ligfont))
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f15_pagenumbers_toc() -> bytes:
    """Standalone page numbers top/bottom, dot-leader TOC page."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    toc = _tj_lines([
        (72, 740, 16, "Table of Contents"),
        (72, 700, 12, "Introduction ........................... 1"),
        (72, 686, 12, "Methods ................................ 5"),
        (72, 672, 12, "Results ................................ 9"),
        (72, 658, 12, "Discussion ............................ 14"),
        (300, 40, 10, "1"),
    ])
    c1 = w.add(w.stream(b"", toc))
    p1 = _page(w, pages, c1, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    body = _tj_lines([
        (300, 760, 10, "2"),
        (72, 700, 12, "Body text on the second page continues here with"),
        (72, 686, 12, "several lines of ordinary prose for extraction."),
        (72, 672, 12, "Page numbers at the extremes must be removed."),
        (300, 40, 10, "2"),
    ])
    c2 = w.add(w.stream(b"", body))
    p2 = _page(w, pages, c2, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [p1, p2])
    return w.build(_catalog(w, pages))


def f16_cjk() -> bytes:
    """Japanese text via Type0 + ToUnicode; touching items must join
    (extractor.rs:795-799)."""
    w = PdfWriter()
    pages = w.reserve()
    text = "日本語のテキスト抽出"
    entries = {0x100 + i: ch for i, ch in enumerate(text)}
    entries[0x0003] = " "
    cmap = _tounicode_stream(entries, ("0000", "FFFF"))
    tounicode = w.add(w.stream(b"", cmap))
    warr = b"[256 265 1000 3 [278]]"
    font = _type0_font(w, b"NotoSansJP-Regular", tounicode, dw=1000, w_array=warr)
    cids_a = [0x100 + i for i in range(5)]
    cids_b = [0x100 + i for i in range(5, len(text))]
    content_data = (
        b"BT /F1 12 Tf 72 700 Td " + _hex_tj(cids_a) + b" Tj ET\n"
        b"BT /F1 12 Tf 132 700 Td " + _hex_tj(cids_b) + b" Tj ET\n"
        b"BT /F1 12 Tf 72 680 Td " + _hex_tj(cids_a) + b" Tj ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f17_multipage_table() -> bytes:
    """One table continuing across 2 table-only pages (markdown.rs:267-368)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    kids = []
    header = ["Code", "Qty", "Price"]
    for pg in range(2):
        rows = [header]
        for r in range(6):
            base = pg * 6 + r
            rows.append([f"X{base:03d}", f"{base + 1}", f"{(base + 1) * 2}.50"])
        grid = _grid_lines(72, 700, rows, 8.0, col_w=100, row_h=16)
        c = w.add(w.stream(b"", _tj_lines(grid)))
        kids.append(_page(w, pages, c,
                          resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font))
    _pages_tree(w, pages, kids)
    return w.build(_catalog(w, pages))


def f19_xrefstream() -> bytes:
    """PDF 1.5 layout: cross-reference STREAM (W [1 2 2], Flate) + an
    object STREAM holding the catalog/pages/page/font dicts — exercises
    Document._parse_xref_stream and _from_objstm."""
    # object numbering: 1=catalog 2=pages 3=page 4=font (all in objstm 6),
    # 5=content stream, 6=objstm, 7=xref stream
    font_body = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    catalog_body = b"<< /Type /Catalog /Pages 2 0 R >>"
    pages_body = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    page_body = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Contents 5 0 R /Resources << /Font << /F1 4 0 R >> >> >>")
    inner = [(1, catalog_body), (2, pages_body), (3, page_body), (4, font_body)]
    offsets = []
    payload = bytearray()
    for num, body in inner:
        offsets.append((num, len(payload)))
        payload += body + b"\n"
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b"\n"
    objstm_data = header + bytes(payload)
    first = len(header)

    content_data = (
        b"BT /F1 18 Tf 72 720 Td (Xref stream fixture title) Tj ET\n"
        b"BT /F1 12 Tf 72 690 Td (Body line one inside an object stream pdf) Tj ET\n"
        b"BT /F1 12 Tf 72 676 Td (Body line two for detection threshold) Tj ET\n"
        b"BT /F1 12 Tf 72 662 Td (Body line three to finish the page) Tj ET\n"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    positions: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        positions[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    comp_content = zlib.compress(content_data)
    emit(5, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp_content)
         + comp_content + b"\nendstream")
    comp_objstm = zlib.compress(objstm_data)
    emit(6, b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>\nstream\n"
         % (len(inner), first, len(comp_objstm)) + comp_objstm + b"\nendstream")

    xref_pos = len(out)
    # entries for objects 0..7, W = [1 2 2]
    rows = []
    rows.append(bytes([0]) + (0).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big"))
    for num in (1, 2, 3, 4):
        idx = [n for n, _ in inner].index(num)
        rows.append(bytes([2]) + (6).to_bytes(2, "big") + idx.to_bytes(2, "big"))
    rows.append(bytes([1]) + positions[5].to_bytes(2, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([1]) + positions[6].to_bytes(2, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([1]) + xref_pos.to_bytes(2, "big") + (0).to_bytes(2, "big"))
    xref_data = zlib.compress(b"".join(rows))
    out.extend(b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 2 2] /Root 1 0 R "
               b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(xref_data))
    out.extend(xref_data)
    out.extend(b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


def f20_manypages() -> bytes:
    """12 pages (first 8 with text, last 4 image-only) — exercises the
    sampling strategy at total_pages > max_pages_to_sample
    (detector.rs:114-142): samples pages {1, 12, 3, 5, 7} → 4/5 text...
    actually sampled interior = 1+step*i with step=(12-2)//4=2 → {1,3,5,7,12}:
    pages 1,3,5,7 have text, 12 does not → ratio 0.8 → TextBased."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    kids = []
    for p in range(12):
        if p < 8:
            body = _tj_lines([
                (72, 720, 12, f"Page {p + 1} line one of body text here"),
                (72, 706, 12, f"Page {p + 1} line two with more words"),
                (72, 692, 12, f"Page {p + 1} line three closes the page"),
            ])
            c = w.add(w.stream(b"", body))
            kids.append(_page(w, pages, c,
                              resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font))
        else:
            img = w.add(w.stream(
                b"/Type /XObject /Subtype /Image /Width 100 /Height 100 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 8", b"\x55" * 32))
            c = w.add(w.stream(b"", b"q 612 0 0 792 0 0 cm /Im0 Do Q\n"))
            kids.append(_page(w, pages, c,
                              resources=b"/Resources << /XObject << /Im0 %d 0 R >> >> " % img))
    _pages_tree(w, pages, kids)
    return w.build(_catalog(w, pages))


def f21_encrypted() -> bytes:
    """Trailer carries /Encrypt → the loader must raise PdfError(Encrypted)
    (lib.rs:141 PdfError::Encrypted)."""
    base = f01_tj_simple()
    # splice an /Encrypt entry into the trailer dict
    return base.replace(b"trailer\n<< /Size", b"trailer\n<< /Encrypt 99 0 R /Size")


def f22_textops() -> bytes:
    """T* next-line, ' (move+show), and a scaled Tm — exercises the
    remaining text operators (extractor.rs:1039-1043, 1209-1251) and
    effective_font_size via matrix scale (extractor.rs:1791-1800):
    12pt base with Tm scale 2 → rendered 24pt → heading tier."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    content_data = (
        # Tm with scale 2: 12pt font renders at 24pt -> H1
        b"BT /F1 12 Tf 2 0 0 2 72 740 Tm (Scaled Title Line) Tj ET\n"
        # Td start, then T* line advances (-1.2 * 12 = 14.4pt each)
        b"BT /F1 12 Tf 72 700 Td (first line via Td) Tj "
        b"T* (second line via Tstar) Tj "
        b"T* (third line via Tstar) Tj ET\n"
        # ' operator: newline + show
        b"BT /F1 12 Tf 72 640 Td (before quote op) Tj "
        b"(line from quote op) ' "
        b"(another quote line) ' ET\n"
    )
    content = w.add(w.stream(b"", content_data))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f23_dropcap_captions() -> bytes:
    """Standalone drop cap (own line, different y → exercises
    merge_drop_caps markdown.rs:950-1027 rather than line-grouping),
    Figure/Source caption lines (markdown.rs:1173-1214), a UTF-16BE
    document title (detector.rs:409-416), and real • bullets via an
    Encoding /Differences mapping (markdown.rs:1221-1227)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    enc = w.add(b"<< /Type /Encoding /Differences [ 149 /bullet ] >>")
    bfont = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                  b"/Encoding %d 0 R >>" % enc)
    body = (
        # heading so the drop-cap target line is a paragraph start
        b"BT /F1 18 Tf 72 740 Td (Chapter One Heading) Tj ET\n"
        # standalone drop cap: emitted AFTER its paragraph line (the stream
        # order the reference's merge targets — markdown.rs:894 comment),
        # own line via y 706 vs 700 (> 3pt line tolerance)
        b"BT /F1 12 Tf 95 700 Td (hen the winter came the village prepared) Tj ET\n"
        b"BT /F1 30 Tf 72 706 Td (W) Tj ET\n"
        b"BT /F1 12 Tf 72 686 Td (for the long season ahead with quiet care.) Tj ET\n"
        # caption lines
        b"BT /F1 12 Tf 72 650 Td (Figure 3: seasonal temperature trends) Tj ET\n"
        b"BT /F1 12 Tf 72 622 Td (Source: village records office) Tj ET\n"
        # bullet list via Differences byte 0x95 -> U+2022
        b"BT /F2 12 Tf 72 590 Td (\x95 first bullet point) Tj ET\n"
        b"BT /F2 12 Tf 72 576 Td (\x95 second bullet point) Tj ET\n"
    )
    content = w.add(w.stream(b"", body))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> " % (font, bfont))
    _pages_tree(w, pages, [page])
    root = _catalog(w, pages)
    # UTF-16BE title with BOM: "Über Winter"
    title_utf16 = "Über Winter".encode("utf-16-be")
    info = w.add(b"<< /Title <FEFF" +
                 title_utf16.hex().upper().encode() + b"> >>")
    return w.build(root, info)


def f24_chaotic_order() -> bytes:
    """Content stream emits lines in jumbled Y order (>40% upward jumps of
    >50pt) → should_use_y_sorting fires (extractor.rs:2324-2357) and the
    output restores top-to-bottom reading order. Also a TJ array inside a
    form XObject (extractor.rs:1526-1622)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    # emission order: line3 (y=500), line1 (y=700), line4 (y=400),
    # line2 (y=600), line6 (y=200), line5 (y=300) — 3 up-jumps of 100-200pt
    jumbled = [
        (72, 500, 12, "third line of the document body"),
        (72, 700, 12, "first line of the document body"),
        (72, 400, 12, "fourth line of the document body"),
        (72, 600, 12, "second line of the document body"),
        (72, 200, 12, "sixth line of the document body"),
        (72, 300, 12, "fifth line of the document body"),
    ]
    form_font = _font_simple(w, b"Times-Roman")
    form_content = b"BT /FF1 11 Tf 5 8 Td [(form) -300 (kerned) -50 (text)] TJ ET\n"
    form = w.add(w.stream(
        b"/Type /XObject /Subtype /Form /BBox [0 0 200 30] "
        b"/Resources << /Font << /FF1 %d 0 R >> >>" % form_font, form_content))
    content = w.add(w.stream(
        b"", _tj_lines(jumbled) + b"q 1 0 0 1 72 120 cm /Fm1 Do Q\n"))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R >> /XObject << /Fm1 %d 0 R >> >> "
        % (font, form))
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f25_type3_font() -> bytes:
    """Type3 font with FontMatrix [0.02 ...] — units_scale comes from the
    matrix, not the 1/1000 default (extractor.rs:162-179). Glyphs decode
    via Encoding /Differences; widths 300 font units × 0.02 = 6pt at
    size 1... the fixture uses size 12 so advance = 300*0.02*12 = 72pt?
    No: Type3 glyph space: width*scale*font_size. Widths chosen so words
    join/space plausibly."""
    w = PdfWriter()
    pages = w.reserve()
    helv = _font_simple(w, b"Helvetica")
    charprocs = w.add(b"<< >>")  # glyph programs unused by extraction
    enc = w.add(b"<< /Type /Encoding /Differences [ 65 /A /B /C 97 /a /b /c ] >>")
    t3 = w.add(
        b"<< /Type /Font /Subtype /Type3 /FontMatrix [0.02 0 0 0.02 0 0] "
        b"/FontBBox [0 0 50 50] /FirstChar 65 /LastChar 99 "
        b"/Widths [25 25 25 " + b"0 " * 29 + b"25 25 25] "
        b"/CharProcs %d 0 R /Encoding %d 0 R >>" % (charprocs, enc))
    body = (
        b"BT /F1 12 Tf 72 720 Td (Regular helvetica line above the glyphs) Tj ET\n"
        b"BT /F3 12 Tf 72 690 Td (ABC) Tj ET\n"
        b"BT /F3 12 Tf 72 670 Td (abc) Tj ET\n"
        b"BT /F1 12 Tf 72 640 Td (Closing line for detection threshold) Tj ET\n"
    )
    content = w.add(w.stream(b"", body))
    page = _page(
        w, pages, content,
        resources=b"/Resources << /Font << /F1 %d 0 R /F3 %d 0 R >> >> " % (helv, t3))
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f26_incremental_update() -> bytes:
    """Incremental update: a second body + xref section chained via /Prev
    overrides the page's content stream (the newest definition must win —
    exercises Document._parse_xref_table's Prev chain and first-entry-wins
    xref precedence)."""
    base = f01_tj_simple()
    # object 3 is the content stream in f01 (pages=1? ordering: 1=pages
    # reserve,2=font,3=content,4=page,5=catalog,6=info). Override obj 3.
    new_content = (
        b"BT /F1 24 Tf 72 720 Td (Updated Report) Tj ET\n"
        b"BT /F1 12 Tf 72 680 Td (This replacement body came from an) Tj ET\n"
        b"BT /F1 12 Tf 72 666 Td (incremental update appended to the file.) Tj ET\n"
        b"BT /F1 12 Tf 72 652 Td (The original body must not appear.) Tj ET\n"
    )
    body = b"<< /Length %d >>\nstream\n" % len(new_content) + new_content + b"\nendstream"
    out = bytearray(base)
    obj_offset = len(out)
    out += b"3 0 obj\n" + body + b"\nendobj\n"
    # locate the ORIGINAL startxref offset in the base file
    import re as _re
    m = None
    for m in _re.finditer(rb"startxref\s+(\d+)", base):
        pass
    prev_xref = int(m.group(1))
    xref_pos = len(out)
    out += b"xref\n3 1\n%010d 00000 n \n" % obj_offset
    out += (b"trailer\n<< /Size 7 /Root 5 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (prev_xref, xref_pos))
    return bytes(out)


def f27_three_columns() -> bytes:
    """Three-column layout (two gutters) with a spanning footer line —
    exercises multi-gutter detection and the ≤3-gutter cap logic
    (extractor.rs:2157-2167)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    lines = []
    # columns at x=40..170, 220..350, 400..530 (gutters ~50pt)
    for i in range(25):
        y = 720 - i * 14
        lines.append((40, y, 9, f"alpha col line {i} text"))
        lines.append((220, y, 9, f"beta col line {i} text"))
        lines.append((400, y, 9, f"gamma col line {i} text"))
    lines.append((40, 340, 14, "Spanning footer line across all three columns here"))
    content = w.add(w.stream(b"", _tj_lines(lines)))
    page = _page(w, pages, content, resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f18_corrupt() -> bytes:
    """Truncated xref / garbage — must produce the error column."""
    good = f01_tj_simple()
    return good[: len(good) // 3] + b"\xde\xad\xbe\xef GARBAGE NOT PDF"


# -- non-Flate stream-filter encoders (deterministic; VERDICT r02 fix #3:
# the reference inherits lopdf's LZW/ASCIIHex/ASCII85/RunLength support,
# Cargo.toml:11-12 + src/extractor.rs:953-957) ------------------------------

def _lzw_encode(data: bytes) -> bytes:
    """Greedy LZW encoder (PDF §7.4.4 semantics, EarlyChange=1): MSB-first
    9→12-bit codes, clear=256 emitted once up front, EOD=257."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    cur = b""
    i = 0
    while i < len(data):
        nxt = cur + data[i : i + 1]
        if nxt in table:
            cur = nxt
            i += 1
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code >= (1 << width) and width < 12:  # EarlyChange=1
            width += 1
        cur = b""
    if cur:
        emit(table[cur])
    emit(257)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rl_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (PDF §7.4.5) ending in EOD 128."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (j < len(data) and (j + 1 >= len(data)
                                      or data[j + 1] != data[j])
                   and j - i < 128):
                j += 1
            lit = data[i:j]
            out.append(len(lit) - 1)
            out += lit
            i = j
    out.append(128)
    return bytes(out)


def _a85_encode(data: bytes) -> bytes:
    """ASCII85Decode-compatible payload (PDF framing: no ``<~``, ends ``~>``)."""
    import base64
    return base64.a85encode(data) + b"~>"


def _filtered_stream(filters: bytes, data: bytes) -> bytes:
    return (b"<< /Filter " + filters + b" /Length %d >>\nstream\n" % len(data)
            + data + b"\nendstream")


def f28_lzw() -> bytes:
    """Content stream behind /LZWDecode (repetitive text so the table and
    9→10-bit width-change path are exercised)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [(72, 720, 18, "LZW Compressed Heading")]
    for i in range(14):
        body.append((72, 690 - 14 * i, 11,
                     f"lzw body line {i} repeat repeat repeat repeat repeat"))
    content = w.add(_filtered_stream(b"/LZWDecode", _lzw_encode(_tj_lines(body))))
    page = _page(w, pages, content,
                 resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f29_ascii85() -> bytes:
    """Content stream behind /ASCII85Decode (incl. a trailing partial group)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 720, 18, "ASCII85 Filtered Title"),
        (72, 690, 12, "base85 encoded body text survives the filter chain"),
        (72, 676, 12, "second line with different words entirely"),
    ]
    content = w.add(_filtered_stream(b"/ASCII85Decode",
                                     _a85_encode(_tj_lines(body))))
    page = _page(w, pages, content,
                 resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f30_runlength() -> bytes:
    """Content stream behind /RunLengthDecode (literal + repeat runs)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 720, 18, "RunLength Filtered Title"),
        (72, 690, 12, "aaaaaaaa bbbbbbbb literal mix cccccccc"),
        (72, 676, 12, "plain prose line without long runs"),
    ]
    content = w.add(_filtered_stream(b"/RunLengthDecode",
                                     _rl_encode(_tj_lines(body))))
    page = _page(w, pages, content,
                 resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f31_filter_chain() -> bytes:
    """Two-filter chain [/ASCIIHexDecode /FlateDecode]: the cascade must
    apply filters in array order (hex-decode, then inflate)."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 720, 18, "Chained Filters Title"),
        (72, 690, 12, "hex wrapped deflate payload decodes in order"),
    ]
    payload = zlib.compress(_tj_lines(body)).hex().encode("ascii") + b">"
    content = w.add(_filtered_stream(b"[/ASCIIHexDecode /FlateDecode]",
                                     payload))
    page = _page(w, pages, content,
                 resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


def f32_bogus_image_filter() -> bytes:
    """Content stream that DECLARES an image codec (/DCTDecode) the
    engine does not implement, while the raw bytes are plain content
    operators. Mirrors the reference's decompress-fail → raw-bytes
    fallback (src/detector.rs:249-259): ``Stream.decoded`` raises
    PdfError for the unknown filter and every caller falls back to the
    raw bytes, so classification AND extraction still see the text."""
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    body = [
        (72, 720, 18, "Bogus Image Filter Title"),
        (72, 690, 12, "raw fallback text survives the unknown codec"),
        (72, 676, 12, "second fallback line stays extractable"),
    ]
    content = w.add(_filtered_stream(b"/DCTDecode", _tj_lines(body)))
    page = _page(w, pages, content,
                 resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font)
    _pages_tree(w, pages, [page])
    return w.build(_catalog(w, pages))


FIXTURES = {
    "f01_tj_simple": f01_tj_simple,
    "f02_tj_arraykern": f02_tj_arraykern,
    "f03_type0_tounicode": f03_type0_tounicode,
    "f04_onebyte_cmap": f04_onebyte_cmap,
    "f05_differences": f05_differences,
    "f06_scanned": f06_scanned,
    "f07_mixed_template": f07_mixed_template,
    "f08_multicolumn": f08_multicolumn,
    "f09_headers_lists_code": f09_headers_lists_code,
    "f10_table_smallfont": f10_table_smallfont,
    "f11_table_bodyfont": f11_table_bodyfont,
    "f12_links_images": f12_links_images,
    "f13_form_xobject": f13_form_xobject,
    "f14_dropcap_ligatures": f14_dropcap_ligatures,
    "f15_pagenumbers_toc": f15_pagenumbers_toc,
    "f16_cjk": f16_cjk,
    "f17_multipage_table": f17_multipage_table,
    "f18_corrupt": f18_corrupt,
    "f19_xrefstream": f19_xrefstream,
    "f20_manypages": f20_manypages,
    "f21_encrypted": f21_encrypted,
    "f22_textops": f22_textops,
    "f23_dropcap_captions": f23_dropcap_captions,
    "f24_chaotic_order": f24_chaotic_order,
    "f25_type3_font": f25_type3_font,
    "f26_incremental_update": f26_incremental_update,
    "f27_three_columns": f27_three_columns,
    "f28_lzw": f28_lzw,
    "f29_ascii85": f29_ascii85,
    "f30_runlength": f30_runlength,
    "f31_filter_chain": f31_filter_chain,
    "f32_bogus_image_filter": f32_bogus_image_filter,
}


def fixture_pool() -> dict[str, bytes]:
    """All fixture PDFs, generated deterministically."""
    return {name: fn() for name, fn in FIXTURES.items()}


# -- parametrized generator (test-only; NOT in FIXTURES so corpus digests
# stay stable) ------------------------------------------------------------

_PROSE_WORDS = ("report quarter revenue margin growth capital region plan "
                "board market supply order line value data stream batch "
                "window merge system process review result summary").split()


def make_prose_pdf(seed: int) -> bytes:
    """Seeded multi-page document: varied page counts, heading tiers,
    paragraphs, lists, and an optional small-font table. Used by the
    broadened golden-equality tests (tests/test_prose_corpus.py)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    w = PdfWriter()
    pages = w.reserve()
    font = _font_simple(w, b"Helvetica")
    n_pages = int(rng.integers(1, 5))
    kids = []

    def sentence(n=8):
        return " ".join(str(rng.choice(_PROSE_WORDS)) for _ in range(n))

    for p in range(n_pages):
        lines = []
        y = 740.0
        if p == 0:
            lines.append((72, y, 22, f"Document {seed} Overview".title()))
            y -= 36
        n_sections = int(rng.integers(1, 4))
        for s in range(n_sections):
            lines.append((72, y, 16, sentence(3).title()))
            y -= 24
            for _ in range(int(rng.integers(2, 6))):
                lines.append((72, y, 11, sentence(int(rng.integers(6, 11)))))
                y -= 13.5
            y -= 8
            if rng.random() < 0.4:
                for li in range(int(rng.integers(2, 5))):
                    lines.append((72, y, 11, f"- {sentence(4)}"))
                    y -= 13.5
                y -= 8
            if y < 140:
                break
        if rng.random() < 0.35 and y > 260:
            rows = [["Metric", "Q1", "Q2", "Q3"]]
            for r in range(int(rng.integers(3, 6))):
                rows.append([sentence(1), f"{rng.integers(1, 99)}.{rng.integers(0, 9)}",
                             f"{rng.integers(1, 99)}.{rng.integers(0, 9)}",
                             f"{rng.integers(1, 99)}.{rng.integers(0, 9)}"])
            lines.extend(_grid_lines(72, y - 10, rows, 8.0))
        content = w.add(w.stream(b"", _tj_lines(lines)))
        kids.append(_page(w, pages, content,
                          resources=b"/Resources << /Font << /F1 %d 0 R >> >> " % font))
    _pages_tree(w, pages, kids)
    return w.build(_catalog(w, pages))
