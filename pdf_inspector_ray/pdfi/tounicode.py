"""ToUnicode CMap parsing + raw-bytes harvest.

Port of /root/reference/src/tounicode.rs. The parse, the codespace 1-byte
demotion (tounicode.rs:89-109), the decode fallback semantics
(tounicode.rs:326-374), and the raw-bytes font/CMap harvest
(tounicode.rs:477-683) are replicated exactly; any deviation breaks
per-turn text equality.

Ray note: ``FontCMaps.from_pdf_bytes`` is invoked once per document inside
the extract actor; parsed CMaps are additionally cached per-actor keyed by
stream hash (see stages/extract.py), since transcript corpora repeat a small
set of fonts across many turns.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional


class ToUnicodeCMap:
    __slots__ = ("char_map", "ranges", "code_byte_length")

    def __init__(self):
        self.char_map: dict[int, str] = {}
        self.ranges: list[tuple[int, int, int]] = []
        self.code_byte_length: int = 2

    # -- parse -------------------------------------------------------------
    @classmethod
    def parse(cls, content: bytes) -> Optional["ToUnicodeCMap"]:
        """tounicode.rs:27-112."""
        text = content.decode("utf-8", errors="replace")
        cmap = cls()
        src_hex_lengths: list[int] = []

        # codespace byte width
        codespace_byte_len: Optional[int] = None
        cs_start = text.find("begincodespacerange")
        if cs_start != -1:
            section_start = cs_start + len("begincodespacerange")
            cs_end = text.find("endcodespacerange", section_start)
            if cs_end != -1:
                section = text[section_start:cs_end]
                in_hex = False
                hex_len = 0
                for c in section:
                    if c == "<":
                        in_hex = True
                        hex_len = 0
                    elif c == ">":
                        if in_hex and hex_len > 0:
                            codespace_byte_len = (hex_len + 1) // 2
                        in_hex = False
                    elif in_hex and c in "0123456789abcdefABCDEF":
                        hex_len += 1

        # bfchar sections
        pos = 0
        while True:
            start = text.find("beginbfchar", pos)
            if start == -1:
                break
            section_start = start + len("beginbfchar")
            end = text.find("endbfchar", section_start)
            if end == -1:
                break
            cmap._parse_bfchar(text[section_start:end], src_hex_lengths)
            pos = end

        # bfrange sections
        pos = 0
        while True:
            start = text.find("beginbfrange", pos)
            if start == -1:
                break
            section_start = start + len("beginbfrange")
            end = text.find("endbfrange", section_start)
            if end == -1:
                break
            cmap._parse_bfrange(text[section_start:end], src_hex_lengths)
            pos = end

        if not cmap.char_map and not cmap.ranges:
            return None

        if codespace_byte_len is not None:
            if (
                codespace_byte_len == 2
                and src_hex_lengths
                and all(l <= 2 for l in src_hex_lengths)
            ):
                cmap.code_byte_length = 1  # the CJK-garbage demotion
            else:
                cmap.code_byte_length = codespace_byte_len
        elif src_hex_lengths:
            cmap.code_byte_length = 1 if max(src_hex_lengths) <= 2 else 2
        else:
            cmap.code_byte_length = 2
        return cmap

    def _parse_bfchar(self, section: str, src_hex_lengths: list[int]) -> None:
        """tounicode.rs:115-173: <src> <dst> pairs."""
        i, n = 0, len(section)
        while True:
            while i < n and section[i].isspace():
                i += 1
            if i >= n or section[i] != "<":
                break
            i += 1
            j = section.find(">", i)
            if j == -1:
                break
            src_hex = section[i:j]
            i = j + 1
            trimmed = src_hex.strip()
            if trimmed:
                src_hex_lengths.append(len(trimmed))
            while i < n and section[i].isspace():
                i += 1
            if i >= n or section[i] != "<":
                continue
            i += 1
            j = section.find(">", i)
            if j == -1:
                break
            dst_hex = section[i:j]
            i = j + 1
            src = _parse_hex_u16(src_hex)
            dst = _hex_to_unicode_string(dst_hex)
            if src is not None and dst is not None:
                self.char_map[src] = dst

    def _parse_bfrange(self, section: str, src_hex_lengths: list[int]) -> None:
        """tounicode.rs:176-302: <start> <end> <base> | <start> <end> [<u>...]."""
        i, n = 0, len(section)
        while True:
            while i < n and section[i].isspace():
                i += 1
            if i >= n or section[i] != "<":
                break
            i += 1
            j = section.find(">", i)
            if j == -1:
                break
            start_hex = section[i:j]
            i = j + 1
            trimmed = start_hex.strip()
            if trimmed:
                src_hex_lengths.append(len(trimmed))
            while i < n and section[i].isspace():
                i += 1
            if i >= n or section[i] != "<":
                continue
            i += 1
            j = section.find(">", i)
            if j == -1:
                break
            end_hex = section[i:j]
            i = j + 1
            while i < n and section[i].isspace():
                i += 1
            if i < n and section[i] == "<":
                i += 1
                j = section.find(">", i)
                if j == -1:
                    break
                base_hex = section[i:j]
                i = j + 1
                start = _parse_hex_u16(start_hex)
                end = _parse_hex_u16(end_hex)
                base = _parse_hex_u32(base_hex)
                if start is not None and end is not None and base is not None:
                    self.ranges.append((start, end, base))
            elif i < n and section[i] == "[":
                i += 1
                start = _parse_hex_u16(start_hex)
                end = _parse_hex_u16(end_hex)
                if start is not None and end is not None:
                    cid = start
                    while True:
                        while i < n and section[i].isspace():
                            i += 1
                        if i < n and section[i] == "]":
                            i += 1
                            break
                        if i >= n or section[i] != "<":
                            break
                        i += 1
                        j = section.find(">", i)
                        if j == -1:
                            i = n
                            break
                        hex_s = section[i:j]
                        i = j + 1
                        u = _hex_to_unicode_string(hex_s)
                        if u is not None:
                            self.char_map[cid] = u
                        if cid >= end:
                            k = section.find("]", i)
                            i = (k + 1) if k != -1 else n
                            break
                        cid = min(cid + 1, 0xFFFF)
                else:
                    k = section.find("]", i)
                    i = (k + 1) if k != -1 else n

    # -- decode ------------------------------------------------------------
    def lookup(self, cid: int) -> Optional[str]:
        """tounicode.rs:305-323."""
        s = self.char_map.get(cid)
        if s is not None:
            return s
        for start, end, base in self.ranges:
            if start <= cid <= end:
                code = base + (cid - start)
                if 0 <= code <= 0x10FFFF and not (0xD800 <= code <= 0xDFFF):
                    return chr(code)
        return None

    def decode_cids(self, data: bytes) -> str:
        """tounicode.rs:326-374: 1-byte Latin-1 fallback for >=0x20; 2-byte
        unmapped skipped; >50% unmapped → empty string to signal fallback."""
        out: list[str] = []
        unmapped = 0
        if self.code_byte_length == 1:
            for b in data:
                s = self.lookup(b)
                if s is not None:
                    out.append(s)
                else:
                    if b >= 0x20:
                        out.append(chr(b))
                    unmapped += 1
            total = len(data)
        else:
            for i in range(0, len(data) - 1, 2):
                cid = (data[i] << 8) | data[i + 1]
                s = self.lookup(cid)
                if s is not None:
                    out.append(s)
                else:
                    unmapped += 1
            total = len(data) // 2
        if total > 0 and unmapped > total // 2:
            return ""
        return "".join(out)


def _parse_hex_u16(s: str) -> Optional[int]:
    try:
        v = int(s.strip(), 16)
        return v if 0 <= v <= 0xFFFF else None
    except ValueError:
        return None


def _parse_hex_u32(s: str) -> Optional[int]:
    try:
        v = int(s.strip(), 16)
        return v if 0 <= v <= 0xFFFFFFFF else None
    except ValueError:
        return None


def _hex_to_unicode_string(s: str) -> Optional[str]:
    """tounicode.rs:389-409: 4 hex digits at a time → BMP chars."""
    s = s.strip()
    out: list[str] = []
    i = 0
    while i + 4 <= len(s):
        try:
            cp = int(s[i : i + 4], 16)
            if not (0xD800 <= cp <= 0xDFFF):
                out.append(chr(cp))
        except ValueError:
            pass
        i += 4
    if not out:
        return None
    return "".join(out)


# -- raw-bytes stream extraction (tounicode.rs:413-466) ---------------------

def extract_stream_from_raw_pdf(pdf_bytes: bytes, obj_num: int) -> Optional[bytes]:
    pattern = b"%d 0 obj" % obj_num
    obj_start = pdf_bytes.find(pattern)
    if obj_start == -1:
        return None
    search_start = obj_start + len(pattern)
    sk = pdf_bytes.find(b"stream", search_start)
    if sk == -1:
        return None
    stream_start = sk + 6
    content_start = stream_start
    if pdf_bytes[content_start : content_start + 1] == b"\r":
        content_start += 1
    if pdf_bytes[content_start : content_start + 1] == b"\n":
        content_start += 1
    se = pdf_bytes.find(b"endstream", content_start)
    if se == -1:
        return None
    actual_end = se
    if actual_end > content_start and pdf_bytes[actual_end - 1 : actual_end] == b"\n":
        actual_end -= 1
    if actual_end > content_start and pdf_bytes[actual_end - 1 : actual_end] == b"\r":
        actual_end -= 1
    stream_data = pdf_bytes[content_start:actual_end]
    dict_region = pdf_bytes[obj_start:stream_start]
    if b"FlateDecode" in dict_region:
        try:
            return zlib.decompress(stream_data)
        except zlib.error:
            return stream_data
    return stream_data


# Per-process CMap parse cache keyed by stream-content digest: transcript
# corpora repeat a small set of fonts across billions of turns, so each
# worker parses any given ToUnicode stream once (the per-document "object
# store" cache the north star names — SURVEY.md §2.3 E19). Parsed CMaps
# are immutable after parse, so sharing across documents is safe.
_CMAP_PARSE_CACHE: dict[bytes, Optional[ToUnicodeCMap]] = {}
_CMAP_PARSE_CACHE_MAX = 4096


def _parse_cmap_cached(stream_data: bytes) -> Optional[ToUnicodeCMap]:
    import hashlib

    key = hashlib.md5(stream_data, usedforsecurity=False).digest()
    if key in _CMAP_PARSE_CACHE:
        return _CMAP_PARSE_CACHE[key]
    cmap = ToUnicodeCMap.parse(stream_data)
    if len(_CMAP_PARSE_CACHE) >= _CMAP_PARSE_CACHE_MAX:
        _CMAP_PARSE_CACHE.clear()  # rare; simple reset beats LRU bookkeeping
    _CMAP_PARSE_CACHE[key] = cmap
    return cmap


def extract_tounicode_cmaps(pdf_bytes: bytes) -> dict[int, ToUnicodeCMap]:
    """tounicode.rs:477-514: find /ToUnicode N 0 R refs, pull + parse streams."""
    cmaps: dict[int, ToUnicodeCMap] = {}
    pos = 0
    while True:
        idx = pdf_bytes.find(b"/ToUnicode", pos)
        if idx == -1:
            break
        ref_start = idx + 10
        p = ref_start
        n = len(pdf_bytes)
        while p < n and pdf_bytes[p] in b" \n\r":
            p += 1
        num_start = p
        while p < n and 0x30 <= pdf_bytes[p] <= 0x39:
            p += 1
        if p > num_start:
            obj_num = int(pdf_bytes[num_start:p])
            if obj_num not in cmaps:
                stream_data = extract_stream_from_raw_pdf(pdf_bytes, obj_num)
                if stream_data is not None:
                    cmap = _parse_cmap_cached(stream_data)
                    if cmap is not None:
                        cmaps[obj_num] = cmap
        pos = ref_start
    return cmaps


def _find_dict_start(data: bytes) -> Optional[int]:
    """tounicode.rs:627-635: search backwards for '<<'."""
    idx = data.rfind(b"<<")
    return idx if idx != -1 else None


def _extract_font_name(dict_region: bytes) -> Optional[str]:
    """tounicode.rs:638-665: /BaseFont /Name."""
    idx = dict_region.find(b"/BaseFont")
    if idx == -1:
        return None
    after = dict_region[idx + 9 :]
    p, n = 0, len(after)
    while p < n and after[p] in b" \n\r":
        p += 1
    if p < n and after[p] == 0x2F:
        p += 1
        start = p
        while p < n and after[p] not in b"\x00\t\n\x0c\r /<>[]{}(%)":
            p += 1
        name = after[start:p].decode("latin-1")
        if name:
            return name
    return None


def _extract_obj_reference(data: bytes) -> Optional[int]:
    """tounicode.rs:668-683: 'N 0 R' → N."""
    p, n = 0, len(data)
    while p < n and data[p] in b" \n\r":
        p += 1
    start = p
    while p < n and 0x30 <= data[p] <= 0x39:
        p += 1
    if p > start:
        return int(data[start:p])
    return None


class FontCMaps:
    """tounicode.rs:516-623: per-document font→CMap index."""

    __slots__ = ("by_name", "by_obj_num")

    def __init__(self):
        self.by_name: dict[str, ToUnicodeCMap] = {}
        self.by_obj_num: dict[int, ToUnicodeCMap] = {}

    @classmethod
    def from_pdf_bytes(cls, pdf_bytes: bytes) -> "FontCMaps":
        """tounicode.rs:527-585."""
        fc = cls()
        cmaps_by_obj = extract_tounicode_cmaps(pdf_bytes)
        pos = 0
        n = len(pdf_bytes)
        while pos < n:
            idx = pdf_bytes.find(b"/Type /Font", pos)
            if idx == -1:
                break
            font_start = idx
            dict_start = _find_dict_start(pdf_bytes[:font_start])
            de = pdf_bytes.find(b">>", font_start)
            dict_end = (de + 2) if de != -1 else None
            if dict_start is not None and dict_end is not None:
                dict_region = pdf_bytes[dict_start:dict_end]
                font_name = _extract_font_name(dict_region)
                if font_name is not None:
                    tu_idx = dict_region.find(b"/ToUnicode")
                    if tu_idx != -1:
                        obj_num = _extract_obj_reference(dict_region[tu_idx + 10 :])
                        if obj_num is not None and obj_num in cmaps_by_obj:
                            cmap = cmaps_by_obj[obj_num]
                            fc.by_name[f"{font_name}_{obj_num}"] = cmap
                            fc.by_name[font_name] = cmap
            pos = font_start + 10
        fc.by_obj_num = cmaps_by_obj
        return fc

    def get(self, font_name: str) -> Optional[ToUnicodeCMap]:
        """tounicode.rs:588-607: exact, then fuzzy with F-strip (>=4 chars)."""
        cmap = self.by_name.get(font_name)
        if cmap is not None:
            return cmap
        stripped = font_name[1:] if font_name.startswith("F") else font_name
        if len(stripped) >= 4:
            for name, cm in self.by_name.items():
                if stripped in name or name in stripped:
                    return cm
        return None

    def get_by_obj(self, obj_num: int) -> Optional[ToUnicodeCMap]:
        return self.by_obj_num.get(obj_num)

    def get_with_obj(self, font_name: str, obj_num: int) -> Optional[ToUnicodeCMap]:
        """tounicode.rs:615-623."""
        cmap = self.by_name.get(f"{font_name}_{obj_num}")
        if cmap is not None:
            return cmap
        return self.by_obj_num.get(obj_num)
