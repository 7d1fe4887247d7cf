"""Conformance ports of the reference's tounicode unit tests
(/root/reference/src/tounicode.rs:685-821)."""

from pdf_inspector_ray.pdfi.tounicode import ToUnicodeCMap

CMAP_2BYTE = b"""
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000><FFFF>
endcodespacerange
3 beginbfchar
<0003> <0020>
<0024> <0041>
<0025> <0042>
endbfchar
endcmap
"""


def test_parse_bfchar_2byte():
    cmap = ToUnicodeCMap.parse(CMAP_2BYTE)
    assert cmap.code_byte_length == 2
    assert cmap.lookup(0x0003) == " "
    assert cmap.lookup(0x0024) == "A"
    assert cmap.lookup(0x0025) == "B"


def test_parse_bfchar_1byte():
    # codespace <0000><FFFF> but 1-byte source codes → demoted to 1-byte
    content = b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<20> <0020>
<41> <0041>
<42> <0042>
endbfchar
"""
    cmap = ToUnicodeCMap.parse(content)
    assert cmap.code_byte_length == 1
    assert cmap.lookup(0x20) == " "
    assert cmap.lookup(0x41) == "A"


def test_decode_cids_2byte():
    cmap = ToUnicodeCMap.parse(CMAP_2BYTE)
    cids = bytes([0x00, 0x24, 0x00, 0x25, 0x00, 0x03])
    assert cmap.decode_cids(cids) == "AB "


def test_decode_cids_1byte_no_cjk_garbage():
    content = b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
5 beginbfchar
<20> <0020>
<42> <0042>
<79> <0079>
<50> <0050>
<52> <0052>
endbfchar
"""
    cmap = ToUnicodeCMap.parse(content)
    assert cmap.code_byte_length == 1
    result = cmap.decode_cids(bytes([0x42, 0x79]))
    assert result == "By"
    assert "䉹" not in result
    assert cmap.decode_cids(bytes([0x50, 0x52])) == "PR"


def test_bfrange_array_format():
    content = b"""
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0003> <0005> [<0041> <0042> <0043>]
endbfrange
"""
    cmap = ToUnicodeCMap.parse(content)
    assert cmap.lookup(0x0003) == "A"
    assert cmap.lookup(0x0004) == "B"
    assert cmap.lookup(0x0005) == "C"


def test_unmapped_2byte_cids_skipped():
    content = b"""
1 begincodespacerange
<0000><FFFF>
endcodespacerange
1 beginbfchar
<0041> <0041>
endbfchar
"""
    cmap = ToUnicodeCMap.parse(content)
    assert cmap.code_byte_length == 2
    result = cmap.decode_cids(bytes([0x42, 0x79]))
    assert "䉹" not in result


def test_bfrange_base_form():
    content = b"""
1 begincodespacerange
<0000><FFFF>
endcodespacerange
1 beginbfrange
<0010> <0013> <0061>
endbfrange
"""
    cmap = ToUnicodeCMap.parse(content)
    assert cmap.lookup(0x10) == "a"
    assert cmap.lookup(0x13) == "d"
    assert cmap.lookup(0x14) is None


def test_fontcmaps_fuzzy_lookup():
    """tounicode.rs:588-607: exact name, then F-strip substring match
    (only when the stripped name is >= 4 chars)."""
    from pdf_inspector_ray.pdfi.tounicode import FontCMaps

    fc = FontCMaps()
    cmap = ToUnicodeCMap.parse(CMAP_2BYTE)
    fc.by_name["NotoSans0"] = cmap
    assert fc.get("NotoSans0") is cmap           # exact
    assert fc.get("FNotoSans0") is cmap          # strip leading F, substring
    assert fc.get("FNoto") is cmap               # "Noto" in "NotoSans0"
    assert fc.get("F1") is None                  # stripped "1" too short
    assert fc.get("Zzz") is None


def test_fontcmaps_get_with_obj():
    from pdf_inspector_ray.pdfi.tounicode import FontCMaps

    fc = FontCMaps()
    cmap_a = ToUnicodeCMap.parse(CMAP_2BYTE)
    cmap_b = ToUnicodeCMap.parse(CMAP_2BYTE)
    fc.by_name["Base_7"] = cmap_a
    fc.by_obj_num[9] = cmap_b
    assert fc.get_with_obj("Base", 7) is cmap_a   # unique key first
    assert fc.get_with_obj("Base", 9) is cmap_b   # falls back to obj lookup
    assert fc.get_by_obj(9) is cmap_b
