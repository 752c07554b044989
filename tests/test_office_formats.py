"""Pure-Python DOCX/XLSX/RTF/MSG/XLS extraction (S3, S8-S11).

Fixtures are built byte-by-byte in-test: OPC zips via ``zipfile``,
compound files via a minimal [MS-CFB] writer (``_build_cfb``), BIFF8
records via ``struct`` — no external parser libraries anywhere.
"""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from vectordb_light_spark.sources.cfb import CompoundFile, msg_text, xls_text
from vectordb_light_spark.sources.extract import extract_bytes
from vectordb_light_spark.sources.office_text import docx_text, rtf_text, xlsx_text

# ---------------------------------------------------------------------------
# CFB writer (test-side only)
# ---------------------------------------------------------------------------

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


def _pad(data: bytes, size: int) -> bytes:
    return data + b"\x00" * (-len(data) % size)


def _dir_entry(name: str, etype: int, start: int, size: int) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    assert len(raw_name) <= 64
    entry = bytearray(128)
    entry[0 : len(raw_name)] = raw_name
    struct.pack_into("<H", entry, 64, len(raw_name))
    entry[66] = etype
    entry[67] = 1  # black
    struct.pack_into("<III", entry, 68, _FREESECT, _FREESECT, _FREESECT)
    struct.pack_into("<I", entry, 116, start)
    struct.pack_into("<Q", entry, 120, size)
    return bytes(entry)


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-FAT-sector compound file; streams < 4096 bytes go to the
    mini stream (exercising the miniFAT path), larger to the FAT."""
    small = {n: d for n, d in streams.items() if len(d) < 4096}
    large = {n: d for n, d in streams.items() if len(d) >= 4096}

    # mini stream + miniFAT (sequential chains)
    minidata = b""
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for name, data in small.items():
        mini_start[name] = len(minifat)
        n_sect = max(1, -(-len(data) // 64))
        minifat.extend(list(range(len(minifat) + 1, len(minifat) + n_sect)) + [_ENDOFCHAIN])
        minidata += _pad(data, 64)
    minifat_raw = _pad(
        b"".join(struct.pack("<I", v) for v in minifat), 512
    ) if minifat else b""

    # regular sector layout: [0]=FAT, then directory, miniFAT,
    # ministream, large streams
    n_dir_sect = max(1, -(-((1 + len(streams)) * 128) // 512))
    n_minifat_sect = len(minifat_raw) // 512
    n_mini_sect = len(_pad(minidata, 512)) // 512 if minidata else 0

    sect = 1
    dir_start, sect = sect, sect + n_dir_sect
    minifat_start = sect if n_minifat_sect else _ENDOFCHAIN
    sect += n_minifat_sect
    ministream_start = sect if n_mini_sect else _ENDOFCHAIN
    sect += n_mini_sect
    large_start: dict[str, int] = {}
    for name, data in large.items():
        large_start[name] = sect
        sect += len(_pad(data, 512)) // 512
    total_sect = sect

    fat = [_FREESECT] * 128
    fat[0] = _FATSECT

    def chain(start: int, count: int) -> None:
        for i in range(count):
            fat[start + i] = start + i + 1 if i < count - 1 else _ENDOFCHAIN

    chain(dir_start, n_dir_sect)
    if n_minifat_sect:
        chain(minifat_start, n_minifat_sect)
    if n_mini_sect:
        chain(ministream_start, n_mini_sect)
    for name, data in large.items():
        chain(large_start[name], len(_pad(data, 512)) // 512)

    entries = [_dir_entry("Root Entry", 5, ministream_start, len(minidata))]
    for name, data in streams.items():
        start = mini_start[name] if name in small else large_start[name]
        entries.append(_dir_entry(name, 2, start, len(data)))
    dir_raw = _pad(b"".join(entries), 512)
    assert len(dir_raw) == n_dir_sect * 512

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 26, 0x003E)  # minor version
    struct.pack_into("<H", header, 28, 0x0003)  # major version 3
    struct.pack_into("<H", header, 24, 0)
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, 1)  # FAT sector count
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat_sect)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    body = bytearray(512 * total_sect)
    body[0:512] = b"".join(struct.pack("<I", v) for v in fat)
    body[(dir_start) * 512 : dir_start * 512 + len(dir_raw)] = dir_raw
    if n_minifat_sect:
        body[minifat_start * 512 : minifat_start * 512 + len(minifat_raw)] = minifat_raw
    if n_mini_sect:
        mini_raw = _pad(minidata, 512)
        body[ministream_start * 512 : ministream_start * 512 + len(mini_raw)] = mini_raw
    for name, data in large.items():
        raw = _pad(data, 512)
        body[large_start[name] * 512 : large_start[name] * 512 + len(raw)] = raw
    return bytes(header) + bytes(body)


# ---------------------------------------------------------------------------
# BIFF8 record helpers (test-side only)
# ---------------------------------------------------------------------------


def _rec(opcode: int, payload: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(payload)) + payload


def _biff_bof(doctype: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, doctype, 0, 0, 0, 0))


def _sst(strings: list[str], total: int | None = None) -> bytes:
    payload = struct.pack("<II", total or len(strings), len(strings))
    for s in strings:
        payload += struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    return _rec(0x00FC, payload)


def _labelsst(r: int, c: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def _number(r: int, c: int, v: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHHd", r, c, 0, v))


def _rk_int(v: int, div100: bool = False) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if div100 else 0)


def _rk_cell(r: int, c: int, rk: int) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))


def _mulrk(r: int, c_first: int, rks: list[int]) -> bytes:
    payload = struct.pack("<HH", r, c_first)
    for rk in rks:
        payload += struct.pack("<HI", 0, rk)
    payload += struct.pack("<H", c_first + len(rks) - 1)
    return _rec(0x00BD, payload)


def _xls_bytes() -> bytes:
    globals_sub = _biff_bof(0x0005) + _sst(["alpha", "beta"]) + _rec(0x000A, b"")
    sheet = (
        _biff_bof(0x0010)
        + _labelsst(0, 0, 0)
        + _labelsst(0, 1, 1)
        + _number(1, 0, 2.5)
        + _rk_cell(1, 1, _rk_int(42))
        + _mulrk(2, 0, [_rk_int(700, div100=True), _rk_int(8)])
        + _rec(0x000A, b"")
    )
    return _build_cfb({"Workbook": globals_sub + sheet})


# ---------------------------------------------------------------------------
# DOCX / XLSX fixtures
# ---------------------------------------------------------------------------

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _docx_bytes() -> bytes:
    document = f"""<?xml version="1.0"?>
<w:document {_W}><w:body>
  <w:p><w:r><w:t>Hello</w:t><w:tab/><w:t>world</w:t></w:r></w:p>
  <w:p><w:r><w:t>Second</w:t><w:br/><w:t>paragraph</w:t></w:r></w:p>
  <w:p/>
</w:body></w:document>"""
    header = f"""<?xml version="1.0"?>
<w:hdr {_W}><w:p><w:r><w:t>Confidential</w:t></w:r></w:p></w:hdr>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", document)
        zf.writestr("word/header1.xml", header)
    return buf.getvalue()


_S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def _xlsx_bytes() -> bytes:
    workbook = f"""<?xml version="1.0"?>
<workbook {_S} {_R}><sheets>
  <sheet name="S1" sheetId="1" r:id="rId1"/>
</sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
</Relationships>"""
    shared = f"""<?xml version="1.0"?>
<sst {_S}><si><t>name</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"""
    sheet = f"""<?xml version="1.0"?>
<worksheet {_S}><sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2"><v>42</v></c><c r="B2"><v>2.5</v></c>
      <c r="C2" t="inlineStr"><is><t>inline</t></is></c></row>
  <row r="3"><c r="A3" t="b"><v>1</v></c></row>
  <row r="4"/>
</sheetData></worksheet>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# DOCX / XLSX / RTF
# ---------------------------------------------------------------------------


class TestDocx:
    def test_body_paragraphs_and_tabs(self):
        text = docx_text(_docx_bytes())
        assert text is not None
        assert "Hello\tworld" in text
        assert "Second\nparagraph" in text

    def test_header_precedes_body(self):
        text = docx_text(_docx_bytes())
        assert text.index("Confidential") < text.index("Hello")

    def test_empty_paragraphs_dropped(self):
        assert "\n\n\n" not in docx_text(_docx_bytes())

    def test_not_a_zip_is_none(self):
        assert docx_text(b"not a zip at all") is None

    def test_dispatch_via_extract_bytes(self):
        text, reason = extract_bytes("a/report.docx", _docx_bytes())
        assert reason is None and "Hello\tworld" in text


class TestXlsx:
    def test_shared_inline_numeric_bool(self):
        text = xlsx_text(_xlsx_bytes())
        assert text.splitlines() == ["name rich", "42 2.5 inline", "True"]

    def test_xlsm_dispatch(self):
        text, reason = extract_bytes("b/sheet.xlsm", _xlsx_bytes())
        assert reason is None and text.startswith("name rich")

    def test_missing_shared_strings_ok(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(
                "xl/worksheets/sheet1.xml",
                f'<worksheet {_S}><sheetData><row><c><v>7</v></c></row>'
                "</sheetData></worksheet>",
            )
        assert xlsx_text(buf.getvalue()) == "7"

    def test_garbage_is_none(self):
        assert xlsx_text(b"\x00\x01") is None


RTF_DOC = (
    rb"{\rtf1\ansi\deff0{\fonttbl{\f0 Calibri;}}{\colortbl;\red0\green0\blue0;}"
    rb"{\*\generator Acme 1.0;}"
    rb"\f0\fs22 Caf\'e9 costs \u8364? 5.\par "
    rb"Second\tab line\line done\par}"
)


class TestRtf:
    def test_basic_text_with_escapes(self):
        text = rtf_text(RTF_DOC)
        assert "Caf\u00e9 costs \u20ac 5." in text
        assert "Second\tline\ndone" in text

    def test_font_and_color_tables_skipped(self):
        text = rtf_text(RTF_DOC)
        assert "Calibri" not in text and "generator" not in text

    def test_par_newlines(self):
        assert rtf_text(RTF_DOC).count("\n") >= 2

    def test_negative_unicode_and_uc_skip(self):
        doc = rb"{\rtf1\uc1 A\u-10179?\u-8704? B}"  # surrogate pair U+1F600
        text = rtf_text(doc)
        assert text.startswith("A") and text.endswith(" B")

    def test_non_rtf_is_none(self):
        assert rtf_text(b"plain text") is None

    def test_dispatch_via_extract_bytes(self):
        text, reason = extract_bytes("c/note.rtf", RTF_DOC)
        assert reason is None and "Café" in text


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------


class TestCompoundFile:
    def test_mini_stream_roundtrip(self):
        data = _build_cfb({"small": b"tiny payload"})
        assert CompoundFile(data).stream("small") == b"tiny payload"

    def test_large_stream_roundtrip(self):
        payload = bytes(range(256)) * 20  # 5120 bytes → FAT chain
        data = _build_cfb({"big": payload})
        assert CompoundFile(data).stream("big") == payload

    def test_multiple_streams(self):
        data = _build_cfb({"a": b"first", "b": b"x" * 100})
        cf = CompoundFile(data)
        assert cf.stream("a") == b"first"
        assert cf.stream("b") == b"x" * 100
        assert cf.stream("absent") is None

    def test_not_cfb_raises(self):
        with pytest.raises(ValueError):
            CompoundFile(b"PK\x03\x04" + b"\x00" * 600)


# ---------------------------------------------------------------------------
# MSG
# ---------------------------------------------------------------------------


def _msg_bytes(subject: str = "Quarterly report", body: str = "See attached.") -> bytes:
    return _build_cfb(
        {
            "__substg1.0_0037001F": subject.encode("utf-16-le"),
            "__substg1.0_1000001F": body.encode("utf-16-le"),
        }
    )


class TestMsg:
    def test_subject_and_body(self):
        assert msg_text(_msg_bytes()) == "Subject: Quarterly report\nSee attached."

    def test_ansi_properties(self):
        data = _build_cfb(
            {
                "__substg1.0_0037001E": b"Hi",
                "__substg1.0_1000001E": b"Caf\xe9 body",
            }
        )
        assert msg_text(data) == "Subject: Hi\nCafé body"

    def test_body_only(self):
        data = _build_cfb({"__substg1.0_1000001F": "just body".encode("utf-16-le")})
        assert msg_text(data) == "just body"

    def test_garbage_is_none(self):
        assert msg_text(b"\x00" * 600) is None

    def test_dispatch_via_extract_bytes(self):
        text, reason = extract_bytes("d/mail.msg", _msg_bytes())
        assert reason is None and text.startswith("Subject: Quarterly report")


# ---------------------------------------------------------------------------
# XLS
# ---------------------------------------------------------------------------


class TestXls:
    def test_cells_in_row_order(self):
        text = xls_text(_xls_bytes())
        assert text.splitlines() == ["alpha beta", "2.5 42.0", "7.0 8.0"]

    def test_sst_continue_split_mid_string(self):
        # SST whose second string's chars continue into a CONTINUE
        # record (fresh grbit byte at the boundary).
        first = "ab"
        part1 = struct.pack("<II", 2, 2)
        part1 += struct.pack("<HB", len(first), 0) + first.encode("latin-1")
        part1 += struct.pack("<HB", 10, 0) + b"split"  # 5 of 10 chars
        cont = b"\x00" + b"trail"  # grbit, remaining 5 chars
        stream = (
            _biff_bof(0x0005)
            + _rec(0x00FC, part1)
            + _rec(0x003C, cont)
            + _rec(0x000A, b"")
            + _biff_bof(0x0010)
            + _labelsst(0, 0, 1)
            + _rec(0x000A, b"")
        )
        assert xls_text(_build_cfb({"Workbook": stream})) == "splittrail"

    def test_garbage_is_none(self):
        assert xls_text(b"junk") is None
        assert xls_text(_build_cfb({"NotWorkbook": b"x"})) is None

    def test_dispatch_via_extract_bytes(self):
        text, reason = extract_bytes("e/old.xls", _xls_bytes())
        assert reason is None and text.startswith("alpha beta")


# ---------------------------------------------------------------------------
# Fuzz: parsers must never raise on arbitrary bytes (extract_bytes
# relies on clean None/ValueError drops, not crashes)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_rtf_fuzz_never_raises(data):
    rtf_text(rb"{\rtf1" + data)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=600, max_size=4096))
def test_cfb_fuzz_value_error_or_parses(data):
    # min_size 600: inputs must clear the 512-byte header gate so the
    # fuzz actually reaches the FAT/DIFAT/directory parsing
    try:
        CompoundFile(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + data)
    except ValueError:
        pass  # the one allowed failure mode


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_msg_xls_fuzz_never_raise(data):
    msg_text(data)
    xls_text(data)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_ooxml_fuzz_never_raises(data):
    docx_text(data)
    xlsx_text(data)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=512))
def test_xls_fuzz_on_workbook_stream(payload):
    # random bytes inside a VALID container targeting the record parser
    xls_text(_build_cfb({"Workbook": payload.encode("utf-8", "ignore")}))
