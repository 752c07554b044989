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
# CFB / BIFF8 fixture builders — shared with the production byte
# builders (sources/synth_docs.py), which the src_binary_roundtrip
# driver oracle exercises against the same readers.
# ---------------------------------------------------------------------------

from vectordb_light_spark.sources.synth_docs import (  # noqa: E402
    biff_bof as _biff_bof,
    biff_labelsst as _labelsst,
    biff_mulrk as _mulrk,
    biff_number as _number,
    biff_rec as _rec,
    biff_rk_cell as _rk_cell,
    biff_rk_int as _rk_int,
    biff_sst as _sst,
    build_cfb as _build_cfb,
)


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
