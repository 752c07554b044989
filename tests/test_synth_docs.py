"""sources/synth_docs.py — the in-query document-byte builders that
back the src_*_roundtrip driver oracles. The contract under test is
the one the oracles assume: ``extract_bytes(builder(id, text))``
equals an exact SQL-expressible template of (id, text), including for
metacharacter-laden text the sf corpora never contain."""

import pytest

from vectordb_light_spark.sources.extract import extract_bytes
from vectordb_light_spark.sources.synth_docs import BUILDERS

EXPECTED = {
    "docx": "h{id}\n\ndoc {id}\n\n{text}",
    "xlsx": "doc {id} {text}",
    "rtf": "doc {id}\n{text}",
    "csv": "doc {id}\n{text}",
    "html": "doc {id} {text}",
    "eml": "Subject: doc {id}\n{text}",
    "pdf": "[[page1]]doc {id}\n[[page2]]{text}\n",
    "msg": "Subject: doc {id}\n{text}",
    # xls numbers render as Python floats (xlrd parity in cfb.xls_text)
    "xls": "doc {id}.0 {text}",
}

#: Corpus-like plus adversarial single-line payloads. CSV quoting,
#: XML entity escaping, RTF brace/backslash escaping, and MIME
#: payload decoding each have at least one payload that breaks a
#: naive builder.
PAYLOADS = [
    "key agg row scan slow fast table value",
    "commas, quotes \" and 'single', done.",
    "xml & html <specials> stay &amp; intact",
    r"rtf \controls {braces} and \u escapes",
    "  leading and trailing spaces  ",
    "digits 0123456789 and punct .,;:!?",
]


@pytest.mark.parametrize("fmt", sorted(BUILDERS))
@pytest.mark.parametrize("text", PAYLOADS)
def test_roundtrip_matches_template(fmt, text):
    if fmt in ("rtf", "xls", "pdf") and any(ord(c) > 126 for c in text):
        pytest.skip("cp1252/latin-1 builders; payloads here are ASCII")
    data = BUILDERS[fmt](42, text)
    out, reason = extract_bytes(f"42.{fmt}", data)
    assert reason is None
    if fmt == "pdf":  # the PDF line assembler rstrips each text line
        text = text.rstrip(" ")
    assert out == EXPECTED[fmt].format(id=42, text=text)


@pytest.mark.parametrize("fmt", sorted(BUILDERS))
def test_builders_are_deterministic(fmt):
    a = BUILDERS[fmt](7, "same text")
    b = BUILDERS[fmt](7, "same text")
    assert a == b  # zip timestamps etc. must not leak wall clock


def test_docx_is_real_zip():
    import io
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(BUILDERS["docx"](1, "x")))
    assert "word/document.xml" in zf.namelist()
    assert "word/header1.xml" in zf.namelist()


def test_xlsx_exercises_all_three_cell_types():
    data = BUILDERS["xlsx"](9, "cell text")
    assert b't="s"' in data and b't="inlineStr"' in data
    assert b"<v>9</v>" in data  # numeric cell


def test_rtf_fonttbl_not_extracted():
    out, _ = extract_bytes("1.rtf", BUILDERS["rtf"](1, "body"))
    assert "Arial" not in out


def test_html_script_and_style_dropped():
    out, _ = extract_bytes("1.html", BUILDERS["html"](1, "body"))
    assert "color" not in out and "var x" not in out


def test_pdf_is_real_flate_pdf():
    data = BUILDERS["pdf"](3, "page text")
    assert data.startswith(b"%PDF-1.5") and b"/Filter /FlateDecode" in data
    assert b"page text" not in data  # content streams really compressed


def test_msg_is_real_compound_file():
    data = BUILDERS["msg"](3, "body")
    assert data.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")
    assert "body".encode("utf-16-le") in data  # mini-stream payload


def test_xls_biff_records_inside_cfb():
    data = BUILDERS["xls"](3, "cell text")
    assert data.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")
    assert b"cell text" in data  # latin-1 SST payload


# ---------------------------------------------------------------------------
# r8 ADVICE: builders fail LOUDLY on inputs outside their format caps
# (oversized payloads, non-latin-1 text) instead of corrupting bytes
# or dying with an opaque IndexError/struct.error mid-query.
# ---------------------------------------------------------------------------


def test_build_cfb_rejects_payload_beyond_single_fat_sector():
    from vectordb_light_spark.sources.synth_docs import build_cfb

    with pytest.raises(ValueError, match="DIFAT"):
        build_cfb({"Workbook": b"x" * (130 * 512)})


def test_biff_sst_rejects_non_latin1_and_oversized():
    from vectordb_light_spark.sources.synth_docs import biff_sst

    with pytest.raises(ValueError, match="latin-1"):
        biff_sst(["café ☃"])  # snowman is not latin-1
    with pytest.raises(ValueError, match="16-bit"):
        biff_sst(["x" * 70_000])


def test_build_pdf_rejects_non_latin1():
    with pytest.raises(ValueError, match="latin-1"):
        BUILDERS["pdf"](1, "☃ snowman")


def test_build_msg_accepts_non_latin1():
    # MSG bodies are UTF-16 — full Unicode stays in scope
    data = BUILDERS["msg"](1, "café ☃")
    assert "café ☃".encode("utf-16-le") in data
