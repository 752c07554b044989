"""Deterministic in-query document-byte builders (driver-oracle
harness for S3-S11, r6 verdict item 3).

The driver testdata has no binary documents, so the extraction
sources (reference document_processor.py:87-239) were unit-tested
only. These builders close that gap with the ``mm_image_decode``
pattern: inside a registry query, each ``documents.parquet`` row is
serialized into REAL format bytes (a zip'd OPC package, an RTF token
stream, a MIME message, ...), pushed through the production
``extract_bytes`` dispatch, and the DuckDB oracle reconstructs the
expected text purely in SQL — one mis-parsed byte anywhere breaks the
value hash across thousands of documents.

Each builder takes ``(doc_id, text)`` and returns bytes whose
extraction is an exact, SQL-expressible function of its inputs
(pinned by ``tests/test_synth_docs.py``):

==========  =====================================================
builder     expected ``extract_bytes`` output
==========  =====================================================
build_docx  ``h{id}\\n\\ndoc {id}\\n\\n{text}``  (header part order)
build_xlsx  ``doc {id} {text}``  (shared + numeric + inline cells)
build_rtf   ``doc {id}\\n{text}``  (fonttbl skipped, \\par newline)
build_csv   ``doc {id}\\n{text}``  (quoted cells survive commas)
build_html  ``doc {id} {text}``  (title + <p>; style/script dropped)
build_eml   ``Subject: doc {id}\\n{text}``  (text/plain body)
==========  =====================================================

Builders escape format metacharacters (XML entities, RTF ``\\{}``,
CSV quoting), so the contract holds for any single-line text; text
containing raw newlines would extract faithfully but is NOT
SQL-reconstructible for every format (CSV cell quoting), so the
registry queries filter to non-blank single-line rows.

Pure functions of their arguments — safe inside Arrow batches at any
parallelism, no filesystem or driver state.
"""

from __future__ import annotations

import csv
import io
import zipfile
from xml.sax.saxutils import escape

def _writestr(zf: zipfile.ZipFile, name: str, data: str) -> None:
    """writestr with a pinned 1980 timestamp: bare-name writestr
    stamps wall-clock mtimes into the member headers, which would
    make the builders non-byte-deterministic (reproducible artifact
    hashes matter when the output feeds content-addressed dedup)."""
    zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), data)


_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_R = (
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument'
    '/2006/relationships"'
)


def build_docx(doc_id: int, text: str) -> bytes:
    """OPC zip with a header part plus a two-paragraph body — the
    header exercises docx2txt's header-before-body part order
    (sources/office_text.py ``docx_text``)."""
    document = (
        f'<?xml version="1.0"?><w:document {_W}><w:body>'
        f"<w:p><w:r><w:t>doc {doc_id}</w:t></w:r></w:p>"
        f"<w:p><w:r><w:t>{escape(text)}</w:t></w:r></w:p>"
        f"<w:p/></w:body></w:document>"
    )
    header = (
        f'<?xml version="1.0"?><w:hdr {_W}>'
        f"<w:p><w:r><w:t>h{doc_id}</w:t></w:r></w:p></w:hdr>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _writestr(zf, "[Content_Types].xml", "<Types/>")
        _writestr(zf, "word/document.xml", document)
        _writestr(zf, "word/header1.xml", header)
    return buf.getvalue()


def build_xlsx(doc_id: int, text: str) -> bytes:
    """SpreadsheetML package with the workbook→rels→sheet indirection
    and all three cell encodings on one row: shared string ("doc"),
    numeric (doc_id), inline string (text)."""
    workbook = (
        f'<?xml version="1.0"?><workbook {_S} {_R}><sheets>'
        f'<sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    shared = f'<?xml version="1.0"?><sst {_S}><si><t>doc</t></si></sst>'
    sheet = (
        f'<?xml version="1.0"?><worksheet {_S}><sheetData>'
        f'<row r="1"><c r="A1" t="s"><v>0</v></c>'
        f'<c r="B1"><v>{doc_id}</v></c>'
        f'<c r="C1" t="inlineStr"><is><t>{escape(text)}</t></is></c>'
        f"</row></sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _writestr(zf, "[Content_Types].xml", "<Types/>")
        _writestr(zf, "xl/workbook.xml", workbook)
        _writestr(zf, "xl/_rels/workbook.xml.rels", rels)
        _writestr(zf, "xl/sharedStrings.xml", shared)
        _writestr(zf, "xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def build_rtf(doc_id: int, text: str) -> bytes:
    """RTF token stream with a fonttbl destination (must be skipped)
    and a ``\\par`` break; body metacharacters escaped."""
    esc = text.replace("\\", r"\\").replace("{", r"\{").replace("}", r"\}")
    return (
        "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Arial;}}"
        f"doc {doc_id}\\par {esc}}}"
    ).encode("cp1252", "replace")


def build_csv(doc_id: int, text: str) -> bytes:
    """Two csv rows written by ``csv.writer`` — commas in the text
    force real quoting, which the reader must undo."""
    buf = io.StringIO()
    writer = csv.writer(buf)
    writer.writerow(["doc", str(doc_id)])
    writer.writerow([text])
    return buf.getvalue().encode("utf-8")


def build_html(doc_id: int, text: str) -> bytes:
    """Single-line HTML (no inter-tag whitespace text nodes) with
    style and script blocks that must be dropped."""
    return (
        f"<html><head><title>doc {doc_id}</title>"
        f"<style>p{{color:red}}</style></head>"
        f"<body><p>{escape(text)}</p><script>var x=1;</script>"
        f"</body></html>"
    ).encode("utf-8")


def build_eml(doc_id: int, text: str) -> bytes:
    """RFC-5322 message, text/plain single-part, no trailing CRLF so
    the payload round-trips byte-identical."""
    return (
        f"Subject: doc {doc_id}\r\nMIME-Version: 1.0\r\n"
        f"Content-Type: text/plain; charset=utf-8\r\n\r\n{text}"
    ).encode("utf-8")


#: fmt name → (builder, expected-output template). The templates are
#: documentation + test fixtures; the DuckDB oracles re-express them
#: in SQL.
BUILDERS = {
    "docx": build_docx,
    "xlsx": build_xlsx,
    "rtf": build_rtf,
    "csv": build_csv,
    "html": build_html,
    "eml": build_eml,
}
