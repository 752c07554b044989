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
build_pdf   ``[[page1]]doc {id}\\n[[page2]]{text}\\n``  (2 pages,
            FlateDecode streams, escaped literal strings)
build_msg   ``Subject: doc {id}\\n{text}``  (CFB mini-stream UTF-16
            property streams)
build_xls   ``doc {id}.0 {text}``  (BIFF8 in CFB; numbers render
            as floats — xlrd parity)
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
import struct
import zipfile
import zlib
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


# ---------------------------------------------------------------------------
# [MS-CFB] compound-file writer + BIFF8 record helpers (MSG / XLS)
# — the write-side complement of the pure-Python readers in
# sources/cfb.py; also the fixture source for tests/test_office_formats.
# ---------------------------------------------------------------------------

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


def _cfb_pad(data: bytes, size: int) -> bytes:
    return data + b"\x00" * (-len(data) % size)


def _cfb_dir_entry(name: str, etype: int, start: int, size: int) -> bytes:
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


def build_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-FAT-sector [MS-CFB] compound file; streams < 4096 bytes
    go to the mini stream (exercising the reader's miniFAT path),
    larger to the FAT."""
    small = {n: d for n, d in streams.items() if len(d) < 4096}
    large = {n: d for n, d in streams.items() if len(d) >= 4096}

    # mini stream + miniFAT (sequential chains)
    minidata = b""
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for name, data in small.items():
        mini_start[name] = len(minifat)
        n_sect = max(1, -(-len(data) // 64))
        minifat.extend(
            list(range(len(minifat) + 1, len(minifat) + n_sect))
            + [_ENDOFCHAIN]
        )
        minidata += _cfb_pad(data, 64)
    minifat_raw = (
        _cfb_pad(b"".join(struct.pack("<I", v) for v in minifat), 512)
        if minifat
        else b""
    )

    # regular sector layout: [0]=FAT, then directory, miniFAT,
    # ministream, large streams
    n_dir_sect = max(1, -(-((1 + len(streams)) * 128) // 512))
    n_minifat_sect = len(minifat_raw) // 512
    n_mini_sect = len(_cfb_pad(minidata, 512)) // 512 if minidata else 0

    sect = 1
    dir_start, sect = sect, sect + n_dir_sect
    minifat_start = sect if n_minifat_sect else _ENDOFCHAIN
    sect += n_minifat_sect
    ministream_start = sect if n_mini_sect else _ENDOFCHAIN
    sect += n_mini_sect
    large_start: dict[str, int] = {}
    for name, data in large.items():
        large_start[name] = sect
        sect += len(_cfb_pad(data, 512)) // 512
    total_sect = sect

    # One FAT sector = 128 sector slots (~64 KiB of payload). The
    # synthetic roundtrip rows are far smaller; anything bigger needs
    # a DIFAT chain this builder deliberately doesn't implement —
    # fail loudly instead of corrupting the FAT (ADVICE r8).
    if total_sect > 128:
        raise ValueError(
            f"build_cfb: payload needs {total_sect} sectors but the "
            "single-FAT-sector builder addresses at most 128 (~64 KiB)"
            " — grow via DIFAT or shrink the document"
        )

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
        chain(large_start[name], len(_cfb_pad(data, 512)) // 512)

    entries = [_cfb_dir_entry("Root Entry", 5, ministream_start, len(minidata))]
    for name, data in streams.items():
        start = mini_start[name] if name in small else large_start[name]
        entries.append(_cfb_dir_entry(name, 2, start, len(data)))
    dir_raw = _cfb_pad(b"".join(entries), 512)
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
    body[dir_start * 512 : dir_start * 512 + len(dir_raw)] = dir_raw
    if n_minifat_sect:
        body[minifat_start * 512 : minifat_start * 512 + len(minifat_raw)] = (
            minifat_raw
        )
    if n_mini_sect:
        mini_raw = _cfb_pad(minidata, 512)
        body[ministream_start * 512 : ministream_start * 512 + len(mini_raw)] = (
            mini_raw
        )
    for name, data in large.items():
        raw = _cfb_pad(data, 512)
        body[large_start[name] * 512 : large_start[name] * 512 + len(raw)] = raw
    return bytes(header) + bytes(body)


def biff_rec(opcode: int, payload: bytes) -> bytes:
    if len(payload) > 0xFFFF:
        raise ValueError(
            f"biff_rec: {len(payload)}-byte payload exceeds the 16-bit"
            f" BIFF record length field (opcode 0x{opcode:04X})"
        )
    return struct.pack("<HH", opcode, len(payload)) + payload


def biff_bof(doctype: int) -> bytes:
    return biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, doctype, 0, 0, 0, 0))


def biff_sst(strings: list[str], total: int | None = None) -> bytes:
    payload = struct.pack("<II", total or len(strings), len(strings))
    for s in strings:
        if len(s) > 0xFFFF:
            raise ValueError(
                f"biff_sst: {len(s)}-char string exceeds the 16-bit "
                "BIFF8 XLUnicodeRichExtendedString length field"
            )
        try:
            enc = s.encode("latin-1")
        except UnicodeEncodeError as e:
            raise ValueError(
                "biff_sst emits uncompressed 8-bit BIFF8 strings; the "
                "text must be latin-1-encodable (ADVICE r8)"
            ) from e
        payload += struct.pack("<HB", len(s), 0) + enc
    return biff_rec(0x00FC, payload)


def biff_labelsst(r: int, c: int, isst: int) -> bytes:
    return biff_rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def biff_number(r: int, c: int, v: float) -> bytes:
    return biff_rec(0x0203, struct.pack("<HHHd", r, c, 0, v))


def biff_rk_int(v: int, div100: bool = False) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if div100 else 0)


def biff_rk_cell(r: int, c: int, rk: int) -> bytes:
    return biff_rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))


def biff_mulrk(r: int, c_first: int, rks: list[int]) -> bytes:
    payload = struct.pack("<HH", r, c_first)
    for rk in rks:
        payload += struct.pack("<HI", 0, rk)
    payload += struct.pack("<H", c_first + len(rks) - 1)
    return biff_rec(0x00BD, payload)


def build_msg(doc_id: int, text: str) -> bytes:
    """Outlook MSG: subject + plain-text body as UTF-16 property
    streams ([MS-OXMSG] __substg1.0_0037/1000 conventions) inside a
    real compound file — the mini-stream path end to end."""
    return build_cfb(
        {
            "__substg1.0_0037001F": f"doc {doc_id}".encode("utf-16-le"),
            "__substg1.0_1000001F": text.encode("utf-16-le"),
        }
    )


def build_xls(doc_id: int, text: str) -> bytes:
    """BIFF8 workbook inside a compound file: globals substream with
    an SST ("doc" + the text), one worksheet row with a shared-string
    cell, an RK integer cell (renders ``str(float(doc_id))`` — the
    reader's xlrd float parity), and a second shared-string cell. Text must be latin-1-encodable (the
    SST helper writes the 8-bit form)."""
    globals_sub = (
        biff_bof(0x0005) + biff_sst(["doc", text]) + biff_rec(0x000A, b"")
    )
    sheet = (
        biff_bof(0x0010)
        + biff_labelsst(0, 0, 0)
        + biff_rk_cell(0, 1, biff_rk_int(doc_id))
        + biff_labelsst(0, 2, 1)
        + biff_rec(0x000A, b"")
    )
    return build_cfb({"Workbook": globals_sub + sheet})


def build_pdf(doc_id: int, text: str) -> bytes:
    """Minimal REAL two-page PDF (catalog → pages → page/content
    objects, FlateDecode content streams): page 1 carries
    ``doc {id}``, page 2 the text as an escaped literal string.
    Extraction yields ``[[page1]]doc {id}\\n[[page2]]{text}\\n`` (the
    reference's page-marker convention)."""
    esc = (
        text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    )
    try:
        pages = [
            f"BT /F1 12 Tf 72 720 Td (doc {doc_id}) Tj ET".encode("latin-1"),
            f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1"),
        ]
    except UnicodeEncodeError as e:
        raise ValueError(
            "build_pdf emits latin-1 literal-string content streams; "
            "the text must be latin-1-encodable (ADVICE r8)"
        ) from e
    objs: dict[int, bytes] = {}
    kid_refs = []
    next_num = 3
    for ops in pages:
        page_num, content_num = next_num, next_num + 1
        next_num += 2
        kid_refs.append(f"{page_num} 0 R")
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R "
            f"/MediaBox [0 0 612 792] >>"
        ).encode()
        enc = zlib.compress(ops)
        objs[content_num] = (
            b"<< /Filter /FlateDecode /Length "
            + str(len(enc)).encode()
            + b" >>\nstream\n"
            + enc
            + b"\nendstream"
        )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        "<< /Type /Pages /Kids [{}] /Count {} >>".format(
            " ".join(kid_refs), len(pages)
        )
    ).encode()
    out = bytearray(b"%PDF-1.5\n")
    for num in sorted(objs):
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    return bytes(out)


#: fmt name → builder. The expected-output templates are in the
#: module docstring + tests; the DuckDB oracles re-express them in
#: SQL.
BUILDERS = {
    "docx": build_docx,
    "xlsx": build_xlsx,
    "rtf": build_rtf,
    "csv": build_csv,
    "html": build_html,
    "eml": build_eml,
    "pdf": build_pdf,
    "msg": build_msg,
    "xls": build_xls,
}
