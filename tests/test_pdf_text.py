"""Pure-Python PDF extraction (sources/pdf_text.py) — ungated S2.

Fixtures are REAL in-memory PDFs (proper header, objects, streams,
xref-free parse targets) built by ``make_pdf`` below, covering the
syntax surface the parser claims: Flate + ASCIIHex filters, literal
strings with escapes/octal, hex strings, TJ arrays, multi-page trees,
object streams (ObjStm), and the reference's ``[[pageN]]`` markers
feeding the T4 page-aware chunker.
"""

from __future__ import annotations

import zlib

import pytest

from vectordb_light_spark.sources.pdf_text import (
    extract_pdf_pages,
    extract_pdf_text,
)


def make_pdf(page_contents: list[bytes], *, flate: bool = True, asciihex: bool = False) -> bytes:
    """Assemble a minimal real PDF: catalog(1) → pages(2) → per page
    (page obj, content obj)."""
    objs: dict[int, bytes] = {}
    kid_refs = []
    next_num = 3
    for ops in page_contents:
        page_num, content_num = next_num, next_num + 1
        next_num += 2
        kid_refs.append(f"{page_num} 0 R")
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R "
            f"/MediaBox [0 0 612 792] >>"
        ).encode()
        if asciihex:
            enc = ops.hex().encode() + b">"
            filt = b"/Filter /ASCIIHexDecode "
        elif flate:
            enc = zlib.compress(ops)
            filt = b"/Filter /FlateDecode "
        else:
            enc, filt = ops, b""
        objs[content_num] = (
            b"<< " + filt + b"/Length " + str(len(enc)).encode() + b" >>\n"
            b"stream\n" + enc + b"\nendstream"
        )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        "<< /Type /Pages /Kids [{}] /Count {} >>".format(
            " ".join(kid_refs), len(page_contents)
        )
    ).encode()
    out = bytearray(b"%PDF-1.5\n")
    for num in sorted(objs):
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    return bytes(out)


def make_objstm_pdf(page_ops: bytes) -> bytes:
    """Single-page PDF whose catalog/pages/page dicts live in a
    compressed /ObjStm (PDF 1.5 writer style)."""
    packed_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    bodies = [b for _, b in packed_objs]
    offsets, acc = [], 0
    for b in bodies:
        offsets.append(acc)
        acc += len(b) + 1
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(packed_objs, offsets)
    ).encode() + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    stm = zlib.compress(payload)
    content = zlib.compress(page_ops)
    out = bytearray(b"%PDF-1.5\n")
    out += (
        b"4 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(stm)).encode()
        + b" >>\nstream\n" + stm + b"\nendstream\nendobj\n"
    )
    out += (
        b"5 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


SIMPLE = b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj ET"


def test_single_page_flate_literal_string():
    pdf = make_pdf([SIMPLE])
    assert extract_pdf_pages(pdf) == ["Hello PDF world\n"]
    assert extract_pdf_text(pdf) == "[[page1]]Hello PDF world\n"


def test_multi_page_order_markers_and_blank_page_skipped():
    pdf = make_pdf(
        [
            b"BT (first page) Tj ET",
            b"BT ET",  # blank: text block shows nothing
            b"BT (third page) Tj ET",
        ]
    )
    pages = extract_pdf_pages(pdf)
    assert [p.strip() for p in pages] == ["first page", "", "third page"]
    # [[pageN]] keeps the TRUE page number, blank page skipped
    assert extract_pdf_text(pdf) == "[[page1]]first page\n[[page3]]third page\n"


def test_string_syntax_escapes_octal_hex_tj_arrays():
    ops = (
        rb"BT (esc \(paren\) and \\ back) Tj "
        rb"T* (octal \101\102\103) Tj "
        b"T* <48656C6C6F> Tj "
        b"T* [ (ker) -120 (ned arr) 30 (ay) ] TJ ET"
    )
    (page,) = extract_pdf_pages(make_pdf([ops]))
    lines = [ln for ln in page.split("\n") if ln]
    assert lines == ["esc (paren) and \\ back", "octal ABC", "Hello", "kerned array"]


def test_utf16_string_and_line_continuation():
    utf16 = "Ünïcode™".encode("utf-16-be")
    esc = (
        utf16.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )
    ops = b"BT (\xfe\xff" + esc + b") Tj (conti\\\nnued) Tj ET"
    (page,) = extract_pdf_pages(make_pdf([ops]))
    assert "Ünïcode™" in page
    assert "continued" in page


def test_asciihex_and_uncompressed_streams():
    assert "Hello PDF world" in extract_pdf_pages(make_pdf([SIMPLE], flate=False))[0]
    assert (
        "Hello PDF world"
        in extract_pdf_pages(make_pdf([SIMPLE], asciihex=True))[0]
    )


def test_objstm_packed_pages_extract():
    pdf = make_objstm_pdf(b"BT (packed in an object stream) Tj ET")
    assert extract_pdf_text(pdf) == "[[page1]]packed in an object stream\n"


def test_non_pdf_and_textless_pdf():
    with pytest.raises(ValueError):
        extract_pdf_pages(b"GIF89a not a pdf")
    # a PDF whose only content is drawing ops (scanned-style): no text
    pdf = make_pdf([b"q 1 0 0 1 0 0 cm /Im0 Do Q"])
    assert extract_pdf_text(pdf) is None


def test_extract_bytes_dispatch_pdf_no_longer_dropped():
    """S2 ungated: .pdf routes through the pure-Python parser instead
    of dropping with missing_parser."""
    from vectordb_light_spark.sources.extract import extract_bytes

    text, reason = extract_bytes(
        "/corpus/report.pdf", make_pdf([b"BT (quarterly report) Tj ET"])
    )
    assert reason is None
    assert text == "[[page1]]quarterly report\n"


def test_t4_page_attribution_over_extracted_pdf(spark):
    """VERDICT r1 'done' criterion: T4 page-aware chunking works over
    a REAL PDF byte fixture end-to-end."""
    from vectordb_light_spark.operators.chunker import split_pdf_pages

    body1 = b"BT (alpha beta gamma delta " + b"word " * 40 + b") Tj ET"
    body2 = b"BT (second page content here " + b"token " * 40 + b") Tj ET"
    text = extract_pdf_text(make_pdf([body1, body2]))
    df = spark.createDataFrame([("d1", text)], ["doc_id", "text"])
    rows = sorted(
        split_pdf_pages(df, chunk_size=120, chunk_overlap=20).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert rows
    assert {r["page_number"] for r in rows} == {1, 2}
    # reference T4 semantics: a chunk belongs to the page where it
    # STARTS, so page numbers are non-decreasing in chunk order
    nums = [r["page_number"] for r in rows]
    assert nums == sorted(nums)
    assert all("[[page" not in r["chunk"] for r in rows)
    assert "alpha beta" in rows[0]["chunk"] and rows[0]["page_number"] == 1
    assert rows[-1]["page_number"] == 2
