"""Pure-Python PDF text extraction — ungates S2 in this container.

The reference extracts PDF text per page with PyMuPDF and joins pages
under ``[[pageN]]`` markers (reference document_processor.py:76-84).
PyMuPDF is a C extension absent here, so this module implements the
minimal subset of ISO 32000 needed to get embedded text back out,
stdlib-only (``zlib`` + ``re``):

- object scan: every ``N G obj … endobj`` span is parsed directly —
  no reliance on the xref table, so linearized/appended files and
  files with broken offsets still extract;
- object streams (``/Type /ObjStm``): decompressed and their packed
  objects parsed, covering PDF 1.5+ writers that hide pages there;
- stream filters: ``FlateDecode`` (with a raw-deflate fallback) and
  ``ASCIIHexDecode``; unsupported filters skip that stream, never
  fail the file;
- page order: the ``/Root → /Pages → /Kids`` tree is walked
  depth-first (the document's true page order); files whose tree is
  unreachable fall back to object order of ``/Type /Page`` objects;
- content streams: a tokenizer for PDF string syntax — ``(…)`` with
  nesting/escapes/octal, ``<hex>`` — feeding the text-showing
  operators ``Tj``, ``'``, ``"`` and ``TJ`` arrays inside ``BT…ET``
  blocks; ``Td/TD/T*`` line moves emit newlines. UTF-16BE strings
  (BOM-prefixed) are decoded; everything else is treated as
  PDFDocEncoding ≈ latin-1 (correct for the simple fonts the
  fallback targets; CID-keyed fonts come out as best-effort bytes).

Scope: born-digital PDFs with simple fonts — the overwhelming share
of real document corpora. Scanned/image PDFs have no text to extract
(consistent with the reference, which also returns nothing for them).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_NAME_INT_RE = {
    name: re.compile(rb"/" + name + rb"\s+(\d+)")
    for name in (b"N", b"First", b"Length")
}


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Scan every top-level indirect object; returns num → body bytes
    (dict part + optional raw stream). Object streams are expanded
    recursively so their packed objects appear as first-class
    entries."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(3)
        objs[num] = body
    # expand /ObjStm packs (PDF 1.5 compressed object streams)
    for num, body in list(objs.items()):
        if b"/ObjStm" not in body:
            continue
        payload = _stream_bytes(body)
        if payload is None:
            continue
        n_m = _NAME_INT_RE[b"N"].search(body)
        first_m = _NAME_INT_RE[b"First"].search(body)
        if not (n_m and first_m):
            continue
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = payload[:first].split()
        for i in range(min(n, len(header) // 2)):
            onum = int(header[2 * i])
            off = int(header[2 * i + 1])
            end = (
                int(header[2 * i + 3]) if 2 * i + 3 < len(header) else None
            )
            objs.setdefault(
                onum,
                payload[first + off : first + end if end is not None else None],
            )
    return objs


def _stream_bytes(body: bytes) -> bytes | None:
    """Decode an object's stream through its declared filters."""
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    raw = sm.group(1)
    head = body[: sm.start()]
    if b"/FlateDecode" in head:
        for args in ((), (-15,)):  # zlib, then raw-deflate fallback
            try:
                return zlib.decompressobj(*args).decompress(raw)
            except zlib.error:
                continue
        return None
    if b"/ASCIIHexDecode" in head:
        hexpart = raw.split(b">")[0]
        try:
            return bytes.fromhex(
                hexpart.translate(None, b" \t\r\n\f").decode("ascii")
            )
        except ValueError:
            return None
    if b"/Filter" in head:
        return None  # unsupported filter (DCT, LZW, …): skip stream
    return raw


def _refs(body: bytes, key: bytes) -> list[int]:
    """Indirect references under /key — a single ``N G R`` or an
    array ``[N G R …]``."""
    m = re.search(rb"/" + key + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return [int(m.group(1))] if m else []


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order: walk the /Pages tree
    from the catalog; fall back to object-number order of /Type/Page
    objects when the tree is missing or cyclic."""
    catalog = next(
        (n for n, b in objs.items() if b"/Type" in b and b"/Catalog" in b), None
    )
    pages: list[int] = []
    if catalog is not None:
        seen: set[int] = set()
        stack = [r for r in reversed(_refs(objs[catalog], b"Pages"))]
        while stack:
            n = stack.pop()
            if n in seen or n not in objs:
                continue
            seen.add(n)
            body = objs[n]
            kids = _refs(body, b"Kids")
            if kids:
                stack.extend(reversed(kids))
            elif re.search(rb"/Type\s*/Page\b", body):
                pages.append(n)
    if not pages:
        pages = sorted(
            n for n, b in objs.items() if re.search(rb"/Type\s*/Page\b", b)
        )
    return pages


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", "replace")
        except Exception:  # pragma: no cover - decode("...","replace") is total
            pass
    return raw.decode("latin-1", "replace")


def _literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse ``(...)`` starting at the '(' — returns (text, next_i)."""
    out, depth, i = bytearray(), 1, i + 1
    while i < len(data) and depth:
        c = data[i]
        if c == 0x5C and i + 1 < len(data):  # backslash
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt].encode("latin-1")
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                j, val = i + 1, 0
                while j < len(data) and j - i <= 3 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < len(data) and data[i] == 0x0A:
                    i += 1
                continue
            out.append(nxt)
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                i += 1
                break
        out.append(c)
        i += 1
    return _decode_pdf_string(bytes(out)), i


_TOKEN_RE = re.compile(
    rb"\((?#literal)|<[0-9A-Fa-f\s]*>|\[|\]|BT\b|ET\b|T\*|TJ\b|Tj\b|TD\b|Td\b|'|\""
)


def _content_text(content: bytes) -> str:
    """Extract shown text from one page's (concatenated) content
    stream: Tj / ' / " strings and TJ array elements inside BT…ET;
    Td/TD/T*/'/" act as line breaks."""
    parts: list[str] = []
    in_text = False
    at_line_start = True  # suppress breaks before any shown text
    i = 0
    while True:
        m = _TOKEN_RE.search(content, i)
        if m is None:
            break
        tok = m.group(0)
        i = m.end()
        if tok == b"BT":
            in_text = True
            continue
        if tok == b"ET":
            in_text = False
            if not at_line_start:
                parts.append("\n")
                at_line_start = True
            continue
        if not in_text:
            continue
        if tok == b"(":
            text, i = _literal_string(content, m.start())
            if text:
                parts.append(text)
                at_line_start = text.endswith("\n")
        elif tok.startswith(b"<"):
            hexes = tok[1:-1].translate(None, b" \t\r\n\f")
            if len(hexes) % 2:
                hexes += b"0"
            try:
                text = _decode_pdf_string(bytes.fromhex(hexes.decode()))
            except ValueError:
                text = ""
            if text:
                parts.append(text)
                at_line_start = False
        elif tok in (b"T*", b"Td", b"TD", b"'", b'"'):
            # line move: a break only AFTER visible text — the
            # initial positioning Td must not open the page with \n
            if not at_line_start:
                parts.append("\n")
                at_line_start = True
    # collapse: strings arrive already in show order; TJ kerning
    # numbers were skipped by the tokenizer (they sit between tokens)
    text = "".join(parts)
    text = re.sub(r"[ \t]+\n", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text


def extract_pdf_pages(data: bytes) -> list[str]:
    """Per-page text of a PDF, document order; pages whose content
    could not be decoded come back as empty strings."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _parse_objects(data)
    pages = []
    for pnum in _page_order(objs):
        chunks = []
        for cref in _refs(objs[pnum], b"Contents"):
            if cref in objs:
                payload = _stream_bytes(objs[cref])
                if payload:
                    chunks.append(payload)
        pages.append(_content_text(b"\n".join(chunks)) if chunks else "")
    return pages


def extract_pdf_text(data: bytes) -> str | None:
    """The reference's page-marker form: ``[[pageN]]`` + page text,
    blank pages skipped (document_processor.py:76-84). None when the
    file yields no text at all."""
    out = []
    for idx, text in enumerate(extract_pdf_pages(data)):
        if text.strip():
            out.append(f"[[page{idx + 1}]]{text}")
    return "".join(out) if out else None
