"""Pure-Python text extraction for DOCX / XLSX / RTF (S3, S9-S11).

The reference loads these formats through third-party parsers
(docx2txt, openpyxl, striprtf — reference document_processor.py:
242-255); none of those ship in this container, so these are
from-scratch stdlib implementations of the same *text* semantics:

- DOCX / XLSX are OPC zip packages (ECMA-376): ``zipfile`` +
  ``xml.etree`` over the documented part names. Styling, numbering,
  embedded objects are ignored — the reference's loaders only keep
  text too.
- RTF is a token stream (Word RTF 1.9 spec): control words, hex and
  ``\\uN`` unicode escapes, and destination groups to skip. The
  implementation is an original tokenizer with striprtf-equivalent
  output semantics (``\\par``/``\\line`` → newline, skip fonttbl/
  colortbl/pict/..., honor ``\\ucN`` fallback skipping).

All entry points take raw ``bytes`` and return ``str | None`` (None
for no extractable text), matching the ``EXTRACTORS`` contract in
``sources/extract.py`` — pure functions, safe inside Arrow batches.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree


def _local(tag: str) -> str:
    """Namespace-stripped local element name."""
    return tag.rsplit("}", 1)[-1]


# ---------------------------------------------------------------------------
# DOCX (WordprocessingML)
# ---------------------------------------------------------------------------


def _docx_part_text(xml_bytes: bytes) -> list[str]:
    """Paragraph texts of one WordprocessingML part, in document
    order. ``w:t`` text nodes concatenate within a paragraph;
    ``w:tab`` → tab, ``w:br``/``w:cr`` → newline."""
    paragraphs: list[str] = []
    try:
        root = ElementTree.fromstring(xml_bytes)
    except ElementTree.ParseError:
        return paragraphs
    for para in root.iter():
        if _local(para.tag) != "p":
            continue
        pieces: list[str] = []
        for node in para.iter():
            name = _local(node.tag)
            if name == "t":
                pieces.append(node.text or "")
            elif name == "tab":
                pieces.append("\t")
            elif name in ("br", "cr"):
                pieces.append("\n")
        paragraphs.append("".join(pieces))
    return paragraphs


def docx_text(data: bytes) -> str | None:
    """DOCX → text: headers, then the document body, then footers
    (docx2txt's part order), paragraphs joined by blank lines."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return None
    with zf:
        names = set(zf.namelist())
        ordered = (
            sorted(n for n in names if re.fullmatch(r"word/header\d*\.xml", n))
            + (["word/document.xml"] if "word/document.xml" in names else [])
            + sorted(n for n in names if re.fullmatch(r"word/footer\d*\.xml", n))
        )
        paragraphs: list[str] = []
        for name in ordered:
            paragraphs.extend(_docx_part_text(zf.read(name)))
    text = "\n\n".join(p for p in paragraphs if p.strip())
    return text if text.strip() else None


# ---------------------------------------------------------------------------
# XLSX / XLSM (SpreadsheetML)
# ---------------------------------------------------------------------------


def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    try:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
    except ElementTree.ParseError:
        return []
    strings: list[str] = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t>; concatenate all t nodes
        strings.append(
            "".join(n.text or "" for n in si.iter() if _local(n.tag) == "t")
        )
    return strings


def _xlsx_sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in workbook sheet order (workbook.xml
    sheet list joined to its .rels targets)."""
    names = set(zf.namelist())
    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        try:
            for rel in ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
                target = rel.get("Target", "")
                if target.startswith("/"):
                    target = target.lstrip("/")
                else:
                    target = "xl/" + target
                rels[rel.get("Id", "")] = target.replace("xl/./", "xl/")
        except ElementTree.ParseError:
            pass
    ordered: list[str] = []
    if "xl/workbook.xml" in names:
        try:
            root = ElementTree.fromstring(zf.read("xl/workbook.xml"))
            for sheet in root.iter():
                if _local(sheet.tag) != "sheet":
                    continue
                rid = next(
                    (v for k, v in sheet.attrib.items() if _local(k) == "id"), ""
                )
                path = rels.get(rid)
                if path in names:
                    ordered.append(path)
        except ElementTree.ParseError:
            pass
    if not ordered:  # fall back to lexical worksheet order
        ordered = sorted(
            n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
    return ordered


def _xlsx_cell_value(cell, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(
            n.text or "" for n in cell.iter() if _local(n.tag) == "t"
        )
    value = None
    for node in cell:
        if _local(node.tag) == "v":
            value = node.text or ""
            break
    if value is None:
        return None
    if ctype == "s":
        try:
            return shared[int(value)]
        except (ValueError, IndexError):
            return None
    if ctype == "b":
        return str(value.strip() not in ("0", "false", ""))
    if ctype in ("str", "e"):
        return value
    # numeric: render like a Python number (openpyxl parity: int when
    # integral, float otherwise)
    try:
        return str(int(value))
    except ValueError:
        try:
            return str(float(value))
        except ValueError:
            return value


def xlsx_text(data: bytes) -> str | None:
    """XLSX/XLSM → text: per sheet in workbook order, non-empty cell
    values joined by spaces, rows by newlines (the reference's
    openpyxl loader semantics, document_processor.py:197-212)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return None
    lines: list[str] = []
    with zf:
        shared = _xlsx_shared_strings(zf)
        for path in _xlsx_sheet_paths(zf):
            try:
                root = ElementTree.fromstring(zf.read(path))
            except ElementTree.ParseError:
                continue
            for row in root.iter():
                if _local(row.tag) != "row":
                    continue
                vals = []
                for cell in row:
                    if _local(cell.tag) != "c":
                        continue
                    v = _xlsx_cell_value(cell, shared)
                    if v is not None and v.strip():
                        vals.append(v)
                if vals:
                    lines.append(" ".join(vals))
    text = "\n".join(lines)
    return text if text.strip() else None


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------

#: Destination groups whose content is metadata/binary, not body text.
_RTF_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
        "info", "pict", "object", "header", "footer", "headerl", "headerr",
        "headerf", "footerl", "footerr", "footerf", "filetbl", "revtbl",
        "themedata", "colorschememapping", "datastore", "latentstyles",
        "generator", "xmlnstbl", "mmathPr", "fldinst",
    }
)

#: Control words that emit a character.
_RTF_CHAR_WORDS = {
    "par": "\n",
    "line": "\n",
    "sect": "\n",
    "page": "\n",
    "row": "\n",
    "tab": "\t",
    "cell": " ",
    "emdash": "\u2014",
    "endash": "\u2013",
    "emspace": "\u2003",
    "enspace": "\u2002",
    "qmspace": "\u2005",
    "bullet": "\u2022",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
}

_RTF_TOKEN = re.compile(
    rb"\\([a-zA-Z]{1,32})(-?\d{1,10})?[ ]?"  # control word [+ numeric arg]
    rb"|\\'([0-9a-fA-F]{2})"  # hex escape
    rb"|\\([^a-zA-Z])"  # control symbol
    rb"|([{}])"  # group delimiters
    rb"|([^\\{}]+)"  # plain text run
)


def rtf_text(data: bytes) -> str | None:
    """RTF → text. Original tokenizer (Word RTF spec §"Contents of an
    RTF File"): tracks group nesting, skips non-text destinations,
    honors ``\\ucN`` substitute-character skipping after ``\\uN``."""
    if not data.lstrip().startswith(b"{\\rtf"):
        return None
    out: list[str] = []
    # group state: (skipping, uc_skip); stack mirrors { } nesting
    stack: list[tuple[bool, int]] = []
    skipping, uc_skip = False, 1
    pending_skip = 0  # bytes to swallow after \uN
    ignorable = False  # saw \* — next control word names a destination

    for m in _RTF_TOKEN.finditer(data):
        word, arg, hexa, symbol, brace, text = m.groups()
        if brace == b"{":
            stack.append((skipping, uc_skip))
            ignorable = False
            continue
        if brace == b"}":
            if stack:
                skipping, uc_skip = stack.pop()
            ignorable = False
            continue
        if word is not None:
            name = word.decode("ascii")
            if ignorable and name not in _RTF_CHAR_WORDS:
                skipping = True
            ignorable = False
            if name in _RTF_SKIP_DESTINATIONS or name == "bin":
                skipping = True
            elif name == "uc":
                uc_skip = int(arg or 1)
            elif name == "u":
                if not skipping:
                    cp = int(arg or 0)
                    out.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip = uc_skip
            elif not skipping and name in _RTF_CHAR_WORDS:
                out.append(_RTF_CHAR_WORDS[name])
            continue
        if hexa is not None:
            if pending_skip:
                pending_skip -= 1
            elif not skipping:
                out.append(bytes([int(hexa, 16)]).decode("cp1252", "replace"))
            continue
        if symbol is not None:
            ch = symbol.decode("latin-1")
            if ch == "*":
                ignorable = True
            elif ch == "~":
                if not skipping:
                    out.append("\u00a0")
            elif ch in ("\\", "{", "}"):
                if not skipping:
                    out.append(ch)
            elif ch in ("\n", "\r"):
                if not skipping:
                    out.append("\n")
            continue
        if text is not None and not skipping:
            chunk = text.replace(b"\r", b"").replace(b"\n", b"")
            if pending_skip:
                drop = min(pending_skip, len(chunk))
                chunk, pending_skip = chunk[drop:], pending_skip - drop
            if chunk:
                out.append(chunk.decode("cp1252", "replace"))

    result = "".join(out)
    return result if result.strip() else None
