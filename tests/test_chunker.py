"""Chunker tests vs the reference semantics
(document_processor.py:368-408, 411-477)."""

from __future__ import annotations

from vectordb_light_spark.operators.chunker import (
    chunk_step,
    split_fixed_size,
    split_pdf_pages,
)


def _ref_fixed_split(text: str, size: int, overlap: int) -> list[str]:
    """Oracle: reimplementation of the reference loop for tests."""
    step = max(size - overlap, 1)
    text = text.strip()
    if not text:
        return []
    out = []
    for start in range(0, len(text), step):
        piece = text[start : start + size].strip()
        if piece:
            out.append(piece)
    return out


def test_chunk_step_clamp():
    assert chunk_step(1200, 600) == 600
    assert chunk_step(100, 100) == 1  # overlap ≥ size clamps to 1
    assert chunk_step(100, 150) == 1


def test_fixed_split_matches_reference_loop(spark):
    texts = [
        (1, "abcdefghij"),
        (2, "  padded text needing a strip  "),
        (3, "x" * 25),
        (4, ""),
        (5, "   "),
        (6, "short"),
        (7, "a b c d e f g h i j k l m n o p"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = split_fixed_size(df, chunk_size=10, chunk_overlap=4)
    got = {
        (r["doc_id"], r["chunk_index"]): r["chunk"] for r in out.collect()
    }
    for doc_id, text in texts:
        expected = _ref_fixed_split(text, 10, 4)
        actual = [got[(doc_id, i)] for i in range(len(expected))]
        assert actual == expected, (doc_id, actual, expected)
    # empty docs produce no chunks at all
    assert not [k for k in got if k[0] in (4, 5)]


def test_fixed_split_trailing_whitespace_chunk_dropped(spark):
    # window lands entirely on spaces → piece strips to '' → dropped
    text = "abcde     " + "z"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = split_fixed_size(df, chunk_size=5, chunk_overlap=0).collect()
    expected = _ref_fixed_split(text, 5, 0)
    assert [r["chunk"] for r in sorted(out, key=lambda r: r["chunk_index"])] == expected


def test_pdf_page_split_attribution(spark):
    text = "[[page1]]" + "a" * 30 + "[[page2]]" + "b" * 30
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        split_pdf_pages(df, chunk_size=20, chunk_overlap=5).collect(),
        key=lambda r: r["chunk_index"],
    )
    # clean text = 60 chars; starts at 0,15,30,45 → pages 1,1,2,2
    assert [r["page_number"] for r in out] == [1, 1, 2, 2]
    assert out[0]["chunk"] == "a" * 20
    # chunk starting at 30 is exactly the b-boundary
    assert out[2]["chunk"] == "b" * 20


def test_pdf_page_split_default_page_one(spark):
    # no marker before chunk start → page 1 (reference :447-448)
    text = "c" * 10 + "[[page7]]" + "d" * 10
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        split_pdf_pages(df, chunk_size=10, chunk_overlap=0).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert [r["page_number"] for r in out] == [1, 7]


def test_split_token_windows_stride_and_tail(spark):
    from vectordb_light_spark.operators.chunker import split_token_windows

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "  "), (3, None), (4, "only")],
        "doc_id long, text string",
    )
    rows = split_token_windows(df, window=3, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["window_index"], r["n_tokens"]))
    # 5 tokens / window 3 / stride 2 → [a b c], [c d e], [e]
    assert by_doc[1] == [(0, 3), (1, 3), (2, 1)]
    assert by_doc[4] == [(0, 1)]
    assert 2 not in by_doc and 3 not in by_doc  # empty/null emit nothing
    # overlap: window 1 shares its first token with window 0's last
    import hashlib

    h = {r["window_index"]: r["window_hash"] for r in rows if r["doc_id"] == 1}
    assert h[0] == hashlib.md5(b"a b c").hexdigest()
    assert h[1] == hashlib.md5(b"c d e").hexdigest()
