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


def test_content_defined_chunks_roundtrip_and_shift_resistance(spark):
    """CDC invariants: chunks concatenate back to the exact document;
    short/empty docs come back as one chunk; and — the property the
    operator exists for — an insertion re-aligns every boundary after
    the edit, so the chunk streams share their suffix."""
    import random

    from vectordb_light_spark.operators.chunker import split_content_defined

    rng = random.Random(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    base = " ".join(rng.choice(words) for _ in range(120))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, "INSERTED PREFIX TEXT " + base),
            (3, "short"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = split_content_defined(df).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    chunks = {d: [c for _, c in sorted(v)] for d, v in by.items()}

    assert "".join(chunks[1]) == base
    assert len(chunks[1]) > 1  # boundaries actually fire
    assert chunks[3] == ["short"] and chunks[4] == [""]
    # 1-based contiguous indices
    assert [i for i, _ in sorted(by[1])] == list(range(1, len(chunks[1]) + 1))
    # shift resistance: all chunks after the first boundary beyond the
    # insertion are identical between the edited and unedited docs
    shared = 0
    a, b = chunks[1], chunks[2]
    while shared < min(len(a), len(b)) and a[-1 - shared] == b[-1 - shared]:
        shared += 1
    assert shared >= len(a) - 1


def test_content_defined_chunks_deterministic_and_content_keyed(spark):
    """Identical text in different docs produces identical chunk
    sequences (the chunk-level-dedup enabler), and a rerun reproduces
    the output exactly."""
    from vectordb_light_spark.operators.chunker import split_content_defined

    text = " ".join(f"tok{(i * 13) % 37}" for i in range(150))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = split_content_defined(df).collect()
    one = sorted((r["chunk_idx"], r["chunk"]) for r in rows if r["doc_id"] == 1)
    two = sorted((r["chunk_idx"], r["chunk"]) for r in rows if r["doc_id"] == 2)
    assert one == two
    again = split_content_defined(df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
