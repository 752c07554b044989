"""Text chunking — the reference's write-path splitters re-expressed
on DataFrames.

T3 FixedSizeTextSplitter (reference document_processor.py:368-408):
  - step = chunk_size - chunk_overlap, clamped to ≥1 if overlap≥size
    (reference :375-377, config validator config.py:35-39)
  - whole text .strip()'d first; empty docs dropped (:393-397)
  - window starts at 0, len(text), step — i.e. range(0, len, step)
  - each piece [start : start+chunk_size] is .strip()'d BEFORE the
    emptiness check; empty pieces dropped silently (:400-403)
  - parent metadata copied onto every chunk

Implemented with pure Catalyst builtins: posexplode(sequence(...)) +
substr + trim. No Python in the loop → whole-stage codegen, linear
scan, embarrassingly parallel across documents at any scale. The
explode multiplies rows ~len/step ×, which is exactly the data
amplification the pipeline needs — no shuffle until a downstream agg.

T4 PDF page-aware splitter (reference document_processor.py:411-477):
  marker-offset bookkeeping is inherently sequential per document →
  one Arrow-batched pandas UDF returning array<struct<chunk,page>>,
  exploded JVM-side afterwards.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DEFAULT_CHUNK_SIZE = 1200  # reference config.py:26
DEFAULT_CHUNK_OVERLAP = 600  # reference config.py:27


def chunk_step(chunk_size: int, chunk_overlap: int) -> int:
    """step = size - overlap, clamped ≥1 (reference
    document_processor.py:375-377)."""
    return max(chunk_size - chunk_overlap, 1)


#: Python-str.strip() whitespace class for Java regex: the Unicode
#: White_Space property (NBSP, NEL, U+2000 block, …) plus \x1c-\x1f,
#: which Python treats as whitespace but Unicode does not. Java's \s
#: alone is ASCII-only and would keep e.g. a lone NBSP chunk that the
#: reference drops (found by hypothesis, tests/test_properties.py).
_PY_WS = r"[\p{IsWhite_Space}\x1c-\x1f]"


def pystrip(col: Column) -> Column:
    """Python-``str.strip()`` equivalent (reference
    document_processor.py:393,400 strips all Python whitespace)."""
    return F.regexp_replace(col, f"^{_PY_WS}+|{_PY_WS}+$", "")


def split_fixed_size(
    df: DataFrame,
    *,
    text_col: str = "text",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    partition_cols: list[str] | None = None,
    out_col: str = "chunk",
    index_col: str = "chunk_index",
) -> DataFrame:
    """Explode each row into overlapping fixed-size character chunks.

    Returns the input columns (text_col dropped) plus ``out_col`` (the
    stripped chunk), ``chunk_start`` (offset into the stripped text)
    and ``index_col`` (0-based among this row's kept chunks, ordered
    by offset — computed with a per-document window, cheap because a
    document's chunks are narrow).
    """
    step = chunk_step(chunk_size, chunk_overlap)
    part = partition_cols or [c for c in df.columns if c != text_col]

    stripped = pystrip(F.col(text_col))
    base = df.withColumn("__text", stripped).where(F.length("__text") > 0)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length("__text") - 1, F.lit(0)), F.lit(step)
    )
    piece = pystrip(F.col("__text").substr(F.col("chunk_start") + 1, F.lit(chunk_size)))

    exploded = (
        base.select("*", F.explode(starts).alias("chunk_start"))
        .withColumn(out_col, piece)
        .where(F.col(out_col) != "")
    )
    w = Window.partitionBy(*part).orderBy("chunk_start")
    return (
        exploded.withColumn(index_col, F.row_number().over(w) - 1)
        .drop("__text", text_col)
    )


_PAGE_CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk", T.StringType()),
            T.StructField("page_number", T.IntegerType()),
        ]
    )
)


def make_page_split_udf(chunk_size: int = DEFAULT_CHUNK_SIZE, chunk_overlap: int = DEFAULT_CHUNK_OVERLAP):
    """Pandas UDF for the PDF page-aware splitter (reference T4,
    document_processor.py:411-477).

    Semantics replicated exactly:
      - ``[[pageN]]`` markers located; positions recorded against the
        marker-free text (cumulative marker-length offset subtraction)
      - text chunked WITHOUT a leading global strip (unlike T3)
      - iteration: start = 0; while start < len; start += size-overlap
        (no ≥1 clamp here — caller must validate overlap < size, as
        the reference's config does at config.py:35-39)
      - chunk attributed to the last marker at-or-before its start;
        no marker before it → page 1 (:440-448)
      - empty-after-strip chunks dropped
    """
    step = chunk_size - chunk_overlap
    if step <= 0:
        raise ValueError("chunk_overlap must be < chunk_size")

    marker_re = re.compile(r"\[\[page(\d+)\]\]")

    def split_one(text: str | None) -> list[tuple[str, int]] | None:
        if text is None:
            return None
        markers: list[tuple[int, int]] = []
        offset = 0
        for m in marker_re.finditer(text):
            markers.append((m.start() - offset, int(m.group(1))))
            offset += len(m.group(0))
        clean = marker_re.sub("", text)
        out: list[tuple[str, int]] = []
        start = 0
        while start < len(clean):
            piece = clean[start : start + chunk_size].strip()
            if piece:
                page = 1
                for pos, pg in reversed(markers):
                    if pos <= start:
                        page = pg
                        break
                out.append((piece, page))
            start += step
        return out

    @pandas_udf(_PAGE_CHUNK_SCHEMA)
    def page_split(texts: pd.Series) -> pd.Series:
        return texts.map(split_one)

    return page_split


def split_pdf_pages(
    df: DataFrame,
    *,
    text_col: str = "text",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Apply the page-aware splitter and explode to one row per chunk
    with ``chunk``, ``page_number`` and ``chunk_index`` columns."""
    part = partition_cols or [c for c in df.columns if c != text_col]
    udf = make_page_split_udf(chunk_size, chunk_overlap)
    exploded = (
        df.withColumn("__chunks", udf(F.col(text_col)))
        .select("*", F.posexplode("__chunks").alias("chunk_index", "__c"))
        .select(
            *part,
            "chunk_index",
            F.col("__c.chunk").alias("chunk"),
            F.col("__c.page_number").alias("page_number"),
        )
    )
    return exploded


def split_token_windows(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-TOKEN-count windows with stride — the standard LLM
    pre-tokenization chunking (context-window sized slices with
    window−stride tokens of overlap), vs :func:`split_fixed_size`'s
    character windows. Returns (id, window_index int, n_tokens int,
    window_hash md5-of-joined-tokens); the trailing window may be
    short, zero-token docs emit nothing.

    All codegen builtins (split/filter/sequence/slice/md5) staged so
    the tokenize runs once per row: scan → project → explode — no
    shuffle, no Python. At 100 TB this is a map-only stage whose
    output rows ≈ total_tokens/stride.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = staged.select(
        id_col, "__toks", F.explode(starts).alias("__start")
    )
    win = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(window))
    return (
        exploded.select(
            id_col,
            (F.col("__start") / stride).cast("int").alias("window_index"),
            F.size(win).cast("int").alias("n_tokens"),
            F.md5(F.array_join(win, " ")).alias("window_hash"),
        )
        .where(F.col("n_tokens") > 0)
    )


def split_content_defined(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (the Rabin/gear CDC family — LBFS,
    Muthitacharoen et al. 2001 — as dedup-friendly corpus chunking):
    cut after every character position whose trailing ``k``-gram
    rolling hash satisfies ``h % divisor == divisor - 1``, giving
    chunks that average ``divisor`` chars whose boundaries depend only
    on LOCAL content. The property fixed-size chunking lacks: insert
    or delete a prefix and every boundary after the edit re-aligns, so
    chunk-level dedup (hash-groupBy over the output) still matches the
    unedited copies — shifting survives. No min/max clamp: the basic
    hash-condition rule keeps every boundary decision position-
    independent, which is also what makes an exact SQL twin possible.

    Plan shape: char codes stage once (functions/text.py staging
    rule), per-position k-gram hashes and the boundary filter are
    higher-order builtins over that array, and chunks slice the
    original text between consecutive boundaries — everything inside
    one map-side projection chain over the scan, then one posexplode.
    No shuffle (callers group the output as they need), no UDF, no
    float. Hash = the winnowing polynomial (base 257 mod 2^31−1), so
    the twin replays it with list_reduce.

    Returns ``(id, chunk_idx, chunk)`` with 1-based chunk_idx;
    concatenating chunks in order reproduces the document exactly.
    Documents shorter than ``k`` (including empty) come back as one
    chunk."""
    from vectordb_light_spark.functions.text import (
        char_codes,
        kgram_hashes_from_codes,
    )

    t = F.col(text_col)
    n = F.length(t)
    # char codes stage FIRST: kgram_hashes_from_codes references its
    # input 3 times (starts, span, slice) — inlined, the O(n) code
    # extraction would re-run per position, turning the hash pass
    # O(n²) per document (measured 12x on the sf0.01 corpus)
    staged_codes = df.select(
        F.col(id_col), t, char_codes(t).alias("__codes")
    )
    staged = staged_codes.select(
        F.col(id_col),
        t,
        kgram_hashes_from_codes(F.col("__codes"), k).alias("__hs"),
    )
    # gram starting at 1-based s covers chars [s, s+k-1]: cut after
    # position i+k for the 0-based transform index i; drop cuts at or
    # past the end (a cut at n is a no-op and would emit "" chunks)
    bounds = F.filter(
        F.transform(
            F.col("__hs"),
            lambda h, i: F.when(
                h % divisor == divisor - 1, i + k
            ).otherwise(F.lit(-1)),
        ),
        lambda x: (x > 0) & (x < n) & (n >= k),
    )
    # the boundary array MUST stage before the chunk lambda: element_at
    # inside the transform would re-run the filter+transform chain per
    # chunk per reference (the module-header staging rule)
    staged_b = staged.select(
        F.col(id_col),
        t,
        F.concat(F.array(F.lit(0)), bounds, F.array(n)).alias("__b"),
    )
    b = F.col("__b")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(b) - 1),
        lambda i: t.substr(
            F.element_at(b, i) + 1,
            F.element_at(b, i + 1) - F.element_at(b, i),
        ),
    )
    return staged_b.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx0", "chunk"),
    ).select(
        F.col(id_col),
        (F.col("chunk_idx0") + 1).cast("int").alias("chunk_idx"),
        "chunk",
    )
