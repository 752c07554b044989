"""Text normalization and analysis functions.

normalize_text re-expresses the reference's Unicode cleaner
(reference utilities_core.py:177-243) as an Arrow-batched pandas UDF —
NFKC has no Catalyst builtin. Char-for-char behavioral parity:

  - NFKC normalize
  - whitespace mode (preserve_whitespace=True, the chunk path,
    applied at reference stage_split.py:60-63): keep ``\\n``/``\\t``,
    ``\\r``→space; then collapse runs of non-newline whitespace to one
    space, strip spaces around newlines, squeeze 3+ newlines to 2
  - flat mode (the query path, reference embedding_models.py:66-85):
    ``\\n\\t\\r``→space, collapse all whitespace
  - always dropped: C0 controls, DEL, C1 (U+0080-009F), chars above
    U+FFFF, U+FFFD, private-use U+E000-F8FF, and 12 invisible
    format chars (soft hyphen, ZWSP/ZWNJ/ZWJ, LRM/RLM, word joiner,
    function application, invisible times/separator/plus, BOM)
  - empty after trim → None (chunk dropped) in whitespace mode;
    the query path maps empty → " " instead
    (reference embedding_models.py:83-85)

The rest of this module is the beyond-reference text-analysis surface
(token counts, quality scores, language ID, fingerprints) — all pure
Catalyst builtins so they run JVM-side at 100 TB scale.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_INVISIBLE = {
    "\u00ad",  # soft hyphen
    "\u200b",  # zero-width space
    "\u200c",  # zero-width non-joiner
    "\u200d",  # zero-width joiner
    "\u200e",  # left-to-right mark
    "\u200f",  # right-to-left mark
    "\u2060",  # word joiner
    "\u2061",  # function application
    "\u2062",  # invisible times
    "\u2063",  # invisible separator
    "\u2064",  # invisible plus
    "\ufeff",  # byte order mark
}

_WS_RUN = re.compile(r"[^\S\n\t]+")
_NL_PAD = re.compile(r" *\n *")
_NL_SQUEEZE = re.compile(r"\n{3,}")


def normalize_text_py(text: str | None, preserve_whitespace: bool = True) -> str | None:
    """Pure-Python normalizer (reference utilities_core.py:177-243
    semantics); unit-testable and reused by the pandas UDF."""
    if text is None:
        return None
    if isinstance(text, (list, tuple)):
        text = " ".join(str(x) for x in text if x is not None)
    if not isinstance(text, str):
        text = str(text)

    text = unicodedata.normalize("NFKC", text)

    out: list[str] = []
    for ch in text:
        code = ord(ch)
        if ch in ("\n", "\t"):
            out.append(ch if preserve_whitespace else " ")
        elif ch == "\r":
            out.append(" ")
        elif code < 32 or code == 127 or code > 65535:
            continue
        elif ch in _INVISIBLE:
            continue
        elif 128 <= code <= 159 or code == 65533 or 57344 <= code <= 63743:
            continue
        else:
            out.append(ch)
    result = "".join(out)

    if preserve_whitespace:
        result = _WS_RUN.sub(" ", result)
        result = _NL_PAD.sub("\n", result)
        result = _NL_SQUEEZE.sub("\n\n", result)
    else:
        result = " ".join(result.split())

    result = result.strip()
    return result if result else None


def normalize_query_text_py(text: str | None) -> str:
    """Query-side variant: flat whitespace, empty → single space
    (reference embedding_models.py:66-85)."""
    out = normalize_text_py(text, preserve_whitespace=False)
    return out if out else " "


def make_normalize_udf(preserve_whitespace: bool = True):
    """Arrow-batched pandas UDF wrapping :func:`normalize_text_py`."""

    @pandas_udf(StringType())
    def normalize(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: normalize_text_py(t, preserve_whitespace))

    return normalize


# ---------------------------------------------------------------------------
# Beyond-reference text analysis (JVM-side builtins) — BASELINE.json
# north-star ops for training-data pipelines.
# ---------------------------------------------------------------------------


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def whitespace_token_count(col: Column | str) -> Column:
    """Number of whitespace-separated tokens (0 for empty/blank)."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_token_count(col: Column | str) -> Column:
    """BPE-ish token proxy: count of word/number/punctuation-run
    matches — a deterministic, JVM-side stand-in for a real tokenizer
    (regexp_count is a Spark 3.5+ builtin)."""
    return F.regexp_count(_c(col), F.lit(r"\w+|[^\w\s]"))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 when empty)."""
    t = _c(col)
    n = F.length(t)
    p = F.regexp_count(t, F.lit(r"[^\w\s]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords —
    the classic Gopher/C4-style quality signal, all JVM-side."""
    stopwords = stopwords or [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "for", "on", "with", "as", "was", "at", "by", "be",
    ]
    toks = F.split(F.lower(F.trim(_c(col))), r"\s+")
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.regexp_replace(t, r"[^\w]", ""))))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(n_sw / n)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] document-quality heuristic: length band +
    punctuation sanity + stopword presence. Deterministic and
    builtin-only; thresholdable for corpus filtering."""
    t = _c(col)
    n = F.length(t)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_ok = F.when(punct_ratio(t) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    sw_ok = F.when(stopword_ratio(t) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * 0.4 + punct_ok * 0.3 + sw_ok * 0.3).cast("double")


def fingerprint64(col: Column | str) -> Column:
    """64-bit content fingerprint of normalized-whitespace, lowercased
    text — the engine's cheap exact-dup key (xxhash64 builtin)."""
    canon = F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))
    return F.xxhash64(canon)
