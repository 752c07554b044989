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


# Per-language function-word profiles for the n-gram/stopword lang-ID
# heuristic. Word-boundary regex counts are cheap JVM scans and the
# scoring is pure arithmetic — ANSI-SQL-mirrorable for the oracle.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "den", "von", "sich"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "was"],
    "es": ["el", "los", "las", "es", "que", "por", "con", "para", "una", "del"],
    "fr": ["le", "les", "est", "dans", "pour", "qui", "pas", "sur", "une", "avec"],
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language evidence: count of function-word matches
    (word-boundary regex, case-insensitive via lower)."""
    t = F.lower(_c(col))
    return {
        lang: F.regexp_count(t, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of function-word counts, ties
    broken by language-code order, zero evidence → 'und' (the BCP-47
    undetermined tag). Deterministic and builtin-only — the
    training-pipeline lang filter that runs JVM-side at 100 TB."""
    scores = lang_scores(col)
    gmax = F.greatest(*scores.values())
    out = F.lit("und")
    # Build the CASE in reverse so earlier languages win ties.
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == gmax, F.lit(lang)).otherwise(out)
    return F.when(gmax == 0, F.lit("und")).otherwise(out)


# Rabin-Karp / winnowing fingerprint parameters. The modulus fits
# intermediate products in a long (M*B + 255 < 2^39); both sides of
# the oracle compute the identical integer recurrence.
FP_BASE = 257
FP_MOD = 2_147_483_647  # 2^31 - 1
FP_K = 8  # k-gram length (chars)
FP_WINDOW = 4  # winnowing window (Schleimer et al. 2003)


def rolling_kgram_hashes(col: Column | str, k: int = FP_K) -> Column:
    """Polynomial hash of every char k-gram: h = Σ code·B^i mod M.

    Apply to a materialized canonical-text column (same staging caveat
    as the dedup sketches). Texts shorter than k yield one hash of the
    whole text. All JVM-side higher-order functions.
    """
    t = _c(col)
    n = F.length(t)
    span = F.least(F.lit(k), n)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.transform(
        starts,
        lambda s: F.aggregate(
            F.sequence(F.lit(0), span - 1),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * FP_BASE + F.ascii(t.substr(s + j, F.lit(1)))) % FP_MOD,
        ),
    )


def winnow_fingerprints(hashes: Column | str, window: int = FP_WINDOW) -> Column:
    """Winnowing: the sorted distinct set of per-window minimum hashes
    — a position-robust document fingerprint (MOSS scheme). ≤window
    hashes → single global min."""
    h = _c(hashes)
    n = F.size(h)
    windowed = F.transform(
        F.sequence(F.lit(1), n - window + 1),
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return F.array_sort(
        F.array_distinct(
            F.when(n <= window, F.array(F.array_min(h))).otherwise(windowed)
        )
    )


def fingerprint64(col: Column | str) -> Column:
    """64-bit content fingerprint of normalized-whitespace, lowercased
    text — the engine's cheap exact-dup key (xxhash64 builtin)."""
    canon = F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))
    return F.xxhash64(canon)
