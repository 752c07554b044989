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
from pyspark.sql.types import ArrayType, LongType, StringType

#: The ONE whitespace-tokenization class shared by every engine that
#: must agree on token streams (Spark/Java regex, DuckDB/RE2 oracle
#: twins, Python trainers). Java ``\s`` is exactly this class; RE2
#: ``\s`` LACKS \x0B (vertical tab) and Python ``str.split()`` adds
#: Unicode whitespace \u2014 so a bare ``\s+`` silently drifts across
#: engines on real text (r6 ADVICE found it in the quality model;
#: r7 VERDICT item 3 + ADVICE extend the pin to BPE ``word_vocab``
#: and dedup ``ngram_tokens``). Valid verbatim in all three regex
#: dialects. The oracle-side migration COMPLETED in r10 (audit
#: inventory 0): bare ``\s`` sites remain only where they are the
#: exact Spark twin by construction (Java ``\s`` IS this class) or
#: inside Spark-side-only code.
PINNED_WS_RE = "[ \\t\\n\\x0B\\f\\r]+"

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
# Chars above U+FFFF can't live in a translate table economically —
# one regex pass removes the astral planes.
_ASTRAL = re.compile(r"[\U00010000-\U0010FFFF]")

# Deletion set (C-speed str.translate): C0 controls except \t\n\r,
# DEL, C1 block, the 12 invisibles, U+FFFD, private use E000-F8FF —
# the same char classes as the reference's per-char loop
# (utilities_core.py:204-231), precomputed once.
_DROP_CODES = (
    [c for c in range(32) if c not in (9, 10, 13)]
    + [127]
    + list(range(128, 160))
    + [ord(c) for c in _INVISIBLE]
    + [0xFFFD]
    + list(range(0xE000, 0xF8FF + 1))
)
_TABLE_PRESERVE = {**dict.fromkeys(_DROP_CODES), ord("\r"): " "}
_TABLE_FLAT = {**_TABLE_PRESERVE, ord("\n"): " ", ord("\t"): " "}


def normalize_text_py(text: str | None, preserve_whitespace: bool = True) -> str | None:
    """Pure-Python normalizer (reference utilities_core.py:177-243
    semantics); unit-testable and reused by the pandas UDF. The char
    classes are applied via a precomputed translate table + one astral
    regex instead of a per-char Python loop (~20× on long documents;
    behavior identical — the parity tests pin it)."""
    if text is None:
        return None
    if isinstance(text, (list, tuple)):
        text = " ".join(str(x) for x in text if x is not None)
    if not isinstance(text, str):
        text = str(text)

    text = unicodedata.normalize("NFKC", text)
    text = _ASTRAL.sub("", text)
    result = text.translate(_TABLE_PRESERVE if preserve_whitespace else _TABLE_FLAT)

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


#: The Gopher "required words" list (Rae et al. 2021 §A1.1.2): a doc
#: must contain ≥2 of these to pass the stopword rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def readability_counts(col: Column | str) -> dict[str, Column]:
    """The three integer counts behind readability scoring, each one
    regexp scan over the text (ASCII patterns, identical semantics in
    Spark's Java regex and DuckDB's RE2):

    - ``n_words``: alphanumeric runs ``[a-z0-9]+`` over the lowered
      text (the word unit Flesch–Kincaid counts),
    - ``n_sentences``: terminal-punctuation marks ``[.!?]``, floored
      at 1 so fragment documents still score,
    - ``n_syllables``: vowel-group runs ``[aeiouy]+`` — the standard
      cheap syllable estimator (one syllable per contiguous vowel
      cluster).
    """
    t = F.coalesce(_c(col), F.lit(""))
    low = F.lower(t)
    return {
        "n_words": F.regexp_count(low, F.lit("[a-z0-9]+")),
        "n_sentences": F.greatest(F.regexp_count(t, F.lit("[.!?]")), F.lit(1)),
        "n_syllables": F.regexp_count(low, F.lit("[aeiouy]+")),
    }


#: Offset added before the integer division in the Flesch–Kincaid
#: milligrade so the numerator is provably non-negative (grades can go
#: slightly negative; -15.59 is the formula's constant term). Shared
#: with the SQL oracle — both engines do the same exact 64-bit math.
_FK_OFFSET = 1_000_000


def flesch_kincaid_grade_milli(
    n_words: Column, n_sentences: Column, n_syllables: Column
) -> Column:
    """Flesch–Kincaid grade level ×1000 as EXACT integer arithmetic
    (Kincaid et al. 1975: ``0.39·W/S + 11.8·Y/W − 15.59``): the two
    divisions are put over the common denominator ``W·S`` and the
    quotient floored — ``⌊(390·W² + 11800·Y·S − 15590·W·S)·1000/...⌋``
    scaled so every intermediate is a 64-bit integer. No float enters
    the computation, so any engine reproduces it bit-for-bit (the
    integer-quantization pattern of the quality classifier). The
    division itself is done by subtracting the remainder first and
    dividing exactly via decimal(38,0), which sidesteps both double
    rounding above 2^53 and decimal scale-6 half-up rounding.
    """
    w = F.greatest(n_words, F.lit(1)).cast("long")
    s = F.greatest(n_sentences, F.lit(1)).cast("long")
    y = n_syllables.cast("long")
    num = (
        F.lit(390) * w * w
        + F.lit(11800) * y * s
        + F.lit(_FK_OFFSET - 15590) * w * s
    )
    den = w * s
    exact = num - (num % den)
    q = (exact.cast("decimal(38,0)") / den.cast("decimal(38,0)")).cast("long")
    return (q - F.lit(_FK_OFFSET)).cast("long")


def gopher_rules(
    col: Column | str,
    stopwords: tuple[str, ...] | list[str] = GOPHER_STOPWORDS,
) -> dict[str, Column]:
    """Gopher-style document-quality RULES (Rae et al. 2021 §A1.1.2),
    each an independent boolean column plus the signals they test —
    all JVM-side builtins (regexp_count / split / filter), zero UDFs,
    so the filter rides whole-stage codegen over a 100 TB scan:

    - ``rule_word_count``:     50 ≤ words ≤ 100,000
    - ``rule_mean_word_len``:  3 ≤ mean word length ≤ 10
    - ``rule_symbol_ratio``:   (# + ellipsis) / words ≤ 0.1
    - ``rule_alpha_words``:    ≥ 80 % of words contain a letter
    - ``rule_stopwords``:      ≥ 2 of the required stopwords
      (default: the 8 Gopher English words; pass a corpus-adapted
      set for non-English or synthetic corpora — on a corpus with no
      English function words the default makes ``keep`` structurally
      zero, see the curate-pipeline gopher stage)
    - ``rule_bullet_lines``:   ≤ 90 % of lines start with a bullet
    - ``rule_ellipsis_lines``: ≤ 30 % of lines end with an ellipsis
    - ``keep``: AND of all rules.

    Returns {name: Column}; select what you need. Empty/blank docs
    fail the word-count rule and divide-by-zero guards return 0
    ratios, matching the oracle twin (queries.py ts_gopher_filter).
    """
    t = F.trim(_c(col))
    toks = F.split(t, r"\s+")
    n_words = whitespace_token_count(t)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(nonspace / n_words)
    symbol_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.regexp_count(t, F.lit(r"#|\.\.\.|…")) / n_words
    )
    alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / n_words
    )
    stop_hits = sum(
        F.when(F.lower(t).rlike(rf"\b{sw}\b"), 1).otherwise(0)
        for sw in stopwords
    )
    lines = F.split(_c(col), r"\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
        / n_lines
    )
    rules = {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "rule_word_count": (n_words >= 50) & (n_words <= 100_000),
        "rule_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "rule_symbol_ratio": symbol_ratio <= 0.1,
        "rule_alpha_words": alpha_frac >= 0.8,
        "rule_stopwords": F.lit(stop_hits) >= 2,
        "rule_bullet_lines": bullet_frac <= 0.9,
        "rule_ellipsis_lines": ellipsis_frac <= 0.3,
    }
    keep = None
    for name, c in rules.items():
        if name.startswith("rule_"):
            keep = c if keep is None else (keep & c)
    rules["keep"] = keep
    return rules


#: C4 (Raffel et al. 2020 §2.2) page-level blockers and line-level
#: drop phrases. The bad-word list is a tiny neutral placeholder for
#: the full blocklist C4 uses — swap in a real one per deployment.
C4_BAD_WORDS = ("porn", "xxx", "viagra")
C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
)


def c4_rules(
    col: Column | str,
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> dict[str, Column]:
    """C4-style page cleaning (Raffel et al. 2020 §2.2), the other
    standard pre-training corpus gate next to :func:`gopher_rules` —
    line-level TRANSFORM plus page-level rule booleans, all JVM-side
    builtins (split / filter / array_join / regexp), zero UDFs:

    line filter (drops the line, keeps the page):
      - must end in terminal punctuation (``.!?"”``)
      - must have ≥ ``min_words_per_line`` words
      - no "javascript" (the lorem-of-JS-warning boilerplate)
      - no policy boilerplate phrase (``C4_POLICY_PHRASES``)

    page rules (each an independent boolean; ``keep`` is their AND):
      - ``rule_min_sentences``: ≥ ``min_sentences`` sentence enders
        in the CLEANED text
      - ``rule_no_lorem``:      no "lorem ipsum"
      - ``rule_no_brace``:      no "{" (code page)
      - ``rule_no_bad_words``:  no ``C4_BAD_WORDS`` hit

    Returns {name: Column} including ``cleaned_text`` (kept lines
    re-joined with ``\\n``) and ``n_lines_kept``; select what you
    need. All regex/array ops mirror 1:1 into the DuckDB oracle twin
    (queries.py ts_c4_filter).
    """
    src = _c(col)
    low = F.lower(src)

    def keep_line(x):
        t = F.trim(x)
        return (
            t.rlike(r'[.!?"”]$')
            & (F.size(F.split(t, r"\s+")) >= min_words_per_line)
            & ~F.lower(t).rlike("javascript")
            & ~F.lower(t).rlike("|".join(C4_POLICY_PHRASES))
        )

    kept = F.filter(F.split(src, r"\n"), keep_line)
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    rules: dict[str, Column] = {
        "cleaned_text": cleaned,
        "n_lines_kept": F.size(kept),
        "n_sentences": n_sentences,
        "rule_min_sentences": n_sentences >= min_sentences,
        "rule_no_lorem": ~low.rlike("lorem ipsum"),
        "rule_no_brace": ~low.contains("{"),
        "rule_no_bad_words": ~low.rlike(
            r"\b(" + "|".join(C4_BAD_WORDS) + r")\b"
        ),
    }
    keep = None
    for name, c in rules.items():
        if name.startswith("rule_"):
            keep = c if keep is None else (keep & c)
    rules["keep"] = keep
    return rules


# Per-language function-word profiles for the n-gram/stopword lang-ID
# heuristic. Word-boundary regex counts are cheap JVM scans and the
# scoring is pure arithmetic — ANSI-SQL-mirrorable for the oracle.
#: ASCII-only function words (a non-ASCII word's \b semantics differ
#: between Java regex and RE2, breaking oracle parity). Overlaps
#: between related languages (es/pt "para", de/nl "met/mit") are fine
#: — they just contribute evidence to both and the margin reflects it.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "den", "von", "sich"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "was"],
    "es": ["el", "los", "las", "es", "que", "por", "con", "para", "una", "del"],
    "fr": ["le", "les", "est", "dans", "pour", "qui", "pas", "sur", "une", "avec"],
    "it": ["il", "che", "di", "non", "per", "sono", "della", "anche", "come", "questo"],
    "nl": ["het", "een", "van", "niet", "met", "voor", "zijn", "ook", "maar", "deze"],
    "pl": ["nie", "jest", "jak", "ale", "czy", "tak", "jego", "przez", "oraz", "tylko"],
    "pt": ["uma", "para", "com", "dos", "das", "mais", "foi", "pelo", "quando", "muito"],
    "sv": ["och", "att", "det", "som", "inte", "har", "jag", "den", "vad", "till"],
    "tr": ["ve", "bir", "bu", "ile", "olarak", "daha", "gibi", "kadar", "sonra", "ama"],
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


def lang_margin(col: Column | str) -> Column:
    """Confidence evidence for :func:`lang_id`: top1 − top2
    function-word counts (0 on a tie or no evidence — exactly the
    ambiguous cases). Downstream gates threshold on this instead of
    trusting every argmax; same integer arithmetic in any engine."""
    scores = lang_scores(col)
    arr = F.array_sort(F.array(*scores.values()))
    n = len(scores)
    return F.element_at(arr, n) - F.element_at(arr, n - 1)


# Rabin-Karp / winnowing fingerprint parameters. The modulus fits
# intermediate products in a long (M*B + 255 < 2^39); both sides of
# the oracle compute the identical integer recurrence.
FP_BASE = 257
FP_MOD = 2_147_483_647  # 2^31 - 1
FP_K = 8  # k-gram length (chars)
FP_WINDOW = 4  # winnowing window (Schleimer et al. 2003)


def char_codes(col: Column | str) -> Column:
    """array<long> of per-char codes — ONE substr pass over the text.
    Stage this as a materialized column before k-gram hashing: if it
    were inlined inside the per-gram lambda, Catalyst's CollapseProject
    would re-extract every char once per gram (k× the work)."""
    t = _c(col)
    return F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(t.substr(i, F.lit(1))).cast("long"),
    )


def kgram_hashes_from_codes(codes: Column | str, k: int = FP_K) -> Column:
    """Polynomial hash of every k-gram of a staged char-code array:
    h = fold(acc·B + code mod M) over slice(codes, s, k). Inputs
    shorter than k yield one whole-input hash."""
    c = _c(codes)
    n = F.size(c)
    span = F.least(F.lit(k), n)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.transform(
        starts,
        lambda s: F.aggregate(
            F.slice(c, s, span),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
        ),
    )


def rolling_kgram_hashes(col: Column | str, k: int = FP_K) -> Column:
    """Polynomial hash of every char k-gram of a text column
    (convenience composition — for hot paths stage :func:`char_codes`
    as its own projection and call :func:`kgram_hashes_from_codes`)."""
    return kgram_hashes_from_codes(char_codes(col), k)


def make_winnow_udf(k: int = FP_K, window: int = FP_WINDOW):
    """Arrow-batched winnowing: text → sorted distinct fingerprint
    array, computing the IDENTICAL integer recurrence as the
    builtin pair (:func:`kgram_hashes_from_codes` +
    :func:`winnow_fingerprints`) — asserted equal in tests — but
    vectorized: one sliding-window matmul for the k-gram hashes and
    one sliding-window min for the winnow, per document. The builtin
    HOF form pays the expression-interpreter cost per char; this is
    the hot-path variant."""
    import numpy as np

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return None
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            if codes.size <= k:
                windows = codes[None, :]
            else:
                windows = np.lib.stride_tricks.sliding_window_view(codes, k)
            span = windows.shape[1]
            powers = np.array(
                [pow(FP_BASE, span - 1 - j, FP_MOD) for j in range(span)],
                dtype=np.uint64,
            )
            hs = (windows * powers[None, :]).sum(axis=1) % FP_MOD
            if hs.size <= window:
                mins = hs.min(keepdims=True)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
            return np.unique(mins).astype(np.int64)

        return texts.map(one)

    return winnow


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


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene; beyond-reference)
# ---------------------------------------------------------------------------

#: Redaction patterns in the Java-regex/RE2 COMMON dialect (no
#: lookaround, no backreferences) so Spark's regexp_replace and a
#: DuckDB oracle evaluate identically. Order matters: emails before
#: phones (an email's digits must not half-match the phone pattern).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


#: Opt-in extended patterns (r10). Candidate-match shapes in the
#: common dialect; the card pattern is deliberately BROAD (13-19
#: digits with optional space/dash groupings) because real redaction
#: must pair it with the Luhn verifier below — redacting every long
#: digit run would destroy order ids and timestamps.
PII_PATTERNS_EXTENDED = PII_PATTERNS + (
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # MAXIMAL digit/separator runs of >=13 chars (r11, second
    # iteration after the round's review): the candidate is the WHOLE
    # contiguous run, never a char-capped window — any fixed cap lets
    # a long-enough neighbor truncate the card's tail digits out of
    # the window and shield it (the old {11,21} cap failed exactly so
    # on 'ref 20260816 4111111111111111'). scrub_card_numbers then
    # finds ALL separator-aligned Luhn-valid sub-runs inside the run.
    # BOUNDARY-FREE by design: the pattern is a candidate domain, not
    # the final match — a glued digit run still deserves the verify
    # pass, and `\b` is the one skew class the migration couldn't
    # spell identically for split semantics (Java's is Unicode-aware,
    # RE2's ASCII). Runs shorter than 13 chars cannot hold a card and
    # never match, so prose numbers stay out of the machinery.
    ("card", r"[0-9][0-9 -]{11,}[0-9]", "<CARD>"),
)


def luhn_valid(col: Column | str) -> Column:
    """True iff the digit string in ``col`` passes the Luhn mod-10
    check (the checksum every real payment-card number satisfies —
    ISO/IEC 7812). PURE checksum — length policy (e.g. the 13-19
    digits of real PANs) belongs to the caller
    (:func:`scrub_card_numbers` enforces it). Pure JVM higher-order
    functions over the digit array, right-to-left doubling via the
    position parity:

        sum(d_i, doubling every second digit from the RIGHT,
            9-folding two-digit products) % 10 == 0

    Non-digit characters must be stripped by the caller. Map-only,
    codegen-friendly, no UDF."""
    s = _c(col)
    n = F.length(s)
    digits = F.split(s, "")
    # position from the right (1-based): parity decides doubling
    summed = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda d, i: F.when(
                ((n - i) % 2) == 1,
                # doubled digit, 9-folded: 2d if 2d<10 else 2d-9
                F.when(d.cast("int") * 2 < 10, d.cast("int") * 2)
                .otherwise(d.cast("int") * 2 - 9),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),
    )
    return (n >= 1) & (summed % 10 == 0)


def _bind(expr, fn):
    """Evaluate ``expr`` ONCE per row and pass the materialized value
    into ``fn`` — higher-order lambda binding as common-subexpression
    elimination (interpreted HOF expressions have no CSE of their
    own, so a subtree referenced N times would otherwise run N
    times)."""
    return F.get(F.transform(F.array(expr), fn), 0)


#: A card has at most 19 digits, so a Luhn-valid sub-run spans at
#: most 19 separator-aligned groups — the enumeration bound that
#: keeps the range set LINEAR in run length (≤19 ranges per start
#: index) on arbitrarily long digit/separator runs.
_CARD_MAX_SPAN = 19

#: ADVERSARIAL digit soup (all-zero 13-digit groups are Luhn-valid)
#: could make |valid| grow with run length — so only the first 64
#: valid ranges (enumeration order: i ASC, j ASC) enter conflict
#: resolution, bounding the per-row sort/fold/stitch work. 64
#: disjoint cards in ONE contiguous run is far past any real
#: document; the cap is spelled identically in the DuckDB twin.
#: (The r11 dominance filter this cap originally guarded was
#: O(|valid|²); the r12 greedy fold is O(|valid| log |valid|) — the
#: cap stays as defense-in-depth and because its spelling is
#: test-pinned in both engines.)
_CARD_MAX_VALID = 64


def _card_chosen_ranges(groups: Column) -> Column:
    """All separator-aligned Luhn-valid sub-runs to redact inside one
    candidate run, as ``array<struct<i,j>>`` (1-based inclusive group
    ranges, pairwise disjoint).

    Enumeration: every contiguous group range spanning ≤
    `_CARD_MAX_SPAN` groups whose concatenated digits are 13-19 long
    and Luhn-valid. Digit LENGTH is pre-checked from a bound
    lengths array, so the digit string only materializes for ranges
    already in the 13-19 window.

    Conflict policy (SEQUENTIAL GREEDY, ADVICE r11): sort valid
    ranges by (i ASC, j DESC) and fold left-to-right, keeping each
    range whose start exceeds the last KEPT range's end — overlaps
    resolve leftmost-longest against the CHOSEN set only, and
    disjoint valid ranges are ALL chosen (multi-card runs redact
    every card). The r11 order-free dominance filter tested overlap
    against ALL valid ranges including already-dominated ones, so a
    Luhn-valid straddling decoy could shadow a real card (valid
    (1,4),(4,7),(5,8): (4,7) is dominated by (1,4) yet still
    dominated (5,8), leaking the second card); the greedy fold is
    immune because a dominated range never enters the chosen set.
    The chosen set is pairwise disjoint by construction of the
    fold."""
    return _bind(
        groups,
        lambda g: _bind(
            F.transform(g, lambda x: F.length(x)),
            lambda lens: _bind(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.sequence(F.lit(1), F.size(g)),
                            lambda i: F.transform(
                                F.sequence(
                                    i,
                                    F.least(
                                        i + (_CARD_MAX_SPAN - 1),
                                        F.size(g),
                                    ),
                                ),
                                lambda j: F.struct(
                                    i.alias("i"),
                                    j.alias("j"),
                                    F.aggregate(
                                        F.slice(lens, i, j - i + 1),
                                        F.lit(0),
                                        lambda a, x: a + x,
                                    ).alias("dl"),
                                ),
                            ),
                        )
                    ),
                    lambda r: (r["dl"] >= 13)
                    & (r["dl"] <= 19)
                    & luhn_valid(
                        F.array_join(
                            F.slice(g, r["i"], r["j"] - r["i"] + 1), ""
                        )
                    ),
                ),
                lambda valid_all: _bind(
                    F.slice(
                        valid_all,
                        1,
                        F.least(
                            F.size(valid_all), F.lit(_CARD_MAX_VALID)
                        ),
                    ),
                    # greedy leftmost-longest fold: sort (i ASC,
                    # j DESC), keep r iff r.i clears the last KEPT
                    # range's j (F.get is the total element access —
                    # NULL on the empty accumulator, never a throw,
                    # and the size==0 arm short-circuits it anyway)
                    lambda valid: F.aggregate(
                        F.array_sort(
                            valid,
                            lambda a, b: F.when(
                                a["i"] != b["i"], a["i"] - b["i"]
                            ).otherwise(b["j"] - a["j"]),
                        ),
                        F.slice(valid, 1, 0),
                        lambda acc, r: F.when(
                            (F.size(acc) == 0)
                            | (
                                r["i"]
                                > F.get(acc, F.size(acc) - 1)["j"]
                            ),
                            F.array_append(acc, r),
                        ).otherwise(acc),
                    ),
                ),
            ),
        ),
    )


def scrub_card_numbers(col: Column | str, token: str = "<CARD>") -> Column:
    """Replace LUHN-VALID payment-card numbers (13-19 DIGITS, with or
    without space/dash groupings) with ``token``, leaving Luhn-invalid
    or out-of-range digit runs (order ids, tracking numbers, 12-digit
    references) untouched — including runs merely ADJACENT to a real
    card ('pay 4111111111111111 123' keeps the 123, 'ref 20260816
    4111111111111111' keeps the date; ADVICE r10 + the round's review)
    — and redacting EVERY card when one run holds several.

    Plan shape: split the text on the maximal-run candidate pattern,
    find each run's chosen sub-runs (:func:`_card_chosen_ranges`),
    and stitch the text back group-by-group — token at each chosen
    start, covered groups and their internal separators dropped,
    everything else verbatim. All JVM higher-order builtins, each
    subtree bound once (`_bind`), no UDF, map-only."""
    s = _c(col)
    pat = PII_PATTERNS_EXTENDED[-1][1]
    pieces = F.split(s, pat)
    cands = F.regexp_extract_all(s, F.lit(pat), F.lit(0))

    def _rewrite(c):
        groups = F.split(c, r"[ -]")
        seps = F.regexp_extract_all(c, F.lit(r"[ -]"), F.lit(0))
        return _bind(
            F.struct(
                groups.alias("g"),
                seps.alias("sp"),
                _card_chosen_ranges(groups).alias("ch"),
            ),
            lambda b: F.when(F.size(b["ch"]) == 0, c).otherwise(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.size(b["g"])),
                        lambda t: F.concat(
                            # group slot: token at a chosen start,
                            # empty inside a chosen range, else verbatim
                            F.when(
                                F.exists(b["ch"], lambda r: r["i"] == t),
                                F.lit(token),
                            )
                            .when(
                                F.exists(
                                    b["ch"],
                                    lambda r: (r["i"] < t) & (t <= r["j"]),
                                ),
                                F.lit(""),
                            )
                            .otherwise(F.element_at(b["g"], t)),
                            # separator slot sep(t) sits between group
                            # t and t+1: dropped only INSIDE a chosen
                            # range
                            F.when(
                                (t < F.size(b["g"]))
                                & ~F.exists(
                                    b["ch"],
                                    lambda r: (r["i"] <= t) & (t < r["j"]),
                                ),
                                F.coalesce(
                                    F.element_at(b["sp"], t), F.lit("")
                                ),
                            ).otherwise(F.lit("")),
                        ),
                    ),
                    "",
                )
            ),
        )

    kept = F.transform(cands, _rewrite)
    # text == pieces[0] + kept[0] + pieces[1] + kept[1] + ... +
    # pieces[-1]; zip_with pads the shorter array with NULLs.
    return F.concat(
        F.array_join(
            F.zip_with(
                pieces,
                kept,
                lambda p, c: F.concat(p, F.coalesce(c, F.lit(""))),
            ),
            "",
        )
    )


def count_card_numbers(col: Column | str) -> Column:
    """Number of card redactions :func:`scrub_card_numbers` would
    perform on ``col`` — chosen sub-runs summed across candidate runs
    (a run holding two cards counts 2). Map-only."""
    pat = PII_PATTERNS_EXTENDED[-1][1]
    cands = F.regexp_extract_all(_c(col), F.lit(pat), F.lit(0))
    return F.aggregate(
        F.transform(
            cands,
            lambda c: F.size(_card_chosen_ranges(F.split(c, r"[ -]"))),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )


def scrub_pii(col: Column | str, *, extended: bool = False) -> Column:
    """Replace emails / phone numbers / IPv4 literals (and, with
    ``extended=True``, SSNs and Luhn-verified card numbers) with
    typed placeholder tokens — the standard pre-training redaction
    pass. Pure JVM regexp_replace chain: map-only, pushdown-friendly,
    no Python in the hot path. The registered oracle entry covers the
    default patterns; the extended tier is unit-tested
    (tests/test_text_functions.py)."""
    out = _c(col)
    for kind, pattern, token in (
        PII_PATTERNS_EXTENDED if extended else PII_PATTERNS
    ):
        if kind == "card":
            out = scrub_card_numbers(out, token)
        else:
            out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """{kind: count of matches} per row, for redaction reporting."""
    return {
        kind: F.size(F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(0)))
        for kind, pattern, _ in PII_PATTERNS
    }
