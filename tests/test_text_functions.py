"""normalize_text parity + text-analysis function tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_light_spark.functions.text import (
    fingerprint64,
    make_normalize_udf,
    normalize_query_text_py,
    normalize_text_py,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
    word_token_count,
)


def test_normalize_basics():
    assert normalize_text_py(None) is None
    assert normalize_text_py("") is None
    assert normalize_text_py("   ") is None
    assert normalize_text_py("hello  world") == "hello world"


def test_normalize_preserves_newlines_in_whitespace_mode():
    assert normalize_text_py("a \n b", True) == "a\nb"  # spaces around \n stripped
    assert normalize_text_py("a\n\n\n\nb", True) == "a\n\nb"  # squeeze 3+ → 2
    assert normalize_text_py("a\tb", True) == "a\tb"  # tabs survive whitespace mode
    assert normalize_text_py("a\nb", False) == "a b"  # flat mode


def test_normalize_drops_controls_invisibles_and_astral():
    assert normalize_text_py("a\x00b\x7fc\x9fd") == "abcd"
    assert normalize_text_py("x​y­y﻿z") == "xyyz"
    assert normalize_text_py("emoji\U0001f600gone") == "emojigone"
    assert normalize_text_py("priv") == "priv"
    assert normalize_text_py("re�pl") == "repl"


def test_normalize_nfkc():
    assert normalize_text_py("ＡＢＣ１２３") == "ABC123"  # fullwidth → ASCII
    assert normalize_text_py("ﬁne") == "fine"  # ligature expansion


def test_normalize_crlf():
    assert normalize_text_py("a\r\nb", True) == "a\nb"  # \r→space, stripped at \n


def test_query_normalize_empty_is_space():
    assert normalize_query_text_py("") == " "
    assert normalize_query_text_py("  \n ") == " "
    assert normalize_query_text_py("a\nb") == "a b"


def test_normalize_udf_matches_python(spark):
    rows = [
        (1, "hello  world"),
        (2, "a\n\n\n\nb"),
        (3, None),
        (4, "ＡＢＣ ﬁne​"),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["norm"]
        for r in df.withColumn("norm", make_normalize_udf(True)(F.col("text"))).collect()
    }
    for i, t in rows:
        assert out[i] == normalize_text_py(t, True), (i, t)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, "don't stop!")],
        "id long, text string",
    )
    got = {
        r["id"]: (r["ws"], r["wt"])
        for r in df.select(
            "id",
            whitespace_token_count("text").alias("ws"),
            word_token_count("text").alias("wt"),
        ).collect()
    }
    assert got[1] == (3, 3)
    assert got[2] == (0, 0)
    assert got[3][0] == 2
    assert got[3][1] == 5  # don ' t stop !


def test_quality_and_ratios(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the hills " * 8
    bad = "!!! ??? *** $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            punct_ratio("text").alias("pr"),
            stopword_ratio("text").alias("sr"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert got[1]["pr"] < 0.05 and got[1]["sr"] > 0.2
    assert got[2]["pr"] > 0.5 and got[2]["sr"] == 0.0
    assert got[1]["q"] > got[2]["q"]


def test_fingerprint_ws_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "id long, text string",
    )
    got = {r["id"]: r["fp"] for r in df.select("id", fingerprint64("text").alias("fp")).collect()}
    assert got[1] == got[2] != got[3]


def test_lang_id(spark):
    from vectordb_light_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of that house for it was"),
            (2, "der Hund und die Katze ist nicht mit den anderen"),
            (3, "el perro y los gatos es que por con una del"),
            (4, "le chien et les chats est dans pour qui pas sur"),
            (5, "zzz qqq xxx"),
            (6, ""),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und", 6: "und"}


def test_lang_id_all_profiles_trip_with_margin(spark):
    """r6: every shipped language profile detects a sample sentence in
    that language, with strictly positive top1−top2 margin; ambiguous
    and empty inputs margin 0."""
    from vectordb_light_spark.functions.text import (
        LANG_PROFILES,
        lang_id,
        lang_margin,
    )

    samples = {
        "de": "der Hund und die Katze ist nicht mit den anderen von sich",
        "en": "the cat and the dog of that house for it was in the garden",
        "es": "el perro y los gatos es que por con una del pueblo",
        "fr": "le chien et les chats est dans pour qui pas sur avec",
        "it": "il cane che di non per sono della anche come questo",
        "nl": "het huis een hond van niet met voor zijn ook maar deze",
        "pl": "nie jest jak ale czy tak jego przez oraz tylko",
        "pt": "uma casa para com dos das mais foi pelo quando muito",
        "sv": "och att det som inte har jag den vad till",
        "tr": "ve bir bu ile olarak daha gibi kadar sonra ama",
    }
    assert set(samples) == set(LANG_PROFILES)
    rows = [(lang, text) for lang, text in samples.items()]
    rows.append(("und", "zzz qqq"))      # no evidence
    df = spark.createDataFrame(rows, "want string, text string")
    got = df.select(
        "want",
        lang_id("text").alias("lang"),
        lang_margin("text").alias("margin"),
    ).collect()
    for r in got:
        assert r["lang"] == r["want"], f"{r['want']}: got {r['lang']}"
        if r["want"] == "und":
            assert r["margin"] == 0
        else:
            assert r["margin"] > 0, f"{r['want']}: margin {r['margin']}"


def test_winnow_fingerprints_properties(spark):
    from vectordb_light_spark.functions.text import (
        FP_BASE,
        FP_MOD,
        rolling_kgram_hashes,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "short"), (4, "totally different text")],
        "id long, t string",
    )
    out = df.select(
        "id",
        rolling_kgram_hashes("t").alias("hs"),
        winnow_fingerprints(rolling_kgram_hashes("t")).alias("fp"),
    )
    rows = {r["id"]: r for r in out.collect()}
    # identical text -> identical hashes and fingerprints
    assert rows[1]["hs"] == rows[2]["hs"]
    assert rows[1]["fp"] == rows[2]["fp"]
    # k-gram count = len - k + 1 (len 10, k 8 -> 3 grams)
    assert len(rows[1]["hs"]) == 3
    # shorter than k -> one whole-text hash
    assert len(rows[3]["hs"]) == 1
    # the hash recurrence matches a reference python computation
    def poly(s):
        h = 0
        for ch in s:
            h = (h * FP_BASE + ord(ch)) % FP_MOD
        return h

    assert rows[1]["hs"][0] == poly("abcdefgh")
    assert rows[3]["hs"][0] == poly("short")
    # fingerprints are sorted distinct subsets of the hash multiset
    for r in rows.values():
        assert r["fp"] == sorted(set(r["fp"]))
        assert set(r["fp"]) <= set(r["hs"])


def test_winnow_udf_matches_builtin(spark):
    from vectordb_light_spark.functions.text import (
        char_codes,
        kgram_hashes_from_codes,
        make_winnow_udf,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "short"),
         (3, "aaaaaaaaaaaaaaaaaaaa"),
         (4, "mixed Text With CAPS and 123 numbers end")],
        "id long, t string",
    )
    coded = df.select("id", "t", char_codes("t").alias("codes"))
    builtin = coded.select(
        "id", winnow_fingerprints(kgram_hashes_from_codes("codes")).alias("fp")
    )
    udf = df.select("id", make_winnow_udf()(F.col("t")).alias("fp"))
    b = {r["id"]: list(r["fp"]) for r in builtin.collect()}
    u = {r["id"]: list(r["fp"]) for r in udf.collect()}
    assert b == u


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_pii_replaces_all_kinds(spark):
    from vectordb_light_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@example.org or call +1-555-0100, host 192.168.0.1 ok")],
        "id long, text string",
    )
    counts = pii_counts("text")
    row = df.select(
        scrub_pii("text").alias("t"),
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
    ).first()
    assert "<EMAIL>" in row.t and "<PHONE>" in row.t and "<IP>" in row.t
    assert "example.org" not in row.t and "192.168" not in row.t
    assert (row.e, row.p, row.i) == (1, 1, 1)


def test_scrub_pii_leaves_clean_text_alone(spark):
    from vectordb_light_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "no sensitive content in this sentence at all")],
        "id long, text string",
    )
    out = df.select(scrub_pii("text").alias("t")).first().t
    assert out == "no sensitive content in this sentence at all"


def test_gopher_rules_each_rule_fires_independently(spark):
    """r5: every Gopher rule (Rae et al. 2021 §A1.1.2) trips on a doc
    crafted to fail ONLY that rule; a clean doc passes all of them."""
    from vectordb_light_spark.functions.text import gopher_rules

    good = (
        "The quick brown fox jumps over the lazy dog and runs home to "
        "rest with friends that have seen many fine days of warm sun. "
    ) * 5  # ≥50 words, sane lengths, stopwords present
    docs = {
        "good": good,
        "too_short": "the cat sat with that hat and have fun be of it",
        "long_words": " ".join(["the", "of"] + ["pneumonoultramicroscopic"] * 58),
        "symbols": good + " " + "# " * 30,
        "non_alpha": "the of " + "12345 " * 58,
        "no_stopwords": " ".join(f"w{i}x quick brown fox" for i in range(20)),
        "bullets": "\n".join(f"- the point {i} of it that have be with and" for i in range(20)),
        "ellipsis": "\n".join(f"the line {i} of it that have be with and..." for i in range(20)),
    }
    df = spark.createDataFrame(list(docs.items()), "id string, text string")
    r = gopher_rules("text")
    rows = {
        row["id"]: row
        for row in df.select(
            "id", *[r[k].alias(k) for k in r if k.startswith("rule_") or k == "keep"]
        ).collect()
    }
    assert rows["good"]["keep"] is True
    fail_map = {
        "too_short": "rule_word_count",
        "long_words": "rule_mean_word_len",
        "symbols": "rule_symbol_ratio",
        "non_alpha": "rule_alpha_words",
        "no_stopwords": "rule_stopwords",
        "bullets": "rule_bullet_lines",
        "ellipsis": "rule_ellipsis_lines",
    }
    for doc, rule in fail_map.items():
        assert rows[doc][rule] is False, f"{doc} should fail {rule}"
        assert rows[doc]["keep"] is False


def test_gopher_rules_empty_and_blank_fail_safely(spark):
    """Empty text → n_words 0; blank-with-newline yields empty
    tokens (SQL trim strips only spaces — same in the DuckDB twin)
    but every degenerate doc still lands keep=False."""
    from vectordb_light_spark.functions.text import gopher_rules

    df = spark.createDataFrame([(1, ""), (2, "   \n  ")], "id long, text string")
    r = gopher_rules("text")
    rows = {
        row["id"]: row
        for row in df.select(
            "id", r["n_words"].alias("n"), r["keep"].alias("keep")
        ).collect()
    }
    assert rows[1]["n"] == 0
    assert all(row["keep"] is False for row in rows.values())


def test_c4_rules_line_filter_and_page_rules(spark):
    """r5: each C4 line-filter clause and page rule fires on a doc
    crafted to trip ONLY it (Raffel et al. 2020 §2.2)."""
    from vectordb_light_spark.functions.text import c4_rules

    good_line = "This sentence has enough words and ends properly."
    docs = {
        "good": "\n".join([good_line] * 4),
        # line-filter victims: the page keeps OTHER lines
        "no_punct": good_line + "\n" + "this line just trails off",
        "short_line": good_line + "\nToo short here.",
        "js_line": good_line + "\nEnable javascript to view this content.",
        "policy_line": good_line + "\nSee our privacy policy for details now.",
        # page-rule victims
        "few_sentences": "Only one good sentence lives on this page.",
        "lorem": "\n".join([good_line] * 4) + "\nlorem ipsum dolor",
        "brace": "\n".join([good_line] * 4) + "\nfunction() {",
        "bad_word": "\n".join([good_line] * 4) + "\nbuy viagra now",
    }
    df = spark.createDataFrame(list(docs.items()), "id string, text string")
    r = c4_rules("text")
    rows = {
        row["id"]: row
        for row in df.select(
            "id",
            r["n_lines_kept"].alias("nl"),
            r["cleaned_text"].alias("ct"),
            *[r[k].alias(k) for k in r if k.startswith("rule_") or k == "keep"],
        ).collect()
    }
    assert rows["good"]["keep"] is True and rows["good"]["nl"] == 4
    # line filter drops exactly the offending line, page survives
    for doc in ("no_punct", "short_line", "js_line", "policy_line"):
        assert rows[doc]["nl"] == 1, doc
        assert rows[doc]["ct"] == good_line, doc
    assert rows["few_sentences"]["rule_min_sentences"] is False
    assert rows["lorem"]["rule_no_lorem"] is False
    assert rows["brace"]["rule_no_brace"] is False
    assert rows["bad_word"]["rule_no_bad_words"] is False
    for doc in ("few_sentences", "lorem", "brace", "bad_word"):
        assert rows[doc]["keep"] is False, doc


def test_readability_counts_and_fk_grade(spark):
    """The integer counts match a Python reference and the milligrade
    equals floor(1000 * FK) computed in exact rational arithmetic —
    including empty text, fragments without terminal punctuation, and
    vowel-free tokens."""
    import re
    from fractions import Fraction

    from vectordb_light_spark.functions.text import (
        flesch_kincaid_grade_milli,
        readability_counts,
    )

    texts = [
        "The quick brown fox jumps over the lazy dog. It was easy!",
        "no terminal punctuation here just words",
        "123 456 789",
        "",
        "Rhythm myths. Crwth?!",
        "A. B. C. D. Multiple tiny sentences? Yes!",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    c = readability_counts("text")
    out = df.select(
        "doc_id",
        c["n_words"].alias("w"),
        c["n_sentences"].alias("s"),
        c["n_syllables"].alias("y"),
        flesch_kincaid_grade_milli(
            c["n_words"], c["n_sentences"], c["n_syllables"]
        ).alias("g"),
    ).collect()
    for r in out:
        t = texts[r["doc_id"]]
        w0 = len(re.findall(r"[a-z0-9]+", t.lower()))
        s = max(len(re.findall(r"[.!?]", t)), 1)
        y = len(re.findall(r"[aeiouy]+", t.lower()))
        assert (r["w"], r["s"], r["y"]) == (w0, s, y)
        w = max(w0, 1)
        fk = (
            Fraction(39, 100) * Fraction(w, s)
            + Fraction(118, 10) * Fraction(y, w)
            - Fraction(1559, 100)
        )
        assert r["g"] == (fk * 1000).__floor__()


def test_gopher_rules_custom_stopword_set(spark):
    """r8 (VERDICT item 8): a corpus-adapted stopword set makes the
    Gopher gate non-degenerate on text with no English function words
    — the default set keeps structurally zero such rows."""
    from vectordb_light_spark.functions.text import gopher_rules

    # 60 words, no English stopwords, synthetic-vocab style
    words = " ".join(
        f"token{i % 7} corpus datum" for i in range(20)
    )
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    default_keep = df.select(
        gopher_rules("text")["keep"].alias("k")
    ).head()["k"]
    assert default_keep is False  # rule_stopwords structurally fails

    adapted = gopher_rules("text", stopwords=("token0", "corpus", "datum"))
    row = df.select(
        adapted["rule_stopwords"].alias("s"), adapted["keep"].alias("k")
    ).head()
    assert row["s"] is True and row["k"] is True

    # default arg is the unchanged 8-word set: identical output
    from vectordb_light_spark.functions.text import GOPHER_STOPWORDS

    explicit = df.select(
        gopher_rules("text", GOPHER_STOPWORDS)["keep"].alias("k")
    ).head()["k"]
    assert explicit == default_keep


def test_luhn_valid_matches_reference_implementation(spark):
    """luhn_valid (JVM higher-order fold) vs the textbook Python Luhn
    on real-format test numbers and mutations."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.functions.text import luhn_valid

    def luhn_py(s):
        ds = [int(c) for c in s]
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return len(s) >= 1 and total % 10 == 0

    cases = [
        "4111111111111111",   # classic Visa test number (valid)
        "5500005555555559",   # MC test (valid)
        "378282246310005",    # Amex test, 15 digits (valid)
        "6221260123456789016",  # 19-digit UnionPay shape (valid)
        "4111111111111112",   # one digit off (invalid)
        "1234567890123456",   # invalid
        "79927398713",        # 11 digits, valid checksum (pure check)
        "000000000000",       # 12 zeros (valid checksum)
    ]
    rows = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", luhn_valid("s").alias("ok"))
        .collect()
    )
    for r in rows:
        assert bool(r.ok) == luhn_py(r.s), r.s


def test_scrub_card_numbers_redacts_only_luhn_valid(spark):
    from pyspark.sql import functions as F

    from vectordb_light_spark.functions.text import scrub_pii

    text = (
        "pay 4111 1111 1111 1111 or 5500-0055-5555-5559 or the "
        "19-digit 6221 2601 2345 6789 016 but keep "
        "order 1234567890123456 and id 4111111111111112, the "
        "12-digit Luhn-valid reference 0000-0000-0000, ssn "
        "123-45-6789 stays too"
    )
    out = (
        spark.createDataFrame([(text,)], "t string")
        .select(scrub_pii("t", extended=True).alias("s"))
        .collect()[0]["s"]
    )
    assert "<CARD>" in out
    assert "4111 1111 1111 1111" not in out
    assert "5500-0055-5555-5559" not in out
    # 17-19 digit grouped PANs must redact too (r10 review catch:
    # the old 17-char window let them escape whole)
    assert "6221 2601 2345 6789 016" not in out
    # Luhn-invalid digit runs survive untouched
    assert "1234567890123456" in out
    assert "4111111111111112" in out
    # ...and so do sub-13-digit Luhn-VALID references (the
    # order-id-preservation contract)
    assert "0000-0000-0000" in out
    assert "<SSN>" in out and "123-45-6789" not in out


def test_scrub_card_numbers_adjacent_digit_runs(spark):
    """ADVICE r10: the greedy candidate window absorbs ADJACENT digit
    runs, the merged string fails the 13-19/Luhn verify, and the
    genuine card used to escape unredacted. The separator-aligned
    sub-run rescan must redact the card and keep the neighbors."""
    from vectordb_light_spark.functions.text import scrub_pii

    cases = {
        "pay 4111111111111111 123 now": "pay <CARD> 123 now",
        "code 12 4111111111111111 end": "code 12 <CARD> end",
        "card 4111 1111 1111 1111 12 x": "card <CARD> 12 x",
        # dash-glued neighbors ride the same window
        "ref 4111111111111111-20 done": "ref <CARD>-20 done",
        # no valid sub-run anywhere: window survives verbatim
        "order 1234567890123456 789 x": "order 1234567890123456 789 x",
        # r11 review: a 7+-digit neighbor must not truncate the card
        # out of a char-capped window (candidates are maximal runs)
        "ref 20260816 4111111111111111 ok": "ref 20260816 <CARD> ok",
        "long 123456789012345678901234 4111111111111111 t":
            "long 123456789012345678901234 <CARD> t",
        # multi-card single run: every card redacts
        "two 4111111111111111 5500005555555559 end":
            "two <CARD> <CARD> end",
        # ADVICE r11 high: GROUPED multi-card run where a Luhn-valid
        # straddling decoy range (groups 4-7) is dominated by card 1
        # yet — under the r11 order-free filter — still shadowed
        # card 2 (groups 5-8), leaking it unredacted. The greedy
        # fold judges dominance against CHOSEN ranges only.
        "two 4111 1111 1111 1111 5500 0055 5555 5559 end":
            "two <CARD> <CARD> end",
        # same shape, dash-grouped
        "d 4111-1111-1111-1111-5500-0055-5555-5559 d":
            "d <CARD>-<CARD> d",
    }
    rows = (
        spark.createDataFrame([(t,) for t in cases], "t string")
        .select("t", scrub_pii("t", extended=True).alias("s"))
        .collect()
    )
    for r in rows:
        assert r.s == cases[r.t], (r.t, r.s)


def test_scrub_pii_extended_keeps_default_behavior(spark):
    """extended=False must stay byte-identical to the registered
    entry's behavior (the oracle twin depends on it)."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.functions.text import scrub_pii

    text = "a@b.com +1-555-0142 10.0.0.1 4111111111111111 123-45-6789"
    out = (
        spark.createDataFrame([(text,)], "t string")
        .select(scrub_pii("t").alias("s"))
        .collect()[0]["s"]
    )
    assert out == "<EMAIL> <PHONE> <IP> 4111111111111111 123-45-6789"


def test_scrub_card_numbers_fuzz_vs_python_reference(spark):
    """300-case fuzz of the card pipeline (candidate window regex →
    separator-aligned leftmost-longest Luhn-valid sub-run → stitch)
    against an independent Python reference over a degenerate
    digit/separator alphabet — the shapes where the r10 ADVICE bug
    lived (merged windows, glued runs, dash chains)."""
    import random
    import re

    from vectordb_light_spark.functions.text import scrub_card_numbers

    CARD_PAT = re.compile(r"[0-9][0-9 -]{11,}[0-9]")

    def luhn(d):
        total = 0
        for i, ch in enumerate(reversed(d)):
            v = int(ch)
            if i % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            total += v
        return len(d) >= 1 and total % 10 == 0

    def rewrite(c):
        groups = re.split(r"[ -]", c)
        seps = re.findall(r"[ -]", c)
        k = len(groups)
        valid = [
            (i, j)
            for i in range(1, k + 1)
            for j in range(i, min(i + 18, k) + 1)
            if 13 <= len("".join(groups[i - 1:j])) <= 19
            and luhn("".join(groups[i - 1:j]))
        ]
        from vectordb_light_spark.functions.text import _CARD_MAX_VALID

        valid = valid[:_CARD_MAX_VALID]  # adversarial-soup bound
        # INTENDED-BEHAVIOR spec (ADVICE r11 medium: the reference
        # must not re-implement the engine's conflict policy):
        # greedy leftmost-longest — sort (i ASC, j DESC), keep each
        # range whose start clears the last KEPT range's end, so
        # dominance is judged against chosen ranges only and a
        # dominated decoy can never shadow a later card.
        chosen, last_j = [], 0
        for r in sorted(valid, key=lambda r: (r[0], -r[1])):
            if r[0] > last_j:
                chosen.append(r)
                last_j = r[1]
        if not chosen:
            return c
        out = []
        for t in range(1, k + 1):
            if any(r[0] == t for r in chosen):
                out.append("<CARD>")
            elif not any(r[0] < t <= r[1] for r in chosen):
                out.append(groups[t - 1])
            if t < k and not any(r[0] <= t < r[1] for r in chosen):
                out.append(seps[t - 1])
        return "".join(out)

    def reference(text):
        out, last = [], 0
        for m in CARD_PAT.finditer(text):
            out.append(text[last:m.start()])
            out.append(rewrite(m.group(0)))
            last = m.end()
        out.append(text[last:])
        return "".join(out)

    rng = random.Random(11)
    valid_cards = [
        "4111111111111111", "5500005555555559", "378282246310005",
        "6221260123456789016",
    ]
    cases = []
    for _ in range(300):
        parts = []
        for _ in range(rng.randint(1, 6)):
            roll = rng.random()
            if roll < 0.3:
                card = rng.choice(valid_cards)
                if rng.random() < 0.5:  # random grouping
                    gs, s, sep = [], 0, rng.choice(" -")
                    while s < len(card):
                        g = rng.randint(2, 6)
                        gs.append(card[s:s + g])
                        s += g
                    card = sep.join(gs)
                parts.append(card)
            elif roll < 0.7:
                parts.append(
                    "".join(rng.choice("0123456789")
                            for _ in range(rng.randint(1, 22)))
                )
            else:
                parts.append(rng.choice(["pay", "x", "ref", "end"]))
            parts.append(rng.choice([" ", " ", "-", "  ", ""]))
        cases.append("".join(parts))

    rows = (
        spark.createDataFrame([(c,) for c in cases], "t string")
        .select("t", scrub_card_numbers("t").alias("s"))
        .collect()
    )
    for r in rows:
        assert r.s == reference(r.t), (r.t, r.s, reference(r.t))


def test_scrub_card_numbers_caps_adversarial_valid_ranges(spark):
    """Adversarial digit soup: all-zero 13-digit groups are Luhn-valid,
    so a long run could make the dominance filter quadratic — only the
    first 64 valid ranges redact (both engines spell the same cap),
    bounding the worst row while real documents are unaffected."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.functions.text import (
        count_card_numbers,
        scrub_card_numbers,
    )

    from vectordb_light_spark.functions.text import _CARD_MAX_VALID

    soup = " ".join(["0000000000000"] * (_CARD_MAX_VALID + 6))
    row = (
        spark.createDataFrame([(soup,)], "t string")
        .select(
            scrub_card_numbers("t").alias("s"),
            count_card_numbers("t").alias("n"),
        )
        .head()
    )
    assert row.n == _CARD_MAX_VALID
    assert row.s.count("<CARD>") == _CARD_MAX_VALID
    # the 6 past-the-cap groups survive verbatim
    assert row.s.count("0000000000000") == 6
