"""End-to-end Spark-vs-DuckDB parity on whitespace-salted text.

The driver corpus is ASCII, so the cross-engine tokenization pins
(r8) are invisible there by construction. This suite re-runs a cheap
subset of tools/adversarial_oracle_check.py as pytest: a synthetic
``documents`` table salted with every divergence character, the real
registered query on Spark, the real oracle on DuckDB, the driver's
order-insensitive hash compare. ``pipe_bpe_encode`` is in the subset
because this harness is what caught its 1-arg-ltrim NBSP bug (the
static audit regex could not see through the nested replace chain).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from adversarial_oracle_check import (  # noqa: E402
    compare_entry,
    make_docs,
    write_docs_parquet,
    write_embeddings_parquet,
)

#: Cheap pinned entries; the full 32-entry sweep (incl. minhash, BPE
#: learning, the curate chain) is tools/adversarial_oracle_check.py.
#: ts_gopher_filter + ts_lang_id carry the r9 Java-\b pin (the
#: case-salt catch); ts_quality_score the r9 2-arg-trim batch.
SUBSET = [
    "dd_exact_dedup",
    "ts_vocab_topk",
    "ts_gopher_filter",
    "ts_repetition_filter",
    "pipe_token_budget_mix",
    "pipe_bpe_encode",
    "ts_lang_id",
    "ts_quality_score",
    # embeddings-reading entries (the module fixture fakes the
    # embeddings table, late r9): the chunks formatter's whitespace
    # chain and the full search path run on salted text per-commit
    "vq_chunks_only",
    "vq_topk_cosine",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adversarial_docs")
    write_docs_parquet(make_docs(120), str(tmp))
    write_embeddings_parquet(120, str(tmp))
    return str(tmp)


@pytest.mark.parametrize("name", SUBSET)
def test_pinned_entry_survives_adversarial_whitespace(
    spark, adversarial_dir, name
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_dir}/documents.parquet'"
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adversarial_dir}/embeddings.parquet'"
    )
    why = compare_entry(spark, con, name, adversarial_dir)
    con.close()
    assert not why, (name, why)


def test_lower_cross_engine_boundary_is_the_known_14(spark):
    """41 oracles lower() their text, so the exact Spark-vs-DuckDB
    case-mapping boundary must be KNOWN, not assumed. Exhaustive BMP
    sweep (r8 measurement): the engines diverge on exactly 14
    codepoints — U+0130 İ (Spark applies the full Unicode lowercase
    i + U+0307, DuckDB's simple mapping gives bare i) plus 13
    recently-encoded cased letters (Glagolitic/Latin-Ext additions)
    where the JVM's Unicode tables are newer than utf8proc's. None
    can appear in the driver corpus; an İ-bearing corpus needs the
    replace-then-lower oracle pin documented in
    tools/audit_cross_engine_tokens.py. If a container upgrade moves
    either engine's Unicode tables, this test is the tripwire."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    chars = [
        chr(c)
        for c in range(0x20, 0x10000)
        if not 0xD800 <= c <= 0xDFFF
    ]
    pdf = pd.DataFrame({"i": range(len(chars)), "t": chars})
    srows = dict(
        (r["i"], r["lo"])
        for r in spark.createDataFrame(pdf)
        .select("i", F.lower("t").alias("lo"))
        .collect()
    )
    con = duckdb.connect()
    con.register("chars", pdf)
    drows = dict(con.execute("SELECT i, lower(t) FROM chars").fetchall())
    con.close()
    divergent = {
        ord(chars[i]) for i in range(len(chars)) if srows[i] != drows[i]
    }
    known = {
        0x0130,  # İ — the one FULL-mapping expansion (SpecialCasing)
        # JVM-newer-than-utf8proc cased letters (Unicode 12-16):
        0x1C89, 0x2C2F, 0xA7C0, 0xA7C7, 0xA7C9, 0xA7CB, 0xA7CC,
        0xA7D0, 0xA7D6, 0xA7D8, 0xA7DA, 0xA7DC, 0xA7F5,
    }
    assert divergent == known, (
        f"lower() boundary moved: new {sorted(hex(c) for c in divergent - known)}, "
        f"gone {sorted(hex(c) for c in known - divergent)}"
    )
