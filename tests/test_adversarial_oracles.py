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

from adversarial_oracle_check import make_docs  # noqa: E402
from check_oracle import table_hash  # noqa: E402

#: Cheap pinned entries; the full 14-entry sweep (incl. minhash, BPE
#: learning, the curate chain) is tools/adversarial_oracle_check.py.
SUBSET = [
    "dd_exact_dedup",
    "ts_vocab_topk",
    "ts_gopher_filter",
    "ts_repetition_filter",
    "pipe_token_budget_mix",
    "pipe_bpe_encode",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adversarial_docs")
    rows = make_docs(120)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT parquet)")
    con.close()
    return str(tmp)


@pytest.mark.parametrize("name", SUBSET)
def test_pinned_entry_survives_adversarial_whitespace(
    spark, adversarial_dir, name
):
    from vectordb_light_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, adversarial_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_dir}/documents.parquet'"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()

    assert len(srows) == len(orows), (name, len(srows), len(orows))
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in ocols
    )
    assert table_hash(scols, srows) == table_hash(ocols, orows), name
