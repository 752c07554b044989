"""Spark-free oracle guards: every registered DuckDB oracle must
parse and execute against the sf0.001 tables (catches SQL syntax /
column regressions in seconds, without a Spark session), and must
not emit the exotic types the driver's hasher renders differently
from Spark (HUGEINT/UBIGINT/DECIMAL — the r1 hash-fail class)."""

from __future__ import annotations

import os

import duckdb
import pytest

from vectordb_light_spark.queries import ORACLES, QUERIES
from vectordb_light_spark.session import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_key_is_a_registered_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_executes_without_exotic_types(con, name):
    rel = con.sql(ORACLES[name])
    exotic = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t) for b in ("HUGEINT", "UBIGINT", "UINTEGER", "DECIMAL"))
    }
    assert not exotic, f"CAST these columns: {exotic}"
    con.execute(ORACLES[name]).fetchall()  # must actually run


# ---------------------------------------------------------------------------
# poly31 oracle-twin: the DuckDB rolling-hash fragment must equal the
# numpy implementation character-for-character (three oracles build
# on it: minhash candidates, simhash near-dups, duplicate clusters)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="'"),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_shingle_hash_cte_matches_numpy(text, n):
    from vectordb_light_spark.operators.dedup import _np_shingle_hashes
    from vectordb_light_spark.queries import _shingle_hash_cte

    c = duckdb.connect()
    c.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.execute("INSERT INTO documents VALUES (1, ?)", [text])
    # take the canonical string from the CTE itself (canonicalization
    # parity is covered end-to-end by the oracle entries; this
    # property pins the HASH RECURRENCE against the numpy reference)
    canon_rows = c.execute(
        f"WITH {_shingle_hash_cte(n)} SELECT t FROM c"
    ).fetchall()
    canon = canon_rows[0][0] if canon_rows else ""
    want = [int(x) for x in _np_shingle_hashes(canon, n, finalize=False)]
    rows = c.execute(f"WITH {_shingle_hash_cte(n)} SELECT hs FROM h").fetchall()
    got = [int(x) for x in rows[0][0]] if rows else []
    assert got == want


def test_registry_iteration_is_globally_rank_ordered():
    """Guards the apply-at-module-end fix: every registration —
    including ones defined BELOW the order list — must participate in
    the fastest-first sort, or a sequential grading budget starves
    the late-defined entries."""
    from vectordb_light_spark.queries import _REGISTRY_ORDER, QUERIES

    rank = {n: i for i, n in enumerate(_REGISTRY_ORDER)}
    tail = len(_REGISTRY_ORDER)
    ranks = [rank.get(n, tail) for n in QUERIES]
    assert ranks == sorted(ranks)


def test_registry_order_policy_staleness_first():
    """VERDICT r5 item 1: the grading order must front-load staleness.
    Recomputes the order from the checked-in maps and asserts
    (a) pre-oracle-stale entries lead, (b) new/changed-this-round
    next, (c) the rest ascend by last-graded round, cost-ascending
    within each block."""
    from vectordb_light_spark import queries as q

    order = q._REGISTRY_ORDER
    assert order == q._compute_registry_order()
    assert len(order) == len(set(order))
    # every registered query participates
    assert set(order) == set(q.QUERIES)

    # the policy inputs must name real entries — a typo in the
    # checked-in sets would silently drop its priority effect
    assert q._PRE_ORACLE_STALE <= set(q.QUERIES)
    assert q._CHANGED_THIS_ROUND <= set(q.QUERIES)
    assert set(q._LAST_GRADED) <= set(q.QUERIES)

    n_a = len(q._PRE_ORACLE_STALE)
    assert set(order[:n_a]) == set(q._PRE_ORACLE_STALE)

    changed = {
        n for n in order
        if n not in q._PRE_ORACLE_STALE
        and (n in q._CHANGED_THIS_ROUND or n not in q._LAST_GRADED)
    }
    assert set(order[n_a:n_a + len(changed)]) == changed

    rest = order[n_a + len(changed):]
    rounds = [q._LAST_GRADED[n] for n in rest]
    assert rounds == sorted(rounds), "class (c) must ascend by last-graded round"
    for rnd in set(rounds):
        block = [n for n in rest if q._LAST_GRADED[n] == rnd]
        costs = [q._SOLO_COST_S.get(n, 1.0) for n in block]
        assert costs == sorted(costs), f"round-{rnd} block must be cost-ascending"


def test_changed_entries_carry_no_unpinned_tokenization_sites():
    """COVERAGE.md protocol rule 2 enforced at CI time: an entry
    spending a grading slot this round must ALSO pin its latent
    cross-engine tokenization sites (bare \\s, 1-arg trim) — the
    migration rides slots already being paid. The one documented
    exception is a site living in a CTE shared with out-of-cut
    entries (pinning it would consume slots the cut doesn't have);
    those entries are declared PARTIALLY_PINNED in the adversarial
    harness, which reports them as holds-on-margin."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from adversarial_oracle_check import PARTIALLY_PINNED
    from audit_cross_engine_tokens import audit

    from vectordb_light_spark import queries as q

    flagged = set(audit())
    violations = (
        q._CHANGED_THIS_ROUND & flagged - set(PARTIALLY_PINNED)
    )
    assert not violations, (
        f"changed-this-round entries with unpinned oracle sites: "
        f"{sorted(violations)} — pin them (tools/audit_cross_engine_"
        f"tokens.py prints the rewrites) or declare them "
        f"PARTIALLY_PINNED with the shared-CTE justification"
    )
