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
