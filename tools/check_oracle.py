"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, then compares row count, schema shape,
and an order-insensitive value hash. Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from vectordb_light_spark.session import TESTDATA_TABLES, get_spark  # noqa: E402


def _canon(v):
    """Canonicalize a cell for hashing (mirror driver: sort columns by
    name, stringify values)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # normalize -0.0 and represent with repr of rounded value
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    import functools
    global print
    print = functools.partial(print, flush=True)
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, {spark_s:.1f}s (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            # Guard: DuckDB widens integer SUMs to HUGEINT (int128) and
            # may emit DECIMAL — duckdb's fetchall() hides both behind
            # plain Python ints, but the DRIVER's hasher renders them
            # unlike Spark's BIGINT (r1: the only 3 driver hash-FAILs
            # were exactly the 3 oracles with a HUGEINT column). Fail
            # loudly here so it never reaches the driver.
            exotic = {
                c: str(t)
                for c, t in zip(rel.columns, rel.types)
                if any(
                    b in str(t)
                    for b in ("HUGEINT", "UBIGINT", "UINTEGER", "DECIMAL")
                )
            }
            if exotic:
                print(f"FAIL {name}: exotic oracle types (CAST them): {exotic}")
                failures += 1
                continue
            t1 = time.time()
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            oracle_s = time.time() - t1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols)
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "PASS" if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"FAIL {name}: rows {len(srows)} vs {len(orows)}, "
                f"schema {'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'}, "
                f"hash {sh} vs {oh}"
            )
            if ok_count and ok_schema:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(_canon(r[i]) for i in order) for r in srows)
                oset = sorted("|".join(_canon(r[i]) for i in oorder) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"  spark:  {a}\n  oracle: {b}")
                        break
        else:
            print(
                f"PASS {name}: {len(srows)} rows, "
                f"{spark_s:.1f}s spark + {oracle_s:.1f}s oracle"
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
