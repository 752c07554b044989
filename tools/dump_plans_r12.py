"""Dump `explain('formatted')` for named entries to plans/r12/.

    python tools/dump_plans_r12.py before|after entry [entry ...]

Loop-driven entries (bpe_merges, ann_recall_contract) return a
driver-assembled frame whose plan is trivial; for those the file
records the trivial plan plus a note — their evidence is the job
breakdown in OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import sys
import os
os.environ['SPARK_GRAFT_EXPLAIN_FULL'] = '1'  # show full child plans under ordered_once
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_light_spark.queries import QUERIES  # noqa: E402
from vectordb_light_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.1"
    for name in names:
        df = QUERIES[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
