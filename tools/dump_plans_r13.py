"""Dump `explain('formatted')` for named entries to plans/r13/.

    python tools/dump_plans_r13.py before|after entry [entry ...]
    OUT_DIR=<dir> python tools/dump_plans_r13.py ...   # e.g. a base-tree run

r13 transparency fix (VERDICT r12 item 6 / ADVICE r12): TWO forms per
entry when they differ —

- ``<name>_<tag>.txt``: the EXECUTED form — what the timing runs plan,
  including ordered_once's lineage cut (explain shows the checkpoint
  as ``Scan ExistingRDD``; the full child executed exactly once into
  it).
- ``<name>_<tag>_fullchild.txt``: the SPARK_GRAFT_EXPLAIN_FULL=1 form —
  the same plan with the checkpoint bypassed so the child subtree is
  readable. This form is NEVER what timing runs execute; it exists so
  plan evidence for the subtree is auditable.

Loop-driven entries (bpe_merges, ann_recall_contract, CC entries'
round loops) return a driver-assembled or checkpoint-rooted frame
whose dumped plan is partly trivial; their evidence is the job
breakdown in OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_light_spark.queries import QUERIES  # noqa: E402
from vectordb_light_spark.session import get_spark  # noqa: E402


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def normalized(txt: str) -> str:
    """Plan text with run-varying ids stripped (expr ids, plan ids,
    RDD numbers) so 'the two forms differ' means STRUCTURE, not that
    two builds allocated different ids."""
    import re

    txt = re.sub(r"#\d+", "#N", txt)
    txt = re.sub(r"plan_id=\d+", "plan_id=N", txt)
    txt = re.sub(r"RDD\[\d+\]", "RDD[N]", txt)
    txt = re.sub(r"\[id=#N\]", "", txt)
    return txt


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(
        os.environ.get(
            "OUT_DIR", Path(__file__).resolve().parent.parent / "plans" / "r13"
        )
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.1"
    for name in names:
        os.environ.pop("SPARK_GRAFT_EXPLAIN_FULL", None)
        executed = explain(QUERIES[name](spark, sf))
        (out_dir / f"{name}_{tag}.txt").write_text(
            "-- EXECUTED form (what timing runs plan; ordered_once's\n"
            "-- checkpoint appears as Scan ExistingRDD)\n" + executed
        )
        os.environ["SPARK_GRAFT_EXPLAIN_FULL"] = "1"
        full = explain(QUERIES[name](spark, sf))
        os.environ.pop("SPARK_GRAFT_EXPLAIN_FULL", None)
        if normalized(full) != normalized(executed):
            (out_dir / f"{name}_{tag}_fullchild.txt").write_text(
                "-- TRANSPARENCY form (SPARK_GRAFT_EXPLAIN_FULL=1:\n"
                "-- ordered_once checkpoint bypassed so the child subtree\n"
                "-- is readable; timing runs NEVER execute this shape —\n"
                "-- the executed form materializes the child once)\n" + full
            )
            print(f"wrote {name}_{tag}.txt + _fullchild.txt")
        else:
            print(f"wrote {name}_{tag}.txt (forms identical)")


if __name__ == "__main__":
    main()
