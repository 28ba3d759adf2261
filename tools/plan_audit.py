"""Sweep every registered query's physical plan for scale anti-patterns.

For each ``__spark_entry__.queries()`` entry (batch queries only), captures
``explain("formatted")`` and reports:

- ``exchanges``: shuffle count (Exchange hashpartitioning / rangepartitioning)
- ``broadcasts``: broadcast-exchange count (small-side joins — good)
- ``cartesian``: CartesianProduct / BroadcastNestedLoopJoin occurrences
  (scale-killers unless 1-row aggregates by design)
- ``pushed``: whether any parquet scan carries PushedFilters (when the query
  filters at all)
- ``codegen``: WholeStageCodegen span count (JVM-side execution)
- ``python``: Python-eval operators in the plan (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas — expected only for the documented
  kernel operators)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit is always 0 — this is a reporting tool; the pytest plan invariants in
tests/test_plans.py pin the specific must-hold properties.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from elasticsearch_drift_plugin_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    # "formatted" mode: tree lines like "(7) Exchange" / "(3) BroadcastExchange"
    # with "Arguments: hashpartitioning(...)" in the detail section, and
    # per-operator "[codegen id : N]" tags.
    import re

    shuffle = len(re.findall(r"\)\s+Exchange\b", plan))
    bcast = len(re.findall(r"\)\s+BroadcastExchange\b", plan))
    codegen_ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    return {
        "exchanges": shuffle,
        "broadcasts": bcast,
        "cartesian": len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
        "pushed": any(
            seg.split("]")[0].strip() for seg in plan.split("PushedFilters: [")[1:]
        ),
        "codegen": len(codegen_ids),
        "python": len(
            re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|BatchEvalPython",
                plan,
            )
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if df.isStreaming:
                continue
            a = audit(plan_text(df))
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            print(f"{name:28} ERROR {str(ex).splitlines()[0][:100]}")
            continue
        rows.append((name, a))
        flag = ""
        if a["cartesian"]:
            flag += " !CARTESIAN"
        if a["exchanges"] > 6:
            flag += " !MANY-SHUFFLES"
        if a["python"] and not name.startswith(("mm_", "dedup_", "train_", "emb_", "ann_", "stream_")):
            flag += " !PYTHON"
        print(
            f"{name:28} ex={a['exchanges']:2d} bc={a['broadcasts']:2d} "
            f"cart={a['cartesian']} push={int(a['pushed'])} "
            f"wsc={a['codegen']:2d} py={a['python']}{flag}"
        )
    tot = len(rows)
    print(
        f"\n{tot} plans | cartesian: {sum(1 for _, a in rows if a['cartesian'])} "
        f"| >6 shuffles: {sum(1 for _, a in rows if a['exchanges'] > 6)} "
        f"| python-eval: {sum(1 for _, a in rows if a['python'])}"
    )


if __name__ == "__main__":
    main()
