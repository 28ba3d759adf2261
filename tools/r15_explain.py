"""Dump ``.explain('formatted')`` for named queries into plans/r15/.

Usage: python tools/r15_explain.py <tag> <query> [<query> ...]

Writes ``plans/r15/<query>_<tag>.txt`` for each query (tag is usually
``before`` or ``after``). Construction only — no jobs beyond what the
query builder itself runs eagerly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from elasticsearch_drift_plugin_spark.plans import explain_str
from elasticsearch_drift_plugin_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("spark-drift-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(path)


if __name__ == "__main__":
    main()
