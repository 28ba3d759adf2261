"""Per-query cost decomposition for the optimization rounds: for each
bench query record (construct_sec, exec_best_sec) where construct is the
Python-side DataFrame build (py4j + analysis) and exec is the warm
best-of-N noop-sink wall. Separating the two tells us whether a slow
query needs a better distributed plan (exec-bound) or a cheaper
expression-tree build (construct-bound — the BPE ``_sql_str`` lesson).

Usage: python tools/profile_queries.py [sf_dir] [out_json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench as benchmod
from elasticsearch_drift_plugin_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out = args[1] if len(args) > 1 else "/tmp/query_profile.json"
    names = args[2:] or benchmod.BENCH_QUERIES
    spark = get_spark("spark-drift-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # session warmup
    qs["dedup_exact"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    rows = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # one full untimed warmup (codegen/JIT)
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t_con = None
        t_exe = None
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            t_con = t1 - t0 if t_con is None else min(t_con, t1 - t0)
            t_exe = t2 - t1 if t_exe is None else min(t_exe, t2 - t1)
        rows[name] = {
            "construct": round(t_con, 3),
            "exec": round(t_exe, 3),
            "total": round(t_con + t_exe, 3),
        }
        spark.sparkContext.setJobDescription(None)
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    tot_c = sum(r["construct"] for r in rows.values())
    tot_e = sum(r["exec"] for r in rows.values())
    print(json.dumps({"n": len(rows), "construct_sum": round(tot_c, 2),
                      "exec_sum": round(tot_e, 2)}))


if __name__ == "__main__":
    main()
