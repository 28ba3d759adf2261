"""Time the DuckDB oracle SQL at a given scale factor — the self-defined
single-node baseline recorded in BASELINE.md (the reference publishes no
numbers; DuckDB running the semantically-identical SQL on the same parquet
is the fairest same-machine comparator for the Spark engine's bench).

Usage: python tools/bench_oracle.py [sf_dir] [per_query_timeout_s]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # same headline set


def _run(sf_dir: str, sql: str, q: mp.Queue) -> None:
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    t0 = time.time()
    con.execute(sql).fetchall()
    q.put(time.time() - t0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    timings: dict[str, float | str] = {}
    for name in BENCH_QUERIES:
        if name not in oracles:
            continue
        q: mp.Queue = mp.Queue()
        proc = mp.Process(target=_run, args=(sf_dir, oracles[name], q))
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            timings[name] = f">{timeout:g}"
        else:
            timings[name] = round(q.get(), 3)
    total = sum(v for v in timings.values() if isinstance(v, float))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb oracle on the same queries, total wall sec (finished only)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
