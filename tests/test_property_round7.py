"""Round-7 cross-engine property evidence: the three newly oracle-paired
deterministic fixpoints hold on RANDOM inputs, not just the registered
fixture — Spark operator vs the DuckDB twin executed in-process."""

import random

import duckdb
import pandas as pd


def _duck(sql: str, docs: pd.DataFrame | None = None):
    con = duckdb.connect()
    if docs is not None:
        con.register("documents", docs)
    return con.sql(sql).fetchall()


def test_pack_bfd_oracle_matches_operator_on_random_corpora(spark):
    from elasticsearch_drift_plugin_spark.operators.training import (
        pack_sequences_bfd,
        pack_sequences_bfd_sql,
    )

    rng = random.Random(7)
    for trial in range(3):
        cap = rng.choice([32, 64, 128])
        rows = [
            (i, f"src{rng.randrange(3)}", "w " * rng.randint(1, cap) + "w")
            for i in range(rng.randint(20, 120))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = [tuple(r) for r in pack_sequences_bfd(docs, capacity=cap).collect()]
        pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        want = [tuple(r) for r in _duck(pack_sequences_bfd_sql(capacity=cap), pdf)]
        assert got == want, f"trial {trial}: BFD fold diverged"


def test_pagerank_oracle_matches_operator_on_random_graphs(spark):
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.operators.components import (
        pagerank,
        pagerank_oracle_sql,
    )

    rng = random.Random(13)
    for trial in range(3):
        n = rng.randint(6, 25)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        df = spark.createDataFrame(edges, "u long, v long")
        got = [tuple(r) for r in pagerank(df).collect()]
        vals = " UNION ALL ".join(
            f"SELECT CAST({a} AS BIGINT) AS doc_a, CAST({b} AS BIGINT) AS doc_b"
            for a, b in edges
        )
        want = [tuple(r) for r in _duck(pagerank_oracle_sql(vals))]
        assert got == want, f"trial {trial}: pagerank fixpoint diverged"


def test_bpe_train_oracle_matches_operator_on_random_corpus(spark):
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        bpe_train,
        bpe_train_sql,
    )

    rng = random.Random(21)
    words = [
        "".join(rng.choices("abcde", k=rng.randint(2, 7))) for _ in range(400)
    ]
    rows = [(i, " ".join(words[i * 50:(i + 1) * 50])) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=15).collect()]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    want = [tuple(r) for r in _duck(bpe_train_sql(n_merges=15), pdf)]
    assert got == want and len(got) == 15
