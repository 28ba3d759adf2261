"""Round-9 cross-engine property evidence: the in-engine trained quality
classifier (integer hard-sigmoid logistic regression) replays
bit-identically in DuckDB on RANDOM corpora, actually separates a
separable corpus, and enforces its bounded-training-sample contract —
plus the clf-gated curate pipeline composition against its twin."""

import random

import duckdb
import pandas as pd
import pytest


def _duck(sql: str, docs: pd.DataFrame | None = None):
    con = duckdb.connect()
    if docs is not None:
        con.register("documents", docs)
    return con.sql(sql).fetchall()


def _random_docs(rng: random.Random, n_docs: int):
    """Two tilted-vocabulary domains; src0 is the classifier's positive
    label (the test_property_round8 DSIR corpus shape)."""
    tgt_vocab = ["alpha", "beta", "gamma", "delta", "shared"]
    raw_vocab = ["omega", "psi", "chi", "phi", "shared"]
    rows = []
    for i in range(n_docs):
        src = f"src{rng.randrange(3)}"
        vocab = tgt_vocab if src == "src0" else raw_vocab
        pool = vocab + (tgt_vocab if rng.random() < 0.3 else [])
        words = [rng.choice(pool) for _ in range(rng.randint(1, 12))]
        rows.append((i, src, " ".join(words)))
    return rows


def test_quality_clf_oracle_matches_operator_on_random_corpora(spark):
    """The whole 8-iteration training fixpoint — margins, hard-sigmoid
    residuals, integer gradient steps, final scores — is bit-identical
    across engines on random corpora, not just the registered fixture."""
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        quality_clf,
        quality_clf_sql,
    )

    rng = random.Random(9)
    for trial in range(3):
        rows = _random_docs(rng, rng.randint(20, 80))
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = [tuple(r) for r in quality_clf(docs).collect()]
        pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        want = [tuple(r) for r in _duck(quality_clf_sql(), pdf)]
        assert got == want, f"trial {trial}: quality_clf diverged"


def test_quality_clf_separates_separable_domains(spark):
    """Defining property of the gate: on a corpus whose target domain has
    a disjoint-enough vocabulary, the mean trained score of positives
    exceeds the mean score of negatives."""
    from elasticsearch_drift_plugin_spark.operators.corpus import quality_clf

    rng = random.Random(99)
    rows = _random_docs(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = quality_clf(docs).groupBy("y").avg("clf_q").collect()
    means = {int(r["y"]): float(r["avg(clf_q)"]) for r in out}
    assert means[1] > means[0], f"no separation: {means}"


def test_quality_clf_enforces_bounded_training_sample(spark):
    """The ≲1e5-doc full-batch contract is a guard, not a docstring
    (VERDICT r8 item 2) — mirrors dedup.lsh_recall_eval's refusal."""
    from elasticsearch_drift_plugin_spark.operators.corpus import quality_clf

    rows = _random_docs(random.Random(7), 30)
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="max_train_docs"):
        quality_clf(docs, max_train_docs=10)


def test_curate_clf_oracle_matches_operator_on_random_corpus(spark):
    """The composed chain (dedup → trained gate → mix → pack) replays in
    DuckDB: same survivors, same packing."""
    from elasticsearch_drift_plugin_spark.operators.training import (
        curate_pipeline_clf,
        curate_pipeline_clf_sql,
    )

    rng = random.Random(42)
    rows = _random_docs(rng, 70)
    # inject exact duplicates so the dedup stage has work to do
    rows += [(100 + i, src, text) for i, (_, src, text) in enumerate(rows[:5])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [tuple(r) for r in curate_pipeline_clf(
        docs, clf_min_q=350_000, target_docs=40, capacity=64
    ).collect()]
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    want = [tuple(r) for r in _duck(
        curate_pipeline_clf_sql(clf_min_q=350_000, target_docs=40, capacity=64),
        pdf,
    )]
    assert got == want
