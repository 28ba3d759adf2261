"""Round-15 (optimization round 2) regressions: the BPE small-vocab
driver routing guard, the bench memo-clearing hook, and the psum
projection-boundary gating.
"""

from __future__ import annotations

import importlib

from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark import clear_result_memos
from elasticsearch_drift_plugin_spark.operators.corpus import (
    bpe_train,
    bpe_train_distributed,
)

_psum_mod = importlib.import_module(
    "elasticsearch_drift_plugin_spark.operators.proportional_sum"
)


# --- BPE small-vocab driver routing (VERDICT r14 item 6) ---------------

def _bpe_docs(spark):
    rows = [
        ("low " * 5).strip(),
        ("lower " * 2).strip(),
        ("newest " * 6).strip(),
        ("widest " * 3).strip(),
    ]
    return spark.createDataFrame([(r,) for r in rows], "text string")


def test_bpe_driver_route_matches_distributed(spark):
    """A small vocab routes to the driver kernel (default guard); forcing
    max_driver_vocab=0 keeps the executor-resident loop. Both must emit
    the identical merge table — and match the plain driver backend."""
    docs = _bpe_docs(spark)
    routed = [
        tuple(r) for r in bpe_train_distributed(docs, n_merges=10).collect()
    ]
    forced = [
        tuple(r)
        for r in bpe_train_distributed(
            docs, n_merges=10, max_driver_vocab=0
        ).collect()
    ]
    driver = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    assert routed == forced == driver
    assert [(m[1], m[2]) for m in routed[:3]] == [
        ("e", "s"), ("es", "t"), ("est", "</w>")
    ]


def test_bpe_guard_env_read_at_call_time(spark, monkeypatch):
    """ADVICE r14 item 4 contract: the env override must be honored on the
    call, not frozen at import."""
    docs = _bpe_docs(spark)
    monkeypatch.setenv("SPARK_GRAFT_BPE_DRIVER_VOCAB", "0")
    forced = [
        tuple(r) for r in bpe_train_distributed(docs, n_merges=6).collect()
    ]
    monkeypatch.setenv("SPARK_GRAFT_BPE_DRIVER_VOCAB", "100000")
    routed = [
        tuple(r) for r in bpe_train_distributed(docs, n_merges=6).collect()
    ]
    assert forced == routed


# --- bench memo clearing (VERDICT r14 item 2) --------------------------

def test_clear_result_memos_empties_every_memo(spark):
    corpus = importlib.import_module(
        "elasticsearch_drift_plugin_spark.operators.corpus"
    )
    dedup = importlib.import_module(
        "elasticsearch_drift_plugin_spark.operators.dedup"
    )
    similarity = importlib.import_module(
        "elasticsearch_drift_plugin_spark.operators.similarity"
    )
    # populate two of them through their public paths
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    similarity._seed_centroids(emb, 4)
    df = spark.createDataFrame(
        [(0, 1000, 1.0)], "start_ms long, end_ms long, value double"
    )
    _psum_mod._estimated_fanout(df, "start_ms", "end_ms", 100)
    assert similarity._SEED_MEMO and _psum_mod._WIDTH_MEMO
    clear_result_memos()
    for memo in (
        similarity._SEED_MEMO,
        similarity._QVEC_MEMO,
        _psum_mod._WIDTH_MEMO,
        dedup._HOT_BLOCK_MEMO,
        corpus._CLF_WEIGHTS_MEMO,
        corpus._DSIR_LAM_MEMO,
    ):
        assert not memo


# --- psum projection boundary gating (VERDICT r14 item 1) --------------

def test_psum_boundary_only_on_tz_paths(spark):
    """The pinned __ps_cs/__ps_ce projection exists exactly on the
    zone-shifted grids; plain UTC grids keep the r13 inline shape."""
    df = spark.createDataFrame(
        [(0, 250, 10.0)], "start_ms long, end_ms long, value double"
    )
    from elasticsearch_drift_plugin_spark import proportional_sum

    utc = proportional_sum(df, "start_ms", "end_ms", "value", interval=100)
    tz = proportional_sum(
        df, "start_ms", "end_ms", "value", interval=100,
        time_zone="America/New_York",
    )
    utc_plan = utc._jdf.queryExecution().executedPlan().toString()
    tz_plan = tz._jdf.queryExecution().executedPlan().toString()
    assert "__ps_cs" not in utc_plan
    assert "__ps_cs" in tz_plan
    # identical totals either way (values cannot depend on the boundary)
    assert [
        (r["key"], r["doc_count"], r["value"]) for r in utc.collect()
    ] == [(0, 1, 4.0), (100, 1, 4.0), (200, 1, 2.0)]
