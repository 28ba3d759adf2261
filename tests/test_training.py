"""Contract tests for training-set assembly (operators/training.py)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.operators import training as tr


def test_pack_next_fit_offsets_and_overflow(spark):
    # capacity 10; doc lengths in id order: 4, 5, 3, 25, 2
    # -> seq0: [4@0, 5@4], seq1: [3@0], seq2: [25@0 oversized alone], seq3: [2@0]
    rows = [
        ("s", 1, "a b c d"),
        ("s", 2, "a b c d e"),
        ("s", 3, "a b c"),
        ("s", 4, " ".join(["w"] * 25)),
        ("s", 5, "a b"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["doc_id"]: r for r in tr.pack_sequences(df, capacity=10).collect()}
    assert (out[1]["seq_no"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_no"], out[2]["seq_offset"]) == (0, 4)
    assert (out[3]["seq_no"], out[3]["seq_offset"]) == (1, 0)
    assert (out[4]["seq_no"], out[4]["seq_offset"]) == (2, 0)  # oversized, own seq
    assert (out[5]["seq_no"], out[5]["seq_offset"]) == (3, 0)


def test_pack_groups_are_independent(spark):
    rows = [("a", 1, "x y z"), ("b", 2, "x y z")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = tr.pack_sequences(df, capacity=4).collect()
    assert all(r["seq_no"] == 0 and r["seq_offset"] == 0 for r in out)


def test_mix_rare_domain_kept_whole_head_downsampled(spark):
    rows = [("head", i) for i in range(400)] + [("rare", 1000 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "source string, doc_id long").withColumn(
        "text", F.lit("x")
    )
    rates = {r["group"]: r for r in tr.mix_rates(df, target_docs=100).collect()}
    assert rates["rare"]["thr_q"] == tr.QUANT  # keep-all (rate capped at 1)
    assert rates["head"]["thr_q"] < tr.QUANT // 2  # strongly downsampled
    kept = tr.domain_mix(df, target_docs=100).collect()
    # determinism: same call, same rows
    kept2 = tr.domain_mix(df, target_docs=100).collect()
    assert [r["doc_id"] for r in kept] == [r["doc_id"] for r in kept2]
    assert {r["group"] for r in kept} >= {"rare"}


def test_mix_sample_is_monotone_in_target(spark):
    rows = [("s", i) for i in range(300)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    small = {r["doc_id"] for r in tr.domain_mix(df, target_docs=50).collect()}
    big = {r["doc_id"] for r in tr.domain_mix(df, target_docs=150).collect()}
    assert small <= big  # hash-threshold sampling nests


def test_chunk_documents_overlap_and_tail(spark):
    # 10 tokens, chunk 4, stride 3 -> starts 0,3,6,9: lengths 4,4,4,1
    text = " ".join(str(i) for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = tr.chunk_documents(df, chunk_tokens=4, stride=3).collect()
    assert [(r["chunk_no"], r["n_tokens"]) for r in out] == [
        (0, 4), (1, 4), (2, 4), (3, 1)
    ]
    assert out[1]["chunk_text"] == "3 4 5 6"  # overlaps chunk 0 by one token
    assert out[3]["chunk_text"] == "9"


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = tr.chunk_documents(df, chunk_tokens=64, stride=48).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 2


def test_pack_sharded_partitions_and_degenerates_to_plain(spark):
    """n_shards=1 must reproduce the unsharded packing exactly (plus the
    constant shard column); with more shards every doc appears once and
    each (group, shard) stream independently satisfies next-fit."""
    rows = [
        ("s", i, " ".join(["w"] * (3 + i % 7))) for i in range(1, 41)
    ] + [("t", 100 + i, "a b c") for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    plain = [tuple(r) for r in tr.pack_sequences(df, capacity=16).collect()]
    one = [
        (r["group"], r["doc_id"], r["n_tokens"], r["seq_no"], r["seq_offset"])
        for r in tr.pack_sequences_sharded(df, capacity=16, n_shards=1).collect()
    ]
    assert one == plain
    out = tr.pack_sequences_sharded(df, capacity=16, n_shards=4).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(i for _, i, _ in rows)
    streams = {}
    for r in sorted(out, key=lambda r: (r["group"], r["shard"], r["doc_id"])):
        streams.setdefault((r["group"], r["shard"]), []).append(r)
    for rs in streams.values():
        used, seq = 0, 0
        for i, r in enumerate(rs):
            if i == 0:
                assert (r["seq_no"], r["seq_offset"]) == (0, 0)
            elif used + r["n_tokens"] > 16:
                assert r["seq_no"] == seq + 1 and r["seq_offset"] == 0
            else:
                assert r["seq_no"] == seq and r["seq_offset"] == used
            if r["seq_no"] != seq:
                seq, used = r["seq_no"], 0
            used += r["n_tokens"]


def test_epoch_plan_shards_and_cumulative_tokens(spark):
    """Manifest invariants: shard sizes respect seqs_per_shard, token
    totals reconcile with the corpus, and cum_tokens is the running sum."""
    from elasticsearch_drift_plugin_spark.operators.training import epoch_plan

    docs = spark.createDataFrame(
        [("a", i, " ".join(["w"] * (5 + i % 7))) for i in range(30)]
        + [("b", 100 + i, " ".join(["w"] * 10)) for i in range(10)],
        "source string, doc_id long, text string",
    )
    out = epoch_plan(docs, capacity=20, seqs_per_shard=2).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["group"], []).append(r)
    for g, rows in by_g.items():
        rows.sort(key=lambda r: r["shard"])
        assert [r["shard"] for r in rows] == list(range(len(rows)))
        assert all(r["n_seqs"] <= 2 for r in rows)
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
    total_tokens = sum(r["n_tokens"] for r in out)
    want = sum(5 + i % 7 for i in range(30)) + 100
    assert total_tokens == want


def test_mix_temperature_flattening(spark):
    from elasticsearch_drift_plugin_spark.operators.training import mix_rates

    rows = [(i, "head") for i in range(90)] + [(1000 + i, "tail") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def thr(temp):
        return {
            r.group: r.thr_q
            for r in mix_rates(df, target_docs=50, temperature=temp).collect()
        }

    t1, t2, t4 = thr(1.0), thr(2.0), thr(4.0)
    # τ=1 is proportional sampling: every domain keeps the same fraction
    assert t1["head"] == t1["tail"] == 500_000
    # higher τ flattens harder: the tail's keep-rate grows until the
    # keep-all cap (LEAST(QUANT, …)), the head's strictly shrinks
    assert t1["tail"] < t2["tail"] <= t4["tail"] == 1_000_000
    assert t1["head"] > t2["head"] > t4["head"]
    with pytest.raises(ValueError, match="temperature"):
        mix_rates(df, target_docs=50, temperature=0.0)


def test_mix_tokens_budget_expectation(spark):
    from elasticsearch_drift_plugin_spark.operators.training import (
        mix_rates_tokens,
    )

    rows = [("head", i, " ".join(["w"] * 20)) for i in range(50)] + [
        ("tail", 1000 + i, " ".join(["w"] * 5)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r.group: r for r in mix_rates_tokens(df, target_tokens=300).collect()}
    assert out["head"].n_tokens == 1000 and out["tail"].n_tokens == 20
    # tail is tiny -> keep-all; head downsampled toward the token budget
    assert out["tail"].thr_q == tr.QUANT
    assert 0 < out["head"].thr_q < tr.QUANT
    # expected kept tokens ≈ budget: sum(T_i * thr_i) within quantization
    exp = sum(out[g].n_tokens * out[g].thr_q / tr.QUANT for g in out)
    assert 250 <= exp <= 310
    with pytest.raises(ValueError, match="temperature"):
        mix_rates_tokens(df, target_tokens=300, temperature=-1)


def test_span_corruption_plan_and_text_agree(spark):
    """r7: the T5 span-corruption PLAN (oracle-gated counts + mask-set
    fingerprint) and the materialized <extra_id_k> text pair derive from
    the SAME md5 rule — n_masked/n_spans recomputed from the text must
    match the plan exactly, and the target format is the T5 contract
    (sentinel-delimited spans, trailing final sentinel)."""
    import re

    from elasticsearch_drift_plugin_spark.operators.training import (
        span_corruption,
        span_corruption_text,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(5 + (i * 13) % 60)))
         for i in range(30)],
        "doc_id long, text string",
    )
    plan = {r.doc_id: r for r in span_corruption(docs).collect()}
    text = {r.doc_id: r for r in span_corruption_text(docs).collect()}
    assert set(plan) == set(text) == set(range(30))
    for d in range(30):
        p, t = plan[d], text[d]
        sent = re.compile(r"<extra_id_\d+>")
        in_toks = t.inputs.split(" ")
        tgt_toks = t.targets.split(" ")
        # masked count from the text: target tokens that are not sentinels
        masked_from_text = sum(1 for w in tgt_toks if not sent.fullmatch(w))
        spans_from_text = sum(1 for w in in_toks if sent.fullmatch(w))
        kept = sum(1 for w in in_toks if not sent.fullmatch(w))
        assert masked_from_text == p.n_masked
        assert spans_from_text == p.n_spans
        assert kept + masked_from_text == p.n_tokens
        # T5 format: targets end with the FINAL sentinel (k = n_spans),
        # sentinels strictly increasing from 0
        ks = [int(w[10:-1]) for w in tgt_toks if sent.fullmatch(w)]
        assert ks == list(range(p.n_spans + 1))
        assert tgt_toks[-1] == f"<extra_id_{p.n_spans}>"
        # noise rate near the 15% operating point on full blocks
        if p.n_tokens >= 40:
            assert 0.05 <= p.n_masked / p.n_tokens <= 0.25
    # content-stable: same doc -> same mask; different salt -> different
    plan2 = {r.doc_id: r for r in span_corruption(docs).collect()}
    assert {d: p.masked_fp for d, p in plan.items()} == {
        d: p.masked_fp for d, p in plan2.items()}
    alt = {r.doc_id: r.masked_fp
           for r in span_corruption(docs, salt="ul2-v2").collect()}
    assert any(alt[d] != plan[d].masked_fp for d in alt)
