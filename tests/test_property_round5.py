"""Property tests for the round-5 operators: BPE training against an
independent reference implementation, and the TSDB counter-rate against a
direct per-row recomputation."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5), min_size=1, max_size=20
)


def _ref_bpe(word_list, n_merges):
    """Independent reference BPE (kept deliberately naive): dict-of-tuples
    vocab, recount from scratch each round, same tie-break (count desc,
    pair lex asc), stop below pair_count 2."""
    from collections import Counter

    vocab = Counter(tuple(w) + ("</w>",) for w in word_list)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((l, r, c))
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ws=words, n=st.integers(min_value=1, max_value=8))
def test_bpe_train_matches_reference(spark, ws, n):
    from elasticsearch_drift_plugin_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame([(1, " ".join(ws))], "doc_id long, text string")
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=n).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(ws, n)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        min_size=1, max_size=30,
    ),
    mod=st.integers(min_value=5, max_value=100),
)
def test_counter_rate_matches_direct_recompute(spark, vals, mod):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        time_series_counter_rate,
    )

    day = 1_704_067_200_000
    rows = [
        (i, "s", day + i * 3_600_000, v)  # hourly samples, one series
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, t long, value double"
    ).select(
        "event_id", "event_type",
        F.timestamp_millis(F.col("t")).alias("ts"), "value",
    )
    got = {
        r.bucket: (r.n_samples, r.increase)
        for r in time_series_counter_rate(ev, reset_mod=mod).collect()
    }
    # direct recompute
    import math

    cum, last = 0, None
    exp: dict[int, list[int]] = {}
    for i, v in enumerate(vals):
        cum += math.floor(v * 1000)
        ctr = cum % mod
        inc = 0 if last is None else (ctr if ctr < last else ctr - last)
        last = ctr
        b = (day + i * 3_600_000) // 86_400_000 * 86_400_000
        agg = exp.setdefault(b, [0, 0])
        agg[0] += 1
        agg[1] += inc
    assert got == {b: tuple(a) for b, a in exp.items()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_toks=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=10),
)
def test_chunk_documents_covers_every_token_once_per_stride(
    spark, n_toks, chunk, overlap
):
    """r6 chunker invariants for any (doc length, window, overlap):
    windows start at every stride multiple below n; each window's length
    is min(chunk, n - start); the union of windows covers [0, n); and
    consecutive windows overlap by exactly `overlap` tokens (or the
    remainder when the last window is short)."""
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        chunk_documents,
    )

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    text = " ".join(f"w{i}" for i in range(n_toks))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_no, r.start_tok, r.n_tokens)
        for r in chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect()
    )
    exp_starts = list(range(0, n_toks, stride))
    assert [r[1] for r in rows] == exp_starts
    assert all(n == min(chunk, n_toks - s) for _, s, n in rows)
    covered = set()
    for _, s, n in rows:
        covered |= set(range(s, s + n))
    assert covered == set(range(n_toks))
