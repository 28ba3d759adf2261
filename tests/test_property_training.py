"""Property tests for training assembly: next-fit packing invariants vs a
pure-Python reference, on randomized corpora."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_drift_plugin_spark.operators import training as tr


def _ref_next_fit(lens, cap):
    """Reference next-fit: (seq_no, offset) per doc in order."""
    out, seq, used, first = [], 0, 0, True
    for n in lens:
        if not first and used + n > cap:
            seq, used = seq + 1, 0
        out.append((seq, used))
        used += n
        first = False
    return out


corpora = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=30),  # token count per doc
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora, cap=st.integers(min_value=5, max_value=40))
def test_pack_matches_reference_next_fit(spark, corpus, cap):
    rows = [
        (src, i, " ".join(["w"] * n)) for i, (src, n) in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["group"], r["doc_id"]): (r["seq_no"], r["seq_offset"])
        for r in tr.pack_sequences(df, capacity=cap).collect()
    }
    # reference, per group in doc_id order
    by_group: dict[str, list[tuple[int, int]]] = {}
    for i, (src, n) in enumerate(corpus):
        by_group.setdefault(src, []).append((i, n))
    for src, docs in by_group.items():
        docs.sort()
        ref = _ref_next_fit([n for _, n in docs], cap)
        for (doc_id, n), (seq, off) in zip(docs, ref):
            assert got[(src, doc_id)] == (seq, off)
    # global invariants: offsets non-negative; any doc that is not alone in
    # its sequence ends within capacity
    for (src, doc_id), (seq, off) in got.items():
        assert off >= 0
        n = dict((i, n) for i, (s, n) in enumerate(corpus))[doc_id]
        if off > 0:
            assert off + n <= cap
