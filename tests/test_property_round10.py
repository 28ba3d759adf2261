"""Round-10 property tests: randomized invariants for the r10 features —
the minimum_should_match spec resolver, histogram zero-fill grids, the
N-field matrix_stats, and the anchored calendar composite keys. Pure
hypothesis where possible; Spark cases use small seeded frames."""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.functions.es_dsl import (
    calculate_min_should_match,
)


# ---------------------------------------------------------------------------
# minimum_should_match resolver
# ---------------------------------------------------------------------------


@given(
    n=st.integers(min_value=0, max_value=50),
    spec=st.integers(min_value=-60, max_value=60),
)
def test_msm_integer_forms_match_string_forms(n, spec):
    assert calculate_min_should_match(n, spec) == calculate_min_should_match(
        n, str(spec)
    )


@given(
    n=st.integers(min_value=0, max_value=50),
    pct=st.integers(min_value=-200, max_value=200),
)
def test_msm_percentage_reference_model(n, pct):
    """The resolver must equal a direct transcription of the Lucene
    float32 formula: calc = (n*pct) * (1/100f); negative calc ADDS to n,
    positive truncates; clamp at 0."""
    import numpy as np

    calc = float(np.float32(n * pct) * (np.float32(1.0) / np.float32(100.0)))
    want = n + int(calc) if calc < 0 else int(calc)
    want = max(want, 0)
    assert calculate_min_should_match(n, f"{pct}%") == want


@given(
    n=st.integers(min_value=0, max_value=30),
    thresholds=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_msm_conditional_chain_model(n, thresholds):
    """Conditional chains replay the Solr loop: walk specs in order; a
    threshold >= n returns the result so far (initially n = all
    required); otherwise the spec applies and the walk continues."""
    thresholds = sorted(thresholds)  # well-formed chains ascend
    spec = " ".join(f"{u}<{v}" for u, v in thresholds)
    want = n
    for u, v in thresholds:
        if n <= u:
            break
        want = max(n + v if v < 0 else v, 0)
    assert calculate_min_should_match(n, spec) == want


@given(
    n_clauses=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_msm_flag_sum_equals_python_count(n_clauses, data, spark):
    """For random row/clause universes, the compiled bool msm predicate
    keeps exactly the rows whose python-side match count >= the resolved
    integer — any spec form."""
    from elasticsearch_drift_plugin_spark.functions.es_dsl import compile_query

    spec = data.draw(
        st.one_of(
            st.integers(min_value=0, max_value=n_clauses + 2),
            st.sampled_from(["25%", "50%", "75%", "100%", "-25%", "-50%",
                             "2<75%", "1<-25%"]),
        )
    )
    rows = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 1) for _ in range(n_clauses)]),
            min_size=1,
            max_size=8,
        )
    )
    cols = [f"c{i}" for i in range(n_clauses)]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "id int, " + ", ".join(f"{c} int" for c in cols),
    )
    body = {"bool": {
        "should": [{"term": {c: 1}} for c in cols],
        "minimum_should_match": spec,
    }}
    got = sorted(r["id"] for r in df.where(compile_query(body)).collect())
    eff = calculate_min_should_match(n_clauses, spec)
    if eff == 0:
        want = list(range(len(rows)))  # optional: all rows pass
    else:
        want = [i for i, r in enumerate(rows) if sum(r) >= eff]
    assert got == want, (spec, eff, rows)


# ---------------------------------------------------------------------------
# histogram zero-fill grid invariants
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=12
    ),
    interval=st.sampled_from([3, 7, 10]),
    eb=st.one_of(
        st.none(),
        st.tuples(
            st.integers(min_value=-80, max_value=0),
            st.integers(min_value=0, max_value=80),
        ),
    ),
)
@settings(max_examples=20, deadline=None)
def test_histogram_filled_grid_complete_and_conservative(
    vals, interval, eb, spark
):
    """The filled histogram must (a) produce a gapless arithmetic grid,
    (b) span exactly min(data, eb) .. max(data, eb), (c) preserve every
    populated bucket's doc_count, and (d) total doc_count == len(vals)."""
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        histogram_agg_filled,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = histogram_agg_filled(
        df, "v", float(interval),
        extended_bounds=(float(eb[0]), float(eb[1])) if eb else None,
    ).collect()
    keys = [r["key"] for r in out]
    assert keys == sorted(keys)
    assert all(
        abs((b - a) - interval) < 1e-9 for a, b in zip(keys, keys[1:])
    ), "grid has gaps"
    data_keys = {math.floor(v / interval) * interval for v in vals}
    lo = min(data_keys | ({math.floor(eb[0] / interval) * interval} if eb else set()))
    hi = max(data_keys | ({math.floor(eb[1] / interval) * interval} if eb else set()))
    assert keys[0] == lo and keys[-1] == hi
    assert sum(r["doc_count"] for r in out) == len(vals)
    by_key = {r["key"]: r["doc_count"] for r in out}
    for k in data_keys:
        assert by_key[float(k)] == sum(
            1 for v in vals if math.floor(v / interval) * interval == k
        )


# ---------------------------------------------------------------------------
# N-field matrix_stats vs a float reference model
# ---------------------------------------------------------------------------


def test_matrix_stats_multi_matches_numpy(spark):
    import numpy as np

    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        matrix_stats_multi,
    )

    rng = random.Random(7)
    rows = [
        (round(rng.uniform(-5, 5), 3), round(rng.uniform(0, 9), 3),
         round(rng.uniform(-2, 2), 3))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {
        (r["field_x"], r["field_y"]): r
        for r in matrix_stats_multi(df, ["a", "b", "c"]).collect()
    }
    assert len(out) == 6
    m = np.array(rows)
    for i, fx in enumerate("abc"):
        for j in range(i, 3):
            fy = "abc"[j]
            r = out[(fx, fy)]
            assert r["n"] == 200
            cov = float(np.cov(m[:, i], m[:, j], bias=True)[0, 1])
            # quantized inputs: 1e-6 grid -> cov_q within a small absolute
            # tolerance of the float model
            assert abs(r["cov_q"] / 1e12 - cov) < 1e-4, (fx, fy)
            corr = float(np.corrcoef(m[:, i], m[:, j])[0, 1])
            assert abs(r["corr_mq"] / 1e6 - corr) < 1e-4, (fx, fy)
    # diagonal correlation is exactly 1
    for f in "abc":
        assert out[(f, f)]["corr_mq"] == 1_000_000


def test_matrix_stats_multi_listwise_deletion(spark):
    """A doc missing ANY field drops from EVERY pair (ES matrix_stats),
    unlike the pairwise operator."""
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        matrix_stats_multi,
    )

    rows = [(1.0, 2.0, 3.0), (2.0, 1.0, None), (3.0, 5.0, 4.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = matrix_stats_multi(df, ["a", "b", "c"]).collect()
    assert all(r["n"] == 2 for r in out)


# ---------------------------------------------------------------------------
# anchored composite week keys
# ---------------------------------------------------------------------------


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=4_000_000_000_000),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None)
def test_composite_week_keys_are_mondays(ts, spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import composite_agg

    df = spark.createDataFrame([(t,) for t in ts], "t long")
    out = composite_agg(
        df, [("wk", "date_histogram", "t", (604_800_000, -259_200_000))],
        size=100,
    ).collect()
    got = sorted(r["wk"] for r in out)
    # reference model: Spark's own calendar week floor
    want = sorted(
        {
            r["w"]
            for r in df.select(
                F.unix_millis(
                    F.date_trunc("week", F.timestamp_millis("t"))
                ).alias("w")
            ).collect()
        }
    )
    assert got == want
    assert sum(r["doc_count"] for r in out) == len(ts)


# ---------------------------------------------------------------------------
# the whole histogram+terms-child min_doc_count surface vs a python model
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),           # value
            st.sampled_from(["a", "b", "c", None]),           # term
        ),
        min_size=1,
        max_size=14,
    ),
    mdc=st.integers(min_value=0, max_value=3),
    size=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=20, deadline=None)
def test_histogram_terms_child_mdc_surface_model(rows, mdc, size, spark):
    """Random corpora through the compiler vs a direct python model of
    the documented contract: per-(bucket, term) counts ranked per bucket
    (count desc, term asc, top `size`); mdc==0 adds NULL-term rows for
    grid keys with no term rows; mdc>1 keeps only buckets whose TOTAL
    doc count (including term-null docs) meets the threshold."""
    from collections import Counter

    from elasticsearch_drift_plugin_spark.functions.es_search import run_search

    interval = 10
    df = spark.createDataFrame(
        [(float(v), t) for v, t in rows], "v double, t string"
    )
    body = {"aggs": {"h": {
        "histogram": {"field": "v", "interval": interval,
                      "min_doc_count": mdc},
        "aggs": {"ts": {"terms": {"field": "t", "size": size}}},
    }}}
    got = [
        (r["key"], r["t"], r["doc_count"])
        for r in run_search(df, body)["h"].collect()
    ]

    # --- python model ---
    key = lambda v: float((v // interval) * interval)
    bucket_total = Counter(key(v) for v, _ in rows)
    pair = Counter((key(v), t) for v, t in rows if t is not None)
    want = []
    for k in sorted(bucket_total):
        terms = sorted(
            ((t, c) for (kk, t), c in pair.items() if kk == k),
            key=lambda x: (-x[1], x[0]),
        )[:size]
        if mdc == 0 and not terms:
            want.append((k, None, 0))
        elif mdc > 1:
            if bucket_total[k] >= mdc:
                want.extend((k, t, c) for t, c in terms)
        else:
            want.extend((k, t, c) for t, c in terms)
    if mdc == 0:
        # grid completeness: interior gap keys appear as NULL-term rows
        ks = sorted(bucket_total)
        full = [float(x) for x in range(int(ks[0]), int(ks[-1]) + 1, interval)]
        have = {k for k, *_ in want}
        for k in full:
            if k not in have:
                want.append((k, None, 0))
        want.sort(key=lambda r: (r[0], -r[2], r[1] or ""))
    assert got == want, (rows, mdc, size)
