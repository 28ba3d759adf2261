"""Round-13 regressions.

ADVICE r12 item 1: every compile_query_sql string that es_search feeds to
Spark ``F.expr`` must compile in the SPARK dialect — the duckdb default
emits ``len(list_filter(...))`` for `nested` clauses, which Spark SQL
cannot parse. These tests push a `nested` clause through each previously
duckdb-dialect path: significant_terms foreground inference, the filters
agg, adjacency_matrix, t_test sides, and explicit significant_*
foreground/background_filter specs; plus validate_query now compiling
BOTH dialects.
"""

from __future__ import annotations

import pytest

from elasticsearch_drift_plugin_spark.functions.es_search import (
    run_search,
    validate_query,
)

NESTED_R = {"nested": {"path": "items", "query": {"bool": {"must": [
    {"range": {"items.qty": {"gte": 45}}},
    {"term": {"items.flag": "R"}},
]}}}}
NESTED_ANY = {"nested": {"path": "items",
                         "query": {"exists": {"field": "qty"}}}}


@pytest.fixture(scope="module")
def ndf(spark):
    rows = [
        (0, "a", 1.0, [(10, "A"), (50, "R")]),
        (1, "a", 2.0, [(46, "R")]),
        (2, "b", 3.0, [(46, "A")]),
        (3, "b", 4.0, []),
        (4, "c", 5.0, None),
        (5, "a", 6.0, [(99, "R")]),
    ]
    return spark.createDataFrame(
        rows,
        "pid long, cat string, v double,"
        " items array<struct<qty: long, flag: string>>",
    )


def test_filters_agg_accepts_nested_clause(ndf):
    out = run_search(ndf, {"aggs": {"f": {"filters": {
        "filters": {"r_heavy": NESTED_R, "has_items": NESTED_ANY},
        "other_bucket": True,
    }}}})["f"]
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    # NESTED_R matches pids 0,1,5; NESTED_ANY matches 0,1,2,5;
    # other bucket = docs matching neither = pids 3,4
    assert got == {"r_heavy": 3, "has_items": 4, "_other_": 2}


def test_sig_terms_inferred_foreground_accepts_nested_query(ndf):
    out = run_search(ndf, {
        "query": NESTED_R,
        "aggs": {"s": {"significant_terms": {
            "field": "cat", "min_doc_count": 1,
        }}},
    })["s"]
    rows = {r["key"]: r["fg_count"] for r in out.collect()}
    # foreground = nested hits (0,1,5) → cat 'a' ×3
    assert rows["a"] == 3


def test_sig_terms_explicit_nested_fg_and_bg_filter(ndf):
    out = run_search(ndf, {"aggs": {"s": {"significant_terms": {
        "field": "cat",
        "foreground": NESTED_R,
        "background_filter": NESTED_ANY,
        "min_doc_count": 1,
    }}}})["s"]
    assert {r["key"] for r in out.collect()} == {"a"}


def test_adjacency_matrix_accepts_nested_filters(ndf):
    out = run_search(ndf, {"aggs": {"m": {"adjacency_matrix": {
        "filters": {"r": NESTED_R, "any": NESTED_ANY},
    }}}})["m"]
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    assert got["r"] == 3 and got["any"] == 4 and got["any&r"] == 3


def test_t_test_accepts_nested_filters(ndf):
    out = run_search(ndf, {"aggs": {"t": {"t_test": {
        "a": {"field": "v", "filter": NESTED_R},
        "b": {"field": "v", "filter": NESTED_ANY},
    }}}})["t"]
    assert out.count() == 1  # runs — duckdb spelling raised ParseException


def test_percolate_accepts_nested_rule(ndf):
    from elasticsearch_drift_plugin_spark.operators.search import percolate

    df = ndf.withColumnRenamed("v", "value")
    out = {
        r["rule_id"]: r["n_matches"]
        for r in percolate(df, rules=((7, NESTED_R),)).collect()
    }
    assert out == {7: 3}


def test_validate_query_compiles_both_dialects(ndf):
    ok, reason = validate_query({"query": NESTED_R})
    assert ok, reason
    ok, reason = validate_query({"query": {"nested": {"path": "items"}}})
    assert not ok and "nested" in reason


# ---------------------------------------------------------------------------
# ADVICE r12 item 3: bucketing `missing` is scoped PER-AGG — a metric
# sub-agg over the SAME field without its own `missing` must still skip
# null docs (in ES the substitution belongs to the requesting agg only).
# ---------------------------------------------------------------------------

def test_date_histogram_missing_scoped_to_grouping(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import run_search

    df = spark.createDataFrame(
        [(0,), (None,), (86_400_000,)], "t_ms long"
    )
    out = run_search(df, {"size": 0, "aggs": {
        "h": {"date_histogram": {"field": "t_ms", "fixed_interval": "1d",
                                 "missing": 0},
              "aggs": {"m": {"avg": {"field": "t_ms"}}}},
    }})["h"]
    got = {r["key"]: (r["doc_count"], r["m"]) for r in out.collect()}
    # bucket 0 holds 2 docs (real 0 + the null doc) but the avg over the
    # SAME field sees only the real value — null skipped, not 0-substituted
    assert got == {0: (2, 0.0), 86_400_000: (1, 86_400_000.0)}


def test_terms_missing_scoped_to_grouping(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import run_search

    df = spark.createDataFrame(
        [("a", "a", 1.0), (None, "x", 2.0), ("b", "b", 4.0)],
        "k string, k2 string, v double",
    )
    out = run_search(df, {"size": 0, "aggs": {
        "t": {"terms": {"field": "k", "missing": "zz",
                        "order": {"_key": "asc"}},
              # value_count over the SAME string field: the null-k doc
              # buckets at 'zz' but contributes 0 to its own count
              "aggs": {"c": {"value_count": {"field": "k"}},
                       # ...unless the metric sets its OWN missing
                       "cm": {"value_count": {"field": "k",
                                              "missing": "q"}}}},
    }})["t"]
    got = {r["k"]: (r["doc_count"], r["c"], r["cm"]) for r in out.collect()}
    assert got == {"a": (1, 1, 1), "b": (1, 1, 1), "zz": (1, 0, 1)}


def test_histogram_missing_scoped_to_grouping(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import run_search

    df = spark.createDataFrame([(5.0,), (None,), (15.0,)], "v double")
    out = run_search(df, {"size": 0, "aggs": {
        "h": {"histogram": {"field": "v", "interval": 10, "missing": 25.0},
              "aggs": {"s": {"sum": {"field": "v"}}}},
    }})["h"]
    got = {r["key"]: (r["doc_count"], r["s"]) for r in out.collect()}
    # the null doc buckets at 20.0 but sums nothing there
    assert got == {0.0: (1, 5.0), 10.0: (1, 15.0), 20.0: (1, None)}
