"""ES `_search` body compiler: the reference's own README request runs
verbatim (same numbers as the AggregatorIT golden), sibling aggs share the
query context, terms nesting routes to group_by, and unsupported nodes
fail loudly."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.functions.es_search import run_search

FLOWS = "start_ms long, end_ms long, value double, sampling double"


def test_reference_readme_body_verbatim(spark):
    """README.md:92-115 — one flow (100..450, 350 bytes), interval=100,
    start=0, end=500 => buckets (100,100),(200,100),(300,100),(400,50) and
    a sibling total of 350."""
    flows = spark.createDataFrame([(100, 450, 350.0, None)], FLOWS)
    body = {
        "size": 0,
        "aggs": {
            "bytes_over_time": {
                "proportional_sum": {
                    "fields": ["start_ms", "end_ms", "value"],
                    "interval": 100,
                    "start": 0,
                    "end": 500,
                }
            },
            "bytes_total": {"sum": {"field": "value"}},
        },
    }
    out = run_search(flows, body)
    assert set(out) == {"bytes_over_time", "bytes_total"}
    buckets = [(r.key, r.doc_count, r.value) for r in out["bytes_over_time"].collect()]
    assert buckets == [(100, 1, 100.0), (200, 1, 100.0), (300, 1, 100.0), (400, 1, 50.0)]
    assert out["bytes_total"].collect()[0][0] == 350.0


def test_query_clause_filters_all_siblings(spark):
    flows = spark.createDataFrame(
        [(0, 100, 10.0, None), (0, 100, 90.0, None)], FLOWS
    ).withColumn("tag", F.when(F.col("value") > 50, "big").otherwise("small"))
    body = {
        "query": {"term": {"tag": "big"}},
        "aggs": {
            "total": {"sum": {"field": "value"}},
            "n": {"value_count": {"field": "value"}},
        },
    }
    out = run_search(flows, body)
    assert out["total"].collect()[0][0] == 90.0
    assert out["n"].collect()[0][0] == 1


def test_terms_with_nested_proportional_sum_routes_to_group_by(spark):
    rows = [
        ("a", 0, 200, 10.0, None),
        ("b", 0, 100, 4.0, None),
        ("b", 100, 200, 6.0, None),
    ]
    flows = spark.createDataFrame(
        rows, "k string, start_ms long, end_ms long, value double, sampling double"
    )
    body = {
        "aggs": {
            "per_k": {
                "terms": {"field": "k"},
                "aggs": {
                    "over_time": {
                        "proportional_sum": {
                            "fields": ["start_ms", "end_ms", "value"],
                            "interval": 100,
                        }
                    }
                },
            }
        }
    }
    got = {(r.k, r.key): (r.doc_count, r.value)
           for r in run_search(flows, body)["per_k"].collect()}
    # key 200: the reference's inclusive terminal bucket — a flow ending
    # exactly on a boundary credits that bucket with doc_count, value 0
    # (SURVEY §2.1 row 11)
    assert got == {
        ("a", 0): (1, 5.0), ("a", 100): (1, 5.0), ("a", 200): (1, 0.0),
        # (b,100): flow (0,100)'s terminal bucket AND flow (100,200)'s
        # first bucket — every touched bucket counts (row 14)
        ("b", 0): (1, 4.0), ("b", 100): (2, 6.0), ("b", 200): (1, 0.0),
    }


def test_terms_with_metric_subaggs_and_size(spark):
    flows = spark.createDataFrame(
        [("x", 1.0), ("x", 3.0), ("y", 5.0), ("z", 7.0), ("z", 0.0), ("z", 2.0)],
        "k string, value double",
    )
    body = {"aggs": {"per_k": {
        "terms": {"field": "k", "size": 2},
        "aggs": {"total": {"sum": {"field": "value"}},
                 "peak": {"max": {"field": "value"}}},
    }}}
    rows = run_search(flows, body)["per_k"].collect()
    assert [(r.k, r.doc_count, r.total, r.peak) for r in rows] == [
        ("z", 3, 9.0, 7.0), ("x", 2, 4.0, 3.0),
    ]


def test_date_histogram_counts_instants(spark):
    ev = spark.createDataFrame([(50,), (150,), (160,), (399,)], "t long")
    body = {"aggs": {"per_100": {"date_histogram": {"field": "t", "fixed_interval": 100}}}}
    got = [(r.key, r.doc_count) for r in run_search(ev, body)["per_100"].collect()]
    assert got == [(0, 1), (100, 2), (300, 1)]


def test_unknown_agg_fails_loudly(spark):
    flows = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError):
        run_search(flows, {"aggs": {"x": {"geo_cloud": {"field": "value"}}}})
    with pytest.raises(ValueError):
        run_search(flows, {"aggs": {"x": {"sum": {"field": "value"},
                                          "aggs": {"y": {"sum": {"field": "value"}}}}}})


def test_metric_subaggs_under_histograms(spark):
    """ES nesting: metric leaves under proportional_sum / date_histogram
    map to the operator's extra_aggs (per-bucket metric columns)."""
    flows = spark.createDataFrame(
        [(0, 200, 10.0, None, 3.0), (100, 200, 6.0, None, 9.0)],
        "start_ms long, end_ms long, value double, sampling double, w double",
    )
    body = {"aggs": {"over_time": {
        "proportional_sum": {"fields": ["start_ms", "end_ms", "value"],
                             "interval": 100},
        "aggs": {"peak_w": {"max": {"field": "w"}},
                 "n_vals": {"value_count": {"field": "w"}}},
    }}}
    rows = {r.key: (r.doc_count, r.value, r.peak_w, r.n_vals)
            for r in run_search(flows, body)["over_time"].collect()}
    assert rows[0] == (1, 5.0, 3.0, 1)
    assert rows[100] == (2, 11.0, 9.0, 2)
    # terminal bucket at 200: both flows end there, zero value
    assert rows[200] == (2, 0.0, 9.0, 2)

    ev = spark.createDataFrame([(50, 2.0), (150, 4.0), (160, 8.0)], "t long, v double")
    body2 = {"aggs": {"hist": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {"total_v": {"sum": {"field": "v"}}},
    }}}
    got = {r.key: (r.doc_count, r.total_v)
           for r in run_search(ev, body2)["hist"].collect()}
    assert got == {0: (1, 2.0), 100: (2, 12.0)}


def test_render_response_es_shape(spark):
    """The serving edge: run_search results render as the ES response's
    aggregations object."""
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        render_response,
    )

    flows = spark.createDataFrame([(100, 450, 350.0, None)], FLOWS)
    body = {
        "aggs": {
            "bytes_over_time": {
                "proportional_sum": {
                    "fields": ["start_ms", "end_ms", "value"],
                    "interval": 100, "start": 0, "end": 500,
                }
            },
            "bytes_total": {"sum": {"field": "value"}},
        },
    }
    resp = render_response(run_search(flows, body))
    aggs = resp["aggregations"]
    assert aggs["bytes_total"] == {"value": 350.0}
    bks = aggs["bytes_over_time"]["buckets"]
    assert [(b["key"], b["doc_count"], b["value"]) for b in bks] == [
        (100, 1, 100.0), (200, 1, 100.0), (300, 1, 100.0), (400, 1, 50.0),
    ]
    # keyed form mirrors ES keyed:true
    keyed = render_response(run_search(flows, body), keyed=True)
    assert set(keyed["aggregations"]["bytes_over_time"]["buckets"]) == {
        "100", "200", "300", "400",
    }


def test_range_histogram_filters_nodes(spark):
    ev = spark.createDataFrame(
        [("click", 5.0), ("view", 25.0), ("view", 45.0), ("error", 95.0)],
        "etype string, value double",
    )
    body = {"aggs": {
        "by_range": {"range": {"field": "value", "ranges": [
            {"to": 30}, {"from": 30, "to": 90}, {"from": 90}]}},
        "by_hist": {"histogram": {"field": "value", "interval": 50}},
        "by_filters": {"filters": {"filters": {
            "clicks": {"term": {"etype": "click"}},
            "big": {"range": {"value": {"gte": 40}}},
        }, "other_bucket": True}},
    }}
    out = run_search(ev, body)
    rng = {(r.range_from, r.range_to): r.doc_count for r in out["by_range"].collect()}
    assert rng == {(None, 30.0): 2, (30.0, 90.0): 1, (90.0, None): 1}
    hist = {r.key: r.doc_count for r in out["by_hist"].collect()}
    assert hist == {0.0: 3, 50.0: 1}  # 5/25/45 -> bucket 0; 95 -> bucket 50
    flt = {r.key: r.doc_count for r in out["by_filters"].collect()}
    # other = view(25) only — click(5) matched clicks, 45/95 matched big
    assert flt == {"clicks": 1, "big": 2, "_other_": 1}


def test_match_phrase_and_ids(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "brown quick the")],
        "doc_id long, text string",
    )
    from elasticsearch_drift_plugin_spark.functions.es_dsl import compile_query

    m = lambda q: sorted(
        r.doc_id for r in docs.where(compile_query(q)).collect()
    )
    assert m({"match_phrase": {"text": "quick brown"}}) == [1]
    assert m({"match_phrase": {"text": "brown quick"}}) == [2]
    assert m({"ids": {"values": [2, 99]}}) == [2]


def test_pipeline_subaggs_cumsum_derivative(spark):
    ev = spark.createDataFrame(
        [(50, 1.0), (150, 3.0), (250, 5.0)], "t long, v double"
    )
    body = {"aggs": {"hist": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {
            "vsum": {"sum": {"field": "v"}},
            "running": {"cumulative_sum": {"buckets_path": "vsum"}},
            "delta": {"derivative": {"buckets_path": "vsum"}},
            "n_cum": {"cumulative_sum": {"buckets_path": "_count"}},
        },
    }}}
    rows = [(r.key, r.vsum, r.running, r.delta, r.n_cum)
            for r in run_search(ev, body)["hist"].collect()]
    assert rows == [
        (0, 1.0, 1.0, None, 1),
        (100, 3.0, 4.0, 2.0, 2),
        (200, 5.0, 9.0, 2.0, 3),
    ]


def test_significant_multi_missing_nodes(spark):
    ev = spark.createDataFrame(
        [("click", 1, 1.0), ("click", 1, None), ("view", 2, 2.0),
         ("view", 1, 4.0), ("error", 9, 8.0)],
        "etype string, uid long, value double",
    )
    body = {"aggs": {
        "sig": {"significant_terms": {
            "field": "uid", "foreground": {"term": {"etype": "click"}},
            "size": 3, "min_doc_count": 1}},
        "gaps": {"missing": {"field": "value"}},
        "combos": {"multi_terms": {"terms": [{"field": "etype"}, {"field": "uid"}],
                                    "size": 10}},
    }}
    out = run_search(ev, body)
    sig = out["sig"].collect()
    assert sig and sig[0]["key"] == 1  # uid 1 over-represented in clicks
    gaps = out["gaps"].collect()[0]
    assert (gaps.missing_count, gaps.value_count) == (1, 4)
    combos = {(r.etype, r.uid): r.doc_count for r in out["combos"].collect()}
    assert combos[("click", 1)] == 2 and combos[("error", 9)] == 1


def test_terms_nested_terms_composite_buckets(spark):
    ev = spark.createDataFrame(
        [("click", "us", 1.0), ("click", "us", 2.0), ("click", "de", 3.0),
         ("view", "us", 4.0)],
        "etype string, geo string, value double",
    )
    body = {"aggs": {"outer": {
        "terms": {"field": "etype"},
        "aggs": {"inner": {
            "terms": {"field": "geo", "size": 10},
            "aggs": {"total": {"sum": {"field": "value"}}},
        }},
    }}}
    got = {(r.etype, r.geo): (r.doc_count, r.total)
           for r in run_search(ev, body)["outer"].collect()}
    assert got == {("click", "us"): (2, 3.0), ("click", "de"): (1, 3.0),
                   ("view", "us"): (1, 4.0)}


def test_composite_and_sibling_bucket_pipelines(spark):
    ev = spark.createDataFrame(
        [("a", 10.0), ("a", 30.0), ("b", 10.0), ("b", 50.0), ("c", 70.0)],
        "k string, v double",
    )
    body = {"aggs": {
        "pages": {"composite": {"size": 3, "sources": [
            {"kk": {"terms": {"field": "k"}}},
            {"vb": {"histogram": {"field": "v", "interval": 20}}},
        ]}},
        "hist": {"date_histogram": {"field": "v", "fixed_interval": 20},
                 "aggs": {"vsum": {"sum": {"field": "v"}}}},
        "avg_per_bucket": {"avg_bucket": {"buckets_path": "hist>vsum"}},
        "total_docs": {"sum_bucket": {"buckets_path": "hist>_count"}},
    }}
    out = run_search(ev, body)
    page1 = [(r.kk, r.vb, r.doc_count) for r in out["pages"].collect()]
    assert page1 == [("a", 0.0, 1), ("a", 20.0, 1), ("b", 0.0, 1)]
    # page 2 via after cursor
    body2 = {"aggs": {"pages": {"composite": {
        "size": 3, "after": {"kk": "b", "vb": 0.0},
        "sources": [
            {"kk": {"terms": {"field": "k"}}},
            {"vb": {"histogram": {"field": "v", "interval": 20}}},
        ]}}}}
    page2 = [(r.kk, r.vb, r.doc_count) for r in run_search(ev, body2)["pages"].collect()]
    assert page2 == [("b", 40.0, 1), ("c", 60.0, 1)]
    # sibling pipelines over the histogram's buckets
    # hist buckets: 0->10+10=20 (2 docs), 20->30 (1), 40->50 (1), 60->70 (1)
    assert out["avg_per_bucket"].collect()[0][0] == (20.0 + 30.0 + 50.0 + 70.0) / 4
    assert out["total_docs"].collect()[0][0] == 5


def test_review_regressions_round5(spark):
    """Pinned fixes from the round-5 code review."""
    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        render_response,
    )

    # (1) terms-in-terms: leaf size applies PER PARENT, parents keep their
    # own size — no global top-k over flattened rows
    rows = [("p1", f"c{i}", 1.0) for i in range(4)]
    rows += [("p2", "c9", 1.0)] * 10  # p2's single child outweighs all of p1's
    ev = spark.createDataFrame(rows, "p string, c string, v double")
    body = {"aggs": {"o": {"terms": {"field": "p", "size": 10},
                           "aggs": {"i": {"terms": {"field": "c", "size": 2}}}}}}
    got = {(r.p, r.c): r.doc_count for r in run_search(ev, body)["o"].collect()}
    # p1 keeps its top-2 children even though each ranks below p2's child
    assert got == {("p1", "c0"): 1, ("p1", "c1"): 1, ("p2", "c9"): 10}

    # (2) sub-aggs under unsupported nodes raise instead of vanishing
    # (range/histogram/date_range accept METRIC sub-aggs since r6, so probe
    # a still-unsupported pairing: composite, and a bucket sub under range)
    with pytest.raises(ValueError):
        run_search(ev, {"aggs": {"x": {
            "composite": {"sources": [{"p": {"terms": {"field": "p"}}}]},
            "aggs": {"s": {"sum": {"field": "v"}}}}}})
    with pytest.raises(ValueError):
        run_search(ev, {"aggs": {"x": {"range": {"field": "v", "ranges": [{"to": 5}]},
                                       "aggs": {"t": {"terms": {"field": "p"}}}}}})
    # metric sibling beside a nested proportional_sum raises too
    with pytest.raises(ValueError):
        run_search(ev, {"aggs": {"x": {"terms": {"field": "p"}, "aggs": {
            "ps": {"proportional_sum": {"fields": ["v", "v", "v"], "interval": 1}},
            "m": {"sum": {"field": "v"}}}}}})

    # (3) minimum_should_match: 0 makes should optional even standalone
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    q0 = {"bool": {"should": [{"term": {"t": "a"}}], "minimum_should_match": 0}}
    assert {r.id for r in docs.where(compile_query(q0)).collect()} == {1, 2}

    # (4) prefix SQL twin escapes LIKE metacharacters ('_' must be literal)
    d2 = spark.createDataFrame([(1, "a_b"), (2, "aXb")], "id long, path string")
    qp = {"prefix": {"path": "a_b"}}
    spark_ids = {r.id for r in d2.where(compile_query(qp)).collect()}
    sql_ids = {r.id for r in d2.where(F.expr(compile_query_sql(qp))).collect()}
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t2 (id BIGINT, path VARCHAR)")
    con.executemany("INSERT INTO t2 VALUES (?, ?)", [(1, "a_b"), (2, "aXb")])
    duck_ids = {r[0] for r in con.execute(
        f"SELECT id FROM t2 WHERE {compile_query_sql(qp)}").fetchall()}
    assert spark_ids == sql_ids == duck_ids == {1}

    # (5, amended r6) background_filter is now SUPPORTED (narrows the
    # background); a missing foreground still fails loudly
    with pytest.raises(ValueError, match="foreground"):
        run_search(ev, {"aggs": {"x": {"significant_terms": {
            "field": "p", "background_filter": {"term": {"c": "c0"}}}}}})

    # (6) grouped render nests children under the sub-agg NAME
    flows = spark.createDataFrame(
        [("a", 0, 100, 4.0, None)],
        "k string, start_ms long, end_ms long, value double, sampling double",
    )
    body6 = {"aggs": {"per_k": {"terms": {"field": "k"}, "aggs": {
        "daily": {"proportional_sum": {
            "fields": ["start_ms", "end_ms", "value"], "interval": 100}}}}}}
    resp = render_response(run_search(flows, body6))
    parent = resp["aggregations"]["per_k"]["buckets"][0]
    assert parent["key"] == "a" and "daily" in parent
    assert parent["daily"]["buckets"][0]["key"] == 0


def test_runtime_mappings_fields(spark):
    """Runtime fields (SQL-dialect scripts) are visible to both the query
    clause and the aggs."""
    ev = spark.createDataFrame(
        [("click", 10.0), ("view", 200.0), ("click", 300.0)],
        "etype string, value double",
    )
    body = {
        "runtime_mappings": {
            "value_band": {"type": "keyword",
                           "script": {"source": "IF(value >= 100, 'hi', 'lo')"}}
        },
        "query": {"term": {"value_band": "hi"}},
        "aggs": {"by_band": {"terms": {"field": "etype"}},
                 "total": {"sum": {"field": "value"}}},
    }
    out = run_search(ev, body)
    assert out["total"].collect()[0][0] == 500.0
    got = {r.etype: r.doc_count for r in out["by_band"].collect()}
    assert got == {"click": 1, "view": 1}


def test_percolate_accepts_dsl_rule_bodies(spark):
    """The percolator's stored queries can be registered as ES DSL bodies
    — compiled through the same clause compiler as the search path, and
    equal to the hand-written SQL rule."""
    from elasticsearch_drift_plugin_spark.operators.search import percolate

    ev = spark.createDataFrame(
        [(1, "error", 5, 10.0), (2, "click", 7, 500.0), (3, "error", 9, None)],
        "event_id long, event_type string, user_id long, value double",
    )
    dsl_rules = (
        (1, {"term": {"event_type": "error"}}),
        (2, {"bool": {"filter": [{"term": {"event_type": "click"}},
                                 {"range": {"value": {"gte": 100}}}]}}),
    )
    sql_rules = ((1, "event_type = 'error'"),
                 (2, "event_type = 'click' AND value >= 100"))
    got_dsl = [tuple(r) for r in percolate(ev, rules=dsl_rules).collect()]
    got_sql = [tuple(r) for r in percolate(ev, rules=sql_rules).collect()]
    assert got_dsl == got_sql
    assert got_dsl[0][:2] == (1, 2)  # two error docs match rule 1


# ---------------------------------------------------------------------------
# round-6 compiler surface: moving_fn / bucket_selector / bucket_sort,
# percentiles / percentile_ranks, geo grids, top_hits, terms-size pruning
# of nested proportional_sum, and the serving-edge bucket cap
# ---------------------------------------------------------------------------

def _instant_flows(spark):
    """Zero-duration flows — whole value lands in its own bucket (reference
    row-12 semantics), giving a hand-checkable histogram at interval=100:
    buckets 100:10, 200:30, 300:20, 400:40."""
    rows = [(100, 100, 10.0, None), (200, 200, 30.0, None),
            (300, 300, 20.0, None), (400, 400, 40.0, None)]
    return spark.createDataFrame(rows, FLOWS)


def test_moving_fn_selector_sort_pipeline(spark):
    body = {
        "aggs": {
            "hist": {
                "proportional_sum": {
                    "fields": ["start_ms", "end_ms", "value"],
                    "interval": 100, "start": 0, "end": 500,
                },
                "aggs": {
                    "mv": {"moving_fn": {
                        "buckets_path": "value", "window": 2,
                        "script": "MovingFunctions.max(values)", "quantize": 0,
                    }},
                    "sel": {"bucket_selector": {
                        "buckets_path": {"v": "value"},
                        "script": "params.v > 15",
                    }},
                    "srt": {"bucket_sort": {
                        "sort": [{"value": {"order": "desc"}}], "size": 2,
                    }},
                },
            },
        },
    }
    out = run_search(_instant_flows(spark), body)["hist"]
    rows = [(r.key, r.value, r.mv) for r in out.collect()]
    # ES order: computed pipelines (mv over the 2 PRECEDING buckets,
    # current excluded; first bucket's frame empty -> NULL), then the
    # selector (drops 100:10), then sort desc + size 2
    assert rows == [(400, 40.0, 30), (200, 30.0, 10)]


def test_moving_fn_rejects_non_builtin_scripts(spark):
    fl = _instant_flows(spark)
    base = {
        "fields": ["start_ms", "end_ms", "value"],
        "interval": 100, "start": 0, "end": 500,
    }
    with pytest.raises(ValueError, match="builtin"):
        run_search(fl, {"aggs": {"h": {"proportional_sum": base, "aggs": {
            "m": {"moving_fn": {"buckets_path": "value", "window": 2,
                                "script": "MovingFunctions.stdDev(values)"}}}}}})
    with pytest.raises(ValueError, match="window"):
        run_search(fl, {"aggs": {"h": {"proportional_sum": base, "aggs": {
            "m": {"moving_fn": {"buckets_path": "value", "window": 0,
                                "script": "MovingFunctions.max(values)"}}}}}})


def test_bucket_selector_unknown_param_raises(spark):
    fl = _instant_flows(spark)
    with pytest.raises(ValueError, match="params"):
        run_search(fl, {"aggs": {"h": {
            "proportional_sum": {"fields": ["start_ms", "end_ms", "value"],
                                 "interval": 100},
            "aggs": {"s": {"bucket_selector": {
                "buckets_path": {"v": "value"},
                "script": "params.v > params.missing",
            }}},
        }}})


def test_percentiles_and_ranks_nodes(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "value double")
    out = run_search(df, {"aggs": {
        "p": {"percentiles": {"field": "value", "percents": [50], "quantize": 1}},
    }})["p"]
    # exact interpolated median of quantized longs [10,20,30,40] -> 25
    assert [(r.pct, r.value_q) for r in out.collect()] == [(50.0, 25)]
    ranks = run_search(df, {"aggs": {
        "r": {"percentile_ranks": {"field": "value", "values": [2.0, 4.0]}},
    }})["r"]
    assert [(r.at_value, r.rank_q) for r in ranks.collect()] == [
        (2.0, 500000), (4.0, 1000000)]


def test_geo_grid_nodes_compile(spark):
    pts = spark.createDataFrame(
        [(48.85, 2.35, 1.0), (48.86, 2.36, 1.0), (-33.86, 151.2, 1.0)],
        "lat double, lon double, value double",
    )
    cells = run_search(pts, {"aggs": {
        "g": {"geohash_grid": {"precision": 1, "size": 5}},
    }})["g"].collect()
    assert sum(r.doc_count for r in cells) == 3
    assert max(r.doc_count for r in cells) == 2  # the two Paris points share a cell
    tiles = run_search(pts, {"aggs": {
        "t": {"geotile_grid": {"precision": 3, "size": 5}},
    }})["t"].collect()
    assert sum(r.doc_count for r in tiles) == 3
    assert all(r.key.startswith("3/") for r in tiles)


def test_top_hits_under_terms_with_size_pruning(spark):
    rows = [
        # etype, id, val — 'a' has 3 docs, 'b' 2, 'c' 1; terms size=2 keeps a,b
        ("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 7.0),
        ("b", 4, 1.0), ("b", 5, 3.0),
        ("c", 6, 99.0),
    ]
    df = spark.createDataFrame(rows, "etype string, doc long, value double")
    out = run_search(df, {"aggs": {"t": {
        "terms": {"field": "etype", "size": 2},
        "aggs": {"best": {"top_hits": {
            "size": 2, "sort": [{"value": {"order": "desc"}}],
            "_source": [], "id_field": "doc",
        }}},
    }}})["t"]
    got = [(r.etype, r.rank, r.doc) for r in out.collect()]
    assert got == [("a", 1, 2), ("a", 2, 3), ("b", 1, 5), ("b", 2, 4)]


def test_terms_size_prunes_nested_proportional_sum(spark):
    # the r5 ADVICE case: terms size must truncate BEFORE the nested psum
    rows = [
        ("big", 0, 100, 10.0, None), ("big", 100, 200, 20.0, None),
        ("big", 200, 300, 30.0, None),
        ("small", 0, 100, 99.0, None),
    ]
    df = spark.createDataFrame(rows, "etype string, " + FLOWS)
    out = run_search(df, {"aggs": {"t": {
        "terms": {"field": "etype", "size": 1},
        "aggs": {"hist": {"proportional_sum": {
            "fields": ["start_ms", "end_ms", "value"], "interval": 100,
        }}},
    }}})["t"]
    rows = [(r.etype, r.key, r.value) for r in out.collect()]
    # bucket 300 is the reference's inclusive terminal bucket (the last flow
    # ends exactly on the boundary — zero-duration touch, zero contribution)
    assert rows == [
        ("big", 0, 10.0), ("big", 100, 20.0),
        ("big", 200, 30.0), ("big", 300, 0.0),
    ]


def test_cardinality_at_leaf_of_terms_in_terms(spark):
    rows = [("a", 1, 10), ("a", 1, 11), ("a", 2, 12), ("b", 3, 13)]
    df = spark.createDataFrame(rows, "etype string, u long, item long")
    out = run_search(df, {"aggs": {"t": {
        "terms": {"field": "etype", "size": 10},
        "aggs": {"inner": {
            "terms": {"field": "u", "size": 10},
            "aggs": {"card": {"cardinality": {"field": "item"}}},
        }},
    }}})["t"]
    got = {(r.etype, r.u): (r.doc_count, r.card) for r in out.collect()}
    assert got == {("a", 1): (2, 2), ("a", 2): (1, 1), ("b", 3): (1, 1)}


def test_render_response_bucket_cap(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        render_response,
    )

    flows = spark.createDataFrame(
        [(i * 100, i * 100, 1.0, None) for i in range(10)], FLOWS
    )
    res = run_search(flows, {"aggs": {"h": {"proportional_sum": {
        "fields": ["start_ms", "end_ms", "value"], "interval": 100,
    }}}})
    with pytest.raises(ValueError, match="max_buckets"):
        render_response(res, max_buckets=5)
    ok = render_response(res, max_buckets=100)
    assert len(ok["aggregations"]["h"]["buckets"]) == 10


def test_filter_agg_node(spark):
    flows = spark.createDataFrame(
        [(0, 100, 10.0, None), (0, 100, 90.0, None), (0, 100, 50.0, None)],
        FLOWS,
    ).withColumn("tag", F.when(F.col("value") >= 50, "big").otherwise("small"))
    # bare filter -> one-bucket doc_count
    out = run_search(flows, {"aggs": {"big_docs": {
        "filter": {"term": {"tag": "big"}},
    }}})["big_docs"]
    assert out.collect()[0].doc_count == 2
    # filter narrowing a nested sub-agg (ES's context-nesting semantics)
    out2 = run_search(flows, {"aggs": {"big": {
        "filter": {"term": {"tag": "big"}},
        "aggs": {"total": {"sum": {"field": "value"}}},
    }}})["big"]
    assert out2.collect()[0][0] == 140.0


def test_date_histogram_time_zone_and_format(spark):
    # 23:00 UTC on Jan 1 is Jan 1 in UTC but Jan 2 in UTC+2 — tz-aware
    # day rounding through the compiler must shift the bucket
    t = 1_704_150_000_000  # 2024-01-01T23:00:00Z
    ev = spark.createDataFrame([(t, t, 1.0, None)], FLOWS)
    body_utc = {"aggs": {"d": {"date_histogram": {
        "field": "start_ms", "calendar_interval": "day",
    }}}}
    body_tz = {"aggs": {"d": {"date_histogram": {
        "field": "start_ms", "calendar_interval": "day",
        "time_zone": "Etc/GMT-2", "format": "yyyy-MM-dd",
    }}}}
    k_utc = run_search(ev, body_utc)["d"].collect()[0].key
    row_tz = run_search(ev, body_tz)["d"].collect()[0]
    assert k_utc == 1_704_067_200_000          # 2024-01-01T00:00Z
    assert row_tz.key == 1_704_146_400_000      # 2024-01-01T22:00Z == Jan 2 00:00+02
    assert row_tz.key_as_string == "2024-01-02"


def test_stats_and_percentiles_sibling_pipelines(spark):
    flows = spark.createDataFrame(
        [(100, 100, 10.0, None), (200, 200, 30.0, None), (300, 300, 20.0, None)],
        FLOWS,
    )
    body = {"aggs": {
        "hist": {"proportional_sum": {
            "fields": ["start_ms", "end_ms", "value"], "interval": 100,
        }},
        "stats": {"stats_bucket": {"buckets_path": "hist>value"}},
        "pcts": {"percentiles_bucket": {
            "buckets_path": "hist>value", "percents": [50],
        }},
    }}
    out = run_search(flows, body)
    s = out["stats"].collect()[0]
    assert (s["count"], s["min"], s["max"], s["avg"], s["sum"]) == (
        3, 10.0, 30.0, 20.0, 60.0)
    p = out["pcts"].collect()
    assert [(r.pct, r.value) for r in p] == [(50.0, 20.0)]


def test_metric_subaggs_under_range_histogram_date_range(spark):
    """r6: ES metric sub-aggs under range / histogram / date_range compute
    in the SAME aggregation; empty ranges keep NULL metrics (the ES
    null-sub-agg-on-empty-bucket contract)."""
    df = spark.createDataFrame(
        [(5.0, 100.0), (15.0, 200.0), (18.0, 300.0)], "v double, w double"
    )
    rng = run_search(df, {"aggs": {"r": {
        "range": {"field": "v", "ranges": [
            {"to": 10}, {"from": 10, "to": 20}, {"from": 50},
        ]},
        "aggs": {"peak": {"max": {"field": "w"}}},
    }}})["r"]
    got = {r.key: (r.doc_count, r.peak) for r in rng.collect()}
    assert got == {"*-10": (1, 100.0), "10-20": (2, 300.0), "50-*": (0, None)}

    hist = run_search(df, {"aggs": {"h": {
        "histogram": {"field": "v", "interval": 10},
        "aggs": {"total": {"sum": {"field": "w"}}},
    }}})["h"]
    assert {r.key: (r.doc_count, r.total) for r in hist.collect()} == {
        0.0: (1, 100.0), 10.0: (2, 500.0)}

    ev = spark.createDataFrame(
        [(1_704_067_200_000, 7.0), (1_706_745_600_000, 9.0)], "t long, w double"
    )
    dr = run_search(ev, {"aggs": {"d": {
        "date_range": {"field": "t", "ranges": [
            {"from": "2024-01-01", "to": "2024-02-01"},
            {"from": "2024-02-01"},
        ]},
        "aggs": {"avg_w": {"avg": {"field": "w"}}},
    }}})["d"]
    got = {r.key: (r.doc_count, r.avg_w) for r in dr.collect()}
    assert got == {
        "2024-01-01-2024-02-01": (1, 7.0), "2024-02-01-*": (1, 9.0)}


def test_terms_order_and_missing(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0), ("c", 5.0), (None, 7.0)],
        "k string, v double",
    )
    # order by metric: size prunes BY THE ORDER (ES contract), not by count
    body = {"aggs": {"t": {
        "terms": {"field": "k", "size": 2, "order": {"peak": "desc"},
                  "missing": "_na_"},
        "aggs": {"peak": {"max": {"field": "v"}}},
    }}}
    rows = [(r.k, r.doc_count, r.peak)
            for r in run_search(df, body)["t"].collect()]
    # peaks: b=9, _na_=7, c=5, a=2 -> top2 by peak = b, _na_ (a has the
    # highest count but loses under metric order; NULL k bucketed as _na_)
    assert rows == [("b", 1, 9.0), ("_na_", 1, 7.0)]

    # _key asc ordering
    body2 = {"aggs": {"t": {"terms": {"field": "k", "size": 3,
                                      "order": {"_key": "asc"}}}}}
    keys = [r.k for r in run_search(df, body2)["t"].collect()]
    assert keys == ["a", "b", "c"]  # NULL k dropped without missing=

    # unknown order key raises loudly
    with pytest.raises(ValueError, match="order key"):
        run_search(df, {"aggs": {"t": {
            "terms": {"field": "k", "order": {"nope": "desc"}}}}})
    # order on a level owning a bucket child raises loudly
    with pytest.raises(ValueError, match="leaf"):
        run_search(df, {"aggs": {"t": {
            "terms": {"field": "k", "order": {"_key": "asc"}},
            "aggs": {"i": {"terms": {"field": "k"}}},
        }}})


def test_percentiles_under_terms(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    out = run_search(df, {"aggs": {"t": {
        "terms": {"field": "k", "size": 10},
        "aggs": {"p": {"percentiles": {
            "field": "v", "percents": [50], "quantize": 1}}},
    }}})["t"]
    got = [(r.k, r.pct, r.value_q) for r in out.collect()]
    assert got == [("a", 50.0, 20), ("b", 50.0, 100)]


def test_render_response_percentile_and_multirow_frames(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        render_response,
    )

    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "value double")
    res = run_search(df, {"aggs": {
        "p": {"percentiles": {"field": "value", "percents": [50, 75], "quantize": 1}},
        "r": {"percentile_ranks": {"field": "value", "values": [2.0, 4.0]}},
    }})
    resp = render_response(res)["aggregations"]
    assert resp["p"] == {"values": {"50.0": 25, "75.0": 32}}
    assert resp["r"] == {"values": [
        {"at_value": 2.0, "rank_q": 500000},
        {"at_value": 4.0, "rank_q": 1000000},
    ]}


def test_global_and_auto_date_histogram_nodes(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 30.0)], "k string, v double"
    )
    body = {
        "query": {"term": {"k": "a"}},
        "aggs": {
            "filtered_total": {"sum": {"field": "v"}},
            "all_docs": {"global": {}},
            "all_total": {"global": {},
                          "aggs": {"t": {"sum": {"field": "v"}}}},
        },
    }
    out = run_search(df, body)
    assert out["filtered_total"].collect()[0][0] == 30.0  # query applies
    assert out["all_docs"].collect()[0].doc_count == 3    # global escapes it
    assert out["all_total"].collect()[0][0] == 60.0

    # runtime fields are visible to global aggs too (ES computes runtime
    # mappings before query/agg evaluation; the global node escapes only
    # the QUERY, not the mapping)
    rt_body = {
        "runtime_mappings": {"v2": {"script": {"source": "v * 2"}}},
        "query": {"term": {"k": "a"}},
        "aggs": {"all_v2": {"global": {},
                            "aggs": {"t": {"sum": {"field": "v2"}}}}},
    }
    assert run_search(df, rt_body)["all_v2"].collect()[0][0] == 120.0
    assert run_search.__doc__ is not None  # docstring not shadowed

    ev = spark.createDataFrame(
        [(i * 3_600_000,) for i in range(48)], "t long"
    )
    adh = run_search(ev, {"aggs": {"h": {
        "auto_date_histogram": {"field": "t", "buckets": 6},
    }}})["h"]
    rows = adh.collect()
    assert 1 <= len(rows) <= 6
    assert sum(r.doc_count for r in rows) == 48


def test_standalone_metric_family_nodes(spark):
    """Round-6 compiler widening: every standalone metric/bucket family
    the engine registers dispatches from a body to the SAME frame the
    operator produces directly (the operators are the oracle-paired
    layer, so compiled == direct pins the glue)."""
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        extended_stats_agg, matrix_stats, top_metrics, value_stats_agg,
        weighted_avg,
    )
    from elasticsearch_drift_plugin_spark.operators.es_metrics import (
        adjacency_matrix_agg, boxplot_agg, categorize_text, mad_agg,
        rare_terms_agg, string_stats_agg, t_test_agg,
        variable_width_histogram,
    )

    rows = [(i, float(i % 7) + 0.25, float(i % 3) + 1.0,
             f"msg {i % 4} boot", "k%d" % (i % 5)) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, value double, w double, text string, tag string"
    )

    def same(body_node, direct):
        (name,) = body_node
        got = run_search(df, {"aggs": body_node})[name]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, direct.collect())
        ), name

    same({"st": {"stats": {"field": "value"}}},
         value_stats_agg(df, [], "value"))
    same({"xs": {"extended_stats": {"field": "value"}}},
         extended_stats_agg(df, [], "value"))
    same({"wa": {"weighted_avg": {"value": {"field": "value"},
                                  "weight": {"field": "w"}}}},
         weighted_avg(df, [], "value", "w"))
    same({"mad": {"median_absolute_deviation": {"field": "value"}}},
         mad_agg(df, "value", []))
    same({"bx": {"boxplot": {"field": "value"}}},
         boxplot_agg(df, "value", []))
    same({"ss": {"string_stats": {"field": "text"}}},
         string_stats_agg(df, "text", []))
    same({"mx": {"matrix_stats": {"fields": ["value", "w"]}}},
         matrix_stats(df, "value", "w"))
    same({"tt": {"t_test": {"a": {"field": "value",
                                  "filter": {"term": {"tag": "k1"}}},
                            "b": {"filter": {"term": {"tag": "k2"}}}}}},
         t_test_agg(df, "value", "tag = 'k1'", "tag = 'k2'"))
    same({"tm": {"top_metrics": {"metrics": [{"field": "w"}],
                                 "sort": [{"value": {"order": "desc"}}]}}},
         top_metrics(df, [], "value", ["w"], descending=True))
    same({"rt": {"rare_terms": {"field": "tag", "max_doc_count": 8}}},
         rare_terms_agg(df, "tag", max_doc_count=8))
    same({"adj": {"adjacency_matrix": {"filters": {
              "k1": {"term": {"tag": "k1"}},
              "big": {"range": {"value": {"gte": 3}}}}}}},
         adjacency_matrix_agg(df, {"k1": "tag = 'k1'", "big": "value >= 3"}))
    same({"vw": {"variable_width_histogram": {"field": "value",
                                              "buckets": 4}}},
         variable_width_histogram(df, "value", buckets=4))
    same({"ct": {"categorize_text": {"field": "text", "size": 3,
                                     "id_field": "doc_id"}}},
         categorize_text(df, "text", size=3))


def test_significant_text_and_geo_point_nodes(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import significant_text
    from elasticsearch_drift_plugin_spark.operators.geo import (
        geo_bounds_agg, geo_centroid_agg,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "alpha gamma", "en"),
         (3, "delta beta", "fr"), (4, "alpha delta", "fr")],
        "doc_id long, text string, lang string",
    )
    got = run_search(docs, {"aggs": {"sig": {"significant_text": {
        "field": "text", "foreground": {"term": {"lang": "en"}},
        "size": 3, "min_doc_count": 1}}}})["sig"]
    want = significant_text(docs, "text", "lang = 'en'", size=3, min_doc_count=1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # background_filter narrows the BACKGROUND set (bg counts/totals over
    # matching docs only); foreground unchanged. Excluding doc 4 from the
    # background: bg for 'alpha' drops 3→2, 'delta' 2→1
    bg = run_search(docs, {"aggs": {"sig": {"significant_text": {
        "field": "text", "foreground": {"term": {"lang": "en"}},
        "background_filter": {"range": {"doc_id": {"lte": 3}}},
        "size": 10, "min_doc_count": 1}}}})["sig"]
    rows = {r.key: (r.fg_count, r.bg_count) for r in bg.collect()}
    assert rows["alpha"] == (2, 2) and rows["beta"] == (1, 2)
    assert rows["gamma"] == (1, 1)
    # 'delta' is foreground-absent (fg_count 0 < min_doc_count 1) -> pruned
    assert "delta" not in rows

    pts = spark.createDataFrame(
        [(10.0, 20.0), (-5.0, 40.0), (2.5, -30.0)], "lat double, lon double"
    )
    gb = run_search(pts, {"aggs": {"gb": {"geo_bounds": {}}}})["gb"]
    assert sorted(map(tuple, gb.collect())) == sorted(
        map(tuple, geo_bounds_agg(pts, []).collect())
    )
    gc = run_search(pts, {"aggs": {"gc": {"geo_centroid": {}}}})["gc"]
    assert sorted(map(tuple, gc.collect())) == sorted(
        map(tuple, geo_centroid_agg(pts, []).collect())
    )


def test_random_sampler_node_and_loud_failures(spark):
    from elasticsearch_drift_plugin_spark.operators.es_metrics import (
        random_sampler_agg,
    )

    ev = spark.createDataFrame(
        [(i, float(i), "t%d" % (i % 3)) for i in range(60)],
        "event_id long, value double, event_type string",
    )
    got = run_search(ev, {"aggs": {"s": {
        "random_sampler": {"probability": 0.5},
        "aggs": {"by": {"terms": {"field": "event_type"}}},
    }}})["s"]
    want = random_sampler_agg(ev, ["event_type"], inv_probability=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    with pytest.raises(ValueError, match="1/k"):
        run_search(ev, {"aggs": {"s": {"random_sampler": {"probability": 0.3}}}})
    with pytest.raises(ValueError, match="plain terms"):
        run_search(ev, {"aggs": {"s": {
            "random_sampler": {"probability": 0.5},
            "aggs": {"m": {"avg": {"field": "value"}}},
        }}})
    with pytest.raises(ValueError, match="exactly two fields"):
        run_search(ev, {"aggs": {"m": {"matrix_stats": {
            "fields": ["value", "value", "value"]}}}})
    with pytest.raises(ValueError, match="same field"):
        run_search(ev, {"aggs": {"t": {"t_test": {
            "a": {"field": "value", "filter": {"term": {"event_type": "t0"}}},
            "b": {"field": "event_id", "filter": {"term": {"event_type": "t1"}}},
        }}}})


def test_date_histogram_under_terms(spark):
    """terms → date_histogram nests through the psum group_by route
    (date_histogram IS the degenerate proportional_sum), with the
    terms-level size pruning applied first and metric sub-aggs intact."""
    DAY = 86_400_000
    rows = []
    for i in range(12):
        rows.append(("a" if i % 2 else "b", (i % 3) * DAY + 1000, float(i)))
    rows.append(("c", 0, 99.0))  # the size=2 pruning victim (1 doc)
    df = spark.createDataFrame(rows, "tag string, t_ms long, v double")
    body = {
        "aggs": {
            "per_tag": {
                "terms": {"field": "tag", "size": 2},
                "aggs": {
                    "daily": {
                        "date_histogram": {"field": "t_ms", "calendar_interval": "day"},
                        "aggs": {"vmax": {"max": {"field": "v"}}},
                    },
                },
            },
        },
    }
    out = run_search(df, body)["per_tag"]
    got = {(r.tag, r.key): (r.doc_count, r.vmax) for r in out.collect()}
    assert set(r[0] for r in got) == {"a", "b"}  # c pruned by size=2
    # tag a: odd i in 0..11 -> i%3 buckets 0,1,2 with counts 2,2,2
    assert got[("a", 0 * DAY)][0] == 2 and got[("a", 0 * DAY)][1] == 9.0
    assert got[("b", 2 * DAY)] == (2, 8.0)
    assert len(got) == 6


def test_diversified_sampler_rate_geo_line_nodes(spark):
    from elasticsearch_drift_plugin_spark.operators.es_metrics import (
        diversified_sampler_terms, rate_agg,
    )
    from elasticsearch_drift_plugin_spark.operators.geo import geo_line_agg

    ev = spark.createDataFrame(
        [(i, (i * 37) % 11, "t%d" % (i % 3), float(i),
          1_700_000_000_000 + i * 86_400_000 // 2,
          float(i % 90) - 45.0, float(i % 180) - 90.0)
         for i in range(50)],
        "event_id long, user_id long, event_type string, value double,"
        " t_ms long, lat double, lon double",
    )
    got = run_search(ev, {"aggs": {"dv": {
        "diversified_sampler": {"field": "user_id", "max_docs_per_value": 2,
                                "shard_size": 20},
        "aggs": {"by": {"terms": {"field": "event_type"}}},
    }}})["dv"]
    want = diversified_sampler_terms(
        ev, "user_id", "event_type", max_docs_per_value=2, shard_size=20
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got = run_search(ev, {"aggs": {"r": {"rate": {"field": "value"}}}})["r"]
    want = rate_agg(ev, "t_ms", "value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # (amended r6) unit='hour' is now supported (integer divisor of a
    # month); week remains a loud error (fractional months)
    hr = run_search(ev, {"aggs": {"r": {"rate": {"field": "value",
                                                 "unit": "hour"}}}})["r"]
    assert all(r.unit_intervals % 24 == 0 for r in hr.collect())
    with pytest.raises(ValueError, match="integer divisor"):
        run_search(ev, {"aggs": {"r": {"rate": {"field": "value",
                                                "unit": "week"}}}})

    got = run_search(ev, {"aggs": {"ln": {"geo_line": {
        "sort": {"field": "t_ms"}, "size": 10}}}})["ln"]
    want = geo_line_agg(ev, [], sort_col="t_ms", size=10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # (amended r10) sort_order desc is supported: newest-first track,
    # same point budget; a bogus order still raises
    dsc = run_search(ev, {"aggs": {"ln": {"geo_line": {
        "sort": {"field": "t_ms"}, "sort_order": "desc", "size": 10}}}})["ln"]
    (a,), (d,) = want.collect(), dsc.collect()
    assert d["n_points"] == a["n_points"]
    assert d["line"].split(" ")[0] == a["line"].split(" ")[-1] or d["line"] != a["line"]
    with pytest.raises(ValueError, match="sort_order"):
        run_search(ev, {"aggs": {"ln": {"geo_line": {
            "sort": {"field": "t_ms"}, "sort_order": "sideways"}}}})


def test_composite_date_histogram_source(spark):
    DAY = 86_400_000
    df = spark.createDataFrame(
        [("a", 0 * DAY + 5), ("a", 0 * DAY + 9), ("a", 1 * DAY + 1),
         ("b", 0 * DAY + 2), ("b", 2 * DAY + 7)],
        "tag string, t_ms long",
    )
    body = {"aggs": {"page": {"composite": {
        "size": 3,
        "sources": [
            {"day": {"date_histogram": {"field": "t_ms",
                                        "fixed_interval": "1d"}}},
            {"tag": {"terms": {"field": "tag"}}},
        ],
    }}}}
    out = run_search(df, body)["page"]
    rows = [(r.day, r.tag, r.doc_count) for r in out.collect()]
    assert rows == [(0, "a", 2), (0, "b", 1), (DAY, "a", 1)]
    # after-cursor resumes strictly past the page
    body["aggs"]["page"]["composite"]["after"] = {"day": DAY, "tag": "a"}
    out2 = run_search(df, body)["page"]
    assert [(r.day, r.tag, r.doc_count) for r in out2.collect()] == [
        (2 * DAY, "b", 1)
    ]
    # (amended r10) ALL calendar units are supported: month/quarter/year
    # via date_trunc, sub-month as anchored fixed floors. Week floors to
    # Monday (epoch day 0 is a Thursday: 0..3*DAY land in the week of
    # 1969-12-29, i.e. key -3*DAY).
    wk = run_search(df, {"aggs": {"p": {"composite": {"sources": [
        {"w": {"date_histogram": {"field": "t_ms",
                                  "calendar_interval": "week"}}},
    ]}}}})["p"].collect()
    assert [(r.w, r.doc_count) for r in wk] == [(-3 * DAY, 5)]


def test_serial_diff_bucket_script_normalize_pipeline(spark):
    ev = spark.createDataFrame(
        [(50, 1.0), (150, 3.0), (250, 5.0), (350, 11.0)], "t long, v double"
    )
    body = {"aggs": {"hist": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {
            "vsum": {"sum": {"field": "v"}},
            "d2": {"serial_diff": {"buckets_path": "vsum", "lag": 2}},
            "ratio": {"bucket_script": {
                "buckets_path": {"v": "vsum", "n": "_count"},
                "script": "params.v / params.n",
            }},
            "pct": {"normalize": {"buckets_path": "vsum",
                                  "method": "percent_of_sum"}},
            "r01": {"normalize": {"buckets_path": "vsum",
                                  "method": "rescale_0_1", "quantize": 3}},
        },
    }}}
    rows = [(r.key, r.vsum, r.d2, r.ratio, r.pct, r.r01)
            for r in run_search(ev, body)["hist"].collect()]
    assert rows == [
        (0, 1.0, None, 1.0, 0.05, 0),
        (100, 3.0, None, 3.0, 0.15, 200),
        (200, 5.0, 4.0, 5.0, 0.25, 400),
        (300, 11.0, 8.0, 11.0, 0.55, 1000),
    ]
    # zero-lag and unknown methods refuse loudly
    import pytest as _pt
    with _pt.raises(ValueError, match="lag"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": 100},
            "aggs": {"x": {"serial_diff": {"buckets_path": "_count",
                                           "lag": 0}}}}}})
    with _pt.raises(ValueError, match="normalize method"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": 100},
            "aggs": {"x": {"normalize": {"buckets_path": "_count",
                                         "method": "median"}}}}}})
    with _pt.raises(ValueError, match="params not in buckets_path"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": 100},
            "aggs": {"x": {"bucket_script": {"buckets_path": {"v": "_count"},
                                             "script": "params.v + params.w"}}}}}})


def test_nested_reverse_nested_nodes(spark):
    # two parent docs with nested item arrays — the ES nested-mapping shape
    rows = [
        (1, "A", [("r", 2.0), ("g", 3.0)]),
        (2, "B", [("r", 5.0)]),
        (3, "A", []),
    ]
    df = spark.createDataFrame(
        rows,
        "order_id long, prio string, "
        "items array<struct<flag string, qty double>>",
    )
    # bare nested: doc_count = number of NESTED docs (empty arrays drop)
    out = run_search(df, {"aggs": {"n": {"nested": {"path": "items"}}}})["n"]
    assert out.collect()[0].doc_count == 3
    # nested > terms(flag) + sum(qty) + reverse_nested parent count
    body = {"aggs": {"n": {
        "nested": {"path": "items"},
        "aggs": {"by_flag": {
            "terms": {"field": "items.flag"},
            "aggs": {
                "q": {"sum": {"field": "items.qty"}},
                "parents": {"reverse_nested": {}},
            },
        }},
    }}}
    out = run_search(df, body)["n"]
    got = {r["items.flag"]: (r.doc_count, r.q, r.parents)
           for r in out.collect()}
    assert got == {"r": (2, 7.0, 2), "g": (1, 3.0, 1)}
    # loud failures: bad path, reverse_nested outside nested
    import pytest as _pt
    with _pt.raises(ValueError, match="array<struct"):
        run_search(df, {"aggs": {"n": {"nested": {"path": "prio"}}}})
    with _pt.raises(ValueError, match="nested context"):
        run_search(df, {"aggs": {"t": {
            "terms": {"field": "prio"},
            "aggs": {"p": {"reverse_nested": {}}}}}})


def test_geo_distance_node(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (0.0, 10.0, 2.0), (0.0, 30.0, 4.0)],
        "lat double, lon double, value double",
    )
    body = {"aggs": {"rings": {"geo_distance": {
        "origin": {"lat": 0.0, "lon": 0.0},
        "unit": "km",
        "ranges": [{"to": 1000}, {"from": 1000, "to": 3000}, {"from": 3000}],
    }}}}
    out = run_search(df, body)["rings"]
    rows = [(r.key, r.doc_count) for r in out.collect()]
    assert rows == [("*-1000.0", 1), ("1000.0-3000.0", 1), ("3000.0-*", 1)]
    import pytest as _pt
    with _pt.raises(ValueError, match="contiguous"):
        run_search(df, {"aggs": {"r": {"geo_distance": {
            "origin": "0,0", "unit": "km",
            "ranges": [{"from": 500, "to": 1000}, {"from": 1000}]}}}})
    with _pt.raises(ValueError, match="omit"):
        run_search(df, {"aggs": {"r": {"geo_distance": {
            "origin": "0,0", "unit": "km",
            "ranges": [{"to": 1000}, {"from": 1000, "to": 3000}]}}}})


def test_ip_range_node(spark):
    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.1.5",), ("192.168.1.1",), (None,)],
        "src string",
    )
    body = {"aggs": {"nets": {"ip_range": {"field": "src", "ranges": [
        {"to": "10.0.1.0"},
        {"from": "10.0.1.0", "to": "11.0.0.0", "key": "lab"},
        {"mask": "192.168.1.77/16"},
        {"from": "10.0.0.0", "to": "11.0.0.0"},  # overlap: catches both 10.x
    ]}}}}
    out = run_search(df, body)["nets"]
    rows = [(r.key, r.doc_count) for r in out.collect()]
    assert rows == [
        ("*-10.0.1.0", 1),
        ("lab", 1),
        ("192.168.1.77/16", 1),
        ("10.0.0.0-11.0.0.0", 2),
    ]


def test_sampler_node(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)],
        "event_id long, tag string",
    )
    # cap smaller than the data: exactly shard_size docs survive
    out = run_search(df, {"aggs": {"s": {"sampler": {"shard_size": 4}}}})["s"]
    assert out.collect()[0].doc_count == 4
    # deterministic: same body twice -> identical sampled terms buckets
    body = {"aggs": {"s": {"sampler": {"shard_size": 4},
                           "aggs": {"t": {"terms": {"field": "tag"}}}}}}
    a = [(r.tag, r.doc_count) for r in run_search(df, body)["s"].collect()]
    b = [(r.tag, r.doc_count) for r in run_search(df, body)["s"].collect()]
    assert a == b and sum(n for _, n in a) == 4


def test_frequent_item_sets_node(spark):
    df = spark.createDataFrame(
        [(1, "red", "L"), (2, "red", "L"), (3, "red", "M")],
        "event_id long, color string, sz string",
    )
    body = {"aggs": {"fis": {"frequent_item_sets": {
        "fields": [{"field": "color"}, {"field": "sz"}],
        "minimum_support": 0.5, "minimum_set_size": 2, "size": 5,
    }}}}
    out = run_search(df, body)["fis"]
    rows = [(r.items, r.set_size, r.support) for r in out.collect()]
    assert ("color:red+sz:L", 2, 2) in rows
    assert all(s >= 2 for _, _, s in rows)
    # minimum_support=1.0 is a legal ES FRACTION ("in 100% of baskets"),
    # not the absolute count 1 — only color:red spans all 3 baskets, and
    # no 2-item set does, so the strictest setting returns nothing
    strict = {"aggs": {"fis": {"frequent_item_sets": {
        "fields": [{"field": "color"}, {"field": "sz"}],
        "minimum_support": 1.0, "minimum_set_size": 2, "size": 5,
    }}}}
    assert run_search(df, strict)["fis"].count() == 0


def test_change_point_bucket_correlation_siblings(spark):
    # step series: 1,1,1,10,10 at keys 0..400 — change at key 300
    ev = spark.createDataFrame(
        [(50, 1.0), (150, 1.0), (250, 1.0), (350, 10.0), (450, 10.0)],
        "t long, v double",
    )
    body = {"aggs": {
        "hist": {"date_histogram": {"field": "t", "fixed_interval": 100},
                 "aggs": {"vs": {"sum": {"field": "v"}}}},
        "cp": {"change_point": {"buckets_path": "hist>vs"}},
        "corr": {"bucket_correlation": {
            "buckets_path": "hist>vs",
            "function": {"count_correlation": {"indicator": {
                "expectations": [1.0, 1.0, 1.0, 10.0, 10.0]}}},
        }},
    }}
    res = run_search(ev, body)
    cp = res["cp"].collect()[0]
    assert cp.change_key == 300 and cp.n_before == 3 and cp.n_after == 2
    corr = res["corr"].collect()[0][0]
    assert abs(corr - 1.0) < 1e-12
    # indicator length mismatch raises at execution
    import pytest as _pt
    bad = {"aggs": {
        "hist": {"date_histogram": {"field": "t", "fixed_interval": 100},
                 "aggs": {"vs": {"sum": {"field": "v"}}}},
        "corr": {"bucket_correlation": {
            "buckets_path": "hist>vs",
            "function": {"count_correlation": {"indicator": {
                "expectations": [1.0, 2.0]}}},
        }},
    }}
    with _pt.raises(Exception, match="does not match the bucket count"):
        run_search(ev, bad)["corr"].collect()
    # the OTHER direction — fewer buckets (5) than expectations (7) — must
    # raise too, not silently return a partial Pearson over matched pairs
    bad2 = {"aggs": {
        "hist": {"date_histogram": {"field": "t", "fixed_interval": 100},
                 "aggs": {"vs": {"sum": {"field": "v"}}}},
        "corr": {"bucket_correlation": {
            "buckets_path": "hist>vs",
            "function": {"count_correlation": {"indicator": {
                "expectations": [1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 10.0]}}},
        }},
    }}
    with _pt.raises(Exception, match="does not match the bucket count"):
        run_search(ev, bad2)["corr"].collect()


def test_cumulative_cardinality_under_date_histogram(spark):
    # users: u1 @0, u1+u2 @100, u2 @200, u3 @300 -> running distinct 1,2,2,3
    ev = spark.createDataFrame(
        [(50, "u1"), (150, "u1"), (160, "u2"), (250, "u2"), (350, "u3")],
        "t long, uid string",
    )
    body = {"aggs": {"hist": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {
            "u": {"cardinality": {"field": "uid"}},
            "cu": {"cumulative_cardinality": {"buckets_path": "u"}},
        },
    }}}
    rows = [(r.key, r.u, r.cu) for r in run_search(ev, body)["hist"].collect()]
    assert rows == [(0, 1, 1), (100, 2, 2), (200, 1, 2), (300, 1, 3)]
    import pytest as _pt
    with _pt.raises(ValueError, match="cardinality metric sibling"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": 100},
            "aggs": {"cu": {"cumulative_cardinality": {"buckets_path": "x"}}},
        }}})
    # (amended r10) calendar grids are supported (date_trunc first-seen
    # keys); with all five samples inside one month the running distinct
    # is the total
    cal = run_search(ev, {"aggs": {"h": {
        "date_histogram": {"field": "t", "calendar_interval": "month"},
        "aggs": {"u": {"cardinality": {"field": "uid"}},
                 "cu": {"cumulative_cardinality": {"buckets_path": "u"}}},
    }}})["h"].collect()
    assert [(r.u, r.cu) for r in cal] == [(3, 3)]
    # calendar + offset GRADUATED r11 (shifted floor trunc(t-off)+off;
    # golden + alias-normalization pins live in tests/test_round11.py) —
    # it must compile and keep every key/cum non-NULL
    cal_off = run_search(ev, {"aggs": {"h": {
        "date_histogram": {"field": "t", "calendar_interval": "month",
                           "offset": "1h"},
        "aggs": {"u": {"cardinality": {"field": "uid"}},
                 "cu": {"cumulative_cardinality": {"buckets_path": "u"}}},
    }}})["h"].collect()
    assert [(r.u, r.cu) for r in cal_off] == [(3, 3)]
    assert all(r.key is not None for r in cal_off)
    # time_zone on the cumcard grid GRADUATED (r11 second pass): the
    # zone-aware first-seen floor compiles and keeps keys non-NULL (the
    # DST golden lives in tests/test_round11.py); unknown zones raise
    cal_tz = run_search(ev, {"aggs": {"h": {
        "date_histogram": {"field": "t", "calendar_interval": "month",
                           "time_zone": "Europe/Berlin"},
        "aggs": {"u": {"cardinality": {"field": "uid"}},
                 "cu": {"cumulative_cardinality": {"buckets_path": "u"}}},
    }}})["h"].collect()
    assert [(r.u, r.cu) for r in cal_tz] == [(3, 3)]
    assert all(r.key is not None for r in cal_tz)
    with _pt.raises(ValueError, match="unknown time zone"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "calendar_interval": "month",
                               "time_zone": "Not/AZone"},
            "aggs": {"u": {"cardinality": {"field": "uid"}},
                     "cu": {"cumulative_cardinality": {"buckets_path": "u"}}},
        }}})


def test_histogram_pipes_and_ks_test_sibling(spark):
    ev = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 2.0), ("a", 30.0, 4.0),
         ("b", 10.0, 5.0), ("b", 20.0, 5.0), ("b", 30.0, 5.0)],
        "g string, x double, v double",
    )
    # plain histogram now takes pipeline sub-aggs
    body = {"aggs": {"h": {
        "histogram": {"field": "x", "interval": 10},
        "aggs": {"vs": {"sum": {"field": "v"}},
                 "run": {"cumulative_sum": {"buckets_path": "vs"}}},
    }}}
    rows = [(r.key, r.vs, r.run) for r in run_search(ev, body)["h"].collect()]
    assert rows == [(10.0, 6.0, 6.0), (20.0, 7.0, 13.0), (30.0, 9.0, 22.0)]
    # ks_test sibling over a grouped terms>date_histogram-like frame:
    # build via terms nesting is heavyweight here — use two histograms per
    # group through the grouped psum route instead
    body2 = {"aggs": {
        "per_g": {"terms": {"field": "g", "size": 10},
                  "aggs": {"h": {"date_histogram": {
                      "field": "x", "fixed_interval": 10},
                      "aggs": {"vs": {"sum": {"field": "v"}}}}}},
        "ks": {"bucket_count_ks_test": {
            "buckets_path": "per_g>vs", "group_by": "g",
            "a": "a", "b": "b", "quantize": 0}},
    }}
    ks = run_search(ev.withColumn("x", F.col("x").cast("long")), body2)["ks"]
    r = ks.collect()[0]
    # a-values {1,2,4}, b-values {5,5,5}: D = 1.0 at vq<5 (3/3 vs 0/3)
    assert (r.n_a, r.n_b, r.d_q) == (3, 3, 1_000_000)


def test_ip_prefix_and_standalone_top_hits(spark):
    df = spark.createDataFrame(
        [("10.0.0.5", 3.0), ("10.0.0.200", 1.0), ("10.0.1.7", 5.0),
         ("192.168.9.9", 2.0), (None, 9.0)],
        "src string, v double",
    )
    out = run_search(df, {"aggs": {"nets": {"ip_prefix": {
        "field": "src", "prefix_length": 24}}}})["nets"]
    assert [(r.key, r.prefix_length, r.doc_count) for r in out.collect()] == [
        ("10.0.0.0", 24, 2), ("10.0.1.0", 24, 1), ("192.168.9.0", 24, 1),
    ]
    top = run_search(df, {"aggs": {"best": {"top_hits": {
        "size": 2, "sort": [{"v": {"order": "desc"}}],
        "_source": {"includes": ["src"]}}}}})["best"]
    assert [(r.src, r.v) for r in top.collect()] == [
        (None, 9.0), ("10.0.1.7", 5.0)]
    # is_ipv6 GRADUATED r11: colon-hex text (full OR ::-compressed) parses
    # to the 8-group lattice, /plen masks per group, keys RFC 5952
    v6 = spark.createDataFrame(
        [("2001:db8:0:0:0:0:0:1",),      # full form
         ("2001:db8::2",),              # compressed, same /32 network
         ("2001:DB8:ffff::9",),         # uppercase hex, same /32
         ("fe80::1",), (None,)],
        "src string",
    )
    out6 = run_search(v6, {"aggs": {"n": {"ip_prefix": {
        "field": "src", "prefix_length": 32, "is_ipv6": True}}}})["n"]
    assert [(r.key, r.prefix_length, r.is_ipv6, r.doc_count)
            for r in out6.collect()] == [
        ("2001:db8::", 32, True, 3), ("fe80::", 32, True, 1),
    ]
    import pytest as _pt
    with _pt.raises(ValueError, match="prefix_length"):
        run_search(v6, {"aggs": {"n": {"ip_prefix": {
            "field": "src", "prefix_length": 129, "is_ipv6": True}}}})


def test_moving_percentiles_pipeline(spark):
    ev = spark.createDataFrame(
        [(50, 1.0), (150, 3.0), (250, 9.0), (350, 5.0)], "t long, v double"
    )
    body = {"aggs": {"h": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {
            "vs": {"sum": {"field": "v"}},
            "p50": {"moving_percentiles": {
                "buckets_path": "vs", "window": 3, "percent": 50.0}},
            "p100": {"moving_percentiles": {
                "buckets_path": "vs", "window": 2, "percent": 100.0,
                "quantize": 1}},
        },
    }}}
    rows = [(r.key, r.vs, r.p50, r.p100)
            for r in run_search(ev, body)["h"].collect()]
    # p50 over trailing 3 (current excluded): [],[1],[1,3],[1,3,9]
    # p100 over trailing 2 quantized x10:     [],[1],[1,3],[3,9]
    assert rows == [
        (0, 1.0, None, None),
        (100, 3.0, 1.0, 10),
        (200, 9.0, 2.0, 30),
        (300, 5.0, 3.0, 90),
    ]
    import pytest as _pt
    with _pt.raises(ValueError, match="percent"):
        run_search(ev, {"aggs": {"h": {
            "date_histogram": {"field": "t", "fixed_interval": 100},
            "aggs": {"x": {"moving_percentiles": {
                "buckets_path": "_count", "window": 2, "percent": 200}}}}}})


def test_hits_retrieval_sort_search_after(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 9.0), (3, "c", 9.0), (4, "d", 1.0),
         (5, "e", 7.0)],
        "doc_id long, tag string, v double",
    )
    body = {"size": 3, "sort": [{"v": {"order": "desc"}}, {"doc_id": "asc"}],
            "_source": {"includes": ["tag"]},
            "query": {"range": {"v": {"gt": 2}}}}
    hits = run_search(df, body)["_hits"]
    assert [(r.tag, r.v, r.doc_id) for r in hits.collect()] == [
        ("b", 9.0, 2), ("c", 9.0, 3), ("e", 7.0, 5)]
    # cursor: resume strictly after (9.0, 3)
    body2 = dict(body, search_after=[9.0, 3])
    assert [(r.tag, r.v, r.doc_id)
            for r in run_search(df, body2)["_hits"].collect()] == [
        ("e", 7.0, 5), ("a", 5.0, 1)]
    # offset form
    body3 = {"size": 2, "from": 1, "sort": [{"v": "desc"}, {"doc_id": "asc"}]}
    assert [r.doc_id for r in run_search(df, body3)["_hits"].collect()] == [3, 5]
    # bare size without sort keeps the historical aggs-only contract
    out = run_search(df, {"size": 3, "aggs": {"n": {"value_count": {"field": "v"}}}})
    assert "_hits" not in out
    import pytest as _pt
    with _pt.raises(ValueError, match="one value per sort entry"):
        run_search(df, dict(body, search_after=[9.0]))


def test_composite_order_desc_missing_bucket(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), (None, 1), (None, 2)],
        "tag string, n long",
    )
    # missing_bucket: nulls form a bucket that sorts FIRST asc
    body = {"aggs": {"p": {"composite": {"size": 10, "sources": [
        {"tag": {"terms": {"field": "tag", "missing_bucket": True}}},
    ]}}}}
    out = run_search(df, body)["p"]
    assert [(r.tag, r.doc_count) for r in out.collect()] == [
        (None, 2), ("a", 2), ("b", 1)]
    # desc flips the direction and nulls sort LAST
    body["aggs"]["p"]["composite"]["sources"][0]["tag"]["terms"]["order"] = "desc"
    out = run_search(df, body)["p"]
    assert [(r.tag, r.doc_count) for r in out.collect()] == [
        ("b", 1), ("a", 2), (None, 2)]
    # cursor resumes past a non-null key toward the null bucket (desc)
    body["aggs"]["p"]["composite"]["after"] = {"tag": "a"}
    out = run_search(df, body)["p"]
    assert [(r.tag, r.doc_count) for r in out.collect()] == [(None, 2)]
    # cursor AT the null bucket asc: only non-null follow
    body["aggs"]["p"]["composite"]["sources"][0]["tag"]["terms"]["order"] = "asc"
    body["aggs"]["p"]["composite"]["after"] = {"tag": None}
    out = run_search(df, body)["p"]
    assert [(r.tag, r.doc_count) for r in out.collect()] == [
        ("a", 2), ("b", 1)]


def test_knn_section(spark):
    # query along +x: cosine is v1 (1,0)=1 > v3 (1,1)=0.7071 == v4
    # (0.1,-0.1)=0.7071 (quantized tie → vec_id tie-break) > v2 (0,1)=0
    rows = [
        (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]), (4, [0.1, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    body = {
        "knn": {"field": "embedding", "query_vector": [1.0, 0.0], "k": 3},
        "size": 3,
    }
    out = run_search(df, body)["_hits"].collect()
    assert [r.vec_id for r in out] == [1, 3, 4]
    assert out[0]._score_q == 1_000_000  # cos=1 exactly
    # pre-filter applies BEFORE the top-k: all k hits satisfy it
    body["knn"]["filter"] = {"range": {"vec_id": {"gte": 2}}}
    out = run_search(df, body)["_hits"].collect()
    assert [r.vec_id for r in out] == [3, 4, 2]
    # dot_product similarity skips normalization
    body["knn"] = {
        "field": "embedding", "query_vector": [2.0, 0.0], "k": 1,
        "similarity": "dot_product",
    }
    out = run_search(df, body)["_hits"].collect()
    assert out[0].vec_id == 1 and out[0]._score_q == 2_000_000
    # `size` pages the k retrieved hits (ES returns min(k, size))
    out = run_search(df, {"knn": {"field": "embedding",
                                  "query_vector": [1.0, 0.0], "k": 3},
                          "size": 2})["_hits"].collect()
    assert [r.vec_id for r in out] == [1, 3]
    # the ES knn+query score-sum union is refused loudly
    with pytest.raises(ValueError, match="knn with a top-level"):
        run_search(df, {"knn": body["knn"], "query": {"term": {"vec_id": 1}}})
    # (amended r10) l2_norm is supported — rank by smallest distance
    # (deep pins in tests/test_round10.py); unknown kinds stay loud
    l2 = run_search(df, {"knn": {"field": "embedding",
                                 "query_vector": [1.0, 0.0], "k": 1,
                                 "similarity": "l2_norm"}})["_hits"].collect()
    assert l2[0].vec_id == 1
    with pytest.raises(ValueError, match="similarity"):
        run_search(df, {"knn": {"field": "embedding",
                                "query_vector": [1.0, 0.0], "k": 1,
                                "similarity": "hamming"}})


def test_terms_under_histogram(spark):
    # numeric histogram owning a terms child: one row per (bucket, term),
    # terms ranked per bucket (doc_count desc, key asc), child metric
    # leaves ride the same aggregation pass
    df = spark.createDataFrame(
        [(5, "a", 1.0), (7, "a", 2.0), (9, "b", 3.0),
         (15, "b", 4.0), (17, "b", 5.0), (19, "a", 6.0), (21, None, 7.0)],
        "n long, tag string, v double",
    )
    body = {"aggs": {"h": {
        "histogram": {"field": "n", "interval": 10},
        "aggs": {"tags": {"terms": {"field": "tag", "size": 1},
                          "aggs": {"mx": {"max": {"field": "v"}}}}},
    }}}
    rows = [(r.tag, r.key, r.doc_count, r.mx)
            for r in run_search(df, body)["h"].collect()]
    # bucket 0: a×2 beats b×1; bucket 10: b×2 beats a×1; the NULL-tag doc
    # (21) is dropped (ES terms semantics); size=1 keeps the winner only
    assert rows == [("a", 0.0, 2, 2.0), ("b", 10.0, 2, 5.0)]

    # date_histogram variant: same flattening through the psum route
    ev = spark.createDataFrame(
        [(50, "x"), (60, "x"), (70, "y"), (150, "y"), (160, "y")],
        "t long, tag string",
    )
    dh = {"aggs": {"h": {
        "date_histogram": {"field": "t", "fixed_interval": 100},
        "aggs": {"tags": {"terms": {"field": "tag", "size": 1}}},
    }}}
    got = [(r.tag, r.key, r.doc_count)
           for r in run_search(ev, dh)["h"].drop("key_ts").collect()]
    assert got == [("x", 0, 2), ("y", 100, 2)]

    # unsupported compositions stay loud: sibling metric beside the terms
    # child, and terms options beyond field/size
    with pytest.raises(ValueError, match="only non-pipeline sub-agg"):
        run_search(df, {"aggs": {"h": {
            "histogram": {"field": "n", "interval": 10},
            "aggs": {"tags": {"terms": {"field": "tag"}},
                     "mv": {"max": {"field": "v"}}},
        }}})
    with pytest.raises(ValueError, match="field/size only"):
        run_search(df, {"aggs": {"h": {
            "histogram": {"field": "n", "interval": 10},
            "aggs": {"tags": {"terms": {"field": "tag",
                                        "order": {"_key": "asc"}}}},
        }}})


def test_collapse_field_collapsing(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 9.0), (3, "b", 7.0), (4, "b", 3.0),
         (5, "c", 9.0)],
        "event_id long, grp string, value double",
    )
    body = {
        "size": 2,
        "sort": [{"value": {"order": "desc"}}, {"event_id": "asc"}],
        "collapse": {"field": "grp"},
        "_source": {"includes": ["event_id", "value"]},
    }
    # best per group: a->2(9.0), b->3(7.0), c->5(9.0); page of 2 by the
    # sort with event_id tie-break: (2, 9.0), (5, 9.0)
    out = run_search(df, body)["_hits"].collect()
    assert [(r.event_id, r.value) for r in out] == [(2, 9.0), (5, 9.0)]
    # search_after pages past the collapsed frontier, not the raw hits
    out = run_search(df, dict(body, search_after=[9.0, 2]))["_hits"].collect()
    assert [(r.event_id, r.value) for r in out] == [(5, 9.0), (3, 7.0)]
    # inner_hits → the reserved "_inner_hits" frame: top-size rows PER
    # collapse group under the inner sort (default: the body's sort)
    res = run_search(df, dict(body, collapse={
        "field": "grp", "inner_hits": {"name": "x", "size": 2}}))
    inner = [(r.grp, r.event_id, r._inner_rank)
             for r in res["_inner_hits"].collect()]
    assert inner == [("a", 2, 1), ("a", 1, 2),
                     ("b", 3, 1), ("b", 4, 2),
                     ("c", 5, 1)]
    # the collapsed hits page is unchanged by inner_hits
    assert [(r.event_id, r.value) for r in res["_hits"].collect()] == [
        (2, 9.0), (5, 9.0)]
    # an inner sort referencing a column outside the projection raises
    with pytest.raises(ValueError, match="not.*in the hits projection"):
        run_search(df, dict(body, collapse={
            "field": "grp",
            "inner_hits": {"sort": [{"missing_col": "asc"}]}}))["_inner_hits"]


def test_highlight_whole_field(spark):
    df = spark.createDataFrame(
        [(1, "fast data spark join data"), (2, "slow data row"),
         (3, "no match here")],
        "doc_id long, text string",
    )
    body = {
        "size": 10,
        "sort": [{"doc_id": "asc"}],
        "query": {"bool": {
            "must": [{"match": {"text": "data"}}],
            "should": [{"term": {"text": "join"}}],
            "must_not": [{"match": {"text": "absent"}}],
        }},
        "highlight": {"fields": {"text": {}}},
        "_source": {"includes": ["doc_id"]},
    }
    out = run_search(df, body)["_hits"].collect()
    # every query token wrapped (must + should, never must_not), token-
    # exact: "data" wraps, the substring inside other words would not
    assert [(r.doc_id, r.text_highlight) for r in out] == [
        (1, "fast <em>data</em> spark <em>join</em> <em>data</em>"),
        (2, "slow <em>data</em> row"),
    ]
    # custom tags
    body["highlight"]["pre_tags"], body["highlight"]["post_tags"] = ["*"], ["*"]
    out = run_search(df, body)["_hits"].collect()
    assert out[1].text_highlight == "slow *data* row"
    # (amended r10) fragmenting is supported (token windows — deep pins
    # in tests/test_round10.py); a negative count and a token-free query
    # stay loud
    frag = run_search(df, dict(body, highlight={
        "fields": {"text": {"number_of_fragments": 3}}}))["_hits"].collect()
    assert all("<em>" in r.text_highlight for r in frag)
    with pytest.raises(ValueError, match="number_of_fragments"):
        run_search(df, dict(body, highlight={
            "fields": {"text": {"number_of_fragments": -1}}}))
    with pytest.raises(ValueError, match="no highlightable tokens"):
        run_search(df, dict(body, query={"range": {"doc_id": {"gte": 0}}}))


def test_script_fields_and_fields_list(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 0.1), (2, 20.0, 0.5), (3, 30.0, 0.0)],
        "id long, price double, disc double",
    )
    body = {
        "size": 2,
        "query": {"range": {"price": {"gte": 15}}},
        "script_fields": {"rev_c": {"script": {
            "source": "cast(floor(price * (1.0 - disc) * 100.0) as bigint)"}}},
        "fields": ["id"],
        "sort": [{"rev_c": "desc"}, {"id": "asc"}],
    }
    out = run_search(df, body)["_hits"]
    assert out.columns == ["id", "rev_c"]
    assert [(r.id, r.rev_c) for r in out.collect()] == [(3, 3000), (2, 1000)]
    # a script field may not shadow an existing column
    with pytest.raises(ValueError, match="collides"):
        run_search(df, dict(body, script_fields={"price": {"script": {
            "source": "price"}}}))


def test_terms_include_exclude_min_doc_count(spark):
    df = spark.createDataFrame(
        [("aa",), ("aa",), ("aa",), ("ab",), ("ab",), ("bb",), ("cc",)],
        "tag string",
    )
    base = {"field": "tag", "size": 10, "order": {"_key": "asc"}}
    def terms(spec):
        return [
            (r.tag, r.doc_count)
            for r in run_search(df, {"aggs": {"t": {"terms": spec}}})["t"].collect()
        ]
    # include: anchored regex over bucket keys
    assert terms({**base, "include": "a.*"}) == [("aa", 3), ("ab", 2)]
    # include: explicit value list; exclude composes
    assert terms({**base, "include": ["aa", "bb", "cc"],
                  "exclude": ["cc"]}) == [("aa", 3), ("bb", 1)]
    # exclude regex
    assert terms({**base, "exclude": "a.*"}) == [("bb", 1), ("cc", 1)]
    # min_doc_count prunes sparse buckets before size/order
    assert terms({**base, "min_doc_count": 2}) == [("aa", 3), ("ab", 2)]
    # shard_size is accepted (exact engine: no-op)
    assert terms({**base, "shard_size": 500}) == [
        ("aa", 3), ("ab", 2), ("bb", 1), ("cc", 1)]
    # min_doc_count under a bucket-owning level raises
    with pytest.raises(ValueError, match="min_doc_count"):
        run_search(df.withColumn("v", F.lit(1.0)), {"aggs": {"t": {
            "terms": {"field": "tag", "min_doc_count": 2},
            "aggs": {"h": {"top_hits": {
                "size": 1, "sort": [{"v": {"order": "desc"}}]}}},
        }}})


def test_count_and_msearch(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        run_count,
        run_msearch,
    )

    ev = spark.createDataFrame(
        [(1, "click", 5.0), (2, "view", 9.0), (3, "click", 7.0)],
        "event_id long, event_type string, value double",
    )
    li = spark.createDataFrame([(1, 10.0)], "k long, v double")
    assert run_count(ev).collect()[0]["count"] == 3
    assert run_count(ev, {"query": {"term": {"event_type": "click"}}}) \
        .collect()[0]["count"] == 2
    res = run_msearch(
        {"events": ev, "items": li},
        [
            {"index": "events", "body": {"aggs": {"n": {
                "terms": {"field": "event_type",
                          "order": {"_key": "asc"}}}}}},
            {"index": "items", "body": {"aggs": {"s": {
                "max": {"field": "v"}}}}},
        ],
    )
    assert [(r.event_type, r.doc_count) for r in res[0]["n"].collect()] == [
        ("click", 2), ("view", 1)]
    assert res[1]["s"].collect()[0]["s"] == 10.0
    with pytest.raises(ValueError, match="msearch index"):
        run_msearch({"events": ev}, [{"index": "nope", "body": {}}])


def test_significant_terms_heuristics(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        significant_terms,
    )

    # fg: 4 docs (3×a, 1×b); bg adds 6×b, 2×c -> a is wildly significant
    rows = [("a", 1)] * 3 + [("b", 1)] + [("b", 0)] * 6 + [("c", 0)] * 2
    df = spark.createDataFrame(rows, "tag string, fg int")
    def top(score):
        out = significant_terms(df, "tag", "fg = 1", size=5,
                                min_doc_count=1, score=score)
        return [(r.key, r.score_q) for r in out.collect()]

    lift = top("lift")
    jlh = top("jlh")
    chi = top("chi_square")
    assert lift[0][0] == jlh[0][0] == chi[0][0] == "a"
    # exact values: fgp_a=3/4, bgp_a=3/12 -> jlh=(0.5)*(3)=1.5
    assert dict(jlh)["a"] == 1_500_000
    # chi2 = 0.25 / 0.25 = 1.0
    assert dict(chi)["a"] == 1_000_000
    with pytest.raises(ValueError, match="unknown significance"):
        significant_terms(df, "tag", "fg = 1", score="gnd")
    # the compiler accepts the ES spelling and rejects two heuristics
    body = {"aggs": {"s": {"significant_terms": {
        "field": "tag", "foreground": "fg = 1", "size": 5,
        "min_doc_count": 1, "jlh": {}}}}}
    out = run_search(df, body)["s"].collect()
    assert out[0].key == "a" and out[0].score_q == 1_500_000
    body["aggs"]["s"]["significant_terms"]["chi_square"] = {}
    with pytest.raises(ValueError, match="one scoring heuristic"):
        run_search(df, body)


def test_paginate_composite_reassembles_full_result(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        paginate_composite,
    )

    rows = [(chr(97 + i % 7), float(i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "tag string, v double")
    body = {"aggs": {"p": {"composite": {"size": 4, "sources": [
        {"tag": {"terms": {"field": "tag"}}},
        {"vb": {"histogram": {"field": "v", "interval": 1.0}}},
    ]}}}}
    pages = list(paginate_composite(df, body, "p"))
    assert all(len(p) == 4 for p in pages[:-1])  # full pages then the tail
    paged = [(r.tag, r.vb, r.doc_count) for p in pages for r in p]
    whole = [
        (r.tag, r.vb, r.doc_count)
        for r in run_search(df, {"aggs": {"p": {"composite": {
            "size": 10_000, "sources": body["aggs"]["p"]["composite"]["sources"],
        }}}})["p"].collect()
    ]
    assert paged == whole and len(whole) == 21  # 7 tags × 3 buckets
    # the input body is not mutated by the pagination loop
    assert "after" not in body["aggs"]["p"]["composite"]


def test_retriever_rrf_fusion(spark):
    rows = [
        (1, [1.0, 0.0], 9), (2, [0.9, 0.1], 5), (3, [0.0, 1.0], 1),
        (4, [0.5, 0.5], 2), (5, [-1.0, 0.0], 3),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    body = {
        "retriever": {"rrf": {
            "id_field": "vec_id",
            "rank_constant": 1,
            "rank_window_size": 3,
            "retrievers": [
                {"standard": {"query": {"range": {"label": {"gte": 2}}},
                              "sort": [{"label": {"order": "asc"}},
                                       {"vec_id": "asc"}]}},
                {"knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                         "k": 3}},
            ],
        }},
        "size": 5,
    }
    out = run_search(df, body)["_hits"].collect()
    got = {r.vec_id: (r.rank_0, r.rank_1, r.score_q) for r in out}
    # standard (label>=2, label asc): 4(2), 5(3), 2(5) -> ranks 1,2,3
    # knn (cos desc): 1, 2, 4 -> ranks 1,2,3
    T = 10 ** 12
    assert got[2] == (3, 2, T // 4 + T // 3)
    assert got[4] == (1, 3, T // 2 + T // 4)
    assert got[1] == (None, 1, T // 2)
    assert got[5] == (2, None, T // 3)
    # fusion order: 2 (583G) > 4 (750G)? no: 4=750G top, then 2=583G, 1=500G, 5=333G
    assert [r.vec_id for r in out] == [4, 2, 1, 5]
    # loud failures: standard without sort; single child; unknown node
    with pytest.raises(ValueError, match="explicit sort"):
        run_search(df, {"retriever": {"standard": {"query": {}}}, "size": 2})
    with pytest.raises(ValueError, match="at least two"):
        run_search(df, {"retriever": {"rrf": {
            "id_field": "vec_id",
            "retrievers": [{"knn": {"field": "embedding",
                                    "query_vector": [1.0, 0.0]}}]}}})
    with pytest.raises(ValueError, match="id_field"):
        run_search(df, {"retriever": {"rrf": {"retrievers": [{}, {}]}}})
    # the standard retriever's ES `filter` narrows the ranking; unknown
    # spec keys raise rather than silently changing results
    filt = run_search(df, {"retriever": {"standard": {
        "filter": {"range": {"label": {"lte": 3}}},
        "sort": [{"label": "desc"}, {"vec_id": "asc"}]}}, "size": 2})["_hits"]
    assert [r.vec_id for r in filt.collect()] == [5, 4]
    with pytest.raises(ValueError, match="unsupported standard-retriever"):
        run_search(df, {"retriever": {"standard": {
            "sort": [{"label": "asc"}], "min_score": 2}}, "size": 1})
    # top-level standard / knn retrievers route to the existing paths
    std = run_search(df, {"retriever": {"standard": {
        "sort": [{"label": "desc"}, {"vec_id": "asc"}]}}, "size": 2})["_hits"]
    assert [r.vec_id for r in std.collect()] == [1, 2]


def test_validate_delete_update_by_query(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        delete_by_query,
        update_by_query,
        validate_query,
    )

    assert validate_query({"query": {"term": {"a": 1}}}) == (True, None)
    ok, err = validate_query({"query": {"terms_set": {"a": {"terms": []}}}})
    assert not ok and "terms_set" in err
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "id long, tag string, v double",
    )
    # delete: NULL-evaluating docs survive (no match != match)
    left = delete_by_query(df, {"query": {"term": {"tag": "a"}}})
    assert sorted(r.id for r in left.collect()) == [2, 3]
    # update: only matching rows transformed, others byte-identical
    up = update_by_query(df, {
        "query": {"range": {"v": {"gte": 20}}},
        "script": {"source": {"v": "v * 2", "tag": "concat(tag, '!')"}},
    })
    got = {r.id: (r.tag, r.v) for r in up.collect()}
    assert got[1] == ("a", 10.0)
    assert got[2] == ("b!", 40.0)
    assert got[3] == (None, 60.0)  # matched; concat(NULL,..) stays NULL
    # membership is pinned BEFORE any rewrite: a script that mutates the
    # queried column must still apply every later field to the doc
    up2 = update_by_query(df, {
        "query": {"range": {"v": {"lt": 15}}},
        "script": {"source": {"v": "v * 2", "tag": "concat(tag, '!')"}},
    })
    got2 = {r.id: (r.tag, r.v) for r in up2.collect()}
    assert got2[1] == ("a!", 20.0)  # v*2 left the query range; tag still updates
    assert got2[2] == ("b", 20.0)
    with pytest.raises(ValueError, match="missing"):
        update_by_query(df, {"script": {"source": {"nope": "1"}}})


def test_render_response_hits_section(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        render_response,
    )

    df = spark.createDataFrame(
        [(2, 9.0), (1, 5.0)], "id long, v double"
    )
    body = {"size": 2, "sort": [{"v": {"order": "desc"}}],
            "aggs": {"m": {"max": {"field": "v"}}}}
    resp = render_response(run_search(df, body))
    assert resp["hits"]["total"] == {"value": 2, "relation": "gte"}
    assert resp["hits"]["hits"][0]["_source"] == {"id": 2, "v": 9.0}
    assert resp["aggregations"]["m"] == {"value": 9.0}
    with pytest.raises(ValueError, match="max_buckets"):
        render_response(run_search(df, body), max_buckets=1)


def test_field_caps(spark):
    from elasticsearch_drift_plugin_spark.functions.es_search import field_caps

    df = spark.createDataFrame(
        [(1, "a", 1.0, [0.1], [(1,)])],
        "id long, tag string, v double, emb array<float>,"
        " kids array<struct<k:long>>",
    )
    caps = field_caps(df)["fields"]
    assert caps["id"] == {"long": {"type": "long", "searchable": True,
                                   "aggregatable": True}}
    assert "keyword" in caps["tag"] and "double" in caps["v"]
    assert "dense_vector" in caps["emb"] and "nested" in caps["kids"]
    # glob patterns filter like ES
    only = field_caps(df, fields=["t*", "id"])["fields"]
    assert set(only) == {"tag", "id"}


def test_significant_terms_background_filter(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        significant_terms,
    )

    # fg: 2×a, 1×b.  full bg: a=4, b=5, c=3.  narrowed bg (grp='x'):
    # a=2, b=4 (c excluded entirely -> no bucket)
    rows = (
        [("a", 1, "x")] * 2 + [("b", 1, "x")]
        + [("a", 0, "x")] * 0 + [("a", 0, "y")] * 2 + [("b", 0, "x")] * 3
        + [("b", 0, "y")] + [("c", 0, "y")] * 3
    )
    df = spark.createDataFrame(rows, "tag string, fg int, grp string")
    # min_doc_count prunes fg-absent terms (c) on both paths
    wide = {r.key: (r.fg_count, r.bg_count) for r in significant_terms(
        df, "tag", "fg = 1", min_doc_count=1).collect()}
    assert wide == {"a": (2, 4), "b": (1, 5)}
    narrow = {r.key: (r.fg_count, r.bg_count) for r in significant_terms(
        df, "tag", "fg = 1", min_doc_count=1,
        background_where="grp = 'x'").collect()}
    assert narrow == {"a": (2, 2), "b": (1, 4)}  # c has no bg presence
    # the compiler accepts the ES spelling
    body = {"aggs": {"s": {"significant_terms": {
        "field": "tag", "foreground": "fg = 1", "min_doc_count": 1,
        "background_filter": {"term": {"grp": "x"}}}}}}
    out = {r.key: r.bg_count for r in run_search(df, body)["s"].collect()}
    assert out == {"a": 2, "b": 4}


def test_knn_with_aggs_and_post_filter(spark):
    rows = [
        (1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"), (3, [0.8, 0.1], "b"),
        (4, [0.0, 1.0], "b"), (5, [-1.0, 0.0], "a"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, tag string")
    # aggs beside knn facet over the k RETRIEVED hits (1,2,3), not the index
    res = run_search(df, {
        "knn": {"field": "embedding", "query_vector": [1.0, 0.0], "k": 3},
        "size": 2,
        "aggs": {"tags": {"terms": {"field": "tag",
                                    "order": {"_key": "asc"}}}},
    })
    assert [(r.tag, r.doc_count) for r in res["tags"].collect()] == [
        ("a", 2), ("b", 1)]
    assert [r.vec_id for r in res["_hits"].collect()] == [1, 2]  # size pages k


def test_post_filter_hits_only(spark):
    df = spark.createDataFrame(
        [(1, "a", 9.0), (2, "b", 7.0), (3, "a", 5.0)],
        "id long, tag string, v double",
    )
    res = run_search(df, {
        "size": 10, "sort": [{"v": "desc"}],
        "query": {"range": {"v": {"gte": 6}}},
        "post_filter": {"term": {"tag": "a"}},
        "aggs": {"tags": {"terms": {"field": "tag",
                                    "order": {"_key": "asc"}}}},
    })
    # facet counts keep the FULL query context (both tags)...
    assert [(r.tag, r.doc_count) for r in res["tags"].collect()] == [
        ("a", 1), ("b", 1)]
    # ...while the hit list reflects the facet selection
    assert [r.id for r in res["_hits"].collect()] == [1]


def test_inference_pipeline_agg(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 2.0), (2.0, 4.0), (10.0, 8.0)], "x double, v double"
    )
    body = {"aggs": {"h": {
        "histogram": {"field": "x", "interval": 1.0},
        "aggs": {
            "s": {"sum": {"field": "v"}},
            "pred": {"inference": {
                "model": {"type": "linear",
                          "coefficients": {"total": 2.0, "n": -1.0},
                          "intercept": 0.5},
                "buckets_path": {"total": "s", "n": "_count"},
            }},
        },
    }}}
    out = {r.key: r.pred for r in run_search(df, body)["h"].collect()}
    # bucket 0: sum=1, n=1 -> 0.5 + 2 - 1 = 1.5 ; bucket 10: sum=8 -> 15.5
    assert out[0.0] == 1.5 and out[2.0] == 7.5 and out[10.0] == 15.5
    # logistic wraps the same linear form in a sigmoid (quantized)
    body["aggs"]["h"]["aggs"]["pred"]["inference"]["model"] = {
        "type": "logistic", "coefficients": {"n": 1.0}, "intercept": -1.0}
    out = {r.key: r.pred for r in run_search(df, body)["h"].collect()}
    assert out[0.0] == 500_000  # sigmoid(0) = 0.5 exactly
    with pytest.raises(ValueError, match="unsupported inference"):
        run_search(df, {"aggs": {"h": {
            "histogram": {"field": "x", "interval": 1.0},
            "aggs": {"p": {"inference": {
                "model": {"type": "tree", "coefficients": {}},
                "buckets_path": {}}}}}}})
    with pytest.raises(ValueError, match="without buckets_path"):
        run_search(df, {"aggs": {"h": {
            "histogram": {"field": "x", "interval": 1.0},
            "aggs": {"p": {"inference": {
                "model": {"coefficients": {"z": 1.0}},
                "buckets_path": {}}}}}}})


def test_moving_fn_extended_builtins(spark):
    df = spark.createDataFrame(
        [(float(i), float(v)) for i, v in enumerate([2, 4, 6, 8])],
        "x double, v double",
    )
    def run(script, window=3):
        body = {"aggs": {"h": {
            "histogram": {"field": "x", "interval": 1.0},
            "aggs": {"s": {"sum": {"field": "v"}},
                     "f": {"moving_fn": {"buckets_path": "s",
                                         "window": window,
                                         "script": script}}},
        }}}
        return [r.f for r in run_search(df, body)["h"].collect()]

    # linearWeightedAvg over [2,4] = (1*2 + 2*4)/3 = 10/3
    lwa = run("MovingFunctions.linearWeightedAvg(values)")
    assert lwa[0] is None and lwa[1] == 2.0
    assert abs(lwa[2] - 10.0 / 3.0) < 1e-12
    # ewma(0.5) over [2,4,6]: ((2*0.5+... seeded 2) -> 3 -> 4.5
    ew = run("MovingFunctions.ewma(values, 0.5)")
    assert ew[0] is None and ew[1] == 2.0 and ew[2] == 3.0 and ew[3] == 4.5
    # stdDev over [2,4] around mean 3 -> 1.0 (population)
    sd = run("MovingFunctions.stdDev(values, MovingFunctions.unweightedAvg(values))")
    assert sd[2] == 1.0
    with pytest.raises(ValueError, match="not a supported builtin"):
        run("MovingFunctions.holtWinters(values)")


def test_auto_date_histogram_minimum_interval(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        auto_date_histogram,
    )

    HOUR = 3_600_000
    # 5 hours of data: unconstrained auto picks an hour-or-finer rung;
    # minimum_interval="1d" forces the daily rung (one bucket)
    df = spark.createDataFrame(
        [(i * HOUR,) for i in range(5)], "t long"
    )
    free = auto_date_histogram(df, "t", target_buckets=10).collect()
    assert len(free) > 1
    floored = auto_date_histogram(
        df, "t", target_buckets=10, minimum_interval="1d"
    ).collect()
    assert len(floored) == 1 and floored[0].interval == "1d"
    # a calendar minimum skips every fixed rung
    monthly = auto_date_histogram(
        df, "t", target_buckets=10, minimum_interval="1M"
    ).collect()
    assert len(monthly) == 1 and monthly[0].interval == "1M"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ladder rung"):
        auto_date_histogram(df, "t", minimum_interval="7m")
    # the compiler forwards the parameter
    out = run_search(df, {"aggs": {"a": {"auto_date_histogram": {
        "field": "t", "buckets": 10, "minimum_interval": "1d"}}}})["a"]
    assert out.collect()[0].interval == "1d"


def test_histogram_zero_fill_extended_bounds(spark):
    df = spark.createDataFrame([(5.0,), (25.0,)], "v double")
    body = {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 10.0, "min_doc_count": 0,
        "extended_bounds": {"min": -10.0, "max": 40.0}}}}}
    out = [(r.key, r.doc_count) for r in run_search(df, body)["h"].collect()]
    assert out == [(-10.0, 0), (0.0, 1), (10.0, 0), (20.0, 1),
                   (30.0, 0), (40.0, 0)]
    # extended_bounds without zero-fill is an ES NO-OP (r10 — formerly a
    # loud raise): the widened buckets are empty, so min_doc_count >= 1
    # filters them right back out; accepted like ES accepts it
    out = [(r.key, r.doc_count) for r in run_search(df, {"aggs": {"h": {
        "histogram": {"field": "v", "interval": 10.0,
                      "extended_bounds": {"min": -90, "max": 90}}}}})["h"]
        .collect()]
    assert out == [(0.0, 1), (20.0, 1)]


def test_date_histogram_bounds_through_compiler(spark):
    H = 3_600_000
    df = spark.createDataFrame([(2 * H,), (3 * H,)], "t long")
    body = {"aggs": {"d": {"date_histogram": {
        "field": "t", "fixed_interval": "1h", "min_doc_count": 0,
        "extended_bounds": {"min": 0, "max": 5 * H}}}}}
    out = [(r.key, r.doc_count) for r in run_search(df, body)["d"].collect()]
    assert out == [(0, 0), (H, 0), (2 * H, 1), (3 * H, 1),
                   (4 * H, 0), (5 * H, 0)]
    # hard_bounds clips the rendered grid
    body = {"aggs": {"d": {"date_histogram": {
        "field": "t", "fixed_interval": "1h",
        "hard_bounds": {"min": 3 * H, "max": 9 * H}}}}}
    out = [(r.key, r.doc_count) for r in run_search(df, body)["d"].collect()]
    assert out == [(3 * H, 1)]


def test_rate_units(spark):
    DAY = 86_400_000
    # 31 days of January 2024 (ts at day 5), value 31000 exactly
    df = spark.createDataFrame(
        [(1_704_067_200_000 + 5 * DAY, 31_000.0)], "t_ms long, v double"
    )
    def rate(unit):
        out = run_search(df, {"aggs": {"r": {"rate": {
            "field": "v", "unit": unit}}}})["r"].collect()[0]
        return out.unit_intervals, out.rate_q
    Q = 1_000_000
    assert rate("day") == (31, 31_000 * Q // 31)
    assert rate("hour") == (31 * 24, 31_000 * Q // (31 * 24))
    assert rate("minute") == (31 * 1440, 31_000 * Q // (31 * 1440))
    assert rate("month") == (1, 31_000 * Q)
    with pytest.raises(ValueError, match="integer divisor"):
        rate("week")


def test_composite_calendar_source(spark):
    JAN, FEB, APR = 1_704_067_200_000, 1_706_745_600_000, 1_711_929_600_000
    DAY = 86_400_000
    df = spark.createDataFrame(
        [(JAN + 3 * DAY,), (JAN + 20 * DAY,), (FEB + DAY,), (APR,)],
        "t long",
    )
    body = {"aggs": {"p": {"composite": {"size": 10, "sources": [
        {"m": {"date_histogram": {"field": "t",
                                  "calendar_interval": "month"}}},
    ]}}}}
    out = [(r.m, r.doc_count) for r in run_search(df, body)["p"].collect()]
    assert out == [(JAN, 2), (FEB, 1), (APR, 1)]
    # after-cursor pages past the month key
    body["aggs"]["p"]["composite"]["after"] = {"m": JAN}
    out = [(r.m, r.doc_count) for r in run_search(df, body)["p"].collect()]
    assert out == [(FEB, 1), (APR, 1)]
    # (amended r10) sub-month calendar units are anchored fixed floors;
    # a unit outside the ES calendar table still raises
    wk = run_search(df, {"aggs": {"p": {"composite": {"sources": [
        {"w": {"date_histogram": {"field": "t",
                                  "calendar_interval": "week"}}}]}}}})["p"]
    assert sum(r.doc_count for r in wk.collect()) == 4
    with pytest.raises(ValueError, match="unknown calendar interval"):
        run_search(df, {"aggs": {"p": {"composite": {"sources": [
            {"w": {"date_histogram": {"field": "t",
                                      "calendar_interval": "fortnight"}}}]}}}})


def test_filters_metric_sub_agg(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), (None, 7.0)],
        "tag string, v double",
    )
    body = {"aggs": {"f": {
        "filters": {"filters": {"as": {"term": {"tag": "a"}},
                                "bs": {"term": {"tag": "b"}}},
                    "other_bucket": True},
        "aggs": {"total": {"sum": {"field": "v"}}},
    }}}
    out = {r.key: (r.doc_count, r.total)
           for r in run_search(df, body)["f"].collect()}
    # NULL-tag doc lands in the other bucket (ES contract), metric rides
    assert out == {"as": (2, 30.0), "bs": (1, 5.0), "_other_": (1, 7.0)}
    # value_count zero-fills an empty bucket
    body["aggs"]["f"]["aggs"] = {"n": {"value_count": {"field": "v"}}}
    body["aggs"]["f"]["filters"]["filters"]["cs"] = {"term": {"tag": "c"}}
    out = {r.key: (r.doc_count, r.n)
           for r in run_search(df, body)["f"].collect()}
    assert out["cs"] == (0, 0)
    with pytest.raises(ValueError, match="exactly one metric"):
        run_search(df, {"aggs": {"f": {
            "filters": {"filters": {"as": {"term": {"tag": "a"}}}},
            "aggs": {"x": {"sum": {"field": "v"}},
                     "y": {"max": {"field": "v"}}}}}})
