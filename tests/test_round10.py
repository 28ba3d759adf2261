"""Round-10 pins: histogram ``min_doc_count: 0`` zero-fill WITH metric
sub-aggs (wired r9 in the `_search` compiler, shipped untested — VERDICT r9
item 2). The contract is ES's empty-bucket reduce
(es-8.18.2 InternalProportionalSumHistogram.java:480-521 renders an empty
proto-bucket): counting metrics (sum / value_count / cardinality) read 0 on
a filled bucket; order-statistics metrics (min / max / avg) read NULL.

The table below pins EVERY kind in functions/es_search.py:_METRICS — if a
new metric kind is added without a fill rule it lands in the NULL branch;
this test forces the author to decide its empty-reduce value explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.functions.es_search import _METRICS, run_search
from elasticsearch_drift_plugin_spark.operators.es_aggs import histogram_agg_filled

# kind -> empty-reduce value on a zero-filled bucket (ES semantics)
EMPTY_REDUCE = {
    "sum": 0,
    "value_count": 0,
    "cardinality": 0,
    "min": None,
    "max": None,
    "avg": None,
}


def test_empty_reduce_table_covers_every_metric_kind():
    """Adding a metric kind to _METRICS without deciding its zero-fill
    value must fail HERE (not silently default to NULL in the compiler)."""
    assert set(EMPTY_REDUCE) == set(_METRICS)


@pytest.fixture(scope="module")
def gap_df(spark):
    # buckets 0 and 200 populated, bucket 100 EMPTY (the fill target)
    rows = [
        (10.0, 7, "a"),
        (20.0, 9, "a"),
        (250.0, 4, "b"),
    ]
    return spark.createDataFrame(rows, "v double, m long, s string")


def _extra_aggs():
    return {f"m_{k}": _METRICS[k]("m").alias(f"m_{k}") for k in sorted(_METRICS)}


def test_histogram_fill_metric_empty_reduce(gap_df):
    out = histogram_agg_filled(
        gap_df,
        "v",
        100.0,
        extra_aggs=_extra_aggs(),
        extra_fill_zero={f"m_{k}" for k, z in EMPTY_REDUCE.items() if z == 0},
    ).collect()
    by_key = {r["key"]: r for r in out}
    assert sorted(by_key) == [0.0, 100.0, 200.0]
    fill = by_key[100.0]
    assert fill["doc_count"] == 0
    for kind, want in EMPTY_REDUCE.items():
        assert fill[f"m_{kind}"] == want, (kind, fill[f"m_{kind}"])
    # populated buckets keep real metric values (the fill coalesce must
    # not clobber them)
    assert by_key[0.0]["m_sum"] == 16 and by_key[0.0]["m_avg"] == 8.0
    assert by_key[0.0]["m_cardinality"] == 2 and by_key[0.0]["m_value_count"] == 2
    assert by_key[200.0]["m_min"] == 4 and by_key[200.0]["m_max"] == 4


def test_histogram_fill_metrics_extended_bounds(gap_df):
    """extended_bounds widens the grid; the out-of-data buckets carry the
    same empty-reduce metric values as interior gaps."""
    out = histogram_agg_filled(
        gap_df,
        "v",
        100.0,
        extended_bounds=(-200.0, 400.0),
        extra_aggs=_extra_aggs(),
        extra_fill_zero={"m_sum", "m_value_count", "m_cardinality"},
    ).collect()
    keys = [r["key"] for r in out]
    assert keys == [-200.0, -100.0, 0.0, 100.0, 200.0, 300.0, 400.0]
    for r in out:
        if r["key"] in (-200.0, -100.0, 100.0, 300.0, 400.0):
            assert r["doc_count"] == 0
            assert r["m_sum"] == 0 and r["m_value_count"] == 0
            assert r["m_cardinality"] == 0
            assert r["m_min"] is None and r["m_max"] is None and r["m_avg"] is None


def test_search_compiler_zero_fill_with_metrics(gap_df):
    """The `_search` body route (functions/es_search.py:872): histogram
    min_doc_count: 0 with metric children compiles to the filled operator
    and classifies each child by its metric kind."""
    body = {
        "size": 0,
        "aggs": {
            "h": {
                "histogram": {
                    "field": "v",
                    "interval": 100,
                    "min_doc_count": 0,
                    "extended_bounds": {"min": 0, "max": 300},
                },
                "aggs": {
                    "msum": {"sum": {"field": "m"}},
                    "mcnt": {"value_count": {"field": "m"}},
                    "mcard": {"cardinality": {"field": "s"}},
                    "mmin": {"min": {"field": "m"}},
                    "mavg": {"avg": {"field": "m"}},
                },
            }
        },
    }
    out = {r["key"]: r for r in run_search(gap_df, body)["h"].collect()}
    assert sorted(out) == [0.0, 100.0, 200.0, 300.0]
    for k in (100.0, 300.0):
        r = out[k]
        assert (r["doc_count"], r["msum"], r["mcnt"], r["mcard"]) == (0, 0, 0, 0)
        assert r["mmin"] is None and r["mavg"] is None
    assert out[0.0]["msum"] == 16 and out[0.0]["mcard"] == 1
    assert out[200.0]["mmin"] == 4 and out[200.0]["mavg"] == 4.0


# ---------------------------------------------------------------------------
# quality_clf_sampled (r10): the train-on-sample serving path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clf_docs(spark):
    rows = [
        (i, "src0" if i % 3 == 0 else "src1",
         ("alpha beta gamma " * (1 + i % 4)) + (f"tok{i % 7} " * 3))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_quality_clf_sampled_scores_full_corpus(clf_docs):
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        quality_clf_sampled,
    )

    out = quality_clf_sampled(clf_docs, sample_rate=0.5).collect()
    # every doc scored (training on the sample, scoring EVERYONE)
    assert len(out) == 60
    assert all(0 <= r["clf_q"] <= 1_000_000 for r in out)
    # deterministic: the hash-sample has no RNG state
    again = quality_clf_sampled(clf_docs, sample_rate=0.5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_quality_clf_sampled_guard_applies_to_sample(clf_docs):
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        quality_clf_sampled,
    )

    with pytest.raises(ValueError, match="lower the rate"):
        quality_clf_sampled(clf_docs, sample_rate=1.0, max_train_docs=10)


def test_quality_clf_sampled_sql_twin_bit_identical(clf_docs):
    """The sampled trainer replays bit-identically in DuckDB — the same
    integer-GD discipline as the full-batch twin, with the training CTEs
    restricted by the hash-sample predicate."""
    import duckdb

    from elasticsearch_drift_plugin_spark.functions.hashing import HEX15_SQL_FN
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        QUANT,
        quality_clf_sampled,
        quality_clf_sql,
    )

    spark_rows = [
        tuple(r) for r in quality_clf_sampled(clf_docs, sample_rate=0.5).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?,?,?)",
        [(r[0], r[1], r[2]) for r in clf_docs.collect()],
    )
    pred = (
        f"({HEX15_SQL_FN.format(expr='CAST(doc_id AS VARCHAR)')})"
        f" % {QUANT} < {int(0.5 * QUANT)}"
    )
    duck_rows = [
        tuple(r)
        for r in con.execute(quality_clf_sql(train_where=pred)).fetchall()
    ]
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# minimum_should_match spec grammar (r10): percentages / negatives /
# conditionals via the Lucene calculateMinShouldMatch algorithm
# ---------------------------------------------------------------------------


def test_calculate_min_should_match_lucene_parity():
    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        calculate_min_should_match as c,
    )

    # documented ES/Solr examples
    assert c(4, "75%") == 3
    assert c(5, "76%") == 3          # 3.8 truncates toward zero
    assert c(10, "-25%") == 8        # -2.5 -> -2 missing
    assert c(5, "-25%") == 4         # -1.25 -> -1 missing
    assert c(3, "3<90%") == 3        # count <= threshold: all required
    assert c(10, "3<90%") == 9
    assert c(2, "2<-25% 9<-3") == 2  # docs' canonical multi-conditional
    assert c(5, "2<-25% 9<-3") == 4
    assert c(10, "2<-25% 9<-3") == 7
    # integer and stringed-integer forms
    assert c(10, 3) == 3 and c(10, "3") == 3
    assert c(10, -3) == 7 and c(10, "-3") == 7
    assert c(3, 5) == 5              # impossible — compiler maps to FALSE
    assert c(10, "-200%") == 0       # clamps to no-constraint
    for bad in ("abc", "10%%", True, "5<", "x<50%"):
        with pytest.raises(ValueError):
            c(5, bad)


def test_bool_msm_percentage_compiles_both_engines(spark):
    """A "-25%" spec over 4 should clauses resolves to 3 and produces the
    identical match set in the Column compiler and the SQL twin."""
    import duckdb

    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )

    body = {"bool": {
        "should": [
            {"term": {"a": 1}},
            {"term": {"b": 1}},
            {"term": {"c": 1}},
            {"term": {"d": 1}},
        ],
        "minimum_should_match": "-25%",
    }}
    rows = [
        (1, 1, 1, 1, "all"),
        (1, 1, 1, 0, "three"),
        (1, 1, 0, 0, "two"),
        (1, None, None, 0, "one+nulls"),
    ]
    df = spark.createDataFrame(rows, "a int, b int, c int, d int, tag string")
    got = sorted(r["tag"] for r in df.where(compile_query(body)).collect())
    assert got == ["all", "three"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (a INT, b INT, c INT, d INT, tag VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    sql_got = sorted(
        r[0]
        for r in con.execute(
            f"SELECT tag FROM t WHERE {compile_query_sql(body)}"
        ).fetchall()
    )
    assert sql_got == got


def test_bool_msm_impossible_matches_nothing(spark):
    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )

    body = {"bool": {
        "should": [{"term": {"a": 1}}, {"term": {"b": 1}}],
        "minimum_should_match": 5,
    }}
    df = spark.createDataFrame([(1, 1)], "a int, b int")
    assert df.where(compile_query(body)).count() == 0
    assert "FALSE" in compile_query_sql(body)


def test_bool_msm_zero_via_negative_keeps_should_optional(spark):
    """"-100%" resolves to 0: should clauses become purely optional, so a
    row matching none of them still passes the must clause."""
    from elasticsearch_drift_plugin_spark.functions.es_dsl import compile_query

    body = {"bool": {
        "must": [{"term": {"m": 1}}],
        "should": [{"term": {"a": 9}}, {"term": {"b": 9}}],
        "minimum_should_match": "-100%",
    }}
    df = spark.createDataFrame([(1, 0, 0), (0, 9, 9)], "m int, a int, b int")
    out = df.where(compile_query(body)).collect()
    assert [(r["m"], r["a"]) for r in out] == [(1, 0)]


def test_histogram_terms_child_zero_fill(spark):
    """r10: histogram min_doc_count: 0 + extended_bounds WITH a terms
    child (formerly a loud raise). Grid keys with no term rows appear
    once with a NULL term, doc_count 0, and the child metrics'
    empty-reduce values — the flattened rendering of ES's empty bucket
    whose terms sub-agg has an empty buckets array."""
    rows = [
        (10.0, "a", 5),
        (15.0, "b", 7),
        (250.0, "a", 3),
    ]
    df = spark.createDataFrame(rows, "v double, t string, m long")
    body = {
        "size": 0,
        "aggs": {
            "h": {
                "histogram": {
                    "field": "v",
                    "interval": 100,
                    "min_doc_count": 0,
                    "extended_bounds": {"min": 0, "max": 300},
                },
                "aggs": {
                    "langs": {
                        "terms": {"field": "t", "size": 3},
                        "aggs": {
                            "msum": {"sum": {"field": "m"}},
                            "mmax": {"max": {"field": "m"}},
                        },
                    }
                },
            }
        },
    }
    out = run_search(df, body)["h"].collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    assert sorted(by_key) == [0.0, 100.0, 200.0, 300.0]
    # populated bucket 0: two term rows, ranked doc_count desc, term asc
    assert [(r["t"], r["doc_count"], r["msum"]) for r in by_key[0.0]] == [
        ("a", 1, 5), ("b", 1, 7),
    ]
    # fill buckets 100 and 300: exactly one NULL-term row each with the
    # empty-reduce metric values
    for k in (100.0, 300.0):
        (r,) = by_key[k]
        assert r["t"] is None and r["doc_count"] == 0
        assert r["msum"] == 0 and r["mmax"] is None
    assert [(r["t"], r["doc_count"]) for r in by_key[200.0]] == [("a", 1)]


def test_date_histogram_terms_child_zero_fill(spark):
    """r10: the calendar twin of the histogram terms-child fill — grid
    from the ungrouped zero-filled date_histogram (fixed AND calendar
    intervals), NULL-term rows carry doc_count 0 + empty-reduce metrics."""
    H = 3_600_000
    rows = [(1 * H + 5, "a", 2.0), (1 * H + 9, "b", 3.0), (4 * H + 1, "a", 7.0)]
    df = spark.createDataFrame(rows, "t long, term string, m double")
    body = {"aggs": {"d": {
        "date_histogram": {"field": "t", "fixed_interval": "1h",
                           "min_doc_count": 0,
                           "extended_bounds": {"min": 0, "max": 5 * H}},
        "aggs": {"ts": {"terms": {"field": "term", "size": 3},
                        "aggs": {"ms": {"sum": {"field": "m"}},
                                 "mm": {"min": {"field": "m"}}}}},
    }}}
    out = run_search(df, body)["d"].collect()
    got = [(r["term"], r["key"], r["doc_count"], r["ms"], r["mm"]) for r in out]
    assert got == [
        (None, 0, 0, 0.0, None),
        ("a", 1 * H, 1, 2.0, 2.0),
        ("b", 1 * H, 1, 3.0, 3.0),
        (None, 2 * H, 0, 0.0, None),
        (None, 3 * H, 0, 0.0, None),
        ("a", 4 * H, 1, 7.0, 7.0),
        (None, 5 * H, 0, 0.0, None),
    ]
    # calendar interval takes the same path (the psum calendar spine)
    cal = {"aggs": {"d": {
        "date_histogram": {"field": "t", "calendar_interval": "hour",
                           "min_doc_count": 0},
        "aggs": {"ts": {"terms": {"field": "term"}}},
    }}}
    kv = [(r["term"], r["key"], r["doc_count"])
          for r in run_search(df, cal)["d"].collect()]
    assert kv == [("a", H, 1), ("b", H, 1), (None, 2 * H, 0),
                  (None, 3 * H, 0), ("a", 4 * H, 1)]
    # min_doc_count > 1 with a terms child (second r10 pass): the
    # bucket-level threshold comes from the UNGROUPED histogram, so the
    # 2-doc bucket at 1h survives and the 1-doc bucket at 4h drops
    out2 = run_search(df, {"aggs": {"d": {
        "date_histogram": {"field": "t", "fixed_interval": "1h",
                           "min_doc_count": 2},
        "aggs": {"ts": {"terms": {"field": "term"}}},
    }}})["d"].collect()
    assert [(r["term"], r["key"], r["doc_count"]) for r in out2] == [
        ("a", 1 * H, 1), ("b", 1 * H, 1),
    ]


def test_histogram_terms_child_min_doc_count_counts_null_terms(spark):
    """The bucket-level threshold counts docs whose TERM field is null
    (ES: min_doc_count applies to the histogram bucket, terms drops its
    own nulls) — a bucket with 1 termed + 1 term-null doc survives
    min_doc_count: 2 and shows its single term row."""
    rows = [(10.0, "a"), (20.0, None), (250.0, "b")]
    df = spark.createDataFrame(rows, "v double, t string")
    out = run_search(df, {"aggs": {"h": {
        "histogram": {"field": "v", "interval": 100, "min_doc_count": 2},
        "aggs": {"ts": {"terms": {"field": "t"}}},
    }}})["h"].collect()
    assert [(r["t"], r["key"], r["doc_count"]) for r in out] == [("a", 0.0, 1)]


def test_histogram_extended_bounds_noop_with_min_doc_count_1(spark):
    """ES parity: extended_bounds with min_doc_count >= 1 is accepted and
    has no visible effect (the widened empty buckets are filtered back
    out) — both with and without a terms child."""
    df = spark.createDataFrame(
        [(10.0, "a", 1), (250.0, "b", 2)], "v double, t string, m long"
    )
    plain = {
        "size": 0,
        "aggs": {"h": {"histogram": {
            "field": "v", "interval": 100,
            "extended_bounds": {"min": -500, "max": 900},
        }}},
    }
    keys = [r["key"] for r in run_search(df, plain)["h"].collect()]
    assert keys == [0.0, 200.0]
    terms_child = {
        "size": 0,
        "aggs": {"h": {
            "histogram": {"field": "v", "interval": 100,
                          "extended_bounds": {"min": -500, "max": 900}},
            "aggs": {"ts": {"terms": {"field": "t"}}},
        }},
    }
    out = run_search(df, terms_child)["h"].collect()
    assert [(r["key"], r["t"]) for r in out] == [(0.0, "a"), (200.0, "b")]


def test_composite_calendar_sub_month_sources(spark):
    """r10: composite date_histogram sources with sub-month calendar
    units — fixed-width under the pinned-UTC contract. Week floors to
    MONDAY (the 1969-12-29 anchor), matching Spark's own
    date_trunc('week'); day/hour are epoch-aligned; after-paging stays
    exact keyset arithmetic."""
    DAY = 86_400_000
    # 1969-12-29 is the Monday before epoch; 2024-01-01 is also a Monday
    jan1 = 1_704_067_200_000
    rows = [
        (jan1 + 2 * DAY, "a"),        # week of 2024-01-01
        (jan1 + 9 * DAY, "a"),        # week of 2024-01-08
        (jan1 + 9 * DAY + 5, "b"),
    ]
    df = spark.createDataFrame(rows, "t long, term string")
    body = {"aggs": {"c": {"composite": {
        "size": 10,
        "sources": [
            {"wk": {"date_histogram": {"field": "t",
                                       "calendar_interval": "week"}}},
            {"tm": {"terms": {"field": "term"}}},
        ],
    }}}}
    out = [(r["wk"], r["tm"], r["doc_count"])
           for r in run_search(df, body)["c"].collect()]
    assert out == [
        (jan1, "a", 1),
        (jan1 + 7 * DAY, "a", 1),
        (jan1 + 7 * DAY, "b", 1),
    ]
    # week floor agrees with Spark's calendar date_trunc on those instants
    from pyspark.sql import functions as SF
    trunc = df.select(
        SF.unix_millis(SF.date_trunc("week", SF.timestamp_millis("t"))).alias("w")
    ).collect()
    assert sorted({r["w"] for r in trunc}) == [jan1, jan1 + 7 * DAY]
    # after-cursor resumes strictly past (week1, 'a')
    body["aggs"]["c"]["composite"]["after"] = {"wk": jan1 + 7 * DAY, "tm": "a"}
    out2 = [(r["wk"], r["tm"]) for r in run_search(df, body)["c"].collect()]
    assert out2 == [(jan1 + 7 * DAY, "b")]
    # calendar day source = epoch-aligned floor
    body_day = {"aggs": {"c": {"composite": {
        "sources": [{"d": {"date_histogram": {
            "field": "t", "calendar_interval": "day"}}}],
    }}}}
    days = [r["d"] for r in run_search(df, body_day)["c"].collect()]
    assert days == [jan1 + 2 * DAY, jan1 + 9 * DAY]


def test_highlight_fragments_token_windows(spark):
    """r10 fragment highlighting: first N matched positions in document
    order, ±half-window token fragments, matches wrapped, ' … ' joined;
    overlapping windows stay independent (documented contract)."""
    df = spark.createDataFrame(
        [(1, "a b data c d e spark f g h i j data k")], "doc_id long, text string"
    )
    body = {
        "size": 5,
        "sort": [{"doc_id": "asc"}],
        "query": {"match": {"text": "data"}},
        "highlight": {"fields": {"text": {
            "number_of_fragments": 2, "fragment_size": 5,
        }}},
        "_source": {"includes": ["doc_id"]},
    }
    (r,) = run_search(df, body)["_hits"].collect()
    # matches at positions 2 and 12; windows ±2 tokens (the second
    # clips at the document end: 10..13 -> "i j data k")
    assert r["text_highlight"] == (
        "a b <em>data</em> c d … i j <em>data</em> k"
    )
    # window clipping at the document edges
    df2 = spark.createDataFrame([(1, "data x")], "doc_id long, text string")
    (r2,) = run_search(df2, body)["_hits"].collect()
    assert r2["text_highlight"] == "<em>data</em> x"
    # number_of_fragments caps the fragment count, not the matches in a
    # window: 3 matches, 2 fragments
    df3 = spark.createDataFrame(
        [(1, "data a data b data c")], "doc_id long, text string"
    )
    (r3,) = run_search(df3, body)["_hits"].collect()
    assert r3["text_highlight"].count("…") == 1
    assert r3["text_highlight"].startswith("<em>data</em> a <em>data</em>")


def test_geo_line_desc_keeps_latest_points(spark):
    """sort_order desc (r10): ES keeps the points with the LARGEST sort
    values and emits the track newest-first; asc is unchanged."""
    from elasticsearch_drift_plugin_spark.operators.geo import geo_line_agg

    rows = [(i, "g", float(i), float(i), float(-i)) for i in range(6)]
    df = spark.createDataFrame(rows, "event_id long, g string, t double, lat double, lon double")
    asc = geo_line_agg(df, ["g"], sort_col="t", size=3).collect()[0]
    desc = geo_line_agg(
        df, ["g"], sort_col="t", size=3, sort_order="desc"
    ).collect()[0]
    assert asc["n_points"] == desc["n_points"] == 3
    assert not asc["complete"] and not desc["complete"]
    # asc keeps t=0,1,2 oldest-first; desc keeps t=5,4,3 newest-first
    assert asc["line"].split(" ")[0].endswith(",0")
    first_lon, first_lat = desc["line"].split(" ")[0].split(",")
    assert first_lat == str(5 * 1_000_000)
    assert [p.split(",")[1] for p in desc["line"].split(" ")] == [
        "5000000", "4000000", "3000000"
    ]


def test_range_date_string_time_zone(spark):
    """r10: range date-string bounds resolve at compile time in the
    clause's time_zone with ES's rounding (gte/lt -> unit start, gt/lte
    -> unit end), wall-clock across DST: 2024-03-10 is a 23-hour day in
    America/New_York."""
    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
        resolve_range_bounds,
    )

    b = resolve_range_bounds(
        {"gte": "2024-03-10", "lte": "2024-03-10",
         "time_zone": "America/New_York"}
    )
    assert b["gte"] == 1_710_046_800_000          # 00:00 EST (UTC-5)
    assert b["lte"] == 1_710_129_600_000 - 1      # next midnight EDT (UTC-4) - 1ms
    assert b["lte"] - b["gte"] == 23 * 3_600_000 - 1  # the 23-hour day
    # UTC default + finer resolutions + round-up on gt
    b2 = resolve_range_bounds({"gt": "2024-01-01T05", "lt": "2024-01-02"})
    assert b2["gt"] == 1_704_085_200_000 + 3_600_000 - 1  # end of the 05h hour
    assert b2["lt"] == 1_704_153_600_000
    # raw UTC-offset zones, the other ES time_zone spelling
    b3 = resolve_range_bounds({"gte": "2024-01-01", "time_zone": "+02:00"})
    assert b3["gte"] == 1_704_067_200_000 - 2 * 3_600_000
    # live predicate: both compilers agree on the matched set
    rows = [(1, 1_710_046_800_000), (2, 1_710_129_599_999),
            (3, 1_710_129_600_000), (4, 1_710_046_799_999)]
    df = spark.createDataFrame(rows, "id long, t long")
    body = {"range": {"t": {"gte": "2024-03-10", "lte": "2024-03-10",
                            "time_zone": "America/New_York"}}}
    got = sorted(r["id"] for r in df.where(compile_query(body)).collect())
    assert got == [1, 2]
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t2 (id BIGINT, t BIGINT)")
    con.executemany("INSERT INTO t2 VALUES (?,?)", rows)
    sql_got = sorted(r[0] for r in con.execute(
        f"SELECT id FROM t2 WHERE {compile_query_sql(body)}").fetchall())
    assert sql_got == got
    # r11 (ADVICE r10): a non-date-shaped string WITHOUT time_zone is a
    # lexicographic keyword bound — verbatim, not force-parsed...
    assert resolve_range_bounds({"gte": "03/10/2024"}) == {"gte": "03/10/2024"}
    # ...but WITH time_zone it is a category error and stays loud
    with pytest.raises(ValueError, match="not date-shaped"):
        resolve_range_bounds({"gte": "03/10/2024", "time_zone": "UTC"})


def test_knn_similarity_kinds(spark):
    """r10: the full ES knn similarity set — l2_norm ranks by smallest
    distance (_score = 1/(1+d²)), max_inner_product applies ES's
    piecewise positive transform; unknown kinds stay loud."""
    rows = [
        (1, [1.0, 0.0]),   # dot 1, d²=0 vs q=[1,0]
        (2, [0.0, 1.0]),   # dot 0, d²=2
        (3, [-1.0, 0.0]),  # dot -1, d²=4
        (4, [2.0, 0.0]),   # dot 2, d²=1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def ids(sim):
        body = {"knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                        "k": 4, "similarity": sim},
                "_source": {"includes": ["vec_id"]}, "size": 4}
        return [r["vec_id"] for r in run_search(df, body)["_hits"].collect()]

    assert ids("l2_norm") == [1, 4, 2, 3]            # by distance
    assert ids("max_inner_product") == [4, 1, 2, 3]  # by raw dot
    assert ids("dot_product") == [4, 1, 2, 3]
    with pytest.raises(ValueError, match="similarity"):
        ids("hamming")


def test_search_zero_fill_rejects_pipeline_free_ride(gap_df):
    """Bucket-pipeline children still ride _apply_pipelines on the FILLED
    frame — derivative over a fill bucket sees doc_count 0, not a hole."""
    body = {
        "size": 0,
        "aggs": {
            "h": {
                "histogram": {"field": "v", "interval": 100, "min_doc_count": 0},
                "aggs": {
                    "msum": {"sum": {"field": "m"}},
                    "d": {"derivative": {"buckets_path": "msum"}},
                },
            }
        },
    }
    out = {r["key"]: r for r in run_search(gap_df, body)["h"].collect()}
    # derivative of the zero-filled sum: 16 -> 0 -> 4 gives -16 then +4
    assert out[100.0]["d"] == -16 and out[200.0]["d"] == 4
    assert out[0.0]["d"] is None
