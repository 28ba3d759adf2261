"""Contract tests for the second ES-agg batch (operators/es_metrics.py).

The driver oracle pins cross-engine equality at sf0.01; these pin the
CONTRACTS on tiny hand-computed fixtures: Tukey whiskers pick data values
inside the fences, MAD is the exact median of absolute deviations, rate
divides by the actual month length, date_range zero-fills every requested
range, rare_terms applies the <= threshold.
"""

import math

from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.operators import es_metrics as m

QUANT = es_metrics_quant = m.QUANT


def test_boxplot_whiskers_inside_tukey_fences(spark):
    # group g: values 1..9 plus outlier 100 -> q1=3.25, q3=7.75, iqr=4.5,
    # hi fence = 14.5 -> hi whisker is 9 (the most extreme value <= fence)
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    out = m.boxplot_agg(df, "value", ["k"]).collect()[0]
    assert out["vmax"] == 100.0
    assert out["hi_whisker"] == 9.0
    assert out["lo_whisker"] == 1.0
    assert out["q2_q"] == int(5.5 * QUANT)


def test_mad_exact_median_of_deviations(spark):
    # values 1,2,3,4,100 -> median 3, |dev| = 2,1,0,1,97 -> MAD = 1
    df = spark.createDataFrame(
        [("g", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)], "k string, value double"
    )
    out = m.mad_agg(df, "value", ["k"]).collect()[0]
    assert out["mad_q"] == 1 * QUANT


def test_missing_counts_null_not_nan(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", float("nan"))], "k string, value double"
    )
    out = m.missing_agg(df, "value", ["k"]).collect()[0]
    # NaN is a present value for count purposes (both engines agree)
    assert out["missing_count"] == 1
    assert out["value_count"] == 2


def test_rate_divides_by_actual_month_length(spark):
    # one row in Feb 2024 (29 days, leap) with value 29 -> rate 1/day
    feb = 1706745600000  # 2024-02-01T00:00:00Z
    df = spark.createDataFrame([(feb + 1000, 29.0)], "t_ms long, value double")
    out = m.rate_agg(df, "t_ms", "value").collect()[0]
    assert out["unit_intervals"] == 29
    assert out["rate_q"] == 1 * QUANT
    assert out["key"] == feb


def test_date_range_zero_fills_and_double_counts(spark):
    df = spark.createDataFrame(
        [(m_ms, 1.0) for m_ms in (1704067200000,)],  # 2024-01-01
        "t_ms long, value double",
    )
    ranges = [(None, "2024-01-08"), ("2024-01-01", "2024-02-01"), ("2030-01-01", None)]
    out = {r["key"]: r for r in m.date_range_agg(df, "t_ms", ranges).collect()}
    assert len(out) == 3
    assert out["*-2024-01-08"]["doc_count"] == 1
    assert out["2024-01-01-2024-02-01"]["doc_count"] == 1  # overlapping: counted twice
    assert out["2030-01-01-*"]["doc_count"] == 0  # zero-filled


def test_rare_terms_threshold_and_order(spark):
    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1 + [("c",)] * 2 + [("d",)] * 9,
        "k string",
    )
    out = m.rare_terms_agg(df, "k", max_doc_count=3).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("b", 1), ("c", 2), ("a", 3)]


def test_string_stats_entropy_quantized(spark):
    # "aab" + "b": chars a:2, b:2, N=4 -> H = log2(4) - (2*1 + 2*1)/4 = 1.0
    df = spark.createDataFrame([("g", "aab"), ("g", "b")], "k string, text string")
    out = m.string_stats_agg(df, "text", ["k"]).collect()[0]
    assert out["distinct_chars"] == 2
    assert out["sum_len"] == 4
    expected = math.floor(math.log2(4) * QUANT) - (
        2 * math.floor(math.log2(2) * QUANT) + 2 * math.floor(math.log2(2) * QUANT)
    ) // 4
    assert out["entropy_q"] == expected == 1 * QUANT


def test_adjacency_matrix_pairs_and_empty_omitted(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id long, tag string"
    )
    out = {r["key"]: r["doc_count"] for r in m.adjacency_matrix_agg(
        df, {"a": "id >= 2", "b": "tag = 'x'", "c": "id > 99"}
    ).collect()}
    assert out == {"a": 2, "b": 2, "a&b": 1}  # 'c' and its pairs omitted


def test_diversified_sampler_caps_per_value(spark):
    rows = [(i, "u%d" % (i % 2), "t") for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, event_type string")
    out = m.diversified_sampler_terms(
        df, "user_id", "event_type", max_docs_per_value=3, shard_size=100
    ).collect()
    # 2 user values x cap 3 = 6 sampled docs max
    assert out[0]["doc_count"] == 6


def test_t_test_matches_manual_welch(spark):
    import math
    a, b = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, value double")
    out = m.t_test_agg(df, "value", "g = 'a'", "g = 'b'").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert out["n_a"] == 4 and out["n_b"] == 5
    assert abs(out["t_q"] / m.QUANT - t) < 1e-4


def test_random_sampler_scales_and_is_estimate_quality(spark):
    """The sample predicate is deterministic, the scale-up exact integer,
    and the estimate lands near the exact count on a sizable input."""
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.operators.es_metrics import (
        random_sampler_agg,
    )

    df = spark.range(4000).select(
        F.col("id").alias("event_id"),
        F.lit("A").alias("event_type"),
        F.lit(2.0).alias("value"),
    )
    r1 = random_sampler_agg(df, ["event_type"]).collect()[0]
    r2 = random_sampler_agg(df, ["event_type"]).collect()[0]
    assert r1 == r2  # no RNG state
    assert r1["doc_count_est"] == r1["n_sampled"] * 4
    assert r1["sum_value_q_est"] == r1["n_sampled"] * 4 * 2_000_000
    # hash-uniformity: 1/4 sample of 4000 docs within ±15%
    assert abs(r1["doc_count_est"] - 4000) < 600
    # a different salt draws a different (still valid) sample
    r3 = random_sampler_agg(df, ["event_type"], seed_salt="other").collect()[0]
    assert abs(r3["doc_count_est"] - 4000) < 600
