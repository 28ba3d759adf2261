"""Contract tests for the parent/sibling pipeline aggs
(bucket_selector/script/sort chain, stats_bucket, serial_diff)."""

from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.operators import pipeline as p


def _buckets(spark):
    # (group, key, doc_count, value) bucket list: group a has 3 buckets
    rows = [
        ("a", 1, 2, 10.0),
        ("a", 2, 5, 50.0),
        ("a", 3, 1, 30.0),
        ("b", 1, 4, 100.0),
    ]
    return spark.createDataFrame(rows, "g string, key long, doc_count long, value double")


def test_selector_drops_then_script_then_topk(spark):
    out = p.bucket_selector_topk(
        _buckets(spark),
        group_by=("g",),
        predicate="vq >= 300000",  # drops the value=10 bucket (quantize=4)
        script="vq div doc_count",
        size=1,
    ).collect()
    # a: survivors value 50 (vq/dc=100000) and 30 (vq/dc=300000) -> top is key 3
    by_g = {r["g"]: r for r in out}
    assert by_g["a"]["key"] == 3 and by_g["a"]["script_q"] == 300000
    assert by_g["b"]["key"] == 1 and by_g["b"]["rank"] == 1
    assert len(out) == 2


def test_stats_bucket_integer_mean(spark):
    out = {r["g"]: r for r in p.stats_bucket(_buckets(spark), group_by=("g",)).collect()}
    a = out["a"]
    assert (a["n_buckets"], a["min_q"], a["max_q"], a["sum_q"]) == (3, 100000, 500000, 900000)
    assert a["avg_q"] == 300000


def test_percentiles_bucket_exact_interpolation(spark):
    out = p.percentiles_bucket(_buckets(spark), group_by=("g",), pcts=(0.5,)).collect()
    by_g = {r["g"]: r for r in out}
    # group a bucket values (quantized): 100000, 300000, 500000 -> p50 = 300000
    assert by_g["a"]["pval_q"] == 300000 and by_g["a"]["pct"] == 0.5


def test_significant_text_doc_frequency(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import significant_text

    # "x x x" counts ONCE for doc frequency (array_distinct dedup);
    # token "x": fg 1 of 1 fg-doc, bg 2 of 3 docs -> lift (1/tot_fg)/(2/tot_bg)
    df = spark.createDataFrame(
        [("x x x y", 1), ("x z", 0), ("z y", 0)], "text string, fg int"
    )
    got = {r["key"]: r for r in significant_text(df, "text", "fg = 1", min_doc_count=1).collect()}
    assert got["x"]["bg_count"] == 2  # doc frequency, not term frequency 3+1
    assert got["x"]["fg_count"] == 1


def test_cumulative_cardinality_first_seen(spark):
    # ids: a in buckets 0,10 (first 0); b in 10 (first 10); c in 20 (first 20)
    # bucket 10 has activity but only 1 NEW id; cum = 1, 2, 3
    df = spark.createDataFrame(
        [(0, "a"), (12, "a"), (13, "b"), (25, "c")], "t long, id string"
    )
    out = p.cumulative_cardinality(df, "t", "id", 10).collect()
    assert [(r["key"], r["new_ids"], r["cum_cardinality"]) for r in out] == [
        (0, 1, 1), (10, 1, 2), (20, 1, 3),
    ]


def test_serial_diff_null_head(spark):
    out = p.serial_diff(_buckets(spark), group_by=("g",), lag=2).collect()
    a = [r for r in out if r["g"] == "a"]
    assert [r["sdiff_q"] for r in a] == [None, None, 300000 - 100000]


def test_normalize_percent_of_sum_and_moving_median(spark):
    out = p.normalize_buckets(_buckets(spark), group_by=("g",), window=2).collect()
    a = {r["key"]: r for r in out if r["g"] == "a"}
    # group a total vq = 900000; bucket key=2 share = 500000/900000
    assert a[2]["pct_of_sum_q"] == (500000 * 1_000_000) // 900000
    # trailing-2 median at key 2 = (100000+500000)/2 = 300000 (*1e6 quanta)
    assert a[2]["mov_p50_q"] == 300000 * 1_000_000
    b = [r for r in out if r["g"] == "b"]
    assert b[0]["pct_of_sum_q"] == 1_000_000  # single bucket = 100%


def test_moving_fn_excludes_current_bucket_and_shift_includes(spark):
    """ES window contract: shift=0 frames the `window` buckets BEFORE the
    current one; shift=1 slides right to include it; empty frames NULL."""
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.operators.pipeline import moving_fn

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in [(1, 10), (2, 20), (3, 30), (4, 40)]],
        "key long, value double",
    )
    q = 10_000  # quantize=4
    rows = {r["key"]: r for r in moving_fn(df, window=2).collect()}
    assert rows[1]["mfn_sum_q"] is None and rows[1]["mfn_avg_q"] is None
    assert rows[2]["mfn_sum_q"] == 10 * q and rows[2]["mfn_n"] == 1
    assert rows[3]["mfn_sum_q"] == 30 * q  # buckets 1+2
    assert rows[4]["mfn_sum_q"] == 50 * q  # buckets 2+3
    assert rows[4]["mfn_max_q"] == 30 * q and rows[4]["mfn_min_q"] == 20 * q
    assert rows[4]["mfn_avg_q"] == 25 * q

    shifted = {r["key"]: r for r in moving_fn(df, window=2, shift=1).collect()}
    assert shifted[1]["mfn_sum_q"] == 10 * q  # current included
    assert shifted[4]["mfn_sum_q"] == 70 * q  # buckets 3+4

    # floor (not truncate) average on negative sums
    neg = spark.createDataFrame(
        [(1, -1.0), (2, -2.0), (3, 0.0)], "key long, value double"
    )
    got = {r["key"]: r for r in moving_fn(neg, window=2).collect()}
    assert got[3]["mfn_avg_q"] == (-3 * q) // 2  # floors toward -inf


def test_change_point_finds_planted_step(spark):
    """A series with a planted mean shift must split exactly at the shift;
    a flat series reports near-zero gain; <2 buckets emit NULL fields."""
    from elasticsearch_drift_plugin_spark.operators.pipeline import change_point

    rows = [("A", k, 10.0) for k in range(10)] + [("A", k, 50.0) for k in range(10, 20)]
    rows += [("B", k, 7.0) for k in range(20)]     # flat
    rows += [("C", 0, 3.0)]                        # single bucket
    df = spark.createDataFrame(rows, "g string, key long, value double")
    got = {r["g"]: r for r in change_point(df, group_by=("g",)).collect()}

    a = got["A"]
    assert a["change_key"] == 10 and a["n_before"] == 10 and a["n_after"] == 10
    assert a["mean_before_q"] == 100_000 and a["mean_after_q"] == 500_000
    assert a["gain_mq"] > 0

    b = got["B"]
    assert b["gain_mq"] == 0  # flat: zero between-segment variance

    c = got["C"]
    assert c["n_buckets"] == 1 and c["change_key"] is None


def test_ks_test_exact_d_statistic(spark):
    """KS D on known samples: A={1,2,3,4}, B={3,4,5,6} -> D = 1/2 at v=2
    (ECDF_A=2/4, ECDF_B=0); identical samples -> D=0."""
    from elasticsearch_drift_plugin_spark.operators.pipeline import ks_test

    rows = [("a", k, float(v)) for k, v in enumerate([1, 2, 3, 4])]
    rows += [("b", k, float(v)) for k, v in enumerate([3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "g string, key long, value double")
    r = ks_test(df, "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["d_q"] == 500_000  # D = 0.5

    same = spark.createDataFrame(
        [("a", k, float(k)) for k in range(5)] + [("b", k, float(k)) for k in range(5)],
        "g string, key long, value double",
    )
    assert ks_test(same, "g", "a", "b").collect()[0]["d_q"] == 0


def test_bucket_correlation_known_values(spark):
    """Perfectly correlated / anti-correlated / orthogonal series, keyed
    join semantics (only shared keys count)."""
    from elasticsearch_drift_plugin_spark.operators.pipeline import (
        bucket_correlation,
    )

    def series(g, vals, keys=None):
        ks = keys or range(len(vals))
        return [(g, k, float(v)) for k, v in zip(ks, vals)]

    schema = "g string, key long, value double"
    up = series("a", [1, 2, 3, 4])
    assert bucket_correlation(
        spark.createDataFrame(up + series("b", [2, 4, 6, 8]), schema), "g", "a", "b"
    ).collect()[0]["corr_q"] == 1_000_000
    anti = bucket_correlation(
        spark.createDataFrame(up + series("b", [8, 6, 4, 2]), schema), "g", "a", "b"
    ).collect()[0]["corr_q"]
    assert anti == -1_000_000
    # constant series -> zero variance -> NULL r
    flat = bucket_correlation(
        spark.createDataFrame(up + series("b", [5, 5, 5, 5]), schema), "g", "a", "b"
    ).collect()[0]
    assert flat["corr_q"] is None
    # only overlapping keys enter: disjoint tail ignored
    partial = bucket_correlation(
        spark.createDataFrame(
            up + series("b", [2, 4], keys=[0, 1]) + series("b", [9], keys=[99]),
            schema,
        ),
        "g", "a", "b",
    ).collect()[0]
    assert partial["n"] == 2 and partial["corr_q"] == 1_000_000


def test_zscore_flags_planted_spike(spark):
    """A flat series with one spike: the spike bucket gets a huge |z| and
    the anomaly flag; baseline buckets sit near zero; the first bucket
    (empty baseline) and zero-variance baselines emit NULL z."""
    import math

    from elasticsearch_drift_plugin_spark.operators.pipeline import zscore

    vals = [10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 500.0, 10.0]
    df = spark.createDataFrame(
        [("g", k, v) for k, v in enumerate(vals)], "g string, key long, value double"
    )
    rows = {r["key"]: r for r in zscore(df, group_by=("g",), window=6).collect()}
    assert rows[0]["z_mq"] is None           # no baseline
    assert rows[1]["z_mq"] is None           # single-point baseline (n<2)
    assert rows[6]["anomaly"] and rows[6]["z_mq"] > 3000
    assert not rows[3]["anomaly"] and abs(rows[3]["z_mq"]) < 3000
    # closed form for bucket 2: baseline {10,11} (x1e4 quanta)
    n, s, s2 = 2, 210000, 100000**2 + 110000**2
    want = math.floor((100000 * n - s) / math.sqrt(n * s2 - s * s) * 1000)
    assert rows[2]["z_mq"] == want
    # zero-variance baseline -> NULL
    flat = spark.createDataFrame(
        [("g", k, 5.0) for k in range(4)], "g string, key long, value double"
    )
    out = zscore(flat, group_by=("g",), window=3).collect()
    assert all(r["z_mq"] is None for r in out)
