"""Edge-case semantics from SURVEY.md §2 fine print / FIXTURES.md §5 —
the correctness traps the reference's code encodes."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_drift_plugin_spark import proportional_sum
from elasticsearch_drift_plugin_spark.params import normalize, parse_interval, parse_offset

SCHEMA = "start_ms long, end_ms long, value double, sampling double"


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    samp = kw.pop("sampling_col", None)
    return proportional_sum(df, "start_ms", "end_ms", "value", samp, **kw).collect()


def test_zero_duration_single_bucket(spark):
    # start == end: ratio forced to 1, exactly one bucket
    # (ProportionalSumAggregator.java:198-201).
    out = run(spark, [(150, 150, 5.0, None)], interval=100)
    assert len(out) == 1 and out[0].key == 100
    assert out[0].value == 5.0 and out[0].doc_count == 1


def test_boundary_end_terminal_bucket(spark):
    # A flow ending exactly on a bucket boundary lands in that terminal
    # bucket with overlap 0: doc_count +1, value +0 (loop <= lastRounded,
    # ProportionalSumAggregator.java:190).
    out = run(spark, [(0, 200, 10.0, None)], interval=100)
    assert [(r.key, r.doc_count, r.value) for r in out] == [
        (0, 1, 5.0),
        (100, 1, 5.0),
        (200, 1, 0.0),
    ]


def test_clamp_drops_not_renormalizes(spark):
    # Mass outside [start, end] is dropped (README total 34-of-35 trap).
    out = run(spark, [(0, 1000, 100.0, None)], interval=100, start=200, end=399)
    keys = [r.key for r in out]
    assert keys == [200, 300]
    assert sum(r.value for r in out) == pytest.approx(20.0)


def test_null_value_counts_but_adds_zero(spark):
    out = run(spark, [(0, 100, None, None), (0, 100, 4.0, None)], interval=100)
    assert out[0].doc_count == 2 and out[0].value == pytest.approx(4.0)
    # all-NULL bucket reduces to 0.0, not NULL
    out2 = run(spark, [(0, 100, None, None)], interval=100)
    assert out2[0].value == 0.0 and out2[0].doc_count == 1


def test_nan_value_treated_as_missing(spark):
    out = run(spark, [(0, 100, float("nan"), None), (0, 100, 2.0, None)], interval=100)
    assert out[0].value == pytest.approx(2.0) and out[0].doc_count == 2


def test_sampling_ignored_cases(spark):
    # sampling in {0, NULL, NaN, Inf} → multiplier ignored
    # (ProportionalSumAggregator.java:171-180).
    rows = [
        (0, 100, 1.0, 0.0),
        (0, 100, 1.0, None),
        (0, 100, 1.0, float("nan")),
        (0, 100, 1.0, float("inf")),
        (0, 100, 1.0, 3.0),
    ]
    out = run(spark, rows, sampling_col="sampling", interval=100)
    assert out[0].value == pytest.approx(1 + 1 + 1 + 1 + 3)


def test_flow_outside_range_generates_nothing(spark):
    out = run(spark, [(0, 99, 1.0, None), (500, 600, 1.0, None)], interval=100, start=200, end=399)
    assert out == []


def test_flow_ending_at_range_start_counts(spark):
    # end == query start → zero-overlap first bucket still gets the doc.
    out = run(spark, [(0, 200, 8.0, None)], interval=100, start=200, end=399, offset=1000)
    # offset=1000 ≡ 0 mod 100 keeps grid aligned while suppressing auto-offset
    assert [(r.key, r.doc_count, r.value) for r in out] == [(200, 1, 0.0)]


def test_multi_bucket_partial_full_partial(spark):
    out = run(spark, [(50, 350, 30.0, None)], interval=100)
    assert [(r.key, r.value) for r in out] == [(0, 5.0), (100, 10.0), (200, 10.0), (300, 5.0)]
    assert all(r.doc_count == 1 for r in out)


def test_min_doc_count_filter(spark):
    rows = [(0, 100, 1.0, None), (0, 100, 1.0, None), (100, 200, 1.0, None)]
    out = run(spark, rows, interval=100, min_doc_count=2)
    # bucket 100 has docs 1,2,3 (terminal zero-overlap for first two)... compute:
    # flows 1,2 cover [0,100] -> buckets 0 and 100(terminal); flow 3 -> 100,200(terminal)
    assert [(r.key, r.doc_count) for r in out] == [(0, 2), (100, 3)]


def test_empty_fill_zero_buckets(spark):
    rows = [(0, 100, 1.0, None), (500, 600, 2.0, None)]
    out = run(spark, rows, interval=100, min_doc_count=0)
    keys = [r.key for r in out]
    assert keys == [0, 100, 200, 300, 400, 500, 600]
    fill = [r for r in out if r.key in (200, 300, 400)]
    assert all(r.doc_count == 0 and r.value == 0.0 for r in fill)


def test_extended_bounds_widen_fill(spark):
    out = run(
        spark,
        [(200, 300, 1.0, None)],
        interval=100,
        min_doc_count=0,
        extended_bounds=(0, 500),
    )
    assert [r.key for r in out] == [0, 100, 200, 300, 400, 500]


def test_order_by_count_then_key(spark):
    rows = [(0, 100, 1.0, None), (100, 300, 9.0, None)]
    out = run(spark, rows, interval=100, order=[("_count", False)])
    # counts: bucket0:1(flow1), 100:2(flow1 terminal+flow2), 200:1, 300:1(terminal)
    assert [r.key for r in out][0] == 100
    assert [r.key for r in out][1:] == [0, 200, 300]  # tie broken by key asc


def test_key_as_string_format(spark):
    out = run(spark, [(0, 100, 1.0, None)], interval=86_400_000, key_format="yyyy-MM-dd")
    assert out[0].key_as_string == "1970-01-01"


def test_group_by_and_extra_aggs(spark):
    df = spark.createDataFrame(
        [(0, 100, 1.0, None, "a"), (0, 100, 3.0, None, "b")], SCHEMA + ", tag string"
    )
    out = proportional_sum(
        df,
        "start_ms",
        "end_ms",
        "value",
        interval=100,
        group_by=("tag",),
        extra_aggs={"vmax": __import__("pyspark.sql.functions", fromlist=["max"]).max("value")},
    ).collect()
    by_tag = {(r.tag, r.key): (r.value, r.vmax) for r in out}
    assert by_tag[("a", 0)] == (1.0, 1.0) and by_tag[("b", 0)] == (3.0, 3.0)


DAY_MS = 86_400_000


def test_sweep_covers_fixed_width_calendar_units(spark):
    """Calendar day/week/hour are constant-width under UTC-only rounding,
    so sweep must be BIT-identical to explode for them (same quantize
    guarantee as fixed intervals); month stays explode-only."""
    import random

    rnd = random.Random(11)
    base = 1_700_000_000_000
    rows = []
    for i in range(120):
        s = base + rnd.randint(0, 90 * DAY_MS)
        rows.append(
            (s, s + rnd.randint(0, 40 * DAY_MS), float(rnd.randint(-50, 200)), None)
        )
    rows.append((base, base, 7.0, None))  # zero-duration
    df = spark.createDataFrame(rows, SCHEMA)
    for unit, off in (("day", 0), ("day", 3_600_001), ("week", 0), ("week", 5), ("hour", 0)):
        kw = dict(calendar_interval=unit, offset=off, quantize=6)
        a = proportional_sum(
            df, "start_ms", "end_ms", "value", "sampling", strategy="sweep", **kw
        ).collect()
        b = proportional_sum(
            df, "start_ms", "end_ms", "value", "sampling", strategy="explode", **kw
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], (unit, off)
    with pytest.raises(ValueError, match="month/year"):
        proportional_sum(
            df, "start_ms", "end_ms", "value", "sampling",
            calendar_interval="month", quantize=6, strategy="sweep",
        )


def test_bucket_pipeline_golden(spark):
    """ES pipeline-agg semantics over the bucket list: cumulative sum,
    first-derivative (NULL for the first bucket, like ES derivative),
    trailing moving-window sum."""
    from elasticsearch_drift_plugin_spark.operators.pipeline import bucket_pipeline

    rows = [(0, 100, 10.0, None), (100, 200, 4.0, None), (300, 400, 6.0, None)]
    res = proportional_sum(
        spark.createDataFrame(rows, SCHEMA),
        "start_ms", "end_ms", "value", "sampling", interval=100, quantize=4,
    )
    out = {
        r.key: (r.vq, r.cum_q, r.diff_q, r.msum2_q)
        for r in bucket_pipeline(res, moving_window=2).collect()
    }
    # buckets: 0->10, 100->4(+ terminal of flow1: 0), 200->0, 300->6, 400->0
    assert out[0] == (100000, 100000, None, 100000)
    assert out[100] == (40000, 140000, -60000, 140000)
    assert out[300] == (60000, 200000, 60000, 60000)


def test_distinct_subagg_exact_vs_approx(spark):
    """Exact countDistinct sub-agg is the oracle-gated query; the
    approx_count_distinct swap (HLL, mergeable — the 100 TB cardinality
    path) must land within its documented relative error on every bucket."""
    rows = [(i % 4 * 100, i % 4 * 100 + 50, 1.0, None, i % 257) for i in range(2000)]
    df = spark.createDataFrame(rows, SCHEMA + ", uid long")
    kw = dict(interval=100, group_by=(), extra_aggs=None)
    exact = proportional_sum(
        df, "start_ms", "end_ms", "value", "sampling", interval=100,
        extra_aggs={"n": F.countDistinct("uid")},
    ).collect()
    approx = proportional_sum(
        df, "start_ms", "end_ms", "value", "sampling", interval=100,
        extra_aggs={"n": F.approx_count_distinct("uid", rsd=0.05)},
    ).collect()
    ex = {r.key: r.n for r in exact}
    ap = {r.key: r.n for r in approx}
    assert set(ex) == set(ap)
    for k, n in ex.items():
        assert abs(ap[k] - n) <= max(1, 0.15 * n), (k, n, ap[k])


def test_fill_buckets_carry_empty_extra_aggs(spark):
    """min_doc_count=0 fill rows get each extra agg's empty-aggregation
    value (the EmptyBucketInfo analog): count-likes fill with 0, max with
    NULL — not unconditional NULLs."""
    df = spark.createDataFrame(
        [(0, 99, 1.0, None, "x"), (300, 399, 2.0, None, "y")], SCHEMA + ", tag string"
    )
    out = proportional_sum(
        df,
        "start_ms",
        "end_ms",
        "value",
        interval=100,
        min_doc_count=0,
        extra_aggs={"vmax": F.max("value"), "ntags": F.count("tag")},
    ).collect()
    by_key = {r.key: (r.doc_count, r.vmax, r.ntags) for r in out}
    assert set(by_key) == {0, 100, 200, 300}
    assert by_key[0] == (1, 1.0, 1) and by_key[300] == (1, 2.0, 1)
    for k in (100, 200):  # filled buckets
        assert by_key[k] == (0, None, 0), k


def test_timestamp_input_columns(spark):
    df = spark.createDataFrame(
        [(0, 100, 1.0)], "start_ms long, end_ms long, value double"
    ).selectExpr(
        "timestamp_millis(start_ms) AS st", "timestamp_millis(end_ms) AS en", "value"
    )
    out = proportional_sum(df, "st", "en", "value", interval=100).collect()
    assert out[0].key == 0 and out[0].value == 1.0


# --- parameter normalization unit tests ------------------------------------


def test_interval_precedence_calendar_wins():
    assert parse_interval(30_000, "month") == ("calendar", None, "month")
    assert parse_interval("month") == ("calendar", None, "month")
    assert parse_interval("90m") == ("fixed", 5_400_000, None)
    with pytest.raises(ValueError):
        parse_interval(0)


def test_offset_parsing():
    assert parse_offset("1h") == 3_600_000
    assert parse_offset("-30m") == -1_800_000
    assert parse_offset(250) == 250
    with pytest.raises(ValueError):
        parse_offset("1x")


def test_offset_parsing_timevalue_parity():
    """parseStringOffset delegates to ES TimeValue.parseTimeValue
    (ProportionalSumAggregationBuilder.java:274-305); mirror its full unit
    table and its error surface."""
    assert parse_offset("+90m") == 5_400_000
    assert parse_offset("2d") == 172_800_000
    assert parse_offset("1500micros") == 1  # TimeValue.millis() truncates
    assert parse_offset("2500000nanos") == 2
    assert parse_offset("0") == 0  # bare zero needs no unit
    # ES >= 7.0 (the reference's whole range): fractional values throw
    for frac in ("1.5h", "0.5d", "-2.5m"):
        with pytest.raises(ValueError, match="fractional time values are not supported"):
            parse_offset(frac)


def test_auto_offset_fixed():
    p = normalize(interval=3_600_000, start=7_230_000)
    assert p.offset_ms == 7_230_000 % 3_600_000
    # explicit offset suppresses auto-derivation
    p2 = normalize(interval=3_600_000, offset=60_000, start=7_230_000)
    assert p2.offset_ms == 60_000


def test_quantize_matches_unquantized(spark):
    rows = [(i * 10, i * 10 + 250, float(i), None) for i in range(1, 50)]
    exact = {r.key: r.value for r in run(spark, rows, interval=100)}
    quant = {r.key: r.value for r in run(spark, rows, interval=100, quantize=6)}
    assert exact.keys() == quant.keys()
    for k in exact:
        assert quant[k] == pytest.approx(exact[k], abs=1e-4)


def test_negative_start_raises_at_runtime(spark):
    # ProportionalSumAggregator.java:143-145 — field values must be >= 0
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run(spark, [(-5, 100, 1.0, None)], interval=100)


def test_end_before_start_raises_at_runtime(spark):
    # ProportionalSumAggregator.java:153-159 — rangeEnd must be >= rangeStart
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run(spark, [(500, 100, 1.0, None)], interval=100)


def test_validate_false_skips_checks_for_prevalidated_input(spark):
    # validate=False removes the per-row check expressions (caller
    # guarantees validity — e.g. re-aggregating engine output); results
    # are identical on valid input
    rows = [(0, 250, 5.0, None)]
    assert run(spark, rows, interval=100, validate=False) == run(
        spark, rows, interval=100, validate=True
    )


def test_explode_bomb_guard(spark):
    # circuit-breaker analog (InternalProportionalSumHistogram.java:383-387):
    # a row overlapping more than max_buckets_per_row buckets must fail
    # loudly, not OOM the executor
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run(spark, [(0, 10_000_000, 1.0, None)], interval=1,
            max_buckets_per_row=1000)


def test_sweep_strategy_grouped_matches_explode(spark):
    rows = [
        ("a", 0, 950, 10.0, None),
        ("a", 100, 100, 3.0, 2.0),
        ("b", 50, 420, 7.0, None),
        ("b", 0, 80, None, None),  # NULL value: counted, adds zero
    ]
    df = spark.createDataFrame(
        rows, "g string, start_ms long, end_ms long, value double, sampling double"
    )
    kw = dict(interval=100, quantize=6, group_by=("g",))
    a = proportional_sum(df, "start_ms", "end_ms", "value", "sampling",
                         strategy="sweep", **kw).collect()
    b = proportional_sum(df, "start_ms", "end_ms", "value", "sampling",
                         strategy="explode", **kw).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 15  # group a: buckets 0..900 (10); group b: 0..400 (5)


def test_empty_fill_respects_groups(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, 100, 1.0, None),
            ("a", 500, 600, 2.0, None),  # gap 200..400 in group a
            ("b", 200, 300, 3.0, None),  # single bucket, no gap
        ],
        "g string, start_ms long, end_ms long, value double, sampling double",
    )
    out = proportional_sum(
        df, "start_ms", "end_ms", "value", "sampling",
        interval=100, min_doc_count=0, group_by=("g",),
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((r.key, r.doc_count))
    # group a: spine 0..600 with zero-fill between its own bounds
    assert [k for k, _ in by_g["a"]] == [0, 100, 200, 300, 400, 500, 600]
    assert [dc for k, dc in by_g["a"] if k in (200, 300, 400)] == [0, 0, 0]
    # group b: only its own buckets — no bleed from group a's span
    assert [k for k, _ in by_g["b"]] == [200, 300]


def test_order_by_subagg_metric(spark):
    # row 21: ordering by a sub-aggregation's value, desc, key tie-break
    from pyspark.sql import functions as F

    rows = [(0, 100, 1.0, None), (100, 200, 9.0, None), (200, 300, 5.0, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = proportional_sum(
        df, "start_ms", "end_ms", "value", "sampling",
        interval=100, extra_aggs={"vmax": F.max("value")}, order=[("vmax", False)],
    ).collect()
    # bucket 100: flow1 terminal + flow2 → vmax 9; bucket 200: flow2 terminal
    # + flow3 → vmax 9 (tie broken by key asc); bucket 300: flow3 terminal →
    # vmax 5; bucket 0: flow1 → vmax 1
    assert [r.key for r in out] == [100, 200, 300, 0]
    assert [r.vmax for r in out] == [9.0, 9.0, 5.0, 1.0]


def test_calendar_grouped_fill_per_group_bounds(spark):
    DAY = 86_400_000
    BASE = 1_704_067_200_000  # 2024-01-01
    df = spark.createDataFrame(
        [
            ("a", BASE, BASE + DAY, 1.0, None),
            ("a", BASE + 4 * DAY, BASE + 5 * DAY, 2.0, None),
            ("b", BASE + 10 * DAY, BASE + 11 * DAY, 3.0, None),
        ],
        "g string, start_ms long, end_ms long, value double, sampling double",
    )
    out = proportional_sum(
        df, "start_ms", "end_ms", "value", "sampling",
        calendar_interval="day", min_doc_count=0, group_by=("g",),
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.key)
    assert by_g["a"] == [BASE + i * DAY for i in range(6)]  # days 0..5 incl fill
    assert by_g["b"] == [BASE + 10 * DAY, BASE + 11 * DAY]  # no bleed from a


def test_sweep_strategy_with_fill_and_min_doc_count(spark):
    rows = [(0, 100, 1.0, None), (500, 600, 2.0, None), (500, 600, 4.0, None)]
    for extra in (
        dict(min_doc_count=0),   # zero-fill downstream of the sweep
        dict(min_doc_count=2),   # post-agg filter downstream of the sweep
        dict(start=50, end=550),  # clamp interplay
    ):
        kw = dict(interval=100, quantize=6, **extra)
        a = run(spark, rows, strategy="sweep", **kw)
        b = run(spark, rows, strategy="explode", **kw)
        assert [tuple(r) for r in a] == [tuple(r) for r in b], extra


DAY = 86400000


def test_offset_boundary_row_before_start_credited(spark):
    # With an explicit offset, round(start) < start: a row ending in
    # [round(start), start) still runs the reference bucket loop once —
    # round(max(s,start)) == round(e) — and is credited proportionally to the
    # boundary bucket (ProportionalSumAggregator.java:183-218). A raw
    # end >= start pre-filter would silently drop it.
    D = 20 * DAY  # a midnight
    rows = [(D - 3600000, D - 1800000, 100.0, None)]  # 23:00–23:30 previous day
    out = run(spark, rows, interval=DAY, offset=1, start=D, end=D + DAY)
    assert [(r.key, r.doc_count, r.value) for r in out] == [(D - DAY + 1, 1, 100.0)]


def test_offset_boundary_row_after_end_credited(spark):
    # Symmetric on the end side: a row starting in (end, round(end)+interval)
    # has round(s) == round(end) so the loop still runs once. end is mid-grid
    # (23:30) so round(end)+interval extends past it to the next 00:00:00.001.
    D = 20 * DAY
    end = D + DAY - 1800000  # 23:30
    rows = [(D + DAY - 900000, D + DAY, 60.0, None)]  # 23:45–24:00, after `end`
    out = run(spark, rows, interval=DAY, offset=1, start=D, end=end)
    assert [(r.key, r.doc_count, r.value) for r in out] == [(D + 1, 1, 60.0)]


def test_offset_boundary_row_outside_rounded_range_dropped(spark):
    # Entirely before round(start): the loop never runs; row contributes
    # nothing (and the pre-filter may prune it at the scan).
    D = 20 * DAY
    rows = [(D - 2 * DAY, D - DAY, 100.0, None)]  # ends exactly at round(start)-1+... below lo
    out = run(spark, rows, interval=DAY, offset=1, start=D, end=D + DAY)
    assert out == []


def test_offset_boundary_row_calendar(spark):
    # Calendar-interval variant: round is date_trunc on the offset-shifted
    # grid; same boundary-credit semantics.
    D = 20 * DAY
    rows = [(D - 3600000, D - 1800000, 100.0, None)]
    out = run(spark, rows, calendar_interval="day", offset=1, start=D, end=D + DAY)
    assert [(r.key, r.doc_count, r.value) for r in out] == [(D - DAY + 1, 1, 100.0)]


def test_time_zone_day_buckets_across_dst_gap(spark):
    """time_zone extension: day buckets are LOCAL midnights; the US
    spring-forward day (2024-03-10, America/New_York) is 23 h wide in UTC
    and receives proportionally less of a spanning flow's value."""
    s = 1709985600000  # 2024-03-09T12:00:00Z (07:00 EST)
    e = 1710244800000  # 2024-03-12T12:00:00Z (08:00 EDT); 72 h duration
    out = run(
        spark, [(s, e, 72.0, None)],
        calendar_interval="day", time_zone="America/New_York",
    )
    # local midnights as UTC instants: EST (-05) before the gap, EDT (-04) after
    mar9, mar10, mar11, mar12 = (
        1709960400000, 1710046800000, 1710129600000, 1710216000000
    )
    assert [(r.key, r.doc_count, round(r.value, 6)) for r in out] == [
        (mar9, 1, 17.0),   # 17 h of the flow in Mar 9 local
        (mar10, 1, 23.0),  # DST day: 23 h wide
        (mar11, 1, 24.0),
        (mar12, 1, 8.0),
    ]


def test_time_zone_fixed_interval_durations_and_bad_zone(spark):
    # r13: fixed+tz supports DURATION rows — both endpoints localize and
    # the ratio weights by local elapsed ms. Away from any DST
    # transition the result equals the UTC grid shifted by the zone
    # offset: a [0, 100) row at epoch (UTC-5 in New York) floors to
    # local key -18000000 (=1970-01-01 00:00 EST as local ms)… and the
    # OUTPUT key converts back to the UTC instant 0. Check mass splits.
    out = run(
        spark, [(0, 150, 3.0, None)],
        interval=100, time_zone="America/New_York",
    )
    assert [(r.key, r.doc_count, round(r.value, 6)) for r in out] == [
        (0, 1, 2.0), (100, 1, 1.0)
    ]
    with pytest.raises(ValueError, match="unknown time zone"):
        run(
            spark, [(0, 100, 1.0, None)],
            calendar_interval="day", time_zone="Not/AZone",
        )
    with pytest.raises(ValueError, match="unknown time zone"):
        run(spark, [(0, 0, 1.0, None)], interval=100, time_zone="Not/AZone")


def test_time_zone_auto_offset_uses_local_floor(spark):
    # auto-offset = start - round(start) where round is the LOCAL floor:
    # a start at exactly local midnight yields offset 0 and local-midnight keys
    start = 1709960400000  # 2024-03-09T00:00 EST
    out = run(
        spark, [(start, start + 3600000, 6.0, None)],
        calendar_interval="day", time_zone="America/New_York",
        start=start, end=start + 7200000,
    )
    assert [(r.key, r.value) for r in out] == [(start, 6.0)]


def test_time_zone_key_format_renders_local_wall_time(spark):
    s = 1709985600000  # 2024-03-09T12:00:00Z
    out = run(
        spark, [(s, s + 3600000, 6.0, None)],
        calendar_interval="day", time_zone="America/New_York",
        key_format="yyyy-MM-dd HH:mm",
    )
    # bucket key = Mar 9 local midnight = 05:00 UTC; rendered LOCAL
    assert out[0].key == 1709960400000
    assert out[0].key_as_string == "2024-03-09 00:00"


def test_time_zone_streaming_matches_batch(spark, tmp_path):
    from elasticsearch_drift_plugin_spark.streaming import proportional_sum_stream

    s = 1709985600000
    rows = [(s, s + 7200000, 6.0, None)]
    src = str(tmp_path / "tzsrc")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = proportional_sum_stream(
        stream, "start_ms", "end_ms", "value", "sampling",
        calendar_interval="day", time_zone="America/New_York",
        watermark_delay="365 days",
    )
    q = agg.writeStream.outputMode("update").format("memory").queryName("tz_out").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.key: r.value for r in spark.sql("SELECT * FROM tz_out").collect()}
    batch = {
        r.key: r.value
        for r in run(
            spark, rows, calendar_interval="day", time_zone="America/New_York"
        )
    }
    assert got == batch and list(got) == [1709960400000]
