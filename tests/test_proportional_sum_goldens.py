"""Golden tests transcribed from the reference's integration tests
(FIXTURES.md §2-§4; es-8.18.2 src/test ProportionalSumAggregatorIT.java,
SamplingIT.java, OffsetIT.java). These are the only quantitative anchors the
reference publishes — they pin the operator's numeric semantics.
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from elasticsearch_drift_plugin_spark import proportional_sum

FLOW_SCHEMA = T.StructType(
    [
        T.StructField("flow_id", T.LongType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("sampling", T.DoubleType(), True),
    ]
)


def ms(*args) -> int:
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def golden_a(spark):
    # ProportionalSumAggregatorIT.java:70-78 — 8 docs, 2012, month-scale
    # ranges incl. one long Jan->Apr flow and one zero-duration doc.
    rows = [
        (1, ms(2012, 1, 2), ms(2012, 2, 3), 1.0, None),
        (2, ms(2012, 2, 2), ms(2012, 3, 3), 2.0, None),
        (3, ms(2012, 2, 15), ms(2012, 3, 16), 3.0, None),
        (4, ms(2012, 3, 2), ms(2012, 4, 3), 4.0, None),
        (5, ms(2012, 3, 15), ms(2012, 4, 16), 5.0, None),
        (6, ms(2012, 3, 23), ms(2012, 4, 24), 6.0, None),
        (7, ms(2012, 1, 1), ms(2012, 4, 23), 6.0, None),
        (8, ms(2012, 1, 2), ms(2012, 1, 2), 7.0, None),
    ]
    return spark.createDataFrame(rows, FLOW_SCHEMA)


def test_golden_a_monthly_buckets(golden_a):
    out = proportional_sum(
        golden_a,
        "start_ms",
        "end_ms",
        "value",
        calendar_interval="month",
        start=ms(2012, 1, 1),
        end=ms(2012, 5, 1),
    ).collect()
    # ProportionalSumAggregatorIT.java:126-158 golden values (±0.01).
    assert [r.key for r in out] == [ms(2012, m, 1) for m in (1, 2, 3, 4)]
    assert [r.doc_count for r in out] == [3, 4, 6, 4]
    expected = [9.58, 4.97, 11.37, 8.07]
    for r, exp in zip(out, expected):
        assert r.value == pytest.approx(exp, abs=0.01)
    # Total ≈ 34 of the 35 indexed units: flow 7's tail past the clamp is
    # dropped, NOT renormalized (ProportionalSumAggregatorIT.java:128-136).
    assert sum(r.value for r in out) == pytest.approx(34.0, abs=0.05)


def test_golden_b_sampling(spark):
    # SamplingIT.java:70-74 — 4 docs over [2012-01-01, 2012-01-31].
    rows = [
        (1, ms(2012, 1, 1), ms(2012, 1, 31), 100.0, 1.0),
        (2, ms(2012, 1, 1), ms(2012, 1, 31), 1.0, 100.0),
        (3, ms(2012, 1, 1), ms(2012, 1, 31), 2.0, 50.0),
        (4, ms(2012, 1, 1), ms(2012, 1, 31), 3.0, 100.0 / 3.0),
    ]
    df = spark.createDataFrame(rows, FLOW_SCHEMA)
    with_sampling = proportional_sum(
        df,
        "start_ms",
        "end_ms",
        "value",
        "sampling",
        calendar_interval="month",
        start=ms(2012, 1, 1),
        end=ms(2012, 1, 31),
    ).collect()
    # SamplingIT.java:105-132 — each flow scales to 100 → 400 total.
    assert len(with_sampling) == 1
    assert with_sampling[0].doc_count == 4
    assert with_sampling[0].value == pytest.approx(400.0, abs=0.01)

    without = proportional_sum(
        df,
        "start_ms",
        "end_ms",
        "value",
        calendar_interval="month",
        start=ms(2012, 1, 1),
        end=ms(2012, 1, 31),
    ).collect()
    # SamplingIT.java:134-161 — raw sum 106.
    assert without[0].value == pytest.approx(106.0, abs=0.01)


def test_golden_c_auto_offset(spark):
    # OffsetIT.java:70-75, :104-135 — 1-minute flow; month calendar interval
    # WINS over the also-set 30s numeric interval; bucket key == query start
    # via effectiveOffset = start - round(start).
    start = int(datetime(2018, 2, 12, 11, 10, tzinfo=timezone.utc).timestamp() * 1000)
    end = int(datetime(2018, 2, 12, 11, 40, tzinfo=timezone.utc).timestamp() * 1000)
    f_start = int(datetime(2018, 2, 12, 11, 31, tzinfo=timezone.utc).timestamp() * 1000)
    f_end = int(datetime(2018, 2, 12, 11, 32, tzinfo=timezone.utc).timestamp() * 1000)
    df = spark.createDataFrame([(1, f_start, f_end, 1.0, 1.0)], FLOW_SCHEMA)
    out = proportional_sum(
        df,
        "start_ms",
        "end_ms",
        "value",
        "sampling",
        interval=30_000,
        calendar_interval="month",
        start=start,
        end=end,
    ).collect()
    assert len(out) == 1
    assert out[0].key == start
    assert out[0].doc_count == 1
    assert out[0].value == pytest.approx(1.0, abs=1e-9)
