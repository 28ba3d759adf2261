"""Histogram sink round-trips: partitioned layout, partition pruning on
read, and the streaming append writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark import proportional_sum
from elasticsearch_drift_plugin_spark.plans import explain_str
from elasticsearch_drift_plugin_spark.sources import sinks
from elasticsearch_drift_plugin_spark.streaming import proportional_sum_stream

SCHEMA = "start_ms long, end_ms long, value double, sampling double"
DAY = 86_400_000
BASE = 1_704_067_200_000  # 2024-01-01


def _result(spark, days=5):
    rows = [(BASE + i * DAY, BASE + (i + 1) * DAY, 10.0 + i, None) for i in range(days)]
    return proportional_sum(
        spark.createDataFrame(rows, SCHEMA), "start_ms", "end_ms", "value", "sampling",
        interval=DAY,
    )


def test_batch_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "hist")
    res = _result(spark)
    sinks.write_histogram(res, path)

    back = sinks.read_histogram(spark, path)
    assert {r.key: (r.doc_count, r.value) for r in back.collect()} == {
        r.key: (r.doc_count, r.value) for r in res.collect()
    }

    # a 2-day range read must scan only the covered date partitions
    ranged = sinks.read_histogram(spark, path, start_ms=BASE + DAY, end_ms=BASE + 2 * DAY)
    keys = sorted(r.key for r in ranged.collect())
    assert keys == [BASE + DAY, BASE + 2 * DAY]
    plan = explain_str(ranged)
    assert "PartitionFilters" in plan and "key_date" in plan.split("PartitionFilters", 1)[1]


def test_stream_writer_appends_closed_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows = [(BASE, BASE + DAY, 5.0, None), (BASE + 10 * DAY, BASE + 10 * DAY + 1, 1.0, None)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = proportional_sum_stream(
        stream, "start_ms", "end_ms", "value", "sampling", interval=DAY,
        watermark_delay="1 hour",
    )
    q = sinks.write_histogram_stream(agg, out, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the far-future flow advanced the watermark past the first flow's
    # buckets, so append mode finalized them to parquet
    back = sinks.read_histogram(spark, out)
    got = {r.key: r.value for r in back.collect()}
    assert got[BASE] == pytest.approx(5.0)
