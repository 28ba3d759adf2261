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


def test_zorder_write_improves_two_dim_skipping(spark, tmp_path):
    """Z-order clustering must tighten BOTH columns' per-file min/max
    envelopes vs a one-dimension sort: a conjunctive range predicate then
    overlaps fewer files on footer stats alone."""
    import itertools

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.sources.sinks import write_zordered

    # two independent uniform dims (hash-decorrelated)
    df = spark.range(20_000).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(1000)).alias("y"),
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sorted")
    write_zordered(df, zpath, "x", "y", num_files=16)
    # baseline: same file count, clustered by x only
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def overlapping(path, dim, lo, hi):
        """# files whose footer min/max for `dim` intersects [lo, hi]."""
        n_total, n_hit = 0, 0
        for f in sorted(__import__("pathlib").Path(path).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            mins, maxs = [], []
            for rg, ci in itertools.product(range(md.num_row_groups), range(md.num_columns)):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == dim and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
            if not mins:
                continue
            n_total += 1
            if min(mins) <= hi and max(maxs) >= lo:
                n_hit += 1
        return n_hit, n_total

    # the structural contrast: in the x-sorted layout EVERY file's y range
    # spans ~the full domain (y is independent of x), so a y-only range
    # predicate prunes nothing; z-order bounds y per file
    z_hits, z_total = overlapping(zpath, "y", 0, 100)
    s_hits, s_total = overlapping(spath, "y", 0, 100)
    assert s_hits == s_total          # baseline: zero y-skipping
    assert z_hits < z_total           # z-order: real y-skipping
    assert z_hits < s_hits
    # correctness: the rewrite loses/duplicates nothing
    assert spark.read.parquet(zpath).count() == 20_000
    back = spark.read.parquet(zpath).groupBy().agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy")).collect()[0]
    orig = df.groupBy().agg(F.sum("x").alias("sx"), F.sum("y").alias("sy")).collect()[0]
    assert (back.sx, back.sy) == (orig.sx, orig.sy)
