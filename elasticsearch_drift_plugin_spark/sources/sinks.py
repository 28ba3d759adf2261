"""Histogram sinks: persist ``proportional_sum`` results (batch and
streaming) in a layout that stays queryable at scale.

The reference serves its histogram out of the coordinator response
(InternalProportionalSumHistogram.java:524-539 — JSON straight to the
caller); an engine owning storage needs the write side too. Layout choice:
parquet partitioned by ``key_date`` (the bucket key's UTC date). Serving
queries are almost always key-range scans, so date partitions give
partition PRUNING (only the requested days are read — verified by test),
and bucket rows within a day are few (bounded by intervals/day × group
cardinality), so files stay healthy-sized at any input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_key_date(result: DataFrame) -> DataFrame:
    src = F.col("key_ts") if "key_ts" in result.columns else F.timestamp_millis(F.col("key"))
    return result.withColumn("key_date", F.to_date(src))


def write_histogram(result: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Batch write, partitioned by bucket date."""
    _with_key_date(result).write.mode(mode).partitionBy("key_date").parquet(path)


def read_histogram(
    spark: SparkSession,
    path: str,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Read a stored histogram; key-range predicates are expressed on the
    partition column so only the covered date partitions are scanned."""
    df = spark.read.parquet(path)
    if start_ms is not None:
        df = df.where(F.col("key_date") >= F.to_date(F.timestamp_millis(F.lit(start_ms))))
        df = df.where(F.col("key") >= start_ms)
    if end_ms is not None:
        df = df.where(F.col("key_date") <= F.to_date(F.timestamp_millis(F.lit(end_ms))))
        df = df.where(F.col("key") <= end_ms)
    return df.drop("key_date")


def write_histogram_stream(
    agg: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Streaming write of ``proportional_sum_stream`` output. Append mode
    emits each bucket once when the watermark closes it (the streaming
    module's semantics); the same date-partitioned layout as batch, so one
    reader serves both. Returns the started StreamingQuery."""
    return (
        _with_key_date(agg)
        .writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("key_date")
        .format("parquet")
        .start(path)
    )


def create_bucketed_table(
    spark,
    name: str,
    schema_sql: str,
    bucket_col: str,
    location: str,
    n_buckets: int = 64,
) -> None:
    """Create a bucketed+sorted parquet table — the co-located join layout
    SCALE.md prescribes for the curation pipeline's one text-bearing join
    (survivors ⋈ documents on doc_id): when BOTH sides are bucketed on the
    join key into the same bucket count, Catalyst plans a SortMergeJoin
    with ZERO exchanges (plan-asserted in tests/test_plans.py). Populate
    with ``df.write.insertInto(name)``."""
    spark.sql(
        f"CREATE TABLE {name} ({schema_sql}) USING PARQUET "
        f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
        f"INTO {int(n_buckets)} BUCKETS LOCATION '{location}'"
    )
