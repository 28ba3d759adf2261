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


def _morton_expr(xcol: str, ycol: str, bits: int) -> str:
    """Bit-interleave (Morton / Z-order) of two ``bits``-bit nonneg ints."""
    parts = [
        f"(shiftleft(shiftright({xcol}, {i}) & 1, {2 * i}) | "
        f"shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1}))"
        for i in range(bits)
    ]
    return " | ".join(parts)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 12,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order (Morton) interleave of two
    numeric columns — the data-skipping layout for tables queried by
    BOTH dimensions at once (Delta/Iceberg ``OPTIMIZE ZORDER BY``
    re-expressed with stock Spark):

    1. min-max normalize each column into ``[0, 2^bits)`` (the range
       bounds are an O(1)-row aggregate, broadcast via crossJoin);
    2. interleave the bits into one Morton key — a pure JVM shift/or
       expression, map-only;
    3. ``repartitionByRange`` + ``sortWithinPartitions`` on the key, so
       each output file covers a compact Z-curve segment and carries
       TIGHT parquet min/max stats on *both* source columns.

    A reader filtering on x AND y then skips most files/row-groups on
    footer stats alone — the pytest asserts the overlap count drops vs a
    single-dimension sort. At 100 TB this is the periodic compaction job
    shape: the only shuffle is the range partitioner's, sized by
    ``num_files`` (pass executor-count-scaled values there).

    Min-max normalization is the documented simplification: heavily
    skewed dimensions want rank/quantile normalization (swap step 1 for
    ``percentile_approx`` boundaries) — the interleave and layout stages
    are unchanged.
    """
    top = (1 << bits) - 1
    rng = df.agg(
        F.min(x_col).alias("__xmin"), F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"), F.max(y_col).alias("__ymax"),
    )
    norm = (
        df.crossJoin(F.broadcast(rng))
        .withColumn(
            "__zx",
            F.expr(
                f"CAST(FLOOR((CAST({x_col} AS DOUBLE) - __xmin) /"
                f" greatest(CAST(__xmax AS DOUBLE) - __xmin, 1e-12) * {top}) AS BIGINT)"
            ),
        )
        .withColumn(
            "__zy",
            F.expr(
                f"CAST(FLOOR((CAST({y_col} AS DOUBLE) - __ymin) /"
                f" greatest(CAST(__ymax AS DOUBLE) - __ymin, 1e-12) * {top}) AS BIGINT)"
            ),
        )
        .withColumn("__z", F.expr(_morton_expr("__zx", "__zy", bits)))
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )
    (
        norm.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__zx", "__zy", "__z")
        .write.mode(mode)
        .parquet(path)
    )
