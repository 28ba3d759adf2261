"""Live push-source adapters for the streaming twins.

The operators are source-agnostic (anything producing the flow schema
drops in); this module supplies the ONE live, unbounded, push-based
source available inside a broker-less sandbox — Spark's built-in
``socket`` source — so the streaming twins are exercised against a real
network feed, not only file replay. Against a production cluster the
same parse projection reads Kafka: swap ``format("socket")`` for
``format("kafka")`` and ``value`` arrives as bytes instead of a line
(SCALE.md "Kafka recipe").

Caveat, stated loudly: the socket source is NOT replayable — it provides
at-most-once delivery and cannot recover from a checkpoint (Spark's own
documentation scopes it to testing). The recoverable in-sandbox evidence
stays with the file ``AvailableNow`` + checkpoint-kill tests; this
adapter adds the live-push dimension those cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """The raw unbounded line stream from a TCP socket."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", int(port))
        .load()
    )


def parse_csv_stream(lines: DataFrame, schema: str) -> DataFrame:
    """Parse a line stream's ``value`` column as headerless CSV into the
    given DDL schema — the socket/Kafka-value analogue of reading typed
    parquet. ``from_csv`` is a native expression (codegen, map-only);
    malformed lines yield NULL fields rather than killing the query
    (PERMISSIVE, the streaming default a production feed needs)."""
    return lines.select(
        F.from_csv(F.col("value"), schema).alias("r")
    ).select("r.*")


def socket_flows(
    spark: SparkSession, host: str, port: int, schema: str
) -> DataFrame:
    """Typed flow records from a live TCP feed of CSV lines."""
    return parse_csv_stream(socket_lines(spark, host, port), schema)
