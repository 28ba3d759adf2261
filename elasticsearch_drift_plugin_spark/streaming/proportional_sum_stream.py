"""Streaming ``proportional_sum`` — Structured Streaming over continuously
arriving flow records.

The reference is query-time batch over an index that happens to be written
continuously (SURVEY.md §7.5); the Spark-native equivalent declared here:
``readStream`` of flow records → the SAME stateless explode/ratio prefix as
the batch operator (shared code — operators.proportional_sum.
explode_contributions — so the two cannot drift) → watermarked
``groupBy(key)`` aggregation.

Design notes (SURVEY.md §7.5):
- event time = the bucket key itself (``key_ts``): a bucket closes when the
  watermark passes the *bucket*, so a flow's early buckets can finalize
  while its tail buckets are still open. Flows arriving later than
  ``watermark_delay`` past their buckets are dropped (documented divergence
  from batch; batch replay reconciles).
- per-bucket sums are monotone-additive, so ``update`` output mode
  suffices (the reference's incremental non-final reduces —
  InternalProportionalSumHistogram.java:382, :505 — are the same idea);
  ``append`` emits each bucket once when the watermark passes it.
- min_doc_count / empty-fill / ordering are final-reduce (serving-edge)
  concerns in the reference; in streaming they apply on the sink table,
  not in-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.proportional_sum import _ms_param, explode_contributions
from ..params import normalize


def proportional_sum_stream(
    stream: DataFrame,
    start_col: str,
    end_col: str,
    value_col: str,
    sampling_col: str | None = None,
    *,
    interval: int | str | None = None,
    calendar_interval: str | None = None,
    offset: int | str = 0,
    start=None,
    end=None,
    time_zone: str | None = None,
    watermark_delay: str = "10 minutes",
    group_by: tuple = (),
    max_buckets_per_row: int = 100_000,
    quantize: int | None = None,
) -> DataFrame:
    """Streaming variant: identical bucket/ratio semantics, watermarked agg.

    Returns a streaming DataFrame ``[group_by…, key, key_ts, doc_count,
    value]`` for ``.writeStream.outputMode('update'|'append')``.

    ``quantize`` mirrors the batch operator's deterministic mode (floor each
    contribution to ``10^-quantize`` and sum exact integers) so a bounded
    stream replay hash-matches the batch/oracle result bit-for-bit.
    """
    p = normalize(
        interval=interval,
        calendar_interval=calendar_interval,
        offset=offset,
        start=_ms_param(start),
        end=_ms_param(end),
        time_zone=time_zone,
    )
    # fixed+tz streams since r13: explode_contributions converts the
    # local-grid bucket edge to its UTC-instant key at the explode level
    # (shared with batch — the two cannot drift), so the groupBy below
    # sees real instants and the watermark semantics are unchanged.
    exploded, contrib = explode_contributions(
        stream,
        start_col,
        end_col,
        value_col,
        sampling_col,
        p,
        group_by=group_by,
        max_buckets_per_row=max_buckets_per_row,
    )
    if quantize is not None:
        scale = float(10**quantize)
        value_agg = F.coalesce(
            F.sum(F.floor(F.col("__contrib") * F.lit(scale))) / F.lit(scale), F.lit(0.0)
        ).alias("value")
    else:
        value_agg = F.coalesce(F.sum("__contrib"), F.lit(0.0)).alias("value")
    agg = (
        exploded.withColumn("__contrib", contrib)
        .withColumn("key_ts", F.timestamp_millis(F.col("key")))
        .withWatermark("key_ts", watermark_delay)
        .groupBy(*group_by, "key", "key_ts")
        .agg(
            value_agg,
            F.count(F.lit(1)).alias("doc_count"),
        )
    )
    return agg.select(*group_by, "key", "key_ts", "doc_count", "value")
