"""Hypertable-style psum rollups: pre-aggregate fine-grain buckets at rest,
answer coarser-grain queries without rescanning raw flows.

The math that makes this exact: a flow's proportional contribution is
ADDITIVE across sub-intervals — ``overlap([a,c)) = overlap([a,b)) +
overlap([b,c))`` for any split point, and the ratio is linear in overlap —
so hour-grain `proportional_sum` buckets re-aggregate to day/week/month
totals that equal the direct coarse-grain query. Two deliberate deltas:

- **quantization drift**: quantized mode floors each (flow, fine-bucket)
  contribution, so a rolled-up coarse value sits below the direct coarse
  value by less than one quantum per (flow, fine-bucket) touch — the
  bucket-level bound is ``(touches − direct_doc_count)`` quanta (each
  flow's day value floors once directly vs once per touched hour rolled
  up). Relative error stays ~quantum/value per touch; at quantize=4 and
  typical per-touch values ≥ 1 that is ≤ 1e-4 relative. Bounded, tested.
- **doc_count semantics**: fine doc_counts count bucket TOUCHES; summing
  them over a day counts a 5-hour flow 5 times. The rollup therefore
  stores an HLL sketch of flow ids per fine bucket alongside the touch
  count — coarse distinct-flow counts come from unioning sketches
  (`operators.sketches` algebra), touches stay exact.

This is the retention pattern the reference's users run around the drift
agg: raw netflow expires in days, rollups serve months of dashboards. At
100 TB the rollup table is O(buckets × groups) rows — date-partitioned so
range queries prune at planning time — and re-aggregation shuffles rollup
rows, never flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .proportional_sum import proportional_sum
from .sketches import LG_K

DAY_MS = 86_400_000


def write_psum_rollup(
    flows: DataFrame,
    path: str,
    *,
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    value_col: str = "value",
    sampling_col: str | None = "sampling",
    id_col: str = "flow_id",
    fine_interval_ms: int = 3_600_000,
    quantize: int = 4,
    group_by: tuple = (),
    lg_k: int = LG_K,
    mode: str = "overwrite",
    dynamic_partitions: bool = False,
) -> None:
    """Persist fine-grain psum buckets (quantized exact sums + touch counts
    + per-bucket flow-id HLL sketch), parquet-partitioned by UTC date.

    ``dynamic_partitions=True`` (with ``mode='overwrite'``) replaces ONLY
    the date partitions present in this batch — the idempotent daily
    backfill: re-running a day's job overwrites that day's rollup rows and
    leaves every other day untouched. Requires complete days per run (a
    partial day would replace the full day's partition)."""
    scale = 10**quantize
    fine = proportional_sum(
        flows,
        start_col,
        end_col,
        value_col,
        sampling_col,
        interval=fine_interval_ms,
        quantize=quantize,
        group_by=group_by,
        extra_aggs={
            "flow_sketch": F.expr(f"hll_sketch_agg({id_col}, {int(lg_k)})")
        },
    )
    writer = (
        fine.select(
            *group_by,
            "key",
            F.floor(F.col("value") * F.lit(float(scale))).cast("long").alias("value_q"),
            F.col("doc_count").alias("touches"),
            "flow_sketch",
            (F.col("key") - F.pmod(F.col("key"), F.lit(DAY_MS))).alias("date_ms"),
        )
        .write.mode(mode)
        .partitionBy("date_ms")
    )
    if dynamic_partitions:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def rollup_psum(
    spark: SparkSession,
    path: str,
    coarse_interval_ms: int,
    *,
    group_by: tuple = (),
    start_ms: int | None = None,
    end_ms: int | None = None,
    quantize: int = 4,
) -> DataFrame:
    """(group..., key, value, touches, est_flows): coarse-grain buckets
    answered purely from the stored rollup. ``value`` is the exact sum of
    the fine quanta (see module docstring for the floor-drift bound vs a
    direct coarse query); ``est_flows`` is the HLL-union distinct flow
    estimate; the date range prunes partitions at planning time."""
    scale = float(10**quantize)
    df = spark.read.parquet(path)
    if start_ms is not None:
        df = df.where(F.col("date_ms") >= int(start_ms) - (int(start_ms) % DAY_MS))
    if end_ms is not None:
        df = df.where(F.col("date_ms") < int(end_ms))
    if start_ms is not None:
        df = df.where(F.col("key") >= int(start_ms))
    if end_ms is not None:
        df = df.where(F.col("key") < int(end_ms))
    coarse = (F.col("key") - F.pmod(F.col("key"), F.lit(int(coarse_interval_ms)))).alias(
        "key"
    )
    return (
        df.select(*group_by, coarse, "value_q", "touches", "flow_sketch")
        .groupBy(*group_by, "key")
        .agg(
            (F.sum("value_q") / F.lit(scale)).alias("value"),
            F.sum("touches").alias("touches"),
            F.expr("hll_sketch_estimate(hll_union_agg(flow_sketch))").alias(
                "est_flows"
            ),
        )
        .orderBy(*group_by, "key")
    )
