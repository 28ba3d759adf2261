"""Pipeline aggregations over bucket-histogram results — the host-ES
surface users chain onto the reference's operator output (ES `derivative`,
`cumulative_sum`, `moving_fn` pipeline aggs run exactly there: on the
sibling date-histogram's bucket list).

Spark-first: each is one window over the RESULT table (bucket rows, i.e.
orders of magnitude smaller than the input), partitioned by the owning
group and ordered by the bucket key — no second pass over raw data.

Determinism: the bucket `value` is already a 10^-q quantum grid (psum
quantize mode), so the ops re-integerize it (``round(value * 10^q)`` —
bit-identical in any engine since the double inputs are bit-identical) and
do ALL window arithmetic on longs. Derivative of the first bucket is NULL,
matching ES (the derivative agg emits nothing for the first bucket,
DerivativePipelineAggregator semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_pipeline(
    result: DataFrame,
    group_by=(),
    key_col: str = "key",
    value_col: str = "value",
    quantize: int = 4,
    moving_window: int = 7,
) -> DataFrame:
    """(group…, key, vq, cum_q, diff_q, msum{N}_q): cumulative sum,
    first-derivative and trailing ``moving_window``-bucket sum of the
    quantized bucket value, per owning group in bucket-key order."""
    scale = 10**quantize
    vq = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    base = result.select(*group_by, F.col(key_col).alias("key"), vq.alias("vq"))
    w = Window.partitionBy(*group_by).orderBy("key")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wmov = w.rowsBetween(-(moving_window - 1), 0)
    return base.select(
        *group_by,
        "key",
        "vq",
        F.sum("vq").over(wcum).alias("cum_q"),
        (F.col("vq") - F.lag("vq").over(w)).alias("diff_q"),
        F.sum("vq").over(wmov).alias(f"msum{moving_window}_q"),
    ).orderBy(*group_by, "key")


def bucket_pipeline_sql(
    base_sql: str,
    group_by=(),
    quantize: int = 4,
    moving_window: int = 7,
) -> str:
    """DuckDB twin: wraps a bucket-histogram oracle query (columns
    ``group…, key, value``) with the same windows."""
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base)
SELECT {sel_keys}key, vq,
       SUM(vq) OVER ({part}ORDER BY key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_q,
       vq - LAG(vq) OVER ({part}ORDER BY key) AS diff_q,
       SUM(vq) OVER ({part}ORDER BY key
                     ROWS BETWEEN {moving_window - 1} PRECEDING AND CURRENT ROW)
         AS msum{moving_window}_q
FROM q ORDER BY {sel_keys}key
"""
