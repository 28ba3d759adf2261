"""Flow sessionization: merge per-record flow fragments that share a key
into sessions separated by an idle gap.

The reference ingests already-aggregated netflow records (README.md:56-84);
real collectors emit *fragments* (one record per active-timeout window) that
pipelines re-merge upstream. This operator is that stage, Spark-first:

- **batch** (:func:`sessionize`): a window-function plan — running max of
  the end time per key (ordered by a total order), a new-session flag when
  the gap exceeds ``gap_ms``, a running sum of flags as the session id, and
  one groupBy to collapse fragments. Two shuffles total (both on the key),
  codegen'd end-to-end, DuckDB-reproducible for the oracle gate.
- **streaming** (:mod:`..streaming.flow_sessions`): same semantics under
  ``applyInPandasWithState``.

Scale notes (100 TB): everything partitions by the flow key (5-tuple-like,
high cardinality, near-uniform). The window never materializes per-key data
beyond Spark's sort-based window buffering, and the session groupBy reuses
the same partitioning (no extra exchange between window and groupBy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    value_col: str,
    gap_ms: int,
    order_tiebreak: Sequence[str] = (),
    quantize: int = 4,
) -> DataFrame:
    """(key…, session_id, session_start, session_end, n_flows, value):
    fragments whose start is within ``gap_ms`` of the running max end of
    earlier fragments (total order: start, end, tiebreaks) join the open
    session; otherwise they begin session ``id+1`` (ids are 1-based, per
    key)."""
    order = [F.col(start_col), F.col(end_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_sess = F.when(
        prev_end.isNull() | (F.col(start_col) > prev_end + gap_ms), 1
    ).otherwise(0)
    sess = df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(*key_cols, "session_id")
        .agg(
            F.min(start_col).alias("session_start"),
            F.max(end_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_flows"),
            # quantized integer sum: double-summation order under a shuffle
            # is engine-dependent in the last ulps (same trick as psum)
            F.coalesce(
                F.sum(F.floor(F.col(value_col) * F.lit(float(10**quantize))))
                / F.lit(float(10**quantize)),
                F.lit(0.0),
            ).alias("value"),
        )
        .orderBy(*key_cols, "session_id")
    )


def sessionize_sql(
    flows_sql: str,
    key_cols: Sequence[str],
    gap_ms: int,
    order_tiebreak: Sequence[str] = (),
    quantize: int = 4,
) -> str:
    """DuckDB twin of :func:`sessionize` over ``flows_sql`` with columns
    ``start_ms``/``end_ms``/``value``."""
    keys = ", ".join(key_cols)
    order = ", ".join(["start_ms", "end_ms", *order_tiebreak])
    q = float(10**quantize)
    return f"""
WITH flows AS ({flows_sql}),
flagged AS (
  SELECT *,
         CASE WHEN max(end_ms) OVER (PARTITION BY {keys} ORDER BY {order}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start_ms > max(end_ms) OVER (PARTITION BY {keys} ORDER BY {order}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + {gap_ms}
              THEN 1 ELSE 0 END AS new_sess
  FROM flows
),
with_id AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY {keys} ORDER BY {order}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT {keys}, CAST(session_id AS BIGINT) AS session_id, min(start_ms) AS session_start,
       max(end_ms) AS session_end, COUNT(*) AS n_flows,
       COALESCE(CAST(SUM(CAST(FLOOR(value * {q}) AS BIGINT)) AS DOUBLE) / {q}, 0.0) AS value
FROM with_id GROUP BY {keys}, session_id ORDER BY {keys}, session_id
"""
