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


def _with_session_ids(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    order,
    gap_ms: int,
) -> DataFrame:
    """Append 1-based ``session_id`` per key: new session when the start
    exceeds the running max end of earlier rows (in ``order``) by more than
    ``gap_ms``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_sess = F.when(
        prev_end.isNull() | (F.col(start_col) > prev_end + gap_ms), 1
    ).otherwise(0)
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


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
    from ..sources.flows import pin_result

    order = [F.col(start_col), F.col(end_col), *[F.col(c) for c in order_tiebreak]]
    sess = _with_session_ids(df, list(key_cols), start_col, end_col, order, gap_ms)
    # pin before the serving sort: the window + session agg run on the
    # reduce side of the key exchange, so the range-sampling pass re-ran
    # them (guide §7.2; A/B 0.89 → 0.74 s at sf0.1); the pinned rows are
    # session-sized, not fragment-sized
    return pin_result(
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
    ).orderBy(*key_cols, "session_id")


def sessionize_chunked(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    value_col: str,
    gap_ms: int,
    chunk_ms: int,
    order_tiebreak: Sequence[str] = (),
    quantize: int = 4,
) -> DataFrame:
    """Skew-resistant :func:`sessionize`: identical output, two phases.

    The plain operator's window partitions by the flow key, so ONE hot key
    (a scanning host, a misconfigured exporter) serializes its whole
    timeline into one task. Here fragments are first sessionized within
    ``(key, floor(start / chunk_ms))`` — a hot key's timeline splits into
    parallel chunk tasks — then the per-chunk *sessions* (orders of
    magnitude fewer rows than fragments) are stitched with the same
    gap rule across chunk boundaries in a second, short window.

    Equivalence (tested on skewed + randomized fixtures): chunk-local
    merging uses a subset of the global predecessors, so it never joins
    fragments the global rule would separate; the stitch pass sees every
    local session ordered by start with the same running-max-end rule, so
    it rejoins exactly the boundary-spanning sessions. Values stay in
    integer quanta until the final divide — bit-identical to the batch
    operator's quantized sums.

    Pick ``chunk_ms`` >> typical session span (e.g. a day for minute-scale
    sessions): the phase-2 row count per key is then #chunks + #sessions,
    not #fragments.
    """
    keys = list(key_cols)
    scale = float(10**quantize)
    chunked = df.withColumn(
        "__chunk", F.floor(F.col(start_col) / F.lit(int(chunk_ms)))
    )
    order1 = [F.col(start_col), F.col(end_col), *[F.col(c) for c in order_tiebreak]]
    local = _with_session_ids(
        chunked, [*keys, "__chunk"], start_col, end_col, order1, gap_ms
    )
    locsess = local.groupBy(*keys, "__chunk", "session_id").agg(
        F.min(start_col).alias("session_start"),
        F.max(end_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_flows"),
        F.coalesce(
            F.sum(F.floor(F.col(value_col) * F.lit(scale))), F.lit(0).cast("long")
        ).alias("__q"),
    ).drop("session_id")
    order2 = [F.col("session_start"), F.col("session_end")]
    stitched = _with_session_ids(
        locsess, keys, "session_start", "session_end", order2, gap_ms
    )
    from ..sources.flows import pin_result

    # same serving-sort pin as the batch operator (guide §7.2)
    return pin_result(
        stitched.groupBy(*keys, "session_id")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_flows").alias("n_flows"),
            (F.sum("__q") / F.lit(scale)).alias("value"),
        )
    ).orderBy(*keys, "session_id")


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
