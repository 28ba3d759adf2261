"""As-of join — the canonical "operator Spark lacks" (no built-in ASOF
JOIN), composed from existing DataFrame ops the scale-correct way.

For each left row, find the most recent right row with
``right_time <= left_time`` within the same key. Instead of the naive
inequality join (fan-out = right rows per key, then a rank filter), the
two sides are UNIONed and sorted per key by (time, side) with a
``last(..., ignorenulls)`` running window carrying the latest right
payload forward — one shuffle on the key, O(left + right) rows total, no
fan-out anywhere. DuckDB's native ``ASOF JOIN`` is the oracle.

Scale notes: the single window per key is the same partitioning a
sort-merge join would use; skew follows the key distribution. Ties on
(key, time) between right rows must be resolved upstream (dedup to one
row) or the match is ambiguous in ANY engine — the query below keys the
right side to max-id-per-timestamp first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.flows import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: str,
) -> DataFrame:
    """Left as-of join: every left row, plus the ``payload`` of the latest
    right row at-or-before its time (NULL when none). Output = left columns
    + ``payload``."""
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    r = (
        right.select(
            F.col(key),
            F.col(right_time).alias("__t"),
            F.col(payload).alias("__p"),
        )
        .withColumn("__side", F.lit(0))
    )
    lcols = [c for c in left.columns]
    unioned = l.select(
        *lcols, "__t", "__side", F.lit(None).cast(r.schema["__p"].dataType).alias("__p")
    ).unionByName(
        r.select(
            *[
                F.col(c) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
            ],
            "__t",
            "__side",
            "__p",
        )
    )
    # right rows sort BEFORE left rows at equal time ⇒ "at-or-before" (<=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(payload, F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(*lcols, payload)
    )


def _events_with_custkey(events: DataFrame, customer: DataFrame) -> DataFrame:
    n_cust = customer.count()
    return events.select(
        "event_id",
        (F.pmod(F.col("user_id"), F.lit(n_cust)) + 1).alias("ck"),
        F.col("ts").alias("__raw_ts"),
        # exact integer ns→ms: epoch ns exceeds 2^53, so double division would
        # round half the rows 1 ms off the DuckDB oracle's epoch_ms
    ).select("event_id", "ck", F.expr("__raw_ts div 1000000").alias("t_ms"))


def latest_order_asof(events: DataFrame, customer: DataFrame, orders: DataFrame) -> DataFrame:
    """(event_id, okey): each event's owning customer's most recent order
    placed at-or-before the event (NULL if none)."""
    ev = _events_with_custkey(events, customer)
    # right side: one row per (cust, date) — max orderkey breaks date ties
    o = (
        orders.select(
            F.col("o_custkey").alias("ck"),
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("t_ms"),
            F.col("o_orderkey").alias("okey"),
        )
        .groupBy("ck", "t_ms")
        .agg(F.max("okey").alias("okey"))
    )
    return asof_join(ev, o, "ck", "t_ms", "t_ms", "okey").select(
        "event_id", "okey"
    ).orderBy("event_id")


ASOF_SQL = """
WITH ev AS (
  SELECT event_id,
         (((user_id % (SELECT COUNT(*) FROM customer))
           + (SELECT COUNT(*) FROM customer)) % (SELECT COUNT(*) FROM customer)) + 1 AS ck,
         epoch_ms(ts) AS t_ms
  FROM events
),
o AS (
  SELECT o_custkey AS ck, epoch_ms(o_orderdate) AS t_ms, max(o_orderkey) AS okey
  FROM orders GROUP BY 1, 2
)
SELECT ev.event_id, o.okey
FROM ev ASOF LEFT JOIN o ON ev.ck = o.ck AND ev.t_ms >= o.t_ms
ORDER BY ev.event_id
"""


def queries() -> dict:
    return {
        "rel_asof_latest_order": lambda s, d: latest_order_asof(
            load_table(s, d, "events"),
            load_table(s, d, "customer"),
            load_table(s, d, "orders"),
        ),
    }


def oracle_sql() -> dict:
    return {"rel_asof_latest_order": ASOF_SQL}
