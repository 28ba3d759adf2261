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

from ..sources import flows as flows_src
from ..sources.flows import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: str,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the ``payload`` of the matched
    right row (NULL when none). Output = left columns + ``payload``.

    ``direction`` (the pandas ``merge_asof`` surface):

    - ``backward`` (default): latest right at-or-before the left time;
    - ``forward``: earliest right at-or-after;
    - ``nearest``: whichever of the two is closer in time; an exact tie in
      distance resolves backward (deterministic, documented — engines
      disagree on this edge otherwise).

    ``tolerance`` (same time units as the time columns) drops matches
    farther than the bound — applied per side before the ``nearest``
    choice, exactly like pandas.

    Still one union + one sorted window pass per key, O(left + right), no
    fan-out. Forward matches run as a REVERSED-sort running frame: the
    first non-null in ``[current, end]`` under ``(t asc, side asc)`` is the
    last non-null in ``[start, current]`` under ``(t desc, side desc)`` —
    Spark evaluates an UnboundedFollowing frame by re-scanning the rest of
    the partition for every row (O(rows² per key)) while a running frame
    is one streaming pass, so the swap costs one extra in-partition sort
    and no extra shuffle. ``nearest`` therefore evaluates one backward and
    one reversed running frame over the same exchange."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    # forward: right rows sort AFTER left at equal time so the
    # current-row-inclusive following frame still sees them (>= contract);
    # backward/nearest: right rows sort BEFORE left (<= contract)
    rside_val = 2 if direction == "forward" else 0
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    r = (
        right.select(
            F.col(key),
            F.col(right_time).alias("__t"),
            F.col(payload).alias("__p"),
        )
        .withColumn("__side", F.lit(rside_val))
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
    order = Window.partitionBy(key).orderBy(F.col("__t"), F.col("__side"))
    wback = order.rowsBetween(Window.unboundedPreceding, 0)
    # forward frame, reversed (see docstring): same hash partitioning, so
    # Catalyst plans one exchange and two in-partition sorts
    rev = Window.partitionBy(key).orderBy(
        F.col("__t").desc(), F.col("__side").desc()
    )
    wfwd_rev = rev.rowsBetween(Window.unboundedPreceding, 0)
    rmatch = F.when(F.col("__side") != 1, F.struct("__t", "__p"))
    unioned = unioned.withColumn("__m", rmatch)

    def _gate(m, dist):
        ok = m.isNotNull()
        if tolerance is not None:
            ok = ok & (dist <= F.lit(int(tolerance)))
        return ok

    # Each window value materializes ONCE into a column before any field
    # access: WindowExec does no CSE across window expressions, so every
    # `m["__t"]` / `m["__p"]` reference would otherwise become its own
    # window computation (the nearest case measured 14 evaluations of 2
    # distinct frames before this projection boundary).
    if direction == "backward":
        unioned = unioned.withColumn(
            "__mb", F.last("__m", ignorenulls=True).over(wback)
        )
        m = F.col("__mb")
        out = F.when(_gate(m, F.col("__t") - m["__t"]), m["__p"])
    elif direction == "forward":
        unioned = unioned.withColumn(
            "__mf", F.last("__m", ignorenulls=True).over(wfwd_rev)
        )
        m = F.col("__mf")
        out = F.when(_gate(m, m["__t"] - F.col("__t")), m["__p"])
    else:  # nearest: both frames over one exchange. An equal-time right
        # row sorts into the backward frame only — the forward frame
        # missing it is harmless because distance 0 always wins backward.
        unioned = unioned.withColumn(
            "__mb", F.last("__m", ignorenulls=True).over(wback)
        ).withColumn("__mf", F.last("__m", ignorenulls=True).over(wfwd_rev))
        b, f = F.col("__mb"), F.col("__mf")
        bd, fd = F.col("__t") - b["__t"], f["__t"] - F.col("__t")
        bok, fok = _gate(b, bd), _gate(f, fd)
        out = (
            F.when(bok & fok, F.when(fd < bd, f["__p"]).otherwise(b["__p"]))
            .when(bok, b["__p"])
            .when(fok, f["__p"])
        )
    return (
        unioned.withColumn(payload, out)
        .where(F.col("__side") == 1)
        .select(*lcols, payload)
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: str,
    chunk_ms: int,
) -> DataFrame:
    """Skew-resistant :func:`asof_join`: identical output, chunked windows.

    The plain operator's running window partitions by the key, so one hot
    key serializes all its rows into a single task. Here time is split into
    ``chunk_ms`` chunks and the carry across chunks is PRE-AGGREGATED:

    1. per (key, chunk): the latest right payload inside the chunk — one
       groupBy, map-side combinable;
    2. per key: a running window over those chunk summaries (#chunks rows,
       not #rows) yields each chunk's carry-in payload — the only remaining
       per-key serial pass, shorter by the rows-per-chunk factor;
    3. per (key, chunk): the original union-window runs with the carry-in
       injected as a synthetic right row at the chunk floor — hot keys now
       parallelize across their chunks.

    Ties: same contract as :func:`asof_join` (right deduped per (key, time)
    upstream); the chunk summary takes the lexicographic max of
    (time, payload) so equal-time rows resolve identically in any engine.
    """
    step = int(chunk_ms)
    chunk_of = lambda c: F.floor(c / F.lit(step)).cast("long")  # noqa: E731

    r = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.col(payload).alias("__p"),
    ).withColumn("__chunk", chunk_of(F.col("__t")))
    ptype = r.schema["__p"].dataType

    # 1. chunk summaries: latest right (time, payload) per (key, chunk)
    summaries = r.groupBy(key, "__chunk").agg(
        F.max(F.struct(F.col("__t"), F.col("__p"))).alias("__last")
    )
    # 2. carry-in per chunk: latest summary payload from any EARLIER chunk,
    # computed over the spine of chunks present on either side
    l = left.withColumn("__t", F.col(left_time)).withColumn(
        "__chunk", chunk_of(F.col(left_time))
    )
    # one distinct AFTER the union: its partial aggregation already dedups
    # both inputs map-side, so a pre-union distinct on the left pairs would
    # only add a second full exchange of the same rows
    spine = (
        l.select(key, "__chunk")
        .unionByName(summaries.select(key, "__chunk"))
        .distinct()
    )
    wprev = (
        Window.partitionBy(key)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(summaries, [key, "__chunk"], "left")
        .withColumn("__carry", F.last("__last", ignorenulls=True).over(wprev))
        .select(key, "__chunk", F.col("__carry.__p").alias("__cp"))
    )

    # 3. chunk-local union window: carry-in sorts before everything in its
    # chunk (side -1 at the chunk floor), right rows before left at eq. time
    lcols = list(left.columns)
    lside = l.select(
        *lcols, "__chunk", "__t", F.lit(1).alias("__side"),
        F.lit(None).cast(ptype).alias("__p"),
    )
    null_l = [
        F.col(c) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in lcols
    ]
    rside = r.select(*null_l, "__chunk", "__t", F.lit(0).alias("__side"), "__p")
    cside = carry.where(F.col("__cp").isNotNull()).select(
        *null_l,
        "__chunk",
        (F.col("__chunk") * step).alias("__t"),
        F.lit(-1).alias("__side"),
        F.col("__cp").alias("__p"),
    )
    w = (
        Window.partitionBy(key, "__chunk")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        lside.unionByName(rside).unionByName(cside)
        .withColumn(payload, F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(*lcols, payload)
    )


def _events_with_custkey(events: DataFrame, customer: DataFrame) -> DataFrame:
    n_cust = customer.count()
    return events.select(
        "event_id",
        (F.pmod(F.col("user_id"), F.lit(n_cust)) + 1).alias("ck"),
        flows_src.ts_ms_col(events).alias("t_ms"),
    )


def latest_order_asof(
    events: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    chunk_ms: int | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """(event_id, okey): each event's owning customer's matched order under
    the given as-of ``direction``/``tolerance`` (NULL if none). ``chunk_ms``
    switches to the time-chunked hot-key plan (:func:`asof_join_chunked`,
    backward-only) — same output by contract, so both run against the same
    oracle."""
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
    if chunk_ms is not None:
        joined = asof_join_chunked(ev, o, "ck", "t_ms", "t_ms", "okey", chunk_ms)
    else:
        joined = asof_join(
            ev, o, "ck", "t_ms", "t_ms", "okey",
            direction=direction, tolerance=tolerance,
        )
    # pin the narrow (event_id, okey) result before the global sort: the
    # range-sampling pass otherwise re-runs the whole union-window lineage
    # (guide §7.2; A/B at sf0.1: backward 1.36→1.14, nearest 1.80→1.18,
    # chunked 2.79→2.40 on the same host window)
    from ..sources.flows import pin_result

    return pin_result(joined.select("event_id", "okey")).orderBy("event_id")


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

_ASOF_PRELUDE = """
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
)"""

ASOF_FORWARD_SQL = f"""{_ASOF_PRELUDE}
SELECT ev.event_id, o.okey
FROM ev ASOF LEFT JOIN o ON ev.ck = o.ck AND ev.t_ms <= o.t_ms
ORDER BY ev.event_id
"""


def asof_nearest_sql(tolerance_ms: int) -> str:
    """Nearest = a backward and a forward ASOF join combined: tolerance
    gates each side, smaller distance wins, exact tie resolves backward —
    the same contract :func:`asof_join` documents."""
    return f"""{_ASOF_PRELUDE},
b AS (
  SELECT ev.event_id, ev.t_ms, o.t_ms AS bt, o.okey AS bk
  FROM ev ASOF LEFT JOIN o ON ev.ck = o.ck AND ev.t_ms >= o.t_ms
),
f AS (
  SELECT ev.event_id, o.t_ms AS ft, o.okey AS fk
  FROM ev ASOF LEFT JOIN o ON ev.ck = o.ck AND ev.t_ms <= o.t_ms
)
SELECT b.event_id,
       CASE
         WHEN bok AND fok THEN CASE WHEN ft - t_ms < t_ms - bt THEN fk ELSE bk END
         WHEN bok THEN bk
         WHEN fok THEN fk
       END AS okey
FROM (
  SELECT b.*, f.ft, f.fk,
         (bk IS NOT NULL AND t_ms - bt <= {int(tolerance_ms)}) AS bok,
         (fk IS NOT NULL AND ft - t_ms <= {int(tolerance_ms)}) AS fok
  FROM b JOIN f USING (event_id)
) AS b
ORDER BY b.event_id
"""


def queries() -> dict:
    return {
        "rel_asof_latest_order": lambda s, d: latest_order_asof(
            load_table(s, d, "events"),
            load_table(s, d, "customer"),
            load_table(s, d, "orders"),
        ),
        # hot-key skew variant (time-chunked carry pre-aggregation); output
        # contract is row-identity, so the SAME DuckDB ASOF oracle applies
        "rel_asof_chunked": lambda s, d: latest_order_asof(
            load_table(s, d, "events"),
            load_table(s, d, "customer"),
            load_table(s, d, "orders"),
            chunk_ms=30 * 86_400_000,
        ),
        "rel_asof_forward": lambda s, d: latest_order_asof(
            load_table(s, d, "events"),
            load_table(s, d, "customer"),
            load_table(s, d, "orders"),
            direction="forward",
        ),
        "rel_asof_nearest": lambda s, d: latest_order_asof(
            load_table(s, d, "events"),
            load_table(s, d, "customer"),
            load_table(s, d, "orders"),
            direction="nearest",
            tolerance=90 * 86_400_000,
        ),
    }


def oracle_sql() -> dict:
    return {
        "rel_asof_latest_order": ASOF_SQL,
        "rel_asof_chunked": ASOF_SQL,
        "rel_asof_forward": ASOF_FORWARD_SQL,
        "rel_asof_nearest": asof_nearest_sql(90 * 86_400_000),
    }
