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

# Canonical date_trunc units both engines agree on (Spark date_trunc
# returns NULL — not an error — for anything else, so gate loudly).
_CC_CALENDAR_UNITS = frozenset(
    {"year", "quarter", "month", "week", "day", "hour", "minute", "second"}
)


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
       CAST(SUM(vq) OVER ({part}ORDER BY key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_q,
       vq - LAG(vq) OVER ({part}ORDER BY key) AS diff_q,
       CAST(SUM(vq) OVER ({part}ORDER BY key
                     ROWS BETWEEN {moving_window - 1} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS msum{moving_window}_q
FROM q ORDER BY {sel_keys}key
"""


# --------------------------------------------------------------------------
# bucket_selector + bucket_script + bucket_sort (parent pipeline aggs)
# --------------------------------------------------------------------------

def bucket_selector_topk(
    result: DataFrame,
    group_by=(),
    predicate: str = "vq >= 0",
    script: str = "vq div doc_count",
    size: int = 5,
    quantize: int = 4,
) -> DataFrame:
    """(group…, rank, key, vq, doc_count, script_q): ES ``bucket_selector``
    → ``bucket_script`` → ``bucket_sort`` chained, the way a real search
    body stacks them under one histogram:

    - selector: keep buckets satisfying ``predicate`` (SQL over ``vq``,
      ``doc_count``) — ES drops non-matching buckets from the response;
    - script: a per-bucket derived metric (integer quanta — ES evaluates a
      Painless script per bucket);
    - sort: top ``size`` buckets per owning group by the script value desc,
      key asc tie-break (ES ``bucket_sort`` with ``size``).

    All on the bucket list (result-sized, not input-sized): a filter, a
    projection, and one ranking window."""
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    base = result.select(
        *group_by, "key", vq.alias("vq"), F.col("doc_count").cast("long").alias("doc_count")
    )
    sel = base.where(F.expr(predicate)).withColumn("script_q", F.expr(script))
    w = Window.partitionBy(*group_by).orderBy(F.col("script_q").desc(), F.col("key").asc())
    return (
        sel.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= size)
        .select(*group_by, "rank", "key", "vq", "doc_count", "script_q")
        .orderBy(*group_by, "rank")
    )


def bucket_selector_topk_sql(
    base_sql: str,
    group_by=(),
    predicate: str = "vq >= 0",
    script: str = "vq // doc_count",
    size: int = 5,
    quantize: int = 4,
) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq,
             CAST(doc_count AS BIGINT) AS doc_count FROM base),
sel AS (SELECT *, {script} AS script_q FROM q WHERE {predicate}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER ({part}ORDER BY script_q DESC, key ASC) AS rank
  FROM sel
)
SELECT {sel_keys}CAST(rank AS BIGINT) AS rank, key, vq, doc_count, script_q
FROM ranked WHERE rank <= {size} ORDER BY {sel_keys}rank
"""


# --------------------------------------------------------------------------
# stats_bucket (sibling pipeline agg family)
# --------------------------------------------------------------------------

def stats_bucket(
    result: DataFrame, group_by=(), quantize: int = 4
) -> DataFrame:
    """(group…, n_buckets, min_q, max_q, sum_q, avg_q): the ES
    ``stats_bucket`` sibling (subsuming avg/min/max/sum_bucket) over the
    histogram's bucket values, per owning group. ``avg_q`` is the floored
    integer mean of quantized values — exact in any engine. One tiny
    aggregation over bucket rows."""
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    return (
        result.select(*group_by, vq.alias("vq"))
        .groupBy(*group_by)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("vq").alias("min_q"),
            F.max("vq").alias("max_q"),
            F.sum("vq").alias("sum_q"),
        )
        # floor (not truncate): negative sums must match the twin's `//`
        .withColumn("avg_q", F.expr("(sum_q - pmod(sum_q, n_buckets)) div n_buckets"))
        .orderBy(*group_by)
    )


def cumulative_cardinality(
    df: DataFrame,
    time_ms_col: str,
    id_col: str,
    step_ms: int | None = None,
    calendar_unit: str | None = None,
    offset_ms: int = 0,
    tz: str | None = None,
) -> DataFrame:
    """(key, new_ids, cum_cardinality): ES ``cumulative_cardinality`` — the
    running count of DISTINCT ids seen up to and including each time
    bucket — rewritten for scale as a *first-seen* aggregation: one shuffle
    by id finds each id's first bucket, a result-sized spine join restores
    buckets where no new id appeared, and a running sum over the bucket
    list finishes it. Exact (no HLL) with none of the per-bucket
    distinct-union state the naive formulation needs — state is O(buckets),
    not O(ids × buckets).

    r10: the bucket key generalizes past the epoch-aligned modular floor —
    ``offset_ms`` shifts a fixed grid, ``calendar_unit`` floors by the
    UTC calendar (``date_trunc``, matching the date_histogram operator's
    calendar keys). MIN(first-seen) is order-based, so any monotone key
    expression preserves the algorithm.

    r11: ``calendar_unit`` + ``offset_ms`` compose — the key is the
    shifted calendar floor ``trunc(t − off) + off``, exactly the
    date_histogram operator's calendar+offset key (params.round_key_ms),
    so the compiler's bucket join stays aligned. ``calendar_unit`` must
    be a CANONICAL unit name (``'week'``, not the ES alias ``'1w'`` —
    Spark/DuckDB ``date_trunc`` silently return NULL on unknown formats;
    callers normalize via ``params.parse_interval``); unknown units
    raise here.

    r11 (second pass): ``tz`` (IANA name) on CALENDAR grids floors on
    the LOCAL wall clock and keys on the UTC instant of the local
    boundary — built from the SAME :func:`functions.time.floor_calendar`
    / :func:`functions.time.local_ts_to_utc_ms` helpers the
    date_histogram grid uses, so the compiler's bucket join stays
    aligned across DST by construction.

    r12: ``tz`` composes with FIXED grids too (ES rounds fixed
    intervals in-zone — Rounding.TimeIntervalRounding): the grid floors
    on local wall-clock millis and keys on the UTC instant of the local
    boundary, ``utc(floor_fixed(local(t), step, offset))``. As of r12
    the `_search` compiler's date_histogram accepts fixed+time_zone for
    INSTANT rows through the same local-wall-clock grid (params.normalize
    no longer raises); this operator route remains the direct spelling
    for the zone-shifted fixed cumcard.
    """
    t = F.col(time_ms_col)
    if calendar_unit is not None:
        if step_ms is not None:
            raise ValueError(
                "cumulative_cardinality takes EITHER calendar_unit OR"
                " step_ms"
            )
        if calendar_unit not in _CC_CALENDAR_UNITS:
            raise ValueError(
                f"cumulative_cardinality calendar_unit {calendar_unit!r}"
                f" must be canonical, one of {sorted(_CC_CALENDAR_UNITS)}"
                " (normalize ES aliases via params.parse_interval)"
            )
        from ..functions.time import floor_calendar, local_ts_to_utc_ms

        off = int(offset_ms)
        key = (
            local_ts_to_utc_ms(floor_calendar(t, calendar_unit, off, tz), tz)
            + F.lit(off)
        ).alias("key")
    else:
        off = int(offset_ms)
        if tz is not None:
            # r12 (SCOPE §E, the last cumcard corner): ES rounds FIXED
            # intervals in-zone too (Rounding.TimeIntervalRounding) —
            # the grid floors on the LOCAL wall clock and the key is the
            # UTC instant of the local boundary: utc(floor_fixed(local)).
            # First-seen needs no uniform bucket stepping (buckets are
            # the observed distinct keys), so the zone-shifted grid
            # composes with MIN() unchanged. DST note: local boundaries
            # inside a spring-forward gap / fall-back overlap resolve by
            # the engine's to_utc_timestamp rule — the same stance as
            # the calendar-grid tz path (local_ts_to_utc_ms).
            local_ms = F.unix_millis(
                F.from_utc_timestamp(F.timestamp_millis(t), tz)
            )
            floored = local_ms - F.pmod(
                local_ms - F.lit(off), F.lit(int(step_ms))
            )
            key = F.unix_millis(
                F.to_utc_timestamp(F.timestamp_millis(floored), tz)
            ).alias("key")
        else:
            key = (t - F.pmod(t - F.lit(off), F.lit(int(step_ms)))).alias("key")
    base = df.select(key, F.col(id_col).alias("__id"))
    buckets = base.select("key").distinct()
    firsts = (
        base.groupBy("__id")
        .agg(F.min("key").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("new_ids"))
    )
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    return (
        buckets.join(firsts, "key", "left")
        .select("key", F.coalesce("new_ids", F.lit(0)).alias("new_ids"))
        .select("key", "new_ids", F.sum("new_ids").over(w).alias("cum_cardinality"))
        .orderBy("key")
    )


def cumulative_cardinality_sql(
    src: str,
    time_ms_expr: str,
    id_col: str,
    step_ms: int | None = None,
    calendar_unit: str | None = None,
    offset_ms: int = 0,
    tz: str | None = None,
) -> str:
    if calendar_unit is not None:
        if calendar_unit not in _CC_CALENDAR_UNITS:
            raise ValueError(
                f"cumulative_cardinality calendar_unit {calendar_unit!r}"
                f" must be canonical, one of {sorted(_CC_CALENDAR_UNITS)}"
            )
        off = int(offset_ms)
        if tz is not None:
            # oracle._trunc_cal discipline: lift epoch-ms to an instant
            # via timezone('UTC', ...) (session-TZ-independent), convert
            # to the zone's naive local time, truncate, convert the local
            # boundary back to its UTC instant
            from ..oracle import duck_local_to_utc_ms

            inst = (
                f"timezone('UTC',"
                f" make_timestamp((({time_ms_expr}) - {off}) * 1000))"
            )
            wall = (
                f"epoch_ms(date_trunc('{calendar_unit}',"
                f" timezone('{tz}', {inst})))"
            )
            key = f"{duck_local_to_utc_ms(tz, wall)} + {off}"
        else:
            key = (
                f"epoch_ms(date_trunc('{calendar_unit}',"
                f" make_timestamp((({time_ms_expr}) - {off}) * 1000))) + {off}"
            )
    else:
        t, off, step = time_ms_expr, int(offset_ms), int(step_ms)
        if tz is not None:
            # r12 fixed+tz twin: local wall-clock millis via the DuckDB
            # two-hop (interpret naive as UTC -> convert to zone-local
            # naive), modular floor in local millis, then the local
            # boundary back to its UTC instant
            from ..oracle import duck_local_to_utc_ms

            lw = (
                f"epoch_ms(timezone('{tz}',"
                f" timezone('UTC', make_timestamp(({t}) * 1000))))"
            )
            fl = f"(({lw}) - ((({lw}) - {off}) % {step} + {step}) % {step})"
            key = duck_local_to_utc_ms(tz, fl)
        else:
            key = f"({t}) - (((({t}) - {off}) % {step} + {step}) % {step})"
    return f"""
WITH base AS (
  SELECT {key} AS key,
         {id_col} AS id
  FROM {src}
),
buckets AS (SELECT DISTINCT key FROM base),
firsts AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS new_ids
  FROM (SELECT id, MIN(key) AS key FROM base GROUP BY id) GROUP BY key
)
SELECT b.key, COALESCE(f.new_ids, 0) AS new_ids,
       CAST(SUM(COALESCE(f.new_ids, 0)) OVER (ORDER BY b.key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_cardinality
FROM buckets b LEFT JOIN firsts f USING (key)
ORDER BY b.key
"""


def percentiles_bucket(
    result: DataFrame, group_by=(), pcts=(0.25, 0.5, 0.75, 0.99), quantize: int = 4
) -> DataFrame:
    """(group…, pct, pval_q): ES ``percentiles_bucket`` — exact interpolated
    percentiles of the histogram's bucket values per owning group, floored
    to quanta. Spark ``percentile`` is value-identical to DuckDB
    ``quantile_cont`` (same sort + linear interpolation — the
    stats_quantiles engine-equality discipline), so the oracle is exact.
    One tiny aggregation over bucket rows."""
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    arr = ", ".join(repr(float(p)) for p in pcts)
    agg = (
        result.select(*group_by, vq.alias("vq"))
        .groupBy(*group_by)
        .agg(F.expr(f"percentile(vq, array({arr}))").alias("__pv"))
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in pcts]).alias("pct"),
        F.col("__pv").alias("pv"),
    )
    return (
        agg.select(*group_by, F.explode(pairs).alias("z"))
        .select(
            *group_by,
            F.col("z.pct").alias("pct"),
            F.floor(F.col("z.pv")).cast("long").alias("pval_q"),
        )
        .orderBy(*group_by, "pct")
    )


def percentiles_bucket_sql(
    base_sql: str, group_by=(), pcts=(0.25, 0.5, 0.75, 0.99), quantize: int = 4
) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    sel_keys = f"{keys}, " if keys else ""
    grp = f"GROUP BY {keys}" if keys else ""
    arms = " UNION ALL ".join(
        f"SELECT {sel_keys}CAST({float(p)!r} AS DOUBLE) AS pct,"
        f" CAST(FLOOR(quantile_cont(vq, {float(p)!r})) AS BIGINT) AS pval_q"
        f" FROM q {grp}"
        for p in pcts
    )
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base)
{arms}
ORDER BY {sel_keys}pct
"""


def stats_bucket_sql(base_sql: str, group_by=(), quantize: int = 4) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    sel_keys = f"{keys}, " if keys else ""
    grp = f"GROUP BY {keys} " if keys else ""
    order = f"ORDER BY {keys}" if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base)
SELECT {sel_keys}COUNT(*) AS n_buckets, MIN(vq) AS min_q, MAX(vq) AS max_q,
       CAST(SUM(vq) AS BIGINT) AS sum_q,
       -- exact FLOOR (DuckDB integer // truncates): strip the nonneg remainder
       CAST((SUM(vq) - ((SUM(vq) % COUNT(*) + COUNT(*)) % COUNT(*))) // COUNT(*)
            AS BIGINT) AS avg_q
FROM q {grp}{order}
"""


# --------------------------------------------------------------------------
# normalize (percent_of_sum) + moving_percentiles
# --------------------------------------------------------------------------

def normalize_buckets(
    result: DataFrame,
    group_by=(),
    quantize: int = 4,
    window: int = 7,
    pct: float = 0.5,
) -> DataFrame:
    """(group…, key, vq, pct_of_sum_q, mov_p50_q): ES ``normalize``
    (method ``percent_of_sum``) and ``moving_percentiles`` over the bucket
    list in one pass — a group-total window plus a trailing-window exact
    percentile, both partitioned by the owning group.

    ``pct_of_sum_q`` = bucket share of the group total in 1e-6 quanta via
    integer division (`vq·1e6 div total`). ``mov_p50_q`` is the exact
    interpolated percentile of the trailing ``window`` buckets (same
    engine-equality discipline as stats_quantiles), floored to quanta."""
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    base = result.select(*group_by, "key", vq.alias("vq"))
    wall = Window.partitionBy(*group_by)
    wmov = (
        Window.partitionBy(*group_by).orderBy("key").rowsBetween(-(window - 1), 0)
    )
    return base.select(
        *group_by,
        "key",
        "vq",
        F.expr(f"vq * {QUANT_PCT}L").alias("__num"),
        F.sum("vq").over(wall).alias("__tot"),
        F.floor(
            F.expr(f"percentile(vq, {float(pct)})").over(wmov)
            * F.lit(float(QUANT_PCT))
        ).alias("mov_p50_q"),
    ).select(
        *group_by,
        "key",
        "vq",
        # floor (not truncate) so negative bucket values match the twin's
        # `//` (requires a positive group total, like the twin)
        F.expr("(__num - pmod(__num, __tot)) div __tot").alias("pct_of_sum_q"),
        "mov_p50_q",
    ).orderBy(*group_by, "key")


QUANT_PCT = 1_000_000


def normalize_buckets_sql(
    base_sql: str,
    group_by=(),
    quantize: int = 4,
    window: int = 7,
    pct: float = 0.5,
) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base)
SELECT {sel_keys}key, vq,
       -- exact FLOOR (DuckDB integer // truncates; positive group total)
       CAST((vq * {QUANT_PCT}
             - (((vq * {QUANT_PCT}) % SUM(vq) OVER ({part.rstrip() or ''})
                 + SUM(vq) OVER ({part.rstrip() or ''}))
                % SUM(vq) OVER ({part.rstrip() or ''})))
            // SUM(vq) OVER ({part.rstrip() or ''}) AS BIGINT)
         AS pct_of_sum_q,
       CAST(FLOOR(quantile_cont(vq, {float(pct)}) OVER ({part}ORDER BY key
            ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
            * {float(QUANT_PCT)}) AS BIGINT) AS mov_p50_q
FROM q ORDER BY {sel_keys}key
"""


# --------------------------------------------------------------------------
# serial_diff
# --------------------------------------------------------------------------

def serial_diff(
    result: DataFrame, group_by=(), lag: int = 7, quantize: int = 4
) -> DataFrame:
    """(group…, key, vq, sdiff_q): ES ``serial_diff`` — the bucket value
    minus the value ``lag`` buckets earlier (NULL for the first ``lag``
    buckets, like ES emits nothing there). Season-differencing for
    histogram output; one window over the bucket list."""
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    w = Window.partitionBy(*group_by).orderBy("key")
    return (
        result.select(*group_by, "key", vq.alias("vq"))
        .withColumn("sdiff_q", F.col("vq") - F.lag("vq", lag).over(w))
        .orderBy(*group_by, "key")
    )


def serial_diff_sql(base_sql: str, group_by=(), lag: int = 7, quantize: int = 4) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base)
SELECT {sel_keys}key, vq, vq - LAG(vq, {lag}) OVER ({part}ORDER BY key) AS sdiff_q
FROM q ORDER BY {sel_keys}key
"""


def moving_fn(
    result: DataFrame,
    group_by=(),
    window: int = 7,
    shift: int = 0,
    quantize: int = 4,
) -> DataFrame:
    """(group…, key, vq, mfn_n, mfn_max_q, mfn_min_q, mfn_sum_q,
    mfn_avg_q): ES ``moving_fn`` with the deterministic builtin
    MovingFunctions (max / min / sum / unweightedAvg) evaluated in one
    pass over the bucket list.

    Window contract matches ES: the frame covers the ``window`` buckets
    BEFORE the current one (current excluded); ``shift`` slides it right —
    ``shift=1`` includes the current bucket, like the ES parameter. Empty
    frames yield NULL (ES emits NaN/null there). ``unweightedAvg`` is
    exact-integer floor division of the quantized sum (the cross-engine
    quantization discipline; ES itself averages doubles).

    Scripted ``moving_fn`` bodies beyond the builtins map to a custom
    expression over the same window — or, for genuinely imperative folds,
    the scripted_metric harness (operators/scripted.py).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    w = Window.partitionBy(*group_by).orderBy("key")
    frame = w.rowsBetween(-window + shift, -1 + shift)
    n = F.count("vq").over(frame)
    s = F.sum("vq").over(frame)
    # floor division on exact longs (sum may be negative for derivative
    # inputs): subtract the nonnegative remainder first
    avg = F.when(F.col("__n") > 0, F.expr("(__s - pmod(__s, __n)) div __n"))
    return (
        result.select(*group_by, "key", vq.alias("vq"))
        .withColumn("__n", n)
        .withColumn("__s", s)
        .select(
            *group_by,
            "key",
            "vq",
            F.col("__n").alias("mfn_n"),
            F.max("vq").over(frame).alias("mfn_max_q"),
            F.min("vq").over(frame).alias("mfn_min_q"),
            F.col("__s").alias("mfn_sum_q"),
            avg.alias("mfn_avg_q"),
        )
        .orderBy(*group_by, "key")
    )


def moving_fn_sql(
    base_sql: str, group_by=(), window: int = 7, shift: int = 0, quantize: int = 4
) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    frame = (
        f"ROWS BETWEEN {window - shift} PRECEDING AND "
        + (f"{1 - shift} PRECEDING" if shift < 1 else "CURRENT ROW")
    )
    win = f"OVER ({part}ORDER BY key {frame})"
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base),
w AS (
  SELECT {sel_keys}key, vq,
         COUNT(vq) {win} AS mfn_n,
         MAX(vq) {win} AS mfn_max_q,
         MIN(vq) {win} AS mfn_min_q,
         CAST(SUM(vq) {win} AS BIGINT) AS mfn_sum_q
  FROM q
)
SELECT {sel_keys}key, vq, mfn_n, mfn_max_q, mfn_min_q, mfn_sum_q,
       CAST(CASE WHEN mfn_n > 0 THEN
         (mfn_sum_q - ((mfn_sum_q % mfn_n + mfn_n) % mfn_n)) // mfn_n
       END AS BIGINT) AS mfn_avg_q
FROM w ORDER BY {sel_keys}key
"""


def change_point(
    result: DataFrame, group_by=(), quantize: int = 4
) -> DataFrame:
    """(group…, n_buckets, change_key, n_before, n_after, mean_before_q,
    mean_after_q, gain_mq): ES 8.x ``change_point`` — the most-likely
    STEP-CHANGE split of each group's bucket series, i.e. the split
    maximizing the between-segment variance reduction
    ``gain(t) = (S₁n₂ − S₂n₁)² / (n₁n₂N)`` (the two-segment
    maximum-likelihood statistic ES's step_change detector optimizes).
    The aggregation the drift plugin's own name promises: "where did this
    flow series shift".

    Everything runs over the RESULT bucket list (result-sized, like every
    pipe_* agg): prefix sums via one window, candidate gains per split,
    argmax per group with key-asc tie-break. Integer discipline: S₁/S₂ in
    exact int64; the numerator difference (≤ Σ|vq|·N, int64-safe) squares
    in IEEE double identically on both engines; segment means are exact
    integer floor divisions. ``change_key`` = first bucket key AFTER the
    change; groups with < 2 buckets emit NULL change fields.
    """
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    w = Window.partitionBy(*group_by).orderBy("key")
    wall = Window.partitionBy(*group_by)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    base = (
        result.select(*group_by, "key", vq.alias("vq"))
        .select(
            *group_by,
            "key",
            "vq",
            F.row_number().over(w).alias("__i"),
            F.sum("vq").over(wcum).alias("__s1"),
            F.count(F.lit(1)).over(wall).alias("__n"),
            F.sum("vq").over(wall).alias("__s"),
            F.lead("key").over(w).alias("__next_key"),
        )
    )
    n1 = F.col("__i")
    n2 = F.col("__n") - n1
    s1 = F.col("__s1")
    s2 = F.col("__s") - s1
    d = (s1 * n2 - s2 * n1).cast("double")
    gain = (d * d) / (n1 * n2 * F.col("__n")).cast("double")
    # single-bucket groups keep one row with NULL change fields (ES's
    # "indeterminable" verdict for too-short series) instead of vanishing
    ok = n2 > 0
    cand = base.where(ok | (F.col("__n") == 1)).select(
        *group_by,
        F.col("__n").alias("n_buckets"),
        F.when(ok, F.col("__next_key")).alias("change_key"),
        F.when(ok, n1).alias("n_before"),
        F.when(ok, n2).alias("n_after"),
        F.when(ok, F.expr("(__s1 - pmod(__s1, __i)) div __i")).alias("mean_before_q"),
        F.when(
            ok,
            F.expr("((__s - __s1) - pmod(__s - __s1, __n - __i)) div (__n - __i)"),
        ).alias("mean_after_q"),
        F.when(
            ok,
            F.floor(gain / F.lit(float(scale)) / F.lit(float(scale)) * F.lit(1000.0)),
        ).alias("gain_mq"),
    )
    wbest = Window.partitionBy(*group_by).orderBy(
        F.col("gain_mq").desc(), F.col("change_key").asc()
    )
    best = (
        cand.withColumn("__rn", F.row_number().over(wbest))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return best.orderBy(*group_by) if group_by else best


def change_point_sql(base_sql: str, group_by=(), quantize: int = 4) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base),
pre AS (
  SELECT {sel_keys}key, vq,
         ROW_NUMBER() OVER ({part}ORDER BY key) AS i,
         CAST(SUM(vq) OVER ({part}ORDER BY key
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
         COUNT(*) OVER ({part}) AS n,
         CAST(SUM(vq) OVER ({part}) AS BIGINT) AS s,
         LEAD(key) OVER ({part}ORDER BY key) AS next_key
  FROM q
),
cand AS (
  SELECT {sel_keys}n AS n_buckets,
         CASE WHEN n - i > 0 THEN next_key END AS change_key,
         CASE WHEN n - i > 0 THEN i END AS n_before,
         CASE WHEN n - i > 0 THEN n - i END AS n_after,
         CASE WHEN n - i > 0 THEN
           (s1 - ((s1 % i + i) % i)) // i END AS mean_before_q,
         CASE WHEN n - i > 0 THEN
           ((s - s1) - (((s - s1) % (n - i) + (n - i)) % (n - i))) // (n - i)
         END AS mean_after_q,
         CASE WHEN n - i > 0 THEN
           CAST(FLOOR(CAST(s1 * (n - i) - (s - s1) * i AS DOUBLE)
                      * CAST(s1 * (n - i) - (s - s1) * i AS DOUBLE)
                      / CAST(i * (n - i) * n AS DOUBLE)
                      / {float(scale)} / {float(scale)} * 1000.0) AS BIGINT)
         END AS gain_mq
  FROM pre WHERE n - i > 0 OR n = 1
),
best AS (
  SELECT *, ROW_NUMBER() OVER ({part}ORDER BY gain_mq DESC, change_key ASC) AS rn
  FROM cand
)
SELECT {sel_keys}CAST(n_buckets AS BIGINT) AS n_buckets, change_key,
       CAST(n_before AS BIGINT) AS n_before, CAST(n_after AS BIGINT) AS n_after,
       CAST(mean_before_q AS BIGINT) AS mean_before_q,
       CAST(mean_after_q AS BIGINT) AS mean_after_q, gain_mq
FROM best WHERE rn = 1 ORDER BY {sel_keys}n_buckets
"""


def ks_test(
    result: DataFrame,
    group_col: str,
    side_a: str,
    side_b: str,
    quantize: int = 4,
) -> DataFrame:
    """(n_a, n_b, d_q): ES ``bucket_count_ks_test`` (ML aggs) — the
    two-sample Kolmogorov–Smirnov D statistic between two groups' bucket
    value distributions, computed EXACTLY: at every sample point the ECDF
    difference ``|cₐ·n_b − c_b·nₐ| / (nₐ·n_b)`` is an integer
    cross-multiplication (no float ECDFs), so the argmax is
    engine-deterministic; only the final serving division quantizes.
    ``d_q`` is D in 1e-6 units.

    One pass over the BUCKET LIST (result-sized): a RANGE-framed running
    count per side handles ties exactly (all equal values step together,
    the textbook ECDF-with-ties treatment), then a single max.
    """
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    base = (
        result.where(F.col(group_col).isin(side_a, side_b))
        .select(
            F.when(F.col(group_col) == side_a, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
            vq.alias("vq"),
        )
    )
    wall = Window.partitionBy()
    wrange = Window.orderBy("vq").rangeBetween(Window.unboundedPreceding, 0)
    stepped = base.select(
        F.sum("__a").over(wall).alias("__na"),
        (F.count(F.lit(1)).over(wall) - F.sum("__a").over(wall)).alias("__nb"),
        F.sum("__a").over(wrange).alias("__ca"),
        (F.count(F.lit(1)).over(wrange) - F.sum("__a").over(wrange)).alias("__cb"),
    )
    return (
        stepped.groupBy("__na", "__nb")
        .agg(F.max(F.abs(F.col("__ca") * F.col("__nb") - F.col("__cb") * F.col("__na"))).alias("__d"))
        .select(
            F.col("__na").alias("n_a"),
            F.col("__nb").alias("n_b"),
            F.floor(
                F.col("__d").cast("double")
                / (F.col("__na") * F.col("__nb")).cast("double")
                * F.lit(1_000_000.0)
            ).alias("d_q"),
        )
    )


def ks_test_sql(
    base_sql: str, group_col: str, side_a: str, side_b: str, quantize: int = 4
) -> str:
    scale = 10**quantize
    return f"""
WITH base AS ({base_sql}),
q AS (
  SELECT CASE WHEN {group_col} = '{side_a}' THEN 1 ELSE 0 END AS a,
         CAST(ROUND(value * {scale}) AS BIGINT) AS vq
  FROM base WHERE {group_col} IN ('{side_a}', '{side_b}')
),
stepped AS (
  SELECT CAST(SUM(a) OVER () AS BIGINT) AS na,
         CAST(COUNT(*) OVER () - SUM(a) OVER () AS BIGINT) AS nb,
         CAST(SUM(a) OVER (ORDER BY vq
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
         CAST(COUNT(*) OVER (ORDER BY vq
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - SUM(a) OVER (ORDER BY vq
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
  FROM q
)
SELECT na AS n_a, nb AS n_b,
       CAST(FLOOR(CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
                  / CAST(na * nb AS DOUBLE) * 1000000.0) AS BIGINT) AS d_q
FROM stepped GROUP BY na, nb
"""


def bucket_correlation(
    result: DataFrame,
    group_col: str,
    side_a: str,
    side_b: str,
    quantize: int = 4,
) -> DataFrame:
    """(n, corr_q): ES ``bucket_correlation`` (ML aggs) — Pearson
    correlation between two groups' bucket series, matched on the bucket
    key (inner join: only keys both series populate). Sums accumulate as
    exact int64 over quantized values; the final Pearson formula runs in
    IEEE doubles from those exact integers, identically on both engines;
    ``corr_q`` is r in 1e-6 units. Result-sized: a self-join of the bucket
    list on the key + one aggregation.
    """
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    base = result.select(F.col(group_col).alias("__g"), "key", vq.alias("vq"))
    a = base.where(F.col("__g") == side_a).select("key", F.col("vq").alias("x"))
    b = base.where(F.col("__g") == side_b).select("key", F.col("vq").alias("y"))
    j = a.join(b, "key")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    denx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    deny = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n
    corr = F.when(
        (denx > 0) & (deny > 0), num / F.sqrt(denx) / F.sqrt(deny)
    )
    return agg.select(
        F.col("n"),
        F.floor(corr * F.lit(1_000_000.0)).alias("corr_q"),
    )


def bucket_correlation_sql(
    base_sql: str, group_col: str, side_a: str, side_b: str, quantize: int = 4
) -> str:
    scale = 10**quantize
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {group_col} AS g, key,
             CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base),
j AS (
  SELECT a.vq AS x, b.vq AS y
  FROM (SELECT key, vq FROM q WHERE g = '{side_a}') a
  JOIN (SELECT key, vq FROM q WHERE g = '{side_b}') b USING (key)
),
agg AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(FLOOR(CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                   AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) > 0
         THEN (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         END * 1000000.0) AS BIGINT) AS corr_q
FROM agg
"""


def zscore(
    result: DataFrame,
    group_by=(),
    window: int = 7,
    quantize: int = 4,
    threshold_mq: int = 3000,
) -> DataFrame:
    """(group…, key, vq, n, z_mq, anomaly): trailing-window z-score per
    bucket — ``z = (v − mean(prev w)) / std(prev w)`` with the current
    bucket EXCLUDED from its own baseline (the moving_fn frame), the
    standard streaming anomaly heuristic chained after a drift histogram.

    Exact-integer discipline: the window's Σv and Σv² accumulate in
    DECIMAL(38,0) (v² overflows int64 for wide windows × large values);
    the single z formula ``(v·n − S) / √(n·S₂ − S²)`` runs once in IEEE
    doubles from those exact integers — identical on both engines.
    ``z_mq`` is z in milli-units; NULL when the baseline has < 2 buckets
    or zero variance. ``anomaly`` flags |z| ≥ ``threshold_mq`` (default
    3σ). Result-sized: one window pass over the bucket list.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    scale = 10**quantize
    vq = F.round(F.col("value") * F.lit(scale)).cast("long")
    w = Window.partitionBy(*group_by).orderBy("key")
    frame = w.rowsBetween(-window, -1)
    base = result.select(*group_by, "key", vq.alias("vq"))
    stepped = base.select(
        *group_by,
        "key",
        "vq",
        F.count("vq").over(frame).alias("__n"),
        F.sum(F.col("vq").cast("decimal(38,0)")).over(frame).alias("__s"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).over(frame).alias("__s2"),
    )
    var_num = (F.col("__n") * F.col("__s2") - F.col("__s") * F.col("__s"))
    z = (
        (F.col("vq") * F.col("__n") - F.col("__s")).cast("double")
        / F.sqrt(var_num.cast("double"))
    )
    z_mq = F.when(
        (F.col("__n") >= 2) & (var_num > 0), F.floor(z * F.lit(1000.0))
    )
    return (
        stepped.select(
            *group_by,
            "key",
            "vq",
            F.col("__n").alias("n"),
            z_mq.alias("z_mq"),
            (F.abs(F.coalesce(z_mq, F.lit(0))) >= threshold_mq).alias("anomaly"),
        )
        .orderBy(*group_by, "key")
    )


def zscore_sql(
    base_sql: str,
    group_by=(),
    window: int = 7,
    quantize: int = 4,
    threshold_mq: int = 3000,
) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    part = f"PARTITION BY {keys} " if group_by else ""
    sel_keys = f"{keys}, " if keys else ""
    frame = f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING"
    win = f"OVER ({part}ORDER BY key {frame})"
    return f"""
WITH base AS ({base_sql}),
q AS (SELECT {sel_keys}key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq FROM base),
stepped AS (
  SELECT {sel_keys}key, vq,
         COUNT(vq) {win} AS n,
         SUM(CAST(vq AS HUGEINT)) {win} AS s,
         SUM(CAST(vq AS HUGEINT) * vq) {win} AS s2
  FROM q
),
z AS (
  SELECT {sel_keys}key, vq, n,
         CASE WHEN n >= 2 AND (n * s2 - s * s) > 0 THEN
           CAST(FLOOR(CAST(vq * n - s AS DOUBLE)
                      / sqrt(CAST(n * s2 - s * s AS DOUBLE)) * 1000.0) AS BIGINT)
         END AS z_mq
  FROM stepped
)
SELECT {sel_keys}key, vq, CAST(n AS BIGINT) AS n, z_mq,
       ABS(COALESCE(z_mq, 0)) >= {threshold_mq} AS anomaly
FROM z ORDER BY {sel_keys}key
"""


# --------------------------------------------------------------------------
# distribution drift: Jensen–Shannon divergence between consecutive days
# --------------------------------------------------------------------------

# One shared expression string so both engines compute the identical IEEE
# double per (pair, term) before flooring: p = c1/n1, q = c0/n0,
# m = (p+q)/2, contribution = 0.5·(p·ln(p/m) + q·ln(q/m)), quantized at
# 1e9 (0.5 folded into the constant). CASE guards ln(0): a category absent
# from one day contributes only through the other side (q=0 ⇒ m=p/2 ⇒
# p·ln 2). Integer sums are order-free, so the float never crosses rows.
_JSD_TERM_EXPR = (
    "CAST(FLOOR(("
    "CASE WHEN c1 > 0 THEN (c1 / n1) * ln((c1 / n1) / ((c1 / n1 + c0 / n0) / 2)) ELSE 0 END"
    " + "
    "CASE WHEN c0 > 0 THEN (c0 / n0) * ln((c0 / n0) / ((c1 / n1 + c0 / n0) / 2)) ELSE 0 END"
    ") * 500000000.0) AS BIGINT)"
)


def js_divergence(
    events: DataFrame,
    t_ms_col: str = "t_ms",
    cat_col: str = "event_type",
    step_ms: int = 86_400_000,
) -> DataFrame:
    """(day, jsd_q): Jensen–Shannon divergence between each day's category
    distribution and the previous day's — the information-theoretic drift
    score the plugin's name promises (JSD is the symmetric, bounded
    [0, ln 2] cousin of KL; 0 = identical mixes). Emits one row per day
    that HAS a predecessor day with data.

    Scale: one partial+final count keyed by (day, category) collapses the
    raw stream; everything after operates on the day×category matrix
    (result-sized — days · |categories| rows). The day-over-day pairing is
    a self-equi-join on the shifted day key, not a window over raw data.
    Per-term contributions are floored to integer 1e-9 quanta so the
    cross-engine sum is order-free (the corpus-wide floored-log-quanta
    discipline; one ``ln`` per matrix cell).
    """
    day = F.expr(f"{t_ms_col} div {step_ms} * {step_ms}")
    counts = events.groupBy(day.alias("day"), F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return js_divergence_from_counts(counts, step_ms)


def js_divergence_from_counts(counts: DataFrame, step_ms: int = 86_400_000) -> DataFrame:
    """Divergence matrix math over a pre-collapsed (day, cat, c) count
    table — shared by the batch operator and the streaming twin (which
    maintains the count table as streaming state and scores on flush)."""
    totals = counts.groupBy("day").agg(F.sum("c").alias("n"))
    cur = counts.select("day", "cat", F.col("c").alias("c1"))
    prv = counts.select(
        (F.col("day") + F.lit(step_ms)).alias("day"), "cat", F.col("c").alias("c0")
    )
    mat = (
        cur.join(prv, ["day", "cat"], "full_outer")
        .fillna(0, ["c1", "c0"])
        .join(totals.select("day", F.col("n").alias("n1")), "day")
        .join(
            totals.select((F.col("day") + F.lit(step_ms)).alias("day"),
                          F.col("n").alias("n0")),
            "day",
        )
    )
    return (
        mat.select("day", F.expr(_JSD_TERM_EXPR).alias("tq"))
        .groupBy("day")
        .agg(F.sum("tq").cast("long").alias("jsd_q"))
        .orderBy("day")
    )


def js_divergence_sql(
    table: str,
    t_ms_expr: str,
    cat_col: str = "event_type",
    step_ms: int = 86_400_000,
) -> str:
    return f"""
WITH counts AS (
  SELECT ({t_ms_expr}) // {step_ms} * {step_ms} AS day, {cat_col} AS cat, COUNT(*) AS c
  FROM {table} GROUP BY 1, 2
),
totals AS (SELECT day, SUM(c) AS n FROM counts GROUP BY day),
mat AS (
  SELECT COALESCE(cur.day, prv.day) AS day,
         COALESCE(cur.c, 0) AS c1, COALESCE(prv.c, 0) AS c0
  FROM counts cur
  FULL OUTER JOIN (SELECT day + {step_ms} AS day, cat, c FROM counts) prv
    ON cur.day = prv.day AND cur.cat = prv.cat
),
joined AS (
  SELECT m.day, m.c1, m.c0, t1.n AS n1, t0.n AS n0
  FROM mat m
  JOIN totals t1 ON t1.day = m.day
  JOIN (SELECT day + {step_ms} AS day, n FROM totals) t0 ON t0.day = m.day
)
SELECT day, CAST(SUM({_JSD_TERM_EXPR}) AS BIGINT) AS jsd_q
FROM joined GROUP BY day ORDER BY day
"""


# --------------------------------------------------------------------------
# Holt double-exponential smoothing over the bucket list (ES moving_fn
# MovingFunctions.holt / the holt model of the removed moving_avg agg)
# --------------------------------------------------------------------------

def holt_forecast(
    result: DataFrame,
    group_by=(),
    key_col: str = "key",
    value_col: str = "value",
    quantize: int = 4,
) -> DataFrame:
    """(group…, n_buckets, level_mq, trend_mq, fc1_mq, fc2_mq, fc3_mq):
    Holt linear (double-exponential) smoothing of each group's bucket
    series with α = β = 1/2, emitting the final level/trend state and a
    3-step-ahead forecast — ES exposes exactly this as
    ``MovingFunctions.holt`` inside ``moving_fn``.

    The recurrence (s′ = αx + (1−α)(s+b); b′ = β(s′−s) + (1−β)b) is
    inherently sequential, but the series is the RESULT bucket list (days
    per group), so it folds per group with a JVM ``aggregate`` HOF over
    the key-sorted value array — no window over raw data, no Python.
    α = β = 1/2 keeps every operation a dyadic IEEE op; the DuckDB twin
    is a recursive CTE stepping the identical expression tree, so the
    doubles agree bit-for-bit and the 1e-3 floor quanta hash-match.
    """
    scale = 10**quantize
    vq = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    base = result.select(*group_by, F.col(key_col).alias("key"), vq.alias("vq"))
    arr = base.groupBy(*group_by).agg(
        F.expr("transform(array_sort(collect_list(struct(key, vq))), p -> CAST(p.vq AS DOUBLE))").alias("xs")
    )
    fold = (
        "aggregate(slice(xs, 2, size(xs) - 1), "
        "named_struct('s', element_at(xs, 1), 'b', CAST(0 AS DOUBLE)), "
        "(st, x) -> named_struct("
        "'s', 0.5 * x + 0.5 * (st.s + st.b), "
        "'b', 0.5 * ((0.5 * x + 0.5 * (st.s + st.b)) - st.s) + 0.5 * st.b))"
    )
    st = arr.select(*group_by, F.size("xs").cast("long").alias("n_buckets"),
                    F.expr(fold).alias("st"))
    return st.select(
        *group_by,
        "n_buckets",
        F.expr("CAST(FLOOR(st.s * 1000.0) AS BIGINT)").alias("level_mq"),
        F.expr("CAST(FLOOR(st.b * 1000.0) AS BIGINT)").alias("trend_mq"),
        F.expr("CAST(FLOOR((st.s + 1.0 * st.b) * 1000.0) AS BIGINT)").alias("fc1_mq"),
        F.expr("CAST(FLOOR((st.s + 2.0 * st.b) * 1000.0) AS BIGINT)").alias("fc2_mq"),
        F.expr("CAST(FLOOR((st.s + 3.0 * st.b) * 1000.0) AS BIGINT)").alias("fc3_mq"),
    ).orderBy(*group_by)


def holt_forecast_sql(base_sql: str, group_by=(), quantize: int = 4) -> str:
    scale = 10**quantize
    keys = ", ".join(group_by)
    on_keys = " AND ".join(f"b.{g} = st.{g}" for g in group_by)
    st_keys = ", ".join(f"st.{g}" for g in group_by)
    return f"""
WITH RECURSIVE base AS (
  SELECT {keys}, key, CAST(ROUND(value * {scale}) AS BIGINT) AS vq,
         ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY key) AS rn,
         COUNT(*) OVER (PARTITION BY {keys}) AS n
  FROM ({base_sql})
),
step AS (
  SELECT {keys}, rn, n, CAST(vq AS DOUBLE) AS s, CAST(0 AS DOUBLE) AS b
  FROM base WHERE rn = 1
  UNION ALL
  SELECT {st_keys}, b.rn, b.n,
         0.5 * CAST(b.vq AS DOUBLE) + 0.5 * (st.s + st.b),
         0.5 * ((0.5 * CAST(b.vq AS DOUBLE) + 0.5 * (st.s + st.b)) - st.s) + 0.5 * st.b
  FROM step st JOIN base b ON {on_keys} AND b.rn = st.rn + 1
)
SELECT {keys}, CAST(n AS BIGINT) AS n_buckets,
       CAST(FLOOR(s * 1000.0) AS BIGINT) AS level_mq,
       CAST(FLOOR(b * 1000.0) AS BIGINT) AS trend_mq,
       CAST(FLOOR((s + 1.0 * b) * 1000.0) AS BIGINT) AS fc1_mq,
       CAST(FLOOR((s + 2.0 * b) * 1000.0) AS BIGINT) AS fc2_mq,
       CAST(FLOOR((s + 3.0 * b) * 1000.0) AS BIGINT) AS fc3_mq
FROM step WHERE rn = n ORDER BY {keys}
"""
