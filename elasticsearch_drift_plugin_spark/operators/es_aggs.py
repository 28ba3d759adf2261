"""Host-Elasticsearch sibling aggregations, engine-native.

The reference plugin runs INSIDE an ES `_search` aggregation tree: a real
query mixes `proportional_sum` with the stock ES bucket/metric aggs —
`terms`, `range`, `histogram`, `stats`/`extended_stats` — and a plain `sum`
sibling appears in the reference's own README example
(`/root/reference/README.md:108-113`). SURVEY.md §2.2 declares these
host-ES surfaces; this module makes the common ones first-class engine
operators so a reference user can port an entire search body, not just the
drift agg.

Semantics follow the public ES aggregation contracts:

- ``terms``: top-``size`` buckets, default order doc_count desc with key
  asc tie-break; ``min_doc_count`` prunes rare terms.
- ``range``: half-open ``[from, to)`` buckets; ranges may overlap — a doc
  lands in EVERY range containing it; missing bound = unbounded; bucket
  key is ``"from-to"`` with ``*`` for an open bound.
- ``histogram``: numeric (non-time) buckets at
  ``floor((v - offset) / interval) * interval + offset``, ``min_doc_count``
  filter; the time variant is the reference's own operator
  (proportional_sum generalizes ES date_histogram —
  `ProportionalSumAggregationBuilder.java`).
- ``extended_stats``: count/min/max/sum/avg/variance. Sums, mean, and
  variance are exact integer arithmetic over 1e-6-quantized values
  (DECIMAL(38,0) for the squared sums — a quantized double squared
  overflows BIGINT), so cross-engine hashes cannot drift; variance uses
  ``var_pop = (n·Σx² − (Σx)²) / n²`` in integer quanta².

Scale: every agg here is one partial+final hash aggregation — map-side
combine, a single shuffle on the bucket key. ``range`` fans out via a
literal range table (`explode` over a filtered constant array — fan-out
bounded by #ranges, membership evaluated in codegen). ``terms``'s final
top-``size`` is a sort of #distinct-terms rows AFTER the aggregation, the
same reduce ES runs on the coordinating node.

NaN/NULL: ES metric aggs skip docs whose field is missing; the fixtures
seed NULL and NaN rows, and both engines filter them identically
(`value IS NOT NULL AND NOT isnan(value)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.flows import load_table, ts_ms_col

QUANT = 1_000_000


def terms_agg(
    df: DataFrame,
    field: str,
    size: int = 10,
    min_doc_count: int = 1,
    value_col: str | None = None,
) -> DataFrame:
    """(key, doc_count[, value_q]): ES ``terms`` top-``size`` buckets,
    doc_count desc / key asc, with an optional quantized sum sub-agg."""
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(value_col).isNotNull() & ~F.isnan(value_col),
                        F.floor(F.col(value_col) * F.lit(float(QUANT))),
                    )
                ),
                F.lit(0),
            ).alias("value_q")
        )
    out = (
        df.groupBy(F.col(field).alias("key"))
        .agg(*aggs)
        .where(F.col("doc_count") >= min_doc_count)
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )
    return out


def terms_sql(
    src: str,
    field: str,
    size: int = 10,
    min_doc_count: int = 1,
    value_col: str | None = None,
) -> str:
    val = (
        f", CAST(COALESCE(SUM(CASE WHEN {value_col} IS NOT NULL AND NOT isnan({value_col})"
        f" THEN CAST(FLOOR({value_col} * {float(QUANT)}) AS BIGINT) END), 0) AS BIGINT)"
        " AS value_q"
        if value_col
        else ""
    )
    return f"""
SELECT {field} AS key, COUNT(*) AS doc_count{val}
FROM {src} GROUP BY {field}
HAVING COUNT(*) >= {min_doc_count}
ORDER BY doc_count DESC, key ASC LIMIT {size}
"""


def range_agg(
    df: DataFrame,
    field: str,
    ranges: list[tuple[float | None, float | None]],
    value_col: str | None = None,
    extra_aggs: dict | None = None,
) -> DataFrame:
    """(key, range_from, range_to, doc_count[, value_q][, extra…]): ES
    ``range`` buckets. A doc joins every ``[from, to)`` range containing
    its value; ``None`` = unbounded. Empty ranges still emit a zero row
    (ES always returns every requested range); their ``extra_aggs`` metric
    columns are NULL (the ES null-sub-agg-on-empty-bucket contract).

    Without ``extra_aggs`` the whole agg is ONE map-side pass of #ranges
    conditional counters (count/sum of CASEs — overlap-safe because each
    counter is independent, zero-filled because count of an empty CASE is
    0) collapsed to a single row, then unfolded into bucket rows in
    request order: no per-row membership array, no explode, no bucket-key
    exchange, no zero-fill join (r14, the ip_range recipe, guide
    §2.3/§2.4). Arbitrary ``extra_aggs`` keep the exploded formulation:
    the range table is a constant literal array filtered per row in
    codegen, then exploded — fan-out ≤ #ranges.
    """
    def _key(lo, hi):
        return f"{'*' if lo is None else format(float(lo), 'g')}-" + (
            "*" if hi is None else format(float(hi), "g")
        )

    if not extra_aggs:
        valid = F.col(field).isNotNull() & ~F.isnan(field)
        conds = []
        for lo, hi in ranges:
            c = valid
            if lo is not None:
                c = c & (F.col(field) >= F.lit(float(lo)))
            if hi is not None:
                c = c & (F.col(field) < F.lit(float(hi)))
            conds.append(c)
        counters = []
        for i, c in enumerate(conds):
            counters.append(F.count(F.when(c, 1)).alias(f"__dc{i}"))
            if value_col is not None:
                counters.append(
                    F.coalesce(
                        F.sum(
                            F.when(
                                c
                                & F.col(value_col).isNotNull()
                                & ~F.isnan(value_col),
                                F.floor(F.col(value_col) * F.lit(float(QUANT))),
                            )
                        ),
                        F.lit(0),
                    ).alias(f"__vq{i}")
                )
        buckets = F.array(
            *[
                F.struct(
                    F.lit(_key(lo, hi)).alias("key"),
                    F.lit(None if lo is None else float(lo))
                    .cast("double")
                    .alias("range_from"),
                    F.lit(None if hi is None else float(hi))
                    .cast("double")
                    .alias("range_to"),
                    F.col(f"__dc{i}").alias("doc_count"),
                    *(
                        [F.col(f"__vq{i}").alias("value_q")]
                        if value_col is not None
                        else []
                    ),
                )
                for i, (lo, hi) in enumerate(ranges)
            ]
        )
        return (
            df.agg(*counters)
            .select(F.explode(buckets).alias("b"))
            .select("b.*")
            .orderBy("key")
        )

    structs = ",".join(
        "named_struct('key', '{k}', 'lo', {lo}, 'hi', {hi})".format(
            k=_key(lo, hi),
            lo="CAST(NULL AS DOUBLE)" if lo is None else f"{float(lo)!r}D",
            hi="CAST(NULL AS DOUBLE)" if hi is None else f"{float(hi)!r}D",
        )
        for lo, hi in ranges
    )
    member = (
        f"filter(array({structs}), r ->"
        f" (r.lo IS NULL OR {field} >= r.lo) AND (r.hi IS NULL OR {field} < r.hi))"
    )
    # keep every source column in scope for extra_aggs (Catalyst prunes
    # the unreferenced ones out of the scan)
    hit = df.where(
        F.col(field).isNotNull() & ~F.isnan(field)
    ).withColumn("r", F.explode(F.expr(member)))
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(value_col).isNotNull() & ~F.isnan(value_col),
                        F.floor(F.col(value_col) * F.lit(float(QUANT))),
                    )
                ),
                F.lit(0),
            ).alias("value_q")
        )
    aggs.extend((extra_aggs or {}).values())
    got = hit.groupBy(F.col("r.key").alias("key")).agg(*aggs)
    spine = F.expr(
        "array(" + structs + ")"
    )
    empty_cols = [F.lit(0).cast("long").alias("doc_count")]
    if value_col is not None:
        empty_cols.append(F.lit(0).cast("long").alias("value_q"))
    all_ranges = (
        df.sparkSession.range(1)
        .select(F.explode(spine).alias("r"))
        .select(
            F.col("r.key").alias("key"),
            F.col("r.lo").alias("range_from"),
            F.col("r.hi").alias("range_to"),
        )
    )
    # join on the (unique) bucket key only: an equality join on the bound
    # columns would silently drop unbounded ranges (NULL != NULL)
    filled = (
        all_ranges.join(got, ["key"], "left")
        .select(
            "key",
            "range_from",
            "range_to",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
            *(
                [F.coalesce(F.col("value_q"), F.lit(0)).alias("value_q")]
                if value_col
                else []
            ),
            # extra metric columns stay NULL for empty ranges (ES contract)
            *[F.col(n) for n in (extra_aggs or {})],
        )
        .orderBy("key")
    )
    return filled


def range_sql(
    src: str,
    field: str,
    ranges: list[tuple[float | None, float | None]],
    value_col: str | None = None,
) -> str:
    def _key(lo, hi):
        return f"{'*' if lo is None else format(float(lo), 'g')}-" + (
            "*" if hi is None else format(float(hi), "g")
        )

    rows = ", ".join(
        "({lo}, {hi}, '{k}')".format(
            lo="CAST(NULL AS DOUBLE)" if lo is None else repr(float(lo)),
            hi="CAST(NULL AS DOUBLE)" if hi is None else repr(float(hi)),
            k=_key(lo, hi),
        )
        for lo, hi in ranges
    )
    val = (
        f", CAST(COALESCE(SUM(CASE WHEN v.{value_col} IS NOT NULL AND NOT isnan(v.{value_col})"
        f" THEN CAST(FLOOR(v.{value_col} * {float(QUANT)}) AS BIGINT) END), 0) AS BIGINT)"
        " AS value_q"
        if value_col
        else ""
    )
    return f"""
WITH r(lo, hi, key) AS (VALUES {rows}),
v AS (SELECT * FROM {src} WHERE {field} IS NOT NULL AND NOT isnan({field}))
SELECT r.key AS key, r.lo AS range_from, r.hi AS range_to,
       COUNT(v.{field}) AS doc_count{val}
FROM r LEFT JOIN v ON (r.lo IS NULL OR v.{field} >= r.lo)
                  AND (r.hi IS NULL OR v.{field} < r.hi)
GROUP BY r.key, r.lo, r.hi
ORDER BY key
"""


def histogram_agg(
    df: DataFrame,
    field: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 1,
    value_col: str | None = None,
    extra_aggs: dict | None = None,
    group_cols: tuple = (),
) -> DataFrame:
    """(group…, key, doc_count[, value_q][, extra…]): ES numeric
    ``histogram``. Bucket key = ``floor((v - offset) / interval) *
    interval + offset`` (ES histogram key contract). One partial+final
    aggregation. ``extra_aggs`` (name → pre-aliased aggregate Column) are
    the ES metric sub-aggs, computed in the SAME aggregation — zero extra
    passes. ``group_cols`` prepends grouping dimensions (the compiler's
    terms-under-histogram flattening: one row per (bucket, term))."""
    v = F.col(field)
    key = (
        F.floor((v - F.lit(float(offset))) / F.lit(float(interval)))
        * F.lit(float(interval))
        + F.lit(float(offset))
    )
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(value_col).isNotNull() & ~F.isnan(value_col),
                        F.floor(F.col(value_col) * F.lit(float(QUANT))),
                    )
                ),
                F.lit(0),
            ).alias("value_q")
        )
    aggs.extend((extra_aggs or {}).values())
    return (
        df.where(v.isNotNull() & ~F.isnan(field))
        .groupBy(*group_cols, key.alias("key"))
        .agg(*aggs)
        .where(F.col("doc_count") >= min_doc_count)
        .orderBy(*group_cols, "key")
    )


def histogram_sql(
    src: str,
    field: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 1,
    value_col: str | None = None,
) -> str:
    val = (
        f", CAST(COALESCE(SUM(CASE WHEN {value_col} IS NOT NULL AND NOT isnan({value_col})"
        f" THEN CAST(FLOOR({value_col} * {float(QUANT)}) AS BIGINT) END), 0) AS BIGINT)"
        " AS value_q"
        if value_col
        else ""
    )
    return f"""
SELECT FLOOR(({field} - {float(offset)}) / {float(interval)}) * {float(interval)}
         + {float(offset)} AS key,
       COUNT(*) AS doc_count{val}
FROM {src}
WHERE {field} IS NOT NULL AND NOT isnan({field})
GROUP BY 1 HAVING COUNT(*) >= {min_doc_count}
ORDER BY key
"""


def extended_stats_agg(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group..., count, min, max, sum_q, avg_q, var_q): ES
    ``extended_stats``, deterministic across engines.

    ``sum_q`` sums 1e-6-quantized values exactly (BIGINT); ``avg_q`` is the
    integral quotient ``sum_q div count``; ``var_q`` applies
    ``var_pop = (n·Σx² − (Σx)²) / n²`` entirely in DECIMAL(38,0) quanta² —
    no float accumulation anywhere, so association order cannot flip a
    digit. ``min``/``max`` are raw doubles (no arithmetic — both engines
    return an input value bit-for-bit).
    """
    q = F.floor(F.col(value_col) * F.lit(float(QUANT)))
    clean = df.where(F.col(value_col).isNotNull() & ~F.isnan(value_col)).select(
        *group_cols, F.col(value_col).alias("__v"), q.alias("__q")
    )
    agg = clean.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("count"),
        F.min("__v").alias("min"),
        F.max("__v").alias("max"),
        F.sum("__q").alias("sum_q"),
        F.sum(F.col("__q").cast("decimal(38,0)") * F.col("__q")).alias("__sumsq"),
    )
    return agg.select(
        *group_cols,
        "count",
        "min",
        "max",
        "sum_q",
        # FLOOR division (not Spark's truncating `div`): subtract the
        # nonnegative pmod remainder first so a negative sum_q floors the
        # way the DuckDB twin's `//` does — `div` alone would differ by 1
        # for any negative-sum group.
        F.expr("(sum_q - pmod(sum_q, count)) div count").alias("avg_q"),
        # BIGINT result: var_pop in quanta^2 fits 63 bits for this data
        # domain (|q| <= ~5e8 => q^2 <= 2.5e17); the intermediate products
        # stay DECIMAL(38,0) so the subtraction itself cannot overflow.
        # (`div` == `//` here: the var_pop numerator n·Σq²−(Σq)² is ≥ 0 by
        # Cauchy–Schwarz, so truncation and floor agree.)
        F.expr(
            "CAST((count * __sumsq - CAST(sum_q AS DECIMAL(38,0)) * sum_q)"
            " div (CAST(count AS DECIMAL(38,0)) * count) AS BIGINT)"
        ).alias("var_q"),
    ).orderBy(*(group_cols or [F.lit(1)]))


def extended_stats_sql(src: str, group_cols: list[str], value_col: str) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH clean AS (
  SELECT {g}, {value_col} AS v, CAST(FLOOR({value_col} * {float(QUANT)}) AS BIGINT) AS q
  FROM {src} WHERE {value_col} IS NOT NULL AND NOT isnan({value_col})
),
agg AS (
  SELECT {g}, COUNT(*) AS count, MIN(v) AS min, MAX(v) AS max,
         SUM(q) AS sum_q, SUM(CAST(q AS HUGEINT) * q) AS sumsq
  FROM clean GROUP BY {g}
)
SELECT {g}, count, min, max, CAST(sum_q AS BIGINT) AS sum_q,
       -- exact FLOOR (DuckDB integer // truncates): strip the nonneg remainder
       CAST((sum_q - ((sum_q % count + count) % count)) // count AS BIGINT) AS avg_q,
       CAST((count * sumsq - CAST(sum_q AS HUGEINT) * sum_q)
            // (CAST(count AS HUGEINT) * count) AS BIGINT) AS var_q
FROM agg ORDER BY {g}
"""


_FILTER_METRICS = {
    "sum": "SUM",
    "avg": "AVG",
    "min": "MIN",
    "max": "MAX",
    "value_count": "COUNT",
}


def filters_agg(
    df: DataFrame,
    filters: dict[str, str],
    other_bucket: bool = False,
    other_key: str = "_other_",
    metric: tuple[str, str, str] | None = None,
) -> DataFrame:
    """(key, doc_count): ES ``filters`` aggregation — one named bucket per
    predicate (SQL boolean expressions), overlapping allowed; every
    requested bucket is emitted even when empty. ``other_bucket`` adds the
    ES ``other_bucket_key`` bucket counting docs matched by NO filter.

    One scan, no join: each row contributes ``count_if(pred)`` to every
    bucket via conditional aggregation — a single partial+final aggregate
    producing exactly len(filters)+1 cells per map task, then one tiny
    unpivot. No per-filter passes, no fan-out.

    ``metric=(name, kind, field)`` adds ONE metric sub-agg per bucket
    (sum/avg/min/max/value_count), riding the SAME aggregation as a
    second conditional cell per bucket — still one pass.
    """
    if metric is not None and metric[1] not in _FILTER_METRICS:
        raise ValueError(
            f"filters metric sub-agg supports {sorted(_FILTER_METRICS)},"
            f" got {metric[1]!r}"
        )
    # COALESCE(pred, FALSE): a NULL predicate (missing field) must behave
    # as "does not match" — so such docs DO land in the other bucket, the
    # ES contract
    none = " AND ".join(f"NOT COALESCE(({p}), FALSE)" for p in filters.values())
    preds = dict(filters)
    if other_bucket:
        preds[other_key] = none
    aggs = []
    for name, pred in preds.items():
        aggs.append(
            F.sum(F.expr(f"IF(COALESCE({pred}, FALSE), 1, 0)")).alias(f"__c_{name}")
        )
        if metric is not None:
            mname, mkind, mfield = metric
            fn = _FILTER_METRICS[mkind]
            aggs.append(
                F.expr(
                    f"{fn}(IF(COALESCE({pred}, FALSE), {mfield}, NULL))"
                ).alias(f"__m_{name}")
            )
    wide = df.agg(*aggs)
    names = list(preds)
    if metric is None:
        stack = ", ".join(f"'{n}', `__c_{n}`" for n in names)
        cols = "(key, doc_count)"
    else:
        stack = ", ".join(f"'{n}', `__c_{n}`, `__m_{n}`" for n in names)
        cols = f"(key, doc_count, {metric[0]})"
    out = wide.selectExpr(f"stack({len(names)}, {stack}) AS {cols}")
    sel = ["key", F.coalesce("doc_count", F.lit(0)).alias("doc_count")]
    if metric is not None:
        mcol = F.col(metric[0])
        if metric[1] == "value_count":
            mcol = F.coalesce(mcol, F.lit(0)).cast("long")
        sel.append(mcol.alias(metric[0]))
    return out.select(*sel).orderBy("key")


def filters_sql(
    src: str,
    filters: dict[str, str],
    other_bucket: bool = False,
    other_key: str = "_other_",
    metric: tuple[str, str, str] | None = None,
) -> str:
    none = " AND ".join(f"NOT COALESCE(({p}), FALSE)" for p in filters.values())
    preds = dict(filters)
    if other_bucket:
        preds[other_key] = none
    arms = []
    for name, pred in preds.items():
        cols = (
            f"SELECT '{name}' AS key,"
            f" CAST(COALESCE(SUM(CASE WHEN COALESCE({pred}, FALSE)"
            " THEN 1 ELSE 0 END), 0) AS BIGINT) AS doc_count"
        )
        if metric is not None:
            mname, mkind, mfield = metric
            fn = _FILTER_METRICS[mkind]
            mexpr = (
                f"{fn}(CASE WHEN COALESCE({pred}, FALSE)"
                f" THEN {mfield} END)"
            )
            if mkind == "value_count":
                mexpr = f"CAST(COALESCE({mexpr}, 0) AS BIGINT)"
            cols += f", {mexpr} AS {mname}"
        arms.append(cols + f" FROM {src}")
    return " UNION ALL ".join(arms) + " ORDER BY key"


def composite_agg(
    df: DataFrame,
    sources: list[tuple[str, str, str, float | None]],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """(key cols..., doc_count): ES ``composite`` aggregation — the
    paginated flat product of bucket sources.

    ``sources`` is ordered ``(name, kind, field, param)`` — or the
    6-tuple ``(name, kind, field, param, order, missing_bucket)`` — with
    kind ``terms`` (raw value) or ``histogram`` (param = interval, ES
    histogram key contract). Buckets sort lexicographically by source
    order (asc, the ES default; ``order='desc'`` flips a source);
    ``after`` — the last key tuple of the previous page — resumes
    strictly past it in the source's direction, exactly ES's ``after``
    cursor (null-safe when ``missing_bucket`` is on: nulls sort first
    asc / last desc, the ES contract). Docs missing a source value are
    skipped unless that source sets ``missing_bucket=True`` (then they
    land in the null bucket).

    Scale shape: pagination pushes BELOW the sort — the strict
    lexicographic ``after`` predicate filters during the aggregation scan,
    so each page aggregates only keys past the cursor; the final global
    sort sees at most the surviving keys and the limit is a TakeOrdered,
    never a full materialized bucket list. This is what makes composite
    the ES-sanctioned way to page a 10^9-bucket space — preserved here.
    """
    srcs = [s if len(s) == 6 else (*s, "asc", False) for s in sources]
    keys = []
    for name, kind, field, param, order, missing in srcs:
        if order not in ("asc", "desc"):
            raise ValueError(f"composite source order must be asc/desc, got {order!r}")
        v = F.col(field)
        if kind == "terms":
            keys.append((name, v))
        elif kind == "histogram":
            keys.append(
                (
                    name,
                    F.floor(v / F.lit(float(param))) * F.lit(float(param)),
                )
            )
        elif kind == "date_histogram":
            # epoch-ms key floored to the fixed step in EXACT long math
            # (the float histogram floor would round keys past 2^53).
            # param may be (step, anchor): the anchored form carries
            # calendar units that are fixed-width under the engine's
            # pinned-UTC contract but not epoch-aligned (week floors to
            # Monday — anchor 1969-12-29 = -259_200_000 ms)
            step, anchor = param if isinstance(param, tuple) else (param, 0)
            step, anchor = int(step), int(anchor)
            keys.append(
                (
                    name,
                    (v - F.pmod(v - F.lit(anchor), F.lit(step))).cast("long"),
                )
            )
        elif kind == "date_histogram_cal":
            # calendar source: param = 'month'|'quarter'|'year' — the
            # UTC period start in epoch ms (date_trunc in both engines)
            if param not in ("month", "quarter", "year"):
                raise ValueError(
                    f"calendar composite source supports month/quarter/"
                    f"year, got {param!r}"
                )
            keys.append(
                (
                    name,
                    F.unix_millis(
                        F.date_trunc(param, F.timestamp_millis(v))
                    ),
                )
            )
        else:
            raise ValueError(f"unsupported composite source kind: {kind}")
    clean = df
    for _, kind, field, _, _, missing in srcs:
        c = F.col(field)
        if not missing:
            clean = clean.where(c.isNotNull())
        if kind == "histogram":
            clean = clean.where(F.isnull(c) | ~F.isnan(c))
    out = clean.select(*[k.alias(n) for n, k in keys])
    descs = [s[4] == "desc" for s in srcs]
    names = [n for n, _ in keys]
    if after is not None:
        pred = None
        # strict lexicographic "past the cursor tuple" in each source's
        # direction; null-safe (missing_bucket nulls sort first asc /
        # last desc — the ES contract)
        for i in range(len(names)):
            eq = None
            for j in range(i):
                e = F.col(names[j]).eqNullSafe(F.lit(after[j]))
                eq = e if eq is None else (eq & e)
            c, v = F.col(names[i]), after[i]
            if descs[i]:
                # desc: non-null descending, then the null bucket last
                gt = F.lit(False) if v is None else ((c < F.lit(v)) | c.isNull())
            else:
                # asc: the null bucket first, then non-null ascending
                gt = c.isNotNull() if v is None else (c > F.lit(v))
            clause = gt if eq is None else (eq & gt)
            pred = clause if pred is None else (pred | clause)
        out = out.where(pred)
    order_cols = [
        (F.col(n).desc_nulls_last() if d else F.col(n).asc_nulls_first())
        for n, d in zip(names, descs)
    ]
    return (
        out.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(*order_cols)
        .limit(size)
    )


def composite_sql(
    src: str,
    sources: list[tuple[str, str, str, float | None]],
    size: int = 10,
    after: tuple | None = None,
) -> str:
    srcs = [s if len(s) == 6 else (*s, "asc", False) for s in sources]
    exprs, conds = [], []
    for name, kind, field, param, _, missing in srcs:
        if kind == "terms":
            exprs.append(f"{field} AS {name}")
        elif kind == "date_histogram_cal":
            exprs.append(
                f"epoch_ms(date_trunc('{param}',"
                f" make_timestamp({field} * 1000))) AS {name}"
            )
        elif kind == "date_histogram" and isinstance(param, tuple):
            # anchored fixed-width calendar unit (week -> Monday anchor):
            # exact integer floor, twin of the operator's pmod form
            step, anchor = int(param[0]), int(param[1])
            exprs.append(
                f"({field} - ((({field} - {anchor}) % {step} + {step})"
                f" % {step})) AS {name}"
            )
        else:
            exprs.append(
                f"FLOOR({field} / {float(param)}) * {float(param)} AS {name}"
            )
        if not missing:
            conds.append(f"{field} IS NOT NULL")
        if kind == "histogram":
            conds.append(f"({field} IS NULL OR NOT isnan({field}))")
    names = [n for n, *_ in srcs]
    descs = [s[4] == "desc" for s in srcs]
    where = " AND ".join(conds) or "TRUE"
    after_pred = ""
    if after is not None:
        ors = []
        for i in range(len(names)):
            parts = [
                f"{names[j]} IS NOT DISTINCT FROM {_sql_lit(after[j])}"
                for j in range(i)
            ]
            if descs[i]:
                step = (
                    "FALSE" if after[i] is None
                    else f"({names[i]} < {_sql_lit(after[i])} OR {names[i]} IS NULL)"
                )
            else:
                step = (
                    f"{names[i]} IS NOT NULL" if after[i] is None
                    else f"{names[i]} > {_sql_lit(after[i])}"
                )
            parts.append(step)
            ors.append("(" + " AND ".join(parts) + ")")
        after_pred = "WHERE " + " OR ".join(ors)
    order_by = ", ".join(
        f"{n} DESC NULLS LAST" if d else f"{n} ASC NULLS FIRST"
        for n, d in zip(names, descs)
    )
    return f"""
WITH k AS (SELECT {", ".join(exprs)} FROM {src} WHERE {where})
SELECT {", ".join(names)}, COUNT(*) AS doc_count
FROM k {after_pred}
GROUP BY {", ".join(names)}
ORDER BY {order_by} LIMIT {size}
"""


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(float(v)) if isinstance(v, float) else str(int(v))


# --------------------------------------------------------------------------
# driver-contract registry
# --------------------------------------------------------------------------
_RANGES = [(None, 25.0), (25.0, 100.0), (50.0, 250.0), (250.0, None)]
_COMPOSITE_SOURCES = [
    ("etype", "terms", "event_type", None),
    ("vbucket", "histogram", "value", 100.0),
]
_COMPOSITE_AFTER = ("click", 200.0)
_FILTERS = {
    "big": "value >= 100",
    "clicks": "event_type = 'click'",
    "odd_users": "user_id % 2 = 1",
}


def _events_t_ms(s, d) -> DataFrame:
    ev = load_table(s, d, "events")
    return ev.select(ts_ms_col(ev).alias("t_ms"), "value")


def time_series_counter_rate(
    events: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    bucket_ms: int = 86_400_000,
    reset_mod: int = 100_000,
) -> DataFrame:
    """(dims…, bucket, n_samples, increase): the ES 8.x TSDB surface —
    ``time_series`` aggregation with a counter-semantics ``rate`` sub-agg
    (the last ES agg family the engine mirrors; the 8.x docs define a time
    series by its dimension fields and require ``rate`` inside it to
    handle COUNTER RESETS: a sample lower than its predecessor means the
    counter restarted, so the increase since the reset is the new value
    itself, not the negative delta — the Prometheus ``increase()`` rule).

    Spark-native: one window per series (partitionBy(dims) — the shuffle
    IS the TSDB at-rest layout: series-hashed, time-sorted within, which
    is exactly how ES routes TSDB docs to shards by _tsid) computing
    lag-deltas with the reset rule, then an ordinary partial+final agg to
    the requested bucket width. No driver involvement, no Python.

    The events table carries gauges, not counters, so the registered query
    SYNTHESIZES a counter per series — running sum of the quantized value
    ordered by (t_ms, event_id), wrapped modulo ``reset_mod`` — giving the
    fixture genuine mid-stream resets that both engines reproduce exactly
    (integer math end to end).
    """
    from pyspark.sql import Window

    t = ts_ms_col(events)
    base = events.where(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        *dims,
        t.alias("t_ms"),
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )
    series = Window.partitionBy(*dims).orderBy("t_ms", "event_id")
    # explicit ROWS frame: Spark's default is RANGE (peers share a value),
    # while the DuckDB oracle twin uses ROWS UNBOUNDED PRECEDING — the two
    # diverge if (t_ms, event_id) is ever non-unique within a series
    run = series.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ctr = (F.sum("vq").over(run) % F.lit(int(reset_mod))).alias("counter")
    with_ctr = base.select(*dims, "t_ms", "event_id", ctr)
    prev = F.lag("counter").over(Window.partitionBy(*dims).orderBy("t_ms", "event_id"))
    inc = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("counter") < prev, F.col("counter"))  # reset: new value
        .otherwise(F.col("counter") - prev)
    )
    return (
        with_ctr.withColumn("inc", inc)
        .groupBy(*dims, (F.col("t_ms") - F.col("t_ms") % bucket_ms).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("inc").cast("long").alias("increase"),
        )
        .orderBy(*dims, "bucket")
    )


def time_series_counter_rate_sql(
    time_ms_expr: str,
    dims: tuple[str, ...] = ("event_type",),
    bucket_ms: int = 86_400_000,
    reset_mod: int = 100_000,
) -> str:
    d = ", ".join(dims)
    return f"""
WITH base AS (
  SELECT {d}, {time_ms_expr} AS t_ms, event_id,
         CAST(FLOOR(value * 1000) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
ctr AS (
  SELECT {d}, t_ms, event_id,
         SUM(vq) OVER (PARTITION BY {d} ORDER BY t_ms, event_id
                       ROWS UNBOUNDED PRECEDING) % {int(reset_mod)} AS counter
  FROM base
),
inc AS (
  SELECT {d}, t_ms, counter,
         LAG(counter) OVER (PARTITION BY {d} ORDER BY t_ms, event_id) AS prev
  FROM ctr
)
SELECT {d}, CAST(t_ms - t_ms % {int(bucket_ms)} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN prev IS NULL THEN 0
                     WHEN counter < prev THEN counter
                     ELSE counter - prev END) AS BIGINT) AS increase
FROM inc GROUP BY {d}, t_ms - t_ms % {int(bucket_ms)}
ORDER BY {d}, bucket
"""


def terms_shard_error(
    df: DataFrame,
    field: str = "user_id",
    n_shards: int = 4,
    shard_size: int = 5,
    size: int = 10,
    salt: str = "shard-v1",
) -> DataFrame:
    """(key, doc_count, err_ub): ES's DISTRIBUTED terms aggregation
    semantics, including ``doc_count_error_upper_bound`` — the one part of
    the terms contract that only exists because of sharding.

    ES asks each shard for its local top ``shard_size`` terms and merges:
    a term's reported ``doc_count`` sums ONLY the shards that surfaced it,
    and the error bound is the sum, over shards that did NOT surface it, of
    that shard's last-returned (``shard_size``-th) count — a shard that
    returned fewer than ``shard_size`` distinct terms returned everything,
    so it contributes 0. This operator reproduces that contract with a
    deterministic md5 shard route so the result is engine-checkable.

    Scale: per-shard counting is one partial+final agg keyed by
    (shard, term); the per-shard top-k is a ranking window whose input is
    already collapsed to distinct terms; kth/total tables are O(n_shards)
    rows (broadcast). Exactly the shard→coordinator volume bound ES uses:
    the merge sees ≤ n_shards · shard_size candidate rows, never the full
    term dictionary.
    """
    from ..functions.hashing import md5_hash60
    from pyspark.sql import Window

    shard = F.pmod(
        md5_hash60(F.concat(F.lit(salt + "#"), F.col(field).cast("string"))),
        F.lit(n_shards),
    )
    counts = df.groupBy(
        shard.alias("shard"), F.col(field).alias("key")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("shard").orderBy(F.col("c").desc(), "key")
    ranked = counts.withColumn("r", F.row_number().over(w))
    kth = (
        ranked.groupBy("shard")
        .agg(
            F.max("r").alias("n_terms"),
            F.min(F.when(F.col("r") <= shard_size, F.col("c"))).alias("kmin"),
        )
        .select(
            "shard",
            F.when(F.col("n_terms") >= shard_size, F.col("kmin"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kth"),
        )
    )
    total = kth.agg(F.sum("kth").alias("tk"))
    tops = ranked.where(F.col("r") <= shard_size)
    return (
        tops.join(kth, "shard")
        .groupBy("key")
        .agg(F.sum("c").cast("long").alias("doc_count"), F.sum("kth").alias("kr"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "doc_count",
            (F.col("tk") - F.col("kr")).cast("long").alias("err_ub"),
        )
        .orderBy(F.col("doc_count").desc(), "key")
        .limit(size)
    )


def terms_shard_error_sql(
    table: str,
    field: str = "user_id",
    n_shards: int = 4,
    shard_size: int = 5,
    size: int = 10,
    salt: str = "shard-v1",
) -> str:
    from ..functions.hashing import HEX15_SQL_FN

    h = HEX15_SQL_FN.format(expr=f"'{salt}#' || CAST({field} AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT CAST(({h}) % {n_shards} AS BIGINT) AS shard, {field} AS key, COUNT(*) AS c
  FROM {table} GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY c DESC, key) AS r
  FROM counts
),
kth AS (
  SELECT shard,
         CAST(CASE WHEN MAX(r) >= {shard_size}
                   THEN MIN(CASE WHEN r <= {shard_size} THEN c END)
                   ELSE 0 END AS BIGINT) AS kth
  FROM ranked GROUP BY shard
),
total AS (SELECT SUM(kth) AS tk FROM kth),
tops AS (SELECT * FROM ranked WHERE r <= {shard_size}),
cand AS (
  SELECT t.key, CAST(SUM(t.c) AS BIGINT) AS doc_count, SUM(k.kth) AS kr
  FROM tops t JOIN kth k USING (shard) GROUP BY t.key
)
SELECT key, doc_count, CAST(tk - kr AS BIGINT) AS err_ub
FROM cand, total ORDER BY doc_count DESC, key LIMIT {size}
"""


def queries() -> dict:
    return {
        "es_terms_top_users": lambda s, d: terms_agg(
            load_table(s, d, "events"), "user_id", size=25, value_col="value"
        ),
        "es_range_value": lambda s, d: range_agg(
            load_table(s, d, "events"), "value", _RANGES, value_col="value"
        ),
        "es_histogram_filled": lambda s, d: histogram_agg_filled(
            load_table(s, d, "events").where("user_id % 25 = 0"),
            "value", interval=50.0, offset=10.0, value_col="value",
        ),
        "es_histogram_value": lambda s, d: histogram_agg(
            load_table(s, d, "events"), "value", interval=50.0, offset=10.0,
            min_doc_count=5, value_col="value"
        ),
        "es_extended_stats": lambda s, d: extended_stats_agg(
            load_table(s, d, "events"), ["event_type"], "value"
        ),
        "es_filters_metric": lambda s, d: filters_agg(
            load_table(s, d, "events"), _FILTERS, other_bucket=True,
            metric=("vmax", "max", "value"),
        ),
        "es_composite_month": lambda s, d: composite_agg(
            (lambda ev: ev.select(
                ts_ms_col(ev).alias("t_ms"), "event_type"
            ))(load_table(s, d, "events")),
            [("m", "date_histogram_cal", "t_ms", "month"),
             ("etype", "terms", "event_type", None)],
            size=30,
        ),
        "es_composite_page": lambda s, d: composite_agg(
            load_table(s, d, "events"), _COMPOSITE_SOURCES, size=12
        ),
        # r10 (SCOPE.md §E): sub-month calendar composite source — ISO
        # weeks via the Monday-anchored fixed floor (pinned-UTC contract)
        "es_composite_week": lambda s, d: composite_agg(
            (lambda ev: ev.select(
                ts_ms_col(ev).alias("t_ms"), "event_type"
            ))(load_table(s, d, "events")),
            [("wk", "date_histogram", "t_ms", (604_800_000, -259_200_000)),
             ("etype", "terms", "event_type", None)],
            size=30,
        ),
        "es_composite_after": lambda s, d: composite_agg(
            load_table(s, d, "events"), _COMPOSITE_SOURCES, size=12,
            after=_COMPOSITE_AFTER,
        ),
        "es_filters_buckets": lambda s, d: filters_agg(
            load_table(s, d, "events"), _FILTERS, other_bucket=True
        ),
        # span from parquet footer stats: no extra min/max scan job
        "es_auto_date_histogram": lambda s, d: auto_date_histogram(
            _events_t_ms(s, d), "t_ms", target_buckets=40, value_col="value",
            bounds=__import__(
                "elasticsearch_drift_plugin_spark.sources.flows", fromlist=["x"]
            ).parquet_ts_bounds_ms(d, "events", "ts"),
        ),
        "es_significant_terms": lambda s, d: significant_terms(
            load_table(s, d, "events"), "user_id",
            "event_type = 'purchase'", size=20,
        ),
        "es_significant_jlh": lambda s, d: significant_terms(
            load_table(s, d, "events"), "user_id",
            "event_type = 'purchase'", size=20, score="jlh",
        ),
        "es_significant_chi2": lambda s, d: significant_terms(
            load_table(s, d, "events"), "user_id",
            "event_type = 'purchase'", size=20, score="chi_square",
        ),
        "es_significant_text": lambda s, d: significant_text(
            load_table(s, d, "documents"), "text", "lang = 'zh'", size=25
        ),
        "es_value_stats": lambda s, d: value_stats_agg(
            load_table(s, d, "events"), ["event_type"], "value"
        ),
        "es_time_series_rate": lambda s, d: time_series_counter_rate(
            load_table(s, d, "events")
        ),
        "es_percentile_ranks": lambda s, d: percentile_ranks(
            load_table(s, d, "events"), ["event_type"], "value",
            [10.0, 50.0, 150.0, 400.0],
        ),
        "es_weighted_avg": lambda s, d: weighted_avg(
            load_table(s, d, "events"), ["event_type"], "value",
            "CAST(user_id % 10 + 1 AS DOUBLE)",
        ),
        "es_top_metrics": lambda s, d: top_metrics(
            load_table(s, d, "events"), ["event_type"], "value",
            ["event_id", "user_id"],
        ),
        # r10 (SCOPE.md §E): the N-field matrix — listwise-clean
        # covariance/correlation upper triangle in ONE aggregation pass
        "es_matrix_stats_multi": lambda s, d: matrix_stats_multi(
            load_table(s, d, "events").select(
                "value",
                F.expr("CAST(user_id % 1000 AS DOUBLE)").alias("u"),
                F.expr("CAST(event_id % 97 AS DOUBLE)").alias("w"),
            ),
            ["value", "u", "w"],
        ),
        "es_matrix_stats": lambda s, d: matrix_stats(
            load_table(s, d, "events").select(
                "event_type", "value",
                F.expr("CAST(user_id % 1000 AS DOUBLE)").alias("u"),
            ),
            "value", "u", ["event_type"],
        ),
        "es_terms_shard_error": lambda s, d: terms_shard_error(
            load_table(s, d, "events")
        ),
    }


def oracle_sql() -> dict:
    return {
        "es_terms_top_users": terms_sql("events", "user_id", size=25, value_col="value"),
        "es_range_value": range_sql("events", "value", _RANGES, value_col="value"),
        "es_histogram_filled": histogram_filled_sql(
            "(SELECT * FROM events WHERE user_id % 25 = 0)",
            "value", interval=50.0, offset=10.0, value_col="value",
        ),
        "es_histogram_value": histogram_sql(
            "events", "value", interval=50.0, offset=10.0, min_doc_count=5,
            value_col="value"
        ),
        "es_extended_stats": extended_stats_sql("events", ["event_type"], "value"),
        "es_filters_metric": filters_sql(
            "events", _FILTERS, other_bucket=True,
            metric=("vmax", "max", "value"),
        ),
        "es_composite_month": composite_sql(
            "(SELECT epoch_ms(ts) AS t_ms, event_type FROM events)",
            [("m", "date_histogram_cal", "t_ms", "month"),
             ("etype", "terms", "event_type", None)],
            size=30,
        ),
        "es_composite_page": composite_sql("events", _COMPOSITE_SOURCES, size=12),
        "es_composite_week": composite_sql(
            "(SELECT epoch_ms(ts) AS t_ms, event_type FROM events)",
            [("wk", "date_histogram", "t_ms", (604_800_000, -259_200_000)),
             ("etype", "terms", "event_type", None)],
            size=30,
        ),
        "es_composite_after": composite_sql(
            "events", _COMPOSITE_SOURCES, size=12, after=_COMPOSITE_AFTER
        ),
        "es_filters_buckets": filters_sql("events", _FILTERS, other_bucket=True),
        "es_time_series_rate": time_series_counter_rate_sql("epoch_ms(ts)"),
        "es_auto_date_histogram": auto_date_histogram_sql(
            "events", "epoch_ms(ts)", target_buckets=40, value_col="value"
        ),
        "es_significant_terms": significant_terms_sql(
            "events", "user_id", "event_type = 'purchase'", size=20
        ),
        "es_significant_jlh": significant_terms_sql(
            "events", "user_id", "event_type = 'purchase'", size=20,
            score="jlh",
        ),
        "es_significant_chi2": significant_terms_sql(
            "events", "user_id", "event_type = 'purchase'", size=20,
            score="chi_square",
        ),
        "es_significant_text": significant_text_sql(
            "documents", "text", "lang = 'zh'", size=25
        ),
        "es_value_stats": value_stats_sql("events", ["event_type"], "value"),
        "es_percentile_ranks": percentile_ranks_sql(
            "events", ["event_type"], "value", [10.0, 50.0, 150.0, 400.0]
        ),
        "es_weighted_avg": weighted_avg_sql(
            "events", ["event_type"], "value", "CAST(user_id % 10 + 1 AS DOUBLE)"
        ),
        "es_top_metrics": top_metrics_sql(
            "events", ["event_type"], "value", ["event_id", "user_id"]
        ),
        "es_matrix_stats_multi": matrix_stats_multi_sql(
            "(SELECT value, CAST(user_id % 1000 AS DOUBLE) AS u,"
            " CAST(event_id % 97 AS DOUBLE) AS w FROM events)",
            ["value", "u", "w"],
        ),
        "es_matrix_stats": matrix_stats_sql(
            "(SELECT event_type, value, CAST(user_id % 1000 AS DOUBLE) AS u"
            " FROM events)",
            "value", "u", ["event_type"],
        ),
        "es_terms_shard_error": terms_shard_error_sql("events"),
    }



def histogram_agg_filled(
    df: DataFrame,
    field: str,
    interval: float,
    offset: float = 0.0,
    value_col: str | None = None,
    max_fill_buckets: int = 100_000,
    extended_bounds: tuple[float, float] | None = None,
    extra_aggs: dict | None = None,
    extra_fill_zero: set | None = None,
) -> DataFrame:
    """ES numeric ``histogram`` with ``min_doc_count: 0``: every bucket on
    the grid between the data min and max appears, zero-filled. The spine
    is a `sequence()` over integer bucket indices (never driver-side),
    joined to the aggregated buckets on the key — the same shape as the
    core operator's empty-bucket fill, with the same circuit breaker
    (``max_fill_buckets`` bounds the spine before it generates).
    ``extended_bounds=(min, max)`` WIDENS the grid beyond the data (the ES
    parameter: empty buckets out to the requested range; it never narrows).

    ``extra_aggs`` (r9): metric sub-aggs ride the same aggregation pass as
    the unfilled operator; on the ZERO-FILLED buckets each metric takes
    its ES empty-reduce value — 0 for the counting family
    (``extra_fill_zero`` names: sum / value_count / cardinality), NULL for
    the order-statistics family (min / max / avg), exactly the bucket an
    empty ES histogram bucket renders.
    """
    base = histogram_agg(
        df, field, interval, offset=offset, min_doc_count=1,
        value_col=value_col, extra_aggs=extra_aggs,
    )
    idx = F.expr(f"CAST(FLOOR((key - {float(offset)}) / {float(interval)}) AS BIGINT)")
    lo_agg, hi_agg = F.min(idx), F.max(idx)
    if extended_bounds is not None:
        eb_lo, eb_hi = (
            int((float(b) - float(offset)) // float(interval))
            for b in extended_bounds
        )
        lo_agg = F.least(lo_agg, F.lit(eb_lo))
        hi_agg = F.greatest(hi_agg, F.lit(eb_hi))
    bounds = base.agg(lo_agg.alias("lo"), hi_agg.alias("hi"))
    spine = (
        bounds.where(F.col("lo").isNotNull())
        .select(
            F.explode(
                F.expr(
                    f"CASE WHEN hi - lo + 1 > {int(max_fill_buckets)}"
                    f" THEN raise_error('histogram fill bucket bomb')"
                    f" ELSE sequence(lo, hi) END"
                )
            ).alias("i")
        )
        .select(
            (F.col("i") * F.lit(float(interval)) + F.lit(float(offset))).alias("key")
        )
    )
    fill = [F.coalesce("doc_count", F.lit(0)).alias("doc_count")]
    if value_col is not None:
        fill.append(F.coalesce("value_q", F.lit(0)).alias("value_q"))
    dtypes = {f.name: f.dataType for f in base.schema.fields}
    for name in (extra_aggs or {}):
        if name in (extra_fill_zero or ()):
            fill.append(
                F.coalesce(F.col(name), F.lit(0).cast(dtypes[name])).alias(name)
            )
        else:
            fill.append(F.col(name))
    return spine.join(base, "key", "left").select("key", *fill).orderBy("key")


def histogram_filled_sql(
    src: str,
    field: str,
    interval: float,
    offset: float = 0.0,
    value_col: str | None = None,
) -> str:
    # CASTs: DuckDB parses float literals as DECIMAL, so the spine key would
    # come out DECIMAL(23,1) (vs Spark DOUBLE) without the explicit cast.
    val_sel = ", CAST(COALESCE(value_q, 0) AS BIGINT) AS value_q" if value_col else ""
    base = histogram_sql(
        src, field, interval, offset=offset, min_doc_count=1, value_col=value_col
    )
    return f"""
WITH base AS ({base}),
bounds AS (
  SELECT CAST(FLOOR((MIN(key) - {float(offset)}) / {float(interval)}) AS BIGINT) AS lo,
         CAST(FLOOR((MAX(key) - {float(offset)}) / {float(interval)}) AS BIGINT) AS hi
  FROM base
),
spine AS (
  SELECT unnest(generate_series(lo, hi)) * {float(interval)} + {float(offset)} AS key
  FROM bounds WHERE lo IS NOT NULL
)
SELECT CAST(spine.key AS DOUBLE) AS key, COALESCE(doc_count, 0) AS doc_count{val_sel}
FROM spine LEFT JOIN base ON base.key = spine.key
ORDER BY key
"""


# --------------------------------------------------------------------------
# auto_date_histogram (ES ladder, span-based selection)
# --------------------------------------------------------------------------
# The public ES auto_date_histogram rounding ladder
# (second 1/5/10/30, minute 1/5/10/30, hour 1/3/12, day 1/7, month 1/3,
# year 1/5/10/20/50/100). Fixed-width rungs in ms; calendar rungs in months.
AUTO_LADDER_FIXED = [
    ("1s", 1_000), ("5s", 5_000), ("10s", 10_000), ("30s", 30_000),
    ("1m", 60_000), ("5m", 300_000), ("10m", 600_000), ("30m", 1_800_000),
    ("1h", 3_600_000), ("3h", 10_800_000), ("12h", 43_200_000),
    ("1d", 86_400_000), ("7d", 604_800_000),
]
AUTO_LADDER_CAL = [
    ("1M", 1), ("3M", 3), ("1y", 12), ("5y", 60), ("10y", 120),
    ("20y", 240), ("50y", 600), ("100y", 1200),
]


def auto_date_histogram(
    df: DataFrame,
    time_ms_col: str,
    target_buckets: int = 10,
    value_col: str | None = None,
    bounds: tuple[int, int] | None = None,
    minimum_interval: str | None = None,
) -> DataFrame:
    """(key, doc_count[, value_q], interval): ES ``auto_date_histogram`` —
    the engine picks the coarsest-necessary rounding from the ES ladder so
    the bucket count stays ≤ ``target_buckets``.

    Selection is span-based: the (lo, hi) epoch-ms span feeds the ladder
    walk in plain Python, then ONE ordinary histogram aggregation runs at
    the chosen rounding. ES instead merges buckets progressively at reduce
    time; same ladder, same ≤-target contract, simpler plan. Calendar
    rungs bucket by month index floored to k-month multiples (UTC, month
    starts — the reference's own tz=null/UTC stance,
    ProportionalSumAggregationBuilder.java:432-434).

    ``bounds=(lo_ms, hi_ms)`` supplies the span from metadata — parquet
    footer statistics via ``sources.flows.parquet_ts_bounds_ms`` (zero data
    read; what the registered query does) or any cached bound. Without it,
    a min/max aggregation runs first (two longs to the driver) — correct,
    but an extra full scan the footer path avoids at 100 TB.

    ``minimum_interval`` (ES param) floors the ladder walk: rungs finer
    than the named unit are skipped, so sparse data cannot produce
    needlessly fine buckets. Accepts any ladder label (``"1m"``,
    ``"1h"``, ``"1d"``, ``"1M"``, ...).

    Empty input returns an empty frame with the finest label.
    """
    t = F.col(time_ms_col)
    if bounds is not None:
        lo, hi = int(bounds[0]), int(bounds[1])
    else:
        row = df.agg(F.min(t).alias("lo"), F.max(t).alias("hi")).collect()[0]
        lo, hi = row["lo"], row["hi"]
    label, width, months = AUTO_LADDER_FIXED[0][0], AUTO_LADDER_FIXED[0][1], None
    if lo is not None:
        import datetime as _dt

        fixed = AUTO_LADDER_FIXED
        cal = AUTO_LADDER_CAL
        if minimum_interval is not None:
            labels = [l for l, _ in AUTO_LADDER_FIXED] + [
                l for l, _ in AUTO_LADDER_CAL
            ]
            if minimum_interval not in labels:
                raise ValueError(
                    f"minimum_interval {minimum_interval!r} is not a ladder"
                    f" rung (have {labels})"
                )
            if minimum_interval in dict(AUTO_LADDER_FIXED):
                idx = labels.index(minimum_interval)
                fixed = AUTO_LADDER_FIXED[idx:]
            else:
                fixed = []
                idx = [l for l, _ in AUTO_LADDER_CAL].index(minimum_interval)
                cal = AUTO_LADDER_CAL[idx:]
        chosen = None
        for lab, w in fixed:
            if hi // w - lo // w + 1 <= target_buckets:
                chosen = (lab, w, None)
                break
        if chosen is None:
            def _mi(ms):
                from ..params import _ms_to_dt

                d = _ms_to_dt(ms, _dt.timezone.utc)
                return d.year * 12 + d.month - 1

            for lab, k in cal:
                if _mi(hi) // k - _mi(lo) // k + 1 <= target_buckets:
                    chosen = (lab, None, k)
                    break
            if chosen is None:
                chosen = ("100y", None, 1200)
        label, width, months = chosen
    if width is not None:
        key = (t - (((t % width) + width) % width)).alias("key")
    else:
        mi = (F.year(F.timestamp_millis(t)) * 12 + F.month(F.timestamp_millis(t)) - 1)
        bmi = mi - (mi % months)
        key = F.unix_millis(
            F.make_timestamp(
                (bmi / 12).cast("int"), (bmi % 12 + 1).cast("int"), F.lit(1),
                F.lit(0), F.lit(0), F.lit(0),
            )
        ).alias("key")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(value_col).isNotNull() & ~F.isnan(value_col),
                        F.floor(F.col(value_col) * F.lit(float(QUANT))),
                    )
                ),
                F.lit(0),
            ).alias("value_q")
        )
    return (
        df.groupBy(key)
        .agg(*aggs)
        .withColumn("interval", F.lit(label))
        .orderBy("key")
    )


def auto_date_histogram_sql(
    src: str, time_ms_expr: str, target_buckets: int = 10,
    value_col: str | None = None,
) -> str:
    """DuckDB twin for the FIXED-width rungs (the driver-gated data lands
    there); the calendar rungs are pinned by pytest goldens instead — a
    CASE-selected scalar width parametrizes fixed grouping, a calendar
    grouping expression cannot be scalar-parametrized in one statement."""
    w_case = " ".join(
        f"WHEN hi // {w} - lo // {w} + 1 <= {target_buckets} THEN {w}"
        for _, w in AUTO_LADDER_FIXED
    )
    l_case = " ".join(
        f"WHEN hi // {w} - lo // {w} + 1 <= {target_buckets} THEN '{lab}'"
        for lab, w in AUTO_LADDER_FIXED
    )
    val = (
        f", CAST(COALESCE(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)"
        f" THEN CAST(FLOOR(value * {float(QUANT)}) AS BIGINT) END), 0) AS BIGINT)"
        " AS value_q"
        if value_col
        else ""
    )
    return f"""
WITH t AS (SELECT {time_ms_expr} AS ms, * FROM {src}),
mm AS (SELECT MIN(ms) AS lo, MAX(ms) AS hi FROM t),
sel AS (SELECT CASE {w_case} END AS w, CASE {l_case} END AS label FROM mm)
SELECT (ms // sel.w) * sel.w AS key, COUNT(*) AS doc_count{val},
       sel.label AS interval
FROM t, sel GROUP BY 1, sel.label ORDER BY key
"""


# --------------------------------------------------------------------------
# significant_terms (foreground vs background lift)
# --------------------------------------------------------------------------
# ES significance heuristics beyond the exact-integer lift: the published
# formula family over the same four counts (fgp = fg/fg_total, bgp =
# bg/bg_total). Scored in DOUBLE from the IDENTICAL expression text in
# both engines (same IEEE op order -> same bits -> same floor quanta).
_FGP = "(CAST(fg_count AS DOUBLE) / CAST(fg_total AS DOUBLE))"
_BGP = "(CAST(bg_count AS DOUBLE) / CAST(bg_total AS DOUBLE))"
_SIG_SCORE_EXPRS = {
    "jlh": f"(({_FGP} - {_BGP}) * ({_FGP} / {_BGP}))",
    "chi_square": f"((({_FGP} - {_BGP}) * ({_FGP} - {_BGP})) / {_BGP})",
    "percentage": f"({_FGP} / {_BGP})",
}


def significant_terms(
    df: DataFrame,
    field: str,
    foreground_where: str,
    size: int = 10,
    min_doc_count: int = 3,
    score: str = "lift",
    background_where: str | None = None,
) -> DataFrame:
    """(key, fg_count, bg_count, score_q): ES ``significant_terms`` — terms
    over-represented in a foreground set relative to the whole corpus.

    Score is the foreground/background frequency lift
    ``(fg/fg_total) / (bg/bg_total)`` — the first factor of ES's JLH —
    computed as ONE exact integer: ``fg·bg_total·1e6 div (fg_total·bg)``
    (DECIMAL(38,0) intermediates), so ranking cannot drift across engines.
    Top-``size`` by score desc, key asc tie-break; terms below
    ``min_doc_count`` foreground hits are pruned (the ES guard against
    one-doc wonders).

    One aggregation pass: per term, total count and conditional foreground
    count (`count_if`) — no second scan, no join for the fg/bg split; the
    two scalar totals ride along via a single-row cross join (broadcast).
    """
    if score != "lift" and score not in _SIG_SCORE_EXPRS:
        raise ValueError(
            f"unknown significance score {score!r} "
            f"(have: lift, {', '.join(_SIG_SCORE_EXPRS)})"
        )
    # ES background_filter NARROWS the background set: bg counts (and
    # totals) are taken over docs matching it, instead of the whole
    # frame. The foreground stays the caller's set — ES does not force
    # fg ⊆ bg, and neither do we. Still ONE aggregation pass: the bg
    # membership is just a second conditional count.
    fg_flag = F.expr(f"IF(COALESCE({foreground_where}, FALSE), 1, 0)")
    bg_flag = (
        F.expr(f"IF(COALESCE({background_where}, FALSE), 1, 0)")
        if background_where is not None
        else F.lit(1)
    )
    per_term = (
        df.select(
            F.col(field).alias("key"),
            fg_flag.alias("__fg"),
            bg_flag.alias("__bg"),
        )
        .groupBy("key")
        .agg(
            F.sum("__fg").alias("fg_count"),
            F.sum("__bg").alias("bg_count"),
        )
        .where(F.col("bg_count") > 0)
    )
    totals = per_term.agg(
        F.sum("fg_count").alias("fg_total"), F.sum("bg_count").alias("bg_total")
    )
    if score == "lift":
        # `div` == the twin's `//` here by construction: numerator and
        # denominator are products of counts, both provably >= 0, so
        # truncating and flooring division agree.
        score_expr = (
            "CAST((CAST(fg_count AS DECIMAL(38,0)) * bg_total * 1000000)"
            " div (CAST(fg_total AS DECIMAL(38,0)) * bg_count) AS BIGINT)"
        )
    else:
        score_expr = (
            f"CAST(FLOOR({_SIG_SCORE_EXPRS[score]} * 1000000.0) AS BIGINT)"
        )
    scored = per_term.join(F.broadcast(totals)).select(
        "key",
        "fg_count",
        "bg_count",
        F.expr(score_expr).alias("score_q"),
    )
    return (
        scored.where(F.col("fg_count") >= min_doc_count)
        .orderBy(F.col("score_q").desc(), F.col("key").asc())
        .limit(size)
    )


def significant_text(
    df: DataFrame,
    text_col: str,
    foreground_where: str,
    size: int = 10,
    min_doc_count: int = 3,
    score: str = "lift",
    background_where: str | None = None,
) -> DataFrame:
    """(key, fg_count, bg_count, score_q): ES ``significant_text`` — the
    free-text twin of :func:`significant_terms`. Tokens (whitespace split)
    counted by DOC frequency — ``array_distinct`` before the explode, the
    ES de-duplication contract — then the identical exact-integer fg/bg
    lift, ranking, and pruning (delegated to significant_terms, so the
    scoring cannot drift between the two). ``background_where`` is ES's
    ``background_filter`` — it NARROWS the background set (bg counts and
    totals over matching docs only), same contract as significant_terms.

    Scale: explode of distinct tokens is map-side; everything after is the
    one aggregation pass significant_terms already does.
    """
    cols = [
        F.expr(f"COALESCE({foreground_where}, FALSE)").alias("__fg_flag"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ]
    if background_where is not None:
        cols.insert(
            1, F.expr(f"COALESCE({background_where}, FALSE)").alias("__bg_flag")
        )
    toks = df.select(*cols).where(F.col("tok") != "")
    return significant_terms(
        toks, "tok", "__fg_flag", size=size, min_doc_count=min_doc_count,
        score=score,
        background_where="__bg_flag" if background_where is not None else None,
    )


def significant_text_sql(
    src: str,
    text_col: str,
    foreground_where: str,
    size: int = 10,
    min_doc_count: int = 3,
    score: str = "lift",
    background_where: str | None = None,
) -> str:
    if score == "lift":
        score_sql = (
            "CAST((CAST(fg_count AS HUGEINT) * bg_total * 1000000)\n"
            "            // (CAST(fg_total AS HUGEINT) * bg_count) AS BIGINT)"
        )
    else:
        score_sql = (
            f"CAST(FLOOR({_SIG_SCORE_EXPRS[score]} * 1000000.0) AS BIGINT)"
        )
    bg = (
        f"CASE WHEN COALESCE({background_where}, FALSE) THEN 1 ELSE 0 END"
        if background_where is not None
        else "1"
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_distinct(string_split({text_col}, ' '))) AS key,
         CASE WHEN COALESCE({foreground_where}, FALSE) THEN 1 ELSE 0 END AS fg,
         {bg} AS bg
  FROM {src}
),
per_term AS (
  SELECT key, SUM(fg) AS fg_count, SUM(bg) AS bg_count
  FROM toks WHERE key <> '' GROUP BY key HAVING SUM(bg) > 0
),
totals AS (SELECT SUM(fg_count) AS fg_total, SUM(bg_count) AS bg_total FROM per_term)
SELECT key, CAST(fg_count AS BIGINT) AS fg_count,
       CAST(bg_count AS BIGINT) AS bg_count,
       {score_sql} AS score_q
FROM per_term, totals
WHERE fg_count >= {min_doc_count}
ORDER BY score_q DESC, key ASC LIMIT {size}
"""


def value_stats_agg(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """(group..., value_count, sum_q, avg_q, min, max, cardinality): the ES
    basic metric-agg family — ``value_count``/``sum``/``avg``/``min``/
    ``max`` plus exact ``cardinality`` of the quantized value — in ONE
    partial+final aggregation pass, the way a search body stacks them as
    siblings. NULL/NaN skipped per every ES metric agg; sums exact in
    1e-6 quanta; avg is the integral quotient.

    Scale: single shuffle on the group key; countDistinct rewrites to a
    two-phase expand-aggregate — swap for approx_count_distinct (HLL) when
    exactness is not required (SCALE.md).
    """
    q = F.floor(F.col(value_col) * F.lit(float(QUANT)))
    clean = df.where(F.col(value_col).isNotNull() & ~F.isnan(value_col)).select(
        *group_cols, F.col(value_col).alias("__v"), q.alias("__q")
    )
    return (
        clean.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("value_count"),
            F.sum("__q").alias("sum_q"),
            F.min("__v").alias("min"),
            F.max("__v").alias("max"),
            F.countDistinct("__q").alias("cardinality"),
        )
        .select(
            *group_cols,
            "value_count",
            "sum_q",
            # floor (not truncate) so negative sums match the twin's `//`
            F.expr("(sum_q - pmod(sum_q, value_count)) div value_count").alias("avg_q"),
            "min",
            "max",
            "cardinality",
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def value_stats_sql(src: str, group_cols: list[str], value_col: str) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH clean AS (
  SELECT {g}, {value_col} AS v, CAST(FLOOR({value_col} * {float(QUANT)}) AS BIGINT) AS q
  FROM {src} WHERE {value_col} IS NOT NULL AND NOT isnan({value_col})
)
SELECT {g}, COUNT(*) AS value_count, CAST(SUM(q) AS BIGINT) AS sum_q,
       -- exact FLOOR (DuckDB integer // truncates): strip the nonneg remainder
       CAST((SUM(q) - ((SUM(q) % COUNT(*) + COUNT(*)) % COUNT(*))) // COUNT(*)
            AS BIGINT) AS avg_q,
       MIN(v) AS min, MAX(v) AS max,
       COUNT(DISTINCT q) AS cardinality
FROM clean GROUP BY {g} ORDER BY {g}
"""


def significant_terms_sql(
    src: str,
    field: str,
    foreground_where: str,
    size: int = 10,
    min_doc_count: int = 3,
    score: str = "lift",
    background_where: str | None = None,
) -> str:
    if score == "lift":
        score_sql = (
            "CAST((CAST(fg_count AS HUGEINT) * bg_total * 1000000)\n"
            "            // (CAST(fg_total AS HUGEINT) * bg_count) AS BIGINT)"
        )
    else:
        score_sql = (
            f"CAST(FLOOR({_SIG_SCORE_EXPRS[score]} * 1000000.0) AS BIGINT)"
        )
    bg = (
        f"SUM(CASE WHEN COALESCE({background_where}, FALSE) THEN 1 ELSE 0 END)"
        if background_where is not None
        else "COUNT(*)"
    )
    return f"""
WITH per_term AS (
  SELECT {field} AS key,
         SUM(CASE WHEN COALESCE({foreground_where}, FALSE) THEN 1 ELSE 0 END) AS fg_count,
         {bg} AS bg_count
  FROM {src} GROUP BY {field}
  HAVING {bg} > 0
),
totals AS (SELECT SUM(fg_count) AS fg_total, SUM(bg_count) AS bg_total FROM per_term)
SELECT key, CAST(fg_count AS BIGINT) AS fg_count, bg_count,
       {score_sql} AS score_q
FROM per_term, totals
WHERE fg_count >= {min_doc_count}
ORDER BY score_q DESC, key ASC LIMIT {size}
"""


# --------------------------------------------------------------------------
# percentile_ranks (exact)
# --------------------------------------------------------------------------
def percentile_ranks(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    at_values: list[float],
) -> DataFrame:
    """(group..., at_value, rank_q): ES ``percentile_ranks`` — for each
    probe value, the fraction of docs with value ≤ probe, exact:
    ``count_leq · 1e6 div count`` per group. One conditional-aggregation
    pass computes every probe (no per-probe scans); NULL/NaN skipped like
    every ES metric agg."""
    clean = df.where(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, v in enumerate(at_values):
        aggs.append(
            F.sum(
                F.when(F.col(value_col) <= F.lit(float(v)), 1).otherwise(0)
            ).alias(f"__le{i}")
        )
    wide = clean.groupBy(*group_cols).agg(*aggs)
    stack = ", ".join(
        f"{float(v)!r}D, __le{i}" for i, v in enumerate(at_values)
    )
    return (
        wide.selectExpr(
            *group_cols,
            "__n",
            f"stack({len(at_values)}, {stack}) AS (at_value, __le)",
        )
        .select(
            *group_cols,
            "at_value",
            F.expr("__le * 1000000 div __n").alias("rank_q"),
        )
        .orderBy(*group_cols, "at_value")
    )


def percentile_ranks_sql(
    src: str, group_cols: list[str], value_col: str, at_values: list[float]
) -> str:
    g = ", ".join(group_cols)
    arms = " UNION ALL ".join(
        f"SELECT {g}, CAST({float(v)!r} AS DOUBLE) AS at_value,"
        f" CAST(SUM(CASE WHEN {value_col} <= {float(v)!r} THEN 1 ELSE 0 END)"
        f" * 1000000 // COUNT(*) AS BIGINT) AS rank_q"
        f" FROM clean GROUP BY {g}"
        for v in at_values
    )
    return f"""
WITH clean AS (
  SELECT * FROM {src}
  WHERE {value_col} IS NOT NULL AND NOT isnan({value_col})
)
{arms}
ORDER BY {g}, at_value
"""


# --------------------------------------------------------------------------
# weighted_avg (exact)
# --------------------------------------------------------------------------
def weighted_avg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_expr: str,
) -> DataFrame:
    """(group..., n, wavg_q): ES ``weighted_avg`` — Σ(v·w)/Σ(w) per group,
    exact: both factors quantized to 1e-6 ints, the product summed in
    DECIMAL(38,0), one integral division at the end (result in value
    quanta). Docs with missing/NaN value are skipped (ES contract);
    ``value_col`` and ``weight_expr`` are any SQL expressions (ES
    ``value.missing`` / ``weight.missing`` handled by the expressions
    themselves — r14)."""
    v = F.expr(value_col)
    clean = df.where(
        v.isNotNull() & ~F.isnan(v)
    ).select(
        *group_cols,
        F.floor(v * F.lit(float(QUANT))).alias("__vq"),
        F.floor(F.expr(weight_expr) * F.lit(float(QUANT))).alias("__wq"),
    )
    return (
        clean.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(__vq AS DECIMAL(38,0)) * __wq")).alias("__num"),
            F.sum(F.col("__wq").cast("decimal(38,0)")).alias("__den"),
        )
        .select(
            *group_cols,
            "n",
            # floor (not truncate): a negative Σ(v·w) must round toward
            # −∞ to match the twin's `//` (weights are nonnegative per the
            # ES contract, so pmod's divisor is always positive)
            F.expr("CAST((__num - pmod(__num, __den)) div __den AS BIGINT)").alias("wavg_q"),
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def weighted_avg_sql(
    src: str, group_cols: list[str], value_col: str, weight_expr: str
) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH clean AS (
  SELECT {g},
         CAST(FLOOR(({value_col}) * {float(QUANT)}) AS BIGINT) AS vq,
         CAST(FLOOR(({weight_expr}) * {float(QUANT)}) AS BIGINT) AS wq
  FROM {src}
  WHERE ({value_col}) IS NOT NULL AND NOT isnan(({value_col}))
)
SELECT {g}, COUNT(*) AS n,
       -- exact FLOOR (DuckDB integer // truncates; weights nonnegative)
       CAST((SUM(CAST(vq AS HUGEINT) * wq)
             - ((SUM(CAST(vq AS HUGEINT) * wq) % SUM(CAST(wq AS HUGEINT))
                 + SUM(CAST(wq AS HUGEINT))) % SUM(CAST(wq AS HUGEINT))))
            // SUM(CAST(wq AS HUGEINT)) AS BIGINT) AS wavg_q
FROM clean GROUP BY {g} ORDER BY {g}
"""


# --------------------------------------------------------------------------
# top_metrics (argmax by sort field)
# --------------------------------------------------------------------------
def top_metrics(
    df: DataFrame,
    group_cols: list[str],
    sort_col: str,
    metric_cols: list[str],
    descending: bool = True,
) -> DataFrame:
    """(group..., sort_value, metrics...): ES ``top_metrics`` — per group,
    the metric columns of the row with the max (or min) sort value. One
    ``max(struct(...))`` hash aggregate: the argmax travels with the
    partial aggregation (map-side combinable), no window, no sort of the
    group's rows. Ties resolve by the metric tuple itself (documented —
    deterministic in both engines)."""
    key = F.col(sort_col) if descending else -F.col(sort_col)
    s = F.max(
        F.struct(
            key.alias("__k"),
            F.col(sort_col).alias("sort_value"),
            *[F.col(m) for m in metric_cols],
        )
    ).alias("__top")
    clean = df.where(F.col(sort_col).isNotNull() & ~F.isnan(sort_col))
    return (
        clean.groupBy(*group_cols)
        .agg(s)
        .select(
            *group_cols,
            F.col("__top.sort_value").alias("sort_value"),
            *[F.col(f"__top.{m}").alias(m) for m in metric_cols],
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def top_metrics_sql(
    src: str,
    group_cols: list[str],
    sort_col: str,
    metric_cols: list[str],
    descending: bool = True,
) -> str:
    g = ", ".join(group_cols)
    m = ", ".join(metric_cols)
    k = f"-{sort_col}" if not descending else sort_col
    # mirror the struct-max tie-break: order by (key, sort_value, metrics)
    tie = ", ".join(
        [f"{k} DESC", f"{sort_col} DESC"] + [f"{c} DESC" for c in metric_cols]
    )
    return f"""
WITH clean AS (
  SELECT * FROM {src}
  WHERE {sort_col} IS NOT NULL AND NOT isnan({sort_col})
),
r AS (
  SELECT {g}, {sort_col} AS sort_value, {m},
         ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {tie}) AS rn
  FROM clean
)
SELECT {g}, sort_value, {m} FROM r WHERE rn = 1 ORDER BY {g}
"""


# --------------------------------------------------------------------------
# matrix_stats (exact pairwise covariance / correlation)
# --------------------------------------------------------------------------
def matrix_stats(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., n, cov_q, corr_mq): ES ``matrix_stats`` for a field pair
    — population covariance and correlation, deterministic:

    - ``cov_q`` = (n·Σxy − Σx·Σy) div n² in 1e-12 quanta² (exact
      DECIMAL(38,0) arithmetic over 1e-6-quantized inputs);
    - ``corr_mq`` = covariance / (σx·σy) in 1e-6 units: numerator and
      radicands are EXACT DECIMAL(38,0) integers; the final step is one
      IEEE double divide+sqrt — bit-identical across engines because both
      round the same exact integers to the same doubles and apply the
      same IEEE ops; a zero denominator (constant column) yields NULL.

    Rows with either field missing/NaN are skipped pairwise (ES contract).
    """
    group_cols = group_cols or []
    x = F.col(x_col)
    y = F.col(y_col)
    clean = df.where(
        x.isNotNull() & ~F.isnan(x_col) & y.isNotNull() & ~F.isnan(y_col)
    ).select(
        *group_cols,
        F.floor(x * F.lit(float(QUANT))).alias("__x"),
        F.floor(y * F.lit(float(QUANT))).alias("__y"),
    )
    d38 = "CAST({} AS DECIMAL(38,0))"
    agg = clean.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("__y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr(d38.format("__x") + " * __y")).alias("sxy"),
        F.sum(F.expr(d38.format("__x") + " * __x")).alias("sxx"),
        F.sum(F.expr(d38.format("__y") + " * __y")).alias("syy"),
    )
    out = agg.select(
        *group_cols,
        "n",
        F.expr("CAST((n * sxy - sx * sy) div (CAST(n AS DECIMAL(38,0)) * n)"
               " AS BIGINT)").alias("cov_q"),
        F.expr(
            "CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
            "   * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0.0D)"
            " * 1000000.0D) AS BIGINT)"
        ).alias("corr_mq"),
    )
    return out.orderBy(*group_cols) if group_cols else out


def matrix_stats_multi(df: DataFrame, fields: list[str]) -> DataFrame:
    """(field_x, field_y, n, cov_q, corr_mq): the N-field ES
    ``matrix_stats`` (r10 — formerly the pairwise-only loud raise): the
    upper triangle (including the diagonal, where ``cov`` is the
    population variance and ``corr`` is 1) of the covariance/correlation
    matrix over the LISTWISE-clean subset — ES excludes a document
    missing ANY of the fields, unlike the pairwise operator's pairwise
    deletion. Same integer discipline as :func:`matrix_stats`.

    Scale shape: ONE aggregation pass computes every Σx_i and Σx_i·x_j
    (N(N+1)/2 + N + 1 exact DECIMAL(38,0) sums in the same partial/final
    agg); the matrix itself explodes from the single result row —
    result-sized, zero extra data passes for any N.
    """
    if len(fields) < 2:
        raise ValueError("matrix_stats_multi needs at least two fields")
    cond = None
    for f in fields:
        c = F.col(f).isNotNull() & ~F.isnan(f)
        cond = c if cond is None else (cond & c)
    clean = df.where(cond).select(
        *[
            F.floor(F.col(f) * F.lit(float(QUANT))).alias(f"__q{i}")
            for i, f in enumerate(fields)
        ]
    )
    d38 = "CAST(__q{} AS DECIMAL(38,0))"
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(fields)):
        aggs.append(F.sum(F.expr(d38.format(i))).alias(f"s{i}"))
        for j in range(i, len(fields)):
            aggs.append(
                F.sum(F.expr(d38.format(i) + f" * __q{j}")).alias(f"p{i}_{j}")
            )
    agg = clean.agg(*aggs)
    pair_rows = []
    for i, fx in enumerate(fields):
        for j in range(i, len(fields)):
            cov = (
                f"CAST((n * p{i}_{j} - s{i} * s{j})"
                f" div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
            )
            corr = (
                f"CAST(FLOOR(CAST(n * p{i}_{j} - s{i} * s{j} AS DOUBLE)"
                f" / NULLIF(SQRT(CAST(n * p{i}_{i} - s{i} * s{i} AS DOUBLE))"
                f"   * SQRT(CAST(n * p{j}_{j} - s{j} * s{j} AS DOUBLE)), 0.0D)"
                f" * 1000000.0D) AS BIGINT)"
            )
            pair_rows.append(
                f"named_struct('field_x', '{fx}', 'field_y', '{fields[j]}',"
                f" 'n', n, 'cov_q', {cov}, 'corr_mq', {corr})"
            )
    return (
        agg.select(
            F.explode(F.expr(f"array({', '.join(pair_rows)})")).alias("r")
        )
        .select("r.field_x", "r.field_y", "r.n", "r.cov_q", "r.corr_mq")
        .orderBy("field_x", "field_y")
    )


def matrix_stats_multi_sql(src: str, fields: list[str]) -> str:
    qs = ",\n         ".join(
        f"CAST(FLOOR({f} * {float(QUANT)}) AS BIGINT) AS q{i}"
        for i, f in enumerate(fields)
    )
    where = " AND ".join(
        f"{f} IS NOT NULL AND NOT isnan({f})" for f in fields
    )
    sums = ["COUNT(*) AS n"]
    for i in range(len(fields)):
        sums.append(f"SUM(CAST(q{i} AS HUGEINT)) AS s{i}")
        for j in range(i, len(fields)):
            sums.append(f"SUM(CAST(q{i} AS HUGEINT) * q{j}) AS p{i}_{j}")
    pair_sel = []
    for i, fx in enumerate(fields):
        for j in range(i, len(fields)):
            num = f"(n * p{i}_{j} - s{i} * s{j})"
            pair_sel.append(
                f"SELECT '{fx}' AS field_x, '{fields[j]}' AS field_y, n,\n"
                f"  CAST(CASE WHEN {num} < 0"
                f" THEN -((-{num}) // (CAST(n AS HUGEINT) * n))"
                f" ELSE {num} // (CAST(n AS HUGEINT) * n) END AS BIGINT)"
                f" AS cov_q,\n"
                f"  CAST(FLOOR(CAST({num} AS DOUBLE)"
                f" / NULLIF(SQRT(CAST(n * p{i}_{i} - s{i} * s{i} AS DOUBLE))"
                f"   * SQRT(CAST(n * p{j}_{j} - s{j} * s{j} AS DOUBLE)), 0.0)"
                f" * 1000000.0) AS BIGINT) AS corr_mq FROM agg"
            )
    u = "\nUNION ALL\n".join(pair_sel)
    return f"""
WITH clean AS (
  SELECT {qs}
  FROM {src}
  WHERE {where}
),
agg AS (SELECT {', '.join(sums)} FROM clean)
SELECT * FROM ({u}) ORDER BY field_x, field_y
"""


def matrix_stats_sql(
    src: str, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> str:
    group_cols = group_cols or []
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    gord = f"ORDER BY {g}" if g else ""
    return f"""
WITH clean AS (
  SELECT {gsel}
         CAST(FLOOR({x_col} * {float(QUANT)}) AS BIGINT) AS x,
         CAST(FLOOR({y_col} * {float(QUANT)}) AS BIGINT) AS y
  FROM {src}
  WHERE {x_col} IS NOT NULL AND NOT isnan({x_col})
    AND {y_col} IS NOT NULL AND NOT isnan({y_col})
),
agg AS (
  SELECT {gsel} COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM clean {gby}
)
SELECT {gsel} n,
       -- truncating (not flooring) division to mirror Spark's `div` on
       -- negative covariances
       CAST(CASE WHEN (n * sxy - sx * sy) < 0
                 THEN -((-(n * sxy - sx * sy)) // (CAST(n AS HUGEINT) * n))
                 ELSE (n * sxy - sx * sy) // (CAST(n AS HUGEINT) * n)
            END AS BIGINT) AS cov_q,
       CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
            / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
            * 1000000.0) AS BIGINT) AS corr_mq
FROM agg {gord}
"""
