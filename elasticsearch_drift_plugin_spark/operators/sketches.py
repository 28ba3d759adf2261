"""Mergeable-sketch cardinality: ES ``cardinality`` (HLL) and the
pre-aggregated rollup pattern.

ES's cardinality agg is HyperLogLog++ precisely because per-shard sketches
merge on the coordinator without rescanning documents
(SURVEY.md §2.2 host surfaces — the reduce phase the reference rides on).
The Spark-native equivalent is Apache DataSketches HLL, built into Spark
≥ 3.5 as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``:
partial aggregation ships kilobyte sketches, never id sets, so a distinct
count over 100 TB moves O(groups × 2^lg_k) bytes through the shuffle.

The rollup pair below is the at-rest form of the same algebra — persist one
sketch per (bucket, group) and answer any time-range cardinality later by
unioning the stored sketches, no raw-data rescan. That is the pattern a
flow-retention pipeline runs: raw flows expire, daily sketches stay.

Estimates are engine-specific (DuckDB's HLL is a different implementation),
so the raw-estimate queries register WITHOUT an oracle twin — the driver
records the weaker rows-only check there. r14 adds oracle-PAIRED evidence
alongside: tolerance-verdict twins (``es_cardinality_tol``,
``stats_quantiles_kll_rank`` — the Spark side computes estimate AND truth
and emits a within-tolerance boolean; the oracle emits the truth grid with
constant TRUE, so estimator drift fails the driver hash) and the exact
sub-4096 theta mode (``es_theta_set_ops`` pairs against plain
COUNT(DISTINCT) set algebra). Numeric contracts are additionally pinned by
pytest invariants: determinism, merge consistency, relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.flows import load_table

LG_K = 12  # 2^12 registers ≈ 4 KB sketches, ~1.6% standard error


def cardinality_approx(
    df: DataFrame, group_cols: list[str], col: str, lg_k: int = LG_K
) -> DataFrame:
    """(group..., est): ES ``cardinality`` — approximate distinct count per
    group via one partial+final HLL aggregation (sketches merge map-side,
    the shuffle carries ~4 KB per group per partition)."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.expr(
                f"hll_sketch_estimate(hll_sketch_agg({col}, {int(lg_k)}))"
            ).alias("est")
        )
        .orderBy(*group_cols)
    )


def write_cardinality_rollup(
    df: DataFrame,
    path: str,
    time_ms_col: str,
    id_col: str,
    group_cols: list[str],
    bucket_ms: int = 86_400_000,
    lg_k: int = LG_K,
    mode: str = "overwrite",
) -> None:
    """Persist one HLL sketch per (bucket, group...) — the pre-aggregated
    rollup. Bucket-partitioned parquet, so a later range query prunes to
    the touched buckets at planning time."""
    key = (
        F.col(time_ms_col) - F.pmod(F.col(time_ms_col), F.lit(int(bucket_ms)))
    ).alias("bucket_ms")
    (
        df.select(key, *group_cols, F.col(id_col).alias("__id"))
        .groupBy("bucket_ms", *group_cols)
        .agg(F.expr(f"hll_sketch_agg(__id, {int(lg_k)})").alias("sketch"))
        .write.mode(mode)
        .partitionBy("bucket_ms")
        .parquet(path)
    )


def rollup_cardinality(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """(group..., est): distinct count over [start_ms, end_ms) answered
    purely from stored sketches — a union per group, zero raw-data scan,
    with the bucket range pruned as partition filters."""
    sk = spark.read.parquet(path)
    if start_ms is not None:
        sk = sk.where(F.col("bucket_ms") >= int(start_ms))
    if end_ms is not None:
        sk = sk.where(F.col("bucket_ms") < int(end_ms))
    return (
        sk.groupBy(*group_cols)
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("est"))
        .orderBy(*group_cols)
    )


def cardinality_intersect(
    df: DataFrame,
    id_col: str,
    where_a: str,
    where_b: str,
    lg_k: int = LG_K,
) -> DataFrame:
    """(est_a, est_b, est_union, est_intersect): approximate distinct-id
    overlap between two predicates via HLL inclusion–exclusion —
    ``|A∩B| ≈ |A| + |B| − |A∪B|`` (HLL unions are lossless over the same
    registers, so the subtraction is the standard estimator; error grows
    when the true intersection is small relative to the union — use exact
    countDistinct when that matters). ONE pass over the data building two
    conditional sketches; the union merges them without rescanning."""
    sk = df.select(
        F.expr(
            f"hll_sketch_agg(CASE WHEN {where_a} THEN {id_col} END, {int(lg_k)})"
        ).alias("ska"),
        F.expr(
            f"hll_sketch_agg(CASE WHEN {where_b} THEN {id_col} END, {int(lg_k)})"
        ).alias("skb"),
    )
    return sk.select(
        F.expr("hll_sketch_estimate(ska)").alias("est_a"),
        F.expr("hll_sketch_estimate(skb)").alias("est_b"),
        F.expr("hll_sketch_estimate(hll_union(ska, skb))").alias("est_union"),
        F.greatest(
            F.expr(
                "hll_sketch_estimate(ska) + hll_sketch_estimate(skb)"
                " - hll_sketch_estimate(hll_union(ska, skb))"
            ),
            F.lit(0),
        ).alias("est_intersect"),
    )


def theta_set_ops(
    df: DataFrame,
    id_col: str,
    where_a: str,
    where_b: str,
) -> DataFrame:
    """(est_a, est_b, est_union, est_intersect, est_a_minus_b): distinct-id
    set algebra between two predicates via Theta sketches — the estimator
    built FOR intersections/differences. Unlike the HLL
    inclusion–exclusion in :func:`cardinality_intersect` (error explodes
    when |A∩B| ≪ |A∪B|), a theta intersection operates on the retained
    sample directly, so small overlaps stay accurate. One pass builds two
    conditional sketches; all set ops are sketch-local (no rescan) —
    kilobytes through the shuffle at any scale."""
    sk = df.select(
        F.expr(f"theta_sketch_agg(CASE WHEN {where_a} THEN {id_col} END)").alias("ska"),
        F.expr(f"theta_sketch_agg(CASE WHEN {where_b} THEN {id_col} END)").alias("skb"),
    )
    return sk.select(
        F.expr("theta_sketch_estimate(ska)").cast("long").alias("est_a"),
        F.expr("theta_sketch_estimate(skb)").cast("long").alias("est_b"),
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").cast("long").alias("est_union"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").cast("long").alias("est_intersect"),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").cast("long").alias("est_a_minus_b"),
    )


def quantiles_sketch(
    df: DataFrame, group_cols: list[str], col: str, pcts=(0.25, 0.5, 0.75, 0.95),
    k: int = 200,
) -> DataFrame:
    """(group..., pct, est): approximate per-group quantiles via KLL
    sketches (DataSketches, Spark ≥ 4.0) — the MERGEABLE quantile
    estimator: per-partition sketches combine losslessly map-side, so the
    shuffle carries O(k·log n) bytes per group, never values. This is the
    100 TB swap for ``stats.value_quantiles`` (exact, sorts values per
    group) with a-priori rank error ~1.65/k·n; it is also the sketch the
    rollup-at-rest pattern persists (see write_quantile_rollup)."""
    agg = df.groupBy(*group_cols).agg(
        F.expr(f"kll_sketch_agg_double({col}, {int(k)})").alias("__sk")
    )
    return _serve_kll_quantiles(agg, group_cols, pcts)


def write_quantile_rollup(
    df: DataFrame,
    path: str,
    time_ms_col: str,
    value_col: str,
    group_cols: list[str],
    bucket_ms: int = 86_400_000,
    k: int = 200,
    mode: str = "overwrite",
) -> None:
    """Persist one KLL sketch per (day-bucket, group): the at-rest quantile
    rollup. Raw data can expire; any later time-range quantile query merges
    the stored sketches (``rollup_quantiles``) without a rescan — the same
    algebra as ``write_cardinality_rollup``, for percentiles."""
    day = (F.col(time_ms_col) - F.pmod(F.col(time_ms_col), F.lit(bucket_ms))).alias(
        "bucket_ms"
    )
    (
        df.select(day, *group_cols, F.col(value_col).cast("double").alias("__v"))
        .groupBy("bucket_ms", *group_cols)
        .agg(F.expr(f"kll_sketch_agg_double(__v, {int(k)})").alias("sketch"))
        .write.mode(mode)
        .partitionBy("bucket_ms")
        .parquet(path)
    )


def rollup_quantiles(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    pcts=(0.25, 0.5, 0.75, 0.95),
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Merge stored KLL sketches over a time range (partition-pruned scan)
    and serve quantile estimates per group."""
    df = spark.read.parquet(path)
    if start_ms is not None:
        df = df.where(F.col("bucket_ms") >= start_ms)
    if end_ms is not None:
        df = df.where(F.col("bucket_ms") < end_ms)
    merged = df.groupBy(*group_cols).agg(
        F.expr("kll_merge_agg_double(sketch)").alias("__sk")
    )
    return _serve_kll_quantiles(merged, group_cols, pcts)


def _serve_kll_quantiles(sk_df: DataFrame, group_cols: list[str], pcts) -> DataFrame:
    """Unpivot one quantile row per requested rank. The rank argument of
    ``kll_sketch_get_quantile_double`` must be FOLDABLE, so this emits one
    literal-rank expression per pct (a lambda over an array is rejected)."""
    ests = F.array(
        *[F.expr(f"kll_sketch_get_quantile_double(__sk, {float(p)!r})") for p in pcts]
    )
    pct_lits = F.array(*[F.lit(int(p * 100)) for p in pcts])
    return (
        sk_df.select(*group_cols, F.posexplode(ests).alias("__i", "est"))
        .select(
            *group_cols,
            F.element_at(pct_lits, F.col("__i") + 1).cast("long").alias("pct"),
            "est",
        )
        .orderBy(*group_cols, "pct")
    )


def cardinality_tolerance(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lg_k: int = LG_K,
    rel_tol: float = 0.05,
) -> DataFrame:
    """(group..., n_exact, ok): the HLL estimate checked against the exact
    distinct count in ONE query — ``ok`` is true when the estimate lands
    within ``rel_tol`` of truth. This is the oracle-PAIRABLE form of
    :func:`cardinality_approx` (estimates are engine-specific, so the raw
    ``est`` can't hash-pair with DuckDB; the tolerance VERDICT can — the
    oracle emits the exact count and a constant TRUE, so any estimator
    drift past the tolerance fails the driver hash). lg_k=12 is ~1.6%
    standard error; 5% is > 3 sigma. The exact side is the eval-scale
    cost (a real countDistinct) — this is an estimator-audit query, not
    the production path."""
    est = F.expr(f"hll_sketch_estimate(hll_sketch_agg({col}, {int(lg_k)}))")
    exact = F.countDistinct(F.col(col))
    return (
        df.groupBy(*group_cols)
        .agg(est.alias("__est"), exact.alias("__n"))
        .select(
            *group_cols,
            F.col("__n").cast("long").alias("n_exact"),
            (
                F.abs(F.col("__est") - F.col("__n"))
                <= F.lit(float(rel_tol)) * F.col("__n")
            ).alias("ok"),
        )
        .orderBy(*group_cols)
    )


CARDINALITY_TOL_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS ok
FROM events GROUP BY event_type ORDER BY event_type
"""


def quantiles_rank_check(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    pcts=(0.25, 0.5, 0.75, 0.95),
    k: int = 200,
    rank_tol: float = 0.05,
) -> DataFrame:
    """(group..., pct, ok): the KLL quantile estimates audited against
    their DEFINING property — the returned value's exact rank fraction
    must sit within ``rank_tol`` of the requested rank (KLL guarantees
    bounded RANK error, not value error, so this is the right invariant;
    k=200 is ~1.65% a-priori rank error, 5% is generous). With TIED
    values a single returned value occupies the whole rank interval
    ``[frac(v < est), frac(v <= est)]``, and a correct quantile only
    promises the requested rank lies near that interval — so the check
    accepts the interval (``frac_lt <= p + tol`` AND
    ``frac_le >= p - tol``), never the upper endpoint alone (a value
    holding 40% of the mass would otherwise flip ok on an exactly
    correct answer). Oracle-pairable: the oracle emits the (group, pct)
    grid with constant TRUE, so a sketch regression fails the driver
    hash. One broadcast join of the tiny quantile frame back over the
    corpus — an estimator-audit pass, linear in the data."""
    q = quantiles_sketch(df, group_cols, col, pcts, k)
    vals = df.select(*group_cols, F.col(col).cast("double").alias("__v"))
    lo = F.col("pct").cast("double") / 100.0 - F.lit(float(rank_tol))
    hi = F.col("pct").cast("double") / 100.0 + F.lit(float(rank_tol))
    frac_lt = F.avg((F.col("__v") < F.col("est")).cast("double"))
    frac_le = F.avg((F.col("__v") <= F.col("est")).cast("double"))
    return (
        q.join(vals, group_cols)
        .groupBy(*group_cols, "pct")
        .agg(frac_lt.alias("__lt"), frac_le.alias("__le"))
        .select(
            *group_cols,
            F.col("pct"),
            ((F.col("__lt") <= hi) & (F.col("__le") >= lo)).alias("ok"),
        )
        .orderBy(*group_cols, "pct")
    )


QUANTILES_RANK_SQL = """
SELECT event_type, CAST(p AS BIGINT) AS pct, TRUE AS ok
FROM (SELECT DISTINCT event_type FROM events),
     (SELECT unnest([25, 50, 75, 95]) AS p)
ORDER BY event_type, pct
"""


# Theta sketches retain up to their nominal 4096 entries before sampling
# kicks in — BELOW that they are EXACT, so over the testdata cohorts
# (150 distinct users at sf0.01, 1500 at sf0.1) the estimates equal the
# true counts and the set algebra IS oracle-pairable with plain
# COUNT(DISTINCT). At production cardinalities the same query returns
# estimates and the oracle no longer applies — the exactness condition
# is the documented contract, not an accident, and the REGISTERED query
# asserts it (theta_set_ops_exact below): past the guard the row fails
# with a message naming the scale limit instead of an opaque hash
# mismatch indistinguishable from a regression.
THETA_EXACT_GUARD = 3_000  # conservative margin under the 4096 nominal


def theta_set_ops_exact(
    df: DataFrame,
    id_col: str,
    where_a: str,
    where_b: str,
    max_union: int = THETA_EXACT_GUARD,
) -> DataFrame:
    """:func:`theta_set_ops` gated on its exact-mode precondition: the
    union cohort (the largest set) must stay safely under the sketch's
    nominal 4096 retained entries, else every column raises naming the
    scale limit. Production estimate use goes through the ungated
    :func:`theta_set_ops`; this form exists for the exact-oracle
    pairing."""
    out = theta_set_ops(df, id_col, where_a, where_b)
    guard = F.col("est_union") <= F.lit(int(max_union))
    err = F.raise_error(F.concat(
        F.lit("theta_set_ops_exact: union cohort ~"),
        F.col("est_union").cast("string"),
        F.lit(f" exceeds the exact-mode guard {max_union} (nominal 4096"
              " retained entries) — estimates are no longer exact; use"
              " theta_set_ops (estimate mode) and drop the exact oracle"),
    ))
    return out.select(*[
        F.when(guard, F.col(c)).otherwise(err.cast("long")).alias(c)
        for c in out.columns
    ])


THETA_SET_OPS_SQL = """
SELECT CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) AS BIGINT) AS est_a,
       CAST(COUNT(DISTINCT CASE WHEN user_id % 3 = 0 THEN user_id END) AS BIGINT) AS est_b,
       CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 OR user_id % 3 = 0 THEN user_id END) AS BIGINT) AS est_union,
       CAST(COUNT(DISTINCT CASE WHEN user_id % 6 = 0 THEN user_id END) AS BIGINT) AS est_intersect,
       CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 AND user_id % 3 <> 0 THEN user_id END) AS BIGINT) AS est_a_minus_b
FROM events
"""


def queries() -> dict:
    # es_cardinality_approx / stats_quantiles_kll stay rows-only (no
    # DuckDB oracle can reproduce DataSketches estimates); their *_tol /
    # *_rank twins ARE oracle-paired via tolerance verdicts, and
    # es_theta_set_ops pairs exactly in the sub-4096 exact mode (see
    # THETA_SET_OPS_SQL note). Numeric invariants also live in
    # tests/test_extensions.py.
    return {
        "es_cardinality_approx": lambda s, d: cardinality_approx(
            load_table(s, d, "events"), ["event_type"], "user_id"
        ),
        "es_cardinality_tol": lambda s, d: cardinality_tolerance(
            load_table(s, d, "events"), ["event_type"], "user_id"
        ),
        # modulo cohorts: |A∩B| = users ≡ 0 (mod 6) — a small true overlap,
        # exactly the regime where theta beats HLL inclusion–exclusion.
        # The _exact gate asserts the sub-4096 exact-mode precondition
        # the COUNT(DISTINCT) oracle pairing depends on.
        "es_theta_set_ops": lambda s, d: theta_set_ops_exact(
            load_table(s, d, "events"), "user_id",
            "user_id % 2 = 0", "user_id % 3 = 0",
        ),
        "stats_quantiles_kll": lambda s, d: quantiles_sketch(
            load_table(s, d, "events"), ["event_type"], "value"
        ),
        "stats_quantiles_kll_rank": lambda s, d: quantiles_rank_check(
            load_table(s, d, "events"), ["event_type"], "value"
        ),
    }


def oracle_sql() -> dict:
    return {
        "es_cardinality_tol": CARDINALITY_TOL_SQL,
        "es_theta_set_ops": THETA_SET_OPS_SQL,
        "stats_quantiles_kll_rank": QUANTILES_RANK_SQL,
    }
