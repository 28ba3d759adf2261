"""Data-quality expectations: declarative rule checks evaluated in ONE
aggregation pass — the Great-Expectations/dbt-test surface a production
flow pipeline runs before letting a batch into the lake (and before the
reference's operator ever sees it: a NaN-heavy or clock-skewed batch makes
every downstream histogram silently wrong).

Spark-first shape: every rule compiles to a conditional aggregate over the
same scan, so N rules cost one job, one partial+final agg, zero extra
shuffles (uniqueness adds the one ``count(DISTINCT ...)`` expand the
engine plans for it). The per-rule outputs are exact integer counts plus a
floored 1e-6 fraction, so the table hash-matches the DuckDB twin.

Rules implemented (each a row in the output):

- ``not_null``: NULL count for a column (NaN counts as present-but-NaN —
  use ``valid_number`` for the numeric gate);
- ``valid_number``: rows where a numeric column is NULL or NaN;
- ``in_range``: rows outside ``[lo, hi]`` (NULL/NaN excluded from the
  violation count — they are the other rules' job);
- ``in_set``: rows whose value is outside an allowed literal set;
- ``unique``: duplicate count (rows − distinct values) over a key column.

Each row reports ``(rule, col, n_bad, frac_bad_q, passed)`` with
``passed ⇔ frac_bad ≤ tolerance`` (integer-exact comparison:
``n_bad · 1e6 ≤ tol_q · n_rows``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def _bad_expr(rule: dict) -> str:
    kind, col = rule["rule"], rule["col"]
    if kind == "not_null":
        return f"CAST({col} IS NULL AS INT)"
    if kind == "valid_number":
        return f"CAST({col} IS NULL OR isnan({col}) AS INT)"
    if kind == "in_range":
        lo, hi = rule["lo"], rule["hi"]
        return (
            f"CAST({col} IS NOT NULL AND NOT isnan(CAST({col} AS DOUBLE))"
            f" AND ({col} < {lo} OR {col} > {hi}) AS INT)"
        )
    if kind == "in_set":
        vals = ", ".join(f"'{v}'" for v in rule["allowed"])
        return f"CAST({col} IS NOT NULL AND {col} NOT IN ({vals}) AS INT)"
    raise ValueError(f"unknown rule {kind!r}")


def check_expectations(
    df: DataFrame, rules: list[dict], tolerance_q: int = 0
) -> DataFrame:
    """(rule, col, n_rows, n_bad, frac_bad_q, passed): evaluate every rule
    in one aggregation pass over ``df``. ``unique`` rules ride the same
    pass via ``count`` − ``count(DISTINCT)``."""
    return expectation_unpivot(df.agg(*expectation_aggs(rules)), rules, tolerance_q)


def expectation_aggs(rules: list[dict]) -> list:
    """The one-pass conditional-aggregate list — SHARED by the batch
    operator and ``streaming.bounded.stream_data_quality`` so the twins
    cannot drift (streaming callers pre-filter out ``unique`` rules, which
    need ``count(DISTINCT)`` and are batch/audit-only)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, r in enumerate(rules):
        if r["rule"] == "unique":
            aggs.append(
                (F.count(r["col"]) - F.countDistinct(r["col"]))
                .cast("long")
                .alias(f"__b{i}")
            )
        else:
            aggs.append(F.sum(F.expr(_bad_expr(r))).cast("long").alias(f"__b{i}"))
    return aggs


def expectation_unpivot(
    row: DataFrame, rules: list[dict], tolerance_q: int = 0
) -> DataFrame:
    """Unpivot the single agg row into the per-rule report — shared with
    the streaming twin (see ``expectation_aggs``)."""
    out = None
    for i, r in enumerate(rules):
        one = row.select(
            F.lit(r["rule"]).alias("rule"),
            F.lit(r["col"]).alias("col"),
            F.col("__n").alias("n_rows"),
            F.col(f"__b{i}").alias("n_bad"),
            F.expr(
                f"CASE WHEN __n > 0 THEN CAST(FLOOR(CAST(__b{i} AS DOUBLE)"
                f" / __n * {float(QUANT)}) AS BIGINT) ELSE 0 END"
            ).alias("frac_bad_q"),
            # integer-exact tolerance test: frac_bad <= tol  <=>  n_bad*1e6 <= tol_q*n
            F.expr(f"__b{i} * {QUANT} <= {int(tolerance_q)} * __n").alias("passed"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("rule", "col")


def check_expectations_sql(
    table: str, rules: list[dict], tolerance_q: int = 0
) -> str:
    selects = ["COUNT(*) AS __n"]
    for i, r in enumerate(rules):
        if r["rule"] == "unique":
            selects.append(
                f"COUNT({r['col']}) - COUNT(DISTINCT {r['col']}) AS __b{i}"
            )
        else:
            selects.append(f"SUM({_bad_expr(r)}) AS __b{i}")
    rows = []
    for i, r in enumerate(rules):
        rows.append(
            f"SELECT '{r['rule']}' AS rule, '{r['col']}' AS col,"
            f" CAST(__n AS BIGINT) AS n_rows, CAST(__b{i} AS BIGINT) AS n_bad,"
            f" CASE WHEN __n > 0 THEN CAST(FLOOR(CAST(__b{i} AS DOUBLE) / __n"
            f" * {float(QUANT)}) AS BIGINT) ELSE 0 END AS frac_bad_q,"
            f" __b{i} * {QUANT} <= {int(tolerance_q)} * __n AS passed"
            f" FROM agg"
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH agg AS (SELECT {', '.join(selects)} FROM {table})
SELECT * FROM ({union}) ORDER BY rule, col
"""


EVENT_RULES = [
    {"rule": "unique", "col": "event_id"},
    {"rule": "not_null", "col": "user_id"},
    {"rule": "valid_number", "col": "value"},
    {"rule": "in_range", "col": "value", "lo": 0, "hi": 10_000},
    {"rule": "in_set", "col": "event_type",
     "allowed": ["click", "view", "purchase", "error", "signup"]},
]


def queries() -> dict:
    from ..sources.flows import load_table

    return {
        "rel_data_quality": lambda s, d: check_expectations(
            load_table(s, d, "events"), EVENT_RULES, tolerance_q=20_000
        ),
    }


def oracle_sql() -> dict:
    return {
        "rel_data_quality": check_expectations_sql(
            "events", EVENT_RULES, tolerance_q=20_000
        ),
    }
