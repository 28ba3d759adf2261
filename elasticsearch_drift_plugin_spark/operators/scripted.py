"""ES ``scripted_metric`` aggregation: a generic map/combine/reduce harness.

The reference's host ES exposes ``scripted_metric`` (SURVEY.md §2.2) —
arbitrary Painless run per doc (``map_script``), folded per shard
(``combine_script``), merged on the coordinator (``reduce_script``). The
Spark-first translation keeps the same algebraic contract but stays fully
distributed at BOTH levels:

- ``map_script`` + ``combine_script`` ⇒ one Arrow-batched ``mapInPandas``
  pass emitting ONE partial-state row per (group × batch) — the per-shard
  fold, except a "shard" is an Arrow batch, so state never exceeds
  #groups·#batches rows and no executor holds raw docs;
- ``reduce_script`` ⇒ ``groupBy(group).applyInPandas`` over the partial
  states — the coordinator merge, except it shuffles only partial states
  (result-sized, not data-sized) and runs per group in parallel.

This is the ONLY sanctioned Python-eval escape hatch for aggregations:
anything expressible with built-in ``pyspark.sql.functions`` should use
them (JVM codegen beats Arrow round-trips; see es_aggs.py). The harness
exists for the genuinely-custom fold a migrating ``scripted_metric`` user
cannot write declaratively — and it REQUIRES the user's fold to be
commutative+associative over partials, exactly like ES requires of
``combine_script``/``reduce_script`` pairs.

Registered instance: per-group covariance between the quantized metric and
a derived integer weight — partial states are exact int64 sums
(n, Σx, Σy, Σxy), the final covariance is arbitrary-precision Python
integer floor-division (no overflow at any scale), and the DuckDB twin
reproduces it in HUGEINT with an explicit floor adjustment (`//` truncates
toward zero there — the r3 ADVICE lesson).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..sources.flows import load_table

QUANT = 1_000_000


def scripted_metric(
    df: DataFrame,
    group_cols: list[str],
    map_partial: Callable[[pd.DataFrame], pd.DataFrame],
    reduce_final: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    state_schema: str,
    out_schema: str,
) -> DataFrame:
    """Generic distributed map/combine/reduce (see module docstring).

    ``map_partial``: one Arrow batch of input rows → partial-state rows
    (must include ``group_cols``; one row per group present in the batch).
    ``reduce_final``: (group key, all partial states for it) → 1 result row.
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield map_partial(b)

    partials = df.mapInPandas(_map, schema=state_schema)
    return (
        partials.groupBy(*group_cols)
        .applyInPandas(reduce_final, schema=out_schema)
        .orderBy(*group_cols)
    )


# --------------------------------------------------------------------------
# registered instance: quantized covariance of (value, user_id % 1000)
# --------------------------------------------------------------------------
def _cov_map(b: pd.DataFrame) -> pd.DataFrame:
    ok = b["value"].notna()
    d = b[ok].copy()
    import numpy as np

    x = np.floor(d["value"].to_numpy(dtype="float64") * QUANT).astype("int64")
    y = (d["user_id"].to_numpy(dtype="int64") % 1000).astype("int64")
    g = pd.DataFrame({"event_type": d["event_type"], "x": x, "y": y, "xy": x * y})
    out = g.groupby("event_type", as_index=False).agg(
        n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"), sxy=("xy", "sum")
    )
    return out[["event_type", "n", "sx", "sy", "sxy"]]


def _cov_reduce(key: tuple, states: pd.DataFrame) -> pd.DataFrame:
    # Python ints: arbitrary precision, floor division — n·Σxy can exceed
    # int64 at full scale, so the merge leaves numpy on purpose
    n = int(states["n"].sum())
    sx = int(states["sx"].sum())
    sy = int(states["sy"].sum())
    sxy = int(states["sxy"].sum())
    cov_q = (n * sxy - sx * sy) // (n * n) if n else None
    return pd.DataFrame(
        {"event_type": [key[0]], "n": [n], "cov_q": [cov_q]}
    )


def cov_scripted(events: DataFrame) -> DataFrame:
    """(event_type, n, cov_q): the registered scripted_metric instance.
    NaN/NULL metric rows are skipped (ES metric-agg convention); x is the
    floor-1e-6-quantized value, y = user_id mod 1000."""
    src = events.where("value IS NOT NULL AND NOT isnan(value)").select(
        "event_type", "user_id", "value"
    )
    return scripted_metric(
        src,
        ["event_type"],
        _cov_map,
        _cov_reduce,
        "event_type string, n long, sx long, sy long, sxy long",
        "event_type string, n long, cov_q long",
    )


def cov_scripted_sql() -> str:
    # floor-division in HUGEINT: subtract the nonnegative remainder first
    # (DuckDB integer `//` truncates toward zero; covariance can be negative)
    num = "(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)"
    den = "(CAST(n AS HUGEINT) * n)"
    return f"""
WITH src AS (
  SELECT event_type,
         CAST(FLOOR(value * {QUANT}) AS BIGINT) AS x,
         user_id % 1000 AS y
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM src GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(({num} - (({num} % {den} + {den}) % {den})) // {den} AS BIGINT) AS cov_q
FROM agg ORDER BY event_type
"""


def queries() -> dict:
    return {
        "es_scripted_metric": lambda s, d: cov_scripted(load_table(s, d, "events")),
    }


def oracle_sql() -> dict:
    return {
        "es_scripted_metric": cov_scripted_sql(),
    }
