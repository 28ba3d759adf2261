"""Statistics operators (north-star extensions): exact grouped quantiles
and top-k-per-group ranking — the sibling-aggregation breadth the host ES
provides around the reference's operator (SURVEY.md §2.2), Spark-first.

Exact quantiles use Spark's ``percentile`` (sort-based, linear
interpolation), which is value-identical to DuckDB's ``quantile_cont``
(verified empirically — same interpolation formula); results are still
quantized (floor 1e-6) for hash safety. Top-k is a ranking window over a
deterministic integer score, ties broken by id.

Scale notes: exact percentile shuffles values by group key (unavoidable for
exact results); :func:`value_quantiles_approx` is the 100 TB path — same
plan shape but a mergeable GK sketch with map-side partial aggregation and
no full sort, rank error <= n/accuracy. Top-k per group is one window over
the scored table; with a pre-partition on the group key the sort is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.flows import load_table
from .text import quality_score

QUANT = 1_000_000
PCTS = (0.25, 0.5, 0.75, 0.95)


def value_quantiles(events: DataFrame, pcts=PCTS) -> DataFrame:
    """(event_type, pct, val_q): exact per-group quantiles of ``value``."""
    arr = ", ".join(str(p) for p in pcts)
    agg = events.groupBy("event_type").agg(
        F.expr(f"percentile(value, array({arr}))").alias("__qv")
    )
    pct_lits = F.array(*[F.lit(int(p * 100)) for p in pcts])
    return (
        agg.select("event_type", F.posexplode("__qv").alias("__i", "__v"))
        .select(
            "event_type",
            F.element_at(pct_lits, F.col("__i") + 1).cast("long").alias("pct"),
            F.floor(F.col("__v") * F.lit(float(QUANT))).alias("val_q"),
        )
        .orderBy("event_type", "pct")
    )


def quantiles_sql(pcts=PCTS) -> str:
    fracs = ", ".join(str(p) for p in pcts)
    labels = ", ".join(str(int(p * 100)) for p in pcts)
    return f"""
WITH q AS (
  SELECT event_type, quantile_cont(value, [{fracs}]) AS qv
  FROM events GROUP BY event_type
),
u AS (SELECT event_type, unnest([{labels}]) AS pct, unnest(qv) AS v FROM q)
SELECT event_type, CAST(pct AS BIGINT) AS pct,
       CAST(FLOOR(v * {float(QUANT)}) AS BIGINT) AS val_q
FROM u ORDER BY event_type, pct
"""


def value_quantiles_approx(
    events: DataFrame, pcts=PCTS, accuracy: int = 100_000
) -> DataFrame:
    """(event_type, pct, val_q): per-group quantiles via the mergeable
    Greenwald-Khanna sketch (``percentile_approx``) — the 100 TB path
    promised in SCALE.md, as a real code path.

    Error bound: rank error <= n/accuracy per group (the GK guarantee);
    the sketch is O(accuracy·log n) memory and merges associatively, so
    partial aggregation works map-side and no per-group sort happens —
    unlike exact ``percentile``, which shuffles and sorts every value.

    Oracle: when every group has <= ``accuracy`` rows the sketch holds all
    values and is rank-exact, returning the same dataset element as
    DuckDB's ``quantile_disc`` (verified empirically, n in {10..1001}) —
    so at oracle scale this hash-matches exactly while remaining the same
    code path you'd run at 100 TB with a smaller ``accuracy``.
    """
    arr = ", ".join(str(p) for p in pcts)
    agg = events.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, array({arr}), {int(accuracy)})").alias("__qv")
    )
    pct_lits = F.array(*[F.lit(int(p * 100)) for p in pcts])
    return (
        agg.select("event_type", F.posexplode("__qv").alias("__i", "__v"))
        .select(
            "event_type",
            F.element_at(pct_lits, F.col("__i") + 1).cast("long").alias("pct"),
            F.floor(F.col("__v") * F.lit(float(QUANT))).alias("val_q"),
        )
        .orderBy("event_type", "pct")
    )


def quantiles_approx_sql(pcts=PCTS) -> str:
    fracs = ", ".join(str(p) for p in pcts)
    labels = ", ".join(str(int(p * 100)) for p in pcts)
    return f"""
WITH q AS (
  SELECT event_type, quantile_disc(value, [{fracs}]) AS qv
  FROM events GROUP BY event_type
),
u AS (SELECT event_type, unnest([{labels}]) AS pct, unnest(qv) AS v FROM q)
SELECT event_type, CAST(pct AS BIGINT) AS pct,
       CAST(FLOOR(v * {float(QUANT)}) AS BIGINT) AS val_q
FROM u ORDER BY event_type, pct
"""


def top_docs_by_quality(docs: DataFrame, k: int = 5) -> DataFrame:
    """(source, rank, doc_id, score_q): best-scoring docs per source —
    ranking-window surface with a deterministic tie-break."""
    scored = quality_score(docs).join(docs.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(F.col("score_q").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("source", F.col("rank").cast("long").alias("rank"), "doc_id", "score_q")
        .orderBy("source", "rank")
    )


def top_docs_sql(quality_inner: str, k: int = 5) -> str:
    return f"""
WITH scored AS (
  SELECT q.doc_id, d.source, q.score_q
  FROM ({quality_inner}) q JOIN documents d ON d.doc_id = q.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY score_q DESC, doc_id) AS rank
  FROM scored
)
SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, score_q
FROM ranked WHERE rank <= {k} ORDER BY source, rank
"""


def queries() -> dict:
    return {
        "stats_quantiles": lambda s, d: value_quantiles(load_table(s, d, "events")),
        "stats_quantiles_approx": lambda s, d: value_quantiles_approx(
            load_table(s, d, "events")
        ),
        "stats_top_docs": lambda s, d: top_docs_by_quality(load_table(s, d, "documents")),
    }


def oracle_sql() -> dict:
    from .text import quality_sql

    return {
        "stats_quantiles": quantiles_sql(),
        "stats_quantiles_approx": quantiles_approx_sql(),
        "stats_top_docs": top_docs_sql(quality_sql()),
    }
