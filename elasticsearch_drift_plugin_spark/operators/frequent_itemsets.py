"""ES ``frequent_item_sets`` aggregation, Spark-first.

The host-ES surface (SURVEY.md §2.2): ES 8.x ships a
``frequent_item_sets`` bucket agg (market-basket analysis over multi-value
docs). Here a "basket" is a (user_id, utc-day) pair and the items are the
distinct ``event_type`` values the user produced that day — the natural
events-table transliteration of the ES docs' own retail example.

Semantics implemented (public ES contract, documented deltas):

- itemsets of size ``min_set_size..max_set_size`` with support (number of
  baskets containing ALL items) >= ``min_support``;
- ranked by support desc, then set size desc, then the joined key asc —
  ES's ECLAT ranking is support-first too; ties there are unspecified, so
  the key tie-break pins determinism;
- delta: ES returns only *closed* frequent sets (it drops a set when a
  superset has identical support); this returns every frequent set —
  "all frequent sets" is what downstream co-occurrence analyses want, and
  the closed subset is recoverable with one anti-join over the output.

Scale shape (distributed Apriori, levels 1-3):

1. basket build: one ``distinct`` over (basket, item) — a single shuffle
   whose width is bounded by #distinct pairs, not #events;
2. level-1 prune: frequent singletons are aggregated map-side and
   BROADCAST back as a semi-join filter, so infrequent items never enter
   the quadratic stage (the classic Apriori anti-monotonicity cut);
3. level-2/3: each basket's (pruned, sorted) item array is assembled ONCE
   (one groupBy) and the C(k,2)/C(k,3) combinations are generated
   MAP-SIDE with JVM higher-order functions (nested ``transform`` over
   ``slice``) — no basket-keyed self-joins, so the input is scanned once
   and the only shuffles are the distinct, the two aggregations, and the
   serving sort. (A first cut used 3-way self-joins on the basket id:
   same answer, 17 shuffles and a 5× re-scan of the source — the plan
   audit caught it.) Per-basket fan-out is C(k, 2) + C(k, 3) with
   k = items/basket after the level-1 cut, the quantity a 100 TB run
   controls via ``min_support``.

Everything is exact integer counting — no floats anywhere, hash-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.flows import load_table, ts_ms_sql

DAY_MS = 86_400_000


def event_baskets(events: DataFrame) -> DataFrame:
    """(basket, item): distinct (user_id × utc-day, event_type) pairs."""
    # exact integer day index (epoch-ms nonnegative, truncate == floor); the
    # DuckDB twin uses `//` — never float-divide-then-cast, the engines
    # round double->int differently (Spark truncates, DuckDB round-nearest)
    day = F.expr(f"({ts_ms_sql(dict(events.dtypes)['ts'], 'ts')}) div {DAY_MS}")
    return (
        events.select(
            F.concat_ws("#", F.col("user_id").cast("string"), day.cast("string"))
            .alias("basket"),
            F.col("event_type").alias("item"),
        )
        .distinct()
    )


def frequent_item_sets(
    baskets: DataFrame,
    min_support: int = 2,
    min_set_size: int = 2,
    max_set_size: int = 3,
    size: int = 50,
) -> DataFrame:
    """(items, set_size, support): frequent itemsets over (basket, item).

    ``baskets`` must be distinct (basket, item) pairs — ``event_baskets``
    produces that shape. ``items`` is the "a+b+c" sorted join of the set.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if not 1 <= min_set_size <= max_set_size <= 3:
        raise ValueError("set sizes must satisfy 1 <= min <= max <= 3")

    # one basket = one sorted item array FIRST (r14): collect_set dedups,
    # so the basket arrays build straight off the raw pairs with ONE
    # basket-keyed exchange, and every downstream step derives from it —
    # the source is scanned once (the former shape scanned it once per
    # branch: a (basket, item)-distinct exchange for the level-1 counts
    # PLUS this collect_set exchange on the semi-join-pruned pairs).
    arrs_all = baskets.groupBy("basket").agg(
        F.array_sort(F.collect_set("item")).alias("its")
    )

    # level 1: frequent singletons, derived from the SAME exchange (the
    # exploded arrays are exactly the distinct pairs); the Apriori cut
    # becomes a map-side array_intersect against the (tiny, bounded by
    # the item vocabulary) frequent-item array instead of a semi-join +
    # second collect_set pass.
    f1 = (
        arrs_all.select(F.explode("its").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    f1_arr = f1.agg(F.array_sort(F.collect_list("item")).alias("__f1"))

    levels = []
    if min_set_size <= 1:
        levels.append(f1.select(F.col("item").alias("items"),
                                F.lit(1).alias("set_size"), "support"))

    # combinations generated map-side (JVM HOFs, zero extra shuffles).
    # `slice` truncates past the end, so the tail windows need no bounds
    # arithmetic. array_intersect keeps the left (sorted) order.
    arrs = arrs_all.join(F.broadcast(f1_arr)).select(
        "basket", F.array_intersect(F.col("its"), F.col("__f1")).alias("its")
    )
    n = F.size("its")
    rest = lambda i: F.slice(F.col("its"), i + 2, n)  # items after index i
    combo_cols = []
    if min_set_size <= 2 <= max_set_size:
        pair_arr = F.flatten(
            F.transform(
                F.col("its"),
                lambda x, i: F.transform(
                    rest(i), lambda y: F.concat_ws("+", x, y)
                ),
            )
        )
        combo_cols.append(
            F.transform(pair_arr, lambda s: F.struct(s.alias("items"),
                                                     F.lit(2).alias("set_size")))
        )
    if max_set_size >= 3:
        triple_arr = F.flatten(
            F.transform(
                F.col("its"),
                lambda x, i: F.flatten(
                    F.transform(
                        rest(i),
                        lambda y, j: F.transform(
                            F.slice(rest(i), j + 2, n),
                            lambda z: F.concat_ws("+", x, y, z),
                        ),
                    )
                ),
            )
        )
        combo_cols.append(
            F.transform(triple_arr, lambda s: F.struct(s.alias("items"),
                                                       F.lit(3).alias("set_size")))
        )
    if combo_cols:
        combos = combo_cols[0]
        for c in combo_cols[1:]:
            combos = F.concat(combos, c)
        counted = (
            arrs.select(F.explode(combos).alias("c"))
            .groupBy(F.col("c.items").alias("items"),
                     F.col("c.set_size").alias("set_size"))
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= min_support)
            .select("items", "set_size", "support")
        )
        levels.append(counted)

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.orderBy(F.col("support").desc(), F.col("set_size").desc(),
                    F.col("items").asc())
        .limit(size)
    )


BASKETS_DUCK = f"""
SELECT DISTINCT CAST(user_id AS VARCHAR) || '#' ||
       CAST(epoch_ms(ts) // {DAY_MS} AS VARCHAR) AS basket,
       event_type AS item
FROM events
"""


def frequent_item_sets_sql(
    min_support: int = 2,
    min_set_size: int = 2,
    max_set_size: int = 3,
    size: int = 50,
) -> str:
    parts = []
    if min_set_size <= 1:
        parts.append(
            "SELECT item AS items, 1 AS set_size, support FROM f1"
        )
    if min_set_size <= 2 <= max_set_size:
        parts.append(f"""
SELECT a.item || '+' || b.item AS items, 2 AS set_size, COUNT(*) AS support
FROM bf a JOIN bf b ON a.basket = b.basket AND a.item < b.item
GROUP BY 1 HAVING COUNT(*) >= {min_support}""")
    if max_set_size >= 3:
        parts.append(f"""
SELECT a.item || '+' || b.item || '+' || c.item AS items, 3 AS set_size,
       COUNT(*) AS support
FROM bf a JOIN bf b ON a.basket = b.basket AND a.item < b.item
          JOIN bf c ON a.basket = c.basket AND b.item < c.item
GROUP BY 1 HAVING COUNT(*) >= {min_support}""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH baskets AS ({BASKETS_DUCK}),
f1 AS (
  SELECT item, COUNT(*) AS support FROM baskets
  GROUP BY item HAVING COUNT(*) >= {min_support}
),
bf AS (SELECT b.* FROM baskets b WHERE b.item IN (SELECT item FROM f1)),
sets AS ({union})
SELECT items, set_size, CAST(support AS BIGINT) AS support
FROM sets
ORDER BY support DESC, set_size DESC, items ASC
LIMIT {size}
"""


def queries() -> dict:
    return {
        "es_frequent_item_sets": lambda s, d: frequent_item_sets(
            event_baskets(load_table(s, d, "events")), min_support=5
        ),
    }


def oracle_sql() -> dict:
    return {
        "es_frequent_item_sets": frequent_item_sets_sql(min_support=5),
    }
