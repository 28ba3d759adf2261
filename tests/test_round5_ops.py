"""Round-5 operator tests: ES nested/reverse_nested over a hand-built
struct-array fixture (the actual nested mapping shape), and the parquet
footer-bounds path for auto_date_histogram."""

from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.operators.relational import (
    nested_agg,
    nested_parent_docs,
    reverse_nested_agg,
)


def _fixture(spark):
    # 3 parents; parent 3 has no urgent priority; nested terms overlap
    rows = [
        (1, "1-URGENT", [("A", 2.0, 10.0), ("B", 3.0, 20.0), ("A", 1.0, 5.0)]),
        (2, "1-URGENT", [("A", 4.0, 7.0)]),
        (3, "5-LOW", [("B", 9.0, 9.0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, items array<struct<"
        "l_returnflag string, l_quantity double, l_extendedprice double>>",
    )
    return df


def test_nested_agg_counts_nested_docs(spark):
    """ES contract: the nested agg's doc_count is the count of NESTED docs
    under matching parents, not parents."""
    got = {r.key: (r.n_items, r.qty1000) for r in nested_agg(_fixture(spark)).collect()}
    # parent 3 excluded by the parent-level filter
    assert got == {"A": (3, 7000), "B": (1, 3000)}


def test_reverse_nested_counts_parent_docs(spark):
    """ES contract: reverse_nested jumps back to the PARENT context —
    term 'A' appears in 3 nested docs but only 2 parents."""
    got = {
        r.key: (r.n_items, r.n_parents)
        for r in reverse_nested_agg(_fixture(spark)).collect()
    }
    assert got == {"A": (3, 2), "B": (1, 1)}


def test_nested_parent_docs_builds_mapping_shape(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW")],
        "o_orderkey long, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, "A", 2.0, 10.0), (1, "B", 3.0, 20.0), (2, "A", 4.0, 7.0)],
        "l_orderkey long, l_returnflag string, l_quantity double,"
        " l_extendedprice double",
    )
    built = nested_parent_docs(orders, lineitem)
    assert [f.name for f in built.schema] == ["o_orderkey", "o_orderpriority", "items"]
    by = {r.o_orderkey: sorted(it.l_returnflag for it in r["items"])
          for r in built.collect()}
    assert by == {1: ["A", "B"], 2: ["A"]}


def test_auto_histogram_bounds_hint_same_result(spark):
    """auto_date_histogram(bounds=...) must equal the scan-derived plan."""
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        auto_date_histogram,
    )

    df = spark.range(0, 500).select(
        (F.lit(1_700_000_000_000) + F.col("id") * 60_000).alias("t_ms"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    scan = auto_date_histogram(df, "t_ms", target_buckets=12, value_col="value")
    hint = auto_date_histogram(
        df, "t_ms", target_buckets=12, value_col="value",
        bounds=(1_700_000_000_000, 1_700_000_000_000 + 499 * 60_000),
    )
    assert scan.collect() == hint.collect()
