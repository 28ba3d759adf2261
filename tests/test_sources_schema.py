"""Unit tests for the driver-owned-schema defenses in sources.flows.

Round-2 postmortem: the driver regenerated ``events.ts`` with a different
parquet physical type (INT64 TIMESTAMP(NANOS) -> timestamp[us]) and a
hardcoded conversion took down 28 externally-graded queries at analysis
time. These pin the two defenses that replaced it: dtype-branched epoch-ms
conversion and the load-time schema assertion.
"""

from __future__ import annotations

import pytest

from elasticsearch_drift_plugin_spark.sources import flows


def test_ts_ms_sql_bigint_is_exact_integer_div():
    # epoch-ns exceeds 2^53: the expression must be integer `div`, never
    # float division
    assert flows.ts_ms_sql("bigint") == "(ts div 1000000)"


@pytest.mark.parametrize("dtype", ["timestamp", "timestamp_ntz", "date"])
def test_ts_ms_sql_timestampish_uses_unix_millis(dtype):
    expr = flows.ts_ms_sql(dtype, "ts")
    assert expr == "unix_millis(CAST(ts AS TIMESTAMP))"


def test_ts_ms_sql_rejects_unknown_dtype():
    with pytest.raises(TypeError, match="string"):
        flows.ts_ms_sql("string")


def test_ts_ms_sql_custom_column_name():
    assert flows.ts_ms_sql("bigint", "t0") == "(t0 div 1000000)"


def test_check_schema_accepts_current_testdata(spark):
    # every expected table at the smallest SF loads without raising
    for name in flows._EXPECTED_COLS:
        flows.load_table(spark, "/root/testdata/sf0.001", name)


def test_check_schema_rejects_wrong_dtype(spark):
    bad = spark.createDataFrame(
        [(1, "oops", 2, "t", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    with pytest.raises(TypeError, match="column 'ts' has dtype 'string'"):
        flows._check_schema("events", bad)


def test_check_schema_rejects_missing_column(spark):
    bad = spark.createDataFrame([(1,)], "event_id long")
    with pytest.raises(TypeError, match="missing expected column"):
        flows._check_schema("events", bad)


def test_ts_ms_col_matches_duckdb_epoch_ms(spark):
    """Engine-equality: ts_ms_col over the real events table must equal
    DuckDB's epoch_ms(ts) row-for-row (the oracle-side conversion)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = flows.load_table(spark, sf, "events")
    got = {
        r["event_id"]: r["ms"]
        for r in ev.select("event_id", flows.ts_ms_col(ev).alias("ms")).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, epoch_ms(ts) FROM read_parquet('{sf}/events.parquet')"
        ).fetchall()
    )
    assert got == want


def test_parquet_footer_bounds_match_aggregated_minmax(spark):
    """The metadata-only span (parquet footer stats) must equal the scanned
    min/max of the derived epoch-ms column — guards the footer→ms
    conversion against driver testdata physical-type changes."""
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.sources.flows import (
        load_table,
        parquet_ts_bounds_ms,
        ts_ms_col,
    )

    sf = "/root/testdata/sf0.001"
    got = parquet_ts_bounds_ms(sf, "events", "ts")
    assert got is not None
    events = load_table(spark, sf, "events")
    ev = events.select(ts_ms_col(events, "ts").alias("t"))
    row = ev.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).first()
    assert got == (row.lo, row.hi)
