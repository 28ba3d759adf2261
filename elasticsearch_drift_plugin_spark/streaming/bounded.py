"""Bounded-replay equivalence: run the streaming operators over a FINITE
file source with ``Trigger.AvailableNow`` and return the final sink table —
proving the streaming paths compute the same answers as their batch twins
(and giving the driver's DuckDB gate a real streaming row to check).

Semantics of the replay:

- ``proportional_sum_stream`` runs in ``complete`` output mode, so the
  memory sink's final contents ARE the full aggregation — watermarking
  cannot drop anything and multi-batch arrival order is irrelevant. With
  ``quantize`` the values are bit-identical to the batch operator.
- ``flow_sessions_stream`` runs in ``update`` mode (required by
  ``applyInPandasWithState``); the sink accumulates one row per state
  emission, so the replay collapses them: per (key, session_start) keep the
  most-advanced emission (max ``n_flows``; the closed row wins ties), then
  re-derive the batch operator's 1-based ``session_id`` by start order.
  Sessions are disjoint per key (next start > previous end + gap), so
  (key, session_start) identifies a session across batches.

Scale note: the replay pattern itself is the production story for backfill
(stream code over historical files); the memory sink is only the test/gate
harness — production uses a Delta/parquet sink with the same dedup.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.geo import geotile_grid_sql
from ..operators.sessionize import sessionize_sql
from ..oracle import psum_oracle_sql
from ..sources.flows import (
    events_flows_duckdb_sql,
    events_flows_stream,
    load_table,
)
from .flow_sessions import flow_sessions_stream
from .proportional_sum_stream import proportional_sum_stream

HOUR = 3_600_000


#: Default shuffle-partition count for bounded replays. A stateful
#: streaming agg creates (and commits, per micro-batch) one state store per
#: shuffle partition; the replay tables are result-sized, so one store is
#: the floor (r15: minimal stateful replay 0.89 s at 2 partitions /
#: 0.70 s at 1). The env override is read at CALL time (ADVICE r14
#: item 4) so in-session A/B toggling works.
REPLAY_SHUFFLE_PARTITIONS = 1


def _replay_shuffle_partitions() -> int:
    return int(
        os.environ.get(
            "SPARK_GRAFT_REPLAY_SHUFFLE_PARTITIONS",
            str(REPLAY_SHUFFLE_PARTITIONS),
        )
    )

# spark.sql.shuffle.partitions is SESSION-global: two concurrent bounded
# replays could interleave set/restore and leave the session pinned at the
# replay value. The lock serializes replays (set → run → restore is atomic).
# A BATCH query planned on the same session while a replay holds the lock
# still sees the reduced value — the replay harness is single-session test
# gear; production streams own their session and conf.
_REPLAY_LOCK = threading.Lock()


def run_available_now(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion over its bounded source and
    return the memory-sink table (unique name per run; the query is awaited
    and stopped before returning).

    The replay pins a SMALL ``spark.sql.shuffle.partitions`` for the
    query's lifetime (restored after): a stateful streaming agg creates one
    state store per shuffle partition and commits each per micro-batch, so
    a bounded replay at session default (32) pays ~32 store
    open/commit/fsync cycles for a result-sized table — pure fixed cost,
    no parallelism won. Production long-lived streams size this to their
    real key cardinality via their own session conf; this knob only shapes
    the bounded test/gate harness (r14: measured floor of a minimal
    stateful replay 0.85 s at 8 partitions / 0.75 s at 2 — the remaining
    ~0.7 s is query start/commit/stop machinery, partition-count
    invariant; env-overridable for A/B).
    """
    spark = stream_df.sparkSession
    name = f"__bounded_{uuid.uuid4().hex[:12]}"
    # Ephemeral checkpoint on a RAM-backed dir when one exists (r14, guide
    # §1.2 fixed-cost audit): the offset/commit WALs and state-store deltas
    # fsync per micro-batch, and on a disk-backed default tmp dir those
    # fsyncs are ~0.3 s of the replay's ~1.3 s wall. The replay checkpoint
    # is test-gate state, discarded on return (a fresh UUID dir per run —
    # nothing persists across invocations); production streams own a
    # DURABLE checkpoint dir where the fsync cost is the exactly-once
    # guarantee and must stay.
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    ckpt = os.path.join(ckpt_base, f"ckpt_{name}")
    with _REPLAY_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_nodata = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled"
        )
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(_replay_shuffle_partitions())
        )
        # Skip the trailing NO-DATA micro-batch (r15, ~0.25 s/replay of
        # start/commit machinery): every replay operator emits its final
        # rows on DATA batches — complete-mode sinks are overwritten with
        # the full aggregation each batch, append sinks are stateless
        # map-only, and the sessionize replay runs without an idle timeout
        # (open sessions emit with open=true on the data batch; the
        # collapse step already folds them) — so an empty batch can never
        # add or change sink rows. Scoped to the bounded replay and
        # restored; production streams that use event-time timeouts or
        # watermark-closed emissions need no-data batches and keep the
        # session default.
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
        try:
            q = (
                stream_df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
            )
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def stream_psum_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proportional_sum_stream over a bounded replay of the events flows —
    same params as the batch ``psum_sampling`` query, complete-mode sink."""
    fl = events_flows_stream(spark, sf_dir)
    agg = proportional_sum_stream(
        fl, "start_ms", "end_ms", "value", "sampling",
        interval=6 * HOUR, offset=1, quantize=4,
    )
    tbl = run_available_now(agg, "complete")
    return tbl.select("key", "doc_count", "value").orderBy("key")


def stream_psum_day_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``psum_cal_day_tz``: local-midnight day buckets in
    America/New_York computed by the streaming operator over a bounded
    replay — tz rounding and the watermarkable aggregation compose."""
    fl = events_flows_stream(spark, sf_dir)
    agg = proportional_sum_stream(
        fl, "start_ms", "end_ms", "value", "sampling",
        calendar_interval="day", offset=1, time_zone="America/New_York",
        quantize=4,
    )
    tbl = run_available_now(agg, "complete")
    return tbl.select("key", "doc_count", "value").orderBy("key")


def stream_psum_fixed_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``psum_fixed_tz`` (r13): the zone-shifted FIXED
    grid over DURATION rows through the streaming operator — possible
    since explode_contributions converts local-grid edges to UTC-instant
    keys at the explode level (shared with batch, so the replay matches
    the batch oracle bit-for-bit)."""
    fl = events_flows_stream(spark, sf_dir)
    agg = proportional_sum_stream(
        fl, "start_ms", "end_ms", "value", "sampling",
        interval=6 * HOUR, offset=1, time_zone="America/New_York",
        quantize=4,
    )
    tbl = run_available_now(agg, "complete")
    return tbl.select("key", "doc_count", "value").orderBy("key")


def stream_flow_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flow_sessions_stream over a bounded replay, collapsed to the batch
    sessionize output shape (key…, session_id, session_start, session_end,
    n_flows, value)."""
    keys = ["event_type", "user_id"]
    fl = events_flows_stream(spark, sf_dir)
    agg = flow_sessions_stream(
        fl, keys, "start_ms", "end_ms", "value", gap_ms=HOUR, quantize=4
    )
    tbl = run_available_now(agg, "update")
    latest = Window.partitionBy(*keys, "session_start").orderBy(
        F.col("n_flows").desc(), F.col("open").asc()
    )
    sid = Window.partitionBy(*keys).orderBy("session_start")
    return (
        tbl.withColumn("__rn", F.row_number().over(latest))
        .where(F.col("__rn") == 1)
        .withColumn("session_id", F.row_number().over(sid).cast("long"))
        .select(*keys, "session_id", "session_start", "session_end", "n_flows", "value")
        .orderBy(*keys, "session_id")
    )


def stream_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ``es_geotile_grid`` as a streaming aggregation over a bounded
    replay of ``events`` — grid keys compute map-side, the count/sum state
    is an incrementally-maintained aggregate, and complete mode legalizes
    the final top-``size`` sort. Same oracle as the batch query."""
    from ..operators.geo import geo_events, geotile_grid

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    agg = geotile_grid(geo_events(ev))
    tbl = run_available_now(agg, "complete")
    return tbl.orderBy(F.col("doc_count").desc(), F.col("key").asc())


def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the batch ``exact_dedup`` aggregation (group
    by content digest, min-id survivor + group size) as a streaming
    aggregation over a bounded file replay of ``documents``.

    An ingest pipeline runs exactly this shape continuously: the digest
    groupBy is an incrementally-maintained state-store aggregate — new
    files only touch the digests they contain; ``complete`` mode here makes
    the memory sink the full table so the batch oracle applies verbatim.
    The shuffle key is the 16-byte digest, never document text, identical
    to the batch plan (operators/dedup.py::exact_dedup).
    """
    schema = load_table(spark, sf_dir, "documents").schema
    docs = spark.readStream.schema(schema).parquet(f"{sf_dir}/documents.parquet*")
    agg = (
        docs.groupBy(F.md5(F.col("text").cast("string")).alias("__digest"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
        .select("keep_id", "group_size")
    )
    tbl = run_available_now(agg, "complete")
    return tbl.orderBy("keep_id")


def stream_span_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming positional alerting (r13): the span-family predicate is
    ROW-LOCAL (a codegen HOF over the document's own tokens — no state,
    no join), so it composes with Structured Streaming unchanged: the
    batch `es_dsl_span_near` body filters the bounded `documents` replay
    map-side and only the per-source count is streaming state. This is
    the percolate shape for positional rules — a registered span query
    alerting on matching documents as files arrive. Shares the batch
    oracle verbatim (SPAN_NEAR_BODY)."""
    from ..functions.es_dsl import compile_query
    from ..operators.search import SPAN_NEAR_BODY

    schema = load_table(spark, sf_dir, "documents").schema
    docs = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/documents.parquet*"
    )
    agg = (
        docs.where(compile_query(SPAN_NEAR_BODY))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )
    tbl = run_available_now(agg, "complete")
    return tbl.orderBy("source")


def stream_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest (r13): the ES processor chain is a pure map-stage
    projection (functions/ingest.py), so it runs on a stream UNCHANGED —
    exactly how ES applies ingest pipelines at index time, document by
    document as they arrive. Only the downstream per-(type, tier) count
    is streaming state; shares the batch oracle verbatim."""
    from ..functions.ingest import run_ingest_pipeline
    from __spark_entry__ import ES_INGEST_PROCS

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    staged = run_ingest_pipeline(ev, ES_INGEST_PROCS)
    agg = staged.groupBy("etype_u", "tier").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"),
        F.sum("k").cast("long").alias("k_sum"),
    )
    tbl = run_available_now(agg, "complete")
    return tbl.orderBy("etype_u", "tier")


def stream_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming "new vs returning users" (r10): the batch
    ``cumulative_cardinality`` first-seen fold split at its natural
    streaming boundary — the STATEFUL half (per-id MIN hourly bucket) runs
    as an incrementally-maintained streaming aggregate whose state is ONE
    row per distinct id (never per event; at production scale a watermark
    + state TTL bounds the id horizon), and the result-sized halves
    (new-ids-per-bucket rollup + the running total) compute on the sink.
    Buckets where no NEW id appeared don't emit a row (the batch operator
    zero-fills from the full bucket spine; the streaming sink only sees
    first-arrival keys) — the oracle mirrors that contract."""
    from ..sources.flows import ts_ms_col

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    t = ts_ms_col(ev)
    hour = (t - F.pmod(t, F.lit(3_600_000))).alias("key")
    agg = (
        ev.where(F.col("ts").isNotNull())
        .select(hour, "user_id")
        .groupBy("user_id")
        .agg(F.min("key").alias("key"))
    )
    tbl = run_available_now(agg, "complete")
    firsts = tbl.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("new_ids")
    )
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    return firsts.select(
        "key", "new_ids", F.sum("new_ids").over(w).cast("long").alias("cum_new")
    ).orderBy("key")


STREAM_NEW_USERS_SQL = """
WITH ev AS (
  SELECT epoch_ms(ts) - ((epoch_ms(ts) % 3600000 + 3600000) % 3600000)
           AS key, user_id
  FROM events WHERE ts IS NOT NULL
),
firsts AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS new_ids
  FROM (SELECT user_id, MIN(key) AS key FROM ev GROUP BY user_id)
  GROUP BY key
)
SELECT key, new_ids,
       CAST(SUM(new_ids) OVER (ORDER BY key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_new
FROM firsts ORDER BY key
"""


def stream_zscore_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift DETECTOR: the trailing-window z-score runs over the
    streaming histogram's bounded replay — the continuous-anomaly shape
    (in production: foreachBatch over the update-mode sink, scoring each
    refreshed bucket against its trailing baseline)."""
    from ..operators.pipeline import zscore

    fl = events_flows_stream(spark, sf_dir)
    agg = proportional_sum_stream(
        fl, "start_ms", "end_ms", "value", "sampling",
        calendar_interval="day", offset=1, quantize=4,
    )
    tbl = run_available_now(agg, "complete")
    return zscore(tbl.select("key", "doc_count", "value"), group_by=())


def queries() -> dict:
    return {
        "stream_span_matches": stream_span_matches,
        "stream_ingest_pipeline": stream_ingest_pipeline,
        "stream_psum_6h": stream_psum_6h,
        "stream_zscore_day": stream_zscore_day,
        "stream_psum_day_tz": stream_psum_day_tz,
        "stream_psum_fixed_tz": stream_psum_fixed_tz,
        "stream_flow_sessions": stream_flow_sessions,
        "stream_dedup_exact": stream_dedup_exact,
        "stream_new_users": stream_new_users,
        "stream_geotile_grid": stream_geotile_grid,
        "stream_js_divergence": stream_js_divergence,
        "stream_percolate": stream_percolate,
        "stream_percolate_batch": stream_percolate_batch,
        "stream_vector_percolate": stream_vector_percolate,
        "stream_data_quality": stream_data_quality,
        "stream_time_series_rate": _stream_time_series_rate,
    }


def _stream_time_series_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .counter_rate import stream_time_series_rate

    return stream_time_series_rate(spark, sf_dir)


def _ingest_oracle() -> str:
    from __spark_entry__ import ES_INGEST_SQL

    return ES_INGEST_SQL


def _span_near_oracle() -> str:
    from ..operators.search import span_near_filter_agg_sql

    return span_near_filter_agg_sql()


def oracle_sql() -> dict:
    # Identical oracles to the batch twins: the whole point of the replay.
    psum = psum_oracle_sql(
        events_flows_duckdb_sql(""), quantize=4, interval=6 * HOUR, offset=1
    )
    from ..operators.dedup import EXACT_SQL

    from ..operators.pipeline import zscore_sql

    return {
        "stream_span_matches": _span_near_oracle(),
        "stream_ingest_pipeline": _ingest_oracle(),
        "stream_psum_6h": psum,
        "stream_zscore_day": zscore_sql(
            psum_oracle_sql(events_flows_duckdb_sql(""), quantize=4,
                            calendar_interval="day", offset=1),
            group_by=(),
        ),
        "stream_psum_day_tz": psum_oracle_sql(
            events_flows_duckdb_sql(""), quantize=4,
            calendar_interval="day", offset=1, time_zone="America/New_York",
        ),
        "stream_psum_fixed_tz": psum_oracle_sql(
            events_flows_duckdb_sql(""), quantize=4,
            interval=6 * HOUR, offset=1, time_zone="America/New_York",
        ),
        "stream_dedup_exact": EXACT_SQL,
        "stream_new_users": STREAM_NEW_USERS_SQL,
        "stream_geotile_grid": geotile_grid_sql(),
        "stream_data_quality": __import__(
            "elasticsearch_drift_plugin_spark.operators.quality", fromlist=["x"]
        ).check_expectations_sql(
            "events",
            [r for r in __import__(
                "elasticsearch_drift_plugin_spark.operators.quality", fromlist=["x"]
            ).EVENT_RULES if r["rule"] != "unique"],
            tolerance_q=20_000,
        ),
        "stream_percolate": __import__(
            "elasticsearch_drift_plugin_spark.operators.search", fromlist=["x"]
        ).percolate_sql(),
        "stream_percolate_batch": __import__(
            "elasticsearch_drift_plugin_spark.operators.search", fromlist=["x"]
        ).percolate_batch_sql(),
        "stream_vector_percolate": __import__(
            "elasticsearch_drift_plugin_spark.operators.similarity", fromlist=["x"]
        ).vector_percolate_sql(),
        "stream_js_divergence": __import__(
            "elasticsearch_drift_plugin_spark.operators.pipeline", fromlist=["x"]
        ).js_divergence_sql("events", "epoch_ms(ts)", "event_type", 86_400_000),
        "stream_time_series_rate": __import__(
            "elasticsearch_drift_plugin_spark.operators.es_aggs", fromlist=["x"]
        ).time_series_counter_rate_sql("epoch_ms(ts)"),
        "stream_flow_sessions": sessionize_sql(
            events_flows_duckdb_sql(""),
            ["event_type", "user_id"],
            gap_ms=HOUR,
            order_tiebreak=("flow_id",),
            quantize=4,
        ),
    }


def stream_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift: the (day, category) count table is the
    incrementally-maintained streaming aggregate (the ONLY corpus-sized
    stage); the Jensen–Shannon matrix math runs over its bounded-replay
    flush — in production, a foreachBatch hook scoring each refreshed day
    against its predecessor. Same oracle as batch ``pipe_js_divergence``."""
    from ..operators.pipeline import js_divergence_from_counts
    from ..sources.flows import ts_ms_sql

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    counts = ev.groupBy(
        F.expr(f"({ts_ms_sql(dict(ev.dtypes)['ts'], 'ts')}) div 86400000 * 86400000").alias("day"),
        F.col("event_type").alias("cat"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tbl = run_available_now(counts, "complete")
    # memory-sink views don't survive DeduplicateRelations in a self-join
    # (Spark 4.1 MemoryPlan keeps shared attribute ids); the count table is
    # result-sized, so an eager localCheckpoint is a cheap lineage break
    return js_divergence_from_counts(tbl.localCheckpoint(eager=True))


def stream_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``percolate`` — the watch/alerting shape the ES percolator
    exists for: every stored query evaluated continuously over the event
    stream as ONE incrementally-maintained conditional aggregate (complete
    mode legalizes the bounded-replay flush; production uses update mode +
    per-window keys and alerts on match-count deltas). Same oracle as the
    batch twin."""
    from ..operators.search import PERCOLATE_RULES, percolate_aggs, percolate_unpivot

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    tbl = run_available_now(ev.agg(*percolate_aggs(PERCOLATE_RULES)), "complete")
    return percolate_unpivot(tbl, PERCOLATE_RULES)


def stream_percolate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-document percolate (r14) — the alert-routing shape:
    each ARRIVING document is matched against the stored rule table and
    (doc_id, rule_id) rows append as they fire. The projection is the
    batch :func:`~..operators.search.percolate_batch` body verbatim
    (shared ``percolate_batch_matches`` — chunk-compiled, map-only,
    stateless), so the replay runs append mode with no state store and
    the twins cannot drift. Same oracle as the batch registration."""
    from ..operators.search import percolate_batch_matches

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    tbl = run_available_now(percolate_batch_matches(ev), "append")
    return tbl.orderBy("doc_id", "rule_id")


def stream_vector_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector percolate — continuous semantic alerting: stored
    watch vectors scored against every ARRIVING embedding, alert rows
    appended as they fire. The operator is STATELESS map-only (the batch
    twin's projection verbatim — shared code so the twins cannot drift),
    so the replay runs in append mode with no state store at all; a
    production stream writes the fired alerts straight to its sink."""
    from ..operators.similarity import vector_percolate

    schema = load_table(spark, sf_dir, "embeddings").schema
    emb = spark.readStream.schema(schema).parquet(f"{sf_dir}/embeddings.parquet*")
    fired = vector_percolate(emb, ordered=False)
    tbl = run_available_now(fired, "append")
    return tbl.orderBy("vec_id", "watch_id")


def stream_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality gate — the expectations suite running
    CONTINUOUSLY on the ingest stream (the production posture: reject or
    quarantine a batch whose rule metrics regress). Streaming aggregation
    cannot maintain count(DISTINCT ...), so the ``unique`` rule stays a
    batch/audit check and the stream evaluates the conditional-aggregate
    rules — the exact subset split a real deployment makes. Oracle: the
    batch twin over the same rules.
    """
    from ..operators.quality import EVENT_RULES, expectation_aggs, expectation_unpivot

    rules = [r for r in EVENT_RULES if r["rule"] != "unique"]
    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    tbl = run_available_now(ev.agg(*expectation_aggs(rules)), "complete")
    return expectation_unpivot(tbl, rules, tolerance_q=20_000)
