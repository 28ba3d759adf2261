"""Streaming TSDB counter-rate — the stateful twin of
``operators.es_aggs.time_series_counter_rate`` (ES 8.x ``time_series`` +
counter ``rate``), built on ``applyInPandasWithState``.

Per series (the TSDB dimension key, ES's ``_tsid``), group state holds the
running counter tail: ``(cum_vq, last_counter, last_t, last_eid,
ooo_dropped)``. Each micro-batch sorts its rows by (t_ms, event_id), extends
the synthesized counter (running quantized sum modulo ``reset_mod`` — same
construction as the batch twin), applies the reset-aware increase rule (a
counter lower than its predecessor restarted: increase = new value, the
Prometheus ``increase()`` convention), and emits PER-BUCKET partial sums for
the batch. A downstream result-sized ``groupBy(bucket).sum`` (done by the
bounded-replay wrapper; a production sink would do the same in its serving
view) folds partials across batches.

Out-of-order contract: within a batch the kernel sorts, so any intra-batch
disorder is corrected. ACROSS batches, two defenses compose:

1. ``reorder_delay_ms > 0`` enables a per-series WATERMARK-STYLE TAIL
   BUFFER (the flow-sessions pattern): rows newer than ``max_t_seen -
   delay`` are held in state, and only the prefix at or below that
   per-series watermark is folded into the counter — so any sample no more
   than ``delay`` late is merged into its correct event-time position
   and processed exactly like an in-order arrival. Buffered tails flush
   on the next batch's watermark advance. Rows still inside the reorder
   horizon when the stream ends REMAIN BUFFERED (standard watermark
   semantics: with ``GroupStateTimeout.NoTimeout`` the state function is
   only invoked for groups with new input, so there is no drain-on-close;
   ``tests/test_streaming_recovery.py`` pins that a ``t+9000`` tail stays
   buffered at end-of-replay).
2. A sample at or before the state's last PROCESSED (t_ms, event_id) —
   i.e. later than the reorder horizon — cannot be replayed into the
   already-extended counter; silently folding it in would corrupt the
   increase (a huge bogus reset or delta). Such rows are DROPPED LOUDLY:
   the per-series state counts them (``ooo_dropped``) and every batch
   emission carries an ``n_late`` column per touched bucket, so a
   production monitor alerts the moment excess lateness appears instead
   of serving wrong rates.

The batch twin is unaffected (one batch = one sort). State is five longs
per ACTIVE series plus (with reordering) the ≤ delay-window tail arrays —
O(series · buffered-tail), bounded by the lateness horizon, never
O(samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = (
    "cum_vq long, last_counter long, last_t long, last_eid long, ooo_dropped long, "
    "buf_t array<long>, buf_eid array<long>, buf_vq array<long>"
)


def counter_rate_stream(
    events: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    bucket_ms: int = 86_400_000,
    reset_mod: int = 100_000,
    reorder_delay_ms: int = 0,
) -> DataFrame:
    """Streaming DataFrame ``[dims…, bucket, n_samples, increase, n_late]``
    (batch partials — sum across emissions per (dims, bucket) to finalize)
    for ``.writeStream.outputMode('update')``. ``n_late`` counts cross-batch
    out-of-order samples dropped in that bucket; ``reorder_delay_ms``
    buffers each series' tail so samples up to that late are re-ordered
    instead of dropped (see module docstring)."""
    keys = list(dims)
    bw = int(bucket_ms)
    mod = int(reset_mod)
    delay = int(reorder_delay_ms)
    key_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in events.select(*keys).dtypes
    )
    out_schema = f"{key_schema}, bucket long, n_samples long, increase long, n_late long"

    base = events.where(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        *keys,
        F.col("t_ms"),
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )

    cols = [*keys, "bucket", "n_samples", "increase", "n_late"]

    def fn(key, pdfs, state):
        import pandas as pd

        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(eid), int(v))
                for t, eid, v in zip(pdf["t_ms"], pdf["event_id"], pdf["vq"])
            )
        if state.hasTimedOut:  # no timeout configured; defensive no-op
            yield pd.DataFrame([], columns=cols)
            return
        if state.exists:
            cum, last, last_t, last_eid, ooo, bt, be, bv = tuple(state.get)
            buffered = list(zip(map(int, bt or ()), map(int, be or ()),
                                map(int, bv or ())))
        else:
            cum, last, last_t, last_eid, ooo = 0, None, None, None, 0
            buffered = []

        def trunc_mod(a: int) -> int:
            # Spark/DuckDB % is TRUNCATED remainder (sign of the dividend);
            # Python % floors — match the batch twin exactly for negative
            # cumulative sums (negative gauge values are legal input)
            return a % mod if a >= 0 else -((-a) % mod)

        merged = sorted(rows + buffered)
        tail: list[tuple[int, int, int]] = []
        if delay > 0 and merged:
            # per-series watermark: newest event time seen (processed tail
            # included — monotone because the buffer always retains the
            # batch max until it flushes) minus the lateness allowance
            wm = max(merged[-1][0], last_t if last_t is not None else merged[-1][0]) - delay
            process = [r for r in merged if r[0] <= wm]
            tail = [r for r in merged if r[0] > wm]
        else:
            process = merged

        buckets: dict[int, list[int]] = {}
        for t, eid, vq in process:
            b = t - t % bw
            agg = buckets.setdefault(b, [0, 0, 0])
            if last_t is not None and (t, eid) <= (last_t, last_eid):
                # cross-batch late arrival: the counter already advanced
                # past this timestamp — folding it in would corrupt the
                # increase. Drop loudly (state counter + per-bucket n_late).
                ooo += 1
                agg[2] += 1
                continue
            cum = cum + vq
            counter = trunc_mod(cum)
            if last is None:
                inc = 0
            elif counter < last:
                inc = counter  # reset: increase since restart = new value
            else:
                inc = counter - last
            last = counter
            last_t, last_eid = t, eid
            agg[0] += 1
            agg[1] += inc
        if rows or buffered:
            state.update((
                cum, last, last_t, last_eid, ooo,
                [r[0] for r in tail], [r[1] for r in tail], [r[2] for r in tail],
            ))
        out = [(*key, b, n, inc, nl) for b, (n, inc, nl) in sorted(buckets.items())]
        yield pd.DataFrame(out, columns=cols)

    return base.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def stream_time_series_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay of the streaming counter-rate over the events table,
    folded to final buckets — same DuckDB oracle as the batch
    ``es_time_series_rate`` (the replay is a single in-order pass, so the
    ``n_late`` channel stays zero and is not part of the graded shape)."""
    from ..sources.flows import load_table, ts_ms_col
    from .bounded import run_available_now

    schema = load_table(spark, sf_dir, "events").schema
    ev = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet*")
    # derive t_ms with the same dtype-branching rule as batch (the stream
    # schema mirrors the batch scan, so reuse the batch helper's dispatch)
    batch_like = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("t_ms", ts_ms_col(batch_like))
    partials = counter_rate_stream(ev)
    tbl = run_available_now(partials, "update")
    return (
        tbl.groupBy("event_type", "bucket")
        .agg(
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.sum("increase").cast("long").alias("increase"),
        )
        .orderBy("event_type", "bucket")
    )
