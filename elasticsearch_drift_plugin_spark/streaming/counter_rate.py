"""Streaming TSDB counter-rate — the stateful twin of
``operators.es_aggs.time_series_counter_rate`` (ES 8.x ``time_series`` +
counter ``rate``), built on ``applyInPandasWithState``.

Per series (the TSDB dimension key, ES's ``_tsid``), group state holds the
running counter tail: ``(cum_vq, last_counter)``. Each micro-batch sorts its
rows by (t_ms, event_id), extends the synthesized counter (running quantized
sum modulo ``reset_mod`` — same construction as the batch twin), applies the
reset-aware increase rule (a counter lower than its predecessor restarted:
increase = new value, the Prometheus ``increase()`` convention), and emits
PER-BUCKET partial sums for the batch. A downstream result-sized
``groupBy(bucket).sum`` (done by the bounded-replay wrapper; a production
sink would do the same in its serving view) folds partials across batches.

Ordering contract: rows must arrive in event-time order ACROSS batches per
series (within a batch the kernel sorts). That is the same in-order-source
contract the flow-session twin documents; production fronts this with a
watermark/reorder stage. State is two longs per ACTIVE series — O(series),
not O(samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "cum_vq long, last_counter long"


def counter_rate_stream(
    events: DataFrame,
    dims: tuple[str, ...] = ("event_type",),
    bucket_ms: int = 86_400_000,
    reset_mod: int = 100_000,
) -> DataFrame:
    """Streaming DataFrame ``[dims…, bucket, n_samples, increase]`` (batch
    partials — sum across emissions per (dims, bucket) to finalize) for
    ``.writeStream.outputMode('update')``."""
    keys = list(dims)
    bw = int(bucket_ms)
    mod = int(reset_mod)
    key_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in events.select(*keys).dtypes
    )
    out_schema = f"{key_schema}, bucket long, n_samples long, increase long"

    base = events.where(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        *keys,
        F.col("t_ms"),
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )

    def fn(key, pdfs, state):
        import pandas as pd

        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(eid), int(v))
                for t, eid, v in zip(pdf["t_ms"], pdf["event_id"], pdf["vq"])
            )
        if state.hasTimedOut:  # no timeout configured; defensive no-op
            yield pd.DataFrame([], columns=[*keys, "bucket", "n_samples", "increase"])
            return
        cum, last = (tuple(state.get) if state.exists else (0, None))

        def trunc_mod(a: int) -> int:
            # Spark/DuckDB % is TRUNCATED remainder (sign of the dividend);
            # Python % floors — match the batch twin exactly for negative
            # cumulative sums (negative gauge values are legal input)
            return a % mod if a >= 0 else -((-a) % mod)

        buckets: dict[int, list[int]] = {}
        for t, _eid, vq in sorted(rows):
            cum = cum + vq
            counter = trunc_mod(cum)
            if last is None:
                inc = 0
            elif counter < last:
                inc = counter  # reset: increase since restart = new value
            else:
                inc = counter - last
            last = counter
            b = t - t % bw
            agg = buckets.setdefault(b, [0, 0])
            agg[0] += 1
            agg[1] += inc
        if rows:
            state.update((cum, last))
        out = [(*key, b, n, inc) for b, (n, inc) in sorted(buckets.items())]
        yield pd.DataFrame(out, columns=[*keys, "bucket", "n_samples", "increase"])

    return base.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def stream_time_series_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay of the streaming counter-rate over the events table,
    folded to final buckets — same DuckDB oracle as the batch
    ``es_time_series_rate``."""
    from ..sources.flows import load_table, ts_ms_col
    from .bounded import run_available_now

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
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
