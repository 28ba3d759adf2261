"""Round-6 streaming evidence: (1) checkpoint recovery — a stateful query
killed mid-stream and restarted from its checkpoint resumes with the exact
per-series state, so the final answer equals the uninterrupted run; (2) the
cross-batch out-of-order guard — a late sample is dropped LOUDLY (per-bucket
``n_late`` + state counter) instead of silently corrupting the increase."""

import pyspark.sql.functions as F

SCHEMA = "event_id long, event_type string, t_ms long, value double"
DAY = 1_704_067_200_000  # 2024-01-01 UTC


def _fold(rows):
    """Sum the update-mode partials to final (bucket -> n, inc, late)."""
    out = {}
    for r in rows:
        n, inc, late = out.get(r.bucket, (0, 0, 0))
        out[r.bucket] = (n + r.n_samples, inc + r.increase, late + r.n_late)
    return out


def _run_batches(spark, src, ckpt, name, batches, stop_between=False,
                 reorder_delay_ms=0):
    """Write each batch to the file source and drain it; if stop_between,
    kill the query after every batch and restart from the checkpoint. The
    sink is foreachBatch → parquet append (the memory sink refuses
    checkpoint recovery; foreachBatch is the production recoverable
    shape — Spark replays only uncommitted batch ids)."""
    from elasticsearch_drift_plugin_spark.streaming.counter_rate import (
        counter_rate_stream,
    )

    out_dir = f"{src}_out"

    def sink(batch_df, _batch_id):
        batch_df.coalesce(1).write.mode("append").parquet(out_dir)

    def start():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = counter_rate_stream(stream, dims=("event_type",), reset_mod=10,
                                  reorder_delay_ms=reorder_delay_ms)
        return (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = None
    try:
        for batch in batches:
            spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            if q is None:
                q = start()
            q.processAllAvailable()
            if stop_between:
                q.stop()
                q = None
        if q is not None:
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    return spark.read.parquet(out_dir).collect()


def test_checkpoint_recovery_equals_uninterrupted_run(spark, tmp_path):
    """Kill the stateful query after batch 1, restart from the checkpoint,
    feed batch 2: the restarted query must apply batch 2 against batch 1's
    recovered counter tail — final fold identical to the never-stopped run
    (which itself is pinned: the cross-batch reset only computes correctly
    if (cum_vq, last_counter) survived the restart)."""
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 2000, 0.005)]
    # cum 9 + 5 = 14 -> counter 4 < last 9 => RESET, inc = 4
    b2 = [(3, "s", DAY + 3000, 0.005)]

    interrupted = _fold(_run_batches(
        spark, f"{tmp_path}/src_a", f"{tmp_path}/ck_a", "rec_a", [b1, b2],
        stop_between=True,
    ))
    continuous = _fold(_run_batches(
        spark, f"{tmp_path}/src_b", f"{tmp_path}/ck_b", "rec_b", [b1, b2],
        stop_between=False,
    ))
    assert interrupted == continuous == {DAY: (3, 9, 0)}


def test_checkpoint_restart_does_not_reprocess(spark, tmp_path):
    """Restarting from the checkpoint with NO new data emits nothing new —
    the source offset log prevents replaying batch 1 into the state."""
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 2000, 0.005)]
    rows = _run_batches(
        spark, f"{tmp_path}/src", f"{tmp_path}/ck", "rec_idem", [b1, []],
        stop_between=True,
    )
    assert _fold(rows) == {DAY: (2, 5, 0)}


def test_late_sample_dropped_loudly(spark, tmp_path):
    """A batch-2 sample older than batch 1's tail is dropped and counted
    (n_late), and the increase equals the run without that sample — never a
    corrupted delta."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 3000, 0.005)]
    # t_ms DAY+2000 is BEFORE batch 1's last processed sample: late.
    # vq .009 -> 9 would have forced a bogus reset if folded in.
    b2 = [(3, "s", DAY + 2000, 0.009), (4, "s", DAY + 4000, 0.002)]
    folded = _fold(_run_batches(spark, src, ckpt, "late", [b1, b2]))
    # in-order run without the late row: inc 0, 5, then cum 11 -> counter 1
    # < 9 => reset, inc 1; the late sample shows up ONLY in n_late
    assert folded == {DAY: (3, 6, 1)}


def test_duplicate_timestamp_dropped_as_late(spark, tmp_path):
    """An exact (t_ms, event_id) replay across batches is late too (<=):
    at-least-once upstream delivery cannot double-count an increase."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    b1 = [(1, "s", DAY + 1000, 0.004)]
    b2 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 2000, 0.005)]
    folded = _fold(_run_batches(spark, src, ckpt, "dup", [b1, b2]))
    assert folded == {DAY: (2, 5, 1)}


def test_reorder_buffer_merges_late_sample(spark, tmp_path):
    """With reorder_delay_ms, a sample up to that late is MERGED into its
    event-time position (processed exactly as an in-order arrival, n_late
    stays 0) — the watermark-style tail buffer, the production fronting for
    bounded lateness."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    # delay 1500ms. batch 1: wm = 3000-1500 -> processes t+1000 (inc 0),
    # buffers t+3000. batch 2 carries t+2000 LATE (within delay) + t+6000:
    # wm = 4500 -> processes 2000 (inc 5), 3000 (cum 14, counter 4 < 9 =>
    # reset, inc 4), buffers 6000. batch 3 (t+9000) flushes 6000 (inc 3).
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 3000, 0.005)]
    b2 = [(3, "s", DAY + 2000, 0.005), (4, "s", DAY + 6000, 0.003)]
    b3 = [(5, "s", DAY + 9000, 0.001)]
    folded = _fold(_run_batches(
        spark, src, ckpt, "ro", [b1, b2, b3], reorder_delay_ms=1500,
    ))
    # t+9000 stays buffered at end-of-replay; the four processed samples
    # give exactly the in-order increases: 0 + 5 + 4 + 3
    assert folded == {DAY: (4, 12, 0)}


def test_reorder_buffer_survives_restart(spark, tmp_path):
    """The buffered tail lives in the checkpointed state: kill/restart
    between the late batch and the flush batch, same answer."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 3000, 0.005)]
    b2 = [(3, "s", DAY + 2000, 0.005), (4, "s", DAY + 6000, 0.003)]
    b3 = [(5, "s", DAY + 9000, 0.001)]
    folded = _fold(_run_batches(
        spark, src, ckpt, "ror", [b1, b2, b3], reorder_delay_ms=1500,
        stop_between=True,
    ))
    assert folded == {DAY: (4, 12, 0)}


def test_reorder_beyond_delay_still_drops_loudly(spark, tmp_path):
    """A sample later than the reorder horizon cannot be merged (the
    counter already advanced past it) — it still drops with n_late."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    # wm after b1 = 9000-1500 = 7500: processes 1000 (inc 0) and 3000
    # (inc 5), buffers 9000. b2's t+2000 is BEHIND the processed t+3000 —
    # beyond any reordering the buffer can do -> loud drop; 9000 flushes
    # (cum 14, counter 4 < 9 => reset, inc 4); 12000 stays buffered.
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 3000, 0.005),
          (3, "s", DAY + 9000, 0.005)]
    b2 = [(4, "s", DAY + 2000, 0.009), (5, "s", DAY + 12000, 0.002)]
    folded = _fold(_run_batches(
        spark, src, ckpt, "rod", [b1, b2], reorder_delay_ms=1500,
    ))
    assert folded == {DAY: (3, 9, 1)}


def test_flow_sessions_checkpoint_recovery(spark, tmp_path):
    """Sessionizer state survives a restart: a session whose flows span
    the kill/restart boundary must NOT split — the recovered
    applyInPandasWithState state (open session tail) absorbs the
    post-restart flow, so the folded result equals the uninterrupted
    run's single merged session."""
    from elasticsearch_drift_plugin_spark.streaming.flow_sessions import (
        flow_sessions_stream,
    )

    schema = "user string, start_ms long, end_ms long, value double"
    GAP = 10_000
    b1 = [("u", 1_000, 2_000, 1.0), ("u", 4_000, 5_000, 2.0)]
    b2 = [("u", 9_000, 11_000, 4.0)]  # within gap of 5_000 -> same session

    def run(tag, stop_between):
        src, ckpt = f"{tmp_path}/{tag}_src", f"{tmp_path}/{tag}_ck"
        out_dir = f"{tmp_path}/{tag}_out"

        def sink(batch_df, _bid):
            batch_df.coalesce(1).write.mode("append").parquet(out_dir)

        def start():
            stream = spark.readStream.schema(schema).parquet(src)
            sess = flow_sessions_stream(
                stream, ["user"], "start_ms", "end_ms", "value", gap_ms=GAP
            )
            return (
                sess.writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = None
        try:
            for batch in (b1, b2):
                spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                    "append"
                ).parquet(src)
                if q is None:
                    q = start()
                q.processAllAvailable()
                if stop_between:
                    q.stop()
                    q = None
            if q is not None:
                q.processAllAvailable()
        finally:
            if q is not None:
                q.stop()
        # last update per session_start wins (update-mode partials)
        rows = spark.read.parquet(out_dir).collect()
        final = {}
        for r in sorted(rows, key=lambda r: (r.session_start, r.session_end)):
            final[(r.user, r.session_start)] = (
                r.session_end, r.n_flows, r.value
            )
        return final

    interrupted = run("ri", stop_between=True)
    continuous = run("rc", stop_between=False)
    # one session spanning the restart: [1000, 11000], 3 flows, value 7
    assert interrupted == continuous == {("u", 1_000): (11_000, 3, 7.0)}


def test_late_flood_bounded_state_monotone_n_late(spark, tmp_path):
    """r7 (VERDICT r6 item 8): a FLOOD of beyond-horizon samples — the
    DoS-shaped edge of the reorder buffer — must (a) drop every flooded
    sample loudly with ``n_late`` accumulating monotonically across
    batches, (b) leave the per-series state BOUNDED (beyond-horizon rows
    are dropped immediately, never buffered: only rows inside the
    lateness horizon occupy the tail arrays), and (c) leave the live
    counter tail unpolluted — the post-flood flush produces exactly the
    clean-run increases, which could not happen if any flooded sample had
    leaked into the buffer or the cumulative sum."""
    src, ckpt = f"{tmp_path}/src", f"{tmp_path}/ck"
    # clean prefix: processes t+1000 (inc 0), t+3000 (inc 5) at wm 7500,
    # buffers t+9000 (inside the 1500ms horizon behind max_t 9000)
    b1 = [(1, "s", DAY + 1000, 0.004), (2, "s", DAY + 3000, 0.005),
          (3, "s", DAY + 9000, 0.005)]
    # flood 1: 300 samples far behind the processed tail (t+0..t+299 ms,
    # all <= last processed (t+3000)) — every one must drop
    flood1 = [(1000 + i, "s", DAY + i, 0.009) for i in range(300)]
    # flood 2: 200 more, plus one legitimate in-order sample that flushes
    # the buffered t+9000 and extends the counter
    flood2 = [(2000 + i, "s", DAY + 300 + i, 0.009) for i in range(200)]
    flood2.append((5000, "s", DAY + 12000, 0.001))
    rows = _run_batches(
        spark, src, ckpt, "flood", [b1, flood1, flood2],
        reorder_delay_ms=1500,
    )
    folded = _fold(rows)
    # n_late = 500 (every flooded sample, none silently merged); the
    # processed samples are exactly the clean run's: inc 0 + 5 + 4 (reset
    # at t+9000: cum 14 -> counter 4 < 9) = 9 over 3 samples, t+12000
    # still buffered at end-of-replay
    assert folded == {DAY: (3, 9, 500)}
    # monotone accumulation: batch 2's emission carries flood-1's 300
    # drops, batch 3's carries flood-2's 200 — never re-emitted, never lost
    per_batch_late = sorted(r.n_late for r in rows if r.n_late > 0)
    assert per_batch_late == [200, 300]
