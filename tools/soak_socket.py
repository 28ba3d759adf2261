"""Socket-source continuous soak (VERDICT r7 item 7): a minutes-long LIVE
TCP push run through ``streaming/sources.py::socket_flows`` →
``counter_rate_stream``, asserting the two properties a long-lived
streaming job must hold:

1. **Bounded state** — the stateful operator's ``numRowsTotal`` tracks the
   SERIES-KEY cardinality (one state row per (dims) group), not the input
   volume: after warm-up it must stop growing while rows keep arriving.
2. **Monotone progress** — batchIds strictly increase for the whole run,
   the processed-row total keeps rising, and the last committed batch is
   recent at shutdown (no silent stall).

The feeder pushes CSV flow lines at a steady rate over a FIXED key space
(``N_KEYS`` event types) with timestamps advancing through a bounded
bucket window — the shape of a production counter feed (per-interface
SNMP counters: fixed fleet, unbounded samples).

Usage::

    python tools/soak_socket.py [seconds]   # default 180

Prints one JSON line. The at-most-once caveat applies (documented in
streaming/sources.py): rows in flight at shutdown may be unprocessed, so
the assertion is processed ≤ sent with a high floor, never equality.
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY = 1_704_067_200_000
SCHEMA = "event_id long, event_type string, t_ms long, value double"
N_KEYS = 40
ROWS_PER_PUSH = 400
PUSH_EVERY_S = 0.10


class _ContinuousFeed:
    """TCP server pushing synthetic counter samples at a steady rate."""

    def __init__(self):
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.sent = 0
        self.stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._t.start()

    def _run(self):
        conn, _ = self.srv.accept()
        eid = 0
        t_ms = DAY
        try:
            while not self.stop.is_set():
                lines = []
                for _ in range(ROWS_PER_PUSH):
                    key = f"if{eid % N_KEYS}"
                    # monotone per-series counter with occasional resets
                    val = float((eid * 7) % 1_000_000)
                    lines.append(f"{eid},{key},{t_ms},{val}\n")
                    eid += 1
                    t_ms += 5  # ~400 rows advance 2 s of event time
                conn.sendall("".join(lines).encode())
                self.sent += ROWS_PER_PUSH
                time.sleep(PUSH_EVERY_S)
        except OSError:
            pass  # client went away at shutdown
        finally:
            try:
                conn.close()
            except Exception:
                pass

    def close(self):
        self.stop.set()
        self._t.join(timeout=5)
        self.srv.close()


def main():
    from elasticsearch_drift_plugin_spark.session import get_spark
    from elasticsearch_drift_plugin_spark.streaming.counter_rate import (
        counter_rate_stream,
    )
    from elasticsearch_drift_plugin_spark.streaming.sources import socket_flows

    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    spark = get_spark("soak-socket")
    spark.sparkContext.setLogLevel("ERROR")

    feed = _ContinuousFeed()
    feed.start()
    sink_rows = {"n": 0}

    def sink(batch_df, _bid):
        sink_rows["n"] += batch_df.count()

    import tempfile

    ck = tempfile.mkdtemp(prefix="soak_socket_ck_")
    q = (
        counter_rate_stream(
            socket_flows(spark, "127.0.0.1", feed.port, SCHEMA),
            dims=("event_type",),
            bucket_ms=3_600_000,
            reset_mod=1_000_000_000,
        )
        .writeStream.outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime="500 milliseconds")
        .foreachBatch(sink)
        .start()
    )

    progress: dict[int, dict] = {}
    state_track: list[tuple[float, int, int]] = []  # (t, batchId, stateRows)
    t0 = time.time()
    try:
        while time.time() - t0 < seconds:
            time.sleep(1.0)
            p = q.lastProgress
            if not p:
                continue
            bid = int(p["batchId"])
            if bid not in progress:
                progress[bid] = p
                srows = (
                    int(p["stateOperators"][0]["numRowsTotal"])
                    if p.get("stateOperators")
                    else 0
                )
                state_track.append((time.time() - t0, bid, srows))
    finally:
        feed.stop.set()
        time.sleep(1.0)
        q.stop()
        feed.close()

    bids = sorted(progress)
    n_in = sum(int(progress[b]["numInputRows"]) for b in bids)
    max_state = max((s for _, _, s in state_track), default=0)
    # bounded-state check: state rows at 1/3 of the run vs the end
    third = [s for t, _, s in state_track if t < seconds / 3]
    state_at_third = max(third) if third else 0
    durations = [
        int(progress[b]["durationMs"]["triggerExecution"]) for b in bids
    ]
    problems = []
    if bids != sorted(set(bids)) or len(bids) < seconds // 2:
        problems.append(f"progress not monotone/too sparse: {len(bids)} batches")
    if n_in < feed.sent * 0.9:
        problems.append(f"processed {n_in} << sent {feed.sent}")
    # one state row per (event_type, bucket) pair currently in the horizon;
    # the run spans <= ceil(run_s*ROWS*5ms / 1h)+1 buckets of 1h
    spanned = (feed.sent * 5) // 3_600_000 + 2
    if max_state > N_KEYS * spanned:
        problems.append(
            f"state unbounded: {max_state} rows > {N_KEYS}×{spanned}"
        )
    if state_at_third and max_state > state_at_third * 1.5:
        problems.append(
            f"state grew {state_at_third} -> {max_state} after warm-up"
        )
    print(
        json.dumps(
            {
                "metric": "soak_socket",
                "value": round(time.time() - t0, 1),
                "unit": "sec",
                "rows_sent": feed.sent,
                "rows_processed": n_in,
                "sink_update_rows": sink_rows["n"],
                "batches": len(bids),
                "max_state_rows": max_state,
                "state_rows_at_third": state_at_third,
                "max_batch_ms": max(durations, default=0),
                "p50_batch_ms": sorted(durations)[len(durations) // 2]
                if durations
                else 0,
                "problems": problems,
            }
        )
    )
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
