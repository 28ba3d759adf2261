"""Streaming flow sessionization — the stateful counterpart of
``operators.sessionize`` built on ``applyInPandasWithState``.

Per key (e.g. the netflow 5-tuple), fragments are folded into an open
session held in group state; a fragment starting more than ``gap_ms`` after
the open session's end CLOSES it (emitted with ``open = false``) and begins
a new one. Every batch also emits the current open session (``open =
true``, update semantics) so sinks always see the freshest merge. An
optional processing-time timeout closes idle sessions without new data.

Scale notes: state is one fixed-width row per ACTIVE key — O(active flows),
not O(records); the stateful shuffle partitions by the same key the batch
operator uses. The kernel closure is self-contained (workers need no
package on PYTHONPATH).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "session_start long, session_end long, n_flows long, value double"


def flow_sessions_stream(
    flows: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    value_col: str,
    gap_ms: int,
    idle_timeout_ms: int | None = None,
    quantize: int | None = None,
) -> DataFrame:
    """Returns a streaming DataFrame ``[key…, session_start, session_end,
    n_flows, value, open]`` for ``.writeStream.outputMode('update')``.

    ``quantize`` mirrors batch :func:`..operators.sessionize.sessionize`'s
    deterministic value mode (each fragment's value floored to
    ``10^-quantize``, summed exactly) so a bounded replay hash-matches the
    batch oracle; the state then holds the integer quantum sum (exact in a
    double up to 2^53).
    """
    keys = list(key_cols)
    s_col, e_col, v_col = start_col, end_col, value_col
    gap = int(gap_ms)
    timeout_ms = idle_timeout_ms
    scale = float(10**quantize) if quantize is not None else None
    key_schema = ", ".join(
        f"{name} {dtype}"
        for name, dtype in flows.select(*keys).dtypes
    )
    out_schema = (
        f"{key_schema}, session_start long, session_end long, "
        "n_flows long, value double, open boolean"
    )

    def fn(key, pdfs, state):
        import math

        import pandas as pd

        frags = []
        for pdf in pdfs:
            frags.extend(
                (int(s), int(e), 0.0 if pd.isna(v) else float(v))
                for s, e, v in zip(pdf[s_col], pdf[e_col], pdf[v_col])
            )
        if scale is not None:
            frags = [(s, e, float(math.floor(v * scale))) for s, e, v in frags]
        out = []

        def row(sess, is_open):
            val = sess[3] / scale if scale is not None else sess[3]
            return (*key, sess[0], sess[1], sess[2], val, is_open)

        if state.hasTimedOut:
            if state.exists:
                out.append(row(tuple(state.get), False))
                state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            for s, e, v in sorted(frags):
                if cur is not None and s <= cur[1] + gap:
                    cur = (cur[0], max(cur[1], e), cur[2] + 1, cur[3] + v)
                else:
                    if cur is not None:
                        out.append(row(cur, False))
                    cur = (s, e, 1, v)
            if cur is not None:
                state.update(cur)
                out.append(row(cur, True))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
        cols = [*keys, "session_start", "session_end", "n_flows", "value", "open"]
        yield pd.DataFrame(out, columns=cols)

    return flows.groupBy(*keys).applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
