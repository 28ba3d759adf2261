"""Time-rounding column expressions — the Spark-native re-expression of the
reference's ES ``Rounding`` (es-8.18.2 ProportionalSumAggregationBuilder.java:535-548
builds either a fixed-ms or calendar-unit UTC rounding; the aggregator applies
it as ``round(t - offset) + offset`` — ProportionalSumAggregator.java:183-191).

Everything here is pure-JVM Catalyst expressions (long arithmetic /
``date_trunc``): whole-stage-codegen-friendly, no Python in the hot path.
Fixed-interval rounding is exact 64-bit integer math (no double rounding
anywhere near epoch-ms magnitudes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_epoch_ms(col: Column, dtype: T.DataType) -> Column:
    """Normalize a time column to epoch-ms long.

    The engine's native time representation is epoch-ms longs, matching the
    reference (README.md:123-127: timestamps are epoch-millis). Timestamp and
    date columns are converted; integral columns pass through.
    """
    if isinstance(dtype, T.TimestampType):
        return F.unix_millis(col)
    if isinstance(dtype, (T.TimestampNTZType, T.DateType)):
        # NTZ instants are UTC by engine convention (session TZ is pinned UTC).
        return F.unix_millis(col.cast("timestamp"))
    return col.cast("long")


def floor_fixed_ms(t_ms: Column, step_ms: int, offset_ms: int) -> Column:
    """``round(t - offset) + offset`` for a fixed interval, as exact long math:
    ``t - pmod(t - offset, step)``. pmod keeps pre-epoch instants correct."""
    return t_ms - F.pmod(t_ms - F.lit(offset_ms), F.lit(step_ms))


def floor_calendar(t_ms: Column, unit: str, offset_ms: int, tz: str | None = None) -> Column:
    """Calendar floor of epoch-ms, as a *truncated timestamp* column, with
    the offset already subtracted (callers re-add it when materializing the
    key). Returned as timestamp so calendar ``sequence`` stepping works.

    With ``tz`` the returned timestamp is the LOCAL wall-clock floor
    (``from_utc_timestamp`` then ``date_trunc``): stepping it by
    ``INTERVAL 1 unit`` walks local wall time — uniform in the local
    calendar even across DST — and :func:`local_ts_to_utc_ms` converts each
    boundary back to its UTC instant."""
    ts = F.timestamp_millis(t_ms - F.lit(offset_ms))
    if tz:
        ts = F.from_utc_timestamp(ts, tz)
    return F.date_trunc(unit, ts)


def local_ts_to_utc_ms(ts: Column, tz: str | None) -> Column:
    """Epoch-ms of a timestamp column; when ``tz`` is set the column holds
    local wall time in that zone and is converted back to the UTC instant."""
    return F.unix_millis(F.to_utc_timestamp(ts, tz) if tz else ts)


def calendar_interval_expr(unit: str) -> Column:
    """A literal ``INTERVAL 1 <unit>`` column for sequence stepping /
    next-bucket computation."""
    return F.expr(f"INTERVAL 1 {unit}")
