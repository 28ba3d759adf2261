"""Parameter normalization for ``proportional_sum``.

Mirrors the reference's API-level rules (the only "optimizer-like" logic the
reference has — SURVEY.md §4):

- interval precedence: a calendar interval string *wins* over a numeric
  fixed-ms interval when both are set
  (es-8.18.2 ProportionalSumAggregationBuilder.java:104-116, :247-272;
  confirmed by OffsetIT.java:112-115 setting both and MONTH winning);
- offset parsing: long ms or ``±<n><unit>`` time-value string
  (ProportionalSumAggregationBuilder.java:274-305);
- auto-offset: if ``offset == 0`` and ``start`` is set, the effective offset
  is ``start - round(start)`` so bucket keys align to the query start
  (ProportionalSumAggregatorFactory.java:94-101, verified OffsetIT.java:103-135);
- fixed interval must be ≥ 1 ms (ProportionalSumAggregationBuilder.java:250-256).

Default rounding is UTC: the reference hardcodes ``tz = null``
(ProportionalSumAggregationBuilder.java:432-434) — but its commented-out
``timeZone()`` plumbing (:435-483) shows the intended ES date_histogram
semantics, so ``time_zone`` is supported here as a gated EXTENSION for
calendar intervals: bucket boundaries are wall-clock boundaries in the
given IANA zone (DST days are 23/25 h wide in UTC), keys are the UTC
instants of those local boundaries.
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

# Calendar units supported by the reference's unit table
# (es-8.18.2 ProportionalSumAggregationBuilder.java:78-97). Keys are our
# canonical names == Spark date_trunc / DuckDB date_trunc unit names.
CALENDAR_UNITS = ("year", "month", "week", "day", "hour", "minute", "second")

# ES DateHistogramInterval spellings → canonical unit.
_CALENDAR_ALIASES = {
    "year": "year", "1y": "year", "y": "year",
    "month": "month", "1M": "month",
    "week": "week", "1w": "week",
    "day": "day", "1d": "day",
    "hour": "hour", "1h": "hour",
    "minute": "minute", "1m": "minute",
    "second": "second", "1s": "second",
}

# Upper bound on the ms width of one calendar bucket — used only for the
# per-row bucket-count guard (the circuit-breaker analog, SURVEY.md §2 row 28).
CALENDAR_UNIT_MS_MIN = {
    "year": 365 * 86400000,
    "month": 28 * 86400000,
    "week": 7 * 86400000,
    "day": 86400000,
    "hour": 3600000,
    "minute": 60000,
    "second": 1000,
}

_FIXED_UNIT_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60000,
    "h": 3600000,
    "d": 86400000,
    "w": 604800000,
}

_FIXED_RE = re.compile(r"^([+-]?)(\d+)(ms|s|m|h|d|w)$")

# TimeValue sub-ms units → divisor to ms (TimeValue.millis() truncates).
_SUBMS_UNIT_DIV = {"micros": 1000, "nanos": 1_000_000}

_TV_RE = re.compile(r"^([^a-z]*)(nanos|micros|ms|s|m|h|d|w)$")


def parse_offset(offset: int | str | None) -> int:
    """Offset in ms from a long or a ``±<n><unit>`` TimeValue string.

    Reference: ProportionalSumAggregationBuilder.java:274-305 — strips a
    leading ``+``/``-`` sign, then delegates to ES core
    ``TimeValue.parseTimeValue``. Full parity with that parser across the
    reference's ES range (7.6.2 – 8.18.2):

    - units ``d h m s ms micros nanos`` (sub-ms truncates via
      ``TimeValue.millis()``); plus ``w``, an extension TimeValue lacks;
    - bare ``"0"`` is accepted without a unit (``TimeValue.parseTimeValue``
      special-cases it);
    - fractional values (``"1.5h"``) are REJECTED: ES removed fractional
      TimeValues in 7.0 — ``TimeValue.parse`` throws "fractional time
      values are not supported" in every ES version the reference builds
      against. We mirror that error rather than inventing an acceptance
      the reference does not have.
    """
    if offset is None:
        return 0
    if isinstance(offset, int):
        return offset
    s = offset.strip()
    sign = 1
    if s[:1] in ("+", "-"):
        sign = -1 if s[0] == "-" else 1
        s = s[1:]
    if s == "0":
        return 0
    m = _TV_RE.match(s)
    if not m:
        raise ValueError(f"failed to parse offset [{offset}]; expected e.g. '1h', '-30m', 250")
    num, unit = m.group(1), m.group(2)
    if not num.isdigit():
        try:
            float(num)
        except ValueError:
            raise ValueError(f"failed to parse offset [{offset}]") from None
        # TimeValue.parse parity (ES >= 7.0): fractional values throw
        raise ValueError(
            f"failed to parse [{offset}], fractional time values are not supported"
        )
    if unit in _SUBMS_UNIT_DIV:
        return sign * (int(num) // _SUBMS_UNIT_DIV[unit])
    return sign * int(num) * _FIXED_UNIT_MS[unit]


def parse_interval(
    interval: int | str | None, calendar_interval: str | None = None
) -> tuple[str, int | None, str | None]:
    """Normalize interval params → ``(kind, step_ms, unit)``.

    ``kind`` is ``'fixed'`` or ``'calendar'``. The calendar form wins when
    both are given (ProportionalSumAggregationBuilder.java:247-272 javadoc:
    "If both are set the calendar interval takes precedence").

    A string ``interval`` may itself be a calendar alias (``'month'``) or a
    fixed time-value (``'90m'``), mirroring ES DateHistogramInterval.
    """
    if calendar_interval is not None:
        unit = _CALENDAR_ALIASES.get(calendar_interval)
        if unit is None:
            raise ValueError(
                f"unknown calendar interval {calendar_interval!r}; one of {CALENDAR_UNITS}"
            )
        return "calendar", None, unit
    if interval is None:
        raise ValueError("one of interval / calendar_interval is required")
    if isinstance(interval, str):
        if interval in _CALENDAR_ALIASES:
            return "calendar", None, _CALENDAR_ALIASES[interval]
        m = _FIXED_RE.match(interval.strip())
        if not m or m.group(1) == "-":
            raise ValueError(f"unparseable interval {interval!r}")
        step = int(m.group(2)) * _FIXED_UNIT_MS[m.group(3)]
    else:
        step = int(interval)
    if step < 1:
        # ProportionalSumAggregationBuilder.java:250-256 ([interval] must be 1 or greater)
        raise ValueError(f"fixed interval must be >= 1 ms, got {step}")
    return "fixed", step, None


def _as_zone(tz):
    """IANA name / tzinfo instance / None → tzinfo (UTC default). The
    tzinfo form lets es_dsl's range compiler reuse the ONE calendar
    rounding engine for raw-offset zones ('+02:00') ZoneInfo can't name."""
    if tz is None:
        return timezone.utc
    if isinstance(tz, str):
        return ZoneInfo(tz)
    return tz


_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _ms_to_dt(t_ms: int, zone) -> datetime:
    """EXACT epoch-ms → aware datetime. ``fromtimestamp(t/1000.0)`` loses
    a unit in the last place once ``t·1000`` exceeds float53 exactness
    (any modern epoch with a sub-second component) — timedelta carries
    integer microseconds instead, then the zone conversion is absolute."""
    return (_EPOCH_UTC + timedelta(milliseconds=int(t_ms))).astimezone(zone)


def _dt_to_ms(dt: datetime) -> int:
    """EXACT aware datetime → epoch-ms (``int(ts*1000)`` truncates a
    float ulp below the true value — the r11 1 ms property-test catch)."""
    return (dt - _EPOCH_UTC) // timedelta(milliseconds=1)


def trunc_calendar_ms(t_ms: int, unit: str, tz=None) -> int:
    """Calendar floor of an epoch-ms instant — driver-side twin of the
    engine's date_trunc-based rounding, used to derive the auto-offset.
    With ``tz`` (IANA name or tzinfo), the floor is taken on the LOCAL
    wall clock of that zone and the returned ms is the UTC instant of the
    local boundary."""
    zone = _as_zone(tz)
    dt = _ms_to_dt(t_ms, zone)
    if unit == "year":
        dt = dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    elif unit == "month":
        dt = dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    elif unit == "week":
        dt = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        days_from_monday = dt.weekday()
        if days_from_monday:
            # step back in LOCAL calendar days (a flat UTC-ms subtraction
            # would drift across a DST transition inside the week)
            dt = (dt - timedelta(days=days_from_monday)).replace(
                hour=0, minute=0, second=0, microsecond=0
            )
        return _dt_to_ms(dt)
    elif unit == "day":
        dt = dt.replace(hour=0, minute=0, second=0, microsecond=0)
    elif unit == "hour":
        dt = dt.replace(minute=0, second=0, microsecond=0)
    elif unit == "minute":
        dt = dt.replace(second=0, microsecond=0)
    elif unit == "second":
        dt = dt.replace(microsecond=0)
    else:
        raise ValueError(f"unknown calendar unit {unit!r}")
    return _dt_to_ms(dt)


def add_calendar_ms(t_ms: int, unit: str, n: int = 1, tz=None) -> int:
    """t_ms advanced by n calendar units — spine stepping on the driver.
    With ``tz`` (IANA name or tzinfo), the step is n LOCAL wall-clock units
    (a DST day is 23/25 h of UTC time)."""
    if tz is None and unit in ("week", "day", "hour", "minute", "second"):
        return t_ms + n * CALENDAR_UNIT_MS_MIN[unit if unit != "week" else "week"]
    zone = _as_zone(tz)
    dt = _ms_to_dt(t_ms, zone)
    if unit == "year":
        # day-of-month clamps like the month branch (java.time rule):
        # Feb 29 + 1y = Feb 28 — a bare replace() raises instead (r11)
        last = calendar.monthrange(dt.year + n, dt.month)[1]
        dt = dt.replace(year=dt.year + n, day=min(dt.day, last))
    elif unit == "month":
        total = dt.year * 12 + (dt.month - 1) + n
        y, m = divmod(total, 12)
        last = calendar.monthrange(y, m + 1)[1]
        dt = dt.replace(year=y, month=m + 1, day=min(dt.day, last))
    else:
        # wall-clock arithmetic: strip tzinfo, add, re-localize so the step
        # is exactly n local units regardless of DST transitions inside it
        days = {"week": 7, "day": 1}.get(unit, 0)
        secs = {"hour": 3600, "minute": 60, "second": 1}.get(unit, 0)
        naive = dt.replace(tzinfo=None) + timedelta(days=days * n, seconds=secs * n)
        dt = naive.replace(tzinfo=zone)
    return _dt_to_ms(dt)


@dataclass(frozen=True)
class PSumParams:
    """Fully-normalized proportional_sum parameters."""

    kind: str  # 'fixed' | 'calendar'
    step_ms: int | None
    unit: str | None
    offset_ms: int  # effective offset (explicit, or auto-derived from start)
    start: int | None  # query-range clamp, epoch ms
    end: int | None
    min_doc_count: int
    extended_bounds: tuple[int, int] | None
    tz: str | None = None  # IANA zone for calendar rounding (None = UTC parity)
    hard_bounds: tuple[int, int] | None = None  # ES date_histogram hard_bounds

    @property
    def min_bucket_ms(self) -> int:
        return self.step_ms if self.kind == "fixed" else CALENDAR_UNIT_MS_MIN[self.unit]


def normalize(
    *,
    interval: int | str | None = None,
    calendar_interval: str | None = None,
    offset: int | str = 0,
    start: int | None = None,
    end: int | None = None,
    min_doc_count: int = 1,
    extended_bounds: tuple[int, int] | None = None,
    time_zone: str | None = None,
    hard_bounds: tuple[int, int] | None = None,
) -> PSumParams:
    kind, step_ms, unit = parse_interval(interval, calendar_interval)
    off = parse_offset(offset)
    if time_zone is not None:
        try:
            ZoneInfo(time_zone)
        except Exception:
            raise ValueError(f"unknown time zone {time_zone!r}") from None
    if start is not None and end is not None and end < start:
        raise ValueError(f"query end {end} < start {start}")
    if min_doc_count < 0:
        raise ValueError("min_doc_count must be >= 0")
    if hard_bounds is not None and hard_bounds[1] < hard_bounds[0]:
        raise ValueError(f"hard_bounds max {hard_bounds[1]} < min {hard_bounds[0]}")
    if kind == "fixed" and time_zone is not None:
        # r12: ES rounds FIXED intervals in-zone too
        # (Rounding.TimeIntervalRounding). The engine executes the grid in
        # LOCAL wall-clock ms — uniform steps in the zone's wall time,
        # keys converted back to UTC instants at materialization — so
        # every epoch-ms PARAM here localizes too: p.start/end/bounds for
        # a fixed+tz grid live in LOCAL-ms space (the operator and the
        # oracle generator both read them there; round_key_ms is p-space).
        loc = lambda t: None if t is None else to_local_ms(t, time_zone)  # noqa: E731
        start, end = loc(start), loc(end)
        if extended_bounds is not None:
            extended_bounds = (loc(extended_bounds[0]), loc(extended_bounds[1]))
        if hard_bounds is not None:
            hard_bounds = (loc(hard_bounds[0]), loc(hard_bounds[1]))
    if off == 0 and start is not None:
        # Auto-offset: effectiveOffset = start - round(start)
        # (ProportionalSumAggregatorFactory.java:94-101).
        if kind == "fixed":
            off = start % step_ms if start >= 0 else start - _floor_fixed(start, step_ms, 0)
        else:
            off = start - trunc_calendar_ms(start, unit, time_zone)
    return PSumParams(
        kind, step_ms, unit, off, start, end, min_doc_count, extended_bounds,
        time_zone, hard_bounds,
    )


def _floor_fixed(t: int, step: int, off: int) -> int:
    return t - ((t - off) % step + step) % step


def to_local_ms(t_ms: int, tz) -> int:
    """UTC epoch-ms → the zone's wall-clock ms ("local epoch" ms) — the
    driver-side twin of Spark's ``from_utc_timestamp`` (exact integer
    arithmetic, the r11 precision discipline)."""
    dt = _ms_to_dt(int(t_ms), _as_zone(tz))
    return _dt_to_ms(dt.replace(tzinfo=timezone.utc))


def local_ms_to_utc(l_ms: int, tz) -> int:
    """Wall-clock ms in ``tz`` → UTC instant ms. Gap/overlap local times
    resolve by zoneinfo's fold=0 rule — the earlier offset for overlaps,
    the pre-transition offset for gaps — matching Spark's
    ``to_utc_timestamp`` instant-for-instant."""
    naive = _EPOCH_UTC.replace(tzinfo=None) + timedelta(milliseconds=int(l_ms))
    return _dt_to_ms(naive.replace(tzinfo=_as_zone(tz)))


def round_key_ms(p: PSumParams, t: int) -> int:
    """The bucket key owning instant ``t`` under ``p``'s grid — the ONE
    Python-side rounding used for extended/hard bounds by the operator AND
    by oracle construction, so the two sides cannot drift."""
    if p.kind == "fixed":
        return _floor_fixed(t, p.step_ms, p.offset_ms)
    return trunc_calendar_ms(t - p.offset_ms, p.unit, p.tz) + p.offset_ms


def prefilter_bounds(p: PSumParams) -> tuple[int | None, int | None]:
    """``(lo, hi_excl)`` epoch-ms bounds for the overlap pre-filter: keep
    exactly the rows whose reference bucket loop executes.

    The reference has NO row filter — the loop runs whenever
    ``round(max(s, start)) <= round(min(e, end))``
    (ProportionalSumAggregator.java:183-190, loop ``:188-218``). Because
    ``round`` is monotone and ``s <= e``, ``start <= end`` always hold, that
    condition reduces to ``e >= round(start) AND s < nextKey(round(end))``.
    Filtering on the RAW ``start``/``end`` literals instead would drop rows
    that the reference still credits to a boundary bucket whenever an explicit
    offset makes ``round(start) < start`` (e.g. offset=1 with a midnight
    start). Both the Spark operator and the DuckDB oracle generator call this
    one function, so the two sides cannot drift.
    """
    lo = hi = None
    if p.start is not None:
        if p.kind == "fixed":
            lo = _floor_fixed(p.start, p.step_ms, p.offset_ms)
        else:
            lo = trunc_calendar_ms(p.start - p.offset_ms, p.unit, p.tz) + p.offset_ms
    if p.end is not None:
        if p.kind == "fixed":
            hi = _floor_fixed(p.end, p.step_ms, p.offset_ms) + p.step_ms
        else:
            hi = (
                add_calendar_ms(
                    trunc_calendar_ms(p.end - p.offset_ms, p.unit, p.tz), p.unit, 1, p.tz
                )
                + p.offset_ms
            )
    return lo, hi
