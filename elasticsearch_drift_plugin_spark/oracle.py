"""DuckDB oracle-SQL generator for ``proportional_sum``.

Produces ANSI SQL that computes EXACTLY what the Spark operator computes, for
the driver's side-by-side correctness gate (row-count + schema + value-hash).

Determinism contract (why results hash-match bit-for-bit):
- all key/overlap/duration math is 64-bit integer arithmetic in both engines;
- per-row double expressions (ratio, sampling scale-up) are IEEE-754 ops in
  identical order → bit-identical per row;
- the one order-dependent step — summing doubles under a shuffle — is made
  exact by the operator's ``quantize`` mode: per-row contributions are
  floored to 10^-q units (one deterministic double→long step), summed as
  integers, and divided back once. The oracle mirrors the same expressions.

The generator shares :func:`params.normalize` with the Spark operator, so
interval precedence, offset parsing, and auto-offset derivation can never
drift between the two.
"""

from __future__ import annotations

from collections.abc import Sequence

from .params import PSumParams, normalize, prefilter_bounds


def _pmod(x: str, m: int) -> str:
    return f"((({x}) % {m} + {m}) % {m})"


def _floor_fixed(t: str, step: int, off: int) -> str:
    return f"(({t}) - {_pmod(f'({t}) - {off}', step)})"


def duck_local_to_utc_ms(tz: str, wall_ms: str) -> str:
    """DuckDB twin of Spark's ``to_utc_timestamp`` on epoch-ms wall-clock
    values, including its DST disambiguation: for an AMBIGUOUS local time
    (the repeated fall-back hour) Spark resolves to the EARLIER instant
    (larger offset — the ES round-down-compatible choice), while DuckDB's
    ``timezone(tz, naive)`` picks the LATER. Emulate by testing whether
    `later - savings` round-trips to the same wall for the two real-world
    DST savings amounts (1h, 30m); gapped walls shift forward identically
    in both engines (probed r13), so they fall through to ``later``."""
    later = f"epoch_ms(timezone('{tz}', make_timestamp(({wall_ms}) * 1000)))"

    def _back(cand: str) -> str:
        return (
            f"epoch_ms(timezone('{tz}',"
            f" timezone('UTC', make_timestamp(({cand}) * 1000))))"
        )

    c1 = f"(({later}) - 3600000)"
    c2 = f"(({later}) - 1800000)"
    return (
        f"(CASE WHEN {_back(c1)} = ({wall_ms}) THEN {c1}"
        f" WHEN {_back(c2)} = ({wall_ms}) THEN {c2}"
        f" ELSE {later} END)"
    )


def _trunc_cal(t_ms: str, unit: str, off: int, tz: str | None = None) -> str:
    """Calendar floor of epoch-ms as a timestamp (offset pre-subtracted).

    With ``tz`` the result is the LOCAL wall-clock floor: the epoch-ms is
    lifted to an instant via ``timezone('UTC', ...)`` (session-TZ-independent
    — never a bare TIMESTAMPTZ cast), converted to the zone's naive local
    time, then truncated. Mirrors Spark's from_utc_timestamp + date_trunc."""
    if tz:
        inst = f"timezone('UTC', make_timestamp((({t_ms}) - {off}) * 1000))"
        return f"date_trunc('{unit}', timezone('{tz}', {inst}))"
    return f"CAST(date_trunc('{unit}', make_timestamp((({t_ms}) - {off}) * 1000)) AS TIMESTAMP)"


def psum_oracle_sql(
    flows_sql: str,
    *,
    interval: int | str | None = None,
    calendar_interval: str | None = None,
    offset: int | str = 0,
    start: int | None = None,
    end: int | None = None,
    min_doc_count: int = 1,
    sampling: bool = True,
    group_by: Sequence[str] = (),
    extra_aggs: Sequence[tuple[str, str]] = (),
    carry_cols: Sequence[str] = (),
    quantize: int = 4,
    where: str | None = None,
    time_zone: str | None = None,
) -> str:
    """SQL mirroring ``proportional_sum(flows, 'start_ms', 'end_ms', 'value',
    ['sampling'], ...)`` over ``flows_sql``, selecting
    ``(group_by…, key, doc_count, value, extra…)``."""
    p: PSumParams = normalize(
        interval=interval,
        calendar_interval=calendar_interval,
        offset=offset,
        start=start,
        end=end,
        min_doc_count=min_doc_count,
        time_zone=time_zone,
    )
    scale = 10**quantize
    dims = ", ".join(group_by)
    dims_pfx = f"{dims}, " if group_by else ""
    # columns referenced by extra_aggs must survive the prepared/exploded CTEs
    carry_pfx = "".join(f"{c}, " for c in carry_cols)

    # fixed+tz (r12): the operator runs the grid in LOCAL wall-clock ms
    # (normalize localized p.start/end/bounds) and converts keys back to
    # UTC instants at the end — mirror both conversions with DuckDB's
    # timezone() two-hop. Instants only (the operator enforces it); the
    # oracle just computes.
    local_fixed = p.kind == "fixed" and p.tz is not None
    if local_fixed:
        def _loc(col: str) -> str:
            return (
                f"epoch_ms(timezone('{p.tz}',"
                f" timezone('UTC', make_timestamp(({col}) * 1000))))"
            )

        # r13 duration rows: BOTH endpoints localize; a local interval
        # inverted across fall-back clamps to an instant at the start
        # (operator _prepare_flows parity — greatest(e_loc, s_loc))
        s_src = _loc("start_ms")
        e_src = f"greatest({_loc('end_ms')}, {s_src})"

        def _key_out(col: str) -> str:
            # Spark-disambiguation parity on ambiguous fall-back walls
            return duck_local_to_utc_ms(p.tz, col)
    else:
        s_src, e_src = "start_ms", "end_ms"

    # value cleaning + sampling scale-up, same expression order as the operator
    v = "(CASE WHEN isnan(value) THEN NULL ELSE value END)"
    if sampling:
        factor = (
            "(CASE WHEN sampling IS NOT NULL AND NOT isnan(sampling) "
            "AND isfinite(sampling) AND sampling != 0 THEN sampling ELSE 1.0 END)"
        )
        v = f"({v} * {factor})"

    filters = ["TRUE"]
    if where:
        filters.append(f"({where})")
    # Same rounded-bound pre-filter as the operator (params.prefilter_bounds):
    # keep exactly the rows whose reference bucket loop executes.
    lo, hi = prefilter_bounds(p)
    if lo is not None:
        filters.append(f"({e_src}) >= {lo}")
    if hi is not None:
        filters.append(f"({s_src}) < {hi}")

    cs = f"greatest(s, {p.start})" if p.start is not None else "s"
    ce = f"least(e, {p.end})" if p.end is not None else "e"

    if p.kind == "fixed":
        step, off = p.step_ms, p.offset_ms
        if local_fixed:
            # r13: the grid steps in LOCAL wall ms (lk); the output key is
            # the UTC instant of the local edge, and the aggregation
            # groups on THAT key so spring-forward gap buckets merge with
            # their post-gap neighbor — operator parity (explode-level
            # conversion). Overlap math stays in local space.
            explode = (
                f"unnest(generate_series({_floor_fixed(cs, step, off)}, "
                f"{_floor_fixed(ce, step, off)}, {step})) AS lk"
            )
            win_end = f"(lk + {step})"
            bucket_lo = "lk"
            key_expr = _key_out("lk")
        else:
            explode = (
                f"unnest(generate_series({_floor_fixed(cs, step, off)}, "
                f"{_floor_fixed(ce, step, off)}, {step})) AS key"
            )
            win_end = f"(key + {step})"
            bucket_lo = key_expr = "key"
    else:
        unit, off = p.unit, p.offset_ms
        explode = (
            f"unnest(generate_series({_trunc_cal(cs, unit, off, p.tz)}, "
            f"{_trunc_cal(ce, unit, off, p.tz)}, INTERVAL 1 {unit})) AS tb"
        )
        if p.tz:
            # tb holds naive LOCAL wall time; each boundary converts back to
            # its UTC instant (timezone(tz, naive) -> timestamptz)
            # local boundary -> UTC instant with Spark's earlier-offset
            # choice on ambiguous fall-back walls (duck_local_to_utc_ms)
            win_end = (
                f"({duck_local_to_utc_ms(p.tz, f'epoch_ms(tb + INTERVAL 1 {unit})')}"
                f" + {off})"
            )
            key_expr = (
                f"({duck_local_to_utc_ms(p.tz, 'epoch_ms(tb)')} + {off})"
            )
        else:
            win_end = f"(epoch_ms(tb + INTERVAL 1 {unit}) + {off})"
            key_expr = f"(epoch_ms(tb) + {off})"
        bucket_lo = key_expr

    overlap = f"greatest(least({win_end}, e) - greatest({bucket_lo}, s), 0)"
    ratio = (
        f"(CASE WHEN e - s != 0 THEN CAST({overlap} AS DOUBLE) / CAST(e - s AS DOUBLE) "
        f"ELSE 1.0 END)"
    )
    contrib = f"(v * {ratio})"
    sum_expr = f"SUM(CAST(FLOOR({contrib} * {float(scale)}) AS BIGINT))"
    value_expr = f"COALESCE(CAST({sum_expr} AS DOUBLE) / {float(scale)}, 0.0)"

    extra_sel = "".join(f", {expr} AS {name}" for name, expr in extra_aggs)
    having = f"HAVING COUNT(*) >= {p.min_doc_count}" if p.min_doc_count > 1 else ""

    agg_sql = f"""
WITH flows AS ({flows_sql}),
prepared AS (
  SELECT {dims_pfx}{carry_pfx}{s_src} AS s, {e_src} AS e, {v} AS v
  FROM flows WHERE {' AND '.join(filters)}
),
exploded AS (
  SELECT {dims_pfx}{carry_pfx}s, e, v, {explode} FROM prepared
),
agg AS (
  SELECT {dims_pfx}{key_expr} AS key,
         {value_expr} AS value,
         COUNT(*) AS doc_count{extra_sel}
  FROM exploded
  GROUP BY {dims_pfx}{key_expr}
  {having}
)"""

    extra_out = "".join(f", {name}" for name, _ in extra_aggs)
    if p.min_doc_count == 0:
        # Zero-fill between observed min and max keys PER GROUP (each owning
        # bucket's histogram reduces independently in the reference), matching
        # the operator's per-group spine join.
        grp = f"GROUP BY {dims}" if group_by else ""
        bounds = f"bounds AS (SELECT {dims_pfx}min(key) AS mn, max(key) AS mx FROM agg {grp})"
        if local_fixed:
            # r13: agg keys are UTC instants; the spine steps in LOCAL
            # wall ms from the localized bounds, converts each edge to
            # its UTC instant, and DROPS fabricated walls inside a DST
            # gap (round-trip fails) — operator _fill_empty_buckets
            # parity
            spine = (
                f"SELECT {dims_pfx}{_key_out('lk')} AS key FROM ("
                f"SELECT {dims_pfx}unnest(generate_series("
                f"{_loc('mn')}, {_loc('mx')}, {p.step_ms})) AS lk"
                f" FROM bounds) WHERE {_loc(_key_out('lk'))} = lk"
            )
        elif p.kind == "fixed":
            spine = (
                f"SELECT {dims_pfx}unnest(generate_series(mn, mx, {p.step_ms})) AS key "
                f"FROM bounds"
            )
        elif p.tz:
            to_local = (
                f"timezone('{p.tz}', timezone('UTC', make_timestamp(({{b}} - "
                f"{p.offset_ms}) * 1000)))"
            )
            # gap-fabricated walls drop via the tb round-trip (hour-unit
            # grids can step into a spring-forward gap)
            rt_tb = (
                f"timezone('{p.tz}', timezone('UTC',"
                f" make_timestamp((key - {p.offset_ms}) * 1000)))"
            )
            spine = (
                f"SELECT {dims_pfx}key FROM ("
                f"SELECT {dims_pfx}tb,"
                f" {duck_local_to_utc_ms(p.tz, 'epoch_ms(tb)')}"
                f" + {p.offset_ms} "
                f"AS key FROM (SELECT {dims_pfx}unnest(generate_series("
                f"{to_local.format(b='mn')}, {to_local.format(b='mx')}, "
                f"INTERVAL 1 {p.unit})) AS tb FROM bounds)) "
                f"WHERE {rt_tb} = tb"
            )
        else:
            spine = (
                f"SELECT {dims_pfx}epoch_ms(tb) + {p.offset_ms} AS key FROM (SELECT "
                f"{dims_pfx}unnest(generate_series("
                f"make_timestamp((mn - {p.offset_ms}) * 1000), "
                f"make_timestamp((mx - {p.offset_ms}) * 1000), "
                f"INTERVAL 1 {p.unit})) AS tb FROM bounds)"
            )
        return (
            f"{agg_sql}, {bounds}, spine AS ({spine}) "
            f"SELECT {dims_pfx}spine.key AS key, COALESCE(doc_count, 0) AS doc_count, "
            f"COALESCE(value, 0.0) AS value{extra_out} "
            f"FROM spine LEFT JOIN agg USING ({dims_pfx.rstrip(', ') + ', ' if group_by else ''}key) "
            f"ORDER BY {dims_pfx}key"
        )
    return (
        f"{agg_sql} SELECT {dims_pfx}key, doc_count, value{extra_out} FROM agg "
        f"ORDER BY {dims_pfx}key"
    )
