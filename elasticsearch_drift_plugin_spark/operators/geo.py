"""ES geo-aggregation family: ``geotile_grid``, ``geohash_grid``,
``geo_distance``, ``geo_bounds``, ``geo_centroid``.

The host-ES surface around the reference operator (SURVEY.md §2.2): every
netflow deployment of the drift plugin tags flows with exporter / peer
coordinates and rolls them up with these aggs, so a migrating user needs
them alongside the bucket/metric families in es_aggs.py / es_metrics.py.

Fixture discipline (same as relational.cidr_rollup): the testdata carries
no coordinates, so a deterministic point derives from ``user_id`` by two
independent Knuth-style multiplicative hashes into micro-degrees — pure
integer arithmetic, int64-exact for every intermediate (hash products
max ~3.5e9·user_id, cell indexes ~3.9e17; the session's ANSI mode throws
loudly if a future widening ever overflows — the ADVICE-r3 lesson was
silent wraps, and r11 measured per-row DECIMAL(38,0) at ~1.5 s/1M rows),
byte-identical in the DuckDB twins. What matters for parity is the
aggregation math:

- grid keys: EXACT integer cell arithmetic on micro-degrees wherever the
  projection is linear (geohash, geotile x); the geotile y (Web-Mercator)
  needs ``tan``/``ln`` doubles — both engines evaluate the same IEEE
  expression order and a cell flip would need a point within ~1 ulp of a
  tile boundary (measure-zero for the hash fixture; documented, accepted);
- distance ranges: haversine in doubles, same expression order both sides,
  range edges far from any point's ulp neighborhood;
- bounds: pure min/max comparisons (exact);
- centroid: micro-degree sums as exact longs, floor-division mean
  (``(s - pmod(s, n)) div n`` == DuckDB ``//`` — negative latitudes make
  the truncate-vs-floor distinction real here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.flows import load_table

UDEG = 1_000_000  # micro-degrees per degree

# lat in [-85e6, 85e6] udeg (inside the Web-Mercator domain), lon in
# [-180e6, 180e6]. Two different odd multipliers -> independent coordinates.
# BIGINT hash arithmetic (r11): user_id * 2654435761 fits int64 up to
# user_id ~3.47e9 and ANSI mode throws loudly on overflow; per-row
# DECIMAL(38,0) math measured ~1.5 s per million rows. DuckDB twins stay
# HUGEINT — values agree exactly when nothing overflows.
_LAT_SQL = (
    "CAST(pmod(user_id * 2654435761, 170000001)"
    " - 85000000 AS BIGINT)"
)
_LON_SQL = (
    "CAST(pmod(user_id * 2246822519, 360000001)"
    " - 180000000 AS BIGINT)"
)

_LAT_DUCK = (
    "CAST(((CAST(user_id AS HUGEINT) * 2654435761) % 170000001 + 170000001)"
    " % 170000001 - 85000000 AS BIGINT)"
)
_LON_DUCK = (
    "CAST(((CAST(user_id AS HUGEINT) * 2246822519) % 360000001 + 360000001)"
    " % 360000001 - 180000000 AS BIGINT)"
)


def geo_events(events: DataFrame) -> DataFrame:
    """events + (lat, lon) degree doubles — the user-facing shape (a real
    deployment reads real coordinates; the operators never see the hash)."""
    return events.select(
        "event_type",
        "user_id",
        "value",
        (F.expr(_LAT_SQL) / F.lit(float(UDEG))).alias("lat"),
        (F.expr(_LON_SQL) / F.lit(float(UDEG))).alias("lon"),
    )


GEO_EVENTS_DUCK = f"""
SELECT event_type, user_id, value,
       {_LAT_DUCK} / {float(UDEG)} AS lat,
       {_LON_DUCK} / {float(UDEG)} AS lon
FROM events
"""


def _udeg(deg: Column) -> Column:
    # degree doubles that originated from micro-degree integers round-trip
    # exactly: |x*1e6 - udeg| <= 360e6 * 2^-52 * 2 << 0.5, so round() is a
    # lossless inverse in both engines
    return F.round(deg * F.lit(float(UDEG))).cast("long")


# --------------------------------------------------------------------------
# geotile_grid
# --------------------------------------------------------------------------
def geotile_grid(
    df: DataFrame, zoom: int = 6, size: int = 30,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """(key, doc_count, sum_value_q): ES ``geotile_grid`` — Web-Mercator
    map tiles "z/x/y" at ``zoom``, top-``size`` by count (key tie-break),
    like the ES agg's count ordering. One partial+final hash aggregation.

    x is EXACT integer math on micro-degrees; y runs the standard mercator
    formula in doubles (see module docstring for the cross-engine note).
    """
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = 1 << zoom
    lon_q = _udeg(F.col(lon_col))
    # floor((lon + 180) / 360 * n): exact int64 — 360e6 udeg * 2^29 tops
    # out at 1.9e17, far inside BIGINT (the old DECIMAL(38,0) widening
    # cost ~1.5 s/1M rows of per-row BigDecimal, r11 measurement)
    x = F.expr(
        f"CAST((CAST({UDEG * 180} + round({lon_col} * {float(UDEG)}) AS BIGINT)"
        f" * {n}) div {UDEG * 360} AS BIGINT)"
    )
    x = F.least(x, F.lit(n - 1))  # lon == +180 belongs to the last tile
    latr = F.radians(F.col(lat_col))
    merc = (
        F.lit(1.0)
        - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr)) / F.lit(3.141592653589793)
    ) / F.lit(2.0)
    y = F.greatest(F.least(F.floor(merc * F.lit(float(n))), F.lit(n - 1)), F.lit(0))
    q = F.floor(F.col("value") * F.lit(float(UDEG)))
    return (
        df.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            F.concat_ws("/", F.lit(zoom), x.cast("string"), y.cast("string")).alias("key"),
            q.alias("__q"),
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.sum("__q").alias("sum_value_q"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def geotile_grid_sql(zoom: int = 6, size: int = 30) -> str:
    n = 1 << zoom
    return f"""
WITH pts AS ({GEO_EVENTS_DUCK}),
keyed AS (
  SELECT '{zoom}/' ||
         CAST(least(CAST((CAST({UDEG * 180} + round(lon * {float(UDEG)}) AS HUGEINT)
                          * {n}) // {UDEG * 360} AS BIGINT), {n - 1}) AS VARCHAR)
         || '/' ||
         CAST(greatest(least(CAST(FLOOR((1 - ln(tan(radians(lat)) + 1 / cos(radians(lat)))
                  / pi()) / 2 * {float(n)}) AS BIGINT), {n - 1}), 0) AS VARCHAR) AS key,
         CAST(FLOOR(value * {float(UDEG)}) AS BIGINT) AS q
  FROM pts WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT key, COUNT(*) AS doc_count, CAST(SUM(q) AS BIGINT) AS sum_value_q
FROM keyed GROUP BY key
ORDER BY doc_count DESC, key ASC LIMIT {size}
"""


# --------------------------------------------------------------------------
# geohash_grid (fully exact — linear projection, integer bit interleave)
# --------------------------------------------------------------------------
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_exprs(precision: int, lat_col: str, lon_col: str):
    """Shared construction: per-axis cell indices then bit interleave,
    emitted as engine-neutral SQL text (identical arithmetic both sides).
    Geohash packs 5·precision bits, lon taking the even positions (from the
    MSB) — ceil(5p/2) lon bits, floor(5p/2) lat bits."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    # exact integer cell index: (udeg + range) * 2^bits div (2 * range) —
    # int64-exact (360e6 * 2^30 = 3.9e17 max at precision 12; ANSI throws
    # loudly if a future widening ever overflows)
    lon_cell = (
        f"CAST((CAST({UDEG * 180} + round({lon_col} * {float(UDEG)}) AS BIGINT)"
        f" * {1 << lon_bits}) div {UDEG * 360} AS BIGINT)"
    )
    lat_cell = (
        f"CAST((CAST({UDEG * 90} + round({lat_col} * {float(UDEG)}) AS BIGINT)"
        f" * {1 << lat_bits}) div {UDEG * 180} AS BIGINT)"
    )
    # clamp the +180/+90 edge into the last cell
    lon_cell = f"least({lon_cell}, {(1 << lon_bits) - 1})"
    lat_cell = f"least({lat_cell}, {(1 << lat_bits) - 1})"
    # interleave: walk bit positions of the packed hash from the MSB; even
    # positions take lon bits (MSB first), odd take lat bits
    terms = []
    for i in range(bits):  # i = 0 is the packed MSB
        if i % 2 == 0:
            src, src_bits, k = "LON", lon_bits, i // 2
        else:
            src, src_bits, k = "LAT", lat_bits, i // 2
        shift_src = src_bits - 1 - k  # take the k-th bit from the MSB
        shift_dst = bits - 1 - i
        terms.append(f"(({src} >> {shift_src}) & 1) * {1 << shift_dst}")
    packed = " + ".join(terms)
    return lon_cell, lat_cell, packed


def _geohash_chars(packed: str, precision: int, chr_fn: str) -> str:
    """base32 string from the packed integer; ``chr_fn`` differs per engine
    (Spark ``char``, DuckDB ``chr``)."""
    pieces = []
    for c in range(precision):
        shift = 5 * (precision - 1 - c)
        idx = f"(({packed}) >> {shift}) & 31"
        # _BASE32 is contiguous ASCII runs; map via substring on a literal
        pieces.append(f"substring('{_BASE32}', CAST(({idx}) + 1 AS INT), 1)")
    return " || ".join(pieces) if chr_fn == "chr" else f"concat({', '.join(pieces)})"


def geohash_grid(
    df: DataFrame, precision: int = 4, size: int = 30,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """(key, doc_count, sum_value_q): ES ``geohash_grid`` — classic base32
    geohash cells, top-``size`` by count. 100% exact integer arithmetic
    (linear projection + bit interleave), zero trig — hash-stable on any
    engine at any precision ≤ 12."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    lon_cell, lat_cell, packed = _geohash_exprs(precision, lat_col, lon_col)
    packed_expr = packed.replace("LON", "__lonc").replace("LAT", "__latc")
    q = F.floor(F.col("value") * F.lit(float(UDEG)))
    keyed = (
        df.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            F.expr(lon_cell).alias("__lonc"),
            F.expr(lat_cell).alias("__latc"),
            q.alias("__q"),
        )
        .select(
            F.expr(
                _geohash_chars(f"({packed_expr})", precision, "char")
            ).alias("key"),
            "__q",
        )
    )
    return (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.sum("__q").alias("sum_value_q"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def geohash_grid_sql(precision: int = 4, size: int = 30) -> str:
    lon_cell, lat_cell, packed = _geohash_exprs(precision, "lat", "lon")
    # DuckDB dialect: only the floor-division operator differs (BIGINT
    # arithmetic is shared — the cell index maxes at 3.9e17, see
    # _geohash_exprs)
    lon_cell = lon_cell.replace(" div ", " // ")
    lat_cell = lat_cell.replace(" div ", " // ")
    packed_expr = packed.replace("LON", "lonc").replace("LAT", "latc")
    chars = _geohash_chars(f"({packed_expr})", precision, "chr")
    return f"""
WITH pts AS ({GEO_EVENTS_DUCK}),
cells AS (
  SELECT {lon_cell} AS lonc, {lat_cell} AS latc,
         CAST(FLOOR(value * {float(UDEG)}) AS BIGINT) AS q
  FROM pts WHERE value IS NOT NULL AND NOT isnan(value)
),
keyed AS (SELECT {chars} AS key, q FROM cells)
SELECT key, COUNT(*) AS doc_count, CAST(SUM(q) AS BIGINT) AS sum_value_q
FROM keyed GROUP BY key
ORDER BY doc_count DESC, key ASC LIMIT {size}
"""


# --------------------------------------------------------------------------
# geo_distance
# --------------------------------------------------------------------------
_EARTH_R = 6371000.0  # ES GeoUtils.EARTH_MEAN_RADIUS


def _haversine_m(lat_col: str, lon_col: str, olat: float, olon: float) -> str:
    """Great-circle meters, identical IEEE expression order both engines.
    Squares written as explicit multiplication (not pow): pow(x, 2) is one
    libm call whose rounding may differ between JVM and C runtimes; x*x is
    a single IEEE multiply, bit-identical everywhere."""
    sh_lat = f"sin((radians({lat_col}) - radians({olat!r})) / 2)"
    sh_lon = f"sin((radians({lon_col}) - radians({olon!r})) / 2)"
    return (
        f"(2.0 * {_EARTH_R} * asin(sqrt("
        f"({sh_lat} * {sh_lat})"
        f" + cos(radians({olat!r})) * cos(radians({lat_col}))"
        f" * ({sh_lon} * {sh_lon}))))"
    )


def geo_distance_agg(
    df: DataFrame,
    origin: tuple[float, float],
    edges_km: tuple = (1000.0, 3000.0, 8000.0),
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(key, from_km, to_km, doc_count, sum_value_q): ES ``geo_distance``
    range agg — haversine distance from ``origin``, bucketed by the open-
    ended edge list the way ES ranges are (``[prev, edge)``, last bucket
    unbounded). Map-side fan-out ≤ #ranges via a literal membership array,
    one partial+final agg — the es_aggs.range_agg shape."""
    olat, olon = float(origin[0]), float(origin[1])
    dist_km = F.expr(_haversine_m(lat_col, lon_col, olat, olon)) / F.lit(1000.0)
    edges = [float(e) for e in edges_km]
    lo = [0.0] + edges
    hi = edges + [None]
    q = F.floor(F.col("value") * F.lit(float(UDEG)))
    b = F.lit(None).cast("int")
    cond = None
    for i, (a, z) in enumerate(zip(lo, hi)):
        c = dist_km >= F.lit(a) if z is None else (dist_km >= F.lit(a)) & (dist_km < F.lit(z))
        cond = F.when(c, F.lit(i)) if cond is None else cond.when(c, F.lit(i))
    b = cond
    out = (
        df.where(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(b.alias("__b"), q.alias("__q"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.sum("__q").alias("sum_value_q"))
    )
    # serve range metadata from a literal map (O(#ranges))
    label = None
    frm = None
    to = None
    for i, (a, z) in enumerate(zip(lo, hi)):
        key = f"*-{z}" if i == 0 else (f"{a}-*" if z is None else f"{a}-{z}")
        label = (F.when(F.col("__b") == i, F.lit(key)) if label is None
                 else label.when(F.col("__b") == i, F.lit(key)))
        frm = (F.when(F.col("__b") == i, F.lit(a)) if frm is None
               else frm.when(F.col("__b") == i, F.lit(a)))
        to = (F.when(F.col("__b") == i, F.lit(z).cast("double")) if to is None
              else to.when(F.col("__b") == i, F.lit(z).cast("double")))
    return out.select(
        label.alias("key"),
        frm.alias("from_km"),
        to.alias("to_km"),
        "doc_count",
        "sum_value_q",
    ).orderBy("from_km")


def geo_distance_sql(
    origin: tuple[float, float], edges_km: tuple = (1000.0, 3000.0, 8000.0)
) -> str:
    olat, olon = float(origin[0]), float(origin[1])
    dist = f"({_haversine_m('lat', 'lon', olat, olon)} / 1000.0)"
    edges = [float(e) for e in edges_km]
    lo = [0.0] + edges
    hi = edges + [None]
    cases, meta = [], []
    for i, (a, z) in enumerate(zip(lo, hi)):
        cond = f"{dist} >= {a!r}" + ("" if z is None else f" AND {dist} < {z!r}")
        cases.append(f"WHEN {cond} THEN {i}")
        key = f"*-{z}" if i == 0 else (f"{a}-*" if z is None else f"{a}-{z}")
        # CAST every range edge: bare float literals parse as DECIMAL in
        # DuckDB, which the oracle-type sweep bans (stringifies differently
        # from the Spark DOUBLE the driver hashes against)
        to = "CAST(NULL AS DOUBLE)" if z is None else f"CAST({z!r} AS DOUBLE)"
        meta.append(f"({i}, '{key}', CAST({a!r} AS DOUBLE), {to})")
    return f"""
WITH pts AS ({GEO_EVENTS_DUCK}),
b AS (
  SELECT CASE {' '.join(cases)} END AS bi,
         CAST(FLOOR(value * {float(UDEG)}) AS BIGINT) AS q
  FROM pts WHERE value IS NOT NULL AND NOT isnan(value)
),
agg AS (SELECT bi, COUNT(*) AS doc_count, CAST(SUM(q) AS BIGINT) AS sum_value_q
        FROM b GROUP BY bi),
meta(bi, key, from_km, to_km) AS (VALUES {', '.join(meta)})
SELECT key, from_km, to_km, doc_count, sum_value_q
FROM agg JOIN meta USING (bi) ORDER BY from_km
"""


# --------------------------------------------------------------------------
# geo_bounds / geo_centroid
# --------------------------------------------------------------------------
def geo_bounds_agg(
    df: DataFrame, group_cols: list[str],
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """(group..., top, bottom, left, right): ES ``geo_bounds`` per group —
    pure min/max comparisons on the degree doubles (exact cross-engine;
    both engines return an input value bit-for-bit). ES's wrap_longitude
    dateline optimization is serving-edge cosmetics and is not modeled."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.max(lat_col).alias("top"),
            F.min(lat_col).alias("bottom"),
            F.min(lon_col).alias("left"),
            F.max(lon_col).alias("right"),
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def geo_bounds_sql(group_cols: list[str]) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH pts AS ({GEO_EVENTS_DUCK})
SELECT {g}, MAX(lat) AS top, MIN(lat) AS bottom,
       MIN(lon) AS "left", MAX(lon) AS "right"
FROM pts GROUP BY {g} ORDER BY {g}
"""


def geo_centroid_agg(
    df: DataFrame, group_cols: list[str],
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """(group..., n, lat_udeg, lon_udeg): ES ``geo_centroid`` per group —
    arithmetic mean point in EXACT micro-degree integers: per-row udeg are
    exact longs, sums exact, mean by floor division (``(s - pmod(s, n))
    div n``) so negative-hemisphere sums floor exactly like DuckDB ``//``.
    (ES itself averages doubles; the integer contract is this engine's
    cross-engine determinism discipline, same as every *_q column.)"""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_udeg(F.col(lat_col))).alias("__slat"),
            F.sum(_udeg(F.col(lon_col))).alias("__slon"),
        )
        .select(
            *group_cols,
            "n",
            F.expr("(__slat - pmod(__slat, n)) div n").alias("lat_udeg"),
            F.expr("(__slon - pmod(__slon, n)) div n").alias("lon_udeg"),
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def geo_centroid_sql(group_cols: list[str]) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH pts AS ({GEO_EVENTS_DUCK}),
agg AS (
  SELECT {g}, COUNT(*) AS n,
         SUM(CAST(round(lat * {float(UDEG)}) AS BIGINT)) AS slat,
         SUM(CAST(round(lon * {float(UDEG)}) AS BIGINT)) AS slon
  FROM pts GROUP BY {g}
)
SELECT {g}, n,
       -- FLOOR division in exact integers: DuckDB's integer `//` truncates
       -- toward zero (-7 // 2 = -3), so subtract the nonnegative remainder
       -- first — then the quotient is exact however the engine rounds
       CAST((slat - ((slat % n + n) % n)) // n AS BIGINT) AS lat_udeg,
       CAST((slon - ((slon % n + n) % n)) // n AS BIGINT) AS lon_udeg
FROM agg ORDER BY {g}
"""


# --------------------------------------------------------------------------
# geo_line
# --------------------------------------------------------------------------
def geo_line_agg(
    df: DataFrame,
    group_cols: list[str],
    sort_col: str = "t_ms",
    tiebreak_col: str = "event_id",
    size: int = 500,
    lat_col: str = "lat",
    lon_col: str = "lon",
    sort_order: str = "asc",
) -> DataFrame:
    """(group..., n_points, total_docs, complete, line): ES ``geo_line``
    agg — per group, the track of points ordered by ``sort_col`` ascending,
    truncated to the FIRST ``size`` points (ES keeps the points with the
    smallest sort values under ``sort_order: asc``); ``complete`` is the ES
    response flag (line covers every matched doc). The line serializes as
    space-joined "lon,lat" micro-degree integer pairs (GeoJSON LineString
    axis order) — exact integers, hash-stable cross-engine.

    Plan: one shuffle on the group key drives BOTH the ranking window and
    the final per-group assembly (same partitioning, Catalyst reuses the
    exchange); truncation happens before ``collect_list`` so per-group
    state is bounded by ``size`` — the unbounded-collect risk ES itself
    caps at 10 000 points. ES tiebreak on equal sort values is undefined
    (Lucene doc order); ``tiebreak_col`` pins it for determinism.
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    if sort_order not in ("asc", "desc"):
        raise ValueError(f"geo_line sort_order must be asc/desc, got {sort_order!r}")
    # desc (r10): ES keeps the points with the LARGEST sort values and
    # emits the track in descending sort order — the ranking window flips
    # its sort key and the assembled line reverses (tiebreak stays asc)
    skey = F.col("__s").desc() if sort_order == "desc" else F.col("__s").asc()
    w = Window.partitionBy(*group_cols).orderBy(skey, "__tb")
    wall = Window.partitionBy(*group_cols)
    pt = F.concat_ws(
        ",",
        _udeg(F.col(lon_col)).cast("string"),
        _udeg(F.col(lat_col)).cast("string"),
    )
    ranked = df.select(
        *group_cols,
        F.col(sort_col).alias("__s"),
        F.col(tiebreak_col).alias("__tb"),
        pt.alias("__pt"),
    ).select(
        "*",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__total"),
    )
    return (
        ranked.where(F.col("__rn") <= size)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.max("__total").alias("total_docs"),
            F.array_join(
                # __rn already encodes the direction-aware order (window
                # key flips for desc; tiebreak stays asc in both) — sort
                # the collected points by rank, never re-derive the order
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__rn", "__pt"))),
                    lambda r: r["__pt"],
                ),
                " ",
            ).alias("line"),
        )
        .select(
            *group_cols,
            "n_points",
            "total_docs",
            (F.col("n_points") == F.col("total_docs")).alias("complete"),
            "line",
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def geo_line_sql(
    group_cols: list[str], size: int = 500, sort_order: str = "asc"
) -> str:
    g = ", ".join(group_cols)
    so = "DESC" if sort_order == "desc" else "ASC"
    return f"""
WITH pts AS (
  SELECT event_type, epoch_ms(ts) AS t_ms, event_id,
         {_LAT_DUCK} AS lat_udeg, {_LON_DUCK} AS lon_udeg
  FROM events
),
r AS (
  SELECT {g}, t_ms, event_id,
         CAST(lon_udeg AS VARCHAR) || ',' || CAST(lat_udeg AS VARCHAR) AS pt,
         row_number() OVER (PARTITION BY {g} ORDER BY t_ms {so}, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY {g}) AS total
  FROM pts
)
SELECT {g}, COUNT(*) AS n_points, MAX(total) AS total_docs,
       COUNT(*) = MAX(total) AS complete,
       string_agg(pt, ' ' ORDER BY t_ms {so}, event_id) AS line
FROM r WHERE rn <= {size}
GROUP BY {g} ORDER BY {g}
"""


def geo_events_track(events: DataFrame) -> DataFrame:
    """events + (lat, lon) plus the sort/tiebreak columns geo_line needs.
    The hash point derives from user_id (module fixture discipline), so a
    per-group track is a deterministic pseudo-trajectory."""
    from ..sources.flows import ts_ms_col

    return events.select(
        "event_type",
        "event_id",
        ts_ms_col(events).alias("t_ms"),
        (F.expr(_LAT_SQL) / F.lit(float(UDEG))).alias("lat"),
        (F.expr(_LON_SQL) / F.lit(float(UDEG))).alias("lon"),
    )


# default test polygon: a large quadrilateral over the western hemisphere
# (degrees, (lon, lat) winding order; closed implicitly)
GEO_POLYGON = ((-120.0, 10.0), (-30.0, 15.0), (20.0, 60.0), (-100.0, 55.0))


def _ray_cast_expr(px: str, py: str, polygon=GEO_POLYGON) -> str:
    """Crossing-parity point-in-polygon over INTEGER micro-degree coords —
    every comparison is an exact int64 cross-multiplication (max product
    ~(7.2e8)^2 < 2^63), so both engines get the identical verdict even on
    edge-grazing points; no float epsilon anywhere."""
    terms = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = (int(round(c * UDEG)) for c in polygon[i])
        x2, y2 = (int(round(c * UDEG)) for c in polygon[(i + 1) % n])
        d = y2 - y1
        if d == 0:
            continue  # horizontal edge: never crosses the horizontal ray
        cmp_op = "<" if d > 0 else ">"
        terms.append(
            f"(CASE WHEN ({y1} > {py}) <> ({y2} > {py}) AND "
            f"({px} - {x1}) * {d} {cmp_op} ({x2} - {x1}) * ({py} - {y1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "pmod(" + " + ".join(terms) + ", 2) = 1"


def geo_polygon_agg(ev: DataFrame, group_cols=("event_type",)) -> DataFrame:
    """(group..., n_inside, value_q): ES ``geo_polygon`` filter + sibling
    metrics — documents whose point falls inside the polygon, counted and
    summed per bucket. The predicate is the crossing-parity ray cast in
    exact integer micro-degrees (:func:`_ray_cast_expr`), a map-side
    filter that reaches the scan; the agg is one partial+final pass.
    """
    px = "CAST(ROUND(lon * 1000000.0) AS BIGINT)"
    py = "CAST(ROUND(lat * 1000000.0) AS BIGINT)"
    inside = F.expr(_ray_cast_expr(px, py))
    vq = F.when(
        F.col("value").isNotNull() & ~F.isnan("value"),
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long"),
    )
    return (
        ev.where(inside)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inside"),
            F.coalesce(F.sum(vq), F.lit(0)).cast("long").alias("value_q"),
        )
        .orderBy(*(group_cols or [F.lit(1)]))
    )


def geo_polygon_sql(group_cols=("event_type",)) -> str:
    g = ", ".join(group_cols)
    px = "CAST(ROUND(lon * 1000000.0) AS BIGINT)"
    py = "CAST(ROUND(lat * 1000000.0) AS BIGINT)"
    pred = _ray_cast_expr("px", "py")
    # DuckDB pmod spelling
    pred = pred.replace("pmod(", "((").replace(", 2) = 1", ") % 2 + 2) % 2 = 1")
    return f"""
WITH ev AS ({GEO_EVENTS_DUCK}),
pts AS (SELECT {g}, value, {px} AS px, {py} AS py FROM ev)
SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(COALESCE(SUM(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                              THEN CAST(FLOOR(value * 1000000.0) AS BIGINT)
                              END), 0) AS BIGINT) AS value_q
FROM pts WHERE {pred}
GROUP BY {g} ORDER BY {g}
"""


def queries() -> dict:
    return {
        "es_geotile_grid": lambda s, d: geotile_grid(
            geo_events(load_table(s, d, "events"))
        ),
        "es_geohash_grid": lambda s, d: geohash_grid(
            geo_events(load_table(s, d, "events"))
        ),
        "es_geo_distance": lambda s, d: geo_distance_agg(
            geo_events(load_table(s, d, "events")), origin=(40.7, -74.0)
        ),
        "es_geo_bounds": lambda s, d: geo_bounds_agg(
            geo_events(load_table(s, d, "events")), ["event_type"]
        ),
        "es_geo_centroid": lambda s, d: geo_centroid_agg(
            geo_events(load_table(s, d, "events")), ["event_type"]
        ),
        "es_geo_line": lambda s, d: geo_line_agg(
            geo_events_track(load_table(s, d, "events")), ["event_type"]
        ),
        # r10 (SCOPE.md §E): desc keeps the LARGEST sort values and emits
        # the track newest-first — the "most recent N positions" shape
        "es_geo_line_desc": lambda s, d: geo_line_agg(
            geo_events_track(load_table(s, d, "events")), ["event_type"],
            size=40, sort_order="desc",
        ),
        "es_geo_polygon": lambda s, d: geo_polygon_agg(
            geo_events(load_table(s, d, "events"))
        ),
    }


def oracle_sql() -> dict:
    return {
        "es_geotile_grid": geotile_grid_sql(),
        "es_geohash_grid": geohash_grid_sql(),
        "es_geo_distance": geo_distance_sql(origin=(40.7, -74.0)),
        "es_geo_bounds": geo_bounds_sql(["event_type"]),
        "es_geo_centroid": geo_centroid_sql(["event_type"]),
        "es_geo_line": geo_line_sql(["event_type"]),
        "es_geo_line_desc": geo_line_sql(
            ["event_type"], size=40, sort_order="desc"
        ),
        "es_geo_polygon": geo_polygon_sql(),
    }
