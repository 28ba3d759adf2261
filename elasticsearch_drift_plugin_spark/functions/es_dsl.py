"""ES query-DSL → Catalyst predicate compiler.

The reference plugin's aggregations always ride inside an ES ``_search``
whose ``query`` clause selects the documents (README.md:92-115 uses
match-all; production bodies filter by exporter, time range, field values).
A user switching to this engine keeps their query bodies: this module
compiles the core ES query DSL to a single Spark ``Column`` predicate that
Catalyst pushes into the parquet scan — the Spark-native equivalent of ES's
query phase (filter context; scoring clauses degrade to boolean matching,
which is exactly how ES treats them inside ``filter``).

Supported clauses (the working set that covers the reference's docs and the
common flow-query bodies):

- ``match_all`` / ``match_none``
- ``term`` / ``terms`` — exact value(s); ES-style ``{"field": {"value": v}}``
  or shorthand ``{"field": v}``
- ``range`` — ``gt/gte/lt/lte`` (any subset)
- ``exists`` — field is not NULL
- ``prefix`` / ``wildcard`` — string prefix, ``*``/``?`` wildcards
  (compiled to an anchored regex with all other metacharacters escaped)
- ``match`` — whitespace-tokenized OR-containment over a text field (the
  analyzer-free approximation: every DSL token must appear as a
  whitespace-delimited token for ``operator: "and"``, any-of for the
  default ``"or"``)
- ``match_phrase`` — ordered adjacent tokens (exact under the whitespace
  analyzer: the phrase as one token-boundary-padded substring)
- ``simple_query_string`` — the documented Lucene-syntax subset (terms
  joined by ``default_operator``, ``-`` negation, quoted phrases; the
  ``| + ( ) * ~`` operators raise), translated ONCE into bool/match
  clauses feeding both compilers
- ``query_string`` (r11) — the full Lucene search-bar grammar subset:
  AND/OR/NOT (&&/||/!), ``+``/``-`` modifiers with BooleanQuery
  optional-beside-required semantics, field-scoped groups, ``[a TO b]``
  ranges and comparison shorthand, wildcards/prefix/fuzzy/regexp/
  ``_exists_``, escapes — lexer + parser in ``functions/query_string.py``,
  one translation feeding both compilers
- ``multi_match`` / ``constant_score`` / ``dis_max`` / ``boosting`` /
  ``pinned`` / ``rank_feature`` / ``distance_feature`` /
  ``match_bool_prefix`` / ``combined_fields``
  (r11) — desugared by :func:`desugar_compound` (one shared rewrite) to
  this core set; filter-context semantics (score shaping drops, boosting
  demotes-never-excludes, pinned is a hit-set union, rank/distance
  feature match field-carrying docs, cross_fields/combined_fields are
  term-centric, match_bool_prefix ends in a TOKEN prefix)
- ``nested`` (r11) — any-element match over an ``array<struct>`` column
  via an ``F.exists`` lambda (zero-shuffle codegen, nested-schema
  pruning); inner subset term/terms/range/exists/match/match_phrase/bool,
  loud beyond it; DuckDB twin via ``list_filter``
- ``fuzzy`` — Levenshtein distance ≤ ``fuzziness`` (AUTO ladder from the
  probe length; plain Levenshtein — transpositions count 2, ES's
  fuzzy_transpositions:false mode)
- ``intervals`` (r13) — the ``match`` rule with ``max_gaps``/``ordered``
  over 1-2 whitespace tokens as a composable row-local predicate
  (position HOFs, no explode); wider rule sets raise naming
  ``operators.search.intervals_near``
- ``script_score`` (r13) — the engine's SQL expression dialect (NOT
  Painless; ``params`` bind as literals); filter context reduces to the
  inner query unless ``min_score`` prunes — the ``script_score``
  RETRIEVER in es_search ranks by the same script
- ``wrapper`` (r13) — base64-encoded JSON query, decoded and recursed
- ``parent_id`` (r13, relations route) — a term rewrite on the
  relation's local join key (the child stores its parent id)
- the ``span_*`` family (r13) — span_term / span_multi / span_or /
  span_near / span_first / span_not / span_containing / span_within as
  row-local token-position span SETS (functions/es_span.py — one
  dialect-parameterized HOF generator feeds both compilers);
  ``span_field_masking`` raises (one analyzer, SCOPE §D)
- ``knn`` (r13, frame route) — the exact top-k frontier joins back as
  a marker via :func:`apply_query` (row-local compilers raise naming
  the route); composes under bool with post-filter semantics
- ``geo_shape`` (r13) — envelope/polygon/circle/point shapes over
  point docs, desugared to the exact geo kinds
  (:func:`_desugar_geo_shape`); intersects==within, disjoint needs
  both coords, contains is point-shape-only
- ``terms`` LOOKUP form (r13, frame route) — the coordinator-GET
  contract: one bounded 1-row collect of ``frames[name]`` rewrites the
  clause to plain terms before compilation
- ``regexp`` — anchored full-value regex (Java dialect here, RE2 in the
  twin — portable for the lookaround-free subset)
- ``ids`` — id-list membership (``values``; relational docs carry the id
  in a column, ``field`` defaults to ``doc_id``)
- ``geo_bounding_box`` / ``geo_distance`` / ``geo_polygon`` (r11 — the
  agg's exact-int64 crossing-parity ray cast as a filter, so the query
  and agg verdicts cannot disagree) — relational geo points are two
  columns (``lat_field``/``lon_field``, default ``lat``/``lon``); the
  distance filter shares the geo module's IEEE-stable haversine, distances
  accept ES strings (``"500km"``/``"10mi"``/meters); a dateline-crossing
  box (west > east, the ES wrap rule) compiles to
  ``lon >= west OR lon <= east``
- ``bool`` — ``must`` / ``filter`` (AND), ``should`` (OR, with the FULL
  ``minimum_should_match`` spec grammar via the Lucene
  ``calculateMinShouldMatch`` algorithm — integers, negatives,
  ``"P%"``/``"-P%"`` percentages (float32 truncation parity), and
  conditional ``"U<spec"`` chains — resolved to one integer at compile
  time: 0 = optional, 1 = required OR, N > 1 = at-least-N flag-sum in
  filter context, N > clause count = match-nothing; absent ⇒ the
  documented ES rule — required iff no must/filter), ``must_not``
  (NOT with ES's match-NULL-safe semantics: a NULL field does not match, so
  must_not KEEPS null rows — mirrored exactly)

Anything else raises ``ValueError`` (fail loudly, never silently drop a
filter). The compiler emits only native Column expressions — zero Python
at execution time, predicates eligible for scan pushdown.
"""

from __future__ import annotations

import math
import re
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def translate_simple_query_string(body: dict) -> dict:
    """Rewrite a ``simple_query_string`` clause into the engine's bool/
    match/match_phrase dialect — ONE translation feeding BOTH compilers,
    so the Catalyst and SQL twins cannot drift.

    Supported subset (documented; anything else raises): whitespace-
    separated terms joined by ``default_operator`` (``or`` default, ES's
    own default), leading ``-`` negation, and double-quoted phrases.
    Lucene operators ``| + ( ) * ~`` are NOT implemented — loud error,
    never a silent misread."""
    import re as _re

    fields = body.get("fields")
    if not fields or len(fields) != 1:
        raise ValueError(
            "simple_query_string needs exactly one entry in 'fields'"
            " (multi-field OR expansion is not implemented)"
        )
    field = fields[0]
    q = body["query"]
    # operators inside double-quoted phrases are literal text (ES rule)
    # — only the text OUTSIDE phrases is scanned for unsupported ops
    bad = set(_re.sub(r'"[^"]*"', " ", q)) & set("|+()*~")
    if bad:
        raise ValueError(
            f"simple_query_string operators {sorted(bad)} are not"
            " implemented (supported: terms, -negation, \"phrases\","
            " default_operator)"
        )
    toks = _re.findall(r'-?"[^"]*"|\S+', q)
    if not toks:
        raise ValueError("simple_query_string with empty query")
    pos, neg = [], []
    for tok in toks:
        is_neg = tok.startswith("-")
        if is_neg:
            tok = tok[1:]
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            clause = {"match_phrase": {field: tok[1:-1]}}
        elif tok:
            clause = {"match": {field: tok}}
        else:
            raise ValueError("simple_query_string: empty term")
        (neg if is_neg else pos).append(clause)
    op = str(body.get("default_operator", "or")).lower()
    if op not in ("or", "and"):
        raise ValueError(f"default_operator must be and/or, got {op!r}")
    out: dict = {}
    if pos:
        out["must" if op == "and" else "should"] = pos
    if neg:
        out["must_not"] = neg
    if not out:
        raise ValueError("simple_query_string with no effective terms")
    return {"bool": out}


def calculate_min_should_match(optional_clause_count: int, spec) -> int:
    """ES bool-query ``minimum_should_match`` spec → effective integer,
    Lucene/Solr ``calculateMinShouldMatch`` parity (the public algorithm
    ES delegates to): positive/negative integers, ``"N"``/``"-N"``
    strings, percentages ``"P%"``/``"-P%"`` (negative = how many may be
    MISSING), and space-separated conditionals ``"U<spec"`` ("for more
    than U clauses, apply spec"; count ≤ the first threshold ⇒ all
    required). Percentage math reproduces Lucene's float32
    ``(count * percent) * (1/100f)`` truncation-toward-zero (e.g.
    ``"76%"`` of 5 clauses is 3 — 3.8 truncates; ``"-25%"`` of 5 is 4 —
    -1.25 truncates to -1 missing). Results < 0 clamp to 0 (no constraint);
    results above the clause count are returned as-is — the bool
    compiler maps those to match-nothing, Lucene's BooleanQuery rule."""
    import numpy as np

    if isinstance(spec, bool):
        raise ValueError(f"minimum_should_match must not be a bool: {spec!r}")
    if isinstance(spec, int):
        result = optional_clause_count + spec if spec < 0 else spec
        return max(result, 0)
    s = str(spec).strip()
    try:
        if "<" in s:
            result = optional_clause_count
            # Solr normalizes spaces around '<' away, then splits the
            # conditional specs on whitespace
            for part in s.replace(" <", "<").replace("< ", "<").split():
                upper_s, _, sub = part.partition("<")
                if not sub:
                    raise ValueError
                if optional_clause_count <= int(upper_s):
                    return result
                result = calculate_min_should_match(optional_clause_count, sub)
            return result
        if s.endswith("%"):
            percent = int(s[:-1])
            calc = float(
                np.float32(optional_clause_count * percent)
                * (np.float32(1.0) / np.float32(100.0))
            )
            result = (
                optional_clause_count + int(calc) if calc < 0 else int(calc)
            )
        else:
            calc = int(s)
            result = optional_clause_count + calc if calc < 0 else calc
    except ValueError:
        raise ValueError(
            f"invalid minimum_should_match spec {spec!r} — expected an"
            " integer, 'N'/'-N', 'P%'/'-P%', or conditional 'U<spec' forms"
        ) from None
    return max(result, 0)


# A string bound engages DATE parsing only when it looks like one — a
# date-shaped literal or a date-math expression ("now…" / "anchor||math").
# Anything else passes through verbatim, preserving ES's lexicographic
# ranges over keyword fields ({"range": {"tag": {"gte": "m"}}}).
_DATE_SHAPE = re.compile(r"\d{4}-\d{2}-\d{2}(T\d{2}(:\d{2}(:\d{2})?)?)?$")
_MATH_OP = re.compile(r"([+\-/])(\d*)([yMwdhHms])")
_MATH_UNIT = {
    "y": "year", "M": "month", "w": "week", "d": "day",
    "h": "hour", "H": "hour", "m": "minute", "s": "second",
}


def _eval_date_math(expr: str, tzinfo, round_up: bool, now_ms, fmts) -> int:
    """ES date-math (JavaDateMathParser.parseMath semantics) resolved at
    COMPILE time: anchor (``now`` or ``<date>||``) then left-to-right
    ``±N<unit>`` calendar steps and ``/<unit>`` roundings. ``roundUp``
    (the gt/lte side) fills an anchor date's missing fields to their max
    (the existing plain-date rule) and makes ``/u`` round to the unit's
    last millisecond; ``now`` is always an exact instant. Calendar
    arithmetic and floors go through params.add_calendar_ms /
    trunc_calendar_ms — the ONE wall-clock engine psum grids use — so DST
    stepping matches the rest of the engine. ``now`` must be supplied
    explicitly (epoch ms) for reproducibility: a cluster-clock-implicit
    now would make query results non-replayable."""
    from ..params import add_calendar_ms, trunc_calendar_ms

    if expr.startswith("now"):
        if now_ms is None:
            raise ValueError(
                f"range bound {expr!r} is now-anchored — pass an explicit"
                " reference instant as the clause's 'now' (epoch ms):"
                ' {"range": {f: {"gte": "now-1d/d", "now": <ms>}}}'
            )
        t, math = int(now_ms), expr[3:]
    else:
        anchor, _, math = expr.partition("||")
        t = None
        for fmt, span in fmts:
            try:
                dt = datetime.strptime(anchor, fmt).replace(tzinfo=tzinfo)
            except ValueError:
                continue
            t = (
                int((dt + span).timestamp() * 1000) - 1
                if round_up
                else int(dt.timestamp() * 1000)
            )
            break
        if t is None:
            raise ValueError(
                f"cannot parse date-math anchor {anchor!r} — expected"
                " YYYY-MM-DD[THH[:MM[:SS]]]||math"
            )
    pos = 0
    for m in _MATH_OP.finditer(math):
        if m.start() != pos:
            break
        op, n_s, u = m.groups()
        unit = _MATH_UNIT[u]
        if op == "/":
            if n_s:
                raise ValueError(f"date-math rounding takes no number: {expr!r}")
            t = trunc_calendar_ms(t, unit, tzinfo)
            if round_up:
                t = add_calendar_ms(t, unit, 1, tzinfo) - 1
        else:
            n = int(n_s) if n_s else 1
            t = add_calendar_ms(t, unit, n if op == "+" else -n, tzinfo)
        pos = m.end()
    if pos != len(math):
        raise ValueError(
            f"unparseable date-math tail {math[pos:]!r} in {expr!r} —"
            " expected ±N(y|M|w|d|h|H|m|s) steps and /unit roundings"
        )
    return t


def resolve_range_bounds(bounds: dict) -> dict:
    """ES ``range`` date handling at COMPILE time (r10 — formerly a loud
    raise on ``time_zone``; r11 adds date MATH): date-STRING bounds parse
    in the clause's ``time_zone`` (default UTC) and apply ES's rounding
    rule — ``gte``/``lt`` round DOWN to the start of the string's
    resolution unit, ``gt``/``lte`` round UP to the last millisecond of it
    (DateMathParser round-up), so ``{"lte": "2024-03-10"}`` includes the
    whole local day. Date-MATH bounds (``now-1d/d``, ``now/w``,
    ``2024-01-01||+1M/d``) resolve the same way; ``now``-anchored forms
    require an explicit ``now`` (epoch ms) sibling key — the engine's
    reproducibility contract (ES reads the coordinator clock; a replayed
    query must not drift). Wall-clock arithmetic matches ES's calendar
    stepping across DST. Numeric bounds pass through — ``time_zone`` has
    no effect on epoch-ms values in ES either — and non-date-shaped
    strings pass through VERBATIM (lexicographic keyword ranges).
    Returns the op→epoch-ms/number/verbatim dict; both query compilers
    share it, so the emitted predicates are identical."""
    from datetime import timedelta, timezone as _tzmod
    from zoneinfo import ZoneInfo

    tz = bounds.get("time_zone")
    if not tz:
        tzinfo = _tzmod.utc
    elif re.fullmatch(r"[+-]\d{2}:\d{2}", tz):
        # ES accepts raw UTC offsets ("+02:00") as well as IANA names
        sign = 1 if tz[0] == "+" else -1
        tzinfo = _tzmod(
            sign * timedelta(hours=int(tz[1:3]), minutes=int(tz[4:6]))
        )
    else:
        try:
            tzinfo = ZoneInfo(tz)
        except Exception:
            raise ValueError(f"unknown range time_zone {tz!r}") from None
    now_ms = bounds.get("now")
    fmts = [
        ("%Y-%m-%dT%H:%M:%S", timedelta(seconds=1)),
        ("%Y-%m-%dT%H:%M", timedelta(minutes=1)),
        ("%Y-%m-%dT%H", timedelta(hours=1)),
        ("%Y-%m-%d", timedelta(days=1)),
    ]

    def to_ms(v, round_up: bool):
        if not isinstance(v, str):
            return v
        if v.startswith("now") or "||" in v:
            return _eval_date_math(v, tzinfo, round_up, now_ms, fmts)
        if _DATE_SHAPE.fullmatch(v):
            for fmt, span in fmts:
                try:
                    dt = datetime.strptime(v, fmt).replace(tzinfo=tzinfo)
                except ValueError:
                    continue
                if round_up:
                    # wall-clock next-unit start minus 1 ms (aware-datetime
                    # + timedelta is wall arithmetic; .timestamp() re-derives
                    # the UTC offset, handling 23/25-hour DST days like ES)
                    return int((dt + span).timestamp() * 1000) - 1
                return int(dt.timestamp() * 1000)
            raise ValueError(
                f"cannot parse range date bound {v!r} — expected"
                " YYYY-MM-DD[THH[:MM[:SS]]]"
            )
        if tz:
            # a time_zone on a non-date bound is a category error —
            # loud beats silently comparing strings to epoch ms
            raise ValueError(
                f"range time_zone given but bound {v!r} is not date-shaped"
            )
        return v  # keyword/lexicographic bound — verbatim

    out = {}
    for op, v in bounds.items():
        if op in ("time_zone", "now"):
            continue
        if op in ("gt", "lte"):
            out[op] = to_ms(v, round_up=True)
        elif op in ("gte", "lt"):
            out[op] = to_ms(v, round_up=False)
        else:
            out[op] = v
    return out


def desugar_compound(kind: str, body: dict) -> dict | None:
    """Rewrite ES compound/score-shaping query kinds to the engine's core
    clause set, or ``None`` when ``kind`` is not a compound. ONE rewrite
    shared by :func:`compile_query` and :func:`compile_query_sql` — the
    two compilers compile the same desugared tree, so they cannot drift.

    The engine is a filter-context dialect (no ``_score``), so kinds whose
    only effect beyond matching is score shaping reduce to their matching
    semantics — exactly what ES computes for them inside a ``bool.filter``:

    - ``constant_score`` → its ``filter`` clause.
    - ``dis_max`` → OR of ``queries`` (tie_breaker shapes scores only).
    - ``boosting`` → its ``positive`` clause (ES matches on positive;
      ``negative`` only DEMOTES scores — it never excludes. A filter-mode
      reading that dropped negative matches would diverge from ES).
    - ``multi_match`` → per ES ``type``:
      * ``best_fields`` / ``most_fields`` (default): a doc matches when
        ANY of ``fields`` matches the equivalent ``match`` query — the two
        types differ only in how scores combine (dis_max vs sum).
        ``operator`` and ``minimum_should_match`` thread into each
        per-field match (msm desugars to a per-token bool, resolved by the
        shared Lucene spec resolver; under ``operator: and`` every term is
        REQUIRED and Lucene applies msm to optional clauses only, so msm
        is a no-op there).
      * ``cross_fields``: term-centric — EVERY term (under ``operator:
        and``; any term under ``or``) must appear in at least one field.
      * ``phrase`` / ``phrase_prefix``: the match_phrase /
        match_phrase_prefix form per field, OR across fields.
      Per-field boosts (``"title^3"``) strip — boost is score-only.
    """
    if kind == "constant_score":
        return body["filter"]
    if kind == "pinned":
        # ES pinned: organic hits with the pinned ids PROMOTED — pinned
        # docs match even when they miss the organic query, so the hit
        # set is the union (promotion order is score-only)
        ids = body.get("ids")
        organic = body.get("organic")
        if not ids or organic is None:
            raise ValueError("pinned needs ids and organic")
        id_clause = {"ids": {"values": list(ids), **(
            {"field": body["field"]} if "field" in body else {}
        )}}
        return {"bool": {"should": [id_clause, organic],
                         "minimum_should_match": 1}}
    if kind in ("rank_feature", "distance_feature"):
        # both are score-shaping queries that MATCH every doc carrying
        # the field (ES: rank_feature/distance_feature docs) — in filter
        # context that is exactly `exists`
        return {"exists": {"field": body["field"]}}
    if kind == "match_bool_prefix":
        # ES match_bool_prefix: each term a term-level match, the LAST a
        # prefix (search-as-you-type without phrase ordering); operator /
        # minimum_should_match as in match
        (field, spec), = body.items()
        if isinstance(spec, dict):
            query, op = spec["query"], spec.get("operator", "or")
            msm = spec.get("minimum_should_match")
        else:
            query, op, msm = spec, "or", None
        toks = [t for t in str(query).split() if t]
        if not toks:
            raise ValueError("match_bool_prefix with empty query")
        clauses = [{"match": {field: t}} for t in toks[:-1]]
        # the last term is a TOKEN prefix over analyzed text — exactly a
        # one-token match_phrase_prefix (keyword `prefix` would anchor to
        # the whole field value)
        clauses.append({"match_phrase_prefix": {field: {"query": toks[-1]}}})
        if op == "and":
            return {"bool": {"must": clauses}}
        return {"bool": {"should": clauses,
                         "minimum_should_match": 1 if msm is None else msm}}
    if kind == "combined_fields":
        # ES combined_fields is TERM-CENTRIC (each term in at least one
        # field under operator:and) — the cross_fields hit set
        return {"multi_match": {
            "query": body["query"], "fields": body.get("fields", []),
            "type": "cross_fields",
            "operator": body.get("operator", "or"),
            **({"minimum_should_match": body["minimum_should_match"]}
               if "minimum_should_match" in body else {}),
        }}
    if kind == "dis_max":
        qs = body.get("queries")
        if not isinstance(qs, (list, tuple)) or not qs:
            raise ValueError("dis_max needs a non-empty queries list")
        return {"bool": {"should": list(qs), "minimum_should_match": 1}}
    if kind == "boosting":
        if "positive" not in body:
            raise ValueError("boosting needs a positive clause")
        return body["positive"]
    if kind == "multi_match":
        query = body.get("query")
        fields = [str(f).split("^")[0] for f in body.get("fields", [])]
        if not fields:
            raise ValueError(
                "multi_match needs an explicit non-empty fields list"
                " (the engine has no index mapping to default from)"
            )
        mtype = body.get("type", "best_fields")
        op = body.get("operator", "or")
        msm = body.get("minimum_should_match")
        toks = [t for t in str(query).split() if t]
        if not toks:
            raise ValueError("multi_match with empty query")
        if mtype in ("best_fields", "most_fields"):
            if msm is not None and op != "and":
                per_field = [
                    {"bool": {
                        "should": [{"match": {f: t}} for t in toks],
                        "minimum_should_match": msm,
                    }}
                    for f in fields
                ]
            else:
                # operator:and makes every term REQUIRED; Lucene applies
                # minimum_should_match to OPTIONAL clauses only, so msm is
                # a no-op beside operator:and (ADVICE r11 — the msm branch
                # must not demote required terms to at-least-msm)
                per_field = [
                    {"match": {f: {"query": query, "operator": op}}}
                    for f in fields
                ]
            return {"bool": {"should": per_field, "minimum_should_match": 1}}
        if mtype == "cross_fields":
            term_any = [
                {"bool": {"should": [{"match": {f: t}} for f in fields],
                          "minimum_should_match": 1}}
                for t in toks
            ]
            if op == "and":
                return {"bool": {"must": term_any}}
            return {"bool": {"should": term_any,
                             "minimum_should_match":
                                 1 if msm is None else msm}}
        if mtype in ("phrase", "phrase_prefix"):
            inner = "match_phrase" if mtype == "phrase" else "match_phrase_prefix"
            return {"bool": {
                "should": [{inner: {f: {"query": query}}} for f in fields],
                "minimum_should_match": 1,
            }}
        raise ValueError(
            f"unsupported multi_match type {mtype!r} (best_fields,"
            " most_fields, cross_fields, phrase, phrase_prefix)"
        )
    return None


def _script_source(body: dict) -> str:
    """The ``script.source`` string of a script-bearing clause — the
    engine's SQL expression dialect (the runtime_mappings contract).
    ``params`` interpolate as literals: ``params.x`` spellings in the
    source are replaced by the value under ``script.params.x`` (ES's
    compile-once-bind-params pattern, resolved at compile time here
    since the engine re-plans per query anyway)."""
    script = body.get("script")
    if not isinstance(script, dict) or "source" not in script:
        raise ValueError(
            f"{next(iter(body), '?')}: script needs {{'source': <SQL"
            " expression>}} — the engine's SQL dialect, not Painless"
            " (SCOPE §D)"
        )
    src = str(script["source"])
    # longest name first + word boundary: plain str.replace would let
    # params.a corrupt params.a1 (r14 review finding)
    params = script.get("params") or {}
    for name in sorted(params, key=len, reverse=True):
        lit = _sql_lit(params[name])
        src = re.sub(
            rf"params\.{re.escape(name)}\b", lambda _m: lit, src
        )
    return src


# the two documented Painless spellings of terms_set's msm_script — the
# per-doc field read, optionally capped at the number of supplied terms
# (the canonical example in the ES terms_set docs). Anything richer
# raises naming these forms.
_MSM_SCRIPT_FIELD = re.compile(
    r"^\s*doc\[['\"](?P<f>[A-Za-z_][\w.]*)['\"]\]\.value\s*$"
)
_MSM_SCRIPT_MIN = re.compile(
    r"^\s*Math\.min\(\s*params\.num_terms\s*,\s*"
    r"doc\[['\"](?P<f>[A-Za-z_][\w.]*)['\"]\]\.value\s*\)\s*$"
)


def _msm_script_req(spec: dict, n_terms: int):
    """Resolve terms_set ``minimum_should_match_script`` to
    ``(field, cap)``: the per-doc requirement column and an optional
    integer ceiling (``Math.min(params.num_terms, doc[...].value)`` —
    the ES docs' canonical script). Richer Painless raises."""
    script = spec["minimum_should_match_script"]
    src = script.get("source", "") if isinstance(script, dict) else str(script)
    m = _MSM_SCRIPT_MIN.match(src)
    if m:
        return m.group("f"), n_terms
    m = _MSM_SCRIPT_FIELD.match(src)
    if m:
        return m.group("f"), None
    raise ValueError(
        "terms_set minimum_should_match_script supports the documented"
        " spellings doc['F'].value and Math.min(params.num_terms,"
        f" doc['F'].value) only, got {src!r} — use"
        " minimum_should_match_field for anything per-doc, or"
        " minimum_should_match for a constant"
    )


def compile_query(q: dict, now_ms: int | None = None) -> Column:
    """Compile an ES ``query`` body (the dict under ``"query"``) to one
    boolean ``Column``.

    ``now_ms`` (r13, opt-in): stamp the serving-edge clock into every
    now-anchored ``range`` bound lacking an explicit ``now`` before
    compiling (:func:`inject_now` — the run_search shim, available on
    the bare compiler route too). Without it, a now-anchored bound still
    raises: the reproducibility contract stands, callers opt in
    explicitly."""
    if now_ms is not None:
        q = inject_now(q, now_ms)
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(f"expected a single-clause query dict, got {q!r}")
    (kind, body), = q.items()
    desugared = desugar_compound(kind, body)
    if desugared is not None:
        return compile_query(desugared)
    if kind == "query_string":
        from .query_string import translate_query_string

        return compile_query(translate_query_string(body))
    if kind == "simple_query_string":
        return compile_query(translate_simple_query_string(body))
    if kind == "match_all":
        return F.lit(True)
    if kind == "match_none":
        return F.lit(False)
    if kind == "script_score":
        # ES script_score (r13): score = script over the inner query's
        # hits. The script dialect is the engine's SQL expression dialect
        # (the runtime_mappings / script_fields contract — NOT Painless;
        # SCOPE §D). In FILTER context the score is unobservable, so the
        # clause reduces to its inner query unless `min_score` prunes —
        # exactly ES's behavior (scores ignored in filter context, docs
        # below min_score dropped). The run_search `script_score`
        # RETRIEVER ranks by the same script.
        inner = compile_query(body["query"])
        src = _script_source(body)
        if "min_score" in body:
            return inner & (F.expr(src) >= F.lit(float(body["min_score"])))
        return inner
    if kind == "term":
        field, val = _field_value(body, "value")
        if _case_insensitive(body) and isinstance(val, str):
            return F.lower(F.col(field)) == F.lit(val.lower())
        return F.col(field) == F.lit(val)
    if kind == "terms":
        (field, vals), = body.items()
        if not isinstance(vals, (list, tuple)) or not vals:
            raise ValueError(f"terms expects a non-empty list, got {vals!r}")
        return F.col(field).isin(list(vals))
    if kind == "terms_set":
        # ES terms_set: the (array-valued) field matches iff it contains
        # at least `minimum_should_match` of the given terms — matched
        # terms count DISTINCT (array_intersect dedups, the ES rule), a
        # NULL/missing field never matches. `minimum_should_match_field`
        # reads the per-doc requirement from another column (the ES
        # "required_matches" pattern); scripts stay loud.
        (field, spec), = body.items()
        terms = spec.get("terms")
        if not isinstance(terms, (list, tuple)) or not terms:
            raise ValueError(f"terms_set expects a non-empty terms list, got {terms!r}")
        if "minimum_should_match_script" in spec:
            # r13: the two documented Painless spellings resolve to the
            # field route (optionally capped at len(terms))
            rf, cap = _msm_script_req(spec, len(terms))
            req = F.col(rf)
            if cap is not None:
                req = F.least(req, F.lit(int(cap)))
        elif "minimum_should_match" in spec:
            req = F.lit(int(spec["minimum_should_match"]))
        elif "minimum_should_match_field" in spec:
            req = F.col(spec["minimum_should_match_field"])
        else:
            raise ValueError(
                "terms_set needs minimum_should_match,"
                " minimum_should_match_field, or the documented"
                " minimum_should_match_script spellings"
            )
        matched = F.size(F.array_intersect(
            F.col(field), F.array(*[F.lit(t) for t in terms])
        ))
        return matched >= req
    if kind == "range":
        (field, bounds), = body.items()
        conds = []
        ops = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}
        bounds = resolve_range_bounds(bounds)
        for op, v in bounds.items():
            if op in ("format", "boost"):
                continue
            if op not in ops:
                raise ValueError(f"unsupported range op {op!r}")
            conds.append(getattr(F.col(field), ops[op])(F.lit(v)))
        if not conds:
            raise ValueError("range clause with no bounds")
        return _and(conds)
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "prefix":
        field, val = _field_value(body, "value")
        if _case_insensitive(body):
            return F.lower(F.col(field)).startswith(str(val).lower())
        return F.col(field).startswith(str(val))
    if kind == "wildcard":
        field, val = _field_value(body, "value")
        pat = "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in str(val)
        )
        # (?i) inline flag: Java regex here, RE2 in the twin — both
        # support it, and it avoids case-folding the pattern itself
        ci = "(?i)" if _case_insensitive(body) else ""
        return F.col(field).rlike(f"{ci}^{pat}$")
    if kind == "match":
        field, val = _field_value(body, "query")
        op = body[field].get("operator", "or") if isinstance(body[field], dict) else "or"
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError("match clause with empty query")
        # token containment over whitespace-delimited text (analyzer-free):
        # pad both sides so token boundaries are exact, not substrings
        padded = F.concat(F.lit(" "), F.col(field), F.lit(" "))
        conds = [padded.contains(f" {t} ") for t in toks]
        return _and(conds) if op == "and" else _or(conds)
    if kind == "match_phrase":
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError("match_phrase with empty query")
        # exact ordered-adjacent tokens under the whitespace analyzer:
        # the phrase as one padded substring
        padded = F.concat(F.lit(" "), F.col(field), F.lit(" "))
        return padded.contains(" " + " ".join(toks) + " ")
    if kind == "match_phrase_prefix":
        # ES match_phrase_prefix: the phrase's leading tokens exact and
        # adjacent, the LAST token a prefix — the search-as-you-type
        # query. Token-boundary contains on the padded text with the
        # final token unterminated.
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError("match_phrase_prefix with empty query")
        padded = F.concat(F.lit(" "), F.col(field), F.lit(" "))
        return padded.contains(" " + " ".join(toks))
    if kind == "wrapper":
        # ES wrapper: a base64-encoded JSON query (the Java HLRC's
        # raw-query escape hatch) — decode and recurse
        import base64
        import json as _json

        return compile_query(
            _json.loads(base64.b64decode(body["query"]).decode("utf-8"))
        )
    if kind == "intervals":
        # ES intervals (r13 subset): the `match` rule with `max_gaps` /
        # `ordered` over ONE or TWO whitespace tokens — the proximity
        # forms the es_intervals_near operator measures, here as a
        # composable boolean predicate. Positions come from pure HOFs
        # (filter over an index sequence — no explode, stays row-local);
        # `max_gaps` counts tokens BETWEEN the matched pair (the ES
        # rule: adjacent tokens = 0 gaps; -1 = unlimited). Wider rule
        # sets (all_of/any_of trees, 3+ tokens, fuzzy/prefix rules)
        # raise naming the operator route.
        (field, spec), = body.items()
        if set(spec) - {"match"}:
            raise ValueError(
                "intervals supports the match rule only (all_of/any_of"
                " trees: compose bool over two-token intervals, or use"
                " operators.search.intervals_near)"
            )
        m = spec["match"]
        toks = [t for t in str(m["query"]).lower().split() if t]
        if len(toks) == 1:
            # token containment over the LOWERCASED text — the same case
            # dialect the 2-token path splits (the 1-token path used to
            # match a lowered token against the raw column, r14 review)
            padded = F.concat(F.lit(" "), F.lower(F.col(field)), F.lit(" "))
            return padded.contains(f" {toks[0]} ")
        if len(toks) != 2:
            raise ValueError(
                "intervals match supports 1-2 tokens (3+ ordered chains:"
                " operators.search.intervals_near per pair)"
            )
        # delegate to the SQL twin's spark dialect: it let-binds the
        # token list once per row (the es_span discipline — HOFs are
        # interpreted, so de-duplicating the split is a ~10x win at
        # sf0.1; SCALE.md r13 row)
        return F.expr(compile_query_sql(q, "spark"))
    if kind == "fuzzy":
        # ES fuzzy: terms within `fuzziness` edits (Levenshtein is a
        # JVM/DuckDB builtin — exact, same unit-of-edit on ASCII; the
        # AUTO ladder resolves from the probe length, the ES table).
        # Plain Levenshtein: a transposition counts 2 (ES's
        # fuzzy_transpositions:false mode — Damerau is in neither engine)
        field, val = _field_value(body, "value")
        spec = body[field] if isinstance(body[field], dict) else {}
        fz = spec.get("fuzziness", "AUTO")
        if fz == "AUTO":
            n = len(str(val))
            fz = 0 if n <= 2 else (1 if n <= 5 else 2)
        if _case_insensitive(body):
            return F.levenshtein(
                F.lower(F.col(field)), F.lit(str(val).lower())
            ) <= int(fz)
        return F.levenshtein(F.col(field), F.lit(str(val))) <= int(fz)
    if kind == "regexp":
        # ES regexp is ANCHORED (full-value match). Dialect: Java regex
        # here, RE2 in the twin — portable for the common subset (no
        # lookaround/backrefs), same stance as the PII patterns.
        field, val = _field_value(body, "value")
        ci = "(?i)" if _case_insensitive(body) else ""
        return F.col(field).rlike(f"{ci}^(?:{val})$")
    if kind == "ids":
        # ES matches _id; relational docs carry their id in a column —
        # accept {"values": [...], "field": "doc_id"} (field defaults)
        vals = body["values"]
        field = body.get("field", "doc_id")
        return F.col(field).isin(list(vals))
    if kind == "geo_shape":
        return compile_query(_desugar_geo_shape(body))
    if kind == "geo_bounding_box":
        lat, lon, tl, br = _geo_fields(body)
        lat_ok = (F.col(lat) <= F.lit(tl["lat"])) & (F.col(lat) >= F.lit(br["lat"]))
        if tl["lon"] > br["lon"]:
            # dateline-crossing box (ES wrap rule: west > east means the box
            # spans ±180°) — membership is the disjoint union of two ranges
            return lat_ok & (
                (F.col(lon) >= F.lit(tl["lon"])) | (F.col(lon) <= F.lit(br["lon"]))
            )
        return (
            lat_ok
            & (F.col(lon) >= F.lit(tl["lon"]))
            & (F.col(lon) <= F.lit(br["lon"]))
        )
    if kind == "geo_distance":
        from ..operators.geo import _haversine_m

        lat = body.get("lat_field", "lat")
        lon = body.get("lon_field", "lon")
        olat, olon = body["origin"]["lat"], body["origin"]["lon"]
        dist_m = _parse_distance_m(body["distance"])
        return F.expr(_haversine_m(lat, lon, olat, olon)) <= F.lit(dist_m)
    if kind == "geo_polygon":
        return F.expr(_geo_polygon_pred(body))
    if kind == "nested":
        # ES nested query: the parent matches when ANY element of the
        # nested array satisfies the inner query (filter context ignores
        # score_mode). Flattened-frame engine: the nested docs live in an
        # array<struct> column named by `path`; the inner tree compiles
        # to a lambda predicate under F.exists — a zero-shuffle codegen
        # map over the array, with nested-schema pruning reading only the
        # touched struct fields. NULL/missing arrays never match (the
        # exists HOF yields NULL → false in filter context), matching ES.
        path, inner = body["path"], body.get("query")
        if inner is None:
            raise ValueError("nested needs a query")
        return F.exists(
            F.col(path), lambda x: _compile_nested_inner(inner, path, x)
        )
    if kind == "bool":
        must = [compile_query(c) for c in _as_list(body.get("must"))]
        filt = [compile_query(c) for c in _as_list(body.get("filter"))]
        should = [compile_query(c) for c in _as_list(body.get("should"))]
        must_not = [compile_query(c) for c in _as_list(body.get("must_not"))]
        msm = body.get("minimum_should_match")
        conds = must + filt
        if should:
            # the ES rule: should is required when the effective msm >= 1,
            # optional when 0, and defaults to required-iff-no-must/filter.
            # Specs (ints, negatives, percentages, conditionals) resolve
            # to ONE integer at COMPILE time — the should-clause count is
            # static — via the Lucene calculateMinShouldMatch algorithm.
            if msm is None:
                eff = 1 if not conds else 0
            else:
                eff = calculate_min_should_match(len(should), msm)
            if eff > len(should):
                # Lucene BooleanQuery: minShouldMatch above the optional
                # clause count matches NOTHING
                conds.append(F.lit(False))
            elif eff > 1:
                # "at least N of the should clauses": count matches in
                # filter context (NULL/unknown = no match) — one codegen
                # expression, no extra pass
                flags = [
                    F.when(F.coalesce(c, F.lit(False)), 1).otherwise(0)
                    for c in should
                ]
                total = flags[0]
                for fl in flags[1:]:
                    total = total + fl
                conds.append(total >= F.lit(int(eff)))
            elif eff == 1:
                conds.append(_or(should))
        for c in must_not:
            # ES must_not is filter-context: docs where the inner clause is
            # NULL/unknown still match — NOT(coalesce(c, false))
            conds.append(~F.coalesce(c, F.lit(False)))
        return _and(conds) if conds else F.lit(True)
    if kind in ("has_child", "has_parent"):
        raise ValueError(
            f"{kind} is a two-frame JOIN kind — a single-frame predicate"
            " cannot express it; use functions.es_dsl.apply_query(df,"
            " query, relations={name: (other_frame, key_on_df,"
            " key_on_other)}) or run_search(..., relations=...)"
        )
    if kind.startswith("span_") or kind == "field_masking_span":
        # r13: the Lucene span family — one dialect-parameterized
        # generator (functions.es_span) feeds both compilers; Spark
        # executes the "spark"-dialect string (pure HOFs, codegen)
        from .es_span import compile_span_sql

        return F.expr(compile_span_sql({kind: body}, "spark"))
    if kind == "knn":
        raise ValueError(
            "knn is a frame-level TOP-K kind — a row-local predicate"
            " cannot express 'the k best rows'; use apply_query(df,"
            " query) or run_search (the exact top-k frontier joins back"
            " as a marker and composes under bool)"
        )
    raise ValueError(f"unsupported query clause {kind!r}")


def _desugar_geo_shape(body: dict) -> dict:
    """ES ``geo_shape`` query over POINT docs (r13): desugar to the
    engine's existing geo kinds, one translation feeding both compilers.

    The engine's documents carry points (lat/lon columns), so the shape
    lives in the QUERY:  ``envelope`` → geo_bounding_box (ES [[west,
    north],[east,south]] spelling, dateline wrap included), ``polygon``
    → geo_polygon (outer ring; holes raise — keep hole geometry in the
    serving tier), ``circle`` → geo_distance, ``point`` → exact
    micro-degree equality. Relations for point docs: ``intersects`` ==
    ``within`` (a point intersects iff it lies within); ``disjoint`` =
    both coords exist AND NOT within (ES: missing-field docs never
    match); ``contains`` is only satisfiable by a point shape (a point
    can contain nothing bigger) — anything else raises. The body spells
    either the ES form {FIELD: {shape, relation}} (FIELD names the
    point; lat/lon columns per lat_field/lon_field) or the flat engine
    form {shape, relation, lat_field, lon_field}."""
    spec = body
    if "shape" not in spec:
        cand = {k: v for k, v in body.items()
                if k not in ("ignore_unmapped", "boost", "_name")}
        if len(cand) != 1:
            raise ValueError("geo_shape needs a shape spec")
        (_, spec), = cand.items()
    shape = spec["shape"]
    rel = str(spec.get("relation", "intersects")).lower()
    lat = spec.get("lat_field", "lat")
    lon = spec.get("lon_field", "lon")
    stype = str(shape["type"]).lower()
    coords = shape.get("coordinates")
    if rel == "contains" and stype != "point":
        raise ValueError(
            "geo_shape relation=contains over point docs is only"
            " satisfiable by a point shape"
        )
    if stype == "envelope":
        (w, n), (e, s_) = coords
        inner = {"geo_bounding_box": {
            "top_left": {"lat": float(n), "lon": float(w)},
            "bottom_right": {"lat": float(s_), "lon": float(e)},
            "lat_field": lat, "lon_field": lon}}
    elif stype == "polygon":
        if len(coords) > 1:
            raise ValueError(
                "geo_shape polygon holes are not supported — subtract"
                " the hole with a bool must_not of a second geo_shape"
            )
        inner = {"geo_polygon": {
            "points": [{"lon": float(x), "lat": float(y)}
                       for x, y in coords[0]],
            "lat_field": lat, "lon_field": lon}}
    elif stype == "circle":
        cx, cy = coords
        inner = {"geo_distance": {
            "distance": shape.get("radius", spec.get("radius")),
            "origin": {"lat": float(cy), "lon": float(cx)},
            "lat_field": lat, "lon_field": lon}}
    elif stype == "point":
        cx, cy = coords
        # half-micro-degree window — the engine's geo quantization
        # grid, spelled as ranges on the raw columns (portable)
        eps = 0.5e-6
        inner = {"bool": {"filter": [
            {"range": {lat: {"gte": float(cy) - eps,
                             "lte": float(cy) + eps}}},
            {"range": {lon: {"gte": float(cx) - eps,
                             "lte": float(cx) + eps}}},
        ]}}
    else:
        raise ValueError(
            f"geo_shape type {stype!r} unsupported (envelope / polygon"
            " / circle / point; multi* shapes: bool should over parts)"
        )
    if rel in ("intersects", "within", "contains"):
        return inner
    if rel == "disjoint":
        return {"bool": {
            "filter": [{"exists": {"field": lat}},
                       {"exists": {"field": lon}}],
            "must_not": [inner],
        }}
    raise ValueError(f"geo_shape relation {rel!r} unsupported")


def _geo_polygon_pred(body: dict, duck: bool = False) -> str:
    """ES ``geo_polygon`` query (legacy-but-ubiquitous point-in-polygon
    filter): the same exact-int64 crossing-parity ray cast the
    ``geo_polygon`` AGG uses (operators.geo._ray_cast_expr — micro-degree
    integer cross-multiplications, no float epsilon), so the query and
    agg verdicts can never disagree. ``points`` is the ES list of
    ``{lat, lon}`` dicts; ``lat_field``/``lon_field`` as elsewhere."""
    from ..operators.geo import _ray_cast_expr

    pts = body.get("points")
    if not isinstance(pts, (list, tuple)) or len(pts) < 3:
        raise ValueError("geo_polygon needs >= 3 points")
    polygon = tuple((float(p["lon"]), float(p["lat"])) for p in pts)
    lat = body.get("lat_field", "lat")
    lon = body.get("lon_field", "lon")
    px = f"CAST(ROUND({lon} * 1000000.0) AS BIGINT)"
    py = f"CAST(ROUND({lat} * 1000000.0) AS BIGINT)"
    pred = _ray_cast_expr(px, py, polygon)
    if duck:  # DuckDB has no pmod()
        pred = pred.replace("pmod(", "((").replace(
            ", 2) = 1", ") % 2 + 2) % 2 = 1"
        )
    return pred


def _nested_field(field: str, path: str):
    """Inner field name: ES spells nested fields ``path.field``; bare
    names are accepted too (the engine's struct carries the leaf name)."""
    return field[len(path) + 1:] if field.startswith(path + ".") else field


def _compile_nested_inner(q: dict, path: str, x) -> Column:
    """Compile the supported inner-clause subset over a nested array
    element ``x`` (a lambda variable Column). Kept deliberately small —
    term/terms/range/exists/match/match_phrase/bool — and LOUD beyond it
    (the flattened engine cannot nest arbitrary clause kinds inside a
    lambda without bespoke support; add kinds here as they prove needed).
    """
    (kind, body), = q.items()
    fld = lambda f: x[_nested_field(f, path)]  # noqa: E731
    if kind == "term":
        field, val = _field_value(body, "value")
        return fld(field) == F.lit(val)
    if kind == "terms":
        (field, vals), = body.items()
        if not isinstance(vals, (list, tuple)) or not vals:
            # same validation as the top-level terms branch (r14: an
            # empty list silently matched nothing here)
            raise ValueError(f"terms expects a non-empty list, got {vals!r}")
        return fld(field).isin(list(vals))
    if kind == "range":
        (field, bounds), = body.items()
        ops = {"gt": "__gt__", "gte": "__ge__", "lt": "__lt__", "lte": "__le__"}
        bounds = resolve_range_bounds(bounds)
        conds = [
            getattr(fld(field), ops[op])(F.lit(v))
            for op, v in bounds.items()
            if op not in ("format", "boost")
        ]
        if not conds:
            raise ValueError("nested range clause with no bounds")
        return _and(conds)
    if kind == "exists":
        return fld(body["field"]).isNotNull()
    if kind in ("match", "match_phrase"):
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError(f"nested {kind} with empty query")
        padded = F.concat(F.lit(" "), fld(field), F.lit(" "))
        if kind == "match_phrase":
            return padded.contains(" " + " ".join(toks) + " ")
        op = body[field].get("operator", "or") if isinstance(body[field], dict) else "or"
        conds = [padded.contains(f" {t} ") for t in toks]
        return _and(conds) if op == "and" else _or(conds)
    if kind == "bool":
        conds = [
            _compile_nested_inner(c, path, x)
            for c in (*_as_list(body.get("must")), *_as_list(body.get("filter")))
        ]
        should = [
            _compile_nested_inner(c, path, x) for c in _as_list(body.get("should"))
        ]
        if should:
            # the SAME ES rule as the top-level bool branch (ADVICE r11:
            # should beside must was wrongly required here): optional when
            # must/filter present and msm unset, else the resolved msm
            msm = body.get("minimum_should_match")
            if msm is None:
                eff = 1 if not conds else 0
            else:
                eff = calculate_min_should_match(len(should), msm)
            if eff > len(should):
                conds.append(F.lit(False))
            elif eff > 1:
                flags = [
                    F.when(F.coalesce(c, F.lit(False)), 1).otherwise(0)
                    for c in should
                ]
                total = flags[0]
                for fl in flags[1:]:
                    total = total + fl
                conds.append(total >= F.lit(int(eff)))
            elif eff == 1:
                conds.append(_or(should))
        for c in _as_list(body.get("must_not")):
            conds.append(
                ~F.coalesce(_compile_nested_inner(c, path, x), F.lit(False))
            )
        return _and(conds) if conds else F.lit(True)
    raise ValueError(f"unsupported clause {kind!r} inside nested")


def _compile_nested_inner_sql(q: dict, path: str) -> str:
    """DuckDB twin of :func:`_compile_nested_inner` over lambda var
    ``_x`` (struct field access by dot)."""
    (kind, body), = q.items()
    fld = lambda f: f"_x.{_nested_field(f, path)}"  # noqa: E731
    if kind == "term":
        field, val = _field_value(body, "value")
        return f"{fld(field)} = {_sql_lit(val)}"
    if kind == "terms":
        (field, vals), = body.items()
        if not isinstance(vals, (list, tuple)) or not vals:
            raise ValueError(f"terms expects a non-empty list, got {vals!r}")
        return f"{fld(field)} IN ({', '.join(_sql_lit(v) for v in vals)})"
    if kind == "range":
        (field, bounds), = body.items()
        ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
        bounds = resolve_range_bounds(bounds)
        conds = [
            f"{fld(field)} {ops[op]} {_sql_lit(v)}"
            for op, v in bounds.items()
            if op not in ("format", "boost")
        ]
        if not conds:
            raise ValueError("nested range clause with no bounds")
        return "(" + " AND ".join(conds) + ")"
    if kind == "exists":
        return f"{fld(body['field'])} IS NOT NULL"
    if kind in ("match", "match_phrase"):
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError(f"nested {kind} with empty query")
        padded = f"' ' || {fld(field)} || ' '"
        if kind == "match_phrase":
            return f"position({_sql_lit(' ' + ' '.join(toks) + ' ')} IN {padded}) > 0"
        op = body[field].get("operator", "or") if isinstance(body[field], dict) else "or"
        glue = " AND " if op == "and" else " OR "
        return "(" + glue.join(
            f"position({_sql_lit(' ' + t + ' ')} IN {padded}) > 0" for t in toks
        ) + ")"
    if kind == "bool":
        conds = [
            _compile_nested_inner_sql(c, path)
            for c in (*_as_list(body.get("must")), *_as_list(body.get("filter")))
        ]
        should = [
            _compile_nested_inner_sql(c, path) for c in _as_list(body.get("should"))
        ]
        if should:
            # twin parity with _compile_nested_inner: the same resolved msm
            msm = body.get("minimum_should_match")
            if msm is None:
                eff = 1 if not conds else 0
            else:
                eff = calculate_min_should_match(len(should), msm)
            if eff > len(should):
                conds.append("FALSE")
            elif eff > 1:
                total = " + ".join(
                    f"(CASE WHEN COALESCE({c}, FALSE) THEN 1 ELSE 0 END)"
                    for c in should
                )
                conds.append(f"(({total}) >= {int(eff)})")
            elif eff == 1:
                conds.append("(" + " OR ".join(should) + ")")
        for c in _as_list(body.get("must_not")):
            conds.append(f"NOT COALESCE({_compile_nested_inner_sql(c, path)}, FALSE)")
        return "(" + " AND ".join(conds) + ")" if conds else "TRUE"
    raise ValueError(f"unsupported clause {kind!r} inside nested")


def compile_query_sql(
    q: dict, dialect: str = "duckdb", now_ms: int | None = None
) -> str:
    """The same compilation to a SQL boolean expression — the oracle twin
    of :func:`compile_query`, kept clause-for-clause parallel. Every
    clause emits a spelling valid in BOTH Spark SQL and DuckDB except
    ``nested``, whose array-lambda spelling differs per engine
    (DuckDB ``len(list_filter(...))`` vs Spark ``exists(...)``) —
    ``dialect`` ("duckdb" default, the oracle consumer; or "spark")
    selects it (ADVICE r11: the old single spelling failed to parse in
    Spark). ``now_ms`` (r13, opt-in) stamps now-anchored range bounds
    via :func:`inject_now`, same contract as :func:`compile_query`."""
    if now_ms is not None:
        q = inject_now(q, now_ms)
    if dialect not in ("duckdb", "spark"):
        raise ValueError(f"unknown SQL dialect {dialect!r}")
    (kind, body), = q.items()
    desugared = desugar_compound(kind, body)
    if desugared is not None:
        return compile_query_sql(desugared, dialect)
    if kind == "query_string":
        from .query_string import translate_query_string

        return compile_query_sql(translate_query_string(body), dialect)
    if kind == "simple_query_string":
        return compile_query_sql(translate_simple_query_string(body), dialect)
    if kind == "match_all":
        return "TRUE"
    if kind == "match_none":
        return "FALSE"
    if kind == "script_score":
        # twin of compile_query's script_score: the SQL-dialect script
        # embeds directly (the caller writes portable SQL — the same
        # contract as runtime_mappings); min_score prunes, else the
        # clause reduces to its inner query (filter context)
        inner = compile_query_sql(body["query"], dialect)
        src = _script_source(body)
        if "min_score" in body:
            return f"({inner} AND ({src}) >= {float(body['min_score'])!r})"
        return inner
    if kind == "term":
        field, val = _field_value(body, "value")
        if _case_insensitive(body) and isinstance(val, str):
            return f"lower({field}) = {_sql_lit(val.lower())}"
        return f"{field} = {_sql_lit(val)}"
    if kind == "terms":
        (field, vals), = body.items()
        if not isinstance(vals, (list, tuple)) or not vals:
            # twin parity: raise exactly like compile_query
            raise ValueError(f"terms expects a non-empty list, got {vals!r}")
        return f"{field} IN ({', '.join(_sql_lit(v) for v in vals)})"
    if kind == "terms_set":
        (field, spec), = body.items()
        terms = spec.get("terms")
        if not isinstance(terms, (list, tuple)) or not terms:
            raise ValueError(f"terms_set expects a non-empty terms list, got {terms!r}")
        if "minimum_should_match_script" in spec:
            rf, cap = _msm_script_req(spec, len(terms))
            req = rf if cap is None else f"least({rf}, {int(cap)})"
        elif "minimum_should_match" in spec:
            req = str(int(spec["minimum_should_match"]))
        elif "minimum_should_match_field" in spec:
            req = spec["minimum_should_match_field"]
        else:
            raise ValueError(
                "terms_set needs minimum_should_match,"
                " minimum_should_match_field, or the documented"
                " minimum_should_match_script spellings"
            )
        # both intersect forms dedup (the ES distinct-match rule); the
        # array spelling is per-dialect (r13 — same class as `nested`)
        if dialect == "spark":
            arr = "array(" + ", ".join(_sql_lit(t) for t in terms) + ")"
            return f"(size(array_intersect({field}, {arr})) >= {req})"
        arr = "[" + ", ".join(_sql_lit(t) for t in terms) + "]"
        return f"(len(list_intersect({field}, {arr})) >= {req})"
    if kind == "range":
        (field, bounds), = body.items()
        ops = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
        conds = []
        # twin parity: the SAME compile-time date/tz resolution, so both
        # engines compare against identical epoch-ms literals
        bounds = resolve_range_bounds(bounds)
        for op, v in bounds.items():
            if op in ("format", "boost"):
                continue
            if op not in ops:  # twin parity: raise exactly like compile_query
                raise ValueError(f"unsupported range op {op!r}")
            conds.append(f"{field} {ops[op]} {_sql_lit(v)}")
        if not conds:
            raise ValueError("range clause with no bounds")
        return "(" + " AND ".join(conds) + ")"
    if kind == "exists":
        return f"{body['field']} IS NOT NULL"
    if kind == "prefix":
        # literal prefix: escape LIKE metacharacters with '!' (a backslash
        # ESCAPE char parses differently in Spark vs DuckDB string literals)
        field, val = _field_value(body, "value")
        esc = (
            str(val).replace("!", "!!").replace("%", "!%").replace("_", "!_")
        )
        like = "ILIKE" if _case_insensitive(body) else "LIKE"
        return f"{field} {like} {_sql_lit(esc + '%')} ESCAPE '!'"
    if kind == "wildcard":
        field, val = _field_value(body, "value")
        pat = (
            str(val)
            .replace("!", "!!")
            .replace("%", "!%")
            .replace("_", "!_")
            .replace("*", "%")
            .replace("?", "_")
        )
        like = "ILIKE" if _case_insensitive(body) else "LIKE"
        return f"{field} {like} {_sql_lit(pat)} ESCAPE '!'"
    if kind == "match":
        field, val = _field_value(body, "query")
        op = body[field].get("operator", "or") if isinstance(body[field], dict) else "or"
        toks = [t for t in str(val).split() if t]
        if not toks:
            # twin parity: the Column compiler raises here too
            raise ValueError("match clause with empty query")
        glue = " AND " if op == "and" else " OR "
        conds = [
            f"position({_sql_lit(' ' + t + ' ')} IN ' ' || {field} || ' ') > 0"
            for t in toks
        ]
        return "(" + glue.join(conds) + ")"
    if kind == "match_phrase":
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError("match_phrase with empty query")
        phrase = " " + " ".join(toks) + " "
        return f"position({_sql_lit(phrase)} IN ' ' || {field} || ' ') > 0"
    if kind == "match_phrase_prefix":
        field, val = _field_value(body, "query")
        toks = [t for t in str(val).split() if t]
        if not toks:
            raise ValueError("match_phrase_prefix with empty query")
        probe = " " + " ".join(toks)
        return f"contains(' ' || {field} || ' ', {_sql_lit(probe)})"
    if kind == "wrapper":
        import base64
        import json as _json

        return compile_query_sql(
            _json.loads(base64.b64decode(body["query"]).decode("utf-8")),
            dialect,
        )
    if kind == "intervals":
        # twin of compile_query's intervals subset — per-dialect position
        # HOFs (Spark filter/sequence/element_at, DuckDB
        # list_filter/range/bracket-index)
        (field, spec), = body.items()
        if set(spec) - {"match"}:
            raise ValueError(
                "intervals supports the match rule only (all_of/any_of"
                " trees: compose bool over two-token intervals, or use"
                " operators.search.intervals_near)"
            )
        m = spec["match"]
        toks = [t for t in str(m["query"]).lower().split() if t]
        if len(toks) == 1:
            # lowered-text containment — twin of the Column path (r14)
            return (
                f"position({_sql_lit(' ' + toks[0] + ' ')}"
                f" IN ' ' || lower({field}) || ' ') > 0"
            )
        if len(toks) != 2:
            raise ValueError(
                "intervals match supports 1-2 tokens (3+ ordered chains:"
                " operators.search.intervals_near per pair)"
            )
        gaps = int(m.get("max_gaps", -1))
        ordered = bool(m.get("ordered", False))
        # token list bound ONCE per row (the es_span let-binding
        # discipline): leaves reference the lambda var, never re-split
        if dialect == "spark":
            split = f"split(lower({field}), ' ')"

            def _pos(t):
                return (
                    "filter(sequence(1, size(__tk)),"
                    f" i -> element_at(__tk, i) = {_sql_lit(t)})"
                )
        else:
            split = f"string_split(lower({field}), ' ')"

            def _pos(t):
                return (
                    "list_filter(range(1, len(__tk) + 1),"
                    f" i -> __tk[i] = {_sql_lit(t)})"
                )
        dist = "(b - a)" if ordered else "abs(a - b)"
        cond = f"{dist} > 0" if ordered else f"{dist} != 0"
        if gaps >= 0:
            cond = f"({cond} AND {dist} - 1 <= {gaps})"
        if dialect == "spark":
            inner = (
                f"exists({_pos(toks[0])}, a ->"
                f" exists({_pos(toks[1])}, b -> {cond}))"
            )
            return (
                f"(element_at(transform(array({split}),"
                f" __tk -> {inner}), 1))"
            )
        inner = (
            f"len(list_filter({_pos(toks[0])}, a ->"
            f" len(list_filter({_pos(toks[1])}, b -> {cond})) > 0)) > 0"
        )
        return (
            f"((list_transform([{split}], __tk -> {inner}))[1])"
        )
    if kind == "fuzzy":
        field, val = _field_value(body, "value")
        spec = body[field] if isinstance(body[field], dict) else {}
        fz = spec.get("fuzziness", "AUTO")
        if fz == "AUTO":
            n = len(str(val))
            fz = 0 if n <= 2 else (1 if n <= 5 else 2)
        if _case_insensitive(body):
            return (
                f"levenshtein(lower({field}),"
                f" {_sql_lit(str(val).lower())}) <= {int(fz)}"
            )
        return f"levenshtein({field}, {_sql_lit(str(val))}) <= {int(fz)}"
    if kind == "regexp":
        field, val = _field_value(body, "value")
        # both engines' regex tests are unanchored; wrap for the ES
        # full-match rule. Function name is per-dialect (r13):
        # DuckDB regexp_matches (RE2), Spark RLIKE (Java regex)
        ci = "(?i)" if _case_insensitive(body) else ""
        pat = _sql_lit(f"{ci}^(?:" + str(val) + ")$")
        if dialect == "spark":
            return f"({field} RLIKE {pat})"
        return f"regexp_matches({field}, {pat})"
    if kind == "ids":
        field = body.get("field", "doc_id")
        vals = body["values"]
        return f"{field} IN ({', '.join(_sql_lit(v) for v in vals)})"
    if kind == "geo_shape":
        return compile_query_sql(_desugar_geo_shape(body), dialect)
    if kind == "geo_bounding_box":
        lat, lon, tl, br = _geo_fields(body)
        if tl["lon"] > br["lon"]:  # dateline wrap — see compile_query
            return (
                f"({lat} <= {tl['lat']!r} AND {lat} >= {br['lat']!r}"
                f" AND ({lon} >= {tl['lon']!r} OR {lon} <= {br['lon']!r}))"
            )
        return (
            f"({lat} <= {tl['lat']!r} AND {lat} >= {br['lat']!r}"
            f" AND {lon} >= {tl['lon']!r} AND {lon} <= {br['lon']!r})"
        )
    if kind == "geo_distance":
        from ..operators.geo import _haversine_m

        lat = body.get("lat_field", "lat")
        lon = body.get("lon_field", "lon")
        olat, olon = body["origin"]["lat"], body["origin"]["lon"]
        dist_m = _parse_distance_m(body["distance"])
        return f"({_haversine_m(lat, lon, olat, olon)} <= {dist_m!r})"
    if kind == "geo_polygon":
        return f"({_geo_polygon_pred(body, duck=dialect == 'duckdb')})"
    if kind == "nested":
        path, inner = body["path"], body.get("query")
        if inner is None:
            raise ValueError("nested needs a query")
        pred = _compile_nested_inner_sql(inner, path)
        if dialect == "spark":
            return f"(exists({path}, _x -> {pred}))"
        return f"(len(list_filter({path}, _x -> {pred})) > 0)"
    if kind == "bool":
        msm = body.get("minimum_should_match")
        conds = [compile_query_sql(c, dialect) for c in _as_list(body.get("must"))]
        conds += [compile_query_sql(c, dialect) for c in _as_list(body.get("filter"))]
        should = [compile_query_sql(c, dialect) for c in _as_list(body.get("should"))]
        if should:
            # twin parity with compile_query: the SAME compile-time
            # integer from the shared Lucene spec resolver
            if msm is None:
                eff = 1 if not conds else 0
            else:
                eff = calculate_min_should_match(len(should), msm)
            if eff > len(should):
                conds.append("FALSE")
            elif eff > 1:
                total = " + ".join(
                    f"(CASE WHEN COALESCE({c}, FALSE) THEN 1 ELSE 0 END)"
                    for c in should
                )
                conds.append(f"(({total}) >= {int(eff)})")
            elif eff == 1:
                conds.append("(" + " OR ".join(should) + ")")
        for c in _as_list(body.get("must_not")):
            conds.append(f"NOT COALESCE({compile_query_sql(c, dialect)}, FALSE)")
        return "(" + " AND ".join(conds) + ")" if conds else "TRUE"
    if kind in ("has_child", "has_parent"):
        raise ValueError(
            f"{kind} is a two-frame JOIN kind — a single-frame predicate"
            " cannot express it; use functions.es_dsl.apply_query(df,"
            " query, relations={name: (other_frame, key_on_df,"
            " key_on_other)}) or run_search(..., relations=...)"
        )
    if kind.startswith("span_") or kind == "field_masking_span":
        # r13: span family — same generator as compile_query, this
        # dialect's string (functions.es_span)
        from .es_span import compile_span_sql

        return compile_span_sql({kind: body}, dialect)
    if kind == "knn":
        raise ValueError(
            "knn is a frame-level TOP-K kind — no single-frame SQL"
            " predicate expresses it; oracle it as a scored-frontier"
            " CTE + semi-join (see es_dsl_knn_query's twin)"
        )
    raise ValueError(f"unsupported query clause {kind!r}")


def _geo_fields(body: dict):
    """(lat_col, lon_col, top_left, bottom_right) — relational geo points
    are two columns (engine extension ``lat_field``/``lon_field``,
    defaulting to ``lat``/``lon``)."""
    lat = body.get("lat_field", "lat")
    lon = body.get("lon_field", "lon")
    return lat, lon, body["top_left"], body["bottom_right"]


def _parse_distance_m(d) -> float:
    """ES distance strings (``"500km"``, ``"100m"``, ``"10mi"``) or a bare
    number of meters."""
    if isinstance(d, (int, float)):
        return float(d)
    s = str(d).strip().lower()
    for suf, mult in (("km", 1000.0), ("mi", 1609.344), ("m", 1.0)):
        if s.endswith(suf):
            return float(s.removesuffix(suf)) * mult
    raise ValueError(f"cannot parse distance {d!r}")


def _field_value(body: dict, value_key: str):
    (field, spec), = body.items()
    if isinstance(spec, dict):
        return field, spec[value_key]
    return field, spec


def _case_insensitive(body: dict) -> bool:
    """The ES ``case_insensitive`` flag on term-level clauses
    (term/prefix/wildcard/regexp/fuzzy) — r14: previously silently
    ignored, violating the module's fail-loud contract."""
    (_, spec), = body.items()
    return bool(spec.get("case_insensitive")) if isinstance(spec, dict) else False


def _as_list(x):
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


def _and(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _or(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v)
    if "\\" in s:
        # backslashes are escape-processed by Spark's SQL parser but NOT
        # by DuckDB's, so a quoted spelling cannot be dialect-portable —
        # splice them in as chr(92) (both engines), keeping the twins'
        # identical-predicate contract (r14 review finding)
        parts = []
        for i, chunk in enumerate(s.split("\\")):
            if i:
                parts.append("chr(92)")
            if chunk:
                parts.append("'" + chunk.replace("'", "''") + "'")
        return "(" + " || ".join(parts) + ")"
    return "'" + s.replace("'", "''") + "'"


def collect_highlight_terms(q: dict, field: str) -> list[str]:
    """The query's matched tokens for ``field`` — what ``highlight`` wraps.

    Walks the clause tree the same way :func:`compile_query` compiles it:
    ``term``/``terms`` values, ``match``/``match_phrase`` whitespace
    tokens (the engine's analyzer-free token dialect — a phrase
    highlights per-term, the unified highlighter's default), recursing
    through ``bool`` ``must``/``should``/``filter``. ``must_not`` is
    skipped: a doc in the result set cannot contain those tokens. Clause
    kinds with no token semantics (range/exists/prefix/...) contribute
    nothing. Order is first-seen, de-duplicated."""
    out: list[str] = []

    def add(ts):
        for t in ts:
            t = str(t)
            if t and t not in out:
                out.append(t)

    def walk(node: dict):
        if not isinstance(node, dict) or len(node) != 1:
            return
        (kind, body), = node.items()
        # desugar compounds exactly like compile_query does (r14: a
        # multi_match/constant_score/dis_max/simple_query_string query
        # previously highlighted nothing)
        desugared = desugar_compound(kind, body)
        if desugared is not None:
            walk(desugared)
            return
        if kind == "query_string":
            from .query_string import translate_query_string

            walk(translate_query_string(body))
            return
        if kind == "simple_query_string":
            walk(translate_simple_query_string(body))
            return
        if kind == "bool":
            for sect in ("must", "should", "filter"):
                for sub in _as_list(body.get(sect)):
                    walk(sub)
            return
        if kind in ("term", "terms", "match", "match_phrase"):
            (f, spec), = body.items()
            if f != field:
                return
            if kind == "term":
                add([spec["value"] if isinstance(spec, dict) else spec])
            elif kind == "terms":
                add(spec)
            else:
                val = spec["query"] if isinstance(spec, dict) else spec
                add(str(val).split())

    walk(q)
    return out


# ---------------------------------------------------------------------------
# parent/child JOIN query kinds (r12): has_child / has_parent
# ---------------------------------------------------------------------------

def _rewrite_join_clauses(
    q: dict, relations: dict, sinks: list, inner_sink: list | None = None
) -> dict:
    """Walk a query tree, replacing each ``has_child`` / ``has_parent``
    node with a boolean-marker ``term`` over a synthetic flag column and
    recording how to materialize that flag (one aggregate over the other
    frame + a LEFT join on the join key). Recurses through ``bool``
    sections only — a join kind buried inside any other compound raises
    in compile_query afterwards (loud, never silently dropped).

    ``inner_sink`` (r12): when a list is provided (the ``run_search``
    route), an ``inner_hits`` spec on a join clause is RECORDED there
    (relation name, matched other-side frame, join keys, spec) instead
    of raising — run_search materializes the reserved ``"_inner_hits"``
    frame from it. The direct :func:`apply_query` route keeps the loud
    raise (it returns exactly one frame).

    ``parent_id`` (r13): in ES the child doc stores its parent id in the
    join field, so the clause is literally an equality filter on the
    relation's LOCAL join key — rewritten to a plain ``term``, no join,
    no aggregate."""
    (kind, body), = q.items()
    if kind == "parent_id":
        name = body.get("type")
        if not name:
            raise ValueError("parent_id needs type (the relation name)")
        if name not in relations:
            raise ValueError(
                f"parent_id relation {name!r} is not declared — pass"
                " relations={name: (other_frame, key_on_this_frame,"
                " key_on_other_frame)}"
            )
        if "id" not in body:
            raise ValueError("parent_id needs id")
        _, local_key, _ = relations[name]
        return {"term": {local_key: body["id"]}}
    if kind in ("has_child", "has_parent"):
        if "inner_hits" in body and inner_sink is None:
            raise ValueError(
                f"{kind} inner_hits needs the run_search route (the"
                " reserved '_inner_hits' frame) — apply_query returns"
                " exactly one frame; or run a second _search over the"
                " other frame with the same inner query"
            )
        rel_key = "type" if kind == "has_child" else "parent_type"
        name = body.get(rel_key)
        if not name:
            raise ValueError(f"{kind} needs {rel_key}")
        if name not in relations:
            raise ValueError(
                f"{kind} relation {name!r} is not declared — pass"
                " relations={name: (other_frame, key_on_this_frame,"
                " key_on_other_frame)}"
            )
        inner = body.get("query")
        if inner is None:
            raise ValueError(f"{kind} needs a query")
        other, local_key, other_key = relations[name]
        i = len(sinks)
        flag, keycol = f"__rel{i}_match", f"__rel{i}_key"
        matched = other.where(compile_query(inner))
        if kind == "has_child":
            mn = int(body.get("min_children", 1))
            mx = body.get("max_children")
            if mn < 1:
                raise ValueError(
                    "has_child min_children=0 also matches parents with NO"
                    " children — express that as a should of has_child and"
                    " a must_not of an unconstrained has_child"
                )
            if mn > 1 or mx is not None:
                cnt = matched.groupBy(
                    F.col(other_key).alias(keycol)
                ).agg(F.count(F.lit(1)).alias("__c"))
                cond = F.col("__c") >= F.lit(mn)
                if mx is not None:
                    cond = cond & (F.col("__c") <= F.lit(int(mx)))
                keys = cnt.where(cond).select(
                    keycol, F.lit(True).alias(flag)
                )
            else:
                keys = (
                    matched.select(F.col(other_key).alias(keycol))
                    .distinct()
                    .withColumn(flag, F.lit(True))
                )
        else:
            keys = (
                matched.select(F.col(other_key).alias(keycol))
                .distinct()
                .withColumn(flag, F.lit(True))
            )
        sinks.append((flag, keycol, keys, local_key))
        if "inner_hits" in body and inner_sink is not None:
            inner_sink.append({
                "name": body["inner_hits"].get("name", name),
                "matched": matched,
                "other_key": other_key,
                "local_key": local_key,
                "spec": body["inner_hits"],
            })
        return {"term": {flag: True}}
    if kind == "bool":
        nb: dict = {}
        for sect in ("must", "filter", "should", "must_not"):
            if sect in body:
                nb[sect] = [
                    _rewrite_join_clauses(c, relations, sinks, inner_sink)
                    for c in _as_list(body[sect])
                ]
        for extra, v in body.items():
            if extra not in nb:
                nb[extra] = v
        return {"bool": nb}
    return q


def tree_has_kind(q, kinds) -> bool:
    """True when any clause kind in ``kinds`` appears in a query tree
    (walking bool sections and nested clause dicts)."""
    if isinstance(q, dict):
        for k, v in q.items():
            if k in kinds:
                return True
            if tree_has_kind(v, kinds):
                return True
    elif isinstance(q, (list, tuple)):
        return any(tree_has_kind(v, kinds) for v in q)
    return False


def _rewrite_terms_lookup(q: dict, frames: dict) -> dict:
    """ES ``terms`` LOOKUP form (r13): ``{"terms": {FIELD: {"index":
    name, "id": X, "path": col, "id_field": idcol}}}``. ES resolves this
    on the COORDINATING node — a point GET of one document, whose
    ``path`` array becomes the term list — before the query fans out;
    the engine does exactly that: ONE bounded collect of the lookup row
    (``frames[name]`` filtered to ``id_field == id``, default
    ``doc_id``), rewritten to a plain ``terms`` clause. O(1) driver
    work at any corpus scale; a missing or duplicated lookup id raises
    (ES returns no-match on a missing doc — silently matching nothing
    is the one behavior a loud engine refuses)."""
    (kind, body), = q.items()
    if kind == "terms":
        (field, spec), = body.items()
        if not isinstance(spec, dict):
            return q
        name = spec.get("index")
        if name is None:
            return q
        if name not in frames:
            raise ValueError(
                f"terms lookup index {name!r} is not registered — pass"
                " frames={name: DataFrame}"
            )
        id_field = spec.get("id_field", "doc_id")
        rows = (
            frames[name]
            .where(F.col(id_field) == F.lit(spec["id"]))
            .select(spec["path"])
            .limit(2)
            .collect()
        )
        if len(rows) != 1:
            raise ValueError(
                f"terms lookup {name}/{spec['id']!r} matched"
                f" {len(rows)} rows — the lookup id must identify"
                " exactly one document"
            )
        terms = rows[0][0]
        if terms is None:
            terms = []
        if not isinstance(terms, (list, tuple)):
            terms = [terms]
        return {"terms": {field: list(terms)}}
    if kind == "bool":
        nb: dict = {}
        for sect in ("must", "filter", "should", "must_not"):
            if sect in body:
                nb[sect] = [
                    _rewrite_terms_lookup(c, frames)
                    for c in _as_list(body[sect])
                ]
        for extra, v in body.items():
            if extra not in nb:
                nb[extra] = v
        return {"bool": nb}
    # recurse into the join kinds' inner query and knn pre-filters (r14:
    # a lookup buried there previously reached compile_query unrewritten
    # and raised a misleading "non-empty list" error)
    if kind in ("has_child", "has_parent") and "query" in body:
        nb = dict(body)
        nb["query"] = _rewrite_terms_lookup(body["query"], frames)
        return {kind: nb}
    if kind == "knn" and "filter" in body:
        nb = dict(body)
        flt = body["filter"]
        if isinstance(flt, dict):
            nb["filter"] = _rewrite_terms_lookup(flt, frames)
        else:
            nb["filter"] = [
                _rewrite_terms_lookup(c, frames) for c in flt
            ]
        return {kind: nb}
    return q


def _rewrite_knn_clauses(q: dict, df, sinks: list) -> dict:
    """Replace each ``knn`` QUERY node (ES 8.12+ DSL kind, distinct from
    the top-level knn section) with a boolean marker: the node's exact
    top-k frontier — scan → spec-``filter`` → HOF cosine/dot score →
    TakeOrdered(k) on (score desc, id asc), per-partition heaps — keyed
    by ``id_field`` (default ``doc_id``; ES keys on ``_id``), joined
    back LEFT as a k-row broadcast. Exact search: ``num_candidates`` is
    an HNSW recall knob, accepted as the k default (the ES knn-query
    contract: it retrieves ``num_candidates`` hits) but recall here is
    1.0. Composes under bool: sibling clauses intersect the frontier —
    ES's post-filter semantics for knn inside bool."""
    (kind, body), = q.items()
    if kind == "knn":
        from .es_search import _knn_scored

        spec = dict(body)
        k = int(spec.get("k", spec.get("num_candidates", 10)))
        id_field = spec.get("id_field", "doc_id")
        if id_field not in df.columns:
            raise ValueError(
                f"knn id_field {id_field!r} is not a column — the engine"
                " keys the frontier on an id column (ES uses _id); pass"
                " id_field"
            )
        i = len(sinks)
        flag, keycol = f"__knn{i}_match", f"__knn{i}_key"
        # ES knn-QUERY `similarity`: a NUMERIC minimum similarity (the
        # radius filter — distinct from the top-level section where the
        # same key names the METRIC); docs below it drop even inside k.
        # Exact search: top-k then threshold == threshold then top-k.
        # The metric for a thresholded query comes from the explicit
        # `metric` key (r14: the numeric threshold used to silently
        # force cosine, making non-cosine radii wrong/empty); the raw-
        # metric radius converts to the transformed _score_q scale per
        # metric, the ES knn-query contract.
        min_sim = None
        if isinstance(spec.get("similarity"), (int, float)) and not isinstance(
            spec.get("similarity"), bool
        ):
            spec = dict(spec)
            min_sim = float(spec.pop("similarity"))
            if "metric" in spec:
                spec["similarity"] = spec.pop("metric")
        frontier = _knn_scored(df, spec, keep=[id_field]).limit(k)
        if min_sim is not None:
            sim = spec.get("similarity", "cosine")
            if sim == "l2_norm":
                # radius r on the raw distance: d <= r ⇔ transformed
                # score 1/(1+d²) >= 1/(1+r²)
                thr = 1e6 / (1.0 + min_sim * min_sim)
            elif sim == "max_inner_product":
                # the same piecewise monotone transform _knn_scored uses
                thr = 1e6 * (
                    1.0 / (1.0 - min_sim) if min_sim < 0 else min_sim + 1.0
                )
            else:  # cosine / dot_product: raw IS the score
                thr = min_sim * 1e6
            frontier = frontier.where(
                F.col("_score_q") >= int(math.floor(thr))
            )
        keys = (
            frontier
            .select(F.col(id_field).alias(keycol))
            .withColumn(flag, F.lit(True))
        )
        sinks.append((flag, keycol, keys, id_field))
        return {"term": {flag: True}}
    if kind == "bool":
        nb: dict = {}
        for sect in ("must", "filter", "should", "must_not"):
            if sect in body:
                nb[sect] = [
                    _rewrite_knn_clauses(c, df, sinks)
                    for c in _as_list(body[sect])
                ]
        for extra, v in body.items():
            if extra not in nb:
                nb[extra] = v
        return {"bool": nb}
    # NOTE deliberately no recursion into has_child/has_parent here: a
    # knn node inside a join clause's inner query would have to score
    # against the OTHER side's frame, not `df` — rewriting it against
    # the wrong frame would be silently wrong, so it stays loud at
    # compile_query ("unsupported clause knn") naming the limitation.
    return q


def apply_query(
    df, query: dict, relations: dict | None = None,
    _inner_sink: list | None = None, now_ms: int | None = None,
    frames: dict | None = None,
):
    """ES query execution at the DATAFRAME level: the full
    :func:`compile_query` clause set PLUS the parent/child join kinds
    ``has_child`` / ``has_parent``, which a single-frame Column predicate
    cannot express (ES join-field mapping, es-8.18.2 join datatype docs).

    ``relations`` maps each ES relation name to the other side of the
    join: ``{name: (other_frame, key_on_this_frame, key_on_other_frame)}``.

    - ``has_child {"type": name, "query": Q, "min_children": m,
      "max_children": M}`` keeps rows of ``df`` (the parents) whose count
      of rows in ``relations[name]`` matching ``Q`` lies in ``[m, M]``
      (ES defaults m=1, M unbounded). ``score_mode`` is score-shaping
      only and is ignored in filter context; ``inner_hits`` raises.
    - ``has_parent {"parent_type": name, "query": Q}`` keeps rows of
      ``df`` (the children) whose parent row matches ``Q``; ``score`` is
      score-only and ignored.

    Execution shape (the 100 TB design): each join clause becomes ONE
    aggregate over the other frame — the distinct matching join keys, or
    ``(key, count)`` when min/max_children constrain — then a LEFT join
    marker on the join key: an equi-shuffle on exactly the key ES routes
    parent+child docs on. AQE broadcasts the key set when it is small;
    bucketing both frames on the join key makes the join co-located at
    rest. The marker column is an ordinary boolean, so the clause
    composes under ``bool``/``should``/``must_not`` (a parent with no
    matching children carries NULL → no-match in filter context, which
    must_not keeps — ES parity); markers drop from the output.

    ``_inner_sink`` is the run_search plumbing for ``inner_hits`` (see
    :func:`_rewrite_join_clauses`); direct callers leave it None.
    ``now_ms`` (r13, opt-in) stamps now-anchored range bounds via
    :func:`inject_now` before compilation — the run_search serving shim,
    available on this bare route too."""
    if now_ms is not None:
        query = inject_now(query, now_ms)
    if frames:
        query = _rewrite_terms_lookup(query, frames)
    sinks: list = []
    q2 = (
        _rewrite_join_clauses(query, relations, sinks, _inner_sink)
        if relations else query
    )
    if tree_has_kind(q2, ("knn",)):
        q2 = _rewrite_knn_clauses(q2, df, sinks)
    if not sinks:
        return df.where(compile_query(q2))
    for flag, keycol, keys, local_key in sinks:
        df = df.join(
            keys, F.col(local_key) == F.col(keycol), "left"
        ).drop(keycol)
    return df.where(compile_query(q2)).drop(*[s[0] for s in sinks])


def inject_now(node, now_ms: int):
    """Serving-edge default for now-anchored date math (r12).

    The compilers demand an explicit ``now`` (epoch ms) on every
    now-anchored range bound — the reproducibility contract (ES reads
    the coordinator clock; a replayed query must not drift). This shim
    is the EDGE's one sanctioned place to stamp that clock: it walks a
    query/body tree and returns a deep copy where every ``range`` field
    spec carrying a now-anchored bound and NO explicit ``now`` gains
    ``"now": now_ms``. An explicit ``now`` always wins (never
    overwritten), so stamped bodies replay byte-stable — log the
    STAMPED body, not the raw one. Non-range nodes and non-now bounds
    pass through untouched."""
    now_ms = int(now_ms)
    if isinstance(node, list):
        return [inject_now(c, now_ms) for c in node]
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k == "range" and isinstance(v, dict):
            nv = {}
            for field, spec in v.items():
                if (
                    isinstance(spec, dict)
                    and "now" not in spec
                    and any(
                        isinstance(b, str) and b.startswith("now")
                        for op, b in spec.items()
                        if op in ("gt", "gte", "lt", "lte")
                    )
                ):
                    spec = {**spec, "now": now_ms}
                nv[field] = spec
            out[k] = nv
        else:
            out[k] = inject_now(v, now_ms)
    return out
