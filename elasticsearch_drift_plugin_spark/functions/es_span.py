"""ES ``span_*`` query family compiled to single-pass token-position HOFs.

Host-ES query surface (the reference plugin runs inside an Elasticsearch
``_search`` pipeline, so every body its users send may carry span
clauses around the ``proportional_sum`` agg —
reference: es-8.18.2 integration harness posts full ``_search`` bodies).
Lucene executes spans with per-segment position iterators; the Spark
re-expression is row-local and shuffle-free: each document computes its
matching *span set* with nested array HOFs (``filter`` / ``transform``
/ ``flatten`` over the whitespace-lowercase token list — the engine's
analyzer-free text dialect), and the clause is true when the set is
non-empty. No explode, no join, no Python — the plan shape at 100 TB is
the same scan-side predicate every other clause compiles to. HOF
expressions are evaluated INTERPRETED per row (Catalyst does not
whole-stage-codegen lambda functions), so the generator let-binds the
tokenized list once per row (see :func:`compile_span_sql`) — measured
~11x at sf0.1 vs inline re-splitting at every leaf.

Span representation: ``struct(s, e, g)`` where ``s`` is the 1-based
start token position, ``e`` the exclusive end, and ``g`` the gap budget
already spent by enclosing ``span_near`` folds (leaves carry 0; inner
gaps of a nested near do NOT count against the outer slop — Lucene
treats a sub-span as an opaque interval).

Supported kinds (the documented subset; anything richer raises naming
the alternative):

- ``span_term`` — one token, exact (lowercased).
- ``span_multi`` — ``prefix`` / ``wildcard`` / ``regexp`` / ``fuzzy``
  inner queries matched per token.
- ``span_or`` — union of same-field clause span sets.
- ``span_near`` — ``in_order: true`` over any clause count (left fold,
  slop pruned at every step); ``in_order: false`` over exactly TWO
  clauses (both orders, non-overlapping — the Lucene unordered rule);
  3+ unordered raises naming ordered chains / bool-of-pairs.
- ``span_first`` — spans ending within the first ``end`` tokens
  (Lucene ``SpanFirstQuery``: a span over the first token has end 1).
- ``span_not`` — ``include`` spans no ``exclude`` span overlaps, the
  overlap region widened by ``pre`` tokens before / ``post`` after
  (``dist`` sets both, the ES spelling).
- ``span_containing`` / ``span_within`` — big spans holding a little
  span / little spans inside a big span.

``span_field_masking`` is out of scope: it exists to mix per-field
analyzers, and this engine has exactly one text dialect (SCOPE §D).

All clauses under one span tree must target the SAME field (the ES
rule; mixed fields raise). Both engines compile from the same
generator: Spark executes ``F.expr`` of the ``"spark"`` dialect string,
the DuckDB oracle the ``"duckdb"`` dialect string.
"""

from __future__ import annotations

import itertools

_SPAN_KINDS = frozenset(
    {
        "span_term",
        "span_multi",
        "span_or",
        "span_near",
        "span_first",
        "span_not",
        "span_containing",
        "span_within",
    }
)


def is_span_kind(kind: str) -> bool:
    if kind == "span_field_masking" or kind == "field_masking_span":
        raise ValueError(
            "span_field_masking is out of scope: it remaps per-field"
            " analyzers and this engine has one text dialect (SCOPE §D);"
            " target the real field directly"
        )
    return kind in _SPAN_KINDS


def _sql_lit(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _flt(d: str, arr: str, var: str, pred: str) -> str:
    fn = "filter" if d == "spark" else "list_filter"
    return f"{fn}({arr}, {var} -> {pred})"


def _xf(d: str, arr: str, var: str, expr: str) -> str:
    fn = "transform" if d == "spark" else "list_transform"
    return f"{fn}({arr}, {var} -> {expr})"


def _sz(d: str, arr: str) -> str:
    return (f"size({arr})" if d == "spark" else f"len({arr})")


def _exists(d: str, arr: str, var: str, pred: str) -> str:
    if d == "spark":
        return f"exists({arr}, {var} -> {pred})"
    return f"(len(list_filter({arr}, {var} -> {pred})) > 0)"


def _st(d: str, s: str, e: str, g: str) -> str:
    if d == "spark":
        return f"named_struct('s', {s}, 'e', {e}, 'g', {g})"
    return f"{{'s': {s}, 'e': {e}, 'g': {g}}}"


def _concat(d: str, parts: list[str]) -> str:
    if len(parts) == 1:
        return parts[0]
    if d == "spark":
        return "concat(" + ", ".join(parts) + ")"
    out = parts[0]
    for p in parts[1:]:
        out = f"list_concat({out}, {p})"
    return out


def _tokens(d: str, field: str) -> str:
    if d == "spark":
        return f"split(lower({field}), ' ')"
    return f"string_split(lower({field}), ' ')"


def _positions(d: str, lst: str, pred_of_tok, ctr) -> str:
    """Span set of width-1 spans at token positions satisfying ``pred``.

    ``lst`` is the token-list EXPRESSION — under :func:`compile_span_sql`
    it is a lambda variable bound once per row (see the let-binding
    note there), so leaves never re-split the text."""
    i = f"i{next(ctr)}"
    tok = f"element_at({lst}, {i})" if d == "spark" else f"{lst}[{i}]"
    seq = (
        f"sequence(1, size({lst}))"
        if d == "spark"
        else f"range(1, len({lst}) + 1)"
    )
    hits = _flt(d, seq, i, pred_of_tok(tok))
    j = f"i{next(ctr)}"
    return _xf(d, hits, j, _st(d, j, f"{j} + 1", "0"))


def span_field(node: dict) -> str:
    """The single field a span tree targets; raise on mixed/none."""
    fields = set()

    def walk(n):
        if not isinstance(n, dict) or len(n) != 1:
            raise ValueError(f"expected a single-clause span dict, got {n!r}")
        (kind, body), = n.items()
        if kind == "span_term":
            (f,), = (list(body.keys()),)
            fields.add(f)
        elif kind == "span_multi":
            (_, inner), = body["match"].items()
            (f,), = (list(inner.keys()),)
            fields.add(f)
        elif kind == "span_or":
            for c in body["clauses"]:
                walk(c)
        elif kind == "span_near":
            for c in body["clauses"]:
                walk(c)
        elif kind == "span_first":
            walk(body["match"])
        elif kind == "span_not":
            walk(body["include"])
            walk(body["exclude"])
        elif kind in ("span_containing", "span_within"):
            walk(body["big"])
            walk(body["little"])
        else:
            is_span_kind(kind)  # raises for field_masking
            raise ValueError(f"unsupported span clause {kind!r}")

    walk(node)
    if len(fields) != 1:
        raise ValueError(
            f"span clauses must all target ONE field (the ES rule); got"
            f" {sorted(fields)!r}"
        )
    return fields.pop()


def _leaf_value(body: dict, field: str, key: str = "value"):
    spec = body[field]
    return spec[key] if isinstance(spec, dict) else spec


def span_set_sql(
    node: dict, dialect: str, ctr=None, lst: str | None = None
) -> str:
    """SQL expression producing this span tree's matching span set
    (``array<struct<s,e,g>>``) for one document row. ``lst`` overrides
    the token-list expression (the let-binding route); without it the
    field tokenizes inline per leaf."""
    if ctr is None:
        ctr = itertools.count()
    d = dialect
    (kind, body), = node.items()

    def _lst(field):
        return lst if lst is not None else _tokens(d, field)

    if kind == "span_term":
        (field,), = (list(body.keys()),)
        val = str(_leaf_value(body, field)).lower()
        if " " in val or not val:
            raise ValueError(
                "span_term takes exactly one token (phrases: span_near"
                " with slop 0, in_order true)"
            )
        return _positions(
            d, _lst(field), lambda t: f"{t} = {_sql_lit(val)}", ctr
        )

    if kind == "span_multi":
        (mkind, inner), = body["match"].items()
        (field,), = (list(inner.keys()),)
        if mkind == "prefix":
            val = str(_leaf_value(inner, field)).lower()
            return _positions(
                d,
                _lst(field),
                lambda t: f"substr({t}, 1, {len(val)}) = {_sql_lit(val)}",
                ctr,
            )
        if mkind == "wildcard":
            import re as _re

            val = str(_leaf_value(inner, field)).lower()
            pat = "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in val
            )
            mkind, inner = "regexp", {field: pat}
        if mkind == "regexp":
            val = str(_leaf_value(inner, field))
            pat = _sql_lit(f"^(?:{val})$")
            if d == "spark":
                return _positions(
                    d, _lst(field), lambda t: f"{t} RLIKE {pat}", ctr
                )
            return _positions(
                d, _lst(field), lambda t: f"regexp_matches({t}, {pat})", ctr
            )
        if mkind == "fuzzy":
            val = str(_leaf_value(inner, field)).lower()
            spec = inner[field] if isinstance(inner[field], dict) else {}
            fz = spec.get("fuzziness", "AUTO")
            if fz == "AUTO":
                n = len(val)
                fz = 0 if n <= 2 else (1 if n <= 5 else 2)
            return _positions(
                d,
                _lst(field),
                lambda t: f"levenshtein({t}, {_sql_lit(val)}) <= {int(fz)}",
                ctr,
            )
        raise ValueError(
            f"span_multi supports prefix/wildcard/regexp/fuzzy, got {mkind!r}"
        )

    if kind == "span_or":
        parts = [span_set_sql(c, d, ctr, lst) for c in body["clauses"]]
        if not parts:
            raise ValueError("span_or with no clauses")
        return _concat(d, parts)

    if kind == "span_near":
        clauses = body["clauses"]
        if len(clauses) < 2:
            raise ValueError("span_near needs >= 2 clauses")
        slop = int(body.get("slop", 0))
        if slop < 0:
            raise ValueError("span_near slop must be >= 0 (ES rejects"
                             " negative slop)")
        in_order = bool(body.get("in_order", True))
        sets = [span_set_sql(c, d, ctr, lst) for c in clauses]
        if not in_order:
            if len(clauses) != 2:
                raise ValueError(
                    "span_near in_order:false supports exactly 2 clauses"
                    " (3+: chain ordered nears, or bool over pairs)"
                )
            a, b = f"a{next(ctr)}", f"b{next(ctr)}"
            gap = (
                f"(CASE WHEN {b}.s >= {a}.e THEN {b}.s - {a}.e"
                f" ELSE {a}.s - {b}.e END)"
            )
            ok = (
                f"(({b}.s >= {a}.e OR {b}.e <= {a}.s)"
                f" AND {gap} <= {slop})"
            )
            inner = _xf(
                d,
                _flt(d, sets[1], b, ok),
                b,
                # merged g is 0, not the internal gap: a nested
                # unordered near is opaque to any enclosing near
                # (Lucene sub-span rule)
                _st(
                    d,
                    f"least({a}.s, {b}.s)",
                    f"greatest({a}.e, {b}.e)",
                    "0",
                ),
            )
            return f"flatten({_xf(d, sets[0], a, inner)})"
        # seed with g reset to 0: a nested near's internal gaps must NOT
        # charge the outer slop (sub-spans are opaque intervals) — later
        # clause positions discard b.g naturally, the seed must too
        z = f"z{next(ctr)}"
        acc = _xf(d, sets[0], z, _st(d, f"{z}.s", f"{z}.e", "0"))
        for nxt in sets[1:]:
            a, b = f"a{next(ctr)}", f"b{next(ctr)}"
            step_gap = f"({b}.s - {a}.e)"
            ok = f"({b}.s >= {a}.e AND {a}.g + {step_gap} <= {slop})"
            inner = _xf(
                d,
                _flt(d, nxt, b, ok),
                b,
                _st(d, f"{a}.s", f"{b}.e", f"{a}.g + {step_gap}"),
            )
            acc = f"flatten({_xf(d, acc, a, inner)})"
        return acc

    if kind == "span_first":
        child = span_set_sql(body["match"], d, ctr, lst)
        end = int(body["end"])
        x = f"x{next(ctr)}"
        # our e is exclusive over 1-based positions = Lucene end + 1
        return _flt(d, child, x, f"{x}.e <= {end} + 1")

    if kind == "span_not":
        inc = span_set_sql(body["include"], d, ctr, lst)
        exc = span_set_sql(body["exclude"], d, ctr, lst)
        dist = int(body.get("dist", 0))
        pre = int(body.get("pre", dist))
        post = int(body.get("post", dist))
        x, y = f"x{next(ctr)}", f"y{next(ctr)}"
        clash = _exists(
            d, exc, y, f"({y}.e > {x}.s - {pre} AND {y}.s < {x}.e + {post})"
        )
        return _flt(d, inc, x, f"NOT {clash}")

    if kind in ("span_containing", "span_within"):
        big = span_set_sql(body["big"], d, ctr, lst)
        little = span_set_sql(body["little"], d, ctr, lst)
        x, y = f"x{next(ctr)}", f"y{next(ctr)}"
        contains = f"({x}.s <= {y}.s AND {y}.e <= {x}.e)"
        if kind == "span_containing":
            return _flt(d, big, x, _exists(d, little, y, contains))
        return _flt(d, little, y, _exists(d, big, x, contains))

    is_span_kind(kind)  # raises for field_masking with its own message
    raise ValueError(f"unsupported span clause {kind!r}")


def compile_span_sql(q: dict, dialect: str = "duckdb") -> str:
    """Boolean SQL predicate: the document's span set is non-empty.

    ``span_field`` validates the one-field rule up front so the error
    surfaces before any SQL is built.

    Let-binding: HOF expressions are interpreted per row (not
    whole-stage codegen), so re-splitting the text at every leaf is the
    dominant cost on wide trees. The tokenized list is bound ONCE per
    row as a lambda variable over a single-element array —
    ``transform(array(split(...)), L -> tree(L))[1]`` here,
    ``list_transform([string_split(...)], L -> tree(L))[1]`` in the
    twin — cutting the per-row expression work by the leaf count
    (measured 10.8 s → see SCALE.md r13 row at sf0.1).
    """
    field = span_field(q)
    d = dialect
    var = "__toks"
    spans = span_set_sql(q, d, None, var)
    bound = _xf(d, f"array({_tokens(d, field)})" if d == "spark"
                else f"[{_tokens(d, field)}]", var, spans)
    first = (
        f"element_at({bound}, 1)" if d == "spark" else f"({bound})[1]"
    )
    return f"({_sz(d, first)} > 0)"
