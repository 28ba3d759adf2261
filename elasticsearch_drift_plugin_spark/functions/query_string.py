"""ES ``query_string`` → core-clause translation (the Lucene syntax bar).

ES's ``query_string`` query parses the full Lucene QueryParser grammar —
the search-bar syntax Kibana and every saved-search client emit. The
reference's host queries ride inside ``_search`` bodies where this clause
is the most common free-form filter (the engine's DSL docstring stance:
a user switching keeps their query bodies).

This module lexes + parses the documented Lucene subset and rewrites it
into the engine's EXISTING clause dialect (``bool`` / ``match`` /
``match_phrase`` / ``range`` / ``prefix`` / ``wildcard`` / ``fuzzy`` /
``regexp`` / ``exists``) — ONE translation feeding BOTH
``compile_query`` and ``compile_query_sql``, so the Catalyst and SQL
twins cannot drift (the ``desugar_compound`` discipline).

Supported grammar (anything else raises — never a silent misread):

- bare terms and ``field:term`` — analyzed semantics (ES runs the field's
  analyzer: a bare term is a ``match``, not a ``term`` filter)
- ``"quoted phrases"`` and ``field:"quoted phrase"`` → ``match_phrase``
- boolean operators ``AND`` / ``OR`` / ``NOT`` (and ``&&`` / ``||`` /
  ``!``), uppercase per Lucene; parenthesised groups; implicit adjacency
  joins at the ``default_operator`` level (ES default ``or``)
- ``+required`` / ``-prohibited`` modifiers with Lucene's BooleanQuery
  semantics: when a group carries a ``+``/required clause, its plain
  clauses become OPTIONAL (score-only — exactly how ES evaluates them,
  and how the engine's bool compiler resolves minimum_should_match)
- field-scoped groups ``field:(a b OR c)`` — the field distributes to
  every bare term inside
- ranges: ``field:[a TO b]`` / ``{a TO b}`` (mixed brackets, ``*`` =
  open bound) and the comparison shorthand ``field:>=v`` / ``>v`` /
  ``<=v`` / ``<v``; numeric-looking bounds coerce to numbers, others
  stay strings (lexicographic keyword ranges); ``fuzzy~N`` applies the
  engine's ``fuzzy`` clause (whole-value keyword Levenshtein — probe
  keyword-shaped fields, not analyzed text)
- ``wild*card`` / ``wi?dcard`` terms → ``wildcard`` (a term whose ONLY
  wildcard is one trailing ``*`` lowers to ``prefix`` — scan-pushdown
  eligible); ``fuzzy~`` / ``fuzzy~1`` → ``fuzzy`` (bare ``~`` = AUTO);
  ``/regex/`` → anchored ``regexp``; ``boost^2`` strips (score-only)
- ``_exists_:field`` → ``exists``
- ``\\`` escapes the next character (Lucene's escaping rule)

Out of scope, loudly: phrase slop (``"a b"~2``), per-term boosts kept as
scores, ``field:>`` on phrases.
"""

from __future__ import annotations

import re

# token kinds: LP RP MOD(+/-) NOT AND OR RANGE PHRASE TERM
_TOKEN_RE = re.compile(
    r"""
    (?P<space>\s+)
  | (?P<lp>\()
  | (?P<rp>\))
  | (?P<range>(?:(?:\\.|[^\s():\[\]{}"])+:)?[\[{][^\]}]*[\]}])
  | (?P<phrase>(?:(?:\\.|[^\s():\[\]{}"])+:)?"(?:[^"\\]|\\.)*"(?:~\d+(?:\.\d+)?)?)
  | (?P<term>(?:\\.|[^\s()"])+)
    """,
    re.VERBOSE,
)

_NUM_INT = re.compile(r"^-?\d+$")
_NUM_FLOAT = re.compile(r"^-?\d+\.\d+$")
_BOOST_SUFFIX = re.compile(r"\^\d+(\.\d+)?$")
_FUZZY_SUFFIX = re.compile(r"~(\d+)?$")


def _lex(q: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise ValueError(f"query_string: cannot lex at {q[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "space":
            continue
        text = m.group()
        if kind == "term":
            # bare modifier glued to a following '(' lexes as its own term
            if text in ("+", "-"):
                out.append(("MOD", text))
                continue
            if text in ("!", "NOT"):
                out.append(("NOT", text))
                continue
            if text in ("AND", "&&"):
                out.append(("AND", text))
                continue
            if text in ("OR", "||"):
                out.append(("OR", text))
                continue
            if text[0] in "+-" and len(text) > 1:
                out.append(("MOD", text[0]))
                text = text[1:]
            if text.startswith("!") and len(text) > 1:
                out.append(("NOT", "!"))
                text = text[1:]
            out.append(("TERM", text))
        elif kind == "lp":
            out.append(("LP", text))
        elif kind == "rp":
            out.append(("RP", text))
        elif kind == "range":
            out.append(("RANGE", text))
        else:
            out.append(("PHRASE", text))
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _coerce(s: str):
    """Range-bound typing: numeric-looking bounds become numbers (both
    engines then compare numerically); '*' is an open bound; everything
    else stays a string (lexicographic keyword range, r11 contract)."""
    if s == "*":
        return None
    if _NUM_INT.match(s):
        return int(s)
    if _NUM_FLOAT.match(s):
        return float(s)
    return _unescape(s)


def _unescaped_at(s: str, i: int) -> bool:
    """True when ``s[i]`` is NOT escaped — preceded by an even run of
    backslashes (Lucene's escaping rule pairs each ``\\`` with the next
    character)."""
    bs = 0
    j = i - 1
    while j >= 0 and s[j] == "\\":
        bs += 1
        j -= 1
    return bs % 2 == 0


def _split_field(text: str) -> tuple[str | None, str]:
    """Split ``field:rest`` on the first UNESCAPED colon."""
    i, n = 0, len(text)
    while i < n:
        if text[i] == "\\":
            i += 2
            continue
        if text[i] == ":":
            return _unescape(text[:i]), text[i + 1:]
        i += 1
    return None, text


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], default_field: str | None,
                 default_op: str):
        self.toks = toks
        self.pos = 0
        self.default_field = default_field
        self.default_op = default_op

    def _peek(self) -> str | None:
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    # ----- grammar -------------------------------------------------------
    def parse_group(self, field_ctx: str | None) -> dict:
        """A parenthesised group / the whole query: a flat clause list
        with joiners and modifiers, folded by Lucene precedence
        (NOT > AND > OR; implicit adjacency joins at default_operator)."""
        elems: list[tuple[str | None, str | None, dict]] = []
        joiner: str | None = None
        while True:
            k = self._peek()
            if k is None or k == "RP":
                break
            if k in ("AND", "OR"):
                if joiner is not None or not elems:
                    raise ValueError(
                        "query_string: dangling boolean operator"
                    )
                joiner = k
                self._next()
                continue
            mod = None
            if k == "MOD":
                mod = self._next()[1]
                k = self._peek()
            neg = False
            while self._peek() == "NOT":
                self._next()
                neg = not neg
            node = self.parse_primary(field_ctx)
            if neg:
                node = {"bool": {"must_not": [node]}}
            elems.append((joiner if elems else None, mod, node))
            joiner = None
        if joiner is not None:
            raise ValueError("query_string: trailing boolean operator")
        if not elems:
            raise ValueError("query_string: empty group")
        return self._fold(elems)

    def _fold(self, elems) -> dict:
        required = [n for (_, m, n) in elems if m == "+"]
        prohibited = [n for (_, m, n) in elems if m == "-"]
        plain = [(j, n) for (j, m, n) in elems if m is None]
        # bind AND-runs (explicit AND, or implicit when default_op=and)
        or_items: list[dict] = []
        run: list[dict] = []
        for j, n in plain:
            eff = j or ("AND" if self.default_op == "and" else "OR")
            if run and eff == "AND":
                run.append(n)
            else:
                if run:
                    or_items.append(self._and(run))
                run = [n]
        if run:
            or_items.append(self._and(run))
        if not required and not prohibited:
            if len(or_items) == 1:
                return or_items[0]
            return {"bool": {"should": or_items, "minimum_should_match": 1}}
        out: dict = {}
        if required:
            out["must"] = required
        if prohibited:
            out["must_not"] = prohibited
        if or_items:
            # Lucene BooleanQuery: plain clauses beside a required one are
            # OPTIONAL (score-only; no filter effect) — the engine's bool
            # compiler resolves msm to 0 exactly then. Without a required
            # clause they stay required-OR (msm 1), also the bool default.
            out["should"] = or_items
        return {"bool": out}

    @staticmethod
    def _and(nodes: list[dict]) -> dict:
        return nodes[0] if len(nodes) == 1 else {"bool": {"must": nodes}}

    def parse_primary(self, field_ctx: str | None) -> dict:
        kind, text = self._next()
        if kind == "LP":
            node = self.parse_group(field_ctx)
            if self._peek() != "RP":
                raise ValueError("query_string: unbalanced parenthesis")
            self._next()
            return node
        if kind == "RANGE":
            return self._range_clause(text, field_ctx)
        if kind == "PHRASE":
            return self._phrase_clause(text, field_ctx)
        if kind == "TERM":
            return self._term_clause(text, field_ctx)
        raise ValueError(f"query_string: unexpected token {text!r}")

    # ----- clause builders ------------------------------------------------
    def _field_for(self, explicit: str | None, ctx: str | None) -> str:
        field = explicit or ctx or self.default_field
        if not field:
            raise ValueError(
                "query_string: bare terms need default_field / fields"
                " (the engine has no index mapping to default from)"
            )
        return field

    def _range_clause(self, text: str, ctx: str | None) -> dict:
        explicit, rest = _split_field(text)
        field = self._field_for(explicit, ctx)
        lo_inc, hi_inc = rest[0] == "[", rest[-1] == "]"
        body = rest[1:-1]
        m = re.match(r"^\s*(\S+)\s+TO\s+(\S+)\s*$", body)
        if not m:
            raise ValueError(f"query_string: malformed range {text!r}")
        lo, hi = _coerce(m.group(1)), _coerce(m.group(2))
        bounds: dict = {}
        if lo is not None:
            bounds["gte" if lo_inc else "gt"] = lo
        if hi is not None:
            bounds["lte" if hi_inc else "lt"] = hi
        if not bounds:
            return {"exists": {"field": field}}
        return {"range": {field: bounds}}

    def _phrase_clause(self, text: str, ctx: str | None) -> dict:
        # a token starting with '"' has NO field prefix — a colon inside
        # the quotes is phrase text, not a field separator (ADVICE r11:
        # '"foo:bar"' must not split into a bogus field)
        if text.startswith('"'):
            explicit, rest = None, text
        else:
            explicit, rest = _split_field(text)
        field = self._field_for(explicit, ctx)
        if not rest.endswith('"'):
            raise ValueError(
                "query_string: phrase slop (\"...\"~N) is not supported"
            )
        phrase = _unescape(rest[1:-1])
        if not phrase.strip():
            raise ValueError("query_string: empty phrase")
        return {"match_phrase": {field: phrase}}

    def _term_clause(self, text: str, ctx: str | None) -> dict:
        explicit, rest = _split_field(text)
        if explicit == "_exists_":
            return {"exists": {"field": _unescape(rest)}}
        if explicit is not None and rest == "" and self._peek() == "LP":
            self._next()
            node = self.parse_group(explicit)
            if self._peek() != "RP":
                raise ValueError("query_string: unbalanced parenthesis")
            self._next()
            return node
        field = self._field_for(explicit, ctx)
        if not rest:
            raise ValueError(f"query_string: empty value for field {field!r}")
        # comparison shorthand: field:>=v  field:>v  field:<=v  field:<v
        m = re.match(r"^(>=|<=|>|<)(.+)$", rest)
        if m:
            op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[m.group(1)]
            v = _coerce(m.group(2))
            if v is None:
                raise ValueError(f"query_string: open comparison {text!r}")
            return {"range": {field: {op: v}}}
        # boost/fuzzy suffix detection must be escape-aware (ADVICE r11:
        # Lucene 'foo\~' is a literal tilde, not a fuzzy operator)
        bm = _BOOST_SUFFIX.search(rest)
        if bm and _unescaped_at(rest, bm.start()):
            rest = rest[: bm.start()]  # boosts are score-only
        if rest.startswith("/") and rest.endswith("/") and len(rest) >= 2:
            return {"regexp": {field: {"value": rest[1:-1]}}}
        fz = _FUZZY_SUFFIX.search(rest)
        if fz and not _unescaped_at(rest, fz.start()):
            fz = None
        if fz:
            probe = _unescape(rest[: fz.start()])
            if not probe:
                raise ValueError("query_string: empty fuzzy term")
            spec: dict = {"value": probe}
            if fz.group(1) is not None:
                spec["fuzziness"] = int(fz.group(1))
            return {"fuzzy": {field: spec}}
        # wildcard detection on the RAW (pre-unescape) value: \* is literal
        naked = re.sub(r"\\.", "", rest)
        if "*" in naked or "?" in naked:
            if naked.count("*") == 1 and naked.endswith("*") and "?" not in naked:
                return {"prefix": {field: {"value": _unescape(rest[:-1])}}}
            return {"wildcard": {field: {"value": _unescape(rest)}}}
        return {"match": {field: _unescape(rest)}}


def translate_query_string(body: dict) -> dict:
    """Rewrite a ``query_string`` clause into the engine's core dialect.
    ONE translation feeding both compilers (the desugar discipline)."""
    if "query" not in body:
        raise ValueError("query_string needs a query")
    default_field = body.get("default_field")
    fields = body.get("fields")
    if fields:
        if len(fields) != 1:
            raise ValueError(
                "query_string supports exactly one entry in 'fields'"
                " (multi-field expansion: use multi_match)"
            )
        default_field = str(fields[0]).split("^")[0]
    default_op = str(body.get("default_operator", "or")).lower()
    if default_op not in ("or", "and"):
        raise ValueError(f"default_operator must be and/or, got {default_op!r}")
    toks = _lex(str(body["query"]))
    if not toks:
        raise ValueError("query_string with empty query")
    p = _Parser(toks, default_field, default_op)
    node = p.parse_group(None)
    if p.pos != len(toks):
        raise ValueError("query_string: unbalanced parenthesis")
    return node
