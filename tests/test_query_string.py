"""``query_string`` grammar pins (r11): the Lucene search-bar subset is
lexed/parsed ONCE (functions.query_string.translate_query_string) and
lowered to the core clause set, so the Spark and SQL compilers share the
tree. Hit sets are HAND-DERIVED against a 6-doc fixture; a sweep pins the
DuckDB twin row-for-row against the Spark predicate."""

from __future__ import annotations

import pytest

from elasticsearch_drift_plugin_spark.functions.es_dsl import (
    compile_query,
    compile_query_sql,
)
from elasticsearch_drift_plugin_spark.functions.query_string import (
    translate_query_string,
)

ROWS = [
    (0, "alpha beta gamma", "src1", 120),
    (1, "alpha delta", "src2", 80),
    (2, "beta delta slow", "src10", 200),
    (3, "epsilon table scan here", "src12", 300),
    (4, "alpha beta", "src3", 47),
    (5, "gamma epsilon", None, 500),
]
SCHEMA = "doc_id long, text string, source string, n_chars long"


@pytest.fixture(scope="module")
def qs_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _ids(df, qs: dict):
    return sorted(
        r["doc_id"]
        for r in df.where(compile_query({"query_string": qs})).collect()
    )


# --- operators and modifiers ------------------------------------------------

def test_implicit_or_default(qs_df):
    assert _ids(qs_df, {"query": "gamma epsilon", "default_field": "text"}) \
        == [0, 3, 5]


def test_implicit_and_when_default_operator_and(qs_df):
    assert _ids(qs_df, {"query": "gamma epsilon", "default_field": "text",
                        "default_operator": "and"}) == [5]


def test_explicit_bools_and_precedence(qs_df):
    # AND binds tighter than OR: alpha OR (beta AND delta)
    assert _ids(qs_df, {"query": "alpha OR beta AND delta",
                        "default_field": "text"}) == [0, 1, 2, 4]
    assert _ids(qs_df, {"query": "alpha && beta || epsilon",
                        "default_field": "text"}) == [0, 3, 4, 5]


def test_not_and_prohibit(qs_df):
    assert _ids(qs_df, {"query": "beta AND NOT delta",
                        "default_field": "text"}) == [0, 4]
    assert _ids(qs_df, {"query": "beta !delta",
                        "default_field": "text",
                        "default_operator": "and"}) == [0, 4]
    # '-' prohibits across the group; plain term stays required (no '+')
    assert _ids(qs_df, {"query": "beta -delta",
                        "default_field": "text"}) == [0, 4]


def test_required_makes_plain_optional(qs_df):
    """Lucene BooleanQuery: beside a '+' clause, plain clauses are
    score-only — the filter keeps every +alpha doc, even without beta."""
    assert _ids(qs_df, {"query": "+alpha beta",
                        "default_field": "text"}) == [0, 1, 4]


# --- field forms -------------------------------------------------------------

def test_field_terms_phrases_groups(qs_df):
    assert _ids(qs_df, {"query": 'text:"table scan"'}) == [3]
    assert _ids(qs_df, {"query": "text:(gamma OR delta) AND source:src1"}) \
        == [0]
    assert _ids(qs_df, {"query": "_exists_:source AND text:gamma"}) == [0]


def test_ranges_and_comparisons(qs_df):
    assert _ids(qs_df, {"query": "n_chars:[100 TO 300]"}) == [0, 2, 3]
    assert _ids(qs_df, {"query": "n_chars:{100 TO 300}"}) == [0, 2]
    assert _ids(qs_df, {"query": "n_chars:[200 TO *]"}) == [2, 3, 5]
    assert _ids(qs_df, {"query": "n_chars:>=200 AND n_chars:<500"}) == [2, 3]
    # keyword (lexicographic) range over strings
    assert _ids(qs_df, {"query": "source:[src1 TO src2]"}) == [0, 1, 2, 3]


def test_wildcard_prefix_fuzzy_regexp(qs_df):
    assert _ids(qs_df, {"query": "source:src1*"}) == [0, 2, 3]
    assert _ids(qs_df, {"query": "source:src1?"}) == [2, 3]
    # fuzzy is the engine's keyword fuzzy (whole-value Levenshtein, the
    # `fuzzy` clause semantics) — probe a keyword-shaped field
    assert _ids(qs_df, {"query": "source:src11~1"}) == [0, 2, 3]
    assert _ids(qs_df, {"query": "source:/src1[02]/"}) == [2, 3]
    assert _ids(qs_df, {"query": "text:gamma^2"}) == [0, 5]  # boost strips


# --- translation shape -------------------------------------------------------

def test_trailing_star_lowers_to_prefix():
    node = translate_query_string({"query": "source:src1*"})
    assert node == {"prefix": {"source": {"value": "src1"}}}
    node = translate_query_string({"query": "source:s*1"})
    assert "wildcard" in node


def test_escapes():
    node = translate_query_string({"query": r"text:a\*b"})
    assert node == {"match": {"text": "a*b"}}
    node = translate_query_string({"query": r"odd\:field:x"})
    assert node == {"match": {"odd:field": "x"}}


def test_loud_raises():
    for bad in [
        {"query": "AND x", "default_field": "text"},
        {"query": "x OR", "default_field": "text"},
        {"query": "(a b", "default_field": "text"},
        {"query": "a b)", "default_field": "text"},
        {"query": '"a b"~2', "default_field": "text"},
        {"query": "bare"},                       # no default_field
        {"query": "f:[1 TO 2 3]"},               # malformed range
        {"query": "", "default_field": "text"},
        {"query": "x", "fields": ["a", "b"]},    # multi-field
    ]:
        with pytest.raises(ValueError):
            translate_query_string(bad)


def test_sql_twin_matches_spark(qs_df):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, source VARCHAR,"
        " n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?)", ROWS)
    bodies = [
        {"query": "gamma epsilon", "default_field": "text"},
        {"query": "alpha OR beta AND delta", "default_field": "text"},
        {"query": "+alpha beta -slow", "default_field": "text"},
        {"query": 'text:"table scan" OR source:src3'},
        {"query": "text:(gamma OR delta) AND NOT source:src2"},
        {"query": "n_chars:[100 TO 300] source:src1?",
         "default_operator": "and"},
        {"query": "source:src1* text:alpa~1 source:/src1[02]/",
         "default_field": "text"},
        {"query": "_exists_:source AND n_chars:>=200"},
    ]
    for qs in bodies:
        pred = compile_query_sql({"query_string": qs})
        sql_ids = sorted(
            r[0] for r in con.execute(
                f"SELECT doc_id FROM docs WHERE {pred}"
            ).fetchall()
        )
        assert sql_ids == _ids(qs_df, qs), qs


# --- ADVICE r11 regressions --------------------------------------------------

def test_quoted_phrase_with_colon_is_not_a_field(qs_df):
    # '"foo:bar"': the colon is phrase TEXT — the old parse split a bogus
    # field '"foo' and dropped the first phrase character
    node = translate_query_string(
        {"query": '"foo:bar"', "default_field": "text"}
    )
    assert node == {"match_phrase": {"text": "foo:bar"}}
    # a fielded phrase with a colon inside the quotes keeps the field
    node = translate_query_string({"query": 'text:"foo:bar"'})
    assert node == {"match_phrase": {"text": "foo:bar"}}
    # slop on the colon-carrying unfielded phrase still raises loudly
    with pytest.raises(ValueError):
        translate_query_string(
            {"query": '"foo:bar"~2', "default_field": "text"}
        )
    # and a real hit-set: the unfielded quoted phrase behaves as a phrase
    assert _ids(qs_df, {"query": '"table scan"', "default_field": "text"}) \
        == [3]


def test_escaped_fuzzy_and_boost_suffixes_are_literal():
    # Lucene 'foo\~' escapes the tilde — a literal term, NOT a fuzzy probe
    node = translate_query_string({"query": "text:foo\\~"})
    assert node == {"match": {"text": "foo~"}}
    # escaped '^' is not a boost either
    node = translate_query_string({"query": "text:foo\\^2"})
    assert node == {"match": {"text": "foo^2"}}
    # a DOUBLE backslash is a literal backslash — the operator stays live
    node = translate_query_string({"query": "source:foo\\\\~1"})
    assert node == {"fuzzy": {"source": {"value": "foo\\", "fuzziness": 1}}}
    # unescaped forms unchanged
    node = translate_query_string({"query": "source:foo~1"})
    assert node == {"fuzzy": {"source": {"value": "foo", "fuzziness": 1}}}
    node = translate_query_string({"query": "text:gamma^2"})
    assert node == {"match": {"text": "gamma"}}
