"""Span query family pins (r13): Lucene span semantics on both engines.

Positions are whitespace tokens, 1-based internally; `span_near` slop
counts tokens BETWEEN consecutive spans (adjacent = 0), inner gaps of a
nested near never charge the outer slop (a sub-span is an opaque
interval — the Lucene rule). Cross-engine parity is asserted for every
body: Spark executes the "spark"-dialect string, DuckDB the "duckdb"
one, from the same generator (functions/es_span.py).
"""

import duckdb
import pytest

from elasticsearch_drift_plugin_spark.functions.es_dsl import (
    compile_query,
    compile_query_sql,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick fox"),
    (3, "fox quick"),
    (4, "the quick red fast brown fox"),
    (5, "quick brown dog and a lazy fox"),
    (6, "nothing here"),
    (7, "quick stop quick brown fox"),
]


@pytest.fixture(scope="module")
def span_df(spark):
    return spark.createDataFrame(DOCS, "id int, text string").cache()


@pytest.fixture(scope="module")
def span_con():
    con = duckdb.connect()
    rows = ",".join("(%d, '%s')" % (i, t) for i, t in DOCS)
    con.execute(f"CREATE TABLE docs AS SELECT * FROM (VALUES {rows}) t(id, text)")
    return con


def _ids(span_df, span_con, body):
    s = sorted(r.id for r in span_df.where(compile_query(body)).collect())
    d = sorted(
        r[0]
        for r in span_con.execute(
            "SELECT id FROM docs WHERE " + compile_query_sql(body, "duckdb")
        ).fetchall()
    )
    assert s == d, f"engine mismatch for {body}: spark={s} duckdb={d}"
    return s


def term(t):
    return {"span_term": {"text": t}}


def near(clauses, slop, in_order=True):
    return {"span_near": {"clauses": clauses, "slop": slop,
                          "in_order": in_order}}


def test_span_near_ordered_slop(span_df, span_con):
    # adjacent only (doc1 has 'brown' between quick and fox — gap 1)
    assert _ids(span_df, span_con, near([term("quick"), term("fox")], 0)) == [2]
    # gap <= 3: doc4 has exactly 3 between (red fast brown)
    assert _ids(span_df, span_con, near([term("quick"), term("fox")], 3)) == [1, 2, 4, 7]
    # order matters: doc3 is "fox quick"
    assert 3 not in _ids(span_df, span_con, near([term("quick"), term("fox")], 9))


def test_span_near_unordered(span_df, span_con):
    body = near([term("quick"), term("fox")], 0, in_order=False)
    assert _ids(span_df, span_con, body) == [2, 3]
    # 3+ unordered clauses: documented subset raise
    with pytest.raises(ValueError, match="in_order:false"):
        compile_query(near([term("a"), term("b"), term("c")], 1, False))


def test_span_near_three_clause_budget(span_df, span_con):
    # total gaps across the chain share ONE slop budget
    body = near([term("quick"), term("brown"), term("fox")], 1)
    assert _ids(span_df, span_con, body) == [1, 7]
    # doc4: quick..brown has 2 gaps (red fast) — needs slop 2
    body2 = near([term("quick"), term("brown"), term("fox")], 2)
    assert _ids(span_df, span_con, body2) == [1, 4, 7]


def test_span_or_inside_near(span_df, span_con):
    body = near(
        [{"span_or": {"clauses": [term("quick"), term("fast")]}},
         term("brown")],
        0,
    )
    assert _ids(span_df, span_con, body) == [1, 4, 5, 7]


def test_span_first(span_df, span_con):
    # end=1: the very first token
    body = {"span_first": {"match": term("quick"), "end": 1}}
    assert _ids(span_df, span_con, body) == [2, 5, 7]
    # end=2: first two tokens (doc3 is "fox quick" — quick@2 now in)
    body2 = {"span_first": {"match": term("quick"), "end": 2}}
    assert _ids(span_df, span_con, body2) == [1, 2, 3, 4, 5, 7]


def test_span_not_overlap_and_pre(span_df, span_con):
    # every quick..fox span in docs 1/4/5/7 contains a 'brown' (doc4:
    # quick@2..fox@6 holds brown@5); only doc2's span is clean
    inc = near([term("quick"), term("fox")], 5)
    body = {"span_not": {"include": inc, "exclude": term("brown")}}
    assert _ids(span_df, span_con, body) == [2]
    # pre widens the forbidden region BEFORE the include span: fox is
    # kept unless brown is the token right before it (docs 1/4/7 have
    # 'brown fox'-adjacent pairs; doc5's brown is far from its fox)
    body2 = {"span_not": {"include": term("fox"), "exclude": term("brown"),
                          "pre": 1}}
    assert _ids(span_df, span_con, body2) == [2, 3, 5]
    # dist sets both pre and post (the ES spelling)
    body3 = {"span_not": {"include": term("brown"), "exclude": term("fox"),
                          "dist": 1}}
    # brown kept unless fox adjacent on EITHER side
    assert _ids(span_df, span_con, body3) == [5]


def test_span_containing_within(span_df, span_con):
    big = near([term("quick"), term("fox")], 5)
    body = {"span_containing": {"big": big, "little": term("brown")}}
    assert _ids(span_df, span_con, body) == [1, 4, 5, 7]
    body2 = {"span_within": {"big": near([term("the"), term("fox")], 9),
                             "little": term("brown")}}
    assert _ids(span_df, span_con, body2) == [1, 4]


def test_span_multi_kinds(span_df, span_con):
    body = near(
        [{"span_multi": {"match": {"prefix": {"text": "qu"}}}}, term("fox")],
        0,
    )
    assert _ids(span_df, span_con, body) == [2]
    fuz = {"span_multi": {"match": {"fuzzy": {"text": {
        "value": "quack", "fuzziness": 1}}}}}
    assert _ids(span_df, span_con, fuz) == [1, 2, 3, 4, 5, 7]
    wild = {"span_multi": {"match": {"wildcard": {"text": "l?zy"}}}}
    assert _ids(span_df, span_con, wild) == [1, 5]
    rex = {"span_multi": {"match": {"regexp": {"text": "fo[xg]"}}}}
    assert _ids(span_df, span_con, rex) == [1, 2, 3, 4, 5, 7]


def test_span_inside_bool(span_df, span_con):
    body = {"bool": {
        "must": [near([term("quick"), term("fox")], 3)],
        "must_not": [term("brown")],
    }}
    assert _ids(span_df, span_con, body) == [2]


def test_span_validation():
    # mixed fields raise (the ES one-field rule)
    with pytest.raises(ValueError, match="ONE field"):
        compile_query(near(
            [{"span_term": {"text": "a"}}, {"span_term": {"lang": "b"}}], 0))
    # multi-token span_term raises naming span_near
    with pytest.raises(ValueError, match="one token"):
        compile_query({"span_term": {"text": "two words"}})
    # negative slop raises (ES parity) instead of matching nothing
    with pytest.raises(ValueError, match="slop"):
        compile_query(near([term("a"), term("b")], -1))
    # field masking is a documented exclusion
    with pytest.raises(ValueError, match="out of scope"):
        compile_query({"field_masking_span": {"query": term("a"),
                                              "field": "text"}})
    with pytest.raises(ValueError, match="out of scope"):
        compile_query_sql({"span_field_masking": {"query": term("a"),
                                                  "field": "text"}})


def test_span_dialect_parity_spark_string(span_df):
    # the "spark"-dialect SQL string is exactly what compile_query
    # executes — pin that F.expr round-trips it
    import pyspark.sql.functions as F

    body = near([term("quick"), {"span_or": {"clauses": [
        term("fox"), term("dog")]}}], 6)
    via_expr = sorted(
        r.id
        for r in span_df.where(
            F.expr(compile_query_sql(body, "spark"))
        ).collect()
    )
    via_col = sorted(
        r.id for r in span_df.where(compile_query(body)).collect()
    )
    assert via_expr == via_col and via_col == [1, 2, 4, 5, 7]


def test_span_property_cross_engine(span_df, span_con, spark):
    """Randomized span trees (seeded) must agree across engines — the
    query_string 40-tree discipline applied to the span family."""
    import random

    rng = random.Random(1307)
    vocab = ["the", "quick", "brown", "fox", "dog", "lazy", "stop",
             "fast", "red", "jumps"]

    def gen(depth):
        kinds = ["term", "term", "or", "near", "first", "not"]
        k = rng.choice(kinds if depth < 2 else ["term"])
        if k == "term":
            return {"span_term": {"text": rng.choice(vocab)}}
        if k == "or":
            return {"span_or": {"clauses": [
                gen(depth + 1) for _ in range(rng.randint(2, 3))]}}
        if k == "near":
            return {"span_near": {
                "clauses": [gen(depth + 1) for _ in range(2)],
                "slop": rng.randint(0, 4),
                "in_order": rng.random() < 0.7}}
        if k == "first":
            return {"span_first": {"match": gen(depth + 1),
                                   "end": rng.randint(1, 6)}}
        return {"span_not": {"include": gen(depth + 1),
                             "exclude": gen(depth + 1),
                             "pre": rng.randint(0, 2),
                             "post": rng.randint(0, 2)}}

    checked = 0
    for _ in range(40):
        body = gen(0)
        s = sorted(r.id for r in span_df.where(compile_query(body)).collect())
        d = sorted(
            r[0]
            for r in span_con.execute(
                "SELECT id FROM docs WHERE "
                + compile_query_sql(body, "duckdb")
            ).fetchall()
        )
        assert s == d, f"engine mismatch for {body}: spark={s} duckdb={d}"
        checked += 1
    assert checked == 40
