"""ES query-DSL compiler: clause-by-clause semantics against hand-computed
row sets, ES null rules for must_not, and Spark/DuckDB twin agreement on
randomized bodies."""

import duckdb
import pytest

from elasticsearch_drift_plugin_spark.functions.es_dsl import (
    compile_query,
    compile_query_sql,
)

ROWS = [
    # id, etype,     user, value
    (1, "click", 10, 50.0),
    (2, "view", 120, 400.0),
    (3, "purchase", 0, 600.0),
    (4, "error", 7, None),
    (5, "click-x", 149, 20.0),
    (6, None, 3, 30.0),
]
SCHEMA = "id long, etype string, user long, value double"


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def ids(df, q):
    return sorted(r.id for r in df.where(compile_query(q)).collect())


def duck_ids(q):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, etype VARCHAR, user BIGINT, value DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    sql = compile_query_sql(q)
    return sorted(
        r[0] for r in con.execute(f"SELECT id FROM t WHERE {sql}").fetchall()
    )


BODIES = [
    {"match_all": {}},
    {"term": {"etype": "click"}},
    {"term": {"etype": {"value": "view"}}},
    {"terms": {"user": [10, 0, 3]}},
    {"range": {"value": {"gte": 30, "lt": 600}}},
    {"range": {"user": {"gt": 7}}},
    {"exists": {"field": "value"}},
    {"prefix": {"etype": "click"}},
    {"bool": {"must": [{"term": {"etype": "click"}}],
              "filter": [{"range": {"user": {"lte": 50}}}]}},
    {"bool": {"should": [{"term": {"etype": "view"}},
                         {"term": {"etype": "error"}}]}},
    {"bool": {"must_not": [{"term": {"etype": "click"}}]}},
    {"bool": {"filter": [{"range": {"user": {"gte": 0}}}],
              "must_not": [{"range": {"value": {"gte": 100}}}]}},
    {"bool": {"filter": [{"exists": {"field": "value"}}],
              "should": [{"prefix": {"etype": "c"}},
                         {"range": {"user": {"gte": 100}}}],
              "minimum_should_match": 1}},
]


@pytest.mark.parametrize("q", BODIES, ids=[str(i) for i in range(len(BODIES))])
def test_spark_and_duckdb_twins_agree(spark, df, q):
    assert ids(df, q) == duck_ids(q)


def test_clause_semantics_handpinned(df):
    assert ids(df, {"term": {"etype": "click"}}) == [1]
    assert ids(df, {"prefix": {"etype": "click"}}) == [1, 5]
    assert ids(df, {"wildcard": {"etype": "c*k"}}) == [1]
    assert ids(df, {"wildcard": {"etype": "?lick"}}) == [1]
    assert ids(df, {"range": {"value": {"gte": 30, "lt": 600}}}) == [1, 2, 6]
    assert ids(df, {"exists": {"field": "value"}}) == [1, 2, 3, 5, 6]
    # ES must_not keeps NULL rows (filter context: unknown does not match)
    assert ids(df, {"bool": {"must_not": [{"term": {"etype": "click"}}]}}) == [
        2, 3, 4, 5, 6,
    ]
    # should optional when filter present and no minimum_should_match
    with_filter = {"bool": {"filter": [{"range": {"user": {"gte": 0}}}],
                            "should": [{"term": {"etype": "nope"}}]}}
    assert ids(df, with_filter) == [1, 2, 3, 4, 5, 6]
    # ...but required when it is the only clause
    only_should = {"bool": {"should": [{"term": {"etype": "view"}}]}}
    assert ids(df, only_should) == [2]


def test_match_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "quick red fox"), (3, "slow brown cat")],
        "id long, text string",
    )
    def m(q):
        return sorted(r.id for r in docs.where(compile_query(q)).collect())
    assert m({"match": {"text": "quick brown"}}) == [1, 2, 3]  # OR default
    assert m({"match": {"text": {"query": "quick brown", "operator": "and"}}}) == [1]
    # token-boundary exactness: 'row' is not a token of 'brown'
    assert m({"match": {"text": "row"}}) == []


def test_unsupported_clause_fails_loudly():
    # terms_set graduated in r7, but still requires an msm source, and
    # scripts stay loud
    with pytest.raises(ValueError, match="minimum_should_match"):
        compile_query({"terms_set": {"etype": {"terms": ["a"]}}})
    with pytest.raises(ValueError, match="script"):
        compile_query({"terms_set": {"etype": {
            "terms": ["a"],
            "minimum_should_match_script": {"source": "params.n"}}}})
    # msm counts graduated in r7; the full spec grammar (percentages,
    # negatives, conditionals) graduated in r10 — garbage still raises
    with pytest.raises(ValueError, match="minimum_should_match"):
        compile_query({"bool": {"should": [{"match_all": {}}],
                                "minimum_should_match": "many"}})
    with pytest.raises(ValueError, match="minimum_should_match"):
        compile_query({"bool": {"should": [{"match_all": {}}],
                                "minimum_should_match": True}})


def test_terms_set_clause(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c x", 2), (2, "a q q q", 2), (3, "a a b b", 3),
         (4, None, 1)],
        "id long, text string, req long",
    ).withColumn("toks", F.split("text", " "))
    q = {"terms_set": {"toks": {"terms": ["a", "b", "c"],
                                "minimum_should_match": 2}}}
    # doc 3: duplicated matches count DISTINCT (a,b => 2); doc 4 (NULL
    # field) never matches
    assert sorted(r.id for r in df.where(compile_query(q)).collect()) == [1, 3]
    # the SQL twin is DuckDB dialect (list literals / list_intersect) —
    # cross-check it where it runs: against the oracle engine
    got_sql = sorted(
        r[0] for r in duckdb.sql(
            "SELECT id FROM (SELECT 1 AS id, ['a','b','c','x'] AS toks"
            " UNION ALL SELECT 2, ['a','q','q','q']"
            " UNION ALL SELECT 3, ['a','a','b','b']"
            " UNION ALL SELECT 4, CAST(NULL AS VARCHAR[]))"
            f" WHERE {compile_query_sql(q)}"
        ).fetchall()
    )
    assert got_sql == [1, 3]
    # per-doc requirement column: doc 3 needs 3 distinct matches -> out
    qf = {"terms_set": {"toks": {"terms": ["a", "b", "c"],
                                 "minimum_should_match_field": "req"}}}
    assert sorted(r.id for r in df.where(compile_query(qf)).collect()) == [1]


def test_minimum_should_match_counts(spark):
    # "at least N of the should clauses" — flag-sum in filter context
    df = spark.createDataFrame(
        [(1, "a", 10, None), (2, "a", 99, "x"), (3, "b", 99, "x"),
         (4, "a", 10, "x")],
        "id long, k string, v long, s string",
    )
    q = {"bool": {"should": [{"term": {"k": "a"}},
                             {"range": {"v": {"gte": 50}}},
                             {"term": {"s": "x"}}],
                  "minimum_should_match": 2}}
    got = sorted(r.id for r in df.where(compile_query(q)).collect())
    # 1: only k=a (s NULL does not match — filter context). 2: all three.
    # 3: v+s. 4: k+s.
    assert got == [2, 3, 4]
    # the SQL twin agrees clause-for-clause
    from pyspark.sql import functions as F

    got_sql = sorted(
        r.id for r in df.where(F.expr(compile_query_sql(q))).collect()
    )
    assert got_sql == [2, 3, 4]
    # msm larger than the clause count matches nothing (ES behavior)
    assert df.where(
        compile_query(dict(q, bool=dict(q["bool"], minimum_should_match=4)))
    ).count() == 0


def test_geo_query_clauses(spark):
    pts = spark.createDataFrame(
        [(1, 40.7, -74.0), (2, 34.0, -118.2), (3, 41.0, -73.5), (4, -33.9, 151.2)],
        "id long, lat double, lon double",
    )

    def ids2(q):
        return sorted(r.id for r in pts.where(compile_query(q)).collect())

    bbox = {"geo_bounding_box": {
        "top_left": {"lat": 45.0, "lon": -80.0},
        "bottom_right": {"lat": 35.0, "lon": -70.0},
    }}
    assert ids2(bbox) == [1, 3]
    near_nyc = {"geo_distance": {"distance": "100km",
                                 "origin": {"lat": 40.7128, "lon": -74.006}}}
    assert ids2(near_nyc) == [1, 3]  # LA and Sydney out of range
    tight = {"geo_distance": {"distance": "10km",
                              "origin": {"lat": 40.7128, "lon": -74.006}}}
    assert ids2(tight) == [1]
    # twin agreement on the same bodies
    con = duckdb.connect()
    con.execute("CREATE TABLE g (id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)",
                    [(1, 40.7, -74.0), (2, 34.0, -118.2), (3, 41.0, -73.5),
                     (4, -33.9, 151.2)])
    for q in (bbox, near_nyc, tight):
        duck = sorted(r[0] for r in con.execute(
            f"SELECT id FROM g WHERE {compile_query_sql(q)}").fetchall())
        assert duck == ids2(q)
    # west > east wraps the dateline (r6: no longer rejected) — covered by
    # test_dateline_crossing_box below


def test_dateline_crossing_box(spark, df):
    pts = spark.createDataFrame(
        [(1, 10.0, 170.0), (2, 10.0, -170.0), (3, 10.0, 0.0), (4, 70.0, 180.0)],
        "id long, lat double, lon double",
    )
    q = {"geo_bounding_box": {
        "top_left": {"lat": 60.0, "lon": 150.0},
        "bottom_right": {"lat": -60.0, "lon": -150.0},
    }}
    got = sorted(r.id for r in pts.where(compile_query(q)).collect())
    # west 150 > east -150 wraps the dateline: 170 and -170 are inside,
    # lon 0 is outside, lat 70 is above the band
    assert got == [1, 2]
    # twin parity on the same rows
    import duckdb as _duck

    con = _duck.connect()
    con.execute("CREATE TABLE pts (id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?)",
        [(1, 10.0, 170.0), (2, 10.0, -170.0), (3, 10.0, 0.0), (4, 70.0, 180.0)],
    )
    sql = compile_query_sql(q)
    got_sql = sorted(
        r[0] for r in con.execute(f"SELECT id FROM pts WHERE {sql}").fetchall()
    )
    assert got_sql == [1, 2]


def test_range_time_zone_resolves_at_compile_time(spark):
    # (amended r10) date-string bounds + time_zone now resolve to epoch-ms
    # literals at compile time (deep pins in tests/test_round10.py); an
    # unknown zone stays loud in BOTH compilers
    q = {"range": {"value": {"gte": "2024-01-01", "time_zone": "+02:00"}}}
    assert "1704060000000" in str(compile_query(q)._jc)
    assert "1704060000000" in compile_query_sql(q)
    bad = {"range": {"value": {"gte": "2024-01-01", "time_zone": "Mars/Olympus"}}}
    with pytest.raises(ValueError, match="time_zone"):
        compile_query(bad)
    with pytest.raises(ValueError, match="time_zone"):
        compile_query_sql(bad)


def test_simple_query_string(spark):
    import duckdb
    import pytest

    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )

    df = spark.createDataFrame(
        [(1, "big data wins"), (2, "big iron"), (3, "data lake"),
         (4, "big data lake")],
        "id long, text string",
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(1, "big data wins"), (2, "big iron"),
                     (3, "data lake"), (4, "big data lake")])

    def both(q):
        clause = {"simple_query_string": q}
        s = {r.id for r in df.where(compile_query(clause)).collect()}
        d = {r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {compile_query_sql(clause)}").fetchall()}
        assert s == d
        return s

    base = {"fields": ["text"]}
    # default OR
    assert both({**base, "query": "big data"}) == {1, 2, 3, 4}
    # AND
    assert both({**base, "query": "big data",
                 "default_operator": "and"}) == {1, 4}
    # negation composes with the positive set
    assert both({**base, "query": "big -iron"}) == {1, 4}
    # quoted phrase is ordered-adjacent
    assert both({**base, "query": '"data lake"'}) == {3, 4}
    assert both({**base, "query": '-"data lake" big'}) == {1, 2}
    # loud failures: lucene operators, multi-field, empty
    with pytest.raises(ValueError, match="not\\s+implemented"):
        both({**base, "query": "big | data"})
    with pytest.raises(ValueError, match="exactly one entry"):
        both({"fields": ["a", "b"], "query": "x"})
    with pytest.raises(ValueError, match="empty query"):
        both({**base, "query": "   "})


def test_fuzzy_and_regexp_clauses(spark):
    import duckdb

    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )

    rows = [(1, "spark"), (2, "sprak"), (3, "spa"), (4, "hadoop")]
    df = spark.createDataFrame(rows, "id long, w string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, w VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)

    def both(clause):
        s = {r.id for r in df.where(compile_query(clause)).collect()}
        d = {r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {compile_query_sql(clause)}").fetchall()}
        assert s == d
        return s

    # AUTO fuzziness: len('spark')=5 -> 1 edit; plain Levenshtein counts
    # the 'sprak' transposition as 2 (fuzzy_transpositions:false mode)
    assert both({"fuzzy": {"w": "spark"}}) == {1}
    # explicit fuzziness widens to the transposition and the 2-char drop
    assert both({"fuzzy": {"w": {"value": "spark", "fuzziness": 2}}}) \
        == {1, 2, 3}
    # regexp is ANCHORED full-match in both engines
    assert both({"regexp": {"w": "sp.*k"}}) == {1, 2}
    assert both({"regexp": {"w": "spa"}}) == {3}


def test_match_phrase_prefix(spark):
    import duckdb

    from elasticsearch_drift_plugin_spark.functions.es_dsl import (
        compile_query,
        compile_query_sql,
    )

    rows = [(1, "big data lake"), (2, "big database"), (3, "a big dataset"),
            (4, "data big")]
    df = spark.createDataFrame(rows, "id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)

    def both(q):
        clause = {"match_phrase_prefix": q}
        s = {r.id for r in df.where(compile_query(clause)).collect()}
        d = {r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {compile_query_sql(clause)}").fetchall()}
        assert s == d
        return s

    # leading token exact + adjacent, trailing token a PREFIX
    assert both({"text": "big data"}) == {1, 2, 3}
    # the prefix must start a token right after the exact ones
    assert both({"text": {"query": "big datas"}}) == {3}
    assert both({"text": "data"}) == {1, 2, 3, 4}
