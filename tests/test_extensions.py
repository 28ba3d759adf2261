"""Unit tests for the LLM-pipeline extension operators on tiny in-memory
data (the sf-scale oracle comparison lives in tools/check_correctness.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_drift_plugin_spark.operators import multimodal, similarity
from elasticsearch_drift_plugin_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_gemm,
    ngram_jaccard_pairs_prefix,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_exact_dedup_groups(spark):
    df = _docs(
        spark,
        [(1, "a", "x y z"), (2, "a", "x y z"), (3, "b", "q"), (4, "b", "x y z")],
    )
    got = {r["keep_id"]: r["group_size"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert got == {1: 3, 3: 1}


def test_ngram_prefix_filter_matches_baseline(spark):
    rows = [
        (1, "a", "the quick brown fox jumps over the lazy dog"),
        (2, "a", "the quick brown fox jumps over the lazy cat"),
        (3, "a", "completely different text with no overlap at all"),
        (4, "b", "the quick brown fox jumps over the lazy dog"),  # other block
        (5, "a", "the quick brown fox leaps over the lazy dog"),
        (6, "a", "xy"),  # below gram length
    ]
    df = _docs(spark, rows)
    base = [tuple(r) for r in ngram_jaccard_pairs(df).collect()]
    pref = [tuple(r) for r in ngram_jaccard_pairs_prefix(df).collect()]
    gemm = [tuple(r) for r in ngram_jaccard_pairs_gemm(df).collect()]
    assert base == pref == gemm
    assert {(a, b) for a, b, _ in base} == {(1, 2), (1, 5), (2, 5)}


def test_ngram_gemm_bounded_subblocks_match_baseline(spark):
    """A block hotter than max_block_rows is hash-split into sub-block pairs;
    output must stay identical to the postings inverted index — including
    pairs whose two docs land in different sub-blocks."""
    rows = [(i, "a", f"the quick brown fox number {i % 3} jumps") for i in range(12)]
    rows.append((100, "b", "the quick brown fox number 0 jumps"))  # other block
    df = _docs(spark, rows)
    base = [tuple(r) for r in ngram_jaccard_pairs(df).collect()]
    assert len(base) == 66  # C(12,2): every same-source pair clears 0.5
    # 12-doc block with a 4-doc bound -> 3 sub-blocks; and an explicit
    # overpartitioned case (more sub-blocks than docs per side)
    for kw in ({"max_block_rows": 4}, {"n_subblocks": 5}):
        got = [tuple(r) for r in ngram_jaccard_pairs_gemm(df, **kw).collect()]
        assert got == base, kw


def test_decode_media_golden(spark):
    df = _docs(spark, [(7, "a", "abcd")])  # 4 bytes
    b = multimodal.binary_documents(df)
    row = multimodal.decode_media(b).collect()[0]
    # _fake_decode(4 bytes): width 4%640+1=5, height (4*31)%480+1=125, fmt 4%3=1
    assert (row["width"], row["height"], row["n_pixels"], row["format"]) == (5, 125, 625, "jpeg")


def test_decode_media_kernel_guard(spark):
    """kernel='auto' falls back to the stub in this codec-less container
    (same rows as 'fake'); kernel='pil' fails with a clear install hint;
    bad kernel names fail fast at plan-build time."""
    import pytest as _pytest

    df = _docs(spark, [(7, "a", "abcd"), (8, "a", "xy")])
    b = multimodal.binary_documents(df)
    fake = [tuple(r) for r in multimodal.decode_media(b).orderBy("doc_id").collect()]
    auto = [
        tuple(r)
        for r in multimodal.decode_media(b, kernel="auto").orderBy("doc_id").collect()
    ]
    assert fake == auto and len(fake) == 2
    with _pytest.raises(ValueError, match="kernel"):
        multimodal.decode_media(b, kernel="libav")
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with _pytest.raises(Exception, match="Pillow"):
            multimodal.decode_media(b, kernel="pil").collect()


def test_resize_media_golden(spark):
    # 1000 bytes: fake dims w=1000%640+1=361, h=(1000*31)%480+1=281;
    # fits? 361>224 -> scale; w*th=361*224=80864 vs h*tw=281*224=62944:
    # w*th > h*tw -> width limits: ow=224, oh=max(1, 281*224//361)=174;
    # k = 1000*224*174 // (361*281) = 38,976,000 // 101,441 = 384
    df = _docs(spark, [(1, "a", "x" * 1000), (2, "a", "")])
    b = multimodal.binary_documents(df)
    rows = {r["doc_id"]: r for r in multimodal.resize_media(b).collect()}
    r1 = rows[1]
    assert (r1["width"], r1["height"], r1["n_bytes_out"]) == (224, 174, 384)
    assert len(bytes(r1["payload_out"])) == 384
    r2 = rows[2]  # empty payload: 0 bytes out, min dims
    assert r2["n_bytes_out"] == 0 and len(bytes(r2["payload_out"])) == 0
    # small image passes through un-upscaled
    small = _docs(spark, [(3, "a", "abc")])  # w=4, h=94 -> fits 224x224
    r3 = multimodal.resize_media(multimodal.binary_documents(small)).collect()[0]
    assert (r3["width"], r3["height"], r3["n_bytes_out"]) == (4, 94, 3)


def test_extract_features_golden(spark):
    df = _docs(spark, [(1, "a", "ab"), (2, "a", "")])
    b = multimodal.binary_documents(df)
    rows = {r["doc_id"]: r for r in multimodal.extract_features(b).collect()}
    r1 = rows[1]  # bytes 97,98: n=2 sum=195 sq=195*... 97^2+98^2=19013
    assert r1["n_bytes"] == 2
    assert r1["mean_q"] == 195 * 1_000_000 // 2
    assert r1["var_q"] == (2 * 19013 - 195 * 195) // 4  # == 0 (floor of 0.25)
    assert (r1["min_b"], r1["max_b"]) == (97, 98)
    r2 = rows[2]  # empty payload -> NULL stats, n_bytes 0
    assert r2["n_bytes"] == 0 and r2["mean_q"] is None and r2["min_b"] is None


def test_resize_and_features_invariants(spark):
    """Randomized invariants over one DataFrame of seeded payloads:
    resize never upscales past the target box, output bytes are a prefix
    of the input, and feature moments are internally consistent."""
    import random

    rnd = random.Random(42)
    docs = [
        (i, "a", "".join(chr(rnd.randint(32, 126)) for _ in range(rnd.randint(1, 3000))))
        for i in range(40)
    ]
    b = multimodal.binary_documents(_docs(spark, docs))
    texts = {i: t for i, _, t in docs}
    for r in multimodal.resize_media(b, target_w=100, target_h=80).collect():
        n = len(texts[r["doc_id"]])
        w, h = n % 640 + 1, (n * 31) % 480 + 1
        if w <= 100 and h <= 80:
            assert (r["width"], r["height"]) == (w, h)  # passthrough
        else:
            assert r["width"] <= 100 and r["height"] <= 80
        assert 1 <= r["n_bytes_out"] <= n
        assert bytes(r["payload_out"]) == texts[r["doc_id"]].encode()[: r["n_bytes_out"]]
    for r in multimodal.extract_features(b).collect():
        data = texts[r["doc_id"]].encode()
        assert r["n_bytes"] == len(data)
        assert r["min_b"] == min(data) and r["max_b"] == max(data)
        assert r["min_b"] * 1_000_000 <= r["mean_q"] <= r["max_b"] * 1_000_000
        assert r["var_q"] >= 0


def test_frame_sample_counts(spark):
    df = _docs(spark, [(1, "a", "x" * 10000), (2, "a", "y")])
    b = multimodal.binary_documents(df)
    got = (
        multimodal.frame_sample(b)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx"))
        .collect()
    )
    by_id = {r["doc_id"]: (r["n"], r["mx"]) for r in got}
    assert by_id == {1: (2, 1), 2: (1, 0)}  # 10000//4096 = 2 frames; min 1 frame


def _vectors(spark, n=30, dim=8):
    rows = [(i, [float((i * 7 + d * 3) % 11) + 0.25 for d in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_topk_matches_bruteforce_when_probing_all_cells(spark):
    """With nprobe == n_centroids every cell is probed, so IVF must equal the
    exact brute-force ranking."""
    emb = _vectors(spark)
    q = emb.where(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(emb, q, k=4).collect()
    ivf = similarity.ivf_topk(emb, q, k=4, n_centroids=5, nprobe=5).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_ivf_topk_partial_probe_is_subset(spark):
    emb = _vectors(spark)
    q = emb.where(F.col("vec_id") < 3)
    rows = similarity.ivf_topk(emb, q, k=4, n_centroids=5, nprobe=2).collect()
    assert rows, "partial probe should still return candidates"
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
    # ranks are contiguous from 1 within each query
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_cosine_topk_guard_raises_without_brute_force(spark):
    """The all-pairs baseline refuses to plan a pair count above max_pairs
    unless the caller explicitly acknowledges with brute_force=True."""
    emb = _vectors(spark)
    q = emb.where(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="brute_force=True"):
        similarity.cosine_topk(emb, q, k=4, max_pairs=10)
    # explicit opt-in skips the guard entirely at any size
    assert similarity.cosine_topk(emb, q, k=4, max_pairs=10, brute_force=True).count() > 0
    # under the cap the guarded default still runs
    assert similarity.cosine_topk(emb, q, k=4).count() > 0


def test_ivf_from_index_guard_rejects_large_query_set(spark, tmp_path):
    emb = _vectors(spark)
    cents = similarity._seed_centroids(emb, 5)
    path = str(tmp_path / "ivf_guard_idx")
    similarity.write_ivf_index(similarity.ivf_assign(emb, cents), path)
    q = emb.where(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="max_query_rows"):
        similarity.ivf_topk_from_index(spark, path, q, cents, max_query_rows=2)
    assert similarity.ivf_topk_from_index(spark, path, q, cents, max_query_rows=3).count() > 0


def test_ivf_assignment_is_total_and_unique(spark):
    emb = _vectors(spark)
    cents = similarity._seed_centroids(emb, 5)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == 30
    assert assigned.select("vec_id").distinct().count() == 30
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(5))


def test_quantiles_approx_rank_bound_and_exact_mode(spark):
    """value_quantiles_approx honors the documented GK guarantee: rank error
    <= n/accuracy. With accuracy >= n it is rank-exact and equals the
    quantile_disc element the oracle computes."""
    from elasticsearch_drift_plugin_spark.operators.stats import (
        QUANT,
        value_quantiles_approx,
    )

    n = 2000
    vals = sorted(((i * 797) % n) * 0.5 - 300.0 for i in range(n))  # permutation
    ev = spark.createDataFrame(
        [("e", v) for v in vals], "event_type string, value double"
    )
    # exact mode: accuracy >= n returns the element at the quantile_disc rank
    got = {
        r["pct"]: r["val_q"]
        for r in value_quantiles_approx(ev, accuracy=10_000).collect()
    }
    import math

    for pct in (25, 50, 75, 95):
        idx = math.ceil(pct / 100 * n) - 1  # quantile_disc rank (1-based ceil)
        assert got[pct] == math.floor(vals[idx] * QUANT), pct
    # low accuracy: value must still be within the rank tolerance window
    acc = 20
    tol = n // acc + 1
    loose = {
        r["pct"]: r["val_q"] / QUANT
        for r in value_quantiles_approx(ev, accuracy=acc).collect()
    }
    for pct in (25, 50, 75, 95):
        idx = math.ceil(pct / 100 * n) - 1
        lo = vals[max(0, idx - tol)]
        hi = vals[min(n - 1, idx + tol)]
        assert lo - 1e-6 <= loose[pct] <= hi + 1e-6, (pct, loose[pct], lo, hi)


def test_repetition_score_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.text import repetition_score

    rows = [
        (1, "s", " ".join(["a b c d e"] * 3)),  # 15 toks, 11 grams, 5 distinct
        (2, "s", "one two three"),               # < 5 tokens: 0/0/0
        (3, "s", "v w x y z"),                   # exactly one gram, no repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.rep_q) for r in repetition_score(df).collect()}
    import math

    assert got[1] == (11, 5, math.floor((1 - 5 / 11) * 1_000_000))
    assert got[2] == (0, 0, 0)
    assert got[3] == (1, 1, 0)


def test_pii_scan_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.text import pii_scan

    rows = [
        (1, "s", "mail me at Bob.Smith@example.com or call 555-123-4567 now"),
        (2, "s", "host 10.0.0.1 serves https://example.com/x?id=123456789012"),
        (3, "s", "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ipv4, r.n_urls, r.n_long_digits)
        for r in pii_scan(df).collect()
    }
    assert got[1] == (1, 1, 0, 0, 0)
    assert got[2] == (0, 0, 1, 1, 1)
    assert got[3] == (0, 0, 0, 0, 0)


def test_tfidf_and_contamination_goldens(spark):
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        contamination_overlap,
        tfidf_top_terms,
    )

    docs = _docs(
        spark,
        [
            (1, "a", "rare common common"),
            (2, "a", "common common common"),
            (3, "a", "other common word"),
        ],
    )
    top = {(r.doc_id, r.rank): (r.term, r.tf) for r in tfidf_top_terms(docs, k=1).collect()}
    # 'rare'/'other'/'word' appear in one doc (max idf); 'common' in all three
    assert top[(1, 1)] == ("rare", 1)
    assert top[(3, 1)][0] in ("other", "word")  # tie -> lexicographic 'other'
    assert top[(3, 1)] == ("other", 1)
    # doc 2 has only 'common': still ranked (idf floor may be 0 but rank exists)
    assert top[(2, 1)][0] == "common"

    bench = _docs(spark, [(100, "b", "q w e r t y u i o p")])
    corpus = _docs(
        spark,
        [
            (10, "a", "q w e r t y u i o p"),   # full overlap: 3 of 3 grams hit
            (11, "a", "a b c d e f g h i j"),   # zero overlap
            (12, "a", "too short"),             # no grams
        ],
    )
    got = {
        r.doc_id: (r.n_grams, r.n_hit, r.frac_q)
        for r in contamination_overlap(corpus, bench).collect()
    }
    assert got[10] == (3, 3, 1_000_000)
    assert got[11] == (3, 0, 0)
    assert got[12] == (0, 0, 0)


def test_contamination_hashed_superset_of_exact(spark):
    """The hashed-membership variant has no false negatives: every exact
    hit counts; at 40 bits the counts are identical on a small corpus."""
    from elasticsearch_drift_plugin_spark.operators.corpus import (
        contamination_overlap,
        contamination_overlap_hashed,
    )

    bench = _docs(spark, [(100, "b", "q w e r t y u i o p")])
    corpus = _docs(
        spark,
        [
            (10, "a", "q w e r t y u i o p"),
            (11, "a", "a b c d e f g h i j"),
            (12, "a", "too short"),
        ],
    )
    exact = {
        r.doc_id: (r.n_grams, r.n_hit)
        for r in contamination_overlap(corpus, bench).collect()
    }
    hashed = {
        r.doc_id: (r.n_grams, r.n_hit)
        for r in contamination_overlap_hashed(corpus, bench).collect()
    }
    assert set(exact) == set(hashed)
    for d, (ng, nh) in exact.items():
        assert hashed[d][1] >= nh  # one-sided error
    assert hashed == exact  # at 40 bits, zero collisions here


def test_incremental_dedup_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.dedup import incremental_dedup

    existing = _docs(spark, [(1, "a", "seen before"), (2, "a", "also seen")])
    new = _docs(
        spark,
        [
            (10, "b", "seen before"),   # already in corpus: dropped
            (11, "b", "brand new"),
            (12, "b", "brand new"),     # in-batch duplicate: min id wins
            (13, "b", "another new"),
        ],
    )
    got = [r.doc_id for r in incremental_dedup(new, existing).collect()]
    assert got == [11, 13]


def test_hash_sample_deterministic_and_monotone(spark):
    """The same row makes the same cut in every run; a lower-rate sample is
    a strict subset of a higher-rate one; strata overrides apply."""
    from elasticsearch_drift_plugin_spark.operators.corpus import hash_sample

    docs = _docs(spark, [(i, f"src{i % 3}", f"doc {i}") for i in range(300)])
    s25a = {r.doc_id for r in hash_sample(docs, rate=0.25).collect()}
    s25b = {r.doc_id for r in hash_sample(docs, rate=0.25).collect()}
    s10 = {r.doc_id for r in hash_sample(docs, rate=0.10).collect()}
    assert s25a == s25b
    assert s10 <= s25a
    assert 0 < len(s10) < len(s25a) < 300
    strat = {
        r.doc_id
        for r in hash_sample(
            docs, rate=0.0, strata_col="source", strata_rates={"src1": 1.0}
        ).collect()
    }
    assert strat == {i for i in range(300) if i % 3 == 1}


def test_kmeans_cost_monotone_and_fixed_point(spark):
    """Lloyd invariants: cost is non-increasing across iterations, and
    well-separated clusters converge to their exact means."""
    # two tight clusters far apart, dim 4
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0, 0.0, 0.0]) for i in range(0, 12)]
    rows += [(i, [0.0, 0.0, 20.0 + (i % 3) * 0.1, 0.0]) for i in range(12, 24)]
    # ids 0,1 seed the two cells (lowest-id seeding needs one in each):
    rows[1] = (1, [0.0, 0.0, 20.0, 0.0])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    costs = []
    for it in (0, 1, 3):
        cents = similarity.kmeans_fit(emb, k=2, n_iter=it)
        costs.append(similarity.kmeans_cost_q(emb, cents))
    assert costs[0] >= costs[1] >= costs[2]
    # after convergence both centroids point along their cluster's axis
    cents = similarity.kmeans_fit(emb, k=2, n_iter=3)
    by_cid = {cid: vec for cid, vec, _ in cents}
    assert by_cid[0][0] > 1.0 and by_cid[0][2] == 0.0  # x-axis cluster
    assert by_cid[1][2] > 1.0 and by_cid[1][0] == 0.0  # z-axis cluster
    # fitted centroids drop into ivf_assign: every vector lands in its cluster
    assigned = {r.vec_id: r.cell for r in similarity.ivf_assign(emb, cents).collect()}
    for i in range(24):
        expect = 0 if (i < 12 and i != 1) else 1
        assert assigned[i] == expect, (i, assigned[i])


def test_rolling_fingerprint_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.text import rolling_fingerprint

    def py_roll(text, mod=1_000_000_007):
        h = 0
        for ch in text.lower():
            h = (h * 31 + ord(ch)) % mod
        return h

    rows = [(1, "s", "Hello World"), (2, "s", "a"), (3, "s", "zzz 123!")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r["fp"] for r in rolling_fingerprint(df).collect()}
    assert got == {i: py_roll(t) for i, _, t in rows}


def test_hot_posting_circuit_breaker(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from elasticsearch_drift_plugin_spark.operators.dedup import _pair_intersections

    items = spark.createDataFrame(
        [(i, "x") for i in range(10)], "doc_id long, g string"
    )
    ok = _pair_intersections(items, [], "g", max_posting_len=10).collect()
    assert len(ok) == 45  # C(10,2) pairs from the single posting
    import pytest as _pytest

    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        _pair_intersections(items, [], "g", max_posting_len=5).collect()


def test_asof_join_goldens(spark):
    from elasticsearch_drift_plugin_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k1", 100), (2, "k1", 50), (3, "k1", 200), (4, "k2", 10)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("k1", 100, "a"), ("k1", 150, "b"), ("k2", 99, "c")],
        "k string, rt long, p string",
    )
    out = {r.id: r.p for r in asof_join(left, right, "k", "t", "rt", "p").collect()}
    assert out == {
        1: "a",    # equal time matches (at-or-before)
        2: None,   # no right row at or before t=50
        3: "b",    # latest of {100, 150}
        4: None,   # k2's only right row is after t=10
    }


def test_asof_chunked_equals_plain_on_skewed_key(spark):
    """asof_join_chunked must be row-identical to asof_join on a fixture with
    one hot key (the skew it exists for), empty chunks the carry must cross,
    boundary-exact times, and lefts before any right."""
    import random

    from elasticsearch_drift_plugin_spark.operators.asof import asof_join, asof_join_chunked

    rnd = random.Random(7)
    lrows = [("hot", rnd.randint(0, 100_000), i) for i in range(800)]
    lrows += [(f"k{i % 5}", rnd.randint(0, 100_000), 1000 + i) for i in range(100)]
    lrows += [("hot", 0, 9000), ("hot", 5000, 9001), ("cold", 50, 9002)]  # edges
    rtimes = {("hot", t) for t in rnd.sample(range(0, 100_000), 60)}
    rtimes |= {(f"k{i % 5}", rnd.randint(0, 100_000)) for i in range(25)}
    rtimes |= {("hot", 5000)}  # exactly on a chunk boundary
    rrows = [(k, t, t * 3 + 1) for k, t in rtimes]
    left = spark.createDataFrame(lrows, "k string, t long, lid long")
    right = spark.createDataFrame(rrows, "k string, rt long, p long")
    plain = sorted(
        tuple(r) for r in asof_join(left, right, "k", "t", "rt", "p").collect()
    )
    for chunk in (1000, 5000, 1_000_000):  # incl. one chunk >> data span
        chunked = sorted(
            tuple(r)
            for r in asof_join_chunked(
                left, right, "k", "t", "rt", "p", chunk_ms=chunk
            ).collect()
        )
        assert chunked == plain, chunk


def test_sessionize_chunked_equals_plain_on_skewed_key(spark):
    """sessionize_chunked must be row-identical to sessionize on a fixture
    with one hot key, sessions spanning chunk boundaries, and fragments
    whose ends reach several chunks ahead."""
    import random

    from elasticsearch_drift_plugin_spark.operators.sessionize import (
        sessionize,
        sessionize_chunked,
    )

    rnd = random.Random(42)
    rows = []
    t = 0
    for i in range(900):  # hot key: bursts split by gap_ms=100
        t += rnd.choice([5, 20, 150, 400])
        e = t + (rnd.randint(500, 2500) if i % 37 == 0 else rnd.randint(0, 60))
        rows.append(("hot", t, e, rnd.randint(0, 300) / 7.0, i))
    for i in range(60):  # background keys
        s = rnd.randint(0, 30_000)
        rows.append((f"k{i % 7}", s, s + rnd.randint(0, 80), 1.5, 1000 + i))
    df = spark.createDataFrame(
        rows, "k string, start_ms long, end_ms long, value double, fid long"
    )
    plain = [
        tuple(r)
        for r in sessionize(
            df, ["k"], "start_ms", "end_ms", "value", gap_ms=100,
            order_tiebreak=("fid",),
        ).collect()
    ]
    for chunk in (1000, 7777, 1_000_000):
        chunked = [
            tuple(r)
            for r in sessionize_chunked(
                df, ["k"], "start_ms", "end_ms", "value", gap_ms=100,
                chunk_ms=chunk, order_tiebreak=("fid",),
            ).collect()
        ]
        assert chunked == plain, chunk


# --------------------------------------------------------------------------
# connected components (operators/components.py)
# --------------------------------------------------------------------------
def _cc_bruteforce(edges):
    """Driver-side union-find ground truth for small fixtures."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(spark, edges, **kw):
    from elasticsearch_drift_plugin_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_components_chain_star_and_singleton_pairs(spark):
    # a 60-node chain (worst case for naive min-propagation: O(n) rounds;
    # large/small-star closes it in a handful), a star, one isolated pair,
    # and a self-loop that must be dropped
    chain = [(i, i + 1) for i in range(100, 160)]
    star = [(500, x) for x in (501, 502, 503)]
    edges = chain + star + [(900, 901), (77, 77)]
    got = _cc_spark(spark, edges)
    want = _cc_bruteforce([(a, b) for a, b in edges if a != b])
    assert got == want
    assert got[159] == 100 and got[503] == 500 and got[901] == 900
    assert 77 not in got  # self-loop only => not a pair participant


def test_components_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc_spark(spark, edges) == _cc_bruteforce(edges)


def test_components_distributed_path_matches_driver_fast_path(spark):
    # max_driver_edges=0 forces the large/small-star loop; the default
    # routes this small graph through the guarded driver union-find. Both
    # must produce the identical min-reachable-id component map.
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    star = _cc_spark(spark, edges, max_driver_edges=0)
    fast = _cc_spark(spark, edges)
    assert star == fast == _cc_bruteforce(edges)


def test_component_summary_sizes(spark):
    from elasticsearch_drift_plugin_spark.operators.components import (
        component_summary,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in component_summary(df).collect()}
    assert rows[3]["component"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[11]["component"] == 10 and rows[11]["cluster_size"] == 2


def test_span_dedup_first_occurrence_semantics(spark):
    import hashlib

    from elasticsearch_drift_plugin_spark.operators.corpus import span_dedup

    # chunk=2: doc 1 = [A B][C D], doc 2 = [C D][E F] (span "c d" duplicates
    # doc 1 pos 1), doc 3 = [A B][A B] (intra-doc duplicate: pos 0 wins),
    # doc 4 = one token -> no full span, excluded
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "c d e f"),
            (3, "a b a b"),
            (4, "x"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in span_dedup(docs, chunk=2).collect()}
    assert sorted(rows) == [1, 2, 3]

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert rows[1]["dup_spans"] == 0 and rows[1]["cleaned_md5"] == h("a b c d")
    assert rows[2]["dup_spans"] == 1 and rows[2]["cleaned_md5"] == h("e f")
    # doc 3: "a b" already kept by doc 1 -> both occurrences removed
    assert rows[3]["dup_spans"] == 2 and rows[3]["cleaned_md5"] == h("")


# --------------------------------------------------------------------------
# ES sibling aggregations (operators/es_aggs.py)
# --------------------------------------------------------------------------
def test_es_range_overlap_unbounded_and_empty(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import range_agg

    df = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 30.0), (4, 300.0), (5, None), (6, float("nan"))],
        "id long, value double",
    )
    ranges = [(None, 25.0), (25.0, 100.0), (20.0, 40.0), (1000.0, None)]
    rows = {r["key"]: r for r in range_agg(df, "value", ranges).collect()}
    assert rows["*-25"]["doc_count"] == 1          # half-open upper
    assert rows["25-100"]["doc_count"] == 2
    assert rows["20-40"]["doc_count"] == 2          # overlapping range double-counts
    assert rows["1000-*"]["doc_count"] == 0         # empty range still emitted
    assert rows["1000-*"]["range_to"] is None


def test_es_terms_tiebreak_and_min_doc_count(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import terms_agg

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "k string"
    )
    rows = terms_agg(df, "k", size=2).collect()
    # equal counts -> key asc tie-break; size cuts 'c'
    assert [(r["key"], r["doc_count"]) for r in rows] == [("a", 2), ("b", 2)]
    rows = terms_agg(df, "k", size=10, min_doc_count=2).collect()
    assert all(r["doc_count"] >= 2 for r in rows) and len(rows) == 2


def test_es_extended_stats_exact_variance(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        QUANT,
        extended_stats_agg,
    )

    vals = [1.25, 2.5, 2.5, 10.0, 0.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None), ("g", float("nan"))],
        "grp string, value double",
    )
    r = extended_stats_agg(df, ["grp"], "value").collect()[0]
    q = [int(v * QUANT) for v in vals]
    n = len(q)
    assert r["count"] == n and r["min"] == 0.0 and r["max"] == 10.0
    assert r["sum_q"] == sum(q)
    assert r["avg_q"] == sum(q) // n
    assert int(r["var_q"]) == (n * sum(x * x for x in q) - sum(q) ** 2) // (n * n)


def test_negative_sum_avg_floors_like_python(spark):
    """ADVICE r3: `div` truncates toward zero, DuckDB `//` floors — a
    negative-sum group must floor (Python // semantics) in both value_stats
    and extended_stats avg_q, and in weighted_avg's wavg_q."""
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        QUANT,
        extended_stats_agg,
        value_stats_agg,
        weighted_avg,
    )

    vals = [-1.25, -2.5, 0.4]  # sum_q = -3350000, n = 3 -> floor != truncate
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, value double")
    q = [int(v * QUANT) if v >= 0 else -int(-v * QUANT) for v in vals]
    # floor() of the quantization itself: floor(-1.25e6) = -1250000 exactly
    assert sum(q) % len(q) != 0 and sum(q) < 0
    expect = sum(q) // len(q)
    vs = value_stats_agg(df, ["grp"], "value").collect()[0]
    es = extended_stats_agg(df, ["grp"], "value").collect()[0]
    assert vs["avg_q"] == expect != int(sum(q) / len(q))  # floor, not truncate
    assert es["avg_q"] == expect
    wdf = spark.createDataFrame(
        [("g", -1.25, 1.0), ("g", -2.5, 2.0), ("g", 0.4, 1.0)],
        "grp string, v double, w double",
    )
    wv = weighted_avg(wdf, ["grp"], "v", "w").collect()[0]
    num = sum(a * b for a, b in zip(q, [QUANT, 2 * QUANT, QUANT]))
    assert wv["wavg_q"] == num // (4 * QUANT)
    # and the DuckDB twins floor identically (DuckDB integer `//` TRUNCATES
    # toward zero — the twins must strip the remainder first; regression for
    # the r4 geo_centroid off-by-one on negative sums)
    import duckdb

    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        extended_stats_sql,
        value_stats_sql,
        weighted_avg_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('g', -1.25, 1.0), "
        "('g', -2.5, 2.0), ('g', 0.4, 1.0)) v(grp, value, w)"
    )
    assert con.execute(value_stats_sql("t", ["grp"], "value")).fetchall()[0][3] == expect
    assert con.execute(extended_stats_sql("t", ["grp"], "value")).fetchall()[0][5] == expect
    wrow = con.execute(
        weighted_avg_sql("t", ["grp"], "value", "w")
    ).fetchall()[0]
    assert wrow[2] == num // (4 * QUANT)


def test_es_histogram_offset_keys(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import histogram_agg

    df = spark.createDataFrame(
        [(9.0,), (10.0,), (59.9,), (60.0,), (-5.0,)], "value double"
    )
    rows = {r["key"]: r["doc_count"] for r in histogram_agg(df, "value", 50.0, offset=10.0).collect()}
    # buckets: [-40,10) [10,60) [60,110)
    assert rows == {-40.0: 2, 10.0: 2, 60.0: 1}


def test_asof_directions_and_tolerance_goldens(spark):
    from elasticsearch_drift_plugin_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 1, 100), ("k", 2, 205), ("k", 3, 300), ("k", 4, 999)],
        "key string, lid long, t long",
    )
    right = spark.createDataFrame(
        [("k", 100, "a"), ("k", 210, "b"), ("k", 300, "c")],
        "key string, t long, p string",
    )

    def run(**kw):
        rows = asof_join(left, right, "key", "t", "t", "p", **kw).collect()
        return {r["lid"]: r["p"] for r in rows}

    # backward: equal time matches; 205 -> a; 999 -> latest (c)
    assert run() == {1: "a", 2: "a", 3: "c", 4: "c"}
    # forward: equal time matches; 205 -> b; 999 -> no following row
    assert run(direction="forward") == {1: "a", 2: "b", 3: "c", 4: None}
    # nearest: 205 is 5 from b, 105 from a -> b; exact-distance tie would
    # resolve backward; 999 falls back to backward side
    assert run(direction="nearest") == {1: "a", 2: "b", 3: "c", 4: "c"}
    # tolerance gates each side: 999 - 300 = 699 > 100 -> NULL
    assert run(direction="nearest", tolerance=100) == {1: "a", 2: "b", 3: "c", 4: None}
    assert run(tolerance=0) == {1: "a", 2: None, 3: "c", 4: None}


def test_asof_nearest_tie_resolves_backward(spark):
    from elasticsearch_drift_plugin_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 1, 200)], "key string, lid long, t long")
    right = spark.createDataFrame(
        [("k", 150, "before"), ("k", 250, "after")], "key string, t long, p string"
    )
    rows = asof_join(left, right, "key", "t", "t", "p", direction="nearest").collect()
    assert rows[0]["p"] == "before"


def test_canonical_map_covers_whole_corpus(spark):
    from elasticsearch_drift_plugin_spark.operators.components import canonical_map

    corpus = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical"] for r in canonical_map(corpus, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_es_composite_pagination_walks_full_space(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import composite_agg

    df = spark.createDataFrame(
        [(t, float(v)) for t in ("a", "b", "c") for v in (5, 15, 25, 35)] * 2,
        "t string, v double",
    )
    sources = [("t", "terms", "t", None), ("vb", "histogram", "v", 10.0)]
    full = composite_agg(df, sources, size=1000).collect()
    assert len(full) == 12 and all(r["doc_count"] == 2 for r in full)
    # page through with size=5 using each page's last key as the cursor
    seen, after = [], None
    while True:
        page = composite_agg(df, sources, size=5, after=after).collect()
        if not page:
            break
        seen.extend(page)
        after = (page[-1]["t"], page[-1]["vb"])
    assert [tuple(r) for r in seen] == [tuple(r) for r in full]


def test_es_filters_null_predicate_goes_to_other(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import filters_agg

    df = spark.createDataFrame(
        [(1, 150.0), (2, 50.0), (3, None)], "id long, v double"
    )
    rows = {r["key"]: r["doc_count"] for r in filters_agg(
        df, {"big": "v >= 100", "small": "v < 100"}, other_bucket=True
    ).collect()}
    # NULL v matches neither predicate -> ES puts the doc in _other_
    assert rows == {"big": 1, "small": 1, "_other_": 1}


def test_auto_date_histogram_ladder_selection(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        auto_date_histogram,
    )

    # 100 points over 100 s -> 1s gives 101 > 10, ..., 30s gives 4 <= 10
    df = spark.createDataFrame([(i * 1000,) for i in range(101)], "t long")
    rows = auto_date_histogram(df, "t", target_buckets=10).collect()
    assert rows[0]["interval"] == "30s" and len(rows) == 4
    assert [r["key"] for r in rows] == [0, 30_000, 60_000, 90_000]

    # 7-year span -> every fixed rung overflows target 5; 3M rung fits?
    # 7y/3M = 28 > 5 -> 1y = 7 > 5 -> 5y = 2 <= 5
    ms_2015 = 1420070400000  # 2015-01-01
    ms_2022 = 1640995200000  # 2022-01-01
    df = spark.createDataFrame([(ms_2015,), (ms_2022,)], "t long")
    rows = auto_date_histogram(df, "t", target_buckets=5).collect()
    assert rows[0]["interval"] == "5y"
    # 5y rung groups month-index // 60: 2015 -> bucket starting 2010-05?
    # month index 2015*12 = 24180, 24180 % 60 = 0 -> key = 2015-01-01
    assert rows[0]["key"] == ms_2015

    # empty input: stable empty frame, finest label
    empty = spark.createDataFrame([], "t long")
    out = auto_date_histogram(empty, "t", target_buckets=10)
    assert out.collect() == [] and "interval" in out.columns


def test_significant_terms_lift_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import significant_terms

    # term "x" appears 3/4 in fg but 4/8 overall -> lift (3/4)/(4/8) = 1.5
    rows = spark.createDataFrame(
        [("x", 1), ("x", 1), ("x", 1), ("y", 1),
         ("x", 0), ("y", 0), ("y", 0), ("y", 0)],
        "term string, fg int",
    )
    got = {r["key"]: r for r in significant_terms(
        rows, "term", "fg = 1", min_doc_count=1
    ).collect()}
    assert got["x"]["fg_count"] == 3 and got["x"]["bg_count"] == 4
    assert got["x"]["score_q"] == 1_500_000
    assert got["y"]["score_q"] == 500_000


def test_percentile_ranks_exact(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import percentile_ranks

    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4)] + [("g", None)],
        "grp string, value double",
    )
    rows = {r["at_value"]: r["rank_q"] for r in percentile_ranks(
        df, ["grp"], "value", [0.5, 2.0, 10.0]
    ).collect()}
    assert rows == {0.5: 0, 2.0: 500_000, 10.0: 1_000_000}


def test_gopher_filter_rule_battery(spark):
    from elasticsearch_drift_plugin_spark.operators.text import gopher_filter

    long_clean = "the " * 30 + "word " * 30  # 60 tokens, stopwords, short words
    docs = spark.createDataFrame(
        [
            (1, long_clean.strip()),
            (2, "short text only"),                      # wc_low + stop2? has no 2 stop hits
            (3, ("supercalifragilistic " * 60).strip()), # mwl_high + stop2
            (4, ("a.b.c.d, " * 60).strip()),             # symbol violations
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert rows[1]["verdict"] == "keep" and rows[1]["failed_rules"] == ""
    assert "wc_low" in rows[2]["failed_rules"] and rows[2]["verdict"] == "drop"
    assert "mwl_high" in rows[3]["failed_rules"] and "stop2" in rows[3]["failed_rules"]
    assert "symbol" in rows[4]["failed_rules"]


def test_weighted_avg_exact(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import weighted_avg

    df = spark.createDataFrame(
        [("g", 10.0, 1.0), ("g", 20.0, 3.0), ("g", None, 9.0)],
        "grp string, v double, w double",
    )
    r = weighted_avg(df, ["grp"], "v", "w").collect()[0]
    # (10*1 + 20*3) / 4 = 17.5 -> 17_500_000 quanta
    assert r["n"] == 2 and r["wavg_q"] == 17_500_000


def test_top_metrics_argmax(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import top_metrics

    df = spark.createDataFrame(
        [("g", 1.0, 10), ("g", 5.0, 20), ("g", float("nan"), 99), ("h", 2.0, 30)],
        "grp string, s double, m long",
    )
    rows = {r["grp"]: r for r in top_metrics(df, ["grp"], "s", ["m"]).collect()}
    assert rows["g"]["sort_value"] == 5.0 and rows["g"]["m"] == 20
    assert rows["h"]["m"] == 30
    rows = {r["grp"]: r for r in top_metrics(
        df, ["grp"], "s", ["m"], descending=False
    ).collect()}
    assert rows["g"]["sort_value"] == 1.0 and rows["g"]["m"] == 10


def test_matrix_stats_exact_cov_and_corr(spark):
    from elasticsearch_drift_plugin_spark.operators.es_aggs import matrix_stats

    # y = 2x -> corr = 1; cov_pop([1,2,3],[2,4,6]) = 4/3
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double"
    )
    r = matrix_stats(df, "x", "y").collect()[0]
    assert r["n"] == 3
    # cov in 1e-12 quanta^2: 4/3 * 1e12, truncated
    assert r["cov_q"] == (4 * 10**12) // 3
    assert r["corr_mq"] in (999_999, 1_000_000)  # sqrt rounding at the boundary
    # anti-correlated pair
    df = spark.createDataFrame([(1.0, 6.0), (2.0, 4.0), (3.0, 2.0)], "x double, y double")
    r = matrix_stats(df, "x", "y").collect()[0]
    assert r["cov_q"] < 0 and r["corr_mq"] in (-1_000_000, -1_000_001)


def test_top_ngrams_document_frequency(spark):
    from elasticsearch_drift_plugin_spark.operators.corpus import top_ngrams

    # "a b c d e" appears in docs 1,2 (df=2); doc 3 repeats it intra-doc
    # (still one vote); "z z z z z" only in doc 3 (df=1, below min_df)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e x"),
            (2, "y a b c d e"),
            (3, "a b c d e a b c d e"),
            (4, "z z z z z"),
        ],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=5, size=10, min_df=2).collect()
    assert rows[0]["g"] == "a b c d e" and rows[0]["df"] == 3
    assert all(r["df"] >= 2 for r in rows)


def test_asof_directions_match_pandas_merge_asof(spark):
    import pandas as pd
    import random

    from elasticsearch_drift_plugin_spark.operators.asof import asof_join

    rng = random.Random(7)
    # left times ≡ 0 (mod 4), right ≡ 1 (mod 4): backward distances ≡ 3,
    # forward ≡ 1 (mod 4) — exact-distance ties impossible, so pandas'
    # and our tie conventions never diverge in this comparison
    left = [("k%d" % rng.randrange(3), 4 * rng.randrange(200)) for _ in range(120)]
    right_set = {("k%d" % rng.randrange(3), 4 * rng.randrange(200) + 1) for _ in range(80)}
    right = [(k, t, "p%d_%d" % (hash(k) % 10, t)) for k, t in sorted(right_set)]

    ldf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left)], "key string, lid long, t long"
    )
    rdf = spark.createDataFrame(right, "key string, t long, p string")
    lpd = pd.DataFrame(left, columns=["key", "t"]).assign(lid=range(len(left)))
    rpd = pd.DataFrame(right, columns=["key", "t", "p"])

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 40):
            got = {
                r["lid"]: r["p"]
                for r in asof_join(
                    ldf, rdf, "key", "t", "t", "p",
                    direction=direction, tolerance=tol,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd.sort_values("t"), rpd.sort_values("t"),
                on="t", by="key", direction=direction,
                tolerance=tol,
            )
            exp = {
                int(r.lid): (None if pd.isna(r.p) else r.p)
                for r in exp_df.itertuples()
            }
            assert got == exp, (direction, tol)


def test_extended_and_matrix_stats_match_numpy(spark):
    import numpy as np

    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        QUANT,
        extended_stats_agg,
        matrix_stats,
    )

    rng = np.random.default_rng(11)
    # quantize inputs so the integer pipeline is exactly representable
    x = np.floor(rng.uniform(0, 500, 300) * QUANT) / QUANT
    y = np.floor(rng.uniform(0, 500, 300) * QUANT) / QUANT
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "grp string, x double, y double",
    )
    es = extended_stats_agg(df, ["grp"], "x").collect()[0]
    xq = np.floor(x * QUANT).astype(np.int64)  # same IEEE floor as the operator
    assert es["sum_q"] == int(xq.sum())
    # integer var formula == numpy var_pop on the quantized values
    n = len(xq)
    want_var = (n * int((xq.astype(object) ** 2).sum()) - int(xq.sum()) ** 2) // (n * n)
    assert int(es["var_q"]) == want_var
    assert abs(int(es["var_q"]) / QUANT**2 - np.var(x)) < 1e-4  # 1e-6 quantization noise

    ms = matrix_stats(df, "x", "y").collect()[0]
    assert abs(ms["cov_q"] / 1e12 - np.cov(x, y, bias=True)[0, 1]) < 1e-4
    assert abs(ms["corr_mq"] / 1e6 - np.corrcoef(x, y)[0, 1]) < 1e-5


def test_ivf_index_at_rest_partition_prunes(spark, tmp_path):
    from elasticsearch_drift_plugin_spark.operators import similarity
    from elasticsearch_drift_plugin_spark.plans import explain_str
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = similarity._seed_centroids(emb, similarity.N_CENTROIDS)
    assigned = similarity.ivf_assign(emb, cents)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(assigned, path)

    queries = emb.where("vec_id < 5")
    out = similarity.ivf_topk_from_index(spark, path, queries, cents, k=5)
    plan = explain_str(out)
    # the cell IN (...) predicate must reach the scan as a partition filter
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # and the stored-index probe must match the in-memory operator
    expect = similarity.ivf_topk(emb, queries, k=5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_knn_index_hint_through_compiler(spark, tmp_path):
    from elasticsearch_drift_plugin_spark.functions.es_search import run_search
    from elasticsearch_drift_plugin_spark.operators import similarity
    from elasticsearch_drift_plugin_spark.plans import explain_str
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    path = str(tmp_path / "knn_ivf")
    similarity.build_ivf_index(emb, path, keep_cols=("label",))
    qv = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    body = {
        "knn": {"field": "embedding", "query_vector": qv, "k": 6,
                "index": {"path": path, "nprobe": 4}},
        "_source": {"includes": ["vec_id", "label"]},
        "size": 6,
    }
    hits = run_search(emb, body)["_hits"]
    plan = explain_str(hits)
    # the probed cells reach the index scan as a PARTITION filter — the
    # other n_centroids - nprobe directories are pruned at planning time
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    rows = hits.collect()
    assert len(rows) == 6
    # every indexed hit carries the exact tier's score for that vector —
    # the index changes the CANDIDATE SET (probed cells), never the score
    exact = {
        r.vec_id: r._score_q
        for r in run_search(
            emb, {"knn": {"field": "embedding", "query_vector": qv,
                          "k": emb.count()},
                  "_source": {"includes": ["vec_id", "label"]},
                  "size": emb.count()},
        )["_hits"].collect()
    }
    for r in rows:
        assert exact[r.vec_id] == r._score_q
    # a keep column the index does not carry fails loud
    import pytest

    similarity.build_ivf_index(emb, str(tmp_path / "bare"))
    with pytest.raises(ValueError, match="does not carry"):
        run_search(emb, {
            "knn": {"field": "embedding", "query_vector": qv, "k": 3,
                    "index": {"path": str(tmp_path / "bare"), "nprobe": 2}},
            "_source": {"includes": ["vec_id", "label"]}, "size": 3,
        })["_hits"].collect()


def test_histogram_filled_zero_buckets_and_bomb_guard(spark):
    import pytest

    from elasticsearch_drift_plugin_spark.operators.es_aggs import (
        histogram_agg_filled,
    )

    df = spark.createDataFrame([(5.0,), (255.0,)], "value double")
    rows = histogram_agg_filled(df, "value", 50.0).collect()
    # grid 0..250 step 50 -> 6 buckets, 4 zero-filled
    assert [r["key"] for r in rows] == [0.0, 50.0, 100.0, 150.0, 200.0, 250.0]
    assert [r["doc_count"] for r in rows] == [1, 0, 0, 0, 0, 1]
    with pytest.raises(Exception, match="bucket bomb"):
        histogram_agg_filled(df, "value", 50.0, max_fill_buckets=3).collect()


def test_rollup_report_levels(spark):
    from elasticsearch_drift_plugin_spark.operators.relational import rollup_report

    df = spark.createDataFrame(
        [("A", "F", 1.00), ("A", "O", 2.00), ("B", "F", 4.00)],
        "l_returnflag string, l_linestatus string, l_extendedprice double",
    )
    rows = {(r["l_returnflag"], r["l_linestatus"], r["gid"]): r for r in rollup_report(df).collect()}
    assert rows[("A", "F", 0)]["sum_price_q"] == 100
    assert rows[("A", None, 1)]["sum_price_q"] == 300   # per-flag subtotal
    assert rows[(None, None, 3)]["sum_price_q"] == 700  # grand total


def test_geo_grid_known_points(spark):
    """Geohash against the classic reference example and geotile against
    the formula computed independently in Python."""
    import math

    from elasticsearch_drift_plugin_spark.operators import geo

    # (57.64911, 10.40744) -> u4pruyd... (Wikipedia's canonical example)
    df = spark.createDataFrame(
        [("x", 1, 1.0, 57.64911, 10.40744)],
        "event_type string, user_id long, value double, lat double, lon double",
    )
    row = geo.geohash_grid(df, precision=7).collect()[0]
    assert row["key"] == "u4pruyd" and row["doc_count"] == 1

    z = 6
    lat, lon = 40.7, -74.0
    n = 1 << z
    exp_x = min(int((lon + 180.0) / 360.0 * n), n - 1)
    latr = math.radians(lat)
    exp_y = int(
        (1 - math.log(math.tan(latr) + 1 / math.cos(latr)) / math.pi) / 2 * n
    )
    df2 = spark.createDataFrame(
        [("x", 1, 1.0, lat, lon)],
        "event_type string, user_id long, value double, lat double, lon double",
    )
    row2 = geo.geotile_grid(df2, zoom=z).collect()[0]
    assert row2["key"] == f"{z}/{exp_x}/{exp_y}"


def test_geo_centroid_floors_negative_hemisphere(spark):
    from elasticsearch_drift_plugin_spark.operators import geo

    df = spark.createDataFrame(
        [("x", 1, 1.0, -1.000001, 2.000001), ("x", 2, 1.0, -2.000002, 3.000002)],
        "event_type string, user_id long, value double, lat double, lon double",
    )
    row = geo.geo_centroid_agg(df, ["event_type"]).collect()[0]
    # sums: lat -3000003, lon 5000003 over n=2 -> floor(-1500001.5), floor(2500001.5)
    assert (row["lat_udeg"], row["lon_udeg"]) == (-1500002, 2500001)


def test_geo_distance_buckets_partition_all_rows(spark):
    from elasticsearch_drift_plugin_spark.operators import geo

    pts = geo.geo_events(
        spark.createDataFrame(
            [(i, float(i)) for i in range(200)], "user_id long, value double"
        ).withColumn("event_type", F.lit("x")).select("event_type", "user_id", "value")
    )
    out = geo.geo_distance_agg(pts, origin=(40.7, -74.0)).collect()
    assert sum(r["doc_count"] for r in out) == 200  # every row in exactly one range
    assert [r["key"] for r in out][0].startswith("*-")


def test_hll_cardinality_invariants(spark, tmp_path):
    """No oracle can reproduce DataSketches estimates, so the numeric
    contract is pinned here: determinism, error bound vs exact, and the
    rollup (stored per-bucket sketches, unioned later) agreeing with a
    direct sketch over the same rows."""
    from elasticsearch_drift_plugin_spark.operators import sketches

    day = 86_400_000
    rows = [
        (i % 7, (i * 2654435761) % 3000, (i % 20) * day)
        for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "grp long, uid long, t_ms long")

    est1 = {r["grp"]: r["est"] for r in
            sketches.cardinality_approx(df, ["grp"], "uid").collect()}
    est2 = {r["grp"]: r["est"] for r in
            sketches.cardinality_approx(df, ["grp"], "uid").collect()}
    assert est1 == est2  # deterministic
    exact = {r["grp"]: r["n"] for r in
             df.groupBy("grp").agg(F.countDistinct("uid").alias("n")).collect()}
    for g, e in est1.items():
        assert abs(e - exact[g]) / exact[g] < 0.05, (g, e, exact[g])

    path = str(tmp_path / "card_rollup")
    sketches.write_cardinality_rollup(df, path, "t_ms", "uid", ["grp"])
    # range query over days [5, 15) from stored sketches vs exact
    lo, hi = 5 * day, 15 * day
    got = {r["grp"]: r["est"] for r in
           sketches.rollup_cardinality(spark, path, ["grp"], lo, hi).collect()}
    sub = df.where((F.col("t_ms") >= lo) & (F.col("t_ms") < hi))
    sub_exact = {r["grp"]: r["n"] for r in
                 sub.groupBy("grp").agg(F.countDistinct("uid").alias("n")).collect()}
    for g, e in got.items():
        assert abs(e - sub_exact[g]) / sub_exact[g] < 0.05, (g, e, sub_exact[g])
    # the whole-range rollup matches the direct sketch estimate's ballpark
    all_roll = {r["grp"]: r["est"] for r in
                sketches.rollup_cardinality(spark, path, ["grp"]).collect()}
    for g in est1:
        assert abs(all_roll[g] - exact[g]) / exact[g] < 0.05


def test_geohash_matches_independent_bisection_model(spark):
    """Pin the integer bit-interleave geohash against the textbook
    bisection algorithm implemented independently in Python."""

    def py_geohash(lat, lon, precision):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, out, even = 0, [], True
        acc = 0
        for _ in range(5 * precision):
            if even:
                mid = (lon_lo + lon_hi) / 2
                bit = 1 if lon >= mid else 0
                lon_lo, lon_hi = (mid, lon_hi) if bit else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2
                bit = 1 if lat >= mid else 0
                lat_lo, lat_hi = (mid, lat_hi) if bit else (lat_lo, mid)
            acc = acc * 2 + bit
            bits += 1
            if bits == 5:
                out.append(b32[acc])
                acc, bits = 0, 0
            even = not even
        return "".join(out)

    from elasticsearch_drift_plugin_spark.operators import geo

    import random

    rnd = random.Random(7)
    pts = [
        (i, (rnd.randrange(-85_000_000, 85_000_001)) / 1e6,
         (rnd.randrange(-180_000_000, 180_000_001)) / 1e6)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        [("x", i, 1.0, lat, lon) for i, lat, lon in pts],
        "event_type string, user_id long, value double, lat double, lon double",
    )
    for precision in (3, 6):
        got = {
            r["key"]
            for r in geo.geohash_grid(df, precision=precision, size=1000).collect()
        }
        want = {py_geohash(lat, lon, precision) for _, lat, lon in pts}
        assert got == want, precision


def test_bigram_lm_score_golden(spark):
    """Hand-computed add-one bigram LM: corpus 'a b' ×2, 'a c', plus a
    single-token doc (vocab {a,b,c,x} ⇒ V = 4, c(a) = 3):
    logp(b|a) = ln(3/7), logp(c|a) = ln(2/7)."""
    import math

    from elasticsearch_drift_plugin_spark.operators.corpus import bigram_lm_score

    df = _docs(spark, [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "a c"), (4, "s", "x")])
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    lp_ab = math.floor(math.log((2 + 1) / (3 + 4)) * 1_000_000)
    lp_ac = math.floor(math.log((1 + 1) / (3 + 4)) * 1_000_000)
    assert (got[1]["n_bigrams"], got[1]["sum_logp_q"]) == (1, lp_ab)
    assert got[2]["sum_logp_q"] == lp_ab
    assert got[3]["sum_logp_q"] == lp_ac
    assert got[3]["avg_logp_q"] == lp_ac  # single bigram: avg == sum
    assert got[4]["n_bigrams"] == 0 and got[4]["avg_logp_q"] is None
    # the common bigram scores higher than the rare one
    assert got[1]["avg_logp_q"] > got[3]["avg_logp_q"]


def test_psum_rollup_reaggregates_within_quantization_bound(spark, tmp_path):
    """Hour-grain psum rollup re-aggregated to days must match the direct
    day-grain query: value within the documented floor-drift bound
    (< one quantum per extra flow-hour touch), touches = sum of hour
    doc_counts, and the HLL flow estimate close to the direct day
    doc_count (distinct flows, since each synthetic flow has a unique id
    and one range)."""
    from elasticsearch_drift_plugin_spark import proportional_sum
    from elasticsearch_drift_plugin_spark.operators import rollup

    DAY = 86_400_000
    HOUR = 3_600_000
    rows = []
    for i in range(400):
        s = i * 7 * HOUR // 3
        rows.append((i, s, s + (i % 50) * HOUR // 2 + 1, 10.0 + (i % 13) * 0.37, None))
    df = spark.createDataFrame(
        rows, "flow_id long, start_ms long, end_ms long, value double, sampling double"
    )
    path = str(tmp_path / "psum_rollup")
    rollup.write_psum_rollup(df, path, fine_interval_ms=HOUR, quantize=4)
    rolled = {r["key"]: r for r in rollup.rollup_psum(spark, path, DAY).collect()}
    direct = {
        r["key"]: r
        for r in proportional_sum(
            df, "start_ms", "end_ms", "value", "sampling", interval=DAY, quantize=4
        ).collect()
    }
    assert set(rolled) == set(direct)
    for k, d in direct.items():
        r = rolled[k]
        bound = (r["touches"] - d["doc_count"] + 1) * 1e-4
        assert 0 <= d["value"] - r["value"] < bound, (k, d["value"], r["value"], bound)
        assert abs(r["est_flows"] - d["doc_count"]) / max(d["doc_count"], 1) < 0.05
        assert r["touches"] >= d["doc_count"]  # touch count over-counts by design
    # range query prunes to the requested days and stays consistent
    lo = 2 * DAY
    hi = 5 * DAY
    sub = rollup.rollup_psum(spark, path, DAY, start_ms=lo, end_ms=hi).collect()
    assert {r["key"] for r in sub} == {k for k in direct if lo <= k < hi}


def test_hll_intersection_estimate(spark):
    """Inclusion-exclusion over conditional sketches: estimates within 5%
    of exact for a constructed overlap, zero-clamped for disjoint sets."""
    from elasticsearch_drift_plugin_spark.operators import sketches

    # ids 0..2999 in A; 2000..5999 in B -> |A|=3000 |B|=4000 |A∩B|=1000
    rows = [(i, "a") for i in range(3000)] + [(i, "b") for i in range(2000, 6000)]
    df = spark.createDataFrame(rows, "uid long, tag string")
    r = sketches.cardinality_intersect(
        df, "uid", "tag = 'a'", "tag = 'b'"
    ).collect()[0]
    assert abs(r["est_a"] - 3000) / 3000 < 0.05
    assert abs(r["est_b"] - 4000) / 4000 < 0.05
    assert abs(r["est_union"] - 6000) / 6000 < 0.05
    assert abs(r["est_intersect"] - 1000) / 1000 < 0.25  # differencing amplifies error
    dj = spark.createDataFrame(
        [(i, "a") for i in range(500)] + [(1000 + i, "b") for i in range(500)],
        "uid long, tag string",
    )
    r2 = sketches.cardinality_intersect(dj, "uid", "tag = 'a'", "tag = 'b'").collect()[0]
    assert r2["est_intersect"] <= 0.05 * 1000  # ~0, never negative
    assert r2["est_intersect"] >= 0


def test_psum_rollup_range_query_partition_prunes(spark, tmp_path):
    """The rollup's date filter must reach the scan as a partition filter —
    the at-rest claim in SCALE.md."""
    from elasticsearch_drift_plugin_spark.operators import rollup
    from elasticsearch_drift_plugin_spark.plans import explain_str
    from elasticsearch_drift_plugin_spark.sources.flows import events_flows

    fl = events_flows(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "ru_prune")
    rollup.write_psum_rollup(fl, path, fine_interval_ms=3_600_000)
    DAY = 86_400_000
    lo = 1_704_067_200_000 + 3 * DAY
    out = rollup.rollup_psum(spark, path, DAY, start_ms=lo, end_ms=lo + 7 * DAY)
    plan = explain_str(out)
    assert "PartitionFilters" in plan
    assert "date_ms" in plan.split("PartitionFilters", 1)[1][:300]


def test_psum_rollup_dynamic_partition_backfill(spark, tmp_path):
    """Re-running one day's rollup with dynamic partition overwrite replaces
    only that day; other days' partitions survive untouched."""
    from elasticsearch_drift_plugin_spark.operators import rollup

    DAY, HOUR = 86_400_000, 3_600_000
    rows = [
        (i, d * DAY + (i % 20) * HOUR, d * DAY + (i % 20) * HOUR + 2 * HOUR, 5.0, None)
        for d in range(3)
        for i in range(d * 100, d * 100 + 50)
    ]
    schema = "flow_id long, start_ms long, end_ms long, value double, sampling double"
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "dyn_rollup")
    rollup.write_psum_rollup(df, path, fine_interval_ms=HOUR)
    before = {r["key"]: r["value"] for r in rollup.rollup_psum(spark, path, DAY).collect()}
    assert set(before) == {0, DAY, 2 * DAY}
    # re-run ONLY day 1 with doubled values
    day1 = spark.createDataFrame(
        [(i, s, e, 10.0, None) for i, s, e, _, _ in rows if DAY <= s < 2 * DAY], schema
    )
    rollup.write_psum_rollup(
        day1, path, fine_interval_ms=HOUR, dynamic_partitions=True
    )
    after = {r["key"]: r["value"] for r in rollup.rollup_psum(spark, path, DAY).collect()}
    assert after[0] == before[0] and after[2 * DAY] == before[2 * DAY]  # untouched
    assert abs(after[DAY] - 2 * before[DAY]) < 1e-6  # replaced with doubled values


def test_geo_line_orders_truncates_and_flags_complete(spark):
    """geo_line returns the sort-ordered track, truncates to the FIRST
    `size` points (smallest sort values), and sets `complete` only when
    every matched doc made it into the line."""
    from elasticsearch_drift_plugin_spark.operators import geo

    rows = [
        # group g1: 3 points, out-of-order input, complete at size>=3
        ("g1", 3, 300, 0.000003, 0.000030),
        ("g1", 1, 100, 0.000001, 0.000010),
        ("g1", 2, 200, 0.000002, 0.000020),
        # group g2: 2 points with equal sort value -> tiebreak on event_id
        ("g2", 9, 500, 0.000004, 0.000040),
        ("g2", 8, 500, 0.000005, 0.000050),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, t_ms long, lat double, lon double"
    )
    full = {r["event_type"]: r for r in
            geo.geo_line_agg(df, ["event_type"], size=10).collect()}
    assert full["g1"]["line"] == "10,1 20,2 30,3"
    assert full["g1"]["complete"] and full["g1"]["n_points"] == 3
    # equal t_ms: event_id 8 sorts before 9
    assert full["g2"]["line"] == "50,5 40,4"

    cut = {r["event_type"]: r for r in
           geo.geo_line_agg(df, ["event_type"], size=2).collect()}
    assert cut["g1"]["line"] == "10,1 20,2"  # FIRST two by sort value
    assert not cut["g1"]["complete"]
    assert cut["g1"]["n_points"] == 2 and cut["g1"]["total_docs"] == 3


def test_frequent_item_sets_supports_and_apriori_cut(spark):
    """Pairs/triples count baskets containing the whole set; items below
    min_support never reach the quadratic stage (level-1 cut) and the
    output contains no set built from them."""
    from elasticsearch_drift_plugin_spark.operators.frequent_itemsets import (
        frequent_item_sets,
    )

    rows = [
        ("b1", "a"), ("b1", "b"), ("b1", "c"),
        ("b2", "a"), ("b2", "b"),
        ("b3", "a"), ("b3", "b"), ("b3", "c"),
        ("b4", "a"), ("b4", "rare"),
    ]
    df = spark.createDataFrame(rows, "basket string, item string")
    out = {(r["items"], r["set_size"]): r["support"]
           for r in frequent_item_sets(df, min_support=2, min_set_size=1).collect()}
    assert out[("a", 1)] == 4 and out[("b", 1)] == 3 and out[("c", 1)] == 2
    assert out[("a+b", 2)] == 3 and out[("a+c", 2)] == 2 and out[("b+c", 2)] == 2
    assert out[("a+b+c", 3)] == 2
    assert not any("rare" in k for k, _ in out)  # level-1 cut


def test_frequent_item_sets_ranking_and_limit(spark):
    from elasticsearch_drift_plugin_spark.operators.frequent_itemsets import (
        frequent_item_sets,
    )

    rows = [("b%d" % i, it) for i in range(4) for it in ("x", "y")]
    df = spark.createDataFrame(rows, "basket string, item string")
    got = frequent_item_sets(df, min_support=1, min_set_size=1, size=2).collect()
    # support desc, then set size desc (the pair outranks its singletons at
    # equal support), then items asc
    assert [(r["items"], r["support"]) for r in got] == [("x+y", 4), ("x", 4)]


def test_scripted_metric_partials_merge_exactly(spark):
    """The map/combine/reduce harness must give the same answer however
    the input is partitioned (partial states are commutative+associative),
    and the registered covariance instance must match the closed form."""
    from elasticsearch_drift_plugin_spark.operators.scripted import cov_scripted

    rows = [("A", uid, float(v)) for uid, v in
            [(1, 2.5), (2, 7.25), (503, 1.0), (1004, 9.5), (5, 0.125)]]
    rows += [("B", 10, 4.0), ("B", 20, float("nan")), ("B", 1030, None)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")

    one = {r["event_type"]: r for r in cov_scripted(df.coalesce(1)).collect()}
    many = {r["event_type"]: r for r in cov_scripted(df.repartition(7)).collect()}
    assert one == many

    # closed form for group A, Python ints (x = floor(v*1e6), y = uid%1000)
    pts = [(int(v * 1_000_000), uid % 1000) for uid, v in
           [(1, 2.5), (2, 7.25), (503, 1.0), (1004, 9.5), (5, 0.125)]]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    assert one["A"]["cov_q"] == (n * sxy - sx * sy) // (n * n)
    # NaN/NULL metric rows are skipped: B has exactly one surviving doc
    assert one["B"]["n"] == 1 and one["B"]["cov_q"] == 0


def test_scripted_metric_negative_covariance_floors(spark):
    """Negative covariance exercises the floor (not truncate) division —
    the cross-engine discipline the DuckDB twin mirrors with HUGEINT."""
    from elasticsearch_drift_plugin_spark.operators.scripted import cov_scripted

    # y rises while x falls -> negative covariance
    rows = [("A", 1, 9.0), ("A", 2, 5.0), ("A", 3, 1.0)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    got = cov_scripted(df).collect()[0]["cov_q"]
    pts = [(9_000_000, 1), (5_000_000, 2), (1_000_000, 3)]
    n, sx, sy = 3, sum(x for x, _ in pts), 6
    sxy = sum(x * y for x, y in pts)
    want = (n * sxy - sx * sy) // (n * n)
    assert want < 0 and got == want


def test_split_assign_stable_disjoint_and_salted(spark):
    from elasticsearch_drift_plugin_spark.operators.training import split_assign

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert set(a.values()) <= {"train", "val", "test"}
    # growth-stability: adding docs never moves an existing doc's split
    df2 = spark.createDataFrame([(i,) for i in range(800)], "doc_id long")
    b = {r["doc_id"]: r["split"] for r in split_assign(df2).collect()}
    assert all(b[k] == v for k, v in a.items())
    # rates land near 90/5/5 and every doc is assigned exactly once
    frac_train = sum(1 for v in b.values() if v == "train") / len(b)
    assert 0.8 < frac_train < 0.97 and len(b) == 800
    # a different salt draws an independent assignment (some docs move)
    c = {r["doc_id"]: r["split"] for r in split_assign(df2, salt="fold-1").collect()}
    assert any(c[k] != b[k] for k in c)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_assign(df, splits=(("train", 0.5), ("val", 0.2)))


def test_quantize_int8_bounds_error_and_zero_vector(spark):
    from elasticsearch_drift_plugin_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0]), (2, [3.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # m=1.0: q = floor(x*127) -> [63, -127, 31]
    assert rows[0]["qvec"] == "63,-127,31"
    assert rows[0]["scale_q"] == 1_000_000_000
    # all-zero vector: defined, scale 0, zero components
    assert rows[1]["qvec"] == "0,0,0" and rows[1]["scale_q"] == 0
    # max component maps to exactly 127
    assert rows[2]["qvec"] == "127"
    # reconstruction error bound: |x - q*m/127| <= m/127
    for vid, emb in ((0, [0.5, -1.0, 0.25]),):
        m = max(abs(v) for v in emb)
        qs = [int(s) for s in rows[vid]["qvec"].split(",")]
        for x, q in zip(emb, qs):
            assert abs(x - q * m / 127.0) <= m / 127.0 + 1e-12


def test_semantic_canonical_transitive_and_kept_flags(spark):
    """Near-identical embeddings collapse transitively to the min-id
    survivor; orthogonal vectors survive as themselves."""
    from elasticsearch_drift_plugin_spark.operators.components import (
        semantic_canonical_map,
    )
    from elasticsearch_drift_plugin_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # ~dup of 0
        (2, [0.99, 0.05, 0.0]),    # ~dup of 1 (and transitively of 0)
        (3, [0.0, 1.0, 0.0]),      # orthogonal: kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(emb, threshold=0.99)
    got = {r["vec_id"]: (r["canonical"], r["kept"])
           for r in semantic_canonical_map(emb, pairs).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False) and got[2] == (0, False)
    assert got[3] == (3, True)


def test_minhash_decontaminate_flags_fuzzy_benchmark_leak(spark):
    """A corpus doc that is a light edit of a benchmark doc gets flagged;
    unrelated docs report 0 matches; every corpus doc is emitted."""
    from elasticsearch_drift_plugin_spark.operators.dedup import (
        minhash_decontaminate,
    )

    bench_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    leaked = bench_text.replace("today", "tonight")  # near-dup, not exact
    other = "completely different words about spark partitions and shuffle plans here"
    corpus = spark.createDataFrame(
        [(1, leaked), (2, other)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in minhash_decontaminate(corpus, bench).collect()}
    assert len(got) == 2
    assert got[1]["contaminated"] and got[1]["n_matches"] >= 1
    assert got[1]["max_jacc_q"] > 500_000
    assert not got[2]["contaminated"] and got[2]["n_matches"] == 0


def test_ip_prefix_networks_and_min_doc_count(spark):
    from elasticsearch_drift_plugin_spark.operators.relational import ip_prefix_agg

    # craft user_ids whose Knuth-hash IPs we compute in Python
    def ip_of(uid):
        return (uid * 2654435761) % 4294967296

    rows = [(uid, 1.0) for uid in range(1, 40)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    got = ip_prefix_agg(df, prefix_len=4).collect()
    import collections
    want = collections.Counter((ip_of(u) >> 28) << 28 for u, _ in rows)
    assert {r["key"]: r["doc_count"] for r in got} == {
        f"{n >> 24}.{(n >> 16) % 256}.{(n >> 8) % 256}.{n % 256}": c
        for n, c in want.items()
    }
    assert all(r["prefix_length"] == 4 for r in got)
    # keys come back in network order
    nets = [tuple(int(p) for p in r["key"].split(".")) for r in got]
    assert nets == sorted(nets)
    # min_doc_count prunes sparse networks
    thick = ip_prefix_agg(df, prefix_len=4, min_doc_count=3).collect()
    assert all(r["doc_count"] >= 3 for r in thick) and len(thick) < len(got)


def test_knn_join_matches_bruteforce_across_blockings(spark):
    """Two-level top-k (per-block then merge) must equal the single-GEMM
    brute force under ANY block count, including blocks that split
    near-neighbors apart; ties rank by neighbor id asc."""
    import numpy as np

    from elasticsearch_drift_plugin_spark.operators.similarity import knn_join

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    # brute-force reference on the same float32-rounded inputs
    m = np.stack([np.array([float(np.float32(x)) for x in vecs[i]]) for i in range(40)])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sq = np.floor(m @ m.T * 1_000_000).astype(np.int64)
    want = {}
    k = 3
    for i in range(40):
        others = [j for j in range(40) if j != i]
        order = sorted(others, key=lambda j: (-int(sq[i, j]), j))[:k]
        want[i] = [(j, int(sq[i, j])) for j in order]

    for n_blocks in (1, 3, 7):
        got = {}
        rows = knn_join(df, k=k, n_blocks=n_blocks).collect()
        for r in rows:
            got.setdefault(r["vec_id"], []).append(
                (r["neighbor_id"], r["score_q"])
            )
        assert got == want, f"mismatch at n_blocks={n_blocks}"


def test_theta_set_ops_exact_below_sample_threshold(spark):
    """Theta sketches are EXACT while the retained set fits the sample
    (k=4096 default): small cohorts give exact set algebra."""
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.operators.sketches import theta_set_ops

    df = spark.range(600).select(F.col("id").alias("user_id"))
    r = theta_set_ops(df, "user_id", "user_id % 2 = 0", "user_id % 3 = 0").collect()[0]
    assert r["est_a"] == 300 and r["est_b"] == 200
    assert r["est_union"] == 400       # |A∪B| = 300+200-100
    assert r["est_intersect"] == 100   # multiples of 6
    assert r["est_a_minus_b"] == 200   # even, not multiple of 3


def test_kll_quantiles_close_to_exact_and_rollup_merges(spark, tmp_path):
    """KLL estimates stay within a few percent of exact quantiles, and the
    at-rest rollup (per-day sketches, merged later) agrees with the
    single-pass sketch on the same data."""
    from pyspark.sql import functions as F

    from elasticsearch_drift_plugin_spark.operators import sketches

    DAY = 86_400_000
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7 * DAY).alias("t_ms"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    est = {(r["g"], r["pct"]): r["est"]
           for r in sketches.quantiles_sketch(df, ["g"], "v").collect()}
    exact = {(r["g"], r["pct"]): r["q"] for r in df.groupBy("g").agg(
        F.expr("percentile(v, array(0.25, 0.5, 0.75, 0.95))").alias("qs")
    ).select("g", F.posexplode("qs").alias("i", "q")).select(
        "g", (F.element_at(F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(95)),
                           F.col("i") + 1)).alias("pct"), "q").collect()}
    for key, e in est.items():
        assert abs(e - exact[key]) <= 0.05 * 1000 + 1, (key, e, exact[key])

    path = str(tmp_path / "kll_rollup")
    sketches.write_quantile_rollup(df, path, "t_ms", "v", ["g"])
    merged = {(r["g"], r["pct"]): r["est"]
              for r in sketches.rollup_quantiles(spark, path, ["g"]).collect()}
    for key, e in merged.items():
        assert abs(e - exact[key]) <= 0.05 * 1000 + 1, (key, e, exact[key])
    # range query prunes partitions and still serves sane estimates
    part = sketches.rollup_quantiles(spark, path, ["g"], start_ms=0, end_ms=3 * DAY)
    assert part.count() == 12  # 3 groups x 4 pcts


def test_knn_join_guards_quadratic_blowup(spark):
    import pytest as _pytest

    from elasticsearch_drift_plugin_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="exhaustive=True"):
        knn_join(df, k=2, max_pairs=100)
    # acknowledged: runs fine
    assert knn_join(df, k=2, max_pairs=100, exhaustive=True).count() == 40


def test_knn_cells_restricts_to_cell_and_measures_recall(spark):
    """Cell-restricted k-NN: every neighbor shares the query's cell; on the
    real embedding fixture its recall vs exact knn_join is imperfect (the
    IVF trade) but substantial."""
    from elasticsearch_drift_plugin_spark.operators.similarity import (
        ivf_assign,
        _seed_centroids,
        knn_cells,
        knn_join,
    )
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cells = {r["vec_id"]: r["cell"]
             for r in ivf_assign(emb, _seed_centroids(emb, 16)).collect()}
    approx = knn_cells(emb, k=3).collect()
    assert all(cells[r["vec_id"]] == cells[r["neighbor_id"]] for r in approx)
    assert all(cells[r["vec_id"]] == r["cell"] for r in approx)

    exact = {(r["vec_id"], r["neighbor_id"]) for r in knn_join(emb, k=3).collect()}
    got = {(r["vec_id"], r["neighbor_id"]) for r in approx}
    recall = len(got & exact) / len(exact)
    # sf0.001 has ~3 vectors per cell, so cross-cell true neighbors dominate
    # — recall is structurally low here; the contract is "exact within the
    # cell" (hash-gated by the driver oracle), recall just has to be real
    assert 0.05 < recall <= 1.0, recall


def test_topic_terms_labels_planted_clusters(spark):
    """Docs with distinct vocabularies whose embeddings point at distinct
    centroids: each cluster's top term is its own vocabulary, and shared
    stopwords score below distinctive terms (cluster-level idf)."""
    from elasticsearch_drift_plugin_spark.operators.corpus import topic_terms

    # centroid ids 0/1 are also members; axis-aligned embeddings
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
         (2, [0.9, 0.1]), (3, [0.95, 0.05]),
         (4, [0.1, 0.9]), (5, [0.05, 0.95])],
        "vec_id long, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [(0, "the banana banana split"), (2, "the banana bread"),
         (3, "banana the smoothie"),
         (1, "the rocket launch"), (4, "rocket the engine"),
         (5, "rocket fuel the tank")],
        "doc_id long, text string",
    )
    out = topic_terms(docs, emb, k=2, n_clusters=2).collect()
    top = {r["cell"]: r["term"] for r in out if r["rank"] == 1}
    assert top[0] == "banana" and top[1] == "rocket"
    sizes = {r["cell"]: r["cluster_docs"] for r in out}
    assert sizes == {0: 3, 1: 3}
    # "the" appears in both clusters -> idf floor makes its score <= 0,
    # below any distinctive term
    for r in out:
        if r["term"] == "the":
            assert r["score_q"] <= 0


def test_phash_near_dup_hamming_and_exact_groups(spark):
    """aHash contract: identical payloads share a phash (grouped to the
    min-id survivor); a small local edit flips few of the 60 bits; an
    unrelated payload flips many."""
    from elasticsearch_drift_plugin_spark.operators.multimodal import (
        perceptual_hash,
        phash_dedup,
    )

    # uniform base: every cell sum equal -> 60*cs == total -> all bits 0;
    # a bright local edit lifts exactly its own cell above the mean
    base = b"\x80" * 2400
    edited = bytearray(base)
    edited[200:240] = b"\xff" * 40
    unrelated = bytes((i * 37 + 11) % 251 for i in range(2048))
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, bytes(edited)), (3, unrelated)],
        "doc_id long, payload binary",
    )
    h = {r["doc_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert h[0] == h[1]
    ham_edit = bin(h[0] ^ h[2]).count("1")
    ham_far = bin(h[0] ^ h[3]).count("1")
    assert ham_edit <= 5 < ham_far

    groups = {r["doc_id"]: r for r in phash_dedup(df).collect()}
    assert groups[1]["canonical"] == 0 and groups[1]["dup_count"] == 2
    assert groups[3]["canonical"] == 3 and groups[3]["dup_count"] == 1


def test_readability_known_text_and_monotonicity(spark):
    """Closed-form check on a known sentence; simple prose scores higher
    than dense polysyllabic text."""
    import math

    from elasticsearch_drift_plugin_spark.operators.text import readability

    simple = "the cat sat on the mat. it was fat."
    dense = "extraordinary multisyllabic vocabulary necessitates considerable comprehension"
    df = spark.createDataFrame(
        [(0, simple), (1, dense)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    r0 = rows[0]
    # 9 whitespace words, 2 terminator runs + 1 = 3 sentences
    assert r0["n_words"] == 9 and r0["n_sents"] == 3
    fre = 206.835 - 1.015 * (r0["n_words"] / r0["n_sents"]) \
        - 84.6 * (r0["n_syll"] / r0["n_words"])
    assert r0["fre_q"] == math.floor(fre * 1000)
    assert rows[0]["fre_q"] > rows[1]["fre_q"]


def test_cluster_purity_exact_on_separable_labels(spark):
    """Axis-aligned clusters with consistent labels -> purity 1.0; a mixed
    cell reports its majority and exact floored fraction."""
    from elasticsearch_drift_plugin_spark.operators.similarity import cluster_purity

    rows = [
        (0, [1.0, 0.0], 7), (2, [0.9, 0.1], 7), (3, [0.95, 0.05], 7),
        (1, [0.0, 1.0], 8), (4, [0.1, 0.9], 8), (5, [0.05, 0.95], 9),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["cell"]: r for r in cluster_purity(emb, n_centroids=2).collect()}
    assert out[0]["majority_label"] == 7 and out[0]["purity_q"] == 1_000_000
    # cell 1: labels 8,8,9 -> majority 8, purity floor(2/3 * 1e6)
    assert out[1]["majority_label"] == 8
    assert out[1]["purity_q"] == (2 * 1_000_000) // 3


def test_sample_exact_sizes_determinism_and_salt(spark):
    from elasticsearch_drift_plugin_spark.operators.corpus import sample_exact

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(300)], "doc_id long, source string"
    )
    a = sample_exact(df, n_per_stratum=20).collect()
    import collections
    sizes = collections.Counter(r["strata"] for r in a)
    assert sizes == {"s0": 20, "s1": 20, "s2": 20}  # EXACT sizes
    assert all(1 <= r["pick_rank"] <= 20 for r in a)
    # deterministic re-run
    b = sample_exact(df, n_per_stratum=20).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different salt draws a different committee
    c = sample_exact(df, n_per_stratum=20, salt="v2").collect()
    assert {r["doc_id"] for r in c} != {r["doc_id"] for r in a}
    # n larger than a stratum returns the whole stratum
    small = sample_exact(df.where("doc_id < 5"), n_per_stratum=50).collect()
    assert len(small) == 5


def test_trained_centroids_serve_knn_cells_and_topic_terms(spark):
    """The kmeans_fit → serving wire: Lloyd-trained centroids (a) beat the
    lowest-id seed centroids on quantized clustering cost over the real
    embeddings table, and (b) drop into knn_cells / topic_terms unchanged
    (same schema, sane results)."""
    from elasticsearch_drift_plugin_spark.operators import corpus
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    docs = load_table(spark, sf, "documents")

    seed = similarity._seed_centroids(emb, 8)
    trained = similarity.kmeans_fit(emb, k=8, n_iter=3)
    cost_seed = similarity.kmeans_cost_q(emb, seed)
    cost_trained = similarity.kmeans_cost_q(emb, trained)
    assert cost_trained < cost_seed  # training must actually help

    # knn_cells with trained cells: same contract, self-consistent ranks
    knn = similarity.knn_cells(emb, k=3, centroids=trained).collect()
    assert knn and {r.nn_rank for r in knn} <= {1, 2, 3}
    assert all(r.vec_id != r.neighbor_id for r in knn)
    assert set(knn[0].asDict()) == {
        "vec_id", "cell", "neighbor_id", "nn_rank", "score_q"
    }

    # topic_terms with trained topics: same schema, k terms per used cell
    tt = corpus.topic_terms(docs, emb, k=3, n_clusters=8, centroids=trained)
    rows = tt.collect()
    assert rows and set(rows[0].asDict()) == {
        "cell", "cluster_docs", "rank", "term", "tf", "score_q"
    }
    per_cell = {}
    for r in rows:
        per_cell.setdefault(r.cell, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_cell.values())


def test_pii_redact_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail Bob@Ex.COM now"),
            (2, "see http://x.io/a@b.cc?id=123456789 ok"),
            (3, "call 555-123-4567 from 10.0.0.1 ref 123456789"),
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.redacted, r.n_redacted) for r in pii_redact(df).collect()}
    # lowercased projection; email pattern matches the lowered form
    assert out[1] == ("mail [EMAIL] now", 1)
    # URL redacts FIRST and greedily eats the embedded email + digits
    assert out[2] == ("see [URL] ok", 1)
    # one of each later class; the long-digit run survives phone/ip passes
    assert out[3] == ("call [PHONE] from [IPV4] ref [NUMBER]", 3)
    assert out[4] == ("clean text only", 0)


def test_corpus_manifest_pins_quality_formula(spark):
    # the manifest's inlined per-doc quality score must stay identical to
    # text.quality_score — this pin makes silent drift impossible
    from elasticsearch_drift_plugin_spark.operators.corpus import corpus_manifest
    from elasticsearch_drift_plugin_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [(1, "the fast data, spark!", "a"), (2, "the fast data, spark!", "a"),
         (3, "a of to in is on", "b"), (4, "zz qq ww", "b")],
        "doc_id long, text string, source string",
    )
    m = {r.source: r for r in corpus_manifest(df).collect()}
    scores = {r.doc_id: r.score_q for r in quality_score(df).collect()}
    # source a: two identical docs -> 1 exact dup; same score -> all
    # three quartiles equal that score
    assert m["a"].n_docs == 2 and m["a"].n_exact_dups == 1
    assert (m["a"].q25_score == m["a"].q50_score == m["a"].q75_score
            == scores[1])
    # source b: quartiles interpolate between the two distinct doc scores
    lo, hi = sorted((scores[3], scores[4]))
    assert m["b"].n_exact_dups == 0
    assert m["b"].q25_score == lo + (hi - lo) // 4
    assert m["b"].q50_score == lo + (hi - lo) // 2
    # exact integer mean length in 1e-6 quanta
    assert m["a"].avg_chars_q == 21 * 1_000_000
    assert m["b"].total_ws_tokens == 6 + 3


def test_phrase_suggest_bigram_rescoring(spark):
    from elasticsearch_drift_plugin_spark.operators.search import phrase_suggest

    # "big data" is a frequent bigram; "bog data" never occurs. Both
    # 'big' and 'bog' are 1 edit from the probe 'bg', so candidate
    # generation alone cannot decide — the bigram LM must.
    rows = [(i, "big data wins big data big data") for i in range(5)] + [
        (100, "bog swamp"), (101, "data bog")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_suggest(
        df, probe=("bg", "data"), max_edits=1, cand_size=3, size=4
    ).collect()
    assert out[0].rank == 1 and out[0].phrase == "big data"
    phrases = [r.phrase for r in out]
    assert "bog data" in phrases  # candidate survived, outscored
    assert out[0].score_q > dict((r.phrase, r.score_q) for r in out)["bog data"]
    with pytest.raises(ValueError, match="probe"):
        phrase_suggest(df, probe=("solo",))


def test_rank_eval_metrics_golden(spark):
    from elasticsearch_drift_plugin_spark.operators.similarity import rank_eval

    # truth for q1: {10, 11, 12}; results hit 10 at rank 1, 12 at rank 3.
    # q2 finds nothing relevant.
    res = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 50, 1), (2, 51, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    tru = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 1, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {r.query_id: r for r in rank_eval(res, tru, k=3).collect()}
    import math

    g = lambda i: math.floor(1e6 / math.log2(i + 1))
    idcg = g(1) + g(2) + g(3)
    assert out[1].hits == 2 and out[1].precision_q == 2 * 1_000_000 // 3
    assert out[1].mrr_q == 1_000_000  # first relevant at rank 1
    assert out[1].ndcg_q == (g(1) + g(3)) * 1_000_000 // idcg
    assert (out[2].hits, out[2].precision_q, out[2].mrr_q, out[2].ndcg_q) \
        == (0, 0, 0, 0)


def test_terms_enum_prefix_and_case(spark):
    from elasticsearch_drift_plugin_spark.operators.search import terms_enum

    df = spark.createDataFrame(
        [("Spark",), ("spark",), ("sort",), ("scan",), ("join",), (None,)],
        "w string",
    )
    assert [r.term for r in terms_enum(df, "w", prefix="s", size=10).collect()] \
        == ["scan", "sort", "spark"]
    assert [r.term for r in terms_enum(df, "w", prefix="s", size=10,
                                       case_insensitive=True).collect()] \
        == ["scan", "sort", "spark"]
    assert [r.term for r in terms_enum(df, "w", size=2).collect()] \
        == ["Spark", "join"]


def test_wav_codec_roundtrip_chunkwalk_and_corruption(spark):
    import struct

    import numpy as np
    import pytest

    from elasticsearch_drift_plugin_spark.functions.wav_codec import (
        decode_wav,
        encode_wav,
    )
    from elasticsearch_drift_plugin_spark.operators.multimodal import (
        decode_audio_stats,
    )

    x = np.array([100, -200, 300, -32768, 32767], dtype="<i2")
    payload = encode_wav(8000, x)
    rate, back = decode_wav(payload)
    assert rate == 8000 and np.array_equal(back, x)
    # the payload is a spec-complete file: stdlib `wave` agrees
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)
        assert np.array_equal(np.frombuffer(w.readframes(5), dtype="<i2"), x)
    # real chunk walking: a LIST chunk (odd size -> pad byte) between
    # fmt and data must be skipped, not tripped over
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    rate2, back2 = decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(back2, x)
    # corruption raises, never guesses
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG" + payload[4:])
    with pytest.raises(ValueError, match="mono PCM16"):
        bad = bytearray(payload)
        bad[22] = 2  # channels = 2
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[:-3])
    # and the Arrow kernel converts corruption to NULLs (screen posture)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"junkjunkjunkjunk" * 4))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_audio_stats(df).collect()}
    assert rows[1].n_samples == 5 and rows[1].sample_rate == 8000
    assert rows[1].zero_crossings == 4  # every adjacent pair flips sign
    assert rows[2].n_samples is None and rows[2].mean_sq is None


def test_audio_frame_features_windows(spark):
    """r7: per-window features agree with whole-signal stats and the seam
    rule (pairs spanning a window boundary belong to neither window)."""
    import numpy as np

    from elasticsearch_drift_plugin_spark.functions.wav_codec import encode_wav
    from elasticsearch_drift_plugin_spark.operators.multimodal import (
        audio_frame_features,
        decode_audio_stats,
    )

    # 10 samples alternating every 3: + + + - - - + + + -
    x = np.where((np.arange(10) // 3) % 2 == 0, 700, -700).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, x)))], "doc_id long, payload binary"
    )
    rows = [(r.frame_idx, r.n, r.mean_sq, r.zero_crossings)
            for r in audio_frame_features(df, frame=4).collect()]
    # windows: [0..4) pairs at i=1..3 -> crossing at i=3 (1);
    # [4..8) pairs i=5..7 -> crossing at i=6 (1); [8..10) pair i=9 -> 1
    assert rows == [(0, 4, 490000, 1), (1, 4, 490000, 1), (2, 2, 490000, 1)]
    # seam rule: whole-signal crossings (3: i=3,6,9) equal the window sum
    # here because no crossing lands ON a seam (seams at 4, 8)
    whole = decode_audio_stats(df).collect()[0]
    assert whole.zero_crossings == sum(r[3] for r in rows)
    # now a seam-landing crossing: alternate every 4 with frame 4 — every
    # crossing (i=4, 8) sits ON a seam, so no window sees any pair
    y = np.where((np.arange(10) // 4) % 2 == 0, 500, -500).astype("<i2")
    df2 = spark.createDataFrame(
        [(2, bytearray(encode_wav(8000, y)))], "doc_id long, payload binary"
    )
    rows2 = [(r.frame_idx, r.zero_crossings)
             for r in audio_frame_features(df2, frame=4).collect()]
    assert rows2 == [(0, 0), (1, 0), (2, 0)]
    assert decode_audio_stats(df2).collect()[0].zero_crossings == 2


def test_scene_changes_detects_shot_boundaries(spark):
    """r7: shot detection really decodes — a hand-built container with
    known scene structure yields the exact boundary count and magnitudes,
    and a mid-container dim change raises (broken container, not a cut)."""
    import pytest

    from elasticsearch_drift_plugin_spark.functions.png_codec import encode_png
    from elasticsearch_drift_plugin_spark.operators.multimodal import (
        scene_changes,
    )

    def frame(fill, w=4, h=3):
        return encode_png(w, h, bytes([fill]) * (w * h), 0)

    # scenes: [10,10] [30] [250,250,250] -> 3 scenes, diffs 20 + 220
    payload = b"".join(frame(f) for f in (10, 10, 30, 250, 250, 250))
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = scene_changes(df).collect()[0]
    assert (r.n_frames, r.n_scenes, r.diff_total) == (6, 3, 240)
    bad = frame(10) + encode_png(5, 5, bytes([10]) * 25, 0)
    df2 = spark.createDataFrame(
        [(2, bytearray(bad))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="dims changed"):
        scene_changes(df2).collect()


def test_matryoshka_eval_full_width_is_perfect(spark):
    """r7: the MRL ladder's full-width rung IS the truth — recall 1.0
    exactly — and prefix rungs are bounded by it; a constructed corpus
    where the first 2 dims already separate neighbors hits 1.0 early."""
    from elasticsearch_drift_plugin_spark.operators.similarity import (
        matryoshka_eval,
    )
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = {r.dim: r for r in matryoshka_eval(emb, dims=(8, 64), k=5).collect()}
    assert rows[64].recall_q == 1_000_000  # full width == truth
    assert 0 <= rows[8].recall_q <= 1_000_000
    assert rows[8].n_hits <= rows[64].n_hits

    # first-2-dims-separable corpus: clusters along dim 0/1, noise after
    # (offsets keep every prefix nonzero — a zero-norm vector has no
    # cosine and the operator throws loudly under ANSI, by design)
    toy = spark.createDataFrame(
        [(i, [float(i % 3) + 1.0, (float(i % 3) + 1.0) * 2.0]
              + [0.001 * ((i * 7) % 5) + 0.001] * 6)
         for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    toy_rows = {r.dim: r for r in
                matryoshka_eval(toy, dims=(2, 8), k=3, n_queries=3).collect()}
    assert toy_rows[8].recall_q == 1_000_000
    assert toy_rows[2].recall_q >= 600_000  # the prefix already separates
