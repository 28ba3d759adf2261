"""Property test: distributed Apriori frequent_item_sets vs a brute-force
pure-Python model on randomized basket corpora."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_drift_plugin_spark.operators.frequent_itemsets import (
    frequent_item_sets,
)

baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),            # basket id
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),  # item
    ),
    min_size=1,
    max_size=60,
)


def _ref_frequent_sets(pairs, min_support, min_set_size, max_set_size):
    """Brute force: support of every itemset = #baskets containing it."""
    baskets = {}
    for b, it in pairs:
        baskets.setdefault(b, set()).add(it)
    out = {}
    for size in range(min_set_size, max_set_size + 1):
        items = sorted({it for _, it in pairs})
        for combo in combinations(items, size):
            sup = sum(1 for s in baskets.values() if set(combo) <= s)
            if sup >= min_support:
                out["+".join(combo)] = (size, sup)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=baskets_strategy, min_support=st.integers(min_value=1, max_value=4))
def test_frequent_item_sets_matches_bruteforce(spark, pairs, min_support):
    df = spark.createDataFrame(
        [(f"b{b}", it) for b, it in pairs], "basket string, item string"
    ).distinct()
    got = {
        r["items"]: (r["set_size"], r["support"])
        for r in frequent_item_sets(
            df, min_support=min_support, min_set_size=1, size=10_000
        ).collect()
    }
    want = _ref_frequent_sets(set(pairs), min_support, 1, 3)
    assert got == want
