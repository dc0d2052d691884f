"""frequent_item_sets aggregation (x-pack ML
FrequentItemSetsAggregationBuilder): Apriori passes, support threshold,
closed-set semantics, ranking."""

import pandas as pd
import pytest

from elasticsearch_ray.ops.frequent_items import frequent_item_sets

TX = [
    ["milk", "bread"],
    ["milk", "bread", "eggs"],
    ["milk", "bread", "eggs"],
    ["milk", "eggs"],
    ["bread"],
    ["milk"],
    ["cheese"],
    ["milk", "bread", "eggs", "cheese"],
    ["milk", "bread", "milk"],  # duplicate item in one tx counts once
    ["eggs"],
]
# supports (n=10): milk 7, bread 6, eggs 5, cheese 2
# {milk,bread} 5, {milk,eggs} 4, {bread,eggs} 3, {milk,bread,eggs} 3


@pytest.fixture(scope="module")
def tx_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"items": TX}))


def test_supports_and_threshold(tx_ds):
    out = frequent_item_sets(tx_ds, "items", minimum_support=0.3,
                             closed=False, size=100)
    sup = dict(zip(out["items"], out["doc_count"]))
    assert sup["milk"] == 7 and sup["bread"] == 6 and sup["eggs"] == 5
    assert sup["bread,milk"] == 5 and sup["eggs,milk"] == 4
    assert sup["bread,eggs,milk"] == 3 and sup["bread,eggs"] == 3
    assert "cheese" not in sup  # 0.2 < 0.3


def test_closed_sets_only(tx_ds):
    out = frequent_item_sets(tx_ds, "items", minimum_support=0.3,
                             closed=True, size=100)
    got = set(out["items"])
    # {bread,eggs} (3) is NOT closed: superset {bread,eggs,milk} has the
    # same doc_count; every other frequent set is closed
    assert "bread,eggs" not in got
    assert "bread,eggs,milk" in got and "bread,milk" in got


def test_ranking_and_size(tx_ds):
    out = frequent_item_sets(tx_ds, "items", minimum_support=0.3,
                             closed=False, size=3)
    # doc_count desc, larger sets first on ties: milk(7), bread(6),
    # then the count-5 tie ranks {bread,milk} (size 2) above eggs
    assert out["items"].tolist() == ["milk", "bread", "bread,milk"]
    assert len(out) == 3


def test_minimum_set_size(tx_ds):
    out = frequent_item_sets(tx_ds, "items", minimum_support=0.3,
                             minimum_set_size=2, closed=False, size=100)
    assert (out["set_size"] >= 2).all()
    assert "milk" not in set(out["items"])


def test_empty_and_validation(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(pd.DataFrame({"items": [[]]})).filter(
        lambda r: False)
    out = frequent_item_sets(empty, "items")
    assert len(out) == 0
    with pytest.raises(ValueError):
        frequent_item_sets(empty, "items", minimum_support=0)


def test_no_cooccurrence_pass_is_empty_not_crash(ray_session):
    # frequent singletons that NEVER co-occur: the k=2 Apriori pass
    # generates zero candidates in every batch, and Ray's hash groupby
    # reduces all-empty typed blocks to a schema-less frame (CLAUDE.md
    # zero-schema pitfall) — must yield the singletons, not KeyError
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"items": [["a"], ["a"],
                                                ["b"], ["b"]]}))
    out = frequent_item_sets(ds, "items", minimum_support=0.5,
                             closed=False, size=10)
    assert sorted(out["items"]) == ["a", "b"]
    assert (out["doc_count"] == 2).all()
