"""categorize_text aggregation (x-pack ML CategorizationTokenTree /
TextCategorization): drain-style grouping, wildcard merging, child
caps, distributed reduce."""

import pandas as pd
import pytest

from elasticsearch_ray.ops.categorize import (CategorizationTokenTree,
                                              categorize_text, tokenize)


def _buckets(tree):
    return {" ".join(t): c for t, c in tree.buckets()}


def test_tokenizer_drops_non_letter_leading_tokens():
    assert tokenize("user u42 failed: 500 at node-3!") == \
        ["user", "u42", "failed", "at", "node-3"]
    assert tokenize("") == []
    assert tokenize("123 456") == []


def test_header_example_merges_below_threshold():
    # CategorizationTokenTree.java header: "Node is online"/"Node is
    # offline" with a fixed tree depth of 2 -> one category [Node is *]
    # when the threshold is < 60, two otherwise
    tree = CategorizationTokenTree(similarity_threshold=50,
                                   max_matched_tokens=2)
    tree.parse_tokens(["Node", "is", "online"])
    tree.parse_tokens(["Node", "is", "offline"])
    assert _buckets(tree) == {"Node is *": 2}

    tree = CategorizationTokenTree(similarity_threshold=70,
                                   max_matched_tokens=2)
    tree.parse_tokens(["Node", "is", "online"])
    tree.parse_tokens(["Node", "is", "offline"])
    assert _buckets(tree) == {"Node is online": 1, "Node is offline": 1}


def test_token_count_partitions_categories():
    tree = CategorizationTokenTree(similarity_threshold=50)
    tree.parse_tokens(["a", "b"])
    tree.parse_tokens(["a", "b", "c"])
    assert _buckets(tree) == {"a b": 1, "a b c": 1}


def test_count_weighted_similarity():
    # after [user alpha done] x3 merges with [user beta done] the
    # middle position is a wildcard; matching weights use per-position
    # counts, so a 2-of-3-positions match on heavy positions passes 50%
    tree = CategorizationTokenTree(similarity_threshold=50,
                                   max_matched_tokens=1)
    for _ in range(3):
        tree.parse_tokens(["user", "alpha", "done"])
    tree.parse_tokens(["user", "beta", "done"])
    assert _buckets(tree) == {"user * done": 4}


def test_max_unique_tokens_overflow_wildcards():
    # splitting position 0 with a tiny cap: distinct leading tokens
    # beyond the cap route into the wildcard child instead of growing
    tree = CategorizationTokenTree(max_unique_tokens=3,
                                   max_matched_tokens=2,
                                   similarity_threshold=90)
    for i in range(6):
        tree.parse_tokens([f"tok{i}", "x"])
    root = tree.roots[2]
    assert len(root.children) == 3 and "*" in root.children
    assert sum(c for _t, c in tree.buckets()) == 6


def test_collapse_tiny_children():
    tree = CategorizationTokenTree(max_unique_tokens=4,
                                   max_matched_tokens=2,
                                   similarity_threshold=90)
    for _ in range(50):
        tree.parse_tokens(["big", "x"])
    tree.parse_tokens(["small", "x"])
    root = tree.roots[2]
    assert "small" in root.children
    tree.collapse_tiny_children()
    assert "small" not in root.children and "*" in root.children


def test_validation():
    with pytest.raises(ValueError):
        CategorizationTokenTree(max_unique_tokens=0)
    with pytest.raises(ValueError):
        CategorizationTokenTree(similarity_threshold=0).parse_tokens(["a"])


@pytest.fixture(scope="module")
def log_ds(ray_session):
    import ray.data as rd

    msgs = []
    for i in range(300):
        kind = ("started", "stopped", "failed")[i % 3]
        msgs.append(f"service worker {kind} at t{i}")
    return rd.from_pandas(pd.DataFrame({"message": msgs})).repartition(4)


def test_distributed_matches_local(log_ds):
    out = categorize_text(log_ds, "message", size=10,
                          similarity_threshold=70)
    # one category per kind, trailing timestamp token wildcarded
    got = dict(zip(out["key"], out["doc_count"]))
    assert got == {
        "service worker started at *": 100,
        "service worker stopped at *": 100,
        "service worker failed at *": 100,
    }

    # local single-tree twin over the same rows
    tree = CategorizationTokenTree(similarity_threshold=70)
    for m in log_ds.to_pandas()["message"]:
        tree.parse_tokens(tokenize(m))
    assert {f"{k}": c for k, c in _buckets(tree).items()} == got


def test_reduce_wildcards_match_wildcards():
    # intermediate buckets carry "*" as a real token (reference reduce
    # re-parses WILD_CARD_ID tokens): two categories differing ONLY in a
    # similarity-zone position re-merge at reduce because their wildcard
    # tails match each other — the discriminating token must live in the
    # exact-match prefix to survive (CategorizationTokenTree header:
    # "splits that give us more information come earlier in the text")
    tree = CategorizationTokenTree(similarity_threshold=70,
                                   max_matched_tokens=3)
    tree.parse_tokens(["user", "completed", "click", "*"], 210)
    tree.parse_tokens(["user", "completed", "view", "*"], 202)
    # kept = 3 of 4 weighted positions = 75% >= 70 -> re-merged
    assert _buckets(tree) == {"user completed * *": 412}

    tree = CategorizationTokenTree(similarity_threshold=70,
                                   max_matched_tokens=4)
    tree.parse_tokens(["user", "click", "completed", "*"], 210)
    tree.parse_tokens(["user", "view", "completed", "*"], 202)
    assert _buckets(tree) == {"user click completed *": 210,
                              "user view completed *": 202}


def test_size_and_ranking(log_ds):
    out = categorize_text(log_ds, "message", size=2,
                          similarity_threshold=70)
    assert len(out) == 2
    assert out["doc_count"].tolist() == [100, 100]
    assert out["key"].is_monotonic_increasing  # ties broken by key
