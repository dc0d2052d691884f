"""Distributed connected components (hash-to-min star contraction) —
correctness vs a driver union-find reference, plus the MinHash-pairs →
clusters composition on a planted-duplicate corpus."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from elasticsearch_ray.ops.components import connected_components, near_dup_components


def _union_find_ref(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per node
    labels = {}
    for x in list(parent):
        r = find(x)
        labels.setdefault(r, r)
        labels[x] = min(labels.get(r, r), r)
    # second pass: root label = min id in component
    comp_min = {}
    for x in parent:
        comp_min.setdefault(find(x), x)
        comp_min[find(x)] = min(comp_min[find(x)], x)
    return {x: comp_min[find(x)] for x in parent}


def _check(pairs):
    got = connected_components(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    want = _union_find_ref(pairs)
    assert dict(zip(got["id"], got["component"])) == want
    return got


def test_path_graph_collapses_to_min():
    got = _check([(i, i + 1) for i in range(10)])
    assert set(got["component"]) == {0}


def test_two_cliques_and_bridge():
    pairs = [(a, b) for i, a in enumerate([1, 2, 3]) for b in [1, 2, 3][i + 1:]]
    pairs += [(a, b) for i, a in enumerate([10, 11, 12]) for b in [10, 11, 12][i + 1:]]
    pairs += [(100, 200)]
    got = _check(pairs)
    assert set(got["component"]) == {1, 10, 100}


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(3)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 400, (300, 2)) if p[0] != p[1]]
    _check(pairs)


def test_empty_and_dataset_input():
    out = connected_components(pd.DataFrame({"id_a": [], "id_b": []}))
    assert len(out) == 0
    ds = rd.from_pandas(pd.DataFrame({"id_a": [5, 1], "id_b": [7, 5]}))
    got = connected_components(ds)
    assert dict(zip(got["id"], got["component"])) == {1: 1, 5: 1, 7: 1}
    # a Dataset that ends up EMPTY (all candidate pairs filtered upstream)
    # must return the documented empty frame, not KeyError on lost schema
    empty = rd.from_pandas(pd.DataFrame({"id_a": [1], "id_b": [2]})).filter(
        lambda r: False)
    out2 = connected_components(empty)
    assert len(out2) == 0 and list(out2.columns) == ["id", "component"]


def test_long_path_converges_and_unconverged_raises():
    pairs = [(i, i + 1) for i in range(80)]
    got = _check(pairs)  # default max_rounds: log-round contraction covers it
    assert set(got["component"]) == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pd.DataFrame(pairs, columns=["id_a", "id_b"]),
                             max_rounds=1)


def test_near_dup_components_planted(ray_session):
    rows = []
    # three planted clusters of 3 near-identical docs + distinct filler;
    # each cluster gets its OWN vocabulary so clusters aren't near-dups of
    # each other
    for c in range(3):
        base = " ".join(f"c{c}term{i}" for i in range(16))
        for j in range(3):
            rows.append({"doc_id": c * 10 + j,
                         "text": base + (" extra" if j == 2 else "")})
    for k in range(40):
        rows.append({"doc_id": 100 + k,
                     "text": f"totally different text number {k} " +
                             " ".join(f"w{k}x{i}" for i in range(20))})
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = near_dup_components(ds, "text", "doc_id", threshold=0.5)
    comp = dict(zip(got["id"], got["component"]))
    for c in range(3):
        ids = [c * 10, c * 10 + 1, c * 10 + 2]
        labels = {comp.get(i) for i in ids}
        assert labels == {c * 10}, (c, comp)
    assert all(i < 100 for i in comp), comp


def test_decontaminate_planted(ray_session):
    """Docs sharing an n-gram with the benchmark set are dropped (or
    flagged); clean docs and sub-n-gram docs survive."""
    from elasticsearch_ray.ops.dedup import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    rows = [
        # contains the benchmark 5-gram "quick brown fox jumps over"
        {"doc_id": 0, "text": "intro words then quick brown fox jumps over and more"},
        {"doc_id": 1, "text": "totally unrelated content about spark pipelines"},
        {"doc_id": 2, "text": "quick brown fox"},  # shorter than the n-gram
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    kept = decontaminate(ds, bench, ngram=5).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2, 3]
    flagged = decontaminate(ds, bench, ngram=5, mode="flag").to_pandas()
    assert dict(zip(flagged["doc_id"], flagged["contaminated"])) == {
        0: True, 1: False, 2: False, 3: False}
    # empty benchmark: nothing contaminated
    all_kept = decontaminate(ds, [], ngram=5).to_pandas()
    assert len(all_kept) == 4
    # benchmark text SHORTER than ngram matches at its own length
    # (min(len, N)-gram rule): "quick brown fox" is 3 tokens vs ngram=5
    kept2 = decontaminate(ds, ["quick brown fox"], ngram=5).to_pandas()
    assert sorted(kept2["doc_id"]) == [1, 3]  # docs 0 and 2 contain it
    with pytest.raises(ValueError):
        decontaminate(ds, ["x"], mode="audit")


def test_unigram_lm_perplexity(ray_session):
    """Fit on a corpus; in-distribution docs score lower NLL than
    gibberish; perplexity_filter keeps the former and drops the latter
    + empty docs; NLL matches a hand unigram computation."""
    import math

    from elasticsearch_ray.ops.textstats import (add_nll, fit_unigram_lm,
                                                 perplexity_filter)

    rows = [{"doc_id": i, "text": "the cat sat on the mat"} for i in range(20)]
    rows.append({"doc_id": 100, "text": "zxqv wjkp qqqq zzzz xxxx yyyy"})
    rows.append({"doc_id": 101, "text": ""})
    ds = rd.from_pandas(pd.DataFrame(rows))
    lm = fit_unigram_lm(ds)
    scored = add_nll(ds, lm).to_pandas().set_index("doc_id")
    assert scored.loc[0, "nll"] < scored.loc[100, "nll"]
    assert np.isnan(scored.loc[101, "nll"])
    # hand check: total tokens = 20*6 + 6 = 126; vocab = 5 common + 6 rare
    total, v = 126, 11
    counts = {"the": 40, "cat": 20, "sat": 20, "on": 20, "mat": 20}
    want = -np.mean([math.log((counts[t] + 1) / (total + v))
                     for t in "the cat sat on the mat".split()])
    assert abs(scored.loc[0, "nll"] - want) < 1e-12
    cutoff = math.exp(scored.loc[0, "nll"]) + 1
    kept = perplexity_filter(ds, lm, max_ppl=cutoff).to_pandas()
    assert set(kept["doc_id"]) == set(range(20))


def test_top_ngram_fraction(ray_session):
    from elasticsearch_ray.ops.textstats import top_ngram_fraction

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4, 5],
                       "text": ["a b a b a b",       # top bigram covers all
                                "x y z w q r",        # all bigrams unique
                                "short",               # < n tokens
                                "",
                                "a a a a",            # self-overlap: clamp
                                "a  b\ta b\na b"]})   # irregular whitespace
    out = top_ngram_fraction(rd.from_pandas(df), n=2)
    by = dict(zip(out["doc_id"], out["top_ngram_frac"]))
    assert by[0] == 1.0
    assert abs(by[1] - 2 / 6) < 2e-6
    assert by[2] == 0.0 and by[3] == 0.0
    # 'a a a a': top bigram (a,a) count 3 → 3·2/4 = 1.5, clamped to [0,1]
    assert by[4] == 1.0
    # tabs/newlines/doubled spaces tokenize like str.split()
    assert by[5] == 1.0
