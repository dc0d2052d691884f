"""terms agg min_doc_count + missing (TermsAggregationBuilder options)."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.aggs import terms_agg


def test_terms_missing_and_min_doc_count(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b", None, None, "c"],
                       "v": np.arange(8, dtype=float)})
    out = terms_agg(rd.from_pandas(df), "k", missing="(missing)")
    got = dict(zip(out["k"], out["doc_count"]))
    assert got == {"a": 3, "b": 2, "(missing)": 2, "c": 1}
    out2 = terms_agg(rd.from_pandas(df), "k", missing="(missing)",
                     min_doc_count=2)
    assert set(out2["k"]) == {"a", "b", "(missing)"}
    # ordering preserved: count desc, key asc
    assert out2["k"].tolist() == ["a", "(missing)", "b"]
    with pytest.raises(ValueError):
        terms_agg(rd.from_pandas(df), "k", min_doc_count=0)


def test_review_r5d_terms_missing_all_null_block(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": pd.Series([None, None], dtype=object)})
    out = terms_agg(rd.from_pandas(df), "k", missing="(missing)")
    assert out["k"].tolist() == ["(missing)"]
    assert int(out["doc_count"].iloc[0]) == 2


def test_approx_terms_exact_when_under_shard_size(ray_session):
    """Cardinality <= shard_size on every block -> exact counts, all
    error bounds 0 (the reference's exactness condition)."""
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import approx_terms_agg, terms_agg

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.choice(list("abcdef"), 5000)})
    ds = rd.from_pandas(df).repartition(6)
    res = approx_terms_agg(ds, "k", size=3)
    exact = terms_agg(ds, "k", size=3)
    assert res["buckets"]["k"].tolist() == exact["k"].tolist()
    assert res["buckets"]["doc_count"].tolist() == \
        exact["doc_count"].tolist()
    assert (res["buckets"]["doc_count_error_upper_bound"] == 0).all()
    assert res["doc_count_error_upper_bound"] == 0
    assert res["sum_other_doc_count"] == \
        len(df) - int(res["buckets"]["doc_count"].sum())


def test_approx_terms_error_bound_invariant(ray_session):
    """High cardinality with tiny shard_size: reported count can
    undercount, but NEVER by more than the bucket's error bound; the
    shuffle carries <= shard_size rows per block."""
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import approx_terms_agg

    rng = np.random.default_rng(3)
    # zipf-ish skew + a long uniform tail
    head = np.repeat([f"h{i}" for i in range(5)], [400, 300, 200, 150, 100])
    tail = rng.choice([f"t{i}" for i in range(200)], 2000)
    df = pd.DataFrame({"k": np.concatenate([head, tail])})
    df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(8)
    res = approx_terms_agg(ds, "k", size=5, shard_size=6)
    truth = df["k"].value_counts()
    for _, row in res["buckets"].iterrows():
        true_n = int(truth[row["k"]])
        assert row["doc_count"] <= true_n
        assert true_n <= row["doc_count"] + \
            row["doc_count_error_upper_bound"]
    # the heavy head keys dominate and are found despite the tiny cut
    assert set(res["buckets"]["k"][:5]) == {f"h{i}" for i in range(5)}
    with pytest.raises(ValueError):
        approx_terms_agg(ds, "k", size=10, shard_size=5)


def test_significant_terms_background_filter(ray_session):
    """backgroundFilter: significance computed against the filtered
    background, not the whole index."""
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import significant_terms_agg

    bg = pd.DataFrame({
        "term": ["x"] * 5 + ["y"] * 95 + ["x"] * 8 + ["z"] * 2,
        "ctx": ["other"] * 100 + ["same"] * 10,
    })
    fg = pd.DataFrame({"term": ["x"] * 8 + ["z"] * 2,
                       "ctx": ["same"] * 10})
    full = significant_terms_agg(rd.from_pandas(fg), rd.from_pandas(bg),
                                 "term")
    narrowed = significant_terms_agg(
        rd.from_pandas(fg), rd.from_pandas(bg), "term",
        background_filter=lambda df: df["ctx"] == "same")
    # against the whole index x is rare-in-bg -> strongly significant;
    # against the same-ctx background x is as common as in fg -> its
    # significance collapses relative to the full-background run
    fx = float(full.set_index("term").loc["x", "score"])
    nx = float(narrowed.set_index("term").loc["x", "score"])
    assert fx > nx
    assert int(narrowed.set_index("term").loc["x", "bg_count"]) == 8
    # empty filtered background must not crash
    empty = significant_terms_agg(
        rd.from_pandas(fg), rd.from_pandas(bg), "term",
        background_filter=lambda df: df["ctx"] == "nope")
    assert (empty["bg_count"] == 0).all()


def test_review_r5e_bg_filter_non_superset_and_approx_nulls(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import (
        approx_terms_agg,
        significant_terms_agg,
    )

    # non-superset filtered background must not crash chi_square
    bg = pd.DataFrame({"term": ["x", "y", "z"] * 5,
                       "ctx": ["other"] * 15})
    fg = pd.DataFrame({"term": ["x", "x", "z"], "ctx": ["same"] * 3})
    out = significant_terms_agg(
        rd.from_pandas(fg), rd.from_pandas(bg), "term",
        heuristic="chi_square",
        background_filter=lambda df: df["ctx"] == "other")
    assert set(out["term"]) <= {"x", "z"}
    # filtered-to-empty background: no crash for NXY heuristics either
    empty = significant_terms_agg(
        rd.from_pandas(fg), rd.from_pandas(bg), "term",
        heuristic="chi_square",
        background_filter=lambda df: df["ctx"] == "nope")
    assert (empty["bg_count"] == 0).all()
    # approx terms: null keys leave the agg entirely (no sum_other
    # inflation)
    df = pd.DataFrame({"k": ["en"] * 50 + [None] * 50})
    res = approx_terms_agg(rd.from_pandas(df), "k", size=10)
    assert res["buckets"]["k"].tolist() == ["en"]
    assert res["sum_other_doc_count"] == 0
