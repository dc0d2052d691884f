"""Interpolated bigram LM (Jelinek-Mercer onto the add-one unigram):
distributed pair-count fit, per-doc NLL scoring."""

import numpy as np
import pandas as pd
import ray

from elasticsearch_ray.ops.textstats import (
    add_bigram_nll,
    fit_bigram_lm,
)

LAM = 0.9


def _docs():
    return pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["a b a b c", "a b", "c c c", "b a", ""],
    })


def _brute_nll(df, lam=LAM):
    uni: dict = {}
    big: dict = {}
    ctx: dict = {}
    for t in df.text:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    total, v = sum(uni.values()), len(uni)
    p_uni = {w: (c + 1) / (total + v) for w, c in uni.items()}
    out = []
    for t in df.text:
        toks = t.split()
        if not toks:
            out.append(np.nan)
            continue
        lp = [np.log(p_uni[toks[0]])]
        for a, b in zip(toks, toks[1:]):
            p_ml = big.get((a, b), 0) / ctx[a]
            lp.append(np.log(lam * p_ml + (1 - lam) * p_uni[b]))
        out.append(-np.mean(lp))
    return np.array(out)


def test_bigram_nll_matches_brute(ray_session):
    df = _docs()
    ds = ray.data.from_pandas(df).repartition(3)
    lm = fit_bigram_lm(ds, lam=LAM)
    got = (add_bigram_nll(ds, lm).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _brute_nll(df)
    ok = ~np.isnan(want)
    assert np.allclose(got["nll2"].to_numpy()[ok], want[ok])
    assert np.isnan(got["nll2"].to_numpy()[~ok]).all()


def test_bigram_model_shapes(ray_session):
    ds = ray.data.from_pandas(_docs()).repartition(2)
    lm = fit_bigram_lm(ds)
    # pairs seen: (a,b),(b,a),(b,c),(c,c) → 4 distinct
    assert len(lm["pairs"]) == 4
    assert np.all(np.diff(lm["pairs"].astype(np.uint64)) > 0)  # sorted
    # p_ml of (c,c): c(c,c)=2, ctx(c)=2 → 1.0
    assert np.isclose(lm["p_ml"].max(), 1.0)
    # empty corpus degenerates gracefully
    empty = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": [""]}))
    lm0 = fit_bigram_lm(empty)
    assert len(lm0["pairs"]) == 0
    got = add_bigram_nll(empty, lm0).to_pandas()
    assert np.isnan(got["nll2"]).all()


def test_bigram_beats_unigram_on_predictable_text(ray_session):
    """Deterministic word order → the bigram model's NLL must be lower
    than the unigram's on the same docs."""
    from elasticsearch_ray.ops.textstats import add_nll, fit_unigram_lm

    df = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": ["x y z w " * 5] * 20,
    })
    ds = ray.data.from_pandas(df).repartition(2)
    bi = (add_bigram_nll(ds, fit_bigram_lm(ds)).to_pandas()
          .sort_values("doc_id")["nll2"].to_numpy())
    un = (add_nll(ds, fit_unigram_lm(ds)).to_pandas()
          .sort_values("doc_id")["nll"].to_numpy())
    assert (bi < un).all()


def test_no_bigram_corpus_backs_off_to_unigram(ray_session):
    """Review r5 #2: every doc has <= 1 token -> the fitted model has
    ZERO pairs; scoring must back off to the unigram, not crash."""
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": ["a", "b", "a"]})
    ds = ray.data.from_pandas(df).repartition(2)
    lm = fit_bigram_lm(ds)
    assert len(lm["pairs"]) == 0
    got = (add_bigram_nll(ds, lm).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    # p_uni(a) = (2+1)/(3+2), p_uni(b) = (1+1)/(3+2)
    assert np.isclose(got.loc[0, "nll2"], -np.log(3 / 5))
    assert np.isclose(got.loc[1, "nll2"], -np.log(2 / 5))
