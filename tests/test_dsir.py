"""DSIR importance resampling (Xie et al. 2302.03169): hashed-n-gram
importance weights, exact-word oracle mode, Gumbel-top-k selection."""

import numpy as np
import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.dsir import (
    dsir_lambda,
    dsir_log_weights,
    dsir_select,
    fit_feature_counts,
)


def _raw():
    return pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["spark join merge", "cat dog cat", "spark spark join",
                 "dog dog dog", "join merge", ""],
    })


def _target():
    return pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["spark join", "spark merge join"],
    })


def _brute_logw(raw_df, tgt_df, bigrams=False, smoothing=1.0):
    def feats(t):
        toks = t.split()
        out = list(toks)
        if bigrams:
            out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return out

    rc, tc = {}, {}
    for t in raw_df.text:
        for f in feats(t):
            rc[f] = rc.get(f, 0) + 1
    for t in tgt_df.text:
        for f in feats(t):
            tc[f] = tc.get(f, 0) + 1
    vocab = set(rc) | set(tc)
    dim, rtot, ttot = len(vocab), sum(rc.values()), sum(tc.values())
    lam = {f: np.log((tc.get(f, 0) + smoothing) / (ttot + smoothing * dim))
           - np.log((rc.get(f, 0) + smoothing) / (rtot + smoothing * dim))
           for f in vocab}
    return np.array([sum(lam[f] for f in feats(t)) for t in raw_df.text])


@pytest.mark.parametrize("bigrams", [False, True])
def test_word_mode_matches_brute(ray_session, bigrams):
    raw, tgt = _raw(), _target()
    got = (dsir_log_weights(ray.data.from_pandas(raw).repartition(3),
                            ray.data.from_pandas(tgt),
                            "text", "doc_id", bigrams=bigrams)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _brute_logw(raw, tgt, bigrams=bigrams)
    assert np.allclose(got["logw"].to_numpy(), want)
    # spark-y docs outrank the dog docs toward a spark-y target
    w = dict(zip(got.doc_id, got.logw))
    assert w[2] > w[3] and w[0] > w[1]


def test_fit_feature_counts_word_and_hashed(ray_session):
    ds = ray.data.from_pandas(_raw()).repartition(2)
    counts, total = fit_feature_counts(ds, "text")
    assert counts["spark"] == 3 and counts["dog"] == 4
    assert total == sum(counts.values())
    hc, htot = fit_feature_counts(ds, "text", buckets=64)
    assert htot == total  # hashing preserves occurrence mass
    cb, btot = fit_feature_counts(ds, "text", buckets=64, bigrams=True)
    assert btot == total + sum(
        max(len(t.split()) - 1, 0) for t in _raw().text)


def test_hashed_mode_tracks_word_mode_without_collisions(ray_session):
    raw, tgt = _raw(), _target()
    rds = ray.data.from_pandas(raw).repartition(2)
    tds = ray.data.from_pandas(tgt)
    word = (dsir_log_weights(rds, tds, "text", "doc_id")
            .to_pandas().sort_values("doc_id", ignore_index=True))
    hashed = (dsir_log_weights(rds, tds, "text", "doc_id", buckets=1 << 20)
              .to_pandas().sort_values("doc_id", ignore_index=True))
    # big bucket space → same ORDERING (dim differs, absolute values may
    # shift by the smoothing denominator)
    assert (word["logw"].rank().to_numpy()
            == hashed["logw"].rank().to_numpy()).all()


def test_select_deterministic_and_gumbel(ray_session):
    raw, tgt = _raw(), _target()
    rds = ray.data.from_pandas(raw).repartition(3)
    tds = ray.data.from_pandas(tgt)
    top = dsir_select(rds, tds, "text", "doc_id", k=2)
    w = _brute_logw(raw, tgt)
    want = np.lexsort((raw.doc_id, -np.round(w, 9)))[:2]
    assert top["doc_id"].tolist() == raw.doc_id.iloc[want].tolist()
    g1 = dsir_select(rds, tds, "text", "doc_id", k=3, gumbel_seed=7)
    g2 = dsir_select(rds, tds, "text", "doc_id", k=3, gumbel_seed=7)
    assert g1["doc_id"].tolist() == g2["doc_id"].tolist()  # reproducible
    g3 = dsir_select(rds, tds, "text", "doc_id", k=3, gumbel_seed=8)
    assert len(g3) == 3  # a different seed still returns k rows


# --------------------------------------------- semantic decontamination


def test_semantic_decontaminate_drop_and_flag(ray_session):
    import ray

    from elasticsearch_ray.ops.dedup import semantic_decontaminate

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(50, 8))
    # plant 2 near-copies of benchmark vector 0 (scaled + tiny noise —
    # cosine is scale-invariant)
    bench = rng.normal(size=(3, 8))
    vecs[7] = bench[0] * 2.0 + 1e-6
    vecs[23] = bench[0] * 0.5
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(3)
    kept = (semantic_decontaminate(ds, bench, threshold=0.95)
            .to_pandas())
    assert 7 not in set(kept.vec_id) and 23 not in set(kept.vec_id)
    # exact brute verdict equality
    nb = bench / np.linalg.norm(bench, axis=1, keepdims=True)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want_drop = set(np.flatnonzero((nv @ nb.T).max(axis=1) >= 0.95))
    assert set(df.vec_id) - set(kept.vec_id) == want_drop
    flagged = (semantic_decontaminate(ds, bench, threshold=0.95,
                                      mode="flag").to_pandas())
    assert set(flagged[flagged.contaminated].vec_id) == want_drop
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        semantic_decontaminate(ds, np.empty((0, 8)))
    with _pt.raises(ValueError, match="unknown mode"):
        semantic_decontaminate(ds, bench, mode="zap")
