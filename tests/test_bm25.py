"""Golden BM25 tests: hand-computed scores with the reference's formula
(LegacyBM25Similarity: idf * (k1+1) * tf / (tf + k1*(1-b+b*dl/avgdl)),
idf = ln(1 + (N-df+0.5)/(df+0.5)), dl SmallFloat-lossy)."""

import math

import numpy as np

from elasticsearch_ray.index.norms import byte4_to_int, int_to_byte4
from elasticsearch_ray.search.bm25 import BM25Params, BM25Scorer, idf


def _expected(tf, dl, df, n_docs, avgdl, k1=1.2, b=0.75):
    dl_lossy = float(byte4_to_int(int_to_byte4(np.array([dl])))[0])
    i = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return i * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl_lossy / avgdl))


def test_hand_computed_scores():
    n_docs, avgdl = 1000, 50.0
    for df, tf, dl in [(10, 3, 40), (500, 1, 100), (1, 7, 24), (999, 2, 500)]:
        sc = BM25Scorer(df=df, doc_count=n_docs, avgdl=avgdl)
        norm_b = int_to_byte4(np.array([dl]))
        got = float(sc.score(np.array([tf]), norm_b)[0])
        want = _expected(tf, dl, df, n_docs, avgdl)
        assert abs(got - want) / want < 1e-6, (df, tf, dl, got, want)


def test_float32_narrowing_points():
    # the float32 path must narrow idf and weight exactly like Lucene
    sc = BM25Scorer(df=3, doc_count=7, avgdl=11.3)
    idf_f = np.float32(idf(3, 7))
    assert sc.weight == np.float32(np.float32(1.0) * np.float32(np.float32(1.2) + 1.0) * idf_f)
    assert sc.cache.dtype == np.float32


def test_float64_mode_matches_ranking():
    n_docs, avgdl = 100, 30.0
    rng = np.random.default_rng(5)
    tfs = rng.integers(1, 20, 50)
    dls = rng.integers(5, 200, 50)
    norms = int_to_byte4(dls)
    s32 = BM25Scorer(df=7, doc_count=n_docs, avgdl=avgdl, dtype="float32").score(tfs, norms)
    s64 = BM25Scorer(df=7, doc_count=n_docs, avgdl=avgdl, dtype="float64").score(tfs, norms)
    assert np.allclose(s32, s64, rtol=1e-5)
    assert np.array_equal(np.argsort(-s32, kind="stable"), np.argsort(-s64, kind="stable"))


def test_max_score_dominates():
    sc = BM25Scorer(df=50, doc_count=10000, avgdl=80.0)
    rng = np.random.default_rng(9)
    tfs = rng.integers(1, 30, 128)
    norms = rng.integers(0, 256, 128).astype(np.uint8)
    bound = float(sc.max_score(int(tfs.max()), int(norms.min()))[()])
    assert np.all(sc.score(tfs, norms) <= bound + 1e-7)


def test_custom_params():
    # SimilarityIT.java analog: custom k1/b give different scores than default
    a = BM25Scorer(df=5, doc_count=100, avgdl=20.0, params=BM25Params(k1=2.0, b=0.5))
    d = BM25Scorer(df=5, doc_count=100, avgdl=20.0)
    t, n = np.array([4]), int_to_byte4(np.array([35]))
    assert float(a.score(t, n)[0]) != float(d.score(t, n)[0])
