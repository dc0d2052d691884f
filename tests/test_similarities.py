"""Alternative similarity families (SimilarityProviders.java:262-291):
LMDirichlet (Zhai & Lafferty Dirichlet-prior smoothing, Lucene
LMDirichletSimilarity) and DFR I(n)L2 (Amati & van Rijsbergen, TOIS 2002).

Covers (a) scorer formulas against naive per-value math, (b) monotonicity
(the property the block-max impact bounds rely on), and (c) BMW == exhaustive
under both scorers on a pruning-shaped corpus."""

import math

import numpy as np

from elasticsearch_ray.index.norms import LENGTH_TABLE, int_to_byte4
from elasticsearch_ray.index.postings import encode_postings
from elasticsearch_ray.search.bm25 import (
    BM25Params,
    DFIScorer,
    DFRScorer,
    IBScorer,
    LMDirichletScorer,
    LMJelinekMercerScorer,
    make_scorer,
)
from elasticsearch_ray.search.topk import (
    TermCursor,
    bmw_topk,
    exhaustive_disjunction,
    topk_select,
)


def _naive_lm_dirichlet(tf, dl, ttf, total_tokens, mu=2000.0):
    p_wc = (ttf + 1.0) / (total_tokens + 1.0)
    return max(0.0, math.log1p(tf / (mu * p_wc)) + math.log(mu / (dl + mu)))


def _naive_dfr(tf, dl, df, n_docs, avgdl, c=1.0):
    tfn = tf * math.log2(1.0 + c * avgdl / max(dl, 1.0))
    return math.log2((n_docs + 1.0) / (df + 0.5)) * tfn / (tfn + 1.0)


def test_lm_dirichlet_formula():
    sc = LMDirichletScorer(ttf=5000, total_tokens=1_000_000, dtype="float64")
    tfs = np.array([1, 2, 5, 40], dtype=np.int64)
    norm_bytes = int_to_byte4(np.array([10, 80, 300, 5000]))
    got = sc.score(tfs, norm_bytes)
    want = [
        _naive_lm_dirichlet(int(tf), float(LENGTH_TABLE[b]), 5000, 1_000_000)
        for tf, b in zip(tfs, norm_bytes)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_lm_dirichlet_clamps_rare_long_docs_to_zero():
    # a very common term in a very long doc: both logs sum negative → 0
    sc = LMDirichletScorer(ttf=900_000, total_tokens=1_000_000, dtype="float64")
    s = sc.score(np.array([1]), int_to_byte4(np.array([100_000])))
    assert s[0] == 0.0


def test_dfr_formula():
    sc = DFRScorer(df=120, doc_count=10_000, avgdl=75.0, dtype="float64")
    tfs = np.array([1, 3, 9], dtype=np.int64)
    norm_bytes = int_to_byte4(np.array([20, 75, 900]))
    got = sc.score(tfs, norm_bytes)
    want = [
        _naive_dfr(int(tf), float(LENGTH_TABLE[b]), 120, 10_000, 75.0)
        for tf, b in zip(tfs, norm_bytes)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_lm_jelinek_mercer_formula():
    sc = LMJelinekMercerScorer(ttf=5000, total_tokens=1_000_000, dtype="float64")
    tfs = np.array([1, 4, 12], dtype=np.int64)
    norm_bytes = int_to_byte4(np.array([15, 90, 700]))
    got = sc.score(tfs, norm_bytes)
    p_wc = 5001.0 / 1_000_001.0
    want = [
        math.log1p((0.9 * tf / max(float(LENGTH_TABLE[b]), 1.0)) / (0.1 * p_wc))
        for tf, b in zip(tfs, norm_bytes)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dfi_formula_and_clamp():
    sc = DFIScorer(ttf=5000, total_tokens=1_000_000, dtype="float64")
    # long doc, tf below expected → 0
    b_long = int_to_byte4(np.array([500_000]))
    assert sc.score(np.array([1]), b_long)[0] == 0.0
    # short doc, tf above expected → standardized divergence
    b = int_to_byte4(np.array([50]))
    dl = float(LENGTH_TABLE[b[0]])
    exp_v = 5001.0 * dl / 1_000_001.0
    want = math.log2(1.0 + (3.0 - exp_v) / math.sqrt(exp_v))
    np.testing.assert_allclose(sc.score(np.array([3]), b), [want], rtol=1e-12)


def test_ib_formula():
    sc = IBScorer(df=120, doc_count=10_000, avgdl=75.0, dtype="float64")
    tfs = np.array([1, 5], dtype=np.int64)
    norm_bytes = int_to_byte4(np.array([20, 300]))
    got = sc.score(tfs, norm_bytes)
    want = []
    for tf, b in zip(tfs, norm_bytes):
        dl = max(float(LENGTH_TABLE[b]), 1.0)
        tfn = tf * math.log2(1.0 + 75.0 / dl)
        want.append(math.log1p(tfn * 10_001.0 / 121.0))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_monotone_in_tf_and_antimonotone_in_dl():
    """The (max_tf, min_norm) block impact is an upper bound iff score is
    nondecreasing in tf and nonincreasing in dl — check every scorer."""
    for sc in (
        LMDirichletScorer(ttf=5000, total_tokens=1_000_000, dtype="float64"),
        DFRScorer(df=120, doc_count=10_000, avgdl=75.0, dtype="float64"),
        LMJelinekMercerScorer(ttf=5000, total_tokens=1_000_000, dtype="float64"),
        DFIScorer(ttf=5000, total_tokens=1_000_000, dtype="float64"),
        IBScorer(df=120, doc_count=10_000, avgdl=75.0, dtype="float64"),
    ):
        tf_sweep = sc.score(np.arange(1, 200), np.full(199, 100, dtype=np.int64))
        assert (np.diff(tf_sweep) >= -1e-15).all()
        norm_sweep = sc.score(np.full(255, 3), np.arange(1, 256))
        # LENGTH_TABLE is increasing in the byte → score must not increase
        assert (np.diff(norm_sweep) <= 1e-15).all()


def test_make_scorer_dispatch():
    p = BM25Params()
    assert isinstance(
        make_scorer("LMDirichlet", 10, 100, 50.0, p, ttf=30, total_tokens=5000),
        LMDirichletScorer,
    )
    assert isinstance(make_scorer("DFR", 10, 100, 50.0, p), DFRScorer)


def _pruning_corpus(n_docs=100_000, seed=11):
    rng = np.random.default_rng(seed)
    norms = int_to_byte4(rng.integers(30, 120, n_docs))
    common_docs = np.flatnonzero(rng.random(n_docs) < 0.5)
    common_tfs = rng.integers(1, 4, len(common_docs))
    rare_docs = np.unique(rng.integers(10_000, 11_000, 200))
    rare_tfs = rng.integers(1, 6, len(rare_docs))
    return n_docs, norms, (common_docs, common_tfs), (rare_docs, rare_tfs)


def _scorer_for(similarity, docs, tfs, n_docs, total_tokens):
    if similarity == "LMDirichlet":
        return LMDirichletScorer(ttf=int(tfs.sum()), total_tokens=total_tokens)
    if similarity == "LMJelinekMercer":
        return LMJelinekMercerScorer(ttf=int(tfs.sum()), total_tokens=total_tokens)
    if similarity == "DFI":
        return DFIScorer(ttf=int(tfs.sum()), total_tokens=total_tokens)
    if similarity == "IB":
        return IBScorer(df=len(docs), doc_count=n_docs,
                        avgdl=total_tokens / n_docs)
    return DFRScorer(df=len(docs), doc_count=n_docs,
                     avgdl=total_tokens / n_docs)


def test_bmw_equals_exhaustive_under_alt_similarities():
    n_docs, norms, (cd, ct), (rd, rt) = _pruning_corpus()
    total_tokens = int(LENGTH_TABLE[norms].sum())
    for similarity in ("LMDirichlet", "DFR", "LMJelinekMercer", "DFI", "IB"):
        cursors = [
            TermCursor(encode_postings(cd, ct, norms[cd]),
                       _scorer_for(similarity, cd, ct, n_docs, total_tokens)),
            TermCursor(encode_postings(rd, rt, norms[rd]),
                       _scorer_for(similarity, rd, rt, n_docs, total_tokens)),
        ]
        docs, scores = bmw_topk(cursors, norms, k=10, n_docs=n_docs)
        e_docs, e_scores = topk_select(*exhaustive_disjunction(cursors, norms), 10)
        assert np.array_equal(docs, e_docs)
        np.testing.assert_array_equal(scores, e_scores)
