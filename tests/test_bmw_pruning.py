"""Evidence that Block-Max WAND actually PRUNES (not just matches the
exhaustive scorer): on a zipfian corpus where the rare query term is
concentrated in a few doc ranges, low-bound windows are never scored."""

import numpy as np
import pytest

from elasticsearch_ray.index.norms import int_to_byte4
from elasticsearch_ray.index.postings import encode_postings
from elasticsearch_ray.search.bm25 import BM25Scorer
from elasticsearch_ray.search.topk import TermCursor, bmw_topk, exhaustive_disjunction, topk_select


def _make_corpus(n_docs=200_000, seed=4, ranges=((10_000, 11_000),)):
    """One common term (in ~half the docs) + one rare term confined to
    narrow doc ranges — the BMW-friendly shape."""
    rng = np.random.default_rng(seed)
    norms = int_to_byte4(rng.integers(30, 120, n_docs))
    common_docs = np.flatnonzero(rng.random(n_docs) < 0.5)
    common_tfs = rng.integers(1, 4, len(common_docs))
    rare_docs = np.unique(
        np.concatenate([rng.integers(lo, hi, 200) for lo, hi in ranges])
    )
    rare_tfs = rng.integers(1, 6, len(rare_docs))
    return n_docs, norms, (common_docs, common_tfs), (rare_docs, rare_tfs)


def _run(n_docs, norms, common, rare, k=10):
    cd, ct = common
    rd_, rt = rare
    avgdl = 75.0
    cursors = [
        TermCursor(encode_postings(cd, ct, norms[cd]),
                   BM25Scorer(df=len(cd), doc_count=n_docs, avgdl=avgdl)),
        TermCursor(encode_postings(rd_, rt, norms[rd_]),
                   BM25Scorer(df=len(rd_), doc_count=n_docs, avgdl=avgdl)),
    ]
    stats: dict = {}
    docs, scores = bmw_topk(cursors, norms, k=k, n_docs=n_docs, stats=stats)
    e_docs, e_scores = topk_select(*exhaustive_disjunction(cursors, norms), k)
    assert np.array_equal(docs, e_docs)
    assert np.array_equal(scores, e_scores)
    return docs, stats


def test_bmw_prunes_hard_when_rare_range_is_concentrated():
    n_docs, norms, common, rare = _make_corpus(ranges=((10_000, 11_000),))
    docs, stats = _run(n_docs, norms, common, rare)
    assert stats["windows_total"] == (n_docs + 4095) // 4096
    # one concentrated rare range → after its windows set θ, every
    # common-only window is pruned
    assert stats["windows_scored"] <= 4, stats
    assert np.isin(docs, rare[0]).all()


def test_bmw_prunes_partially_with_straddling_block():
    # two rare ranges: the posting block STRADDLING the gap props up the
    # bounds of every window it spans (block-granularity impacts — same
    # limitation as Lucene's), so pruning is partial: the windows after the
    # second range are still skipped
    n_docs, norms, common, rare = _make_corpus(
        ranges=((10_000, 11_000), (150_000, 151_000))
    )
    docs, stats = _run(n_docs, norms, common, rare)
    assert stats["windows_scored"] < stats["windows_total"], stats
    assert np.isin(docs, rare[0]).all()


def test_bmw_no_pruning_when_k_large():
    n_docs, norms, (cd, ct), (rd_, rt) = _make_corpus(n_docs=50_000)
    sc = BM25Scorer(df=len(cd), doc_count=n_docs, avgdl=75.0)
    cursors = [TermCursor(encode_postings(cd, ct, norms[cd]), sc)]
    stats: dict = {}
    docs, scores = bmw_topk(cursors, norms, k=10**9, n_docs=n_docs, stats=stats)
    # k unbounded → nothing can be pruned; still equal to exhaustive
    e_docs, e_scores = exhaustive_disjunction(cursors, norms)
    import numpy as _np

    order = _np.lexsort((docs,))
    e_order = _np.lexsort((e_docs,))
    assert _np.array_equal(docs[order], e_docs[e_order])
    assert _np.array_equal(scores[order], e_scores[e_order])  # bit-equal
    assert stats["windows_scored"] == stats["windows_total"]


def test_bmw_conjunction_window_pruning():
    """min_match == n_cursors (the AND path): windows missing the rare term
    are pruned at the BOUND level — only windows intersecting the rare range
    are ever scored — and results stay bit-equal to exhaustive."""
    n_docs, norms, common, rare = _make_corpus(ranges=((50_000, 52_000),))
    cd, ct = common
    rd_, rt = rare
    avgdl = 75.0
    cursors = [
        TermCursor(encode_postings(cd, ct, norms[cd]),
                   BM25Scorer(df=len(cd), doc_count=n_docs, avgdl=avgdl)),
        TermCursor(encode_postings(rd_, rt, norms[rd_]),
                   BM25Scorer(df=len(rd_), doc_count=n_docs, avgdl=avgdl)),
    ]
    stats: dict = {}
    docs, scores = bmw_topk(cursors, norms, k=10, n_docs=n_docs,
                            min_match=2, stats=stats)
    e_docs, e_scores = topk_select(
        *exhaustive_disjunction(cursors, norms, min_match=2), 10)
    assert np.array_equal(docs, e_docs)
    assert np.array_equal(scores, e_scores)
    # rare range spans 2000 docs ≈ 1-2 windows (+1 straddling block slack)
    assert stats["windows_scored"] <= 3, stats
    assert stats["windows_total"] == (n_docs + 4095) // 4096
