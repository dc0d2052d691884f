"""Regression tests for round-1 advisor findings (ADVICE.md):
_intersect alignment, block-max bound under u16 tf saturation."""

import numpy as np

from elasticsearch_ray.index.postings import encode_postings, read_headers
from elasticsearch_ray.search.bm25 import BM25Scorer
from elasticsearch_ray.search.engine import _intersect
from elasticsearch_ray.search.topk import TermCursor


def test_intersect_b_aligned_scores_same_length():
    # len(a) == len(b) but different doc sets: the old length heuristic
    # mis-aligned b-side scores (returned [200, 300] instead of [100, 300]).
    a = np.array([0, 2, 4, 6], np.int64)
    b = np.array([2, 3, 4, 9], np.int64)
    sb = np.array([100.0, 200.0, 300.0, 900.0])
    docs, (out,) = _intersect(a, b, (), (sb,))
    assert docs.tolist() == [2, 4]
    assert out.tolist() == [100.0, 300.0]


def test_intersect_both_sides():
    a = np.array([0, 2, 4, 6], np.int64)
    b = np.array([2, 3, 4, 9], np.int64)
    sa = np.array([1.0, 2.0, 3.0, 4.0])
    sb = np.array([100.0, 200.0, 300.0, 900.0])
    docs, (oa, ob) = _intersect(a, b, (sa,), (sb,))
    assert docs.tolist() == [2, 4]
    assert oa.tolist() == [2.0, 3.0]
    assert ob.tolist() == [100.0, 300.0]


def test_intersect_empty_b():
    a = np.array([1, 2], np.int64)
    b = np.empty(0, np.int64)
    docs, (oa,) = _intersect(a, b, (np.array([1.0, 2.0]),))
    assert len(docs) == 0 and len(oa) == 0


def test_blockmax_bound_with_saturated_tf():
    # tf > 0xFFFF saturates the u16 header field; the bound must still
    # dominate the true score (falls back to the tf→∞ limit = weight).
    docs = np.array([5], np.int64)
    tfs = np.array([200_000], np.int64)
    norm_bytes = np.array([200], np.uint8)
    blob = encode_postings(docs, tfs, norm_bytes)
    h = read_headers(blob)
    assert int(h["max_tf"][0]) == 0xFFFF
    sc = BM25Scorer(df=1, doc_count=10, avgdl=100.0, dtype="float64")
    cur = TermCursor(blob, sc)
    bound = float(cur.block_max_scores()[0])
    _d, t = cur.decode_all()
    true_score = float(sc.score(t, norm_bytes)[0])
    assert bound >= true_score
    assert bound <= float(sc.weight) * (1 + 1e-12)


# ---- round-2 advisor findings ----

def test_range_on_unknown_field_is_parse_error():
    import pytest

    from elasticsearch_ray.search.dsl import DslError, parse_dsl

    cols = frozenset({"lang", "length"})
    assert parse_dsl({"range": {"length": {"gte": 10}}}, doc_columns=cols) is not None
    with pytest.raises(DslError):
        parse_dsl({"range": {"text": {"gte": "a"}}}, doc_columns=cols)
    with pytest.raises(DslError):
        parse_dsl({"range": {"nope": {"gte": 1}}}, doc_columns=cols)
