"""Retriever tree API (RetrieverBuilder/StandardRetrieverBuilder/
KnnRetrieverBuilder + x-pack RRFRetrieverBuilder): leaf dispatch to the
BM25 engine and the persisted vector index, rrf composition."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.search.hybrid import rrf_fuse
from elasticsearch_ray.search.retrievers import (
    RetrieverError,
    execute_retriever,
)

N, DIM = 60, 16


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.index.vectors import build_vector_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("retr")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(11)
    words = ["spark", "join", "merge", "sort", "scan", "index"]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(N)]
    langs = [("en" if i % 2 == 0 else "de") for i in range(N)]
    t = pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",)),
                concurrency=2, file_pattern="docs.parquet")
    eng = QueryEngine(idx, dtype="float64")

    vecs = rng.normal(size=(N, DIM))
    vidx = str(root / "vidx")
    build_vector_index(rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
    })), vidx, num_partitions=2)
    return eng, vidx, vecs


def test_standard_retriever_equals_engine_search(setup):
    eng, _vidx, _vecs = setup
    got = execute_retriever(
        {"standard": {"query": {"match": {"text": "spark join"}}}},
        engine=eng, size=5)
    from elasticsearch_ray.search.query import MatchQuery

    want = eng.search(MatchQuery("spark join"), k=30,
                      fetch=("doc_id",)).to_pandas()
    want["score"] = want["score"].round(4)
    want = (want.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(5))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_standard_retriever_filter_clause(setup):
    eng, _vidx, _vecs = setup
    got = execute_retriever(
        {"standard": {"query": {"match": {"text": "spark"}},
                      "filter": {"term": {"lang": "en"}}}},
        engine=eng, size=50)
    assert len(got) > 0
    assert all(d % 2 == 0 for d in got["doc_id"])  # en == even ids


def test_knn_retriever_exact_route(setup):
    _eng, vidx, vecs = setup
    q = vecs[3]
    got = execute_retriever(
        {"knn": {"field": "embedding", "query_vector": list(q),
                 "k": 5, "num_candidates": 10 * N}},
        vector_index_dir=vidx, size=5)
    # exact brute route: top hit is the query's own vector
    assert got["doc_id"].iloc[0] == 3
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = np.argsort(-sims, kind="stable")[:5]
    assert got["doc_id"].tolist() == want.tolist()


def test_rrf_tree_matches_manual_fusion(setup):
    eng, vidx, vecs = setup
    tree = {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "merge sort"}}}},
        {"knn": {"field": "embedding", "query_vector": list(vecs[0]),
                 "k": 20, "num_candidates": 10 * N}},
    ], "rank_window_size": 20, "rank_constant": 60}}
    got = execute_retriever(tree, engine=eng, vector_index_dir=vidx,
                            size=10)

    lex = execute_retriever(
        {"standard": {"query": {"match": {"text": "merge sort"}}}},
        engine=eng, size=20, window=20)
    vec = execute_retriever(
        {"knn": {"field": "embedding", "query_vector": list(vecs[0]),
                 "k": 20, "num_candidates": 10 * N}},
        vector_index_dir=vidx, size=20, window=20)
    want = rrf_fuse([lex["doc_id"].tolist(), vec["doc_id"].tolist()],
                    k=10, rank_constant=60)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"], want["rrf"])


def test_retriever_errors(setup):
    eng, vidx, _vecs = setup
    with pytest.raises(RetrieverError, match="exactly one"):
        execute_retriever({"standard": {}, "knn": {}}, engine=eng)
    with pytest.raises(RetrieverError, match="unknown"):
        execute_retriever({"bm42": {}}, engine=eng)
    with pytest.raises(RetrieverError, match="needs an engine"):
        execute_retriever(
            {"standard": {"query": {"match_all": {}}}})
    with pytest.raises(RetrieverError, match="retrievers"):
        execute_retriever({"rrf": {"retrievers": []}}, engine=eng)


def test_standard_leg_tie_group_refetch(setup):
    """Review r5 #3: the standard leg must widen its overfetch when the
    round-4 tie group at the window boundary extends past the fixed
    margin (hybrid.py's established discipline)."""
    import pandas as pd
    import ray.data  # noqa: F401

    eng, _vidx, _vecs = setup

    calls = []
    orig = eng.search

    def traced(q, k=10, **kw):
        calls.append(k)
        return orig(q, k=k, **kw)

    eng.search = traced
    try:
        # window 2 with a corpus whose scores tie heavily at round(4):
        # match-all-ish single-term query over 60 similar docs
        got = execute_retriever(
            {"standard": {"query": {"term": {"text": {"value": "spark"}}}}},
            engine=eng, size=2, window=2)
    finally:
        eng.search = orig
    # the loop either settled on the first fetch (no open tie) or grew
    # the margin; either way the result must equal the full ranking cut
    full = orig(__import__("elasticsearch_ray.search.query",
                           fromlist=["TermQuery"]).TermQuery("spark"),
                k=10**6, mode="exhaustive", fetch=("doc_id",)).to_pandas()
    full["score"] = full["score"].round(4)
    want = (full.sort_values(["score", "doc_id"],
                             ascending=[False, True])
            .head(2)["doc_id"].tolist())
    assert got["doc_id"].tolist() == want
    assert all(k >= 52 for k in calls)


def test_linear_retriever_weighted_minmax(setup):
    eng, _vidx, _vecs = setup
    tree = {"linear": {"retrievers": [
        {"retriever": {"standard": {
            "query": {"match": {"text": "spark"}}}},
         "weight": 2.0, "normalizer": "minmax"},
        {"retriever": {"standard": {
            "query": {"match": {"text": "merge"}}}},
         "weight": 1.0, "normalizer": "minmax"},
    ], "rank_window_size": 30}}
    got = execute_retriever(tree, engine=eng, size=10)

    from elasticsearch_ray.search.query import MatchQuery

    def leg(qs):
        df = eng.search(MatchQuery(qs), k=90, fetch=("doc_id",)).to_pandas()
        df["_k"] = df["score"].round(4)
        df = df.sort_values(["_k", "doc_id"],
                            ascending=[False, True]).head(30)
        s = df["score"].round(4).to_numpy(dtype=float)
        lo, hi = float(s.min()), float(s.max())
        s = np.ones_like(s) if hi == lo else (s - lo) / (hi - lo)
        return dict(zip(df["doc_id"].tolist(), s))

    a, b = leg("spark"), leg("merge")
    comb = {d: 2.0 * a.get(d, 0.0) + b.get(d, 0.0)
            for d in set(a) | set(b)}
    want = sorted(comb.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))
    assert got["doc_id"].tolist() == [d for d, _ in want[:10]]
    assert np.allclose(got["score"],
                       [v for _d, v in want[:10]], atol=1e-9)
    with pytest.raises(RetrieverError, match="normalizer"):
        execute_retriever({"linear": {"retrievers": [
            {"retriever": {"standard": {
                "query": {"match": {"text": "spark"}}}},
             "normalizer": "zscore"}]}}, engine=eng)
    with pytest.raises(RetrieverError, match="nested"):
        execute_retriever({"linear": {"retrievers": [
            {"weight": 1.0}]}}, engine=eng)


def test_text_similarity_reranker_orders_by_model(setup):
    eng, _vidx, _vecs = setup
    child = {"standard": {"query": {"match": {"text": "spark"}}}}
    tree = {"text_similarity_reranker": {
        "retriever": child, "inference_text": "merge sort",
        "field": "text", "rank_window_size": 20}}
    got = execute_retriever(tree, engine=eng, size=5)
    # recompute: child window ids -> bow relevance on fetched source text
    sub = execute_retriever(child, engine=eng, size=20, window=20)
    docs = eng.mget(sub["doc_id"].tolist(), columns=("doc_id",),
                    source_columns=("text",)).to_pandas()
    import math
    from collections import Counter

    def bow(t):
        return {w: 1 + math.log(c)
                for w, c in Counter(t.lower().split()).items()}

    q = bow("merge sort")
    rel = {int(r["doc_id"]): sum(w * bow(r["text"]).get(tok, 0.0)
                                 for tok, w in q.items())
           for _, r in docs.iterrows()}
    want = sorted(rel.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))
    assert got["doc_id"].tolist() == [d for d, _ in want[:5]]
    # every reranked hit still comes from the child's window
    assert set(got["doc_id"]) <= set(sub["doc_id"])


def test_review_r5f_reranker_requires_inference_text(setup):
    eng, _vidx, _vecs = setup
    with pytest.raises(RetrieverError, match="inference_text"):
        execute_retriever({"text_similarity_reranker": {
            "retriever": {"standard": {
                "query": {"match": {"text": "spark"}}}},
            "field": "text"}}, engine=eng)
