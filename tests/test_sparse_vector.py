"""sparse_vector / text_expansion queries (SparseVectorQueryBuilder,
TokenPruningConfig): expansion-model registry, coordinator rewrite to
weighted_tokens, freq+weight pruning."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.rank_features import (
    build_rank_features,
    field_freq_stats,
)
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.dsl import parse_dsl, to_dsl
from elasticsearch_ray.search.query import (
    MatchNoneQuery,
    SparseVectorQuery,
    WeightedTokensQuery,
)
from elasticsearch_ray.search.sparse_vector import (
    expansion_model,
    prune_tokens,
    register_expansion_model,
)


@pytest.fixture(scope="module")
def sv_engine(ray_session, tmp_path_factory):
    """40-doc index with a rank_features sidecar: 'common' on EVERY doc
    (over-frequent), 'rare' on doc 0 and 1 only."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("svidx")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    n = 40
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"doc number {i}" for i in range(n)]),
    })
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="docs.parquet")
    rows = [(i, "common", 1.0) for i in range(n)]
    rows += [(0, "rare", 2.0), (1, "rare", 0.5)]
    # singleton features keep the field's AVERAGE token freq low so
    # 'common' (df 40) is over-frequent at the default ratio 5
    rows += [(i, f"s{i}", 1.0) for i in range(10, 20)]
    build_rank_features(idx, "tags", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "feature": pa.array([r[1] for r in rows]),
        "weight": pa.array([r[2] for r in rows], pa.float64()),
    }))
    return QueryEngine(idx, dtype="float64")


def _scores(eng, q):
    tbl = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return {r["doc_id"]: r["score"] for r in tbl.to_pylist()}


def test_query_vector_form_equals_weighted_tokens(sv_engine):
    sv = SparseVectorQuery(field="tags",
                           tokens=(("common", 0.5), ("rare", 2.0)))
    wt = WeightedTokensQuery(field="tags",
                             tokens=(("common", 0.5), ("rare", 2.0)))
    assert _scores(sv_engine, sv) == _scores(sv_engine, wt)


def test_inference_expansion_bow(sv_engine):
    m = expansion_model("bow")
    w = m("rare rare common")
    assert w["rare"] == pytest.approx(1.0 + np.log(2.0))
    assert w["common"] == 1.0
    sv = SparseVectorQuery(field="tags", inference_id="bow",
                           query="rare rare common")
    got = _scores(sv_engine, sv)
    # doc 0: rare(2.0)·(1+ln2) + common(1.0)·1.0
    assert got[0] == pytest.approx(2.0 * (1 + np.log(2)) + 1.0, rel=1e-6)
    with pytest.raises(ValueError, match="unknown inference_id"):
        _scores(sv_engine, SparseVectorQuery(field="tags",
                                             inference_id="elser2",
                                             query="x"))


def test_pruning_drops_overfrequent_underweighted(sv_engine):
    # 'common' freq 40 ≫ avg; weight 0.3 < 0.4 → pruned. 'rare' kept.
    sv = SparseVectorQuery(field="tags",
                           tokens=(("common", 0.3), ("rare", 2.0)),
                           prune=True)
    got = _scores(sv_engine, sv)
    assert set(got) == {0, 1}  # only rare carriers
    # same weights WITHOUT pruning keep every doc
    nop = SparseVectorQuery(field="tags",
                            tokens=(("common", 0.3), ("rare", 2.0)))
    assert len(_scores(sv_engine, nop)) == 40
    # high weight protects an over-frequent token
    hv = SparseVectorQuery(field="tags",
                           tokens=(("common", 0.9), ("rare", 2.0)),
                           prune=True)
    assert len(_scores(sv_engine, hv)) == 40


def test_only_score_pruned_tokens_inverts(sv_engine):
    sv = SparseVectorQuery(field="tags",
                           tokens=(("common", 0.3), ("rare", 2.0)),
                           prune=True, only_score_pruned_tokens=True)
    got = _scores(sv_engine, sv)
    assert len(got) == 40
    assert got[5] == pytest.approx(0.3, rel=1e-6)  # only 'common' scored
    # nothing pruned + only_score_pruned → match none
    sv2 = SparseVectorQuery(field="tags", tokens=(("rare", 2.0),),
                            prune=True, only_score_pruned_tokens=True)
    assert _scores(sv_engine, sv2) == {}
    assert isinstance(sv_engine._rewrite(sv2), MatchNoneQuery)


def test_field_freq_stats_and_prune_helper(sv_engine):
    total, nuniq = field_freq_stats(sv_engine.index_dir, "tags")
    assert nuniq == 12 and total == 52  # common(40) + rare(2) + 10 singles
    kept = prune_tokens([("a", 0.1), ("b", 0.9)], field_avg_freq=10,
                        token_freqs={"a": 100, "b": 100})
    assert kept == [("b", 0.9)]
    # freq 0 (unseen token) is never over-frequent
    kept = prune_tokens([("z", 0.1)], field_avg_freq=10, token_freqs={})
    assert kept == [("z", 0.1)]


def test_dsl_parse_and_round_trip():
    d = {"sparse_vector": {"field": "tags",
                           "query_vector": {"rare": 2.0, "common": 0.5},
                           "prune": True,
                           "pruning_config": {
                               "tokens_weight_threshold": 0.6}}}
    q = parse_dsl(d)
    assert isinstance(q, SparseVectorQuery)
    assert q.tokens == (("common", 0.5), ("rare", 2.0))
    assert q.prune and q.tokens_weight_threshold == 0.6
    rt = parse_dsl(to_dsl(q))
    assert rt == q
    te = parse_dsl({"text_expansion": {"tags": {
        "model_id": "bow", "model_text": "hello world"}}})
    assert te.inference_id == "bow" and te.query == "hello world"
    from elasticsearch_ray.search.dsl import DslError

    with pytest.raises(DslError):
        parse_dsl({"sparse_vector": {"field": "tags"}})
    with pytest.raises(DslError):
        parse_dsl({"sparse_vector": {"field": "tags",
                                     "query_vector": {"a": 1.0},
                                     "inference_id": "bow",
                                     "query": "x"}})


def test_register_custom_model():
    register_expansion_model("upper", lambda t: {t.upper(): 1.0})
    assert expansion_model("upper")("abc") == {"ABC": 1.0}


def test_prune_stats_cached_one_bulk_pass(sv_engine):
    """Review r5 #7: pruning stats come from ONE bulk sidecar pass,
    cached across queries."""
    import elasticsearch_ray.index.rank_features as rf

    sv_engine._rankfeat_stats_cache = {}
    calls = []
    orig = rf.feature_stats_bulk

    def traced(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    rf.feature_stats_bulk = traced
    try:
        q = SparseVectorQuery(field="tags",
                              tokens=(("common", 0.3), ("rare", 2.0)),
                              prune=True)
        _scores(sv_engine, q)
        _scores(sv_engine, q)
    finally:
        rf.feature_stats_bulk = orig
    assert len(calls) == 1  # second query served from the cache
