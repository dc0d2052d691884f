"""terms_set (per-doc minimum_should_match field) and distance_feature
(numeric/date proximity boost) vs brute-force oracles.

Reference semantics: TermsSetQueryBuilder.java (CoveringQuery — doc matches
when the number of matching terms >= the doc's minimum_should_match_field
value; score is the sum of the matching term scores) and
DistanceFeatureQueryBuilder.java (score = boost * pivot / (pivot + distance)).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    BoolQuery,
    DistanceFeatureQuery,
    MatchQuery,
    TermsSetQuery,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tsd_engine(ray_session, tmp_path_factory):
    """Documents corpus with a derived per-doc required-match column
    (req_m = 1 + doc_id % 3) so terms_set's minimum_should_match_field has
    something real to read."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("tsdidx")
    corpus = str(root / "corpus")
    import os

    os.makedirs(corpus, exist_ok=True)
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    req = pa.array([1 + int(d) % 3 for d in t["doc_id"].to_pylist()], pa.int64())
    t = t.append_column("req_m", req)
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = str(root / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("lang", "n_chars", "req_m"))
    build_index(corpus, idx, spec, concurrency=2, file_pattern="docs.parquet")
    eng = QueryEngine(idx, dtype="float64")
    docs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in t["text"].to_pylist()]))
    meta = dict(zip(t["doc_id"].to_pylist(),
                    zip(t["n_chars"].to_pylist(), req.to_pylist())))
    return eng, docs, meta


def _hits(eng, q):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return {r["doc_id"] for r in t.to_pylist()}


def test_terms_set_per_doc_msm(tsd_engine):
    eng, docs, meta = tsd_engine
    terms = ("spark", "join", "merge")
    got = _hits(eng, TermsSetQuery(terms=terms, minimum_should_match_field="req_m"))
    want = {d for d, toks in docs.items()
            if sum(t in toks for t in terms) >= meta[d][1]}
    assert got == want and got


def test_terms_set_scores_sum_of_matching(tsd_engine):
    """Where req_m == 1 for every candidate, terms_set score == bool-should
    msm=1 score (sum over matching terms)."""
    eng, docs, meta = tsd_engine
    terms = ("window", "sort")
    res = eng.search(TermsSetQuery(terms=terms, minimum_should_match_field="req_m"),
                     k=10**9, mode="exhaustive", fetch=("doc_id",))
    ts_scores = {r["doc_id"]: r["score"] for r in res.to_pylist()}
    ref = eng.search(MatchQuery(" ".join(terms)), k=10**9, mode="exhaustive",
                     fetch=("doc_id",))
    bool_scores = {r["doc_id"]: r["score"] for r in ref.to_pylist()}
    checked = 0
    for d, s in ts_scores.items():
        if meta[d][1] == 1:
            assert abs(s - bool_scores[d]) < 1e-9, d
            checked += 1
    assert checked > 0


def test_distance_feature_scores(tsd_engine):
    eng, _docs, meta = tsd_engine
    origin, pivot, boost = 1000.0, 500.0, 2.0
    res = eng.search(DistanceFeatureQuery(field="n_chars", origin=origin,
                                          pivot=pivot, boost=boost),
                     k=10**9, mode="exhaustive", fetch=("doc_id",))
    assert res.num_rows == len(meta)  # matches all docs carrying the field
    for r in res.to_pylist():
        n_chars = meta[r["doc_id"]][0]
        want = boost * pivot / (pivot + abs(float(n_chars) - origin))
        assert abs(r["score"] - want) < 1e-12, r["doc_id"]


def test_pinned_query(tsd_engine):
    from elasticsearch_ray.search.query import PinnedQuery

    eng, docs, _meta = tsd_engine
    organic = MatchQuery("spark join")
    base = eng.search(organic, k=10, mode="exhaustive", fetch=("doc_id",))
    base_ids = base["doc_id"].to_pylist()
    # pin two docs that are NOT the organic top hits
    all_ids = sorted(docs)
    pins = [d for d in all_ids if d not in base_ids[:2]][:2]
    res = eng.search(PinnedQuery(ids=tuple(pins), organic=organic), k=10,
                     mode="exhaustive", fetch=("doc_id",))
    got = res["doc_id"].to_pylist()
    assert got[:2] == pins  # pinned first, in listed order
    # organic tail preserved minus any pinned member
    want_tail = [d for d in base_ids if d not in pins][: 10 - 2]
    assert got[2:] == want_tail


def test_rank_feature_functions(tsd_engine):
    import math

    from elasticsearch_ray.search.query import RankFeatureQuery

    eng, _docs, meta = tsd_engine
    cases = [
        (RankFeatureQuery(field="n_chars", function="saturation", pivot=800.0,
                          boost=2.0),
         lambda x: 2.0 * x / (x + 800.0)),
        (RankFeatureQuery(field="n_chars", function="log", scaling_factor=3.0),
         lambda x: math.log(3.0 + x)),
        (RankFeatureQuery(field="n_chars", function="sigmoid", pivot=700.0,
                          exponent=2.0),
         lambda x: x**2.0 / (x**2.0 + 700.0**2.0)),
    ]
    for q, f in cases:
        res = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
        assert res.num_rows == len(meta)
        for r in res.to_pylist()[:200]:
            assert abs(r["score"] - f(float(meta[r["doc_id"]][0]))) < 1e-9


def test_distance_feature_in_bool_should(tsd_engine):
    """The canonical usage: proximity boost added to a match's BM25 score."""
    eng, docs, meta = tsd_engine
    dfq = DistanceFeatureQuery(field="n_chars", origin=1000.0, pivot=500.0, boost=5.0)
    base = eng.search(MatchQuery("spark"), k=10**9, mode="exhaustive", fetch=("doc_id",))
    comb = eng.search(BoolQuery(must=(MatchQuery("spark"),), should=(dfq,)),
                      k=10**9, mode="exhaustive", fetch=("doc_id",))
    base_s = {r["doc_id"]: r["score"] for r in base.to_pylist()}
    comb_s = {r["doc_id"]: r["score"] for r in comb.to_pylist()}
    assert set(base_s) == set(comb_s) and base_s
    for d, s in comb_s.items():
        addend = 5.0 * 500.0 / (500.0 + abs(float(meta[d][0]) - 1000.0))
        assert abs(s - (base_s[d] + addend)) < 1e-9, d
