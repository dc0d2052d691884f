"""Fetch-phase subphases from SURVEY §2.14: explain, matched_queries
(named queries), script fields — evaluated against the search path / brute
force over the documents table."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    BoolQuery,
    DisMaxQuery,
    MatchPhraseQuery,
    MatchQuery,
    TermFilter,
    TermQuery,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("fetchidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang", "source"))
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    return QueryEngine(idx, dtype="float64")


@pytest.mark.parametrize("q", [
    MatchQuery("spark join"),
    TermQuery("spark"),
    BoolQuery(must=(MatchQuery("spark"),), should=(TermQuery("join"),),
              filter=(TermFilter(column="lang", value="en"),)),
    MatchPhraseQuery("spark join"),
    DisMaxQuery(queries=(MatchQuery("spark"), MatchQuery("merge")), tie_breaker=0.4),
])
def test_explain_value_matches_search(eng, q):
    hits = eng.search(q, k=5, fetch=("doc_id",))
    assert len(hits) > 0
    for r in hits.to_pylist()[:3]:
        ex = eng.explain(q, r["doc_id"])
        assert ex["match"] is True
        assert ex["value"] == pytest.approx(r["score"], abs=0, rel=0)  # bit-exact


def test_explain_term_breakdown(eng):
    r = eng.search(TermQuery("spark"), k=1, fetch=("doc_id",)).to_pylist()[0]
    ex = eng.explain(TermQuery("spark"), r["doc_id"])
    # weight * tf-fraction == value (the BM25 product decomposition)
    weight = ex["details"][0]["value"]
    frac = ex["details"][1]["value"]
    assert weight * frac == pytest.approx(ex["value"], rel=1e-12)
    # idf detail carries (n, N)
    idf_node = ex["details"][0]["details"][0]
    n, bign = idf_node["details"][0]["value"], idf_node["details"][1]["value"]
    assert 0 < n <= bign == eng.n_docs


def test_explain_no_match(eng):
    ex = eng.explain(MatchQuery("zzzzneverthere"), 0)
    assert ex["match"] is False and ex["value"] == 0.0


def test_matched_queries_vs_brute_force(eng):
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    words = {d: set(t.split()) for d, t in zip(texts["doc_id"].to_pylist(),
                                               texts["text"].to_pylist())}
    named = {"has_spark": MatchQuery("spark"), "has_join": MatchQuery("join"),
             "spark_join_phrase": MatchPhraseQuery("spark join")}
    hits = eng.search(MatchQuery("spark join"), k=20, fetch=("doc_id",))
    got = eng.matched_queries(named, hits)
    assert len(got) == len(hits)
    toks = {d: t.split() for d, t in zip(texts["doc_id"].to_pylist(),
                                          texts["text"].to_pylist())}
    for r, names in zip(hits.to_pylist(), got):
        w = words[r["doc_id"]]
        assert ("has_spark" in names) == ("spark" in w)
        assert ("has_join" in names) == ("join" in w)
        seq = toks[r["doc_id"]]
        adjacent = any(seq[i:i + 2] == ["spark", "join"] for i in range(len(seq) - 1))
        assert ("spark_join_phrase" in names) == adjacent  # positional, not just AND
        assert names == sorted(names)


def test_dsl_name_collection():
    from elasticsearch_ray.search.dsl import parse_dsl_with_names

    q, named = parse_dsl_with_names({"bool": {
        "must": [{"match": {"text": {"query": "spark", "_name": "m1"}}}],
        "should": [{"term": {"text": {"value": "join", "_name": "m2"}}}],
        "_name": "whole",
    }})
    assert set(named) == {"m1", "m2", "whole"}
    assert named["m1"] == MatchQuery("spark")
    assert named["m2"] == TermQuery("join")
    assert named["whole"] == q


def test_script_fields(eng):
    hits = eng.search(MatchQuery("spark"), k=8, fetch=("doc_id",))
    out = eng.script_fields(
        hits,
        {"n_words": lambda src: pa.array(
            [len((t or "").split()) for t in src["text"].to_pylist()], pa.int64()),
         "first_word": lambda src: [(t or "").split()[0] for t in src["text"].to_pylist()]},
        source_columns=("text",),
    )
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    lookup = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for r in out.to_pylist():
        t = lookup[r["doc_id"]]
        assert r["n_words"] == len(t.split())
        assert r["first_word"] == t.split()[0]


def test_collapse_inner_hits(eng):
    """inner_hits (CollapseBuilder#setInnerHits / ExpandSearchPhase): per
    winning collapse value, top-N hits equal the exhaustive per-group
    ranking; groups and sizes bounded."""
    import numpy as np

    q = MatchQuery("spark join")
    full = eng.search(q, k=10**9, mode="exhaustive",
                      fetch=("doc_id", "lang")).to_pandas()
    winners = (full.sort_values(["score", "doc_id"], ascending=[False, True])
               .drop_duplicates("lang").head(3)["lang"].tolist())
    inner = eng.inner_hits(q, "lang", winners, size=2,
                           fetch=("doc_id",)).to_pandas()
    # duplicate values must not duplicate rows (fetch-join multiplication)
    dup = eng.inner_hits(q, "lang", winners + winners, size=2,
                         fetch=("doc_id",)).to_pandas()
    assert dup.to_dict("records") == inner.to_dict("records")
    assert set(inner["lang"]) <= set(winners)
    assert (inner.groupby("lang").size() <= 2).all()
    for v in winners:
        want = (full[full["lang"] == v]
                .sort_values(["score", "part", "local"],
                             ascending=[False, True, True]).head(2))
        got = inner[inner["lang"] == v].sort_values("inner_rank")
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), v
        np.testing.assert_allclose(got["score"], want["score"], rtol=0,
                                   atol=1e-12)
        assert got["inner_rank"].tolist() == list(range(1, len(got) + 1))
    # warm-actor backend returns the same rows (separate code path)
    from elasticsearch_ray.search.engine import QueryEngine

    ray_eng = QueryEngine(eng.index_dir, dtype="float64", parallel="ray",
                          num_actors=2)
    try:
        via_actors = ray_eng.inner_hits(q, "lang", winners, size=2,
                                        fetch=("doc_id",)).to_pandas()
        assert via_actors.to_dict("records") == inner.to_dict("records")
    finally:
        ray_eng.close()
