"""Index-time synonym token filter (SynonymTokenFilterFactory,
CommonAnalysisPlugin.java:226-335; Lucene SynonymFilter flatten subset) —
injection at same position, contractions, and phrase behavior through spans.
"""

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.synonyms import IndexTimeSynonyms
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchPhraseQuery, TermQuery

SF_DIR = "/root/testdata/sf0.001"
RULES = ("spark, flink", "merge sort => mergesort")


def test_filter_semantics():
    an = IndexTimeSynonyms(get_analyzer("standard"), list(RULES))
    # equivalence: injected at SAME position, original kept
    t, p = an("the spark engine")
    assert t == ["the", "spark", "flink", "engine"]
    assert p == [0, 1, 1, 2]
    # symmetric direction
    t, p = an("flink rocks")
    assert t == ["flink", "spark", "rocks"]
    assert p == [0, 0, 1]
    # contraction: span consumed, replacement at span start; later positions
    # keep their original token positions (gap left by the consumed span)
    t, p = an("a merge sort day")
    assert t == ["a", "mergesort", "day"]
    assert p == [0, 1, 3]


@pytest.fixture(scope="module")
def syn_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("synidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang",),
                     index_synonyms=RULES)
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in t["text"].to_pylist()]))
    return eng, docs


def _hits(eng, q):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return {r["doc_id"] for r in t.to_pylist()}


def test_equivalence_term_search(syn_engine):
    eng, docs = syn_engine
    want = {d for d, toks in docs.items() if "spark" in toks}
    assert _hits(eng, TermQuery("flink")) == want and want
    assert _hits(eng, TermQuery("spark")) == want


def test_contraction_term_search(syn_engine):
    eng, docs = syn_engine
    want = {d for d, toks in docs.items()
            if any(a == "merge" and b == "sort" for a, b in zip(toks, toks[1:]))}
    assert _hits(eng, TermQuery("mergesort")) == want and want


def test_phrase_through_injected_position(syn_engine):
    eng, docs = syn_engine
    want = {d for d, toks in docs.items()
            if any(a == "spark" and b == "join" for a, b in zip(toks, toks[1:]))}
    assert _hits(eng, MatchPhraseQuery("spark join")) == want and want
    # injected variant sits at the same position → same phrase doc set
    assert _hits(eng, MatchPhraseQuery("flink join")) == want
