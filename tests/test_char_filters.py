"""pattern_replace / mapping char filters as analysis-chain components
(PatternReplaceCharFilterFactory.java, MappingCharFilterFactory.java) —
unit semantics + end-to-end: the parametric custom analyzer applies the SAME
chain at index and query time, like the reference's custom analyzer."""

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.char_filters import make_char_filter
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery, TermQuery

SF_DIR = "/root/testdata/sf0.001"


def test_pattern_replace_filter():
    f = make_char_filter("pattern_replace", ("[0-9]+", "NUM"))
    assert f("abc 123 x9") == "abc NUM xNUM"


def test_mapping_longest_match():
    # Lucene MappingCharFilter greedy longest match: "ab=>X" wins over "a=>Y"
    f = make_char_filter("mapping", (("a", "Y"), ("ab", "X")))
    assert f("ab a b") == "X Y b"
    f2 = make_char_filter("mapping", (("query", "qry"),))
    assert f2("query the query") == "qry the qry"


def test_custom_analyzer_name_roundtrip():
    import json

    cfg = json.dumps({"base": "standard",
                      "char_filters": [["pattern_replace", ["(join|merge)", "blend"]]]},
                     sort_keys=True)
    an = get_analyzer("custom:" + cfg)
    assert an("a join or merge op")[0] == ["a", "blend", "or", "blend", "op"]
    # block path goes through the chain too
    arr, lens = an.analyze_block(["a join or merge op", "join"])
    assert arr.to_pylist() == ["a", "blend", "or", "blend", "op", "blend"]
    assert lens.tolist() == [5, 1]


@pytest.fixture(scope="module")
def cf_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("cfidx") / "index")
    spec = IndexSpec(
        use_html=False, text_column="text", doc_columns=("lang",),
        char_filters=(("pattern_replace", ("(join|merge)", "blend")),
                      ("mapping", (("query", "qry"),))),
    )
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in t["text"].to_pylist()]))
    return eng, docs


def _hits(eng, q):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return {r["doc_id"] for r in t.to_pylist()}


def test_char_filters_index_side(cf_engine):
    eng, docs = cf_engine
    want = {d for d, toks in docs.items() if "join" in toks or "merge" in toks}
    assert _hits(eng, TermQuery("blend")) == want and want
    want_q = {d for d, toks in docs.items() if "query" in toks}
    assert _hits(eng, TermQuery("qry")) == want_q and want_q


def test_char_filters_query_side_symmetry(cf_engine):
    """The custom chain applies to QUERY text too (index analyzer = search
    analyzer default), so searching the original surface form still works."""
    eng, docs = cf_engine
    want = {d for d, toks in docs.items() if "join" in toks or "merge" in toks}
    assert _hits(eng, MatchQuery("join")) == want
    assert _hits(eng, MatchQuery("query")) == {d for d, t in docs.items() if "query" in t}
