"""Search templates (mustache subset) + index aliases (filtered, multi-index,
atomic update) — `_search/template` and IndicesAliasesRequest analogs."""

import numpy as np
import pytest

from elasticsearch_ray.search.templates import (TemplateRegistry,
                                                render_template,
                                                search_template)
from elasticsearch_ray.search.aliases import AliasRegistry
from elasticsearch_ray.search.query import MatchQuery, TermFilter, BoolQuery


# ---------------------------------------------------------------- templates

def test_render_plain_and_tojson():
    body = render_template(
        '{"query": {"match": {"text": "{{q}}"}}, "size": {{size}}}',
        {"q": "spark join", "size": 5})
    assert body == {"query": {"match": {"text": "spark join"}}, "size": 5}
    body = render_template(
        '{"query": {"terms": {"lang": {{#toJson}}langs{{/toJson}}}}}',
        {"langs": ["en", "fr"]})
    assert body["query"]["terms"]["lang"] == ["en", "fr"]


def test_render_sections_and_defaults():
    src = ('{"query": {"bool": {"must": [{"match": {"text": "{{q}}"}}]'
           '{{#lang}}, "filter": [{"term": {"lang": "{{lang}}"}}]{{/lang}}'
           '}}}')
    with_f = render_template(src, {"q": "x", "lang": "fr"})
    assert with_f["query"]["bool"]["filter"] == [{"term": {"lang": "fr"}}]
    without = render_template(src, {"q": "x"})
    assert "filter" not in without["query"]["bool"]
    # inverted section = default value idiom
    src2 = '{"size": {{#size}}{{size}}{{/size}}{{^size}}10{{/size}}}'
    assert render_template(src2, {"size": 3}) == {"size": 3}
    assert render_template(src2, {}) == {"size": 10}


def test_render_list_iteration():
    src = ('{"query": {"bool": {"should": ['
           '{{#clauses}}{"term": {"text": "{{.}}"}},{{/clauses}}'
           '{"match_none": {}}]}}}')
    body = render_template(src, {"clauses": ["a", "b"]})
    shoulds = body["query"]["bool"]["should"]
    assert {"term": {"text": "a"}} in shoulds and {"term": {"text": "b"}} in shoulds


def test_unclosed_section_raises():
    with pytest.raises(ValueError):
        render_template('{"a": {{#x}}1}', {"x": 1})


def test_stored_registry():
    reg = TemplateRegistry()
    reg.put("t1", {"query": {"match": {"text": "{{q}}"}}})
    assert reg.render("t1", {"q": "hi"})["query"]["match"]["text"] == "hi"
    reg.delete("t1")
    with pytest.raises(KeyError):
        reg.render("t1")


# ------------------------------------------------------------------ aliases

@pytest.fixture(scope="module")
def doc_engine(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    return entrymod._documents_index("/root/testdata/sf0.001")


def test_search_template_end_to_end(doc_engine):
    res = search_template(
        doc_engine,
        '{"query": {"bool": {"must": [{"match": {"text": "{{q}}"}}],'
        ' "filter": [{"term": {"lang": "{{lang}}"}}]}}}',
        {"q": "spark join", "lang": "en"}, k=5, fetch=("doc_id",))
    direct = doc_engine.search(
        BoolQuery(must=(MatchQuery("spark join"),),
                  filter=(TermFilter("lang", "en"),)), k=5, fetch=("doc_id",))
    assert res["doc_id"].to_pylist() == direct["doc_id"].to_pylist()
    assert np.allclose(res["score"].to_numpy(), direct["score"].to_numpy())


def test_filtered_alias_matches_explicit_filter(doc_engine):
    reg = AliasRegistry()
    reg.put("en_docs", doc_engine, filter={"term": {"lang": "en"}})
    via_alias = reg.search("en_docs", MatchQuery("spark join"), k=5,
                           fetch=("doc_id",))
    direct = doc_engine.search(
        BoolQuery(must=(MatchQuery("spark join"),),
                  filter=(TermFilter("lang", "en"),)), k=5, fetch=("doc_id",))
    assert via_alias["doc_id"].to_pylist() == direct["doc_id"].to_pylist()
    # alias filter is non-scoring: scores equal the filtered-query scores
    assert np.allclose(via_alias["score"].to_numpy(),
                       direct["score"].to_numpy())


def test_alias_atomic_update(doc_engine):
    reg = AliasRegistry()
    reg.put("a", doc_engine)
    # batch with a bad remove: NOTHING applies
    with pytest.raises(KeyError):
        reg.update_aliases([
            {"add": {"alias": "b", "engines": doc_engine}},
            {"remove": {"alias": "nope"}},
        ])
    assert reg.aliases() == {"a": 1}
    # atomic swap
    reg.update_aliases([
        {"remove": {"alias": "a"}},
        {"add": {"alias": "current", "engines": doc_engine,
                 "filter": {"term": {"lang": "fr"}}}},
    ])
    assert set(reg.aliases()) == {"current"}
    res = reg.search("current", MatchQuery("spark"), k=5, fetch=("lang",))
    assert all(v == "fr" for v in res["lang"].to_pylist())


def test_template_json_escaping_and_injection():
    body = render_template('{"query": {"match": {"text": "{{q}}"}}}',
                           {"q": 'say "hi" \\ there\n'})
    assert body["query"]["match"]["text"] == 'say "hi" \\ there\n'
    # a crafted param cannot inject structure — it stays a string value
    body = render_template('{"query": {"match": {"text": "{{q}}"}}}',
                           {"q": '"}}, "size": 9999, "x": {"y": "'})
    assert "size" not in body and body["query"]["match"]["text"].startswith('"}}')


def test_search_template_full_body_with_size(doc_engine):
    res = search_template(
        doc_engine,
        '{"query": {"match": {"text": "{{q}}"}}, "size": {{n}}}',
        {"q": "spark join", "n": 3}, fetch=("doc_id",))
    assert res.num_rows == 3


def test_multi_alias_stats_idempotent(doc_engine, tmp_path):
    """Re-putting a multi-member alias (or sharing members) must NOT
    compound the combined stats: scores stay identical across re-wraps."""
    import __ray_entry__ as entrymod

    multi = entrymod._multi_docs_index("/root/testdata/sf0.001")
    e1, e2 = multi.engines
    reg = AliasRegistry()
    reg.put("ab", [e1, e2])
    first = reg.search("ab", MatchQuery("spark join"), k=5, fetch=("orig_id",))
    reg.put("ab", [e1, e2])  # re-put drops the cached wrapper → re-wrap
    second = reg.search("ab", MatchQuery("spark join"), k=5, fetch=("orig_id",))
    assert first["orig_id"].to_pylist() == second["orig_id"].to_pylist()
    assert np.allclose(first["score"].to_numpy(), second["score"].to_numpy())


def test_raw_tokenizers_preserve_case():
    from elasticsearch_ray.analysis.tokenizers_extra import TOKENIZER_REGISTRY as R

    assert R["ngram"]("Ab", min_gram=2, max_gram=2) == ["Ab"]
    assert R["edge_ngram"]("Spark", min_gram=2, max_gram=2) == ["Sp"]
    assert R["uax_url_email"]("See Bob@Ex.com") == ["See", "Bob@Ex.com"]
    assert R["thai"]("การทดสอบ Fun")[-1] == "Fun"


def test_field_caps_and_validate(doc_engine):
    caps = doc_engine.field_caps()
    assert caps["text"]["type"] == "text" and caps["text"]["searchable"]
    assert "lang" in caps and caps["lang"]["aggregatable"]
    assert caps["doc_id"]["aggregatable"]

    ok = doc_engine.validate_query({"query": {"match": {"text": "spark"}}})
    assert ok["valid"] and "match" in ok["explanation"]
    bad = doc_engine.validate_query({"query": {"nope": {}}})
    assert not bad["valid"] and "nope" in bad["error"]
    bad2 = doc_engine.validate_query({"query": {"range": {"text": {"gte": 1}}}})
    assert not bad2["valid"]


def test_analyze_and_terms_enum(doc_engine):
    toks = doc_engine.analyze("The Running Dogs")
    assert [t["token"] for t in toks] == ["the", "running", "dogs"]
    assert [t["position"] for t in toks] == [0, 1, 2]
    # named analyzer override
    stemmed = doc_engine.analyze("The Running Dogs", analyzer="english")
    assert [t["token"] for t in stemmed] == ["run", "dog"]

    terms = doc_engine.terms_enum("sp", size=5)
    assert terms and all(t.startswith("sp") for t in terms)
    assert terms == sorted(terms) and len(terms) <= 5
    assert "spark" in doc_engine.terms_enum("spark", size=3)


def test_template_escaping_property():
    """Any printable param string round-trips exactly through a quoted
    template slot (hypothesis: JSON-escaping is complete)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def check(s):
        body = render_template('{"query": {"match": {"text": "{{q}}"}}}',
                               {"q": s})
        assert body["query"]["match"]["text"] == s

    check()


def test_rrf_fuse_semantics():
    from elasticsearch_ray.search.hybrid import rrf_fuse

    got = rrf_fuse([[1, 2, 3], [3, 4]], k=10, rank_constant=60)
    by = dict(zip(got["doc_id"], got["rrf"]))
    assert abs(by[3] - (1 / 63 + 1 / 61)) < 1e-12  # in both rankers
    assert abs(by[1] - 1 / 61) < 1e-12             # one ranker only
    # doc in both rankers outranks single-ranker docs here
    assert got.iloc[0]["doc_id"] == 3
    # deterministic tie-break: identical rrf → lower doc_id first
    t = rrf_fuse([[5], [9]], k=5)
    assert t["doc_id"].tolist() == [5, 9]


def test_hybrid_rrf_end_to_end(doc_engine):
    import pyarrow.parquet as pq
    import ray.data as rd

    from elasticsearch_ray.search.hybrid import hybrid_rrf

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    qvec = emb["embedding"][0].as_py()
    out = hybrid_rrf(doc_engine, rd.from_arrow(emb), "spark join merge",
                     qvec, k=10, window=20)
    assert len(out) == 10 and out["rank"].tolist() == list(range(1, 11))
    # vec_id 0 is its own nearest neighbor → rank 1 in the vector leg:
    # its rrf includes 1/61
    assert 0 in set(out["doc_id"]) or out["rrf"].max() >= 1 / 61
