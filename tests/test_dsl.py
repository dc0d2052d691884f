"""JSON query-DSL parser (search/dsl.py) — shape parity with the reference's
fromXContent surface, plus end-to-end equality: a DSL-parsed query must return
exactly what the directly-constructed Query tree returns."""

import base64
import json

import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.dsl import DslError, parse_dsl
from elasticsearch_ray.search.query import (
    BoolQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    FuzzyQuery,
    IntervalsQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MatchPhraseQuery,
    MatchQuery,
    MultiMatchQuery,
    PinnedQuery,
    PrefixQuery,
    RangeFilter,
    SpanNearQuery,
    TermFilter,
    TermQuery,
    TermsQuery,
)

SF_DIR = "/root/testdata/sf0.001"


def test_match_shorthand_and_full():
    assert parse_dsl({"match": {"text": "spark"}}) == MatchQuery("spark")
    q = parse_dsl({"match": {"text": {"query": "spark join", "operator": "AND",
                                      "boost": 2.0}}})
    assert q == MatchQuery("spark join", operator="and", boost=2.0)


def test_fielded_match_maps_extra_field():
    q = parse_dsl({"match": {"title": "spark"}})
    assert q == MatchQuery("spark", field="title")


def test_term_routes_doc_columns_to_filters():
    assert parse_dsl({"term": {"lang": "fr"}}) == TermFilter(column="lang", value="fr")
    assert parse_dsl({"term": {"text": {"value": "spark"}}}) == TermQuery("spark")
    assert parse_dsl({"range": {"warc_ts": {"gte": 5, "lt": 9}}}) == RangeFilter(
        column="warc_ts", gte=5, lt=9)
    # stored columns beyond the parser's default set stay parseable
    # (engines store doc columns the parser can't know about: n_chars, …)
    assert parse_dsl({"range": {"n_chars": {"gte": 100}}}) == RangeFilter(
        column="n_chars", gte=100)
    # …but the analyzed default field has no range semantics: parse-time error
    import pytest

    from elasticsearch_ray.search.dsl import DslError

    with pytest.raises(DslError):
        parse_dsl({"range": {"text": {"gte": "a"}}})


def test_terms_and_lookup():
    assert parse_dsl({"terms": {"text": ["a", "b"]}}) == TermsQuery(terms=("a", "b"))
    got = parse_dsl({"terms": {"lang": ["en", "fr"]}})
    assert got == BoolQuery(should=(TermFilter(column="lang", value="en"),
                                    TermFilter(column="lang", value="fr")),
                            minimum_should_match=1)


def test_bool_compound():
    d = {"bool": {"must": [{"match": {"text": "spark"}}],
                  "must_not": {"term": {"text": "window"}},
                  "filter": [{"term": {"lang": "en"}}],
                  "minimum_should_match": None}}
    q = parse_dsl(d)
    assert q == BoolQuery(must=(MatchQuery("spark"),),
                          must_not=(TermQuery("window"),),
                          filter=(TermFilter(column="lang", value="en"),))


def test_dis_max_constant_score_match_all_none():
    q = parse_dsl({"dis_max": {"queries": [{"match": {"text": "a"}},
                                           {"match": {"text": "b"}}],
                               "tie_breaker": 0.3}})
    assert q == DisMaxQuery(queries=(MatchQuery("a"), MatchQuery("b")), tie_breaker=0.3)
    assert parse_dsl({"constant_score": {"filter": {"term": {"text": "x"}},
                                         "boost": 1.5}}) == ConstantScoreQuery(
        filter=TermQuery("x"), boost=1.5)
    assert parse_dsl({"match_all": {}}) == MatchAllQuery()
    assert parse_dsl({"match_none": {}}) == MatchNoneQuery()


def test_multi_match_caret_boosts():
    q = parse_dsl({"multi_match": {"query": "spark", "fields": ["title^2", "text"],
                                   "type": "most_fields"}})
    assert q == MultiMatchQuery(text="spark", fields=("title", None),
                                type="most_fields",
                                boosts=(("title", 2.0), (None, 1.0)))


def test_span_and_intervals():
    q = parse_dsl({"span_near": {"clauses": [{"span_term": {"text": "spark"}},
                                             {"span_term": {"text": "join"}}],
                                 "slop": 2, "in_order": False}})
    assert q == SpanNearQuery(clauses=("spark", "join"), slop=2, in_order=False)
    iq = parse_dsl({"intervals": {"text": {"match": {"query": "merge sort",
                                                     "max_gaps": 1, "ordered": True}}}})
    assert iq == IntervalsQuery(source=("match", "merge sort", 1, True))


def test_fuzzy_prefix_pinned_phrase():
    assert parse_dsl({"fuzzy": {"text": {"value": "sprak", "fuzziness": "1"}}}) == \
        FuzzyQuery(term="sprak", fuzziness="1")
    assert parse_dsl({"prefix": {"text": {"value": "spa"}}}) == PrefixQuery(prefix="spa")
    # namespaced prefix on an extra field goes through the shared term dict
    assert parse_dsl({"prefix": {"title": "spa"}}) == PrefixQuery(prefix="title\x1fspa")
    assert parse_dsl({"match_phrase": {"text": {"query": "merge sort", "slop": 1}}}) == \
        MatchPhraseQuery("merge sort", slop=1)
    p = parse_dsl({"pinned": {"ids": [3, 1], "organic": {"match": {"text": "spark"}}}})
    assert p == PinnedQuery(ids=(3, 1), organic=MatchQuery("spark"))


def test_wrapper_base64_roundtrip():
    inner = {"match": {"text": "spark"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    assert parse_dsl({"wrapper": {"query": b64}}) == MatchQuery("spark")


def test_search_body_unwrap_and_json_string():
    body = json.dumps({"query": {"match": {"text": "spark"}}})
    assert parse_dsl(body) == MatchQuery("spark")


def test_unknown_type_raises():
    with pytest.raises(DslError):
        parse_dsl({"geo_distance": {"field": {}}})
    with pytest.raises(DslError):
        parse_dsl({"match": {"a": 1, "b": 2}})


@pytest.fixture(scope="module")
def dsl_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("dslidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang", "source"))
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    return QueryEngine(idx, dtype="float64")


def test_dsl_end_to_end_equality(dsl_engine):
    """The reference-user path: a JSON body searched as-is returns exactly
    the directly-constructed query's hits, scores included."""
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark join"}}],
        "must_not": [{"term": {"text": "window"}}],
    }}}
    direct = BoolQuery(must=(MatchQuery("spark join"),),
                       must_not=(TermQuery("window"),))
    a = dsl_engine.search(parse_dsl(body), k=20, fetch=("doc_id",))
    b = dsl_engine.search(direct, k=20, fetch=("doc_id",))
    assert a.equals(b)
    assert len(a) > 0


def test_dsl_match_none_empty(dsl_engine):
    assert len(dsl_engine.search(parse_dsl({"match_none": {}}), k=5)) == 0
