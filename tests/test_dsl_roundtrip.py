"""Property test: parse_dsl(to_dsl(q)) == q over randomly generated Query
trees (the toXContent/fromXContent round-trip invariant)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from elasticsearch_ray.search.dsl import parse_dsl, to_dsl
from elasticsearch_ray.search.query import (
    BoolQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    DistanceFeatureQuery,
    ExistsQuery,
    FuzzyQuery,
    IdsQuery,
    IntervalsQuery,
    KnnQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MatchPhraseQuery,
    MatchQuery,
    MultiMatchQuery,
    PinnedQuery,
    PrefixQuery,
    RangeFilter,
    RankFeatureQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermFilter,
    TermQuery,
    TermsQuery,
    TermsSetQuery,
    WildcardQuery,
)

words = st.sampled_from(["spark", "join", "merge", "sort", "window", "hash"])
fields = st.sampled_from([None, "title", "anchor"])
doc_cols = st.sampled_from(["lang", "url", "warc_ts"])
boosts = st.sampled_from([1.0, 0.5, 2.0])
ops = st.sampled_from(["or", "and"])

leaf = st.one_of(
    st.builds(MatchQuery, text=words, operator=ops, boost=boosts, field=fields),
    st.builds(MatchPhraseQuery, text=st.sampled_from(["spark join", "merge sort"]),
              slop=st.integers(0, 2), boost=boosts, field=fields),
    st.builds(TermQuery, term=words, boost=boosts, field=fields),
    st.builds(TermFilter, column=doc_cols, value=words),
    st.builds(TermsQuery, terms=st.tuples(words, words), boost=boosts),
    st.builds(RangeFilter, column=doc_cols, gte=st.one_of(st.none(), st.integers(0, 9)),
              lt=st.one_of(st.none(), st.integers(10, 20))),
    st.builds(ExistsQuery, field=doc_cols, boost=boosts),
    st.builds(PrefixQuery, prefix=st.sampled_from(["spa", "title\x1fspa"]), boost=boosts),
    st.builds(WildcardQuery, pattern=st.sampled_from(["sp*k", "j?in"]), boost=boosts),
    st.builds(FuzzyQuery, term=words, fuzziness=st.sampled_from(["AUTO", "1", "2"]),
              prefix_length=st.integers(0, 2), boost=boosts),
    st.builds(IdsQuery, ids=st.tuples(st.integers(0, 99), st.integers(100, 199)),
              boost=boosts),
    st.builds(MatchAllQuery, boost=boosts),
    st.builds(KnnQuery, field=st.sampled_from(["embedding", "vec"]),
              query_vector=st.tuples(st.sampled_from([0.5, -0.25, 1.0]),
                                     st.sampled_from([0.0, 2.0])),
              k=st.integers(1, 5), num_candidates=st.integers(50, 100),
              similarity=st.one_of(st.none(), st.just(0.25)), boost=boosts),
    st.builds(MatchNoneQuery, boost=boosts),
    st.builds(SpanNearQuery, clauses=st.tuples(words, words), slop=st.integers(0, 3),
              in_order=st.booleans(), boost=boosts),
    st.builds(SpanFirstQuery, term=words, end=st.integers(1, 5), boost=boosts),
    st.builds(SpanOrQuery, clauses=st.tuples(words, words), boost=boosts),
    st.builds(SpanNotQuery, include=words, exclude=words, pre=st.integers(0, 2),
              post=st.integers(0, 2), boost=boosts),
    # per-function variants: only that function's parameters leave defaults
    # (the DSL carries exactly the active function's body)
    st.builds(RankFeatureQuery, field=st.just("pagerank"),
              function=st.just("saturation"), pivot=st.sampled_from([1.0, 5.0]),
              boost=boosts),
    st.builds(RankFeatureQuery, field=st.just("pagerank"), function=st.just("log"),
              scaling_factor=st.sampled_from([1.0, 2.0]), boost=boosts),
    st.builds(RankFeatureQuery, field=st.just("pagerank"), function=st.just("sigmoid"),
              pivot=st.sampled_from([1.0, 5.0]), exponent=st.sampled_from([1.0, 0.5]),
              boost=boosts),
    st.builds(DistanceFeatureQuery, field=st.just("warc_ts"),
              origin=st.integers(0, 100), pivot=st.integers(1, 10), boost=boosts),
    st.builds(TermsSetQuery, terms=st.tuples(words, words),
              minimum_should_match_field=st.just("required_matches"), boost=boosts),
    st.builds(IntervalsQuery,
              source=st.sampled_from([("match", "spark join", 1, True),
                                      ("match", "merge sort", -1, False),
                                      ("all_of", ("spark", "join"), 2, True)]),
              boost=st.just(1.0)),
    st.builds(MultiMatchQuery, text=words,
              fields=st.just((None, "title")),
              type=st.sampled_from(["best_fields", "most_fields", "phrase"]),
              tie_breaker=st.sampled_from([0.0, 0.3]), operator=ops,
              boosts=st.just(((None, 1.0), ("title", 2.0))), boost=boosts),
)


def compound(children):
    return st.one_of(
        st.builds(BoolQuery,
                  must=st.tuples(children), should=st.tuples(children),
                  filter=st.tuples(children), must_not=st.tuples(children),
                  minimum_should_match=st.one_of(st.none(), st.integers(1, 2)),
                  boost=boosts),
        st.builds(DisMaxQuery, queries=st.tuples(children, children),
                  tie_breaker=st.sampled_from([0.0, 0.5]), boost=boosts),
        st.builds(ConstantScoreQuery, filter=children, boost=boosts),
        st.builds(BoostingQuery, positive=children, negative=children,
                  negative_boost=st.sampled_from([0.2, 0.5])),
        st.builds(PinnedQuery, ids=st.tuples(st.integers(0, 9)), organic=children,
                  boost=boosts),
    )


trees = st.recursive(leaf, compound, max_leaves=6)


@settings(max_examples=300, deadline=None)
@given(trees)
def test_roundtrip(q):
    assert parse_dsl(to_dsl(q)) == q


@settings(max_examples=100, deadline=None)
@given(trees)
def test_roundtrip_twice_stable(q):
    d = to_dsl(q)
    assert to_dsl(parse_dsl(d)) == d
