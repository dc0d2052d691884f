"""Token filters, english/fingerprint analyzers, Porter stemmer, rank-eval."""

import math

import pytest

from elasticsearch_ray.analysis import filters as F
from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.porter import stem


def test_porter_published_pairs():
    cases = {
        "caresses": "caress", "ponies": "poni", "relational": "relat",
        "conditional": "condit", "rational": "ration", "operator": "oper",
        "feudalism": "feudal", "adjustable": "adjust", "replacement": "replac",
        "adoption": "adopt", "triplicate": "triplic", "electriciti": "electr",
        "hopping": "hop", "filing": "file", "sky": "sky",
    }
    for w, want in cases.items():
        assert stem(w) == want, (w, stem(w), want)


def test_english_analyzer():
    terms, pos = get_analyzer("english")("The runner's shoes are running quickly")
    assert terms == ["runner", "shoe", "run", "quickli"]
    # positions keep stopword gaps: runner's=1, shoes=2, are(stop)=3, running=4
    assert pos == [1, 2, 4, 5]


def test_fingerprint_analyzer():
    terms, _ = get_analyzer("fingerprint")("B a c a B")
    assert terms == ["a b c"]


def test_filters():
    assert F.asciifolding(["café", "naïve"], [0, 1])[0] == ["cafe", "naive"]
    assert F.edge_ngram(["spark"], [0], 2, 3) == (["sp", "spa"], [0, 0])
    assert F.ngram(["ab"], [0], 1, 2) == (["a", "b", "ab"], [0, 0, 0])
    assert F.shingle(["a", "b", "c"], [0, 1, 2]) == (["a b", "b c"], [0, 1])
    assert F.unique_filter(["x", "y", "x"], [0, 1, 2]) == (["x", "y"], [0, 1])
    assert F.english_possessive(["runner's"], [0])[0] == ["runner"]
    assert F.length_filter(["a", "abc", "abcdef"], [0, 1, 2], 2, 4) == (["abc"], [1])
    assert F.truncate(["abcdef"], [0], 3)[0] == ["abc"]
    assert F.reverse_filter(["abc"], [0])[0] == ["cba"]


def test_rank_eval():
    from elasticsearch_ray.search.rank_eval import (
        dcg_at_k,
        err_at_k,
        mean_reciprocal_rank,
        precision_at_k,
        rank_eval,
        recall_at_k,
    )

    ranked = [1, 2, 3, 4, 5]
    rel = {2, 4, 9}
    assert precision_at_k(ranked, rel, 4) == 0.5
    assert recall_at_k(ranked, rel, 5) == 2 / 3
    assert mean_reciprocal_rank(ranked, rel) == 0.5
    grades = {1: 3, 2: 2, 3: 3, 4: 0, 5: 1}
    # DCG@5 hand-computed: (2^3-1)/log2(2) + (2^2-1)/log2(3) + 7/log2(4) + 0 + 1/log2(6)
    want = 7 / 1 + 3 / math.log2(3) + 7 / 2 + 0 + 1 / math.log2(6)
    assert abs(dcg_at_k(ranked, grades, 5) - want) < 1e-12
    assert 0 < err_at_k(ranked, grades, 5) <= 1
    out = rank_eval([{"ranked": ranked, "relevant": rel}], metric="precision", k=4)
    assert out["metric_score"] == 0.5


def test_synonym_and_minhash_filters():
    t, p = F.synonym(["fast", "dog"], [0, 1], {"fast": ["quick", "rapid"]})
    assert t == ["fast", "quick", "rapid", "dog"]
    assert p == [0, 0, 0, 1]  # same-position synonyms keep phrases working

    a, _ = F.min_hash(["a", "b", "c"], [0, 1, 2], num_hashes=8)
    b, _ = F.min_hash(["c", "b", "a", "a"], [0, 1, 2, 3], num_hashes=8)
    assert a == b  # signature is set-based and order-insensitive
    c, _ = F.min_hash(["x", "y", "z"], [0, 1, 2], num_hashes=8)
    assert a != c
    assert len(a) == 8 and all(tok.startswith("mh") for tok in a)


def test_extra_tokenizers():
    """uax_url_email / pattern / char_group / ngram tokenizer /
    path_hierarchy (CommonAnalysisPlugin.java:349-402)."""
    from elasticsearch_ray.analysis.analyzers import get_analyzer

    t, _ = get_analyzer("uax_url_email")("See https://Example.com/a?b=1 or Bob@Test.ORG now")
    assert t == ["see", "https://example.com/a?b=1", "or", "bob@test.org", "now"]
    assert get_analyzer("pattern")("Foo-Bar baz_7")[0] == ["foo", "bar", "baz_7"]
    assert get_analyzer("char_group")("a,b c'd")[0] == ["a", "b", "c", "d"]
    terms, pos = get_analyzer("ngram_tokenizer")("abcd")
    assert terms == ["ab", "abc", "bc", "bcd", "cd"] and pos == [0, 0, 1, 1, 2]
    assert get_analyzer("path_hierarchy")("/usr/local/bin")[0] == [
        "/usr", "/usr/local", "/usr/local/bin"]
    assert get_analyzer("path_hierarchy")("a/b")[0] == ["a", "a/b"]
    assert get_analyzer("path_hierarchy")("")[0] == []


def test_synonym_graph_expansion_shapes():
    from elasticsearch_ray.analysis.synonyms import synonym_graph_expand
    from elasticsearch_ray.search.query import (
        BoolQuery, DisMaxQuery, MatchPhraseQuery, TermQuery,
    )

    # equivalence group with a multi-token variant
    q = synonym_graph_expand("visit ny today", ["ny, new york"])
    assert isinstance(q, BoolQuery) and len(q.must) == 3
    dm = q.must[1]
    assert isinstance(dm, DisMaxQuery)
    kinds = {type(b) for b in dm.queries}
    assert kinds == {TermQuery, MatchPhraseQuery}
    # the multi-token SOURCE side also matches ("new york" in the query)
    q2 = synonym_graph_expand("new york pizza", ["ny, new york"])
    assert isinstance(q2.must[0], DisMaxQuery) and isinstance(q2.must[1], TermQuery)
    # directed rule: lhs replaced, not kept
    q3 = synonym_graph_expand("sata drive", ["sata => serial ata"])
    assert isinstance(q3.must[0], MatchPhraseQuery)
    assert q3.must[0].text == "serial ata"
