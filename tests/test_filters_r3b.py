"""Round-3 batch-2 token filters — the remainder of the
CommonAnalysisPlugin.java:226-335 named surface: keep, keep_types,
keyword_repeat, remove_duplicates, delimited_payload, classic, snowball,
fingerprint, pattern_replace (token filter), predicate_token_filter,
flatten_graph, scandinavian folding/normalization, standalone
german/arabic normalization, multiplexer, condition,
hyphenation_decompounder fallback."""

import json

import pytest

from elasticsearch_ray.analysis import filters as F
from elasticsearch_ray.analysis.analyzers import get_analyzer


def run(fn, terms, **kw):
    t, _ = fn(terms, list(range(len(terms))), **kw)
    return t


def test_keep():
    t, p = F.keep_filter(["a", "b", "c", "b"], [0, 1, 2, 3], keep_words=["b"])
    assert t == ["b", "b"] and p == [1, 3]


def test_keep_types_include_num():
    t, _ = F.keep_types(["abc", "42", "3.14", "x9"], [0, 1, 2, 3], types=["<NUM>"])
    assert t == ["42", "3.14"]
    t, _ = F.keep_types(["abc", "42"], [0, 1], types=["<NUM>"], mode="exclude")
    assert t == ["abc"]


def test_keyword_repeat_then_stem_then_remove_duplicates():
    terms, pos = F.keyword_repeat(["running", "run"], [0, 1])
    terms, pos = F.stemmer(terms, pos, language="english")
    terms, pos = F.remove_duplicates(terms, pos)
    terms, pos = F.finish_keywords(terms, pos)
    # "running" stems to "run": keep both original and stem at pos 0;
    # "run" is a stemming no-op: the duplicate collapses
    assert list(zip(terms, pos)) == [("running", 0), ("run", 0), ("run", 1)]


def test_delimited_payload():
    assert run(F.delimited_payload, ["the|DT", "fox|NN", "plain"]) == [
        "the", "fox", "plain"]


def test_classic_filter():
    assert run(F.classic_filter, ["dogs's", "i.b.m.", "wash.", "it’s"]) == [
        "dogs", "ibm", "wash.", "it"]


def test_snowball_filter_dispatch():
    assert run(F.snowball_filter, ["running"], language="English") == ["run"]
    assert run(F.snowball_filter, ["запросы"], language="Russian") == ["запрос"]


def test_fingerprint_filter():
    t, p = F.fingerprint_filter(["b", "a", "b", "c"], [0, 1, 2, 3])
    assert (t, p) == (["a b c"], [0])
    assert F.fingerprint_filter(["x" * 300], [0]) == ([], [])


def test_pattern_replace_filter():
    assert run(F.pattern_replace_filter, ["foo-bar", "baz"],
               pattern="-", replacement="_") == ["foo_bar", "baz"]


def test_predicate_token_filter():
    t, p = F.predicate_token_filter(
        ["a", "abc", "abcd"], [0, 1, 2], script="len(term) > 2")
    assert t == ["abc", "abcd"] and p == [1, 2]


def test_flatten_graph_identity():
    assert F.flatten_graph(["a", "b"], [0, 0]) == (["a", "b"], [0, 0])


def test_scandinavian_folding_and_normalization():
    assert run(F.scandinavian_folding, ["räksmörgås", "bøf"]) == [
        "raksmorgas", "bof"]
    assert run(F.scandinavian_normalization, ["raaksmoergaas"]) == ["råksmørgås"]


def test_standalone_normalizations():
    assert run(F.german_normalization, ["weißbier"]) == ["weissbier"]
    # alef variants unify
    out = run(F.arabic_normalization, ["أحمد"])
    assert out[0].startswith("ا")


def test_custom_chain_multiplexer():
    cfg = {"tokenizer": "whitespace",
           "filters": [["multiplexer", {"filters": ["lowercase",
                                                    "lowercase, porter_stem"]}]]}
    an = get_analyzer("custom:" + json.dumps(cfg))
    terms, pos = an("Running")
    # original + lowercased + stemmed, stacked at position 0, deduped
    assert list(zip(terms, pos)) == [("Running", 0), ("running", 0), ("run", 0)]


def test_custom_chain_condition():
    cfg = {"tokenizer": "whitespace", "filters": [
        "lowercase",
        ["condition", {"filter": ["reverse"], "script": "len(term) < 5"}]]}
    an = get_analyzer("custom:" + json.dumps(cfg))
    terms, _ = an("What Flapdoodle")
    assert terms == ["tahw", "flapdoodle"]


def test_hyphenation_decompounder_fallback():
    cfg = {"tokenizer": "whitespace", "filters": [
        "lowercase",
        ["hyphenation_decompounder", {"word_list": ["kaffee", "tasse"]}]]}
    an = get_analyzer("custom:" + json.dumps(cfg))
    terms, pos = an("Kaffeetasse")
    assert "kaffee" in terms and "tasse" in terms


def test_keep_types_chain_roundtrip():
    cfg = {"tokenizer": "whitespace", "filters": [
        "lowercase", ["keep_types", {"types": ["<ALPHANUM>"]}]]}
    an = get_analyzer("custom:" + json.dumps(cfg))
    terms, _ = an("Alpha 42 beta")
    assert terms == ["alpha", "beta"]
