"""Round-3 token filters (CommonAnalysisPlugin.java:226-335 absentees):
stemmer dispatch, stemmer_override, keyword_marker, elision, cjk_width,
word_delimiter_graph, kstem, common_grams, pattern_capture,
dictionary_decompounder, decimal_digit, apostrophe, limit, trim — plus the
custom-analyzer filter-chain assembly."""

import json

import pytest

from elasticsearch_ray.analysis import filters as F
from elasticsearch_ray.analysis.analyzers import get_analyzer


def run(fn, terms, **kw):
    t, p = fn(terms, list(range(len(terms))), **kw)
    return t


def test_stemmer_dispatch():
    assert run(F.stemmer, ["running"], language="english") == ["run"]
    assert run(F.stemmer, ["ragazzi"], language="light_italian") == ["ragazz"]
    assert run(F.stemmer, ["nações"], language="light_portuguese") == ["naca"]
    assert run(F.stemmer, ["jointures"], language="light_french") == ["jointur"]
    assert run(F.stemmer, ["запросы"], language="russian") == ["запрос"]
    with pytest.raises(ValueError):
        F.stemmer(["x"], [0], language="klingon")


def test_stemmer_override_protects():
    terms, pos = F.stemmer_override(["mice", "cats"], [0, 1], {"mice": "mouse"})
    terms, pos = F.stemmer(terms, pos, language="english")
    terms, pos = F.finish_keywords(terms, pos)
    assert terms == ["mouse", "cat"]


def test_stemmer_override_solr_syntax():
    terms, _ = F.stemmer_override(["mice", "feet"], [0, 1],
                                  ["mice, mouses => mouse", "feet => foot"])
    assert F.finish_keywords(terms, [0, 1])[0] == ["mouse", "foot"]


def test_keyword_marker():
    terms, pos = F.keyword_marker(["running", "walking"], [0, 1], {"running"})
    terms, pos = F.stemmer(terms, pos, language="english")
    assert F.finish_keywords(terms, pos)[0] == ["running", "walk"]


def test_elision_standalone():
    assert run(F.elision_filter, ["l'avion", "qu'elle", "autre"]) == [
        "avion", "elle", "autre"]


def test_cjk_width():
    assert run(F.cjk_width, ["Ｈｅｌｌｏ", "１２３"]) == ["Hello", "123"]
    assert run(F.cjk_width, ["ﾊﾞｲﾄ", "ｱｲｳ"]) == ["バイト", "アイウ"]
    assert run(F.cjk_width, ["ﾊﾟﾝ"]) == ["パン"]


def test_word_delimiter_graph_parts():
    assert run(F.word_delimiter_graph, ["PowerShot"]) == ["Power", "Shot"]
    assert run(F.word_delimiter_graph, ["Wi-Fi"]) == ["Wi", "Fi"]
    assert run(F.word_delimiter_graph, ["SD500"]) == ["SD", "500"]
    assert run(F.word_delimiter_graph, ["O'Neil's"]) == ["O", "Neil"]
    # same-position emission
    t, p = F.word_delimiter_graph(["PowerShot", "x"], [0, 1])
    assert p == [0, 0, 1]


def test_word_delimiter_graph_catenate():
    assert run(F.word_delimiter_graph, ["wi-fi"], catenate_words=True) == [
        "wi", "fi", "wifi"]
    assert run(F.word_delimiter_graph, ["500-42"], catenate_numbers=True) == [
        "500", "42", "50042"]
    assert run(F.word_delimiter_graph, ["wi-fi-4000"], catenate_all=True) == [
        "wi", "fi", "4000", "wifi4000"]
    assert run(F.word_delimiter_graph, ["wi-fi"], preserve_original=True) == [
        "wi-fi", "wi", "fi"]


def test_kstem_rules():
    assert run(F.kstem_filter, ["parties", "boxes", "churches", "cats"]) == [
        "party", "box", "church", "cat"]
    assert run(F.kstem_filter, ["stopped", "hoped", "tried"]) == [
        "stop", "hope", "try"]
    assert run(F.kstem_filter, ["running", "hoping", "dying"]) == [
        "run", "hope", "die"]
    # exceptions / guards
    assert run(F.kstem_filter, ["this", "news", "class"]) == [
        "this", "news", "class"]


def test_common_grams_index_and_query():
    t, p = F.common_grams(["the", "quick", "fox"], [0, 1, 2], {"the"})
    assert t == ["the", "the_quick", "quick", "fox"]
    assert p == [0, 0, 1, 2]
    t, p = F.common_grams(["the", "quick", "fox"], [0, 1, 2], {"the"},
                          query_mode=True)
    assert t == ["the_quick", "quick", "fox"]
    # position gap (stopword removed earlier) blocks the bigram
    t, _ = F.common_grams(["the", "fox"], [0, 2], {"the"})
    assert t == ["the", "fox"]


def test_pattern_capture():
    t, p = F.pattern_capture(["abc123def"], [0], [r"(\d+)"])
    assert t == ["abc123def", "123"]
    t, _ = F.pattern_capture(["foo@bar.com"], [0], [r"([^@]+)@(.+)"],
                             preserve_original=False)
    assert t == ["foo", "bar.com"]


def test_dictionary_decompounder():
    t, p = F.dictionary_decompounder(
        ["donaudampfschiff", "x"], [0, 1], ["dampf", "schiff", "donau"])
    assert t == ["donaudampfschiff", "dampf", "schiff", "donau", "x"]
    assert p == [0, 0, 0, 0, 1]


def test_decimal_digit_apostrophe_limit_trim():
    assert run(F.decimal_digit, ["٣٤٥", "a7"]) == ["345", "a7"]
    assert run(F.apostrophe_filter, ["istanbul'da", "plain"]) == [
        "istanbul", "plain"]
    t, p = F.limit_count(["a", "b", "c"], [0, 1, 2], max_token_count=2)
    assert t == ["a", "b"]
    assert run(F.trim_filter, [" x "]) == ["x"]


def test_custom_chain_assembly():
    cfg = json.dumps({"tokenizer": "standard", "filters": [
        "lowercase", ["stop", {"stopwords": ["the"]}],
        ["stemmer", {"language": "english"}]]}, sort_keys=True)
    an = get_analyzer("custom:" + cfg)
    terms, pos = an("The Running Dogs")
    assert terms == ["run", "dog"]
    assert pos == [1, 2]  # stopword position gap preserved


def test_custom_chain_wdg_then_lowercase():
    cfg = json.dumps({"tokenizer": "whitespace", "filters": [
        ["word_delimiter_graph", {"catenate_all": True}], "lowercase"]},
        sort_keys=True)
    an = get_analyzer("custom:" + cfg)
    assert an("PowerShot500-WiFi")[0] == [
        "power", "shot", "500", "wi", "fi", "powershot500wifi"]


def test_custom_chain_unknown_filter():
    cfg = json.dumps({"tokenizer": "standard", "filters": ["nope"]})
    with pytest.raises(ValueError):
        get_analyzer("custom:" + cfg)
