"""Round-3 batch 3: the remaining CommonAnalysisPlugin named token filters
(language stems exposed under registry names, Indic/Persian/Serbian
normalizers, cjk_bigram) + a completeness meta-test of the registry against
the reference's full filter list (CommonAnalysisPlugin.java:226-335)."""

import pytest

from elasticsearch_ray.analysis import filters as F
from elasticsearch_ray.analysis.analyzers import _filter_registry


def _one(fn, term, **kw):
    ts, _ = fn([term], [0], **kw)
    return ts


def test_named_language_stems():
    assert _one(F.french_stem, "chevaux") == ["cheval"]
    assert _one(F.german_stem, "häusern")[0].startswith("haus")
    assert _one(F.dutch_stem, "huizen")[0].startswith("hui")
    assert _one(F.russian_stem, "книгами") == ["книг"]
    assert _one(F.arabic_stem, "الكتاب")[0] != "الكتاب"  # article stripped
    assert _one(F.brazilian_stem, "livros")[0].startswith("livr")
    assert _one(F.czech_stem, "knihami")[0].startswith("knih")


def test_cjk_bigram_runs():
    # standard tokenizer emits one token per Han char at consecutive pos
    terms, pos = F.cjk_bigram(list("中文搜索"), [0, 1, 2, 3])
    assert terms == ["中文", "文搜", "搜索"] and pos == [0, 1, 2]
    # isolated ideograph stays a unigram; Latin tokens pass through
    terms, pos = F.cjk_bigram(["data", "中", "base"], [0, 1, 2])
    assert terms == ["data", "中", "base"]
    # non-consecutive positions break the run
    terms, _ = F.cjk_bigram(["中", "文"], [0, 5])
    assert terms == ["中", "文"]
    # output_unigrams keeps both granularities
    terms, _ = F.cjk_bigram(list("中文"), [0, 1], output_unigrams=True)
    assert terms == ["中", "中文", "文"]


def test_indic_persian_serbian_normalizers():
    assert _one(F.persian_normalization, "كتابي") == ["کتابی"]  # kaf + yeh
    assert _one(F.serbian_normalization, "џеп") == ["dzep"]
    assert _one(F.serbian_normalization, "ђак") == ["djak"]
    assert _one(F.serbian_normalization, "čžš") == ["czs"]
    assert _one(F.hindi_normalization, "क़िला") == ["किला"]  # nukta form
    assert _one(F.hindi_normalization, "चाँद") == ["चांद"]  # chandrabindu
    assert _one(F.bengali_normalization, "বড়") == ["বড"]
    assert _one(F.indic_normalization, "क़िला") == ["किला"]


SURVEY_FILTER_LIST = """apostrophe arabic_normalization arabic_stem
asciifolding bengali_normalization brazilian_stem cjk_bigram cjk_width
classic common_grams czech_stem decimal_digit delimited_payload
dictionary_decompounder dutch_stem edge_ngram elision fingerprint
flatten_graph french_stem german_normalization german_stem
hindi_normalization hyphenation_decompounder indic_normalization keep
keep_types keyword_marker kstem length limit lowercase min_hash multiplexer
ngram pattern_capture pattern_replace persian_normalization porter_stem
predicate_token_filter remove_duplicates reverse russian_stem
scandinavian_folding scandinavian_normalization serbian_normalization
snowball stemmer stemmer_override synonym synonym_graph trim truncate
unique uppercase word_delimiter word_delimiter_graph""".split()


def test_registry_covers_survey_filter_list():
    """Every named token filter in the reference registry list (SURVEY §2.3,
    CommonAnalysisPlugin.java:226-335) resolves in our custom-chain
    registry."""
    reg = _filter_registry()
    missing = [n for n in SURVEY_FILTER_LIST if n not in reg]
    assert not missing, missing


def test_batch3_filters_through_custom_chain():
    from elasticsearch_ray.analysis.analyzers import CustomChainAnalyzer

    an = CustomChainAnalyzer("standard", [], ["lowercase", "cjk_bigram"])
    terms, _ = an("中文 data")
    assert terms == ["中文", "data"]
    an2 = CustomChainAnalyzer("standard", [], ["lowercase", "serbian_normalization"])
    assert an2("Џеп")[0] == ["dzep"]


SURVEY_TOKENIZER_LIST = """simple_pattern simple_pattern_split thai ngram
edge_ngram char_group classic letter lowercase path_hierarchy pattern
uax_url_email whitespace keyword standard""".split()


def test_tokenizer_registry_covers_survey_list():
    """Every tokenizer in the reference's getTokenizers list (SURVEY §2.3,
    CommonAnalysisPlugin.java:349-402 + core standard) resolves in
    TOKENIZER_REGISTRY."""
    from elasticsearch_ray.analysis.tokenizers_extra import TOKENIZER_REGISTRY

    missing = [n for n in SURVEY_TOKENIZER_LIST if n not in TOKENIZER_REGISTRY]
    assert not missing, missing


def test_new_named_tokenizers():
    from elasticsearch_ray.analysis.tokenizers_extra import TOKENIZER_REGISTRY as R

    assert R["classic"]("mail bob@ex.com at U.S.A. pays 3,000") == [
        "mail", "bob@ex.com", "at", "U.S.A", "pays", "3,000"]
    assert R["simple_pattern"]("ab-cd 12", pattern="[a-z]+") == ["ab", "cd"]
    assert R["simple_pattern_split"]("a-b c", pattern="-") == ["a", "b c"]
    assert R["lowercase"]("Foo BAR9") == ["foo", "bar"]
    assert R["edge_ngram"]("spark", min_gram=2, max_gram=3) == ["sp", "spa"]
    assert R["thai"]("การทดสอบ fun")[-1] == "fun"


def test_custom_chain_with_registry_tokenizers():
    from elasticsearch_ray.analysis.analyzers import CustomChainAnalyzer

    an = CustomChainAnalyzer("classic", [], ["lowercase"])
    assert an("Bob@Ex.com rocks")[0] == ["bob@ex.com", "rocks"]
    an2 = CustomChainAnalyzer(("simple_pattern", {"pattern": "[0-9]+"}), [], [])
    assert an2("a1b22c333")[0] == ["1", "22", "333"]
    with pytest.raises(ValueError):
        CustomChainAnalyzer("nope", [], [])("x")


def test_snowball_analyzer():
    from elasticsearch_ray.analysis.analyzers import SnowballAnalyzer, get_analyzer

    assert get_analyzer("snowball")("The running dogs jumped")[0] == [
        "run", "dog", "jump"]
    assert SnowballAnalyzer("Russian")("книгами")[0] == ["книг"]
    assert SnowballAnalyzer("French")("chevaux")[0] == ["cheval"]


SURVEY_PROCESSOR_LIST = """date set append rename remove split join uppercase
lowercase trim convert gsub fail foreach date_index_name sort grok script
dot_expander json kv urldecode bytes pipeline dissect drop html_strip csv
uri_parts network_direction community_id fingerprint registered_domain""".split()


def test_processor_registry_covers_survey_list():
    """Every ingest processor named in the reference registry (SURVEY §2.2,
    IngestCommonPlugin.java:57-89) resolves in ops/processors."""
    from elasticsearch_ray.ops.processors import _REGISTRY

    missing = [n for n in SURVEY_PROCESSOR_LIST if n not in _REGISTRY]
    assert not missing, missing
