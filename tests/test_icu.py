"""analysis-icu plugin analogs (analysis/icu.py): normalizer forms,
UTR#30 folding with UnicodeSet exceptions, transform id chains,
collation sort keys (strength/numeric/case_first), and the analyzer
registry/custom-chain integration."""

import pytest

from elasticsearch_ray.analysis.icu import (
    UnicodeSet,
    icu_collation_key,
    icu_fold,
    icu_fold_keep_case,
    icu_normalize,
    icu_transform,
    nfkc_cf,
    sort_key_hex,
)


def test_normalizer_forms():
    # composed vs decomposed é
    e_dec = "é"
    assert icu_normalize(e_dec, "nfc") == "é"
    assert icu_normalize("é", "nfd") == e_dec
    # compatibility: ﬁ ligature, full-width, superscript
    assert icu_normalize("ﬁ", "nfkc") == "fi"
    assert icu_normalize("ＨＩ", "nfkc") == "HI"
    # nfkc_cf: casefold + compatibility + default-ignorable removal
    assert nfkc_cf("Ｈｅｌｌｏ­World​") == "helloworld"
    assert nfkc_cf("Straße") == "strasse"
    # decompose mode maps nfc→nfd
    assert icu_normalize("é", "nfc", mode="decompose") == e_dec
    with pytest.raises(ValueError, match="icu_normalizer name"):
        icu_normalize("x", "bogus")


def test_folding():
    assert icu_fold("Café Über ŁÓDŹ") == "cafe uber lodz"
    assert icu_fold("Ærøskøbing") == "aeroskobing"
    assert icu_fold("ﬁve Straße") == "five strasse"
    # width folding
    assert icu_fold("ＡＢＣ") == "abc"


def test_unicode_set_filter_swedish_example():
    # the plugin docs' Swedish exception set: å ä ö keep their identity
    keep = "[^åäöÅÄÖ]"
    # excluded chars pass through UNFOLDED (Å keeps its accent AND case)
    assert icu_fold("Ångström", keep) == "Ångström"
    out = icu_fold("Råbäck Café", keep)
    assert out == "råbäck cafe"  # å ä untouched, é folded, case folded
    s = UnicodeSet("[a-cx]")
    assert "b" in s and "x" in s and "d" not in s
    neg = UnicodeSet("[^a-c]")
    assert "d" in neg and "b" not in neg
    with pytest.raises(ValueError, match="bad UnicodeSet"):
        UnicodeSet("abc")


def test_transform_chains():
    assert icu_transform("Färöer", "Any-Lower") == "färöer"
    assert icu_transform("Färöer", "NFD; [:Nonspacing Mark:] Remove; NFC") \
        == "Faroer"
    assert icu_transform("Łódź über", "Latin-ASCII") == "Lodz uber"
    assert icu_transform("Grüße", "de-ASCII") == "Gruesse"
    assert icu_fold_keep_case("Łódź") == "Lodz"  # case preserved
    with pytest.raises(ValueError, match="outside the supported subset"):
        icu_transform("x", "Any-Latin")


def test_collation_strengths():
    # primary: accents and case invisible
    k = lambda s, **kw: icu_collation_key(s, **kw)
    assert k("cote", strength="primary") == k("Côté", strength="primary")
    # secondary: accents differ, case still invisible
    assert k("cote", strength="secondary") != k("côté", strength="secondary")
    assert k("Cote", strength="secondary") == k("cote", strength="secondary")
    # tertiary: case differs
    assert k("Cote") != k("cote")
    # primary differences dominate any secondary/tertiary difference
    assert sorted(["zebra", "Apple"], key=lambda s: k(s)) \
        == ["Apple", "zebra"]
    # accent difference only matters after all primary bytes:
    order = sorted(["cotz", "côta"], key=lambda s: k(s, strength="secondary"))
    assert order == ["côta", "cotz"]  # a < z at primary level wins


def test_collation_numeric_and_case_first():
    k = icu_collation_key
    xs = ["item10", "item2", "item1"]
    assert sorted(xs, key=lambda s: k(s, numeric=True)) \
        == ["item1", "item2", "item10"]
    assert sorted(xs, key=lambda s: k(s)) == ["item1", "item10", "item2"]
    # case_first=upper puts the uppercase variant before lowercase
    assert sorted(["a", "A"], key=lambda s: k(s, case_first="upper")) \
        == ["A", "a"]
    assert sorted(["a", "A"], key=lambda s: k(s)) == ["a", "A"]
    # identical strength appends the raw string
    assert k("x", strength="identical") != k("x", strength="tertiary")
    with pytest.raises(ValueError, match="unknown strength"):
        k("x", strength="max")
    assert isinstance(sort_key_hex("abc"), str)


def test_registry_and_custom_chain():
    from elasticsearch_ray.analysis.analyzers import (
        CustomChainAnalyzer,
        _filter_registry,
    )
    from elasticsearch_ray.analysis.tokenizers_extra import (
        TOKENIZER_REGISTRY,
    )

    reg = _filter_registry()
    for name in ("icu_folding", "icu_normalizer", "icu_transform",
                 "icu_collation"):
        assert name in reg
    assert "icu_tokenizer" in TOKENIZER_REGISTRY

    an = CustomChainAnalyzer("icu_tokenizer", [], ["icu_folding"])
    terms, _pos = an("Über die Brücke, señor!")
    assert terms == ["uber", "die", "brucke", "senor"]

    # folding with the Swedish exception set through the chain params
    an2 = CustomChainAnalyzer(
        "icu_tokenizer", [],
        [("icu_folding", {"unicode_set_filter": "[^åäöÅÄÖ]"})])
    terms2, _ = an2("Åke Café")
    assert terms2 == ["Åke", "cafe"]  # excluded Å passes through as-is

    # transform filter with an id param
    an3 = CustomChainAnalyzer(
        "whitespace", [], [("icu_transform", {"id": "Latin-ASCII"})])
    assert an3("Łódź")[0] == ["Lodz"]

    # collation filter emits hex sort keys
    an4 = CustomChainAnalyzer(
        "whitespace", [], [("icu_collation", {"strength": "primary"})])
    k1 = an4("Côté")[0][0]
    k2 = an4("cote")[0][0]
    assert k1 == k2 and all(c in "0123456789abcdef" for c in k1)


def test_icu_normalizer_char_filter():
    from elasticsearch_ray.analysis.char_filters import make_char_filter

    cf = make_char_filter("icu_normalizer", ["nfkc_cf"])
    assert cf("Ｈｅｌｌｏ Straße") == "hello strasse"
    cf2 = make_char_filter("icu_normalizer", ["nfc", "decompose"])
    assert cf2("é") == "é"
    with pytest.raises(ValueError, match="icu_normalizer name"):
        make_char_filter("icu_normalizer", ["bogus"])
