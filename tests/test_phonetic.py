"""analysis-phonetic plugin (PhoneticTokenFilterFactory wrapping the
commons-codec encoder family — implemented here from the published
algorithms): soundex, refined_soundex, metaphone, nysiis, caverphone2,
cologne; replace=false increment-0 twins."""

import pytest

from elasticsearch_ray.analysis.phonetic import (
    caverphone2,
    cologne,
    metaphone,
    nysiis,
    phonetic_filter,
    refined_soundex,
    soundex,
)


def test_soundex_nara_goldens():
    for w, want in [("Robert", "R163"), ("Rupert", "R163"),
                    ("Ashcraft", "A261"), ("Tymczak", "T522"),
                    ("Pfister", "P236"), ("Honeyman", "H555"),
                    ("Washington", "W252"), ("Lee", "L000"),
                    ("Jackson", "J250"), ("Gutierrez", "G362")]:
        assert soundex(w) == want, w
    assert soundex("") == "" and soundex("123") == ""


def test_refined_soundex():
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("quick") == "Q503"


def test_metaphone_javadoc_sentence():
    sent = "The quick brown fox jumped over the lazy dogs".split()
    want = ["0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS", "TKS"]
    assert [metaphone(w) for w in sent] == want
    # initial-pair exceptions + digraphs
    assert metaphone("Knight") == "NT"
    assert metaphone("school") == "SKL"
    assert metaphone("phone") == "FN"
    assert metaphone("Xavier")[0] == "S"


def test_nysiis():
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("MITCHELL") == "MATCAL"
    assert nysiis("BROWN") == "BRAN"
    # head/tail transcodes fire
    assert nysiis("MACINTOSH").startswith("MC")
    assert not nysiis("JONES").endswith("S")  # trailing S stripped


def test_caverphone2():
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Peter") == "PTA1111111"
    assert len(caverphone2("x")) == 10
    # v/ph neutralization: Stevenson and Stephenson collide
    assert caverphone2("Stevenson") == caverphone2("Stephenson")


def test_cologne():
    assert cologne("Wikipedia") == "3412"
    assert cologne("Breschnew") == "17863"
    assert cologne("Müller-Lüdenscheidt") == "65752682"
    # Meyer / Meier collide (the algorithm's showcase property)
    assert cologne("Meyer") == cologne("Meier")


def test_phonetic_filter_replace_modes():
    t, p = phonetic_filter(["Robert", "Rupert"], [0, 1],
                           encoder="soundex")
    assert t == ["R163", "R163"] and p == [0, 1]
    t, p = phonetic_filter(["Robert"], [3], encoder="soundex",
                           replace=False)
    assert t == ["Robert", "R163"] and p == [3, 3]  # increment-0 twin
    with pytest.raises(NotImplementedError, match="double_metaphone"):
        phonetic_filter(["x"], [0], encoder="double_metaphone")
    with pytest.raises(ValueError, match="unknown phonetic"):
        phonetic_filter(["x"], [0], encoder="sonic")


def test_registry_chain_integration():
    from elasticsearch_ray.analysis.analyzers import CustomChainAnalyzer

    an = CustomChainAnalyzer("standard", [],
                             [("phonetic", {"encoder": "soundex"})])
    terms, pos = an("Robert Rupert")
    assert terms == ["R163", "R163"]
    # the default encoder is metaphone (factory default)
    an2 = CustomChainAnalyzer("standard", [], ["phonetic"])
    assert an2("dogs")[0] == ["TKS"]
