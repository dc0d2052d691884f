"""Language-analysis plugin analyzers (analysis/lang_plugins.py):
smartcn / kuromoji / nori / polish(stempel) / ukrainian — chain shape,
real sub-rules (katakana stemmer, josa strip, suffix stemmers) and
registry integration."""

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.lang_plugins import (
    kuromoji_stem,
    nori_strip_josa,
    polish_stem,
    ukrainian_stem,
)


def test_registry_names_resolve():
    for name in ("smartcn", "kuromoji", "nori", "polish", "ukrainian"):
        an = get_analyzer(name)
        assert an.name == name


def test_smartcn_han_bigrams_and_stop():
    an = get_analyzer("smartcn")
    terms, pos = an("我爱北京天安门 the data")
    # Han run bigrams minus the 我/的-style particles; English stops drop
    assert "北京" in "".join(terms) or "京天" in terms
    assert "the" not in terms
    assert "data" in terms
    # positions strictly increase
    assert pos == sorted(pos)


def test_kuromoji_katakana_stemmer_rule():
    # real JapaneseKatakanaStemFilter rule: trailing ー drops at len>=4
    assert kuromoji_stem("コンピューター") == "コンピューター"[:-1]
    assert kuromoji_stem("サー") == "サー"  # too short: kept
    an = get_analyzer("kuromoji")
    terms, _ = an("コンピューターで漢字のデータ")
    assert "コンピューター"[:-1] in terms  # stemmed katakana run
    assert "漢字" in terms  # han bigram
    assert "で" not in terms and "の" not in terms  # particles stopped
    assert "データ" in terms


def test_nori_josa_strip():
    assert nori_strip_josa("한국어를") == "한국어"
    assert nori_strip_josa("서울에서") == "서울"
    assert nori_strip_josa("는") == "는"  # bare particle: kept whole
    an = get_analyzer("nori")
    terms, _ = an("한국어를 Data 서울에서")
    assert terms == ["한국어", "data", "서울"]


def test_polish_light_stem():
    # declension endings strip to a shared stem
    assert polish_stem("domach") == polish_stem("domami") == "dom"
    assert polish_stem("kot") == "kot"  # too short to strip further
    an = get_analyzer("polish")
    terms, _ = an("W domach i domami nie ma kotów")
    assert "dom" in terms and terms.count("dom") == 2
    assert "i" not in terms and "nie" not in terms  # stopwords
    assert "kot" in terms  # kotów → kot


def test_ukrainian_light_stem():
    assert ukrainian_stem("книгами") == ukrainian_stem("книгах") \
        == "книг"
    an = get_analyzer("ukrainian")
    terms, _ = an("Це книгами та книгах для людей")
    assert terms.count("книг") == 2
    assert "та" not in terms and "для" not in terms
