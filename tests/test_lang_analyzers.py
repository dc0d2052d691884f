"""Golden token fixtures for the language analyzer chains
(CommonAnalysisPlugin.java:179-219 surface). fr/de/es use the light-stemmer
family (Savoy SAC'06 / JASIS'99) — which is what Lucene's analyzers for those
languages actually run; russian uses the Snowball stemmer (Lucene
RussianAnalyzer parity, see analysis/snowball_ru.py)."""

import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer

GOLDEN = {
    "french": [
        ("l'étincelle des jointures rapides", (["étincel", "jointur", "rapid"], [0, 2, 3])),
        ("qu'elle analyse aux chevaux", (["analys", "cheval"], [1, 3])),
        # elision with the typographic apostrophe too
        ("d’analyse", (["analys"], [0])),
    ],
    "german": [
        ("die Zusammenführung großer Bäume", (["zusammenfuhrung", "gross", "baum"], [1, 2, 3])),
        ("Abfragen und Fenster", (["abfrag", "fenst"], [0, 2])),
    ],
    "spanish": [
        ("las consultas rápidas", (["consult", "rapid"], [1, 2])),
        ("los resultados únicos", (["resultad", "unic"], [1, 2])),
    ],
    "russian": [
        # snowball russian (Lucene RussianAnalyzer parity): данных → дан
        # (adjective ых; нн-participle blocked by the RV limit; step-4 undouble)
        ("быстрые запросы", (["быстр", "запрос"], [0, 1])),
        ("окна данных", (["окн", "дан"], [0, 1])),
    ],
    "cjk": [
        ("分布式搜索", (["分布", "布式", "式搜", "搜索"], [0, 1, 2, 3])),
        ("big 数据 x", (["big", "数据", "x"], [0, 1, 2])),
        ("王", (["王"], [0])),
    ],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_golden_tokens(lang):
    an = get_analyzer(lang)
    for text, want in GOLDEN[lang]:
        assert an(text) == want, (lang, text)


@pytest.mark.parametrize(
    "lang,a,b",
    [
        ("french", "jointure", "jointures"),
        ("french", "fenêtre", "fenêtres"),
        ("german", "Baum", "Bäume"),
        ("german", "Abfrage", "Abfragen"),
        ("spanish", "consulta", "consultas"),
        ("spanish", "resultado", "resultados"),
        ("russian", "запрос", "запросы"),
        ("russian", "окно", "окна"),
    ],
)
def test_inflections_conflate(lang, a, b):
    an = get_analyzer(lang)
    assert an(a)[0] == an(b)[0] != []


def test_cjk_bigram_query_matches_run():
    an = get_analyzer("cjk")
    doc_terms = set(an("分布式搜索引擎")[0])
    assert set(an("搜索")[0]) <= doc_terms  # bigram query hits the long run
