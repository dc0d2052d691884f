"""Snowball Russian stemmer — vectors hand-traced through the published
algorithm (snowballstem.org/algorithms/russian/stemmer.html), the stemmer
Lucene's RussianAnalyzer runs (SnowballFilter(RussianStemmer))."""

import pytest

from elasticsearch_ray.analysis.snowball_ru import stem

VECTORS = [
    # nouns
    ("книгами", "книг"),      # noun ами
    ("запросы", "запрос"),    # noun ы
    ("запрос", "запрос"),
    ("окна", "окн"),          # noun а
    ("окно", "окн"),
    ("лошадь", "лошад"),      # noun ь
    ("ость", "ост"),          # noun ь wins before derivational is reachable
    # adjectives / participles
    ("красивый", "красив"),   # adjective ый
    ("быстрые", "быстр"),     # adjective ые
    ("важное", "важн"),       # adjective ое
    ("данных", "дан"),        # ых; participle нн blocked (а outside RV), step-4 undouble
    ("бегавшая", "бега"),     # ая + participle вш (preceded by а)
    ("величайший", "величайш"),  # ий; 'айш' is NOT the ейш superlative
    ("новейший", "нов"),      # ий + superlative ейш
    # verbs / gerunds / reflexives
    ("читала", "чита"),       # verb ла (group 1, preceded by а)
    ("делающий", "дела"),     # ий + participle ющ (preceded by а)
    ("делающимися", "дела"),  # reflexive ся + ими + ющ
    ("почувствовав", "почувствова"),  # perfective gerund в (preceded by а)
    # ё normalization + guards
    ("пёс", "пес"),
    ("и", "и"),
    ("", ""),
    ("стол", "стол"),
]


@pytest.mark.parametrize("word,want", VECTORS)
def test_snowball_vectors(word, want):
    assert stem(word) == want


def test_analyzer_uses_snowball():
    from elasticsearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("russian")
    assert an("быстрые запросы") == (["быстр", "запрос"], [0, 1])
    assert an("окна данных") == (["окн", "дан"], [0, 1])
    # light variant stays available as its own chain
    light = get_analyzer("russian_light")
    assert light("окна данных") == (["окн", "данн"], [0, 1])
