import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.tokenizer import standard_analyze, tokenize


@pytest.mark.parametrize(
    "inp,want",
    [
        (
            "The quick brown-fox can't jump 3.14 meters, right?",
            ["the", "quick", "brown", "fox", "can't", "jump", "3.14", "meters", "right"],
        ),
        ("john.doe@example.com", ["john.doe", "example.com"]),
        ("state-of-the-art", ["state", "of", "the", "art"]),
        ("1,000,000 items", ["1,000,000", "items"]),
        ("foo_bar baz_", ["foo_bar", "baz_"]),
        ("", []),
        ("a:b c;d", ["a:b", "c", "d"]),
    ],
)
def test_standard_analyze(inp, want):
    assert standard_analyze(inp) == want


def test_max_token_length_split():
    long = "x" * 600
    toks = tokenize(long)
    assert [len(t) for t in toks] == [255, 255, 90]


def test_stop_analyzer_position_gaps():
    terms, pos = get_analyzer("stop")("The quick and the dead")
    assert terms == ["quick", "dead"]
    assert pos == [1, 4]


def test_registry_analyzers():
    assert get_analyzer("whitespace")("A b")[0] == ["A", "b"]
    assert get_analyzer("simple")("ab3cd EF")[0] == ["ab", "cd", "ef"]
    assert get_analyzer("keyword")("One Two")[0] == ["One Two"]
    with pytest.raises(ValueError):
        get_analyzer("nope")
