"""_scripts/painless/_execute API (PainlessExecuteAction contexts)."""

import pytest

from elasticsearch_ray.search.painless import PainlessError
from elasticsearch_ray.search.painless_execute import painless_execute


def test_painless_test_default_context_stringifies():
    # Objects.toString(...) rendering: the reference doc example
    out = painless_execute({
        "source": "params.count / params.total",
        "params": {"count": 100.0, "total": 1000.0}})
    assert out == {"result": "0.1"}
    assert painless_execute("return null;") == {"result": "null"}
    assert painless_execute("return 1 + 1;") == {"result": "2"}
    assert painless_execute("return true;") == {"result": "true"}


def test_filter_context():
    setup = {"document": {"field": "four"}}
    out = painless_execute(
        {"source": "doc['field'].value == params.v",
         "params": {"v": "four"}},
        context="filter", context_setup=setup)
    assert out == {"result": True}
    out2 = painless_execute(
        {"source": "doc['field'].value == 'five'"},
        context="filter", context_setup=setup)
    assert out2 == {"result": False}
    with pytest.raises(PainlessError, match="boolean"):
        painless_execute("return 1;", context="filter",
                         context_setup=setup)
    with pytest.raises(ValueError, match="context_setup.document"):
        painless_execute("return true;", context="filter")


def test_score_context_with_score():
    setup = {"document": {"rank": 4.0}, "_score": 2.0}
    out = painless_execute(
        {"source": "doc['rank'].value * _score * params.m",
         "params": {"m": 3.0}},
        context="score", context_setup=setup)
    assert out == {"result": 24.0}


def test_long_and_keyword_field_contexts():
    setup = {"document": {"n": 7}}
    out = painless_execute("emit(doc['n'].value * 2); emit(100);",
                           context="long_field", context_setup=setup)
    assert out == {"result": [14, 100]}
    out2 = painless_execute(
        "emit(doc['n'].value + '-suffix');",
        context="keyword_field",
        context_setup={"document": {"n": "id"}})
    assert out2 == {"result": ["id-suffix"]}


def test_date_field_formats_epoch_millis():
    out = painless_execute(
        "emit(1577836800000L);", context="date_field",
        context_setup={"document": {}})
    assert out == {"result": ["2020-01-01T00:00:00.000Z"]}


def test_boolean_and_double_field():
    setup = {"document": {"x": 3}}
    assert painless_execute("emit(doc['x'].value > 2);",
                            context="boolean_field",
                            context_setup=setup) == {"result": [True]}
    assert painless_execute("emit(doc['x'].value / 2.0);",
                            context="double_field",
                            context_setup=setup) == {"result": [1.5]}


def test_unknown_context_rejected():
    with pytest.raises(ValueError, match="unsupported context"):
        painless_execute("return 1;", context="geo_point_field")
