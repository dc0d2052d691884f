"""Composable index templates: pattern matching, priority, overlap
rejection, component merge order, simulate, spec building."""

import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.index.templates import (TemplateError,
                                               delete_index_template,
                                               find_template,
                                               put_component_template,
                                               put_index_template,
                                               simulate_index,
                                               spec_for_index)


@pytest.fixture()
def registry(tmp_path):
    reg = str(tmp_path / "templates")
    put_component_template(reg, "base", {"analyzer": "standard",
                                         "store_positions": True})
    put_component_template(reg, "logsish", {"analyzer": "simple",
                                            "doc_columns": ["lang"]})
    put_index_template(reg, "logs", ["logs-*"], priority=10,
                       composed_of=["base", "logsish"],
                       settings={"k1": 0.9})
    put_index_template(reg, "catchall", ["*"], priority=0)
    return reg


def test_find_highest_priority(registry):
    assert find_template(registry, "logs-2024") == "logs"
    assert find_template(registry, "web-corpus") == "catchall"


def test_component_merge_order_and_overlay(registry):
    sim = simulate_index(registry, "logs-app")
    assert sim["template"] == "logs"
    # logsish overrides base's analyzer; inline overlay wins last
    assert sim["settings"]["analyzer"] == "simple"
    assert sim["settings"]["store_positions"] is True
    assert sim["settings"]["k1"] == 0.9


def test_spec_for_index_and_request_overrides(registry):
    spec = spec_for_index(registry, "logs-app", b=0.6)
    assert isinstance(spec, IndexSpec)
    assert spec.analyzer == "simple" and spec.k1 == 0.9 and spec.b == 0.6
    assert spec.doc_columns == ("lang",)
    # no template settings at priority-0 catchall
    spec = spec_for_index(registry, "misc")
    assert spec.analyzer == "standard"  # IndexSpec default


def test_same_priority_overlap_rejected(registry):
    with pytest.raises(TemplateError, match="overlaps"):
        put_index_template(registry, "logs2", ["logs-app*"], priority=10)
    # different priority is fine
    put_index_template(registry, "logs2", ["logs-app*"], priority=20)
    assert find_template(registry, "logs-app-x") == "logs2"


def test_unknown_setting_and_missing_component(registry):
    with pytest.raises(TemplateError, match="unknown settings"):
        put_component_template(registry, "bad", {"nope": 1})
    with pytest.raises(TemplateError, match="missing component"):
        put_index_template(registry, "t", ["x-*"], composed_of=["ghost"])


def test_delete(registry):
    delete_index_template(registry, "catchall")
    assert find_template(registry, "web-corpus") is None
    with pytest.raises(TemplateError):
        delete_index_template(registry, "catchall")
