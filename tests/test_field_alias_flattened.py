"""alias field type (FieldAliasMapper) + flattened field type
(x-pack FlattenedFieldMapper): resolution walks, leaf extraction,
keyed/root queries."""

import pandas as pd
import pytest
import ray

from elasticsearch_ray.ops.flattened import (
    flattened_filter,
    flattened_leaf_table,
    parse_flattened,
)
from elasticsearch_ray.search.field_alias import FieldAliases
from elasticsearch_ray.search.query import (
    BoolQuery,
    MatchQuery,
    TermFilter,
)


# ------------------------------------------------------------- aliases

def test_alias_resolves_leaf_and_nested_queries():
    al = FieldAliases({"language": "lang", "body": "text"})
    q = BoolQuery(must=(MatchQuery("hello", field="body"),),
                  filter=(TermFilter(column="language", value="en"),))
    r = al.resolve_query(q)
    assert r.must[0].field == "text"
    assert r.filter[0].column == "lang"
    # untouched tree returns structurally-equal results for other fields
    q2 = TermFilter(column="source", value="s")
    assert al.resolve_query(q2) is q2


def test_alias_validation_rejects_alias_chains_and_self():
    with pytest.raises(ValueError, match="another alias"):
        FieldAliases({"a": "b", "b": "c"})
    with pytest.raises(ValueError, match="itself"):
        FieldAliases({"a": "a"})


def test_alias_field_caps_mirror_target():
    al = FieldAliases({"language": "lang"})
    caps = al.field_caps_entries(
        {"lang": {"type": "keyword", "searchable": True}})
    assert caps == {"language": {"type": "keyword", "searchable": True}}
    # alias to an unmapped path surfaces nothing (reference hides it)
    assert FieldAliases({"x": "nope"}).field_caps_entries({}) == {}


# ----------------------------------------------------------- flattened

def test_parse_flattened_reference_shapes():
    got = parse_flattened(
        '{"a": {"b": 1}, "tags": ["x", "y"], "ok": true, "n": null, '
        '"f": 2.5}')
    assert ("a.b", "1") in got
    assert ("tags", "x") in got and ("tags", "y") in got
    assert ("ok", "true") in got
    assert ("f", "2.5") in got
    assert all(k != "n" for k, _v in got)  # null leaves skipped


def test_parse_flattened_depth_and_ignore_above():
    with pytest.raises(ValueError, match="depth"):
        parse_flattened('{"a": {"b": {"c": 1}}}', depth_limit=2)
    got = parse_flattened('{"a": "long-value", "b": "ok"}', ignore_above=2)
    assert got == [("b", "ok")]


def _docs():
    return pd.DataFrame({
        "id": [0, 1, 2, 3],
        "obj": ['{"k": 87, "tag": "red"}', '{"k": 12}',
                '{"tag": "redder", "extra": {"k": 87}}', None],
    })


def test_flattened_keyed_and_root_term():
    ds = ray.data.from_pandas(_docs()).repartition(2)
    keyed = sorted(r["id"] for r in
                   flattened_filter(ds, "obj", "87", key="k").take_all())
    assert keyed == [0]  # nested extra.k is the DIFFERENT key extra.k
    root = sorted(r["id"] for r in
                  flattened_filter(ds, "obj", "87").take_all())
    assert root == [0, 2]  # root form matches any leaf value


def test_flattened_prefix_exists_range():
    ds = ray.data.from_pandas(_docs())
    pre = sorted(r["id"] for r in
                 flattened_filter(ds, "obj", "red", key="tag",
                                  op="prefix").take_all())
    assert pre == [0, 2]
    ex = sorted(r["id"] for r in
                flattened_filter(ds, "obj", key="k", op="exists").take_all())
    assert ex == [0, 1]
    # lexicographic keyword range: "12" <= v <= "87" includes "87","12"
    rng = sorted(r["id"] for r in
                 flattened_filter(ds, "obj", "12", key="k", op="range",
                                  to="87").take_all())
    assert rng == [0, 1]


def test_flattened_leaf_table_matches_parse():
    ds = ray.data.from_pandas(_docs()).repartition(2)
    leaves = flattened_leaf_table(ds, "obj", "id").to_pandas()
    got = set(map(tuple, leaves[["id", "key", "value"]].to_numpy()))
    assert (0, "k", "87") in got
    assert (2, "extra.k", "87") in got
    assert not any(i == 3 for i, _k, _v in got)


def test_alias_resolves_multi_match_boosts():
    """Review r5 #6: field-KEYED boosts tuples must resolve with the
    fields or per-field boosts silently fall back to 1.0."""
    from elasticsearch_ray.search.query import MultiMatchQuery

    al = FieldAliases({"body": "text"})
    q = MultiMatchQuery(text="x", fields=("body", "title"),
                        boosts=(("body", 2.0), ("title", 1.5)))
    r = al.resolve_query(q)
    assert r.fields == ("text", "title")
    assert dict(r.boosts)["text"] == 2.0
    assert dict(r.boosts)["title"] == 1.5
