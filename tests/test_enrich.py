"""enrich ingest processor (x-pack/plugin/enrich — EnrichProcessorFactory /
MatchProcessor): policy execution + broadcast lookup join semantics."""

import pandas as pd
import pytest

from elasticsearch_ray.ops.processors import (
    EnrichProcessor,
    Pipeline,
    execute_enrich_policy,
)

POLICY = pd.DataFrame({
    "uid": [1, 2, 2, 3],
    "name": ["alice", "bob", "bob2", "carol"],
    "tier": ["gold", "silver", "bronze", "gold"],
})


def test_enrich_single_match_flattened_columns():
    p = EnrichProcessor("user", POLICY, target_field="u")
    df = pd.DataFrame({"user": [3, 1, 99, 2]})
    out = p(df)
    assert out["u.name"].tolist() == ["carol", "alice", None, "bob"]
    assert out["u.tier"].tolist() == ["gold", "gold", None, "silver"]


def test_enrich_max_matches_list_of_dicts_capped():
    p = EnrichProcessor("user", POLICY, target_field="u", max_matches=2)
    df = pd.DataFrame({"user": [2, 99]})
    out = p(df)
    assert out["u"].iloc[0] == [
        {"name": "bob", "tier": "silver"},
        {"name": "bob2", "tier": "bronze"},
    ]
    assert out["u"].iloc[1] == []


def test_enrich_override_false_keeps_existing():
    p = EnrichProcessor("user", POLICY, target_field="u", override=False)
    df = pd.DataFrame({"user": [1, 2], "u.name": ["KEEP", None]})
    out = p(df)
    assert out["u.name"].tolist() == ["KEEP", "bob"]


def test_enrich_max_matches_bounds():
    with pytest.raises(ValueError):
        EnrichProcessor("user", POLICY, max_matches=0)
    with pytest.raises(ValueError):
        EnrichProcessor("user", POLICY, max_matches=129)


def test_execute_policy_from_dataset_and_pipeline_spec(ray_session):
    import ray.data as rd

    src = rd.from_pandas(POLICY)
    pol = execute_enrich_policy(src, "uid", ["name"])
    assert list(pol.columns) == ["uid", "name"]
    pipe = Pipeline([{"enrich": {
        "field": "user", "policy": pol, "target_field": "who"}}])
    out = pipe(pd.DataFrame({"user": [3, 7]}))
    assert out["who.name"].tolist() == ["carol", None]


def test_enrich_registered_in_registry():
    from elasticsearch_ray.ops.processors import _REGISTRY

    assert "enrich" in _REGISTRY
    for extra in ("user_agent", "geoip", "enrich"):
        assert extra in _REGISTRY
