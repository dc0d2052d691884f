"""_has_privileges API + API keys (x-pack security
TransportHasPrivilegesAction / CreateApiKeyAction analogs) and the
ODBC CONVERT type-conversion form."""

import pandas as pd
import pytest

from elasticsearch_ray.search.security import (
    IndexPrivilege,
    RoleDescriptor,
    authenticate_api_key,
    create_api_key,
    has_privileges,
    invalidate_api_key,
)


def test_has_privileges_lattice():
    granted = [IndexPrivilege(names=("logs-*",), privileges=("read",)),
               IndexPrivilege(names=("metrics",), privileges=("all",))]
    resp = has_privileges(granted, granted_cluster=("manage",), check={
        "cluster": ["monitor", "manage_security"],
        "index": [
            {"names": ["logs-2024", "secrets"],
             "privileges": ["read", "search", "write"]},
            {"names": ["metrics"], "privileges": ["write", "manage"]},
        ],
    })
    # manage implies monitor but not manage_security
    assert resp["cluster"] == {"monitor": True, "manage_security": False}
    assert resp["index"]["logs-2024"] == {
        "read": True, "search": True, "write": False}
    assert resp["index"]["secrets"] == {
        "read": False, "search": False, "write": False}
    # "all" implies the write and manage families
    assert resp["index"]["metrics"] == {"write": True, "manage": True}
    assert resp["has_all_requested"] is False

    ok = has_privileges(granted, check={
        "index": [{"names": ["logs-x"], "privileges": ["search"]}]})
    assert ok["has_all_requested"] is True


def test_api_key_lifecycle():
    roles = (RoleDescriptor("reader", grant=("text",)),)
    rec = create_api_key("ingest-key", roles, seed=11)
    auth = authenticate_api_key(rec["id"], rec["api_key"])
    assert auth["roles"] == list(roles)
    assert auth["limited_by"] == list(roles)  # defaults to creator roles
    with pytest.raises(PermissionError):
        authenticate_api_key(rec["id"], "wrong-secret")
    out = invalidate_api_key(rec["id"])
    assert out["invalidated_api_keys"] == [rec["id"]]
    with pytest.raises(PermissionError):
        authenticate_api_key(rec["id"], rec["api_key"])
    assert invalidate_api_key("nope")["error_count"] == 1


def test_convert_odbc_form():
    from elasticsearch_ray.search.qlfuncs import QlError, compile_ql

    df = pd.DataFrame({"v": [1.9, -2.7]})
    assert list(compile_ql("CONVERT(v, SQL_BIGINT)")(df)) == [1, -2]
    assert compile_ql('CONVERT("3.5", SQL_DOUBLE)')(df) == 3.5
    assert list(compile_ql("CONVERT(v, INTEGER)")(df)) == [1, -2]
    with pytest.raises(QlError, match="unknown type"):
        compile_ql("CONVERT(v, SQL_BLOB)")


# ------------------------------------------------------------ role mappings
# (ExpressionRoleMapping.java + expressiondsl/{All,Any,Except,Field}
# Expression.java + ExpressionParser.java)

import pytest as _pytest

from elasticsearch_ray.search.security import (
    delete_role_mapping,
    evaluate_mapping_rules,
    get_role_mapping,
    put_role_mapping,
    resolve_mapped_roles,
)


@_pytest.fixture(autouse=True)
def _clean_mappings():
    for name in list(get_role_mapping()):
        delete_role_mapping(name)
    yield
    for name in list(get_role_mapping()):
        delete_role_mapping(name)


def test_field_rule_any_of_values_and_globs():
    user = {"username": "jane@corp.example.com", "groups": ["eng", "ml"]}
    assert evaluate_mapping_rules(
        {"field": {"username": ["bob", "*@corp.example.com"]}}, user)
    # simpleMatch treats only * as a wildcard — '?' is literal
    assert not evaluate_mapping_rules(
        {"field": {"username": "jane?corp.example.com"}}, user)
    # a list-valued user field matches when ANY element matches
    assert evaluate_mapping_rules({"field": {"groups": "ml"}}, user)
    assert not evaluate_mapping_rules({"field": {"groups": "ops"}}, user)
    # /regex/ values use the Lucene-regex form
    assert evaluate_mapping_rules(
        {"field": {"username": "/jane@.*\\.com/"}}, user)
    # null matches a missing field
    assert evaluate_mapping_rules({"field": {"dn": None}}, user)


def test_all_any_except_tree_and_dotted_fields():
    rules = {"all": [
        {"any": [{"field": {"realm.name": "ldap1"}},
                 {"field": {"realm.name": "ldap2"}}]},
        {"field": {"metadata.tier": 2}},
        {"except": {"field": {"groups": "blocked"}}},
    ]}
    ok = {"realm": {"name": "ldap1"}, "metadata": {"tier": 2},
          "groups": ["eng"]}
    assert evaluate_mapping_rules(rules, ok)
    assert not evaluate_mapping_rules(
        rules, {**ok, "groups": ["eng", "blocked"]})
    assert not evaluate_mapping_rules(
        rules, {**ok, "metadata": {"tier": 3}})
    # empty all is vacuously true (AllExpression over an empty list)
    assert evaluate_mapping_rules({"all": []}, {})
    assert not evaluate_mapping_rules({"any": []}, {})


def test_except_only_inside_all():
    with _pytest.raises(ValueError, match="except"):
        put_role_mapping("bad", ["r"],
                         {"except": {"field": {"username": "x"}}})
    with _pytest.raises(ValueError, match="except"):
        put_role_mapping("bad2", ["r"], {"any": [
            {"except": {"field": {"username": "x"}}}]})
    with _pytest.raises(ValueError, match="unknown rule"):
        put_role_mapping("bad3", ["r"], {"nor": []})
    with _pytest.raises(ValueError, match="at least one role"):
        put_role_mapping("bad4", [], {"all": []})


def test_resolution_unions_enabled_mappings():
    put_role_mapping("m1", ["kibana_user"],
                     {"field": {"groups": "eng"}})
    put_role_mapping("m2", ["superuser"],
                     {"field": {"username": "root"}})
    put_role_mapping("m3", ["disabled_role"],
                     {"field": {"groups": "eng"}}, enabled=False)
    put_role_mapping("m4", ["monitoring", "kibana_user"],
                     {"field": {"realm.name": "*"}})
    user = {"username": "jane", "groups": ["eng"],
            "realm": {"name": "native"}}
    assert resolve_mapped_roles(user) == ["kibana_user", "monitoring"]
    assert resolve_mapped_roles({"username": "root",
                                 "realm": {"name": "native"}}) == \
        ["kibana_user", "monitoring", "superuser"]
    # without a realm, only the username mapping fires
    assert resolve_mapped_roles({"username": "root"}) == ["superuser"]
    # CRUD shapes
    assert put_role_mapping("m1", ["kibana_user"],
                            {"field": {"groups": "eng"}}) == \
        {"role_mapping": {"created": False}}
    assert set(get_role_mapping()) == {"m1", "m2", "m3", "m4"}
    assert get_role_mapping("m2")["m2"]["roles"] == ["superuser"]
    assert delete_role_mapping("m3") == {"found": True}
    assert delete_role_mapping("m3") == {"found": False}
    with _pytest.raises(KeyError):
        get_role_mapping("m3")


# ------------------------------------------------------------ logstash APIs

def test_logstash_pipeline_crud():
    from elasticsearch_ray.search.logstash import (
        delete_logstash_pipeline,
        get_logstash_pipeline,
        put_logstash_pipeline,
    )

    body = {"last_modified": "2021-01-01T00:00:00Z",
            "pipeline_metadata": {"type": "logstash_pipeline"},
            "username": "elastic",
            "pipeline": "input { stdin {} } output { stdout {} }",
            "pipeline_settings": {"pipeline.workers": 1}}
    assert put_logstash_pipeline("main", body) == {"status": 201}
    assert put_logstash_pipeline("main", body) == {"status": 200}
    put_logstash_pipeline("second", {**body, "username": "other"})

    allp = get_logstash_pipeline()
    assert sorted(allp["pipelines"]) == ["main", "second"]
    one = get_logstash_pipeline("main", "ghost")
    assert list(one["pipelines"]) == ["main"]
    assert one["missing"] == ["ghost"]
    assert one["pipelines"]["main"]["pipeline"].startswith("input")

    with _pytest.raises(ValueError, match="Required"):
        put_logstash_pipeline("bad", {"pipeline": "x"})
    with _pytest.raises(ValueError, match="object"):
        put_logstash_pipeline("bad", {**body, "pipeline_settings": 3})

    assert delete_logstash_pipeline("second") == {"deleted": True}
    assert delete_logstash_pipeline("second") == {"deleted": False}
    assert delete_logstash_pipeline("main") == {"deleted": True}
