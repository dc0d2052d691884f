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
