"""Async SQL tasks (sql.get_async family) + dangling indices APIs."""

import json
import os

import pandas as pd
import pytest
import ray

from elasticsearch_ray.index.dangling import (
    delete_dangling_index,
    import_dangling_index,
    list_dangling_indices,
)
from elasticsearch_ray.search.sql_async import SqlAsyncService


@pytest.fixture()
def tables(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 4.0]})
    return {"t": ray.data.from_pandas(df)}


def test_sql_async_lifecycle(tables):
    svc = SqlAsyncService(tables)
    resp = svc.submit("SELECT k, SUM(v) AS s FROM t GROUP BY k "
                      "ORDER BY k", wait_for_completion_timeout=30.0)
    assert resp["is_running"] is False
    assert [c["name"] for c in resp["columns"]] == ["k", "s"]
    assert resp["rows"] == [["a", 3.0], ["b", 4.0]]
    # result is retained for repeat gets until deleted
    again = svc.get_async(resp["id"], wait_for_completion_timeout=5.0)
    assert again["rows"] == resp["rows"]
    st = svc.get_async_status(resp["id"])
    assert st == {"id": resp["id"], "is_running": False,
                  "is_partial": False, "completion_status": 200}
    svc.delete_async(resp["id"])
    with pytest.raises(KeyError):
        svc.get_async(resp["id"])


def test_sql_async_error_and_expiry(tables):
    svc = SqlAsyncService(tables)
    # a failing statement surfaces its error on whichever call first
    # sees the completed task (submit may already see it — racy by
    # construction, like the reference's wait_for_completion races)
    try:
        resp = svc.submit("SELECT nope FROM missing_table",
                          wait_for_completion_timeout=0.0)
        tid = resp["id"]
    except KeyError:
        tid = "sql-async-1"
    svc._tasks[tid]["done"].wait(30.0)
    st = svc.get_async_status(tid)
    assert st["completion_status"] == 500
    with pytest.raises(Exception):
        svc.get_async(tid, wait_for_completion_timeout=5.0)
    # keep_alive=0 -> immediately expired
    r2 = svc.submit("SELECT k FROM t", keep_alive=0.0)
    with pytest.raises(KeyError, match="expired"):
        svc.get_async(r2["id"])


def _fake_index(root, name):
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "parts"), exist_ok=True)
    with open(os.path.join(d, "index_meta.json"), "w") as f:
        json.dump({"n_docs": 1}, f)
    with open(os.path.join(d, "parts", "blob"), "wb") as f:
        f.write(b"x" * 64)


def test_dangling_indices(tmp_path):
    root = str(tmp_path / "idxroot")
    _fake_index(root, "known-1")
    _fake_index(root, "orphan-1")
    os.makedirs(os.path.join(root, "not-an-index"))
    known = {"known-1"}
    listed = list_dangling_indices(root, known)
    assert [d["index_name"] for d in listed] == ["orphan-1"]
    assert listed[0]["size_in_bytes"] >= 64
    with pytest.raises(ValueError, match="accept_data_loss"):
        import_dangling_index(root, "orphan-1", known)
    known2 = import_dangling_index(root, "orphan-1", known,
                                   accept_data_loss=True)
    assert known2 == {"known-1", "orphan-1"}
    assert list_dangling_indices(root, known2) == []
    # delete removes data; a known index is never deletable this way
    _fake_index(root, "orphan-2")
    with pytest.raises(KeyError):
        delete_dangling_index(root, "known-1", known2,
                              accept_data_loss=True)
    delete_dangling_index(root, "orphan-2", known2,
                          accept_data_loss=True)
    assert not os.path.exists(os.path.join(root, "orphan-2"))
