"""Watcher (x-pack alerting) — conditions, actions, throttle/ack, schedule.

Reference semantics: Watch.java, CompareCondition.java (ObjectPath +
path-valued compare operands), ArrayCompareCondition (all/some),
IndexAction/LoggingAction, ExecutionService watch records,
ActionThrottler + ack-reset-on-false-condition.
"""

import pandas as pd
import pytest

from elasticsearch_ray.ops.watcher import WatcherService, object_path


def test_object_path_dotted_and_indices():
    m = {"a": {"b": [{"c": 5}, {"c": 7}]}}
    assert object_path(m, "a.b.1.c") == 7
    assert object_path(m, "a.b.0.c") == 5
    assert object_path(m, "a.x") is None
    assert object_path(m, "a.b.9.c") is None


def _svc():
    return WatcherService()


def test_compare_condition_and_index_action():
    svc = _svc()
    svc.put_watch("w1", {
        "input": {"simple": {"hits": {"total": 12}}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gte": 10}}},
        "actions": {"store": {"index": {"index": "alerts"}}},
    })
    rec = svc.execute_watch("w1")
    assert rec["condition_met"] is True
    assert rec["actions"] == [{"id": "store", "status": "executed"}]
    assert svc.dest["alerts"] == [{"hits": {"total": 12}}]


def test_compare_with_path_valued_operand():
    svc = _svc()
    svc.put_watch("w", {
        "input": {"simple": {"a": 5, "b": 5}},
        "condition": {"compare": {"ctx.payload.a":
                                  {"eq": "{{ctx.payload.b}}"}}},
        "actions": {"log": {"logging": {"text": "x"}}},
    })
    assert svc.execute_watch("w")["condition_met"] is True


def test_never_and_false_condition_records():
    svc = _svc()
    svc.put_watch("w", {
        "input": {"simple": {"n": 1}},
        "condition": {"compare": {"ctx.payload.n": {"gt": 5}}},
        "actions": {"log": {"logging": {"text": "no"}}},
    })
    rec = svc.execute_watch("w")
    assert rec["condition_met"] is False and rec["actions"] == []
    assert svc.logs == []


def test_array_compare_quantifiers():
    svc = _svc()
    for quant, vals, expect in (("some", [1, 9], True),
                                ("all", [1, 9], False),
                                ("all", [8, 9], True)):
        svc.put_watch("w", {
            "input": {"simple": {"vals": vals}},
            "condition": {"array_compare": {"ctx.payload.vals": {
                "quantifier": quant, "gte": {"value": 5}}}},
            "actions": {"log": {"logging": {"text": "hit"}}},
        })
        assert svc.execute_watch("w")["condition_met"] is expect, (quant, vals)


def test_logging_action_renders_mustache():
    svc = _svc()
    svc.put_watch("w", {
        "input": {"simple": {"hits": {"total": 42}}},
        "actions": {"log": {"logging": {
            "text": "saw {{ctx.payload.hits.total}} hits on {{ctx.watch_id}}"}}},
    })
    svc.execute_watch("w")
    assert svc.logs == ["saw 42 hits on w"]


def test_throttle_period_suppresses_reruns():
    svc = _svc()
    svc.put_watch("w", {
        "input": {"simple": {"n": 9}},
        "condition": {"compare": {"ctx.payload.n": {"gt": 0}}},
        "actions": {"store": {"throttle_period": "10m",
                              "index": {"index": "out"}}},
    })
    t0 = pd.Timestamp("2024-01-01 00:00")
    assert svc.execute_watch("w", t0)["actions"][0]["status"] == "executed"
    assert svc.execute_watch("w", t0 + pd.Timedelta("5m"))["actions"][0][
        "status"] == "throttled"
    assert svc.execute_watch("w", t0 + pd.Timedelta("11m"))["actions"][0][
        "status"] == "executed"
    assert len(svc.dest["out"]) == 2


def test_ack_silences_until_condition_false():
    svc = _svc()
    payload = {"n": 9}
    svc.put_watch("w", {
        "input": {"simple": payload},
        "condition": {"compare": {"ctx.payload.n": {"gt": 0}}},
        "actions": {"store": {"index": {"index": "out"}}},
    })
    assert svc.execute_watch("w")["actions"][0]["status"] == "executed"
    svc.ack_watch("w", "store")
    assert svc.execute_watch("w")["actions"][0]["status"] == "acked"
    payload["n"] = -1  # condition goes false → ack resets (Watch.ack)
    assert svc.execute_watch("w")["condition_met"] is False
    payload["n"] = 9
    assert svc.execute_watch("w")["actions"][0]["status"] == "executed"


def test_per_action_condition():
    svc = _svc()
    svc.put_watch("w", {
        "input": {"simple": {"n": 3}},
        "actions": {
            "big": {"condition": {"compare": {"ctx.payload.n": {"gt": 5}}},
                    "index": {"index": "big"}},
            "small": {"condition": {"compare": {"ctx.payload.n": {"lte": 5}}},
                      "index": {"index": "small"}},
        },
    })
    rec = svc.execute_watch("w")
    statuses = {a["id"]: a["status"] for a in rec["actions"]}
    assert statuses == {"big": "condition_not_met", "small": "executed"}
    assert "big" not in svc.dest and len(svc.dest["small"]) == 1


def test_schedule_run_pending_and_activate():
    svc = _svc()
    svc.put_watch("w", {
        "trigger": {"schedule": {"interval": "10m"}},
        "input": {"simple": {"n": 1}},
        "actions": {"store": {"index": {"index": "out"}}},
    })
    t0 = pd.Timestamp("2024-01-01 00:00")
    assert len(svc.run_pending(t0)) == 1
    assert len(svc.run_pending(t0 + pd.Timedelta("5m"))) == 0
    assert len(svc.run_pending(t0 + pd.Timedelta("10m"))) == 1
    svc.activate("w", False)
    assert len(svc.run_pending(t0 + pd.Timedelta("30m"))) == 0


def test_search_input_payload(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    corpus = tmp_path / "corpus"
    os.makedirs(corpus)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(t, str(corpus / "docs.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "corpus"), idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",)),
                concurrency=2, file_pattern="docs.parquet")
    svc = WatcherService(engine=QueryEngine(idx, dtype="float64"))
    svc.put_watch("w", {
        "input": {"search": {"request": {"body": {
            "query": {"match": {"text": "spark join"}}, "size": 5}}}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gte": 1}}},
        "actions": {"store": {"index": {"index": "hits"}}},
    })
    rec = svc.execute_watch("w")
    assert rec["condition_met"] is True
    assert 1 <= len(svc.dest["hits"]) <= 5
    assert "doc_id" in svc.dest["hits"][0]


def test_validation():
    svc = _svc()
    with pytest.raises(ValueError, match="needs actions"):
        svc.put_watch("w", {"input": {"simple": {}}})
    with pytest.raises(ValueError, match="unsupported condition"):
        svc.put_watch("w", {"condition": {"external": "1"},
                            "actions": {"a": {"logging": {"text": ""}}}})


def test_chain_input_nests_payloads():
    svc = _svc()
    svc.put_watch("wc", {
        "input": {"chain": {"inputs": [
            {"first": {"simple": {"n": 3}}},
            {"second": {"simple": {"m": 9}}},
        ]}},
        "condition": {"compare": {"ctx.payload.second.m": {"gte": 5}}},
        "actions": {"log": {"logging": {
            "text": "n={{ctx.payload.first.n}}"}}},
    })
    rec = svc.execute_watch("wc")
    assert rec["condition_met"] is True
    assert svc.logs[-1] == "n=3"


def test_script_condition_painless():
    svc = _svc()
    svc.put_watch("ws", {
        "input": {"simple": {"hits": {"total": 7}}},
        "condition": {"script": {
            "source": "return ctx.payload.hits.total > params.floor;",
            "params": {"floor": 5}}},
        "actions": {"log": {"logging": {"text": "fired"}}},
    })
    assert svc.execute_watch("ws")["condition_met"] is True
    svc.put_watch("ws2", {
        "input": {"simple": {"hits": {"total": 3}}},
        "condition": {"script": {
            "source": "return ctx.payload.hits.total > params.floor;",
            "params": {"floor": 5}}},
        "actions": {"log": {"logging": {"text": "fired"}}},
    })
    assert svc.execute_watch("ws2")["condition_met"] is False


def test_script_transform_watch_level_and_per_action():
    svc = _svc()
    svc.put_watch("wt", {
        "input": {"simple": {"v": 4}},
        "condition": {"always": {}},
        "transform": {"script": {
            "source": "Map m = new HashMap(); m.put('doubled', "
                      "ctx.payload.v * 2); return m;"}},
        "actions": {
            "log": {"logging": {"text": "d={{ctx.payload.doubled}}"}},
            "idx": {
                "transform": {"script": {
                    "source": "Map m = new HashMap(); m.put('tripled', "
                              "ctx.payload.doubled * 3); return m;"}},
                "index": {"index": "out"},
            },
        },
    })
    rec = svc.execute_watch("wt")
    assert all(a["status"] == "executed" for a in rec["actions"])
    assert svc.logs[-1] == "d=8"
    # the per-action transform saw the watch-level transform's output
    assert svc.dest["out"][-1] == {"tripled": 24}


def test_chain_transform_composes():
    svc = _svc()
    svc.put_watch("wch", {
        "input": {"simple": {"v": 2}},
        "condition": {"always": {}},
        "transform": {"chain": [
            {"script": {"source": "Map m = new HashMap(); m.put('v', "
                                  "ctx.payload.v + 1); return m;"}},
            {"script": {"source": "Map m = new HashMap(); m.put('v', "
                                  "ctx.payload.v * 10); return m;"}},
        ]},
        "actions": {"log": {"logging": {"text": "v={{ctx.payload.v}}"}}},
    })
    svc.execute_watch("wch")
    assert svc.logs[-1] == "v=30"


def test_query_watches_pagination_and_filters():
    from elasticsearch_ray.ops.watcher import WatcherService

    svc = WatcherService()
    for i in range(5):
        svc.put_watch(f"w-{i}", {"trigger": {"schedule": {"interval": "1h"}},
                                 "actions": {"log": {"logging": {}}}},
                      active=(i % 2 == 0))
    svc.put_watch("other", {"actions": {"log": {"logging": {}}}})
    out = svc.query_watches(size=3)
    assert out["count"] == 6
    assert [w["_id"] for w in out["watches"]] == ["other", "w-0", "w-1"]
    page2 = svc.query_watches(from_=3, size=3)
    assert [w["_id"] for w in page2["watches"]] == ["w-2", "w-3", "w-4"]
    pre = svc.query_watches(query={"prefix": {"_id": "w-"}})
    assert pre["count"] == 5
    act = svc.query_watches(
        query={"term": {"status.state.active": False}})
    assert [w["_id"] for w in act["watches"]] == ["w-1", "w-3"]
    assert all(w["status"]["state"]["active"] is False
               for w in act["watches"])
    one = svc.query_watches(query={"term": {"_id": "w-2"}})
    assert one["count"] == 1 and one["watches"][0]["_id"] == "w-2"
    desc = svc.query_watches(descending=True, size=2)
    assert [w["_id"] for w in desc["watches"]] == ["w-4", "w-3"]
    import pytest as _pt
    with _pt.raises(ValueError, match="unsupported watches query"):
        svc.query_watches(query={"match": {"_id": "x"}})
