"""Task management (_tasks: TaskManager/ListTasksAction/CancellableTask),
_msearch/template, max_result_window guard."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.search.tasks import (
    TaskCancelledException,
    TaskManager,
)
from elasticsearch_ray.search.templates import (
    TemplateRegistry,
    msearch_template,
)


def test_task_register_list_cancel():
    tm = TaskManager()
    t1 = tm.register("indices:data/read/search", "q1")
    t2 = tm.register("indices:data/write/reindex", "r1")
    ids = [t["task_id"] for t in tm.list_tasks()]
    assert ids == [t1.task_id, t2.task_id]
    assert [t["task_id"] for t in
            tm.list_tasks(actions="*/read/*")] == [t1.task_id]
    info = tm.cancel(t1.task_id)
    assert info["cancelled"] is True
    with pytest.raises(TaskCancelledException):
        t1.ensure_not_cancelled()
    t2.ensure_not_cancelled()  # untouched
    # unregister EVICTS (the reference TaskManager model) — the registry
    # must not grow unboundedly in a long-lived driver
    tm.unregister(t2)
    assert [t["task_id"] for t in tm.list_tasks()] == [t1.task_id]
    assert len(tm.list_tasks(include_completed=True)) == 1
    assert t2.completed is True  # the caller's handle still knows


def test_list_order_is_numeric_not_lexicographic():
    tm = TaskManager()
    ids = [tm.register("a").task_id for _ in range(11)]
    got = [t["task_id"] for t in tm.list_tasks()]
    assert got == ids  # node-0:10 must not sort before node-0:2


def test_task_errors_and_callbacks():
    tm = TaskManager()
    seen = []
    t = tm.register("a", cancellable=True,
                    on_cancel=lambda r: seen.append(r))
    tm.cancel(t.task_id, reason="test")
    assert seen == ["test"]
    nt = tm.register("b", cancellable=False)
    with pytest.raises(ValueError, match="not cancellable"):
        tm.cancel(nt.task_id)
    with pytest.raises(KeyError):
        tm.cancel("node-0:999")
    with pytest.raises(KeyError):
        tm.get_task("node-0:999")
    assert tm.get_task(t.task_id)["action"] == "a"


@pytest.fixture(scope="module")
def small_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("tapi")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(1)
    words = ["spark", "join", "merge"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(30, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 6))
                          for _ in range(30)]),
    }), f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          max_result_window=20),
                concurrency=2, file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64")


def test_msearch_template_sources_ids_and_errors(small_engine):
    reg = TemplateRegistry()
    reg.put("t1", '{"query": {"match": {"text": "{{q}}"}}, "size": 3}')
    out = msearch_template(small_engine, [
        {"id": "t1", "params": {"q": "spark"}},
        {"source": '{"query": {"term": {"text": {"value": "join"}}}}'},
        {"id": "missing"},
    ], registry=reg, fetch=("doc_id",))
    assert out[0]["status"] == 200 and len(out[0]["response"]) == 3
    assert out[1]["status"] == 200
    assert out[2]["status"] == 400 and "missing" in out[2]["error"]


def test_max_result_window_guard(small_engine):
    from elasticsearch_ray.search.query import MatchQuery

    small_engine.search(MatchQuery("spark"), k=20, fetch=("doc_id",))
    with pytest.raises(ValueError, match="Result window is too large"):
        small_engine.search(MatchQuery("spark"), k=21, fetch=("doc_id",))
