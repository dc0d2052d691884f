"""ILM full phase machinery (LifecyclePolicy/IndexLifecycleService
analog): phase selection by age, in-order action execution, composed
forcemerge/freeze/searchable_snapshot/delete actions."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.ilm import (
    IlmExecutor,
    LifecyclePolicy,
    index_creation_time,
)


def _policy(repo):
    return LifecyclePolicy("logs-policy", {
        "hot": {"min_age": "0ms", "actions": {"set_priority": {
            "priority": 100}}},
        "warm": {"min_age": "1h", "actions": {"forcemerge": {
            "max_num_segments": 1}}},
        "cold": {"min_age": "1d", "actions": {
            "freeze": {},
            "searchable_snapshot": {"snapshot_repository": repo}}},
        "delete": {"min_age": "7d", "actions": {"delete": {}}},
    })


@pytest.fixture()
def managed_index(ray_session, tmp_path):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = str(tmp_path / "c")
    os.makedirs(corpus)
    rng = np.random.RandomState(2)
    words = ["spark", "join", "merge", "sort"]
    for i in range(2):
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(i * 20, i * 20 + 20,
                                         dtype=np.int64)),
            "text": pa.array([" ".join(rng.choice(words, 6))
                              for _ in range(20)]),
        }), f"{corpus}/d{i}.parquet")
    idx = str(tmp_path / "idx")
    spec = IndexSpec(use_html=False, text_column="text",
                     files_per_partition=1)
    build_index(corpus, idx, spec, concurrency=2, file_pattern="d*.parquet")
    return idx, str(tmp_path / "repo")


def test_policy_validation():
    with pytest.raises(ValueError, match="unknown phase"):
        LifecyclePolicy("p", {"tepid": {}})
    with pytest.raises(ValueError, match="not allowed"):
        LifecyclePolicy("p", {"hot": {"actions": {"delete": {}}}})
    with pytest.raises(ValueError, match="bad min_age"):
        LifecyclePolicy("p", {"warm": {"min_age": "soon"}})


def test_phase_for_age():
    pol = _policy("/tmp/none")
    assert pol.phase_for_age(0) == "hot"
    assert pol.phase_for_age(3600) == "warm"
    assert pol.phase_for_age(86400 * 2) == "cold"
    assert pol.phase_for_age(86400 * 8) == "delete"


def test_phase_execution_and_explain(managed_index):
    idx, repo = managed_index
    from elasticsearch_ray.index.snapshot import snapshot_list
    from elasticsearch_ray.search.engine import QueryEngine

    ex = IlmExecutor(_policy(repo))
    t0 = index_creation_time(idx)

    # hot tick: only set_priority
    applied = ex.step(idx, now=t0 + 1)
    assert applied == ["hot.set_priority"]
    assert ex.explain(idx, now=t0 + 1)["phase"] == "hot"

    # warm tick: forcemerge down to one partition
    n_parts_before = len(os.listdir(os.path.join(idx, "parts")))
    assert n_parts_before > 1
    applied = ex.step(idx, now=t0 + 7200)
    assert applied == ["warm.forcemerge"]
    assert len(os.listdir(os.path.join(idx, "parts"))) == 1

    # idempotent: a second tick in the same phase re-runs nothing
    assert ex.step(idx, now=t0 + 7300) == []

    # cold: freeze persists + snapshot created in the repo
    applied = ex.step(idx, now=t0 + 86400 + 5)
    assert applied == ["cold.freeze", "cold.searchable_snapshot"]
    assert QueryEngine(idx, dtype="float64").frozen is True
    snaps = [m["snapshot"] for m in snapshot_list(repo)]
    assert snaps == ["ilm-idx"]

    exp = ex.explain(idx, now=t0 + 86400 + 5)
    assert exp["phase"] == "cold"
    assert exp["executed"]["warm"] == ["forcemerge"]

    # delete phase removes the index
    applied = ex.step(idx, now=t0 + 86400 * 8)
    assert applied == ["delete.delete"]
    assert not os.path.exists(idx)


def test_skipped_phases_catch_up(managed_index):
    """An index discovered already old runs every due phase in order in
    one tick (the reference processes steps until the current phase)."""
    idx, repo = managed_index
    ex = IlmExecutor(_policy(repo))
    t0 = index_creation_time(idx)
    applied = ex.step(idx, now=t0 + 86400 * 2)
    assert applied == ["hot.set_priority", "warm.forcemerge",
                       "cold.freeze", "cold.searchable_snapshot"]
