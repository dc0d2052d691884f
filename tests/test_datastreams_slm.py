"""Data streams (DataStream.java semantics over rollover generations) and
SLM policies (SnapshotLifecyclePolicy + SnapshotRetentionConfiguration)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.datastreams import DataStreamService
from elasticsearch_ray.index.slm import SlmService
from elasticsearch_ray.index.snapshot import snapshot_list
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


def _docs(lo, hi):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").slice(lo, hi - lo)
    ts = pa.array([pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)
                   for i in range(hi - lo)])
    return t.append_column("@timestamp", ts)


@pytest.fixture(scope="module")
def stream(ray_session, tmp_path_factory):
    svc = DataStreamService(str(tmp_path_factory.mktemp("ds")))
    svc.create("logs")
    svc.ingest("logs", _docs(0, 120))
    svc.rollover("logs", force=True)
    svc.ingest("logs", _docs(120, 260))
    return svc


def test_create_validates_and_rejects_duplicates(stream):
    with pytest.raises(ValueError, match="already exists"):
        stream.create("logs")
    with pytest.raises(ValueError, match="invalid data stream name"):
        stream.create(".hidden")


def test_timestamp_field_required(stream):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").slice(0, 5)
    with pytest.raises(ValueError, match=r"requires a \[@timestamp\]"):
        stream.ingest("logs", t)


def test_generations_and_get(stream):
    info = stream.get("logs")
    assert info["generation"] == 2
    assert info["indices"] == [".ds-logs-000001", ".ds-logs-000002"]
    st = stream.stats("logs")
    assert st == {"backing_indices": 2, "total_docs": 260}


def test_search_spans_all_backing_indices(stream):
    eng = stream.engine("logs", dtype="float64")
    hits = eng.search(MatchQuery("merge sort"), k=10**6, fetch=("doc_id",))
    # both generations contribute (docs 0..119 and 120..259 overlap terms)
    assert len(hits) > 0
    st = stream.stats("logs")
    assert st["total_docs"] == 260


def test_incremental_ingest_appends_within_generation(stream):
    before = stream.stats("logs")["total_docs"]
    stream.ingest("logs", _docs(260, 300))
    assert stream.stats("logs")["total_docs"] == before + 40
    assert stream.get("logs")["generation"] == 2  # no rollover happened


def test_list_and_delete(ray_session, tmp_path):
    svc = DataStreamService(str(tmp_path))
    svc.create("a")
    svc.create("b")
    assert svc.list_streams() == ["a", "b"]
    svc.delete("a")
    assert svc.list_streams() == ["b"]
    assert not svc.exists("a")
    with pytest.raises(KeyError):
        svc.get("a")


# ---- SLM ----

@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = tmp_path_factory.mktemp("slmsrc")
    t = pq.read_table(f"{SF_DIR}/documents.parquet").slice(0, 100)
    pq.write_table(t, str(corpus / "docs.parquet"))
    idx = str(tmp_path_factory.mktemp("slmidx") / "index")
    build_index(str(corpus), idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",)),
                concurrency=1, file_pattern="docs.parquet")
    return idx


def test_slm_execute_and_max_count_retention(small_index, tmp_path):
    repo = str(tmp_path / "repo")
    slm = SlmService(repo)
    slm.put_policy("daily", {
        "schedule": "1d", "name": "snap", "repository": repo,
        "config": {"index_dir": small_index},
        "retention": {"max_count": 2},
    })
    t0 = pd.Timestamp("2024-05-01")
    for i in range(4):
        slm.execute_policy("daily", now=t0 + pd.Timedelta(days=i))
    deleted = slm.execute_retention("daily", now=t0 + pd.Timedelta(days=4))
    assert deleted == ["snap-000001", "snap-000002"]
    names = [s["snapshot"] for s in snapshot_list(repo)]
    assert sorted(names) == ["snap-000003", "snap-000004"]
    stats = slm.get_policy("daily")["stats"]
    assert stats == {"snapshots_taken": 4, "snapshots_deleted": 2}


def test_slm_expire_after_keeps_min_count(small_index, tmp_path):
    repo = str(tmp_path / "repo")
    slm = SlmService(repo)
    slm.put_policy("p", {
        "schedule": "1d", "name": "s",
        "config": {"index_dir": small_index},
        "retention": {"expire_after": "3d", "min_count": 2},
    })
    t0 = pd.Timestamp("2024-05-01")
    for i in range(3):
        slm.execute_policy("p", now=t0 + pd.Timedelta(days=i))
    # all three are older than 3d at +30d, but min_count=2 must survive
    deleted = slm.execute_retention("p", now=t0 + pd.Timedelta(days=30))
    assert deleted == ["s-000001"]
    assert len(snapshot_list(repo)) == 2


def test_slm_run_pending_interval(small_index, tmp_path):
    repo = str(tmp_path / "repo")
    slm = SlmService(repo)
    slm.put_policy("p", {"schedule": "1d", "name": "s",
                         "config": {"index_dir": small_index}})
    t0 = pd.Timestamp("2024-06-01")
    assert len(slm.run_pending(t0)) == 1
    assert len(slm.run_pending(t0 + pd.Timedelta("2h"))) == 0
    assert len(slm.run_pending(t0 + pd.Timedelta("25h"))) == 1
    assert len(snapshot_list(repo)) == 2


def test_slm_restore_round_trip(small_index, tmp_path):
    from elasticsearch_ray.index.snapshot import snapshot_restore
    from elasticsearch_ray.search.engine import QueryEngine

    repo = str(tmp_path / "repo")
    slm = SlmService(repo)
    slm.put_policy("p", {"schedule": "1d", "name": "s",
                         "config": {"index_dir": small_index}})
    name = slm.execute_policy("p")["snapshot_name"]
    dst = str(tmp_path / "restored")
    snapshot_restore(repo, name, dst)
    a = QueryEngine(small_index, dtype="float64").search(
        MatchQuery("spark"), k=5)
    b = QueryEngine(dst, dtype="float64").search(MatchQuery("spark"), k=5)
    assert a.to_pylist() == b.to_pylist()


def test_slm_policy_validation(tmp_path):
    slm = SlmService(str(tmp_path / "repo"))
    with pytest.raises(ValueError, match="index_dir"):
        slm.put_policy("p", {"schedule": "1d"})
    with pytest.raises(ValueError, match="unknown retention"):
        slm.put_policy("p", {"config": {"index_dir": "/x"},
                             "retention": {"keep": 3}})
