"""CCR follower indices (x-pack ccr) + searchable-snapshot mount
(x-pack searchable-snapshots): initial sync, incremental partition
sync, merge-rewrite handling, read-only markers, no-copy mounts."""

import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.ccr import (FollowerError,
                                         assert_not_follower, follow,
                                         is_follower, poll_follow,
                                         unfollow)
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


def _mtimes(index_dir):
    out = {}
    root = os.path.join(index_dir, "parts")
    for d in os.listdir(root):
        out[d] = os.path.getmtime(os.path.join(root, d, "postings.bin"))
    return out


@pytest.fixture(scope="module")
def leader(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = tmp_path_factory.mktemp("ccr_corpus")
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    half = len(t) // 2
    pq.write_table(t.slice(0, half), str(corpus / "docs0.parquet"))
    idx = str(tmp_path_factory.mktemp("ccr_leader") / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("lang",), files_per_partition=1)
    build_index(str(corpus), idx, spec, concurrency=2,
                file_pattern="docs*.parquet")
    return str(corpus), idx, spec, t


def test_follow_initial_and_incremental(leader, tmp_path):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    corpus, leader_idx, spec, t = leader
    follower_idx = str(tmp_path / "follower")
    rep = follow(leader_idx, follower_idx)
    assert rep["copied"] and not rep["removed"]
    assert is_follower(follower_idx)

    # follower serves identical results
    a = QueryEngine(leader_idx, dtype="float64").search(
        MatchQuery("spark"), k=10, fetch=("doc_id",))
    b = QueryEngine(follower_idx, dtype="float64").search(
        MatchQuery("spark"), k=10, fetch=("doc_id",))
    assert a.to_pylist() == b.to_pylist()

    # idle poll: nothing copied, mtimes untouched
    before = _mtimes(follower_idx)
    rep = poll_follow(follower_idx)
    assert not rep["copied"] and not rep["removed"]
    assert rep["unchanged"] and _mtimes(follower_idx) == before

    # leader grows (incremental append of the second half)
    half = len(t) // 2
    pq.write_table(t.slice(half, len(t) - half),
                   os.path.join(corpus, "docs1.parquet"))
    build_index(corpus, leader_idx, spec, concurrency=2,
                file_pattern="docs*.parquet")
    before = _mtimes(follower_idx)
    rep = poll_follow(follower_idx)
    assert rep["copied"]  # the new partition arrived
    # pre-existing partitions were NOT re-copied
    for name in rep["unchanged"]:
        assert _mtimes(follower_idx)[name] == before[name]
    a = QueryEngine(leader_idx, dtype="float64").search(
        MatchQuery("spark"), k=10, fetch=("doc_id",))
    b = QueryEngine(follower_idx, dtype="float64").search(
        MatchQuery("spark"), k=10, fetch=("doc_id",))
    assert a.to_pylist() == b.to_pylist()


def test_follower_guards(leader, tmp_path):
    _corpus, leader_idx, _spec, _t = leader
    follower_idx = str(tmp_path / "f2")
    follow(leader_idx, follower_idx)
    with pytest.raises(FollowerError):
        assert_not_follower(follower_idx)
    assert_not_follower(leader_idx)  # leaders are writable
    with pytest.raises(FollowerError):
        follow(follower_idx, str(tmp_path / "f3"))  # chain forbidden
    with pytest.raises(FollowerError):
        follow(leader_idx, follower_idx)  # already an index there
    with pytest.raises(FollowerError):
        poll_follow(leader_idx)  # not a follower
    unfollow(follower_idx)
    assert not is_follower(follower_idx)
    assert_not_follower(follower_idx)


def test_mount_searchable_snapshot(leader, tmp_path):
    from elasticsearch_ray.index.snapshot import (mount_snapshot,
                                                  snapshot_create)
    from elasticsearch_ray.search.engine import QueryEngine

    _corpus, leader_idx, _spec, _t = leader
    repo = str(tmp_path / "repo")
    snapshot_create(leader_idx, repo, "snap1")
    eng = mount_snapshot(repo, "snap1")
    got = eng.search(MatchQuery("spark"), k=10, fetch=("doc_id",))
    want = QueryEngine(leader_idx, dtype="float64").search(
        MatchQuery("spark"), k=10, fetch=("doc_id",))
    assert got.to_pylist() == want.to_pylist()
    with pytest.raises(FileNotFoundError):
        mount_snapshot(repo, "nope")


def test_incremental_snapshots_share_blobs(leader, tmp_path):
    import json

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.snapshot import (snapshot_create,
                                                  snapshot_delete,
                                                  snapshot_list,
                                                  snapshot_restore)
    from elasticsearch_ray.index.spec import IndexSpec

    corpus, leader_idx, spec, t = leader
    repo = str(tmp_path / "repo2")
    m1 = snapshot_create(leader_idx, repo, "gen1")
    blobs = os.path.join(repo, "blobs")
    n_blobs_1 = len(os.listdir(blobs))
    assert n_blobs_1 <= m1["files"]  # identical files dedup within one

    # append-only growth, then snapshot again: unchanged partition
    # files are REUSED, not re-copied
    m2 = snapshot_create(leader_idx, repo, "gen2")
    assert m2["reused_files"] == m2["files"]  # nothing changed at all
    assert len(os.listdir(blobs)) == n_blobs_1

    # delete gen1: gen2 still restorable; orphan GC only removes blobs
    # nothing references
    snapshot_delete(repo, "gen1")
    assert [m["snapshot"] for m in snapshot_list(repo)] == ["gen2"]
    restored = str(tmp_path / "restored_gen2")
    snapshot_restore(repo, "gen2", restored)
    with open(os.path.join(restored, "index_meta.json")) as f:
        assert json.load(f)["n_docs"] > 0
    snapshot_delete(repo, "gen2")
    assert os.listdir(blobs) == []  # full GC once nothing references


def _mini_index(root, name, spec=None, n=20):
    """Build a tiny leader index <root>/<name> from generated docs."""
    import pandas as pd
    import pyarrow as pa

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = os.path.join(root, f"_corpus_{name}")
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(n), "text": [f"{name} words here"] * n}),
        preserve_index=False), os.path.join(corpus, "d.parquet"))
    idx = os.path.join(root, name)
    build_index(corpus, idx,
                spec or IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="d.parquet")
    return idx


def test_auto_follow_patterns(ray_session, tmp_path):
    from elasticsearch_ray.index.ccr import AutoFollowService

    leader_root = str(tmp_path / "leader_cluster")
    os.makedirs(leader_root)
    _mini_index(leader_root, "logs-2024")
    _mini_index(leader_root, "metrics-2024")
    svc = AutoFollowService(str(tmp_path / "follower_cluster"))
    svc.put_pattern("logs", leader_root, ["logs-*"],
                    leader_index_exclusion_patterns=["logs-old*"],
                    follow_index_pattern="{{leader_index}}-copy")
    rep = svc.poll()
    assert rep["created"] == ["logs-2024-copy"]
    assert rep["errors"] == []
    fdir = os.path.join(str(tmp_path / "follower_cluster"),
                        "logs-2024-copy")
    assert is_follower(fdir)
    # second poll: nothing new, existing follower synced
    rep2 = svc.poll()
    assert rep2["created"] == []
    assert "logs-2024-copy" in rep2["synced"]
    # a NEW matching leader index is picked up; excluded one is not
    _mini_index(leader_root, "logs-2025")
    _mini_index(leader_root, "logs-old-2020")
    rep3 = svc.poll()
    assert rep3["created"] == ["logs-2025-copy"]
    assert svc.stats()["number_of_successful_follow_indices"] == 2


def test_auto_follow_pause_resume_and_no_refollow(ray_session, tmp_path):
    import shutil

    from elasticsearch_ray.index.ccr import AutoFollowService

    leader_root = str(tmp_path / "lc")
    os.makedirs(leader_root)
    _mini_index(leader_root, "data-1")
    froot = str(tmp_path / "fc")
    svc = AutoFollowService(froot)
    svc.put_pattern("p", leader_root, ["data-*"])
    assert svc.poll()["created"] == ["data-1"]
    # deleting the follower does NOT re-trigger (followed-UUID tracking)
    shutil.rmtree(os.path.join(froot, "data-1"))
    assert svc.poll()["created"] == []
    # paused pattern skips creation; resume picks it up
    svc.pause_pattern("p")
    _mini_index(leader_root, "data-2")
    assert svc.poll()["created"] == []
    svc.resume_pattern("p")
    assert svc.poll()["created"] == ["data-2"]
    # state survives a fresh service instance (persisted JSON)
    svc2 = AutoFollowService(froot)
    assert svc2.get_pattern("p")["followed"] == ["data-1", "data-2"]
    assert svc2.poll()["created"] == []
    with pytest.raises(KeyError):
        svc2.get_pattern("missing")
    svc2.delete_pattern("p")
    assert svc2.get_pattern() == {}
    with pytest.raises(ValueError):
        svc2.put_pattern("bad", leader_root, [])
