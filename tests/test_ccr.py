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
