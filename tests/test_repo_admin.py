"""Repository administration surfaces: repositories-metering-api
counters, snapshot-repo-test-kit repository analysis, x-pack shutdown
plugin lifecycle, match_bool_prefix DSL."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.snapshot import (
    analyze_repository,
    clear_repositories_metering,
    repositories_metering,
    snapshot_create,
    snapshot_delete,
    snapshot_list,
    snapshot_restore,
)


@pytest.fixture()
def tiny_index(ray_session, tmp_path):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = str(tmp_path / "c")
    os.makedirs(corpus)
    rng = np.random.RandomState(1)
    words = ["spark", "join", "merge", "sort"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(30, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 6))
                          for _ in range(30)]),
    }), f"{corpus}/d.parquet")
    idx = str(tmp_path / "i")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="d.parquet")
    return idx


def test_metering_counts_blob_ops(tiny_index, tmp_path):
    repo = str(tmp_path / "repo")
    clear_repositories_metering(repo)
    man = snapshot_create(tiny_index, repo, "s1")
    m = repositories_metering(repo)
    assert m["PutObject"] == man["files"] - man["reused_files"]
    assert m["bytes_written"] > 0
    assert m["GetObject"] == 0

    snapshot_restore(repo, "s1", str(tmp_path / "restored"))
    m = repositories_metering(repo)
    assert m["GetObject"] == man["files"]
    assert m["bytes_read"] == man["bytes"]

    snapshot_list(repo)
    assert repositories_metering(repo)["ListObjects"] >= 1

    snapshot_delete(repo, "s1")
    assert repositories_metering(repo)["DeleteObjects"] > 0

    clear_repositories_metering(repo)
    assert repositories_metering(repo)["PutObject"] == 0


def test_analyze_repository_consistency(tmp_path):
    repo = str(tmp_path / "repo")
    os.makedirs(repo)
    rep = analyze_repository(repo, blob_count=6, max_blob_size=4096,
                             seed=7)
    assert rep["summary"] == "pass"
    assert rep["inconsistencies"] == []
    assert rep["blob_count"] == 6
    assert rep["total_bytes"] > 0
    assert rep["write_throughput_bps"] > 0
    assert rep["read_throughput_bps"] > 0
    # the scratch area is cleaned up
    assert not os.path.exists(os.path.join(repo, ".analyze.tmp"))


def test_node_shutdown_lifecycle(tiny_index):
    from elasticsearch_ray.search.cluster import (
        _SHUTDOWNS,
        delete_node_shutdown,
        get_shutdown_status,
        put_node_shutdown,
    )

    _SHUTDOWNS.clear()
    assert put_node_shutdown("n1", "restart", "rolling upgrade") == {
        "acknowledged": True}
    st = get_shutdown_status()
    assert len(st["nodes"]) == 1
    assert st["nodes"][0]["status"] == "COMPLETE"  # restart moves nothing

    put_node_shutdown("n2", "remove", "decommission")
    st = get_shutdown_status({"idx": tiny_index})
    n2 = [n for n in st["nodes"] if n["node_id"] == "n2"][0]
    assert n2["status"] == "IN_PROGRESS"
    assert n2["shard_migration"]["shard_migrations_remaining"] > 0

    with pytest.raises(ValueError, match="target_node_name"):
        put_node_shutdown("n3", "replace", "swap")
    with pytest.raises(ValueError, match="shutdown type"):
        put_node_shutdown("n3", "nuke", "no")

    delete_node_shutdown("n1")
    delete_node_shutdown("n2")
    assert get_shutdown_status()["nodes"] == []
    with pytest.raises(KeyError):
        delete_node_shutdown("n1")


def test_match_bool_prefix_dsl(tiny_index):
    from elasticsearch_ray.search.dsl import parse_dsl
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import (
        BoolQuery,
        MatchQuery,
        PrefixQuery,
    )

    q = parse_dsl({"match_bool_prefix": {"text": {"query": "spark jo"}}})
    assert q == BoolQuery(should=(MatchQuery("spark"), PrefixQuery("jo")))

    eng = QueryEngine(tiny_index, dtype="float64")
    got = eng.search(q, k=30, fetch=("doc_id",)).to_pandas()
    manual = eng.search(BoolQuery(should=(
        MatchQuery("spark"), PrefixQuery("jo"))), k=30,
        fetch=("doc_id",)).to_pandas()
    assert got.doc_id.tolist() == manual.doc_id.tolist()
    assert len(got) > 0


def test_snapshot_clone_shares_blobs(tiny_index, tmp_path):
    from elasticsearch_ray.index.snapshot import (
        cleanup_repository,
        snapshot_clone,
        snapshot_restore,
    )

    repo = str(tmp_path / "repo_clone")
    man = snapshot_create(tiny_index, repo, "snap-a")
    blobs_before = sorted(os.listdir(os.path.join(repo, "blobs")))
    clone = snapshot_clone(repo, "snap-a", "snap-b")
    # zero data copied: the blob store is unchanged, manifests match
    assert sorted(os.listdir(os.path.join(repo, "blobs"))) == blobs_before
    assert clone["cloned_from"] == "snap-a"
    assert clone["file_map"] == man["file_map"]
    assert clone["reused_files"] == clone["files"] == man["files"]
    assert {m["snapshot"] for m in snapshot_list(repo)} \
        == {"snap-a", "snap-b"}
    # a clone is a first-class snapshot: restore works after the source
    # is deleted, and the shared blobs survive that delete
    snapshot_delete(repo, "snap-a")
    dst = str(tmp_path / "restored_clone")
    snapshot_restore(repo, "snap-b", dst)
    assert os.path.exists(os.path.join(dst, "index_meta.json"))
    with pytest.raises(ValueError, match="already exists"):
        snapshot_clone(repo, "snap-b", "snap-b")
    with pytest.raises(FileNotFoundError):
        snapshot_clone(repo, "missing", "snap-c")


def test_snapshot_clone_index_subset(tiny_index, tmp_path):
    from elasticsearch_ray.index.snapshot import snapshot_clone

    repo = str(tmp_path / "repo_subset")
    man = snapshot_create(tiny_index, repo, "full")
    sub = snapshot_clone(repo, "full", "parts-only", indices=["parts"])
    assert sub["files"] > 0
    assert all(rel.startswith("parts" + os.sep)
               for rel in sub["file_map"])
    assert sub["files"] < man["files"]
    with pytest.raises(FileNotFoundError, match="nope"):
        snapshot_clone(repo, "full", "x", indices=["nope"])


def test_cleanup_repository_sweeps_orphans(tiny_index, tmp_path):
    from elasticsearch_ray.index.snapshot import cleanup_repository

    repo = str(tmp_path / "repo_gc")
    snapshot_create(tiny_index, repo, "keep")
    blobs = os.path.join(repo, "blobs")
    # plant an orphan blob + a stale .tmp manifest dir
    with open(os.path.join(blobs, "deadbeef"), "wb") as f:
        f.write(b"x" * 100)
    os.makedirs(os.path.join(repo, "broken.tmp"))
    out = cleanup_repository(repo)
    assert out == {"deleted_blobs": 1, "deleted_bytes": 100}
    assert not os.path.exists(os.path.join(blobs, "deadbeef"))
    assert not os.path.exists(os.path.join(repo, "broken.tmp"))
    # live blobs untouched
    assert snapshot_list(repo)[0]["snapshot"] == "keep"
    assert cleanup_repository(repo) == {"deleted_blobs": 0,
                                        "deleted_bytes": 0}
