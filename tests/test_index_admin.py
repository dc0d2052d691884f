"""Index-administration APIs (rest/action/admin/indices analogs):
open/close, API blocks, mappings, dynamic settings, _stats/_recovery,
flush/refresh/clear_cache — admin.json is exec-only state (never in the
spec fingerprint: toggling must not rebuild)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index import admin
from elasticsearch_ray.index.admin import (
    ClusterBlockError,
    IndexClosedError,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf("/root/testdata/sf0.001", multiplier=1,
                           num_files=2)
    idx = str(tmp_path_factory.mktemp("admin_idx") / "index")
    build_index(corpus, idx, IndexSpec(files_per_partition=1),
                concurrency=2)
    return idx, corpus, QueryEngine(idx)


def test_close_open_blocks_search_and_build(built):
    idx, corpus, engine = built
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.query import MatchQuery

    assert engine.search(MatchQuery("spark"), k=3).num_rows > 0
    admin.close_index(idx)
    with pytest.raises(IndexClosedError):
        engine.search(MatchQuery("spark"), k=3)
    with pytest.raises(IndexClosedError):
        engine.count(MatchQuery("spark"))
    with pytest.raises(IndexClosedError):
        build_index(corpus, idx)
    admin.open_index(idx)
    assert engine.search(MatchQuery("spark"), k=3).num_rows > 0


def test_api_blocks(built):
    idx, corpus, engine = built
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.query import MatchQuery

    admin.add_index_block(idx, "read")
    with pytest.raises(ClusterBlockError):
        engine.search(MatchQuery("spark"), k=3)
    admin.remove_index_block(idx, "read")
    admin.add_index_block(idx, "write")
    with pytest.raises(ClusterBlockError):
        build_index(corpus, idx)
    # read still allowed under a write block
    assert engine.search(MatchQuery("spark"), k=3).num_rows > 0
    admin.remove_index_block(idx, "write")
    with pytest.raises(ValueError):
        admin.add_index_block(idx, "nonsense")


def test_mappings_additive_only(built):
    idx, corpus, engine = built
    m = admin.get_mapping(idx, engine.spec)
    assert m["properties"]["text"]["type"] == "text"
    assert m["properties"]["url"]["type"] == "keyword"
    admin.put_mapping(idx, {"rating": {"type": "float"}}, engine.spec)
    assert admin.get_mapping(idx, engine.spec)["properties"][
        "rating"] == {"type": "float"}
    with pytest.raises(ValueError, match="cannot be changed"):
        admin.put_mapping(idx, {"text": {"type": "keyword"}}, engine.spec)
    # same-type re-put is fine (reference: a no-op merge)
    admin.put_mapping(idx, {"rating": {"type": "float"}}, engine.spec)


def test_dynamic_settings_and_live_mrw(built):
    idx, corpus, engine = built
    from elasticsearch_ray.search.query import MatchQuery

    with pytest.raises(ValueError, match="non dynamic"):
        admin.update_settings(idx, {"index.sort.field": "url"})
    admin.update_settings(idx, {"index.max_result_window": 5})
    assert admin.get_settings(idx, engine.spec)[
        "index.max_result_window"] == 5
    # applies LIVE to the already-open engine (dynamic contract)
    with pytest.raises(ValueError, match="Result window"):
        engine.search(MatchQuery("spark"), k=50)
    admin.update_settings(idx, {"index.max_result_window": None})
    assert engine.search(MatchQuery("spark"), k=50).num_rows > 0
    # blocks route through settings too
    admin.update_settings(idx, {"index.blocks.read": True})
    with pytest.raises(ClusterBlockError):
        engine.search(MatchQuery("spark"), k=3)
    admin.update_settings(idx, {"index.blocks.read": False})


def test_stats_recovery_flush_refresh(built):
    idx, corpus, engine = built
    st = admin.indices_stats(idx)
    assert st["docs"]["count"] > 0
    assert st["segments"]["count"] >= 1
    assert st["store"]["size_in_bytes"] > 0
    rec = admin.recovery(idx)
    assert len(rec["shards"]) == st["segments"]["count"]
    assert all(s["stage"] == "DONE" for s in rec["shards"])
    assert rec["shards"][0]["index"]["docs"] > 0
    fl = admin.flush(idx)
    assert fl["_shards"]["failed"] == 0
    admin.refresh(engine)  # must not break subsequent searches
    from elasticsearch_ray.search.query import MatchQuery

    assert engine.search(MatchQuery("spark"), k=3).num_rows > 0


def test_snapshot_based_part_recovery(built, tmp_path_factory):
    """snapshot-based-recoveries analog: a lost partition is
    re-materialized from the repo (no re-tokenize); _recovery then
    reports that shard as SNAPSHOT-sourced; results are identical."""
    import shutil

    from elasticsearch_ray.index.snapshot import (
        recover_part_from_snapshot,
        snapshot_create,
    )
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery

    idx, corpus, engine = built
    repo = str(tmp_path_factory.mktemp("repo"))
    snapshot_create(idx, repo, "snap1")
    before = engine.search(MatchQuery("spark join"), k=10,
                           fetch=("url",)).to_pydict()
    # lose part 1
    part_dir = os.path.join(idx, "parts", "part=00001")
    shutil.rmtree(part_dir)
    res = recover_part_from_snapshot(idx, 1, repo)
    assert res["snapshot"] == "snap1" and res["files"] >= 4
    fresh = QueryEngine(idx)
    after = fresh.search(MatchQuery("spark join"), k=10,
                         fetch=("url",)).to_pydict()
    assert after == before
    rec = admin.recovery(idx)
    types = {s["id"]: s["type"] for s in rec["shards"]}
    assert types[1] == "SNAPSHOT" and types[0] == "STORE"
    # compatibility + block guards
    with pytest.raises(FileNotFoundError):
        recover_part_from_snapshot(idx, 99, repo)
    admin.add_index_block(idx, "write")
    with pytest.raises(ClusterBlockError):
        recover_part_from_snapshot(idx, 1, repo)
    admin.remove_index_block(idx, "write")


def test_review_r5e_mixed_settings_batch_and_metadata_block(built):
    idx, corpus, engine = built
    # mixed batch: non-block setting must survive alongside a block
    admin.update_settings(idx, {"index.max_result_window": 7,
                                "index.blocks.read": True})
    s = admin.get_settings(idx, engine.spec)
    assert s["index.max_result_window"] == 7
    assert s["index.blocks.read"] is True
    admin.update_settings(idx, {"index.blocks.read": False,
                                "index.max_result_window": None})
    # metadata block forbids mapping/settings writes but not unblocking
    admin.add_index_block(idx, "metadata")
    with pytest.raises(ClusterBlockError):
        admin.put_mapping(idx, {"zz": {"type": "keyword"}}, engine.spec)
    with pytest.raises(ClusterBlockError):
        admin.update_settings(idx, {"index.max_result_window": 3})
    admin.update_settings(idx, {"index.blocks.metadata": False})
    admin.put_mapping(idx, {"zz": {"type": "keyword"}}, engine.spec)


def test_review_r5f_unblock_plus_setting_one_batch(built):
    idx, corpus, engine = built
    admin.add_index_block(idx, "metadata")
    # ONE batch lifts the block and applies a setting — must succeed
    admin.update_settings(idx, {"index.blocks.metadata": False,
                                "index.max_result_window": 11})
    assert admin.get_settings(idx, engine.spec)[
        "index.max_result_window"] == 11
    admin.update_settings(idx, {"index.max_result_window": None})
