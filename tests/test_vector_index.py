"""Persistent HNSW vector index (index/vectors.py) — graphs built ONCE at
index time, memmapped at query time (the Lucene HNSW-segment-file model,
Lucene91HnswVectorsFormat). Round-3 verdict #1 regression coverage."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _embeddings():
    return pq.read_table("/root/testdata/sf0.001/embeddings.parquet")


def _build(tmp_path, t, P=2):
    from elasticsearch_ray.index.vectors import build_vector_index

    idx = str(tmp_path / "vecidx")
    meta = build_vector_index(rd.from_arrow(t), idx, num_partitions=P)
    return idx, meta


def test_vector_index_brute_matches_exact(ray_session, tmp_path):
    """The persisted index's exhaustive route is bit-comparable to the
    per-call brute path (both float64 over float32-origin values)."""
    from elasticsearch_ray.index.vectors import VectorIndexReader
    from elasticsearch_ray.ops.ann import brute_topk

    t = _embeddings()
    idx, meta = _build(tmp_path, t)
    assert meta["n_total"] == len(t)
    qm = np.stack([np.asarray(v, np.float64) for v in t["embedding"][:6].to_pylist()])
    qids = t["vec_id"][:6].to_pylist()
    exact = brute_topk(rd.from_arrow(t), qids, qm, k=10)
    viaidx = VectorIndexReader(idx).topk(qids, qm, k=10, brute=True)
    pd.testing.assert_frame_equal(
        viaidx.astype({"neighbor_id": "int64"}),
        exact.astype({"neighbor_id": "int64"}))


def test_vector_index_hnsw_recall(ray_session, tmp_path):
    """Graph route recall@10 >= 0.95 vs exact, self-match on top."""
    from elasticsearch_ray.index.vectors import VectorIndexReader
    from elasticsearch_ray.ops.ann import brute_topk

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    qm = np.stack([np.asarray(v, np.float64) for v in t["embedding"][:8].to_pylist()])
    qids = t["vec_id"][:8].to_pylist()
    exact = brute_topk(rd.from_arrow(t), qids, qm, k=10)
    approx = VectorIndexReader(idx).topk(qids, qm, k=10, ef_search=80)
    recalls = []
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    assert np.mean(recalls) >= 0.95, recalls
    for q in qids:
        top = approx[approx["query_id"] == q].iloc[0]
        assert top["neighbor_id"] == q and top["cosine"] >= 0.999999


def test_vector_index_resume_skips_complete_parts(ray_session, tmp_path):
    """Rebuild over an intact index touches NOTHING; deleting one part's
    manifest rebuilds only that part (per-partition checkpoint/lineage)."""
    from elasticsearch_ray.index.vectors import build_vector_index, vpart_dir

    t = _embeddings()
    idx, _ = _build(tmp_path, t, P=3)
    mts = {p: os.path.getmtime(os.path.join(vpart_dir(idx, p), "manifest.json"))
           for p in range(3)}
    build_vector_index(rd.from_arrow(t), idx, num_partitions=3)
    for p in range(3):
        assert os.path.getmtime(
            os.path.join(vpart_dir(idx, p), "manifest.json")) == mts[p]
    os.remove(os.path.join(vpart_dir(idx, 1), "manifest.json"))
    build_vector_index(rd.from_arrow(t), idx, num_partitions=3)
    assert os.path.getmtime(
        os.path.join(vpart_dir(idx, 0), "manifest.json")) == mts[0]
    assert os.path.getmtime(
        os.path.join(vpart_dir(idx, 2), "manifest.json")) == mts[2]
    assert os.path.getmtime(
        os.path.join(vpart_dir(idx, 1), "manifest.json")) != mts[1]


def test_vector_index_warm_cache_no_rehydrate(ray_session, tmp_path):
    """The process-level searcher cache returns the SAME object across
    calls — a warm query rebuilds/rereads nothing (verdict #1: per-call
    graph construction was the 100-TB scale killer)."""
    from elasticsearch_ray.index.vectors import _cached_searcher, vpart_dir

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    pdir = vpart_dir(idx, 0)
    s1 = _cached_searcher(pdir)
    s2 = _cached_searcher(pdir)
    assert s1 is s2
    # graph arrays are memmaps, not heap copies
    assert isinstance(s1.graph.v, np.memmap)
    assert isinstance(s1.graph.adj[0], np.memmap)


def test_vector_index_actor_mode_matches_tasks(ray_session, tmp_path):
    """use_actors=True (pinned warm searcher actors) returns the same
    rows as the stateless-task mode, both routes."""
    from elasticsearch_ray.index.vectors import VectorIndexReader

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    qm = np.stack([np.asarray(v, np.float64) for v in t["embedding"][:4].to_pylist()])
    qids = t["vec_id"][:4].to_pylist()
    tasks = VectorIndexReader(idx)
    actors = VectorIndexReader(idx, use_actors=True)
    try:
        for brute in (True, False):
            a = tasks.topk(qids, qm, k=5, brute=brute)
            b = actors.topk(qids, qm, k=5, brute=brute)
            pd.testing.assert_frame_equal(a, b)
        # warm actors persist across calls
        assert len(actors._actors) == 2
        # a REBUILT partition (new manifest mtime) must not be served by
        # the old actor's memmaps — the actor recreates on revalidation
        import os
        import time

        from elasticsearch_ray.index.vectors import vpart_dir

        old = actors._actors[0]
        time.sleep(0.02)
        os.utime(os.path.join(vpart_dir(idx, 0), "manifest.json"))
        actors.topk(qids, qm, k=5, brute=True)
        assert actors._actors[0] is not old
    finally:
        actors.close()
        assert not actors._actors


def test_knn_index_search_routing(ray_session, tmp_path):
    """knn DSL over the persisted index: brute route == per-call exact
    baseline (scores + mapping); filter without stored metadata refuses
    with a clear rebuild hint."""
    from elasticsearch_ray.index.vectors import knn_index_search
    from elasticsearch_ray.ops.ann import brute_topk
    from elasticsearch_ray.search.dsl import parse_dsl

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    qv = [float(x) for x in t["embedding"][0].as_py()]
    q = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                           "k": 5, "num_candidates": 10_000, "boost": 2.0}})
    out = knn_index_search(idx, q)
    exact = brute_topk(rd.from_arrow(t), [0], np.asarray([qv]), k=5)
    assert out["vec_id"].tolist() == exact["neighbor_id"].tolist()
    np.testing.assert_allclose(
        out["_score"].to_numpy(),
        2.0 * (1 + exact["cosine"].to_numpy()) / 2, rtol=1e-9)

    # graph route (num_candidates < n): self-match still lands on top
    q2 = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                            "k": 5, "num_candidates": 60}})
    out2 = knn_index_search(idx, q2)
    assert out2["vec_id"].iloc[0] == 0

    # this index stored NO metadata columns → filtered knn must refuse
    # with a rebuild hint, not silently mis-serve
    q3 = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                            "k": 5, "num_candidates": 10_000,
                            "filter": {"term": {"label": 1}}}})
    with pytest.raises(ValueError, match="metadata_cols"):
        knn_index_search(idx, q3)


def _build_meta(tmp_path, t, P=2):
    from elasticsearch_ray.index.vectors import build_vector_index

    idx = str(tmp_path / "vecidx_meta")
    meta = build_vector_index(rd.from_arrow(t), idx, num_partitions=P,
                              metadata_cols=["label"])
    return idx, meta


def test_knn_index_filtered_brute_exact(ray_session, tmp_path):
    """Filtered knn served from the persisted index (round-4 weak item):
    with num_candidates covering the table, every partition brute-scans
    its survivors → rows identical to the per-call exact pre-filter path
    (the oracle's route)."""
    import pyarrow as pa

    from elasticsearch_ray.index.vectors import knn_index_search
    from elasticsearch_ray.ops.ann import brute_topk
    from elasticsearch_ray.search.dsl import parse_dsl

    t = _embeddings()
    idx, meta = _build_meta(tmp_path, t)
    assert meta["metadata_cols"] == ["label"]
    qv = [float(x) for x in t["embedding"][3].as_py()]
    q = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                           "k": 10, "num_candidates": 10_000_000,
                           "filter": {"term": {"label": 1}}}})
    out = knn_index_search(idx, q)
    survivors = t.filter(pa.compute.equal(t["label"], 1))
    exact = brute_topk(rd.from_arrow(survivors), [0], np.asarray([qv]), k=10)
    assert out["vec_id"].tolist() == exact["neighbor_id"].tolist()
    np.testing.assert_allclose(
        out["_score"].to_numpy(),
        (1 + exact["cosine"].to_numpy()) / 2, rtol=1e-9)
    # every hit satisfies the filter
    lbl = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert all(lbl[v] == 1 for v in out["vec_id"])


def test_knn_index_filtered_graph_route(ray_session, tmp_path):
    """Acceptance-mask graph traversal (num_candidates < survivor count,
    visited budget not exhausted): all hits satisfy the filter, self-match
    lands on top, and recall vs the exact filtered baseline is high. Uses
    a synthetic half-and-half-labelled table large enough that the
    traversal genuinely engages (the sf0.001 labels are ~10% each, which
    routes to the exact survivor scan)."""
    import pyarrow as pa

    from elasticsearch_ray.index.vectors import (
        VPartSearcher, build_vector_index, vpart_dir)
    from elasticsearch_ray.ops.ann import _normalize, brute_topk
    from elasticsearch_ray.search.dsl import parse_dsl

    rng = np.random.default_rng(11)
    n, d = 4000, 16
    vecs = rng.standard_normal((n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(list(vecs.astype(np.float64))),
        "label": pa.array((np.arange(n) % 2).astype(np.int32)),
    })
    idx = str(tmp_path / "synidx")
    build_vector_index(rd.from_arrow(t), idx, num_partitions=1,
                       metadata_cols=["label"])
    s = VPartSearcher(vpart_dir(idx, 0))
    mask = s.filter_mask((("label", 1),))
    assert int(mask.sum()) == n // 2
    qn = _normalize(vecs[1:2])[0]  # vec_id=1 has label 1
    ids, sims = s.search_filtered(qn, 10, 40, mask)
    assert len(ids) == 10
    assert ids[0] == 1 and sims[0] >= 0.999  # accepted self-match on top
    assert all(i % 2 == 1 for i in ids)  # every hit passes the filter
    survivors = t.filter(pa.compute.equal(t["label"], 1))
    exact = brute_topk(rd.from_arrow(survivors), [0],
                       vecs[1:2].astype(np.float64), k=10)
    rec = len(set(ids.tolist()) & set(exact["neighbor_id"])) / 10
    assert rec >= 0.8, rec
    # the end-to-end DSL route with a sub-survivor num_candidates also
    # returns only accepted hits with the self-match on top
    from elasticsearch_ray.index.vectors import knn_index_search
    q = parse_dsl({"knn": {"field": "embedding",
                           "query_vector": [float(x) for x in vecs[1]],
                           "k": 10, "num_candidates": 40,
                           "filter": {"term": {"label": 1}}}})
    out = knn_index_search(idx, q)
    assert out["vec_id"].iloc[0] == 1
    assert all(v % 2 == 1 for v in out["vec_id"])


def test_knn_index_filtered_never_builds_graphs(ray_session, tmp_path):
    """Regression for the round-4 weak item: the filtered serving body
    (_batch_topk, shared by the task and actor paths) must construct NO
    HNSWGraph — it may only rehydrate persisted arrays."""
    import elasticsearch_ray.ops.hnsw as hnsw_mod
    from elasticsearch_ray.index.vectors import (
        VPartSearcher, _batch_topk, vpart_dir)
    from elasticsearch_ray.ops.ann import _normalize

    t = _embeddings()
    idx, _ = _build_meta(tmp_path, t)
    searchers = [VPartSearcher(vpart_dir(idx, p)) for p in range(2)]
    qn = _normalize(np.stack(
        [np.asarray(v, np.float64) for v in t["embedding"][:3].to_pylist()]))
    orig = hnsw_mod.HNSWGraph.__init__

    def _boom(*a, **kw):
        raise AssertionError("filtered serving constructed an HNSWGraph")

    hnsw_mod.HNSWGraph.__init__ = _boom
    try:
        for brute in (True, False):
            for s in searchers:
                out = _batch_topk(s, [0, 1, 2], qn, k=5, ef=30, brute=brute,
                                  flt=(("label", 1),))
                assert len(out) > 0
    finally:
        hnsw_mod.HNSWGraph.__init__ = orig


def test_knn_index_filtered_empty_survivors(ray_session, tmp_path):
    """A filter matching nothing returns an empty frame, not an error."""
    from elasticsearch_ray.index.vectors import knn_index_search
    from elasticsearch_ray.search.dsl import parse_dsl

    t = _embeddings()
    idx, _ = _build_meta(tmp_path, t)
    qv = [float(x) for x in t["embedding"][0].as_py()]
    q = parse_dsl({"knn": {"field": "embedding", "query_vector": qv,
                           "k": 5, "num_candidates": 100,
                           "filter": {"term": {"label": 99}}}})
    out = knn_index_search(idx, q)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "_score"]


def test_vector_index_spec_mismatch_rebuilds(ray_session, tmp_path):
    """Resume must NOT trust manifests written under a different spec:
    re-requesting with fewer partitions/other graph params rebuilds
    (review finding: id%3-built parts served an id%2 request silently)."""
    import os

    from elasticsearch_ray.index.vectors import (
        VectorIndexReader, build_vector_index, vpart_dir)

    t = _embeddings()
    idx, _ = _build(tmp_path, t, P=3)
    meta = build_vector_index(rd.from_arrow(t), idx, num_partitions=2)
    assert meta["num_partitions"] == 2
    assert meta["n_total"] == len(t)  # every vector searchable again
    viaidx = VectorIndexReader(idx).topk(
        [0], np.asarray([t["embedding"][0].as_py()], np.float64),
        k=5, brute=True)
    assert len(viaidx) == 5
    # changed m also rebuilds
    mt = os.path.getmtime(os.path.join(vpart_dir(idx, 0), "manifest.json"))
    build_vector_index(rd.from_arrow(t), idx, num_partitions=2, m=8)
    assert os.path.getmtime(
        os.path.join(vpart_dir(idx, 0), "manifest.json")) != mt
    # changed input fingerprint also rebuilds
    mt = os.path.getmtime(os.path.join(vpart_dir(idx, 0), "manifest.json"))
    build_vector_index(rd.from_arrow(t), idx, num_partitions=2, m=8,
                       input_fingerprint="other-data")
    assert os.path.getmtime(
        os.path.join(vpart_dir(idx, 0), "manifest.json")) != mt


def test_vector_index_empty_partition_ok(ray_session, tmp_path):
    """A partition whose id residue receives zero rows is a valid empty
    part (n=0 manifest), not a build failure."""
    import pyarrow as pa

    from elasticsearch_ray.index.vectors import (
        VectorIndexReader, build_vector_index)

    t = _embeddings()
    even = t.filter(pa.compute.equal(
        pa.compute.bit_wise_and(t["vec_id"], 1), 0))
    idx = str(tmp_path / "evenidx")
    meta = build_vector_index(rd.from_arrow(even), idx, num_partitions=2)
    assert [p["n"] for p in meta["parts"]] == [len(even), 0]
    qm = np.asarray([even["embedding"][0].as_py()], np.float64)
    out = VectorIndexReader(idx).topk([0], qm, k=5, brute=True)
    assert len(out) == 5


def test_knn_index_search_field_mismatch(ray_session, tmp_path):
    from elasticsearch_ray.index.vectors import knn_index_search
    from elasticsearch_ray.search.dsl import parse_dsl

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    qv = [float(x) for x in t["embedding"][0].as_py()]
    q = parse_dsl({"knn": {"field": "other_vec", "query_vector": qv,
                           "k": 5, "num_candidates": 10_000}})
    with pytest.raises(ValueError, match="indexed vector column"):
        knn_index_search(idx, q)


def test_vector_index_stale_format_rebuilds(ray_session, tmp_path):
    """A manifest with a different format version is treated as absent."""
    import json

    from elasticsearch_ray.index.vectors import (
        _read_vpart_manifest, build_vector_index, vpart_dir)

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    mpath = os.path.join(vpart_dir(idx, 0), "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["format"] = -1
    with open(mpath, "w") as f:
        json.dump(m, f)
    assert _read_vpart_manifest(idx, 0) is None
    build_vector_index(rd.from_arrow(t), idx, num_partitions=2)
    assert _read_vpart_manifest(idx, 0) is not None


def _write_vec_file(src, name, ids, rng, d=8, label=None):
    import pyarrow as pa

    vecs = rng.standard_normal((len(ids), d))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float64))),
        "label": pa.array(np.full(len(ids), label if label is not None else 0,
                                  np.int32)),
    }), str(src / name))
    return vecs


def test_vector_index_incremental_append(ray_session, tmp_path):
    """File-ranged vparts with per-partition fingerprints: appending files
    builds ONLY new + boundary partitions; untouched parts' graph files
    and manifests are byte-/mtime-identical (the inverted index's
    incremental discipline, tests/test_incremental.py, applied to
    vectors — Lucene's new-rows-become-new-segments model)."""
    import time

    from elasticsearch_ray.index.vectors import (
        VectorIndexReader, build_vector_index_files, vpart_dir)

    rng = np.random.default_rng(5)
    src = tmp_path / "vsrc"
    src.mkdir()
    for i in range(4):
        _write_vec_file(src, f"v-{i:02d}.parquet",
                        range(i * 50, (i + 1) * 50), rng, label=i % 2)
    idx = str(tmp_path / "fidx")
    meta1 = build_vector_index_files(str(src), idx, files_per_partition=2,
                                     metadata_cols=["label"])
    assert meta1["num_partitions"] == 2 and meta1["n_total"] == 200
    watched = [os.path.join(vpart_dir(idx, p), f)
               for p in range(2)
               for f in ("manifest.json", "vnorm.npy", "vecs.parquet")]
    mts = {f: os.path.getmtime(f) for f in watched}

    # no-op rebuild touches nothing
    build_vector_index_files(str(src), idx, files_per_partition=2,
                             metadata_cols=["label"])
    assert {f: os.path.getmtime(f) for f in watched} == mts

    # append one file → ONE new partition; old parts untouched
    time.sleep(0.02)
    _write_vec_file(src, "v-04.parquet", range(200, 250), rng, label=1)
    meta2 = build_vector_index_files(str(src), idx, files_per_partition=2,
                                     metadata_cols=["label"])
    assert meta2["num_partitions"] == 3 and meta2["n_total"] == 250
    assert {f: os.path.getmtime(f) for f in watched} == mts

    # the reader serves the union, filtered route included
    reader = VectorIndexReader(idx)
    t0 = pq.read_table(str(src / "v-00.parquet"))
    qm = np.asarray([t0["embedding"][0].as_py()], np.float64)
    out = reader.topk([0], qm, k=250, brute=True)
    assert len(out) == 250
    # labels: files 0,2 → 0; files 1,3,4 → 1 ⇒ 150 rows with label=1
    out_f = reader.topk([0], qm, k=250, brute=True, flt=(("label", 1),))
    assert len(out_f) == 150

    # appending INTO the boundary slice (fpp=2, part 2 had 1 file)
    # rebuilds only part 2
    time.sleep(0.02)
    _write_vec_file(src, "v-05.parquet", range(250, 300), rng, label=0)
    meta3 = build_vector_index_files(str(src), idx, files_per_partition=2,
                                     metadata_cols=["label"])
    assert meta3["num_partitions"] == 3 and meta3["n_total"] == 300
    assert {f: os.path.getmtime(f) for f in watched} == mts


def test_hybrid_rrf_via_persisted_index(ray_session, tmp_path):
    """hybrid_rrf's vector leg served from the persisted index must equal
    the per-call brute leg row-for-row (same float64 store + rounding)."""
    from elasticsearch_ray.index.vectors import VectorIndexReader
    from elasticsearch_ray.ops.ann import brute_topk

    t = _embeddings()
    idx, _ = _build(tmp_path, t)
    qv = np.asarray([t["embedding"][3].as_py()], np.float64)
    via_idx = VectorIndexReader(idx).topk([0], qv, k=50, brute=True)
    via_brute = brute_topk(rd.from_arrow(t), [0], qv, k=50)
    pd.testing.assert_frame_equal(
        via_idx.astype({"neighbor_id": "int64"}),
        via_brute.astype({"neighbor_id": "int64"}))
