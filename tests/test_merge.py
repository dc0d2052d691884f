"""Gate: merged segments are score-identical to unmerged (SURVEY §7 M6)."""

import shutil

import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchPhraseQuery, MatchQuery, TermQuery


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf("/root/testdata/sf0.001", multiplier=1, num_files=6)
    base = tmp_path_factory.mktemp("merge")
    idx_a = str(base / "unmerged")
    idx_b = str(base / "merged")
    build_index(corpus, idx_a, IndexSpec(files_per_partition=1), concurrency=2)
    build_index(corpus, idx_b, IndexSpec(files_per_partition=1), concurrency=2)
    return idx_a, idx_b


def _results(idx, queries, dtype="float64"):
    from elasticsearch_ray.search.engine import QueryEngine

    eng = QueryEngine(idx, dtype=dtype)
    out = []
    for q in queries:
        t = eng.search(q, k=20, mode="exhaustive", fetch=("url", "doc_id"))
        out.append([(r["doc_id"], round(r["score"], 10), r["url"]) for r in t.to_pylist()])
    return out


QUERIES = [
    MatchQuery("spark join merge"),
    MatchQuery("the fast", operator="and"),
    TermQuery("window"),
    MatchPhraseQuery("batch batch"),
]


def test_force_merge_score_identical(two_indexes, ray_session):
    from elasticsearch_ray.index.merge import force_merge

    idx_a, idx_b = two_indexes
    before = _results(idx_b, QUERIES)
    meta = force_merge(idx_b, max_segments=2)
    assert meta["num_parts"] == 2
    assert _results(idx_b, QUERIES) == before == _results(idx_a, QUERIES)
    # BMW on merged index still equals exhaustive
    from elasticsearch_ray.search.engine import QueryEngine

    eng = QueryEngine(idx_b, dtype="float32")
    for q in QUERIES[:3]:
        a = eng.search(q, k=10, mode="bmw").to_pylist()
        b = eng.search(q, k=10, mode="exhaustive").to_pylist()
        assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


def test_force_merge_single_segment(two_indexes, ray_session, tmp_path):
    import shutil

    from elasticsearch_ray.index.merge import force_merge

    idx_a, idx_b = two_indexes
    # merge a COPY: the module-scoped fixture is shared with the 6→2 merge
    # test, and mutating idx_b here would make the tests order-dependent
    idx_c = str(tmp_path / "copy")
    shutil.copytree(idx_b, idx_c)
    meta = force_merge(idx_c, max_segments=1)
    assert meta["num_parts"] == 1
    assert _results(idx_c, QUERIES) == _results(idx_a, QUERIES)


def test_plan_tiered_merges():
    from elasticsearch_ray.index.merge import plan_tiered_merges

    small = [{"part": i, "bytes": 1024} for i in range(25)]
    groups = plan_tiered_merges(small)
    assert all(len(g) <= 10 for g in groups)
    assert sum(len(g) for g in groups) >= 20  # below-floor segments merge eagerly
    big = [{"part": i, "bytes": 6 * 1024**3} for i in range(3)]
    assert plan_tiered_merges(big) == []


def test_tiered_merge_rounds(ray_session, tmp_path_factory):
    """tiered_merge: below-floor segments merge eagerly; scores unchanged."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.merge import tiered_merge
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf("/root/testdata/sf0.001", multiplier=1, num_files=6)
    idx = str(tmp_path_factory.mktemp("tiered") / "index")
    build_index(corpus, idx, IndexSpec(files_per_partition=1), concurrency=2)
    before = _results(idx, QUERIES)
    meta = tiered_merge(idx)  # all 6 tiny segments are below the 2MB floor
    assert meta["num_parts"] < 6
    assert _results(idx, QUERIES) == before


def test_snapshot_create_restore_roundtrip(two_indexes, ray_session, tmp_path):
    """Snapshot → delete original → restore → identical query results;
    incomplete (.tmp) snapshots are invisible to list/restore."""
    import shutil

    from elasticsearch_ray.index.snapshot import (snapshot_create,
                                                  snapshot_delete,
                                                  snapshot_list,
                                                  snapshot_restore)

    idx_a, _ = two_indexes
    repo = str(tmp_path / "repo")
    before = _results(idx_a, QUERIES)
    man = snapshot_create(idx_a, repo, "snap1")
    assert man["files"] > 0 and man["bytes"] > 0
    assert [m["snapshot"] for m in snapshot_list(repo)] == ["snap1"]
    import pytest as _pt

    with _pt.raises(ValueError):
        snapshot_create(idx_a, repo, "snap1")  # immutable
    restored = str(tmp_path / "restored")
    snapshot_restore(repo, "snap1", restored)
    assert _results(restored, QUERIES) == before
    # a killed snapshot (.tmp leftover) is invisible
    import os

    os.makedirs(os.path.join(repo, "dead.tmp"))
    assert [m["snapshot"] for m in snapshot_list(repo)] == ["snap1"]
    with _pt.raises(FileNotFoundError):
        snapshot_restore(repo, "dead", str(tmp_path / "x"))
    snapshot_delete(repo, "snap1")
    assert snapshot_list(repo) == []


def test_snapshot_name_validation(tmp_path):
    import pytest as _pt

    from elasticsearch_ray.index.snapshot import snapshot_create, snapshot_delete

    for bad in ("", "..", "a/b", "x.tmp", "../../evil"):
        with _pt.raises(ValueError):
            snapshot_create("/nonexistent", str(tmp_path), bad)
        with _pt.raises(ValueError):
            snapshot_delete(str(tmp_path), bad)
