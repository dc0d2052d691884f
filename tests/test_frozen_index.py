"""Frozen indices (x-pack frozen-indices TransportFreezeIndexAction /
FrozenEngine): transient per-search readers, search_throttled
one-at-a-time semantics, persisted flag."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery


@pytest.fixture(scope="module")
def fz_index(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index

    root = tmp_path_factory.mktemp("fz")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(5)
    words = ["spark", "join", "merge", "sort"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array([" ".join(rng.choice(words, 8))
                          for _ in range(40)]),
    }), f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="docs.parquet")
    return idx


def _eng(idx):
    from elasticsearch_ray.search.engine import QueryEngine

    return QueryEngine(idx, dtype="float64")


def test_frozen_results_equal_and_readers_released(fz_index):
    eng = _eng(fz_index)
    warm = eng.search(MatchQuery("spark join"), k=10,
                      fetch=("doc_id",)).to_pandas()
    assert len(eng._searchers) > 0  # warm engine caches readers
    eng.freeze()
    assert eng._searchers == {}
    frozen = eng.search(MatchQuery("spark join"), k=10,
                        fetch=("doc_id",)).to_pandas()
    assert frozen.doc_id.tolist() == warm.doc_id.tolist()
    assert np.allclose(frozen.score, warm.score)
    # transient: nothing retained after the search finishes
    assert eng._searchers == {} and eng._scorer_cache == {}
    eng.unfreeze()
    eng.search(MatchQuery("spark"), k=5, fetch=("doc_id",))
    assert len(eng._searchers) > 0  # caching restored


def test_frozen_flag_persists_across_reopen(fz_index):
    eng = _eng(fz_index)
    eng.freeze()
    eng2 = _eng(fz_index)
    assert eng2.frozen is True
    eng2.search(MatchQuery("merge"), k=5, fetch=("doc_id",))
    assert eng2._searchers == {}
    eng2.unfreeze()
    assert _eng(fz_index).frozen is False


def test_frozen_searches_serialize(fz_index):
    import threading

    eng = _eng(fz_index)
    eng.freeze()
    active = []
    overlap = []

    orig = eng._search_unfrozen

    def traced(*a, **kw):
        active.append(1)
        overlap.append(len(active))
        try:
            return orig(*a, **kw)
        finally:
            active.pop()

    eng._search_unfrozen = traced
    threads = [threading.Thread(
        target=lambda: eng.search(MatchQuery("spark"), k=5,
                                  fetch=("doc_id",)))
        for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert max(overlap) == 1  # search_throttled: never concurrent
    eng.unfreeze()


def test_frozen_count_releases_readers(fz_index):
    """Review r5 #4: count() honors the frozen contract too."""
    eng = _eng(fz_index)
    eng.freeze()
    n = eng.count(MatchQuery("spark"))
    assert n > 0
    assert eng._searchers == {}
    eng.unfreeze()
