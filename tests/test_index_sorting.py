"""Index sorting (index.sort.field/order — IndexSettings + Lucene
setIndexSort): sorted build staging, early-terminating sorted queries,
exactness vs the generic sort path, pagination, and fallbacks."""

import numpy as np
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_pair(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf(SF_DIR, multiplier=1, num_files=3)
    plain_idx = str(tmp_path_factory.mktemp("plainidx") / "index")
    build_index(corpus, plain_idx, IndexSpec(files_per_partition=1), concurrency=2)
    sorted_idx = str(tmp_path_factory.mktemp("sortedidx") / "index")
    build_index(corpus, sorted_idx,
                IndexSpec(files_per_partition=1, sort_field="url",
                          sort_order="asc"), concurrency=2)
    return (QueryEngine(plain_idx, dtype="float64"),
            QueryEngine(sorted_idx, dtype="float64"))


def _early_hits(eng):
    return sum(getattr(eng._searcher(p), "sorted_early_hits", 0)
               for p in eng.parts)


def test_sorted_storage_order(sorted_pair):
    """Staged docs are stored in sort-field order within every partition."""
    _plain, eng = sorted_pair
    for p in eng.parts:
        urls = eng._searcher(p)._doc_col("url")
        assert list(urls) == sorted(urls)


def test_sorted_query_early_terminates_and_matches_generic(sorted_pair):
    """The sorted index takes the early-termination path (evidence counter)
    and returns exactly the unsorted index's result set and order."""
    plain, eng = sorted_pair
    q = MatchQuery("spark")
    before = _early_hits(eng)
    t_sorted = eng.search(q, k=15, sort=[("url", "asc")], fetch=("url",))
    assert _early_hits(eng) > before  # pruning-evidence pattern
    t_plain = plain.search(q, k=15, sort=[("url", "asc")], fetch=("url",))
    assert t_sorted["url"].to_pylist() == t_plain["url"].to_pylist()
    # early-terminated hits carry no score (the reference's null _score)
    assert np.isnan(t_sorted["score"].to_numpy(zero_copy_only=False)).all()
    assert _early_hits(plain) == 0


def test_sorted_query_pagination(sorted_pair):
    """search_after on the early-termination path is exact (cursor with the
    implicit _shard_doc tiebreak)."""
    _plain, eng = sorted_pair
    q = MatchQuery("spark")
    full = eng.search(q, k=20, sort=[("url", "asc")], fetch=("url",))
    p1 = eng.search(q, k=10, sort=[("url", "asc")], fetch=("url",))
    last = p1.to_pylist()[-1]
    cur = (last["url"], last["part"], last["local"])
    p2 = eng.search(q, k=10, sort=[("url", "asc")], search_after=cur,
                    fetch=("url",))
    assert full["url"].to_pylist() == p1["url"].to_pylist() + p2["url"].to_pylist()


def test_wrong_direction_falls_back(sorted_pair):
    """A sort in the opposite direction (or another field) must NOT take the
    early path, and still gives the generic results."""
    plain, eng = sorted_pair
    q = MatchQuery("spark")
    before = _early_hits(eng)
    t_desc = eng.search(q, k=10, sort=[("warc_ts", "desc")], fetch=("warc_ts",))
    t_other = eng.search(q, k=10, sort=[("warc_ts", "asc")], fetch=("warc_ts",))
    assert _early_hits(eng) == before
    t_plain = plain.search(q, k=10, sort=[("warc_ts", "desc")], fetch=("warc_ts",))
    assert t_desc["warc_ts"].to_pylist() == t_plain["warc_ts"].to_pylist()
    ts = t_other["warc_ts"].to_pylist()
    assert ts == sorted(ts)


def test_sorted_build_resume_reuses_staging(ray_session, tmp_path_factory):
    """Rebuilding with unchanged inputs reuses both the staged sorted corpus
    (marker identity) and the per-partition manifests."""
    import os

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.sources.webpages import corpus_for_sf

    corpus = corpus_for_sf(SF_DIR, multiplier=1, num_files=3)
    idx = str(tmp_path_factory.mktemp("resume_sorted") / "index")
    spec = IndexSpec(files_per_partition=2, sort_field="url")
    build_index(corpus, idx, spec, concurrency=2)
    staged = os.path.join(idx, "sorted_corpus")
    mtimes = {f: os.path.getmtime(os.path.join(staged, f))
              for f in os.listdir(staged)}
    build_index(corpus, idx, spec, concurrency=2)
    mtimes2 = {f: os.path.getmtime(os.path.join(staged, f))
               for f in os.listdir(staged)}
    assert mtimes == mtimes2
