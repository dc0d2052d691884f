"""Conformance cases ported from the reference's YAML REST test corpus
(rest-api-spec/src/yamlRestTest/resources/rest-api-spec/test/) — declarative
do/match goldens re-expressed against our engine (SURVEY §5 'conformance
corpus' adoption). Each test cites its source fixture."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchAllQuery, MatchQuery, TermsQuery


def _build(tmp_path, rows, spec=None, name="conf"):
    """Index a tiny handwritten table (text column + extra doc columns)."""
    import ray.data  # noqa: F401  (ensures ray initialized via fixture)

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    src = tmp_path / f"{name}-src"
    src.mkdir()
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src / "docs.parquet")
    idx = str(tmp_path / f"{name}-idx")
    cols = tuple(c for c in df.columns if c != "text")
    spec = spec or IndexSpec(use_html=False, text_column="text", doc_columns=cols)
    build_index(str(src), idx, spec, concurrency=2)
    return QueryEngine(idx, dtype="float64")


def test_basic_search_default_values(ray_session, tmp_path):
    """search/20_default_values.yml 'Basic search': two docs with foo=bar →
    match query finds both; restricting the doc set finds one."""
    eng = _build(tmp_path, [{"id": "1", "text": "bar"}, {"id": "42", "text": "bar"}])
    hits = eng.search(MatchQuery("bar"), k=10, fetch=("id",))
    assert hits.num_rows == 2  # hits.total: 2
    assert hits["id"].to_pylist() == ["1", "42"]  # equal scores → doc order
    assert hits["score"][0].as_py() == hits["score"][1].as_py()


def test_field_collapsing(ray_session, tmp_path):
    """search/110_field_collapsing.yml 'field collapsing': 6 docs, collapse
    on numeric_group sorted by sort desc → hits [id 6 (36), id 3 (24),
    id 4 (10)]; 'and from': from=2 → [id 4]."""
    rows = [
        {"id": "1", "numeric_group": 1, "sort": 10, "text": "a"},
        {"id": "2", "numeric_group": 1, "sort": 6, "text": "b"},
        {"id": "3", "numeric_group": 1, "sort": 24, "text": "a"},
        {"id": "4", "numeric_group": 25, "sort": 10, "text": "b"},
        {"id": "5", "numeric_group": 25, "sort": 5, "text": "a"},
        {"id": "6", "numeric_group": 3, "sort": 36, "text": "b"},
    ]
    eng = _build(tmp_path, rows)
    total = eng.search(MatchAllQuery(), k=100, fetch=("id",))
    assert total.num_rows == 6  # hits.total: 6
    hits = eng.search(MatchAllQuery(), k=10, sort=[("sort", "desc")],
                      collapse="numeric_group", fetch=("id", "numeric_group", "sort"))
    assert hits.num_rows == 3  # length: 3
    assert hits["id"].to_pylist() == ["6", "3", "4"]
    assert hits["numeric_group"].to_pylist() == [3, 1, 25]
    assert hits["sort"].to_pylist() == [36, 24, 10]
    # 'field collapsing and from' (from=2 == skip first two collapsed hits)
    page = hits.slice(2)
    assert page["id"].to_pylist() == ["4"]


def test_terms_query(ray_session, tmp_path):
    """search/170_terms_query.yml spirit: terms query matches any listed term."""
    eng = _build(
        tmp_path,
        [
            {"id": "1", "text": "apple banana"},
            {"id": "2", "text": "cherry"},
            {"id": "3", "text": "durian fig"},
        ],
    )
    hits = eng.search(TermsQuery(terms=("banana", "fig")), k=10, fetch=("id",))
    assert sorted(hits["id"].to_pylist()) == ["1", "3"]


def test_boolean_similarity_differs_from_bm25(ray_session, tmp_path):
    """index/similarity SimilarityIT analog: boolean similarity scores are
    constant per clause; BM25 scores vary with tf/dl."""
    rows = [
        {"id": "1", "text": "quick quick quick brown fox"},
        {"id": "2", "text": "quick lazy dog over the fence and far away"},
    ]
    bm = _build(tmp_path, rows, name="bm")
    bo = _build(
        tmp_path,
        rows,
        spec=IndexSpec(use_html=False, text_column="text", doc_columns=("id",),
                       similarity="boolean"),
        name="bo",
    )
    s_bm = bm.search(MatchQuery("quick"), k=2).to_pylist()
    s_bo = bo.search(MatchQuery("quick"), k=2).to_pylist()
    assert s_bm[0]["score"] != s_bm[1]["score"]  # tf/dl sensitive
    assert s_bo[0]["score"] == s_bo[1]["score"] == 1.0  # constant
    # BMW == exhaustive also under boolean similarity
    a = bo.search(MatchQuery("quick dog"), k=2, mode="bmw").to_pylist()
    b = bo.search(MatchQuery("quick dog"), k=2, mode="exhaustive").to_pylist()
    assert [(r["local"], r["score"]) for r in a] == [(r["local"], r["score"]) for r in b]


def test_zero_terms_query(ray_session, tmp_path):
    """MatchQueryParser zeroTermsQuery: stop-worded-away query text matches
    nothing with 'none' (default) and everything with 'all'."""
    eng = _build(
        tmp_path,
        [{"id": "1", "text": "alpha"}, {"id": "2", "text": "beta"}],
        spec=IndexSpec(use_html=False, text_column="text", doc_columns=("id",),
                       analyzer="stop"),
        name="zt",
    )
    none_hits = eng.search(MatchQuery("the and of"), k=10)
    assert none_hits.num_rows == 0
    all_hits = eng.search(MatchQuery("the and of", zero_terms_query="all"), k=10)
    assert all_hits.num_rows == 2


def test_per_language_analyzer_dispatch(ray_session, tmp_path):
    """North-star surface: per-language tokenization — the lang column picks
    the analyzer per row (english docs are stemmed+stopworded, others use
    standard), loaded once per worker."""
    rows = [
        {"id": "1", "lang": "en", "text": "the running dogs are merging quickly"},
        {"id": "2", "lang": "de", "text": "the running dogs are merging quickly"},
        {"id": "3", "lang": "en", "text": "unrelated words entirely"},
    ]
    eng = _build(
        tmp_path,
        rows,
        spec=IndexSpec(use_html=False, text_column="text", doc_columns=("id", "lang"),
                       lang_analyzers={"en": "english"}),
        name="perlang",
    )
    # 'merges' analyzed with english stems to 'merg' → matches ONLY the en doc
    # (the de doc indexed literal 'merging' via standard)
    en_hits = eng.search(MatchQuery("merges", analyzer="english"), k=10, fetch=("id",))
    assert en_hits["id"].to_pylist() == ["1"]
    # literal 'merging' via standard matches ONLY the de doc
    std_hits = eng.search(MatchQuery("merging", analyzer="standard"), k=10, fetch=("id",))
    assert std_hits["id"].to_pylist() == ["2"]
    # english stopword 'the' was dropped from en docs but indexed for de
    the_hits = eng.search(MatchQuery("the", analyzer="standard"), k=10, fetch=("id",))
    assert the_hits["id"].to_pylist() == ["2"]


def test_empty_and_single_doc_index(ray_session, tmp_path):
    """Degenerate sizes: empty corpus and 1-doc corpus build and query."""
    import ray.data  # noqa: F401

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    # single doc
    eng = _build(tmp_path, [{"id": "only", "text": "lonely document"}], name="one")
    hits = eng.search(MatchQuery("lonely"), k=10, fetch=("id",))
    assert hits["id"].to_pylist() == ["only"]
    assert hits["score"][0].as_py() > 0
    assert eng.search(MatchQuery("absent"), k=10).num_rows == 0

    # empty corpus (a parquet file with zero rows)
    src = tmp_path / "empty-src"
    src.mkdir()
    pq.write_table(
        pa.table({"id": pa.array([], pa.string()), "text": pa.array([], pa.string())}),
        src / "docs.parquet",
    )
    idx = str(tmp_path / "empty-idx")
    meta = build_index(str(src), idx,
                       IndexSpec(use_html=False, text_column="text", doc_columns=("id",)),
                       concurrency=2)
    assert meta["n_docs"] == 0
    eng2 = QueryEngine(idx, dtype="float64")
    assert eng2.search(MatchQuery("anything"), k=5).num_rows == 0
    assert eng2.stats().to_pylist()[0]["n_docs"] == 0
