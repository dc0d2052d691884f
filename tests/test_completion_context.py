"""Completion suggester category contexts (ContextMappings /
CategoryContextMapping + CategoryQueryContext): filter + boost semantics
over the fielded-postings intersection path."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.engine import QueryEngine


@pytest.fixture(scope="module")
def ctx_engine(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("ctxidx")
    # crafted corpus: term df per category is known exactly
    rows = (
        [("alpha beta", "news")] * 5        # alpha: news df 5
        + [("alpha gamma", "blog")] * 3     # alpha: blog df 3
        + [("alert beta", "blog")] * 4      # alert: blog df 4
        + [("archive beta", "wiki")] * 6    # archive: only wiki
    )
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows]),
        "cat": pa.array([r[1] for r in rows]),
    })
    corpus = str(base / "corpus")
    os.makedirs(corpus)
    pq.write_table(t, os.path.join(corpus, "docs.parquet"))
    idx = str(base / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("cat",),
                     fields={"cat": "cat"},
                     field_analyzers={"cat": "keyword"},
                     files_per_partition=1)
    build_index(corpus, idx, spec, concurrency=2,
                file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64")


def test_context_filter_excludes_other_categories(ctx_engine):
    # wiki not requested → 'archive' (wiki-only) must not appear
    out = ctx_engine.complete_ctx(
        "a", {"cat": ["news", "blog"]}, size=10)
    texts = [r["text"] for r in out]
    assert "archive" not in texts
    assert set(texts) == {"alpha", "alert"}


def test_context_boost_reorders(ctx_engine):
    # unboosted: alpha df(news 5 + blog 3)=8 beats alert df(blog 4)
    out = ctx_engine.complete_ctx("a", {"cat": ["news", "blog"]}, size=2)
    assert [r["text"] for r in out] == ["alpha", "alert"]
    # blog boosted 5x: alert 4*5=20 beats alpha 5*1+3*5=20 → tie,
    # term asc → alert first... craft boost 6 to break clean:
    # alert 4*6=24 > alpha 5+3*6=23
    out = ctx_engine.complete_ctx(
        "a", {"cat": [{"context": "news", "boost": 1.0},
                      {"context": "blog", "boost": 6.0}]}, size=2)
    assert [r["text"] for r in out] == ["alert", "alpha"]
    assert out[0]["score"] == 24.0 and out[1]["score"] == 23.0


def test_context_per_context_dfs_reported(ctx_engine):
    out = ctx_engine.complete_ctx("alpha", {"cat": ["news", "blog"]})
    assert out[0]["contexts"] == {"blog": 3, "news": 5}


def test_context_single_field_contract(ctx_engine):
    with pytest.raises(ValueError):
        ctx_engine.complete_ctx("a", {"cat": ["news"], "lang": ["en"]})


def test_context_unknown_value_empty(ctx_engine):
    assert ctx_engine.complete_ctx("a", {"cat": ["nope"]}) == []
