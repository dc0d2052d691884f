"""mapper-size plugin (SizeFieldMapper): index-time `_size` doc column =
_source byte length, filterable and sortable with no query-time I/O."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    BoolQuery,
    MatchAllQuery,
    RangeFilter,
)

TEXTS = ["short words", "a much longer document with many more words here",
         "Grüße aus Köln",  # multi-byte: byte length > char length
         ""]


@pytest.fixture(scope="module")
def size_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("szidx")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
        "text": pa.array(TEXTS),
    }), f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          size_field=True),
                concurrency=2, file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64")


def test_size_column_is_source_byte_length(size_engine):
    res = size_engine.search(MatchAllQuery(), k=10,
                             fetch=("doc_id", "_size")).to_pandas()
    got = dict(zip(res.doc_id, res._size))
    for i, t in enumerate(TEXTS):
        assert got[i] == len(t.encode("utf-8")), t
    # multi-byte doc: bytes strictly exceed chars
    assert got[2] > len(TEXTS[2])


def test_size_range_filter_and_sort(size_engine):
    q = BoolQuery(must=(MatchAllQuery(),),
                  filter=(RangeFilter(column="_size", gte=13),))
    res = size_engine.search(q, k=10, fetch=("doc_id",)).to_pandas()
    want = sorted(i for i, t in enumerate(TEXTS)
                  if len(t.encode()) >= 13)
    assert sorted(res.doc_id.tolist()) == want
    srt = size_engine.search(MatchAllQuery(), k=10,
                             fetch=("doc_id", "_size"),
                             sort=[("_size", "desc")]).to_pandas()
    assert srt._size.is_monotonic_decreasing


def test_size_absent_without_flag(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("szoff")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["hello"]),
    }), f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text"),
                concurrency=1, file_pattern="docs.parquet")
    eng = QueryEngine(idx, dtype="float64")
    import pyarrow.parquet as _pq

    from elasticsearch_ray.index.segments import part_dir

    cols = _pq.read_schema(os.path.join(part_dir(idx, eng.parts[0]),
                                        "docs.parquet")).names
    assert "_size" not in cols
