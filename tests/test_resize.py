"""_shrink/_split resize APIs: factor validations, result identity,
source untouched."""

import os

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.resize import (ResizeError, shrink_index,
                                            split_index)
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def four_part_index(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec

    corpus = tmp_path_factory.mktemp("rz_corpus")
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    n = len(t) // 8
    for i in range(8):
        part = t.slice(i * n, n if i < 7 else len(t) - 7 * n)
        pq.write_table(part, str(corpus / f"docs{i}.parquet"))
    idx = str(tmp_path_factory.mktemp("rz_idx") / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("lang",), files_per_partition=2)
    build_index(str(corpus), idx, spec, concurrency=2,
                file_pattern="docs*.parquet")
    return str(corpus), idx


def _hits(idx):
    from elasticsearch_ray.search.engine import QueryEngine

    return QueryEngine(idx, dtype="float64").search(
        MatchQuery("spark"), k=20, fetch=("doc_id",)).to_pandas()[
        ["doc_id", "score"]]


def test_shrink_identity_and_validation(four_part_index, tmp_path):
    import pandas as pd

    _corpus, idx = four_part_index
    want = _hits(idx)
    dst = str(tmp_path / "shrunk2")
    meta = shrink_index(idx, dst, 2)
    assert len(meta["parts"]) == 2
    pd.testing.assert_frame_equal(_hits(dst), want)
    # source untouched
    from elasticsearch_ray.index.resize import _meta

    assert len(_meta(idx)["parts"]) == 4
    dst1 = str(tmp_path / "shrunk1")
    meta = shrink_index(idx, dst1, 1)
    assert len(meta["parts"]) == 1
    pd.testing.assert_frame_equal(_hits(dst1), want)
    with pytest.raises(ResizeError, match="multiple"):
        shrink_index(idx, str(tmp_path / "bad"), 3)
    with pytest.raises(ResizeError, match="exists"):
        shrink_index(idx, dst, 2)


def test_split_identity_and_validation(four_part_index, tmp_path):
    import pandas as pd

    corpus, idx = four_part_index
    want = _hits(idx)
    dst = str(tmp_path / "split8")
    meta = split_index(idx, dst, 8, corpus, "docs*.parquet")
    assert len(meta["parts"]) == 8
    pd.testing.assert_frame_equal(_hits(dst), want)
    with pytest.raises(ResizeError, match="larger multiple"):
        split_index(idx, str(tmp_path / "bad"), 6, corpus)
    with pytest.raises(ResizeError, match="larger multiple"):
        split_index(idx, str(tmp_path / "bad"), 4, corpus)
    with pytest.raises(ResizeError, match="divide evenly"):
        # factor 4 > files_per_partition 2's divisor... 2 % 4 != 0
        split_index(idx, str(tmp_path / "bad"), 16, corpus,
                    "docs*.parquet")


def test_clone_identity_and_validation(four_part_index, tmp_path):
    import pandas as pd

    from elasticsearch_ray.index.resize import clone_index

    _corpus, idx = four_part_index
    want = _hits(idx)
    dst = str(tmp_path / "cloned")
    meta = clone_index(idx, dst)
    assert len(meta["parts"]) == 4  # same shard count (ResizeType.CLONE)
    pd.testing.assert_frame_equal(_hits(dst), want)
    with pytest.raises(ResizeError, match="exists"):
        clone_index(idx, dst)
