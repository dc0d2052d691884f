"""ILM rollover alias (x-pack/plugin/ilm RolloverAction + delete phase):
write-alias generations, OR'd conditions, cross-generation search,
retention."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.index.ilm import RolloverAlias
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


def _build_slice(corpus_dir, idx_dir, lo, hi):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").slice(lo, hi - lo)
    os.makedirs(corpus_dir, exist_ok=True)
    pq.write_table(t, os.path.join(corpus_dir, "docs.parquet"))
    build_index(corpus_dir, idx_dir,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",), files_per_partition=1),
                concurrency=1, file_pattern="docs.parquet")


@pytest.fixture(scope="module")
def rolled(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ilm") / "logs")
    ra = RolloverAlias(base)
    scratch = tmp_path_factory.mktemp("ilmsrc")
    _build_slice(str(scratch / "c1"), ra.current(), 0, 250)
    assert ra.rollover_if_needed(max_docs=200) is True
    _build_slice(str(scratch / "c2"), ra.current(), 250, 500)
    return ra


def test_rollover_conditions_or(ray_session, tmp_path):
    ra = RolloverAlias(str(tmp_path / "a"))
    # empty gen: no docs, age ~0 → none of the bounds trip
    assert ra.rollover_if_needed(max_docs=10, max_age_s=3600) is False
    # age condition alone trips immediately with a 0-second bound
    assert ra.rollover_if_needed(max_age_s=0) is True
    with pytest.raises(ValueError):
        ra.rollover_if_needed()


def test_generations_and_write_target(rolled):
    gens = rolled.generations()
    assert len(gens) == 2
    assert gens[0].endswith("gen-000001")
    assert rolled.current().endswith("gen-000002")


def test_cross_generation_search_counts(rolled):
    eng = rolled.engine(dtype="float64")
    hits = eng.search(MatchQuery("merge sort"), k=10**6,
                      fetch=("doc_id",))
    single_ids = set()
    for g in rolled.generations():
        from elasticsearch_ray.search.engine import QueryEngine

        e = QueryEngine(g, dtype="float64")
        single_ids |= {(g, r) for r in
                       e.search(MatchQuery("merge sort"), k=10**6,
                                fetch=("doc_id",))["doc_id"].to_pylist()}
        e.close()
    assert len(hits) == len(single_ids) > 0


def test_retention_keeps_write_generation(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ilmret") / "logs")
    ra = RolloverAlias(base)
    scratch = tmp_path_factory.mktemp("ilmretsrc")
    for i in range(3):
        _build_slice(str(scratch / f"c{i}"), ra.current(),
                     i * 100, (i + 1) * 100)
        ra.force_rollover()
    assert len(ra.generations()) == 3
    removed = ra.apply_retention(keep_last=2)
    assert len(removed) == 1 and removed[0].endswith("gen-000001")
    assert len(ra.generations()) == 2
    with pytest.raises(ValueError):
        ra.apply_retention(0)
