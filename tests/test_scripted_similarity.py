"""scripted similarity (SimilarityProviders scripted option /
ScriptedSimilarity.java): sandboxed per-(term, doc) scoring over the
reference's variable set, optional once-per-term weight script."""

import os

import numpy as np
import pytest

from elasticsearch_ray.index.norms import LENGTH_TABLE
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.bm25 import ScriptedScorer, make_scorer
from elasticsearch_ray.search.query import MatchQuery, TermQuery


def test_scripted_scorer_variables_and_weight():
    # score = boost · weight · tf / dl with weight = ln(1 + N/df)
    sc = ScriptedScorer(
        "query.boost * weight * doc.freq / doc.length",
        df=4, doc_count=100, total_tokens=5000, ttf=9, boost=2.0,
        dtype="float64",
        weight_source="ln(1 + field.docCount / term.docFreq)")
    tfs = np.array([1.0, 3.0])
    norms = np.array([255, 255])  # LENGTH_TABLE[255] decodes a real dl
    dl = float(LENGTH_TABLE[255])
    want = 2.0 * np.log(1 + 100 / 4) * tfs / dl
    assert np.allclose(sc.score(tfs, norms), want)
    # term/field totals are visible to the script
    sc2 = ScriptedScorer("term.totalTermFreq + field.sumTotalTermFreq",
                         df=4, doc_count=100, total_tokens=5000, ttf=9,
                         dtype="float64")
    assert np.allclose(sc2.score(tfs, norms), [5009.0, 5009.0])
    # unpruned-but-correct BMW bound
    assert np.isinf(sc.max_score(np.array([3]), np.array([255]))).all()


def test_scripted_rejects_untracked_sum_doc_freq():
    from elasticsearch_ray.search.expressions import ExpressionError

    with pytest.raises(ExpressionError):
        ScriptedScorer("field.sumDocFreq * doc.freq", df=1, doc_count=1,
                       dtype="float64").score(np.array([1.0]),
                                              np.array([255]))


def test_make_scorer_dict_dispatch():
    sc = make_scorer({"type": "scripted", "script": "doc.freq"},
                     df=1, doc_count=10, avgdl=5.0, params=None,
                     dtype="float64")
    assert isinstance(sc, ScriptedScorer)
    with pytest.raises(ValueError, match="unknown similarity"):
        make_scorer({"type": "mystery"}, 1, 10, 5.0, None)


@pytest.fixture(scope="module")
def scripted_engine(ray_session, tmp_path_factory):
    """Index whose similarity is scripted classic tf·idf:
    weight = ln(N/df), score = weight · sqrt(tf) / doc.length."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("scsim")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(3)
    words = ["spark", "join", "merge", "sort", "scan"]
    texts = [" ".join(rng.choice(words, 10)) for _ in range(50)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(50, dtype=np.int64)),
        "text": pa.array(texts),
    }), f"{corpus}/docs.parquet")
    idx = str(root / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     similarity={"type": "scripted",
                                 "script": "weight * sqrt(doc.freq) "
                                           "/ doc.length",
                                 "weight_script":
                                     "ln(field.docCount / term.docFreq)"})
    build_index(corpus, idx, spec, concurrency=2,
                file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64"), texts


def test_scripted_engine_matches_brute(scripted_engine):
    eng, texts = scripted_engine
    res = eng.search(TermQuery("spark"), k=100, mode="exhaustive",
                     fetch=("doc_id",)).to_pandas()
    got = dict(zip(res.doc_id, res.score))
    tfs = np.array([t.split().count("spark") for t in texts], float)
    df = int((tfs > 0).sum())
    dls = np.array([LENGTH_TABLE[
        np.searchsorted(LENGTH_TABLE, len(t.split()), side="right") - 1]
        for t in texts], float)
    w = np.log(50 / df)
    for d, s in got.items():
        assert s == pytest.approx(w * np.sqrt(tfs[d]) / dls[d], rel=1e-6)
    assert set(got) == set(np.flatnonzero(tfs > 0).tolist())


def test_scripted_engine_bmw_equals_exhaustive(scripted_engine):
    eng, _texts = scripted_engine
    a = eng.search(MatchQuery("spark join"), k=10, mode="exhaustive",
                   fetch=("doc_id",)).to_pandas()
    b = eng.search(MatchQuery("spark join"), k=10, mode="bmw",
                   fetch=("doc_id",)).to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert np.allclose(a.score, b.score)
