"""match_only_text field type (mapper-extras MatchOnlyTextFieldMapper):
index_options=docs + no norms, every query constant-score, positional
queries source-confirmed — plus scaled_float encode/range/stats."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    MatchPhraseQuery,
    MatchQuery,
    SpanNearQuery,
)

WORDS = ["spark", "join", "merge", "sort", "scan", "filter"]


@pytest.fixture(scope="module")
def mot_pair(ray_session, tmp_path_factory):
    """(positions index, match_only_text index) over the SAME corpus."""
    from elasticsearch_ray.index.build import build_index

    root = tmp_path_factory.mktemp("mot")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.RandomState(11)
    texts = []
    for i in range(60):
        toks = list(rng.choice(WORDS, 9))
        if i % 5 == 0:
            toks[3:5] = ["spark", "join"]  # planted exact phrase
        texts.append(" ".join(toks))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts),
    }), f"{corpus}/docs.parquet")
    pos_idx = str(root / "pos")
    build_index(corpus, pos_idx,
                IndexSpec(use_html=False, text_column="text"),
                concurrency=2, file_pattern="docs.parquet")
    mot_idx = str(root / "mot")
    build_index(corpus, mot_idx,
                IndexSpec(use_html=False, text_column="text",
                          similarity="match_only_text",
                          store_positions=False),
                concurrency=2, file_pattern="docs.parquet")
    return pos_idx, mot_idx


def _eng(idx):
    from elasticsearch_ray.search.engine import QueryEngine

    return QueryEngine(idx, dtype="float64")


def test_no_positions_stored(mot_pair):
    _pos, mot = mot_pair
    pdir = os.path.join(mot, "parts")
    parts = os.listdir(pdir)
    assert parts
    for p in parts:
        assert not os.path.exists(os.path.join(pdir, p, "positions.bin"))


def test_match_constant_scores_same_docs(mot_pair):
    pos, mot = mot_pair
    q = MatchQuery("spark join")
    ref = _eng(pos).search(q, k=100, fetch=("doc_id",)).to_pandas()
    got = _eng(mot).search(q, k=100, fetch=("doc_id",)).to_pandas()
    # matching semantics identical (postings are the same)
    assert set(got.doc_id) == set(ref.doc_id)
    # ConstantScoreQuery per term: score == number of matched terms
    e = _eng(pos)
    for _, row in got.iterrows():
        text = None
        # recover the doc's text from the corpus via the positions engine
        t = e.mget([int(row.doc_id)], columns=("doc_id",))
        assert t is not None
        matched = sum(1 for term in ("spark", "join")
                      if term in set(_doc_tokens(pos, int(row.doc_id))))
        assert row.score == pytest.approx(float(matched))


def _doc_tokens(pos_idx, doc_id):
    from elasticsearch_ray.search.termvectors import _source_text

    eng = _eng(pos_idx)
    text, _lang = _source_text(eng, doc_id, "text")
    return text.split()


def test_phrase_source_confirmed_equals_positions(mot_pair):
    pos, mot = mot_pair
    for slop in (0, 1):
        q = MatchPhraseQuery("spark join", slop=slop)
        ref = _eng(pos).search(q, k=100, fetch=("doc_id",)).to_pandas()
        got = _eng(mot).search(q, k=100, fetch=("doc_id",)).to_pandas()
        assert set(got.doc_id) == set(ref.doc_id), f"slop={slop}"
        assert len(got) > 0
        # constant score: every phrase hit scores exactly the boost
        assert np.allclose(got.score, 1.0)


def test_phrase_no_match_term_absent(mot_pair):
    _pos, mot = mot_pair
    got = _eng(mot).search(MatchPhraseQuery("spark quantum"), k=10,
                           fetch=("doc_id",)).to_pandas()
    assert len(got) == 0


def test_span_raises_without_positions(mot_pair):
    _pos, mot = mot_pair
    with pytest.raises(ValueError, match="positions"):
        _eng(mot).search(SpanNearQuery(clauses=("spark", "join"), slop=2,
                                       in_order=True), k=5)


# ----------------------------------------------------------- scaled_float

def test_scaled_encode_half_up():
    from elasticsearch_ray.ops.field_types import scaled_decode, scaled_encode

    vals = np.array([0.005, 0.014, 0.015, -0.005, 2.675])
    enc = scaled_encode(vals, 100.0)
    # Java Math.round = floor(x + 0.5): 0.5 -> 1, -0.5 -> 0; the float64
    # product 2.675*100 rounds to exactly 267.5 -> 268 (half-up, not
    # numpy's half-even 267/268 ambiguity)
    assert enc.tolist() == [1, 1, 2, 0, 268]
    dec = scaled_decode(enc, 100.0)
    assert dec.tolist() == [0.01, 0.01, 0.02, 0.0, 2.68]


def test_scaled_float_range_and_stats(ray_session):
    import ray

    from elasticsearch_ray.ops.field_types import (
        add_scaled_float,
        scaled_float_range,
        scaled_float_stats,
    )

    vals = np.array([0.004, 0.005, 1.0, 1.004, 1.005, 2.5, -0.6])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(vals), dtype=np.int64)),
        "v": pa.array(vals),
    })).repartition(3)
    ds = add_scaled_float(ds, "v", 100.0)

    # gte/lte inclusive: scaled domain [ceil(0.5)=1, floor(100.4999)=100]
    out = scaled_float_range(ds, "v", 100.0, gte=0.005, lte=1.005)
    got = sorted(out.to_pandas().doc_id.tolist())
    # encoded: [0, 1, 100, 100, 100, 250, -60] -> within [1,100]: 1,2,3,4
    assert got == [1, 2, 3, 4]

    # exclusive bounds step one ulp: gt=0.005 -> lo=ceil(nextUp(0.5))=1,
    # lt=1.0 -> hi=floor(nextDown(100))=99
    out = scaled_float_range(ds, "v", 100.0, gt=0.005, lt=1.0)
    got = sorted(out.to_pandas().doc_id.tolist())
    assert got == [1]  # scaled in [1, 99]: only id 1 (value 1 after encode)

    st = scaled_float_stats(ds, "v", 100.0)
    dec = np.array([0, 1, 100, 100, 100, 250, -60]) / 100.0
    assert st["count"] == len(vals)
    assert st["sum"] == pytest.approx(dec.sum())
    assert st["min"] == pytest.approx(-0.6)
    assert st["max"] == pytest.approx(2.5)
    assert st["avg"] == pytest.approx(dec.mean())
