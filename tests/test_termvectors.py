"""_termvectors / _mtermvectors (TermVectorsService model): re-analyzed
term vectors must be CONSISTENT with the inverted index — tf equals the
decoded postings tf, positions equal the stored positions slice — and
term/field statistics come from the index's global stats."""

import numpy as np
import pytest

from elasticsearch_ray.index.spec import IndexSpec

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("tvidx") / "index")
    # no stored text column: _source comes from the input lineage
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("lang",))
    build_index(SF_DIR, idx, spec, concurrency=2,
                file_pattern="documents.parquet")
    e = QueryEngine(idx, dtype="float64")
    yield e
    e.close()


def _postings_for(eng, term, doc_id):
    """(tf, positions) of term in doc straight from the index."""
    from elasticsearch_ray.index.postings import decode_postings

    part, local = eng._locate(doc_id)
    s = eng._searcher(part)
    row = int(s.r.lookup([term])[0])
    assert row >= 0
    d, tfs = decode_postings(bytes(s.r.blob(row)))
    j = int(np.searchsorted(d, local))
    assert j < len(d) and d[j] == local
    flat = np.asarray(s.r.positions_for(row), np.int64)
    off = int(tfs[:j].sum())
    return int(tfs[j]), flat[off:off + int(tfs[j])].tolist()


def test_termvectors_consistent_with_postings(eng):
    for doc_id in (3, 17, 101):
        tv = eng.termvectors(doc_id=doc_id)
        assert tv["found"] and tv["terms"]
        # doclen invariant: Σ tf == stored doclen for the doc
        part, local = eng._locate(doc_id)
        s = eng._searcher(part)
        import pyarrow.parquet as pq
        import os
        dl = pq.read_table(os.path.join(s.r.dir, "docs.parquet"),
                           columns=["doclen"])["doclen"][local].as_py()
        assert sum(e["term_freq"] for e in tv["terms"].values()) == dl
        for term in list(tv["terms"])[:10]:
            tf, pos = _postings_for(eng, term, doc_id)
            assert tv["terms"][term]["term_freq"] == tf
            assert tv["terms"][term]["positions"] == pos


def test_termvectors_statistics(eng):
    tv = eng.termvectors(doc_id=5, term_statistics=True,
                         field_statistics=True)
    terms = list(tv["terms"])[:5]
    df = eng._global_stats(terms)
    ttf = eng._global_ttf(terms)
    for t in terms:
        assert tv["terms"][t]["doc_freq"] == df[t] > 0
        assert tv["terms"][t]["ttf"] == ttf[t] >= tv["terms"][t]["term_freq"]
    fs = tv["field_statistics"]
    assert fs["doc_count"] == eng.n_docs
    assert fs["sum_ttf"] == eng.meta["sum_dl"]
    # sum_doc_freq: Σ df over the term dict == Σ per-doc distinct terms
    assert fs["sum_doc_freq"] >= fs["doc_count"]


def test_termvectors_artificial_doc(eng):
    tv = eng.termvectors(doc="Spark joins merge SPARK", term_statistics=True)
    assert tv["terms"]["spark"]["term_freq"] == 2
    assert tv["terms"]["spark"]["positions"] == [0, 3]
    assert tv["terms"]["merge"]["doc_freq"] == eng._global_stats(["merge"])["merge"]


def test_termvectors_filter(eng):
    """TermVectorsFilter: tf·idf ranking, max_num_terms cut, bound
    options, unknown options reject."""
    import numpy as np

    full = eng.termvectors(doc_id=9)
    flt = eng.termvectors(doc_id=9, filter={"max_num_terms": 3})
    assert len(flt["terms"]) == 3
    assert set(flt["terms"]) <= set(full["terms"])
    # scores are tf·idf with idf = 1 + ln(N/(df+1)), descending top-k
    df = eng._global_stats(sorted(full["terms"]))
    want = {t: e["term_freq"] * (1.0 + np.log(eng.n_docs / (df[t] + 1.0)))
            for t, e in full["terms"].items()}
    top3 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert set(flt["terms"]) == {t for t, _ in top3}
    for t, s in top3:
        assert abs(flt["terms"][t]["score"] - s) < 1e-4
    # min_term_freq bound: keeps only repeated terms
    rep = eng.termvectors(doc_id=9, filter={"min_term_freq": 2})
    assert all(e["term_freq"] >= 2 for e in rep["terms"].values())
    with pytest.raises(ValueError, match="unknown termvectors filter"):
        eng.termvectors(doc_id=9, filter={"max_terms": 3})


def test_more_like_this_like_document(eng):
    """MLT like-document items ({'_id': d}): text fetched from _source
    lineage — results equal MLT over the doc's literal text; DSL parses
    and round-trips the item form."""
    from elasticsearch_ray.search.dsl import parse_dsl, to_dsl
    from elasticsearch_ray.search.query import MoreLikeThisQuery
    from elasticsearch_ray.search.termvectors import _source_text

    text, _ = _source_text(eng, 12, "text")
    by_id = eng.search(MoreLikeThisQuery(like_ids=(12,), min_doc_freq=1),
                       k=10, fetch=("doc_id",))
    by_text = eng.search(MoreLikeThisQuery(like=text, min_doc_freq=1),
                         k=10, fetch=("doc_id",))
    assert by_id["doc_id"].to_pylist() == by_text["doc_id"].to_pylist()
    assert by_id["doc_id"].to_pylist()  # non-empty; doc 12 itself matches

    body = {"more_like_this": {"like": [{"_id": 12}, "extra words"],
                               "min_doc_freq": 1}}
    q = parse_dsl(body)
    assert q.like_ids == (12,) and q.like == "extra words"
    assert parse_dsl(to_dsl(q)) == q


def test_mtermvectors_and_validation(eng):
    out = eng.mtermvectors([1, 2, 3])
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    with pytest.raises(ValueError, match="exactly one"):
        eng.termvectors()
    with pytest.raises(ValueError, match="exactly one"):
        eng.termvectors(doc_id=1, doc="x")


def test_termvectors_requires_source_in_lineage(eng):
    # a source column absent from the input lineage refuses clearly...
    with pytest.raises(ValueError, match="_source"):
        eng.termvectors(doc_id=1, source_col="no_such_column")
    # ...and artificial-doc mode needs no source at all
    assert eng.termvectors(doc="spark join")["terms"]["spark"]["term_freq"] == 1
