"""Round-4 introspection + fragment highlighting: _segments / _disk_usage
APIs and the fragmenting highlighter."""

import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchQuery

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("introidx") / "index")
    build_index(SF_DIR, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",)),
                concurrency=2, file_pattern="documents.parquet")
    e = QueryEngine(idx, dtype="float64")
    yield e
    e.close()


def test_segments_api(eng):
    segs = eng.segments()
    assert len(segs) == len(eng.parts)
    assert sum(s["n_docs"] for s in segs) == eng.n_docs
    assert sum(s["sum_dl"] for s in segs) == eng.meta["sum_dl"]
    for s in segs:
        assert s["size_in_bytes"] == sum(s["files"].values()) > 0
        assert "postings.bin" in s["files"]
        assert "terms.parquet" in s["files"]


def test_disk_usage_api(eng):
    du = eng.disk_usage()
    assert du["n_docs"] == eng.n_docs
    assert du["total_in_bytes"] == sum(du["breakdown"].values()) > 0
    for k in ("postings", "positions", "term_dictionary", "stored_fields"):
        assert du["breakdown"][k] > 0, k


def test_mget(eng):
    """_mget: rows come back in REQUEST order, stored + source columns."""
    ids = [42, 3, 250, 3]
    out = eng.mget(ids, columns=("doc_id", "lang"),
                   source_columns=("text",))
    assert out["doc_id"].to_pylist() == ids
    assert len(out["lang"]) == 4 and "text" in out.column_names
    # the source text round-trips exactly
    tv = eng.termvectors(doc_id=42)
    assert sum(e["term_freq"] for e in tv["terms"].values()) == \
        len(out["text"][0].as_py().split())
    assert len(eng.mget([])) == 0


def test_highlight_fragments():
    from elasticsearch_ray.search.engine import _fragment_highlights

    filler = "filler words here " * 20
    text = (f"alpha spark beta {filler} gamma spark delta spark epsilon "
            f"{filler} zeta")
    frags = _fragment_highlights(text, frozenset({"spark"}), "<em>", "</em>",
                                 fragment_size=60, number_of_fragments=2)
    assert len(frags) == 2
    # the 2-hit passage outranks the 1-hit one; doc order preserved
    assert frags[0].count("<em>spark</em>") >= 1
    assert sum(f.count("<em>spark</em>") for f in frags) >= 3 - 1
    for f in frags:
        assert len(f) <= 60 + 24 + 2 * 16  # size + tags + bounded snap
        # fragments are real substrings (words not split mid-run)
        assert text.find(f.replace("<em>", "").replace("</em>", "")) >= 0
    # fragments are DISJOINT (no duplicated text across passages)
    plain = [f.replace("<em>", "").replace("</em>", "") for f in frags]
    assert text.find(plain[1]) >= text.find(plain[0]) + len(plain[0])
    # bounded snapping: an unspaced run cannot balloon a fragment
    blob = "x" * 500 + " spark " + "y" * 500
    bf = _fragment_highlights(blob, frozenset({"spark"}), "<em>", "</em>",
                              fragment_size=40, number_of_fragments=2)
    assert bf and all(len(f) <= 40 + 9 + 2 * 16 for f in bf)
    # no matches → no fragments; empty text safe
    assert _fragment_highlights("nothing here", frozenset({"spark"}),
                                "<em>", "</em>") == []
    assert _fragment_highlights("", frozenset({"spark"}), "<em>", "</em>") == []


def test_highlight_fragments_engine_path(eng):
    hits = eng.search(MatchQuery("spark join"), k=3, fetch=("doc_id",))
    r = hits.to_pylist()[0]
    frags = eng.highlight_fragments(MatchQuery("spark join"), r["part"],
                                    r["local"], fragment_size=80,
                                    number_of_fragments=2)
    assert frags and all("<em>" in f for f in frags)
    # fielded-namespace terms highlight by bare term (shared _wrap_terms)
    whole = eng.highlight(MatchQuery("spark join"), r["part"], r["local"])
    assert "<em>" in whole


def test_passage_scorer_bm25_weighted_ordering():
    """Unified-highlighter PassageScorer: with DFS-idf term weights, a
    passage holding ONE rare term outranks a passage stuffed with a
    common term (raw match count would rank them the other way)."""
    from elasticsearch_ray.search.engine import _fragment_highlights

    gap = "pad word " * 30
    # passage A: 3x common term; passage B (later): 1x rare term
    text = f"common common common end {gap} start uniqum done {gap} tail"
    no_w = _fragment_highlights(text, frozenset({"common", "uniqum"}),
                                "<em>", "</em>", fragment_size=60,
                                number_of_fragments=1)
    assert "<em>common</em>" in no_w[0]  # raw-count ranking: 3 beats 1
    weighted = _fragment_highlights(
        text, frozenset({"common", "uniqum"}), "<em>", "</em>",
        fragment_size=60, number_of_fragments=1,
        term_weights={"common": 0.2, "uniqum": 8.0})
    assert "<em>uniqum</em>" in weighted[0]  # idf-weighted: rare wins
    # disjointness + word-snap properties hold under the new scorer
    both = _fragment_highlights(
        text, frozenset({"common", "uniqum"}), "<em>", "</em>",
        fragment_size=60, number_of_fragments=2,
        term_weights={"common": 0.2, "uniqum": 8.0})
    plain = [f.replace("<em>", "").replace("</em>", "") for f in both]
    assert len(both) == 2
    assert text.find(plain[1]) >= text.find(plain[0]) + len(plain[0])
    for p in plain:
        assert text.find(p) >= 0


def test_engine_fragments_use_idf_weights(ray_session, tmp_path_factory):
    """Engine path: fragments rank by DFS-idf-weighted passage score — in
    a corpus where 'common' saturates every doc and 'uniqum' appears
    once, the target doc's 3x-common passage loses to its 1x-uniqum
    passage (raw count would rank it first)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchQuery

    base = tmp_path_factory.mktemp("hlidf")
    gap = "pad word " * 30
    target = f"common common common end {gap} start uniqum done {gap} tail"
    texts = [target] + [f"common filler text {i}" for i in range(40)]
    corpus = str(base / "corpus")
    os.makedirs(corpus)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}),
        os.path.join(corpus, "docs.parquet"))
    idx = str(base / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=(), files_per_partition=1),
                concurrency=2, file_pattern="docs.parquet")
    e = QueryEngine(idx, dtype="float64")
    frags = e.highlight_fragments(MatchQuery("common uniqum"), 0, 0,
                                  fragment_size=60, number_of_fragments=1)
    assert "<em>uniqum</em>" in frags[0]
    e.close()
