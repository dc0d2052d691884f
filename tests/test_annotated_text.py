"""annotated_text mapper (AnnotatedTextFieldMapper markdownPattern,
URL-decoded values, key=value rejection, increment-0 injection)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.annotated_text import parse_annotations


def test_parse_annotations_reference_shapes():
    plain, spans = parse_annotations(
        "New mayor is [John Smith](type%20person&Mayor) of [Town](Town)")
    assert plain == "New mayor is John Smith of Town"
    assert spans == [(13, 23, ["type person", "Mayor"]),
                     (27, 31, ["Town"])]
    with pytest.raises(ValueError, match="key=value"):
        parse_annotations("[x](type=person)")
    # empty values dropped; markup-free text passes through
    assert parse_annotations("[x]()") == ("x", [])
    assert parse_annotations("no markup") == ("no markup", [])


def test_analyzer_injects_at_first_span_position():
    an = get_analyzer("annotated_text")
    toks, pos = an("big [john smith](Person) walks")
    # plain tokens in order; annotation at the span's FIRST position
    assert toks == ["big", "john", "smith", "walks", "Person"] or \
        toks == ["big", "john", "smith", "Person", "walks"]
    tp = dict(zip(toks, pos))
    assert tp["Person"] == tp["john"]  # increment 0
    assert tp["smith"] == tp["john"] + 1
    assert tp["walks"] == tp["smith"] + 1
    # empty-span annotation occupies its own position
    toks2, pos2 = an("a [,](X) b")
    tp2 = dict(zip(toks2, pos2))
    assert tp2["X"] == tp2["a"] + 1 and tp2["b"] == tp2["X"] + 1


@pytest.fixture(scope="module")
def anno_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    root = tmp_path_factory.mktemp("anno")
    corpus = str(root / "corpus")
    os.makedirs(corpus, exist_ok=True)
    texts = [
        "the [big apple](City&New%20York) skyline at night",
        "an apple a day keeps doctors away",
        "visiting [paris](City) in spring paris again",
        "plain text with no annotations at all",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
    })
    pq.write_table(t, f"{corpus}/docs.parquet")
    idx = str(root / "index")
    build_index(corpus, idx,
                IndexSpec(use_html=False, text_column="text",
                          analyzer="annotated_text",
                          doc_columns=("lang",)),
                concurrency=2, file_pattern="docs.parquet")
    return QueryEngine(idx, dtype="float64")


def test_annotation_terms_searchable_and_phrases_cross(anno_engine):
    from elasticsearch_ray.search.query import (
        MatchPhraseQuery,
        TermQuery,
    )

    # annotation values are exact terms (case/space preserved)
    city = anno_engine.search(TermQuery("City"), k=10,
                              fetch=("doc_id",)).to_pandas()
    assert sorted(city["doc_id"]) == [0, 2]
    ny = anno_engine.search(TermQuery("New York"), k=10,
                            fetch=("doc_id",)).to_pandas()
    assert ny["doc_id"].tolist() == [0]
    # increment-0 injection: the visible-phrase positions are intact
    ph = anno_engine.search(MatchPhraseQuery("big apple skyline"), k=10,
                            fetch=("doc_id",)).to_pandas()
    assert ph["doc_id"].tolist() == [0]
    # counts through the ordinary count API
    assert anno_engine.count(TermQuery("City")) == 2
    assert anno_engine.count(TermQuery("apple")) == 2  # plain token kept


def test_stopword_holes_preserved_inside_segments():
    """review r5 #7: a hole-emitting base analyzer keeps its in-segment
    position gaps on both sides of an annotation."""
    from elasticsearch_ray.analysis.annotated_text import (
        AnnotatedTextAnalyzer,
    )

    an = AnnotatedTextAnalyzer(base="stop")
    # interior holes ('of the') sit INSIDE the leading segment, so the
    # base analyzer reports them and they survive the offsetting
    toks, pos = an("walk of the fame [park](Place) walks")
    tp = dict(zip(toks, pos))
    assert tp["walk"] == 0 and tp["fame"] == 3  # 'of the' gap kept
    assert tp["park"] == 4
    assert tp["Place"] == tp["park"]
    assert tp["walks"] == tp["park"] + 1
    # a leading hole inside the POST-annotation segment also survives
    toks2, pos2 = an("[park](Place) the fame")
    tp2 = dict(zip(toks2, pos2))
    assert tp2["fame"] == tp2["park"] + 2  # hole for 'the' preserved
