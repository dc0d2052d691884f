"""search_as_you_type (SearchAsYouTypeFieldMapper): shingle subfields via
multi-field composition + bool_prefix serving query."""

import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import MatchPhraseQuery, MatchQuery

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sayt_eng(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.sayt import sayt_spec

    fields, fa = sayt_spec("text", "text")
    idx = str(tmp_path_factory.mktemp("saytidx") / "index")
    build_index(SF_DIR, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",), fields=fields,
                          field_analyzers=fa),
                concurrency=2, file_pattern="documents.parquet")
    e = QueryEngine(idx, dtype="float64")
    yield e
    e.close()


def test_2gram_subfield_matches_phrase_docs(sayt_eng):
    """A single-shingle match on ._2gram hits exactly the docs where the
    two words are ADJACENT — the phrase query doc set on the root field."""
    gram = sayt_eng.search(MatchQuery("spark join", field="text._2gram"),
                           k=10_000, mode="exhaustive", fetch=("doc_id",))
    phrase = sayt_eng.search(MatchPhraseQuery("spark join"),
                             k=10_000, mode="exhaustive", fetch=("doc_id",))
    assert sorted(gram["doc_id"].to_pylist()) == sorted(phrase["doc_id"].to_pylist())
    assert len(gram) > 0


def test_3gram_subfield(sayt_eng):
    g3 = sayt_eng.search(MatchQuery("big order scan", field="text._3gram"),
                         k=10_000, mode="exhaustive", fetch=("doc_id",))
    p3 = sayt_eng.search(MatchPhraseQuery("big order scan"),
                         k=10_000, mode="exhaustive", fetch=("doc_id",))
    assert len(g3) > 0
    assert sorted(g3["doc_id"].to_pylist()) == sorted(p3["doc_id"].to_pylist())


def test_bool_prefix_progressive_typing(sayt_eng):
    """Typing 'spark join merge' character-group by group keeps returning
    hits, and a doc containing the full phrase stays in the result set."""
    from elasticsearch_ray.search.sayt import sayt_query

    phrase_docs = set(
        sayt_eng.search(MatchPhraseQuery("big order scan"), k=10_000,
                        mode="exhaustive", fetch=("doc_id",))["doc_id"].to_pylist())
    assert phrase_docs
    for typed in ("big", "big or", "big order", "big order sc",
                  "big order scan"):
        hits = sayt_eng.search(sayt_query("text", typed), k=10_000,
                               mode="exhaustive", fetch=("doc_id",))
        got = set(hits["doc_id"].to_pylist())
        assert phrase_docs & got, typed


def test_sayt_spec_validation():
    from elasticsearch_ray.search.sayt import sayt_query, sayt_spec

    with pytest.raises(ValueError, match="max_shingle_size"):
        sayt_spec("text", "text", max_shingle_size=9)
    fields, fa = sayt_spec("text", "text", max_shingle_size=4)
    assert set(fields) == {"text._2gram", "text._3gram", "text._4gram"}
    # short queries skip shingle subfields they can't fill
    q = sayt_query("text", "spark")
    assert all(getattr(s, "field", None) is None for s in q.should)
