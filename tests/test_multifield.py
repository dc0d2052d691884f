"""Multi-field indexing + multi_match / query_string
(MultiMatchQueryBuilder.java, QueryStringQueryBuilder.java; per-field
postings + norms as in FieldMapper): the title field is derived (first 5
tokens) so a single-field index over the same column is an exact scoring
oracle."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    MatchPhraseQuery,
    MatchQuery,
    MultiMatchQuery,
    QueryStringQuery,
    TermQuery,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mf(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    base = tmp_path_factory.mktemp("mfidx")
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    titles = [" ".join((x or "").split()[:5]) for x in t["text"].to_pylist()]
    t = t.append_column("title", pa.array(titles, pa.string()))
    corpus = str(base / "corpus")
    os.makedirs(corpus)
    pq.write_table(t, os.path.join(corpus, "docs.parquet"))

    idx = str(base / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang",),
                     fields={"title": "title"}, files_per_partition=1)
    build_index(corpus, idx, spec, concurrency=2, file_pattern="docs.parquet")
    eng = QueryEngine(idx, dtype="float64")

    # single-field oracle index over ONLY the title column
    tidx = str(base / "title_index")
    tspec = IndexSpec(use_html=False, text_column="title", doc_columns=("lang",),
                      files_per_partition=1)
    build_index(corpus, tidx, tspec, concurrency=2, file_pattern="docs.parquet")
    teng = QueryEngine(tidx, dtype="float64")

    docs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in t["text"].to_pylist()]))
    tdocs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in titles]))
    return eng, teng, docs, tdocs


def _res(eng, q, **kw):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",), **kw)
    return {r["doc_id"]: r["score"] for r in t.to_pylist()}


def test_title_term_matches_only_titles(mf):
    eng, _teng, docs, tdocs = mf
    tok = "spark"
    got = set(_res(eng, TermQuery(tok, field="title")))
    want = {d for d, toks in tdocs.items() if tok in toks}
    assert got == want and got
    # and the default field still matches body text
    got_body = set(_res(eng, TermQuery(tok)))
    assert got_body == {d for d, toks in docs.items() if tok in toks}
    assert got < got_body


def test_title_scores_equal_single_field_index(mf):
    """BM25 on the title field (own df, norms, avgdl) must equal an index
    built over the title column alone — exact float64 equality."""
    eng, teng, _docs, _tdocs = mf
    for tok in ("spark", "merge", "window"):
        a = _res(eng, TermQuery(tok, field="title"))
        b = _res(teng, TermQuery(tok))
        assert a == b and a
    a = _res(eng, MatchQuery("spark join merge", field="title"))
    b = _res(teng, MatchQuery("spark join merge"))
    assert a == b


def test_multi_match_best_and_most_fields(mf):
    eng, _teng, _docs, _tdocs = mf
    text = "spark join"
    body = _res(eng, MatchQuery(text))
    title = _res(eng, MatchQuery(text, field="title"))
    best = _res(eng, MultiMatchQuery(text, fields=(None, "title"), tie_breaker=0.25))
    most = _res(eng, MultiMatchQuery(text, fields=(None, "title"), type="most_fields"))
    assert set(best) == set(body) | set(title) == set(most)
    for d, s in best.items():
        b, t = body.get(d, 0.0), title.get(d, 0.0)
        expect = max(b, t) + 0.25 * min(b, t)
        assert abs(s - expect) < 1e-9, d
    for d, s in most.items():
        assert abs(s - (body.get(d, 0.0) + title.get(d, 0.0))) < 1e-9, d


def test_phrase_on_title_field(mf):
    eng, _teng, _docs, tdocs = mf
    got = set(_res(eng, MatchPhraseQuery("spark join", field="title")))
    want = {
        d for d, toks in tdocs.items()
        if any(toks[i : i + 2] == ["spark", "join"] for i in range(len(toks) - 1))
    }
    assert got == want


def test_query_string_fielded(mf):
    eng, _teng, docs, tdocs = mf
    got = set(_res(eng, QueryStringQuery("title:spark AND merge")))
    want = {d for d in docs if "spark" in tdocs[d] and "merge" in docs[d]}
    assert got == want and got
    got2 = set(_res(eng, QueryStringQuery('title:"spark join" OR window')))
    phr = {
        d for d, toks in tdocs.items()
        if any(toks[i : i + 2] == ["spark", "join"] for i in range(len(toks) - 1))
    }
    assert got2 == phr | {d for d, toks in docs.items() if "window" in toks}


def test_exists_on_field(mf):
    eng, _teng, _docs, tdocs = mf
    from elasticsearch_ray.search.query import ExistsQuery

    got = set(_res(eng, ExistsQuery(field="title")))
    assert got == {d for d, toks in tdocs.items() if toks}


def test_bmw_equals_exhaustive_on_title(mf):
    eng, _teng, _docs, _tdocs = mf
    q = MatchQuery("spark join merge", field="title")
    a = eng.search(q, k=10, mode="bmw", fetch=("doc_id",)).to_pylist()
    b = eng.search(q, k=10, mode="exhaustive", fetch=("doc_id",)).to_pylist()
    assert a == b and len(a) == 10


def test_per_field_analyzer(ray_session, tmp_path_factory):
    """IndexSpec.field_analyzers: the title field indexes AND queries through
    its own chain (english here), auto-filled into fielded queries."""
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    base = tmp_path_factory.mktemp("fldan")
    corpus = str(base / "c")
    os.makedirs(corpus)
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta", "alpha gamma", "beta gamma"],
            "title": ["running joins", "sorted windows", "join runner"],
        }
    )
    pq.write_table(t, os.path.join(corpus, "d.parquet"))
    idx = str(base / "i")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=(),
                     fields={"title": "title"}, field_analyzers={"title": "english"},
                     files_per_partition=1)
    build_index(corpus, idx, spec, concurrency=2, file_pattern="d.parquet")
    eng = QueryEngine(idx, dtype="float64")
    # porter stems: running->run, joins->join; query "runs join" stems the
    # same way through the auto-filled english analyzer
    got = {r["doc_id"] for r in eng.search(
        MatchQuery("runs joining", field="title"), k=10, mode="exhaustive",
        fetch=("doc_id",)).to_pylist()}
    assert got == {0, 2}
    # default field still standard-analyzed
    got2 = {r["doc_id"] for r in eng.search(MatchQuery("alpha"), k=10,
                                            mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    assert got2 == {0, 1}


def test_combined_fields_vs_bruteforce(mf):
    """combined_fields: BM25F-simplified pseudo-field (tf' = Σ w·tf_f,
    dl' = Σ w·dl_f, df' = max df_f) vs a python brute-force oracle."""
    import math

    from elasticsearch_ray.search.query import CombinedFieldsQuery

    eng, _teng, docs, tdocs = mf
    text = "spark join"
    w_title = 2.0
    q = CombinedFieldsQuery(text, fields=(None, "title"), weights=(1.0, w_title))
    got = _res(eng, q)

    n = len(docs)
    avgdl = (sum(len(t) for t in docs.values()) / n
             + w_title * sum(len(t) for t in tdocs.values()) / n)
    k1, b = 1.2, 0.75
    want = {}
    for term in text.split():
        df_b = sum(term in set(t) for t in docs.values())
        df_t = sum(term in set(t) for t in tdocs.values())
        idf = math.log(1 + (n - max(df_b, df_t) + 0.5) / (max(df_b, df_t) + 0.5))
        for d in docs:
            tf = docs[d].count(term) + w_title * tdocs[d].count(term)
            if tf <= 0:
                continue
            dl = len(docs[d]) + w_title * len(tdocs[d])
            s = idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
            want[d] = want.get(d, 0.0) + s
    assert set(got) == set(want)
    for d, s in got.items():
        assert abs(s - want[d]) < 1e-9, d
    # operator=and requires every term present in the blend
    got_and = _res(eng, CombinedFieldsQuery(text, fields=(None, "title"),
                                            weights=(1.0, w_title), operator="and"))
    both = {d for d in want
            if all(t in docs[d] or t in tdocs[d] for t in text.split())}
    assert set(got_and) == both


def test_multi_match_phrase_type(mf):
    """multi_match type=phrase == dis_max of per-field match_phrase."""
    from elasticsearch_ray.search.query import DisMaxQuery

    eng, teng, docs, tdocs = mf
    # a phrase that exists in some docs: first two tokens of some title
    pair = None
    for d, toks in tdocs.items():
        if len(toks) >= 2:
            pair = f"{toks[0]} {toks[1]}"
            break
    assert pair
    mm = _res(eng, MultiMatchQuery(pair, fields=(None, "title"), type="phrase",
                                   tie_breaker=0.2))
    direct = _res(eng, DisMaxQuery(queries=(MatchPhraseQuery(pair),
                                            MatchPhraseQuery(pair, field="title")),
                                   tie_breaker=0.2))
    assert mm == direct
    assert len(mm) > 0
    # brute-force containment: every hit has the phrase in text OR title
    for d in mm:
        w, tw = docs[d], tdocs[d]
        in_text = any(w[i:i + 2] == pair.split() for i in range(len(w) - 1))
        in_title = any(tw[i:i + 2] == pair.split() for i in range(len(tw) - 1))
        assert in_text or in_title


def test_multi_match_cross_fields_type(mf):
    """multi_match type=cross_fields routes through the combined_fields
    (BM25F-blended) scorer with per-field boosts as weights."""
    from elasticsearch_ray.search.query import CombinedFieldsQuery

    eng, _, _, _ = mf
    mm = _res(eng, MultiMatchQuery("spark join", fields=(None, "title"),
                                   type="cross_fields",
                                   boosts=((None, 1.0), ("title", 2.0))))
    direct = _res(eng, CombinedFieldsQuery("spark join", fields=(None, "title"),
                                           weights=(1.0, 2.0)))
    assert mm == direct and len(mm) > 0


def test_terms_enum_excludes_field_keys(mf):
    """_terms_enum over a multifield index: 'title\\x1fterm' keys must not
    consume the window or leak — only bare default-field terms return, even
    when the field name shares a sort range with matching terms."""
    eng, _teng, docs, _tdocs = mf
    expect = sorted({t for toks in docs.values() for t in toks
                     if t.startswith("t")})[:8]
    got = eng.terms_enum("t", size=8)
    assert got == expect
    assert all("\x1f" not in t for t in eng.terms_enum("", size=50))
