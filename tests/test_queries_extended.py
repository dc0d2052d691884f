"""Multi-term (wildcard/regexp/fuzzy/prefix), exists/ids, and score-shaping
(constant_score/dis_max/boosting) queries vs a brute-force oracle over the
documents table."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    BoolQuery,
    BoostingQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    ExistsQuery,
    FuzzyQuery,
    IdsQuery,
    MatchQuery,
    PrefixQuery,
    RegexpQuery,
    TermFilter,
    TermQuery,
    WildcardQuery,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("docsidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang", "source"))
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(texts["doc_id"].to_pylist(), [t.split() for t in texts["text"].to_pylist()]))
    return eng, docs


def _hits(eng, q, **kw):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",), **kw)
    return {r["doc_id"] for r in t.to_pylist()}


def test_wildcard(docs_engine):
    eng, docs = docs_engine
    got = _hits(eng, WildcardQuery("s*k"))
    want = {d for d, toks in docs.items() if any(t.startswith("s") and t.endswith("k") for t in toks)}
    assert got == want and got


def test_regexp(docs_engine):
    eng, docs = docs_engine
    got = _hits(eng, RegexpQuery("w.*w"))
    import re

    rx = re.compile("w.*w")
    want = {d for d, toks in docs.items() if any(rx.fullmatch(t) for t in toks)}
    assert got == want and got


def test_fuzzy(docs_engine):
    eng, docs = docs_engine
    got = _hits(eng, FuzzyQuery("spork", fuzziness=1))
    # distance-1 neighbors of 'spork' in the corpus: spark? s-p-o-r-k vs
    # s-p-a-r-k = 1 substitution → matches docs containing spark (plus any
    # other distance-1 vocab terms)
    assert {d for d, toks in docs.items() if "spark" in toks} <= got


def test_prefix_equals_wildcard(docs_engine):
    eng, docs = docs_engine
    assert _hits(eng, PrefixQuery("wi")) == _hits(eng, WildcardQuery("wi*"))


def test_exists_and_ids(docs_engine):
    eng, docs = docs_engine
    assert _hits(eng, ExistsQuery()) == {d for d, toks in docs.items() if toks}
    assert _hits(eng, IdsQuery(ids=(3, 7, 11))) == {3, 7, 11}


def test_constant_score(docs_engine):
    eng, docs = docs_engine
    t = eng.search(ConstantScoreQuery(filter=TermFilter("lang", "en"), boost=2.5),
                   k=10**9, mode="exhaustive", fetch=("doc_id",))
    rows = t.to_pylist()
    assert rows and all(abs(r["score"] - 2.5) < 1e-9 for r in rows)


def test_dismax_max_semantics(docs_engine):
    eng, docs = docs_engine
    qa, qb = TermQuery("spark"), TermQuery("window")
    sa = {r["doc_id"]: r["score"] for r in eng.search(qa, k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    sb = {r["doc_id"]: r["score"] for r in eng.search(qb, k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    dm = {r["doc_id"]: r["score"] for r in eng.search(
        DisMaxQuery(queries=(qa, qb), tie_breaker=0.3), k=10**9, mode="exhaustive",
        fetch=("doc_id",)).to_pylist()}
    assert set(dm) == set(sa) | set(sb)
    for d, s in dm.items():
        a, b = sa.get(d, 0.0), sb.get(d, 0.0)
        want = max(a, b) + 0.3 * (min(a, b) if a and b else 0.0)
        assert abs(s - want) < 1e-9


def test_boosting(docs_engine):
    eng, docs = docs_engine
    pos = MatchQuery("spark join")
    neg = TermFilter("lang", "de")
    base = {r["doc_id"]: r["score"] for r in eng.search(pos, k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    bq = {r["doc_id"]: r["score"] for r in eng.search(
        BoostingQuery(positive=pos, negative=neg, negative_boost=0.25),
        k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    langs = dict(zip(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])["doc_id"].to_pylist(),
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])["lang"].to_pylist(),
    ))
    assert set(bq) == set(base)
    saw_demoted = False
    for d, s in bq.items():
        if langs[d] == "de":
            assert abs(s - base[d] * 0.25) < 1e-9
            saw_demoted = True
        else:
            assert abs(s - base[d]) < 1e-9
    assert saw_demoted


def test_simple_query_string(docs_engine):
    from elasticsearch_ray.search.query import (
        BoolQuery,
        MatchPhraseQuery,
        MatchQuery,
        PrefixQuery,
        parse_simple_query_string,
    )

    q = parse_simple_query_string('+spark -window "join merge" ta*')
    assert isinstance(q, BoolQuery)
    assert q.must == (MatchQuery("spark"),)
    assert q.must_not == (MatchQuery("window"),)
    assert q.should == (MatchPhraseQuery("join merge"), PrefixQuery("ta"))

    eng, docs = docs_engine
    hits = _hits(eng, q)
    for d in hits:
        assert "spark" in docs[d] and "window" not in docs[d]
    # default_operator=and folds optional clauses into must
    q2 = parse_simple_query_string("spark merge", default_operator="and")
    want = {d for d, t in docs.items() if "spark" in t and "merge" in t}
    assert _hits(eng, q2) == want
    # malformed input does not raise
    parse_simple_query_string('+"unclosed -')


def test_function_score_field_value_factor(docs_engine):
    import numpy as _np

    from elasticsearch_ray.search.query import FunctionScoreQuery

    eng, docs = docs_engine
    base = {r["doc_id"]: r["score"] for r in eng.search(
        TermQuery("spark"), k=10**9, mode="exhaustive", fetch=("doc_id",)).to_pylist()}
    q = FunctionScoreQuery(query=TermQuery("spark"), field="doclen",
                           modifier="log1p", weight=2.0, boost_mode="multiply")
    res = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id", "doclen")).to_pylist()
    assert {r["doc_id"] for r in res} == set(base)
    for r in res:
        want = base[r["doc_id"]] * 2.0 * _np.log1p(r["doclen"])
        assert abs(r["score"] - want) < 1e-9 * max(abs(want), 1)


def test_more_like_this(docs_engine):
    from elasticsearch_ray.search.query import MoreLikeThisQuery

    eng, docs = docs_engine
    like = " ".join(docs[0])
    q = MoreLikeThisQuery(like=like, max_query_terms=5, min_term_freq=2, min_doc_freq=5)
    hits = eng.search(q, k=10, fetch=("doc_id",))
    assert hits.num_rows == 10
    # the source doc itself should rank near the top of its own MLT query
    assert 0 in set(hits["doc_id"].to_pylist())


def test_index_stats(docs_engine):
    eng, docs = docs_engine
    st = eng.stats().to_pylist()
    assert sum(r["n_docs"] for r in st) == len(docs)
    assert all(r["postings_bytes"] > 0 and r["n_terms"] > 0 for r in st)


def test_terms_lookup(docs_engine):
    from elasticsearch_ray.search.query import TermsLookupQuery

    eng, docs = docs_engine
    got = _hits(eng, TermsLookupQuery(doc_id=0))
    want = {d for d, toks in docs.items() if set(toks) & set(docs[0])}
    assert got == want and 0 in got


def test_bool_explicit_msm_is_hard_constraint(docs_engine):
    """ADVICE: explicit minimum_should_match with must present must EXCLUDE
    docs matching too few should clauses (BooleanQuery semantics)."""
    from collections import Counter

    eng, docs = docs_engine
    cnt = Counter(t for toks in docs.values() for t in set(toks))
    common = cnt.most_common(1)[0][0]
    # the two rarest tokens (small vocab corpus): their union must not cover
    # every doc containing the must term, so the constraint has teeth
    a, b = [t for t, _c in sorted(cnt.items(), key=lambda kv: kv[1]) if t != common][:2]
    q = BoolQuery(must=(TermQuery(common),), should=(TermQuery(a), TermQuery(b)),
                  minimum_should_match=1)
    want = {d for d, toks in docs.items() if common in toks and (a in toks or b in toks)}
    assert _hits(eng, q) == want
    # sanity: the constraint actually excludes something, and implicit msm
    # (None) keeps should optional when must is present
    base = {d for d, toks in docs.items() if common in toks}
    assert want < base
    q2 = BoolQuery(must=(TermQuery(common),), should=(TermQuery(a), TermQuery(b)))
    assert _hits(eng, q2) == base


def test_nested_rewriteable_queries_in_bool(docs_engine):
    """_rewrite recurses into compound children (Lucene rewrites the whole
    tree): query_string / multi_match nested in bool clauses evaluate the
    same as their top-level forms."""
    from elasticsearch_ray.search.query import (ConstantScoreQuery,
                                                MultiMatchQuery,
                                                QueryStringQuery)

    eng, _ = docs_engine
    nested = eng.search(BoolQuery(must=(QueryStringQuery("spark AND join"),)),
                        k=20, fetch=("doc_id",))
    direct = eng.search(QueryStringQuery("spark AND join"), k=20, fetch=("doc_id",))
    assert nested.equals(direct) and len(nested) > 0
    mm = eng.search(BoolQuery(should=(MultiMatchQuery("spark", fields=(None,)),)),
                    k=10, fetch=("doc_id",))
    assert len(mm) > 0
    cs = eng.search(ConstantScoreQuery(filter=QueryStringQuery("merge OR sort")), k=10)
    assert len(cs) > 0


def test_phrase_under_score_wrappers(docs_engine):
    """Phrase/span scorers register through constant_score / function_score /
    boosting wrappers (add_phrase recursion)."""
    from elasticsearch_ray.search.query import (BoostingQuery,
                                                ConstantScoreQuery,
                                                FunctionScoreQuery,
                                                MatchPhraseQuery)

    eng, docs = docs_engine
    base = eng.search(MatchPhraseQuery("spark join"), k=10**9, mode="exhaustive",
                      fetch=("doc_id",))
    cs = eng.search(ConstantScoreQuery(filter=MatchPhraseQuery("spark join")),
                    k=10**9, mode="exhaustive", fetch=("doc_id",))
    assert sorted(cs["doc_id"].to_pylist()) == sorted(base["doc_id"].to_pylist())
    fs = eng.search(FunctionScoreQuery(query=MatchPhraseQuery("spark join"),
                                       weight=2.0), k=5)
    assert len(fs) > 0
    bq = eng.search(BoostingQuery(positive=MatchPhraseQuery("spark join"),
                                  negative=MatchPhraseQuery("merge sort"),
                                  negative_boost=0.3), k=5)
    assert len(bq) > 0


def test_rescore_with_rewriteable_query(docs_engine):
    from elasticsearch_ray.search.query import QueryStringQuery

    eng, _ = docs_engine
    r = eng.search(MatchQuery("spark"), k=10,
                   rescore=(QueryStringQuery("spark AND join"), 20, 1.0, 2.0))
    assert len(r) > 0


def test_query_string_trailing_operator_raises_cleanly():
    import pytest as _pt

    from elasticsearch_ray.search.query import parse_query_string

    for bad in ("spark AND", "(", "NOT"):
        with _pt.raises(ValueError):
            parse_query_string(bad)


def test_mrr_generator_and_k_zero():
    from elasticsearch_ray.search.rank_eval import mean_reciprocal_rank

    assert mean_reciprocal_rank((d for d in [5, 3, 1]), {3}) == 0.5
    assert mean_reciprocal_rank([5, 3, 1], {3}, k=0) == 0.0
    assert mean_reciprocal_rank([5, 3, 1], {3}, k=1) == 0.0


def test_dsl_exists_default_field():
    from elasticsearch_ray.search.dsl import parse_dsl
    from elasticsearch_ray.search.query import ExistsQuery

    assert parse_dsl({"exists": {"field": "text"}}) == ExistsQuery(field=None)
    assert parse_dsl({"exists": {"field": "lang"}}) == ExistsQuery(field="lang")
