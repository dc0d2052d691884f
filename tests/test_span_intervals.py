"""span_near / intervals positional algebra vs brute-force oracles over the
documents table (reference: SpanNearQueryBuilder.java, IntervalsQueryBuilder /
IntervalsSourceProvider.java; registry SearchModule.java:1112-1128)."""

import itertools

import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (
    IntervalsQuery,
    MatchPhraseQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def span_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("spanidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text", doc_columns=("lang",))
    build_index(SF_DIR, idx, spec, concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), [x.split() for x in t["text"].to_pylist()]))
    return eng, docs


def _hits(eng, q):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return {r["doc_id"] for r in t.to_pylist()}


def _pos(toks, term):
    return [i for i, t in enumerate(toks) if t == term]


def _ordered_oracle(toks, terms, slop):
    pos = [_pos(toks, t) for t in terms]
    if any(not p for p in pos):
        return False
    n = len(terms)
    for combo in itertools.product(*pos):
        if all(combo[i] < combo[i + 1] for i in range(n - 1)) and (
            combo[-1] - combo[0] - (n - 1) <= slop
        ):
            return True
    return False


def _unordered_oracle(toks, terms, slop):
    pos = [_pos(toks, t) for t in terms]
    if any(not p for p in pos):
        return False
    n = len(terms)
    for combo in itertools.product(*pos):
        if len(set(combo)) == n and max(combo) - min(combo) - (n - 1) <= slop:
            return True
    return False


def test_span_near_ordered(span_engine):
    eng, docs = span_engine
    for terms, slop in [(("spark", "join"), 0), (("spark", "join"), 2),
                        (("merge", "sort", "key"), 3)]:
        got = _hits(eng, SpanNearQuery(clauses=terms, slop=slop, in_order=True))
        want = {d for d, toks in docs.items() if _ordered_oracle(toks, terms, slop)}
        assert got == want, (terms, slop)
    assert _hits(eng, SpanNearQuery(clauses=("spark", "join"), slop=2, in_order=True))


def test_span_near_unordered(span_engine):
    eng, docs = span_engine
    for terms, slop in [(("spark", "join"), 1), (("merge", "sort"), 3)]:
        got = _hits(eng, SpanNearQuery(clauses=terms, slop=slop, in_order=False))
        want = {d for d, toks in docs.items() if _unordered_oracle(toks, terms, slop)}
        assert got == want, (terms, slop)
        # unordered is a superset of ordered at the same slop
        assert got >= _hits(eng, SpanNearQuery(clauses=terms, slop=slop, in_order=True))


def test_span_slop0_equals_exact_phrase(span_engine):
    eng, _docs = span_engine
    a = _hits(eng, SpanNearQuery(clauses=("spark", "join"), slop=0, in_order=True))
    b = _hits(eng, MatchPhraseQuery("spark join"))
    assert a == b and a


def test_intervals_match_and_any_of(span_engine):
    eng, docs = span_engine
    m1 = ("match", "spark join", 2, True)
    got = _hits(eng, IntervalsQuery(source=m1))
    want = {d for d, toks in docs.items() if _ordered_oracle(toks, ("spark", "join"), 2)}
    assert got == want
    m2 = ("match", "merge sort", 1, False)
    u = _hits(eng, IntervalsQuery(source=("any_of", (m1, m2))))
    assert u == got | _hits(eng, IntervalsQuery(source=m2))
    # all_of over term leaves == span_near
    a = _hits(eng, IntervalsQuery(source=("all_of", ("spark", "join"), 2, True)))
    assert a == got


def test_span_first(span_engine):
    """span_first: inner span_term must end within the first `end` positions
    (SpanFirstQueryBuilder.java semantics: match.end <= end; a single term
    span at position p has end p+1, so p < end)."""
    eng, docs = span_engine
    for term, end in [("spark", 1), ("spark", 3), ("merge", 5), ("the", 2)]:
        got = _hits(eng, SpanFirstQuery(term=term, end=end))
        want = {d for d, toks in docs.items() if term in toks[:end]}
        assert got == want, (term, end)
    assert _hits(eng, SpanFirstQuery(term="spark", end=5))


def test_span_first_scores_positive_sorted(span_engine):
    eng, _docs = span_engine
    t = eng.search(SpanFirstQuery(term="spark", end=4), k=10, mode="exhaustive",
                   fetch=("doc_id",))
    scores = t["score"].to_pylist()
    assert scores and all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_span_or(span_engine):
    eng, docs = span_engine
    got = _hits(eng, SpanOrQuery(clauses=("spark", "window")))
    want = {d for d, toks in docs.items() if "spark" in toks or "window" in toks}
    assert got == want and got
    # per-doc freq = total occurrences across clauses → scores positive
    t = eng.search(SpanOrQuery(clauses=("spark", "window")), k=5,
                   mode="exhaustive", fetch=("doc_id",))
    assert all(s > 0 for s in t["score"].to_pylist())


def test_span_not(span_engine):
    eng, docs = span_engine

    def survives(toks, pre, post):
        inc = [i for i, t in enumerate(toks) if t == "spark"]
        exc = [i for i, t in enumerate(toks) if t == "join"]
        return any(all(not (p - pre <= q <= p + post) for q in exc) for p in inc)

    for pre, post in [(0, 1), (1, 1), (0, 3)]:
        got = _hits(eng, SpanNotQuery(include="spark", exclude="join",
                                      pre=pre, post=post))
        want = {d for d, toks in docs.items() if survives(toks, pre, post)}
        assert got == want, (pre, post)
    # exclude term absent → identical to plain include-term doc set
    from elasticsearch_ray.search.query import TermQuery

    assert _hits(eng, SpanNotQuery(include="spark", exclude="zzznope",
                                   post=2)) == _hits(eng, TermQuery("spark"))


def test_span_scoring_ranked(span_engine):
    eng, _docs = span_engine
    t = eng.search(SpanNearQuery(clauses=("spark", "join"), slop=4, in_order=False),
                   k=10, mode="exhaustive", fetch=("doc_id",))
    scores = t["score"].to_pylist()
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_phrase_skewed_df_gather_path(ray_session, tmp_path_factory):
    """Skewed-df phrase exercises the rarest-first doc-AND + position gather
    branch; results must equal the brute-force window check."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import MatchPhraseQuery

    base = tmp_path_factory.mktemp("skewidx")
    texts = []
    for i in range(300):
        if i % 97 == 0:
            texts.append("filler rare common filler common")   # phrase present
        elif i % 31 == 0:
            texts.append("common rare filler")                 # both, no phrase
        else:
            texts.append("common filler common filler")        # only common
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    corpus = str(base / "c")
    os.makedirs(corpus)
    pq.write_table(t, os.path.join(corpus, "d.parquet"))
    idx = str(base / "i")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text",
                                       doc_columns=()), concurrency=2,
                file_pattern="d.parquet")
    eng = QueryEngine(idx, dtype="float64")
    hits = eng.search(MatchPhraseQuery("rare common"), k=10**9,
                      mode="exhaustive", fetch=("doc_id",))
    want = sorted(i for i, tx in enumerate(texts)
                  if any(tx.split()[j:j + 2] == ["rare", "common"]
                         for j in range(len(tx.split()) - 1)))
    assert sorted(hits["doc_id"].to_pylist()) == want
    assert len(want) > 0


def test_span_within_and_containing(ray_session, tmp_path_factory):
    """span_within / span_containing over an ordered big chain vs brute
    force on crafted docs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.query import SpanContainingQuery, SpanWithinQuery

    texts = [
        "merge fast sort tail",        # fast within merge..sort (slop 2)
        "merge slow fast sort",        # within (gap 2)
        "fast merge sort",             # fast BEFORE the span -> not within
        "merge sort fast",             # fast AFTER -> not within
        "merge one two three sort fast",  # gap 3 > slop -> no big span
        "fast filler merge x sort",    # fast outside, span exists
        "merge fast sort merge sort",  # within once
    ]
    base = tmp_path_factory.mktemp("spanwc")
    corpus = str(base / "c")
    os.makedirs(corpus)
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   os.path.join(corpus, "d.parquet"))
    idx = str(base / "i")
    build_index(corpus, idx, IndexSpec(use_html=False, text_column="text",
                                       doc_columns=()), concurrency=2,
                file_pattern="d.parquet")
    eng = QueryEngine(idx, dtype="float64")

    win = eng.search(SpanWithinQuery(little="fast", big=("merge", "sort"),
                                     big_slop=2), k=100, mode="exhaustive",
                     fetch=("doc_id",))
    got = sorted(win["doc_id"].to_pylist())
    assert got == [0, 1, 6], got
    con = eng.search(SpanContainingQuery(little="fast", big=("merge", "sort"),
                                         big_slop=2), k=100, mode="exhaustive",
                     fetch=("doc_id",))
    assert sorted(con["doc_id"].to_pylist()) == [0, 1, 6]
    # freqs differ in role: within counts little occs, containing counts spans
    w = {r["doc_id"]: r["score"] for r in win.to_pylist()}
    c = {r["doc_id"]: r["score"] for r in con.to_pylist()}
    assert set(w) == set(c)
