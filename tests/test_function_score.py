"""function_score ``functions`` array (FunctionScoreQueryBuilder /
DecayFunctionBuilder / RandomScoreFunctionBuilder): decay math, filters,
score_mode / boost_mode combining, random_score determinism, max_boost,
min_score, DSL round-trip."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.search.query import (ConstantScoreQuery,
                                            FunctionScoreQuery,
                                            ScoreFunction, TermFilter,
                                            TermQuery)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fs_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("fsidx") / "index")
    spec = IndexSpec(use_html=False, text_column="text",
                     doc_columns=("lang", "source", "n_chars"))
    build_index(SF_DIR, idx, spec, concurrency=2,
                file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    meta = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    return eng, meta.set_index("doc_id")


BASE = ConstantScoreQuery(filter=TermFilter("lang", "en"), boost=1.0)


def _scores(eng, q):
    t = eng.search(q, k=10**9, mode="exhaustive", fetch=("doc_id",))
    return dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))


def _decay_fn(kind, **params):
    return ScoreFunction(kind=kind, params=tuple(sorted(params.items())))


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_math(fs_engine, kind):
    eng, meta = fs_engine
    origin, scale, offset, decay = 2000.0, 1500.0, 100.0, 0.5
    q = FunctionScoreQuery(query=BASE, functions=(
        _decay_fn(kind, field="n_chars", origin=origin, scale=scale,
                  offset=offset, decay=decay),))
    got = _scores(eng, q)
    assert got
    en = meta[meta["lang"] == "en"]
    for doc_id, score in got.items():
        x = float(en.loc[doc_id, "n_chars"])
        d = max(abs(x - origin) - offset, 0.0)
        if kind == "gauss":
            want = math.exp(-(d * d) * (2.0 * math.log(decay))
                            / (-2.0 * scale * scale))
        elif kind == "exp":
            want = math.exp(math.log(decay) / scale * d)
        else:
            s = scale / (1.0 - decay)
            want = max((s - d) / s, 0.0)
        assert score == pytest.approx(want, rel=1e-9)
    # at distance exactly offset+scale the factor equals decay
    d = scale
    if kind == "gauss":
        val = math.exp(-(d * d) / (2.0 * (-(scale * scale)
                                          / (2.0 * math.log(decay)))))
        assert val == pytest.approx(decay, rel=1e-12)


def test_functions_filters_and_score_modes(fs_engine):
    eng, meta = fs_engine
    fns = (
        ScoreFunction(kind="weight", weight=3.0,
                      filter=TermFilter("lang", "en")),
        ScoreFunction(kind="weight", weight=5.0,
                      filter=TermFilter("source", "src1")),
    )
    base = ConstantScoreQuery(filter=TermFilter("lang", "en"))
    src_col = pq.read_table(f"{SF_DIR}/documents.parquet",
                            columns=["doc_id", "source"]).to_pandas() \
        .set_index("doc_id")["source"]

    def expect(mode, is_web):
        # every base doc matches fn1 (lang=en); src1 docs also match fn2.
        # avg divides the output sum by the MATCHING functions' weight
        # sum (reference FunctionScoreQuery AVG), so weight functions
        # always average to 1.0
        if not is_web:
            return {"avg": 1.0}.get(mode, 3.0)
        return {"multiply": 15.0, "sum": 8.0, "avg": 1.0,
                "max": 5.0, "min": 3.0, "first": 3.0}[mode]

    saw_web = saw_other = False
    for mode in ("multiply", "sum", "avg", "max", "min", "first"):
        q = FunctionScoreQuery(query=base, functions=fns, score_mode=mode)
        got = _scores(eng, q)
        assert set(got) == set(meta[meta["lang"] == "en"].index)
        for doc_id, score in got.items():
            is_web = src_col.loc[doc_id] == "src1"
            saw_web |= bool(is_web)
            saw_other |= not is_web
            assert score == pytest.approx(expect(mode, is_web)), \
                (mode, doc_id)
    assert saw_web and saw_other  # both branches exercised


def test_no_matching_function_keeps_base_score(fs_engine):
    eng, _ = fs_engine
    base = ConstantScoreQuery(filter=TermFilter("lang", "en"), boost=7.0)
    q = FunctionScoreQuery(query=base, functions=(
        ScoreFunction(kind="weight", weight=100.0,
                      filter=TermFilter("lang", "zz-none")),))
    got = _scores(eng, q)
    assert got and all(s == pytest.approx(7.0) for s in got.values())


def test_random_score_deterministic_and_uniform(fs_engine):
    eng, _ = fs_engine
    q = FunctionScoreQuery(query=BASE, functions=(
        ScoreFunction(kind="random_score",
                      params=(("field", "doc_id"), ("seed", 42))),))
    a = _scores(eng, q)
    b = _scores(eng, q)
    assert a == b
    vals = np.array(list(a.values()))
    assert ((vals >= 0) & (vals < 1)).all()
    assert vals.std() > 0.1  # spread out, not constant
    q2 = FunctionScoreQuery(query=BASE, functions=(
        ScoreFunction(kind="random_score",
                      params=(("field", "doc_id"), ("seed", 43))),))
    c = _scores(eng, q2)
    assert c != a  # seed-sensitive


def test_max_boost_and_min_score(fs_engine):
    eng, _ = fs_engine
    q = FunctionScoreQuery(query=BASE, functions=(
        ScoreFunction(kind="weight", weight=9.0),), max_boost=4.0)
    got = _scores(eng, q)
    assert got and all(s == pytest.approx(4.0) for s in got.values())

    q = FunctionScoreQuery(query=BASE, functions=(
        ScoreFunction(kind="random_score",
                      params=(("field", "doc_id"), ("seed", 7))),),
        min_score=0.5)
    got = _scores(eng, q)
    assert got and all(s >= 0.5 for s in got.values())


def test_boost_mode_family(fs_engine):
    eng, _ = fs_engine
    base = ConstantScoreQuery(filter=TermFilter("lang", "en"), boost=2.0)
    fn = (ScoreFunction(kind="weight", weight=3.0),)
    for bm, want in [("multiply", 6.0), ("sum", 5.0), ("avg", 2.5),
                     ("max", 3.0), ("min", 2.0), ("replace", 3.0)]:
        q = FunctionScoreQuery(query=base, functions=fn, boost_mode=bm)
        got = _scores(eng, q)
        assert got and all(s == pytest.approx(want) for s in got.values()), bm


def test_dsl_parse_and_roundtrip():
    from elasticsearch_ray.search.dsl import parse_dsl as parse_query, to_dsl

    body = {"function_score": {
        "query": {"term": {"text": "spark"}},
        "functions": [
            {"filter": {"term": {"lang": "en"}}, "weight": 2.0},
            {"gauss": {"n_chars": {"origin": 2000, "scale": 1000,
                                   "offset": 50, "decay": 0.4}},
             "weight": 1.5},
            {"random_score": {"seed": 9, "field": "doc_id"}},
        ],
        "score_mode": "sum", "boost_mode": "multiply",
        "max_boost": 10.0, "min_score": 0.1}}
    q = parse_query(body)
    assert isinstance(q, FunctionScoreQuery)
    assert len(q.functions) == 3
    assert q.functions[1].kind == "gauss"
    assert q.functions[1].param("origin") == 2000
    assert q.score_mode == "sum" and q.max_boost == 10.0
    rt = parse_query(to_dsl(q))
    assert rt == q


def test_dsl_rejects_ambiguous_function():
    from elasticsearch_ray.search.dsl import DslError
    from elasticsearch_ray.search.dsl import parse_dsl as parse_query

    with pytest.raises(DslError):
        parse_query({"function_score": {
            "query": {"term": {"text": "spark"}},
            "functions": [{"gauss": {"x": {"origin": 0, "scale": 1}},
                           "random_score": {"seed": 1}}]}})
