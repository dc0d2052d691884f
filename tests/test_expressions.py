"""lang-expression analog: sandboxed arithmetic expression compiler
(search/expressions.py) — grammar, vectorization, sandboxing."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.search.expressions import (
    ExpressionError,
    add_expression_column,
    compile_expression,
)


def _run(src, **cols):
    return compile_expression(src)({k: np.asarray(v, np.float64)
                                    for k, v in cols.items()})


def test_arithmetic_and_precedence():
    x = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(_run("x * 2 + 1", x=x), x * 2 + 1)
    np.testing.assert_allclose(_run("1 + x * 2", x=x), 1 + x * 2)
    np.testing.assert_allclose(_run("(1 + x) * 2", x=x), (1 + x) * 2)
    np.testing.assert_allclose(_run("-x + 10 % 3", x=x), -x + 1)
    np.testing.assert_allclose(_run("2 ** x", x=x), 2.0 ** x)
    np.testing.assert_allclose(_run("x / 4", x=x), x / 4)


def test_functions_and_constants():
    x = np.array([1.0, 4.0, 9.0])
    np.testing.assert_allclose(_run("sqrt(x)", x=x), np.sqrt(x))
    np.testing.assert_allclose(_run("ln(1 + x)", x=x), np.log1p(x))
    np.testing.assert_allclose(_run("max(x, 5)", x=x), np.maximum(x, 5))
    np.testing.assert_allclose(_run("pow(x, 2)", x=x), x ** 2)
    np.testing.assert_allclose(_run("logn(2, x)", x=x), np.log2(x))
    np.testing.assert_allclose(_run("PI * 2"), [np.pi * 2])


def test_comparisons_ternary_bool():
    x = np.array([1.0, 5.0, 10.0])
    np.testing.assert_allclose(_run("x > 4 ? 100 : x", x=x), [1, 100, 100])
    np.testing.assert_allclose(_run("(x > 1) && (x < 10)", x=x), [0, 1, 0])
    np.testing.assert_allclose(_run("(x == 1) || (x == 10)", x=x), [1, 0, 1])
    np.testing.assert_allclose(_run("!(x > 4)", x=x), [1, 0, 0])
    # nested ternary associates right
    np.testing.assert_allclose(
        _run("x > 6 ? 2 : x > 2 ? 1 : 0", x=x), [0, 1, 2])


def test_docref_sugar_and_score():
    x = np.array([3.0])
    np.testing.assert_allclose(_run("doc['f'].value * 2", f=x), [6.0])
    np.testing.assert_allclose(_run("doc.f.value + _score", f=x,
                                    _score=np.array([0.5])), [3.5])


def test_modulo_is_truncated_remainder():
    # JS/Lucene-expressions %: sign of the DIVIDEND (np.fmod, not np.mod)
    np.testing.assert_allclose(_run("x % 7", x=np.array([-1.0, 8.0])),
                               [-1.0, 1.0])


def test_constant_expression_over_nonnumeric_batch(ray_session):
    # review finding: all-string batch left env empty and a constant
    # expression produced a 1-row column for an N-row table
    import ray.data as rd

    df = pd.DataFrame({"s": ["a", "b", "c", "d"]})
    out = add_expression_column(rd.from_pandas(df), "k", "1 + 2").to_pandas()
    assert out["k"].tolist() == [3.0] * 4


def test_ieee_division():
    out = _run("x / y", x=np.array([1.0, 0.0]), y=np.array([0.0, 0.0]))
    assert np.isinf(out[0]) and np.isnan(out[1])


def test_sandbox_rejections():
    with pytest.raises(ExpressionError):  # string literal = bad token
        compile_expression("__import__('os')")
    with pytest.raises(ExpressionError, match="unknown function"):
        compile_expression("open(1)")
    with pytest.raises(ExpressionError, match="unknown variable"):
        compile_expression("nope + 1")({"x": np.ones(2)})
    with pytest.raises(ExpressionError, match="bad token"):
        compile_expression("x; import os")
    with pytest.raises(ExpressionError, match="argument"):
        compile_expression("sqrt(1, 2)")
    with pytest.raises(ExpressionError):
        compile_expression("x +")
    with pytest.raises(ExpressionError, match="trailing"):
        compile_expression("1 2")


def test_dataset_expression_column(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0],
                       "s": ["x", "y", "z"]})  # non-numeric col is invisible
    out = add_expression_column(rd.from_pandas(df), "c",
                                "sqrt(a) + b / 10").to_pandas()
    np.testing.assert_allclose(out["c"], np.sqrt(df["a"]) + df["b"] / 10)


def test_random_expression_trees_property():
    """Property: a random expression tree rendered to source and compiled
    evaluates to the same value as composing the numpy ops directly
    (generator builds string and expected value together, so the test
    cannot share parser bugs)."""
    rng = np.random.default_rng(13)
    x = rng.uniform(0.5, 9.5, 64)
    y = rng.uniform(0.5, 9.5, 64)
    env = {"x": x, "y": y}

    def gen(depth):
        r = rng.integers(0, 8 if depth > 0 else 3)
        if r == 0:
            c = round(float(rng.uniform(0.5, 9.5)), 3)
            return f"{c}", np.full(64, c)
        if r == 1:
            return "x", x
        if r == 2:
            return "y", y
        a_s, a_v = gen(depth - 1)
        b_s, b_v = gen(depth - 1)
        if r == 3:
            return f"({a_s} + {b_s})", a_v + b_v
        if r == 4:
            return f"({a_s} * {b_s})", a_v * b_v
        if r == 5:
            return f"({a_s} - {b_s})", a_v - b_v
        if r == 6:
            return f"sqrt(abs({a_s}))", np.sqrt(np.abs(a_v))
        return (f"({a_s} > {b_s} ? {a_s} : {b_s})",
                np.where(a_v > b_v, a_v, b_v))

    for _ in range(60):
        src, want = gen(4)
        got = compile_expression(src)(env)
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=src)


@pytest.fixture(scope="module")
def expr_eng(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("expridx") / "index")
    build_index("/root/testdata/sf0.001", idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang", "n_chars")),
                concurrency=2, file_pattern="documents.parquet")
    e = QueryEngine(idx, dtype="float64")
    yield e
    e.close()


def test_script_fields_accepts_expression_source(expr_eng):
    from elasticsearch_ray.search.query import MatchQuery

    eng = expr_eng
    hits = eng.search(MatchQuery("spark"), k=5, fetch=("doc_id",))
    out = eng.script_fields(hits, {"half": "n_chars / 2"},
                            source_columns=("n_chars",))
    n_chars = eng.script_fields(hits, {"nc": "n_chars"},
                                source_columns=("n_chars",))["nc"]
    np.testing.assert_allclose(out["half"].to_numpy(),
                               n_chars.to_numpy() / 2)


def test_script_score_expression_query(expr_eng):
    """script_score with an expression source: score == expression over
    (_score, doc columns), bit-checked against the base query + stored
    n_chars; DSL parse → to_dsl round-trips."""
    from elasticsearch_ray.search.dsl import parse_dsl, to_dsl
    from elasticsearch_ray.search.query import FunctionScoreQuery, MatchQuery

    eng = expr_eng
    base = eng.search(MatchQuery("spark join"), k=10_000, mode="exhaustive",
                      fetch=("doc_id", "n_chars"))
    q = FunctionScoreQuery(query=MatchQuery("spark join"),
                           script="_score * 2 + sqrt(n_chars)")
    out = eng.search(q, k=10_000, mode="exhaustive",
                     fetch=("doc_id", "n_chars"))
    assert len(out) == len(base) > 0
    want = {r["doc_id"]: 2 * r["score"] + np.sqrt(r["n_chars"])
            for r in base.to_pylist()}
    for r in out.to_pylist():
        assert abs(r["score"] - want[r["doc_id"]]) < 1e-9

    body = {"script_score": {"query": {"match": {"text": "spark join"}},
                             "script": {"source": "_score * 2 + sqrt(n_chars)"}}}
    parsed = parse_dsl(body)
    assert parsed.script == "_score * 2 + sqrt(n_chars)"
    rt = to_dsl(parsed)
    assert parse_dsl(rt) == parsed
    out2 = eng.search(parsed, k=5, mode="exhaustive", fetch=("doc_id",))
    assert len(out2) == 5
    for r in out2.to_pylist():
        assert abs(r["score"] - want[r["doc_id"]]) < 1e-9
