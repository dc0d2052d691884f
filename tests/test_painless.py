"""Painless-subset scripting (search/painless.py — the lang-painless
module analog): language semantics, Java numeric parity, sandbox
rejections, vector/interpreter equivalence, and the engine wirings
(script_score, script_fields, runtime fields, ingest script processor)."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.search.painless import (
    PainlessError,
    _Doc,
    compile_painless,
    painless_doc_fields,
    painless_processor_fn,
    painless_script_field,
)


def run(src, env=None):
    return compile_painless(src).run(env or {})


# ------------------------------------------------------------- language


def test_arithmetic_java_semantics():
    # int/int truncates toward zero; % takes the dividend's sign
    assert run("return 7 / 2;") == 3
    assert run("return -7 / 2;") == -3
    assert run("return -7 % 2;") == -1
    assert run("return 7 % -2;") == 1
    assert run("return 7.0 / 2;") == 3.5
    with pytest.raises(PainlessError, match="division by zero"):
        run("return 1 / 0;")
    assert run("return 1.0 / 0;") == np.inf


def test_string_concat_java_tostring():
    assert run("return 'v=' + 1.0;") == "v=1.0"
    assert run("return 'b=' + true;") == "b=true"
    assert run("return 'n=' + null;") == "n=null"
    assert run("return 1 + '|' + 2;") == "1|2"


def test_control_flow_and_collections():
    out = run("""
    def total = 0;
    for (int i = 0; i < 10; i++) {
      if (i % 2 == 0) { continue; }
      if (i == 9) { break; }
      total += i;
    }
    List l = [10, 20];
    l.add(30);
    Map m = ['k': total];
    m.put('l', l.size());
    return m.get('k') + m.get('l');
    """)
    assert out == (1 + 3 + 5 + 7) + 3


def test_while_do_foreach():
    assert run("int i = 0; while (i < 5) { i++; } return i;") == 5
    assert run("int i = 0; do { i++; } while (i < 3); return i;") == 3
    assert run("""
    def s = 0;
    for (def x : [1, 2, 3]) { s += x; }
    for (String w : 'a b'.split(' ')) { s += w.length(); }
    return s;
    """) == 8


def test_string_methods():
    assert run("return 'Hello'.toLowerCase().substring(1, 3);") == "el"
    assert run("return 'a,b,,c'.splitOnToken(',').size();") == 4
    assert run("return 'abc'.matches('a.c');") is True
    assert run("return 'Spark Joins'.indexOf('Joins');") == 6
    # Java String.hashCode parity ("abc" == 96354)
    assert run("return 'abc'.hashCode();") == 96354


def test_ternary_elvis_nullsafe():
    assert run("return 5 > 3 ? 'y' : 'n';") == "y"
    assert run("def v = null; return v ?: 9;") == 9
    assert run("def v = null; return v?.length();") is None
    with pytest.raises(PainlessError, match="null pointer"):
        run("def v = null; return v.length();")


def test_no_truthiness():
    with pytest.raises(PainlessError, match="boolean"):
        run("if (1) { return 2; } return 3;")


def test_doc_values_contract():
    d = _Doc({"n": 5.0, "tags": ["a", "b"], "missing": None})
    s = compile_painless(
        "return doc['tags'].size() + (doc['missing'].empty ? 100 : 0)"
        " + (long) doc['n'].value;")
    assert s.run({"doc": d}) == 107
    with pytest.raises(PainlessError, match="doesn't have a value"):
        compile_painless("return doc['missing'].value;").run({"doc": d})
    with pytest.raises(PainlessError, match="No field found"):
        compile_painless("return doc['nope'].value;").run({"doc": d})


def test_statics_and_round_half_up():
    assert run("return Math.max(2, Math.round(2.5));") == 3
    assert run("return Math.round(-2.5);") == -2  # Java half-UP
    assert run("return Integer.parseInt('42') + Long.MAX_VALUE % 10;") \
        == 42 + 7
    assert run("return String.join('-', ['a', 'b']);") == "a-b"
    assert abs(run("return Math.log(Math.E);") - 1.0) < 1e-12


def test_sandbox_rejections():
    for bad, msg in [
        ("Math.random()", "deterministic"),
        ("x =~ /a/", "regex"),
        ("def f = (a) -> a;", "lambdas"),
        ("try { return 1; } catch (e) {}", "try/catch"),
        ("'s'.getClass()", "allowlist"),
        ("new File('/etc/passwd')", "construct"),
        ("while (true) { }", "loop limit"),
    ]:
        with pytest.raises(PainlessError, match=msg):
            run(bad)


def test_doc_fields_extraction():
    fields = painless_doc_fields(
        "if (doc.containsKey('lang')) { return doc['a'].value + "
        "doc['b'].value; } return doc['a'].value;")
    assert fields == ["lang", "a", "b"]
    with pytest.raises(PainlessError, match="literal"):
        painless_doc_fields("def f = 'x'; return doc[f].value;")


def test_vectorized_matches_interpreter():
    src = ("double v = doc['x'].value; "
           "return v > 100 ? _score + Math.log(v) : "
           "_score + Math.sqrt(v) * params.w;")
    s = compile_painless(src)
    x = np.array([4.0, 250.0, 81.0, 10000.0])
    scores = np.array([1.0, 2.0, 3.0, 4.0])
    vec = s.run_vectorized({"x": x}, 4, score=scores, params={"w": 2.0})
    rows = [s.run({"doc": _Doc({"x": float(xi)}), "_score": float(si),
                   "params": {"w": 2.0}}) for xi, si in zip(x, scores)]
    assert np.allclose(vec, rows)
    # int-division parity inside the vector path
    s2 = compile_painless("return _score + 7 / 2;")
    assert np.allclose(s2.score_many({}, np.array([1.0])), [4.0])


def test_score_many_falls_back_for_strings():
    s = compile_painless(
        "return doc['lang'].value.equals('en') ? _score * 2 : _score;")
    out = s.score_many({"lang": np.array(["en", "de"], object)},
                       np.array([1.0, 1.0]))
    assert list(out) == [2.0, 1.0]


# ------------------------------------------------------------ contexts


def test_field_context_emit_and_return():
    s = compile_painless("emit(doc['a'].value * 2); emit('x');")
    assert s.field_many([{"a": 3}]) == [[6, "x"]]
    s2 = compile_painless("return doc['a'].value + 1;")
    assert s2.field_many([{"a": 3}, {"a": 10}]) == [4, 11]


def test_ingest_context_mutation():
    s = compile_painless("""
    if (ctx.amount != null && ctx.amount > 100) {
      ctx.level = 'high';
    } else { ctx.level = 'low'; }
    ctx.tag = ctx.category?.toLowerCase() ?: 'none';
    ctx.remove('internal');
    """)
    out = s.ingest_one({"amount": 250, "category": "BOOKS",
                        "internal": 1})
    assert out["level"] == "high" and out["tag"] == "books"
    assert "internal" not in out
    out2 = s.ingest_one({"amount": None, "category": None})
    assert out2["level"] == "low" and out2["tag"] == "none"


def test_processor_fn_frame_contract():
    fn = painless_processor_fn(
        "ctx.total = ctx.qty * ctx.price; "
        "ctx.band = ctx.total > 50 ? 'hi' : 'lo';")
    df = pd.DataFrame({"qty": [2, 10], "price": [3.0, 9.0]})
    out = fn(df)
    assert list(out["total"]) == [6.0, 90.0]
    assert list(out["band"]) == ["lo", "hi"]


def test_script_processor_spec_painless():
    from elasticsearch_ray.ops.processors import Pipeline

    p = Pipeline([{"script": {
        "source": "ctx.flag = ctx.v > 1 ? 'big' : 'small';",
        "lang": "painless"}}])
    out = p(pd.DataFrame({"v": [0, 5]}))
    assert list(out["flag"]) == ["small", "big"]
    with pytest.raises(ValueError, match="not supported"):
        Pipeline([{"script": {"source": "1", "lang": "mustache"}}])


# ------------------------------------------------------- engine wiring


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pl_engine(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("plidx") / "index")
    build_index(SF_DIR, idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang", "n_chars"),
                          files_per_partition=1),
                concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(
        idx, dtype="float64",
        runtime_fields={
            "chars_sq": {"lang": "painless",
                         "source": ("return doc['n_chars'].value * "
                                    "doc['n_chars'].value;")},
        })
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def docs_meta():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "n_chars", "lang"])
    return {d: (n, la) for d, n, la in zip(t["doc_id"].to_pylist(),
                                           t["n_chars"].to_pylist(),
                                           t["lang"].to_pylist())}


def test_engine_script_score_painless(pl_engine, docs_meta):
    from elasticsearch_ray.search.dsl import parse_dsl, to_dsl
    from elasticsearch_ray.search.query import MatchQuery

    body = {"script_score": {
        "query": {"match": {"text": "spark"}},
        "script": {
            "lang": "painless",
            "source": ("double v = doc['n_chars'].value; "
                       "return _score + Math.log(1 + v) * params.w;"),
            "params": {"w": 0.5}},
    }}
    q = parse_dsl(body)
    hits = pl_engine.search(q, k=10**6, mode="exhaustive")
    base = pl_engine.search(MatchQuery("spark"), k=10**6,
                            mode="exhaustive")
    base_s = dict(zip(base["doc_id"].to_pylist(),
                      base["score"].to_pylist()))
    assert len(hits) > 0
    for d, s in zip(hits["doc_id"].to_pylist(),
                    hits["score"].to_pylist()):
        expect = base_s[d] + np.log(1 + docs_meta[d][0]) * 0.5
        assert abs(s - expect) < 1e-6, (d, s, expect)
    # round-trip keeps lang + params
    rt = to_dsl(q)
    assert rt["script_score"]["script"]["lang"] == "painless"
    assert rt["script_score"]["script"]["params"] == {"w": 0.5}


def test_engine_script_score_painless_string_column(pl_engine,
                                                    docs_meta):
    # non-numeric column → per-row interpreter fallback inside the engine
    from elasticsearch_ray.search.dsl import parse_dsl

    body = {"script_score": {
        "query": {"match": {"text": "spark"}},
        "script": {
            "lang": "painless",
            "source": ("return doc['lang'].value.equals('en') ? "
                       "_score + 100 : _score;")},
    }}
    hits = pl_engine.search(parse_dsl(body), k=10**6,
                            mode="exhaustive")
    assert len(hits) > 0
    seen_en = seen_other = False
    for d, s in zip(hits["doc_id"].to_pylist(),
                    hits["score"].to_pylist()):
        if docs_meta[d][1] == "en":
            assert s > 100
            seen_en = True
        else:
            assert s < 100
            seen_other = True
    assert seen_en and seen_other


def test_engine_script_fields_painless(pl_engine, docs_meta):
    from elasticsearch_ray.search.query import MatchQuery

    hits = pl_engine.search(MatchQuery("spark"), k=8)
    out = pl_engine.script_fields(hits, {
        "band": {"lang": "painless",
                 "source": ("return doc['n_chars'].value >= 500 ? "
                            "'long' : 'short';")},
    })
    assert "band" in out.column_names
    assert len(out) == len(hits) > 0
    for d, b in zip(out["doc_id"].to_pylist(), out["band"].to_pylist()):
        assert b == ("long" if docs_meta[d][0] >= 500 else "short")


def test_engine_runtime_field_painless(pl_engine, docs_meta):
    from elasticsearch_ray.search.query import (
        BoolQuery,
        MatchAllQuery,
        RangeFilter,
    )

    got = pl_engine.count(BoolQuery(must=(MatchAllQuery(),),
                                    filter=(RangeFilter("chars_sq",
                                                        gte=250000.0),)))
    want = sum(1 for n, _ in docs_meta.values() if n * n >= 250000)
    assert got == want > 0


def test_runtime_field_bad_lang_rejected(tmp_path):
    from elasticsearch_ray.search.engine import QueryEngine

    # dict runtime field with a non-painless lang fails fast, before
    # the engine even opens the index directory
    with pytest.raises(ValueError, match="painless"):
        QueryEngine(str(tmp_path), runtime_fields={
            "x": {"lang": "mustache", "source": "1"}})
