"""_ingest/pipeline/_simulate + _analyze explain detail responses."""

import pytest

from elasticsearch_ray.ops.processors import simulate_pipeline


def test_simulate_basic():
    out = simulate_pipeline(
        [{"set": {"field": "env", "value": "prod"}},
         {"uppercase": {"field": "name"}}],
        [{"name": "alice"}, {"name": "bob"}])
    docs = out["docs"]
    assert docs[0]["doc"]["_source"] == {"name": "ALICE", "env": "prod"}
    assert docs[1]["doc"]["_source"] == {"name": "BOB", "env": "prod"}


def test_simulate_verbose_and_error_isolation():
    out = simulate_pipeline(
        [{"set": {"field": "env", "value": "prod"}},
         {"convert": {"field": "n", "type": "integer"}}],
        [{"n": "42"}, {"n": "not-a-number"}], verbose=True)
    ok, bad = out["docs"]
    assert [r["status"] for r in ok["processor_results"]] == \
        ["success", "success"]
    assert ok["processor_results"][0]["processor_type"] == "set"
    assert ok["processor_results"][1]["doc"]["_source"]["n"] == 42
    # the failing doc reports the error at the convert step; the first
    # doc was unaffected (per-doc isolation)
    sts = [r["status"] for r in bad["processor_results"]]
    assert sts == ["success", "error"]
    assert bad["processor_results"][1]["error"]["type"]


def test_simulate_non_verbose_error():
    out = simulate_pipeline(
        [{"convert": {"field": "n", "type": "integer"}}],
        [{"n": "x"}])
    assert "error" in out["docs"][0]


def test_analyze_explain_custom_chain(ray_session, tmp_path_factory):
    import json

    from elasticsearch_ray.analysis.analyzers import get_analyzer

    cfg = json.dumps({"tokenizer": "standard",
                      "filters": ["lowercase",
                                  ["stop", {"stopwords": ["the"]}]]})
    an = get_analyzer(f"custom:{cfg}")
    detail = an.explain("The Quick FOX")
    assert detail["tokenizer"]["name"] == "standard"
    toks0 = [t["token"] for t in detail["tokenizer"]["tokens"]]
    assert toks0 == ["The", "Quick", "FOX"]
    steps = detail["tokenfilters"]
    assert [t["token"] for t in steps[0]["tokens"]] == \
        ["the", "quick", "fox"]
    assert [t["token"] for t in steps[1]["tokens"]] == ["quick", "fox"]


def test_analyze_explain_named_analyzer(ray_session, tmp_path_factory):
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.search.engine import QueryEngine

    idx = str(tmp_path_factory.mktemp("expidx") / "index")
    build_index("/root/testdata/sf0.001", idx,
                IndexSpec(use_html=False, text_column="text",
                          doc_columns=("lang",)),
                concurrency=2, file_pattern="documents.parquet")
    eng = QueryEngine(idx, dtype="float64")
    d = eng.analyze("Hello World", explain=True)
    assert [t["token"] for t in d["analyzer"]["tokens"]] == \
        ["hello", "world"]
    flat = eng.analyze("Hello World")
    assert [t["token"] for t in flat] == ["hello", "world"]
