"""Regression tests for the second round-5 code-review pass (9 findings
on the DFA/datafeed/IVF-PQ/llm-prep/on_failure/SPLIT batch)."""

import numpy as np
import pandas as pd
import pytest

import ray


def test_esql_split_literal_separator(ray_session):
    # finding 1: multi-char separators are LITERAL, not regex
    from elasticsearch_ray.search.esql import esql

    df = pd.DataFrame({"i": [0, 1], "s": ["a||b||c", "x.y"]})
    tables = {"t": ray.data.from_pandas(df)}
    out = esql('FROM t | EVAL p = SPLIT(s, "||") | MV_EXPAND p '
               '| KEEP i, p | SORT i, p', tables).to_pandas()
    assert out[out["i"] == 0]["p"].tolist() == ["a", "b", "c"]
    # "." is a literal dot, not any-char
    out2 = esql('FROM t | EVAL p = SPLIT(s, ".") | MV_EXPAND p '
                '| KEEP i, p | SORT i, p', tables).to_pandas()
    assert out2[out2["i"] == 1]["p"].tolist() == ["x", "y"]
    assert out2[out2["i"] == 0]["p"].tolist() == ["a||b||c"]


def test_esql_split_null_stays_null(ray_session):
    from elasticsearch_ray.search.esql import esql

    df = pd.DataFrame({"i": [0, 1], "s": ["a b", None]})
    tables = {"t": ray.data.from_pandas(df)}
    out = esql('FROM t | EVAL p = SPLIT(s, " ") | MV_EXPAND p | KEEP i, p',
               tables).to_pandas()
    null_rows = out[out["i"] == 1]
    assert len(null_rows) == 1 and pd.isna(null_rows["p"].iloc[0])


def test_datafeed_should_with_filter_is_score_only():
    # finding 2: minimum_should_match defaults to 0 with must/filter
    from elasticsearch_ray.ops.datafeed import _query_mask

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    m = _query_mask(df, {"bool": {
        "filter": [{"range": {"a": {"gte": 1}}}],
        "should": [{"term": {"b": "x"}}]}})
    assert m.tolist() == [True, True, True]
    # pure-should bool still requires one should to match
    m2 = _query_mask(df, {"bool": {"should": [{"term": {"b": "x"}},
                                              {"term": {"b": "y"}}]}})
    assert m2.tolist() == [True, True, False]


def test_pipeline_on_failure_sees_in_flight_state():
    # finding 3: pipeline-level handler receives prior steps' changes
    from elasticsearch_ray.ops.processors import Pipeline

    seen = {}

    def grab(df):
        seen["cols"] = dict(df.iloc[0])
        return df

    pipe = Pipeline(
        [{"set": {"field": "added", "value": 7}},
         {"convert": {"field": "num", "type": "integer"}}],
        on_failure=[{"script": {"fn": grab}}])
    out = pipe(pd.DataFrame({"num": ["bad"]}))
    assert seen["cols"].get("added") == 7  # in-flight, not pristine
    assert out["added"].iloc[0] == 7


def test_simulate_verbose_renders_on_failure_handlers():
    # finding 4: verbose simulate shows handler execution + continues
    from elasticsearch_ray.ops.processors import simulate_pipeline

    res = simulate_pipeline(
        [{"convert": {"field": "num", "type": "integer",
                      "on_failure": [{"set": {"field": "num",
                                              "value": -1}}]}},
         {"uppercase": {"field": "name"}}],
        [{"num": "bad", "name": "a"}], verbose=True)
    results = res["docs"][0]["processor_results"]
    statuses = [(r["processor_type"], r["status"]) for r in results]
    assert ("convert", "error") in statuses
    assert ("set", "success") in statuses  # the handler's own result
    assert statuses[-1] == ("uppercase", "success")  # chain continued
    final = results[-1]["doc"]["_source"]
    assert final["num"] == -1 and final["name"] == "A"
    # ignore_failure renders error_ignored and keeps going
    res2 = simulate_pipeline(
        [{"convert": {"field": "num", "type": "integer",
                      "ignore_failure": True}},
         {"uppercase": {"field": "name"}}],
        [{"num": "bad", "name": "a"}], verbose=True)
    r2 = res2["docs"][0]["processor_results"]
    assert r2[0]["status"] == "error_ignored"
    assert r2[1]["status"] == "success"


def test_stratified_rate_one_keeps_every_row(ray_session):
    # finding 5: rate 1.0 must keep ALL rows including the max-hash
    # residue; doc_id=4050964655 hashes to 4294967295 exactly
    from elasticsearch_ray.ops.llm_prep import stratified_sample

    special = 4050964655
    h = (np.uint64(special) * np.uint64(2654435761)) % np.uint64(2**32)
    assert int(h) == 2**32 - 1
    df = pd.DataFrame({"doc_id": np.array([0, 1, special], np.int64),
                       "lang": ["en", "en", "en"]})
    out = stratified_sample(ray.data.from_pandas(df), "lang",
                            {"en": 1.0}, "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, special]


def test_redact_pii_null_stays_null(ray_session):
    # finding 6: null text must stay null, matching the SQL twin
    import duckdb

    from elasticsearch_ray.ops.llm_prep import pii_sql_expr, redact_pii

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a@b.io", None]})
    out = redact_pii(ray.data.from_pandas(df), "text").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["text"][0] == "<EMAIL>" and pd.isna(out["text"][1])
    con = duckdb.connect()
    con.register("t", df)
    twin = con.execute(
        f"SELECT {pii_sql_expr('text')} AS r FROM t ORDER BY doc_id"
    ).df()["r"]
    assert twin[0] == "<EMAIL>" and pd.isna(twin[1])


def test_pipeline_batch_keeps_vectorized_rows_fast(ray_session):
    # finding 7: only the FAILING step degrades per-row; a step that
    # succeeds on the whole batch runs exactly once (vectorized)
    from elasticsearch_ray.ops.processors import Pipeline, register, Processor

    calls = {"n": 0}

    @register("_counting_upper")
    class _CountingUpper(Processor):
        def __init__(self, field):
            self.field = field

        def __call__(self, df):
            calls["n"] += 1
            df[self.field] = df[self.field].str.upper()
            return df

    pipe = Pipeline([
        {"convert": {"field": "num", "type": "integer",
                     "on_failure": [{"set": {"field": "num", "value": 0}}]}},
        {"_counting_upper": {"field": "name"}},
    ])
    df = pd.DataFrame({"num": ["1", "bad", "3", "4"],
                       "name": ["a", "b", "c", "d"]})
    out = pipe(df).sort_values("name", ignore_index=True)
    assert out["num"].tolist() == [1, 0, 3, 4]
    assert out["name"].tolist() == ["A", "B", "C", "D"]
    # the healthy second step ran ONCE on the whole recovered frame
    assert calls["n"] == 1


def test_dfa_margin_column_still_layout_invariant(ray_session):
    # finding 9: persisted-margin refactor keeps bit-stability AND the
    # served model matches training margins
    import json

    from elasticsearch_ray.ops.dfa_train import fit_gbt
    from elasticsearch_ray.ops.inference import TrainedModelDefinition

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"x1": rng.uniform(0, 10, 300).round(3),
                       "x2": rng.uniform(-5, 5, 300).round(3)})
    df["y"] = (np.where(df.x1 > 5, 20.0, 3.0) + 0.5 * df.x1).round(4)
    a, _ = fit_gbt(ray.data.from_pandas(df).repartition(1),
                   ["x1", "x2"], "y", max_trees=6, max_depth=3,
                   num_bins=16)
    b, _ = fit_gbt(ray.data.from_pandas(
        df.sample(frac=1.0, random_state=2)).repartition(6),
        ["x1", "x2"], "y", max_trees=6, max_depth=3, num_bins=16)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)
    pred = TrainedModelDefinition(a).infer(df)["predicted_value"]
    assert float(np.mean((df["y"] - pred) ** 2)) < \
        0.2 * float(df["y"].var())
