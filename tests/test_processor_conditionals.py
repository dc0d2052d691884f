"""Per-processor ``if`` conditions (ConditionalProcessor.java: a
Painless condition over read-only ctx gates each step per document)."""

import numpy as np
import pandas as pd

from elasticsearch_ray.ops.processors import Pipeline, simulate_pipeline


def _frame():
    return pd.DataFrame({
        "event_type": ["error", "click", "error", "view"],
        "value": [60.0, 10.0, 20.0, 80.0],
        "event_id": [0, 1, 2, 3],
    })


def test_conditional_set_gates_per_document():
    pipe = Pipeline([
        {"set": {"field": "flag", "value": "bad",
                 "if": "ctx.event_type == 'error'"}},
    ])
    out = pipe(_frame())
    assert out["event_id"].tolist() == [0, 1, 2, 3]  # order preserved
    assert out["flag"].tolist()[0] == "bad" and out["flag"].tolist()[2] == "bad"
    assert pd.isna(out["flag"].iloc[1]) and pd.isna(out["flag"].iloc[3])


def test_conditional_drop_reference_form():
    # {"drop": {"if": ...}} — the reference's conditional drop
    pipe = Pipeline([{"drop": {"if": "ctx.value > 50"}}])
    out = pipe(_frame())
    assert out["event_id"].tolist() == [1, 2]


def test_condition_all_true_and_all_false_fast_paths():
    pipe_t = Pipeline([{"set": {"field": "x", "value": 1,
                                "if": "ctx.value >= 0"}}])
    assert (pipe_t(_frame())["x"] == 1).all()
    pipe_f = Pipeline([{"set": {"field": "x", "value": 1,
                                "if": "ctx.value < 0"}}])
    assert "x" not in pipe_f(_frame()).columns


def test_false_condition_shields_failing_processor():
    # the step would fail on every doc, but the condition is false ->
    # never runs, pipeline succeeds (reference: condition evaluated
    # BEFORE the processor)
    pipe = Pipeline([{"fail": {"message": "boom",
                               "if": "ctx.event_type == 'nope'"}}])
    out = pipe(_frame())
    assert len(out) == 4


def test_conditions_compose_with_failure_handling():
    # failing step gated to error docs only; ignore_failure keeps them
    pipe = Pipeline([
        {"fail": {"message": "boom", "if": "ctx.event_type == 'error'",
                  "ignore_failure": True}},
        {"set": {"field": "done", "value": True}},
    ])
    out = pipe(_frame())
    assert len(out) == 4
    assert out["done"].all()


def test_simulate_verbose_reports_skipped():
    res = simulate_pipeline(
        [
            {"set": {"field": "x", "value": 1,
                     "if": "ctx.event_type == 'error'"}},
            {"set": {"field": "y", "value": 2}},
        ],
        [{"event_type": "click", "value": 1.0}],
        verbose=True,
    )
    steps = res["docs"][0]["processor_results"]
    assert steps[0]["status"] == "skipped"
    assert steps[1]["status"] == "success"


def test_callable_condition_supported():
    pipe = Pipeline([
        {"set": {"field": "x", "value": 9,
                 "if": (lambda ctx: ctx["event_id"] % 2 == 0)}},
    ])
    out = pipe(_frame())
    got = out["x"].tolist()
    assert got[0] == 9 and got[2] == 9
    assert pd.isna(got[1]) and pd.isna(got[3])


def test_review_r5c_simulate_dropped_doc():
    """Review r5c #2: a dropped doc reports doc: null / status dropped,
    not an IndexError."""
    res = simulate_pipeline([{"drop": {"if": "ctx.value > 50"}}],
                            [{"value": 60.0}, {"value": 1.0}])
    assert res["docs"][0] == {"doc": None}
    assert res["docs"][1]["doc"]["_source"]["value"] == 1.0
    v = simulate_pipeline([{"drop": {"if": "ctx.value > 50"}},
                           {"set": {"field": "x", "value": 1}}],
                          [{"value": 60.0}], verbose=True)
    steps = v["docs"][0]["processor_results"]
    assert steps[0]["status"] == "dropped"
    assert len(steps) == 1  # chain stops at the drop
