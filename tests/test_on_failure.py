"""Ingest pipeline failure handling — CompoundProcessor.java semantics:
per-processor on_failure chains with _ingest.on_failure_* metadata,
ignore_failure, pipeline-level on_failure, per-doc isolation on the
vectorized fast path, failure_col as the bulk per-doc-error analog.
"""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.processors import Pipeline


def _df():
    return pd.DataFrame({
        "doc_id": [0, 1, 2],
        "num": ["10", "abc", "30"],
        "name": ["a", "b", "c"],
    })


def test_fast_path_unchanged_without_handlers():
    pipe = Pipeline([{"convert": {"field": "num", "type": "integer"}}])
    with pytest.raises(Exception):
        pipe(_df())  # no handlers anywhere: batch error propagates
    ok = pipe(pd.DataFrame({"num": ["1", "2"]}))
    assert ok["num"].tolist() == [1, 2]


def test_processor_on_failure_continues_chain():
    pipe = Pipeline([
        {"convert": {"field": "num", "type": "integer",
                     "on_failure": [{"set": {"field": "num", "value": -1}}]}},
        {"uppercase": {"field": "name"}},
    ])
    out = pipe(_df()).sort_values("doc_id", ignore_index=True)
    # doc 1 fell into the handler; the chain CONTINUED (uppercase ran)
    assert out["num"].tolist() == [10, -1, 30]
    assert out["name"].tolist() == ["A", "B", "C"]
    # ingest metadata does not leak into the output
    assert not [c for c in out.columns if c.startswith("_ingest.")]


def test_on_failure_metadata_visible_in_handler():
    seen = {}

    def grab(df):
        seen["msg"] = df["_ingest.on_failure_message"].iloc[0]
        seen["type"] = df["_ingest.on_failure_processor_type"].iloc[0]
        seen["tag"] = df["_ingest.on_failure_processor_tag"].iloc[0]
        return df

    pipe = Pipeline([
        {"convert": {"field": "num", "type": "integer", "tag": "conv1",
                     "on_failure": [{"script": {"fn": grab}}]}},
    ])
    pipe(_df())
    assert seen["type"] == "convert" and seen["tag"] == "conv1"
    assert seen["msg"]  # the underlying astype error message


def test_ignore_failure_passes_doc_through():
    pipe = Pipeline([
        {"convert": {"field": "num", "type": "integer",
                     "ignore_failure": True}},
        {"uppercase": {"field": "name"}},
    ])
    out = pipe(_df()).sort_values("doc_id", ignore_index=True)
    assert out["num"].tolist() == [10, "abc", 30]  # doc 1 untouched
    assert out["name"].tolist() == ["A", "B", "C"]


def test_pipeline_level_on_failure():
    pipe = Pipeline(
        [{"convert": {"field": "num", "type": "integer"}}],
        on_failure=[{"set": {"field": "err_handled", "value": True}}])
    out = pipe(_df()).sort_values("doc_id", ignore_index=True)
    # failing doc ran ONLY the pipeline handler (source unprocessed)
    assert out.loc[1, "num"] == "abc" and out.loc[1, "err_handled"] == True  # noqa: E712
    assert out.loc[0, "num"] == 10
    assert pd.isna(out.loc[0, "err_handled"])


def test_failure_col_keeps_doc_with_error():
    pipe = Pipeline([{"convert": {"field": "num", "type": "integer"}}],
                    failure_col="_error")
    out = pipe(_df()).sort_values("doc_id", ignore_index=True)
    assert out.loc[1, "num"] == "abc"
    assert "ValueError" in out.loc[1, "_error"] or \
        "Error" in out.loc[1, "_error"]
    assert pd.isna(out.loc[0, "_error"]) and out.loc[0, "num"] == 10


def test_nested_handler_failure_escalates():
    # handler itself fails -> escalates to pipeline-level handler
    pipe = Pipeline(
        [{"convert": {"field": "num", "type": "integer",
                      "on_failure": [{"fail": {"message": "handler boom"}}]}}],
        on_failure=[{"set": {"field": "rescued", "value": 1}}])
    out = pipe(_df()).sort_values("doc_id", ignore_index=True)
    assert out.loc[1, "rescued"] == 1
    assert pd.isna(out.loc[0, "rescued"])


def test_unhandled_after_all_handlers_raises():
    pipe = Pipeline(
        [{"convert": {"field": "num", "type": "integer"}}],
        on_failure=[{"fail": {"message": "still broken"}}])
    with pytest.raises(ValueError, match="still broken"):
        pipe(_df())


def test_per_doc_isolation_in_dataset(ray_session):
    import ray

    pipe = Pipeline([
        {"convert": {"field": "num", "type": "integer",
                     "on_failure": [{"set": {"field": "num", "value": 0}}]}},
    ])
    n = 200
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "num": [("bad" if i % 7 == 0 else str(i)) for i in range(n)],
    })
    out = ray.data.from_pandas(df).repartition(4).map_batches(
        pipe, batch_format="pandas").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    expect = [0 if i % 7 == 0 else i for i in range(n)]
    assert out["num"].astype(int).tolist() == expect
