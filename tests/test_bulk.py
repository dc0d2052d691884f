"""_bulk API — BulkRequestParser + TransportShardBulkAction per-item
semantics (sequential application, create conflicts, update merge/noop,
non-error delete not_found, request-order items)."""

import json

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.bulk import bulk_apply, parse_bulk


def _frame():
    return pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["one", "two", "three"],
        "lang": ["en", "en", "de"],
    })


def test_parse_bulk_shapes_and_errors():
    ops = parse_bulk(
        '{"index": {"_id": 9}}\n{"text": "x"}\n'
        '{"delete": {"_id": 1}}\n'
        '{"update": {"_id": 2}}\n{"doc": {"lang": "fr"}}\n')
    assert [o[0] for o in ops] == ["index", "delete", "update"]
    assert ops[1][2] is None
    with pytest.raises(ValueError, match="missing its source"):
        parse_bulk('{"index": {"_id": 1}}')
    with pytest.raises(ValueError, match="Unknown key"):
        parse_bulk('{"upsert": {"_id": 1}}\n{}')
    with pytest.raises(ValueError, match="Malformed action"):
        parse_bulk('not json\n{}')


def test_bulk_apply_full_semantics():
    body = "\n".join([
        json.dumps({"index": {"_id": 4}}),      # new -> created 201
        json.dumps({"text": "four", "lang": "en"}),
        json.dumps({"index": {"_id": 2}}),      # exists -> updated 200
        json.dumps({"text": "TWO", "lang": "en"}),
        json.dumps({"create": {"_id": 3}}),     # conflict -> 409 error
        json.dumps({"text": "x"}),
        json.dumps({"update": {"_id": 1}}),     # merge -> updated
        json.dumps({"doc": {"lang": "fr"}}),
        json.dumps({"update": {"_id": 99}}),    # missing -> 404 error
        json.dumps({"doc": {"lang": "xx"}}),
        json.dumps({"delete": {"_id": 4}}),     # deleted 200
        json.dumps({"delete": {"_id": 4}}),     # already gone -> 404 result
        json.dumps({"create": {"_id": 4}}),     # create AFTER delete -> ok
        json.dumps({"text": "four2", "lang": "zh"}),
        json.dumps({"update": {"_id": 1}}),     # same values -> noop
        json.dumps({"doc": {"lang": "fr"}}),
    ])
    out, resp = bulk_apply(_frame(), body)
    kinds = [next(iter(i)) for i in resp["items"]]
    stat = [i[k]["status"] for i, k in zip(resp["items"], kinds)]
    res = [i[k].get("result") for i, k in zip(resp["items"], kinds)]
    assert resp["errors"] is True
    assert stat == [201, 200, 409, 200, 404, 200, 404, 201, 200]
    assert res == ["created", "updated", None, "updated", None,
                   "deleted", "not_found", "created", "noop"]
    assert "error" in resp["items"][2]["create"]
    assert resp["items"][2]["create"]["error"]["type"] == \
        "version_conflict_engine_exception"
    assert resp["items"][4]["update"]["error"]["type"] == \
        "document_missing_exception"
    # delete not_found carries NO error and does not flip `errors`
    assert "error" not in resp["items"][6]["delete"]
    final = out.sort_values("doc_id").reset_index(drop=True)
    assert final["doc_id"].tolist() == [1, 2, 3, 4]
    assert final["text"].tolist() == ["one", "TWO", "three", "four2"]
    assert final["lang"].tolist() == ["fr", "en", "de", "zh"]


def test_bulk_auto_id_and_pipeline():
    from elasticsearch_ray.ops.processors import Pipeline

    pipe = Pipeline([{"uppercase": {"field": "text"}}])
    body = ('{"index": {}}\n{"text": "auto", "lang": "en"}\n')
    out, resp = bulk_apply(_frame(), body, pipeline=pipe)
    item = resp["items"][0]["index"]
    assert item["status"] == 201 and item["_id"] == 4  # max+1 auto id
    assert out[out["doc_id"] == 4]["text"].iloc[0] == "AUTO"


def test_bulk_errors_false_when_clean():
    _out, resp = bulk_apply(_frame(),
                            '{"delete": {"_id": 3}}\n')
    assert resp["errors"] is False


def test_bulk_index_replaces_whole_document():
    """review r5 #6: index on an existing id is FULL replacement —
    columns absent from the new source are cleared, not inherited."""
    out, resp = bulk_apply(_frame(),
                           '{"index": {"_id": 2}}\n{"text": "TWO"}\n')
    row = out[out["doc_id"] == 2].iloc[0]
    assert row["text"] == "TWO"
    assert pd.isna(row["lang"])
    assert resp["items"][0]["index"]["result"] == "updated"
