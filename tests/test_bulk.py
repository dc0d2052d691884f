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


def test_update_script_counter_and_ctx_op():
    """UpdateHelper: scripted update mutates ctx._source; ctx.op none ->
    noop, delete -> document removed."""
    from elasticsearch_ray.ops.bulk import bulk_apply

    df = pd.DataFrame({"doc_id": [1, 2], "counter": [1, 9]})
    out, resp = bulk_apply(df, [
        ("update", {"_id": 1},
         {"script": {"source": "ctx._source.counter += params.n",
                     "params": {"n": 4}}}),
        ("update", {"_id": 2},
         {"script": {"source":
                     "if (ctx._source.counter > 5) { ctx.op = 'delete' }"}}),
    ], id_col="doc_id")
    assert not resp["errors"]
    assert resp["items"][0]["update"]["result"] == "updated"
    assert resp["items"][1]["update"]["result"] == "deleted"
    assert out["doc_id"].tolist() == [1]
    assert int(out["counter"].iloc[0]) == 5


def test_update_script_noop_op():
    from elasticsearch_ray.ops.bulk import bulk_apply

    df = pd.DataFrame({"doc_id": [1], "v": [3]})
    out, resp = bulk_apply(df, [
        ("update", {"_id": 1}, {"script": {"source": "ctx.op = 'none'"}}),
    ], id_col="doc_id")
    assert resp["items"][0]["update"]["result"] == "noop"
    assert int(out["v"].iloc[0]) == 3


def test_update_upsert_paths():
    """upsert inserted as-is when missing (no script run unless
    scripted_upsert); doc_as_upsert uses doc; script+upsert runs the
    script on existing docs only."""
    from elasticsearch_ray.ops.bulk import bulk_apply

    df = pd.DataFrame({"doc_id": [1], "counter": [10]})
    out, resp = bulk_apply(df, [
        # missing id + upsert -> insert upsert untouched
        ("update", {"_id": 5},
         {"script": {"source": "ctx._source.counter += 1"},
          "upsert": {"counter": 100}}),
        # existing id + same spec -> script runs
        ("update", {"_id": 1},
         {"script": {"source": "ctx._source.counter += 1"},
          "upsert": {"counter": 100}}),
        # doc_as_upsert on a missing id
        ("update", {"_id": 7},
         {"doc": {"counter": 42}, "doc_as_upsert": True}),
    ], id_col="doc_id")
    assert [i["update"]["result"] for i in resp["items"]] == \
        ["created", "updated", "created"]
    got = dict(zip(out["doc_id"].astype(int), out["counter"].astype(int)))
    assert got == {1: 11, 5: 100, 7: 42}


def test_update_scripted_upsert_runs_on_insert():
    from elasticsearch_ray.ops.bulk import bulk_apply

    df = pd.DataFrame({"doc_id": pd.Series(dtype=int),
                       "counter": pd.Series(dtype=int)})
    out, resp = bulk_apply(df, [
        ("update", {"_id": 3},
         {"scripted_upsert": True,
          "script": {"source": "ctx._source.counter = 77"},
          "upsert": {"counter": 0}}),
    ], id_col="doc_id")
    assert resp["items"][0]["update"]["result"] == "created"
    assert int(out["counter"].iloc[0]) == 77


def test_default_and_final_pipeline_settings():
    """IndexSettings default_pipeline / final_pipeline: default only
    when no request pipeline; final ALWAYS runs last."""
    from elasticsearch_ray.ops.bulk import bulk_apply
    from elasticsearch_ray.ops.processors import Pipeline

    dflt = Pipeline([{"set": {"field": "via", "value": "default"}}])
    fin = Pipeline([{"set": {"field": "stamped", "value": True}}])
    req = Pipeline([{"set": {"field": "via", "value": "request"}}])
    df = pd.DataFrame({"doc_id": pd.Series(dtype=int)})

    out1, _ = bulk_apply(df, [("index", {"_id": 1}, {"v": 1})],
                         id_col="doc_id",
                         default_pipeline=dflt, final_pipeline=fin)
    assert out1["via"].iloc[0] == "default" and bool(out1["stamped"].iloc[0])

    out2, _ = bulk_apply(df, [("index", {"_id": 1}, {"v": 1})],
                         id_col="doc_id", pipeline=req,
                         default_pipeline=dflt, final_pipeline=fin)
    assert out2["via"].iloc[0] == "request" and bool(out2["stamped"].iloc[0])

    out3, _ = bulk_apply(df, [("index", {"_id": 1}, {"v": 1})],
                         id_col="doc_id", final_pipeline=fin)
    assert "via" not in out3.columns and bool(out3["stamped"].iloc[0])


def test_review_r5c_script_sets_list_field():
    """Review r5c #5: scripted update writing a list/dict field must not
    crash the bulk call."""
    from elasticsearch_ray.ops.bulk import bulk_apply

    df = pd.DataFrame({"doc_id": [1], "v": [1]})
    out, resp = bulk_apply(df, [
        ("update", {"_id": 1},
         {"script": {"source": "ctx._source.tags = ['a', 'b']"}}),
    ], id_col="doc_id")
    assert resp["items"][0]["update"]["result"] == "updated"
    assert out["tags"].iloc[0] == ["a", "b"]


def test_review_r5d_update_with_ndarray_cells():
    """Arrow round-trips store list fields as ndarray cells; update must
    not crash on the noop comparison and must detect real noops."""
    import pyarrow as pa

    from elasticsearch_ray.ops.bulk import bulk_apply

    base = pd.DataFrame({"doc_id": [1], "tags": [["a", "b"]], "v": [1]})
    frame = pa.Table.from_pandas(base).to_pandas()  # tags -> ndarray
    assert isinstance(frame["tags"].iloc[0], np.ndarray)
    out, resp = bulk_apply(frame, [
        ("update", {"_id": 1}, {"doc": {"v": 2}}),
    ], id_col="doc_id")
    assert resp["items"][0]["update"]["result"] == "updated"
    assert int(out["v"].iloc[0]) == 2
    _, resp2 = bulk_apply(frame, [
        ("update", {"_id": 1}, {"doc": {"v": 1}}),
    ], id_col="doc_id")
    assert resp2["items"][0]["update"]["result"] == "noop"


def test_review_r5e_nested_container_cells():
    from elasticsearch_ray.ops.bulk import bulk_apply

    frame = pd.DataFrame({
        "doc_id": [1],
        "meta": [{"tags": np.array(["a", "b"]), "n": 2}],
        "v": [1],
    })
    out, resp = bulk_apply(frame, [
        ("update", {"_id": 1}, {"doc": {"v": 1}}),   # true noop
        ("update", {"_id": 1}, {"doc": {"v": 9}}),
    ], id_col="doc_id")
    results = [i["update"]["result"] for i in resp["items"]]
    assert results == ["noop", "updated"]
    assert int(out["v"].iloc[0]) == 9


def test_review_r5f_ndarray_of_dicts_cells():
    from elasticsearch_ray.ops.bulk import bulk_apply

    cell = np.empty(1, object)
    cell[0] = {"tags": np.array(["a", "b"]), "n": 2}
    frame = pd.DataFrame({"doc_id": [1], "meta": [cell], "v": [1]})
    _out, resp = bulk_apply(frame, [
        ("update", {"_id": 1}, {"doc": {"v": 1}}),
    ], id_col="doc_id")
    assert resp["items"][0]["update"]["result"] == "noop"
