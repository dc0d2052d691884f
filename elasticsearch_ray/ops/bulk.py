"""``_bulk`` API — ndjson action/metadata parsing + per-item write results.

Reference semantics:
- ``server/src/main/java/org/elasticsearch/action/bulk/BulkRequestParser.java``
  — alternating action line (``{"index"|"create"|"update"|"delete":
  {"_id": ...}}``) and source line (none for delete); malformed action,
  unknown op type, or a missing trailing source line are request-level
  parse errors.
- ``TransportShardBulkAction.java`` + ``DocWriteResponse`` — per-item
  results in REQUEST ORDER, each `{op: {"_id", "status", "result" |
  "error"}}`:
  * ``index``  — upsert: 201 ``created`` / 200 ``updated``;
  * ``create`` — 201, or a 409 ``version_conflict_engine_exception``
    ERROR when the id exists;
  * ``update`` — partial-doc merge, 200 ``updated`` (``noop`` when
    nothing changed), or a 404 ``document_missing_exception`` ERROR;
  * ``delete`` — 200 ``deleted``, or a NON-error 404 ``not_found``
    (``DeleteResponse.java:38-52``).
  ``errors`` on the envelope is true iff any item carries an error.
- Ops apply SEQUENTIALLY: a later item sees earlier items' effects
  (create-after-delete succeeds, second create conflicts).

Ray-Data shape: the bulk BODY is coordinator-scale (a request buffer,
never 100 TB); it applies here to a keyed pandas frame — the staging-table
analog of the primary-shard write — and bulk-loaded corpora then flow to
the real distributed surfaces (``build_index`` incremental append,
update/delete-by-query) exactly as the reference funnels bulk through the
engine. An optional ingest ``pipeline`` (ops/processors.Pipeline) runs on
indexed/created docs before they land, like ``IngestService`` pre-index.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

_OPS = ("index", "create", "update", "delete")


def parse_bulk(payload: str) -> list[tuple[str, dict, dict | None]]:
    """BulkRequestParser: [(op, meta, source|None)] or raise ValueError."""
    lines = [ln for ln in payload.split("\n") if ln.strip()]
    out = []
    i = 0
    while i < len(lines):
        try:
            action = json.loads(lines[i])
        except json.JSONDecodeError as e:
            raise ValueError(f"Malformed action/metadata line [{i + 1}]: "
                             f"{e}") from None
        if not isinstance(action, dict) or len(action) != 1:
            raise ValueError(
                f"Malformed action/metadata line [{i + 1}], expected a "
                "single action")
        op, meta = next(iter(action.items()))
        if op not in _OPS:
            raise ValueError(
                f"Unknown key for a START_OBJECT in [{op}], expected one "
                f"of {list(_OPS)}")
        meta = meta or {}
        if op == "delete":
            out.append((op, meta, None))
            i += 1
            continue
        if i + 1 >= len(lines):
            raise ValueError(
                f"Validation Failed: line [{i + 1}] action [{op}] is "
                "missing its source")
        try:
            source = json.loads(lines[i + 1])
        except json.JSONDecodeError as e:
            raise ValueError(f"Malformed source line [{i + 2}]: {e}") \
                from None
        out.append((op, meta, source))
        i += 2
    return out


def _vals_equal(a, b) -> bool:
    """Equality tolerant of container cells at ANY depth (Arrow
    round-trips struct/list columns into dicts holding ndarrays, whose
    `==` truth-tests raise — review r5d #1 / r5e #3)."""
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        aa = np.asarray(a, object)
        bb = np.asarray(b, object)
        if aa.shape != bb.shape:
            return False
        # elementwise recursion: object arrays can hold dicts whose
        # values are arrays — np.array_equal would truth-test those
        # and raise (review r5f #1)
        return all(_vals_equal(x, y)
                   for x, y in zip(aa.ravel(), bb.ravel()))
    if isinstance(a, dict) and isinstance(b, dict):
        return (a.keys() == b.keys()
                and all(_vals_equal(a[k], b[k]) for k in a))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return (len(a) == len(b)
                and all(_vals_equal(x, y) for x, y in zip(a, b)))
    try:
        if a is b or bool(a == b):
            return True
        return bool(pd.isna(a)) and bool(pd.isna(b))
    except (ValueError, TypeError):
        return False


def _docs_equal(a: dict, b: dict) -> bool:
    return (a.keys() == b.keys()
            and all(_vals_equal(a[k], b[k]) for k in a))


def _setcell(df: pd.DataFrame, idx, col: str, val) -> None:
    """Assign one cell, safely for container values: ``df.loc`` unpacks
    lists ("Must have equal len keys and value..."), so containers go
    through ``.at`` on an object-dtype column (review r5c #5)."""
    if isinstance(val, (list, dict, tuple, set, np.ndarray)):
        if col not in df.columns:
            df[col] = None
        if df[col].dtype != object:
            df[col] = df[col].astype(object)
        df.at[idx, col] = val
    else:
        df.loc[idx, col] = val


def bulk_apply(frame: pd.DataFrame, payload_or_ops,
               id_col: str = "doc_id",
               pipeline=None, default_pipeline=None,
               final_pipeline=None) -> tuple[pd.DataFrame, dict]:
    """Apply a bulk body to a keyed frame; returns (new_frame, response).

    ``response`` = {"errors": bool, "items": [...]} in request order.
    ``pipeline`` — optional ops/processors.Pipeline applied to index/
    create sources before they land (IngestService pre-index).
    ``default_pipeline`` / ``final_pipeline`` — the index-settings pair
    (``IndexSettings#DEFAULT_PIPELINE`` / ``FINAL_PIPELINE``): the
    default runs only when no request ``pipeline`` is given; the final
    one ALWAYS runs last, after whichever other pipeline ran."""
    ops = parse_bulk(payload_or_ops) if isinstance(payload_or_ops, str) \
        else list(payload_or_ops)
    if pipeline is None:
        pipeline = default_pipeline
    df = frame.copy()
    items = []
    errors = False

    def _loc(_id):
        hit = np.flatnonzero(df[id_col].to_numpy() == _id)
        return int(hit[0]) if len(hit) else None

    def _run_pipeline(doc: dict) -> dict:
        if final_pipeline is not None:
            if pipeline is not None:
                doc = pipeline(pd.DataFrame([doc])).iloc[0].to_dict()
            return final_pipeline(pd.DataFrame([doc])).iloc[0].to_dict()
        if pipeline is None:
            return doc
        return pipeline(pd.DataFrame([doc])).iloc[0].to_dict()

    for op, meta, source in ops:
        _id = meta.get("_id")
        if _id is None:
            _id = (int(df[id_col].max()) + 1) if len(df) else 0
        row = _loc(_id)
        if op == "delete":
            if row is None:
                items.append({"delete": {"_id": _id, "status": 404,
                                         "result": "not_found"}})
            else:
                df = df.drop(df.index[row]).reset_index(drop=True)
                items.append({"delete": {"_id": _id, "status": 200,
                                         "result": "deleted"}})
            continue
        if op == "create" and row is not None:
            errors = True
            items.append({"create": {"_id": _id, "status": 409, "error": {
                "type": "version_conflict_engine_exception",
                "reason": f"[{_id}]: version conflict, document already "
                          "exists"}}})
            continue
        if op == "update":
            # UpdateHelper.java semantics: partial-doc merge, Painless
            # script over ctx._source with ctx.op none/delete, upsert /
            # scripted_upsert / doc_as_upsert insert paths
            script_spec = source.get("script")
            upsert = source.get("upsert")
            doc = source.get("doc")
            if doc is None and script_spec is None:
                doc = {k: v for k, v in source.items()
                       if k not in ("upsert", "doc_as_upsert",
                                    "scripted_upsert")}

            def _run_script(src_doc: dict, default_op: str) -> dict:
                from elasticsearch_ray.search.painless import (
                    compile_painless,
                )

                if isinstance(script_spec, str):
                    src_txt, sparams = script_spec, {}
                else:
                    src_txt = (script_spec.get("source")
                               or script_spec.get("inline"))
                    sparams = dict(script_spec.get("params") or {})
                ctx = {"_source": src_doc, "op": default_op, "_id": _id}
                compile_painless(src_txt).run(
                    {"ctx": ctx, "params": sparams})
                return ctx

            def _insert(new_doc: dict):
                nonlocal df
                new_doc = dict(new_doc)
                new_doc[id_col] = _id
                df = (pd.concat([df, pd.DataFrame([new_doc])],
                                ignore_index=True)
                      if len(df) else pd.DataFrame([new_doc]))
                items.append({"update": {"_id": _id, "status": 201,
                                         "result": "created"}})

            if row is None:
                if script_spec is not None and upsert is not None:
                    new_doc = dict(upsert)
                    if source.get("scripted_upsert"):
                        ctx = _run_script(new_doc, "create")
                        if ctx.get("op") in ("none", "noop", "delete"):
                            # nothing to index (delete on a missing doc
                            # is a noop — UpdateHelper#prepareUpsert)
                            items.append({"update": {
                                "_id": _id, "status": 200,
                                "result": "noop"}})
                            continue
                        new_doc = ctx["_source"]
                    _insert(new_doc)
                    continue
                if doc is not None and source.get("doc_as_upsert"):
                    _insert(doc)
                    continue
                if upsert is not None and script_spec is None:
                    _insert(upsert)
                    continue
                errors = True
                items.append({"update": {"_id": _id, "status": 404,
                                         "error": {
                    "type": "document_missing_exception",
                    "reason": f"[{_id}]: document missing"}}})
                continue
            before = df.iloc[row].to_dict()
            if script_spec is not None:
                ctx = _run_script(dict(before), "index")
                if ctx.get("op") in ("none", "noop"):
                    items.append({"update": {"_id": _id, "status": 200,
                                             "result": "noop"}})
                    continue
                if ctx.get("op") == "delete":
                    df = df.drop(df.index[row]).reset_index(drop=True)
                    items.append({"update": {"_id": _id, "status": 200,
                                             "result": "deleted"}})
                    continue
                after = dict(ctx["_source"])
                if _docs_equal(after, before):
                    items.append({"update": {"_id": _id, "status": 200,
                                             "result": "noop"}})
                    continue
                # scripted update replaces the whole source
                after[id_col] = _id
                for k in df.columns:
                    _setcell(df, df.index[row], k, after.get(
                        k, None if k != id_col else _id))
                for k, v in after.items():
                    if k not in df.columns:
                        _setcell(df, df.index[row], k, v)
                items.append({"update": {"_id": _id, "status": 200,
                                         "result": "updated"}})
                continue
            after = dict(before, **doc)
            if _docs_equal(after, before):
                items.append({"update": {"_id": _id, "status": 200,
                                         "result": "noop"}})
                continue
            for k, v in doc.items():
                _setcell(df, df.index[row], k, v)
            items.append({"update": {"_id": _id, "status": 200,
                                     "result": "updated"}})
            continue
        # index / create upsert path
        doc = _run_pipeline(dict(source))
        doc[id_col] = _id
        if row is None:
            df = pd.concat([df, pd.DataFrame([doc])], ignore_index=True) \
                if len(df) else pd.DataFrame([doc])
            items.append({op: {"_id": _id, "status": 201,
                               "result": "created"}})
        else:
            # index is FULL document replacement: columns the new source
            # does not carry are cleared, never inherited (review r5 #6)
            for k in df.columns:
                _setcell(df, df.index[row], k, doc.get(
                    k, None if k != id_col else _id))
            for k, v in doc.items():
                if k not in df.columns:
                    _setcell(df, df.index[row], k, v)
            items.append({op: {"_id": _id, "status": 200,
                               "result": "updated"}})
    return df, {"errors": errors, "items": items}
