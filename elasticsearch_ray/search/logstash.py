"""Logstash pipeline management (``x-pack/plugin/logstash`` —
``Pipeline.java``, ``action/TransportPutPipelineAction.java``,
``TransportGetPipelineAction.java``, ``TransportDeletePipelineAction.java``):
the centralized-pipeline-management system index behind
``PUT/GET/DELETE _logstash/pipeline/<id>``.

Pipelines are tiny config documents (``Pipeline.PARSER`` fields:
``last_modified`` ISO instant, ``pipeline_metadata`` map, ``username``,
``pipeline`` source string, ``pipeline_settings`` map) stored in the
hidden ``.logstash`` index — pure coordinator metadata, no distributed
work, so the store is a driver-side registry like the repo's other
config stores (templates, enrich policies, watches).

Get semantics mirror ``TransportGetPipelineAction``: an empty id list
returns EVERY pipeline (the reference scrolls the whole index,
``:57``); one-or-more explicit ids multi-get, and missing ids are
reported in the response's ``missing`` list rather than failing the
request (``:163-169`` logs-and-continues).
"""

from __future__ import annotations

_REQUIRED = ("last_modified", "pipeline_metadata", "username", "pipeline",
             "pipeline_settings")

_PIPELINES: dict[str, dict] = {}


def put_logstash_pipeline(pipeline_id: str, body: dict) -> dict:
    """``PUT _logstash/pipeline/<id>`` — validates the Pipeline.PARSER
    constructor fields and upserts; 201 on create, 200 on update."""
    if not pipeline_id:
        raise ValueError("pipeline id is required")
    missing = [f for f in _REQUIRED if f not in body]
    if missing:
        raise ValueError(f"Required [{', '.join(missing)}]")
    if not isinstance(body["pipeline"], str):
        raise ValueError("[pipeline] must be the pipeline source string")
    for f in ("pipeline_metadata", "pipeline_settings"):
        if not isinstance(body[f], dict):
            raise ValueError(f"[{f}] must be an object")
    created = pipeline_id not in _PIPELINES
    _PIPELINES[pipeline_id] = {k: body[k] for k in _REQUIRED}
    return {"status": 201 if created else 200}


def get_logstash_pipeline(*ids: str) -> dict:
    """``GET _logstash/pipeline[/<id>[,<id>...]]`` — no ids = all
    pipelines; explicit ids return found docs plus a ``missing`` list."""
    if not ids:
        return {"pipelines": {k: dict(v)
                              for k, v in sorted(_PIPELINES.items())},
                "missing": []}
    found, missing = {}, []
    for pid in ids:
        if pid in _PIPELINES:
            found[pid] = dict(_PIPELINES[pid])
        else:
            missing.append(pid)
    return {"pipelines": found, "missing": missing}


def delete_logstash_pipeline(pipeline_id: str) -> dict:
    """``DELETE _logstash/pipeline/<id>`` — 404-shaped result when the
    id is unknown (DeletePipelineResponse carries a deleted flag)."""
    deleted = _PIPELINES.pop(pipeline_id, None) is not None
    return {"deleted": deleted}
