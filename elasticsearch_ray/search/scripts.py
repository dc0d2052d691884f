"""Stored scripts — the ``_scripts/{id}`` API.

Reference semantics: ``action/admin/cluster/storedscripts/
PutStoredScriptAction`` + ``script/ScriptService.java``: a stored script
is (lang, source) kept in cluster state; PUT **compiles before storing**
(a broken script is rejected at store time, not first use); GET returns
the stored source; DELETE removes it; queries reference it as
``{"script": {"id": ..., "params": ...}}`` wherever an inline
``{"source": ...}`` is accepted.

Two langs here, matching the engine's scripting surfaces:
- ``expression`` — the sandboxed Lucene-expressions analog
  (search/expressions.py); validated with ``compile_expression`` at PUT.
- ``mustache`` — search templates (search/templates.py); rendered with
  per-call params at bind time.

``bind_stored_scripts`` rewrites a JSON DSL body, replacing every
``{"script": {"id": ...}}`` block with the stored inline form, so the
ordinary ``parse_dsl`` path needs no registry awareness.
"""

from __future__ import annotations


class ScriptRegistry:
    def __init__(self):
        self._s: dict[str, dict] = {}

    def put(self, script_id: str, source: str, lang: str = "expression"):
        if lang == "expression":
            from elasticsearch_ray.search.expressions import (
                compile_expression,
            )

            try:
                compile_expression(source)  # compile-at-store, like PUT
            except Exception as e:
                raise ValueError(
                    f"failed to compile stored script [{script_id}] "
                    f"using lang [expression]: {e}") from None
        elif lang != "mustache":
            raise ValueError(f"unsupported script lang [{lang}]")
        self._s[script_id] = {"lang": lang, "source": source}

    def get(self, script_id: str) -> dict:
        if script_id not in self._s:
            raise KeyError(f"stored script [{script_id}] does not exist")
        return dict(self._s[script_id])

    def delete(self, script_id: str) -> None:
        if script_id not in self._s:
            raise KeyError(f"stored script [{script_id}] does not exist")
        del self._s[script_id]

    def resolve(self, script_block: dict) -> dict:
        """{"id": X, "params": P} → the stored inline form; inline blocks
        pass through unchanged."""
        if "id" not in script_block:
            return script_block
        stored = self.get(script_block["id"])
        if stored["lang"] == "mustache":
            from elasticsearch_ray.search.templates import render_template

            return {"source": render_template(
                stored["source"], script_block.get("params") or {})}
        return {"source": stored["source"]}


def bind_stored_scripts(body, registry: ScriptRegistry):
    """Recursively replace ``{"script": {"id": ...}}`` blocks in a JSON
    DSL body with the stored inline source (ScriptService resolution)."""
    if isinstance(body, dict):
        out = {}
        for k, v in body.items():
            if k == "script" and isinstance(v, dict) and "id" in v:
                out[k] = registry.resolve(v)
            else:
                out[k] = bind_stored_scripts(v, registry)
        return out
    if isinstance(body, list):
        return [bind_stored_scripts(x, registry) for x in body]
    return body
