"""Search templates — the reference's `_search/template` endpoint
(`modules/lang-mustache`, TransportSearchTemplateAction): a stored or
inline mustache source renders with `params` into a search body, which
then executes as a normal query.

Mustache subset implemented (the constructs the reference's own docs use):

- ``{{var}}``             — plain substitution (dotted paths allowed)
- ``{{#toJson}}var{{/toJson}}`` — JSON-encode a param (lists/objects)
- ``{{#var}}…{{/var}}``   — section: rendered when var is truthy; if var
                            is a LIST, rendered once per item with ``{{.}}``
                            bound to the item (mustache iteration)
- ``{{^var}}…{{/var}}``   — inverted section: rendered when var is falsy /
                            missing (the "default value" idiom)

Unknown ``{{var}}`` renders empty, like mustache. String params are
JSON-escaped into their surrounding context (the reference's default
escaping behavior). Lambdas and partials are out of scope (documented).
"""

from __future__ import annotations

import json
import re

_TAG = re.compile(r"\{\{\s*([#^/]?)\s*([\w.]+|\.)\s*\}\}")


def _lookup(params, path):
    if path == ".":
        return params.get(".", params) if isinstance(params, dict) else params
    cur = params
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def _render(src: str, params) -> str:
    out: list[str] = []
    i = 0
    while True:
        m = _TAG.search(src, i)
        if not m:
            out.append(src[i:])
            return "".join(out)
        out.append(src[i : m.start()])
        kind, name = m.group(1), m.group(2)
        if kind == "/":
            raise ValueError(f"unmatched section close {{{{/{name}}}}}")
        if kind == "":
            v = _lookup(params, name)
            if v is None:
                out.append("")
            elif isinstance(v, str):
                # JSON-escape into the surrounding string context (quotes,
                # backslashes, control chars) — the reference's mustache
                # escapes by default; raw str() would both break the render
                # and allow query-structure injection
                out.append(json.dumps(v)[1:-1])
            elif isinstance(v, bool):
                out.append(json.dumps(v))
            else:
                out.append(str(v))
            i = m.end()
            continue
        # section: find the matching close tag at this nesting level
        depth, j = 1, m.end()
        while depth:
            m2 = _TAG.search(src, j)
            if not m2:
                raise ValueError(f"unclosed section {{{{{kind}{name}}}}}")
            if m2.group(1) in ("#", "^") and m2.group(2) == name:
                depth += 1
            elif m2.group(1) == "/" and m2.group(2) == name:
                depth -= 1
            j = m2.end()
        inner = src[m.end() : m2.start()]
        if kind == "#" and name == "toJson":
            out.append(json.dumps(_lookup(params, inner.strip())))
        else:
            v = _lookup(params, name)
            if kind == "^":
                if not v:
                    out.append(_render(inner, params))
            elif isinstance(v, list):
                for item in v:
                    base = params if isinstance(params, dict) else {}
                    ctx = {**base, **item} if isinstance(item, dict) \
                        else {**base, ".": item}
                    out.append(_render(inner, ctx))
            elif v:
                ctx = {**params, **v} if isinstance(v, dict) else params
                out.append(_render(inner, ctx))
        i = j


def render_template(source: str | dict, params: dict | None = None) -> dict:
    """Render a mustache search-template source (JSON string with mustache
    tags, or an already-parsed dict passed through json round-trip) into the
    search-body dict."""
    if isinstance(source, dict):
        source = json.dumps(source)
    return json.loads(_render(source, params or {}))


class TemplateRegistry:
    """Stored scripts of lang=mustache (PutStoredScript / GetStoredScript):
    register once, render by id with per-call params."""

    def __init__(self):
        self._t: dict[str, str] = {}

    def put(self, script_id: str, source: str | dict) -> None:
        self._t[script_id] = source if isinstance(source, str) else json.dumps(source)

    def render(self, script_id: str, params: dict | None = None) -> dict:
        if script_id not in self._t:
            raise KeyError(f"no stored template {script_id!r}")
        return render_template(self._t[script_id], params)

    def delete(self, script_id: str) -> None:
        self._t.pop(script_id, None)


def search_template(engine, source: str | dict, params: dict | None = None,
                    k: int = 10, **search_kw):
    """Render + execute in one call (TransportSearchTemplateAction): the
    rendered body's ``query`` goes through the JSON DSL parser; a rendered
    ``size`` overrides ``k`` (the body shape templates produce)."""
    from elasticsearch_ray.search.dsl import parse_dsl

    body = render_template(source, params)
    if isinstance(body, dict) and "query" in body:
        k = int(body.get("size", k))
        body = body["query"]
    return engine.search(parse_dsl(body), k=k, **search_kw)


def msearch_template(engine, requests: list, registry=None,
                     k: int = 10, **search_kw) -> list:
    """``_msearch/template`` (TransportMultiSearchTemplateAction): a list
    of template requests — each ``{"source": ...}`` or ``{"id": ...}``
    (resolved through the stored-template registry) plus ``params`` —
    rendered then executed like _msearch. Per-item errors come back in
    place (the reference's per-item response envelope) instead of
    failing the whole batch."""
    out = []
    for req in requests:
        try:
            if "id" in req:
                if registry is None:
                    raise KeyError("no template registry provided")
                body = registry.render(req["id"], req.get("params"))
            else:
                body = render_template(req["source"], req.get("params"))
            kk = k
            if isinstance(body, dict) and "query" in body:
                kk = int(body.get("size", k))
                body = body["query"]
            from elasticsearch_ray.search.dsl import parse_dsl

            out.append({"status": 200,
                        "response": engine.search(parse_dsl(body), k=kk,
                                                  **search_kw)})
        except Exception as e:  # per-item error envelope
            out.append({"status": 400,
                        "error": f"{type(e).__name__}: {e}"})
    return out
