"""``POST /_scripts/painless/_execute`` — the Painless execute API.

Reference: ``modules/lang-painless/.../action/PainlessExecuteAction.java``
(``innerShardOperation``). Contexts mirrored:

- ``painless_test`` (default): run the script with only ``params``;
  the response result is ``Objects.toString(result)`` — the Java
  string rendering (``null``, ``true``, ``1.5``…).
- ``filter``: the script sees a one-document RAM index
  (``context_setup.document``) through ``doc[...]`` and must produce a
  boolean.
- ``score``: same one-document setup, produces a double; the optional
  scorer feed (the reference rewrites ``context_setup.query`` against
  the RAM index and hands the script its score) is modeled by an
  explicit ``_score`` in the context setup.
- runtime-field emit contexts (``boolean_field`` / ``date_field`` /
  ``double_field`` / ``ip_field`` / ``long_field`` / ``keyword_field``
  / ``composite_field``): run ``emit(...)`` over the document and
  return the list of emitted values, coerced per context exactly as the
  typed ``*FieldScript`` leaf factories do (dates render through the
  default ``strict_date_optional_time`` formatter analog).

Geo contexts are out of scope (SURVEY ⛔ — no geo surface in this
engine).
"""

from __future__ import annotations

from datetime import datetime, timezone

from elasticsearch_ray.search.painless import (
    PainlessError,
    compile_painless,
    _Doc,
    _jstr,
)

_FIELD_CONTEXTS = {
    "boolean_field": lambda v: bool(v),
    "date_field": None,  # special-cased below
    "double_field": lambda v: float(v),
    "ip_field": lambda v: str(v),
    "long_field": lambda v: int(v),
    "keyword_field": lambda v: str(v),
    "composite_field": None,  # special-cased below
}

SUPPORTED_CONTEXTS = ("painless_test", "filter", "score",
                      *_FIELD_CONTEXTS)


def _format_date(v):
    """DateFieldMapper.DEFAULT_DATE_TIME_FORMATTER analog: epoch millis
    (or an already-formatted string) -> strict_date_optional_time."""
    if isinstance(v, str):
        return v
    dt = datetime.fromtimestamp(int(v) / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") \
        + f"{dt.microsecond // 1000:03d}Z"


def painless_execute(script, context: str = "painless_test",
                     context_setup: dict | None = None) -> dict:
    """Run a script outside any search/ingest flow; returns
    ``{"result": ...}`` shaped per context."""
    if isinstance(script, str):
        source, params = script, {}
    else:
        source = script["source"]
        params = dict(script.get("params") or {})
    if context not in SUPPORTED_CONTEXTS:
        raise ValueError(
            f"unsupported context [{context}]; supported: "
            f"{list(SUPPORTED_CONTEXTS)}")

    compiled = compile_painless(source)
    # Painless scripts implicitly return their LAST expression statement
    # (PainlessTestScript's execute() value) — rewrite a trailing
    # ('expr', e) into ('return', e) so `params.count / params.total`
    # works without an explicit return
    stmts = compiled.ast[1]
    if stmts and stmts[-1][0] == "expr":
        stmts[-1] = ("return", stmts[-1][1])

    if context == "painless_test":
        v = compiled.run({"params": params})
        return {"result": _jstr(v)}

    setup = dict(context_setup or {})
    if "document" not in setup:
        raise ValueError(
            f"context [{context}] requires [context_setup.document]")
    doc = _Doc(dict(setup["document"]))

    if context == "filter":
        v = compiled.run({"doc": doc, "params": params})
        if not isinstance(v, bool):
            raise PainlessError(
                "filter script must return a boolean")
        return {"result": v}

    if context == "score":
        env = {"doc": doc, "params": params}
        if "_score" in setup:
            env["_score"] = float(setup["_score"])
        v = compiled.run(env)
        return {"result": float(v)}

    # runtime-field emit contexts
    emitted: list = []
    v = compiled.run({"doc": doc, "params": params,
                      "emit": emitted.append})
    if not emitted and v is not None:
        emitted = [v]
    if context == "date_field":
        return {"result": [_format_date(x) for x in emitted]}
    if context == "composite_field":
        # CompositeFieldScript.runForDoc(0): a map of subfield -> values
        out: dict = {}
        for item in emitted:
            if not isinstance(item, dict):
                raise PainlessError(
                    "composite_field emits (field, value) maps")
            for k, val in item.items():
                out.setdefault(k, []).append(val)
        return {"result": out}
    coerce = _FIELD_CONTEXTS[context]
    return {"result": [coerce(x) for x in emitted]}
