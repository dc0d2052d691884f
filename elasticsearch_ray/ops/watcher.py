"""Watcher (x-pack alerting) — watches, conditions, actions, history.

Reference semantics: ``x-pack/plugin/watcher`` —
- ``Watch.java`` / ``WatchParser``: a watch = trigger (schedule), input,
  condition, actions (each with optional per-action condition +
  throttle_period), active state.
- ``condition/CompareCondition.java``: dotted ``ObjectPath`` into the
  execution context model, ops eq/not_eq/gt/gte/lt/lte; the configured
  value may itself be a ``{{ctx...}}`` path reference
  (``AbstractCompareCondition.resolveConfiguredValue``).
- ``condition/ArrayCompareCondition.java``: quantifier ``all``/``some``
  over an array at the path.
- ``InternalAlwaysCondition`` / ``NeverCondition``.
- ``input/search`` (SearchInput): runs a search, payload = the response
  body; ``input/simple`` (SimpleInput): literal payload;
  ``input/chain`` (ChainInput): ordered named sub-inputs nested under
  their names.
- ``condition/script`` (ScriptCondition): a Painless program over ctx.
- ``transform/*`` (TransformRegistry): script (returns the new payload),
  search (payload = response), chain (sequential composition) — at the
  watch level after the condition, and per action.
- ``actions/index`` (IndexAction: writes the payload — or each element of
  ``ctx.payload._doc`` — to an index) and ``actions/logging``
  (LoggingAction: mustache-rendered text).
- ``execution/ExecutionService``: every execution appends a watch_record
  (condition result + per-action status); throttling
  (``ActionThrottler``: a successful execution within throttle_period →
  ``throttled``) and acking (``ActionStatus.AckStatus``: an acked action
  stays silent while the condition keeps firing and RESETS once the watch
  condition evaluates false — ``Watch.ack``).

Execution here is driver-side control flow around the engine's distributed
search (the expensive part); destination "indices" are in-memory frames the
caller can hand to the index build, mirroring the reference writing through
the normal bulk path.
"""

from __future__ import annotations

import pandas as pd

_OPS = {
    "eq": lambda a, b: a == b,
    "not_eq": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
}


def object_path(model, path: str):
    """ObjectPath.eval: dotted path with integer list indices."""
    cur = model
    for part in path.split("."):
        if isinstance(cur, dict):
            if part not in cur:
                return None
            cur = cur[part]
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


class WatcherService:
    def __init__(self, engine=None):
        self.engine = engine
        self._watches: dict[str, dict] = {}
        self._status: dict[str, dict] = {}  # per-watch runtime state
        self.history: list[dict] = []
        self.dest: dict[str, list[dict]] = {}  # index-action destinations
        self.logs: list[str] = []

    # ---- CRUD (PutWatchAction / GetWatchAction / DeleteWatchAction) ----
    def put_watch(self, watch_id: str, spec: dict, active: bool = True):
        if "actions" not in spec:
            raise ValueError("watch needs actions")
        cond = spec.get("condition", {"always": {}})
        kind, = cond
        if kind not in ("always", "never", "compare", "array_compare",
                        "script"):
            raise ValueError(f"unsupported condition {kind!r}")
        self._watches[watch_id] = spec
        self._status[watch_id] = {
            "active": bool(active), "last_fired": None,
            "acked": set(), "last_action_run": {},
        }

    def get_watch(self, watch_id: str) -> dict:
        return self._watches[watch_id]

    def delete_watch(self, watch_id: str) -> None:
        self._watches.pop(watch_id, None)
        self._status.pop(watch_id, None)

    def ack_watch(self, watch_id: str, action_id: str) -> None:
        self._status[watch_id]["acked"].add(action_id)

    def activate(self, watch_id: str, active: bool = True) -> None:
        self._status[watch_id]["active"] = bool(active)

    def query_watches(self, query: dict | None = None, from_: int = 0,
                      size: int = 10, descending: bool = False) -> dict:
        """QueryWatchesAction (``GET _watcher/_query/watches``):
        paginated listing of stored watches sorted by id. ``query``
        supports the forms the reference endpoint is used with —
        ``{"term": {"_id": x}}``, ``{"prefix": {"_id": p}}``, and
        ``{"term": {"status.state.active": bool}}``. Response shape:
        ``{"count": total_matching, "watches": [{"_id", "watch",
        "status"}, ...]}`` (count is pre-pagination, like the API)."""
        def matches(wid: str) -> bool:
            if not query:
                return True
            (kind, body), = query.items()
            (field, want), = body.items()
            if field == "_id":
                if kind == "term":
                    return wid == want
                if kind == "prefix":
                    return wid.startswith(want)
            elif field == "status.state.active" and kind == "term":
                return self._status[wid]["active"] is bool(want)
            raise ValueError(
                f"unsupported watches query {kind!r} on {field!r}")

        ids = sorted((w for w in self._watches if matches(w)),
                     reverse=descending)
        page = ids[from_:from_ + size]
        return {"count": len(ids), "watches": [
            {"_id": wid, "watch": self._watches[wid],
             "status": {"state": {
                 "active": self._status[wid]["active"]},
                 "last_fired": self._status[wid]["last_fired"]}}
            for wid in page]}

    # ---- execution ----
    def _input_payload(self, spec: dict) -> dict:
        inp = spec.get("input", {"simple": {}})
        if "simple" in inp:
            return dict(inp["simple"])
        if "search" in inp:
            return self._search_payload(inp["search"])
        if "chain" in inp:
            # input/chain (ChainInput.java): ordered named sub-inputs,
            # each payload nested under its name so later consumers read
            # ctx.payload.<name>...
            payload = {}
            for item in inp["chain"]["inputs"]:
                (name, sub), = item.items()
                payload[name] = self._input_payload({"input": sub})
            return payload
        raise ValueError("unsupported input")

    def _search_payload(self, search_body: dict) -> dict:
        if self.engine is None:
            raise ValueError("search input needs an engine")
        req = search_body["request"]
        from elasticsearch_ray.search.dsl import parse_dsl

        q = parse_dsl(req["body"].get("query", {"match_all": {}}))
        size = int(req["body"].get("size", 10))
        fetch = tuple(req["body"].get("fields", ("doc_id",)))
        tbl = self.engine.search(q, k=size, fetch=fetch)
        hits = tbl.to_pylist()
        return {"hits": {"total": len(hits), "hits": hits}}

    def _apply_transform(self, tf: dict, ctx: dict) -> dict:
        """transform/script (returns the NEW payload), transform/search
        (payload = the search response) and transform/chain (sequential
        composition) — TransformRegistry.java's three kinds."""
        if "script" in tf:
            body = tf["script"]
            source = body if isinstance(body, str) else body["source"]
            params = {} if isinstance(body, str) else body.get("params", {})
            from elasticsearch_ray.search.painless import compile_painless

            out = compile_painless(source).run(
                {"ctx": ctx, "params": params})
            if not isinstance(out, dict):
                raise ValueError(
                    "script transform must return a map payload")
            return out
        if "search" in tf:
            return self._search_payload(tf["search"])
        if "chain" in tf:
            for sub in tf["chain"]:
                ctx = dict(ctx)
                ctx["payload"] = self._apply_transform(sub, ctx)
            return ctx["payload"]
        raise ValueError("unsupported transform")

    def _condition_met(self, cond: dict, ctx: dict) -> bool:
        if "always" in cond:
            return True
        if "never" in cond:
            return False
        if "compare" in cond:
            (path, body), = cond["compare"].items()
            (op, value), = body.items()
            got = object_path(ctx, path)
            if isinstance(value, str) and value.startswith("{{") \
                    and value.endswith("}}"):
                value = object_path(ctx, value[2:-2].strip())
            if got is None:
                return False
            return bool(_OPS[op](got, value))
        if "script" in cond:
            # condition/script (ScriptCondition.java): a Painless program
            # over ctx returning a boolean
            body = cond["script"]
            source = body if isinstance(body, str) else body["source"]
            params = {} if isinstance(body, str) else body.get("params", {})
            from elasticsearch_ray.search.painless import compile_painless

            return bool(compile_painless(source).run(
                {**ctx, "params": params}))
        if "array_compare" in cond:
            (path, body), = cond["array_compare"].items()
            quant = "some"
            op = value = None
            for kk, vv in body.items():
                if kk == "quantifier":
                    quant = vv
                else:
                    op, value = kk, vv["value"] if isinstance(vv, dict) \
                        else vv
            arr = object_path(ctx, path) or []
            tests = [bool(_OPS[op](a, value)) for a in arr]
            return all(tests) if quant == "all" else any(tests)
        raise ValueError("unsupported condition")

    def execute_watch(self, watch_id: str, trigger_time=None,
                      ignore_condition: bool = False) -> dict:
        spec = self._watches[watch_id]
        st = self._status[watch_id]
        ctx = {
            "watch_id": watch_id,
            "trigger": {"triggered_time": trigger_time},
            "payload": self._input_payload(spec),
        }
        met = ignore_condition or self._condition_met(
            spec.get("condition", {"always": {}}), {"ctx": ctx, **ctx})
        record = {"watch_id": watch_id, "trigger_time": trigger_time,
                  "condition_met": met, "actions": []}
        if not met:
            # Watch.ack reset: a false condition clears ack state
            st["acked"].clear()
        else:
            if "transform" in spec:
                # watch-level transform runs once, after the condition
                # (ExecutionService.executeInner order)
                ctx["payload"] = self._apply_transform(
                    spec["transform"], {"ctx": ctx, **ctx})
            for aid, abody in spec["actions"].items():
                status = self._run_action(watch_id, aid, dict(abody), ctx,
                                          trigger_time)
                record["actions"].append({"id": aid, "status": status})
        self.history.append(record)
        st["last_fired"] = trigger_time
        return record

    def _run_action(self, watch_id, aid, abody, ctx, trigger_time) -> str:
        st = self._status[watch_id]
        if aid in st["acked"]:
            return "acked"
        acond = abody.pop("condition", None)
        if acond is not None and not self._condition_met(
                acond, {"ctx": ctx, **ctx}):
            return "condition_not_met"
        throttle = abody.pop("throttle_period", None)
        if throttle is not None and trigger_time is not None:
            last = st["last_action_run"].get(aid)
            if last is not None and (
                    pd.Timestamp(trigger_time) - pd.Timestamp(last)
                    < pd.Timedelta(throttle)):
                return "throttled"
        atf = abody.pop("transform", None)
        if atf is not None:
            # per-action transform: a payload view local to this action
            ctx = dict(ctx)
            ctx["payload"] = self._apply_transform(atf, {"ctx": ctx, **ctx})
        (kind, body), = abody.items()
        if kind == "index":
            dest = self.dest.setdefault(body["index"], [])
            docs = object_path(ctx, "payload._doc")
            if docs is None:
                hits = object_path(ctx, "payload.hits.hits")
                docs = hits if hits is not None else [dict(ctx["payload"])]
            dest.extend(dict(d) for d in docs)
        elif kind == "logging":
            from elasticsearch_ray.search.templates import render_template

            rendered = render_template({"t": body.get("text", "")},
                                       {"ctx": ctx})
            self.logs.append(rendered["t"])
        else:
            raise ValueError(f"unsupported action {kind!r}")
        st["last_action_run"][aid] = trigger_time
        return "executed"

    def run_pending(self, now) -> list[dict]:
        """Schedule-trigger simulation (ScheduleTriggerEngine): execute every
        ACTIVE watch whose interval has elapsed since its last firing."""
        out = []
        now = pd.Timestamp(now)
        for wid, spec in self._watches.items():
            st = self._status[wid]
            if not st["active"]:
                continue
            interval = pd.Timedelta(
                spec.get("trigger", {}).get("schedule", {})
                .get("interval", "1m"))
            last = st["last_fired"]
            if last is None or now - pd.Timestamp(last) >= interval:
                out.append(self.execute_watch(wid, trigger_time=now))
        return out
