"""ML job governance: filters, calendars/scheduled events, detector
rules, and overall buckets.

Reference surfaces (all public):

- ``x-pack/plugin/core/.../ml/job/config/MlFilter.java`` + the
  ``_ml/filters`` CRUD — named term lists referenced by detector-rule
  scopes; items match with ``Regex.simpleMatch`` wildcards.
- ``DetectorRule.java`` / ``RuleCondition.java`` / ``RuleScope.java``
  — a detector's ``custom_rules``: a rule fires when ALL of its
  conditions hold (``applies_to`` actual/typical/diff_from_typical,
  operators gt/gte/lt/lte) AND its scope matches (per-field
  include/exclude against an MlFilter); multiple rules OR. The
  ``skip_result`` action suppresses the record.
- ``ml/calendars/Calendar.java`` / ``ScheduledEvent.java`` /
  ``ScheduledEventToRuleWriter.java`` — calendars attach scheduled
  events to jobs; each event becomes a skip_result rule over
  ``[start_time, end_time)`` buckets.
- ``TransportGetOverallBucketsAction.java`` / ``OverallBucket.java`` —
  ``GET anomaly_detectors/<jobs>/results/overall_buckets``: overall
  bucket span = the LONGEST job bucket_span; per overall bucket each
  job contributes its max bucket anomaly_score, and ``overall_score``
  is the average of the ``top_n`` largest job scores.

Everything operates on the anomaly result frames (records/buckets are
#buckets × #series rows — driver-sized), so governance is a cheap
post-pass; the distributed partials pass is untouched.
"""

from __future__ import annotations

import fnmatch

import pandas as pd


class MlFilterService:
    """_ml/filters CRUD (MlFilter.java caps items at 10k)."""

    MAX_ITEMS = 10_000

    def __init__(self):
        self._filters: dict[str, dict] = {}

    def put_filter(self, filter_id: str, items: list[str],
                   description: str = "") -> dict:
        if not filter_id or not filter_id.replace("-", "").replace(
                "_", "").isalnum():
            raise ValueError(f"invalid filter_id {filter_id!r}")
        if len(items) > self.MAX_ITEMS:
            raise ValueError(f"filter [{filter_id}] cannot contain more "
                             f"than {self.MAX_ITEMS} items")
        f = {"filter_id": filter_id, "description": description,
             "items": sorted(set(items))}
        self._filters[filter_id] = f
        return f

    def get_filter(self, filter_id: str) -> dict:
        if filter_id not in self._filters:
            raise KeyError(f"no known filter with id [{filter_id}]")
        return self._filters[filter_id]

    def get_filters(self) -> list[dict]:
        return [self._filters[k] for k in sorted(self._filters)]

    def update_filter(self, filter_id: str, add_items: list[str] = (),
                      remove_items: list[str] = ()) -> dict:
        f = self.get_filter(filter_id)
        items = set(f["items"]) | set(add_items)
        items -= set(remove_items)
        if len(items) > self.MAX_ITEMS:
            raise ValueError("filter too large")
        f["items"] = sorted(items)
        return f

    def delete_filter(self, filter_id: str) -> None:
        self.get_filter(filter_id)
        del self._filters[filter_id]

    def matches(self, filter_id: str, value) -> bool:
        f = self.get_filter(filter_id)
        v = str(value)
        return any(fnmatch.fnmatchcase(v, item) for item in f["items"])


class MlCalendarService:
    """_ml/calendars CRUD + scheduled events."""

    def __init__(self):
        self._calendars: dict[str, dict] = {}
        self._events: list[dict] = []
        self._next_event = 1

    def put_calendar(self, calendar_id: str,
                     job_ids: list[str] = ()) -> dict:
        c = {"calendar_id": calendar_id, "job_ids": sorted(set(job_ids))}
        self._calendars[calendar_id] = c
        return c

    def get_calendars(self) -> list[dict]:
        return [self._calendars[k] for k in sorted(self._calendars)]

    def put_calendar_job(self, calendar_id: str, job_id: str) -> dict:
        c = self._cal(calendar_id)
        if job_id not in c["job_ids"]:
            c["job_ids"] = sorted(c["job_ids"] + [job_id])
        return c

    def delete_calendar_job(self, calendar_id: str, job_id: str) -> dict:
        c = self._cal(calendar_id)
        c["job_ids"] = [j for j in c["job_ids"] if j != job_id]
        return c

    def _cal(self, calendar_id: str) -> dict:
        if calendar_id not in self._calendars:
            raise KeyError(f"no calendar with id [{calendar_id}]")
        return self._calendars[calendar_id]

    def post_events(self, calendar_id: str,
                    events: list[dict]) -> list[dict]:
        """events: {description, start_time, end_time} (anything
        ``pd.Timestamp`` accepts); end must be after start."""
        self._cal(calendar_id)
        out = []
        for e in events:
            start = pd.Timestamp(e["start_time"])
            end = pd.Timestamp(e["end_time"])
            if end <= start:
                raise ValueError("end_time must be after start_time")
            ev = {"event_id": f"event-{self._next_event}",
                  "calendar_id": calendar_id,
                  "description": e.get("description", ""),
                  "start_time": start, "end_time": end}
            self._next_event += 1
            self._events.append(ev)
            out.append(ev)
        return out

    def delete_event(self, calendar_id: str, event_id: str) -> None:
        before = len(self._events)
        self._events = [e for e in self._events
                        if not (e["calendar_id"] == calendar_id
                                and e["event_id"] == event_id)]
        if len(self._events) == before:
            raise KeyError(f"no event [{event_id}] in [{calendar_id}]")

    def delete_calendar(self, calendar_id: str) -> None:
        self._cal(calendar_id)
        del self._calendars[calendar_id]
        self._events = [e for e in self._events
                        if e["calendar_id"] != calendar_id]

    def get_events(self, calendar_id: str | None = None,
                   job_id: str | None = None,
                   start=None, end=None) -> list[dict]:
        out = []
        for e in self._events:
            if calendar_id and e["calendar_id"] != calendar_id:
                continue
            if job_id is not None:
                jids = self._calendars[e["calendar_id"]]["job_ids"]
                # _all calendars apply to every job (reference GROUP id)
                if job_id not in jids and "_all" not in jids:
                    continue
            if start is not None and e["end_time"] <= pd.Timestamp(start):
                continue
            if end is not None and e["start_time"] >= pd.Timestamp(end):
                continue
            out.append(e)
        return sorted(out, key=lambda e: (e["start_time"], e["event_id"]))


# ----------------------------------------------------------- rule engine


_APPLIES = ("actual", "typical", "diff_from_typical")
_OPS = {"gt": lambda a, v: a > v, "gte": lambda a, v: a >= v,
        "lt": lambda a, v: a < v, "lte": lambda a, v: a <= v}


def _condition_holds(rec: dict, cond: dict) -> bool:
    applies = cond.get("applies_to", "actual")
    if applies not in _APPLIES:
        raise ValueError(f"unknown applies_to [{applies}]")
    if applies == "diff_from_typical":
        val = abs(float(rec["actual"]) - float(rec.get("typical") or 0.0))
    else:
        v = rec.get(applies)
        if v is None:
            return False
        val = float(v)
    return _OPS[cond["operator"]](val, float(cond["value"]))


def _scope_matches(rec: dict, scope: dict,
                   filters: MlFilterService) -> bool:
    for field, ref in scope.items():
        value = None
        if rec.get("partition_field_name") == field:
            value = rec.get("partition_field_value")
        elif rec.get("by_field_name") == field:
            value = rec.get("by_field_value")
        if value is None:
            return False
        hit = filters.matches(ref["filter_id"], value)
        if ref.get("filter_type", "include") == "include":
            if not hit:
                return False
        else:
            if hit:
                return False
    return True


def _rule_fires(rec: dict, rule: dict,
                filters: MlFilterService | None) -> bool:
    conds = rule.get("conditions", [])
    if any(not _condition_holds(rec, c) for c in conds):
        return False
    scope = rule.get("scope", {})
    if scope:
        if filters is None:
            raise ValueError("rule scope needs an MlFilterService")
        if not _scope_matches(rec, scope, filters):
            return False
    return bool(conds) or bool(scope)


def _rebuild_buckets(rec_df: pd.DataFrame, job) -> pd.DataFrame:
    if not len(rec_df):
        return pd.DataFrame(
            columns=["timestamp", "anomaly_score", "record_count"])
    buckets = (rec_df.groupby("timestamp", sort=True)
               .agg(anomaly_score=("record_score", "max"),
                    record_count=("record_score", "size"))
               .reset_index())
    buckets["job_id"] = job.job_id
    buckets["bucket_span"] = job.bucket_span.total_seconds()
    return buckets


def apply_detector_rules(result: dict, job,
                         filters: MlFilterService | None = None) -> dict:
    """Suppress records any skip_result custom_rule fires on (rules OR,
    conditions AND, scope per RuleScope), then rebuild buckets."""
    rec_df = result["records"]
    if not len(rec_df):
        return result
    keep = []
    for rec in rec_df.to_dict("records"):
        rules = job.detectors[int(rec["detector_index"])].get(
            "custom_rules", [])
        skip = any("skip_result" in r.get("actions", ["skip_result"])
                   and _rule_fires(rec, r, filters) for r in rules)
        keep.append(not skip)
    out = rec_df[pd.Series(keep, index=rec_df.index)].reset_index(
        drop=True)
    return {"records": out, "buckets": _rebuild_buckets(out, job),
            "series": result["series"]}


def apply_scheduled_events(result: dict, job,
                           calendars: MlCalendarService) -> dict:
    """ScheduledEventToRuleWriter semantics: each event is a skip_result
    rule over buckets whose START falls in [start_time, end_time)."""
    rec_df = result["records"]
    if not len(rec_df):
        return result
    events = calendars.get_events(job_id=job.job_id)
    if not events:
        return result
    ts = pd.to_datetime(rec_df["timestamp"])
    drop = pd.Series(False, index=rec_df.index)
    for e in events:
        drop |= (ts >= e["start_time"]) & (ts < e["end_time"])
    out = rec_df[~drop].reset_index(drop=True)
    return {"records": out, "buckets": _rebuild_buckets(out, job),
            "series": result["series"]}


def get_overall_buckets(results: list[tuple], top_n: int = 1,
                        overall_score: float = 0.0) -> pd.DataFrame:
    """``results``: [(AnomalyJob, result dict), ...]. Overall bucket
    span = the longest job span; per overall bucket each job contributes
    its MAX bucket anomaly_score inside the span and the bucket's
    overall_score averages the top_n job scores
    (TransportGetOverallBucketsAction)."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    spans = [job.bucket_span for job, _ in results]
    span = max(spans)
    rows = []
    for job, res in results:
        b = res["buckets"]
        if not len(b):
            continue
        t = pd.to_datetime(b["timestamp"]).dt.floor(span)
        per = (pd.DataFrame({"t": t, "s": b["anomaly_score"]})
               .groupby("t")["s"].max().reset_index())
        per["job_id"] = job.job_id
        rows.append(per)
    if not rows:
        return pd.DataFrame(columns=["timestamp", "overall_score",
                                     "bucket_span", "jobs"])
    allb = pd.concat(rows, ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.Series:
        top = g["s"].nlargest(top_n)
        return pd.Series({
            "overall_score": float(top.mean()),
            "jobs": sorted(g["job_id"].tolist())})

    out = (allb.groupby("t").apply(combine, include_groups=False)
           .reset_index().rename(columns={"t": "timestamp"}))
    out["bucket_span"] = span.total_seconds()
    out = out[out["overall_score"] >= overall_score]
    return out.sort_values("timestamp", ignore_index=True)
