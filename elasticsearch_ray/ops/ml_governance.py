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


_KB = 1024
_MB = 1024 * 1024
_FUNC_BYTES = {
    **dict.fromkeys(["distinct_count", "low_distinct_count",
                     "high_distinct_count"], (32 * _KB, True)),
    **dict.fromkeys(["count", "low_count", "high_count",
                     "non_zero_count", "low_non_zero_count",
                     "high_non_zero_count"], (32 * _KB, False)),
    **dict.fromkeys(["rare", "freq_rare"], (2 * _KB, False)),
    **dict.fromkeys(["info_content", "low_info_content",
                     "high_info_content"], (48 * _KB, True)),
    **dict.fromkeys(["mean", "low_mean", "high_mean", "avg", "low_avg",
                     "high_avg", "min", "max", "sum", "low_sum",
                     "high_sum", "non_null_sum", "low_non_null_sum",
                     "high_non_null_sum", "varp", "low_varp",
                     "high_varp"], (48 * _KB, False)),
    "metric": (120 * _KB, False),
    **dict.fromkeys(["median", "low_median", "high_median"],
                    (64 * _KB, False)),
    **dict.fromkeys(["time_of_day", "time_of_week"], (10 * _KB, False)),
    "lat_long": (64 * _KB, False),
}


def _cardinality(field: str, supplied: dict, is_overall: bool) -> int:
    if field in supplied:
        return int(supplied[field])
    if field == "mlcategory":
        return 500 if is_overall else 50
    raise ValueError(
        f"[{'Overall' if is_overall else 'Bucket max'}] cardinality "
        f"estimate required for [{field}] but not supplied")


def _reduced_cardinality(card: int, pcard: int, span_s: float) -> float:
    """TransportEstimateModelMemoryAction.reducedCardinality."""
    import math

    if card == 0 or pcard <= 1:
        return float(card)
    power = min(1.0, (math.log10(span_s) + 1.0) / 8.0)
    return card / (min(card, pcard) ** power)


def estimate_model_memory(detectors: list[dict], bucket_span: str = "1h",
                          overall_cardinality: dict | None = None,
                          max_bucket_cardinality: dict | None = None,
                          influencers: list[str] = (),
                          categorization_field_name: str | None = None,
                          per_partition_categorization: bool = False,
                          stop_on_warn: bool = False) -> dict:
    """``_ml/anomaly_detectors/_estimate_model_memory``
    (TransportEstimateModelMemoryAction): closed-form estimate from the
    job config + caller-supplied cardinalities. Formula reproduced 1:1 —
    10MB base, per-function detector bytes with by (×⌈reduced·⅔⌉) /
    over (+768·⌈reduced⌉) / partition (×card) multipliers, +5MB
    field-value workspace for distinct_count/info_content, 10KB per pure
    influencer bucket-value, categorization 20/40MB per relevant
    partition; result rounded up to the next MB."""
    import math

    overall_cardinality = dict(overall_cardinality or {})
    max_bucket_cardinality = dict(max_bucket_cardinality or {})
    span_s = pd.Timedelta(bucket_span).total_seconds()
    total = 10 * _MB
    analysis_fields = set()
    for d in detectors:
        fn = d["function"]
        if fn not in _FUNC_BYTES:
            raise ValueError(f"unhandled detector function {fn!r}")
        answer, workspace = _FUNC_BYTES[fn]
        pcard = 1
        if d.get("partition_field_name"):
            pcard = max(1, _cardinality(d["partition_field_name"],
                                        overall_cardinality, True))
        if d.get("by_field_name"):
            bcard = _cardinality(d["by_field_name"],
                                 overall_cardinality, True)
            answer *= int(math.ceil(_reduced_cardinality(
                bcard, pcard, span_s) * 2.0 / 3.0))
        if d.get("over_field_name"):
            ocard = _cardinality(d["over_field_name"],
                                 overall_cardinality, True)
            answer += 768 * int(math.ceil(_reduced_cardinality(
                ocard, pcard, span_s)))
        if d.get("partition_field_name"):
            answer *= pcard
        if workspace:
            answer += 5 * _MB
        total += answer
        analysis_fields.update(
            f for f in (d.get("by_field_name"), d.get("over_field_name"),
                        d.get("partition_field_name"), d.get("field_name"))
            if f)
    pure = [f for f in influencers if f not in analysis_fields]
    total += 10 * _KB * sum(
        _cardinality(f, max_bucket_cardinality, False) for f in pure)
    if categorization_field_name is not None:
        per_mb = 20
        pcard = 1
        if per_partition_categorization:
            for d in detectors:
                if d.get("partition_field_name"):
                    pcard = max(1, _cardinality(
                        d["partition_field_name"], overall_cardinality,
                        True))
                    break
            if not stop_on_warn:
                per_mb *= 2
        else:
            per_mb *= 2
        total += per_mb * pcard * _MB
    mb = (total + _MB - 1) // _MB
    return {"model_memory_estimate": f"{mb}mb", "bytes": int(mb * _MB)}


def compute_influencers(result: dict, job,
                        influencers: list[str]) -> pd.DataFrame:
    """Influencer results (``ml/job/results/Influencer.java``): per
    (bucket, influencer field, value) — the ml-cpp model apportions
    record probability across influencing values; here a value's
    influencer probability is the MIN probability (and
    influencer_score the MAX record_score) among the bucket's records
    keyed by that value through its by/partition role — exact when the
    influencer IS a split field, which is the reference's own guidance
    for meaningful influencers."""
    rec = result["records"]
    rows = []
    for field in influencers:
        for role in ("partition", "by"):
            name_col = f"{role}_field_name"
            val_col = f"{role}_field_value"
            if name_col not in rec.columns:
                continue
            sub = rec[rec[name_col] == field]
            if not len(sub):
                continue
            g = (sub.groupby(["timestamp", val_col], sort=True)
                 .agg(probability=("probability", "min"),
                      influencer_score=("record_score", "max"))
                 .reset_index())
            for _, r in g.iterrows():
                rows.append({
                    "job_id": job.job_id,
                    "timestamp": r["timestamp"],
                    "bucket_span": job.bucket_span.total_seconds(),
                    "influencer_field_name": field,
                    "influencer_field_value": r[val_col],
                    "probability": float(r["probability"]),
                    "influencer_score": float(r["influencer_score"]),
                    "initial_influencer_score":
                        float(r["influencer_score"])})
    df = pd.DataFrame(rows)
    if len(df):
        df = (df.groupby(["job_id", "timestamp", "bucket_span",
                          "influencer_field_name",
                          "influencer_field_value"], sort=True)
              .agg(probability=("probability", "min"),
                   influencer_score=("influencer_score", "max"),
                   initial_influencer_score=("initial_influencer_score",
                                             "max"))
              .reset_index()
              .sort_values(["influencer_score", "timestamp"],
                           ascending=[False, True], ignore_index=True))
    return df


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
