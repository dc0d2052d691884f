"""ML filters / calendars + scheduled events / detector custom_rules /
overall buckets (MlFilter, DetectorRule, ScheduledEvent,
TransportGetOverallBucketsAction semantics)."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.anomaly import AnomalyJob, run_anomaly_job
from elasticsearch_ray.ops.ml_governance import (
    MlCalendarService,
    MlFilterService,
    apply_detector_rules,
    apply_scheduled_events,
    get_overall_buckets,
)


def _frame():
    """24 hourly buckets, count 10/h, spikes at h=5 (svc=web) and h=17
    (svc=db)."""
    rows = []
    for h in range(24):
        for svc in ("web", "db"):
            n = 10
            if (h, svc) in ((5, "web"), (17, "db")):
                n = 80
            for i in range(n):
                rows.append({"ts": pd.Timestamp("2024-05-01")
                             + pd.Timedelta(hours=h, minutes=i % 60),
                             "svc": svc, "value": 1.0})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def governed(ray_session):
    import ray.data as rd

    job = AnomalyJob("gov-job", bucket_span="1h", detectors=[
        {"function": "high_count", "partition_field_name": "svc"}])
    res = run_anomaly_job(rd.from_pandas(_frame()).repartition(3), job)
    return job, res


def _spikes(res):
    r = res["records"]
    hot = r[r["record_score"] > 50]
    return {(ts.hour, svc) for ts, svc in
            zip(pd.to_datetime(hot["timestamp"]),
                hot["partition_field_value"])}


def test_baseline_has_both_spikes(governed):
    _, res = governed
    assert _spikes(res) == {(5, "web"), (17, "db")}


def test_filter_service_crud():
    f = MlFilterService()
    f.put_filter("safe-hosts", ["web", "cdn-*"], "desc")
    assert f.get_filter("safe-hosts")["items"] == ["cdn-*", "web"]
    assert f.matches("safe-hosts", "web")
    assert f.matches("safe-hosts", "cdn-7")  # simpleMatch wildcard
    assert not f.matches("safe-hosts", "db")
    f.update_filter("safe-hosts", add_items=["db"],
                    remove_items=["web"])
    assert f.get_filter("safe-hosts")["items"] == ["cdn-*", "db"]
    assert [x["filter_id"] for x in f.get_filters()] == ["safe-hosts"]
    f.delete_filter("safe-hosts")
    with pytest.raises(KeyError):
        f.get_filter("safe-hosts")
    with pytest.raises(ValueError):
        f.put_filter("x", ["a"] * 10_001)


def test_scope_rule_skips_filtered_partition(governed):
    job, res = governed
    filters = MlFilterService()
    filters.put_filter("noisy", ["web"])
    job.detectors[0]["custom_rules"] = [{
        "actions": ["skip_result"],
        "scope": {"svc": {"filter_id": "noisy",
                          "filter_type": "include"}}}]
    try:
        out = apply_detector_rules(res, job, filters)
    finally:
        job.detectors[0].pop("custom_rules")
    # ALL web records skipped, db untouched
    assert (out["records"]["partition_field_value"] == "web").sum() == 0
    assert _spikes(out) == {(17, "db")}
    # buckets rebuilt: no bucket carries only-web records anymore
    assert len(out["buckets"]) < len(res["buckets"]) or \
        (out["buckets"]["record_count"].sum()
         < res["buckets"]["record_count"].sum())


def test_condition_rule_and_exclude_scope(governed):
    job, res = governed
    filters = MlFilterService()
    filters.put_filter("dbs", ["db"])
    # skip results with actual > 50 EXCEPT for svc in 'dbs'
    job.detectors[0]["custom_rules"] = [{
        "actions": ["skip_result"],
        "conditions": [{"applies_to": "actual", "operator": "gt",
                        "value": 50}],
        "scope": {"svc": {"filter_id": "dbs",
                          "filter_type": "exclude"}}}]
    try:
        out = apply_detector_rules(res, job, filters)
    finally:
        job.detectors[0].pop("custom_rules")
    assert _spikes(out) == {(17, "db")}
    # conditions are ANDed: a never-matching extra condition disables it
    job.detectors[0]["custom_rules"] = [{
        "actions": ["skip_result"],
        "conditions": [
            {"applies_to": "actual", "operator": "gt", "value": 50},
            {"applies_to": "actual", "operator": "lt", "value": 20}]}]
    try:
        out2 = apply_detector_rules(res, job, None)
    finally:
        job.detectors[0].pop("custom_rules")
    assert _spikes(out2) == {(5, "web"), (17, "db")}


def test_calendar_events_skip_buckets(governed):
    job, res = governed
    cal = MlCalendarService()
    cal.put_calendar("maintenance", job_ids=["gov-job"])
    cal.post_events("maintenance", [{
        "description": "deploy window",
        "start_time": "2024-05-01T05:00:00",
        "end_time": "2024-05-01T06:00:00"}])
    out = apply_scheduled_events(res, job, cal)
    assert _spikes(out) == {(17, "db")}
    hours = set(pd.to_datetime(out["records"]["timestamp"]).dt.hour)
    assert 5 not in hours
    # a calendar for another job does nothing
    cal2 = MlCalendarService()
    cal2.put_calendar("other", job_ids=["different-job"])
    cal2.post_events("other", [{
        "start_time": "2024-05-01T17:00:00",
        "end_time": "2024-05-01T18:00:00"}])
    same = apply_scheduled_events(res, job, cal2)
    assert _spikes(same) == {(5, "web"), (17, "db")}
    # _all applies to every job
    cal2.put_calendar("global", job_ids=["_all"])
    cal2.post_events("global", [{
        "start_time": "2024-05-01T17:00:00",
        "end_time": "2024-05-01T18:00:00"}])
    allj = apply_scheduled_events(res, job, cal2)
    assert _spikes(allj) == {(5, "web")}


def test_calendar_crud_and_event_queries():
    cal = MlCalendarService()
    cal.put_calendar("c1", job_ids=["j2", "j1"])
    assert cal.get_calendars()[0]["job_ids"] == ["j1", "j2"]
    cal.put_calendar_job("c1", "j3")
    cal.delete_calendar_job("c1", "j1")
    assert cal._cal("c1")["job_ids"] == ["j2", "j3"]
    evs = cal.post_events("c1", [
        {"start_time": "2024-01-01", "end_time": "2024-01-02"},
        {"start_time": "2024-02-01", "end_time": "2024-02-03"}])
    assert [e["event_id"] for e in evs] == ["event-1", "event-2"]
    with pytest.raises(ValueError):
        cal.post_events("c1", [{"start_time": "2024-01-02",
                                "end_time": "2024-01-01"}])
    # range filter: events overlapping [start, end)
    got = cal.get_events(start="2024-01-15", end="2024-02-02")
    assert [e["event_id"] for e in got] == ["event-2"]
    assert cal.get_events(job_id="j9") == []
    assert len(cal.get_events(job_id="j2")) == 2
    cal.delete_event("c1", "event-1")
    assert len(cal.get_events("c1")) == 1
    with pytest.raises(KeyError):
        cal.delete_event("c1", "event-1")
    cal.delete_calendar("c1")
    assert cal.get_calendars() == [] and cal.get_events() == []


def test_overall_buckets(ray_session):
    import ray.data as rd

    # two jobs over the same series at different spans
    job1 = AnomalyJob("j1", bucket_span="1h",
                      detectors=[{"function": "high_count"}])
    job2 = AnomalyJob("j2", bucket_span="2h",
                      detectors=[{"function": "high_count"}])
    ds = rd.from_pandas(_frame()).repartition(2)
    r1, r2 = run_anomaly_job(ds, job1), run_anomaly_job(ds, job2)
    ob = get_overall_buckets([(job1, r1), (job2, r2)], top_n=1)
    assert (ob["bucket_span"] == 7200.0).all()  # longest span wins
    # overall score at the spike bucket is the MAX job score there
    spike = ob.loc[pd.to_datetime(ob["timestamp"]).dt.hour == 4]
    b1 = r1["buckets"]
    h5 = b1.loc[pd.to_datetime(b1["timestamp"]).dt.hour == 5,
                "anomaly_score"].max()
    b2f = r2["buckets"]
    h4 = b2f.loc[pd.to_datetime(b2f["timestamp"]).dt.hour == 4,
                 "anomaly_score"].max()
    assert spike["overall_score"].iloc[0] == pytest.approx(
        max(h5, h4))
    # top_n=2 averages both jobs' contributions
    ob2 = get_overall_buckets([(job1, r1), (job2, r2)], top_n=2)
    spike2 = ob2.loc[pd.to_datetime(ob2["timestamp"]).dt.hour == 4]
    assert spike2["overall_score"].iloc[0] == pytest.approx(
        (h5 + h4) / 2)
    with pytest.raises(ValueError):
        get_overall_buckets([(job1, r1)], top_n=0)


def test_estimate_model_memory_formula():
    from elasticsearch_ray.ops.ml_governance import estimate_model_memory

    # plain count, no splits: 10MB base + 32KB -> rounds up to 11MB
    out = estimate_model_memory([{"function": "count"}])
    assert out["model_memory_estimate"] == "11mb"
    # partition multiplies; distinct_count adds the 5MB workspace
    out2 = estimate_model_memory(
        [{"function": "distinct_count", "field_name": "u",
          "partition_field_name": "svc"}],
        overall_cardinality={"svc": 100})
    # 32KB*100 + 5MB + 10MB = 3.125MB + 15MB -> ceil = 19MB
    assert out2["model_memory_estimate"] == "19mb"
    # pure influencers bill 10KB per max-bucket value; split-field
    # influencers are free
    base = estimate_model_memory([{"function": "count",
                                   "partition_field_name": "svc"}],
                                 overall_cardinality={"svc": 1})
    infl = estimate_model_memory([{"function": "count",
                                   "partition_field_name": "svc"}],
                                 overall_cardinality={"svc": 1},
                                 influencers=["user"],
                                 max_bucket_cardinality={"user": 1000})
    free = estimate_model_memory([{"function": "count",
                                   "partition_field_name": "svc"}],
                                 overall_cardinality={"svc": 1},
                                 influencers=["svc"])
    assert infl["bytes"] - base["bytes"] >= 10 * 1024 * 1000 - 2 ** 20
    assert free["bytes"] == base["bytes"]
    # mlcategory has built-in estimates; unknown fields must be supplied
    ml = estimate_model_memory([{"function": "count",
                                 "by_field_name": "mlcategory"}])
    assert ml["bytes"] > 0
    import pytest as _pt
    with _pt.raises(ValueError, match="cardinality estimate required"):
        estimate_model_memory([{"function": "count",
                                "by_field_name": "mystery"}])
    with _pt.raises(ValueError, match="unhandled detector function"):
        estimate_model_memory([{"function": "nope"}])
    # categorization: x2 when stop_on_warn is off (or unpartitioned)
    cat = estimate_model_memory([{"function": "count"}],
                                categorization_field_name="msg")
    assert cat["bytes"] - estimate_model_memory(
        [{"function": "count"}])["bytes"] == 40 * 2 ** 20


def test_compute_influencers(governed):
    from elasticsearch_ray.ops.ml_governance import compute_influencers

    job, res = governed
    inf = compute_influencers(res, job, ["svc"])
    assert len(inf)
    # top influencers are the spiking partitions, score == record max
    top = inf.iloc[0]
    assert top["influencer_field_name"] == "svc"
    assert top["influencer_field_value"] in ("web", "db")
    r = res["records"]
    expect = r[(r["partition_field_value"] == top["influencer_field_value"])
               & (r["timestamp"] == top["timestamp"])]["record_score"].max()
    assert top["influencer_score"] == pytest.approx(expect)
    assert (inf["influencer_score"].values[:-1]
            >= inf["influencer_score"].values[1:]).all()
    # a field that is no split field yields nothing
    assert len(compute_influencers(res, job, ["unknown"])) == 0
