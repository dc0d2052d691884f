"""ML datafeeds (DatafeedConfig/DatafeedJobValidator/TimingStats):
query masks, aggregated-interval equivalence, validation, chunk plan."""

import numpy as np
import pandas as pd
import pytest

import ray

from elasticsearch_ray.ops.anomaly import AnomalyJob, run_anomaly_job
from elasticsearch_ray.ops.datafeed import (
    DatafeedConfig,
    _query_mask,
    run_datafeed,
    validate_datafeed,
)


def _events(n=2000):
    rng = np.random.RandomState(9)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 96 * 3600, n)), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "event_type": rng.choice(["click", "view", "purchase"], n),
        "value": rng.gamma(2.0, 20.0, n).round(2),
    })


@pytest.fixture(scope="module")
def events_ds(ray_session):
    return ray.data.from_pandas(_events()).repartition(4).materialize()


def test_query_mask_subset():
    df = _events(300)
    assert _query_mask(df, {"match_all": {}}).all()
    m = _query_mask(df, {"term": {"event_type": "click"}})
    assert (df[m]["event_type"] == "click").all() and m.any()
    m = _query_mask(df, {"terms": {"event_type": ["click", "view"]}})
    assert set(df[m]["event_type"]) <= {"click", "view"}
    m = _query_mask(df, {"range": {"value": {"gte": 10, "lt": 50}}})
    assert ((df[m]["value"] >= 10) & (df[m]["value"] < 50)).all()
    m = _query_mask(df, {"bool": {
        "filter": [{"term": {"event_type": "click"}}],
        "must_not": [{"range": {"value": {"lt": 20}}}]}})
    sub = df[m]
    assert (sub["event_type"] == "click").all() and (sub["value"] >= 20).all()


def test_filtered_datafeed_equals_prefiltered_job(events_ds, ray_session):
    job = AnomalyJob("df-test", bucket_span="3h", detectors=[
        {"function": "count", "partition_field_name": "event_type"}])
    cfg = DatafeedConfig("feed1",
                         query={"term": {"event_type": "purchase"}})
    fed = run_datafeed(events_ds, cfg, job)
    pre = _events()
    pre = pre[pre["event_type"] == "purchase"]
    direct = run_anomaly_job(ray.data.from_pandas(pre), job)
    pd.testing.assert_frame_equal(
        fed["records"].reset_index(drop=True),
        direct["records"].reset_index(drop=True))


@pytest.mark.parametrize("fn,field", [
    ("count", None), ("mean", "value"), ("sum", "value"),
    ("min", "value"), ("max", "value")])
def test_aggregated_feed_reproduces_raw_buckets(events_ds, fn, field):
    """The validator's core contract: an aggregated datafeed at a finer
    interval must produce the SAME job results as the raw feed."""
    det = {"function": fn, "partition_field_name": "event_type"}
    if field:
        det["field_name"] = field
    job = AnomalyJob("df-agg", bucket_span="4h", detectors=[det])
    raw = run_datafeed(events_ds, DatafeedConfig("f0"), job)
    agg = run_datafeed(events_ds, DatafeedConfig(
        "f1", aggregations={"date_histogram": {
            "field": "ts", "fixed_interval": "1h"}}), job)
    pd.testing.assert_frame_equal(
        raw["records"].reset_index(drop=True),
        agg["records"].reset_index(drop=True))


def test_validator_rejects_bad_intervals(events_ds):
    job = AnomalyJob("v", bucket_span="1h",
                     detectors=[{"function": "count"}])
    with pytest.raises(ValueError, match="multiple"):
        validate_datafeed(DatafeedConfig("f", aggregations={
            "date_histogram": {"field": "ts", "fixed_interval": "25min"}}),
            job)
    with pytest.raises(ValueError, match="greater than"):
        validate_datafeed(DatafeedConfig("f", aggregations={
            "date_histogram": {"field": "ts", "fixed_interval": "2h"}}),
            job)
    dj = AnomalyJob("v2", bucket_span="1h", detectors=[
        {"function": "distinct_count", "field_name": "event_type"}])
    with pytest.raises(ValueError, match="distinct_count"):
        validate_datafeed(DatafeedConfig("f", aggregations={
            "date_histogram": {"field": "ts", "fixed_interval": "30min"}}),
            dj)
    with pytest.raises(ValueError, match="frequency"):
        validate_datafeed(DatafeedConfig("f", frequency="45min",
                                         aggregations={
                                             "date_histogram": {
                                                 "field": "ts",
                                                 "fixed_interval": "30min"}}),
                          job)


def test_chunking_plan_and_timing_stats(events_ds):
    job = AnomalyJob("chunks", bucket_span="1h",
                     detectors=[{"function": "count"}])
    out = run_datafeed(events_ds, DatafeedConfig(
        "f", chunking_config={"mode": "manual", "time_span": "24h"}), job)
    iv = out["search_intervals"]
    # 4 days of data / 24h manual chunks
    assert 4 <= len(iv) <= 5
    assert all(b > a for a, b in iv)
    assert iv[0][0] == pd.Timestamp("2024-01-01")
    ts = out["timing_stats"]
    assert ts["search_count"] == len(iv)
    assert ts["bucket_count"] == len(out["buckets"])
    assert ts["total_search_time_ms"] > 0
    # auto mode: 1000 x bucket_span covers everything in one chunk
    auto = run_datafeed(events_ds, DatafeedConfig("f2"), job)
    assert len(auto["search_intervals"]) == 1


def test_preview_datafeed_raw_and_aggregated(ray_session):
    import ray.data as rd

    from elasticsearch_ray.ops.anomaly import AnomalyJob
    from elasticsearch_ray.ops.datafeed import (
        DatafeedConfig,
        preview_datafeed,
    )

    rows = []
    for h in range(12):
        for i in range(20):
            rows.append({"ts": pd.Timestamp("2024-04-01")
                         + pd.Timedelta(hours=h, minutes=i),
                         "value": float(i), "svc": "web" if i % 2 else "db",
                         "noise": "x"})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    job = AnomalyJob("pv", bucket_span="1h", detectors=[
        {"function": "mean", "field_name": "value",
         "partition_field_name": "svc"}])
    cfg = DatafeedConfig("feed-pv", query={
        "term": {"svc": "web"}})
    out = preview_datafeed(ds, cfg, job, limit=30)
    # job-relevant columns only, query applied, time-ascending cap
    assert list(out.columns) == ["ts", "value", "svc"]
    assert len(out) == 30
    assert (out["svc"] == "web").all()
    assert out["ts"].is_monotonic_increasing
    # aggregated preview returns the per-interval partials frame
    cfg_agg = DatafeedConfig("feed-agg", aggregations={
        "date_histogram": {"field": "ts", "fixed_interval": "30m"}})
    agg = preview_datafeed(ds, cfg_agg, job, limit=10)
    assert "bucket" in agg.columns and len(agg) <= 10
    assert agg["bucket"].is_monotonic_increasing
