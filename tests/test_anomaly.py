"""Anomaly detection jobs (x-pack ml Detector/AnomalyRecord/Bucket schemas,
Gaussian-baseline probability — see ops/anomaly.py docstring) on planted
anomalies."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.anomaly import (
    AnomalyJob,
    get_records,
    run_anomaly_job,
)


def _events():
    """48 hourly buckets; count 10/h with one spike (bucket 20 → 60) and one
    dip (bucket 33 → 1); value ~ 5.0 with one high-mean hour (bucket 40)."""
    rows = []
    rng = np.random.default_rng(7)
    for h in range(48):
        n = 60 if h == 20 else (1 if h == 33 else 10)
        for i in range(n):
            rows.append({
                "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h)
                + pd.Timedelta(minutes=int(rng.integers(0, 60))),
                "value": 50.0 if h == 40 else 5.0 + 0.01 * (i % 3),
                "user_id": int(i % 7) if h != 20 else i,  # spike: many users
                "event_type": "a" if i % 2 == 0 else "b",
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def result(ray_session):
    import ray.data as rd

    job = AnomalyJob("test-job", bucket_span="1h", detectors=[
        {"function": "high_count"},
        {"function": "low_count"},
        {"function": "mean", "field_name": "value"},
        {"function": "distinct_count", "field_name": "user_id"},
        {"function": "count", "by_field_name": "event_type"},
    ])
    ds = rd.from_pandas(_events()).repartition(4)
    return run_anomaly_job(ds, job), _events()


def _det(res, di):
    r = res["records"]
    return r[r["detector_index"] == di].set_index("timestamp")


def test_actuals_exact(result):
    res, df = result
    d0 = _det(res, 0)
    assert d0.loc[pd.Timestamp("2024-03-01 20:00"), "actual"] == 60.0
    assert d0.loc[pd.Timestamp("2024-03-01 33:00"
                               if False else "2024-03-02 09:00"),
                  "actual"] == 1.0
    d3 = _det(res, 3)
    assert d3.loc[pd.Timestamp("2024-03-01 20:00"), "actual"] == 60.0
    assert d3.loc[pd.Timestamp("2024-03-01 00:00"), "actual"] == 7.0


def test_high_low_sidedness(result):
    res, _ = result
    spike = pd.Timestamp("2024-03-01 20:00")
    dip = pd.Timestamp("2024-03-02 09:00")  # hour 33
    hi = _det(res, 0)
    lo = _det(res, 1)
    # high_count: spike is the top record, dip is not anomalous (p ~ 1)
    assert hi["record_score"].idxmax() == spike
    assert hi.loc[dip, "record_score"] < 1.0
    # low_count: dip tops, spike benign
    assert lo["record_score"].idxmax() == dip
    assert lo.loc[spike, "record_score"] < 1.0


def test_mean_detector_flags_high_hour(result):
    res, df = result
    d2 = _det(res, 2)
    top = pd.Timestamp("2024-03-01 40:00" if False else "2024-03-02 16:00")
    assert d2["record_score"].idxmax() == top
    assert d2.loc[top, "actual"] == 50.0
    # typical = Gaussian baseline mean over the series' bucket values
    assert d2["typical"].iloc[0] == pytest.approx(
        d2["actual"].mean(), rel=1e-9)


def test_by_field_series_are_independent(result):
    res, df = result
    d4 = res["records"][res["records"]["detector_index"] == 4]
    assert set(d4["by_field_value"]) == {"a", "b"}
    spike = pd.Timestamp("2024-03-01 20:00")
    for v, cnt in (("a", 30.0), ("b", 30.0)):
        sub = d4[d4["by_field_value"] == v].set_index("timestamp")
        assert sub.loc[spike, "actual"] == cnt
        assert sub["record_score"].idxmax() == spike


def test_bucket_scores_and_get_records(result):
    res, _ = result
    b = res["buckets"].set_index("timestamp")
    spike = pd.Timestamp("2024-03-01 20:00")
    recs = res["records"]
    want = recs[recs["timestamp"] == spike]["record_score"].max()
    assert b.loc[spike, "anomaly_score"] == want
    top = get_records(res, record_score=25.0)
    assert (top["record_score"] >= 25.0).all()
    assert list(top["record_score"]) == sorted(top["record_score"],
                                               reverse=True)
    assert {"job_id", "probability", "function", "bucket_span"} <= set(
        top.columns)


def test_probability_matches_gaussian_tail(result):
    res, _ = result
    d0 = _det(res, 0)
    vals = d0["actual"].to_numpy(float)
    mu, sd = vals.mean(), vals.std(ddof=1)
    import math

    z = (60.0 - mu) / sd
    p = 1.0 - 0.5 * (1.0 + math.erf(z / math.sqrt(2)))
    spike = pd.Timestamp("2024-03-01 20:00")
    assert d0.loc[spike, "probability"] == pytest.approx(max(p, 1e-300),
                                                         rel=1e-9)
    assert d0.loc[spike, "record_score"] == pytest.approx(
        min(100.0, -10.0 * np.log10(max(p, 1e-300))), rel=1e-9)


def test_validation_errors():
    with pytest.raises(ValueError, match="at least one"):
        AnomalyJob("j", detectors=[])
    with pytest.raises(ValueError, match="requires field_name"):
        AnomalyJob("j", detectors=[{"function": "mean"}])
    with pytest.raises(ValueError, match="requires field_name"):
        AnomalyJob("j", detectors=[{"function": "median"}])
    with pytest.raises(ValueError, match="unsupported function"):
        AnomalyJob("j", detectors=[{"function": "lat_long"}])
    with pytest.raises(ValueError, match="requires by_field_name"):
        AnomalyJob("j", detectors=[{"function": "rare"}])
    with pytest.raises(ValueError, match="takes no field_name"):
        AnomalyJob("j", detectors=[{"function": "freq_rare",
                                    "by_field_name": "u",
                                    "field_name": "v"}])


def test_forecast_linear_trend_and_widening_bounds(ray_session):
    """_forecast analog: an exact linear series forecasts on the line;
    bounds widen monotonically with horizon; per-series forecasts keyed."""
    import ray.data as rd

    from elasticsearch_ray.ops.anomaly import forecast

    rows = []
    for h in range(24):
        for kind, base, slope in (("a", 10, 2), ("b", 100, -3)):
            n = base + slope * h  # exact linear hourly count per series
            for i in range(n):
                rows.append({"ts": pd.Timestamp("2024-03-01")
                             + pd.Timedelta(hours=h, minutes=i % 60),
                             "event_type": kind})
    df = pd.DataFrame(rows)
    job = AnomalyJob("fc", bucket_span="1h", detectors=[
        {"function": "count", "by_field_name": "event_type"}])
    res = run_anomaly_job(rd.from_pandas(df).repartition(3), job)
    out = forecast(res, job, horizon=5, confidence=0.95)
    f = out["forecasts"]
    assert out["request_stats"]["status"] == "finished"
    assert len(f) == 10  # 2 series x 5 buckets
    fa = f[f["by_field_value"] == "a"].reset_index(drop=True)
    fb = f[f["by_field_value"] == "b"].reset_index(drop=True)
    # exact line: prediction continues it, residual s == 0 -> tight bounds
    assert np.allclose(fa["forecast_prediction"],
                       10 + 2 * np.arange(24, 29), atol=1e-6)
    assert np.allclose(fb["forecast_prediction"],
                       100 - 3 * np.arange(24, 29), atol=1e-6)
    # future timestamps advance by the bucket span
    assert (fa["timestamp"].diff().dropna()
            == pd.Timedelta(hours=1)).all()
    # noisy series: bounds widen with horizon
    rng = np.random.default_rng(5)
    noisy = pd.DataFrame({
        "ts": [pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h,
                                                         minutes=int(m))
               for h in range(24)
               for m in rng.integers(0, 60, int(rng.integers(4, 16)))],
        "event_type": "x",
    })
    res2 = run_anomaly_job(rd.from_pandas(noisy), AnomalyJob(
        "fc2", bucket_span="1h",
        detectors=[{"function": "count"}]))
    f2 = forecast(res2, job, horizon=6)["forecasts"]
    width = (f2["forecast_upper"] - f2["forecast_lower"]).to_numpy()
    assert (np.diff(width) > 0).all()
    with pytest.raises(ValueError, match="horizon"):
        forecast(res2, job, horizon=0)


def test_forecast_sparse_series_uses_real_time_axis(ray_session):
    """review r5 #7: empty buckets emit no record; the trend must fit on
    the REAL timestamps (bucket-span units), not the compressed index."""
    import ray.data as rd

    from elasticsearch_ray.ops.anomaly import forecast

    # events only in EVEN hours, with count = 4 + hour (slope 1 per hour
    # of wall-clock, i.e. the fitted per-bucket slope must be 1, not 2)
    rows = []
    for h in range(0, 24, 2):
        for i in range(4 + h):
            rows.append({"ts": pd.Timestamp("2024-03-01")
                         + pd.Timedelta(hours=h, minutes=i % 60)})
    df = pd.DataFrame(rows)
    job = AnomalyJob("sparse", bucket_span="1h",
                     detectors=[{"function": "count"}])
    res = run_anomaly_job(rd.from_pandas(df), job)
    f = forecast(res, job, horizon=3)["forecasts"]
    # last observed bucket is hour 22 (count 26); the line is 4 + h
    want = [4 + 23, 4 + 24, 4 + 25]
    assert np.allclose(f["forecast_prediction"], want, atol=1e-6)
    assert f["timestamp"].tolist() == [
        pd.Timestamp("2024-03-01 23:00"), pd.Timestamp("2024-03-02 00:00"),
        pd.Timestamp("2024-03-02 01:00")]
