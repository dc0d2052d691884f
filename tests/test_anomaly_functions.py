"""Extended DetectorFunction coverage (DetectorFunction.java full enum
minus LAT_LONG): varp/median/non_null_sum/nzc/info_content/metric/
rare/freq_rare/time_of_day on planted anomalies."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.anomaly import (
    AnomalyJob,
    run_anomaly_job,
)


def _frame():
    """24 hourly buckets, 12 events each. value ~ N-ish around 10 except:
    bucket 7 has huge spread (varp spike), bucket 15 is shifted to 50
    (median/mean shift). user: 'u<i%4>' everywhere plus 'intruder' only in
    bucket 11 (x6 occurrences — rare AND freq-rare). msg: repetitive
    except bucket 19 (high info content). Events at minute 10 except
    bucket 21 at minute 50 (time_of_day shift is tiny; use hours)."""
    rows = []
    for h in range(24):
        for i in range(12):
            if h == 7:
                v = 10.0 + (100.0 if i % 2 == 0 else -80.0)
            elif h == 15:
                v = 50.0 + 0.1 * i
            else:
                v = 10.0 + 0.1 * (i % 3)
            rows.append({
                "ts": pd.Timestamp("2024-05-01") + pd.Timedelta(hours=h)
                + pd.Timedelta(minutes=i),
                "value": v,
                "user": f"u{i % 4}" if not (h == 11 and i < 6)
                else "intruder",
                "msg": f"msg-{h}-{i}" if h == 19 else "same same same",
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def res(ray_session):
    import ray.data as rd

    job = AnomalyJob("ext-job", bucket_span="1h", detectors=[
        {"function": "varp", "field_name": "value"},          # 0
        {"function": "high_median", "field_name": "value"},   # 1
        {"function": "non_null_sum", "field_name": "value"},  # 2
        {"function": "nzc"},                                  # 3 (shortcut)
        {"function": "high_info_content", "field_name": "msg"},  # 4
        {"function": "metric", "field_name": "value"},        # 5
        {"function": "rare", "by_field_name": "user"},        # 6
        {"function": "freq_rare", "by_field_name": "user"},   # 7
        {"function": "time_of_day"},                          # 8
    ])
    ds = rd.from_pandas(_frame()).repartition(4)
    return run_anomaly_job(ds, job), _frame()


def _det(res, di):
    r = res["records"]
    return r[r["detector_index"] == di]


def test_varp_exact_and_spike(res):
    out, df = res
    d = _det(out, 0).set_index("timestamp")
    df = df.copy()
    df["bucket"] = df["ts"].dt.floor("1h")
    exp = df.groupby("bucket")["value"].apply(
        lambda v: float(np.var(v.to_numpy(float))))
    for b, e in exp.items():
        assert d.loc[b, "actual"] == pytest.approx(e, rel=1e-9)
    top = d["record_score"].idxmax()
    assert top == pd.Timestamp("2024-05-01 07:00:00")


def test_median_exact_and_shift(res):
    out, df = res
    d = _det(out, 1).set_index("timestamp")
    df = df.copy()
    df["bucket"] = df["ts"].dt.floor("1h")
    exp = df.groupby("bucket")["value"].median()
    for b, e in exp.items():
        assert d.loc[b, "actual"] == pytest.approx(float(e))
    assert d["record_score"].idxmax() == pd.Timestamp("2024-05-01 15:00:00")


def test_non_null_sum_and_nzc_actuals(res):
    out, df = res
    df = df.copy()
    df["bucket"] = df["ts"].dt.floor("1h")
    d2 = _det(out, 2).set_index("timestamp")
    exp = df.groupby("bucket")["value"].sum()
    for b, e in exp.items():
        assert d2.loc[b, "actual"] == pytest.approx(float(e))
    d3 = _det(out, 3)
    assert (d3["actual"] == 12.0).all()
    assert (d3["function"] == "non_zero_count").all()  # shortcut normalized


def test_info_content_flags_diverse_bucket(res):
    out, _df = res
    d = _det(out, 4).set_index("timestamp")
    assert d["record_score"].idxmax() == pd.Timestamp("2024-05-01 19:00:00")
    # the diverse bucket compresses worse than the repetitive ones
    others = d.drop(pd.Timestamp("2024-05-01 19:00:00"))
    assert d.loc[pd.Timestamp("2024-05-01 19:00:00"), "actual"] \
        > others["actual"].max()


def test_metric_reports_most_anomalous_component(res):
    out, _df = res
    d = _det(out, 5)
    # exactly one record per bucket, labeled with the shorthand name
    assert len(d) == 24
    assert (d["function"] == "metric").all()
    top2 = set(d.nlargest(2, "record_score")["timestamp"])
    # both planted value anomalies surface through the composite
    assert pd.Timestamp("2024-05-01 07:00:00") in top2  # min/max excursion
    assert pd.Timestamp("2024-05-01 15:00:00") in top2  # mean shift


def test_rare_value_flagged(res):
    out, _df = res
    d = _det(out, 6)
    intr = d[d["by_field_value"] == "intruder"]
    regular = d[d["by_field_value"] != "intruder"]
    assert len(intr) == 1
    # presence ratio 1/24 vs 1 for the regulars
    assert intr["probability"].iloc[0] == pytest.approx(1.0 / 24.0)
    assert (regular["probability"] == 1.0).all()
    assert intr["record_score"].iloc[0] > regular["record_score"].max()


def test_freq_rare_weighs_in_bucket_count(res):
    out, _df = res
    d6 = _det(out, 6)
    d7 = _det(out, 7)
    i6 = d6[d6["by_field_value"] == "intruder"]["record_score"].iloc[0]
    i7 = d7[d7["by_field_value"] == "intruder"]["record_score"].iloc[0]
    # 6 occurrences in the bucket -> freq_rare divides p by 6
    assert i7 > i6


def test_time_of_day_actual_is_mean_offset(res):
    out, df = res
    d = _det(out, 8).set_index("timestamp")
    df = df.copy()
    df["bucket"] = df["ts"].dt.floor("1h")
    off = (df["ts"] - df["ts"].dt.normalize()).dt.total_seconds()
    exp = off.groupby(df["bucket"]).mean()
    for b, e in exp.items():
        assert d.loc[b, "actual"] == pytest.approx(float(e))


def test_time_of_week_offsets(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "ts": [pd.Timestamp("2024-05-06 01:00"),   # Monday
               pd.Timestamp("2024-05-08 02:00")],  # Wednesday
        "value": [1.0, 1.0],
    })
    job = AnomalyJob("tow", bucket_span="1d",
                     detectors=[{"function": "time_of_week"}])
    out = run_anomaly_job(rd.from_pandas(df), job)
    acts = out["records"].sort_values("timestamp")["actual"].tolist()
    assert acts[0] == pytest.approx(0 * 86400 + 3600.0)
    assert acts[1] == pytest.approx(2 * 86400 + 7200.0)
