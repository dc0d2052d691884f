"""x-pack analytics aggs (ops/analytics.py): string_stats, boxplot,
t_test — exactness / tolerance / known-value checks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_string_stats_exact(ray_session):
    from elasticsearch_ray.ops.analytics import string_stats

    vals = ["ab", "abc", None, "a", "bbbb"]
    out = string_stats(rd.from_pandas(pd.DataFrame({"s": vals})),
                       "s", show_distribution=True)
    assert out["count"] == 4
    assert out["min_length"] == 1 and out["max_length"] == 4
    assert abs(out["avg_length"] - 10 / 4) < 1e-12
    # chars: a×3 b×6 c×1 over 10
    want = -(0.3 * np.log2(0.3) + 0.6 * np.log2(0.6) + 0.1 * np.log2(0.1))
    assert abs(out["entropy"] - want) < 1e-12
    assert abs(out["distribution"]["b"] - 0.6) < 1e-12
    # batch-boundary independence
    out2 = string_stats(rd.from_pandas(
        pd.DataFrame({"s": vals})).repartition(3), "s")
    assert abs(out2["entropy"] - out["entropy"]) < 1e-12

    empty = string_stats(rd.from_pandas(pd.DataFrame({"s": [None]})), "s")
    assert empty["count"] == 0 and empty["entropy"] == 0.0


def test_boxplot_agg(ray_session):
    from elasticsearch_ray.ops.analytics import boxplot_agg

    rng = np.random.default_rng(3)
    v = rng.normal(50, 10, 5000)
    out = boxplot_agg(rd.from_pandas(pd.DataFrame({"v": v})).repartition(4), "v")
    assert out["min"] == v.min() and out["max"] == v.max()
    for q, key in ((25, "q1"), (50, "q2"), (75, "q3")):
        assert abs(out[key] - np.percentile(v, q)) < 0.5, key
    assert out["lower"] >= out["min"] and out["upper"] <= out["max"]
    assert out["q1"] <= out["q2"] <= out["q3"]


def test_top_metrics(ray_session):
    from elasticsearch_ray.ops.analytics import top_metrics

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"s": rng.permutation(1000).astype(float),
                       "m": np.arange(1000).astype(float)})
    ds = rd.from_pandas(df).repartition(4)
    out = top_metrics(ds, "s", ["m"], size=3)
    want = df.sort_values("s", ascending=False).head(3)
    assert out["s"].tolist() == want["s"].tolist()
    assert out["m"].tolist() == want["m"].tolist()
    asc = top_metrics(ds, "s", ["m"], size=2, descending=False)
    assert asc["s"].tolist() == sorted(df["s"])[:2]


def test_rate_agg(ray_session):
    from elasticsearch_ray.ops.analytics import rate_agg

    ts = pd.date_range("2024-01-01", periods=48, freq="h")
    df = pd.DataFrame({"ts": ts, "v": 1.0})
    ds = rd.from_pandas(df).repartition(3)
    # day buckets, rate per day == raw count (24 per bucket)
    per_day = rate_agg(ds, "ts", unit="day")
    assert per_day["rate"].tolist() == [24.0, 24.0]
    # rate per hour within day buckets: 24 docs / 24 = 1 per hour
    per_hour = rate_agg(ds, "ts", unit="day", rate_unit="hour")
    assert per_hour["rate"].tolist() == [1.0, 1.0]
    # value-based rate
    vrate = rate_agg(ds, "ts", unit="day", rate_unit="hour", value_col="v")
    assert vrate["rate"].tolist() == [1.0, 1.0]
    with pytest.raises(ValueError, match="calendar unit"):
        rate_agg(ds, "ts", unit="fortnight")


def test_calendar_floor_true_calendar_units(ray_session):
    """month/week/year truncate to CALENDAR boundaries, not epoch-anchored
    30D/7D blocks (review finding: fixed_interval vs calendar_interval)."""
    from elasticsearch_ray.ops.analytics import calendar_floor, rate_agg

    ts = pd.Series(pd.to_datetime(
        ["2024-01-05", "2024-01-31", "2024-02-01", "2024-02-29"]))
    assert calendar_floor(ts, "month").dt.strftime("%Y-%m-%d").tolist() == \
        ["2024-01-01", "2024-01-01", "2024-02-01", "2024-02-01"]
    # week starts Monday (2024-01-05 is a Friday)
    assert calendar_floor(ts, "week").iloc[0] == pd.Timestamp("2024-01-01")
    assert calendar_floor(ts, "year").nunique() == 1
    with pytest.raises(ValueError, match="calendar unit"):
        calendar_floor(ts, "fortnight")
    # rate by month: Jan has 2 events, Feb has 2 — calendar buckets
    df = pd.DataFrame({"ts": ts})
    out = rate_agg(rd.from_pandas(df), "ts", unit="month")
    assert out["bucket"].dt.strftime("%Y-%m-%d").tolist() == \
        ["2024-01-01", "2024-02-01"]
    assert out["rate"].tolist() == [2.0, 2.0]


def test_pct_label_integer_percents():
    from elasticsearch_ray.ops.analytics import _pct_label

    assert _pct_label(50) == "p50" == _pct_label(50.0)
    assert _pct_label(99.9) == "p99.9"
    assert _pct_label(0.5) == "p0.5"


def test_normalize_bucket():
    from elasticsearch_ray.ops.analytics import normalize_bucket

    df = pd.DataFrame({"k": list("abcd"), "v": [1.0, 2.0, 3.0, 4.0]})
    np.testing.assert_allclose(
        normalize_bucket(df, "v", "rescale_0_1")["normalized"],
        [0, 1 / 3, 2 / 3, 1.0])
    np.testing.assert_allclose(
        normalize_bucket(df, "v", "percent_of_sum")["normalized"],
        [0.1, 0.2, 0.3, 0.4])
    z = normalize_bucket(df, "v", "z-score")["normalized"].to_numpy()
    assert abs(z.mean()) < 1e-12 and abs(np.std(z) - 1) < 1e-12  # population σ
    sm = normalize_bucket(df, "v", "softmax")["normalized"]
    assert abs(sm.sum() - 1.0) < 1e-12 and sm.is_monotonic_increasing
    with pytest.raises(ValueError, match="unknown normalize"):
        normalize_bucket(df, "v", "minmax")


def test_moving_percentiles(ray_session):
    from elasticsearch_ray.ops.analytics import moving_percentiles

    rng = np.random.default_rng(7)
    days = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.repeat(np.arange(6), 500), unit="D")
    v = rng.normal(np.repeat(np.arange(6) * 10.0, 500), 2.0)
    ds = rd.from_pandas(pd.DataFrame({"ts": days, "v": v})).repartition(4)
    out = moving_percentiles(ds, "ts", "v", window=3, percents=(50.0,))
    assert len(out) == 6
    for i in range(6):
        lo = max(0, i - 2)
        wvals = v[(np.repeat(np.arange(6), 500) >= lo)
                  & (np.repeat(np.arange(6), 500) <= i)]
        assert abs(out["p50"].iloc[i] - np.median(wvals)) < 1.0, i


def test_cumulative_cardinality(ray_session):
    from elasticsearch_ray.ops.analytics import cumulative_cardinality

    # user 1 appears day1+day2 (counts once, day1); user 2 day2; user 3 day3
    ts = pd.to_datetime(["2024-01-01 05:00", "2024-01-02 06:00",
                         "2024-01-02 07:00", "2024-01-03 08:00"])
    df = pd.DataFrame({"ts": ts, "uid": [1, 1, 2, 3]})
    out = cumulative_cardinality(rd.from_pandas(df).repartition(2),
                                 "ts", "uid")
    assert out["cumulative_cardinality"].tolist() == [1, 2, 3]


def test_t_cdf_known_values():
    """Student-t two-sided tails vs published table values."""
    from elasticsearch_ray.ops.analytics import t_sf2

    # t=2.228, df=10 → two-sided p = 0.05 (classic t-table row)
    assert abs(t_sf2(2.228, 10) - 0.05) < 2e-4
    # t=1.96, df→large ≈ normal: p ≈ 0.05
    assert abs(t_sf2(1.96, 10_000) - 0.05) < 5e-4
    assert t_sf2(0.0, 5) == pytest.approx(1.0)
    assert t_sf2(50.0, 5) < 1e-6


def test_t_test_types(ray_session):
    from elasticsearch_ray.ops.analytics import t_test

    rng = np.random.default_rng(4)
    a = rng.normal(10.0, 2.0, 400)
    b = a + rng.normal(0.5, 1.0, 400)  # paired shift of 0.5
    ds = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(3)
    paired = t_test(ds, "a", "b", type="paired")
    welch = t_test(ds, "a", "b", type="heteroscedastic")
    pooled = t_test(ds, "a", "b", type="homoscedastic")
    # the paired design removes the shared variance → far smaller p
    assert paired["value"] < 1e-12
    assert paired["df"] == 399
    assert 0 < welch["value"] < 1 and 0 < pooled["value"] < 1
    # same-variance data: Welch ≈ pooled
    assert abs(welch["value"] - pooled["value"]) < 1e-3
    assert abs(welch["t_stat"] - pooled["t_stat"]) < 1e-9

    # hand-check Welch t-stat against the formula
    va, vb = a.var(ddof=1), b.var(ddof=1)
    want_t = (a.mean() - b.mean()) / np.sqrt(va / 400 + vb / 400)
    assert abs(welch["t_stat"] - want_t) < 1e-9

    with pytest.raises(ValueError, match="unknown t_test type"):
        t_test(ds, "a", "b", type="z_test")
