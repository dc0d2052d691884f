"""change_point pipeline agg (x-pack ML ChangePointAggregator): decision
cascade, type classification, change-point localization, bucket
mapping."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.ops.changepoint import (change_point,
                                               change_point_agg,
                                               outlier_weights)


def test_step_change_localized():
    rng = np.random.default_rng(7)
    v = rng.normal(10, 1, 100)
    v[60:] += 15
    r = change_point(v)
    assert r["type"] == "step_change"
    assert r["change_point"] == 60
    assert r["p_value"] < 1e-20


def test_stationary_on_flat_noise():
    # note: like the reference, the KDE fallback CAN flag an isolated
    # extreme in pure noise as spike/dip (time-positional exclusion
    # windows around the extremes); this seed has no isolated extreme
    rng = np.random.default_rng(0)
    r = change_point(rng.normal(5, 1, 100))
    assert r["type"] == "stationary"
    assert r["change_point"] is None


def test_constant_series_is_stationary():
    r = change_point(np.full(30, 2.0))
    assert r["type"] == "stationary" and r["p_value"] == 1.0


def test_non_stationary_trend_directions():
    rng = np.random.default_rng(7)
    n = 100
    up = change_point(np.arange(n) * 0.5 + rng.normal(0, 1, n))
    assert up["type"] == "non_stationary" and up["trend"] == "increasing"
    assert up["r_value"] > 0.9
    down = change_point(-np.arange(n) * 0.5 + rng.normal(0, 1, n))
    assert down["type"] == "non_stationary" and down["trend"] == "decreasing"


def test_trend_change():
    rng = np.random.default_rng(7)
    v = np.concatenate([np.full(50, 3.0), 3 + np.arange(50) * 1.0])
    v += rng.normal(0, 0.5, 100)
    r = change_point(v)
    assert r["type"] == "trend_change"
    assert 45 <= r["change_point"] <= 55


def test_spike_and_dip_localized():
    rng = np.random.default_rng(7)
    v = rng.normal(5, 1, 100)
    v[42] = 30
    r = change_point(v)
    assert r["type"] == "spike" and r["change_point"] == 42

    rng = np.random.default_rng(3)
    v = rng.normal(5, 1, 100)
    v[17] = -3
    r = change_point(v)
    assert r["type"] == "dip" and r["change_point"] == 17


def test_distribution_change_detected_with_trials_correction():
    rng = np.random.default_rng(7)
    # variance 1 -> 12: survives the independent-trials correction;
    # a mild 1 -> 6 change must NOT (the correction is part of the
    # reference contract, not a bug)
    v = np.concatenate([rng.normal(0, 1, 100), rng.normal(0, 12, 100)])
    r = change_point(v)
    assert r["type"] == "distribution_change"
    assert 80 <= r["change_point"] <= 120
    rng = np.random.default_rng(7)
    mild = np.concatenate([rng.normal(0, 1, 50), rng.normal(0, 6, 50)])
    assert change_point(mild)["type"] == "stationary"


def test_step_robust_to_outlier():
    # outlierWeights (0.01 outside the 2.5%..97.5% band) keeps a single
    # wild value from hijacking the variance scan
    rng = np.random.default_rng(1)
    v = rng.normal(10, 1, 120)
    v[80:] += 12
    v[10] = 100.0  # ~90 sigma; unweighted it would drown the F-test
    r = change_point(v)
    assert r["type"] == "step_change" and r["change_point"] == 80


def test_outlier_weights_band():
    v = np.arange(100, dtype=float)
    w = outlier_weights(v)
    assert w[0] == 0.01 and w[-1] == 0.01 and w[50] == 1.0


def test_too_few_buckets_raises():
    with pytest.raises(ValueError):
        change_point(np.arange(21, dtype=float))


def test_agg_maps_bucket_key():
    rng = np.random.default_rng(7)
    ts = pd.date_range("2024-01-01", periods=100, freq="h")
    v = rng.normal(10, 1, 100)
    v[70:] += 20
    # shuffled frame input: the agg must sort by key first
    df = pd.DataFrame({"hb": ts, "c": v}).sample(frac=1, random_state=0)
    r = change_point_agg(df, "hb", "c")
    assert r["type"] == "step_change"
    assert r["bucket"] == ts[70]
