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
