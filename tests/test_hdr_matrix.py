"""HDR percentiles (InternalHDRPercentiles analog) and matrix_stats
(aggs-matrix-stats module analog): error bounds, merge associativity,
batch-boundary independence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_hdr_error_bound_vs_exact():
    from elasticsearch_ray.ops.hdr import HdrHistogram

    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.lognormal(3, 2, 5000), [0.0, 0.0]])
    h = HdrHistogram(significant_digits=3).add(vals)
    assert h.total == len(vals)
    s = np.sort(vals)
    for p in (1, 25, 50, 75, 95, 99, 99.9):
        rank = max(1, int(np.ceil(p / 100.0 * len(s))))
        exact = s[rank - 1]
        got = h.value_at_percentile(p)
        if exact == 0:
            assert got == 0
        else:
            # fixed significant digits: relative error <= 10^(1-sd)/2
            assert abs(got - exact) / exact <= 0.5 * 10 ** (1 - 3) + 1e-12, p


def test_hdr_merge_associativity_and_serde():
    from elasticsearch_ray.ops.hdr import HdrHistogram

    rng = np.random.default_rng(4)
    vals = rng.exponential(50, 3000)
    chunks = np.array_split(vals, 7)

    def build(order):
        h = HdrHistogram(3)
        for i in order:
            h.merge(HdrHistogram(3).add(chunks[i]))
        return h

    a = build(range(7))
    b = build(reversed(range(7)))
    # nested grouping: ((0+1)+(2+3)) + rest
    c = HdrHistogram(3).add(chunks[0]).merge(HdrHistogram(3).add(chunks[1]))
    d = HdrHistogram(3).add(chunks[2]).merge(HdrHistogram(3).add(chunks[3]))
    e = c.merge(d)
    for i in (4, 5, 6):
        e.merge(HdrHistogram(3).add(chunks[i]))
    assert a._counts == b._counts == e._counts
    rt = HdrHistogram.from_bytes(a.to_bytes())
    assert rt._counts == a._counts and rt.sd == a.sd
    for p in (50, 95, 99):
        assert a.value_at_percentile(p) == rt.value_at_percentile(p)


def test_hdr_validation():
    from elasticsearch_ray.ops.hdr import HdrHistogram

    with pytest.raises(ValueError, match="negative"):
        HdrHistogram(3).add(np.array([1.0, -2.0]))
    with pytest.raises(ValueError, match="significant_digits"):
        HdrHistogram(0)
    with pytest.raises(ValueError, match="different"):
        HdrHistogram(2).merge(HdrHistogram(3))
    assert np.isnan(HdrHistogram(3).value_at_percentile(50))


def test_percentiles_hdr_agg(ray_session):
    from elasticsearch_ray.ops.aggs import percentiles_hdr

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 2000),
                       "v": np.abs(rng.normal(100, 30, 4000))})
    out = percentiles_hdr(rd.from_pandas(df), "g", "v", percents=(50.0, 95.0))
    assert out["g"].tolist() == ["a", "b"]
    for g in ("a", "b"):
        sub = np.sort(df[df["g"] == g]["v"].to_numpy())
        got = float(out[out["g"] == g]["p50"].iloc[0])
        exact = sub[int(np.ceil(0.5 * len(sub))) - 1]
        assert abs(got - exact) / exact < 0.01


def test_percentile_ranks_hdr(ray_session):
    from elasticsearch_ray.ops.aggs import percentile_ranks_hdr

    rng = np.random.default_rng(6)
    vals = rng.lognormal(2, 1, 4000)
    df = pd.DataFrame({"v": vals})
    probes = [float(np.percentile(vals, p)) for p in (25, 50, 90)]
    out = percentile_ranks_hdr(rd.from_pandas(df).repartition(5), "v", probes)
    for probe, got, want in zip(probes, out["rank"], (25, 50, 90)):
        # bucket granularity can shift values within 0.05% of the probe
        exact = 100.0 * float((vals <= probe).sum()) / len(vals)
        assert abs(got - exact) < 1.0, (probe, got, exact)
        assert abs(got - want) < 1.5


def test_matrix_stats_exact_and_batch_independent(ray_session):
    from elasticsearch_ray.ops.matrix_stats import matrix_stats

    rng = np.random.default_rng(5)
    x = rng.normal(10, 3, 4000)
    y = 0.5 * x + rng.normal(0, 1, 4000)
    df = pd.DataFrame({"x": x, "y": y})
    res1 = matrix_stats(rd.from_pandas(df), ["x", "y"])
    # different batch boundaries → identical results (exact merge)
    res2 = matrix_stats(
        rd.from_pandas(df).repartition(13), ["x", "y"])
    for col in ("mean", "variance", "skewness", "kurtosis"):
        np.testing.assert_allclose(res1["fields"][col], res2["fields"][col],
                                   rtol=1e-9)
    np.testing.assert_allclose(res1["pairs"]["covariance"],
                               res2["pairs"]["covariance"], rtol=1e-9)

    f = res1["fields"].set_index("field")
    assert res1["doc_count"] == 4000
    np.testing.assert_allclose(f.loc["x", "mean"], x.mean(), rtol=1e-12)
    np.testing.assert_allclose(f.loc["x", "variance"], x.var(ddof=1), rtol=1e-9)
    # skewness/kurtosis vs the direct formulas the reference uses
    d = x - x.mean()
    np.testing.assert_allclose(
        f.loc["x", "skewness"],
        np.sqrt(len(x)) * (d ** 3).sum() / (d ** 2).sum() ** 1.5, rtol=1e-9)
    np.testing.assert_allclose(
        f.loc["x", "kurtosis"],
        len(x) * (d ** 4).sum() / (d ** 2).sum() ** 2, rtol=1e-9)
    p = res1["pairs"].set_index(["field_a", "field_b"])
    np.testing.assert_allclose(p.loc[("x", "y"), "covariance"],
                               np.cov(x, y, ddof=1)[0, 1], rtol=1e-9)
    np.testing.assert_allclose(p.loc[("x", "y"), "correlation"],
                               np.corrcoef(x, y)[0, 1], rtol=1e-9)
    assert p.loc[("x", "x"), "correlation"] == 1.0


def test_significance_heuristic_family():
    """The reference's heuristic formulas on hand-built contingency
    tables (ChiSquare.java:58-66, MutualInformation.java:60-104, GND.java
    :66-86, PercentageScore, NXYSignificanceHeuristic.computeNxys)."""
    from elasticsearch_ray.ops.sig_heuristics import sig_score

    # subset: 100 docs, term in 30; superset: 1000 docs, term in 60
    sf, ss, pf, ps = np.array([30.0]), 100, np.array([60.0]), 1000
    # computeNxys (background_is_superset): N11=30 N01=70 N10=30 N00=870
    # N0_=940 N1_=60 N_0=900 N_1=100 N=1000
    chi = sig_score("chi_square", sf, ss, pf, ps)[0]
    want_chi = 1000 * (30 * 870 - 70 * 30) ** 2 / (100 * 60 * 940 * 900)
    assert abs(chi - want_chi) < 1e-9
    mi = sig_score("mutual_information", sf, ss, pf, ps)[0]

    def mit(nxy, nx_, n_y, n):
        return 0.0 if nxy == 0 else (nxy / n) * np.log(n * nxy / (nx_ * n_y))
    want_mi = (mit(870, 940, 900, 1000) + mit(70, 940, 100, 1000)
               + mit(30, 60, 900, 1000) + mit(30, 60, 100, 1000)) / np.log(2)
    assert abs(mi - want_mi) < 1e-9
    gnd = sig_score("gnd", sf, ss, pf, ps)[0]
    want_raw = (max(np.log(60), np.log(100)) - np.log(30)) / \
        (np.log(1000) - min(np.log(60), np.log(100)))
    assert abs(gnd - np.exp(-want_raw)) < 1e-12
    pct = sig_score("percentage", sf, ss, pf, ps)[0]
    assert pct == 0.5
    # GND edge cases: no co-occurrence -> 0; perfect co-occurrence -> 1
    assert sig_score("gnd", [0.0], ss, [60.0], ps)[0] == 0.0
    assert sig_score("gnd", [50.0], 50, [50.0], ps)[0] == 1.0
    # include_negatives=False: under-represented terms -> -inf
    under = sig_score("chi_square", [1.0], 100, [500.0], 1000,
                      include_negatives=False)[0]
    assert under == -np.inf
    with pytest.raises(ValueError, match="unknown heuristic"):
        sig_score("tf_idf", sf, ss, pf, ps)
    with pytest.raises(ValueError, match="superset"):
        sig_score("chi_square", [10.0], 5, [3.0], 1000)


def test_significant_terms_heuristics_rank_planted(ray_session):
    """Every heuristic ranks the planted foreground-heavy term top on a
    real two-Dataset reduce, and jlh output is unchanged vs the
    established path (same oracle-checked rounding)."""
    import ray.data as rd

    from elasticsearch_ray.ops.aggs import significant_terms_agg

    rng = np.random.default_rng(8)
    bg_terms = rng.choice(["apple", "pear", "plum", "kiwi"], 2000).tolist()
    fg_terms = ["special"] * 60 + rng.choice(["apple", "pear"], 40).tolist()
    bg = rd.from_pandas(pd.DataFrame({"t": bg_terms + fg_terms}))
    fg = rd.from_pandas(pd.DataFrame({"t": fg_terms}))
    for h in ("jlh", "chi_square", "mutual_information", "gnd", "percentage"):
        out = significant_terms_agg(fg, bg, "t", heuristic=h)
        assert out["t"].iloc[0] == "special", h


def test_matrix_stats_skips_nan_rows(ray_session):
    from elasticsearch_ray.ops.matrix_stats import matrix_stats

    df = pd.DataFrame({"x": [1.0, 2.0, np.nan, 4.0],
                       "y": [2.0, 4.0, 6.0, 8.0]})
    res = matrix_stats(rd.from_pandas(df), ["x", "y"])
    assert res["doc_count"] == 3  # listwise deletion
    f = res["fields"].set_index("field")
    np.testing.assert_allclose(f.loc["x", "mean"], np.mean([1, 2, 4]))
