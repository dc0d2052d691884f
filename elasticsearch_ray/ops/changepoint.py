"""``change_point`` sibling pipeline aggregation (x-pack ML:
``aggs/changepoint/ChangePointAggregator.java``, ``KDE.java``,
``LeastSquaresOnlineRegression.java``, ``ChangeType.java``).

Detects a single change in a metric series produced by a histogram
aggregation and classifies it, following the reference's decision
cascade exactly (same tests, same thresholds, same ordering):

1. ``stationary`` when the (weighted) variance is zero or nothing
   below beats the null;
2. ``non_stationary`` (trend "increasing"/"decreasing") when a
   weighted quadratic fit explains the series (F-test vs the null,
   |r| >= 0.5);
3. ``step_change`` — argmin over candidate split points of the pooled
   weighted variance, F-tested against the current null with the
   independent-trials correction;
4. ``trend_change`` — per-side weighted quadratic fits, lexicographic
   (variance, r) argmin, F-tested likewise;
5. ``distribution_change`` — mean/std-difference scan + two-sample KS
   test over every discovered candidate, accepted only when its
   corrected p-value < min(threshold, 0.1 * current p);
6. ``spike`` / ``dip`` fallback (``maxDeviationKdePValue``) when the
   cascade's best p-value stays above the threshold: a KDE (max-
   likelihood cross-validated bandwidth) over the series with windows
   around the extremes excluded scores cdf(min) vs sf(max).

All statistics are weighted MEANS as in the reference's
``RunningStats`` / ``RunningStatistics`` (population variance,
weight-normalized); outliers get weight 0.01 (``outlierWeights``).

Deliberate deviations (documented, pinned by pytest rather than
bit-parity with commons-math): the KDE bandwidth cross-validation
split is deterministic (first ``min(block/2, 4)`` indices of each
block train — the reference shuffles each block); the two-sample KS
p-value uses the asymptotic Kolmogorov distribution with the
Stephens small-sample correction instead of commons-math's exact
small-n enumeration.

The aggregation itself runs on the driver over the (small) bucket
series — the distributed work is the histogram that produces it,
exactly like the reference's SiblingPipelineAggregator reduce phase.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .analytics import _betainc_reg

P_VALUE_THRESHOLD = 0.025
MINIMUM_BUCKETS = 10
MAX_CANDIDATES = 1000


# ---------------------------------------------------------------- helpers

def _f_sf(df_num: float, df_den: float, x: float) -> float:
    """F-distribution survival function (ChangePointAggregator.fDistribSf)."""
    if x <= 0:
        return 1.0
    if math.isinf(x) or math.isnan(x):
        return 0.0
    return _betainc_reg(0.5 * df_den, 0.5 * df_num,
                        df_den / (df_den + df_num * x))


def _f_test_pvalue(v_null: float, df_null: float,
                   v_alt: float, df_alt: float) -> float:
    if v_alt == v_null:
        return 1.0
    if v_alt == 0.0:
        return 0.0
    f = df_alt / df_null * v_null / v_alt
    return min(2.0 * _f_sf(df_null, df_alt, f), 1.0)


def _independent_trials(p: float, n_trials: int) -> float:
    if p > 1e-10:
        return 1.0 - (1.0 - p) ** n_trials
    return n_trials * p


def outlier_weights(values: np.ndarray) -> np.ndarray:
    """Weight 1.0 inside the [2.5%, 97.5%) order-statistic band, 0.01
    outside (ChangePointAggregator.outlierWeights)."""
    n = len(values)
    i = int(math.ceil(0.025 * n))
    s = np.sort(values)
    a, b = s[i], s[min(n - i, n - 1)]
    return np.where((values >= a) & (values < b), 1.0, 0.01)


def _candidates(n: int) -> tuple[np.ndarray, int]:
    min_values = max(int(0.1 * n + 0.5), MINIMUM_BUCKETS)
    lo, hi = min_values, n - min_values
    if hi - lo <= MAX_CANDIDATES:
        return np.arange(lo, hi), 1
    step = int(math.ceil((hi - lo) / MAX_CANDIDATES))
    c = np.arange(lo, hi)
    return c[c % step == 0], step


def _weighted_var(v: np.ndarray, w: np.ndarray) -> float:
    cw = w.sum()
    if cw <= 0:
        return 0.0
    m = (w * v).sum() / cw
    return max(float((w * v * v).sum() / cw - m * m), 0.0)


def _seg_moments(ps: dict, s: int, e: int) -> tuple:
    """Weighted-mean moments of segment [s, e) with x re-origined and
    scaled to (x - s) / n — r-squared is shift/scale invariant, and the
    normal equations stay well conditioned."""
    W = ps["w"][e] - ps["w"][s]
    out = {}
    for k in ("x0", "x1", "x2", "x3", "x4", "y0", "y1", "y2", "yy"):
        out[k] = (ps[k][e] - ps[k][s]) / W if W > 0 else 0.0
    return W, out


def _quad_r2_from(m: dict, c: float, scale: float) -> float:
    """r² of the weighted quadratic fit given RAW weighted-mean moments
    ``m`` (keys x1..x4 = E[x^k], y0..y2 = E[x^k y], yy = E[y²]) after
    translating x by ``c`` and scaling by ``scale``."""
    # shifted/scaled moments u = (x - c) * scale
    x1, x2, x3, x4 = m["x1"], m["x2"], m["x3"], m["x4"]
    u1 = (x1 - c) * scale
    u2 = (x2 - 2 * c * x1 + c * c) * scale ** 2
    u3 = (x3 - 3 * c * x2 + 3 * c * c * x1 - c ** 3) * scale ** 3
    u4 = (x4 - 4 * c * x3 + 6 * c * c * x2 - 4 * c ** 3 * x1
          + c ** 4) * scale ** 4
    y0, y1, y2 = m["y0"], m["y1"], m["y2"]
    b0 = y0
    b1 = (y1 - c * y0) * scale
    b2 = (y2 - 2 * c * y1 + c * c * y0) * scale ** 2
    var = m["yy"] - y0 * y0
    if var <= 0:
        return 0.0
    X = np.array([[1.0, u1, u2], [u1, u2, u3], [u2, u3, u4]])
    yv = np.array([b0, b1, b2])
    zv = np.array([1.0, u1, u2])
    try:
        sv = np.linalg.svd(X, compute_uv=False)
        if sv[-1] <= 0 or sv[0] > 1e15 * sv[-1]:
            return 0.0
        r = np.linalg.solve(X, yv)
    except np.linalg.LinAlgError:
        return 0.0
    t = y0 - zv @ r
    resid = (m["yy"] - yv @ r) - t * t
    return float(min(max(1.0 - resid / var, 0.0), 1.0))


def _prefix_sums(v: np.ndarray, w: np.ndarray) -> dict:
    n = len(v)
    x = np.arange(n, dtype=np.float64)
    ps = {"w": w}
    cols = {
        "x0": w, "x1": w * x, "x2": w * x ** 2, "x3": w * x ** 3,
        "x4": w * x ** 4, "y0": w * v, "y1": w * x * v,
        "y2": w * x ** 2 * v, "yy": w * v * v,
    }
    out = {}
    for k, c in cols.items():
        out[k] = np.concatenate(([0.0], np.cumsum(c)))
    out["w"] = np.concatenate(([0.0], np.cumsum(w)))
    return out


def _ks_2samp_pvalue(a: np.ndarray, b: np.ndarray) -> float:
    """Asymptotic two-sample Kolmogorov-Smirnov p-value (Kolmogorov
    distribution with the Stephens correction)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 1.0
    av, bv = np.sort(a), np.sort(b)
    allv = np.unique(np.concatenate([av, bv]))
    f1 = np.searchsorted(av, allv, side="right") / n
    f2 = np.searchsorted(bv, allv, side="right") / m
    d = float(np.max(np.abs(f1 - f2)))
    en = math.sqrt(n * m / (n + m))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-12:
            break
    return float(min(max(s, 0.0), 1.0))


# ---------------------------------------------------------------- KDE

class _KDE:
    """Gaussian KDE with max-likelihood cross-validated bandwidth
    (reference KDE.java; deterministic split, see module docstring)."""

    def __init__(self, values: np.ndarray, min_idx: int, max_idx: int):
        n = len(values)
        excluded = int(0.025 * n + 0.5)
        keep = np.ones(n, dtype=bool)
        keep[max(min_idx - excluded, 0):min_idx + excluded + 1] = False
        keep[max(max_idx - excluded, 0):max_idx + excluded + 1] = False
        ov = np.sort(values[keep])
        self.values = ov
        if len(ov) > 1 and float(np.var(ov, ddof=1)) > 0:
            self.bandwidth = self._ml_bandwidth(ov)
        else:
            self.bandwidth = 0.01 * (values[max_idx] - values[min_idx])

    @staticmethod
    def _ml_bandwidth(ov: np.ndarray) -> float:
        n = len(ov)
        step = max(int(n / 10.0 + 0.5), 2)
        train, test = [], []
        # the reference shuffles each block (Randomness.shuffle); a fixed
        # seed keeps the same statistics while staying deterministic
        rng = np.random.default_rng(n)
        for i in range(0, n, step):
            blk = rng.permutation(np.arange(i, min(i + step, n)))
            k = min(len(blk) // 2, 4)
            train += blk[:k].tolist()
            test += blk[k:].tolist()
        x_train = ov[np.asarray(train, dtype=int)] if train else ov
        x_test = ov[np.asarray(test, dtype=int)] if test else ov
        best_ll, best_bw = -np.inf, 0.0
        span = ov[-1] - ov[0]
        for i in range(20):
            bw = 0.02 * (i + 1) * span
            if bw <= 0:
                continue
            z = (x_test[:, None] - x_train[None, :]) / bw
            logpdf = -0.5 * z * z - math.log(bw)
            mx = logpdf.max(axis=1)
            ll = float((np.log(np.exp(logpdf - mx[:, None]).sum(axis=1))
                        + mx).sum())
            if ll >= best_ll:
                best_ll, best_bw = ll, bw
        return best_bw

    def cdf(self, x: float) -> tuple[float, float]:
        ov, bw = self.values, self.bandwidth
        if len(ov) == 0:
            return 0.0, np.inf
        if bw <= 0:
            return float(np.mean(ov <= x)), float(np.min(np.abs(ov - x)))
        a = np.searchsorted(ov, x - 4 * bw)
        b = np.searchsorted(ov, x + 4 * bw)
        b = min(max(b, a + 1), len(ov))
        seg = ov[a:b]
        if len(seg) == 0:
            return 0.0, np.inf
        z = (x - seg) / (bw * math.sqrt(2))
        cdfs = 0.5 * (1.0 + np.vectorize(math.erf)(z))
        return float(cdfs.sum() / len(ov)), float(np.min(np.abs(seg - x)))

    def sf(self, x: float) -> tuple[float, float]:
        ov, bw = self.values, self.bandwidth
        if len(ov) == 0:
            return 0.0, np.inf
        if bw <= 0:
            return float(np.mean(ov >= x)), float(np.min(np.abs(ov - x)))
        a = np.searchsorted(ov, x - 4 * bw)
        b = np.searchsorted(ov, x + 4 * bw)
        a = max(min(a, b - 1), 0)
        seg = ov[a:b]
        if len(seg) == 0:
            return 0.0, np.inf
        z = (x - seg) / (bw * math.sqrt(2))
        sfs = 0.5 * np.vectorize(math.erfc)(z)
        return float(sfs.sum() / len(ov)), float(np.min(np.abs(seg - x)))


def _significance(p: float, n_tested: int) -> float:
    """KDE ValueAndMagnitude.significance — the same independent-trials
    correction as the cascade path."""
    return _independent_trials(p, n_tested)


def _spike_or_dip(values: np.ndarray, threshold: float) -> dict:
    if _weighted_var(values, np.ones(len(values))) == 0.0:
        return {"type": "stationary", "p_value": 1.0, "change_point": None}
    min_idx = int(np.argmin(values))
    # reference keeps the LAST index attaining the max
    maxv = values.max()
    max_idx = int(np.nonzero(values == maxv)[0][-1])
    kde = _KDE(values, min_idx, max_idx)
    cdf_v, cdf_mag = kde.cdf(float(values[min_idx]))
    sf_v, sf_mag = kde.sf(maxv)
    n = len(values)
    sig_cdf = _significance(cdf_v, n)
    sig_sf = _significance(sf_v, n)
    cdf_wins = (sig_cdf, -cdf_mag) < (sig_sf, -sf_mag)
    if cdf_wins and sig_cdf * 2 < threshold:
        return {"type": "dip", "p_value": sig_cdf * 2, "change_point": min_idx}
    if sig_sf * 2 < threshold:
        return {"type": "spike", "p_value": sig_sf * 2,
                "change_point": max_idx}
    return {"type": "stationary", "p_value": 1.0, "change_point": None}


# ---------------------------------------------------------------- cascade

def change_point(values, p_value_threshold: float = P_VALUE_THRESHOLD
                 ) -> dict:
    """Detect and classify a change in ``values`` (the bucket metric
    series). Returns ``{"type", "p_value", "change_point", ...}`` with
    ``r_value``/``trend`` for the regression types, matching the
    reference's ChangeType fields."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n < 2 * MINIMUM_BUCKETS + 2:
        raise ValueError(
            f"not enough buckets to calculate change_point; requires at "
            f"least [{2 * MINIMUM_BUCKETS + 2}], got [{n}]")
    cands, _step = _candidates(n)
    result = _change_p_value(v, cands, p_value_threshold)
    if result["p_value"] > p_value_threshold:
        result = _spike_or_dip(v, p_value_threshold)
    return result


def _change_p_value(v: np.ndarray, cands: np.ndarray,
                    threshold: float) -> dict:
    n = len(v)
    result = {"type": "stationary", "p_value": 1.0, "change_point": None}
    if _weighted_var(v, np.ones(n)) == 0.0:
        return result
    w = outlier_weights(v)
    total_var = _weighted_var(v, w)
    if total_var == 0.0:
        return result
    v_null, df_null = total_var, n - 1
    ps = _prefix_sums(v, w)

    # --- whole-series quadratic trend (non_stationary)
    _, m_all = _seg_moments(ps, 0, n)
    r_all = _quad_r2_from(m_all, 0.0, 1.0 / n)
    v_alt = total_var * (1 - abs(r_all))
    df_alt = n - 3
    p_vs_null = _f_test_pvalue(v_null, df_null, v_alt, df_alt)
    if p_vs_null < threshold and abs(r_all) >= 0.5:
        p_vs_stat = _f_test_pvalue(total_var, n - 1, v_alt, df_alt)
        x = np.arange(n, dtype=np.float64)
        slope = float(np.polyfit(x, v, 1)[0])  # unweighted SimpleRegression
        result = {"type": "non_stationary", "p_value": p_vs_stat,
                  "r_value": r_all,
                  "trend": "decreasing" if slope < 0 else "increasing",
                  "change_point": None}
        v_null, df_null = v_alt, df_alt

    m = len(cands)
    cw = ps["w"][cands]
    cwx = ps["y0"][cands]
    cwx2 = ps["yy"][cands]
    tw, twx, twx2 = ps["w"][n], ps["y0"][n], ps["yy"][n]

    def seg_var(sw, sx, sx2):
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = np.where(sw > 0, sx / sw, 0.0)
            return np.maximum(np.where(sw > 0, sx2 / sw - mu * mu, 0.0), 0.0)

    var_lo = seg_var(cw, cwx, cwx2)
    var_hi = seg_var(tw - cw, twx - cwx, twx2 - cwx2)

    discovered = set()

    # --- step change: argmin pooled weighted variance (strict <, first)
    pooled = (cands * var_lo + (n - cands) * var_hi) / n
    best = int(np.argmin(pooled))
    v_step, cp_step = float(pooled[best]), int(cands[best])
    discovered.add(cp_step)
    df_alt = n - 2
    p = _independent_trials(
        _f_test_pvalue(v_null, df_null, v_step, df_alt), m)
    if p < threshold:
        result = {"type": "step_change", "p_value": p,
                  "change_point": cp_step}
        v_null, df_null = v_step, df_alt

    # --- trend change: per-side quadratic fits, (variance, r) lexi-min
    best_v, best_r, cp_trend = np.inf, np.inf, int(cands[-1]) + 1
    for cp in cands:
        cp = int(cp)
        _, m_lo = _seg_moments(ps, 0, cp)
        _, m_hi = _seg_moments(ps, cp, n)
        r1 = _quad_r2_from(m_lo, 0.0, 1.0 / n)
        r2 = _quad_r2_from(m_hi, 0.0, 1.0 / n)
        v1 = seg_var(np.array([ps["w"][cp]]), np.array([ps["y0"][cp]]),
                     np.array([ps["yy"][cp]]))[0] * (1 - abs(r1))
        v2 = seg_var(np.array([tw - ps["w"][cp]]),
                     np.array([twx - ps["y0"][cp]]),
                     np.array([twx2 - ps["yy"][cp]]))[0] * (1 - abs(r2))
        vv = (cp * v1 + (n - cp) * v2) / n
        rr = (cp * r1 + (n - cp) * r2) / n
        if (vv, rr) < (best_v, best_r):
            best_v, best_r, cp_trend = vv, rr, cp
    discovered.add(cp_trend)
    df_alt = n - 6
    p = _independent_trials(
        _f_test_pvalue(v_null, df_null, best_v, df_alt), m)
    if p < threshold and abs(best_r) >= 0.5:
        p_vs_stat = _independent_trials(
            _f_test_pvalue(total_var, n - 1, best_v, df_alt), m)
        result = {"type": "trend_change", "p_value": p_vs_stat,
                  "r_value": best_r, "change_point": cp_trend}

    # --- distribution change
    if result["p_value"] > 1e-5:
        mu_lo = np.where(cw > 0, cwx / cw, 0.0)
        mu_hi = np.where(tw - cw > 0, (twx - cwx) / (tw - cw), 0.0)
        sd_lo, sd_hi = np.sqrt(var_lo), np.sqrt(var_hi)
        diff = (np.minimum(cands, n - cands)
                * (0.9 * np.abs(mu_lo - mu_hi))
                + 0.1 * np.abs(sd_lo - sd_hi))
        # reference keeps the LAST candidate attaining the max (>=)
        best = int(np.nonzero(diff >= diff.max())[0][-1])
        discovered.add(int(cands[best]))
        p_best, cp_dist = 1.0, int(cands[best])
        for cp in discovered:
            pk = _ks_2samp_pvalue(v[:cp], v[cp:])
            if pk < p_best:
                p_best, cp_dist = pk, cp
        p_best = _independent_trials(p_best, m)
        if p_best < min(threshold, 0.1 * result["p_value"]):
            result = {"type": "distribution_change", "p_value": p_best,
                      "change_point": cp_dist}
    return result


# ---------------------------------------------------------------- agg

def change_point_agg(buckets: pd.DataFrame, key_col: str, value_col: str,
                     p_value_threshold: float = P_VALUE_THRESHOLD) -> dict:
    """Run change-point detection over an already-reduced histogram
    frame (sorted by ``key_col``). Returns the ChangeType dict plus
    ``bucket`` = the key at the detected change point (None for
    stationary/trend-only results), mirroring
    InternalChangePointAggregation's bucket + type payload."""
    b = buckets.sort_values(key_col, ignore_index=True)
    res = change_point(b[value_col].to_numpy(dtype=np.float64),
                       p_value_threshold)
    cp = res.get("change_point")
    res["bucket"] = None if cp is None else b[key_col].iloc[int(cp)]
    return res
