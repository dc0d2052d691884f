"""Significance heuristics — the reference's full scoring family for
significant_terms / significant_text (`search/aggregations/bucket/terms/
heuristic/`): JLH (JLHScore.java), chi_square (ChiSquare.java:58-66),
mutual_information (MutualInformation.java:60-104, Manning IR eq. 13.17),
gnd (GND.java:66-86, Google Normalized Distance, Cilibrasi & Vitányi),
percentage (PercentageScore.java). Contingency-table construction follows
NXYSignificanceHeuristic.computeNxys (:84-123) for both
background_is_superset modes.

All scorers are vectorized over numpy count arrays — the driver scores a
small (term, fg_count, bg_count) table AFTER the distributed count
reduction, so heuristic choice never touches the data pass."""

from __future__ import annotations

import numpy as np

HEURISTICS = ("jlh", "chi_square", "mutual_information", "gnd", "percentage")


def _nxys(sf, ss, pf, ps, background_is_superset: bool):
    """Contingency frequencies (float64 arrays): class = membership in the
    subset (foreground), feature = containing the term."""
    sf = np.asarray(sf, np.float64)
    pf = np.asarray(pf, np.float64)
    ss = float(ss)
    ps = float(ps)
    if background_is_superset:
        if (sf > pf).any() or ss > ps:
            raise ValueError(
                "subset frequencies/size exceed the superset — pass "
                "background_is_superset=False for disjoint backgrounds")
        N11 = sf
        N01 = ss - sf
        N10 = pf - sf
        N00 = ps - pf - (ss - sf)
        N0_ = ps - pf
        N1_ = pf
        N_0 = ps - ss
        N_1 = np.full_like(sf, ss)
        N = ps
    else:
        N11 = sf
        N01 = ss - sf
        N10 = pf
        N00 = ps - pf
        N0_ = ps - pf + ss - sf
        N1_ = pf + sf
        N_0 = np.full_like(sf, ps)
        N_1 = np.full_like(sf, ss)
        N = ps + ss
    return N00, N01, N10, N11, N0_, N1_, N_0, N_1, N


def _mi_term(Nxy, Nx_, N_y, N):
    """0·log(0/·) = 0 guard, exactly MutualInformation.getMITerm."""
    numerator = np.abs(N * Nxy)
    denominator = np.abs(Nx_ * N_y)
    factor = np.abs(Nxy / N)
    with np.errstate(divide="ignore", invalid="ignore"):
        term = factor * np.log(numerator / denominator)
    return np.where((numerator < 1e-7) & (factor < 1e-7), 0.0, term)


def sig_score(heuristic: str, subset_freq, subset_size: int,
              superset_freq, superset_size: int,
              include_negatives: bool = True,
              background_is_superset: bool = True) -> np.ndarray:
    """Score arrays of (term-in-subset, term-in-superset) counts with the
    named heuristic. Higher = more significant in every mode (GND is
    already inverted by its exp(-score), as in the reference)."""
    if heuristic not in HEURISTICS:
        raise ValueError(f"unknown heuristic {heuristic!r}; "
                         f"known: {sorted(HEURISTICS)}")
    sf = np.asarray(subset_freq, np.float64)
    pf = np.asarray(superset_freq, np.float64)
    if heuristic == "jlh":
        # JLHScore: absolute change * relative change of the percentages
        fg_pct = sf / max(float(subset_size), 1.0)
        bg_pct = np.maximum(pf, 1.0) / max(float(superset_size), 1.0)
        return (fg_pct - bg_pct) * (fg_pct / bg_pct)
    if heuristic == "percentage":
        # PercentageScore: subsetFreq / supersetFreq (0 when unseen)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(pf > 0, sf / pf, 0.0)
    N00, N01, N10, N11, N0_, N1_, N_0, N_1, N = _nxys(
        sf, subset_size, pf, superset_size, background_is_superset)
    if heuristic == "chi_square":
        with np.errstate(divide="ignore", invalid="ignore"):
            score = (N * (N11 * N00 - N01 * N10) ** 2
                     / (N_1 * N1_ * N0_ * N_0))
        score = np.where(np.isnan(score), -np.inf, score)
    elif heuristic == "mutual_information":
        score = (_mi_term(N00, N0_, N_0, N) + _mi_term(N01, N0_, N_1, N)
                 + _mi_term(N10, N1_, N_0, N)
                 + _mi_term(N11, N1_, N_1, N)) / np.log(2.0)
        score = np.where(np.isnan(score), -np.inf, score)
    else:  # gnd
        fx, fy, fxy = N1_, N_1, N11
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = ((np.maximum(np.log(fx), np.log(fy)) - np.log(fxy))
                   / (np.log(N) - np.minimum(np.log(fx), np.log(fy))))
            score = np.exp(-raw)  # invert: GND scores relevant terms low
        score = np.where(fxy == 0, 0.0, score)
        score = np.where((fx == fy) & (fx == fxy), 1.0, score)
        return score
    if not include_negatives:
        with np.errstate(divide="ignore", invalid="ignore"):
            under = (N11 / N_1) < (N10 / N_0)
        score = np.where(under, -np.inf, score)
    return score
