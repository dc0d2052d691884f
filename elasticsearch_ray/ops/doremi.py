"""DoReMi domain reweighting (Xie et al., NeurIPS 2023,
arXiv:2305.10429 "DoReMi: Optimizing Data Mixtures Speeds Up Language
Model Pretraining").

The published recipe trains a small PROXY model under Group DRO against
a pretrained REFERENCE model: at each step the domain weights take an
exponentiated-gradient update from the per-domain EXCESS loss
``max(loss_proxy - loss_ref, 0)``, are normalized, and smoothed with the
uniform distribution (Algorithm 1); the averaged weights become the
mixture for the real training run.

This engine's instantiation replaces the neural proxy/reference pair
with the two LMs the corpus already supports end-to-end in SQL:

- reference = the interpolated bigram LM (``fit_bigram_lm`` — the
  stronger model),
- proxy = the add-one unigram LM (``fit_unigram_lm`` — the weaker model
  standing in for the under-trained proxy),

so the per-domain excess loss ``max(nll_proxy - nll_ref, 0)`` measures
how much headroom a domain leaves a better model — DoReMi's "domains the
proxy has most to learn from" signal. Because the excess is computed
once (the proxy is not re-trained between steps), the T-step EG
recursion from uniform collapses in closed form to a SINGLE step

    w_d ∝ exp(eta · excess_d),      alpha = (1 - c) · w + c · uniform

which is what :func:`doremi_domain_weights` returns (use ``eta`` to
stand in for ``T·eta_step``).

Scale shape: the LM fits are the vocabulary-bounded shuffles of
``fit_unigram_lm`` / ``fit_bigram_lm``; scoring is one broadcast-model
``map_batches`` pass; the per-domain reduction is a tiny
(domain, sum, count) partial combine on the driver (domains are
low-cardinality). Resampling reuses the deterministic Knuth-hash
inclusion rule of :func:`~elasticsearch_ray.ops.llm_prep.stratified_sample`,
so the selected ids are layout-independent and exactly SQL-expressible.

Per-doc NLLs are rounded to 4 decimals on BOTH the Ray and SQL sides
before the domain means (the repo's oracle-float discipline) so the
domain statistics are sums of identical representable values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .llm_prep import stratified_sample
from .textstats import add_bigram_nll, add_nll, fit_bigram_lm


def doremi_domain_weights(ds: Dataset, domain_col: str,
                          text_col: str = "text", eta: float = 1.0,
                          smoothing: float = 0.1) -> pd.DataFrame:
    """Per-domain DoReMi weights. Returns one row per domain:
    ``(domain, n_docs, nll_proxy, nll_ref, excess, alpha)`` sorted by
    domain. ``n_docs`` counts EVERY row of the domain (the resample
    applies to all of them); the NLL means are over scoreable docs
    (at least one whitespace token). ``smoothing`` is the paper's
    uniform-mixing constant ``c``."""
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError("smoothing must be in [0, 1]")
    if eta < 0:
        raise ValueError("eta must be >= 0")
    lm2 = fit_bigram_lm(ds, text_col=text_col)  # includes the unigram fit
    scored = add_bigram_nll(
        add_nll(ds, lm2["uni"], text_col=text_col, out_col="_nll1"),
        lm2, text_col=text_col, out_col="_nll2")

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "domain": batch[domain_col].to_pandas().astype(str),
            "n1": np.round(batch["_nll1"].to_numpy(zero_copy_only=False),
                           4),
            "n2": np.round(batch["_nll2"].to_numpy(zero_copy_only=False),
                           4),
        })
        g = df.groupby("domain", sort=False)
        out = g.agg(n=("n1", "size"), s1=("n1", "sum"), s2=("n2", "sum"),
                    k=("n1", "count"))  # count skips NaN (empty docs)
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    parts = scored.map_batches(part, batch_format="pyarrow").to_pandas()
    dom = parts.groupby("domain", as_index=False).agg(
        n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"), k=("k", "sum"))
    dom = dom.sort_values("domain", ignore_index=True)
    k = dom["k"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        m1 = np.where(k > 0, dom["s1"].to_numpy() / k, 0.0)
        m2 = np.where(k > 0, dom["s2"].to_numpy() / k, 0.0)
    excess = np.maximum(m1 - m2, 0.0)
    w = np.exp(eta * excess)
    w = w / w.sum()
    alpha = (1.0 - smoothing) * w + smoothing / len(w)
    return pd.DataFrame({"domain": dom["domain"],
                         "n_docs": dom["n"].astype(np.int64),
                         "nll_proxy": m1, "nll_ref": m2,
                         "excess": excess, "alpha": alpha})


def doremi_rates(stats: pd.DataFrame,
                 target_fraction: float = 0.5) -> dict:
    """Convert DoReMi ``alpha`` weights into per-domain inclusion rates
    (the same shape as ``temperature_mixture_rates``):

        rate_d = min(1, target_fraction · N_total · alpha_d / n_d)

    rounded to 6 decimals so an SQL twin computing the same formula
    parses the identical double."""
    n = stats["n_docs"].to_numpy(np.float64)
    rates = np.minimum(1.0, np.round(
        target_fraction * n.sum() * stats["alpha"].to_numpy() / n, 6))
    return dict(zip(stats["domain"], rates))


def doremi_resample(ds: Dataset, domain_col: str, id_col: str,
                    text_col: str = "text", eta: float = 1.0,
                    smoothing: float = 0.1,
                    target_fraction: float = 0.5):
    """Deterministic DoReMi mixture resample: weights →
    :func:`doremi_rates` → the Knuth-hash inclusion rule. Returns
    ``(sampled_ds, stats)``; three streaming passes (two LM-scoring, one
    filter) plus the vocabulary-bounded LM-fit shuffles."""
    stats = doremi_domain_weights(ds, domain_col, text_col=text_col,
                                  eta=eta, smoothing=smoothing)
    rates = doremi_rates(stats, target_fraction)
    return stratified_sample(ds, domain_col, rates, id_col), stats
