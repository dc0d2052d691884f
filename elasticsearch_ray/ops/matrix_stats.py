"""matrix_stats aggregation — the reference's numeric-field matrix module
(`modules/aggs-matrix-stats`, ``MatrixStatsAggregator.java`` accumulating
``RunningStats`` partials merged by ``InternalMatrixStats``): per field
count / mean / variance / skewness / kurtosis, per field-pair covariance
/ correlation.

Ray shape: one PARTIAL per batch — (n, mean vector, centered co-moment
matrix C, per-field 3rd/4th central moments) — merged on the driver with
the numerically-stable pairwise-combine formulas (Chan, Golub & LeVeque,
"Updating formulae and a pairwise algorithm for computing sample
variances", 1979; the same parallel-merge rules RunningStats::merge
implements). The merge is exact (no sketching), so results are
independent of batch boundaries — pinned by the associativity test.

Normalization matches the reference (MatrixStatsResults): variance and
covariance are SAMPLE (n-1); skewness = √n·M3/M2^1.5; kurtosis =
n·M4/M2²; correlation = C_ij / √(C_ii·C_jj)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


class _Partial:
    __slots__ = ("n", "mean", "C", "m3", "m4")

    def __init__(self, n, mean, C, m3, m4):
        self.n, self.mean, self.C, self.m3, self.m4 = n, mean, C, m3, m4

    @classmethod
    def from_values(cls, x: np.ndarray) -> "_Partial":
        n = len(x)
        mean = x.mean(axis=0)
        d = x - mean
        C = d.T @ d
        return cls(n, mean, C, (d ** 3).sum(axis=0), (d ** 4).sum(axis=0))

    def merge(self, o: "_Partial") -> "_Partial":
        na, nb = self.n, o.n
        n = na + nb
        d = o.mean - self.mean
        mean = self.mean + d * (nb / n)
        nab = na * nb / n
        C = self.C + o.C + np.outer(d, d) * nab
        m2a, m2b = np.diag(self.C), np.diag(o.C)
        m3 = (self.m3 + o.m3
              + d ** 3 * nab * (na - nb) / n
              + 3.0 * d * (na * m2b - nb * m2a) / n)
        m4 = (self.m4 + o.m4
              + d ** 4 * nab * (na * na - na * nb + nb * nb) / (n * n)
              + 6.0 * d ** 2 * (na * na * m2b + nb * nb * m2a) / (n * n)
              + 4.0 * d * (na * o.m3 - nb * self.m3) / n)
        return _Partial(n, mean, C, m3, m4)

    def to_bytes(self) -> bytes:
        k = len(self.mean)
        head = np.array([self.n, k], np.int64).tobytes()
        return head + b"".join(
            np.asarray(a, np.float64).tobytes()
            for a in (self.mean, self.C.ravel(), self.m3, self.m4))

    @classmethod
    def from_bytes(cls, b: bytes) -> "_Partial":
        n, k = np.frombuffer(b[:16], np.int64)
        f = np.frombuffer(b[16:], np.float64)
        return cls(int(n), f[:k].copy(),
                   f[k:k + k * k].reshape(k, k).copy(),
                   f[k + k * k:2 * k + k * k].copy(),
                   f[2 * k + k * k:3 * k + k * k].copy())


def _gather_partials(ds: Dataset, fields: list[str]) -> _Partial | None:
    def partial(batch: pa.Table) -> pa.Table:
        x = np.stack([batch[f].to_numpy(zero_copy_only=False).astype(np.float64)
                      for f in fields], axis=1)
        x = x[~np.isnan(x).any(axis=1)]  # row-wise listwise deletion,
        # like the reference (docs missing any field are skipped)
        if not len(x):
            return pa.table({"sketch": pa.array([], pa.binary())})
        return pa.table({"sketch": pa.array(
            [_Partial.from_values(x).to_bytes()], pa.binary())})

    rows = ds.select_columns(fields).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    acc = None
    for b in rows["sketch"]:
        p = _Partial.from_bytes(b)
        acc = p if acc is None else acc.merge(p)
    return acc


def matrix_stats(ds: Dataset, fields: list[str]) -> dict:
    """Full response shape: {'doc_count': n, 'fields': per-field frame
    (field, count, mean, variance, skewness, kurtosis), 'pairs': pairwise
    frame (field_a, field_b, covariance, correlation), both field-sorted}."""
    fields = sorted(fields)
    acc = _gather_partials(ds, fields)
    if acc is None:
        return {"doc_count": 0,
                "fields": pd.DataFrame(columns=["field", "count", "mean",
                                                "variance", "skewness",
                                                "kurtosis"]),
                "pairs": pd.DataFrame(columns=["field_a", "field_b",
                                               "covariance", "correlation"])}
    n = acc.n
    m2 = np.diag(acc.C)
    variance = m2 / max(n - 1, 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        skew = np.sqrt(n) * acc.m3 / np.power(m2, 1.5)
        kurt = n * acc.m4 / (m2 * m2)
        corr = acc.C / np.sqrt(np.outer(m2, m2))
    per_field = pd.DataFrame({
        "field": fields,
        "count": n,
        "mean": acc.mean,
        "variance": variance,
        "skewness": skew,
        "kurtosis": kurt,
    })
    ra, rb, cov_l, cor_l = [], [], [], []
    for i, fa in enumerate(fields):
        for j, fb in enumerate(fields):
            ra.append(fa)
            rb.append(fb)
            cov_l.append(acc.C[i, j] / max(n - 1, 1))
            cor_l.append(corr[i, j])
    pairs = pd.DataFrame({"field_a": ra, "field_b": rb,
                          "covariance": cov_l, "correlation": cor_l})
    return {"doc_count": n, "fields": per_field, "pairs": pairs}
