"""t-digest quantile sketch — the reference's ``percentiles`` agg default
(``search/aggregations/metrics/TDigestState.java`` wraps t-digest). This is a
from-scratch implementation of the public algorithm (Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests"): buffered merging
digest with the scale-function k1 bound — centroid sizes are capped by
4·n·q(1-q)/δ, giving relative accuracy concentrated at the tails.

Mergeable: serialize per batch, OR-merge by re-clustering the union — the
standard Ray partial/final reduce shape (one sketch per batch → small
groupby of sketches).
"""

from __future__ import annotations

import numpy as np


class TDigest:
    def __init__(self, delta: float = 100.0, means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)

    # -- build --
    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, np.float64)
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.means) > 8 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self):
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        n = w.sum()
        out_m, out_w = [], []
        cur_m, cur_w = m[0], w[0]
        cum = 0.0
        for i in range(1, len(m)):
            q = (cum + cur_w / 2) / n
            cap = max(1.0, 4.0 * n * q * (1 - q) / self.delta)
            if cur_w + w[i] <= cap:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- query --
    def quantile(self, q: float) -> float:
        """Interpolated quantile (centroid-midpoint interpolation)."""
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        n = self.weights.sum()
        target = q * n
        # cumulative weight at centroid midpoints
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    # -- serialization (for shuffle transport) --
    def to_bytes(self) -> bytes:
        self._compress()
        return (
            np.float64(self.delta).tobytes()
            + np.int64(len(self.means)).tobytes()
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta = float(np.frombuffer(b, np.float64, 1)[0])
        k = int(np.frombuffer(b, np.int64, 1, offset=8)[0])
        means = np.frombuffer(b, np.float64, k, offset=16).copy()
        weights = np.frombuffer(b, np.float64, k, offset=16 + 8 * k).copy()
        return cls(delta, means, weights)
