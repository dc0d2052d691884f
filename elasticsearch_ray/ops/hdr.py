"""HDR histogram percentiles — the reference's ``percentiles``/
``percentile_ranks`` alternative method (``"hdr": {"number_of_significant_
value_digits": n}``; `search/aggregations/metrics/InternalHDRPercentiles
.java` wrapping the public HdrHistogram algorithm of Gil Tene).

Semantics kept from the public algorithm: values are recorded into
buckets with FIXED RELATIVE RESOLUTION — every recorded value is
representable within ``10^(1-sd)/2`` relative error for ``sd``
significant digits — and histograms MERGE by adding bucket counts
(losslessly, unlike t-digest's re-clustering). Like the reference, only
non-negative values are supported (HdrHistogram precondition; the
reference rejects negative values for HDR mode).

Bucketing scheme (equivalent resolution, simpler than the bit-twiddled
original): a value v > 0 lands in bucket key (e, q) with
``e = floor(log10(v))`` and ``q = round(v / 10^(e - sd + 1))`` — i.e. the
mantissa quantized to sd decimal digits; v == 0 keys (0, 0). Bucket
representative = q · 10^(e-sd+1). Everything is vectorized numpy; the
sketch serializes to three aligned arrays for the Ray partial/final
reduce shape (one sketch per batch → tiny merge on the driver)."""

from __future__ import annotations

import numpy as np


class HdrHistogram:
    def __init__(self, significant_digits: int = 3):
        if not 1 <= int(significant_digits) <= 5:
            raise ValueError("significant_digits must be in [1, 5]")
        self.sd = int(significant_digits)
        self._counts: dict[tuple[int, int], int] = {}

    # -- build --
    def add(self, values: np.ndarray) -> "HdrHistogram":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if (v < 0).any():
            raise ValueError("HDR histogram cannot record negative values")
        if not len(v):
            return self
        zero = int((v == 0).sum())
        pos = v[v > 0]
        if len(pos):
            e = np.floor(np.log10(pos)).astype(np.int64)
            unit = np.power(10.0, e - self.sd + 1)
            q = np.round(pos / unit).astype(np.int64)
            # rounding up can carry the mantissa into the next decade
            # (q == 10^sd ≡ q' = 10^(sd-1), e' = e+1) — renormalize so
            # equal values always share one key
            carry = q >= 10 ** self.sd
            q[carry] //= 10
            e[carry] += 1
            keys = np.stack([e, q], axis=1)
            uniq, cnt = np.unique(keys, axis=0, return_counts=True)
            for (ee, qq), c in zip(uniq.tolist(), cnt.tolist()):
                k = (ee, qq)
                self._counts[k] = self._counts.get(k, 0) + int(c)
        if zero:
            self._counts[(0, 0)] = self._counts.get((0, 0), 0) + zero
        return self

    def merge(self, other: "HdrHistogram") -> "HdrHistogram":
        if other.sd != self.sd:
            raise ValueError("cannot merge HDR histograms with different "
                             "significant_digits")
        for k, c in other._counts.items():
            self._counts[k] = self._counts.get(k, 0) + c
        return self

    # -- read --
    @property
    def total(self) -> int:
        return sum(self._counts.values())

    @staticmethod
    def _rep(e: int, q: int, sd: int) -> float:
        if q == 0:
            return 0.0
        return float(q) * 10.0 ** (e - sd + 1)

    def _sorted(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._counts:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        reps = np.array([self._rep(e, q, self.sd) for e, q in self._counts])
        cnts = np.array(list(self._counts.values()), np.int64)
        order = np.argsort(reps, kind="stable")
        return reps[order], cnts[order]

    def value_at_percentile(self, p: float) -> float:
        """Smallest bucket representative whose cumulative count covers
        ceil(p/100 · total) — HdrHistogram getValueAtPercentile shape."""
        reps, cnts = self._sorted()
        if not len(reps):
            return float("nan")
        rank = max(1, int(np.ceil(p / 100.0 * cnts.sum())))
        i = int(np.searchsorted(np.cumsum(cnts), rank))
        return float(reps[min(i, len(reps) - 1)])

    def quantile(self, q: float) -> float:
        return self.value_at_percentile(q * 100.0)

    def percentile_at_or_below(self, v: float) -> float:
        """HdrHistogram getPercentileAtOrBelowValue: 100 · fraction of
        recorded values in buckets whose representative is ≤ v (the
        percentile_ranks read path)."""
        reps, cnts = self._sorted()
        if not len(reps):
            return float("nan")
        i = int(np.searchsorted(reps, v, side="right"))
        return 100.0 * float(cnts[:i].sum()) / float(cnts.sum())

    # -- ser/de (Ray partial shape) --
    def to_bytes(self) -> bytes:
        e = np.array([k[0] for k in self._counts], np.int64)
        q = np.array([k[1] for k in self._counts], np.int64)
        c = np.array(list(self._counts.values()), np.int64)
        head = np.array([self.sd, len(e)], np.int64)
        return b"".join(a.tobytes() for a in (head, e, q, c))

    @classmethod
    def from_bytes(cls, data: bytes) -> "HdrHistogram":
        head = np.frombuffer(data[:16], np.int64)
        sd, n = int(head[0]), int(head[1])
        body = np.frombuffer(data[16:], np.int64)
        h = cls(sd)
        e, q, c = body[:n], body[n:2 * n], body[2 * n:3 * n]
        h._counts = {(int(ee), int(qq)): int(cc)
                     for ee, qq, cc in zip(e, q, c)}
        return h
