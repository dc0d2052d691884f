"""HyperLogLog cardinality sketch — the reference's ``cardinality`` agg uses
HyperLogLog++ (``search/aggregations/metrics/HyperLogLogPlusPlus.java``, 406
LoC). This is a from-scratch numpy implementation of the public HLL algorithm
(Flajolet et al.; Heule et al. bias-corrected variant simplified): dense
registers, 64-bit hashing, mergeable — the Ray Data partial/final reduce
pattern (one sketch per batch, OR-merge of registers)."""

from __future__ import annotations

import numpy as np


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 over a value hash)."""
    if values.dtype.kind in ("U", "O", "S"):
        import pandas as pd

        h = pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)
    elif values.dtype.kind == "f":
        # hash the float's BIT PATTERN: a uint cast truncates toward zero,
        # collapsing every value in [n, n+1) to one register (and negative
        # floats are an undefined cast)
        h = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64).copy()
    else:
        h = np.asarray(values).astype(np.uint64, copy=False).copy()
    h ^= np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


class HLL:
    """Dense HyperLogLog with 2^p registers."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add(self, values: np.ndarray) -> "HLL":
        h = _hash64(np.asarray(values))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))  # sentinel bit
        # rank = leading zeros of rest + 1, capped
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> int:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small cardinalities
        return int(round(est))

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())
