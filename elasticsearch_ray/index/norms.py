"""Lossy 1-byte document-length norms — Lucene ``SmallFloat`` semantics.

Elasticsearch's BM25 stores the per-document field length as a single byte
via ``SmallFloat.intToByte4`` and decodes it with ``byte4ToInt`` at score
time (reference: ``server/.../lucene/similarity/LegacyBM25Similarity.java:61-63``
delegates to Lucene's ``BM25Similarity.computeNorm``).  To be score-identical
we must reproduce the exact lossy encoding: values 0..23 are exact; larger
values keep a 4-bit mantissa (1 implicit + 3 stored bits) and a shift.

All functions here are vectorized over numpy arrays and also accept scalars.
"""

from __future__ import annotations

import numpy as np

# longToInt4(Integer.MAX_VALUE): numBits=31, shift=27, encoded=(0x7fffffff>>>27)&7 | 28<<3
_MAX_INT4 = 231
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24


def _long_to_int4(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    nz = v > 0
    # bit_length: floor(log2(v)) + 1 for v > 0
    num_bits = np.where(nz, np.floor(np.log2(np.maximum(v, 1))).astype(np.int64) + 1, 0)
    shift = num_bits - 4
    subnormal = num_bits < 4
    enc_norm = (np.right_shift(v, np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3)
    return np.where(subnormal, v, enc_norm)


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    subnormal = shift == -1
    dec = np.left_shift(bits | 0x08, np.maximum(shift, 0))
    return np.where(subnormal, bits, dec)


def int_to_byte4(i) -> np.ndarray:
    """Encode a non-negative int (field length) to the 1-byte norm."""
    v = np.asarray(i, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("Only supports positive values")
    small = v < NUM_FREE_VALUES
    enc = np.where(small, v, NUM_FREE_VALUES + _long_to_int4(np.maximum(v - NUM_FREE_VALUES, 0)))
    return enc.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Decode the 1-byte norm back to the (lossy) field length."""
    i = np.asarray(b, dtype=np.int64) & 0xFF
    small = i < NUM_FREE_VALUES
    dec = np.where(small, i, NUM_FREE_VALUES + _int4_to_long(np.maximum(i - NUM_FREE_VALUES, 0)))
    return dec.astype(np.int64)


# Precomputed decode table for all 256 norm bytes (Lucene's LENGTH_TABLE).
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
