import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from elasticsearch_ray.index.norms import LENGTH_TABLE, byte4_to_int, int_to_byte4


def test_exact_below_24():
    v = np.arange(24)
    assert np.array_equal(byte4_to_int(int_to_byte4(v)), v)


def test_known_values():
    # SmallFloat: 4-bit mantissa above 24 → decode(encode(x)) <= x, monotone.
    v = np.arange(0, 200000)
    enc = int_to_byte4(v)
    dec = byte4_to_int(enc)
    assert np.all(dec <= v)
    assert np.all(np.diff(enc.astype(int)) >= 0)
    # idempotent on all 256 byte values (Lucene LENGTH_TABLE invariant)
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(int_to_byte4(byte4_to_int(b)), b)
    assert len(LENGTH_TABLE) == 256
    assert LENGTH_TABLE[0] == 0.0 and LENGTH_TABLE[23] == 23.0 and LENGTH_TABLE[24] == 24.0


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_bound(x):
    enc = int_to_byte4(np.array([x]))
    dec = int(byte4_to_int(enc)[0])
    assert dec <= x
    # decode is the largest representable value <= x: re-encoding gives same byte
    assert int(int_to_byte4(np.array([dec]))[0]) == int(enc[0])
