import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_ray.index.postings import (
    concat_blobs,
    decode_postings,
    encode_postings,
    read_headers,
    reencode_canonical,
)


def _random_postings(seed, n=5000, universe=1_000_000):
    rng = np.random.default_rng(seed)
    docs = np.unique(rng.integers(0, universe, n))
    tfs = rng.integers(1, 300, len(docs))
    norms = rng.integers(0, 256, len(docs)).astype(np.uint8)
    return docs, tfs, norms


def test_roundtrip():
    docs, tfs, norms = _random_postings(1)
    d, t = decode_postings(encode_postings(docs, tfs, norms))
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)


def test_empty():
    d, t = decode_postings(encode_postings(np.empty(0), np.empty(0), np.empty(0)))
    assert len(d) == 0 and len(t) == 0


def test_headers_impacts():
    docs, tfs, norms = _random_postings(2)
    h = read_headers(encode_postings(docs, tfs, norms))
    assert len(h) == (len(docs) + 127) // 128
    # per-block invariants
    for bi in range(len(h)):
        lo, hi = bi * 128, min((bi + 1) * 128, len(docs))
        assert h["first_doc"][bi] == docs[lo]
        assert h["last_doc"][bi] == docs[hi - 1]
        assert h["max_tf"][bi] == tfs[lo:hi].max()
        assert h["min_norm"][bi] == norms[lo:hi].min()


def test_chunked_concat_equals_whole():
    docs, tfs, norms = _random_postings(3)
    whole = encode_postings(docs, tfs, norms)
    cut1, cut2 = len(docs) // 3, 2 * len(docs) // 3
    chunks = [
        encode_postings(docs[:cut1], tfs[:cut1], norms[:cut1]),
        encode_postings(docs[cut1:cut2], tfs[cut1:cut2], norms[cut1:cut2]),
        encode_postings(docs[cut2:], tfs[cut2:], norms[cut2:]),
    ]
    d, t = decode_postings(concat_blobs(chunks))
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)
    # canonical re-encode is byte-identical to direct encode (determinism)
    lookup = np.zeros(1_000_001, dtype=np.uint8)
    lookup[docs] = norms
    assert reencode_canonical(chunks, lookup) == whole


@settings(max_examples=30)
@given(st.integers(0, 10_000), st.integers(1, 400))
def test_property_roundtrip(seed, n):
    docs, tfs, norms = _random_postings(seed, n=n, universe=max(4 * n, 16))
    d, t = decode_postings(encode_postings(docs, tfs, norms))
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)
