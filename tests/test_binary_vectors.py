"""Binary sign-bit quantized vector serving (SimHash/ITQ sketch family;
Lucene's quantized dense_vector sketch-then-rescore serving model):
Hamming candidate scan over the 32x-smaller packed store + exact float64
rescoring."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.index.vectors import (
    VectorIndexReader,
    _quantize_binary,
    build_vector_index,
)

N, DIM = 3000, 32


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(23)
    return rng.normal(size=(N, DIM))


def _ds(vecs):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
        "bucket": pa.array((np.arange(N) % 3).astype(np.int64)),
    }))


@pytest.fixture(scope="module")
def bidx(ray_session, vecs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vb") / "idx")
    build_vector_index(_ds(vecs), d, num_partitions=3,
                       metadata_cols=["bucket"], quantize=True)
    return d


def test_quantize_binary_shape_and_balance(vecs):
    packed, med = _quantize_binary(vecs)
    assert packed.shape == (N, DIM // 8) and packed.dtype == np.uint8
    assert med.shape == (DIM,)
    # median centering → each dimension's bit is a ~50/50 split
    bits = np.unpackbits(packed, axis=1)[:, :DIM]
    frac = bits.mean(axis=0)
    assert (np.abs(frac - 0.5) < 0.02).all()


def test_binary_rescore_all_equals_brute(ray_session, bidx, vecs):
    """oversample covering the partition → binary path IS the brute
    result (every candidate rescored in exact float64)."""
    r = VectorIndexReader(bidx)
    q = vecs[:3]
    a = r.topk([0, 1, 2], q, k=5, brute=True)
    b = r.topk([0, 1, 2], q, k=5, binary=True, binary_oversample=N)
    pd.testing.assert_frame_equal(a, b)


def test_binary_recall_at_default_oversample(ray_session, bidx, vecs):
    rng = np.random.default_rng(6)
    q = rng.normal(size=(20, DIM))
    r = VectorIndexReader(bidx)
    truth = r.topk(list(range(20)), q, k=10, brute=True)
    got = r.topk(list(range(20)), q, k=10, binary=True,
                 binary_oversample=16.0)
    hit = 0
    for qid in range(20):
        t = set(truth[truth.query_id == qid].neighbor_id)
        g = set(got[got.query_id == qid].neighbor_id)
        hit += len(t & g) / len(t)
    assert hit / 20 >= 0.8  # 1-bit sketch at 16x oversample


def test_binary_filtered_equals_brute_filtered(ray_session, bidx, vecs):
    r = VectorIndexReader(bidx)
    q = vecs[:2]
    a = r.topk([0, 1], q, k=5, brute=True, flt=[("bucket", 2)])
    b = r.topk([0, 1], q, k=5, binary=True, binary_oversample=N,
               flt=[("bucket", 2)])
    pd.testing.assert_frame_equal(a, b)


def test_unquantized_index_rejects_binary(ray_session, vecs,
                                          tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vnb") / "idx")
    build_vector_index(_ds(vecs), d, num_partitions=2)
    r = VectorIndexReader(d)
    with pytest.raises(ValueError, match="quantize=True"):
        r.topk([0], vecs[:1], k=3, binary=True)
    with pytest.raises(ValueError, match="ONE of"):
        r.topk([0], vecs[:1], k=3, binary=True, int8=True)
