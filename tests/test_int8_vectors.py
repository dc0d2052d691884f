"""int8 scalar-quantized vector serving (Lucene ScalarQuantizer /
dense_vector int8_flat-int8_hnsw index options): quantized candidate
selection + exact float rescoring."""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.index.vectors import (
    VectorIndexReader,
    build_vector_index,
)

N, DIM = 3000, 32


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(17)
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
def qidx(ray_session, vecs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vq") / "idx")
    build_vector_index(_ds(vecs), d, num_partitions=3,
                       metadata_cols=["bucket"], quantize=True)
    return d


def test_int8_rescore_all_equals_brute(ray_session, qidx, vecs):
    """oversample covering the partition → int8 path IS the brute result
    (every candidate rescored in exact float)."""
    r = VectorIndexReader(qidx)
    q = vecs[:3]
    a = r.topk([0, 1, 2], q, k=5, brute=True)
    b = r.topk([0, 1, 2], q, k=5, int8=True, int8_oversample=N)
    pd.testing.assert_frame_equal(a, b)


def test_int8_recall_at_default_oversample(ray_session, qidx, vecs):
    rng = np.random.default_rng(5)
    q = rng.normal(size=(20, DIM))
    r = VectorIndexReader(qidx)
    truth = r.topk(list(range(20)), q, k=10, brute=True)
    got = r.topk(list(range(20)), q, k=10, int8=True, int8_oversample=4.0)
    hit = 0
    for qid in range(20):
        t = set(truth[truth.query_id == qid].neighbor_id)
        g = set(got[got.query_id == qid].neighbor_id)
        hit += len(t & g) / len(t)
    assert hit / 20 >= 0.95


def test_int8_filtered_equals_brute_filtered(ray_session, qidx, vecs):
    r = VectorIndexReader(qidx)
    q = vecs[:2]
    a = r.topk([0, 1], q, k=5, brute=True, flt=[("bucket", 1)])
    b = r.topk([0, 1], q, k=5, int8=True, int8_oversample=N,
               flt=[("bucket", 1)])
    pd.testing.assert_frame_equal(a, b)


def test_unquantized_index_rejects_int8(ray_session, vecs,
                                        tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vnq") / "idx")
    build_vector_index(_ds(vecs), d, num_partitions=2)
    r = VectorIndexReader(d)
    with pytest.raises(ValueError, match="quantize=True"):
        r.topk([0], vecs[:1], k=3, int8=True)


def test_quantize_flag_isolates_resume(ray_session, vecs,
                                       tmp_path_factory):
    """A quantize=True build over a dir holding an UNquantized index must
    rebuild (spec-validated manifests), not serve stale parts."""
    import os

    from elasticsearch_ray.index.vectors import vpart_dir

    d = str(tmp_path_factory.mktemp("vre") / "idx")
    build_vector_index(_ds(vecs), d, num_partitions=2)
    assert not os.path.exists(os.path.join(vpart_dir(d, 0), "vq.npy"))
    meta = build_vector_index(_ds(vecs), d, num_partitions=2,
                              quantize=True)
    assert meta["quantize"] is True
    assert os.path.exists(os.path.join(vpart_dir(d, 0), "vq.npy"))
