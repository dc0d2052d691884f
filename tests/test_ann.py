"""ANN operators (ops/ann.py): late-interaction MaxSim."""

import numpy as np
import pandas as pd


def test_maxsim_matches_numpy_and_duckdb(ray_session):
    """ColBERT MaxSim (Khattab & Zaharia SIGIR'20 eq. 1): distributed
    two-phase result == single-matrix numpy == DuckDB twin, including
    docs straddling block boundaries."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.ops.ann import _normalize, maxsim_topk

    rng = np.random.default_rng(53)
    n, d, g, qt = 240, 16, 4, 3
    vecs = rng.normal(size=(n, d))
    doc = np.arange(n) // g
    ds = rd.from_arrow(pa.table({
        "doc": pa.array(doc.astype(np.int64)),
        "embedding": pa.array(list(vecs)),
    })).repartition(7)  # force doc groups to straddle blocks
    q = rng.normal(size=(qt, d))
    got = maxsim_topk(ds, q, "doc", k=10)
    # numpy reference
    sims = _normalize(vecs) @ _normalize(q).T
    ref = np.array([sims[doc == dd].max(axis=0).sum()
                    for dd in range(n // g)]).round(4)
    order = np.lexsort((np.arange(n // g), -ref))[:10]
    assert got["doc"].tolist() == order.tolist()
    assert np.allclose(got["score"], ref[order])
    # DuckDB twin
    tok = pd.DataFrame({"doc": doc, "tid": np.arange(n),
                        "v": list(vecs)})
    qdf = pd.DataFrame({"qt": np.arange(qt), "v": list(q)})
    want = duckdb.sql("""
        WITH s AS (
          SELECT t.doc, q.qt,
                 max(list_cosine_similarity(t.v::DOUBLE[],
                                            q.v::DOUBLE[])) AS mx
          FROM tok t CROSS JOIN qdf q GROUP BY t.doc, q.qt),
        sc AS (SELECT doc, round(sum(mx), 4) AS score FROM s GROUP BY doc)
        SELECT doc, score FROM sc
        ORDER BY score DESC, doc LIMIT 10
    """).df()
    assert got["doc"].tolist() == want["doc"].astype(int).tolist()
    assert np.allclose(got["score"], want["score"])
