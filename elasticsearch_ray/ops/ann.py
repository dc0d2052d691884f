"""Approximate-nearest-neighbor search over an embedding column
(list<float>) — the ``knn``/dense_vector surface (x-pack
``DenseVectorFieldMapper`` / ``KnnVectorQueryBuilder``), Ray-Data-shaped:

  - brute-force cosine top-k: the query matrix is broadcast once (ray.put)
    and each batch does one numpy matmul → per-batch partial top-k rows →
    tiny final reduce. Exact baseline.
  - IVF (inverted-file) top-k: k-means centroids from a driver-side sample,
    per-vector centroid assignment in a map stage, query probes the nprobe
    nearest centroid lists only — the scale path (cells shrink the scanned
    fraction to nprobe/ncells).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _batch_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteTopK:
    """Per-batch exact cosine top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qm = q
        # float64 throughout: cosine = dot/(|a||b|), bit-comparable to
        # DuckDB list_cosine_similarity at the rounding used by the oracle
        self.qn = _normalize(qm.astype(np.float64))
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = x @ self.qn.T  # (n, q)
        k = min(self.k, sims.shape[0])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            out_q.extend([self.qids[qi]] * len(top))
            out_id.extend(ids[top].tolist())
            out_sim.extend(s[top].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_id),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def brute_topk(ds: Dataset, query_ids, query_matrix: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k per query. Result ordered (query_id, -cosine,
    neighbor_id). Per-batch partials keep the reduce tiny: batches×q×k rows."""
    # float64 throughout: a float32 downcast here would diverge from the
    # DuckDB oracle (and from ivf/hnsw) near round() boundaries
    qref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float64)))
    partial = ds.map_batches(
        BruteTopK, fn_constructor_args=(qref, id_col, vec_col, k),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    out = (
        partial.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return out


def _kmeans(sample: np.ndarray, ncells: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(ncells, len(sample)), replace=False)].copy()
    for _ in range(iters):
        d = _normalize(sample) @ _normalize(cent).T
        assign = d.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_topk(ds: Dataset, query_ids, query_matrix: np.ndarray, id_col: str = "vec_id",
             vec_col: str = "embedding", k: int = 10, ncells: int = 16, nprobe: int = 4,
             sample_n: int = 2048, seed: int = 11) -> pd.DataFrame:
    """IVF-flat ANN: scan only the nprobe closest centroid cells per query.

    Returns the same schema as brute_topk; recall < 1.0 by design (tested
    against the exact baseline)."""
    sample = []
    need = sample_n
    for batch in ds.select_columns([vec_col]).iter_batches(batch_format="pyarrow"):
        sample.append(_batch_matrix(batch, vec_col))
        need -= len(batch)
        if need <= 0:
            break
    cent = _kmeans(np.concatenate(sample)[:sample_n], ncells, seed=seed)
    cent_n = _normalize(cent)
    qm = np.asarray(query_matrix, np.float64)
    probe = np.argsort(-(_normalize(qm) @ cent_n.T), axis=1)[:, :nprobe]  # (q, nprobe)
    cent_ref = ray.put(cent_n)
    qref = ray.put((list(query_ids), qm, probe))

    class IVFBatch:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.qids, qm2, self.probe = ray.get(qref)
            self.qn = _normalize(qm2)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            cells = (x @ self.cent.T).argmax(axis=1)
            out_q, out_id, out_sim = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(cells, self.probe[qi])
                if not mask.any():
                    continue
                s = x[mask] @ self.qn[qi]
                sel_ids = ids[mask]
                kk = min(k, len(s))
                top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
                out_q.extend([self.qids[qi]] * len(top))
                out_id.extend(sel_ids[top].tolist())
                out_sim.extend(s[top].astype(np.float64).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q),
                    "neighbor_id": pa.array(out_id),
                    "cosine": pa.array(out_sim, pa.float64()),
                }
            )

    partial = ds.map_batches(IVFBatch, batch_format="pyarrow", concurrency=2).to_pandas()
    out = (
        partial.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return out
