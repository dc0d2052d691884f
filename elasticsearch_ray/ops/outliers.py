"""Data frame analytics: outlier detection (x-pack ml).

Reference config: ``x-pack/plugin/core/.../ml/dataframe/analyses/
OutlierDetection.java`` — (n_neighbors, method ∈ {lof, ldof,
distance_kth_nn, distance_knn}, outlier_fraction, standardization_enabled,
compute_feature_influence). The reference's scoring runs in the native
ml-cpp repo (github.com/elastic/ml-cpp, COutliers.cc) as an ensemble; here
each method follows its literature definition:

- ``distance_kth_nn`` — distance to the k-th nearest neighbor
  (Ramaswamy et al., SIGMOD 2000).
- ``distance_knn``   — mean distance to the k nearest neighbors
  (Angiulli & Pizzuti, PKDD 2002).
- ``ldof`` — mean kNN distance / mean pairwise distance among the kNN
  (Zhang, Hutter, Jin, PAKDD 2009).
- ``lof``  — classic local outlier factor (Breunig et al., SIGMOD 2000)
  with reachability distances over the k-neighborhood.

``outlier_score`` maps raw method scores into [0, 1] via the empirical CDF
(rank / n) — a documented stand-in for ml-cpp's probability calibration.
``standardization_enabled`` z-scores each feature first (the reference
default). Like the reference (dataframe analytics loads the frame onto the
ML node), the REFERENCE SET must fit in memory; the distance computation
itself is distributed: row chunks stream through ``map_batches`` and each
chunk does one vectorized (chunk × N) distance block against the broadcast
matrix — no per-row Python, no N² driver memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_METHODS = ("lof", "ldof", "distance_kth_nn", "distance_knn")


def _matrix(ds, column) -> tuple[np.ndarray, pd.DataFrame]:
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    if isinstance(column, str):
        return np.stack(df[column].to_numpy()).astype(np.float64), df
    return df[list(column)].to_numpy(np.float64), df


def _knn_block(X: np.ndarray, ref: np.ndarray, k: int):
    """For each row of X: (distances to its k nearest in ref, their indices),
    excluding exact self-matches by index when X is a slice of ref (handled
    by the caller passing base offsets)."""
    # squared euclidean via the expansion — one BLAS matmul per chunk
    d2 = (np.sum(X * X, axis=1)[:, None] + np.sum(ref * ref, axis=1)[None, :]
          - 2.0 * (X @ ref.T))
    np.maximum(d2, 0.0, out=d2)
    return d2


def outlier_detection(ds, column="embedding", n_neighbors: int = 5,
                      method: str = "distance_kth_nn",
                      standardization_enabled: bool = True,
                      chunk: int = 2048):
    """Score every row; returns a pandas frame (id column preserved when the
    input has vec_id/doc_id/event_id) with raw ``score`` and calibrated
    ``outlier_score``."""
    if method not in _METHODS:
        raise ValueError(f"unknown outlier method {method!r}")
    X, df = _matrix(ds, column)
    n = len(X)
    k = min(int(n_neighbors), n - 1)
    if k < 1:
        raise ValueError("need at least 2 rows")
    if standardization_enabled:
        mu = X.mean(axis=0)
        sd = X.std(axis=0)
        sd[sd == 0] = 1.0
        X = (X - mu) / sd

    import ray

    ref = ray.put(X)

    @ray.remote
    def score_chunk(lo: int, hi: int, Xref):
        Xc = Xref[lo:hi]
        d2 = _knn_block(Xc, Xref, k)
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf  # self
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        rows = np.arange(hi - lo)[:, None]
        nd2 = d2[rows, idx]
        order = np.argsort(nd2, axis=1)
        idx = idx[rows, order]
        nd = np.sqrt(nd2[rows, order])  # (m, k) sorted neighbor distances
        if method == "distance_kth_nn":
            return lo, nd[:, -1], idx, nd
        if method == "distance_knn":
            return lo, nd.mean(axis=1), idx, nd
        if method == "ldof":
            # mean pairwise distance AMONG each row's k neighbors, one
            # einsum over the (m, k, d) gathered neighbor block
            nb = Xref[idx]  # (m, k, d)
            sq = np.einsum("mkd,mkd->mk", nb, nb)
            dots = np.einsum("mkd,mld->mkl", nb, nb)
            pair = np.sqrt(np.maximum(
                sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0))
            if k > 1:
                iu = np.triu_indices(k, 1)
                inner = pair[:, iu[0], iu[1]].mean(axis=1)
            else:
                inner = np.ones(hi - lo)
            return lo, nd.mean(axis=1) / np.maximum(inner, 1e-12), idx, nd
        return lo, None, idx, nd  # lof: needs global k-distances, 2nd pass

    chunks = [(lo, min(lo + chunk, n)) for lo in range(0, n, chunk)]
    parts = ray.get([score_chunk.remote(lo, hi, ref) for lo, hi in chunks])
    knn_idx = np.vstack([p[2] for p in parts])
    knn_d = np.vstack([p[3] for p in parts])
    if method == "lof":
        # pass 2 (driver, vectorized over the small kNN tables): LOF with
        # reach-dist(a,b) = max(d(a,b), k-distance(b)); lrd = 1/mean reach;
        # LOF(a) = mean(lrd(neighbors))/lrd(a)
        kdist = knn_d[:, -1]
        reach = np.maximum(knn_d, kdist[knn_idx])
        lrd = 1.0 / np.maximum(reach.mean(axis=1), 1e-12)
        scores = (lrd[knn_idx].mean(axis=1)) / lrd
    else:
        scores = np.concatenate([p[1] for p in parts])
    ranks = np.argsort(np.argsort(scores, kind="stable"), kind="stable")
    out = pd.DataFrame({"score": scores,
                        "outlier_score": (ranks + 1) / n})
    for idc in ("vec_id", "doc_id", "event_id", "id"):
        if idc in df.columns:
            out.insert(0, idc, df[idc].to_numpy())
            break
    return out
