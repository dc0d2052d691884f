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
    """Per-batch exact top-k against the broadcast query matrix.

    ``similarity`` — the reference's DenseVectorFieldMapper.VectorSimilarity
    family (:154-157): ``cosine`` (value = cos, the historical column),
    ``dot_product`` (value = Lucene score (1+dot)/2 over the RAW vectors —
    the mapper requires unit length at index time), ``l2_norm`` (value =
    Lucene score 1/(1+d²))."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int,
                 similarity: str = "cosine"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qm = q
        if similarity not in ("cosine", "dot_product", "l2_norm"):
            raise ValueError(f"unknown similarity {similarity!r}")
        self.similarity = similarity
        # float64 throughout: cosine = dot/(|a||b|), bit-comparable to
        # DuckDB list_cosine_similarity at the rounding used by the oracle
        qm = qm.astype(np.float64)
        self.qm = qm
        self.qn = _normalize(qm)
        self.q_sq = (qm * qm).sum(axis=1)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = _batch_matrix(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if self.similarity == "cosine":
            sims = _normalize(raw) @ self.qn.T  # (n, q)
        elif self.similarity == "dot_product":
            sims = (1.0 + raw @ self.qm.T) / 2.0
        else:  # l2_norm: 1 / (1 + squared distance)
            d2 = ((raw * raw).sum(axis=1)[:, None] + self.q_sq[None, :]
                  - 2.0 * (raw @ self.qm.T))
            sims = 1.0 / (1.0 + np.maximum(d2, 0.0))
        k = min(self.k, sims.shape[0])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            out_q.extend([self.qids[qi]] * len(top))
            out_id.extend(ids[top].tolist())
            out_sim.extend(s[top].astype(np.float64).tolist())
        col = "cosine" if self.similarity == "cosine" else "similarity"
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_id),
                col: pa.array(out_sim, pa.float64()),
            }
        )


def brute_topk(ds: Dataset, query_ids, query_matrix: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 10,
               similarity: str = "cosine") -> pd.DataFrame:
    """Exact top-k per query under ``similarity`` (cosine / dot_product /
    l2_norm — see BruteTopK). Result ordered (query_id, -value,
    neighbor_id). Per-batch partials keep the reduce tiny: batches×q×k rows."""
    if similarity not in ("cosine", "dot_product", "l2_norm"):
        raise ValueError(f"unknown similarity {similarity!r}")
    # float64 throughout: a float32 downcast here would diverge from the
    # DuckDB oracle (and from ivf/hnsw) near round() boundaries
    qref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float64)))
    partial = ds.map_batches(
        BruteTopK, fn_constructor_args=(qref, id_col, vec_col, k, similarity),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    col = "cosine" if similarity == "cosine" else "similarity"
    out = (
        partial.sort_values(["query_id", col, "neighbor_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out[col] = out[col].round(6)
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


# --------------------------------------------------------------- IVF-PQ

def _pq_train(sample: np.ndarray, m: int, ksub: int, seed: int = 11):
    """Per-subspace k-means codebooks over the (normalized) sample —
    product quantization (Jégou, Douze & Schmid, TPAMI 2011 §II).
    Returns (m, ksub, dsub) float64 codebooks."""
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, ksub, dsub))
    rng = np.random.default_rng(seed)
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                              replace=False)].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                msk = assign == c
                if msk.any():
                    cent[c] = sub[msk].mean(axis=0)
        books[j, :len(cent)] = cent
    return books


def _pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8 codes: nearest codeword per subspace."""
    m, ksub, dsub = books.shape
    codes = np.zeros((len(x), m), np.uint8)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def ivfpq_topk(ds: Dataset, query_ids, query_matrix: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding",
               k: int = 10, m: int = 8, ksub: int = 16,
               ncells: int = 16, nprobe: int = 4, rerank: int = 64,
               sample_n: int = 2048, seed: int = 11) -> pd.DataFrame:
    """IVF-PQ ANN (IVFADC, Jégou et al. 2011 §IV): the 100-TB scale path.

    Vectors are stored ONCE as (cell, m×uint8 PQ codes of the residual
    x − centroid) — a 32×+ compression of a float64 corpus, so the scan
    side touches only code bytes. Search is asymmetric distance
    computation: per (query, probed cell) an (m, ksub) lookup table of
    sub-distances to the query residual, candidate distance = one gather
    + sum over m. The ``rerank`` best ADC candidates per query are then
    scored EXACTLY against the raw vectors in one filtered second pass
    (candidate-id broadcast — |q|·rerank ids, never the corpus).

    With ``nprobe=ncells`` and ``rerank`` ≥ corpus the result is
    bit-equal to :func:`brute_topk` (the oracle configuration); the
    approximate setting is recall-tested. Same output schema/rounding
    as the other ANN entries."""
    sample = []
    need = max(sample_n, 4 * ksub)
    for batch in ds.select_columns([vec_col]).iter_batches(
            batch_format="pyarrow"):
        sample.append(_batch_matrix(batch, vec_col))
        need -= len(batch)
        if need <= 0:
            break
    samp = _normalize(np.concatenate(sample)[:max(sample_n, 4 * ksub)])
    cent = _normalize(_kmeans(samp, ncells, seed=seed))
    coarse = (samp @ cent.T).argmax(axis=1)
    books = _pq_train(samp - cent[coarse], m, ksub, seed=seed)
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)

    # ---- pass 1: encode the corpus to (id, cell, codes) --------------
    def encode(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        b = ray.get(books_ref)
        x = _normalize(_batch_matrix(batch, vec_col))
        cells = (x @ c.T).argmax(axis=1)
        codes = _pq_encode(x - c[cells], b)
        return pa.table({
            "id": batch[id_col],
            "cell": pa.array(cells.astype(np.int32)),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })

    encoded = ds.map_batches(encode, batch_format="pyarrow").materialize()

    # ---- pass 2: ADC scan over codes ---------------------------------
    qm = _normalize(np.asarray(query_matrix, np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    # LUT[q, cell, j, code] would be big; build per (q, probed cell):
    # ||(x_res + c) - q||^2 over subspaces of (books[j] + c_sub - q_sub)
    dsub = qm.shape[1] // m
    luts = {}
    for qi in range(len(qm)):
        for cell in probe[qi]:
            resq = qm[qi] - cent[cell]
            lut = np.zeros((m, ksub))
            for j in range(m):
                diff = books[j] - resq[j * dsub:(j + 1) * dsub][None, :]
                lut[j] = (diff ** 2).sum(-1)
            luts[(qi, int(cell))] = lut
    qref = ray.put((list(query_ids), probe, luts))

    def adc(batch: pa.Table) -> pa.Table:
        qids, prb, lt = ray.get(qref)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        codes = batch["codes"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(len(batch), m)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(qids)):
            for cell in prb[qi]:
                msk = cells == cell
                if not msk.any():
                    continue
                lut = lt[(qi, int(cell))]
                cd = codes[msk]
                dist = lut[np.arange(m)[None, :], cd].sum(axis=1)
                sel = ids[msk]
                kk = min(rerank, len(dist))
                top = np.argpartition(dist, kk - 1)[:kk] \
                    if len(dist) > kk else np.arange(len(dist))
                out_q.extend([qids[qi]] * len(top))
                out_id.extend(sel[top].tolist())
                out_d.extend(dist[top].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "neighbor_id": pa.array(out_id),
                         "adc": pa.array(out_d, pa.float64())})

    cand = encoded.map_batches(adc, batch_format="pyarrow").to_pandas()
    cand = (cand.sort_values(["query_id", "adc", "neighbor_id"])
            .groupby("query_id", as_index=False).head(rerank))

    # ---- pass 3: exact rerank of the candidate ids -------------------
    # per-query sorted candidate arrays ship to the workers so each
    # batch emits ONLY (query, own-candidate) pairs — ~rerank rows per
    # query, never a candidates x queries cross product
    cand_ids = {q: np.sort(g["neighbor_id"].to_numpy())
                for q, g in cand.groupby("query_id")}
    all_ids = np.sort(cand["neighbor_id"].unique()) if len(cand) else \
        np.array([], np.int64)
    ids_ref = ray.put((all_ids, cand_ids))
    qref2 = ray.put((list(query_ids), qm))

    def exact(batch: pa.Table) -> pa.Table:
        union_ids, per_q = ray.get(ids_ref)
        qids, qn = ray.get(qref2)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        msk = np.isin(ids, union_ids)
        if not msk.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        x = _normalize(_batch_matrix(batch, vec_col))[msk]
        sel = ids[msk]
        sims = x @ qn.T
        out_q, out_id, out_sim = [], [], []
        for qi, qid in enumerate(qids):
            own = per_q.get(qid)
            if own is None:
                continue
            own_msk = np.isin(sel, own)
            if not own_msk.any():
                continue
            out_q.extend([qid] * int(own_msk.sum()))
            out_id.extend(sel[own_msk].tolist())
            out_sim.extend(sims[own_msk, qi].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "neighbor_id": pa.array(out_id),
                         "cosine": pa.array(out_sim, pa.float64())})

    exact_df = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    out = (exact_df.sort_values(["query_id", "cosine", "neighbor_id"],
                                ascending=[True, False, True])
           .groupby("query_id", as_index=False).head(k)
           .reset_index(drop=True))
    out["cosine"] = out["cosine"].round(6)
    return out


# ------------------------------------------------- late interaction


def maxsim_topk(ds: Dataset, query_matrix: np.ndarray, doc_col: str,
                vec_col: str = "embedding", k: int = 10) -> pd.DataFrame:
    """Late-interaction MaxSim retrieval (Khattab & Zaharia, SIGIR'20
    "ColBERT", Eq. 1): a document's score is the sum over QUERY token
    vectors of the max cosine against any of the document's token
    vectors,

        score(q, d) = Σ_i  max_j  cos(q_i, d_j).

    Exact and distributed in two phases: a vectorized per-batch partial
    (one (n × q_tokens) matmul + per-doc ``maximum.reduceat``) emits at
    most one row per doc per batch, a per-doc Max groupby combines
    boundary-straddling docs (the two-phase discipline — Ray sort/shuffle
    boundaries are row-based, never key-aligned), and the driver sums the
    q_token max columns and cuts top-k on (rounded score desc, doc asc).
    The query matrix is tiny (q_tokens × d) and rides the task closure —
    never re-shipped per row. Shuffle size is n_docs × q_tokens maxes,
    not n_vectors."""
    from ray.data.aggregate import Max

    qn = _normalize(np.asarray(query_matrix, np.float64))
    qt = qn.shape[0]

    def partial(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ qn.T  # (n, qt)
        docs = batch[doc_col].to_numpy(zero_copy_only=False)
        order = np.argsort(docs, kind="stable")
        ds_ = docs[order]
        ss = sims[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        mx = np.maximum.reduceat(ss, starts, axis=0)
        cols = {doc_col: pa.array(ds_[starts])}
        for j in range(qt):
            cols[f"m{j}"] = pa.array(mx[:, j], pa.float64())
        return pa.table(cols)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(doc_col)
           .aggregate(*[Max(f"m{j}", alias_name=f"m{j}")
                        for j in range(qt)])
           .to_pandas())
    if agg.empty:
        return pd.DataFrame({doc_col: pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    score = agg[[f"m{j}" for j in range(qt)]].sum(axis=1).round(4)
    out = pd.DataFrame({doc_col: agg[doc_col], "score": score})
    return (out.sort_values(["score", doc_col],
                            ascending=[False, True], kind="stable")
            .head(k).reset_index(drop=True))
