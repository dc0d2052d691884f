"""HNSW approximate-nearest-neighbor graphs — the reference's actual
dense-vector index (Lucene HNSW behind x-pack ``KnnVectorQueryBuilder`` /
``DenseVectorFieldMapper.indexOptions type=hnsw``).

From-scratch implementation of the PUBLIC algorithm (Malkov & Yashunin,
"Efficient and robust approximate nearest neighbor search using Hierarchical
Navigable Small World graphs", arXiv:1603.09320): multi-layer proximity
graph, geometric level assignment, greedy descent through upper layers, ef
best-first search at the base layer.

Ray shape mirrors Lucene-in-ES exactly: ONE GRAPH PER PARTITION (Lucene
builds an HNSW per segment), each partition builds + searches its graph
inside a map_groups stage with the query matrix broadcast once, and the
driver merges the tiny per-partition top-k tables — no global graph, no
sequential global build, scale-out = more partitions."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from elasticsearch_ray.ops.ann import _batch_matrix, _normalize


class HNSWGraph:
    """In-memory HNSW over unit-normalized vectors (cosine = dot)."""

    def __init__(self, vectors: np.ndarray, m: int = 16, ef_construction: int = 100,
                 seed: int = 17):
        self.v = _normalize(np.asarray(vectors, np.float64))
        n = len(self.v)
        self.m = m
        self.m0 = 2 * m  # base-layer degree cap (paper's Mmax0)
        self.ef_c = ef_construction
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(m)
        self.levels = np.minimum(
            (-np.log(rng.random(n)) * ml).astype(np.int64), 12
        )
        # adjacency: per level, list of neighbor-id lists
        self.links: list[dict[int, list[int]]] = [
            {} for _ in range(int(self.levels.max()) + 1 if n else 1)
        ]
        self.entry = -1
        for i in range(n):
            self._insert(i)

    # -- core primitives --
    def _search_layer(self, q: np.ndarray, entry: list[int], ef: int, level: int) -> list[int]:
        """Best-first ef search on one layer → candidate ids, best first."""
        links = self.links[level]
        visited = set(entry)
        sims = {e: float(self.v[e] @ q) for e in entry}
        # max-heap of results (size ef) as min-heap on sim; candidate max-heap
        cand = [(-sims[e], e) for e in entry]
        heapq.heapify(cand)
        res = [(sims[e], e) for e in entry]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            cs, c = heapq.heappop(cand)
            if -cs < res[0][0] and len(res) >= ef:
                break
            neigh = [x for x in links.get(c, ()) if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            s = self.v[neigh] @ q  # vectorized batch of dot products
            for x, sx in zip(neigh, s.tolist()):
                if len(res) < ef or sx > res[0][0]:
                    heapq.heappush(cand, (-sx, x))
                    heapq.heappush(res, (sx, x))
                    if len(res) > ef:
                        heapq.heappop(res)
        return [e for _s, e in sorted(res, reverse=True)]

    def _select(self, q: np.ndarray, cands: list[int], m: int) -> list[int]:
        if len(cands) <= m:
            return list(cands)
        arr = np.asarray(cands)
        s = self.v[arr] @ q
        return arr[np.argsort(-s)[:m]].tolist()

    def _insert(self, i: int):
        level = int(self.levels[i])
        q = self.v[i]
        if self.entry < 0:
            for lv in range(level + 1):
                self.links[lv][i] = []
            self.entry = i
            self.entry_level = level
            return
        ep = [self.entry]
        for lv in range(self.entry_level, level, -1):
            ep = self._search_layer(q, ep, 1, lv)[:1]
        for lv in range(min(level, self.entry_level), -1, -1):
            cands = self._search_layer(q, ep, self.ef_c, lv)
            mmax = self.m0 if lv == 0 else self.m
            neigh = self._select(q, cands, self.m)
            self.links[lv][i] = list(neigh)
            for x in neigh:
                lx = self.links[lv].setdefault(x, [])
                lx.append(i)
                if len(lx) > mmax:
                    self.links[lv][x] = self._select(self.v[x], lx, mmax)
            ep = cands
        if level > self.entry_level:
            for lv in range(self.entry_level + 1, level + 1):
                self.links[lv].setdefault(i, [])
            self.entry = i
            self.entry_level = level

    def search(self, q: np.ndarray, k: int, ef: int = 50) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, cosines) for one unit query vector."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = [self.entry]
        for lv in range(self.entry_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lv)[:1]
        res = self._search_layer(q, ep, max(ef, k), 0)[:k]
        ids = np.asarray(res, np.int64)
        return ids, self.v[ids] @ q


class _PartitionHNSW:
    """map_groups stage: build ONE graph per partition group, search every
    broadcast query, emit the partition's top-k rows."""

    def __init__(self, qref, id_col, vec_col, k, m, ef_c, ef_s):
        self.qids, qm = ray.get(qref)
        self.qn = _normalize(np.asarray(qm, np.float64))
        self.id_col, self.vec_col = id_col, vec_col
        self.k, self.m, self.ef_c, self.ef_s = k, m, ef_c, ef_s

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        ids = g[self.id_col].to_numpy()
        vecs = np.stack([np.asarray(v, np.float64) for v in g[self.vec_col]])
        graph = HNSWGraph(vecs, m=self.m, ef_construction=self.ef_c)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(self.qids)):
            nn, sims = graph.search(self.qn[qi], self.k, self.ef_s)
            out_q.extend([self.qids[qi]] * len(nn))
            out_id.extend(ids[nn].tolist())
            out_sim.extend(np.asarray(sims, np.float64).tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_id, "cosine": out_sim}
        )


def hnsw_topk(ds: Dataset, query_ids, query_matrix: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding", k: int = 10, m: int = 16,
              ef_construction: int = 100, ef_search: int = 80,
              num_partitions: int = 2) -> pd.DataFrame:
    """Sharded-HNSW ANN: per-partition graphs (the Lucene segment model),
    searched in place, k·P-row driver merge. Same output schema as
    brute_topk; recall tested against the exact baseline."""
    qref = ray.put((list(query_ids), np.asarray(query_matrix, np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_part", pa.array((ids % num_partitions).astype(np.int64))
        )

    stage_args = (qref, id_col, vec_col, k, m, ef_construction, ef_search)

    def build_and_search(g: pd.DataFrame) -> pd.DataFrame:
        # construct (and cache) the stage ON THE WORKER: the closure carries
        # only the small ObjectRef, so the query matrix ships once via the
        # object store instead of inside every pickled task
        global _HNSW_STAGE_CACHE
        try:
            cache = _HNSW_STAGE_CACHE
        except NameError:
            cache = _HNSW_STAGE_CACHE = {}
        key = (qref.hex(), id_col, vec_col, k, m, ef_construction, ef_search)
        st = cache.get(key)
        if st is None:
            if len(cache) > 8:
                cache.clear()
            st = cache[key] = _PartitionHNSW(*stage_args)
        return st(g)

    partial = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(build_and_search, batch_format="pandas")
        .to_pandas()
    )
    out = (
        partial.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["cosine"] = out["cosine"].round(6)
    return out
