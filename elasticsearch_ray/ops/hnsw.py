"""HNSW approximate-nearest-neighbor graphs — the reference's actual
dense-vector index (Lucene HNSW behind x-pack ``KnnVectorQueryBuilder`` /
``DenseVectorFieldMapper.indexOptions type=hnsw``).

From-scratch implementation of the PUBLIC algorithms:

- Graph SHAPE and SEARCH follow Malkov & Yashunin, "Efficient and robust
  approximate nearest neighbor search using Hierarchical Navigable Small
  World graphs" (arXiv:1603.09320): multi-layer proximity graph, geometric
  level assignment, greedy descent through upper layers, ef best-first
  search at the base layer.
- CONSTRUCTION is vectorized wave-insert: vectors are inserted in WAVES of
  ~4096; each wave runs a fixed-round batched frontier search for all its
  members simultaneously (per round: one adjacency fancy-index, one
  ``np.take(mode='clip', out=...)`` gather into a preallocated workspace,
  one batched matmul — workspace reuse matters because first-touch pages on
  shared hosts measured ~30× slower than warm buffers), merges brute
  intra-wave candidates (repairing intra-wave blindness), prunes forward
  AND reverse links with the select-neighbors heuristic (vectorized across
  nodes; per-edge sims carried alongside the adjacency so reverse merges
  never rescore). Small layers use exact blocked kNN + the same pruning.
  Versus the round-2 per-vector Python insert loop, measured on 20k×64
  vectors: ~2.5× construction throughput at parity recall on uniform
  random data, and recall 1.00 vs 0.81 at equal time on clustered data
  (tests/test_ops.py::test_hnsw_recall_vs_brute is the gate).

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

from elasticsearch_ray.ops.ann import _batch_matrix, _normalize, brute_topk


def _topk_rows(sims: np.ndarray, k: int) -> np.ndarray:
    """Per-row top-k column indices by similarity, descending."""
    if sims.shape[1] <= k:
        return np.argsort(-sims, axis=1, kind="stable")
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    ps = np.take_along_axis(sims, part, 1)
    order = np.argsort(-ps, axis=1, kind="stable")
    return np.take_along_axis(part, order, 1)


def _symmetrize_capped(nb: np.ndarray, vv: np.ndarray, cap: int) -> np.ndarray:
    """Union of forward+reverse edges, per-node top-`cap` by cosine,
    similarity-descending. Returns (n, cap) local adjacency padded -1."""
    n, k = nb.shape
    src = np.repeat(np.arange(n, dtype=np.int64), k)
    dst = nb.ravel().astype(np.int64)
    valid = dst >= 0
    src, dst = src[valid], dst[valid]
    all_src = np.concatenate([src, dst])
    all_dst = np.concatenate([dst, src])
    key = all_src * n + all_dst
    uniq_key = np.unique(key)
    u_src = (uniq_key // n).astype(np.int64)
    u_dst = (uniq_key % n).astype(np.int64)
    s = np.einsum("ed,ed->e", vv[u_src], vv[u_dst])
    order = np.lexsort((-s, u_src))
    o_src = u_src[order]
    o_dst = u_dst[order]
    first = np.r_[0, np.flatnonzero(np.diff(o_src)) + 1]
    counts = np.diff(np.r_[first, len(o_src)])
    ranks = np.arange(len(o_src)) - np.repeat(first, counts)
    keep = ranks < cap
    out = np.full((n, cap), -1, dtype=np.int64)
    out[o_src[keep], ranks[keep]] = o_dst[keep]
    return out


def _diversify(cand: np.ndarray, vv: np.ndarray, deg: int,
               chunk: int = 8192, owners: np.ndarray | None = None) -> np.ndarray:
    """Malkov & Yashunin select-neighbors HEURISTIC, vectorized across nodes:
    walk candidates in similarity order, keep one only if it is closer to the
    owner than to every already-kept neighbor (prunes intra-cluster edges,
    preserves long-range links), then backfill pruned candidates up to `deg`
    (keepPrunedConnections). `cand` must be sim-descending, -1 padded.
    ``owners[i]`` is the global node index that owns row i (default: row i
    owns itself — only correct when cand rows are aligned with vv rows)."""
    cand = cand[:, : 2 * deg]  # sim-desc input: the heuristic + backfill
    # never look past 2·deg candidates, and the dominated matrix is O(C²)
    n, C = cand.shape
    if owners is None:
        owners = np.arange(n, dtype=np.int64)
    out = np.full((n, deg), -1, dtype=np.int64)
    out_sims = np.full((n, deg), -np.inf, dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        cc = cand[lo:hi]
        r = hi - lo
        valid = cc >= 0
        safe = np.clip(cc, 0, None)
        vc = vv[safe]
        q_sims = np.matmul(vc, vv[owners[lo:hi]][:, :, None])[:, :, 0]
        pair = np.matmul(vc, vc.transpose(0, 2, 1))
        keptmask = np.zeros((r, C), dtype=bool)
        kept_n = np.zeros(r, dtype=np.int64)
        for j in range(C):
            dominated = (pair[:, j, :] > q_sims[:, j : j + 1]) & keptmask
            ok = valid[:, j] & ~dominated.any(axis=1) & (kept_n < deg)
            keptmask[:, j] = ok
            kept_n += ok
        # kept first (sim order), then pruned (sim order), invalid last
        sort_key = (~keptmask).astype(np.int8) + (~valid).astype(np.int8) * 2
        sel = np.argsort(sort_key, axis=1, kind="stable")[:, :deg]
        picked = np.take_along_axis(cc, sel, 1)
        picked_valid = np.take_along_axis(valid, sel, 1)
        out[lo:hi] = np.where(picked_valid, picked, -1)
        out_sims[lo:hi] = np.where(
            picked_valid,
            np.take_along_axis(q_sims.astype(np.float32), sel, 1),
            -np.inf,
        )
    return out, out_sims


def _dedup_topk(ids, sims, keep):
    """Per-row dedup by id (keep best copy) then top-`keep` sim-descending.
    Returns (R, keep) ids (-1 padded) and sims. To keep the id-sort cheap on
    wide inputs, rows are first cut to the top 2·keep by similarity — any
    duplicate beyond that window could only displace entries that are
    themselves duplicates or worse."""
    R, C = ids.shape
    sims = np.where(ids < 0, -np.inf, sims)
    if C > 2 * keep:
        cut = np.argpartition(-sims, 2 * keep - 1, axis=1)[:, : 2 * keep]
        ids = np.take_along_axis(ids, cut, 1)
        sims = np.take_along_axis(sims, cut, 1)
        C = 2 * keep
    rr = np.arange(R)[:, None]
    order = np.argsort(ids, axis=1, kind="stable")
    ids_s = ids[rr, order]
    sims_s = sims[rr, order]
    dup = (ids_s[:, 1:] == ids_s[:, :-1]) & (ids_s[:, 1:] >= 0)
    # identical ids carry identical sims, so any surviving copy is "best"
    sims_s[:, 1:][dup] = -np.inf
    top = _topk_rows(sims_s, keep)
    out_ids = np.take_along_axis(ids_s, top, 1)
    out_sims = np.take_along_axis(sims_s, top, 1)
    out_ids[out_sims == -np.inf] = -1
    return out_ids, out_sims


def _ws_buf(ws: dict, name: str, shape: tuple, dtype) -> np.ndarray:
    """Workspace-cached ndarray. First-touch page faults on this class of
    host measured ~30× slower than warm reuse, so every per-round scratch
    array in the build is allocated ONCE per (shape, dtype) and reused."""
    key = (name, shape, np.dtype(dtype).str)
    a = ws.get(key)
    if a is None:
        a = ws[key] = np.empty(shape, dtype)
    return a


def _batch_search(vv, adj, qv, seed_ids, seed_sims, keep, expand=8, rounds=8,
                  ws=None):
    """Batched graph search for a WAVE of queries: each round takes every
    query's top `expand` not-yet-expanded pool entries, gathers their
    adjacency in one fancy-index, scores all neighbors with one batched
    matmul (into preallocated workspace buffers), and appends them to a
    fixed-capacity per-query candidate pool. One dedup + top-`keep` pass
    per wave at the end. Compared to a per-step best-first beam this trades
    a slightly wider frontier for ~an order of magnitude fewer numpy
    dispatches; candidate quality is gated by the recall test.
    Returns (R, keep) (ids, sims), sim-descending."""
    if ws is None:
        ws = {}
    R = len(qv)
    deg = adj.shape[1]
    S = seed_ids.shape[1]
    W = expand * deg
    A = max(128, keep)  # active-set capacity (unexpanded candidates)
    P = S + rounds * W  # fixed pool capacity → constant-shape scratch
    pool_ids = _ws_buf(ws, "pool_ids", (R, P), np.int64)
    pool_sims = _ws_buf(ws, "pool_sims", (R, P), np.float32)
    act_ids = _ws_buf(ws, "act_ids", (R, A), np.int64)
    act_sims = _ws_buf(ws, "act_sims", (R, A), np.float32)
    gbuf = _ws_buf(ws, "gather", (R * W, vv.shape[1]), vv.dtype)
    sbuf = _ws_buf(ws, "nsims", (R, W, 1), np.float32)
    pool_ids.fill(-1)
    pool_sims.fill(-np.inf)
    act_ids.fill(-1)
    act_sims.fill(-np.inf)
    pool_ids[:, :S] = seed_ids
    pool_sims[:, :S] = np.where(seed_ids < 0, -np.inf, seed_sims)
    act_ids[:, :S] = pool_ids[:, :S]
    act_sims[:, :S] = pool_sims[:, :S]
    cur = S
    for _ in range(rounds):
        # frontier: the active set is kept sim-descending (seeds arrive
        # sorted; the refresh below re-sorts), so the best `expand`
        # unexpanded candidates are simply its head — no per-round topk
        frontier = act_ids[:, :expand].copy()
        fsims = act_sims[:, :expand]
        frontier[fsims == -np.inf] = -1
        # a node can sit in the active set several times (reached via
        # different parents); drop same-row duplicate picks so each id is
        # expanded once per round
        f_sorted = np.sort(frontier, axis=1)
        fdup = np.zeros(frontier.shape, dtype=bool)
        fdup[:, 1:] = (f_sorted[:, 1:] == f_sorted[:, :-1]) & (f_sorted[:, 1:] >= 0)
        rank = np.argsort(np.argsort(frontier, axis=1, kind="stable"), axis=1)
        frontier = np.where(np.take_along_axis(fdup, rank, 1), -1, frontier)
        if (frontier < 0).all():
            break
        act_sims[:, :expand] = -np.inf
        neigh = adj[np.clip(frontier, 0, None)].reshape(R, -1)  # (R, W)
        neigh[np.repeat(frontier < 0, deg, axis=1)] = -1
        np.take(vv, neigh.ravel(), axis=0, out=gbuf, mode="clip")
        np.matmul(gbuf.reshape(R, W, -1), qv[:, :, None], out=sbuf)
        nsims = sbuf[:, :, 0]
        nsims[neigh < 0] = -np.inf
        pool_ids[:, cur:cur + W] = neigh
        pool_sims[:, cur:cur + W] = nsims
        cur += W
        # refresh active set: survivors + this round's neighbors, top-A
        cat_sims = np.concatenate([act_sims, nsims], axis=1)
        cat_ids = np.concatenate([act_ids, neigh], axis=1)
        keep_a = _topk_rows(cat_sims, A)
        act_ids[:] = np.take_along_axis(cat_ids, keep_a, 1)
        act_sims[:] = np.take_along_axis(cat_sims, keep_a, 1)
    return _dedup_topk(pool_ids, pool_sims, keep)


def _wave_insert(vv, deg, ef, rng, first=1024, wave=4096):
    """Build one layer's graph by WAVES of simultaneous HNSW inserts: a
    bootstrap exact core, then per-wave batched graph search against the
    graph so far (+ intra-wave brute candidates), diversity-pruned forward
    links, and capped reverse links (plain per-node top-`deg` by similarity
    — a documented simplification of the paper's shrink step; recall-gated).
    Per-edge similarities are carried alongside the adjacency so reverse
    updates never rescore."""
    n = len(vv)
    adj = np.full((n, deg), -1, dtype=np.int64)
    adj_s = np.full((n, deg), -np.inf, dtype=np.float32)
    k0 = min(first, n)
    sims0 = vv[:k0] @ vv[:k0].T
    np.fill_diagonal(sims0, -np.inf)
    nb0 = _topk_rows(sims0, min(2 * deg, k0 - 1))
    adj[:k0], adj_s[:k0] = _diversify(nb0, vv, deg)
    rounds = max(3, min(12, ef // 10))
    ws: dict = {}
    for lo in range(k0, n, wave):
        hi = min(lo + wave, n)
        qv = vv[lo:hi]
        # seeds: top-4 within the bootstrap core (one matmul)
        core = qv @ vv[:k0].T
        seed_ids = _topk_rows(core, min(4, k0))
        seed_sims = np.take_along_axis(core, seed_ids, 1)
        beam_ids, beam_sims = _batch_search(
            vv, adj, qv, seed_ids, seed_sims, keep=2 * deg, rounds=rounds,
            ws=ws,
        )
        # intra-wave candidates: brute within the wave (nodes inserted in
        # the same wave cannot see each other through the graph yet)
        wsims = qv @ qv.T
        np.fill_diagonal(wsims, -np.inf)
        wk = min(deg, hi - lo - 1)
        if wk > 0:
            wtop = _topk_rows(wsims, wk) + lo
            wts = np.take_along_axis(wsims, wtop - lo, 1).astype(np.float32)
            cand_ids = np.concatenate([beam_ids, wtop], axis=1)
            cand_sims = np.concatenate([beam_sims, wts], axis=1)
        else:
            cand_ids, cand_sims = beam_ids, beam_sims
        order = np.argsort(-cand_sims, axis=1, kind="stable")
        cand_sorted = np.take_along_axis(cand_ids, order, 1)
        cand_sorted[np.take_along_axis(cand_sims, order, 1) == -np.inf] = -1
        sel, sel_s = _diversify(cand_sorted, vv, deg,
                                owners=np.arange(lo, hi, dtype=np.int64))
        adj[lo:hi] = sel
        adj_s[lo:hi] = sel_s
        # reverse links: append each new node to its selected neighbors,
        # keeping each touched neighbor's best `deg` links by similarity
        src = np.repeat(np.arange(lo, hi, dtype=np.int64), sel.shape[1])
        dst = sel.ravel()
        ssim = sel_s.ravel()
        ok = dst >= 0
        src, dst, ssim = src[ok], dst[ok], ssim[ok]
        if len(dst):
            uniq, inv, cnt = np.unique(dst, return_inverse=True, return_counts=True)
            width = int(cnt.max())
            newmat = np.full((len(uniq), width), -1, dtype=np.int64)
            newsim = np.full((len(uniq), width), -np.inf, dtype=np.float32)
            order2 = np.argsort(inv, kind="stable")
            ranks = np.arange(len(inv)) - np.repeat(
                np.r_[0, np.cumsum(cnt)[:-1]], cnt)
            newmat[inv[order2], ranks] = src[order2]
            newsim[inv[order2], ranks] = ssim[order2]
            cand2 = np.concatenate([adj[uniq], newmat], axis=1)
            s2 = np.concatenate([adj_s[uniq], newsim], axis=1)
            # shrink with the same select-neighbors heuristic (plain top-k
            # here measurably degrades the graph: every touched node loses
            # its diversified long-range links within a few waves); cap the
            # candidate window at deg+8 to bound the O(C²) pair matmul
            merged_ids, merged_sims = _dedup_topk(cand2, s2, deg + 8)
            div_ids, div_sims = _diversify(merged_ids, vv, deg, owners=uniq)
            adj[uniq] = div_ids
            adj_s[uniq] = div_sims
    return adj


def _knn_graph(vv: np.ndarray, deg: int, rng: np.random.Generator,
               ef: int = 100) -> np.ndarray:
    """One layer's adjacency over unit vectors (local indices, (n, deg),
    -1 padded, sim-descending): exact blocked kNN + diversity pruning for
    small layers, batched wave-insert (true ef-search semantics) otherwise."""
    n = len(vv)
    vv = vv.astype(np.float32)  # construction in fp32: half the bandwidth
    k = min(deg, n - 1)
    if k <= 0:
        return np.full((n, max(deg, 1)), -1, dtype=np.int64)
    if n <= 4096:
        sims = vv @ vv.T
        np.fill_diagonal(sims, -np.inf)
        nb = _topk_rows(sims, min(2 * deg, n - 1))
        merged = _symmetrize_capped(nb, vv, 2 * deg)
        return _diversify(merged, vv, deg)[0]
    return _wave_insert(vv, deg, ef, rng)


class HNSWGraph:
    """In-memory HNSW over unit-normalized vectors (cosine = dot).
    Construction is layer-at-a-time batched wave-insert (module docstring);
    search is the standard greedy-descent + ef best-first of the paper."""

    def __init__(self, vectors: np.ndarray, m: int = 16, ef_construction: int = 100,
                 seed: int = 17):
        self.v = _normalize(np.asarray(vectors, np.float64))
        n = len(self.v)
        self.m = m
        self.m0 = 2 * m  # base-layer degree cap (paper's Mmax0)
        self.ef_c = ef_construction  # kept for API compat; drives iters below
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(m)
        self.levels = (
            np.minimum((-np.log(rng.random(n)) * ml).astype(np.int64), 12)
            if n else np.zeros(0, np.int64)
        )
        if not n:
            self.entry = -1
            self.entry_level = 0
            self.adj: list[np.ndarray] = []
            self.pos: list[np.ndarray] = []
            return
        max_level = int(self.levels.max())
        self.adj = []
        self.pos = []
        for lv in range(max_level + 1):
            sub = np.flatnonzero(self.levels >= lv)
            deg = self.m0 if lv == 0 else self.m
            local = _knn_graph(self.v[sub], deg, rng, ef=ef_construction)
            # local → global ids, keep -1 padding
            glob = np.where(local >= 0, sub[np.clip(local, 0, None)], -1)
            pos = np.full(n, -1, dtype=np.int64)
            pos[sub] = np.arange(len(sub))
            self.adj.append(glob)
            self.pos.append(pos)
        self.entry = int(np.flatnonzero(self.levels == max_level)[0])
        self.entry_level = max_level

    @classmethod
    def from_state(cls, v: np.ndarray, levels: np.ndarray, entry: int,
                   entry_level: int, adj: list, pos: list, m: int) -> "HNSWGraph":
        """Rehydrate a graph from persisted arrays (index/vectors.py) —
        no construction work; `v` / `adj` / `pos` may be numpy memmaps so
        a warm searcher touches only the pages the traversal visits (the
        Lucene model: HNSW segment files written once at index time,
        Lucene91HnswVectorsFormat)."""
        g = cls.__new__(cls)
        g.v = v
        g.levels = levels
        g.m = m
        g.m0 = 2 * m
        g.ef_c = 0
        g.entry = int(entry)
        g.entry_level = int(entry_level)
        g.adj = list(adj)
        g.pos = list(pos)
        return g

    # -- core primitives --
    def _neighbors(self, c: int, level: int) -> np.ndarray:
        row = self.pos[level][c]
        if row < 0:
            return np.empty(0, np.int64)
        a = self.adj[level][row]
        return a[a >= 0]

    def _search_layer(self, q: np.ndarray, entry: list[int], ef: int, level: int) -> list[int]:
        """Best-first ef search on one layer → candidate ids, best first."""
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
            neigh = [x for x in self._neighbors(c, level).tolist() if x not in visited]
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

    def _search_layer_filtered(self, q: np.ndarray, entry: list[int], ef: int,
                               accept: np.ndarray,
                               max_visited: int | None) -> list[int] | None:
        """Base-layer ef search with an ACCEPTANCE bitmask (Lucene's
        filtered ``KnnVectorQuery``): every node is traversable (routing
        must cross non-matching regions of the graph), but only accepted
        nodes enter the result heap. Returns ``None`` when more than
        ``max_visited`` nodes were scored — at that point a brute scan of
        the survivors is cheaper AND exact, so the caller falls back
        (Lucene's visited-limit → exact-scan rule)."""
        visited = set(entry)
        cand: list[tuple[float, int]] = []
        res: list[tuple[float, int]] = []
        for e in entry:
            s = float(self.v[e] @ q)
            heapq.heappush(cand, (-s, e))
            if accept[e]:
                heapq.heappush(res, (s, e))
        while len(res) > ef:
            heapq.heappop(res)
        nvis = len(visited)
        while cand:
            cs, c = heapq.heappop(cand)
            if len(res) >= ef and -cs < res[0][0]:
                break
            neigh = [x for x in self._neighbors(c, 0).tolist()
                     if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            nvis += len(neigh)
            if max_visited is not None and nvis > max_visited:
                return None
            s = self.v[neigh] @ q
            floor = res[0][0] if len(res) >= ef else -np.inf
            for x, sx in zip(neigh, s.tolist()):
                if sx > floor or len(res) < ef:
                    heapq.heappush(cand, (-sx, x))
                    if accept[x]:
                        heapq.heappush(res, (sx, x))
                        if len(res) > ef:
                            heapq.heappop(res)
                            floor = res[0][0]
        return [e for _s, e in sorted(res, reverse=True)]

    def search_filtered(self, q: np.ndarray, k: int, ef: int,
                        accept: np.ndarray,
                        max_visited: int | None = None
                        ) -> tuple[np.ndarray, np.ndarray] | None:
        """Top-k over ONLY the nodes where ``accept`` is True. Upper-layer
        greedy descent is unfiltered (it is pure routing); the base layer
        collects accepted nodes. Returns ``None`` if the traversal scored
        more than ``max_visited`` nodes (caller must brute-scan the
        survivors instead — exact and cheaper)."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = [self.entry]
        for lv in range(self.entry_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lv)[:1]
        res = self._search_layer_filtered(q, ep, max(ef, k), accept,
                                          max_visited)
        if res is None:
            return None
        ids = np.asarray(res[:k], np.int64)
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


def knn_search(ds: Dataset, query, id_col: str = "vec_id",
               num_partitions: int = 2) -> pd.DataFrame:
    """Execute a parsed ``knn`` DSL clause (search.query.KnnQuery — x-pack
    ``KnnVectorQueryBuilder``) over a dense-vector Dataset.

    Routing mirrors the reference's per-shard exploration budget:
    ``num_candidates`` below the table size → per-partition HNSW graphs with
    ef = num_candidates; ``num_candidates`` covering the table → exact brute
    force (the exhaustive fallback). Scores use the reference's cosine
    mapping ``boost · (1 + cos) / 2`` (DenseVectorFieldMapper cosine
    similarity); ``similarity`` drops hits below the raw-cosine floor.
    Returns (id_col, _score), score-descending with id ascending tiebreak.
    Cosines arrive pre-rounded to 6 decimals from brute/hnsw_topk, so
    scores are quantized at 5e-7 — inside the 4-decimal oracle rounding."""
    qm = np.asarray([query.query_vector], np.float64)
    if query.filter:
        # PRE-filter (KnnVectorQueryBuilder#filter): candidates restrict
        # BEFORE k selection — the brute leg scores only survivors, and the
        # HNSW leg builds its per-partition graphs over survivors (graphs
        # are per-call here, so pre-filtering is exact, not a traversal
        # approximation)
        pairs = tuple(query.filter)
        avail = set(ds.schema().names)
        missing = [c for c, _v in pairs if c not in avail]
        if missing:
            # fail fast with a clear error instead of a KeyError buried in
            # a Ray worker traceback
            raise ValueError(f"knn filter column(s) {missing} not in the "
                             f"vector table; available: {sorted(avail)}")

        def _flt(batch: pa.Table) -> pa.Table:
            mask = np.ones(len(batch), bool)
            for col, val in pairs:
                mask &= batch[col].to_numpy(zero_copy_only=False) == val
            return batch.filter(pa.array(mask))

        # materialize the survivors once: count() would otherwise run the
        # full filter pass and brute/hnsw would re-execute the lineage
        ds = ds.map_batches(_flt, batch_format="pyarrow").materialize()
    n = ds.count()
    if query.num_candidates >= n:
        hits = brute_topk(ds, [0], qm, id_col=id_col, vec_col=query.field,
                          k=query.k)
    else:
        hits = hnsw_topk(ds, [0], qm, id_col=id_col, vec_col=query.field,
                         k=query.k, ef_search=query.num_candidates,
                         num_partitions=num_partitions)
    if query.similarity is not None:
        hits = hits[hits["cosine"] >= query.similarity]
    out = pd.DataFrame({
        id_col: hits["neighbor_id"].to_numpy(),
        "_score": query.boost * (1.0 + hits["cosine"].to_numpy()) / 2.0,
    })
    return out.sort_values(["_score", id_col], ascending=[False, True],
                           ignore_index=True)
