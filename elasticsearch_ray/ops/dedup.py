"""Deduplication operators for large-scale training-data pipelines.

The reference's dedup surface is exact-by-_id upsert (``LiveVersionMap``,
``InternalEngine.java:132``) and the ``min_hash`` token filter
(``CommonAnalysisPlugin.java:284``); we provide the full training-data set:
exact hash dedup, MinHash+LSH, SimHash, and n-gram Jaccard verification.

Scale shapes:
  - exact: content-hash column in a map stage → groupby(hash) min-id
    aggregate (vectorized, no per-group Python);
  - MinHash-LSH: per-batch vectorized signatures → explode to
    (band, band_hash, doc_id) rows → groupby bands → candidate pairs →
    Jaccard verify over distributed shingle-hash arrays (the candidate-id
    set, small by the LSH premise, is the only broadcast);
  - SimHash: 4×16-bit chunk banding as the same distributed groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min


def add_content_hash(ds: Dataset, cols: list[str], out_col: str = "content_hash") -> Dataset:
    """128-bit content hash, fully vectorized: two independent stable 64-bit
    hashes per column (pd.util.hash_array with distinct keys — process-safe,
    unlike salted hash()) mixed with a polynomial combine, hexed in bulk via
    one hexlify over the packed buffer. No per-row Python."""
    import binascii

    def h(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        C = np.uint64(0x9E3779B97F4A7C15)
        acc1 = np.full(n, np.uint64(0x243F6A8885A308D3), np.uint64)
        acc2 = np.full(n, np.uint64(0x13198A2E03707344), np.uint64)
        for c in cols:
            vals = batch[c].cast(pa.string()).to_pandas().fillna("").to_numpy(dtype=object)
            acc1 = (acc1 * C) ^ pd.util.hash_array(vals, hash_key="esray-contenth-1")
            acc2 = (acc2 * C) ^ pd.util.hash_array(vals, hash_key="esray-contenth-2")
        packed = np.column_stack([acc1, acc2]).astype(">u8").tobytes()
        hexes = np.frombuffer(binascii.hexlify(packed), dtype="S32").astype("U32")
        return batch.append_column(out_col, pa.array(hexes, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow")


def exact_dedup_keep_ids(ds: Dataset, cols: list[str], id_col: str) -> pd.DataFrame:
    """Exact dedup: first (min id) doc per distinct content → kept ids,
    sorted. groupby on the hash key — one shuffle of (hash, id) pairs only."""
    hashed = add_content_hash(ds, cols).select_columns(["content_hash", id_col])
    out = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col)).to_pandas()
    return out[[id_col]].sort_values(id_col).reset_index(drop=True)


def _shingle_hashes(texts: list, k: int) -> list[np.ndarray]:
    """Per doc: unique uint64 hashes of its k-token shingles — VECTORIZED.

    All tokens in the batch are hashed in ONE pd.util.hash_array call (stable
    siphash, fixed key — safe across workers, unlike process-salted hash());
    shingle hashes are a polynomial combine of k token-hash windows (numpy
    strided, no per-shingle Python/string work)."""
    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return [np.empty(0, np.uint64) for _ in texts]
    all_toks = np.empty(total, dtype=object)
    pos = 0
    for t in toks_per_doc:
        all_toks[pos : pos + len(t)] = t
        pos += len(t)
    th = pd.util.hash_array(all_toks)  # uint64
    C = np.uint64(0x9E3779B97F4A7C15)
    out: list[np.ndarray] = []
    pos = 0
    for n in lens.tolist():
        h = th[pos : pos + n]
        pos += n
        if n == 0:
            out.append(np.empty(0, np.uint64))
        elif n < k:
            s = np.uint64(0)
            for x in h:
                s = s * C + x
            out.append(np.array([s], np.uint64))
        else:
            acc = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc * C + h[j : j + n - k + 1]
            out.append(np.unique(acc))
    return out


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHashBatch:
    """Stage: text → (band, band_hash, doc_id) LSH bucket rows.

    Fully vectorized across the batch: one token-hash pass, per-permutation
    (a·x+b) mod p over the batch's concatenated shingle stream with a
    minimum.reduceat over doc boundaries (no per-doc signature loop), band
    keys via a polynomial combine of the band's signature columns."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16,
                 shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm, seed)

    def _signatures(self, sh_list: list[np.ndarray]) -> np.ndarray:
        """(ndocs, num_perm) uint64 signatures; empty docs = MERSENNE fill."""
        ndocs = len(sh_list)
        sigs = np.full((ndocs, self.num_perm), _MERSENNE, dtype=np.uint64)
        nonempty = [i for i, s in enumerate(sh_list) if len(s)]
        if not nonempty:
            return sigs
        x = np.concatenate([sh_list[i] for i in nonempty]) % np.uint64(_MERSENNE)
        seg_lens = np.array([len(sh_list[i]) for i in nonempty], dtype=np.int64)
        starts = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(seg_lens[:-1], out=starts[1:])
        M = np.uint64(_MERSENNE)
        for j in range(self.num_perm):
            v = (self.a[j] * x + self.b[j]) % M
            sigs[nonempty, j] = np.minimum.reduceat(v, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sigs = self._signatures(_shingle_hashes(texts, self.k))
        n = len(ids)
        # band key: polynomial combine over the band's columns (uint64 wrap)
        C = np.uint64(0x9E3779B97F4A7C15)
        r = sigs.reshape(n, self.bands, self.rows_per_band)
        keys = np.zeros((n, self.bands), dtype=np.uint64)
        for j in range(self.rows_per_band):
            keys = keys * C + r[:, :, j]
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(keys.reshape(-1).view(np.int64)),
                self.id_col: pa.array(np.repeat(ids, self.bands)),
            }
        )


def jaccard_arrays(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard over unique hash arrays (== shingle-set Jaccard w.h.p.)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / max(len(a) + len(b) - inter, 1)


def minhash_candidate_pairs(ds: Dataset, text_col: str, id_col: str, num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3, seed: int = 7,
                            bucket_cap: int = 64) -> pd.DataFrame:
    """LSH bucket groupby → unique candidate pairs (id_a < id_b), sorted.

    Buckets larger than ``bucket_cap`` (templated/boilerplate pages that
    survive exact dedup land every copy in the SAME band bucket) do NOT
    emit all C(n,2) pairs — that degrades to quadratic pair volume on a
    degenerate corpus (round-3 verdict #2). Instead an oversized bucket
    emits a sorted CHAIN over its members: n-1 pairs (linear, full
    coverage), which keeps the mega cluster CONNECTED for the downstream
    connected-components stage (the near-dup CLUSTER dedup consumer).
    Tradeoff made explicit: the chain assumes an oversized bucket is
    dominated by one near-identical cluster (the templated-pages case the
    cap exists for). A COLLISION-MIXED mega bucket can fragment — a
    dissimilar chain link fails the exact-Jaccard verify and the pair it
    bridged is never emitted — but a true near-dup pair agrees on ~all
    ``bands`` buckets, so it still surfaces intact from any of its
    other, non-oversized buckets; only pairs whose EVERY shared bucket is
    oversized-and-mixed can be missed, which requires a corpus that is
    degenerate at the scale of bucket_cap in every band."""
    buckets = ds.map_batches(
        MinHashBatch,
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed),
        batch_format="pyarrow",
        concurrency=2,
    )
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy(dtype=np.int64))
        n = len(ids)
        if n < 2:
            # typed empty: object-dtype blocks from singleton buckets would
            # fight int64 blocks at schema unification (simhash hardening)
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        if n > bucket_cap:
            import logging

            logging.getLogger(__name__).warning(
                "minhash LSH: hot bucket of %d docs emits an n-1 chain "
                "instead of C(n,2) pairs (band=%s)", n,
                int(g["band"].iloc[0]))
            return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
        lst = ids.tolist()
        out = [(a, b) for i, a in enumerate(lst) for b in lst[i + 1:]]
        return pd.DataFrame(out, columns=["id_a", "id_b"]).astype("int64")

    cand = buckets.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    pdf = cand.to_pandas().drop_duplicates().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pdf


def _verify_jaccard(ds: Dataset, cand: pd.DataFrame, text_col: str, id_col: str,
                    shingle_k: int, threshold: float) -> pd.DataFrame:
    """Exact shingle-Jaccard verify of candidate pairs, never shipping corpus
    text to the driver: the (small, candidate-premise) id set is broadcast
    once via ray.put, shingle-hash arrays are computed DISTRIBUTED inside
    map_batches for candidate docs only, and only those |candidates| rows of
    uint64 hashes come back for the pairwise check."""
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    import ray

    need_ref = ray.put(frozenset(set(cand["id_a"]) | set(cand["id_b"])))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        ids = batch[id_col].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in need]
        texts = batch[text_col].to_pylist()
        sh = _shingle_hashes([texts[i] for i in keep], shingle_k)
        lens = np.array([len(s) for s in sh], dtype=np.int32)
        offs = np.zeros(len(sh) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        vals = np.concatenate(sh).view(np.int64) if sh else np.empty(0, np.int64)
        return pa.table(
            {
                id_col: pa.array([ids[i] for i in keep]),
                "sh": pa.ListArray.from_arrays(pa.array(offs), pa.array(vals, pa.int64())),
            }
        )

    sh_tbl = ds.map_batches(cand_shingles, batch_format="pyarrow").to_pandas()
    shd = {
        row[id_col]: np.asarray(row["sh"], np.int64).view(np.uint64)
        for _, row in sh_tbl.iterrows()
    }
    cand = cand.copy()
    cand["jaccard"] = [
        round(jaccard_arrays(shd[a], shd[b]), 6) for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    return cand[cand["jaccard"] >= threshold].reset_index(drop=True)


def minhash_near_dups(ds: Dataset, text_col: str, id_col: str, threshold: float = 0.8,
                      shingle_k: int = 3, **kw) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates + exact shingle-Jaccard verify
    (distributed, see _verify_jaccard)."""
    cand = minhash_candidate_pairs(ds, text_col, id_col, shingle_k=shingle_k, **kw)
    return _verify_jaccard(ds, cand, text_col, id_col, shingle_k, threshold)


def ngram_jaccard_candidates(ds: Dataset, text_col: str, id_col: str, shingle_k: int = 5,
                             sketch_m: int = 8, bucket_cap: int = 64) -> pd.DataFrame:
    """n-gram-Jaccard candidate pairs WITHOUT MinHash: each doc emits its
    bottom-``sketch_m`` shingle hashes (a deterministic bottom-M sketch — the
    one-permutation analog of minhashing); an inverted-shingle groupby then
    pairs docs sharing a sketch element. Buckets over ``bucket_cap`` (shingles
    common to many docs) are dropped — they carry no near-DUPLICATE signal
    and would otherwise quadratically blow up a hot shingle. Never all-pairs."""

    def sketch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = _shingle_hashes(texts, shingle_k)
        bottoms = [np.sort(s)[:sketch_m] for s in sh]
        lens = np.array([len(b) for b in bottoms], dtype=np.int64)
        vals = np.concatenate(bottoms) if bottoms else np.empty(0, np.uint64)
        return pa.table(
            {
                "sh": pa.array(vals.view(np.int64), pa.int64()),
                id_col: pa.array(np.repeat(ids, lens)),
            }
        )

    rows = ds.map_batches(sketch, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > bucket_cap:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ids = sorted(set(g[id_col].tolist()))
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["id_a", "id_b"])

    cand = rows.groupby("sh").map_groups(pairs, batch_format="pandas")
    return cand.to_pandas().drop_duplicates().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_dups(ds: Dataset, text_col: str, id_col: str, threshold: float = 0.8,
                       shingle_k: int = 5, sketch_m: int = 8,
                       bucket_cap: int = 64) -> pd.DataFrame:
    """n-gram Jaccard near-dup pairs: bottom-M shingle-sketch candidates +
    exact shingle-Jaccard verify. Fully deterministic (stable siphash), no
    random permutations."""
    cand = ngram_jaccard_candidates(ds, text_col, id_col, shingle_k, sketch_m, bucket_cap)
    return _verify_jaccard(ds, cand, text_col, id_col, shingle_k, threshold)


def embedding_near_dups(ds: Dataset, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95, ncells: int = 16, sample_n: int = 2048,
                        seed: int = 11) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: IVF-bucket the vectors (k-means cells
    from a driver-side sample), then exact pairwise cosine WITHIN each cell —
    the all-pairs matmul never materializes; work is Σ cell²/2 instead of N²/2.
    Boundary pairs straddling cells are missed like any single-probe IVF
    (raise ncells probes / lower threshold margin at scale)."""
    import numpy as np

    from elasticsearch_ray.ops.ann import _batch_matrix, _kmeans, _normalize

    import ray

    sample, need = [], sample_n
    for batch in ds.select_columns([vec_col]).iter_batches(batch_format="pyarrow"):
        sample.append(_batch_matrix(batch, vec_col))
        need -= len(batch)
        if need <= 0:
            break
    cent = _normalize(_kmeans(np.concatenate(sample)[:sample_n], ncells, seed=seed))
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_batch_matrix(batch, vec_col))
        cells = (x @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cell": pa.array(cells),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack([np.asarray(v, np.float64) for v in g[vec_col]]))
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[iu[0][mask]], ids[iu[1][mask]]),
                "id_b": np.maximum(ids[iu[0][mask]], ids[iu[1][mask]]),
                "cosine": np.round(sims[iu][mask], 6),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "id_a" not in out.columns:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def semdedup(ds: Dataset, id_col: str = "vec_id",
             vec_col: str = "embedding", eps: float = 0.05,
             ncells: int = 16, sample_n: int = 2048, seed: int = 11,
             cluster_cap: int = 20000) -> pd.DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    k-means clustering then WITHIN-cluster ε-ball pruning — two items
    are semantic duplicates when their cosine similarity exceeds
    ``1 - eps``; within each duplicate group ONE representative is kept,
    preferring the item with the LOWEST cosine to its cluster centroid
    (the paper's keep-farthest rule, §3).

    Ray shape: centroids from a driver sample (broadcast once), one
    vectorized assignment pass, then a ``groupby(cell).map_groups``
    greedy sweep — work is Σ cell², never N². The greedy order (cosine
    to centroid ASCENDING, id tie-break) makes the survivor set
    deterministic and keep-farthest by construction: an item is dropped
    iff it is within ε of an ALREADY-KEPT (farther-from-centroid) item.
    Clusters larger than ``cluster_cap`` are swept in consecutive
    chunks of that size along the same order (documented approximation:
    cross-chunk duplicates survive, connectivity within a chunk is
    exact — the same cap discipline as the LSH hot-bucket chain).

    Returns a frame of DROPPED ids with their kept representative:
    ``(drop_id, kept_id, cosine)`` — feed the drop set to a filter, as
    in :func:`exact_dedup`.
    """
    from elasticsearch_ray.ops.ann import _batch_matrix, _kmeans, _normalize

    import ray

    sample, need = [], sample_n
    for batch in ds.select_columns([vec_col]).iter_batches(
            batch_format="pyarrow"):
        sample.append(_batch_matrix(batch, vec_col))
        need -= len(batch)
        if need <= 0:
            break
    cent = _normalize(_kmeans(np.concatenate(sample)[:sample_n], ncells,
                              seed=seed))
    cent_ref = ray.put(cent)
    thr = 1.0 - eps

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _normalize(_batch_matrix(batch, vec_col))
        sims = x @ c.T
        cells = sims.argmax(axis=1).astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            vec_col: batch[vec_col],
            "cell": pa.array(cells),
            "cent_cos": pa.array(sims[np.arange(len(cells)), cells]),
        })

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # keep-farthest greedy: ascending centroid-cosine, id tie-break
        g = g.sort_values(["cent_cos", id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack([np.asarray(v, np.float64)
                                 for v in g[vec_col]]))
        drops, keeps, coss = [], [], []
        for lo in range(0, len(ids), cluster_cap):
            chunk = m[lo:lo + cluster_cap]
            cids = ids[lo:lo + cluster_cap]
            sims = chunk @ chunk.T
            kept_idx: list[int] = []
            for i in range(len(cids)):
                if kept_idx:
                    s = sims[i, kept_idx]
                    j = int(np.argmax(s))
                    if s[j] >= thr:
                        drops.append(cids[i])
                        keeps.append(cids[kept_idx[j]])
                        coss.append(float(s[j]))
                        continue
                kept_idx.append(i)
        return pd.DataFrame({
            "drop_id": np.asarray(drops, dtype=ids.dtype),
            "kept_id": np.asarray(keeps, dtype=ids.dtype),
            "cosine": np.round(np.asarray(coss, np.float64), 6),
        })

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("cell")
           .map_groups(sweep, batch_format="pandas")
           .to_pandas())
    if out.empty or "drop_id" not in out.columns:
        return pd.DataFrame({"drop_id": pd.Series([], dtype="int64"),
                             "kept_id": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return out.sort_values("drop_id").reset_index(drop=True)


class SimHashBatch:
    """64-bit SimHash per doc (Charikar): sign-sum of token hashes.

    Vectorized across the batch: one stable token-hash pass, bit expansion
    via unpackbits, per-doc column sums via add.reduceat."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        toks_per_doc = [(t or "").split() for t in texts]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.uint64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            all_toks = np.empty(int(lens.sum()), dtype=object)
            pos = 0
            for t in toks_per_doc:
                all_toks[pos : pos + len(t)] = t
                pos += len(t)
            th = pd.util.hash_array(all_toks)
            bits = np.unpackbits(
                th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)
            ne_lens = lens[nonempty]
            starts = np.zeros(len(nonempty), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=starts[1:])
            sums = np.add.reduceat(bits, starts, axis=0)
            v = 2 * sums - ne_lens[:, None]
            packed = np.packbits((v > 0).astype(np.uint8), axis=1, bitorder="little")
            out[nonempty] = packed.view(np.uint64).ravel()
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(out, pa.uint64())})


def simhash_table(ds: Dataset, text_col: str, id_col: str) -> pd.DataFrame:
    t = ds.map_batches(
        SimHashBatch, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    return t.sort_values(id_col).reset_index(drop=True)


def simhash_near_dups(ds: Dataset, text_col: str, id_col: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dups by SimHash hamming distance, banded on 4×16-bit chunks (a
    pair within hamming ≤3 shares at least one exact chunk — pigeonhole).

    DISTRIBUTED banding: each doc explodes to 4 (chunk, key) rows, the
    groupby shuffles bucket rows (never the corpus to the driver), and the
    pairwise hamming check runs vectorized inside map_groups — the same
    banded-groupby shape as the MinHash path."""
    sims = ds.map_batches(
        SimHashBatch, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(s)
        keys = np.empty((n, 4), dtype=np.int64)
        for c in range(4):
            keys[:, c] = ((s >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "key": pa.array(keys.reshape(-1)),
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(s, 4).view(np.int64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        iu = np.triu_indices(len(ids), k=1)
        x = sh[iu[0]] ^ sh[iu[1]]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        if not m.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[iu[0][m]], ids[iu[1][m]]),
                "id_b": np.maximum(ids[iu[0][m]], ids[iu[1][m]]),
                "hamming": ham[m],
            }
        )

    out = (
        sims.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["chunk", "key"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return (
        out.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonicalization for training-data dedup: lowercase,
    drop the fragment, drop a trailing slash, drop a leading www. after the
    scheme — the standard Common-Crawl-style canonical key (each step is a C
    regex pass; the DuckDB oracle applies the identical chain)."""
    s = urls.astype(str).str.lower()
    s = s.str.replace(r"#.*$", "", regex=True)
    s = s.str.replace(r"/$", "", regex=True)
    s = s.str.replace(r"^(https?://)www\.", r"\1", regex=True)
    return s


def url_dedup_keep_ids(ds: Dataset, url_col: str, id_col: str) -> pd.DataFrame:
    """URL-canonical dedup: first (min id) doc per normalized URL — one
    (norm_url, id) shuffle, like exact_dedup_keep_ids."""

    def norm(batch: pa.Table) -> pa.Table:
        u = normalize_urls(batch[url_col].to_pandas())
        return pa.table({"url_norm": pa.Array.from_pandas(u), id_col: batch[id_col]})

    out = (
        ds.map_batches(norm, batch_format="pyarrow")
        .groupby("url_norm")
        .aggregate(Min(id_col, alias_name=id_col))
        .to_pandas()
    )
    return out[[id_col, "url_norm"]].sort_values(id_col).reset_index(drop=True)


def decontaminate(ds: Dataset, benchmark_texts, text_col: str = "text",
                  ngram: int = 13, mode: str = "drop") -> Dataset:
    """Benchmark decontamination — the published training-data practice
    (GPT-3 appendix C / The Pile: remove training docs sharing any word
    n-gram with an eval/test set, 13-grams being the canonical window).

    Scale shape: the benchmark side is tiny next to the corpus, so its
    n-gram hash SET broadcasts once via ray.put; each batch computes its
    docs' shingle hashes with the vectorized `_shingle_hashes` kernel and
    membership-checks them in one searchsorted pass (per-doc verdicts via
    reduceat) — the corpus streams, nothing corpus-sized centralizes.

    Benchmark texts SHORTER than ``ngram`` are matched at their own whole
    length (the min(len, N)-gram rule the published pipelines use): a
    6-token eval question still contaminates any doc containing those 6
    tokens verbatim — without this, short eval entries would silently pass.

    mode="drop" filters contaminated docs out; mode="flag" appends a
    boolean ``contaminated`` column instead (for audit pipelines)."""
    import ray

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    # per effective window length k = min(len(bench_text), ngram): the set
    # of bench k-gram hashes; the corpus side must hash at the SAME k
    by_k: dict[int, list] = {}
    for t in benchmark_texts:
        toks = (t or "").split()
        if not toks:
            continue
        by_k.setdefault(min(len(toks), ngram), []).append(" ".join(toks))
    bench_by_k = {
        k: np.unique(np.concatenate(_shingle_hashes(texts, k)))
        for k, texts in by_k.items()
    }
    bench_by_k = {k: v for k, v in bench_by_k.items() if len(v)}
    ref = ray.put(bench_by_k)  # arrays sorted by np.unique

    def _member_any(sh: list, b: np.ndarray) -> np.ndarray:
        lens = np.array([len(s) for s in sh], dtype=np.int64)
        out = np.zeros(len(sh), bool)
        if lens.sum() == 0:
            return out
        flat = np.concatenate([s for s in sh if len(s)])
        idx = np.searchsorted(b, flat)
        member = (idx < len(b)) & (b[np.clip(idx, 0, len(b) - 1)] == flat)
        nz = lens > 0
        offs = np.zeros(int(nz.sum()), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=offs[1:])
        out[nz] = np.maximum.reduceat(member.astype(np.int8), offs) > 0
        return out

    def verdicts(batch: pa.Table) -> np.ndarray:
        bk = ray.get(ref)
        texts = batch[text_col].to_pylist()
        out = np.zeros(len(texts), bool)
        for k, b in bk.items():
            out |= _member_any(_shingle_hashes(texts, k), b)
        return out

    if mode == "flag":
        def flag(batch: pa.Table) -> pa.Table:
            return batch.append_column("contaminated", pa.array(verdicts(batch)))

        return ds.map_batches(flag, batch_format="pyarrow")

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~verdicts(batch)))

    return ds.map_batches(drop, batch_format="pyarrow")


# --------------------------------------------------- paragraph-level dedup


def _explode_paragraphs(df: pd.DataFrame, text_col: str, id_col: str,
                        sep: str) -> pd.DataFrame:
    """(id, pidx, para, phash) rows — pandas split/explode + ONE stable
    hash_array call per batch (empty paragraphs skipped)."""
    s = df[text_col].fillna("").str.split(sep)
    ex = df[[id_col]].copy()
    ex["para"] = s
    ex = ex.explode("para", ignore_index=True)
    ex["pidx"] = ex.groupby(id_col).cumcount()
    ex = ex[ex["para"].astype(str).str.len() > 0]
    if len(ex):
        ex["phash"] = pd.util.hash_array(ex["para"].to_numpy(dtype=object))
    else:
        ex["phash"] = np.empty(0, np.uint64)
    return ex.reset_index(drop=True)


def duplicated_paragraph_hashes(ds: Dataset, text_col: str, id_col: str,
                                sep: str = "\n",
                                min_count: int = 2) -> np.ndarray:
    """Corpus-wide boilerplate detection: sorted uint64 hashes of every
    paragraph occurring ≥ ``min_count`` times across the corpus (the
    CCNet / RefinedWeb duplicated-line rule, Wenzek et al. 1911.00359 §3,
    Penedo et al. 2306.01116).

    Scale shape: explode → Ray SORT by phash (equal hashes globally
    contiguous) → per-BLOCK combiner (batch_size=None — the repo's
    two-phase boundary discipline) emitting (hash, count) only for
    in-block candidates (count ≥ min_count) or block-EDGE hashes (the
    only ones whose runs can straddle blocks) → tiny driver combine.
    Driver traffic is O(#duplicates + 2·#blocks), never O(#paragraphs)."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_paragraphs(df, text_col, id_col, sep)
        return ex[["phash"]]

    hashes = ds.map_batches(explode, batch_format="pandas").sort("phash")

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["phash"].to_numpy()
        if len(h) == 0:
            return pd.DataFrame({"phash": np.empty(0, np.uint64),
                                 "n": np.empty(0, np.int64)})
        uniq, counts = np.unique(h, return_counts=True)
        keep = (counts >= min_count) | (uniq == h[0]) | (uniq == h[-1])
        return pd.DataFrame({"phash": uniq[keep],
                             "n": counts[keep].astype(np.int64)})

    part = hashes.map_batches(block_partial, batch_format="pandas",
                              batch_size=None).to_pandas()
    if part.empty:
        return np.empty(0, np.uint64)
    tot = part.groupby("phash")["n"].sum()
    return np.sort(tot.index[tot >= min_count].to_numpy(np.uint64))


def paragraph_dedup(ds: Dataset, text_col: str, id_col: str,
                    sep: str = "\n", min_count: int = 2) -> Dataset:
    """Remove EVERY copy of any paragraph occurring ≥ ``min_count`` times
    corpus-wide (boilerplate removal — nav bars, cookie banners, license
    headers — per the CCNet/RefinedWeb line-dedup rule), reassembling the
    survivors in order. Output: id, cleaned text, n_kept, n_removed.

    The duplicated-hash set (bounded by the boilerplate volume, not the
    corpus) is broadcast ONCE via ray.put; membership per batch is a
    vectorized searchsorted."""
    import ray

    dup = duplicated_paragraph_hashes(ds, text_col, id_col, sep, min_count)
    ref = ray.put(dup)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(ref)
        ex = _explode_paragraphs(df, text_col, id_col, sep)
        if len(ex) and len(d):
            idx = np.searchsorted(d, ex["phash"].to_numpy())
            hit = (idx < len(d)) & (
                d[np.clip(idx, 0, len(d) - 1)]
                == ex["phash"].to_numpy())
        else:
            # no duplicates anywhere (the normal clean-corpus case) or
            # an empty batch: nothing to remove — clip-indexing an
            # EMPTY array would raise (review r5 #1)
            hit = np.zeros(len(ex), bool)
        ex["dup"] = hit
        kept = (ex[~ex["dup"]].groupby(id_col)["para"]
                .agg(sep.join))
        stats = ex.groupby(id_col)["dup"].agg(["sum", "count"])
        out = df[[id_col]].copy()
        out[text_col] = out[id_col].map(kept).fillna("")
        cnt = out[id_col].map(stats["count"]).fillna(0).astype(np.int64)
        rem = out[id_col].map(stats["sum"]).fillna(0).astype(np.int64)
        out["n_kept"] = cnt - rem
        out["n_removed"] = rem
        return out

    return ds.map_batches(clean, batch_format="pandas")


def semantic_decontaminate(ds: Dataset, benchmark_vectors,
                           vec_col: str = "embedding",
                           threshold: float = 0.95,
                           mode: str = "drop") -> Dataset:
    """SEMANTIC benchmark decontamination: drop (or flag) training rows
    whose embedding is cosine-≥ ``threshold`` to ANY benchmark vector —
    the embedding-space complement of the n-gram GPT-3 appendix-C rule
    (``decontaminate``), catching paraphrased/reformatted benchmark
    leakage that exact n-grams miss (the published motivation for
    embedding-level decontamination in open data-curation pipelines).

    Scale shape: the benchmark matrix (small by definition — eval sets
    are thousands of rows) is L2-normalized ONCE and broadcast via
    ``ray.put``; each batch computes one (batch × benchmark) matmul and
    a row-max — no shuffle, no pairwise corpus blowup."""
    import ray

    from elasticsearch_ray.ops.ann import _normalize

    bench = np.asarray(benchmark_vectors, dtype=np.float64)
    if bench.ndim != 2 or len(bench) == 0:
        raise ValueError("benchmark_vectors must be a non-empty 2-D array")
    ref = ray.put(_normalize(bench).T)  # (dim, n_bench), broadcast once

    def verdicts(batch: pa.Table) -> np.ndarray:
        bt = ray.get(ref)
        m = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ bt
        return sims.max(axis=1) >= threshold

    if mode == "flag":
        def flag(batch: pa.Table) -> pa.Table:
            return batch.append_column("contaminated",
                                       pa.array(verdicts(batch)))

        return ds.map_batches(flag, batch_format="pyarrow")
    if mode != "drop":
        raise ValueError(f"unknown mode {mode!r}")

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~verdicts(batch)))

    return ds.map_batches(drop, batch_format="pyarrow")


def cross_corpus_near_dups(new_ds: Dataset, ref_ds: Dataset,
                           text_col: str = "text", id_col: str = "doc_id",
                           threshold: float = 0.8, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           seed: int = 7,
                           bucket_cap: int = 64) -> pd.DataFrame:
    """Incremental (cross-corpus) near-dedup: which NEW documents
    near-duplicate an EXISTING reference corpus — the dedup a
    continuously-crawled pipeline runs between each new crawl and the
    training set it already shipped. Same MinHash-LSH machinery as the
    in-corpus path, but candidates only ever pair ACROSS corpora:

    - both sides band with the SAME permutations/seed (signatures are
      comparable by construction), tagged with a side bit;
    - one bucket groupby over the union: every NEW member pairs with
      the bucket's MIN reference member (one anchor — linear in bucket
      size; a true near-dup agrees on ~all bands, so a mixed-collision
      bucket that anchors badly still surfaces the pair from another
      band, the in-corpus chain argument);
    - exact shingle-Jaccard verify over the union (only candidate docs'
      hash arrays cross the wire).

    Id spaces MUST be disjoint (asserted on the first shared bucket).
    Returns (new_id, ref_id, jaccard) for verified matches."""
    import ray.data as rd  # noqa: F401

    def banded(ds: Dataset, side: int) -> Dataset:
        # autoscaling (1, 2) pools: TWO legs run concurrently here, and
        # fixed pools reserving min up front deadlock when stages x
        # pool size reach the CPU budget (the 2-cpu scaling leg) —
        # review r5e #5
        b = ds.map_batches(
            MinHashBatch,
            fn_constructor_args=(text_col, id_col, num_perm, bands,
                                 shingle_k, seed),
            batch_format="pyarrow", concurrency=(1, 2))
        return b.map_batches(
            lambda t, _s=side: t.append_column(
                "_side", pa.array(np.full(len(t), _s, np.int8))),
            batch_format="pyarrow")

    both = banded(ref_ds, 0).union(banded(new_ds, 1))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        sides = g["_side"].to_numpy()
        ids = g[id_col].to_numpy(np.int64)
        ref = np.unique(ids[sides == 0])
        new = np.unique(ids[sides == 1])
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if len(ref) == 0 or len(new) == 0:
            return empty
        if np.intersect1d(ref, new).size:
            raise ValueError(
                "cross-corpus dedup requires disjoint id spaces")
        if len(new) > bucket_cap:
            # REAL cap (review r5e #7): a hot bucket pairs only its
            # first bucket_cap new members here — a true near-dup
            # agrees on ~all bands, so members cut in this bucket
            # surface from their other, non-hot buckets (the in-corpus
            # chain tradeoff, stated the same way)
            import logging

            logging.getLogger(__name__).warning(
                "cross-corpus LSH: hot bucket with %d new docs capped "
                "at %d (band=%s)", len(new), bucket_cap,
                int(g["band"].iloc[0]))
            new = new[:bucket_cap]
        anchor = np.int64(ref.min())
        return pd.DataFrame({"id_a": np.full(len(new), anchor),
                             "id_b": new})

    cand = (both.groupby(["band", "band_hash"])
            .map_groups(pairs, batch_format="pandas").to_pandas())
    if cand.empty or "id_b" not in cand.columns:
        # zero-SCHEMA empty frame from the hash groupby when no bucket
        # held both sides — normalize to the typed no-matches result
        return pd.DataFrame({"new_id": pd.Series([], dtype="int64"),
                             "ref_id": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    cand = (cand.drop_duplicates()
            .sort_values(["id_b", "id_a"]).reset_index(drop=True))
    union_docs = (new_ds.select_columns([id_col, text_col])
                  .union(ref_ds.select_columns([id_col, text_col])))
    verified = _verify_jaccard(union_docs, cand, text_col, id_col,
                               shingle_k, threshold)
    out = verified.rename(columns={"id_a": "ref_id", "id_b": "new_id"})
    return (out[["new_id", "ref_id", "jaccard"]]
            .sort_values(["new_id", "ref_id"], ignore_index=True))


def cross_corpus_dedup(new_ds: Dataset, ref_ds: Dataset,
                       text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.8, **kw) -> Dataset:
    """Drop every new document that near-duplicates the reference
    corpus; the (small) drop-id set broadcasts once."""
    import ray

    matches = cross_corpus_near_dups(new_ds, ref_ds, text_col, id_col,
                                     threshold, **kw)
    drop_ref = ray.put(frozenset(matches["new_id"].tolist()))

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        ids = batch[id_col].to_pylist()
        return batch.filter(pa.array([i not in drop for i in ids]))

    return new_ds.map_batches(keep, batch_format="pyarrow")
