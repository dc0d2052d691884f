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
    Jaccard verify. Candidate pairs are assumed small relative to corpus
    (the LSH premise); verification joins text back by broadcast at test
    scale and notes the partitioned-join scale path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min


def add_content_hash(ds: Dataset, cols: list[str], out_col: str = "content_hash") -> Dataset:
    def h(batch: pa.Table) -> pa.Table:
        parts = [batch[c].cast(pa.string()).to_pylist() for c in cols]
        hashes = [
            hashlib.md5("\x1f".join("" if v is None else v for v in row).encode()).hexdigest()
            for row in zip(*parts)
        ]
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow")


def exact_dedup_keep_ids(ds: Dataset, cols: list[str], id_col: str) -> pd.DataFrame:
    """Exact dedup: first (min id) doc per distinct content → kept ids,
    sorted. groupby on the hash key — one shuffle of (hash, id) pairs only."""
    hashed = add_content_hash(ds, cols).select_columns(["content_hash", id_col])
    out = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col)).to_pandas()
    return out[[id_col]].sort_values(id_col).reset_index(drop=True)


def _shingles(tokens: list[str], k: int) -> set:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _hash_shingles(sh: set) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") for s in sh],
        dtype=np.uint64,
    )


def _signature(hvals: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(hvals) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    # (a*x + b) mod p, universal hashing; min per permutation
    x = hvals[:, None]
    vals = (a[None, :] * (x % _MERSENNE) + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


class MinHashBatch:
    """Actor-pool stage: text → (band, band_hash, doc_id) LSH bucket rows."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16,
                 shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands_out, bhash = [], [], []
        for did, text in zip(batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()):
            sig = _signature(_hash_shingles(_shingles((text or "").split(), self.k)), self.a, self.b)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
                ids.append(did)
                bands_out.append(bi)
                bhash.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
        return pa.table(
            {
                "band": pa.array(bands_out, pa.int32()),
                "band_hash": pa.array(bhash, pa.string()),
                self.id_col: pa.array(ids),
            }
        )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)


def minhash_candidate_pairs(ds: Dataset, text_col: str, id_col: str, num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 3, seed: int = 7) -> pd.DataFrame:
    """LSH bucket groupby → unique candidate pairs (id_a < id_b), sorted."""
    buckets = ds.map_batches(
        MinHashBatch,
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed),
        batch_format="pyarrow",
        concurrency=2,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["id_a", "id_b"])

    cand = buckets.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    pdf = cand.to_pandas().drop_duplicates().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pdf


def minhash_near_dups(ds: Dataset, text_col: str, id_col: str, threshold: float = 0.8,
                      shingle_k: int = 3, **kw) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates + exact n-gram Jaccard verify.

    Verification gathers candidate texts with a driver-side id→text lookup —
    fine while |candidates| ≪ |corpus| (the LSH premise). At 100 TB the same
    verify runs as a bucketed self-join: repartition texts by id-hash and ship
    each pair's bucket, never the corpus.
    """
    cand = minhash_candidate_pairs(ds, text_col, id_col, shingle_k=shingle_k, **kw)
    if len(cand) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    need = set(cand["id_a"]) | set(cand["id_b"])
    texts = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        for did, tx in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if did in need:
                texts[did] = tx
    sh = {d: _shingles((t or "").split(), shingle_k) for d, t in texts.items()}
    cand["jaccard"] = [
        round(jaccard(sh[a], sh[b]), 6) for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    out = cand[cand["jaccard"] >= threshold].reset_index(drop=True)
    return out


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


class SimHashBatch:
    """64-bit SimHash per doc (Charikar): sign-sum of token hashes."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        out = np.zeros(len(ids), dtype=np.uint64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            toks = (text or "").split()
            if not toks:
                continue
            hs = np.array(
                [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in toks],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(out, pa.uint64())})


def simhash_table(ds: Dataset, text_col: str, id_col: str) -> pd.DataFrame:
    t = ds.map_batches(
        SimHashBatch, fn_constructor_args=(text_col, id_col), batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    return t.sort_values(id_col).reset_index(drop=True)


def simhash_near_dups(ds: Dataset, text_col: str, id_col: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dups by SimHash hamming distance, banded on 4×16-bit chunks (a
    pair within hamming ≤3 shares at least one exact chunk — pigeonhole)."""
    t = simhash_table(ds, text_col, id_col)
    sims = t["simhash"].to_numpy().astype(np.uint64)
    ids = t[id_col].to_numpy()
    pairs = set()
    for chunk in range(4):
        key = (sims >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": key, "i": np.arange(len(ids))})
        for _, g in df.groupby("k"):
            idx = g["i"].to_numpy()
            if len(idx) < 2:
                continue
            for x in range(len(idx)):
                for y in range(x + 1, len(idx)):
                    pairs.add((int(idx[x]), int(idx[y])))
    rows = []
    for x, y in pairs:
        ham = int(bin(int(sims[x]) ^ int(sims[y])).count("1"))
        if ham <= max_hamming:
            a, b = sorted((int(ids[x]), int(ids[y])))
            rows.append({"id_a": a, "id_b": b, "hamming": ham})
    return (
        pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
