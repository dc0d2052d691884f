"""Distributed inverted-index build — the Ray-Data-native write path.

Pipeline (SURVEY §3.1, with an explicit map-side combine):

  plan_partitions (driver, parquet metadata only)
    · input files → shards; ``files_per_partition`` shards per partition
      (contiguous global doc ranges — the shard/segment analog)
    → from_items(shards) → map_batches(TokenizeShard, actor pool)
        · reads its file, html_strip, analyzer, SmallFloat norms
        · side-writes part=N/docruns/docs-<base>.parquet (lineage unit)
        · MAP-SIDE COMBINE: aggregates its docs' postings per term and emits
          one posting-CHUNK row per (shard, term): delta+FOR-encoded blob +
          positions + (df, total_tf) partials.  This is the Lucene
          RAM-buffer→flush analog: the shuffle then moves compressed chunks,
          not (doc, term) tuples — ~2 orders of magnitude less exchange
          volume, which is what makes the wide step viable at 100 TB.
    → sort(part, term, salt, first_doc)      # the term-keyed shuffle
    → map_batches(RouteChunks): stream chunk rows into per-partition run
      files (sorted within each run)
    → per-partition MergeParts task: k-way combines each term's chunks
      (single-chunk blobs pass through; multi-chunk re-encoded canonically),
      concatenates doc runs → docs.parquet, writes terms.parquet /
      postings.bin / positions.bin / manifest.json (completion marker)
    → index_meta.json (global stats: N, sum_dl)

Skew handling (north rule): a head term's postings arrive as bounded chunks
(one per input shard), and the explicit ``salt`` key — populated for terms
the driver-side sample sketch marks as heads — gives Ray's range partitioner
distinct sub-keys to split a hot term's chunk run across reducers (equal
keys cannot be split otherwise). Partition size itself is bounded by
``files_per_partition``, which caps any reducer's merge work.

Resumability: a partition with a valid ``manifest.json`` is skipped entirely
on re-build; incomplete partitions rebuild idempotently (atomic temp+rename,
run files tracked by returned manifests, not directory listings).

Reference anchors: shard routing ``cluster/routing/IndexRouting.java:113``
(contiguous ranges by default; murmur3 parity in index/routing),
RAM-buffer flush ``indices/IndexingMemoryController.java:45-48``, commit
user data ``InternalEngine.java:2585-2602``.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.analysis.html_strip import strip_html
from elasticsearch_ray.index.norms import int_to_byte4
from elasticsearch_ray.index.postings import encode_postings, reencode_canonical
from elasticsearch_ray.index.segments import (
    FORMAT_VERSION,
    atomic_write_bytes,
    write_term_bloom,
    atomic_write_json,
    atomic_write_table,
    manifest_path,
    part_dir,
    read_manifest,
)
from elasticsearch_ray.index.spec import FIELD_SEP, IndexSpec, field_of_term
from elasticsearch_ray.sources.webpages import corpus_files, plan_shards


def spec_fingerprint(spec: IndexSpec) -> str:
    """Hash of the analysis-relevant spec fields — part of a partition's
    resume identity (changing analyzer/fields/similarity must rebuild;
    execution-only knobs must not)."""
    import hashlib

    return hashlib.md5(
        repr(
            sorted(
                (k, repr(v))
                for k, v in spec.to_dict().items()
                if k not in ("files_per_partition", "merge_spill_bytes",
                             "sample_docs", "max_result_window")
            )
        ).encode()
    ).hexdigest()[:16]


def plan_partitions(corpus_dir: str, file_pattern: str, files_per_partition: int) -> list[dict]:
    """Group input file shards into partitions of contiguous doc ranges."""
    shards = plan_shards(corpus_dir, file_pattern)
    for i, s in enumerate(shards):
        part = i // files_per_partition
        s["part"] = part
    part_base: dict[int, int] = {}
    for s in shards:
        part_base.setdefault(s["part"], s["base"])
        s["part_base"] = part_base[s["part"]]
    return shards


def sketch_head_terms(shards: list[dict], spec: IndexSpec) -> set[str]:
    """Driver-side sample sketch of head-term df ratios (SURVEY §4 skew row)."""
    if not shards:
        return set()
    n = 0
    df: Counter = Counter()
    analyzer = get_analyzer(spec.analyzer)
    # sample a few SPREAD-OUT shards, not just shard 0 — a head term
    # localized away from file 0 would otherwise escape salting
    n_sample_shards = min(4, len(shards))
    step = max(1, len(shards) // n_sample_shards)
    sample_shards = shards[::step][:n_sample_shards]
    per_shard = max(1, spec.sample_docs // len(sample_shards))
    for sh in sample_shards:
        pf = pq.ParquetFile(sh["path"])
        tcol = spec.text_column if spec.text_column in pf.schema_arrow.names else "text"
        taken = 0
        for batch in pf.iter_batches(batch_size=512, columns=[tcol]):
            for text in batch[tcol].to_pylist():
                terms, _ = analyzer(text or "")
                df.update(set(terms))
                n += 1
                taken += 1
                if taken >= per_shard:
                    break
            if taken >= per_shard:
                break
    if n == 0:
        return set()
    return {t for t, c in df.items() if c / n >= spec.head_df_ratio}


CHUNK_SCHEMA = [
    ("part", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("first_doc", pa.int64()),
    ("df", pa.int64()),
    ("total_tf", pa.int64()),
    ("blob", pa.binary()),
]


class TokenizeShard:
    """Actor-pool stage: one call fully processes one input file shard.

    Analyzer resources load once per actor (__init__); the head-term set is
    baked into actor construction (broadcast once, not per batch)."""

    def __init__(self, index_dir: str, spec_dict: dict, head_terms):
        self.index_dir = index_dir
        self.spec = IndexSpec.from_dict(spec_dict)
        self.analyzer = get_analyzer(self.spec.analyzer)
        if self.spec.index_synonyms:
            from elasticsearch_ray.analysis.synonyms import IndexTimeSynonyms

            # rule parsing/compilation once per actor (actor-pool discipline)
            self.analyzer = IndexTimeSynonyms(
                self.analyzer, list(self.spec.index_synonyms), self.spec.analyzer
            )
        # per-language analyzer resources load ONCE per actor/worker — the
        # stateful actor-pool analyzer dispatch keyed by the lang column
        self.lang_analyzers = {
            lg: get_analyzer(name) for lg, name in (self.spec.lang_analyzers or {}).items()
        }
        self.field_analyzers = {
            f: get_analyzer(name) for f, name in (self.spec.field_analyzers or {}).items()
        }
        self.head_terms = head_terms or set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._one_shard(row) for row in batch.to_pylist()]
        return pa.concat_tables(out) if out else self._empty()

    def _empty(self) -> pa.Table:
        fields = list(CHUNK_SCHEMA)
        if self.spec.store_positions:
            fields += [("pos_flat", pa.list_(pa.int32()))]
        return pa.table({k: pa.array([], t) for k, t in fields})

    def _one_shard(self, shard: dict) -> pa.Table:
        spec = self.spec
        part = int(shard["part"])
        local_base = int(shard["base"]) - int(shard["part_base"])
        avail = set(pq.read_schema(shard["path"]).names)
        doc_cols = [c for c in spec.doc_columns if c in avail]
        src_col = "html" if spec.use_html else spec.text_column
        extra_fields = {f: c for f, c in (spec.fields or {}).items() if c in avail}
        cols = list(dict.fromkeys(doc_cols + [src_col] + list(extra_fields.values())))
        if self.lang_analyzers and spec.lang_column in avail and spec.lang_column not in cols:
            cols.append(spec.lang_column)
        tbl = pq.read_table(shard["path"], columns=cols)
        if spec.use_html:
            texts = [
                strip_html(h.decode("utf-8"), spec.escaped_tags) if h is not None else ""
                for h in tbl["html"].to_pylist()
            ]
        else:
            texts = [t or "" for t in tbl[spec.text_column].to_pylist()]

        n_docs = len(texts)
        if self.lang_analyzers and spec.lang_column in avail:
            langs = tbl[spec.lang_column].to_pylist()
            analyzers = [self.lang_analyzers.get(lg, self.analyzer) for lg in langs]
        else:
            analyzers = None
        field_doclens = {f: np.zeros(n_docs, dtype=np.int64) for f in extra_fields}
        terms_arr = None  # batched path: flat pa.StringArray of analyzed terms
        blk = None
        if analyzers is None and not extra_fields:
            blk = getattr(self.analyzer, "analyze_block", lambda _t: None)(texts)
        if blk is not None:
            # vectorized hot path (default `standard` config): one Arrow
            # lowercase over the whole shard; locs/positions by repeat/arange
            terms_arr, doclens = blk
            total = int(doclens.sum())
            locs = np.repeat(local_base + np.arange(n_docs, dtype=np.int64), doclens)
            cum = np.cumsum(doclens) - doclens
            poss = (np.arange(total, dtype=np.int64) - np.repeat(cum, doclens)).astype(
                np.int32
            )
        else:
            all_terms: list[str] = []
            locs_l: list[np.ndarray] = []
            poss_l: list[np.ndarray] = []
            doclens = np.zeros(n_docs, dtype=np.int64)
            field_texts = {f: tbl[c].to_pylist() for f, c in extra_fields.items()}
            for i, text in enumerate(texts):
                terms, pos = (analyzers[i] if analyzers else self.analyzer)(text)
                doclens[i] = len(terms)
                if terms:
                    all_terms.extend(terms)
                    locs_l.append(np.full(len(terms), local_base + i, dtype=np.int64))
                    poss_l.append(np.asarray(pos, dtype=np.int32))
                for f in extra_fields:
                    fan = self.field_analyzers.get(f, self.analyzer)
                    fterms, fpos = fan(field_texts[f][i] or "")
                    field_doclens[f][i] = len(fterms)
                    if fterms:
                        all_terms.extend(f + FIELD_SEP + t for t in fterms)
                        locs_l.append(np.full(len(fterms), local_base + i, dtype=np.int64))
                        poss_l.append(np.asarray(fpos, dtype=np.int32))
        norms = int_to_byte4(doclens)
        field_norms = {f: int_to_byte4(dl) for f, dl in field_doclens.items()}

        # docrun side-write (atomic) — this shard's slice of docs.parquet
        dcols = {
            "doc_id": pa.array(int(shard["base"]) + np.arange(n_docs, dtype=np.int64)),
            "doclen": pa.array(doclens.astype(np.int32)),
            "norm": pa.array(norms),
        }
        for f in extra_fields:
            dcols[f"doclen_{f}"] = pa.array(field_doclens[f].astype(np.int32))
            dcols[f"norm_{f}"] = pa.array(field_norms[f])
        for c in doc_cols:
            if c not in dcols:
                dcols[c] = tbl[c]
        if spec.size_field:
            # mapper-size `_size`: byte length of the _source, computed at
            # INDEX time (SizeFieldMapper) so queries never touch sources
            if spec.use_html:
                dcols["_size"] = pa.array(
                    [len(h) if h is not None else 0
                     for h in tbl["html"].to_pylist()], pa.int64())
            else:
                import pyarrow.compute as pc

                dcols["_size"] = pc.fill_null(pc.cast(
                    pc.binary_length(tbl[spec.text_column]), pa.int64()), 0)
        ddir = os.path.join(part_dir(self.index_dir, part), "docruns")
        os.makedirs(ddir, exist_ok=True)
        atomic_write_table(pa.table(dcols), os.path.join(ddir, f"docs-{local_base:012d}.parquet"))

        if terms_arr is not None:
            if len(terms_arr) == 0:
                return self._empty()
            codes_arr = terms_arr.dictionary_encode()
        else:
            if not all_terms:
                return self._empty()
            locs = np.concatenate(locs_l)
            poss = np.concatenate(poss_l)
            codes_arr = pa.array(all_terms, pa.string()).dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = codes_arr.dictionary

        # (doc, term) groups: stable sort by (code, local, pos) so each term's
        # docs are contiguous AND doc-ordered — the per-term chunk layout
        order = np.lexsort((poss, locs, codes))
        locs_s, codes_s, poss_s = locs[order], codes[order], poss[order]
        change = np.empty(len(locs_s), dtype=bool)
        change[0] = True
        np.logical_or(locs_s[1:] != locs_s[:-1], codes_s[1:] != codes_s[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(locs_s))
        tfs = (ends - starts).astype(np.int64)
        g_local = locs_s[starts]
        g_code = codes_s[starts]

        # term boundaries over the (doc, term) groups
        tchange = np.empty(len(starts), dtype=bool)
        tchange[0] = True
        tchange[1:] = g_code[1:] != g_code[:-1]
        tstarts = np.flatnonzero(tchange)
        tends = np.append(tstarts[1:], len(starts))

        terms_out: list[str] = []
        blobs: list[bytes] = []
        dfs: list[int] = []
        ttfs: list[int] = []
        firsts: list[int] = []
        salts: list[int] = []
        pos_flat_out: list[np.ndarray] = []
        with_pos = spec.store_positions
        vocab_list = vocab.to_pylist()
        norm_of_local = np.zeros(local_base + n_docs, dtype=np.uint8)
        norm_of_local[local_base:] = norms
        field_norm_of_local = {}
        for f in extra_fields:
            a = np.zeros(local_base + n_docs, dtype=np.uint8)
            a[local_base:] = field_norms[f]
            field_norm_of_local[f] = a
        head = self.head_terms
        salt_docs = spec.salt_docs
        for s, e in zip(tstarts, tends):
            term = vocab_list[int(g_code[s])]
            fld = field_of_term(term)
            nlookup = norm_of_local if fld is None else field_norm_of_local[fld]
            d_all = g_local[s:e]
            # HEAD-TERM SALTING: split a head term's run at salt_docs doc-range
            # boundaries so each chunk ROW carries a bounded payload — the
            # range partitioner can then spread a hot term's chunks across
            # reducer blocks (equal keys are unsplittable otherwise).
            if term in head and int(d_all[-1] // salt_docs) != int(d_all[0] // salt_docs):
                salt_vals = d_all // salt_docs
                cuts = np.flatnonzero(salt_vals[1:] != salt_vals[:-1]) + 1
                bounds = np.concatenate([[0], cuts, [e - s]])
            else:
                bounds = np.array([0, e - s])
            for bi in range(len(bounds) - 1):
                lo_g, hi_g = s + int(bounds[bi]), s + int(bounds[bi + 1])
                d = g_local[lo_g:hi_g]
                t = tfs[lo_g:hi_g]
                terms_out.append(term)
                dfs.append(hi_g - lo_g)
                ttfs.append(int(t.sum()))
                firsts.append(int(d[0]))
                salts.append(int(d[0] // salt_docs) if term in head else 0)
                blobs.append(encode_postings(d, t, nlookup[d]))
                if with_pos:
                    lo, hi = starts[lo_g], ends[hi_g - 1]
                    pos_flat_out.append(poss_s[lo:hi])

        data = {
            "part": pa.array(np.full(len(terms_out), part, dtype=np.int32)),
            "term": pa.array(terms_out, pa.string()),
            "salt": pa.array(np.asarray(salts, dtype=np.int32)),
            "first_doc": pa.array(np.asarray(firsts, dtype=np.int64)),
            "df": pa.array(np.asarray(dfs, dtype=np.int64)),
            "total_tf": pa.array(np.asarray(ttfs, dtype=np.int64)),
            "blob": pa.array(blobs, pa.binary()),
        }
        if with_pos:
            data["pos_flat"] = _list_of(pos_flat_out)
        return pa.table(data)


def _list_of(arrs: list[np.ndarray]) -> pa.ListArray:
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    off = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    vals = np.concatenate(arrs) if arrs else np.empty(0, np.int32)
    return pa.ListArray.from_arrays(pa.array(off.astype(np.int32)), pa.array(vals.astype(np.int32), pa.int32()))


class RouteChunks:
    """Post-shuffle routing: stream sorted chunk rows into per-partition run
    files. Pure I/O — chunks were encoded map-side."""

    def __init__(self, index_dir: str, spec_dict: dict):
        self.index_dir = index_dir
        self.spec = IndexSpec.from_dict(spec_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "run_path": pa.array([], pa.string())}
            )
        parts = batch["part"].to_numpy()
        change = np.empty(len(parts), dtype=bool)
        change[0] = True
        change[1:] = parts[1:] != parts[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(parts))
        out_parts, out_paths = [], []
        drop = ["part", "salt"]
        for s, e in zip(starts, ends):
            p = int(parts[s])
            rdir = os.path.join(part_dir(self.index_dir, p), "runs")
            os.makedirs(rdir, exist_ok=True)
            path = os.path.join(rdir, f"run-{uuid.uuid4().hex}.parquet")
            pq.write_table(batch.slice(s, e - s).drop_columns(drop), path)
            out_parts.append(p)
            out_paths.append(path)
        return pa.table(
            {"part": pa.array(out_parts, pa.int32()), "run_path": pa.array(out_paths, pa.string())}
        )


def merge_part_streaming(index_dir: str, part: int, run_paths: list[str],
                         shards: list[dict], spec: IndexSpec) -> dict:
    """Spill path of merge_part: k-way HEAP merge over the term-sorted run
    files with bounded memory — postings.bin and positions.bin are
    appended incrementally; only the (small) term dictionary, norms column
    and per-run read buffers are resident. Produces the identical segment
    (postings.bin / terms.parquet byte-identical; docs/positions logically
    identical, parquet row-group layout may differ). Used when a partition's
    run bytes exceed ``spec.merge_spill_bytes``."""
    import heapq

    t0 = time.time()
    pdir = part_dir(index_dir, part)
    with_pos = spec.store_positions

    # docs: stream docruns through a ParquetWriter; keep only norm/doclen
    ddir = os.path.join(pdir, "docruns")
    docrun_files = sorted(os.listdir(ddir)) if os.path.isdir(ddir) else []
    norms_l, doclen_l = [], []
    fnorm_l: dict[str, list] = {}
    fdl_sums: dict[str, int] = {}
    docs_tmp = os.path.join(pdir, "docs.parquet.tmp")
    writer = None
    for f in docrun_files:
        t = pq.read_table(os.path.join(ddir, f))
        if writer is None:
            writer = pq.ParquetWriter(docs_tmp, t.schema)
        writer.write_table(t)
        norms_l.append(t["norm"].to_numpy())
        doclen_l.append(t["doclen"].to_numpy())
        for name in t.schema.names:
            if name.startswith("norm_"):
                fnorm_l.setdefault(name[5:], []).append(t[name].to_numpy())
            elif name.startswith("doclen_"):
                fld = name[7:]
                fdl_sums[fld] = fdl_sums.get(fld, 0) + int(
                    np.asarray(t[name].to_numpy()).sum()
                )
    if writer is not None:
        writer.close()
        os.replace(docs_tmp, os.path.join(pdir, "docs.parquet"))
    norms_np = np.concatenate(norms_l) if norms_l else np.empty(0, np.uint8)
    doclen_np = np.concatenate(doclen_l) if doclen_l else np.empty(0, np.int64)
    field_norms_np = {f: np.concatenate(v) for f, v in fnorm_l.items()}

    cols = ["term", "df", "total_tf", "first_doc", "blob"] + (
        ["pos_flat"] if with_pos else []
    )

    def run_rows(path):
        pf = pq.ParquetFile(path)
        for b in pf.iter_batches(batch_size=1024, columns=cols):
            rows = b.to_pylist()
            yield from rows

    # k-way merge on (term, first_doc); runs are sorted by construction
    iters = [run_rows(p) for p in run_paths]
    heap = []
    for ri, it in enumerate(iters):
        row = next(it, None)
        if row is not None:
            heapq.heappush(heap, (row["term"], row["first_doc"], ri, row))

    final_terms: list[str] = []
    final_df: list[int] = []
    final_ttf: list[int] = []
    offs_l: list[int] = []
    lens_l: list[int] = []
    pos_offs_l: list[int] = []
    pos_lens_l: list[int] = []
    n_multi = 0
    group: list[dict] = []
    off = 0
    pos_off = 0

    postings_tmp = os.path.join(pdir, "postings.bin.tmp")
    pos_tmp = os.path.join(pdir, "positions.bin.tmp")

    pos_out = open(pos_tmp, "wb") if with_pos else None
    with open(postings_tmp, "wb") as pf_out:

        def finalize_group():
            nonlocal off, pos_off, n_multi
            if not group:
                return
            term = group[0]["term"]
            if len(group) == 1:
                blob = group[0]["blob"]
            else:
                n_multi += 1
                fld = field_of_term(term)
                nl = norms_np if fld is None else field_norms_np[fld]
                blob = reencode_canonical([g["blob"] for g in group], nl)
            final_terms.append(term)
            final_df.append(sum(g["df"] for g in group))
            final_ttf.append(sum(g["total_tf"] for g in group))
            offs_l.append(off)
            lens_l.append(len(blob))
            pf_out.write(blob)
            off += len(blob)
            if with_pos:
                # group order = (term, first_doc) = doc order (chunk doc
                # ranges are disjoint) — same invariant reencode relies on
                flat = np.concatenate(
                    [np.asarray(g["pos_flat"], dtype="<i4") for g in group]
                )
                b = flat.tobytes()
                pos_offs_l.append(pos_off)
                pos_lens_l.append(len(b))
                pos_out.write(b)
                pos_off += len(b)

        while heap:
            term, _fd, ri, row = heapq.heappop(heap)
            if group and term != group[0]["term"]:
                finalize_group()
                group = []
            group.append(row)
            nxt = next(iters[ri], None)
            if nxt is not None:
                heapq.heappush(heap, (nxt["term"], nxt["first_doc"], ri, nxt))
        finalize_group()
    if pos_out is not None:
        pos_out.close()
        os.replace(pos_tmp, os.path.join(pdir, "positions.bin"))
    os.replace(postings_tmp, os.path.join(pdir, "postings.bin"))

    tcols = {
        "term": pa.array(final_terms, pa.string()),
        "df": pa.array(final_df, pa.int64()),
        "total_tf": pa.array(final_ttf, pa.int64()),
        "off": pa.array(offs_l, pa.int64()),
        "len": pa.array(lens_l, pa.int64()),
    }
    if with_pos:
        tcols["pos_off"] = pa.array(pos_offs_l, pa.int64())
        tcols["pos_len"] = pa.array(pos_lens_l, pa.int64())
    atomic_write_table(pa.table(tcols), os.path.join(pdir, "terms.parquet"))
    bloom_bits = write_term_bloom(pdir, final_terms)
    manifest = {
        "format": FORMAT_VERSION,
        "part": part,
        "input_path": [s["path"] for s in shards],
        "input_rows": int(sum(s["rows"] for s in shards)),
        "input_bytes": int(sum(s.get("bytes", 0) for s in shards)),
        "spec_fp": spec_fingerprint(spec),
        "base_doc_id": int(shards[0]["part_base"]),
        "n_docs": int(len(norms_np)),
        "sum_dl": int(doclen_np.sum()),
        "sum_dl_fields": fdl_sums,
        "n_terms": len(final_terms),
        "bloom_bits": int(bloom_bits),
        "multi_chunk_terms": int(n_multi),
        "runs_merged": len(run_paths),
        "streaming_merge": True,
        "postings_bytes": int(os.path.getsize(os.path.join(pdir, "postings.bin"))),
        "elapsed_sec": round(time.time() - t0, 3),
    }
    shutil.rmtree(os.path.join(pdir, "runs"), ignore_errors=True)
    shutil.rmtree(os.path.join(pdir, "docruns"), ignore_errors=True)
    atomic_write_json(manifest_path(index_dir, part), manifest)
    return manifest


def merge_part(index_dir: str, part: int, run_paths: list[str], shards: list[dict],
               spec: IndexSpec) -> dict:
    """Combine one partition's chunk runs into the final canonical segment:
    docruns → docs.parquet; per term, single-chunk blobs pass through
    byte-identical, multi-chunk terms re-encode canonically (so segment bytes
    are independent of shuffle batching). Falls back to the bounded-memory
    ``merge_part_streaming`` when the partition's run bytes exceed
    ``spec.merge_spill_bytes``."""
    run_bytes = sum(os.path.getsize(p) for p in run_paths) if run_paths else 0
    if run_bytes > spec.merge_spill_bytes:
        return merge_part_streaming(index_dir, part, run_paths, shards, spec)
    t0 = time.time()
    pdir = part_dir(index_dir, part)
    with_pos = spec.store_positions

    ddir = os.path.join(pdir, "docruns")
    docrun_files = sorted(os.listdir(ddir)) if os.path.isdir(ddir) else []
    docs_tbl = pa.concat_tables([pq.read_table(os.path.join(ddir, f)) for f in docrun_files])
    atomic_write_table(docs_tbl, os.path.join(pdir, "docs.parquet"))
    norms_np = docs_tbl["norm"].to_numpy()
    doclen_np = docs_tbl["doclen"].to_numpy()
    field_norms_np = {
        n[5:]: docs_tbl[n].to_numpy() for n in docs_tbl.schema.names if n.startswith("norm_")
    }
    fdl_sums = {
        n[7:]: int(np.asarray(docs_tbl[n].to_numpy()).sum())
        for n in docs_tbl.schema.names
        if n.startswith("doclen_")
    }

    cols = ["term", "df", "total_tf", "first_doc", "blob"] + (
        ["pos_flat"] if with_pos else []
    )
    tables = [pq.read_table(p, columns=cols) for p in run_paths]
    runs = pa.concat_tables(tables) if tables else None

    if runs is not None and len(runs):
        runs = runs.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        term_np = np.asarray(runs["term"].to_pylist(), dtype=object)
        df_np = runs["df"].to_numpy()
        ttf_np = runs["total_tf"].to_numpy()
        blobs = runs["blob"].to_pylist()
        change = np.empty(len(term_np), dtype=bool)
        change[0] = True
        change[1:] = term_np[1:] != term_np[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(term_np))

        final_terms: list[str] = []
        final_df = np.empty(len(starts), dtype=np.int64)
        final_ttf = np.empty(len(starts), dtype=np.int64)
        final_blobs: list[bytes] = []
        n_multi = 0
        for gi, (s, e) in enumerate(zip(starts, ends)):
            final_terms.append(term_np[s])
            final_df[gi] = df_np[s:e].sum()
            final_ttf[gi] = ttf_np[s:e].sum()
            if e - s == 1:
                final_blobs.append(blobs[s])
            else:
                n_multi += 1
                fld = field_of_term(term_np[s])
                nl = norms_np if fld is None else field_norms_np[fld]
                final_blobs.append(reencode_canonical(blobs[s:e], nl))
        lens = np.array([len(b) for b in final_blobs], dtype=np.int64)
        offs = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        atomic_write_bytes(b"".join(final_blobs), os.path.join(pdir, "postings.bin"))

        tcols = {
            "term": pa.array(final_terms, pa.string()),
            "df": pa.array(final_df),
            "total_tf": pa.array(final_ttf),
            "off": pa.array(offs),
            "len": pa.array(lens),
        }
        if with_pos:
            # runs are sorted by (term, first_doc); within a term, chunk doc
            # ranges are disjoint and ordered, so the pos_flat values buffer
            # in row order IS the per-term doc-order flat positions stream —
            # positions.bin is one contiguous write, offsets are arithmetic.
            plist = runs["pos_flat"].combine_chunks()
            el_offs = plist.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            base_el = int(el_offs[0])
            vals = plist.values.to_numpy(zero_copy_only=False)
            atomic_write_bytes(
                np.ascontiguousarray(
                    vals[base_el : int(el_offs[-1])], dtype="<i4"
                ).tobytes(),
                os.path.join(pdir, "positions.bin"),
            )
            tcols["pos_off"] = pa.array((el_offs[starts] - base_el) * 4)
            tcols["pos_len"] = pa.array((el_offs[ends] - el_offs[starts]) * 4)
        atomic_write_table(pa.table(tcols), os.path.join(pdir, "terms.parquet"))
        bloom_bits = write_term_bloom(pdir, final_terms)
        n_terms = len(final_terms)
    else:
        atomic_write_bytes(b"", os.path.join(pdir, "postings.bin"))
        tcols = {
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64()),
            "off": pa.array([], pa.int64()),
            "len": pa.array([], pa.int64()),
        }
        if with_pos:
            atomic_write_bytes(b"", os.path.join(pdir, "positions.bin"))
            tcols["pos_off"] = pa.array([], pa.int64())
            tcols["pos_len"] = pa.array([], pa.int64())
        atomic_write_table(pa.table(tcols), os.path.join(pdir, "terms.parquet"))
        bloom_bits = write_term_bloom(pdir, [])
        n_terms = 0
        n_multi = 0

    manifest = {
        "format": FORMAT_VERSION,
        "part": part,
        "input_path": [s["path"] for s in shards],
        "input_rows": int(sum(s["rows"] for s in shards)),
        "input_bytes": int(sum(s.get("bytes", 0) for s in shards)),
        "spec_fp": spec_fingerprint(spec),
        "base_doc_id": int(shards[0]["part_base"]),
        "n_docs": int(len(norms_np)),
        "sum_dl": int(doclen_np.sum()),
        "sum_dl_fields": fdl_sums,
        "n_terms": int(n_terms),
        "bloom_bits": int(bloom_bits),
        "multi_chunk_terms": int(n_multi),
        "runs_merged": len(run_paths),
        "postings_bytes": int(os.path.getsize(os.path.join(pdir, "postings.bin"))),
        "elapsed_sec": round(time.time() - t0, 3),
    }
    shutil.rmtree(os.path.join(pdir, "runs"), ignore_errors=True)
    shutil.rmtree(os.path.join(pdir, "docruns"), ignore_errors=True)
    atomic_write_json(manifest_path(index_dir, part), manifest)
    return manifest


class MergeParts:
    def __init__(self, index_dir: str, spec_dict: dict):
        self.index_dir = index_dir
        self.spec = IndexSpec.from_dict(spec_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            m = merge_part(
                self.index_dir, int(row["part"]), list(row["run_paths"]), row["shards"], self.spec
            )
            out.append({"part": m["part"], "n_docs": m["n_docs"], "sum_dl": m["sum_dl"],
                        "n_terms": m["n_terms"]})
        return pa.Table.from_pylist(out)


# Worker-process-level stage cache: map_batches with a plain FUNCTION runs as
# stateless tasks on Ray's pre-started worker processes — no actor-pool spawn
# or ramp-up — while the module-level cache still amortizes stage state
# (compiled analyzers) across every task that lands on the same worker. The
# actor-pool classes above remain the API for genuinely heavy state (models);
# the build defaults to tasks because its per-stage state is cheap to rebuild
# and pool spawn dominates at benchmark scale.
_STAGE_CACHE: dict = {}

# Ray Data per-operator stats of the most recent build_index call in this
# process (tokenize/sort/route and merge pipelines) — the ds.stats() review
# feedstock for BASELINE.md.
LAST_BUILD_STATS: dict = {}


def _cached_stage(cls, *args):
    key = (cls.__name__,) + tuple(
        hash(a) if isinstance(a, frozenset) else repr(a) for a in args
    )
    inst = _STAGE_CACHE.get(key)
    if inst is None:
        inst = cls(*args)
        _STAGE_CACHE[key] = inst
    return inst


def _tokenize_fn(batch, index_dir, spec_dict, head_terms):
    return _cached_stage(TokenizeShard, index_dir, spec_dict, head_terms)(batch)


def _route_fn(batch, index_dir, spec_dict):
    return _cached_stage(RouteChunks, index_dir, spec_dict)(batch)


def _merge_fn(batch, index_dir, spec_dict):
    return _cached_stage(MergeParts, index_dir, spec_dict)(batch)


def _stage_sorted_corpus(corpus_dir: str, staged_dir: str, spec: IndexSpec,
                         file_pattern: str) -> str:
    """Index-sorting staging pass (``index.sort.field`` / ``index.sort.order``
    — IndexSettings + Lucene ``setIndexSort``): range-shuffle the corpus
    into sort-field order ONCE (``Dataset.sort`` — the distributed
    all-to-all the reference pays at every segment flush/merge instead), so
    document storage order equals the sort order and sorted queries can
    early-terminate. Resumable: a marker records the input identity;
    unchanged inputs reuse the staged files (and with them the downstream
    per-partition manifests)."""
    import json

    files = corpus_files(corpus_dir, file_pattern)
    ident = {
        "files": [os.path.basename(f) for f in files],
        "bytes": int(sum(os.path.getsize(f) for f in files)),
        "sort": [spec.sort_field, spec.sort_order],
    }
    marker = os.path.join(staged_dir, "_staged.json")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == ident:
                    return staged_dir
        except (OSError, ValueError):
            pass
    shutil.rmtree(staged_dir, ignore_errors=True)
    os.makedirs(staged_dir, exist_ok=True)
    ds = rd.read_parquet(files)
    ds = ds.sort(spec.sort_field, descending=(spec.sort_order == "desc"))
    ds.write_parquet(staged_dir)
    # marker written only after the data: a crashed staging run re-stages
    atomic_write_json(marker, ident)
    return staged_dir


def _build_runs_and_merge(index_dir, spec, spec_dict, shards, by_part,
                          todo_parts, concurrency):
    """Execute the tokenize → sort → route run-file pass and the
    per-partition merge for the given todo partitions."""
    todo_shards = [s for s in shards if s["part"] in set(todo_parts)]
    import functools

    head = frozenset(sketch_head_terms(todo_shards, spec))
    ncpu = concurrency or max(1, int(ray.cluster_resources().get("CPU", 4)))
    # Task granularity: a few input files per tokenize task keeps task
    # count ≈ 2×cpus (amortizes per-task overhead, leaves room for work
    # stealing) and yields right-sized blocks for the sort — all-to-all
    # cost scales with block count, so no repartition pass is needed.
    tok_bs = max(1, min(spec.files_per_partition,
                        (len(todo_shards) + 2 * ncpu - 1) // (2 * ncpu)))
    n_blocks = (len(todo_shards) + tok_bs - 1) // tok_bs
    chunks = (
        rd.from_items(todo_shards, override_num_blocks=n_blocks)
        .map_batches(
            functools.partial(
                _tokenize_fn, index_dir=index_dir, spec_dict=spec_dict, head_terms=head
            ),
            batch_size=tok_bs,
            batch_format="pyarrow",
            num_cpus=1,
        )
        .sort(["part", "term", "salt", "first_doc"])
        .map_batches(
            functools.partial(_route_fn, index_dir=index_dir, spec_dict=spec_dict),
            batch_format="pyarrow",
            num_cpus=1,
        )
    )
    run_rows = chunks.take_all()
    LAST_BUILD_STATS["chunks"] = chunks.stats()
    runs_by_part: dict[int, list[str]] = {p: [] for p in todo_parts}
    for r in run_rows:
        runs_by_part[int(r["part"])].append(r["run_path"])
    merge_items = [
        {"part": p, "run_paths": runs_by_part[p], "shards": by_part[p]} for p in todo_parts
    ]
    merged = rd.from_items(merge_items, override_num_blocks=len(merge_items)).map_batches(
        functools.partial(_merge_fn, index_dir=index_dir, spec_dict=spec_dict),
        batch_size=1,
        batch_format="pyarrow",
        num_cpus=1,
    )
    merged.take_all()
    LAST_BUILD_STATS["merge"] = merged.stats()


def build_index(
    corpus_dir: str,
    index_dir: str,
    spec: IndexSpec | None = None,
    concurrency: int | None = None,
    file_pattern: str = "*.parquet",
) -> dict:
    """Build (or resume) the inverted index. Returns the index meta dict."""
    from elasticsearch_ray.index import admin as _admin

    # closed index / write API block forbids (re)build + append — a
    # no-op for fresh directories (no admin.json yet)
    _admin.check_write(index_dir)
    spec = spec or IndexSpec()
    if spec.char_filters or spec.token_filters:
        # fold char/token filters into a parametric analyzer NAME: every
        # consumer (tokenize actors, searcher actors, the coordinator's
        # query-text analysis) resolves the same chain locally from the
        # string alone
        import dataclasses
        import json as _json

        cfg_d = {"base": spec.analyzer,
                 "char_filters": [[k, [list(x) if isinstance(x, (list, tuple)) else x
                                       for x in a]] for k, a in spec.char_filters]}
        if spec.token_filters:
            cfg_d["filters"] = [f if isinstance(f, str) else list(f)
                                for f in spec.token_filters]
        cfg = _json.dumps(cfg_d, sort_keys=True)
        spec = dataclasses.replace(spec, analyzer="custom:" + cfg,
                                   char_filters=(), token_filters=())
    os.makedirs(index_dir, exist_ok=True)
    if spec.sort_field:
        corpus_dir = _stage_sorted_corpus(
            corpus_dir, os.path.join(index_dir, "sorted_corpus"), spec, file_pattern
        )
        file_pattern = "*.parquet"
    shards = plan_partitions(corpus_dir, file_pattern, spec.files_per_partition)
    by_part: dict[int, list[dict]] = {}
    for s in shards:
        by_part.setdefault(s["part"], []).append(s)
    # resume identity: input paths + rows + BYTES (a regenerated corpus with
    # identical row counts must invalidate) + the analysis-relevant spec
    # fingerprint (changing analyzer/fields/positions must rebuild).
    spec_fp = spec_fingerprint(spec)
    done, todo_parts = [], []
    for part, plist in sorted(by_part.items()):
        m = read_manifest(index_dir, part)
        if (
            m
            and m.get("input_rows") == sum(s["rows"] for s in plist)
            and m.get("input_path") == [s["path"] for s in plist]
            and m.get("input_bytes") == sum(s.get("bytes", 0) for s in plist)
            and m.get("spec_fp") == spec_fp
        ):
            done.append(m)
        else:
            shutil.rmtree(part_dir(index_dir, part), ignore_errors=True)
            todo_parts.append(part)

    spec_dict = spec.to_dict()
    if todo_parts:
        # any rebuild wipes part dirs, taking per-part DERIVED artifacts
        # (rank_features sidecars) with them — their root-level manifests
        # must go too or stale guards will claim the sidecar still exists
        # (regression: spec-field additions orphaned rankfeat-tags.json)
        import glob as _glob

        for pat in ("rankfeat-*.json", "wildcard-*.json"):
            for stale in _glob.glob(os.path.join(index_dir, pat)):
                os.remove(stale)
        # The streaming executor's per-operator resource reservation
        # (default ratio 0.5) caps the tokenize stage at HALF the CPUs even
        # though downstream sort/route need almost none until it finishes —
        # measured 13.4 s → 9.8 s tokenize wall at 1.5M docs/32 cpus with it
        # off. Safe here: map → sort → map consumed by take_all has no
        # concurrent-consumer backpressure to protect. Restored afterwards.
        from ray.data import DataContext as _DC

        _ctx = _DC.get_current()
        _prev_reserve = getattr(_ctx, "op_resource_reservation_enabled", None)
        if _prev_reserve is not None:
            _ctx.op_resource_reservation_enabled = False
        try:
            _build_runs_and_merge(index_dir, spec, spec_dict, shards, by_part,
                                  todo_parts, concurrency)
        finally:
            if _prev_reserve is not None:
                _ctx.op_resource_reservation_enabled = _prev_reserve
        done = [read_manifest(index_dir, p) for p in sorted(by_part)]

    sum_dl_fields: dict[str, int] = {}
    for m in done:
        for f, v in (m.get("sum_dl_fields") or {}).items():
            sum_dl_fields[f] = sum_dl_fields.get(f, 0) + int(v)
    meta = {
        "spec": spec.to_dict(),
        "num_parts": len(by_part),
        "n_docs": int(sum(m["n_docs"] for m in done)),
        "sum_dl": int(sum(m["sum_dl"] for m in done)),
        "sum_dl_fields": sum_dl_fields,
        "parts": [
            {"part": m["part"], "n_docs": m["n_docs"], "input_path": m["input_path"]} for m in done
        ],
    }
    atomic_write_json(os.path.join(index_dir, "index_meta.json"), meta)
    return meta
