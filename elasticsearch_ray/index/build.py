"""Distributed inverted-index build — the Ray-Data-native write path.

Pipeline (SURVEY §3.1's our-pipeline sketch):

  plan_shards (driver, parquet metadata only)
    → from_items(shards) → map_batches(TokenizeShard, actor pool)
        · reads its input file, html_strip, analyzer, SmallFloat norms
        · side-writes parts/part=N/docs.parquet atomically (lineage unit)
        · emits token tuples (part, term, salt, local, tf, norm, pos)
    → sort(part, term, salt, local)          # THE term-keyed shuffle
    → map_batches(EncodeRuns)
        · delta+FOR-encodes consecutive (part, term) runs into posting
          chunks; writes sorted run files per part; returns run manifest
    → per-part MergeParts (one task per partition)
        · k-way combines run chunks per term (fast path: single-chunk blobs
          pass through byte-identical; multi-chunk re-encoded canonically)
        · writes terms.parquet / postings.bin / positions.parquet /
          manifest.json (completion marker)
    → index_meta.json (global stats: N, sum_dl)

Skew handling (north rule): Ray's sort range-partitions on key values, so a
head term repeated hundreds of millions of times has no sub-key to split on
and would land on one reducer.  A cheap driver-side sample pass estimates
per-term df ratios; terms above ``head_df_ratio`` get ``salt = local //
salt_docs`` appended to the sort key, bounding any one key group to
``salt_docs`` postings.  Chunks re-assemble per term at merge (postings.py
blocks are self-contained).

Resumability: a partition with a valid ``manifest.json`` is skipped entirely
on re-build; incomplete partitions are rebuilt idempotently (atomic
temp+rename writes, run files tracked by returned manifest not directory
listing).

Reference anchors: shard routing ``cluster/routing/IndexRouting.java:113``
(we use contiguous doc ranges; murmur3 url-routing provided in
functions/routing for parity), RAM-buffer→segment flush
``indices/IndexingMemoryController.java:45-48``, commit user data
``InternalEngine.java:2585-2602``.
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
from elasticsearch_ray.index.postings import encode_postings, read_headers, reencode_canonical
from elasticsearch_ray.index.segments import (
    atomic_write_bytes,
    atomic_write_json,
    atomic_write_table,
    manifest_path,
    part_dir,
    read_manifest,
)
from elasticsearch_ray.index.spec import IndexSpec
from elasticsearch_ray.sources.webpages import plan_shards

TUPLE_SCHEMA_BASE = [
    ("part", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("local", pa.int32()),
    ("tf", pa.int32()),
    ("norm", pa.uint8()),
]


def sketch_head_terms(shards: list[dict], spec: IndexSpec) -> set[str]:
    """Driver-side sample sketch of head-term df ratios (SURVEY §4 skew row).

    Reads up to ``spec.sample_docs`` rows of the first shard's text column —
    heavy hitters are exactly the terms a small uniform sample finds."""
    if not shards:
        return set()
    n = 0
    df: Counter = Counter()
    analyzer = get_analyzer(spec.analyzer)
    pf = pq.ParquetFile(shards[0]["path"])
    tcol = spec.text_column if spec.text_column in pf.schema_arrow.names else "text"
    for batch in pf.iter_batches(batch_size=512, columns=[tcol]):
        for text in batch[tcol].to_pylist():
            terms, _ = analyzer(text or "")
            df.update(set(terms))
            n += 1
            if n >= spec.sample_docs:
                break
        if n >= spec.sample_docs:
            break
    if n == 0:
        return set()
    return {t for t, c in df.items() if c / n >= spec.head_df_ratio}


class TokenizeShard:
    """Actor-pool stage: one call processes one input shard end-to-end.

    Analyzer resources load once per actor (__init__), per the actor-pool
    pattern; the head-term set arrives as a broadcast object ref."""

    def __init__(self, index_dir: str, spec_dict: dict, head_terms):
        self.index_dir = index_dir
        self.spec = IndexSpec.from_dict(spec_dict)
        self.analyzer = get_analyzer(self.spec.analyzer)
        # head_terms is a frozenset baked into the actor-creation task — it is
        # shipped to each actor ONCE (broadcast), not per batch.
        self.head_terms = head_terms or set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            out.append(self._one_shard(row))
        return pa.concat_tables(out) if out else self._empty()

    def _empty(self) -> pa.Table:
        fields = list(TUPLE_SCHEMA_BASE)
        if self.spec.store_positions:
            fields.append(("pos", pa.list_(pa.int32())))
        return pa.table({k: pa.array([], t) for k, t in fields})

    def _one_shard(self, shard: dict) -> pa.Table:
        spec = self.spec
        part, base = int(shard["part"]), int(shard["base"])
        avail = set(pq.read_schema(shard["path"]).names)
        doc_cols = [c for c in spec.doc_columns if c in avail]
        src_col = "html" if spec.use_html else spec.text_column
        cols = list(dict.fromkeys(doc_cols + [src_col]))  # prune at the read
        tbl = pq.read_table(shard["path"], columns=cols)
        if spec.use_html:
            texts = [
                strip_html(h.decode("utf-8"), spec.escaped_tags) if h is not None else ""
                for h in tbl["html"].to_pylist()
            ]
        else:
            texts = [t or "" for t in tbl[spec.text_column].to_pylist()]

        n_docs = len(texts)
        # flatten (doc, pos, term) over the shard
        all_terms: list[str] = []
        locs_l: list[np.ndarray] = []
        poss_l: list[np.ndarray] = []
        doclens = np.zeros(n_docs, dtype=np.int64)
        for i, text in enumerate(texts):
            terms, pos = self.analyzer(text)
            doclens[i] = len(terms)
            if terms:
                all_terms.extend(terms)
                locs_l.append(np.full(len(terms), i, dtype=np.int32))
                poss_l.append(np.asarray(pos, dtype=np.int32))
        norms = int_to_byte4(doclens)

        # docs.parquet side-write (atomic) — the lineage/fetch table
        dcols = {
            "doc_id": pa.array(base + np.arange(n_docs, dtype=np.int64)),
            "doclen": pa.array(doclens.astype(np.int32)),
            "norm": pa.array(norms),
        }
        for c in doc_cols:
            if c not in dcols:
                dcols[c] = tbl[c]
        docs_tbl = pa.table(dcols)
        pdir = part_dir(self.index_dir, part)
        os.makedirs(pdir, exist_ok=True)
        atomic_write_table(docs_tbl, os.path.join(pdir, "docs.parquet"))

        if not all_terms:
            return self._empty()
        locs = np.concatenate(locs_l)
        poss = np.concatenate(poss_l)
        codes_arr = pa.array(all_terms, pa.string()).dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = codes_arr.dictionary

        # group (doc, term): stable sort by (local, code, pos)
        order = np.lexsort((poss, codes, locs))
        locs_s, codes_s, poss_s = locs[order], codes[order], poss[order]
        change = np.empty(len(locs_s), dtype=bool)
        change[0] = True
        np.logical_or(locs_s[1:] != locs_s[:-1], codes_s[1:] != codes_s[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(locs_s))
        tfs = (ends - starts).astype(np.int32)
        g_local = locs_s[starts]
        g_code = codes_s[starts]
        g_terms = vocab.take(pa.array(g_code))

        # head-term salting
        if self.head_terms:
            head_mask = pa.compute.is_in(
                g_terms, value_set=pa.array(sorted(self.head_terms), pa.string())
            ).to_numpy(zero_copy_only=False)
            salt = np.where(head_mask, g_local // spec.salt_docs, 0).astype(np.int32)
        else:
            salt = np.zeros(len(starts), dtype=np.int32)

        data = {
            "part": pa.array(np.full(len(starts), part, dtype=np.int32)),
            "term": g_terms.cast(pa.string()) if isinstance(g_terms, pa.Array) else g_terms,
            "salt": pa.array(salt),
            "local": pa.array(g_local),
            "tf": pa.array(tfs),
            "norm": pa.array(norms[g_local]),
        }
        if spec.store_positions:
            offsets = np.zeros(len(starts) + 1, dtype=np.int64)
            offsets[1:] = ends
            offsets[0] = starts[0]
            data["pos"] = pa.ListArray.from_arrays(
                pa.array(np.concatenate([starts[:1] * 0, ends]).astype(np.int32)),
                pa.array(poss_s, pa.int32()),
            )
        return pa.table(data)


class EncodeRuns:
    """Post-shuffle aggregation: encode consecutive (part, term, salt) runs of
    the sorted tuple stream into posting chunks; one run file per (partition,
    batch). Chunks are self-contained, so batch boundaries splitting a term
    are harmless — the merge re-combines."""

    def __init__(self, index_dir: str, spec_dict: dict):
        self.index_dir = index_dir
        self.spec = IndexSpec.from_dict(spec_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "run_path": pa.array([], pa.string())}
            )
        parts = batch["part"].to_numpy()
        codes_arr = batch["term"].combine_chunks().dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = codes_arr.dictionary
        locals_ = batch["local"].to_numpy()
        tfs = batch["tf"].to_numpy()
        norms = batch["norm"].to_numpy()
        with_pos = self.spec.store_positions and "pos" in batch.column_names
        if with_pos:
            pos_col = batch["pos"].combine_chunks()
            pos_values = pos_col.flatten().to_numpy(zero_copy_only=False)
            pos_offsets = pos_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

        change = np.empty(len(parts), dtype=bool)
        change[0] = True
        np.logical_or(parts[1:] != parts[:-1], codes[1:] != codes[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(parts))

        rows: dict[int, dict[str, list]] = {}
        for s, e in zip(starts, ends):
            p = int(parts[s])
            d = locals_[s:e].astype(np.int64)
            t = tfs[s:e].astype(np.int64)
            nm = norms[s:e].astype(np.uint8)
            if len(d) > 1 and np.any(d[1:] <= d[:-1]):  # defensive: sort gives order
                o = np.argsort(d, kind="stable")
                d, t, nm = d[o], t[o], nm[o]
            blob = encode_postings(d, t, nm)
            r = rows.setdefault(
                p,
                {"term": [], "df": [], "total_tf": [], "first_doc": [], "blob": [],
                 "pos_flat": [], "pos_lens": []},
            )
            r["term"].append(str(vocab[int(codes[s])]))
            r["df"].append(e - s)
            r["total_tf"].append(int(t.sum()))
            r["first_doc"].append(int(d[0]))
            r["blob"].append(blob)
            if with_pos:
                r["pos_flat"].append(pos_values[pos_offsets[s] : pos_offsets[e]])
                r["pos_lens"].append((pos_offsets[s + 1 : e + 1] - pos_offsets[s:e]).astype(np.int32))

        out_parts, out_paths = [], []
        for p, r in rows.items():
            pdir = part_dir(self.index_dir, p)
            rdir = os.path.join(pdir, "runs")
            os.makedirs(rdir, exist_ok=True)
            cols = {
                "term": pa.array(r["term"], pa.string()),
                "df": pa.array(r["df"], pa.int64()),
                "total_tf": pa.array(r["total_tf"], pa.int64()),
                "first_doc": pa.array(r["first_doc"], pa.int64()),
                "blob": pa.array(r["blob"], pa.binary()),
            }
            if with_pos:
                lens = np.array([len(x) for x in r["pos_flat"]], dtype=np.int32)
                off = np.zeros(len(lens) + 1, dtype=np.int32)
                np.cumsum(lens, out=off[1:])
                cols["pos_flat"] = pa.ListArray.from_arrays(
                    pa.array(off),
                    pa.array(
                        np.concatenate(r["pos_flat"]) if len(r["pos_flat"]) else np.empty(0, np.int32),
                        pa.int32(),
                    ),
                )
                lens2 = np.array([len(x) for x in r["pos_lens"]], dtype=np.int32)
                off2 = np.zeros(len(lens2) + 1, dtype=np.int32)
                np.cumsum(lens2, out=off2[1:])
                cols["pos_lens"] = pa.ListArray.from_arrays(
                    pa.array(off2),
                    pa.array(
                        np.concatenate(r["pos_lens"]) if len(r["pos_lens"]) else np.empty(0, np.int32),
                        pa.int32(),
                    ),
                )
            path = os.path.join(rdir, f"run-{uuid.uuid4().hex}.parquet")
            pq.write_table(pa.table(cols), path)
            out_parts.append(p)
            out_paths.append(path)
        return pa.table(
            {"part": pa.array(out_parts, pa.int32()), "run_path": pa.array(out_paths, pa.string())}
        )


def _concat_list_groups(col: pa.ChunkedArray | pa.ListArray, starts, ends) -> pa.ListArray:
    """Concatenate consecutive list rows [starts[i], ends[i]) into one list row
    per group — vectorized (values buffer untouched; only offsets rebuilt)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    new_offs = np.empty(len(starts) + 1, dtype=np.int64)
    new_offs[0] = offs[starts[0]] if len(starts) else 0
    new_offs[1:] = offs[ends]
    lo, hi = int(new_offs[0]), int(new_offs[-1])
    vals = arr.values.slice(lo, hi - lo)
    return pa.ListArray.from_arrays(pa.array((new_offs - lo).astype(np.int32)), vals)


def merge_part(index_dir: str, part: int, run_paths: list[str], shard: dict, spec: IndexSpec) -> dict:
    """Combine one partition's run chunks into the final canonical segment.

    The tiered-merge primitive (MergePolicyConfig.java semantics live in
    merge.py): k-way combine of sorted term streams; single-chunk terms pass
    through byte-identical, multi-chunk terms (salted heads + batch-boundary
    splits) are canonically re-encoded, so segment bytes are deterministic
    regardless of shuffle chunking."""
    t0 = time.time()
    pdir = part_dir(index_dir, part)
    with_pos = spec.store_positions
    cols = ["term", "df", "total_tf", "first_doc", "blob"] + (
        ["pos_flat", "pos_lens"] if with_pos else []
    )
    tables = [pq.read_table(p, columns=cols) for p in run_paths]
    runs = pa.concat_tables(tables) if tables else None
    norms_lookup = pq.read_table(os.path.join(pdir, "docs.parquet"), columns=["norm", "doclen"])
    norms_np = norms_lookup["norm"].to_numpy()
    doclen_np = norms_lookup["doclen"].to_numpy()

    if runs is not None and len(runs):
        runs = runs.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        terms_col = runs["term"]
        term_np = np.asarray(terms_col.to_pylist(), dtype=object)
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
                final_blobs.append(reencode_canonical(blobs[s:e], norms_np))
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
            # canonicalize: ONE positions row per term — concat chunk lists in
            # (term, first_doc) row order, purely via offset arithmetic so the
            # output is independent of how the shuffle chunked each term.
            pos_tbl = pa.table(
                {
                    "pos_flat": _concat_list_groups(runs["pos_flat"], starts, ends),
                    "pos_lens": _concat_list_groups(runs["pos_lens"], starts, ends),
                }
            )
            atomic_write_table(pos_tbl, os.path.join(pdir, "positions.parquet"))
        atomic_write_table(pa.table(tcols), os.path.join(pdir, "terms.parquet"))
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
            atomic_write_table(
                pa.table(
                    {
                        "pos_flat": pa.array([], pa.list_(pa.int32())),
                        "pos_lens": pa.array([], pa.list_(pa.int32())),
                    }
                ),
                os.path.join(pdir, "positions.parquet"),
            )
        atomic_write_table(pa.table(tcols), os.path.join(pdir, "terms.parquet"))
        n_terms = 0
        n_multi = 0

    manifest = {
        "part": part,
        "input_path": shard["path"],
        "input_rows": shard["rows"],
        "base_doc_id": shard["base"],
        "n_docs": int(len(norms_np)),
        "sum_dl": int(doclen_np.sum()),
        "n_terms": int(n_terms),
        "multi_chunk_terms": int(n_multi),
        "runs_merged": len(run_paths),
        "postings_bytes": int(os.path.getsize(os.path.join(pdir, "postings.bin"))),
        "elapsed_sec": round(time.time() - t0, 3),
    }
    shutil.rmtree(os.path.join(pdir, "runs"), ignore_errors=True)
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
                self.index_dir, int(row["part"]), list(row["run_paths"]), row["shard"], self.spec
            )
            out.append({"part": m["part"], "n_docs": m["n_docs"], "sum_dl": m["sum_dl"],
                        "n_terms": m["n_terms"]})
        return pa.Table.from_pylist(out)


def build_index(
    corpus_dir: str,
    index_dir: str,
    spec: IndexSpec | None = None,
    concurrency: int | None = None,
    file_pattern: str = "*.parquet",
) -> dict:
    """Build (or resume) the inverted index. Returns the index meta dict."""
    spec = spec or IndexSpec()
    os.makedirs(index_dir, exist_ok=True)
    shards = plan_shards(corpus_dir, file_pattern)
    done, todo = [], []
    for s in shards:
        m = read_manifest(index_dir, s["part"])
        if m and m.get("input_rows") == s["rows"] and m.get("input_path") == s["path"]:
            done.append(m)
        else:
            shutil.rmtree(part_dir(index_dir, s["part"]), ignore_errors=True)
            todo.append(s)

    spec_dict = spec.to_dict()
    if todo:
        head = frozenset(sketch_head_terms(todo, spec))
        ncpu = concurrency or max(1, int(ray.cluster_resources().get("CPU", 4)))
        # Autoscaling (1, N) pools: a fixed-size pool per stage can deadlock —
        # two stages × min(ncpu, parts) actors would each reserve the whole
        # CPU budget and the downstream pool never starts. With min=1 the
        # streaming executor grows/shrinks pools as CPUs free up.
        pool = (1, min(ncpu, max(1, len(todo))))
        tuples = (
            rd.from_items(todo, override_num_blocks=len(todo))
            .map_batches(
                TokenizeShard,
                fn_constructor_args=(index_dir, spec_dict, head),
                batch_size=1,
                batch_format="pyarrow",
                concurrency=pool,
                num_cpus=1,
            )
            .sort(["part", "term", "salt", "local"])
            .map_batches(
                EncodeRuns,
                fn_constructor_args=(index_dir, spec_dict),
                batch_format="pyarrow",
                concurrency=pool,
                num_cpus=1,
            )
        )
        run_rows = tuples.take_all()
        runs_by_part: dict[int, list[str]] = {s["part"]: [] for s in todo}
        for r in run_rows:
            runs_by_part[int(r["part"])].append(r["run_path"])
        merge_items = [
            {"part": s["part"], "run_paths": runs_by_part[s["part"]], "shard": s} for s in todo
        ]
        merged = rd.from_items(merge_items, override_num_blocks=len(merge_items)).map_batches(
            MergeParts,
            fn_constructor_args=(index_dir, spec_dict),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=(1, min(ncpu, max(1, len(merge_items)))),
            num_cpus=1,
        )
        merged.take_all()
        done = [read_manifest(index_dir, s["part"]) for s in shards]

    meta = {
        "spec": spec.to_dict(),
        "num_parts": len(shards),
        "n_docs": int(sum(m["n_docs"] for m in done)),
        "sum_dl": int(sum(m["sum_dl"] for m in done)),
        "parts": [
            {"part": m["part"], "n_docs": m["n_docs"], "input_path": m["input_path"]} for m in done
        ],
    }
    atomic_write_json(os.path.join(index_dir, "index_meta.json"), meta)
    return meta
