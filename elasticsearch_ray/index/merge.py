"""Tiered segment merge + force-merge.

The reference's merge layer (``index/MergePolicyConfig.java:104-112``:
floor 2 MB, ≤10 merges at once, 10 segments per tier, 5 GB max merged
segment; force-merge via ``InternalEngine.forceMerge``,
``InternalEngine.java:2106-2126``). In our layout a segment IS a partition
(contiguous global doc-id range), so merging = combining ADJACENT partitions:
doc ranges stay contiguous, partition-local ids remap by base offset, and the
(score, part, doc) merge tie-break is preserved because global doc order is
preserved.

Merges run as parallel Ray tasks, one per merge group; each group k-way
combines sorted term streams, remaps and canonically re-encodes postings, and
concatenates positions in doc order. Gate: merged segments score-identically
to unmerged (tested)."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from elasticsearch_ray.index.spec import field_of_term
from elasticsearch_ray.index.postings import decode_postings, encode_postings
from elasticsearch_ray.index.segments import (
    FORMAT_VERSION,
    atomic_write_bytes,
    write_term_bloom,
    atomic_write_json,
    atomic_write_table,
    manifest_path,
    part_dir,
)

FLOOR_BYTES = 2 * 1024 * 1024  # MergePolicyConfig floor_segment
MAX_MERGE_AT_ONCE = 10
SEGMENTS_PER_TIER = 10
MAX_MERGED_BYTES = 5 * 1024**3


def plan_tiered_merges(parts: list[dict]) -> list[list[int]]:
    """Pick groups of ADJACENT partitions to merge, TieredMergePolicy-style:
    below-floor segments merge eagerly; above-floor segments are binned into
    logarithmic size tiers (tier = log2(bytes/floor)) and an over-budget
    tier (> SEGMENTS_PER_TIER members) merges adjacent same-tier runs.
    Input: [{part, bytes}] sorted by part id. Only consecutive part ids ever
    group (doc ranges must stay contiguous)."""
    import math

    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for p in parts:
        b = p["bytes"]
        if cur and (
            len(cur) >= MAX_MERGE_AT_ONCE
            or cur_bytes + b > MAX_MERGED_BYTES
            or (b >= FLOOR_BYTES and cur_bytes >= FLOOR_BYTES)
        ):
            if len(cur) > 1:
                groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(p["part"])
        cur_bytes += b
    if len(cur) > 1:
        groups.append(cur)

    # tier pass: cap segments-per-size-tier for healthy (above-floor)
    # segments the floor pass left alone
    in_group = {p for g in groups for p in g}
    by_tier: dict[int, list[dict]] = {}
    for p in parts:
        if p["part"] in in_group or p["bytes"] < FLOOR_BYTES:
            continue
        t = int(math.log2(p["bytes"] / FLOOR_BYTES))
        by_tier.setdefault(t, []).append(p)
    for seg in by_tier.values():
        if len(seg) <= SEGMENTS_PER_TIER:
            continue
        run = [seg[0]]
        run_bytes = seg[0]["bytes"]
        for prev, nxt in zip(seg, seg[1:]):
            if (nxt["part"] == prev["part"] + 1 and len(run) < MAX_MERGE_AT_ONCE
                    and run_bytes + nxt["bytes"] <= MAX_MERGED_BYTES):
                run.append(nxt)
                run_bytes += nxt["bytes"]
            else:
                if len(run) > 1:
                    groups.append([x["part"] for x in run])
                run, run_bytes = [nxt], nxt["bytes"]
        if len(run) > 1:
            groups.append([x["part"] for x in run])
    return groups


def merge_group(index_dir: str, group: list[int]) -> dict:
    """Merge the adjacent partitions in ``group`` into the first one's slot."""
    group = sorted(group)
    pdirs = [part_dir(index_dir, p) for p in group]
    manifests = []
    for pd in pdirs:
        with open(os.path.join(pd, "manifest.json")) as f:
            manifests.append(json.load(f))
    new_base = min(m["base_doc_id"] for m in manifests)

    docs_tables = [pq.read_table(os.path.join(pd, "docs.parquet")) for pd in pdirs]
    new_docs = pa.concat_tables(docs_tables)
    norms_np = new_docs["norm"].to_numpy()
    field_norms_np = {
        n[5:]: new_docs[n].to_numpy() for n in new_docs.schema.names if n.startswith("norm_")
    }

    with_pos = all(os.path.exists(os.path.join(pd, "positions.bin")) for pd in pdirs)
    rows = []  # (term, src_idx, term_row)
    terms_tbls, blobs, pos_bins, offsets = [], [], [], []
    for si, (pd, m) in enumerate(zip(pdirs, manifests)):
        t = pq.read_table(os.path.join(pd, "terms.parquet"))
        terms_tbls.append(t)
        pb = os.path.join(pd, "postings.bin")
        with open(pb, "rb") as f:
            blobs.append(f.read())
        if with_pos:
            pbin = os.path.join(pd, "positions.bin")
            pos_bins.append(
                np.fromfile(pbin, dtype="<i4") if os.path.getsize(pbin) else np.empty(0, "<i4")
            )
        offsets.append(m["base_doc_id"] - new_base)
        for ri, term in enumerate(t["term"].to_pylist()):
            rows.append((term, si, ri))
    rows.sort()

    final_terms: list[str] = []
    final_df: list[int] = []
    final_ttf: list[int] = []
    final_blobs: list[bytes] = []
    pos_flat_out: list[np.ndarray] = []
    i = 0
    while i < len(rows):
        j = i
        term = rows[i][0]
        while j < len(rows) and rows[j][0] == term:
            j += 1
        d_arr, t_arr, pf_arr = [], [], []
        df = ttf = 0
        for _, si, ri in rows[i:j]:  # sources in part order → doc order
            tt = terms_tbls[si]
            off, ln = int(tt["off"][ri].as_py()), int(tt["len"][ri].as_py())
            d, tf = decode_postings(memoryview(blobs[si])[off : off + ln])
            d_arr.append(d + offsets[si])
            t_arr.append(tf)
            df += int(tt["df"][ri].as_py())
            ttf += int(tt["total_tf"][ri].as_py())
            if with_pos:
                po = int(tt["pos_off"][ri].as_py()) // 4
                pn = int(tt["pos_len"][ri].as_py()) // 4
                pf_arr.append(pos_bins[si][po : po + pn])
        docs = np.concatenate(d_arr)
        tfs = np.concatenate(t_arr)
        final_terms.append(term)
        final_df.append(df)
        final_ttf.append(ttf)
        fld = field_of_term(term)
        nl = norms_np if fld is None else field_norms_np[fld]
        final_blobs.append(encode_postings(docs, tfs, nl[docs]))
        if with_pos:
            pos_flat_out.append(np.concatenate(pf_arr) if pf_arr else np.empty(0, np.int32))
        i = j

    lens = np.array([len(b) for b in final_blobs], dtype=np.int64)
    offs = np.zeros(len(lens), dtype=np.int64)
    if len(lens):
        np.cumsum(lens[:-1], out=offs[1:])
    new_part = group[0]
    pd0 = part_dir(index_dir, new_part)
    # Crash safety: each file write below is individually atomic, but the SET
    # of files is not — a crash mid-way would leave group[0]'s old manifest
    # validating a mix of old/new files (e.g. old term offsets into new
    # postings bytes). Invalidate the manifest FIRST so resume treats the
    # partition as incomplete until the new manifest lands last.
    mpath = manifest_path(index_dir, new_part)
    if os.path.exists(mpath):
        os.remove(mpath)
    atomic_write_bytes(b"".join(final_blobs), os.path.join(pd0, "postings.bin"))
    tcols = {
        "term": pa.array(final_terms, pa.string()),
        "df": pa.array(final_df, pa.int64()),
        "total_tf": pa.array(final_ttf, pa.int64()),
        "off": pa.array(offs),
        "len": pa.array(lens),
    }
    if with_pos:
        plens = np.array([len(a) * 4 for a in pos_flat_out], dtype=np.int64)
        poffs = np.zeros(len(plens), dtype=np.int64)
        if len(plens):
            np.cumsum(plens[:-1], out=poffs[1:])
        vals = (
            np.concatenate(pos_flat_out).astype("<i4", copy=False)
            if pos_flat_out
            else np.empty(0, "<i4")
        )
        atomic_write_bytes(vals.tobytes(), os.path.join(pd0, "positions.bin"))
        tcols["pos_off"] = pa.array(poffs)
        tcols["pos_len"] = pa.array(plens)
    atomic_write_table(pa.table(tcols), os.path.join(pd0, "terms.parquet"))
    atomic_write_table(new_docs, os.path.join(pd0, "docs.parquet"))
    bloom_bits = write_term_bloom(pd0, final_terms)
    manifest = {
        "format": FORMAT_VERSION,
        "part": new_part,
        "input_path": [m["input_path"] for m in manifests],
        "input_rows": sum(m["input_rows"] for m in manifests),
        "base_doc_id": new_base,
        "n_docs": int(len(new_docs)),
        "sum_dl": int(sum(m["sum_dl"] for m in manifests)),
        "sum_dl_fields": {
            f: sum(int((m.get("sum_dl_fields") or {}).get(f, 0)) for m in manifests)
            for m0 in manifests[:1]
            for f in (m0.get("sum_dl_fields") or {})
        },
        "n_terms": len(final_terms),
        "bloom_bits": int(bloom_bits),
        "merged_from": group,
        "postings_bytes": int(os.path.getsize(os.path.join(pd0, "postings.bin"))),
    }
    atomic_write_json(manifest_path(index_dir, new_part), manifest)
    for p in group[1:]:
        shutil.rmtree(part_dir(index_dir, p), ignore_errors=True)
    return manifest


@ray.remote
def _merge_group_task(index_dir: str, group: list[int]) -> dict:
    return merge_group(index_dir, group)


def _rewrite_meta(index_dir: str, merged: list[dict]) -> dict:
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.load(f)
    replaced = {p for m in merged for p in m["merged_from"]}
    parts = [p for p in meta["parts"] if p["part"] not in replaced]
    for m in merged:
        parts.append({"part": m["part"], "n_docs": m["n_docs"], "input_path": m["input_path"]})
    meta["parts"] = sorted(parts, key=lambda p: p["part"])
    meta["num_parts"] = len(meta["parts"])
    atomic_write_json(os.path.join(index_dir, "index_meta.json"), meta)
    return meta


def tiered_merge(index_dir: str) -> dict:
    """One round of tiered merging; returns the updated index meta."""
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.load(f)
    sizes = []
    for p in meta["parts"]:
        pd = part_dir(index_dir, p["part"])
        sizes.append({"part": p["part"], "bytes": os.path.getsize(os.path.join(pd, "postings.bin"))})
    groups = plan_tiered_merges(sorted(sizes, key=lambda s: s["part"]))
    if not groups:
        return meta
    merged = ray.get([_merge_group_task.remote(index_dir, g) for g in groups])
    return _rewrite_meta(index_dir, merged)


def force_merge(index_dir: str, max_segments: int = 1) -> dict:
    """forceMerge(maxNumSegments): merge adjacent partitions down to ≤ N."""
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.load(f)
    parts = sorted(p["part"] for p in meta["parts"])
    if len(parts) <= max_segments:
        return meta
    groups_all = np.array_split(np.array(parts), max_segments)
    groups = [g.tolist() for g in groups_all if len(g) > 1]
    merged = ray.get([_merge_group_task.remote(index_dir, g) for g in groups])
    return _rewrite_meta(index_dir, merged)
