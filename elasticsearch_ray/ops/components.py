"""Distributed connected components over an edge Dataset — the transitive-
closure step that turns near-duplicate PAIRS (MinHash/SimHash/embedding
banding, ops/dedup.py) into duplicate CLUSTERS with one representative each,
so "keep one per cluster" dedup is well-defined even when similarity is not
transitive (a~b, b~c, a≁c).

Algorithm: "hash-to-min" star contraction (Rastogi, Machanavajjhala, Chitnis
& Das Sarma, "Finding Connected Components in Map-Reduce in Logarithmic
Rounds", ICDE 2013). Each round is two sort-based all-to-all shuffles over
the edge list with fully VECTORIZED per-block kernels between them (range
partitioning contains each key in one block, so np.unique + reduceat do the
per-node work — no per-group Python, no driver-side union-find; the edge
list never has to fit on one machine). Converges to per-component stars
rooted at the component minimum in O(log n) rounds.

Reference semantics: the reference has no clustering operator (dedup there
is per-key exact); this is one of the beyond-reference training-data
operators the engine adds (SURVEY LLM-pipeline section)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _star_round(edges: Dataset) -> Dataset:
    """One hash-to-min round, FULLY VECTORIZED with sort-based shuffles (no
    per-group Python callbacks — at a million-node candidate graph per-node
    map_groups would dominate; and no Dataset.join — Ray's hash-shuffle
    stages emit zero-schema empty blocks that map_batches passes through
    and downstream key resolution chokes on).

    Plan: symmetrize → sort("u") → per-BLOCK vectorized star emission
    (np.unique + minimum.reduceat) → sort(["a","b"]) → per-block dedup.
    Sort boundaries are row-based, so a key run CAN straddle two blocks
    (measured round 4) — this algorithm is SPLIT-TOLERANT by design: a
    u split into blocks with local minima m1 ≠ m2 emits (m1,u) and
    (m2,u), which keep the component connected through u (hash-to-min
    converges regardless of per-block granularity), and a (a,b) pair
    duplicated across a dedup-block boundary is just extra volume at the
    fixpoint. Do NOT copy this per-block shape for arg-min/dedup-by-key
    semantics — those need the two-phase combiner + grouped final pick
    (see pipelines/transform.py latest). Self-loops (m, m) persist at
    component roots — harmless at the fixpoint and they keep isolated
    nodes visible."""

    def _empty(*cols: str) -> pa.Table:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})

    def symmetrize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return _empty("u", "v")
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})

    def star_block(batch: pa.Table) -> pa.Table:
        # batch = one sorted block; every u-group is fully contained
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return _empty("a", "b")
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        uniq, starts = np.unique(u, return_index=True)  # u sorted → O(n)
        m = np.minimum(np.minimum.reduceat(v, starts), uniq)
        sizes = np.diff(np.r_[starts, len(u)])
        a = np.concatenate([np.repeat(m, sizes), m])
        b = np.concatenate([v, uniq])
        return pa.table({"a": a.astype(np.int64), "b": b.astype(np.int64)})

    def dedup_block(batch: pa.Table) -> pa.Table:
        # sorted by (a, b): global distinct == block-local distinct
        if batch.num_rows == 0 or "a" not in batch.column_names:
            return _empty("a", "b")
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"a": a[keep], "b": b[keep]})

    stars = (edges.map_batches(symmetrize, batch_format="pyarrow")
             .sort("u")
             .map_batches(star_block, batch_format="pyarrow",
                          batch_size=None))
    return (stars.sort(["a", "b"])
            .map_batches(dedup_block, batch_format="pyarrow",
                         batch_size=None))


def _checksum(edges: Dataset) -> tuple:
    """(count, order-independent hash) of the edge set — the convergence
    probe. Stable mixing (no Python hash(): process-salted)."""

    def h(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = a * np.uint64(0x9E3779B97F4A7C15) ^ (b + np.uint64(0x165667B19E3779F9))
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        # one modular-uint64 partial per batch — a plain Sum("h") would
        # overflow int64 inside Ray's Python-int aggregate and fail the
        # Arrow conversion; uint64 wraparound is exact mod-2^64 arithmetic
        # and order-independent, so partials combine on the driver
        s = np.add.reduce(x, dtype=np.uint64) if len(x) else np.uint64(0)
        return pa.table({"h": np.array([s], dtype=np.uint64).view(np.int64),
                         "n": np.array([len(x)], dtype=np.int64)})

    parts = edges.map_batches(h, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return (0, 0)
    total = np.add.reduce(parts["h"].to_numpy().view(np.uint64), dtype=np.uint64)
    return (int(parts["n"].sum()), int(total))


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         max_rounds: int = 16) -> pd.DataFrame:
    """Label every node reachable through ``edges`` with its component's
    minimum id. Accepts a Ray Dataset or a pandas DataFrame of pairs;
    returns a DataFrame (id, component) sorted by id.

    Each round materializes the (shrinking) edge list — iterative fixpoints
    can't stream end-to-end — but the edge list is candidate-pair-sized,
    never corpus-sized."""
    import ray.data as rd

    if isinstance(edges, pd.DataFrame):
        if len(edges) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                 "component": pd.Series([], dtype="int64")})
        edges = rd.from_pandas(edges[[src, dst]])

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": np.minimum(a, b), "b": np.maximum(a, b)})

    cur = edges.map_batches(canon, batch_format="pyarrow").materialize()
    prev_sig = _checksum(cur)
    converged = False
    for _ in range(max_rounds):
        cur = _star_round(cur).materialize()
        sig = _checksum(cur)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # hash-to-min needs O(log n) rounds; silently mislabeled components
        # would corrupt a dedup downstream, so an unconverged fixpoint is an
        # error, not a result
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (components of diameter ~2^rounds are covered)")

    # converged: edges are (root, member) stars; component(id) = root,
    # and every root labels itself
    pdf = cur.to_pandas()
    if len(pdf) == 0 or "a" not in pdf.columns:
        # an empty Dataset loses its schema through map_batches
        return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    members = pdf.rename(columns={"b": "id", "a": "component"})
    roots = pd.DataFrame({"id": pdf["a"].unique()})
    roots["component"] = roots["id"]
    out = (pd.concat([members, roots], ignore_index=True)
           .drop_duplicates("id")
           .sort_values("id")
           .reset_index(drop=True))
    return out[["id", "component"]].astype({"id": "int64", "component": "int64"})


def near_dup_components(ds: Dataset, text_col: str, id_col: str,
                        threshold: float = 0.8, **kw) -> pd.DataFrame:
    """MinHash near-dup pairs → connected components: (id, component) for
    every doc in a near-duplicate cluster; docs with no near-dup are absent.
    ``component`` = smallest doc id in the cluster (the canonical survivor
    under keep-first dedup)."""
    from elasticsearch_ray.ops.dedup import minhash_near_dups

    pairs = minhash_near_dups(ds, text_col, id_col, threshold=threshold, **kw)
    return connected_components(pairs)
