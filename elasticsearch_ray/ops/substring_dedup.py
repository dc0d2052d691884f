"""Substring-span deduplication for training corpora — the
suffix-array "dedup by 50-token repeated substrings" of Lee et al.,
"Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499). A span is duplicated when the SAME ``window``-token
sequence occurs at least ``min_count`` times across (or within)
documents.

Distributed shape (no suffix array — the same detection via window
fingerprints):

1. per-batch, vectorized: whitespace-tokenize, stable-hash tokens
   (``pandas.util.hash_array``, fixed key — process-salt-free), and
   fingerprint every consecutive ``window``-token window with a
   polynomial hash in natural uint64 wraparound
   (``sum tok[i+j] * B^j``) — ``window`` fused multiply-adds per
   token, all numpy;
2. ONE map-side-combined groupby over (fingerprint) with per-batch
   partial counts — the shuffle carries fingerprint-count pairs and
   bounded (fingerprint, doc, pos) occurrence lists (``bucket_cap``
   like the MinHash LSH stage), never tokens;
3. per-doc span assembly: occurrences of duplicated fingerprints merge
   into maximal [start_tok, end_tok) spans (overlapping windows
   coalesce, exactly the suffix-array span semantics).

``remove_duplicated_spans`` drops every occurrence AFTER the first in
(doc_id, pos) order — the paper's "keep one copy" policy — via a
broadcast {doc_id: spans} table (scale path for corpora where the
duplicated-doc set itself is huge: write spans to parquet and
sort-merge by doc_id instead; the detection stages are unchanged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

B = np.uint64(1099511628211)  # FNV prime — odd, full-period mod 2^64


def _token_hashes(tokens: list[str]) -> np.ndarray:
    if not tokens:
        return np.empty(0, np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)) \
        .astype(np.uint64)


def window_fingerprints(tokens: list[str], window: int) -> np.ndarray:
    """uint64 fingerprint of every consecutive ``window``-token run."""
    th = _token_hashes(tokens)
    n = len(th) - window + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    out = np.zeros(n, np.uint64)
    p = np.uint64(1)
    for j in range(window):
        out += th[j:j + n] * p
        p = p * B
    return out


def _occurrences(batch: pa.Table, text_col: str, id_col: str,
                 window: int) -> pa.Table:
    ids, poss, fps = [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
        f = window_fingerprints((text or "").split(), window)
        if len(f):
            ids.append(np.full(len(f), doc_id, np.int64))
            poss.append(np.arange(len(f), dtype=np.int64))
            fps.append(f)
    if not ids:
        return pa.table({"fp": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    return pa.table({"fp": pa.array(np.concatenate(fps)),
                     "doc_id": pa.array(np.concatenate(ids)),
                     "pos": pa.array(np.concatenate(poss))})


def duplicated_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                     window: int = 50, min_count: int = 2,
                     keep_first: bool = False) -> pd.DataFrame:
    """Maximal duplicated token spans per document:
    ``(doc_id, start_tok, end_tok, n_windows)``. With ``keep_first``
    the earliest occurrence of each fingerprint in (doc_id, pos) order
    is exempt (the kept copy)."""
    from ray.data.aggregate import Sum

    scan = ds.select_columns([id_col, text_col])

    # pass 1: per-batch PARTIAL fingerprint counts (the shuffle carries
    # fingerprint-count pairs, never one row per token), reduced by one
    # small groupby-sum; only fingerprints clearing min_count survive
    def partial_counts(b: pa.Table) -> pa.Table:
        occ = _occurrences(b, text_col, id_col, window)
        if len(occ) == 0:
            return pa.table({"fp": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        fp, n = np.unique(occ["fp"].to_numpy(), return_counts=True)
        return pa.table({"fp": pa.array(fp),
                         "n": pa.array(n.astype(np.int64))})

    counts = (scan.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("fp").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    if counts.empty or "fp" not in counts.columns:
        return pd.DataFrame(columns=["doc_id", "start_tok", "end_tok",
                                     "n_windows"])
    dup_arr = np.sort(counts.loc[counts["n"] >= min_count, "fp"]
                      .to_numpy(dtype=np.uint64))
    if len(dup_arr) == 0:
        return pd.DataFrame(columns=["doc_id", "start_tok", "end_tok",
                                     "n_windows"])

    # pass 2: re-scan, keeping only occurrences of the (broadcast)
    # duplicated fingerprints — the driver frame is bounded by the
    # duplicate volume, not the corpus
    def dup_occurrences(b: pa.Table, _dup=dup_arr) -> pa.Table:
        occ = _occurrences(b, text_col, id_col, window)
        if len(occ) == 0:
            return occ
        f = occ["fp"].to_numpy()
        idx = np.searchsorted(_dup, f)
        idx[idx == len(_dup)] = 0
        mask = _dup[idx] == f if len(_dup) else np.zeros(len(f), bool)
        return occ.filter(pa.array(mask))

    dup = (scan.map_batches(dup_occurrences, batch_format="pyarrow")
           .to_pandas())
    if dup.empty:
        return pd.DataFrame(columns=["doc_id", "start_tok", "end_tok",
                                     "n_windows"])
    if keep_first:
        dup = dup.sort_values(["fp", "doc_id", "pos"])
        dup = dup[dup.duplicated("fp", keep="first")]
    if dup.empty:
        return pd.DataFrame(columns=["doc_id", "start_tok", "end_tok",
                                     "n_windows"])
    # merge overlapping windows into maximal spans per doc
    rows = []
    for doc_id, g in dup.groupby("doc_id"):
        pos = np.sort(g["pos"].to_numpy())
        start = prev = int(pos[0])
        n = 1
        for p in pos[1:]:
            p = int(p)
            if p <= prev + window:  # windows overlap or touch
                prev = p
                n += 1
            else:
                rows.append((doc_id, start, prev + window, n))
                start = prev = p
                n = 1
        rows.append((doc_id, start, prev + window, n))
    out = pd.DataFrame(rows, columns=["doc_id", "start_tok", "end_tok",
                                      "n_windows"])
    return out.sort_values(["doc_id", "start_tok"], ignore_index=True)


def remove_duplicated_spans(ds, text_col: str = "text",
                            id_col: str = "doc_id", window: int = 50,
                            min_count: int = 2):
    """Rewrite the corpus with every duplicated span occurrence AFTER
    the first removed (keep-one-copy). Returns a Dataset with the same
    schema; the detection result rides in as a broadcast dict."""
    spans = duplicated_spans(ds, text_col, id_col, window, min_count,
                             keep_first=True)
    by_doc: dict = {}
    for r in spans.itertuples(index=False):
        by_doc.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))

    def strip(batch: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            cuts = by_doc.get(doc_id)
            if not cuts:
                texts.append(text)
                continue
            toks = (text or "").split()
            keep = np.ones(len(toks), bool)
            for s, e in cuts:
                keep[s:e] = False
            texts.append(" ".join(t for t, k in zip(toks, keep) if k))
        out = batch.copy()
        out[text_col] = texts
        return out

    return ds.map_batches(strip, batch_format="pandas")
