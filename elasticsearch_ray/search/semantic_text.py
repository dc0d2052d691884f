"""semantic_text field analog — the published SemanticTextFieldMapper /
SemanticQueryBuilder semantics (x-pack inference plugin): a text field
whose value is CHUNKED at index time, every chunk run through the
field's inference endpoint, and whose ``semantic`` query scores a
document as the best of its chunks.

Mapping of the reference pieces onto Ray Data:

- index-time chunking = ``ops.chunking.chunk_documents`` (the word
  chunker with the inference service's chunking settings);
- the inference endpoint = the expansion-model registry of
  ``search/sparse_vector.py`` (the deterministic ``bow`` model stands
  in for ELSER, exactly as in the sparse_vector / text_expansion
  surface);
- the stored per-chunk embeddings = a LONG (id, chunk_ix, token,
  weight) Dataset — the shape every downstream stage can score
  vectorized;
- ``semantic`` query = query-side inference once on the driver, token
  weights broadcast, per-chunk sparse dot product, then doc score =
  MAX over the doc's chunks (the reference compiles to a nested
  sparse_vector query whose default score mode is max).

Scale shape: chunk + infer are streaming narrow transforms; scoring
filters the long frame to the query's own tokens FIRST (a tiny
fraction), so the two aggregates (chunk-sum, doc-max) shuffle only
query-matching rows. Chunk partial sums are NEVER computed per batch —
a chunk's token rows can straddle block boundaries, so both reductions
go through Ray groupby aggregates (map-side combined).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def semantic_index(ds: Dataset, text_col: str = "text",
                   id_col: str = "doc_id", inference_id: str = "bow",
                   max_words: int = 250, overlap: int = 100) -> Dataset:
    """Chunk every document and run index-time inference on each chunk.
    Returns the long (id_col, chunk_ix, token, weight) Dataset."""
    from elasticsearch_ray.ops.chunking import chunk_documents
    from elasticsearch_ray.search.sparse_vector import expansion_model

    fn = expansion_model(inference_id)  # resolve on the driver, ship
    chunked = chunk_documents(ds, text_col=text_col, id_col=id_col,
                              strategy="word", max_words=max_words,
                              overlap=overlap)

    def infer(df: pd.DataFrame) -> pd.DataFrame:
        ids, ixs, toks, wts = [], [], [], []
        for i, cx, c in zip(df[id_col], df["chunk_ix"], df["chunk"]):
            for t, w in fn(c).items():
                ids.append(i)
                ixs.append(cx)
                toks.append(t)
                wts.append(w)
        return pd.DataFrame({
            id_col: np.asarray(ids),
            "chunk_ix": np.asarray(ixs, np.int64),
            "token": toks,
            "weight": np.asarray(wts, np.float64),
        })

    return chunked.map_batches(infer, batch_format="pandas")


def semantic_query(index_ds: Dataset, query: str,
                   inference_id: str = "bow", k: int = 10,
                   id_col: str = "doc_id") -> pd.DataFrame:
    """Score the semantic index against ``query``: per-chunk sparse dot
    product, doc score = max over chunks, top-k (score desc, id asc).
    Returns a small (id_col, score) frame."""
    import ray
    from ray.data.aggregate import Max, Sum

    from elasticsearch_ray.search.sparse_vector import expansion_model

    qw = expansion_model(inference_id)(query)
    if not qw:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    ref = ray.put(qw)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(ref)
        qv = df["token"].map(q)
        keep = qv.notna().to_numpy()
        out = df.loc[keep, [id_col, "chunk_ix"]].copy()
        out["partial"] = (df["weight"].to_numpy()[keep]
                          * qv.to_numpy(np.float64)[keep])
        return out

    scored = index_ds.map_batches(partials, batch_format="pandas")
    per_chunk = (scored.groupby([id_col, "chunk_ix"])
                 .aggregate(Sum("partial", alias_name="chunk_score")))
    per_doc = (per_chunk.groupby(id_col)
               .aggregate(Max("chunk_score", alias_name="score")))
    out = per_doc.sort(["score", id_col],
                       descending=[True, False]).limit(k).to_pandas()
    if out.empty or "score" not in out.columns:
        # Ray hash groupby emits zero-SCHEMA blocks when nothing
        # matched — normalize to the typed empty frame
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    return out[[id_col, "score"]]


# ------------------------------------------------- persisted serving

def build_semantic_text_index(ds: Dataset, index_dir: str,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              inference_id: str = "bow",
                              max_words: int = 250, overlap: int = 100,
                              field: str = "semantic",
                              weight_quantum: float = 1 / 32):
    """Persisted semantic_text serving — the reference's REAL shape
    (SemanticTextFieldMapper stores chunk embeddings IN the index;
    queries never re-run document inference):

    1. chunk every document (word chunker) and stage the chunks as a
       corpus of their own — one index doc per chunk, parent id +
       chunk_ix carried as doc columns;
    2. ``build_index`` over the chunk corpus (exact BM25 over chunks
       comes free — the reference's nested chunk docs);
    3. index-time inference per chunk → a ``rank_features`` sidecar
       (Lucene FeatureField, exactly how ELSER embeddings are stored),
       built DISTRIBUTED from the parts' own docs.parquet files;
       weights are quantized to ``weight_quantum`` steps so
       FeatureField's 9-bit-mantissa freq encoding is EXACT (bit-equal
       serving and a plain-arithmetic SQL twin);
    4. queries go through :func:`semantic_search_indexed`:
       weighted_tokens over the sidecar + max-over-chunks.

    Build, staging and sidecar are all resumable (spec-fingerprinted
    build; sidecar guarded by ``sidecar_complete``). Returns the
    QueryEngine over the chunk index."""
    import os

    import ray.data as rd

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.rank_features import (
        build_rank_features,
        sidecar_complete,
    )
    from elasticsearch_ray.index.segments import read_manifest
    from elasticsearch_ray.index.spec import IndexSpec
    from elasticsearch_ray.ops.chunking import chunk_documents
    from elasticsearch_ray.search.engine import QueryEngine
    from elasticsearch_ray.search.sparse_vector import expansion_model

    fn = expansion_model(inference_id)
    stage = index_dir.rstrip("/") + ".chunks"
    # params marker: a stale /tmp stage built with DIFFERENT chunker/
    # inference params must rebuild (the repo's stale-cache discipline;
    # review r5f #4). Input-corpus changes flow through build_index's
    # own input fingerprints once the stage regenerates; callers
    # swapping the input under the same dir must use a fresh index_dir.
    import json

    params = {"max_words": max_words, "overlap": overlap,
              "inference_id": inference_id, "field": field,
              "weight_quantum": weight_quantum, "version": 1}
    marker = stage + ".params.json"
    stale = True
    if os.path.isdir(stage) and os.path.exists(marker):
        with open(marker) as f:
            stale = json.load(f) != params
    if stale or not (os.path.isdir(stage)
                     and any(f.endswith(".parquet")
                             for f in os.listdir(stage))):
        chunks = chunk_documents(ds, text_col=text_col, id_col=id_col,
                                 strategy="word", max_words=max_words,
                                 overlap=overlap)

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "url": (df[id_col].astype(str) + "#"
                        + df["chunk_ix"].astype(str)),
                "warc_ts": "1970-01-01T00:00:00Z",
                "chunk": df["chunk"],
                "lang": "en",
                "parent_id": df[id_col],
                "chunk_ix": df["chunk_ix"],
            })
            return out

        import shutil

        # crash leftovers would MERGE with a rerun's files and publish
        # duplicated chunks atomically (review r5f #2)
        shutil.rmtree(stage + ".tmp", ignore_errors=True)
        os.makedirs(stage + ".tmp", exist_ok=True)
        chunks.map_batches(prep, batch_format="pandas") \
            .write_parquet(stage + ".tmp")
        import shutil as _sh

        _sh.rmtree(stage, ignore_errors=True)
        os.replace(stage + ".tmp", stage)
        with open(marker + ".tmp", "w") as f:
            json.dump(params, f)
        os.replace(marker + ".tmp", marker)
    spec = IndexSpec(use_html=False, text_column="chunk",
                     doc_columns=("url", "parent_id", "chunk_ix",
                                  "chunk"))
    meta = build_index(stage, index_dir, spec)
    if not sidecar_complete(index_dir, field):
        items = []
        for part in range(int(meta["num_parts"])):
            man = read_manifest(index_dir, part)
            from elasticsearch_ray.index.segments import part_dir

            items.append({
                "path": os.path.join(part_dir(index_dir, part),
                                     "docs.parquet"),
                "base": int(man["base_doc_id"]),
            })

        def part_feats(df: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            ids, toks, ws = [], [], []
            for path, base in zip(df["path"], df["base"]):
                chunks_txt = pq.read_table(
                    path, columns=["chunk"])["chunk"].to_pylist()
                for i, c in enumerate(chunks_txt):
                    for t, w in fn(c or "").items():
                        ids.append(base + i)
                        toks.append(t)
                        ws.append(w)
            q = weight_quantum
            w_arr = np.round(np.asarray(ws, np.float64) / q) * q
            return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                                 "feature": toks,
                                 "weight": w_arr})

        feats = rd.from_items(items).map_batches(
            part_feats, batch_format="pandas", batch_size=1)
        build_rank_features(index_dir, field, feats)
    return QueryEngine(index_dir)


def semantic_search_indexed(engine, query: str,
                            inference_id: str = "bow", k: int = 10,
                            field: str = "semantic",
                            overfetch: int = 4) -> pd.DataFrame:
    """semantic query served from the PERSISTED chunk index:
    weighted_tokens over the rank_features sidecar fetches the top
    ``k·overfetch`` chunks, the driver reduces max-over-chunks per
    parent and cuts the top ``k`` (score desc, parent asc). Repeated
    queries rebuild NOTHING."""
    from elasticsearch_ray.search.query import WeightedTokensQuery
    from elasticsearch_ray.search.sparse_vector import expansion_model

    qw = expansion_model(inference_id)(query)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                          "score": pd.Series(dtype=np.float64)})
    if not qw:
        return empty
    q = WeightedTokensQuery(field=field, tokens=tuple(sorted(qw.items())))
    # refetch loop on the CHUNK window (review r5f #3): the guarantee
    # needed is k distinct PARENTS with a closed tie group at the
    # boundary — long docs own many chunks and quantized scores tie
    # wide, so a fixed window can under-fill parents or cut a tie group
    fetch_k = max(k * overfetch, k + 16)
    while True:
        hits = engine.search(q, k=fetch_k,
                             fetch=("parent_id", "chunk_ix")).to_pandas()
        if hits.empty:
            return empty
        if len(hits) < fetch_k:  # corpus exhausted — window is total
            break
        # SAFE cut: every unseen chunk scores <= the last fetched
        # chunk; a seen parent's max cannot change (it already owns a
        # chunk >= that), and a NEW parent's max would be <= it — so
        # once the k-th best parent strictly beats the boundary score,
        # widening the window cannot alter the top-k
        pmax = (hits.groupby("parent_id")["score"].max()
                .sort_values(ascending=False))
        if len(pmax) > k and float(pmax.iloc[k - 1]) > \
                float(hits["score"].iloc[-1]):
            break
        fetch_k *= 4
    best = (hits.groupby("parent_id", as_index=False)["score"].max()
            .rename(columns={"parent_id": "doc_id"}))
    best = best.sort_values(["score", "doc_id"],
                            ascending=[False, True], kind="stable",
                            ignore_index=True)
    return best.head(k)[["doc_id", "score"]]
