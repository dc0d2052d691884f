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
