"""Retriever tree API (8.x search surface).

Reference semantics (all public):

- ``server/src/main/java/org/elasticsearch/search/retriever/
  RetrieverBuilder.java`` — a search request carries ONE ``retriever``
  tree instead of separate query/knn sections; leaves produce ranked
  doc lists, compound nodes combine their children's rankings.
- ``StandardRetrieverBuilder.java`` — wraps an ordinary ``query`` (plus
  optional ``filter`` clauses ANDed in as non-scoring context).
- ``KnnRetrieverBuilder.java`` — ``field/query_vector/k/num_candidates``
  (+ ``filter``), the kNN leg.
- ``x-pack/plugin/rank-rrf/.../RRFRetrieverBuilder.java`` — compound:
  runs each child to ``rank_window_size`` and fuses with reciprocal
  rank fusion (``rank_constant``), the same rule as ``rank: {rrf: ...}``.

Execution here is a recursive driver-side walk: leaves dispatch to the
existing distributed paths (BM25 engine / persisted vector index), the
rrf node fuses tiny (doc_id, rank) frames — nothing new ships per batch.
Rankings use the repo's deterministic (round(score, 4) desc, doc_id)
tie discipline so composed results match their SQL twins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dsl import parse_dsl
from .hybrid import rrf_fuse
from .query import BoolQuery, KnnQuery


class RetrieverError(ValueError):
    pass


def execute_retriever(spec: dict, engine=None,
                      vector_index_dir: str | None = None,
                      default_field: str = "text", size: int = 10,
                      window: int = 50) -> pd.DataFrame:
    """Run a retriever tree → (rank, doc_id, score) frame, size rows.
    ``spec`` is the JSON body under ``"retriever"``."""
    ranking = _run_node(spec, engine, vector_index_dir, default_field,
                        max(size, window))
    df = ranking.head(size).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    return df[["rank", "doc_id", "score"]]


def _run_node(spec: dict, engine, vector_index_dir, default_field,
              window: int) -> pd.DataFrame:
    """→ (doc_id, score) frame, best-first, already tie-disciplined."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise RetrieverError(
            f"a retriever must have exactly one type key, got {spec!r}")
    kind, body = next(iter(spec.items()))
    if kind == "standard":
        if engine is None:
            raise RetrieverError("standard retriever needs an engine")
        q = parse_dsl(body["query"], default_field=default_field)
        filters = body.get("filter")
        if filters:
            if isinstance(filters, dict):
                filters = [filters]
            q = BoolQuery(must=(q,), filter=tuple(
                parse_dsl(f, default_field=default_field)
                for f in filters))
        # tie-group refetch (hybrid.py's round-3 discipline): if the last
        # fetched doc still ties the windowth round-4 score the tie group
        # may extend past the fetch boundary — a fixed +50 silently
        # diverges on wider tie groups (review r5 #3)
        margin = 50
        while True:
            res = engine.search(q, k=window + margin, fetch=("doc_id",))
            df = res.to_pandas()[["doc_id", "score"]]
            key = df["score"].round(4)
            exhausted = len(df) < window + margin
            open_tie = (len(df) > window
                        and key.iloc[-1] == key.iloc[window - 1])
            if exhausted or not open_tie:
                break
            margin *= 4
    elif kind == "knn":
        from elasticsearch_ray.index.vectors import knn_index_search

        if vector_index_dir is None:
            raise RetrieverError(
                "knn retriever needs a persisted vector index")
        q = KnnQuery(field=body["field"],
                     query_vector=tuple(body["query_vector"]),
                     k=int(body.get("k", window)),
                     num_candidates=int(body.get("num_candidates", 100)),
                     similarity=body.get("similarity"),
                     filter=tuple(tuple(f) for f in body.get("filter", ())))
        out = knn_index_search(vector_index_dir, q)
        id_col = next(c for c in out.columns if c != "_score")
        df = out.rename(columns={id_col: "doc_id", "_score": "score"})
        # the vector leg orders on the EXACT score with id tiebreak
        # (hybrid.py's vector-leg discipline) — cosine values are not
        # rounded, unlike the BM25 leg's round-4 tie rule
        return (df[["doc_id", "score"]]
                .sort_values(["score", "doc_id"],
                             ascending=[False, True])
                .head(window).reset_index(drop=True))
    elif kind == "linear":
        # x-pack LinearRetrieverBuilder (8.18): weighted sum of the
        # children's (optionally normalized) scores; a doc missing from
        # a child contributes 0 for that child.
        children = body.get("retrievers")
        if not children:
            raise RetrieverError("linear retriever needs retrievers")
        rws = int(body.get("rank_window_size", window))
        combined: dict = {}
        for c in children:
            child_spec = c.get("retriever")
            if child_spec is None:
                raise RetrieverError(
                    "linear child needs a nested 'retriever'")
            w = float(c.get("weight", 1.0))
            nrm = c.get("normalizer", "none")
            sub = _run_node(child_spec, engine, vector_index_dir,
                            default_field, rws).head(rws)
            # BM25-scored children normalize over the ROUND-4
            # disciplined scores (the repo-wide tie rule extends
            # through normalization — round-4 decimals are exact
            # doubles, so the minmax division is SQL-twin-exact);
            # knn children keep EXACT cosines, matching the vector
            # leg's never-round discipline (review r5f #7)
            is_vec = next(iter(child_spec)) == "knn"
            s = (sub["score"].to_numpy(dtype=float) if is_vec
                 else sub["score"].round(4).to_numpy(dtype=float))
            if nrm == "minmax":
                # MinMaxScoreNormalizer: over the child's own retrieved
                # window; a degenerate window (max == min) maps to 1.0
                if len(s):
                    lo, hi = float(s.min()), float(s.max())
                    s = (np.ones_like(s) if hi == lo
                         else (s - lo) / (hi - lo))
            elif nrm != "none":
                raise RetrieverError(
                    f"unknown normalizer [{nrm}] (none | minmax)")
            for d, v in zip(sub["doc_id"].tolist(), s):
                combined[d] = combined.get(d, 0.0) + w * float(v)
        df = pd.DataFrame({"doc_id": list(combined),
                           "score": list(combined.values())})
    elif kind == "text_similarity_reranker":
        # TextSimilarityRankRetrieverBuilder: rerank the child's top
        # rank_window_size by the registered rerank model's relevance
        # on (inference_text, doc field) — the same deterministic bow
        # pair scorer the ES|QL RERANK command uses; ``field`` must be
        # a STORED doc column (fetched via _mget, no source re-read).
        from elasticsearch_ray.search.sparse_vector import (
            expansion_model,
        )

        child_spec = body.get("retriever")
        if child_spec is None or engine is None:
            raise RetrieverError(
                "text_similarity_reranker needs a child retriever "
                "and an engine")
        rws = int(body.get("rank_window_size", window))
        sub = _run_node(child_spec, engine, vector_index_dir,
                        default_field, rws).head(rws)
        if "inference_text" not in body:
            raise RetrieverError(
                "text_similarity_reranker needs inference_text")
        model = expansion_model(body.get("inference_id", "bow"))
        qw = model(body["inference_text"])
        fld = body.get("field", default_field)
        # stored doc column when available, else the _source lineage
        # (row-group-pushdown fetch — how termvectors re-reads text)
        stored = tuple(engine.spec.get("doc_columns", ()))
        if fld in stored:
            docs = engine.mget(sub["doc_id"].tolist(),
                               columns=("doc_id", fld)).to_pandas()
        else:
            docs = engine.mget(sub["doc_id"].tolist(),
                               columns=("doc_id",),
                               source_columns=(fld,)).to_pandas()
        texts = dict(zip(docs["doc_id"], docs[fld]))

        def rel(doc_id):
            t = texts.get(doc_id)
            if not isinstance(t, str):
                return 0.0
            dw = model(t)
            return sum(w * dw.get(tok, 0.0) for tok, w in qw.items())

        df = pd.DataFrame({
            "doc_id": sub["doc_id"],
            "score": [rel(d) for d in sub["doc_id"]],
        })
    elif kind == "rrf":
        children = body.get("retrievers")
        if not children:
            raise RetrieverError("rrf retriever needs retrievers")
        rws = int(body.get("rank_window_size", window))
        rc = int(body.get("rank_constant", 60))
        rankings = []
        for child in children:
            sub = _run_node(child, engine, vector_index_dir,
                            default_field, rws)
            # children are already ordered by their own tie discipline
            # (BM25 round-4 / exact-cosine) — fusion takes ranks as-is
            rankings.append(sub["doc_id"].head(rws).tolist())
        fused = rrf_fuse(rankings, k=rws, rank_constant=rc)
        df = fused.rename(columns={"rrf": "score"})[["doc_id", "score"]]
        # rrf_fuse already ordered deterministically; skip the re-round
        return df.reset_index(drop=True)
    else:
        raise RetrieverError(f"unknown retriever type [{kind}]")
    df = df.copy()
    df["_key"] = df["score"].round(4)
    df = (df.sort_values(["_key", "doc_id"], ascending=[False, True])
          .drop(columns="_key").head(window).reset_index(drop=True))
    return df
