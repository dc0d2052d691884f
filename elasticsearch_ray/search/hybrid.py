"""Hybrid lexical + vector retrieval via Reciprocal Rank Fusion — the
reference's `rank: {rrf: ...}` search option (RRFRankBuilder, 8.x): run a
BM25 query and a kNN query independently, then fuse by

    rrf(doc) = Σ_rankers 1 / (rank_constant + rank_in_ranker)

over each ranker's top ``window`` (docs absent from a ranker contribute 0
for it). RRF is the published fusion rule of Cormack, Clarke & Büttcher
(SIGIR 2009), which is also what the reference cites.

Distribution shape: both legs are already distributed (BM25 over warm
partition searchers, cosine via broadcast-query map_batches); fusion
itself touches only 2×window (doc_id, rank) pairs on the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_ray.search.query import MatchQuery


def rrf_fuse(rankings: list, k: int = 10, rank_constant: int = 60) -> pd.DataFrame:
    """Fuse ranked id lists (each: ids best-first). Returns (rank, doc_id,
    rrf), rrf-descending with doc_id tiebreak; ties compared on round(rrf,9)
    so both fp-noise and the SQL oracle agree."""
    scores: dict = {}
    for ranking in rankings:
        for r, doc in enumerate(ranking, start=1):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (rank_constant + r)
    df = pd.DataFrame({"doc_id": list(scores), "rrf": list(scores.values())})
    df["_key"] = df["rrf"].round(9)
    df = (df.sort_values(["_key", "doc_id"], ascending=[False, True])
          .head(k).drop(columns="_key").reset_index(drop=True))
    df.insert(0, "rank", np.arange(1, len(df) + 1))
    return df


def hybrid_rrf(engine, embeddings_ds, query_text: str, query_vector,
               k: int = 10, window: int = 50, rank_constant: int = 60,
               id_col: str = "vec_id",
               vector_index_dir: str | None = None) -> pd.DataFrame:
    """BM25 + brute-cosine kNN fused with RRF. The lexical leg ranks on
    (round(score, 4) desc, doc_id) — the repo's deterministic tie rule —
    and the vector leg on (cosine desc, id), both over their top
    ``window``."""
    from elasticsearch_ray.ops.ann import brute_topk

    # overfetch margin (starting at 50 = the repo's established tie
    # convention, __ray_entry__._search_table): every doc tied at round(4)
    # with the windowth score must be present before the rounded re-rank,
    # or the engine leg diverges from a full-corpus oracle on tie groups.
    # If the LAST fetched doc still ties the windowth score the tie group
    # may extend past the fetch boundary — refetch with a wider margin
    # (round-3 advice: a fixed +50 silently diverged on wider tie groups).
    margin = 50
    while True:
        lex_raw = engine.search(MatchQuery(query_text), k=window + margin,
                                fetch=("doc_id",))
        lex = lex_raw.to_pandas()[["doc_id", "score"]]
        lex["score"] = lex["score"].round(4)
        lex = lex.sort_values(["score", "doc_id"], ascending=[False, True])
        exhausted = len(lex) < window + margin  # corpus has no more hits
        open_tie = (len(lex) > window
                    and lex["score"].iloc[-1] == lex["score"].iloc[window - 1])
        if exhausted or not open_tie:
            break
        margin *= 4
    lex = lex.head(window)
    if vector_index_dir is not None:
        # serve the vector leg from the PERSISTED index's exhaustive route
        # (bit-compatible with brute_topk: same float64 store, same
        # rounding/ordering conventions) — no vector-table streaming
        from elasticsearch_ray.index.vectors import VectorIndexReader

        reader = VectorIndexReader(vector_index_dir)
        if reader.meta["id_col"] != id_col:
            # a mismatched id space would fuse neighbor ids that never
            # collide with the lexical doc ids — plausible, silently wrong
            raise ValueError(
                f"vector index id column {reader.meta['id_col']!r} does "
                f"not match id_col {id_col!r}")
        vec = reader.topk([0], np.asarray([query_vector], np.float64),
                          k=window, brute=True)
    else:
        vec = brute_topk(embeddings_ds, [0],
                         np.asarray([query_vector], np.float64),
                         id_col=id_col, k=window)
    return rrf_fuse([lex["doc_id"].tolist(),
                     vec["neighbor_id"].tolist()],
                    k=k, rank_constant=rank_constant)
