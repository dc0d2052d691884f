"""Search profiler + _cat APIs.

Profiler (``server/.../search/profile/ProfileResult.java``,
``query/QueryProfiler.java``, SearchSourceBuilder ``profile: true``):
``profile_search`` runs the engine's normal local top-k path with
per-phase wall timing — rewrite, weight creation (the stats/scorer
phase), can_match pruning, per-partition scoring (one entry per shard,
like the reference's per-shard ProfileShardResult), merge, fetch — and
returns the SAME hits a plain search returns plus the profile tree.

_cat (``rest/action/cat/RestIndicesAction.java``,
``RestSegmentsAction.java``, ``RestCountAction.java``): fixed-column
pandas frames over existing metadata — nothing is opened or scanned
beyond manifests and file sizes, matching the reference's cheap cat
endpoints.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from elasticsearch_ray.search.query import (MatchPhraseQuery, MatchQuery,
                                            SpanNearQuery, TermQuery,
                                            TermsQuery, query_terms)


def profile_search(eng, q, k: int = 10, mode: str = "bmw",
                   fetch: tuple = ("doc_id",)) -> dict:
    """Profile a top-k search. Returns ``{"hits", "took_ms",
    "profile"}`` where profile mirrors the reference's shape: a
    ``shards`` list with per-partition query timings plus coordinator
    ``phases``."""
    if isinstance(q, str):
        q = MatchQuery(q)
    t_start = time.perf_counter_ns()

    t0 = time.perf_counter_ns()
    q2 = eng._apply_field_analyzers(eng._rewrite(q))
    rewrite_ns = time.perf_counter_ns() - t0

    t0 = time.perf_counter_ns()
    scorers, _ = eng._scorers_cached(q2)
    create_weight_ns = time.perf_counter_ns() - t0

    t0 = time.perf_counter_ns()
    if isinstance(q2, (TermQuery, TermsQuery, MatchQuery,
                       MatchPhraseQuery, SpanNearQuery)):
        cand = eng.can_match_parts(query_terms(q2, eng.analyzer_name))
    else:
        cand = list(eng.parts)
    can_match_ns = time.perf_counter_ns() - t0

    shards = []
    parts_l, docs_l, scores_l = [], [], []
    for p in cand:
        t0 = time.perf_counter_ns()
        d, s = eng._searcher(p).topk(q2, scorers, k, mode, None, p)
        score_ns = time.perf_counter_ns() - t0
        shards.append({
            "id": f"[part={p}]",
            "searches": [{"query": [{
                "type": type(q2).__name__,
                "description": repr(q2),
                "time_in_nanos": score_ns,
                "breakdown": {"score": score_ns,
                              "collected_hits": int(len(d))},
            }]}],
        })
        parts_l.append(np.full(len(d), p, dtype=np.int64))
        docs_l.append(np.asarray(d, np.int64))
        scores_l.append(np.asarray(s, np.float64))

    t0 = time.perf_counter_ns()
    if docs_l and sum(map(len, docs_l)):
        parts_a = np.concatenate(parts_l)
        docs_a = np.concatenate(docs_l)
        scores_a = np.concatenate(scores_l)
        order = np.lexsort((docs_a, parts_a, -scores_a))[:k]
        parts_a, docs_a = parts_a[order], docs_a[order]
        tbl = pa.table({"rank": pa.array(np.arange(1, len(order) + 1)),
                        "score": pa.array(scores_a[order]),
                        "part": pa.array(parts_a),
                        "local": pa.array(docs_a)})
    else:
        parts_a = docs_a = np.empty(0, np.int64)
        tbl = pa.table({"rank": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                        "part": pa.array([], pa.int64()),
                        "local": pa.array([], pa.int64())})
    merge_ns = time.perf_counter_ns() - t0

    t0 = time.perf_counter_ns()
    if len(tbl):
        tbl = eng._attach_fetch(tbl, parts_a, docs_a, fetch)
    fetch_ns = time.perf_counter_ns() - t0

    took = time.perf_counter_ns() - t_start
    return {
        "hits": tbl,
        "took_ms": took / 1e6,
        "profile": {
            "phases": {"rewrite": rewrite_ns,
                       "create_weight": create_weight_ns,
                       "can_match": can_match_ns,
                       "merge": merge_ns, "fetch": fetch_ns},
            "shards": shards,
        },
    }


# ------------------------------------------------------------------ _cat

def cat_indices(indices: dict[str, object]) -> pd.DataFrame:
    """RestIndicesAction analog: one row per index. ``indices`` maps
    index names to QueryEngine instances."""
    rows = []
    for name, eng in sorted(indices.items()):
        du = eng.disk_usage()
        rows.append({"index": name, "pri": len(eng.parts),
                     "docs.count": int(eng.n_docs),
                     "store.size_bytes": int(du["total_in_bytes"])})
    return pd.DataFrame(rows, columns=["index", "pri", "docs.count",
                                       "store.size_bytes"])


def cat_segments(eng) -> pd.DataFrame:
    """RestSegmentsAction analog: one row per partition segment."""
    rows = []
    for seg in eng.segments():
        rows.append({"segment": f"part={seg['partition']:05d}",
                     "docs.count": seg["n_docs"],
                     "size_bytes": seg["size_in_bytes"],
                     "version": seg["format"]})
    return pd.DataFrame(rows, columns=["segment", "docs.count",
                                       "size_bytes", "version"])


def cat_count(eng) -> pd.DataFrame:
    """RestCountAction analog."""
    return pd.DataFrame([{"count": int(eng.n_docs)}])
