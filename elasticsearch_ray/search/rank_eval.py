"""Relevance-ranking evaluation metrics — the reference's ``modules/rank-eval``
(PrecisionAtK.java, RecallAtK.java, MeanReciprocalRank.java,
DiscountedCumulativeGain.java, ExpectedReciprocalRank.java), re-derived from
the published definitions.

All functions take ``ranked``: the doc ids in rank order (best first) and
``relevant``: either a set of relevant ids (binary metrics) or a dict
id → graded relevance (DCG/ERR).
"""

from __future__ import annotations

import math


def precision_at_k(ranked, relevant: set, k: int) -> float:
    top = list(ranked)[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(ranked, relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    top = list(ranked)[:k]
    return sum(1 for d in top if d in relevant) / len(relevant)


def mean_reciprocal_rank(ranked, relevant: set, k: int | None = None) -> float:
    top = list(ranked)  # materialize ONCE (ranked may be a generator)
    if k is not None:
        top = top[:k]
    for i, d in enumerate(top, start=1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def dcg_at_k(ranked, grades: dict, k: int, normalize: bool = False) -> float:
    """DCG with the (2^rel - 1)/log2(rank+1) gain the reference uses; pass
    normalize=True for NDCG."""
    top = list(ranked)[:k]
    dcg = sum(
        (2 ** grades.get(d, 0) - 1) / math.log2(i + 1) for i, d in enumerate(top, start=1)
    )
    if not normalize:
        return dcg
    ideal = sorted(grades.values(), reverse=True)[:k]
    idcg = sum((2**g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, start=1))
    return dcg / idcg if idcg else 0.0


def err_at_k(ranked, grades: dict, k: int, max_grade: int | None = None) -> float:
    """Expected Reciprocal Rank (Chapelle et al. 2009), the reference's
    ExpectedReciprocalRank: R_i = (2^g - 1)/2^g_max; ERR = Σ 1/i · R_i · Π(1-R_j)."""
    top = list(ranked)[:k]
    gmax = max_grade if max_grade is not None else (max(grades.values()) if grades else 1)
    p = 1.0
    err = 0.0
    for i, d in enumerate(top, start=1):
        r = (2 ** grades.get(d, 0) - 1) / (2**gmax)
        err += p * r / i
        p *= 1 - r
    return err


def rank_eval(requests: list[dict], metric: str = "precision", k: int = 10) -> dict:
    """Batch evaluation like the _rank_eval endpoint: requests =
    [{"ranked": [...], "relevant": set|dict}] → {"metric_score", "details"}."""
    fns = {
        "precision": lambda r: precision_at_k(r["ranked"], r["relevant"], k),
        "recall": lambda r: recall_at_k(r["ranked"], r["relevant"], k),
        "mrr": lambda r: mean_reciprocal_rank(r["ranked"], r["relevant"], k),
        "dcg": lambda r: dcg_at_k(r["ranked"], r["relevant"], k),
        "ndcg": lambda r: dcg_at_k(r["ranked"], r["relevant"], k, normalize=True),
        "err": lambda r: err_at_k(r["ranked"], r["relevant"], k),
    }
    fn = fns[metric]
    details = [fn(r) for r in requests]
    return {"metric_score": sum(details) / len(details) if details else 0.0, "details": details}
