"""sparse_vector / text_expansion support: expansion-model registry and
token pruning.

Reference semantics (all public):

- ``x-pack/plugin/core/.../ml/search/WeightedTokensQueryBuilder.java`` /
  ``SparseVectorQueryBuilder.java`` — a sparse_vector query carries
  either explicit token weights or (inference_id, query text) resolved
  through the inference service at coordinator rewrite time;
- ``TokenPruningConfig.java`` — pruning drops tokens that are BOTH
  over-frequent (token freq > ratio_threshold × the field's average
  token freq) and under-weighted (weight < weight_threshold);
  ``only_score_pruned_tokens`` keeps ONLY the pruned set (used by the
  two-phase rescore pattern).

The expansion-model registry is the pluggable stand-in for the
reference's ML inference service (ELSER weights are a learned model —
out of scope here); the built-in ``bow`` model is a DETERMINISTIC
bag-of-words expansion (weight = 1 + ln(tf)) so the full query surface
is exercisable and testable without shipping a neural model.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Callable

_EXPANSION_MODELS: dict[str, Callable[[str], dict[str, float]]] = {}


def register_expansion_model(model_id: str,
                             fn: Callable[[str], dict[str, float]]) -> None:
    _EXPANSION_MODELS[model_id] = fn


def expansion_model(model_id: str) -> Callable[[str], dict[str, float]]:
    try:
        return _EXPANSION_MODELS[model_id]
    except KeyError:
        raise ValueError(
            f"unknown inference_id [{model_id}]; register an expansion "
            f"model first (the reference resolves this against the ML "
            f"inference service)") from None


def _bow(text: str) -> dict[str, float]:
    tf = Counter((text or "").lower().split())
    return {t: 1.0 + math.log(c) for t, c in tf.items()}


register_expansion_model("bow", _bow)


def prune_tokens(tokens: list[tuple[str, float]], field_avg_freq: float,
                 token_freqs: dict[str, int],
                 ratio_threshold: float = 5.0,
                 weight_threshold: float = 0.4,
                 only_score_pruned: bool = False) -> list[tuple[str, float]]:
    """TokenPruningConfig#shouldKeepToken: keep unless over-frequent AND
    under-weighted. Tokens absent from the index have freq 0 (never
    over-frequent). only_score_pruned inverts the selection."""
    kept, pruned = [], []
    for tok, w in tokens:
        freq = token_freqs.get(tok, 0)
        over = field_avg_freq > 0 and \
            freq > ratio_threshold * field_avg_freq
        under = abs(w) < weight_threshold
        (pruned if (over and under) else kept).append((tok, w))
    return pruned if only_score_pruned else kept


# --------------------------------------------------------------------
# completion-model registry — the stand-in for the inference service's
# text-generation endpoints (the ES|QL COMPLETION command resolves its
# inference_id here, exactly as sparse_vector resolves expansions).
# Generative LLMs are out of scope; the built-in "extractive" model is
# a DETERMINISTIC extractive stand-in (the prompt's first 12 words) so
# the command surface is exercisable, testable and SQL-twinnable.

_COMPLETION_MODELS: dict[str, Callable[[str], str]] = {}


def register_completion_model(model_id: str,
                              fn: Callable[[str], str]) -> None:
    _COMPLETION_MODELS[model_id] = fn


def completion_model(model_id: str) -> Callable[[str], str]:
    try:
        return _COMPLETION_MODELS[model_id]
    except KeyError:
        raise ValueError(
            f"unknown inference_id [{model_id}]; register a completion "
            f"model first (the reference resolves this against the "
            f"inference service)") from None


def _extractive(prompt: str) -> str:
    return " ".join((prompt or "").split(" ")[:12])


register_completion_model("extractive", _extractive)
