"""Char filters — pattern_replace and mapping as REAL pre-tokenizer analysis
components (previously only reachable as the `gsub` ingest processor).

Reference: ``modules/analysis-common/.../PatternReplaceCharFilterFactory.java``
(regex sub over the raw character stream) and ``MappingCharFilterFactory.java``
(Lucene MappingCharFilter: greedy LONGEST-match literal rewrites, "k=>v"
rules). html_strip (analysis/html_strip.py) is the third char filter of the
family and composes before these in IndexSpec order.

Serializable config: each filter is a ("kind", args...) tuple so it can ride
in IndexSpec.to_dict() / the parametric ``custom:{json}`` analyzer name that
actors resolve locally (see analyzers.get_analyzer).
"""

from __future__ import annotations

import re
from collections.abc import Callable


def make_char_filter(kind: str, args) -> Callable[[str], str]:
    """("pattern_replace", [pattern, replacement]) or
    ("mapping", [["k","v"], ...]) → a str→str callable, compiled once."""
    if kind == "pattern_replace":
        pattern, replacement = args
        rx = re.compile(pattern)
        return lambda s: rx.sub(replacement, s)
    if kind == "icu_normalizer":
        # analysis-icu IcuNormalizerCharFilterFactory: args is
        # [name] or [name, mode] (name: nfc|nfkc|nfkc_cf)
        from elasticsearch_ray.analysis.icu import icu_normalize

        name = args[0] if args else "nfkc_cf"
        mode = args[1] if len(args) > 1 else "compose"
        icu_normalize("", name, mode)  # fail fast on a bad name
        return lambda s: icu_normalize(s, name, mode)
    if kind == "mapping":
        pairs = [(k, v) for k, v in args]
        # Lucene MappingCharFilter is greedy longest-match: longer keys win
        # at the same position — a regex alternation ordered by length does
        # exactly that (Python re alternation is first-match-wins).
        pairs.sort(key=lambda kv: -len(kv[0]))
        rx = re.compile("|".join(re.escape(k) for k, _ in pairs))
        table = dict(pairs)
        return lambda s: rx.sub(lambda m: table[m.group(0)], s)
    raise ValueError(f"unknown char filter {kind!r}")


def compile_chain(filters) -> Callable[[str], str]:
    """Compose char filters in declaration order (the reference applies the
    analyzer's char_filter list front to back)."""
    fns = [make_char_filter(k, a) for k, a in filters]
    if len(fns) == 1:
        return fns[0]

    def chain(s: str) -> str:
        for f in fns:
            s = f(s)
        return s

    return chain
