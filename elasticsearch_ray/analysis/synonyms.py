"""Query-time synonym graph expansion — the ``synonym_graph`` token filter
surface (CommonAnalysisPlugin.java:226-335; SynonymGraphFilterFactory is
documented for QUERY-TIME use precisely because multi-token synonyms need a
graph, which our inverted index — like Lucene's — cannot store flat).

Rules use the Solr-synonyms syntax subset:
  "ny, new york"            equivalence group (all variants expand each other)
  "sata => serial ata"      directed mapping (lhs replaced by rhs variants)

Expansion produces the same query shape Lucene builds from a token graph:
each matched span becomes a dis_max over its variants — single-token
variants as term queries, multi-token variants as exact phrases."""

from __future__ import annotations

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.search.query import (
    BoolQuery,
    DisMaxQuery,
    MatchPhraseQuery,
    Query,
    TermQuery,
)


def parse_synonym_rules(rules: list[str], analyzer: str = "standard") -> list[dict]:
    """Parse Solr-style rules → [{'variants': [token-tuple,...],
    'match_only': [token-tuple,...] or None}] (match_only = directed lhs)."""
    an = get_analyzer(analyzer)
    out = []
    for rule in rules:
        if "=>" in rule:
            lhs, rhs = rule.split("=>", 1)
            lhs_v = [tuple(an(p)[0]) for p in lhs.split(",") if p.strip()]
            rhs_v = [tuple(an(p)[0]) for p in rhs.split(",") if p.strip()]
            out.append({"variants": rhs_v, "match_only": lhs_v})
        else:
            var = [tuple(an(p)[0]) for p in rule.split(",") if p.strip()]
            out.append({"variants": var, "match_only": None})
    return out


def _variant_query(v: tuple, field: str | None) -> Query:
    if len(v) == 1:
        return TermQuery(v[0], field=field)
    return MatchPhraseQuery(" ".join(v), field=field)


def synonym_graph_expand(text: str, rules: list[str], analyzer: str = "standard",
                         field: str | None = None) -> Query:
    """Analyze the query text and expand synonym spans: longest-match spans
    become dis_max over all the group's variants; unmatched tokens stay
    term queries; segments combine as MUST clauses (match AND-of-graph-paths
    semantics over each consumed span)."""
    parsed = parse_synonym_rules(rules, analyzer)
    an = get_analyzer(analyzer)
    toks = an(text)[0]
    clauses: list[Query] = []
    i = 0
    while i < len(toks):
        best = None  # (span_len, expand_variants)
        for r in parsed:
            sources = r["match_only"] if r["match_only"] is not None else r["variants"]
            for src in sources:
                L = len(src)
                if L and tuple(toks[i : i + L]) == src:
                    expands = list(r["variants"])
                    if r["match_only"] is None and src not in expands:
                        expands.append(src)
                    if best is None or L > best[0]:
                        best = (L, expands, src)
        if best is not None:
            L, expands, src = best
            branches = [_variant_query(v, field) for v in dict.fromkeys(expands)]
            if len(branches) == 1:
                clauses.append(branches[0])
            else:
                clauses.append(DisMaxQuery(queries=tuple(branches)))
            i += L
        else:
            clauses.append(TermQuery(toks[i], field=field))
            i += 1
    if not clauses:
        from elasticsearch_ray.search.query import MatchQuery

        return MatchQuery("")
    if len(clauses) == 1:
        return clauses[0]
    return BoolQuery(must=tuple(clauses))
