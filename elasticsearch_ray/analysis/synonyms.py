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


class IndexTimeSynonyms:
    """Index-time ``synonym`` token filter (SynonymTokenFilterFactory /
    Lucene SynonymFilter in flatten mode — CommonAnalysisPlugin.java:226-335).

    Wraps a base analyzer; applied once per actor in TokenizeShard. Semantics
    (documented subset of Lucene flatten):
      - equivalence group "a, b": every occurrence of one variant injects the
        others at the SAME position (posInc=0) — phrases through the span
        keep working for every variant.
      - directed "x => y" / contraction "new york => ny": the source span is
        consumed and each right-hand variant is emitted at the span's start
        position.
      - a multi-token variant flattens: its tokens occupy consecutive
        positions from the match start (Lucene's 'sausage' flattening —
        the reason the reference recommends synonym_graph at query time).
      - norms: injected tokens count toward doclen (the discountOverlaps=
        false analog; score parity with the reference's default would need
        posInc plumbing the flat (terms, positions) interface doesn't carry).
    """

    name = "index_synonyms"

    def __init__(self, base, rules: list[str], analyzer: str = "standard"):
        self.base = base
        self.sources: dict[tuple, tuple[str, list[tuple]]] = {}
        for r in parse_synonym_rules(list(rules), analyzer):
            if r["match_only"] is not None:
                for src in r["match_only"]:
                    if src:
                        self.sources[src] = ("replace", list(r["variants"]))
            else:
                for src in r["variants"]:
                    if src:
                        others = [v for v in r["variants"] if v != src]
                        if others:
                            self.sources[src] = ("expand", others)
        self.max_len = max((len(s) for s in self.sources), default=1)

    def __call__(self, text: str):
        terms, pos = self.base(text)
        if not terms or not self.sources:
            return terms, pos
        srcs = self.sources
        out_t: list[str] = []
        out_p: list[int] = []
        n = len(terms)
        i = 0
        while i < n:
            hit = None
            for L in range(min(self.max_len, n - i), 0, -1):
                span = tuple(terms[i : i + L])
                ent = srcs.get(span)
                if ent is not None:
                    hit = (L, ent)
                    break
            if hit is None:
                out_t.append(terms[i])
                out_p.append(pos[i])
                i += 1
                continue
            L, (kind, variants) = hit
            p0 = pos[i]
            if kind == "expand":  # originals stay, variants stack on top
                out_t.extend(terms[i : i + L])
                out_p.extend(pos[i : i + L])
            for v in variants:
                for j, tok in enumerate(v):
                    out_t.append(tok)
                    out_p.append(p0 + j)
            i += L
        return out_t, out_p
