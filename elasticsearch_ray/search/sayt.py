"""search_as_you_type field type (reference: `modules/mapper-extras/.../
SearchAsYouTypeFieldMapper.java`): a root text field plus shingle
subfields ``<field>._2gram`` / ``<field>._3gram``, queried with
``multi_match type=bool_prefix`` across all of them.

Composition, not new machinery: the subfields are ordinary extra indexed
fields (the multi-field namespacing of IndexSpec.fields) whose analyzers
are parametric custom chains (standard tokenizer → lowercase → shingle),
so index-time shingling, per-field norms/avgdl, query-time analysis and
BM25 all come from the existing paths. The reference's third artifact —
the ``._index_prefix`` edge-ngram subfield — exists in Lucene to make
prefix matching cheap inside the FST; here the sorted term dictionary
already answers any prefix with one searchsorted range cut
(engine._prefix_cut), so materializing edge-ngrams would only duplicate
the dictionary; the bool_prefix query's last-term prefix clause uses the
dict directly."""

from __future__ import annotations

from elasticsearch_ray.search.query import (
    BoolQuery,
    MatchQuery,
    PrefixQuery,
)


def _gram_analyzer(n: int) -> str:
    return ('custom:{"tokenizer": "standard", "filters": ["lowercase", '
            f'["shingle", {{"min_size": {n}, "max_size": {n}}}]]}}')


def sayt_spec(field: str, source: str, max_shingle_size: int = 3) -> tuple[dict, dict]:
    """(fields, field_analyzers) fragments for an IndexSpec — one shingle
    subfield per size 2..max_shingle_size (the mapper's default
    max_shingle_size=3 gives ._2gram and ._3gram)."""
    if not 2 <= max_shingle_size <= 4:
        raise ValueError("max_shingle_size must be in [2, 4] "
                         "(SearchAsYouTypeFieldMapper bounds)")
    fields = {}
    analyzers = {}
    for n in range(2, max_shingle_size + 1):
        sub = f"{field}._{n}gram"
        fields[sub] = source
        analyzers[sub] = _gram_analyzer(n)
    return fields, analyzers


def sayt_query(field: str, text: str,
               max_shingle_size: int = 3) -> BoolQuery:
    """``multi_match type=bool_prefix`` over the sayt fields
    (MultiMatchQueryBuilder.Type.BOOL_PREFIX + SearchAsYouTypeFieldMapper):
    the root field matches every fully-typed term plus the LAST term as a
    prefix; each shingle subfield contributes an analyzed match (its own
    chain shingles the query text). Scores sum across fields (boolean
    should), which is the bool_prefix combination rule.

    The root clauses (terms + last-term prefix) target the engine's
    DEFAULT text field — the sayt composition this module builds indexes
    the root as the default field (``IndexSpec.text_column``), and
    PrefixQuery rewrites against the default field's term dictionary
    only. ``field`` names the sayt MAPPING (the subfield prefix), not a
    different root."""
    if not field:
        # '._2gram' (leading dot) would query subfields that can never
        # exist — fail loudly instead of returning 0 hits (ADVICE r4)
        raise ValueError("sayt_query requires the sayt mapping's field "
                         "name (the shingle-subfield prefix)")
    toks = text.lower().split()
    should: list = []
    for t in toks[:-1]:
        should.append(MatchQuery(t))
    if toks:
        # last term may be mid-type → prefix over the term dict
        should.append(PrefixQuery(toks[-1]))
    base = field
    for n in range(2, max_shingle_size + 1):
        if len(toks) >= n:
            should.append(MatchQuery(text, field=f"{base}._{n}gram"))
    return BoolQuery(should=tuple(should))
