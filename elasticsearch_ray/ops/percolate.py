"""Percolate — reverse search (the stored-queries module).

Reference: ``modules/percolator/.../PercolateQueryBuilder.java:89`` — an index
stores QUERIES; a document is "searched" against them and the response lists
which stored queries match. Ray-Data-shaped: the (small) query bank is parsed
once (JSON DSL or Query objects), broadcast via ``ray.put``, and a stateless
``map_batches`` stage evaluates every bank query against each document of the
stream — per-doc state is one tokenization (term set + positions), per-query
evaluation is set/position predicates over it. At 100 TB this is the shape of
an alerting/filter bank: the bank is the broadcast small side, documents
stream, no shuffle.

Supported query subset (documented; the percolator's candidate-extraction
optimization — indexing the bank's terms to prune non-candidate queries — is
replaced by the term-set prefilter inside ``_match``): term, terms, match
(or/and/msm), match_phrase (slop), prefix, wildcard, regexp, exists-on-column,
bool (must/should/filter/must_not/msm), constant_score, dis_max, match_all /
match_none, span_near (ordered/unordered), and Term/Range filters over the
document's non-text columns.
"""

from __future__ import annotations

import fnmatch
import functools
import re

import pyarrow as pa

from ray.data import Dataset

from elasticsearch_ray.analysis.analyzers import get_analyzer
from elasticsearch_ray.search.query import (
    BoolQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MatchPhraseQuery,
    MatchQuery,
    PrefixQuery,
    Query,
    RangeFilter,
    RegexpQuery,
    SpanNearQuery,
    TermFilter,
    TermQuery,
    TermsQuery,
    WildcardQuery,
)
from elasticsearch_ray.search.engine import _min_should_match


class _Doc:
    """One document's analyzed view: term set + per-term sorted positions."""

    __slots__ = ("terms", "positions", "row")

    def __init__(self, terms: list[str], row: dict):
        self.terms = set(terms)
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            pos.setdefault(t, []).append(i)
        self.positions = pos
        self.row = row


def _phrase_match(doc: _Doc, terms: list[str], slop: int) -> bool:
    if not terms or any(t not in doc.positions for t in terms):
        return False
    if len(terms) == 1:
        return True
    if slop == 0:
        base = doc.positions[terms[0]]
        rest = [set(doc.positions[t]) for t in terms[1:]]
        return any(all(p + i + 1 in rest[i] for i in range(len(rest))) for p in base)
    # window interpretation (MatchPhraseQuery slop>0): minimal window over
    # shifted positions must fit within slop extra gaps
    streams = []
    for ti, t in enumerate(terms):
        streams.extend((p - ti, ti) for p in doc.positions[t])
    streams.sort()
    nt = len(terms)
    # sliding window over the merged stream: any window covering all clause
    # ids whose width <= slop matches
    from collections import Counter

    need = Counter()
    lo = 0
    for hi in range(len(streams)):
        need[streams[hi][1]] += 1
        while len(need) == nt:
            if streams[hi][0] - streams[lo][0] <= slop:
                return True
            need[streams[lo][1]] -= 1
            if need[streams[lo][1]] == 0:
                del need[streams[lo][1]]
            lo += 1
    return False


def _span_near_match(doc: _Doc, clauses: tuple, slop: int, in_order: bool) -> bool:
    if any(t not in doc.positions for t in clauses):
        return False
    if in_order:
        # chain each first-clause occurrence through the earliest
        # strictly-later occurrence of each next clause
        for p0 in doc.positions[clauses[0]]:
            end = p0
            ok = True
            for t in clauses[1:]:
                nxt = [p for p in doc.positions[t] if p > end]
                if not nxt:
                    ok = False
                    break
                end = nxt[0]
            if ok and end - p0 - (len(clauses) - 1) <= slop:
                return True
        return False
    streams = sorted((p, ti) for ti, t in enumerate(clauses) for p in doc.positions[t])
    from collections import Counter

    nt = len(clauses)
    need = Counter()
    lo = 0
    for hi in range(len(streams)):
        need[streams[hi][1]] += 1
        while len(need) == nt:
            if streams[hi][0] - streams[lo][0] - (nt - 1) <= slop:
                return True
            need[streams[lo][1]] -= 1
            if need[streams[lo][1]] == 0:
                del need[streams[lo][1]]
            lo += 1
    return False


@functools.lru_cache(maxsize=4096)
def _analyze_cached(analyzer_name: str, text: str) -> tuple:
    """Bank query strings are constant across the whole stream — analyze
    each (analyzer, text) pair once per worker, not once per document."""
    return tuple(get_analyzer(analyzer_name)(text)[0])


@functools.lru_cache(maxsize=1024)
def _wildcard_re(pattern: str):
    return re.compile(fnmatch.translate(pattern))


@functools.lru_cache(maxsize=1024)
def _regexp_re(pattern: str):
    return re.compile(pattern)


def _match(q: Query, doc: _Doc, analyzer_name: str) -> bool:
    if isinstance(q, TermQuery):
        if q.field is not None:
            raise TypeError("percolate: field-scoped term queries are not "
                            "supported (single analyzed text column)")
        return q.term in doc.terms
    if isinstance(q, TermsQuery):
        return any(t in doc.terms for t in q.terms)
    if isinstance(q, MatchQuery):
        if q.field is not None:
            raise TypeError("percolate: field-scoped match queries are not supported")
        terms = _analyze_cached(q.analyzer or analyzer_name, q.text)
        if not terms:
            return q.zero_terms_query == "all"
        hits = sum(1 for t in terms if t in doc.terms)
        if q.operator == "and":
            return hits == len(terms)
        return hits >= _min_should_match(q.minimum_should_match, len(terms))
    if isinstance(q, MatchPhraseQuery):
        if q.field is not None:
            raise TypeError("percolate: field-scoped phrase queries are not supported")
        terms = list(_analyze_cached(q.analyzer or analyzer_name, q.text))
        return _phrase_match(doc, terms, q.slop)
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in doc.terms)
    if isinstance(q, WildcardQuery):
        rx = _wildcard_re(q.pattern)
        return any(rx.match(t) for t in doc.terms)
    if isinstance(q, RegexpQuery):
        rx = _regexp_re(q.pattern)
        return any(rx.fullmatch(t) for t in doc.terms)
    if isinstance(q, SpanNearQuery):
        return _span_near_match(doc, q.clauses, q.slop, q.in_order)
    if isinstance(q, TermFilter):
        return doc.row.get(q.column) == q.value
    if isinstance(q, RangeFilter):
        v = doc.row.get(q.column)
        if v is None:
            return False
        return ((q.gte is None or v >= q.gte) and (q.lte is None or v <= q.lte)
                and (q.gt is None or v > q.gt) and (q.lt is None or v < q.lt))
    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, MatchNoneQuery):
        return False
    if isinstance(q, ConstantScoreQuery):
        return q.filter is None or _match(q.filter, doc, analyzer_name)
    if isinstance(q, DisMaxQuery):
        return any(_match(s, doc, analyzer_name) for s in q.queries)
    if isinstance(q, BoolQuery):
        if any(not _match(s, doc, analyzer_name) for s in (*q.must, *q.filter)):
            return False
        if any(_match(s, doc, analyzer_name) for s in q.must_not):
            return False
        if q.should:
            msm = q.minimum_should_match
            if msm is None:
                msm = 0 if (q.must or q.filter) else 1
            else:
                msm = _min_should_match(msm, len(q.should))
            if sum(1 for s in q.should if _match(s, doc, analyzer_name)) < msm:
                return False
        return True  # all obligations met (an all-must_not bool matches the rest)
    raise TypeError(f"percolate: unsupported query {type(q).__name__}")


class PercolateBatch:
    """map_batches stage: documents → (id, query_name) match pairs.

    The bank ships ONCE per actor/worker via the constructor (pass a
    ``ray.put`` ref of ``[(name, Query | dsl-dict), ...]`` for the broadcast
    pattern); each batch tokenizes its docs once and evaluates every bank
    query against the per-doc term/position view."""

    def __init__(self, bank, text_col: str = "text", id_col: str = "doc_id",
                 analyzer: str = "standard", doc_columns: tuple = ()):
        import ray

        if isinstance(bank, ray.ObjectRef):
            bank = ray.get(bank)
        from elasticsearch_ray.search.dsl import parse_dsl

        self.bank = [(name, q if isinstance(q, Query) else parse_dsl(q))
                     for name, q in bank]
        self.text_col, self.id_col = text_col, id_col
        self.analyzer_name = analyzer
        # validate the bank upfront: an unsupported/field-scoped query should
        # fail at stage construction, not mid-stream on the first batch
        probe = _Doc([], {})
        for _name, q in self.bank:
            _match(q, probe, analyzer)
        self.an = get_analyzer(analyzer)
        self.doc_columns = tuple(doc_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        extra = {c: batch[c].to_pylist() for c in self.doc_columns
                 if c in batch.column_names}
        out_id, out_name = [], []
        for i, text in enumerate(texts):
            doc = _Doc(self.an(text or "")[0], {c: v[i] for c, v in extra.items()})
            for name, q in self.bank:
                if _match(q, doc, self.analyzer_name):
                    out_id.append(ids[i])
                    out_name.append(name)
        # type the id column from the input schema: an all-empty batch would
        # otherwise infer null and fight int64 blocks at schema unification
        return pa.table({self.id_col: pa.array(out_id, type=batch[self.id_col].type),
                         "query_name": pa.array(out_name, pa.string())})


# worker-process stage cache (the build.py _STAGE_CACHE pattern): stateless
# TASKS instead of a fixed actor pool — no up-front CPU reservation, no
# actor-restart-with-object-store-args hazard; the parsed/validated bank is
# still constructed once per worker process.
_PERC_CACHE: dict = {}


def _percolate_fn(batch: pa.Table, bank_ref, text_col, id_col, analyzer,
                  doc_columns) -> pa.Table:
    key = (bank_ref.hex(), text_col, id_col, analyzer, doc_columns)
    st = _PERC_CACHE.get(key)
    if st is None:
        if len(_PERC_CACHE) > 16:
            _PERC_CACHE.clear()
        st = _PERC_CACHE[key] = PercolateBatch(bank_ref, text_col, id_col,
                                               analyzer, doc_columns)
    return st(batch)


def percolate(ds: Dataset, bank: list, text_col: str = "text",
              id_col: str = "doc_id", analyzer: str = "standard",
              doc_columns: tuple = ()) -> Dataset:
    """Percolate a document stream against a stored-query bank; returns a
    Dataset of (id, query_name) pairs. The bank is broadcast once via
    ``ray.put`` and read once per worker process."""
    import ray

    # fail fast on an invalid bank (driver-side), then broadcast
    PercolateBatch(list(bank), text_col, id_col, analyzer, tuple(doc_columns))
    bank_ref = ray.put(list(bank))
    return ds.map_batches(
        _percolate_fn,
        fn_args=(bank_ref, text_col, id_col, analyzer, tuple(doc_columns)),
        batch_format="pyarrow",
    )
