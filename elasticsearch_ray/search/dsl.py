"""JSON query-DSL parser — the reference's user-facing query surface.

Reference: every query builder registers a ``fromXContent`` parser
(``search/SearchModule.java:1081-1170``; builders under ``index/query/``) so a
search body like ``{"query": {"bool": {"must": [{"match": {"text": "spark"}}]}}}``
becomes a query tree. ``parse_dsl`` re-expresses that surface over this repo's
frozen Query dataclasses, so a user of the reference can run their existing
JSON queries unchanged. The ``wrapper`` query (WrapperQueryBuilder,
SearchModule.java:1132) — a base64-encoded embedded JSON query — is supported
by recursion.

Field-name convention: the DSL names the indexed body field explicitly (ES
``"text"``/``"content"``); our engine calls that the DEFAULT field
(``field=None``). ``default_field`` (default ``"text"``) maps that name to
None; other names are extra indexed fields (namespaced postings) or doc
columns (``doc_columns`` → Term/Range filters), matching how the reference
routes keyword/numeric fields to doc values instead of analyzed postings.
"""

from __future__ import annotations

import base64
import json

from elasticsearch_ray.index.spec import fkey
from elasticsearch_ray.search.query import (
    BoolQuery,
    BoostingQuery,
    CombinedFieldsQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    DistanceFeatureQuery,
    ExistsQuery,
    FunctionScoreQuery,
    FuzzyQuery,
    IdsQuery,
    IntervalsQuery,
    KnnQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MatchPhrasePrefixQuery,
    MatchPhraseQuery,
    MatchQuery,
    MoreLikeThisQuery,
    MultiMatchQuery,
    PinnedQuery,
    PrefixQuery,
    Query,
    QueryStringQuery,
    RangeFilter,
    RankFeatureQuery,
    RegexpQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanWithinQuery,
    SpanContainingQuery,
    TermFilter,
    TermQuery,
    TermsLookupQuery,
    TermsQuery,
    TermsSetQuery,
    SparseVectorQuery,
    WeightedTokensQuery,
    WildcardQuery,
    parse_simple_query_string,
)

# doc columns of the standard web-page/documents schema: term/range on these
# become non-scoring doc-value filters (the reference's keyword/date/numeric
# field behavior), everything else hits the analyzed postings.
DEFAULT_DOC_COLUMNS = frozenset(
    {"url", "warc_ts", "lang", "doc_id", "date", "tags", "category", "pagerank"}
)


class DslError(ValueError):
    pass


def _one_entry(body: dict, what: str) -> tuple[str, object]:
    if not isinstance(body, dict) or len(body) != 1:
        raise DslError(f"{what} body must be a single {{field: ...}} object")
    return next(iter(body.items()))


def _field_body(body: dict, what: str, value_key: str = "value") -> tuple[str, dict]:
    """``{"field": X}`` → (field, {value_key: X}); ``{"field": {...}}`` passes
    through — the two accepted shorthand forms of every fielded query."""
    field, v = _one_entry(body, what)
    if not isinstance(v, dict):
        v = {value_key: v}
    return field, v


def _fields_boosts(fields: list[str], default_field: str) -> tuple[tuple, tuple]:
    """Parse the ``["title^2", "text"]`` caret-boost form."""
    names, boosts = [], []
    for f in fields:
        if "^" in f:
            name, b = f.rsplit("^", 1)
            boosts.append(float(b))
        else:
            name, b = f, None
            boosts.append(1.0)
        names.append(None if name == default_field else name)
    return tuple(names), tuple(boosts)


class _Parser:
    def __init__(self, default_field: str, doc_columns: frozenset,
                 strict_columns: bool = False):
        self.default_field = default_field
        self.doc_columns = doc_columns
        self.strict_columns = strict_columns
        self.named: dict[str, Query] = {}  # _name → parsed clause (matched_queries)

    def _f(self, field: str):
        return None if field == self.default_field else field

    def parse(self, d: dict) -> Query:
        if not isinstance(d, dict) or len(d) != 1:
            raise DslError("a query is a single {type: body} object")
        kind, body = next(iter(d.items()))
        fn = getattr(self, f"q_{kind}", None)
        if fn is None:
            raise DslError(f"unsupported query type {kind!r}")
        name = None
        if isinstance(body, dict):
            if "_name" in body:  # compound-level: {"bool": {..., "_name": n}}
                body = dict(body)
                name = body.pop("_name")
            elif len(body) == 1:  # fielded: {"match": {"f": {..., "_name": n}}}
                f, v = next(iter(body.items()))
                if isinstance(v, dict) and "_name" in v:
                    v = dict(v)
                    name = v.pop("_name")
                    body = {f: v}
        q = fn(body)
        if name is not None:
            self.named[str(name)] = q
        return q

    def _list(self, v) -> tuple:
        if isinstance(v, dict):
            v = [v]
        return tuple(self.parse(x) for x in v)

    # --- leaf queries -----------------------------------------------------
    def q_match(self, body):
        field, v = _field_body(body, "match", "query")
        return MatchQuery(
            text=str(v["query"]), operator=v.get("operator", "or").lower(),
            minimum_should_match=v.get("minimum_should_match"),
            analyzer=v.get("analyzer"),
            zero_terms_query=v.get("zero_terms_query", "none").lower(),
            boost=float(v.get("boost", 1.0)), field=self._f(field),
        )

    def q_match_phrase(self, body):
        field, v = _field_body(body, "match_phrase", "query")
        return MatchPhraseQuery(text=str(v["query"]), slop=int(v.get("slop", 0)),
                                analyzer=v.get("analyzer"),
                                boost=float(v.get("boost", 1.0)), field=self._f(field))

    def q_match_phrase_prefix(self, body):
        field, v = _field_body(body, "match_phrase_prefix", "query")
        if self._f(field) is not None:
            raise DslError("match_phrase_prefix supports the default field only")
        return MatchPhrasePrefixQuery(text=str(v["query"]),
                                      max_expansions=int(v.get("max_expansions", 50)),
                                      analyzer=v.get("analyzer"),
                                      boost=float(v.get("boost", 1.0)))

    def q_match_bool_prefix(self, body):
        # MatchBoolPrefixQueryBuilder.java: analyze the text, every term
        # but the last becomes a term match, the last a prefix query, all
        # combined in a bool SHOULD (scores sum; the prefix clause is
        # constant-score like PrefixQuery itself)
        field, v = _field_body(body, "match_bool_prefix", "query")
        if self._f(field) is not None:
            raise DslError("match_bool_prefix supports the default field only")
        boost = float(v.get("boost", 1.0))
        toks = str(v["query"]).lower().split()
        if not toks:
            return MatchNoneQuery()
        should: list = [MatchQuery(t, boost=boost) for t in toks[:-1]]
        should.append(PrefixQuery(toks[-1], boost=boost))
        return BoolQuery(should=tuple(should))

    def q_term(self, body):
        field, v = _field_body(body, "term")
        if field in self.doc_columns:
            return TermFilter(column=field, value=v["value"])
        return TermQuery(term=str(v["value"]), boost=float(v.get("boost", 1.0)),
                         field=self._f(field))

    def q_terms(self, body):
        boost = 1.0
        body = dict(body)
        if "boost" in body:
            boost = float(body.pop("boost"))
        field, v = _one_entry(body, "terms")
        if isinstance(v, dict):  # terms lookup: {"index":..., "id":..., "path":...}
            return TermsLookupQuery(doc_id=int(v["id"]),
                                    text_column=v.get("path", "text"), boost=boost)
        if field in self.doc_columns:
            return BoolQuery(should=tuple(TermFilter(column=field, value=x) for x in v),
                             minimum_should_match=1, boost=boost)
        if self._f(field) is not None:
            raise DslError("terms on an extra indexed field is not supported")
        return TermsQuery(terms=tuple(str(x) for x in v), boost=boost)

    def q_terms_set(self, body):
        field, v = _field_body(body, "terms_set", "terms")
        terms = tuple(fkey(self._f(field), str(t)) for t in v["terms"])
        return TermsSetQuery(terms=terms,
                             minimum_should_match_field=v["minimum_should_match_field"],
                             boost=float(v.get("boost", 1.0)))

    def q_range(self, body):
        field, v = _field_body(body, "range")
        if self._f(field) is None:
            # parse-time guard (consistent with wildcard/regexp/fuzzy):
            # range over the analyzed default text field has no ordered
            # column semantics
            raise DslError(f"range over the analyzed field {field!r} "
                           "is not supported")
        if self.strict_columns and field not in self.doc_columns:
            raise DslError(f"range requires a stored doc column, got {field!r}")
        return RangeFilter(column=field, gte=v.get("gte"), lte=v.get("lte"),
                           gt=v.get("gt"), lt=v.get("lt"))

    def q_exists(self, body):
        return ExistsQuery(field=self._f(body["field"]),
                           boost=float(body.get("boost", 1.0)))

    def q_prefix(self, body):
        field, v = _field_body(body, "prefix")
        # non-default fields work through the sorted term dict: namespaced
        # terms "<field>\x1f<term>" share the prefix "<field>\x1f<value>"
        pfx = v.get("value", v.get("prefix"))
        return PrefixQuery(prefix=fkey(self._f(field), str(pfx)),
                           boost=float(v.get("boost", 1.0)))

    def q_wildcard(self, body):
        field, v = _field_body(body, "wildcard")
        if self._f(field) is not None:
            raise DslError("wildcard supports the default field only")
        return WildcardQuery(pattern=str(v.get("value", v.get("wildcard"))),
                             boost=float(v.get("boost", 1.0)))

    def q_regexp(self, body):
        field, v = _field_body(body, "regexp")
        if self._f(field) is not None:
            raise DslError("regexp supports the default field only")
        return RegexpQuery(pattern=str(v["value"]), boost=float(v.get("boost", 1.0)))

    def q_fuzzy(self, body):
        field, v = _field_body(body, "fuzzy")
        if self._f(field) is not None:
            raise DslError("fuzzy supports the default field only")
        return FuzzyQuery(term=str(v["value"]), fuzziness=str(v.get("fuzziness", "AUTO")),
                          prefix_length=int(v.get("prefix_length", 0)),
                          boost=float(v.get("boost", 1.0)))

    def q_ids(self, body):
        return IdsQuery(ids=tuple(int(i) for i in body["values"]),
                        boost=float(body.get("boost", 1.0)))

    def q_match_all(self, body):
        return MatchAllQuery(boost=float((body or {}).get("boost", 1.0)))

    def q_match_none(self, body):
        return MatchNoneQuery(boost=float((body or {}).get("boost", 1.0)))

    # --- compound ---------------------------------------------------------
    def q_bool(self, body):
        return BoolQuery(
            must=self._list(body.get("must", [])),
            should=self._list(body.get("should", [])),
            filter=self._list(body.get("filter", [])),
            must_not=self._list(body.get("must_not", [])),
            minimum_should_match=body.get("minimum_should_match"),
            boost=float(body.get("boost", 1.0)),
        )

    def q_dis_max(self, body):
        return DisMaxQuery(queries=self._list(body["queries"]),
                           tie_breaker=float(body.get("tie_breaker", 0.0)),
                           boost=float(body.get("boost", 1.0)))

    def q_constant_score(self, body):
        return ConstantScoreQuery(filter=self.parse(body["filter"]),
                                  boost=float(body.get("boost", 1.0)))

    def q_boosting(self, body):
        return BoostingQuery(positive=self.parse(body["positive"]),
                             negative=self.parse(body["negative"]),
                             negative_boost=float(body.get("negative_boost", 0.5)))

    def q_function_score(self, body):
        if "functions" in body:
            fns = tuple(self._parse_score_function(f)
                        for f in body["functions"])
            mb = body.get("max_boost")
            ms = body.get("min_score")
            return FunctionScoreQuery(
                query=self.parse(body["query"]) if "query" in body else None,
                functions=fns,
                score_mode=body.get("score_mode", "multiply"),
                boost_mode=body.get("boost_mode", "multiply"),
                max_boost=float(mb) if mb is not None else float("inf"),
                min_score=float(ms) if ms is not None else None,
            )
        fvf = body.get("field_value_factor", {})
        return FunctionScoreQuery(
            query=self.parse(body["query"]) if "query" in body else None,
            field=fvf.get("field"), factor=float(fvf.get("factor", 1.0)),
            modifier=fvf.get("modifier", "none"),
            weight=float(body.get("weight", 1.0)),
            boost_mode=body.get("boost_mode", "multiply"),
        )

    def _parse_score_function(self, f):
        from elasticsearch_ray.search.query import ScoreFunction

        flt = self.parse(f["filter"]) if "filter" in f else None
        weight = float(f.get("weight", 1.0))
        kinds = [k for k in ("field_value_factor", "random_score", "gauss",
                             "exp", "linear") if k in f]
        if len(kinds) > 1:
            raise DslError(f"score function has multiple kinds: {kinds}")
        if not kinds:
            if "weight" not in f:
                raise DslError("score function needs weight or a function")
            return ScoreFunction(kind="weight", weight=weight, filter=flt)
        kind = kinds[0]
        params = f[kind]
        if kind in ("gauss", "exp", "linear"):
            # DSL shape: {"gauss": {"<field>": {origin, scale, ...}}}
            if len(params) != 1:
                raise DslError(f"{kind} expects exactly one field")
            field, spec = next(iter(params.items()))
            params = {"field": field, **spec}
        return ScoreFunction(kind=kind,
                             params=tuple(sorted(params.items())),
                             weight=weight, filter=flt)

    def q_script_score(self, body):
        # ScriptScoreQueryBuilder: a script block parses into the sandboxed
        # expression scorer (search/expressions.py); the documented
        # field-value idiom still maps onto field_value_factor
        if "script" in body:
            script = body["script"]
            source = script.get("source") if isinstance(script, dict) else script
            lang = (script.get("lang", "expression")
                    if isinstance(script, dict) else "expression")
            params = (script.get("params") or {}
                      if isinstance(script, dict) else {})
            if lang not in ("expression", "painless"):
                raise DslError(f"unknown script lang {lang!r}")
            if not isinstance(source, str) or not source.strip():
                raise DslError("script_score.script needs a source string")
            if "query" not in body:
                # the reference requires a base query on script_score;
                # a None query would die with a TypeError deep inside a
                # partition task instead of a parse error here
                raise DslError("script_score requires a query")
            return FunctionScoreQuery(
                query=self.parse(body["query"]),
                script=source,
                script_lang=lang,
                script_params=tuple(sorted(params.items())),
                weight=float(body.get("weight", 1.0)),
            )
        return self.q_function_score(body)

    # --- multi-field ------------------------------------------------------
    def q_multi_match(self, body):
        fields, boosts = _fields_boosts(body["fields"], self.default_field)
        return MultiMatchQuery(text=str(body["query"]), fields=fields,
                               type=body.get("type", "best_fields"),
                               tie_breaker=float(body.get("tie_breaker", 0.0)),
                               operator=body.get("operator", "or").lower(),
                               boosts=tuple(zip(fields, boosts)),
                               boost=float(body.get("boost", 1.0)))

    def q_combined_fields(self, body):
        fields, weights = _fields_boosts(body["fields"], self.default_field)
        return CombinedFieldsQuery(text=str(body["query"]), fields=fields,
                                   weights=weights,
                                   operator=body.get("operator", "or").lower(),
                                   boost=float(body.get("boost", 1.0)))

    def q_query_string(self, body):
        return QueryStringQuery(query=str(body["query"]),
                                default_field=self._f(body.get("default_field",
                                                               self.default_field)),
                                default_operator=body.get("default_operator", "or").lower(),
                                boost=float(body.get("boost", 1.0)))

    def q_simple_query_string(self, body):
        return parse_simple_query_string(
            str(body["query"]), body.get("default_operator", "or").lower())

    # --- span / intervals -------------------------------------------------
    def _span_term(self, d) -> str:
        kind, body = next(iter(d.items()))
        if kind != "span_term":
            raise DslError("span clauses must be span_term leaves")
        field, v = _field_body(body, "span_term")
        return fkey(self._f(field), str(v["value"]))

    def q_span_term(self, body):
        field, v = _field_body(body, "span_term")
        return TermQuery(term=str(v["value"]), boost=float(v.get("boost", 1.0)),
                         field=self._f(field))

    def q_span_near(self, body):
        return SpanNearQuery(clauses=tuple(self._span_term(c) for c in body["clauses"]),
                             slop=int(body.get("slop", 0)),
                             in_order=bool(body.get("in_order", True)),
                             boost=float(body.get("boost", 1.0)))

    def q_span_first(self, body):
        return SpanFirstQuery(term=self._span_term(body["match"]),
                              end=int(body.get("end", 3)),
                              boost=float(body.get("boost", 1.0)))

    def q_span_or(self, body):
        return SpanOrQuery(clauses=tuple(self._span_term(c) for c in body["clauses"]),
                           boost=float(body.get("boost", 1.0)))

    def q_span_not(self, body):
        return SpanNotQuery(include=self._span_term(body["include"]),
                            exclude=self._span_term(body["exclude"]),
                            pre=int(body.get("pre", 0)), post=int(body.get("post", 0)),
                            boost=float(body.get("boost", 1.0)))

    def _span_big(self, d) -> tuple:
        kind, body = next(iter(d.items()))
        if kind == "span_term":
            return (self._span_term(d),), 0
        if kind != "span_near":
            raise DslError("big span must be span_near or span_term")
        if not body.get("in_order", True):
            raise DslError("span_within/containing big spans must be in_order")
        return (tuple(self._span_term(c) for c in body["clauses"]),
                int(body.get("slop", 0)))

    def q_span_within(self, body):
        big, slop = self._span_big(body["big"])
        return SpanWithinQuery(little=self._span_term(body["little"]), big=big,
                               big_slop=slop, boost=float(body.get("boost", 1.0)))

    def q_span_containing(self, body):
        big, slop = self._span_big(body["big"])
        return SpanContainingQuery(little=self._span_term(body["little"]), big=big,
                                   big_slop=slop, boost=float(body.get("boost", 1.0)))

    def q_intervals(self, body):
        field, v = _one_entry(body, "intervals")
        if self._f(field) is not None:
            raise DslError("intervals supports the default field only")
        return IntervalsQuery(source=self._intervals_source(v))

    def _intervals_source(self, v: dict) -> tuple:
        kind, b = next(iter(v.items()))
        if kind == "match":
            return ("match", str(b["query"]), int(b.get("max_gaps", -1)),
                    bool(b.get("ordered", False)))
        if kind == "any_of":
            return ("any_of", tuple(self._intervals_source(x) for x in b["intervals"]))
        if kind == "all_of":
            terms = []
            for x in b["intervals"]:
                k2, b2 = next(iter(x.items()))
                if k2 != "match":
                    raise DslError("all_of supports match term leaves only")
                terms.append(str(b2["query"]))
            return ("all_of", tuple(terms), int(b.get("max_gaps", -1)),
                    bool(b.get("ordered", False)))
        raise DslError(f"unsupported intervals source {kind!r}")

    # --- feature / misc ---------------------------------------------------
    def q_rank_feature(self, body):
        field = body["field"]
        if "log" in body:
            return RankFeatureQuery(field=field, function="log",
                                    scaling_factor=float(body["log"]["scaling_factor"]),
                                    boost=float(body.get("boost", 1.0)))
        if "sigmoid" in body:
            return RankFeatureQuery(field=field, function="sigmoid",
                                    pivot=float(body["sigmoid"]["pivot"]),
                                    exponent=float(body["sigmoid"]["exponent"]),
                                    boost=float(body.get("boost", 1.0)))
        if "linear" in body:
            return RankFeatureQuery(field=field, function="linear",
                                    boost=float(body.get("boost", 1.0)))
        sat = body.get("saturation", {})
        pv = sat.get("pivot")  # absent = Lucene auto-pivot (coordinator)
        return RankFeatureQuery(field=field, function="saturation",
                                pivot=None if pv is None else float(pv),
                                boost=float(body.get("boost", 1.0)))

    def q_weighted_tokens(self, body):
        # weighted_tokens ({"<field>": {"tokens": {tok: w}}}) — the sparse
        # vector / text-expansion execution shape over a rank_features field
        items = [(f, b) for f, b in body.items() if f != "boost"]
        if len(items) != 1:
            raise DslError("weighted_tokens needs exactly one field")
        field, b = items[0]
        toks = b.get("tokens") or {}
        if not isinstance(toks, dict) or not toks:
            raise DslError("weighted_tokens needs a non-empty tokens map")
        return WeightedTokensQuery(
            field=field,
            tokens=tuple(sorted((str(t), float(w)) for t, w in toks.items())),
            boost=float(b.get("boost", body.get("boost", 1.0))))

    def q_sparse_vector(self, body):
        # sparse_vector (SparseVectorQueryBuilder 8.15): explicit
        # query_vector weights OR inference_id + query text; optional
        # pruning_config (TokenPruningConfig)
        field = body.get("field")
        if not field:
            raise DslError("sparse_vector requires 'field'")
        qv = body.get("query_vector")
        inf, qtext = body.get("inference_id"), body.get("query")
        if qv and (inf or qtext is not None):
            raise DslError("sparse_vector takes query_vector OR "
                           "inference_id+query, not both")
        if not qv and not (inf and qtext is not None):
            raise DslError("sparse_vector needs query_vector or "
                           "inference_id + query")
        pc = body.get("pruning_config") or {}
        return SparseVectorQuery(
            field=field,
            tokens=tuple(sorted((str(t), float(w))
                                for t, w in (qv or {}).items())),
            inference_id=inf, query=qtext,
            prune=bool(body.get("prune", bool(pc))),
            tokens_freq_ratio_threshold=float(
                pc.get("tokens_freq_ratio_threshold", 5.0)),
            tokens_weight_threshold=float(
                pc.get("tokens_weight_threshold", 0.4)),
            only_score_pruned_tokens=bool(
                pc.get("only_score_pruned_tokens", False)),
            boost=float(body.get("boost", 1.0)))

    def q_text_expansion(self, body):
        # deprecated text_expansion ({"<field>": {"model_id", "model_text"}})
        # — 1:1 onto the sparse_vector inference form
        items = [(f, b) for f, b in body.items() if f != "boost"]
        if len(items) != 1:
            raise DslError("text_expansion needs exactly one field")
        field, b = items[0]
        if "model_id" not in b or "model_text" not in b:
            raise DslError("text_expansion needs model_id and model_text")
        pc = b.get("pruning_config") or {}
        return SparseVectorQuery(
            field=field, inference_id=b["model_id"],
            query=b["model_text"], prune=bool(pc),
            tokens_freq_ratio_threshold=float(
                pc.get("tokens_freq_ratio_threshold", 5.0)),
            tokens_weight_threshold=float(
                pc.get("tokens_weight_threshold", 0.4)),
            only_score_pruned_tokens=bool(
                pc.get("only_score_pruned_tokens", False)),
            boost=float(b.get("boost", body.get("boost", 1.0))))

    def q_distance_feature(self, body):
        return DistanceFeatureQuery(field=body["field"], origin=body["origin"],
                                    pivot=body["pivot"],
                                    boost=float(body.get("boost", 1.0)))

    def q_knn(self, body):
        """knn clause (KnnVectorQueryBuilder.fromXContent): requires field +
        query_vector; num_candidates must cover k (the reference rejects
        num_candidates < k at parse time)."""
        if "field" not in body or "query_vector" not in body:
            raise DslError("knn requires 'field' and 'query_vector'")
        qv = body["query_vector"]
        if (not isinstance(qv, (list, tuple)) or not qv
                or not all(isinstance(x, (int, float)) for x in qv)):
            raise DslError("knn query_vector must be a non-empty number list")
        k = int(body.get("k", 10))
        num_candidates = int(body.get("num_candidates", max(100, k)))
        if k <= 0:
            raise DslError("knn k must be positive")
        if num_candidates < k:
            raise DslError("knn num_candidates cannot be less than k")
        sim = body.get("similarity")
        filt = body.get("filter") or []
        if isinstance(filt, dict):
            filt = [filt]
        pairs = []
        for f in filt:
            # pre-filter subset: term predicates over vector-table columns
            # (the reference accepts arbitrary DSL; our vector tables carry
            # plain metadata columns)
            if not (isinstance(f, dict) and len(f) == 1 and "term" in f):
                raise DslError("knn filter supports term clauses only")
            col, val = _one_entry(dict(f["term"]), "term")
            if isinstance(val, dict):
                if "value" not in val:
                    raise DslError("knn filter term object requires 'value'")
                val = val["value"]
            pairs.append((str(col), val))
        return KnnQuery(field=str(body["field"]),
                        query_vector=tuple(float(x) for x in qv),
                        k=k, num_candidates=num_candidates,
                        similarity=None if sim is None else float(sim),
                        boost=float(body.get("boost", 1.0)),
                        filter=tuple(pairs))

    def q_pinned(self, body):
        return PinnedQuery(ids=tuple(int(i) for i in body["ids"]),
                           organic=self.parse(body["organic"]),
                           boost=float(body.get("boost", 1.0)))

    def q_more_like_this(self, body):
        like = body["like"]
        items = like if isinstance(like, list) else [like]
        texts, ids = [], []
        for x in items:
            if isinstance(x, dict):
                # like-document item ({"_id": ...}, MoreLikeThisQueryBuilder
                # Item): text fetched from _source at rewrite time
                if "_id" not in x:
                    raise DslError("more_like_this like-document items need _id")
                ids.append(int(x["_id"]))
            else:
                texts.append(str(x))
        return MoreLikeThisQuery(like=" ".join(texts),
                                 like_ids=tuple(ids),
                                 max_query_terms=int(body.get("max_query_terms", 25)),
                                 min_term_freq=int(body.get("min_term_freq", 2)),
                                 min_doc_freq=int(body.get("min_doc_freq", 5)),
                                 analyzer=body.get("analyzer"),
                                 boost=float(body.get("boost", 1.0)))

    def q_wrapper(self, body):
        inner = json.loads(base64.b64decode(body["query"]).decode("utf-8"))
        return self.parse(inner)


def to_dsl(q: Query, default_field: str = "text") -> dict:
    """Inverse of parse_dsl: serialize a Query tree to the reference's JSON
    DSL (AbstractQueryBuilder#toXContent analog). ``parse_dsl(to_dsl(q)) ==
    q`` for every supported type (property-tested)."""
    f = lambda field: default_field if field is None else field  # noqa: E731

    def span_term(term: str) -> dict:
        i = term.find("\x1f")
        fld, t = (default_field, term) if i < 0 else (term[:i], term[i + 1:])
        return {"span_term": {fld: {"value": t}}}

    if isinstance(q, MatchQuery):
        return {"match": {f(q.field): {
            "query": q.text, "operator": q.operator,
            **({"minimum_should_match": q.minimum_should_match}
               if q.minimum_should_match is not None else {}),
            **({"analyzer": q.analyzer} if q.analyzer else {}),
            "zero_terms_query": q.zero_terms_query, "boost": q.boost}}}
    if isinstance(q, MatchPhraseQuery):
        return {"match_phrase": {f(q.field): {"query": q.text, "slop": q.slop,
                **({"analyzer": q.analyzer} if q.analyzer else {}),
                "boost": q.boost}}}
    if isinstance(q, MatchPhrasePrefixQuery):
        return {"match_phrase_prefix": {default_field: {
            "query": q.text, "max_expansions": q.max_expansions,
            **({"analyzer": q.analyzer} if q.analyzer else {}), "boost": q.boost}}}
    if isinstance(q, TermQuery):
        return {"term": {f(q.field): {"value": q.term, "boost": q.boost}}}
    if isinstance(q, TermFilter):
        return {"term": {q.column: {"value": q.value}}}
    if isinstance(q, TermsQuery):
        return {"terms": {default_field: list(q.terms), "boost": q.boost}}
    if isinstance(q, TermsLookupQuery):
        return {"terms": {default_field: {"id": q.doc_id, "path": q.text_column},
                          "boost": q.boost}}
    if isinstance(q, TermsSetQuery):
        fld = None
        terms = []
        for t in q.terms:
            i = t.find("\x1f")
            fld = None if i < 0 else t[:i]
            terms.append(t if i < 0 else t[i + 1:])
        return {"terms_set": {f(fld): {
            "terms": terms, "minimum_should_match_field": q.minimum_should_match_field,
            "boost": q.boost}}}
    if isinstance(q, RangeFilter):
        body = {}
        for attr in ("gte", "lte", "gt", "lt"):
            v = getattr(q, attr)
            if v is not None:
                body[attr] = v
        return {"range": {q.column: body}}
    if isinstance(q, ExistsQuery):
        return {"exists": {"field": q.field, "boost": q.boost}}
    if isinstance(q, PrefixQuery):
        i = q.prefix.find("\x1f")
        fld, pfx = (default_field, q.prefix) if i < 0 else (q.prefix[:i], q.prefix[i + 1:])
        return {"prefix": {fld: {"value": pfx, "boost": q.boost}}}
    if isinstance(q, WildcardQuery):
        return {"wildcard": {default_field: {"value": q.pattern, "boost": q.boost}}}
    if isinstance(q, RegexpQuery):
        return {"regexp": {default_field: {"value": q.pattern, "boost": q.boost}}}
    if isinstance(q, FuzzyQuery):
        return {"fuzzy": {default_field: {"value": q.term, "fuzziness": q.fuzziness,
                                          "prefix_length": q.prefix_length,
                                          "boost": q.boost}}}
    if isinstance(q, IdsQuery):
        return {"ids": {"values": list(q.ids), "boost": q.boost}}
    if isinstance(q, MatchAllQuery):
        return {"match_all": {"boost": q.boost}}
    if isinstance(q, MatchNoneQuery):
        return {"match_none": {"boost": q.boost}}
    if isinstance(q, BoolQuery):
        return {"bool": {
            "must": [to_dsl(s, default_field) for s in q.must],
            "should": [to_dsl(s, default_field) for s in q.should],
            "filter": [to_dsl(s, default_field) for s in q.filter],
            "must_not": [to_dsl(s, default_field) for s in q.must_not],
            **({"minimum_should_match": q.minimum_should_match}
               if q.minimum_should_match is not None else {}),
            "boost": q.boost}}
    if isinstance(q, DisMaxQuery):
        return {"dis_max": {"queries": [to_dsl(s, default_field) for s in q.queries],
                            "tie_breaker": q.tie_breaker, "boost": q.boost}}
    if isinstance(q, ConstantScoreQuery):
        return {"constant_score": {"filter": to_dsl(q.filter, default_field),
                                   "boost": q.boost}}
    if isinstance(q, BoostingQuery):
        return {"boosting": {"positive": to_dsl(q.positive, default_field),
                             "negative": to_dsl(q.negative, default_field),
                             "negative_boost": q.negative_boost}}
    if isinstance(q, FunctionScoreQuery):
        if q.script:
            sdict = {"source": q.script}
            if q.script_lang != "expression":
                sdict["lang"] = q.script_lang
            if q.script_params:
                sdict["params"] = dict(q.script_params)
            return {"script_score": {
                **({"query": to_dsl(q.query, default_field)} if q.query is not None else {}),
                "script": sdict, "weight": q.weight}}
        if q.functions:
            fns = []
            for fn in q.functions:
                d = {}
                if fn.filter is not None:
                    d["filter"] = to_dsl(fn.filter, default_field)
                if fn.kind == "weight":
                    d["weight"] = fn.weight
                elif fn.kind in ("gauss", "exp", "linear"):
                    p = dict(fn.params)
                    field = p.pop("field")
                    d[fn.kind] = {field: p}
                    d["weight"] = fn.weight
                else:
                    d[fn.kind] = dict(fn.params)
                    d["weight"] = fn.weight
                fns.append(d)
            body = {
                **({"query": to_dsl(q.query, default_field)}
                   if q.query is not None else {}),
                "functions": fns, "score_mode": q.score_mode,
                "boost_mode": q.boost_mode}
            if q.max_boost != float("inf"):
                body["max_boost"] = q.max_boost
            if q.min_score is not None:
                body["min_score"] = q.min_score
            return {"function_score": body}
        return {"function_score": {
            **({"query": to_dsl(q.query, default_field)} if q.query is not None else {}),
            "field_value_factor": {"field": q.field, "factor": q.factor,
                                   "modifier": q.modifier},
            "weight": q.weight, "boost_mode": q.boost_mode}}
    if isinstance(q, MultiMatchQuery):
        boosts = dict(q.boosts)
        return {"multi_match": {
            "query": q.text,
            "fields": [f(fl) + (f"^{boosts[fl]:g}" if boosts.get(fl, 1.0) != 1.0 else "")
                       for fl in q.fields],
            "type": q.type, "tie_breaker": q.tie_breaker, "operator": q.operator,
            "boost": q.boost}}
    if isinstance(q, CombinedFieldsQuery):
        ws = dict(zip(q.fields, q.weights)) if q.weights else {}
        return {"combined_fields": {
            "query": q.text,
            "fields": [f(fl) + (f"^{ws[fl]:g}" if ws.get(fl, 1.0) != 1.0 else "")
                       for fl in q.fields],
            "operator": q.operator, "boost": q.boost}}
    if isinstance(q, QueryStringQuery):
        return {"query_string": {"query": q.query, "default_field": f(q.default_field),
                                 "default_operator": q.default_operator,
                                 "boost": q.boost}}
    if isinstance(q, SpanNearQuery):
        return {"span_near": {"clauses": [span_term(t) for t in q.clauses],
                              "slop": q.slop, "in_order": q.in_order, "boost": q.boost}}
    if isinstance(q, SpanFirstQuery):
        return {"span_first": {"match": span_term(q.term), "end": q.end,
                               "boost": q.boost}}
    if isinstance(q, SpanOrQuery):
        return {"span_or": {"clauses": [span_term(t) for t in q.clauses],
                            "boost": q.boost}}
    if isinstance(q, SpanNotQuery):
        return {"span_not": {"include": span_term(q.include),
                             "exclude": span_term(q.exclude),
                             "pre": q.pre, "post": q.post, "boost": q.boost}}
    if isinstance(q, (SpanWithinQuery, SpanContainingQuery)):
        kind = "span_within" if isinstance(q, SpanWithinQuery) else "span_containing"
        return {kind: {"little": span_term(q.little),
                       "big": {"span_near": {"clauses": [span_term(t) for t in q.big],
                                             "slop": q.big_slop, "in_order": True}},
                       "boost": q.boost}}
    if isinstance(q, IntervalsQuery):
        def src(s: tuple) -> dict:
            if s[0] == "match":
                return {"match": {"query": s[1], "max_gaps": s[2], "ordered": s[3]}}
            if s[0] == "any_of":
                return {"any_of": {"intervals": [src(x) for x in s[1]]}}
            return {"all_of": {"intervals": [{"match": {"query": t}} for t in s[1]],
                               "max_gaps": s[2], "ordered": s[3]}}
        return {"intervals": {default_field: src(q.source)}}
    if isinstance(q, RankFeatureQuery):
        body = {"field": q.field, "boost": q.boost}
        if q.function == "log":
            body["log"] = {"scaling_factor": q.scaling_factor}
        elif q.function == "sigmoid":
            body["sigmoid"] = {"pivot": q.pivot, "exponent": q.exponent}
        elif q.function == "linear":
            body["linear"] = {}
        else:
            body["saturation"] = {} if q.pivot is None else {"pivot": q.pivot}
        return {"rank_feature": body}
    if isinstance(q, WeightedTokensQuery):
        return {"weighted_tokens": {q.field: {"tokens": dict(q.tokens),
                                              "boost": q.boost}}}
    if isinstance(q, SparseVectorQuery):
        body: dict = {"field": q.field, "boost": q.boost}
        if q.tokens:
            body["query_vector"] = dict(q.tokens)
        else:
            body["inference_id"] = q.inference_id
            body["query"] = q.query
        if q.prune:
            body["prune"] = True
            body["pruning_config"] = {
                "tokens_freq_ratio_threshold":
                    q.tokens_freq_ratio_threshold,
                "tokens_weight_threshold": q.tokens_weight_threshold,
                "only_score_pruned_tokens": q.only_score_pruned_tokens,
            }
        return {"sparse_vector": body}
    if isinstance(q, DistanceFeatureQuery):
        return {"distance_feature": {"field": q.field, "origin": q.origin,
                                     "pivot": q.pivot, "boost": q.boost}}
    if isinstance(q, KnnQuery):
        body = {"field": q.field, "query_vector": list(q.query_vector),
                "k": q.k, "num_candidates": q.num_candidates,
                "boost": q.boost}
        if q.similarity is not None:
            body["similarity"] = q.similarity
        if q.filter:
            body["filter"] = [{"term": {c: v}} for c, v in q.filter]
        return {"knn": body}
    if isinstance(q, PinnedQuery):
        return {"pinned": {"ids": list(q.ids),
                           "organic": to_dsl(q.organic, default_field),
                           "boost": q.boost}}
    if isinstance(q, MoreLikeThisQuery):
        like: list = ([q.like] if q.like else []) + \
            [{"_id": int(d)} for d in q.like_ids]
        return {"more_like_this": {"like": like if q.like_ids else q.like,
                                   "max_query_terms": q.max_query_terms,
                                   "min_term_freq": q.min_term_freq,
                                   "min_doc_freq": q.min_doc_freq,
                                   **({"analyzer": q.analyzer} if q.analyzer else {}),
                                   "boost": q.boost}}
    raise DslError(f"cannot serialize {type(q).__name__}")


def parse_dsl(query: dict | str, default_field: str = "text",
              doc_columns: frozenset | None = None) -> Query:
    """Parse a JSON query-DSL object (or JSON string, or a whole search body
    with a top-level ``"query"`` key) into this engine's Query tree."""
    q, _ = parse_dsl_with_names(query, default_field, doc_columns)
    return q


def parse_dsl_with_names(query: dict | str, default_field: str = "text",
                         doc_columns: frozenset | None = None
                         ) -> tuple[Query, dict[str, Query]]:
    """Like parse_dsl but also returns the ``_name``-tagged clauses
    ({name: sub-query}) for the matched_queries fetch feature
    (AbstractQueryBuilder#queryName / MatchedQueriesPhase analog)."""
    if isinstance(query, str):
        query = json.loads(query)
    if "query" in query and len(query) == 1:
        query = query["query"]
    # passing doc_columns = the caller declared the stored-column set, so
    # unknown range fields are parse-time errors (advisor finding); with no
    # declaration (None → built-in defaults) the parser can't know what the
    # engine stores (n_chars, orig_id, …) and stays lenient — a truly
    # missing column still fails with a clear error at partition eval. The
    # None sentinel keeps the contract value-based (a value-equal copy of
    # the default set behaves like any other explicit declaration).
    strict = doc_columns is not None
    cols = DEFAULT_DOC_COLUMNS if doc_columns is None else frozenset(doc_columns)
    p = _Parser(default_field, cols, strict_columns=strict)
    return p.parse(query), p.named
