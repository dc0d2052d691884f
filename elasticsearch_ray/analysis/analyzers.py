"""Analyzer registry — the reference's named-analyzer surface, Ray-Data-shaped.

Reference: ``index/analysis/AnalysisRegistry.java:634-646`` (default =
``standard``); named analyzers / tokenizers / filters are registered in
``modules/analysis-common/.../CommonAnalysisPlugin.java:179-402``.

Each analyzer is ``(text) -> (tokens, positions)`` where positions are the
Lucene token positions (stopword removal leaves position gaps, which is what
makes phrase queries behave like the reference). Analyzers are plain callables
held in a registry; the Ray-side stage (`index/build.py` AnalyzeActor) holds
one instance per actor — setup (stopword sets, compiled regexes) happens once
per actor, per the actor-pool pattern.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np

from elasticsearch_ray.analysis.stopwords import ENGLISH_STOP_WORDS
from elasticsearch_ray.analysis.tokenizer import MAX_TOKEN_LENGTH, findall_tokens, tokenize

Analysis = tuple[list[str], list[int]]  # (terms, positions)


class Analyzer:
    name = "base"

    def __call__(self, text: str) -> Analysis:  # pragma: no cover - interface
        raise NotImplementedError


class StandardAnalyzer(Analyzer):
    """UAX#29 + lowercase, empty stopwords, max_token_length=255.

    (StandardAnalyzerProvider.java:21-28.)
    """

    name = "standard"

    def __init__(self, max_token_length: int = MAX_TOKEN_LENGTH, stopwords: frozenset = frozenset()):
        self.max_token_length = max_token_length
        self.stopwords = stopwords

    def __call__(self, text: str) -> Analysis:
        toks = tokenize(text, self.max_token_length)
        if not self.stopwords:  # the default standard config: empty stopwords
            return [t.lower() for t in toks], list(range(len(toks)))
        terms: list[str] = []
        positions: list[int] = []
        for pos, t in enumerate(toks):
            t = t.lower()
            if t in self.stopwords:
                continue  # position gap, like Lucene StopFilter
            terms.append(t)
            positions.append(pos)
        return terms, positions

    def analyze_block(self, texts: list[str]):
        """Batched tokenize+lowercase over a whole block of docs — the build
        pipeline's hot path. Returns ``(flat_terms: pa.StringArray, lens:
        np.int64[n_docs])`` with terms in doc order, or None when this config
        can't batch (stopwords need per-token position gaps).

        Byte-identical to per-doc ``__call__``: lowercase runs vectorized via
        Arrow's utf8_lower, whose only divergence from Python str.lower over
        all of Unicode is U+0130 ('İ' full-lowers to 'i'+U+0307, simple-lowers
        to 'i'); docs containing it pre-lower in Python, on which utf8_lower
        is then idempotent (verified exhaustively in tests)."""
        if self.stopwords:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc

        findall = findall_tokens  # fast-path re for ASCII, full UAX#29 otherwise
        mtl = self.max_token_length
        flat: list[str] = []
        ext = flat.extend
        lens = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = findall(text)
            if "İ" in text:
                toks = [t.lower() for t in toks]
            lens[i] = len(toks)
            ext(toks)
        arr = pa.array(flat, pa.string())
        # overlong-token splitting (rare) checked vectorized, not per doc;
        # only the offending tokens are rewritten (tokenize() splits each
        # overlong token into consecutive mtl-sized chunks in place)
        if len(arr):
            tok_lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
            bad = np.flatnonzero(tok_lens > mtl)
            if len(bad):
                cum = np.cumsum(lens)
                out: list[str] = []
                oext = out.extend
                prev = 0
                for k in bad:
                    k = int(k)
                    oext(flat[prev:k])
                    t = flat[k]
                    chunks = [t[j : j + mtl] for j in range(0, len(t), mtl)]
                    oext(chunks)
                    lens[int(np.searchsorted(cum, k, side="right"))] += len(chunks) - 1
                    prev = k + 1
                oext(flat[prev:])
                arr = pa.array(out, pa.string())
        return pc.utf8_lower(arr), lens


class SimpleAnalyzer(Analyzer):
    """``simple``: maximal letter runs, lowercased (Lucene LetterTokenizer +
    LowerCaseFilter). SQL-expressible: regexp split on non-letters."""

    name = "simple"
    _re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def __call__(self, text: str) -> Analysis:
        terms = [t.lower() for t in self._re.findall(text)]
        return terms, list(range(len(terms)))


class WhitespaceAnalyzer(Analyzer):
    """``whitespace``: split on whitespace runs, case preserved."""

    name = "whitespace"

    def __call__(self, text: str) -> Analysis:
        terms = text.split()
        return terms, list(range(len(terms)))


class KeywordAnalyzer(Analyzer):
    """``keyword``: the entire input as a single token."""

    name = "keyword"

    def __call__(self, text: str) -> Analysis:
        return ([text], [0]) if text else ([], [])


class StopAnalyzer(StandardAnalyzer):
    """``stop``-style analyzer: standard chain + English stopword removal
    (with position gaps)."""

    name = "stop"

    def __init__(self):
        super().__init__(stopwords=ENGLISH_STOP_WORDS)


class EnglishAnalyzer(Analyzer):
    """``english`` language analyzer (Lucene EnglishAnalyzer semantics):
    standard tokenizer → english_possessive → lowercase → stop(_english_) →
    porter stem; stopword removal keeps position gaps."""

    name = "english"

    def __call__(self, text: str) -> Analysis:
        from elasticsearch_ray.analysis import filters as F
        from elasticsearch_ray.analysis.tokenizer import tokenize

        toks = tokenize(text)
        terms, pos = toks, list(range(len(toks)))
        terms, pos = F.english_possessive(terms, pos)
        terms, pos = F.lowercase(terms, pos)
        terms, pos = F.stop_filter(terms, pos, ENGLISH_STOP_WORDS)
        terms, pos = F.porter(terms, pos)
        return terms, pos


class FingerprintAnalyzer(Analyzer):
    """``fingerprint`` analyzer: lowercase, dedup, sort, join with space into
    ONE token (CommonAnalysisPlugin fingerprint analyzer)."""

    name = "fingerprint"

    def __call__(self, text: str) -> Analysis:
        from elasticsearch_ray.analysis.tokenizer import tokenize

        toks = sorted(set(t.lower() for t in tokenize(text)))
        joined = " ".join(toks)
        return ([joined], [0]) if joined else ([], [])


class SnowballAnalyzer(Analyzer):
    """``snowball`` analyzer (SnowballAnalyzerProvider): standard tokenizer
    → lowercase → stop → snowball stemmer for the configured language
    (English default; any language in the stemmer registry — other
    languages via ``SnowballAnalyzer(language=...)`` or a custom chain)."""

    name = "snowball"

    def __init__(self, language: str = "English"):
        self.language = language

    def __call__(self, text: str) -> Analysis:
        from elasticsearch_ray.analysis import filters as F
        from elasticsearch_ray.analysis.tokenizer import tokenize

        toks = tokenize(text)
        terms, pos = F.lowercase(toks, list(range(len(toks))))
        if self.language.lower() == "english":
            terms, pos = F.stop_filter(terms, pos, ENGLISH_STOP_WORDS)
        terms, pos = F.snowball_filter(terms, pos, language=self.language)
        return terms, pos


_REGISTRY: dict[str, Callable[[], Analyzer]] = {
    "standard": StandardAnalyzer,
    "simple": SimpleAnalyzer,
    "whitespace": WhitespaceAnalyzer,
    "keyword": KeywordAnalyzer,
    "stop": StopAnalyzer,
    "english": EnglishAnalyzer,
    "fingerprint": FingerprintAnalyzer,
    "snowball": SnowballAnalyzer,
}


def register(name: str, factory: Callable[[], Analyzer]) -> None:
    """Plugin surface — the AnalysisPlugin SPI analog (SURVEY §2.13)."""
    _REGISTRY[name] = factory


class CharFilteredAnalyzer(Analyzer):
    """Base analyzer preceded by a char-filter chain (custom-analyzer shape:
    char_filter list → tokenizer → token filters, AnalysisRegistry custom
    analyzer assembly). Compiled once per actor via get_analyzer caching of
    the parametric name."""

    name = "char_filtered"

    def __init__(self, base: Analyzer, char_filters):
        from elasticsearch_ray.analysis.char_filters import compile_chain

        self.base = base
        self.chain = compile_chain(char_filters)

    def __call__(self, text: str) -> Analysis:
        return self.base(self.chain(text))

    def analyze_block(self, texts: list[str]):
        blk = getattr(self.base, "analyze_block", None)
        if blk is None:
            return None
        ch = self.chain
        return blk([ch(t) for t in texts])


_SUBCHAIN_CACHE: dict = {}


def _cached_subchain(spec) -> list:
    """Resolve-once cache for multiplexer/condition sub-chains: these run
    once per DOCUMENT on the tokenize hot path, and rebuilding the registry
    + re-resolving names there measurably dominates the filter work."""
    try:
        key = spec if isinstance(spec, str) else tuple(
            f if isinstance(f, str)
            else (f[0], tuple(sorted((f[1] if len(f) > 1 else {}).items())))
            for f in spec)
        hash(key)
    except TypeError:  # unhashable params: resolve uncached
        return _chain_of(spec, _filter_registry())
    ch = _SUBCHAIN_CACHE.get(key)
    if ch is None:
        ch = _SUBCHAIN_CACHE[key] = _chain_of(spec, _filter_registry())
    return ch


def _chain_of(names, reg) -> list:
    """Resolve a sub-chain spec (comma-joined string or list of names /
    (name, params) pairs) against the filter registry."""
    if isinstance(names, str):
        names = [s.strip() for s in names.split(",") if s.strip()]
    chain = []
    for f in names:
        if isinstance(f, str):
            name, params = f, {}
        else:
            name, params = f[0], (f[1] if len(f) > 1 else {})
        fn = reg.get(name)
        if fn is None:
            raise ValueError(f"unknown token filter {name!r} in sub-chain")
        chain.append((fn, dict(params)))
    return chain


def _icu_folding(terms, pos, unicode_set_filter=None):
    from elasticsearch_ray.analysis.icu import icu_folding_filter

    return icu_folding_filter(terms, pos, unicode_set_filter)


def _icu_normalizer(terms, pos, name="nfkc_cf", mode="compose"):
    from elasticsearch_ray.analysis.icu import icu_normalizer_filter

    return icu_normalizer_filter(terms, pos, name=name, mode=mode)


def _icu_transform(terms, pos, id="Any-Lower"):
    from elasticsearch_ray.analysis.icu import icu_transform_filter

    return icu_transform_filter(terms, pos, id=id)


def _icu_collation(terms, pos, strength="tertiary", numeric=False,
                   case_first=None):
    from elasticsearch_ray.analysis.icu import icu_collation_filter

    return icu_collation_filter(terms, pos, strength=strength,
                                numeric=numeric, case_first=case_first)


def _phonetic(terms, pos, encoder="metaphone", replace=True):
    from elasticsearch_ray.analysis.phonetic import phonetic_filter

    return phonetic_filter(terms, pos, encoder=encoder, replace=replace)


def _multiplexer(terms, pos, filters, preserve_original=True):
    """``multiplexer`` (MultiplexerTokenFilterFactory): run the stream
    through each listed sub-chain (comma-joined filter names, as in the
    reference's settings syntax), stack every output at its source position,
    and drop same-position duplicates."""
    variants = [list(zip(terms, pos))] if preserve_original else []
    for spec in filters:
        t2, p2 = list(terms), list(pos)
        for fn, params in _cached_subchain(spec):
            t2, p2 = fn(t2, p2, **params)
        variants.append(list(zip(t2, p2)))
    merged = [tp for var in variants for tp in var]
    merged.sort(key=lambda tp: tp[1])
    seen: set = set()
    o_t, o_p = [], []
    for t, p in merged:
        if (p, t) in seen:
            continue
        seen.add((p, t))
        o_t.append(t)
        o_p.append(p)
    return o_t, o_p


def _condition(terms, pos, filter, script):
    """``condition`` (ScriptedConditionTokenFilter): apply the sub-chain
    only to tokens matching the predicate expression (Painless-subset over
    ``term``/``position``/``len``). The sub-chain is applied per matching
    token — exact for the term-level filters this registry holds."""
    from elasticsearch_ray.analysis.filters import predicate_code

    chain = _cached_subchain(filter)
    code = predicate_code(script)
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        if eval(code, {"__builtins__": {}}, {"term": t, "position": p, "len": len}):
            ts, ps = [t], [0]
            for fn, params in chain:
                ts, ps = fn(ts, ps, **params)
            for t2 in ts:
                o_t.append(t2)
                o_p.append(p)
        else:
            o_t.append(t)
            o_p.append(p)
    return o_t, o_p


_REGISTRY_CACHE: dict | None = None


def _filter_registry() -> dict:
    """Token-filter registry for custom-analyzer assembly — the
    CommonAnalysisPlugin.java:226-335 named-filter surface. Each entry is
    ``(terms, positions, **params) -> (terms, positions)``. Built once per
    process (callers must not mutate the returned dict)."""
    global _REGISTRY_CACHE
    if _REGISTRY_CACHE is not None:
        return _REGISTRY_CACHE

    from elasticsearch_ray.analysis import filters as F

    _REGISTRY_CACHE = {
        "lowercase": F.lowercase, "uppercase": F.uppercase,
        "asciifolding": F.asciifolding, "stop": F.stop_filter,
        "porter_stem": F.porter, "english_possessive": F.english_possessive,
        "length": F.length_filter, "truncate": F.truncate,
        "unique": F.unique_filter, "reverse": F.reverse_filter,
        "ngram": F.ngram, "edge_ngram": F.edge_ngram,
        "synonym": F.synonym, "min_hash": F.min_hash, "shingle": F.shingle,
        # round-3 additions
        "stemmer": F.stemmer, "kstem": F.kstem_filter,
        "stemmer_override": F.stemmer_override,
        "keyword_marker": F.keyword_marker,
        "elision": F.elision_filter, "cjk_width": F.cjk_width,
        "word_delimiter_graph": F.word_delimiter_graph,
        "word_delimiter": F.word_delimiter_graph,
        "common_grams": F.common_grams, "pattern_capture": F.pattern_capture,
        "dictionary_decompounder": F.dictionary_decompounder,
        "decimal_digit": F.decimal_digit, "apostrophe": F.apostrophe_filter,
        "limit": F.limit_count, "trim": F.trim_filter,
        # round-3 batch 2
        "keep": F.keep_filter, "keep_types": F.keep_types,
        "keyword_repeat": F.keyword_repeat,
        "remove_duplicates": F.remove_duplicates,
        "delimited_payload": F.delimited_payload,
        "classic": F.classic_filter, "snowball": F.snowball_filter,
        "fingerprint": F.fingerprint_filter,
        "pattern_replace": F.pattern_replace_filter,
        "predicate_token_filter": F.predicate_token_filter,
        "flatten_graph": F.flatten_graph,
        "scandinavian_folding": F.scandinavian_folding,
        "scandinavian_normalization": F.scandinavian_normalization,
        "german_normalization": F.german_normalization,
        "arabic_normalization": F.arabic_normalization,
        # no hyphenation-pattern XML ships in this sandbox: the hyphenation
        # decompounder degrades to the dictionary subterm matcher
        # (HyphenationCompoundWordTokenFilter's word-list fallback)
        "hyphenation_decompounder": F.dictionary_decompounder,
        "multiplexer": _multiplexer, "condition": _condition,
        # analysis-phonetic plugin (PhoneticTokenFilterFactory)
        "phonetic": _phonetic,
        # analysis-icu plugin (AnalysisICUPlugin.getTokenFilters):
        # folding / normalizer / transform / collation on unicodedata
        "icu_folding": _icu_folding,
        "icu_normalizer": _icu_normalizer,
        "icu_transform": _icu_transform,
        "icu_collation": _icu_collation,
        # round-3 batch 3: remaining CommonAnalysisPlugin.java:226-335 rows
        "arabic_stem": F.arabic_stem, "brazilian_stem": F.brazilian_stem,
        "czech_stem": F.czech_stem, "dutch_stem": F.dutch_stem,
        "french_stem": F.french_stem, "german_stem": F.german_stem,
        "russian_stem": F.russian_stem, "cjk_bigram": F.cjk_bigram,
        "persian_normalization": F.persian_normalization,
        "serbian_normalization": F.serbian_normalization,
        "hindi_normalization": F.hindi_normalization,
        "bengali_normalization": F.bengali_normalization,
        "indic_normalization": F.indic_normalization,
        # graph-synonym output flattened to same-position injection (the
        # index-side contract of this engine; query-time multi-token graph
        # handling lives in analysis/synonyms.py)
        "synonym_graph": F.synonym,
    }
    return _REGISTRY_CACHE


class CustomChainAnalyzer(Analyzer):
    """Full custom-analyzer assembly: char_filter chain → RAW tokenizer →
    named token-filter chain (AnalysisRegistry custom analyzer; the filters
    own lowercasing/stopwords/stemming — 'lowercase' must be listed
    explicitly, as in the reference). Keyword-protection markers from
    keyword_marker / stemmer_override are stripped at the end of the chain.

    Tokenizer: a registry name from tokenizers_extra.TOKENIZER_REGISTRY
    (standard/whitespace/keyword/letter/lowercase/classic/simple_pattern/
    simple_pattern_split/pattern/char_group/ngram/edge_ngram/path_hierarchy/
    uax_url_email/thai — the SURVEY §2.3 getTokenizers list), or a
    ``(name, params)`` pair for parameterized ones."""

    name = "custom_chain"

    def __init__(self, tokenizer: str, char_filters, filters):
        from elasticsearch_ray.analysis.char_filters import compile_chain

        self.chain = compile_chain(char_filters or [])
        self.tokenizer = tokenizer
        reg = _filter_registry()
        compiled = []
        for f in filters or []:
            if isinstance(f, str):
                name, params = f, {}
            else:
                name, params = f[0], (f[1] if len(f) > 1 else {})
            fn = reg.get(name)
            if fn is None:
                raise ValueError(f"unknown token filter {name!r}; known: {sorted(reg)}")
            # JSON round-trips set-ish params as lists; refreeze the ones
            # used for membership tests
            params = {k: (frozenset(v) if k in ("stopwords", "keywords", "common_words")
                          and isinstance(v, (list, tuple)) else v)
                      for k, v in dict(params).items()}
            compiled.append((fn, params))
        self.filters = compiled

    def _raw_tokens(self, text: str) -> list[str]:
        from elasticsearch_ray.analysis.tokenizers_extra import TOKENIZER_REGISTRY

        tk = self.tokenizer
        name, params = (tk, {}) if isinstance(tk, str) else (tk[0], dict(tk[1]))
        fn = TOKENIZER_REGISTRY.get(name)
        if fn is None:
            raise ValueError(
                f"unknown tokenizer {name!r}; known: {sorted(TOKENIZER_REGISTRY)}")
        return fn(text, **params)

    def __call__(self, text: str) -> Analysis:
        from elasticsearch_ray.analysis import filters as F

        terms = self._raw_tokens(self.chain(text))
        pos = list(range(len(terms)))
        for fn, params in self.filters:
            terms, pos = fn(terms, pos, **params)
        return F.finish_keywords(terms, pos)

    def explain(self, text: str) -> dict:
        """_analyze ``explain: true`` (TransportAnalyzeAction detail
        response): the charfiltered text, the tokenizer's output, then
        the token stream AFTER EVERY filter in chain order."""
        from elasticsearch_ray.analysis import filters as F

        filtered_text = self.chain(text)
        terms = self._raw_tokens(filtered_text)
        pos = list(range(len(terms)))
        steps = []
        for fn, params in self.filters:
            terms, pos = fn(terms, pos, **params)
            ft, fp = F.finish_keywords(list(terms), list(pos))
            steps.append({"name": fn.__name__,
                          "tokens": [{"token": t, "position": int(p)}
                                     for t, p in zip(ft, fp)]})
        tk = self.tokenizer
        tok_name = tk if isinstance(tk, str) else tk[0]
        raw = self._raw_tokens(filtered_text)
        return {
            "charfiltered_text": filtered_text,
            "tokenizer": {"name": tok_name,
                          "tokens": [{"token": t, "position": i}
                                     for i, t in enumerate(raw)]},
            "tokenfilters": steps,
        }


def get_analyzer(name: str) -> Analyzer:
    if name.startswith("custom:"):
        # parametric custom analyzer: the NAME carries the config, so any
        # worker/actor process can resolve it locally with no registry setup
        # (names travel through spec dicts and actor constructors as strings)
        import json as _json

        cfg = _json.loads(name[len("custom:"):])
        if cfg.get("filters") or cfg.get("tokenizer"):
            return CustomChainAnalyzer(cfg.get("tokenizer", cfg.get("base", "standard")),
                                       cfg.get("char_filters", []),
                                       cfg.get("filters", []))
        base = get_analyzer(cfg.get("base", "standard"))
        return CharFilteredAnalyzer(base, cfg.get("char_filters", []))
    if name not in _REGISTRY:
        # language chains + extra tokenizers register on first use
        import elasticsearch_ray.analysis.annotated_text  # noqa: F401
        import elasticsearch_ray.analysis.lang  # noqa: F401
        import elasticsearch_ray.analysis.lang2  # noqa: F401
        import elasticsearch_ray.analysis.lang3  # noqa: F401
        import elasticsearch_ray.analysis.lang_plugins  # noqa: F401
        import elasticsearch_ray.analysis.tokenizers_extra  # noqa: F401
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; known: {sorted(_REGISTRY)}") from None


def analyze_batch(analyzer: Analyzer, texts) -> tuple[list, list, np.ndarray]:
    """Analyze a column of texts → (terms_per_doc, positions_per_doc, doclens).

    doclen counts ALL emitted positions' source tokens? No — it is the number
    of indexed terms (Lucene's field length = number of tokens that made it
    past the filters; stopword-removed tokens do NOT count toward the norm).
    """
    terms_all, pos_all, lens = [], [], np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        terms, pos = analyzer(t) if t else ([], [])
        terms_all.append(terms)
        pos_all.append(pos)
        lens[i] = len(terms)
    return terms_all, pos_all, lens


def get_normalizer(spec):
    """Keyword-field normalizers (``AnalysisRegistry`` normalizers +
    ``CustomNormalizerProvider``): a char_filter + token-filter chain
    with NO tokenizer — the whole value flows through as one token.
    ``spec`` is the built-in name ``"lowercase"`` or a dict
    ``{"char_filter": [...], "filter": [...]}`` (the reference rejects a
    ``tokenizer`` key; so do we). Returns value -> normalized value."""
    if spec == "lowercase":
        chain = CustomChainAnalyzer("keyword", [], ["lowercase"])
    elif isinstance(spec, dict):
        if "tokenizer" in spec:
            raise ValueError(
                "custom normalizer [..] cannot configure a tokenizer")
        chain = CustomChainAnalyzer("keyword", spec.get("char_filter", []),
                                    spec.get("filter", []))
    else:
        raise ValueError(f"unknown normalizer {spec!r}")

    def normalize(value: str) -> str:
        toks, _pos = chain(value if value is not None else "")
        if len(toks) > 1:
            # the reference only admits normalizer-compatible filters;
            # one that SPLITS the value would silently truncate here
            raise ValueError(
                "normalizer produced multiple tokens — only filters "
                "that keep the value whole are normalizer-compatible")
        return toks[0] if toks else ""

    return normalize
