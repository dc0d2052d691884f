"""Token filters — the ``CommonAnalysisPlugin.java:226-335`` registry subset
that applies to our corpus surface. Each filter maps (terms, positions) →
(terms, positions); n-gram producing filters emit same-position grams like
Lucene (graph filters out of scope)."""

from __future__ import annotations

import unicodedata

import numpy as np

from elasticsearch_ray.analysis.porter import stem as porter_stem

Analysis = tuple[list[str], list[int]]


def lowercase(terms, pos) -> Analysis:
    return [t.lower() for t in terms], pos


def uppercase(terms, pos) -> Analysis:
    return [t.upper() for t in terms], pos


def asciifolding(terms, pos) -> Analysis:
    """Fold diacritics to ASCII (ASCIIFoldingFilter: NFKD + drop combining)."""
    out = []
    for t in terms:
        folded = unicodedata.normalize("NFKD", t).encode("ascii", "ignore").decode("ascii")
        out.append(folded or t)
    return out, pos


def stop_filter(terms, pos, stopwords) -> Analysis:
    """StopFilter — removes terms, keeps position gaps."""
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        if t not in stopwords:
            o_t.append(t)
            o_p.append(p)
    return o_t, o_p


def porter(terms, pos) -> Analysis:
    return [porter_stem(t) for t in terms], pos


def english_possessive(terms, pos) -> Analysis:
    """EnglishPossessiveFilter: strip trailing 's."""
    return [t[:-2] if t.endswith("'s") else t for t in terms], pos


def length_filter(terms, pos, min_len=0, max_len=1 << 30) -> Analysis:
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        if min_len <= len(t) <= max_len:
            o_t.append(t)
            o_p.append(p)
    return o_t, o_p


def truncate(terms, pos, length=10) -> Analysis:
    return [t[:length] for t in terms], pos


def unique_filter(terms, pos) -> Analysis:
    """RemoveDuplicatesTokenFilter-ish: first occurrence wins."""
    seen = set()
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        if t not in seen:
            seen.add(t)
            o_t.append(t)
            o_p.append(p)
    return o_t, o_p


def reverse_filter(terms, pos) -> Analysis:
    return [t[::-1] for t in terms], pos


def ngram(terms, pos, min_gram=1, max_gram=2) -> Analysis:
    """NGramTokenFilter: all [min,max]-grams of each token, token position."""
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        for n in range(min_gram, max_gram + 1):
            for i in range(0, len(t) - n + 1):
                o_t.append(t[i : i + n])
                o_p.append(p)
    return o_t, o_p


def edge_ngram(terms, pos, min_gram=1, max_gram=2) -> Analysis:
    """EdgeNGramTokenFilter: leading [min,max]-grams."""
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        for n in range(min_gram, min(max_gram, len(t)) + 1):
            o_t.append(t[:n])
            o_p.append(p)
    return o_t, o_p


def synonym(terms, pos, synonyms: dict) -> Analysis:
    """SynonymFilter (non-graph): map token → extra tokens emitted at the
    SAME position (so phrases keep working); synonyms = {"fast": ["quick"]}."""
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        o_t.append(t)
        o_p.append(p)
        for s in synonyms.get(t, ()):
            o_t.append(s)
            o_p.append(p)
    return o_t, o_p


def min_hash(terms, pos, num_hashes: int = 16) -> Analysis:
    """min_hash token filter (CommonAnalysisPlugin.java:284): replaces the
    token stream with its MinHash signature tokens — indexing these gives
    LSH-style near-dup lookup straight through the inverted index."""
    import hashlib

    if not terms:
        return [], []
    hs = np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in set(terms)],
        dtype=np.uint64,
    )
    out = []
    for i in range(num_hashes):
        mixed = hs ^ np.uint64(0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF)
        out.append(f"mh{i}_{int(mixed.min()):016x}")
    return out, list(range(len(out)))


def shingle(terms, pos, min_size=2, max_size=2, sep=" ") -> Analysis:
    """ShingleFilter: word n-grams (unigrams NOT emitted here; output_unigrams
    handled by callers that want them)."""
    o_t, o_p = [], []
    for n in range(min_size, max_size + 1):
        for i in range(0, len(terms) - n + 1):
            o_t.append(sep.join(terms[i : i + n]))
            o_p.append(pos[i])
    order = sorted(range(len(o_p)), key=lambda i: (o_p[i], o_t[i]))
    return [o_t[i] for i in order], [o_p[i] for i in order]
