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


# ---------------------------------------------------------------- round 3 —
# the highest-traffic absentees from CommonAnalysisPlugin.java:226-335:
# stemmer/stemmer_override, keyword_marker, elision (standalone), cjk_width,
# word_delimiter_graph, kstem, common_grams, pattern_capture, decompounder,
# decimal_digit, apostrophe, limit, trim.

_KEYWORD_MARK = "\x00kw\x00"  # internal prefix marking protected tokens


def keyword_marker(terms, pos, keywords) -> Analysis:
    """KeywordMarkerFilter: protect listed terms from downstream stemmers
    (internal marker stripped by finish_keywords / end of chain)."""
    kws = frozenset(keywords)
    return [(_KEYWORD_MARK + t) if t in kws else t for t in terms], pos


def finish_keywords(terms, pos) -> Analysis:
    """Strip keyword-protection markers (appended automatically at the end
    of a custom chain)."""
    n = len(_KEYWORD_MARK)
    return [t[n:] if t.startswith(_KEYWORD_MARK) else t for t in terms], pos


def _stemmer_registry() -> dict:
    from elasticsearch_ray.analysis import lang as L
    from elasticsearch_ray.analysis import stemmers as S
    from elasticsearch_ray.analysis.porter import stem as porter_stem
    from elasticsearch_ray.analysis.snowball_ru import stem as ru_snowball

    return {
        "porter": porter_stem, "english": porter_stem,
        "light_french": L.french_light_stem, "french": L.french_light_stem,
        "light_german": L.german_light_stem, "german": L.german_light_stem,
        "light_spanish": L.spanish_light_stem, "spanish": L.spanish_light_stem,
        "russian": ru_snowball, "light_russian": L.russian_light_stem,
        "light_italian": S.italian_light_stem, "italian": S.italian_light_stem,
        "light_portuguese": S.portuguese_light_stem,
        "portuguese": S.portuguese_light_stem,
        "dutch": S.dutch_light_stem, "catalan": S.catalan_light_stem,
        "romanian": S.romanian_light_stem,
        "light_norwegian": S.norwegian_light_stem,
        "norwegian": S.norwegian_light_stem,
        "kstem": S.kstem,
    }


def stemmer(terms, pos, language="english") -> Analysis:
    """``stemmer`` token filter (StemmerTokenFilterFactory): named-language
    dispatch over the registered stem functions; keyword-marked tokens pass
    through untouched."""
    fn = _stemmer_registry().get(language)
    if fn is None:
        raise ValueError(f"unknown stemmer language {language!r}")
    return [t if t.startswith(_KEYWORD_MARK) else fn(t) for t in terms], pos


def kstem_filter(terms, pos) -> Analysis:
    from elasticsearch_ray.analysis.stemmers import kstem

    return [t if t.startswith(_KEYWORD_MARK) else kstem(t) for t in terms], pos


def stemmer_override(terms, pos, rules) -> Analysis:
    """StemmerOverrideFilter: dictionary lookup that both REWRITES the token
    and PROTECTS it from later stemmers (rules: {"mice": "mouse"} or
    Solr-style "mice => mouse" lines)."""
    if not isinstance(rules, dict):
        parsed = {}
        for line in rules:
            lhs, _, rhs = line.partition("=>")
            for k in lhs.split(","):
                parsed[k.strip()] = rhs.strip()
        rules = parsed
    out = []
    for t in terms:
        hit = rules.get(t)
        out.append((_KEYWORD_MARK + hit) if hit is not None else t)
    return out, pos


def elision_filter(terms, pos, articles=None) -> Analysis:
    """Standalone ``elision`` filter (ElisionTokenFilterFactory): strip a
    leading article + apostrophe; default article set = French."""
    from elasticsearch_ray.analysis.lang import FRENCH_ARTICLES, elision

    arts = frozenset(articles) if articles else FRENCH_ARTICLES
    return [elision(t, arts) for t in terms], pos


# fullwidth ASCII → halfwidth (FF01-FF5E → 21-7E), ideographic space → space
_CJK_WIDTH_ASCII = {c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)}
_CJK_WIDTH_ASCII[0x3000] = 0x20
# halfwidth katakana → fullwidth (U+FF66-FF9D base forms)
_HW_KATA = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_FW_KATA = "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
_CJK_WIDTH_KATA = {ord(h): ord(f) for h, f in zip(_HW_KATA, _FW_KATA)}
# voiced / semi-voiced sound marks combine with the preceding kana
_DAKUTEN = {"カ": "ガ", "キ": "ギ", "ク": "グ", "ケ": "ゲ", "コ": "ゴ",
            "サ": "ザ", "シ": "ジ", "ス": "ズ", "セ": "ゼ", "ソ": "ゾ",
            "タ": "ダ", "チ": "ヂ", "ツ": "ヅ", "テ": "デ", "ト": "ド",
            "ハ": "バ", "ヒ": "ビ", "フ": "ブ", "ヘ": "ベ", "ホ": "ボ",
            "ウ": "ヴ"}
_HANDAKUTEN = {"ハ": "パ", "ヒ": "ピ", "フ": "プ", "ヘ": "ペ", "ホ": "ポ"}
_WIDTH_TABLE = {**_CJK_WIDTH_ASCII, **_CJK_WIDTH_KATA}


def cjk_width(terms, pos) -> Analysis:
    """CJKWidthFilter: fold fullwidth ASCII to halfwidth and halfwidth
    katakana to fullwidth, composing ﾞ/ﾟ voicing marks (ﾊﾞ → バ)."""
    out = []
    for t in terms:
        t = t.translate(_WIDTH_TABLE)
        if "ﾞ" in t or "ﾟ" in t:
            chars: list[str] = []
            for ch in t:
                if ch == "ﾞ" and chars and chars[-1] in _DAKUTEN:
                    chars[-1] = _DAKUTEN[chars[-1]]
                elif ch == "ﾟ" and chars and chars[-1] in _HANDAKUTEN:
                    chars[-1] = _HANDAKUTEN[chars[-1]]
                else:
                    chars.append(ch)
            t = "".join(chars)
        out.append(t)
    return out, pos


import re as _re

_WDG_SPLIT = _re.compile(
    r"[^0-9A-Za-zÀ-ɏͰ-῿]+"  # non-alphanumeric runs
)
_WDG_PARTS = _re.compile(
    # case transitions + alpha/digit boundaries inside a clean subword
    r"[A-ZÀ-Þ]+(?![a-zß-ÿ])"   # UPPER run not followed by lower
    r"|[A-ZÀ-Þ]?[a-zß-ɏͰ-῿]+"  # Capitalized/lower run
    r"|[0-9]+"
)


def word_delimiter_graph(terms, pos, generate_word_parts=True,
                         generate_number_parts=True, catenate_words=False,
                         catenate_numbers=False, catenate_all=False,
                         preserve_original=False,
                         stem_english_possessive=True) -> Analysis:
    """WordDelimiterGraphFilter, flattened to same-position emission (our
    chains never consume graphs downstream, matching how the reference
    flattens at index time): split on intra-token non-alphanumerics, case
    transitions and letter↔digit boundaries; optionally re-catenate runs and
    keep the original. "PowerShot500-WiFi" → power, shot, 500, wi, fi (+
    catenations when enabled)."""
    o_t: list[str] = []
    o_p: list[int] = []
    for t, p in zip(terms, pos):
        if stem_english_possessive and t.lower().endswith("'s"):
            t = t[:-2]
        subwords = []
        for piece in _WDG_SPLIT.split(t):
            if not piece:
                continue
            subwords.extend(_WDG_PARTS.findall(piece))
        if not subwords:
            continue
        emitted = []
        if preserve_original:
            emitted.append(t)
        single = len(subwords) == 1 and subwords[0] == t
        for sw in subwords:
            is_num = sw[0].isdigit()
            if (generate_number_parts if is_num else generate_word_parts) or single:
                emitted.append(sw)
        if len(subwords) > 1:
            if catenate_all:
                emitted.append("".join(subwords))
            else:
                if catenate_words:
                    words = [s for s in subwords if not s[0].isdigit()]
                    if len(words) > 1:
                        emitted.append("".join(words))
                if catenate_numbers:
                    nums = [s for s in subwords if s[0].isdigit()]
                    if len(nums) > 1:
                        emitted.append("".join(nums))
        seen = set()
        for e in emitted:
            low = e.lower()
            if low not in seen:
                seen.add(low)
                o_t.append(e)
                o_p.append(p)
    return o_t, o_p


def common_grams(terms, pos, common_words, query_mode=False) -> Analysis:
    """CommonGramsFilter: emit word+common / common+word bigrams alongside
    (index mode) or instead of (query mode) the unigrams, so phrases over
    stopword-dense text stay fast. Bigram joins with '_' like the reference."""
    common = frozenset(common_words)
    o_t: list[str] = []
    o_p: list[int] = []
    n = len(terms)
    for i, (t, p) in enumerate(zip(terms, pos)):
        gram = None
        if i + 1 < n and pos[i + 1] == p + 1 and (t in common or terms[i + 1] in common):
            gram = f"{t}_{terms[i + 1]}"
        if not query_mode or gram is None:
            o_t.append(t)
            o_p.append(p)
        if gram is not None:
            o_t.append(gram)
            o_p.append(p)
    return o_t, o_p


def pattern_capture(terms, pos, patterns, preserve_original=True) -> Analysis:
    """PatternCaptureGroupTokenFilter: emit every capture group of every
    pattern as a same-position token."""
    pats = [_re.compile(p) for p in patterns]
    o_t: list[str] = []
    o_p: list[int] = []
    for t, p in zip(terms, pos):
        emitted = [t] if preserve_original else []
        for pat in pats:
            for m in pat.finditer(t):
                for g in m.groups() or ():
                    if g:
                        emitted.append(g)
        if not emitted:
            emitted = [t]
        seen = set()
        for e in emitted:
            if e not in seen:
                seen.add(e)
                o_t.append(e)
                o_p.append(p)
    return o_t, o_p


def dictionary_decompounder(terms, pos, word_list, min_word_size=5,
                            min_subword_size=2, max_subword_size=15,
                            only_longest_match=False) -> Analysis:
    """DictionaryCompoundWordTokenFilter: for each token ≥ min_word_size,
    emit every dictionary word found as a substring (same position, original
    kept first) — the reference's brute-force subword scan."""
    words = [w.lower() for w in word_list
             if min_subword_size <= len(w) <= max_subword_size]
    o_t: list[str] = []
    o_p: list[int] = []
    for t, p in zip(terms, pos):
        o_t.append(t)
        o_p.append(p)
        if len(t) < min_word_size:
            continue
        low = t.lower()
        found = [w for w in words if w in low and w != low]
        if only_longest_match and found:
            found = [max(found, key=len)]
        for w in found:
            o_t.append(w)
            o_p.append(p)
    return o_t, o_p


def decimal_digit(terms, pos) -> Analysis:
    """DecimalDigitFilter: fold any Unicode decimal digit to 0-9."""
    import unicodedata

    def fold(t: str) -> str:
        if t.isascii():
            return t
        return "".join(str(unicodedata.digit(c)) if c.isdigit() and not c.isascii()
                       else c for c in t)

    return [fold(t) for t in terms], pos


def apostrophe_filter(terms, pos) -> Analysis:
    """ApostropheFilter (Turkish): strip the apostrophe and everything after
    it (İstanbul'da → İstanbul)."""
    out = []
    for t in terms:
        for apo in ("'", "’"):
            i = t.find(apo)
            if i >= 0:
                t = t[:i]
                break
        out.append(t)
    return [t for t in out if t], [p for t, p in zip(out, pos) if t]


def limit_count(terms, pos, max_token_count=1) -> Analysis:
    """LimitTokenCountFilter."""
    return terms[:max_token_count], pos[:max_token_count]


def trim_filter(terms, pos) -> Analysis:
    """TrimFilter."""
    return [t.strip() for t in terms], pos


# ---------------------------------------------------------------- round 3
# batch 2 — the rest of the CommonAnalysisPlugin.java:226-335 named surface.


def keep_filter(terms, pos, keep_words) -> Analysis:
    """``keep`` (KeepWordFilter): pass only listed words."""
    kws = frozenset(keep_words)
    kept = [(t, p) for t, p in zip(terms, pos) if t in kws]
    return [t for t, _ in kept], [p for _, p in kept]


def _token_type(t: str) -> str:
    """Token type the way the standard tokenizer would tag it — the subset
    our flat (term, pos) stream can reconstruct (no per-token type attribute
    is stored): all-digit runs are <NUM>, everything else <ALPHANUM>."""
    return "<NUM>" if t and all(c.isdigit() or c in ".," for c in t) and any(
        c.isdigit() for c in t) else "<ALPHANUM>"


def keep_types(terms, pos, types, mode="include") -> Analysis:
    """``keep_types`` (TokenTypeFilter) over reconstructed <NUM>/<ALPHANUM>
    types (documented simplification: the stream carries no type attribute,
    so <EMAIL>/<URL> classes from uax_url_email are not distinguishable
    here)."""
    tset = frozenset(types)
    want = (lambda t: _token_type(t) in tset) if mode == "include" else (
        lambda t: _token_type(t) not in tset)
    kept = [(t, p) for t, p in zip(terms, pos) if want(t)]
    return [t for t, _ in kept], [p for _, p in kept]


def keyword_repeat(terms, pos) -> Analysis:
    """KeywordRepeatFilter: emit each token twice at the same position, the
    first copy keyword-protected so downstream stemmers leave it alone; pair
    with ``remove_duplicates`` to drop the copy when stemming was a no-op."""
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        if t.startswith(_KEYWORD_MARK):
            o_t.append(t)
            o_p.append(p)
            continue
        o_t.append(_KEYWORD_MARK + t)
        o_p.append(p)
        o_t.append(t)
        o_p.append(p)
    return o_t, o_p


def remove_duplicates(terms, pos) -> Analysis:
    """RemoveDuplicatesTokenFilter: drop tokens equal (ignoring the internal
    keyword-protection marker) to an earlier token at the same position."""
    n = len(_KEYWORD_MARK)
    seen: set = set()
    o_t, o_p = [], []
    for t, p in zip(terms, pos):
        bare = t[n:] if t.startswith(_KEYWORD_MARK) else t
        if (p, bare) in seen:
            continue
        seen.add((p, bare))
        o_t.append(t)
        o_p.append(p)
    return o_t, o_p


def delimited_payload(terms, pos, delimiter="|") -> Analysis:
    """``delimited_payload`` (DelimitedPayloadTokenFilter): strip the
    ``token|payload`` suffix (payloads themselves are not indexed — the
    postings format stores no payload stream, same visible effect)."""
    return [t.split(delimiter, 1)[0] for t in terms], pos


def classic_filter(terms, pos) -> Analysis:
    """ClassicFilter: strip trailing possessive 's and dots from acronyms
    (A.B.C. → ABC)."""
    out = []
    for t in terms:
        if t.endswith("'s") or t.endswith("’s"):
            t = t[:-2]
        if "." in t and all(len(part) <= 1 for part in t.split(".")):
            t = t.replace(".", "")
        out.append(t)
    return out, pos


def snowball_filter(terms, pos, language="English") -> Analysis:
    """``snowball`` filter (SnowballTokenFilterFactory): dispatch into the
    registered stemmer family by language name."""
    return stemmer(terms, pos, language=language.lower())


def fingerprint_filter(terms, pos, max_output_size=255, separator=" ") -> Analysis:
    """``fingerprint`` filter (FingerprintTokenFilter): sort unique terms and
    concatenate into a single token; empty output if over max_output_size."""
    joined = separator.join(sorted(set(terms)))
    if not joined or len(joined) > max_output_size:
        return [], []
    return [joined], [0]


_PATTERN_CACHE: dict = {}


def _compiled(pattern: str):
    rx = _PATTERN_CACHE.get(pattern)
    if rx is None:
        import re

        rx = _PATTERN_CACHE[pattern] = re.compile(pattern)
    return rx


def pattern_replace_filter(terms, pos, pattern, replacement="", all=True) -> Analysis:
    """``pattern_replace`` TOKEN filter (PatternReplaceFilter) — per-token
    regex rewrite; tokens rewritten to empty are kept empty (Lucene keeps
    zero-length tokens here; add a ``length`` filter to drop them)."""
    rx = _compiled(pattern)
    count = 0 if all else 1
    return [rx.sub(replacement, t, count=count) for t in terms], pos


_PREDICATE_CACHE: dict = {}


def predicate_code(script: str):
    """Compile-once cache for the mini-predicate expressions standing in for
    Painless token scripts (``token.term``/``token.position`` analog: the
    names ``term`` and ``position`` plus ``len``)."""
    code = _PREDICATE_CACHE.get(script)
    if code is None:
        code = _PREDICATE_CACHE[script] = compile(script, "<token-predicate>", "eval")
    return code


def predicate_token_filter(terms, pos, script) -> Analysis:
    """``predicate_token_filter`` (ScriptedConditionTokenFilterFactory's
    keep-variant): keep tokens for which the predicate expression holds.
    The script is the documented Painless-subset: an expression over
    ``term``, ``position`` and ``len``."""
    code = predicate_code(script)
    kept = [(t, p) for t, p in zip(terms, pos)
            if eval(code, {"__builtins__": {}}, {"term": t, "position": p, "len": len})]
    return [t for t, _ in kept], [p for _, p in kept]


def flatten_graph(terms, pos) -> Analysis:
    """``flatten_graph``: identity on this stream — multi-token graphs
    (synonym_graph, word_delimiter_graph) are flattened to same-position
    stacked tokens at injection time, which is exactly the FlattenGraphFilter
    output contract for indexing."""
    return terms, pos


# scandinavian folding table (ScandinavianFoldingFilter): å/ä/æ → a, ö/ø → o
_SCANDI_FOLD = str.maketrans({
    "å": "a", "ä": "a", "æ": "a", "Å": "A", "Ä": "A", "Æ": "A",
    "ö": "o", "ø": "o", "Ö": "O", "Ø": "O",
    "ü": "u", "Ü": "U",
})
# normalization variant (ScandinavianNormalizationFilter): interchange the
# national spellings without losing the vowel class: æ→ä? — the Lucene
# normalizer maps ae→æ, oe→ø digraphs and unifies å-family; folding above is
# the aggressive cross-language form.
_SCANDI_NORM_DIGRAPHS = (("aa", "å"), ("ae", "æ"), ("ao", "å"), ("oe", "ø"))


def scandinavian_folding(terms, pos) -> Analysis:
    """ScandinavianFoldingFilter: fold å/ä/æ→a and ö/ø→o (plus ü→u) so the
    Scandinavian spellings cross-match."""
    return [t.translate(_SCANDI_FOLD) for t in terms], pos


def scandinavian_normalization(terms, pos) -> Analysis:
    """ScandinavianNormalizationFilter: unify aa/ae/ao/oe digraphs with the
    single-codepoint å/æ/ø forms."""
    out = []
    for t in terms:
        for dig, ch in _SCANDI_NORM_DIGRAPHS:
            if dig in t:
                t = t.replace(dig, ch)
        out.append(t)
    return out, pos


def german_normalization(terms, pos) -> Analysis:
    """GermanNormalizationFilter as a standalone named filter."""
    from elasticsearch_ray.analysis.lang import german_normalize

    return [german_normalize(t) for t in terms], pos


def arabic_normalization(terms, pos) -> Analysis:
    """ArabicNormalizationFilter as a standalone named filter."""
    from elasticsearch_ray.analysis.lang2 import arabic_normalize

    return [arabic_normalize(t) for t in terms], pos


# -------- round-3 batch 3: remaining CommonAnalysisPlugin named filters
# (language stem/normalization rows whose implementations already exist as
# language-chain components — exposed here under their registry names,
# CommonAnalysisPlugin.java:226-335)

def arabic_stem(terms, pos) -> Analysis:
    """``arabic_stem`` (ArabicStemTokenFilterFactory): the light10 prefix/
    suffix strip shared with the arabic analyzer chain."""
    from elasticsearch_ray.analysis.lang2 import arabic_light_stem

    return [arabic_light_stem(t) for t in terms], pos


def brazilian_stem(terms, pos) -> Analysis:
    """``brazilian_stem``: Portuguese-family plural/gender strip (the
    reference registers an RSLP-derived stemmer; same inflection classes —
    documented simplification shared with the brazilian analyzer)."""
    from elasticsearch_ray.analysis.stemmers import portuguese_light_stem

    return [portuguese_light_stem(t) for t in terms], pos


def czech_stem(terms, pos) -> Analysis:
    from elasticsearch_ray.analysis.lang2 import czech_light_stem

    return [czech_light_stem(t) for t in terms], pos


def dutch_stem(terms, pos) -> Analysis:
    from elasticsearch_ray.analysis.stemmers import dutch_light_stem

    return [dutch_light_stem(t) for t in terms], pos


def french_stem(terms, pos) -> Analysis:
    from elasticsearch_ray.analysis.lang import french_light_stem

    return [french_light_stem(t) for t in terms], pos


def german_stem(terms, pos) -> Analysis:
    """``german_stem`` (GermanStemFilter: normalizes umlauts internally,
    then strips plural/case suffixes — both steps in german_light_stem)."""
    from elasticsearch_ray.analysis.lang import german_light_stem

    return [german_light_stem(t) for t in terms], pos


def russian_stem(terms, pos) -> Analysis:
    """``russian_stem``: the Snowball Russian stemmer (same algorithm the
    reference's RussianStemTokenFilterFactory wraps)."""
    from elasticsearch_ray.analysis.snowball_ru import stem as ru_stem

    return [ru_stem(t) for t in terms], pos


def cjk_bigram(terms, pos, output_unigrams=False) -> Analysis:
    """``cjk_bigram`` (CJKBigramFilter): the standard tokenizer emits Han/
    Hiragana ideographs one token per char; runs of consecutive single-char
    CJK tokens at consecutive positions re-emit as overlapping bigrams
    (isolated ideographs stay unigrams; ``output_unigrams`` keeps both)."""
    from elasticsearch_ray.analysis.lang import _is_cjk

    o_t: list[str] = []
    o_p: list[int] = []

    def flush(buf):
        if not buf:
            return
        if len(buf) == 1:
            o_t.append(buf[0][0])
            o_p.append(buf[0][1])
        else:
            for i in range(len(buf) - 1):
                if output_unigrams:
                    o_t.append(buf[i][0])
                    o_p.append(buf[i][1])
                o_t.append(buf[i][0] + buf[i + 1][0])
                o_p.append(buf[i][1])
            if output_unigrams:
                o_t.append(buf[-1][0])
                o_p.append(buf[-1][1])
        buf.clear()

    run: list[tuple[str, int]] = []
    for t, p in zip(terms, pos):
        if len(t) == 1 and _is_cjk(t) and (not run or p == run[-1][1] + 1):
            run.append((t, p))
        else:
            flush(run)
            if len(t) == 1 and _is_cjk(t):
                run.append((t, p))
            else:
                o_t.append(t)
                o_p.append(p)
    flush(run)
    return o_t, o_p


# Lucene PersianNormalizer rules: Arabic yeh / alef maksura → Farsi yeh,
# Arabic kaf → keheh, heh-with-yeh / heh-goal → heh, drop hamza above.
_FA_NORM = str.maketrans({"ي": "ی", "ى": "ی",
                          "ك": "ک", "ۀ": "ه",
                          "ہ": "ه", "ٔ": None})


def persian_normalization(terms, pos) -> Analysis:
    return [t.translate(_FA_NORM) for t in terms], pos


# Lucene SerbianNormalizationFilter: fold Serbian Cyrillic AND accented
# Latin to "bald" Latin so the two orthographies cross-match.
_SR_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj", "е": "e",
    "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "ћ": "c", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "c",
    "џ": "dz", "ш": "s",
    "š": "s", "đ": "dj", "č": "c", "ć": "c", "ž": "z",
}
_SR_NORM = str.maketrans(_SR_CYR)


def serbian_normalization(terms, pos) -> Analysis:
    return [t.translate(_SR_NORM) for t in terms], pos


# Lucene HindiNormalizer subset: nukta consonants → base consonant, bare
# nukta dropped, chandrabindu → anusvara.
_HI_NORM = str.maketrans({
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "़": None, "ँ": "ं",
})


def hindi_normalization(terms, pos) -> Analysis:
    return [t.translate(_HI_NORM) for t in terms], pos


# Lucene BengaliNormalizer subset: nukta forms → base, bare nukta dropped,
# candrabindu → anusvara.
_BN_NORM = str.maketrans({
    "ড়": "ড", "ঢ়": "ঢ", "য়": "য",
    "়": None, "ঁ": "ং",
})


def bengali_normalization(terms, pos) -> Analysis:
    return [t.translate(_BN_NORM) for t in terms], pos


def indic_normalization(terms, pos) -> Analysis:
    """``indic_normalization`` (IndicNormalizationFilter): canonical
    composition across Indic scripts — NFC plus the Devanagari/Bengali
    nukta tables above (documented subset of Lucene's full script data)."""
    import unicodedata as _ud

    return [_ud.normalize("NFC", t).translate(_HI_NORM).translate(_BN_NORM)
            for t in terms], pos
