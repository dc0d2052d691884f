"""Non-standard tokenizers/analyzers (CommonAnalysisPlugin.java:349-402
registrations): uax_url_email, pattern, char_group, ngram (tokenizer),
path_hierarchy. Each registers as an analyzer-shaped callable
(text → (tokens, positions)); custom configs go through ``register`` with a
configured factory."""

from __future__ import annotations

import re

from elasticsearch_ray.analysis.analyzers import Analysis, Analyzer, register
from elasticsearch_ray.analysis.tokenizer import findall_tokens

# URL: scheme://non-space  |  email: local@dom.tld (pragmatic patterns; the
# reference uses the UAX#29 URL/EMAIL grammar from ICU)
_URL_EMAIL_RE = re.compile(
    r"[a-zA-Z][a-zA-Z0-9+.-]*://[^\s<>\"']+"
    r"|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
)


class UaxUrlEmailAnalyzer(Analyzer):
    """``uax_url_email`` tokenizer + lowercase: URLs and emails survive as
    single tokens; everything between them tokenizes standard."""

    name = "uax_url_email"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        last = 0
        for m in _URL_EMAIL_RE.finditer(text):
            terms.extend(t.lower() for t in findall_tokens(text[last : m.start()]))
            terms.append(m.group(0).lower())
            last = m.end()
        terms.extend(t.lower() for t in findall_tokens(text[last:]))
        return terms, list(range(len(terms)))


class PatternAnalyzer(Analyzer):
    """``pattern`` analyzer: split on a regex (default \\W+), lowercase
    (PatternAnalyzerProvider defaults)."""

    name = "pattern"

    def __init__(self, pattern: str = r"\W+", lowercase: bool = True):
        self.rx = re.compile(pattern)
        self.lower = lowercase

    def __call__(self, text: str) -> Analysis:
        terms = [t for t in self.rx.split(text) if t]
        if self.lower:
            terms = [t.lower() for t in terms]
        return terms, list(range(len(terms)))


class CharGroupAnalyzer(Analyzer):
    """``char_group`` tokenizer: split on a configured character set
    (default: whitespace + punctuation-ish)."""

    name = "char_group"

    def __init__(self, tokenize_on_chars: str = " \t\n\r.,;:!?()[]{}\"'-/"):
        self.rx = re.compile("[" + re.escape(tokenize_on_chars) + "]+")

    def __call__(self, text: str) -> Analysis:
        terms = [t for t in self.rx.split(text) if t]
        return terms, list(range(len(terms)))


class NgramTokenizerAnalyzer(Analyzer):
    """``ngram`` TOKENIZER (distinct from the ngram token filter): sliding
    character n-grams of the lowercased input, min..max per start offset."""

    name = "ngram_tokenizer"

    def __init__(self, min_gram: int = 2, max_gram: int = 3):
        self.lo, self.hi = min_gram, max_gram

    def __call__(self, text: str) -> Analysis:
        t = text.lower()
        terms: list[str] = []
        positions: list[int] = []
        for i in range(len(t)):
            for n in range(self.lo, self.hi + 1):
                if i + n <= len(t):
                    terms.append(t[i : i + n])
                    positions.append(i)
        return terms, positions


class PathHierarchyAnalyzer(Analyzer):
    """``path_hierarchy`` tokenizer: /a/b/c → /a, /a/b, /a/b/c
    (all prefixes, same position — PathHierarchyTokenizer)."""

    name = "path_hierarchy"

    def __init__(self, delimiter: str = "/"):
        self.delim = delimiter

    def __call__(self, text: str) -> Analysis:
        if not text:
            return [], []
        parts = text.split(self.delim)
        lead = ""
        if parts and parts[0] == "":
            lead = self.delim
            parts = parts[1:]
        terms: list[str] = []
        acc = None
        for p in parts:
            acc = p if acc is None else acc + self.delim + p
            terms.append(lead + acc)
        return terms, [0] * len(terms)


register("uax_url_email", UaxUrlEmailAnalyzer)
register("pattern", PatternAnalyzer)
register("char_group", CharGroupAnalyzer)
register("ngram_tokenizer", NgramTokenizerAnalyzer)
register("path_hierarchy", PathHierarchyAnalyzer)


# ------- raw-tokenizer registry (SURVEY §2.3 getTokenizers list) — the
# building blocks CustomChainAnalyzer resolves by name: text → list[str].

def _tok_simple_pattern(text, pattern="[a-zA-Z0-9]+"):
    """``simple_pattern`` (SimplePatternTokenizerFactory): regex MATCHES
    become the tokens."""
    return re.findall(pattern, text)


def _tok_simple_pattern_split(text, pattern=r"\s+"):
    """``simple_pattern_split``: regex matches are the SEPARATORS."""
    return [t for t in re.split(pattern, text) if t]


_CLASSIC_RX = re.compile(
    r"[a-zA-Z0-9]+(?:\.[a-zA-Z0-9]+)*@[a-zA-Z0-9]+(?:[.-][a-zA-Z0-9]+)*"  # email
    r"|[a-zA-Z0-9]+(?:\.[a-zA-Z0-9]+)+"   # host / dotted acronym (U.S.A, ex.com)
    r"|[a-zA-Z]+(?:'[a-zA-Z]+)?"          # word, possessive kept
    r"|[0-9]+(?:[.,][0-9]+)*"             # numbers with inner punctuation
)


def _tok_classic(text):
    """``classic`` (ClassicTokenizer — the pre-UAX#29 StandardTokenizer
    grammar): emails and dotted hosts stay ONE token, words keep inner
    apostrophes, numbers keep inner . and , (documented subset of the
    JFlex grammar)."""
    return _CLASSIC_RX.findall(text)


def _tok_letter(text):
    from elasticsearch_ray.analysis.analyzers import SimpleAnalyzer

    return SimpleAnalyzer._re.findall(text)


def _tok_lowercase(text):
    """``lowercase`` tokenizer = letter tokenizer + lowercase in one step."""
    return [t.lower() for t in _tok_letter(text)]


def _tok_edge_ngram(text, min_gram=1, max_gram=2):
    """``edge_ngram`` TOKENIZER: leading grams of each maximal alnum run
    (EdgeNGramTokenizer with the default letter/digit token chars). Raw
    tokenizers never case-fold — lowercase is a filter."""
    out = []
    for m in re.finditer(r"[a-zA-Z0-9]+", text):
        t = m.group()
        for n in range(min_gram, min(max_gram, len(t)) + 1):
            out.append(t[:n])
    return out


def _tok_thai(text):
    """``thai`` tokenizer: Thai runs → overlapping character bigrams, other
    scripts UAX#29 and CASE-PRESERVED (raw tokenizers never case-fold; the
    thai ANALYZER adds lowercase+stop on top). Dictionary-free fallback —
    no ICU/dictionary in this environment."""
    from elasticsearch_ray.analysis.lang3 import _is_thai
    from elasticsearch_ray.analysis.tokenizer import tokenize

    out = []
    for tok in tokenize(text):
        if len(tok) > 1 and all(_is_thai(ch) for ch in tok):
            out.extend(tok[i:i + 2] for i in range(len(tok) - 1))
        else:
            out.append(tok)
    return out


def _tok_whitespace(text):
    return text.split()


def _tok_keyword(text):
    return [text] if text else []


def _tok_standard(text):
    from elasticsearch_ray.analysis.tokenizer import tokenize

    return tokenize(text)


def _tok_uax_url_email(text):
    """Raw uax_url_email: URLs/emails one token, rest standard — case
    preserved (the ANALYZER of the same name adds lowercase)."""
    from elasticsearch_ray.analysis.tokenizer import tokenize as _t

    out = []
    last = 0
    for m in _URL_EMAIL_RE.finditer(text):
        out.extend(_t(text[last:m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.extend(_t(text[last:]))
    return out


def _tok_pattern(text, pattern=r"\W+"):
    return [t for t in re.split(pattern, text) if t]


def _tok_char_group(text, tokenize_on_chars=" \t\n\r.,;:!?()[]{}\"'-/"):
    rx = re.compile("[" + re.escape(tokenize_on_chars) + "]+")
    return [t for t in rx.split(text) if t]


def _tok_ngram(text, min_gram=2, max_gram=3):
    # raw tokenizer: case preserved (NGramTokenizer does not fold)
    return [text[i:i + n] for i in range(len(text))
            for n in range(min_gram, max_gram + 1) if i + n <= len(text)]


def _tok_path_hierarchy(text, delimiter="/"):
    terms, _ = PathHierarchyAnalyzer(delimiter)(text)
    return terms


TOKENIZER_REGISTRY = {
    "standard": _tok_standard,
    "whitespace": _tok_whitespace,
    "keyword": _tok_keyword,
    "letter": _tok_letter,
    "lowercase": _tok_lowercase,
    "classic": _tok_classic,
    "simple_pattern": _tok_simple_pattern,
    "simple_pattern_split": _tok_simple_pattern_split,
    "pattern": _tok_pattern,
    "char_group": _tok_char_group,
    "ngram": _tok_ngram,
    "edge_ngram": _tok_edge_ngram,
    "path_hierarchy": _tok_path_hierarchy,
    "uax_url_email": _tok_uax_url_email,
    "thai": _tok_thai,
    # analysis-icu plugin: ICU's word-break engine is UAX#29 (+ CJK
    # dictionaries — documented partial, analysis/icu.py docstring), so
    # icu_tokenizer maps to the real UAX#29 standard tokenizer
    "icu_tokenizer": _tok_standard,
}
