"""Language-analysis PLUGIN analyzers — the five dictionary/model-backed
plugins the reference ships outside analysis-common:

- ``smartcn``  (plugins/analysis-smartcn — SmartChineseAnalyzer, HMM
  word segmentation)
- ``kuromoji`` (plugins/analysis-kuromoji — MeCab-dictionary Japanese
  morphological analysis)
- ``nori``     (plugins/analysis-nori — Korean MeCab-ko dictionary)
- ``polish``   (plugins/analysis-stempel — trained Egothor stemming
  tables)
- ``ukrainian``(plugins/analysis-ukrainian — Morfologik dictionary)

None of their statistical models/dictionaries can ship here, so each is
a DOCUMENTED PARTIAL with the same honesty rule as the ``thai``
tokenizer fallback: the chain SHAPE (tokenize → normalize → stop →
stem) is real and tested, the dictionary step falls back to an
algorithmic approximation —

- smartcn: Han runs → overlapping bigrams (the standard pre-dictionary
  CJK strategy, = the cjk analyzer's CJKBigramFilter semantics),
  Latin lowercased, English+Chinese particle stopwords;
- kuromoji: script-run segmentation; Han bigrams; KATAKANA runs keep
  whole with the REAL ``kuromoji_stemmer`` rule (trailing prolonged
  sound mark ー dropped for runs ≥ min_length 4); the public ``ja``
  particle stopword list subset;
- nori: eojeol (whitespace) tokens with the common trailing particle
  (josa) stripped when length > 1 — a rough stand-in for MeCab-ko
  decompounding; Latin lowercased;
- polish: light suffix stripper over the public inflection tables
  (case/plural/adjective/verb endings) standing in for the trained
  Egothor tables;
- ukrainian: light suffix stripper mirroring the russian_light shape
  with Ukrainian endings.

Each registers under the plugin's analyzer name so IndexSpec/analyzer
configs port verbatim.
"""

from __future__ import annotations

import unicodedata

from elasticsearch_ray.analysis.analyzers import (
    Analysis,
    Analyzer,
    register,
)
from elasticsearch_ray.analysis.tokenizer import tokenize

# ---------------------------------------------------------- script tags


def _script(ch: str) -> str:
    cp = ord(ch)
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF \
            or 0xF900 <= cp <= 0xFAFF:
        return "han"
    if 0x3040 <= cp <= 0x309F:
        return "hiragana"
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF:
        return "katakana"
    if 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF \
            or 0x3130 <= cp <= 0x318F:
        return "hangul"
    if ch.isalpha():
        return "latin"
    if ch.isdigit():
        return "digit"
    return "other"


def _script_runs(text: str):
    """Segment into (script, run) pairs — the ICU/kuromoji pre-pass.
    The prolonged sound mark ー continues a katakana run."""
    run: list[str] = []
    cur = None
    for ch in text:
        s = _script(ch)
        if s == "other" and ch == "ー" and cur == "katakana":
            s = "katakana"
        if s == "other":
            if run:
                yield cur, "".join(run)
                run, cur = [], None
            continue
        if s != cur and run:
            yield cur, "".join(run)
            run = []
        cur = s
        run.append(ch)
    if run:
        yield cur, "".join(run)


def _bigrams(s: str) -> list[str]:
    if len(s) == 1:
        return [s]
    return [s[i:i + 2] for i in range(len(s) - 1)]


# -------------------------------------------------------------- smartcn

# SmartChineseAnalyzer stopwords: English set + high-frequency Chinese
# particles/function words (the published stopwords.txt head)
SMARTCN_STOP = frozenset(
    """的 了 和 是 就 都 而 及 與 着 或 一个 没有 我们 你们 他们 它们 这 那
    之 于 在 有 我 他 她 它 也 不 人 与 上 中 下 为 个 所 要
    a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


class SmartcnAnalyzer(Analyzer):
    """analysis-smartcn stand-in: the HMM segmenter falls back to Han
    bigrams (documented partial); Latin lowercased; stopwords real."""

    name = "smartcn"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for tok in tokenize(text):
            t = tok.lower()
            if all(_script(c) == "han" for c in t):
                for g in _bigrams(t):
                    if g not in SMARTCN_STOP:
                        terms.append(g)
                        positions.append(pos)
                    pos += 1
            else:
                if t not in SMARTCN_STOP:
                    terms.append(t)
                    positions.append(pos)
                pos += 1
        return terms, positions


# ------------------------------------------------------------- kuromoji

# JapaneseAnalyzer stoptags analog: particle/auxiliary subset of the
# public ja stopword list
KUROMOJI_STOP = frozenset(
    """の に は を た が で て と し れ さ ある いる も する から な こと
    として い や など なっ ない この ため その あっ よう また もの
    という あり まで られ なる へ か だ これ によって""".split()
)


def kuromoji_stem(term: str, min_length: int = 4) -> str:
    """REAL kuromoji_stemmer rule (JapaneseKatakanaStemFilter): a
    katakana term of length ≥ min_length drops ONE trailing prolonged
    sound mark ー."""
    if len(term) >= min_length and term.endswith("ー") \
            and all(_script(c) == "katakana" for c in term[:-1]):
        return term[:-1]
    return term


class KuromojiAnalyzer(Analyzer):
    """analysis-kuromoji stand-in: script-run segmentation; Han bigrams
    for the dictionary step (documented partial); katakana runs kept
    whole + the real prolonged-sound-mark stem rule; hiragana runs kept
    whole and stop-filtered; Latin lowercased."""

    name = "kuromoji"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for script, run in _script_runs(unicodedata.normalize("NFKC",
                                                              text)):
            if script == "han":
                for g in _bigrams(run):
                    terms.append(g)
                    positions.append(pos)
                    pos += 1
            elif script == "katakana":
                t = kuromoji_stem(run)
                terms.append(t)
                positions.append(pos)
                pos += 1
            elif script == "hiragana":
                if run not in KUROMOJI_STOP:
                    terms.append(run)
                    positions.append(pos)
                pos += 1
            else:
                t = run.lower()
                if t not in KUROMOJI_STOP:
                    terms.append(t)
                    positions.append(pos)
                pos += 1
        return terms, positions


# ----------------------------------------------------------------- nori

# common josa (particles) that attach to the END of an eojeol
_NORI_JOSA = tuple(sorted(
    ["이", "가", "은", "는", "을", "를", "의", "에", "에서", "으로", "로",
     "과", "와", "도", "만", "까지", "부터", "하고", "에게", "께서"],
    key=len, reverse=True))


def nori_strip_josa(eojeol: str) -> str:
    """Strip ONE trailing particle when a stem of length ≥ 1 remains —
    the rough stand-in for MeCab-ko's eojeol decompounding."""
    for j in _NORI_JOSA:
        if eojeol.endswith(j) and len(eojeol) > len(j):
            return eojeol[:-len(j)]
    return eojeol


class NoriAnalyzer(Analyzer):
    """analysis-nori stand-in: Hangul eojeol tokens with trailing josa
    stripped (documented partial vs the MeCab-ko dictionary); Latin
    lowercased."""

    name = "nori"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for tok in tokenize(text):
            if all(_script(c) == "hangul" for c in tok):
                t = nori_strip_josa(tok)
            else:
                t = tok.lower()
            terms.append(t)
            positions.append(pos)
            pos += 1
        return terms, positions


# --------------------------------------------------------------- polish

POLISH_STOP = frozenset(
    """i w na z do nie się jest to że a o jak po za od ale czy tak przez
    dla przy być był była było są ich jego jej tym tego jako lub oraz
    co ma może już tylko też który która które można""".split()
)

# inflectional endings, longest-first: noun case/plural, adjective,
# verb person/tense — the public Polish declension tables
_POLISH_SUFFIXES = tuple(sorted(
    ["owie", "ach", "ami", "iej", "ych", "ymi", "ego", "emu", "owi",
     "em", "om", "ów", "ie", "ą", "ę", "y", "i", "a", "e", "u", "o"],
    key=len, reverse=True))


def polish_stem(word: str) -> str:
    """Light Polish stemmer: strip ONE inflectional ending while ≥ 3
    chars remain (the analysis-stempel role; tables are public
    declension endings, not the trained Egothor automaton)."""
    for suf in _POLISH_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[:-len(suf)]
    return word


class PolishAnalyzer(Analyzer):
    """analysis-stempel stand-in: standard → lowercase → stop(pl) →
    light suffix stem."""

    name = "polish"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for tok in tokenize(text):
            t = tok.lower()
            if t in POLISH_STOP:
                pos += 1
                continue
            terms.append(polish_stem(t))
            positions.append(pos)
            pos += 1
        return terms, positions


# ------------------------------------------------------------ ukrainian

UKRAINIAN_STOP = frozenset(
    """і в на з до не що це як але та або так за від по у же б ж його її
    їх цей ця це ці той та те ті є був була було були бути можна тільки
    також коли для про при між під над""".split()
)

_UKR_SUFFIXES = tuple(sorted(
    ["ості", "ення", "ання", "ами", "ями", "ові", "еві", "ого", "ому",
     "ими", "іми", "ій", "ий", "ів", "ах", "ях", "ою", "ею", "ам", "ям",
     "и", "і", "а", "я", "у", "ю", "о", "е"],
    key=len, reverse=True))


def ukrainian_stem(word: str) -> str:
    """Light Ukrainian stemmer (russian_light shape, Ukrainian endings;
    stand-in for the Morfologik dictionary)."""
    for suf in _UKR_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[:-len(suf)]
    return word


class UkrainianAnalyzer(Analyzer):
    """analysis-ukrainian stand-in: standard → lowercase → stop(uk) →
    light suffix stem."""

    name = "ukrainian"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for tok in tokenize(text):
            t = tok.lower()
            if t in UKRAINIAN_STOP:
                pos += 1
                continue
            terms.append(ukrainian_stem(t))
            positions.append(pos)
            pos += 1
        return terms, positions


register("smartcn", SmartcnAnalyzer)
register("kuromoji", KuromojiAnalyzer)
register("nori", NoriAnalyzer)
register("polish", PolishAnalyzer)
register("ukrainian", UkrainianAnalyzer)
