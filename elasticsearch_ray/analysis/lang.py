"""Language analyzer chains beyond English — the reference registers 36
(`modules/analysis-common/.../CommonAnalysisPlugin.java:179-219`); we provide
the big five for this corpus's languages (fr/de/es/ru/zh) as light chains:

  french   standard → elision → lowercase → stop(fr) → french light stem
  german   standard → lowercase → stop(de) → umlaut-normalize → light stem
  spanish  standard → lowercase → stop(es) → accent-fold → light stem
  russian  standard → lowercase → stop(ru) → Snowball Russian stem
           (Lucene RussianAnalyzer wraps SnowballFilter — the one chain of
           the five whose reference stemmer is Snowball, not light)
  cjk      standard → lowercase → CJK BIGRAMS (CJKBigramFilter semantics:
           ideograph runs emit overlapping bigrams; isolated single
           ideographs emit a unigram; non-CJK tokens pass through)

The stemmers follow the published *light/minimal* stemming family (Jacques
Savoy, "Light stemming approaches for the French, Portuguese, German and
Hungarian languages", ACM SAC 2006; "A stemming procedure and stopword list
for general French corpora", JASIS 1999) rather than full Snowball — a
documented simplification; golden fixtures in tests/test_lang_analyzers.py
pin the exact semantics. Stopword sets are compact subsets of the public
Snowball lists."""

from __future__ import annotations

from elasticsearch_ray.analysis.analyzers import Analysis, Analyzer, register
from elasticsearch_ray.analysis.tokenizer import tokenize

FRENCH_STOP = frozenset(
    """le la les de des du un une et en au aux ce ces dans il elle je tu nous
    vous ne pas que qui sur se son sa ses est sont être avec pour par plus ou
    où mais comme si tout aussi leur y a à""".split()
)
GERMAN_STOP = frozenset(
    """der die das und oder aber nicht ein eine einer eines einem einen dem
    den ist sind war waren wird werden mit von zu im in auf für als auch an
    es er sie ich du wir ihr sich des am um bei nach über unter durch""".split()
)
SPANISH_STOP = frozenset(
    """el la los las de del un una unos unas y o pero no es son fue en a al
    con por para como su sus se que más este esta estos estas lo le les mi tu
    si ya""".split()
)
RUSSIAN_STOP = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у же
    вы за бы по только ее мне было вот от меня еще нет о из ему""".split()
)

# Lucene FrenchAnalyzer DEFAULT_ARTICLES (ElisionFilter)
FRENCH_ARTICLES = frozenset("l m t qu n s j d c".split())


def elision(term: str, articles: frozenset = FRENCH_ARTICLES) -> str:
    """Strip a leading article + apostrophe (l'avion → avion; Italian's
    four-letter dell'/nell'/sull' family included via the article set)."""
    for apo in ("'", "’"):
        i = term.find(apo)
        if 0 < i <= 4 and term[:i] in articles:
            return term[i + 1 :]
    return term


def french_light_stem(t: str) -> str:
    """French minimal stemmer (Savoy 1999 family): -aux→-al, drop final
    x/s/r/e/é (one each, in order), collapse a final doubled letter."""
    if len(t) > 5 and t.endswith("aux"):
        t = t[:-2] + "l"
    elif len(t) > 4 and t.endswith("x"):
        t = t[:-1]
    if len(t) > 4 and t.endswith("s"):
        t = t[:-1]
    if len(t) > 4 and t.endswith("r"):
        t = t[:-1]
    if len(t) > 4 and t.endswith("e"):
        t = t[:-1]
    if len(t) > 4 and t.endswith("é"):
        t = t[:-1]
    if len(t) > 4 and t[-1] == t[-2]:
        t = t[:-1]
    return t


_DE_NORM = str.maketrans({"ä": "a", "ö": "o", "ü": "u"})


def german_normalize(t: str) -> str:
    return t.translate(_DE_NORM).replace("ß", "ss")


_DE_SUFFIXES = ("nen", "en", "er", "es", "em", "nd", "e", "s", "n")


def german_light_stem(t: str) -> str:
    """German light stemmer (Savoy family): normalize umlauts/ß, then strip
    one plural/case suffix (longest match), minimum stem length 4."""
    t = german_normalize(t)
    for suf in _DE_SUFFIXES:
        if t.endswith(suf) and len(t) - len(suf) >= 4:
            return t[: -len(suf)]
    return t


_ES_NORM = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u", "ü": "u"})


def spanish_light_stem(t: str) -> str:
    """Spanish light stemmer: fold accents, strip plural -es/-s and a final
    gender vowel a/o (minimum stem length 4)."""
    t = t.translate(_ES_NORM)
    if len(t) > 5 and t.endswith("es"):
        t = t[:-2]
    elif len(t) > 4 and t.endswith("s"):
        t = t[:-1]
    if len(t) > 4 and t[-1] in "ao":
        t = t[:-1]
    return t


# Russian light stemmer suffixes (adjective + noun endings), longest first;
# minimum stem length 3 (Savoy RussianLightStemmer family).
_RU_SUFFIXES = (
    "иями", "ями", "ами", "его", "ого", "ему", "ому", "ыми", "ими",
    "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом",
    "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею", "ия", "ии",
    "ов", "ев", "ах", "ях", "ам", "ям", "ом", "ем",
    "а", "я", "ы", "и", "е", "у", "ю", "о", "ь",
)


def russian_light_stem(t: str) -> str:
    for suf in _RU_SUFFIXES:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: -len(suf)]
    return t


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (
        0x4E00 <= o <= 0x9FFF      # CJK Unified Ideographs
        or 0x3400 <= o <= 0x4DBF   # Extension A
        or 0xF900 <= o <= 0xFAFF   # Compatibility Ideographs
        or 0x3040 <= o <= 0x30FF   # Hiragana + Katakana
        or 0xAC00 <= o <= 0xD7AF   # Hangul syllables
    )


class _StemAnalyzer(Analyzer):
    """Shared chain: tokenize → per-token pre → lowercase → stop (position
    gaps) → stem."""

    stopwords: frozenset = frozenset()

    def pre(self, t: str) -> str:
        return t

    def stem(self, t: str) -> str:
        return t

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        for pos, tok in enumerate(tokenize(text)):
            t = self.pre(tok).lower()
            if not t or t in self.stopwords:
                continue
            terms.append(self.stem(t))
            positions.append(pos)
        return terms, positions


class FrenchAnalyzer(_StemAnalyzer):
    name = "french"
    stopwords = FRENCH_STOP

    def pre(self, t: str) -> str:
        return elision(t)

    def stem(self, t: str) -> str:
        return french_light_stem(t)


class GermanAnalyzer(_StemAnalyzer):
    name = "german"
    stopwords = GERMAN_STOP

    def stem(self, t: str) -> str:
        return german_light_stem(t)


class SpanishAnalyzer(_StemAnalyzer):
    name = "spanish"
    stopwords = SPANISH_STOP

    def stem(self, t: str) -> str:
        return spanish_light_stem(t)


class RussianAnalyzer(_StemAnalyzer):
    """russian: Lucene RussianAnalyzer parity — SnowballFilter(RussianStemmer),
    i.e. the published Snowball Russian algorithm, NOT the light family the
    other chains use (Lucene's fr/de/es analyzers really do use the Light
    stemmers; only Russian defaults to Snowball)."""

    name = "russian"
    stopwords = RUSSIAN_STOP

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.snowball_ru import stem as snowball_stem

        return snowball_stem(t)


class RussianLightAnalyzer(RussianAnalyzer):
    """light_russian stemmer option (StemmerTokenFilterFactory's
    ``light_russian`` / Savoy family) kept as a named variant."""

    name = "russian_light"

    def stem(self, t: str) -> str:
        return russian_light_stem(t)


class CjkAnalyzer(Analyzer):
    """``cjk``: standard (UAX#29) tokens, lowercased, then CJKBigramFilter
    semantics: CONSECUTIVE CJK tokens (single-char Han/Hiragana tokens,
    Katakana/Hangul runs — the filter's default han|hiragana|katakana|hangul
    flag set) are buffered into one character stream and emit overlapping
    BIGRAMS at consecutive positions; a lone buffered char emits a unigram;
    non-CJK tokens flush the buffer and pass through. Like the reference
    filter, buffering looks only at token adjacency (no position gaps occur
    with the empty stopword set), so ideographs separated by whitespace still
    bigram together."""

    name = "cjk"

    def __call__(self, text: str) -> Analysis:
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        buf: list[str] = []

        def flush() -> None:
            nonlocal pos
            if not buf:
                return
            if len(buf) == 1:
                terms.append(buf[0])
                positions.append(pos)
                pos += 1
            else:
                s = "".join(buf)
                for i in range(len(s) - 1):
                    terms.append(s[i : i + 2])
                    positions.append(pos)
                    pos += 1
            buf.clear()

        for tok in tokenize(text):
            t = tok.lower()
            if all(_is_cjk(ch) for ch in t):
                buf.extend(t)
            else:
                flush()
                terms.append(t)
                positions.append(pos)
                pos += 1
        flush()
        return terms, positions


# ---- round-3 chains (next six highest-traffic per the reference registry,
# CommonAnalysisPlugin.java:179-219): italian, portuguese, dutch, catalan,
# romanian, norwegian. Same light-chain shape as fr/de/es: standard tokens →
# (elision) → lowercase → stop → light stem (analysis/stemmers.py).

ITALIAN_STOP = frozenset(
    """il lo la i gli le un uno una di a da in con su per tra fra e o ma se
    che chi cui non più quale quanto quanti questa questo questi queste si
    tutto tutti del della dei delle al alla ai alle dal dalla nel nella sono
    è era come anche ancora dove ci loro mio tuo suo""".split()
)
PORTUGUESE_STOP = frozenset(
    """o a os as um uma uns umas de do da dos das em no na nos nas por para
    com sem sob sobre e ou mas que se não mais muito já também só pelo pela
    ao aos à às este esta isto esse essa isso aquele aquela são ser foi eram
    como quando onde quem seu sua meu minha nosso nossa""".split()
)
DUTCH_STOP = frozenset(
    """de het een en van in op te dat die voor met als maar om aan er nog
    door over bij ook tot uit naar dan zo zij hij ik je we ze niet is zijn
    was waren wordt worden werd deze dit der den of heeft hebben had""".split()
)
CATALAN_STOP = frozenset(
    """el la els les un una uns unes de a en amb per sense sobre i o però
    que si no més molt ja també només al als del dels aquest aquesta això
    aquell aquella són ser va ser era com quan on qui seu seva el meu la
    meva nostre nostra hi ho es""".split()
)
ROMANIAN_STOP = frozenset(
    """un o şi și în la cu de pe din pentru prin după sub peste dar iar sau
    că dacă nu mai foarte deja doar este sunt era erau fost fi ca cum când
    unde cine al a ale lui ei lor meu mea său sa acest această acel acea
    ce se îşi își""".split()
)
NORWEGIAN_STOP = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke der så
    var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra
    du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her
    alle vil bli ble blitt kunne inn når være kom noen noe""".split()
)

# Lucene ItalianAnalyzer DEFAULT_ARTICLES (ElisionFilter) — c/l/all/dall/
# dell/nell/sull/coll/pell/gl/agl/dagl/degl/negl/sugl/un/m/t/s/v/d
ITALIAN_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl un m t s v d".split()
)
# Lucene CatalanAnalyzer DEFAULT_ARTICLES
CATALAN_ARTICLES = frozenset("d l m n s t".split())


class ItalianAnalyzer(_StemAnalyzer):
    name = "italian"
    stopwords = ITALIAN_STOP

    def pre(self, t: str) -> str:
        return elision(t, ITALIAN_ARTICLES)

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import italian_light_stem

        return italian_light_stem(t)


class PortugueseAnalyzer(_StemAnalyzer):
    name = "portuguese"
    stopwords = PORTUGUESE_STOP

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import portuguese_light_stem

        return portuguese_light_stem(t)


class DutchAnalyzer(_StemAnalyzer):
    name = "dutch"
    stopwords = DUTCH_STOP

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import dutch_light_stem

        return dutch_light_stem(t)


class CatalanAnalyzer(_StemAnalyzer):
    name = "catalan"
    stopwords = CATALAN_STOP

    def pre(self, t: str) -> str:
        return elision(t, CATALAN_ARTICLES)

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import catalan_light_stem

        return catalan_light_stem(t)


class RomanianAnalyzer(_StemAnalyzer):
    name = "romanian"
    stopwords = ROMANIAN_STOP

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import romanian_light_stem

        return romanian_light_stem(t)


class NorwegianAnalyzer(_StemAnalyzer):
    name = "norwegian"
    stopwords = NORWEGIAN_STOP

    def stem(self, t: str) -> str:
        from elasticsearch_ray.analysis.stemmers import norwegian_light_stem

        return norwegian_light_stem(t)


register("french", FrenchAnalyzer)
register("german", GermanAnalyzer)
register("spanish", SpanishAnalyzer)
register("russian", RussianAnalyzer)
register("russian_light", RussianLightAnalyzer)
register("cjk", CjkAnalyzer)
register("italian", ItalianAnalyzer)
register("portuguese", PortugueseAnalyzer)
register("dutch", DutchAnalyzer)
register("catalan", CatalanAnalyzer)
register("romanian", RomanianAnalyzer)
register("norwegian", NorwegianAnalyzer)
