"""Light stemmers for the round-3 language chains — italian, portuguese,
dutch, catalan, romanian, norwegian — plus a rule-based kstem subset.

These follow the published *light stemming* family (Jacques Savoy, "Light
Stemming Approaches for the French, Portuguese, German and Hungarian
Languages", ACM SAC 2006; "Report on CLEF-2001 Experiments", Springer LNCS
2406 — the same sources the reference's ``*LightStemFilter`` variants derive
from, registered in ``modules/analysis-common/.../StemmerTokenFilterFactory.java``):
suffix-strip rules over accent-folded forms with a minimum-stem guard, NOT the
full Snowball algorithms (the one Snowball chain we ship exactly is Russian,
``analysis/snowball_ru.py``). Golden fixtures in
``tests/test_lang_analyzers.py`` pin the exact semantics; cross-inflection
equivalences (plural == singular stem) are the tested contract.

kstem is a rule-based subset of Krovetz's morphological stemmer ("Viewing
Morphology as an Inference Process", SIGIR 1993): plural / past / progressive
un-inflection with e-restoration heuristics and a small exception lexicon in
place of the full dictionary (documented simplification).
"""

from __future__ import annotations

# ----------------------------------------------------------------- italian
_IT_NORM = str.maketrans({"à": "a", "á": "a", "â": "a", "è": "e", "é": "e",
                          "ê": "e", "ì": "i", "í": "i", "î": "i", "ò": "o",
                          "ó": "o", "ô": "o", "ù": "u", "ú": "u", "û": "u"})


def italian_light_stem(t: str) -> str:
    """Fold accents; strip superlative -issim*/adverbial -mente; strip one
    final vowel (plural & gender: ragazzo/ragazzi/ragazza → ragazz)."""
    t = t.translate(_IT_NORM)
    for suf in ("issimo", "issima", "issimi", "issime"):
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: -len(suf)]
            break
    if t.endswith("mente") and len(t) - 5 >= 3:
        t = t[:-5]
    if len(t) > 4 and t[-1] in "aeio":
        t = t[:-1]
    return t


# --------------------------------------------------------------- portuguese
_PT_NORM = str.maketrans({"á": "a", "â": "a", "ã": "a", "à": "a", "é": "e",
                          "ê": "e", "í": "i", "ó": "o", "ô": "o", "õ": "o",
                          "ú": "u", "ü": "u", "ç": "c"})


def portuguese_light_stem(t: str) -> str:
    """Fold accents; -ões/-ães plurals → -ão (nações/nação → naca after the
    final-vowel strip); strip plural -s and one final vowel a/e/o."""
    t = t.translate(_PT_NORM)
    if len(t) > 5 and (t.endswith("oes") or t.endswith("aes")):
        t = t[:-3] + "ao"
    if len(t) > 4 and t.endswith("s"):
        t = t[:-1]
    if len(t) > 4 and t[-1] in "aeo":
        t = t[:-1]
    return t


# -------------------------------------------------------------------- dutch
_NL_SUFFIXES = ("heden", "eren", "en", "je", "se", "e", "s")


def dutch_light_stem(t: str) -> str:
    """Strip one diminutive/plural/case suffix (-heden → -heid like the
    Snowball step 1 rule; -eren strips to the bare stem: kinderen → kind;
    plain -je covers the diminutives: boekje → boek), then undouble a final
    doubled consonant (bakken → bak)."""
    if t.endswith("heden") and len(t) - 5 >= 3:
        t = t[:-5] + "heid"
    else:
        for suf in _NL_SUFFIXES[1:]:
            if t.endswith(suf) and len(t) - len(suf) >= 3:
                t = t[: -len(suf)]
                break
    if len(t) > 3 and t[-1] == t[-2] and t[-1] not in "aeiou":
        t = t[:-1]
    return t


# ------------------------------------------------------------------ catalan
_CA_NORM = str.maketrans({"à": "a", "è": "e", "é": "e", "í": "i", "ï": "i",
                          "ò": "o", "ó": "o", "ú": "u", "ü": "u", "ç": "c"})


def catalan_light_stem(t: str) -> str:
    """Fold accents; -ns plural → bare (cançons/cançó → canco); strip plural
    -es/-s and one final vowel."""
    t = t.translate(_CA_NORM)
    if len(t) > 4 and t.endswith("ns"):
        t = t[:-2]
    elif len(t) > 4 and t.endswith("es"):
        t = t[:-2]
    elif len(t) > 4 and t.endswith("s"):
        t = t[:-1]
    if len(t) > 4 and t[-1] in "aeio":
        t = t[:-1]
    return t


# ----------------------------------------------------------------- romanian
_RO_NORM = str.maketrans({"ă": "a", "â": "a", "î": "i", "ș": "s", "ş": "s",
                          "ț": "t", "ţ": "t"})

_RO_SUFFIXES = ("iilor", "ilor", "ului", "elor", "iile", "atie", "atii",
                "iei", "ele", "ea", "le", "ul", "ii", "a", "e", "i", "u")


def romanian_light_stem(t: str) -> str:
    """Fold diacritics (ă â î ș ț), strip one article/case/plural suffix,
    longest first (băieții/băiat-family endings; min stem 3)."""
    t = t.translate(_RO_NORM)
    for suf in _RO_SUFFIXES:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: -len(suf)]
    return t


# ---------------------------------------------------------------- norwegian
_NO_SUFFIXES = ("hetens", "heten", "heter", "endes", "ende", "enes", "ene",
                "ane", "ens", "en", "et", "er", "es", "a", "e")


def norwegian_light_stem(t: str) -> str:
    """Strip one definite/plural/genitive suffix (bokmål + nynorsk -ane;
    -het* abstractions kept as a unit; min stem 3). The reference's
    light_norwegian (NorwegianLightStemFilter) family."""
    for suf in _NO_SUFFIXES:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: -len(suf)]
    return t


# -------------------------------------------------------------------- kstem
_KSTEM_EXCEPTIONS = {
    # irregular forms the rules below would mangle (tiny stand-in for the
    # Krovetz lexicon)
    "is": "is", "as": "as", "this": "this", "has": "has", "was": "was",
    "us": "us", "its": "its", "yes": "yes", "does": "do", "goes": "go",
    "dying": "die", "lying": "lie", "tying": "tie", "news": "news",
    "series": "series", "species": "species", "sties": "sty",
}

_VOWELS = set("aeiou")


def _kstem_plural(t: str) -> str:
    if t.endswith("ies") and len(t) > 4:
        return t[:-3] + "y"  # parties → party
    if t.endswith("es") and len(t) > 4 and t[-3] in "sxz":
        return t[:-2]  # boxes → box, classes → class
    if t.endswith("es") and len(t) > 5 and t[-4:-2] in ("ch", "sh"):
        return t[:-2]  # churches → church
    if t.endswith("s") and len(t) > 3 and not t.endswith("ss") and not t.endswith("us"):
        return t[:-1]  # cats → cat
    return t


def _kstem_ed(t: str) -> str:
    if t.endswith("ied") and len(t) > 4:
        return t[:-3] + "y"  # tried → try
    if t.endswith("ed") and len(t) > 4:
        stem = t[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
            return stem[:-1]  # stopped → stop
        if stem[-1] not in _VOWELS and len(stem) > 2 and stem[-2] in _VOWELS and stem[-3] not in _VOWELS:
            return stem + "e"  # hoped → hope (CVC e-restoration heuristic)
        return stem
    return t


def _kstem_ing(t: str) -> str:
    if t.endswith("ing") and len(t) > 5:
        stem = t[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
            return stem[:-1]  # running → run
        if stem[-1] not in _VOWELS and len(stem) > 2 and stem[-2] in _VOWELS and stem[-3] not in _VOWELS:
            return stem + "e"  # hoping → hope
        return stem
    return t


def kstem(t: str) -> str:
    """Krovetz-style un-inflection (plural, -ed, -ing) with e-restoration
    heuristics and a small exception map — the rule skeleton of the
    reference's ``kstem`` filter without the full dictionary."""
    if len(t) < 3 or not t.isalpha():
        return t
    hit = _KSTEM_EXCEPTIONS.get(t)
    if hit is not None:
        return hit
    t = _kstem_plural(t)
    t = _kstem_ed(t)
    t = _kstem_ing(t)
    return t
