"""Snowball Russian stemmer (M.F. Porter's published Snowball algorithm,
https://snowballstem.org/algorithms/russian/stemmer.html) — the stemmer the
reference's ``russian`` analyzer actually runs (Lucene ``RussianAnalyzer``
wraps ``SnowballFilter(RussianStemmer)``; registered via
``modules/analysis-common/.../CommonAnalysisPlugin.java:179-219``).
Implemented from the public algorithm description, not the generated code.

Algorithm regions (on the lowercased word, with ё normalized to е):
  RV — after the first vowel; R1 — after the first non-vowel that follows a
  vowel; R2 — R1 applied again inside R1. All endings must lie in RV (the
  derivational ending must lie in R2).

Steps:
  1. perfective gerund; else [reflexive] then (adjectival | verb | noun)
  2. drop a final и
  3. drop derivational ост/ость in R2
  4. undouble нн / drop superlative ейш(е) (then undouble нн) / drop ь
"""

from __future__ import annotations

_VOWELS = "аеиоуыэюя"

# group-1 endings require the char BEFORE the ending to be а or я (which
# stays); group-2 endings remove unconditionally. Longest-match-first.
_PERFECTIVE_1 = ("вшись", "вши", "в")
_PERFECTIVE_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_REFLEXIVE = ("ся", "сь")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом",
    "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ющ", "нн", "вш", "ем", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_VERB_1 = (
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено", "ует",
    "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_NOUN = (
    "иями", "ями", "ами",
    "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
    "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_DERIVATIONAL = ("ость", "ост")
_SUPERLATIVE = ("ейше", "ейш")


def _regions(word: str) -> tuple[int, int]:
    """(rv_start, r2_start) as absolute indices."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            rv = i + 1
            break
    # R1: after the first non-vowel following a vowel
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ends_in(word: str, suffixes: tuple, start: int) -> str | None:
    """Longest suffix from ``suffixes`` lying wholly at/after ``start``."""
    best = None
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= start:
            if best is None or len(s) > len(best):
                best = s
    return best


def _ends_in_g1(word: str, suffixes: tuple, start: int) -> str | None:
    """Group-1 form: the suffix must be preceded by а or я (which remains).
    The preceding letter must ALSO lie inside the region — Snowball's
    generated code runs step 1 under ``setlimit tomark pV``, so matching the
    'а'/'я' fails when that char sits before RV."""
    best = None
    for s in suffixes:
        if (word.endswith(s) and len(word) - len(s) - 1 >= start
                and word[len(word) - len(s) - 1] in "ая"):
            if best is None or len(s) > len(best):
                best = s
    return best


def stem(word: str) -> str:
    w = word.replace("ё", "е")
    rv, r2 = _regions(w)
    if rv >= len(w):
        return w

    # Step 1 — perfective gerund, else [reflexive] + adjectival|verb|noun
    s = _ends_in(w, _PERFECTIVE_2, rv)
    g1 = _ends_in_g1(w, _PERFECTIVE_1, rv)
    if s is not None or g1 is not None:
        # group 2 wins only if longer (Snowball tries longest match overall)
        cut = s if (s is not None and (g1 is None or len(s) >= len(g1))) else g1
        w = w[: len(w) - len(cut)]
    else:
        r = _ends_in(w, _REFLEXIVE, rv)
        if r is not None:
            w = w[: len(w) - len(r)]
        a = _ends_in(w, _ADJECTIVE, rv)
        if a is not None:
            w = w[: len(w) - len(a)]
            p2 = _ends_in(w, _PARTICIPLE_2, rv)
            p1 = _ends_in_g1(w, _PARTICIPLE_1, rv)
            if p2 is not None or p1 is not None:
                cut = p2 if (p2 is not None and (p1 is None or len(p2) >= len(p1))) else p1
                w = w[: len(w) - len(cut)]
        else:
            v2 = _ends_in(w, _VERB_2, rv)
            v1 = _ends_in_g1(w, _VERB_1, rv)
            if v2 is not None or v1 is not None:
                cut = v2 if (v2 is not None and (v1 is None or len(v2) >= len(v1))) else v1
                w = w[: len(w) - len(cut)]
            else:
                n = _ends_in(w, _NOUN, rv)
                if n is not None:
                    w = w[: len(w) - len(n)]

    # Step 2 — final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # Step 3 — derivational in R2
    d = _ends_in(w, _DERIVATIONAL, r2)
    if d is not None:
        w = w[: len(w) - len(d)]

    # Step 4 (the 'нн' among-pattern lies wholly in RV: both chars)
    if w.endswith("нн") and len(w) - 2 >= rv:
        w = w[:-1]
    else:
        sup = _ends_in(w, _SUPERLATIVE, rv)
        if sup is not None:
            w = w[: len(w) - len(sup)]
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
