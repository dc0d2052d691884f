"""``phonetic`` token filter — the analysis-phonetic plugin
(``plugins/analysis-phonetic/.../PhoneticTokenFilterFactory.java``),
which wraps the Apache commons-codec encoders. Encoders here are
implemented FROM THE PUBLISHED ALGORITHMS (NARA Soundex standard;
Philips, "Hanging on the Metaphone", Computer Language 7(12), 1990;
the Caversham Project Caverphone 2.0 revision; Taft's NYSIIS, 1970;
Postel's Kölner Phonetik, 1969) — no code is taken from commons-codec.

Supported encoder names (PhoneticTokenFilterFactory:56-101 subset):
``metaphone`` (default), ``soundex``, ``refined_soundex``, ``nysiis``,
``caverphone``/``caverphone2``, ``cologne``/``koelnerphonetik``.
``double_metaphone``, ``bm`` (Beider-Morse), ``daitch_mokotoff`` and
``haasephonetik`` are NOT implemented (raise with the supported list) —
documented partial, like the thai tokenizer.

``replace=false`` emits the ORIGINAL token plus the code at the same
position (increment-0 twin, the reference's setting); ``replace=true``
(default) substitutes the code.
"""

from __future__ import annotations

import re

_SOUNDEX_MAP = {}
for _letters, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                     ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _letters:
        _SOUNDEX_MAP[_c] = _d

_ALPHA = re.compile(r"[^A-Z]")


def soundex(word: str) -> str:
    """American Soundex, NARA rules: H/W transparent between same-coded
    consonants, vowels reset, first letter kept, 4 chars 0-padded."""
    w = _ALPHA.sub("", word.upper())
    if not w:
        return ""
    out = [w[0]]
    last = _SOUNDEX_MAP.get(w[0], "")
    for c in w[1:]:
        if c in "HW":
            continue  # transparent: do not reset `last`
        code = _SOUNDEX_MAP.get(c)
        if code is None:  # vowel: resets the duplicate window
            last = ""
            continue
        if code != last:
            out.append(code)
            last = code
        if len(out) == 4:
            break
    return "".join(out).ljust(4, "0")


_REFINED_MAP = "01360240043788015936020505"  # A..Z


def refined_soundex(word: str) -> str:
    """Refined Soundex (commons-codec variant of the algorithm): first
    letter + digit per letter, adjacent duplicate digits collapsed, no
    length cap."""
    w = _ALPHA.sub("", word.upper())
    if not w:
        return ""
    out = [w[0]]
    last = None
    for c in w:
        d = _REFINED_MAP[ord(c) - 65]
        if d != last:
            out.append(d)
            last = d
    return "".join(out)


_VOWELS = "AEIOU"


def metaphone(word: str, max_len: int = 4) -> str:
    """Metaphone (Philips 1990, the commons-codec rule set, default
    4-char cap)."""
    w = _ALPHA.sub("", word.upper())
    if not w:
        return ""
    if len(w) == 1:
        return w
    # initial-pair exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[1:]
    def _v(ch: str) -> bool:  # '' is NOT a vowel ('' in "AEIOU" is True)
        return bool(ch) and ch in _VOWELS

    out: list[str] = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        # duplicate letters coded once (except C, e.g. ACCIDENT)
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                # SCH -> K; initial CH before consonant -> K; else X
                if i > 0 and w[i - 1] == "S":
                    out.append("K")
                elif i == 0 and nxt2 and nxt2 not in _VOWELS:
                    out.append("K")
                else:
                    out.append("X")
                i += 1  # consume the H
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if i + 2 < n and _v(w[i + 2]):
                    out.append("K")  # GH before vowel sounds hard
                    i += 1
                # else silent (laugh/night): the H is handled next turn
            elif nxt == "N":
                pass  # GN / GNED: silent G
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            prev = w[i - 1] if i > 0 else ""
            if _v(prev) and not _v(nxt):
                pass  # silent after vowel with no vowel after
            elif prev in "CSPTG":
                pass  # varson: the digraph consumed it
            else:
                out.append("H")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if not (i > 0 and w[i - 1] == "C"):
                out.append("K")
        elif c in "LMNR":
            out.append(c)
        elif c == "F":
            out.append("F")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta
                i += 1
            elif not (nxt == "C" and nxt2 == "H"):
                out.append("T")
            # TCH: T silent
        elif c == "V":
            out.append("F")
        elif c == "W":
            if _v(nxt):
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if _v(nxt):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)[:max_len]


def nysiis(word: str) -> str:
    """NYSIIS (Taft 1970, the New York State Identification and
    Intelligence System original rules)."""
    w = _ALPHA.sub("", word.upper())
    if not w:
        return ""
    # head transcodes
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    # tail transcodes
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(suf):
            w = w[:-len(suf)] + rep
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if c in "AEIOU":
            if c == "E" and nxt == "V":
                rep = "AF"
                i += 1
            else:
                rep = "A"
        elif c == "Q":
            rep = "G"
        elif c == "Z":
            rep = "S"
        elif c == "M":
            rep = "N"
        elif c == "K":
            rep = "N" if nxt == "N" else "C"
            if nxt == "N":
                i += 1
        elif c == "S" and w[i:i + 3] == "SCH":
            rep = "SSS"
            i += 2
        elif c == "P" and nxt == "H":
            rep = "FF"
            i += 1
        elif c == "H":
            prev = w[i - 1]
            if prev not in "AEIOU" or (nxt and nxt not in "AEIOU"):
                rep = prev
            else:
                rep = "H"
        elif c == "W":
            prev = w[i - 1]
            rep = "A" if prev in "AEIOU" else "W"
        else:
            rep = c
        for r in rep:
            if r != key[-1]:
                key.append(r)
        i += 1
    # tail cleanup: trailing S, AY -> Y, trailing A
    while len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) >= 2 and key[-2] == "A" and key[-1] == "Y":
        key[-2:] = ["Y"]
    while len(key) > 1 and key[-1] == "A":
        key.pop()
    return "".join(key)


def caverphone2(word: str) -> str:
    """Caverphone 2.0 (Caversham Project, University of Otago, revised
    specification) — 10-character code padded with 1s."""
    w = re.sub(r"[^a-z]", "", word.lower())
    if not w:
        return ""
    if w.endswith("e"):
        w = w[:-1]
    for pre, rep in (("cough", "cou2f"), ("rough", "rou2f"),
                     ("tough", "tou2f"), ("enough", "enou2f"),
                     ("trough", "trou2f"), ("gn", "2n")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w.endswith("mb"):
        w = w[:-2] + "m2"
    steps = [
        ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
        ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
        ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
        ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ]
    for a, b in steps:
        w = w.replace(a, b)
    w = re.sub(r"^[aeiou]", "A", w)
    w = re.sub(r"[aeiou]", "3", w)
    w = w.replace("j", "y")
    w = re.sub(r"^y3", "Y3", w)
    w = re.sub(r"^y", "A", w)
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3")
    w = w.replace("gh", "22")
    w = w.replace("g", "k")
    for c in "stpkfmn":
        w = re.sub(c + "+", c.upper(), w)
    w = w.replace("w3", "W3")
    w = w.replace("wh3", "Wh3")
    w = re.sub(r"w$", "3", w)
    w = w.replace("w", "2")
    w = re.sub(r"^h", "A", w)
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    w = re.sub(r"r$", "3", w)
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    w = re.sub(r"l$", "3", w)
    w = w.replace("l", "2")
    w = w.replace("2", "")
    w = re.sub(r"3$", "A", w)
    w = w.replace("3", "")
    return (w + "1" * 10)[:10]


def cologne(word: str) -> str:
    """Kölner Phonetik (Postel 1969) — context-sensitive digit codes,
    adjacent duplicates collapsed, zeros dropped except leading."""
    w = _ALPHA.sub("", word.upper().replace("Ä", "A").replace("Ö", "O")
                  .replace("Ü", "U").replace("ß", "SS"))
    if not w:
        return ""
    codes = []
    n = len(w)
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        if c in "AEIJOUY":
            codes.append("0")
        elif c == "H":
            codes.append("")  # H is ignored
        elif c == "B":
            codes.append("1")
        elif c == "P":
            codes.append("3" if nxt == "H" else "1")
        elif c in "DT":
            codes.append("8" if (nxt and nxt in "CSZ") else "2")
        elif c in "FVW":
            codes.append("3")
        elif c in "GKQ":
            codes.append("4")
        elif c == "C":
            if i == 0:
                codes.append("4" if (nxt and nxt in "AHKLOQRUX")
                             else "8")
            elif prev in "SZ":
                codes.append("8")
            else:
                codes.append("4" if (nxt and nxt in "AHKOQUX") else "8")
        elif c == "X":
            codes.append("8" if (prev and prev in "CKQ") else "48")
        elif c == "L":
            codes.append("5")
        elif c in "MN":
            codes.append("6")
        elif c == "R":
            codes.append("7")
        elif c in "SZ":
            codes.append("8")
    # collapse adjacent duplicates, then drop non-leading zeros
    flat = "".join(codes)
    out = []
    for ch in flat:
        if not out or out[-1] != ch:
            out.append(ch)
    res = "".join(out)
    return (res[0] + res[1:].replace("0", "")) if res else ""


_ENCODERS = {
    "metaphone": metaphone,
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "refinedsoundex": refined_soundex,
    "nysiis": nysiis,
    "caverphone": caverphone2,
    "caverphone2": caverphone2,
    "cologne": cologne,
    "koelnerphonetik": cologne,
}

_UNSUPPORTED = ("double_metaphone", "doublemetaphone", "bm",
                "beider_morse", "daitch_mokotoff", "haasephonetik",
                "caverphone1")


def phonetic_filter(terms, pos, encoder: str = "metaphone",
                    replace: bool = True):
    """The plugin's token filter (PhoneticTokenFilterFactory):
    ``replace=false`` keeps the original token and adds the code as an
    increment-0 twin at the same position."""
    name = encoder.lower()
    if name in _UNSUPPORTED:
        raise NotImplementedError(
            f"phonetic encoder {encoder!r} is not implemented; supported: "
            f"{sorted(set(_ENCODERS))}")
    fn = _ENCODERS.get(name)
    if fn is None:
        raise ValueError(
            f"unknown phonetic encoder [{encoder}]; supported: "
            f"{sorted(set(_ENCODERS))}")
    out_t, out_p = [], []
    for t, p in zip(terms, pos):
        code = fn(t)
        if replace:
            if code:
                out_t.append(code)
                out_p.append(p)
        else:
            out_t.append(t)
            out_p.append(p)
            if code and code != t:
                out_t.append(code)
                out_p.append(p)  # increment-0 twin
    return out_t, out_p
