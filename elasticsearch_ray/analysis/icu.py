"""ICU analysis components — the analysis-icu plugin
(``plugins/analysis-icu/.../AnalysisICUPlugin.java``) rebuilt on
Python's ``unicodedata`` (the stdlib exposes the same Unicode character
database ICU ships): normalizer char/token filters, ``icu_folding``,
``icu_transform`` (rule-id subset), ``icu_collation`` sort keys and the
``icu_tokenizer`` name.

What is REAL here vs the plugin:

- ``icu_normalizer`` (char filter + token filter,
  ``IcuNormalizerCharFilterFactory`` / ``IcuNormalizerTokenFilterFactory``):
  ``nfc``/``nfkc`` are exact ``unicodedata.normalize``; ``nfkc_cf``
  follows the UAX#31 definition NFKC(casefold(NFKC(x))) with
  default-ignorable stripping — byte-identical to ICU on the vast
  majority of text, documented delta on exotic edge cases.
- ``icu_folding`` (``IcuFoldingTokenFilterFactory``, UTR#30): NFKD →
  strip combining marks (Mn) → casefold → NFKC, plus the Latin
  special-forms table below; honors ``unicode_set_filter`` exception
  sets (the reference's Swedish ``[^åäöÅÄÖ]`` example syntax — chars,
  ranges, negation).
- ``icu_transform`` (``IcuTransformTokenFilterFactory``): compound
  ``;``-chained ids from the subset {Any-Lower, Any-Upper, Any-Title,
  NFC, NFD, NFKC, NFKD, NFKC_CF, Latin-ASCII, Any-ASCII,
  de-ASCII, [:Nonspacing Mark:] Remove}. Script transliteration ids
  (``Any-Latin`` …) need ICU's transliteration data and raise a clear
  error — documented partial.
- ``icu_collation`` sort keys (``IcuCollationTokenFilterFactory`` /
  collation keyword docs): a ROOT-collation approximation — primary =
  folded text, secondary = diacritic sequence, tertiary = case
  pattern — with ``strength``, ``numeric`` (digit runs compare by
  value) and ``case_first`` knobs. Locale-specific tailorings (French
  backward secondaries, Swedish å>z, …) are NOT implemented; the key
  shape and strength semantics are.
- ``icu_tokenizer``: ICU's word-break engine IS UAX#29 plus
  dictionary-driven CJK/Thai segmentation; this maps to the engine's
  real UAX#29 standard tokenizer (analysis/tokenizer.py), with the
  dictionary CJK segmentation falling back to its per-codepoint Han
  handling — same documented partial as the thai tokenizer.
"""

from __future__ import annotations

import re
import unicodedata

# Default-ignorable code points commonly hit in text (soft hyphen, ZW*,
# joiners, BOM) — NFKC_Casefold removes these (Unicode DerivedNormalizationProps)
_DEFAULT_IGNORABLE = {
    0x00AD, 0x034F, 0x180B, 0x180C, 0x180D, 0x180E, 0x200B, 0x200C,
    0x200D, 0x2060, 0x2061, 0x2062, 0x2063, 0x2064, 0xFE00, 0xFE01,
    0xFE0F, 0xFEFF,
}

# Latin special forms UTR#30 / Latin-ASCII fold beyond mark-stripping
_SPECIALS = {
    "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O",
    "œ": "oe", "Œ": "OE", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŧ": "t", "Ŧ": "T", "ŋ": "n", "Ŋ": "N",
    "·": "", "ʼ": "'",
}


def nfkc_cf(text: str) -> str:
    """NFKC_Casefold (UAX#31 definition): NFKC(caseFold(NFKC(x))) with
    default-ignorables removed."""
    s = unicodedata.normalize("NFKC", text)
    s = "".join(c for c in s if ord(c) not in _DEFAULT_IGNORABLE)
    return unicodedata.normalize("NFKC", s.casefold())


_NORM_FORMS = {
    "nfc": lambda s: unicodedata.normalize("NFC", s),
    "nfd": lambda s: unicodedata.normalize("NFD", s),
    "nfkc": lambda s: unicodedata.normalize("NFKC", s),
    "nfkd": lambda s: unicodedata.normalize("NFKD", s),
    "nfkc_cf": nfkc_cf,
}


def icu_normalize(text: str, name: str = "nfkc_cf",
                  mode: str = "compose") -> str:
    """``icu_normalizer`` core. ``name`` per the plugin: nfc | nfkc |
    nfkc_cf (and the decomposed forms for completeness); ``mode:
    "decompose"`` maps nfc→nfd, nfkc→nfkd (the char-filter factory's
    mode option)."""
    key = name.lower()
    if mode == "decompose" and key in ("nfc", "nfkc"):
        key = {"nfc": "nfd", "nfkc": "nfkd"}[key]
    fn = _NORM_FORMS.get(key)
    if fn is None:
        raise ValueError(
            f"icu_normalizer name {name!r} not in "
            f"{sorted(_NORM_FORMS)}")
    return fn(text)


# --------------------------------------------------------- UnicodeSet


class UnicodeSet:
    """Minimal ICU UnicodeSet: ``[abc]``, ranges ``[a-z]``, negation
    ``[^åäö]``, ``\\u`` escapes. Enough for the plugin's documented
    ``unicode_set_filter`` examples."""

    def __init__(self, spec: str):
        s = spec.strip()
        if not (s.startswith("[") and s.endswith("]")):
            raise ValueError(f"bad UnicodeSet {spec!r}")
        body = s[1:-1]
        self.negate = body.startswith("^")
        if self.negate:
            body = body[1:]
        body = re.sub(
            r"\\u([0-9A-Fa-f]{4})",
            lambda m: chr(int(m.group(1), 16)), body)
        chars: set[str] = set()
        i = 0
        while i < len(body):
            if i + 2 < len(body) and body[i + 1] == "-":
                for cp in range(ord(body[i]), ord(body[i + 2]) + 1):
                    chars.add(chr(cp))
                i += 3
            else:
                chars.add(body[i])
                i += 1
        self.chars = chars

    def __contains__(self, c: str) -> bool:
        return (c not in self.chars) if self.negate else (c in self.chars)


# ------------------------------------------------------------- folding


def _fold_char(c: str) -> str:
    if c in _SPECIALS:
        return _SPECIALS[c].casefold()
    d = unicodedata.normalize("NFKD", c)
    d = "".join(x for x in d if unicodedata.category(x) != "Mn")
    d = "".join(_SPECIALS.get(x, x) for x in d)
    return unicodedata.normalize("NFKC", d.casefold())


def icu_fold(text: str, unicode_set_filter: str | None = None) -> str:
    """UTR#30-style folding: accents, case, width and the Latin special
    forms collapse; chars excluded by ``unicode_set_filter`` pass
    through untouched (IcuFoldingTokenFilterFactory's filtered
    normalizer)."""
    if unicode_set_filter is None:
        return "".join(_fold_char(c) for c in text)
    uset = (unicode_set_filter
            if isinstance(unicode_set_filter, UnicodeSet)
            else UnicodeSet(unicode_set_filter))
    return "".join(_fold_char(c) if c in uset else c for c in text)


def icu_folding_filter(terms, pos, unicode_set_filter=None):
    """Token filter: fold every term (empty folds drop with their
    position, like a stop filter would)."""
    uset = (UnicodeSet(unicode_set_filter)
            if isinstance(unicode_set_filter, str) else unicode_set_filter)
    out_t, out_p = [], []
    for t, p in zip(terms, pos):
        f = icu_fold(t, uset)
        if f:
            out_t.append(f)
            out_p.append(p)
    return out_t, out_p


def icu_normalizer_filter(terms, pos, name="nfkc_cf", mode="compose"):
    out_t, out_p = [], []
    for t, p in zip(terms, pos):
        f = icu_normalize(t, name, mode)
        if f:
            out_t.append(f)
            out_p.append(p)
    return out_t, out_p


# ----------------------------------------------------------- transform

_REMOVE_MARKS = "[:Nonspacing Mark:] Remove"


def _transform_one(text: str, rule: str) -> str:
    r = rule.strip()
    key = r.lower()
    if key in ("any-lower", "lower"):
        return text.lower()
    if key in ("any-upper", "upper"):
        return text.upper()
    if key in ("any-title", "title"):
        return text.title()
    if key in _NORM_FORMS:
        return _NORM_FORMS[key](text)
    if r == _REMOVE_MARKS or key == "[:nonspacing mark:] remove":
        return "".join(c for c in text
                       if unicodedata.category(c) != "Mn")
    if key in ("latin-ascii", "any-ascii"):
        return icu_fold_keep_case(text)
    if key == "de-ascii":
        pre = (text.replace("ä", "ae").replace("ö", "oe")
               .replace("ü", "ue").replace("Ä", "Ae")
               .replace("Ö", "Oe").replace("Ü", "Ue")
               .replace("ß", "ss"))
        return icu_fold_keep_case(pre)
    raise ValueError(
        f"icu_transform id {rule!r} is outside the supported subset "
        "(script transliteration needs ICU's rule data): supported are "
        "Any-Lower/Upper/Title, NFC/NFD/NFKC/NFKD/NFKC_CF, "
        "Latin-ASCII, de-ASCII, '[:Nonspacing Mark:] Remove'")


def icu_fold_keep_case(text: str) -> str:
    """Latin-ASCII: strip marks + special forms but PRESERVE case
    (unlike icu_fold, which case-folds)."""
    out = []
    for c in text:
        if c in _SPECIALS:
            out.append(_SPECIALS[c])
            continue
        d = unicodedata.normalize("NFKD", c)
        d = "".join(x for x in d if unicodedata.category(x) != "Mn")
        out.append("".join(_SPECIALS.get(x, x) for x in d))
    return unicodedata.normalize("NFKC", "".join(out))


def icu_transform(text: str, rule_id: str) -> str:
    """Compound transform: ``;``-separated rule chain applied in order
    (Transliterator compound-id semantics)."""
    for rule in rule_id.split(";"):
        if rule.strip():
            text = _transform_one(text, rule)
    return text


def icu_transform_filter(terms, pos, id="Any-Lower"):
    return [icu_transform(t, id) for t in terms], pos


# ----------------------------------------------------------- collation


def icu_collation_key(text: str, strength: str = "tertiary",
                      numeric: bool = False,
                      case_first: str | None = None) -> bytes:
    """Root-collation sort key approximation. Level layout mirrors real
    collation keys: primary bytes, 0x01, secondary bytes, 0x01,
    tertiary bytes — so byte-order comparisons honor strength
    hierarchy (primary differences always dominate, case only breaks
    full ties, etc.)."""
    if strength not in ("primary", "secondary", "tertiary", "quaternary",
                        "identical"):
        raise ValueError(f"unknown strength {strength!r}")
    nfd = unicodedata.normalize("NFD", text)
    primary_src = icu_fold(text)
    if numeric:
        # digit runs compare numerically: (length, digits) so '2' < '10'
        def _num(m):
            ds = m.group(0).lstrip("0") or "0"
            return chr(1 + len(ds)) + ds

        primary_src = re.sub(r"\d+", _num, primary_src)
    primary = primary_src.encode("utf-8")
    levels = [primary]
    if strength != "primary":
        marks = bytes(
            (ord(c) & 0xFF) for c in nfd
            if unicodedata.category(c) == "Mn")
        levels.append(marks)
    if strength in ("tertiary", "quaternary", "identical"):
        case_bits = bytearray()
        for c in nfd:
            if c.isalpha():
                up = c.isupper()
                if case_first == "upper":
                    case_bits.append(0 if up else 1)
                else:
                    case_bits.append(1 if up else 0)
        levels.append(bytes(case_bits))
    if strength == "identical":
        levels.append(text.encode("utf-8"))
    return b"\x01".join(levels)


def icu_collation_filter(terms, pos, strength="tertiary", numeric=False,
                         case_first=None, hex_keys=True):
    """icu_collation token filter: each term becomes its sort key
    (hex-encoded so it survives the string postings path, like the
    plugin's IndexableBinaryStringTools encoding did)."""
    keys = [icu_collation_key(t, strength, numeric, case_first)
            for t in terms]
    if hex_keys:
        return [k.hex() for k in keys], pos
    return keys, pos


def sort_key_hex(text: str, **kw) -> str:
    """Convenience for icu_collation_keyword fields: hex sort key for a
    whole field value."""
    return icu_collation_key(text, **kw).hex()
