"""Standard tokenizer — full UAX#29 word-break + lowercase, max_token_length=255.

Reference: the default analyzer is ``standard`` with an EMPTY stopword set and
``max_token_length=255`` (``server/.../index/analysis/StandardAnalyzerProvider.java:21-28``,
registry default at ``index/analysis/AnalysisRegistry.java:634-646``). Its
Lucene-level semantics are the UAX#29 word-break rules (Lucene
StandardTokenizer, i.e. the JFlex UAX29 grammar) followed by a lowercase
filter.

Two-tier implementation:

- **Fast path** (compiled stdlib ``re``): maximal ``\\w`` runs joined across
  MidLetter/MidNumLet/Single_Quote between letters (WB6/WB7) and
  MidNum/MidNumLet/Single_Quote between digits (WB11/WB12). Used whenever the
  text provably tokenizes identically under the full rules — pure-ASCII text
  (``str.isascii``, a C scan) or non-ASCII text containing none of the
  characters where the two paths diverge (no CJK / Southeast-Asian scripts, no
  combining marks or format chars, no Unicode Mid*/ExtendNumLet beyond the
  handful baked into the fast pattern). Latin / Cyrillic / Greek / Arabic /
  Hebrew prose with precomposed accents stays on this path.

- **Full path** (``regex`` module, real Word_Break property classes): the
  UAX#29 rules as Lucene's StandardTokenizer applies them —

  * Han ideographs and Hiragana emit ONE TOKEN PER CHARACTER (WB999; Lucene
    token types IDEOGRAPHIC / HIRAGANA),
  * Katakana (incl. halfwidth forms and U+30FC prolonged-sound mark) emits
    maximal RUNS (WB13), joinable to word runs only across ExtendNumLet
    (WB13a/WB13b),
  * Thai / Lao / Khmer / Myanmar emit maximal script runs (Lucene's
    ``{ComplexContext}+`` → SOUTHEAST_ASIAN token — UAX#29 leaves these to
    dictionary segmentation, which the reference also does not do inline),
  * Extend (combining marks) / Format / ZWJ attach to the preceding token
    char (WB4) and are kept in the token text,
  * MidLetter/MidNum/MidNumLet/Single_Quote/Double_Quote joining uses the
    real property sets (so e.g. U+05F3/U+05F4 in Hebrew, U+066B/U+066C in
    Arabic-script numbers behave per spec; WB7b/7c Hebrew double-quote
    included),
  * Hangul syllables/jamo are ALetter and join into word runs (WB5), as in
    the reference.

  Documented tailoring (shared with the fast path): the word-character class
  is the union of ``\\w`` and the WB ALetter/Hebrew_Letter/Numeric/
  ExtendNumLet classes, so a handful of ``\\w``-but-WB-Other codepoints (circled
  numbers and similar No/Lo oddities) tokenize as word chars rather than
  breaking — a superset consistent with round-1/2 behavior.

Tokens longer than ``max_token_length`` are split at that length (Lucene
StandardTokenizer behavior). Lowercasing is per-codepoint ``str.lower()``
(matches Lucene LowerCaseFilter for the scripts in scope).
"""

from __future__ import annotations

import re

import regex as _rx

MAX_TOKEN_LENGTH = 255

# ---------------------------------------------------------------- fast path
# \w with re.UNICODE = letters + digits + underscore (= ExtendNumLet).
_LETTER = r"[^\W\d_]"
_DIGIT = r"\d"
TOKEN_RE = re.compile(
    rf"\w+"
    rf"(?:"
    rf"(?:(?<={_LETTER})[.':’·״‧](?={_LETTER})"  # WB6/WB7 (’ = MidNumLet)
    rf"|(?<={_DIGIT})[.,'’;٬](?={_DIGIT})"  # WB11/WB12
    rf")\w+"
    rf")*",
    re.UNICODE,
)

# ---------------------------------------------------------------- full path
_X = r"[\p{WB=Extend}\p{WB=Format}\p{WB=ZWJ}]*+"  # WB4 attachment, possessive
_SPECIAL = r"\p{Han}\p{Hiragana}\p{WB=Katakana}\p{Thai}\p{Lao}\p{Khmer}\p{Myanmar}"
_W = rf"[[\w\p{{WB=ALetter}}\p{{WB=Hebrew_Letter}}\p{{WB=Numeric}}\p{{WB=ExtendNumLet}}]--[{_SPECIAL}]]"
_L = rf"[[\p{{WB=ALetter}}\p{{WB=Hebrew_Letter}}]--[{_SPECIAL}]]"
_HL = r"\p{WB=Hebrew_Letter}"
_N = r"[\d\p{WB=Numeric}]"
_MIDL = r"[\p{WB=MidLetter}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_MIDN = r"[\p{WB=MidNum}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_DQ = r"\p{WB=Double_Quote}"
_ENL = r"\p{WB=ExtendNumLet}"
_KATA = r"\p{WB=Katakana}"
_SEA = r"[\p{Thai}\p{Lao}\p{Khmer}\p{Myanmar}]"
# A Katakana char may extend a word run only straight after ExtendNumLet or
# another Katakana (WB13/WB13a/WB13b): "abc_カタ" is one token, "abcカタ" two.
_CORE = rf"(?:{_W}{_X}|(?<=[\p{{WB=ExtendNumLet}}\p{{WB=Katakana}}]){_KATA}{_X})+"
_WORDSEG = (
    rf"{_CORE}"
    rf"(?:(?:(?<={_L}){_MIDL}(?={_L})"
    rf"|(?<={_N}){_MIDN}(?={_N})"
    rf"|(?<={_HL}){_DQ}(?={_HL})){_CORE})*"
)
TOKEN_FULL_RE = _rx.compile(
    rf"{_WORDSEG}"
    rf"|(?:{_KATA}{_X})+(?:{_ENL}{_CORE})*"
    rf"|{_SEA}+"
    rf"|\p{{Han}}{_X}"
    rf"|\p{{Hiragana}}{_X}",
    _rx.V1,
)

# Characters on which fast-path output could diverge from the full rules:
# marks / format chars (attach vs break), CJK + SEA scripts (single-char /
# run semantics), and any Mid* / ExtendNumLet / non-\\w ALetter / non-\\d
# Numeric codepoint beyond those the fast pattern already treats identically
# (ASCII plus · ״ ‧ ’ ٬). The authoritative definition is the
# property-class regex below; _DIVERGE_RANGES is that set precomputed into
# sorted codepoint ranges so the per-doc dispatch is a vectorized numpy
# range-membership check instead of a slow big-class regex scan
# (tests/test_tokenizer.py cross-checks the table against the regex).
_NEEDS_FULL = _rx.compile(
    rf"[[\p{{M}}\p{{Cf}}{_SPECIAL}"
    rf"\p{{WB=MidLetter}}\p{{WB=MidNum}}\p{{WB=MidNumLet}}\p{{WB=ExtendNumLet}}"
    rf"[\p{{WB=ALetter}}--[\w]][\p{{WB=Numeric}}--[\d]]]"
    rf"--[\x00-\x7F·״‧’٬]]",
    _rx.V1,
)

_DIVERGE_ENC = (
    "ad,b8,2c2-2c5,2d2-2d7,2de-2df,2e5-2eb,2ed,2ef-36f,37e,387,483-489,55a-55c,55e-55f,589-58a,591-5bd,5bf,5c1-5c2,5c4-5c5,5c7,5f3,600-605,60c-60d,610-61a,61c,64b-65f,66b,670,6d6-6dd,6df-6e4,6e7-6e8,6ea-6ed,70f,711,730-74a,7a6-7b0,7eb-7f3,7f8,7fd,816-819,81b-823,825-827,829-82d,859-85b,890-891,897-89f,8ca-903,93a-93c,93e-94f,951-957,962-963,981-983,9bc,9be-9c4,9c7-9c8,9cb-9cd,9d7,9e2-9e3,9fe,a01-a03,a3c,a3e-a42,a47-a48,a4b-a4d,a51,a70-a71,a75,a81-a83,abc,abe-ac5,ac7-ac9,acb-acd,ae2-ae3,afa-aff,b01-b03,b3c,b3e-b44,b47-b48,b4b-b4d,b55-b57,b62-b63,b82,bbe-bc2,bc6-bc8,bca-bcd,bd7,c00-c04,c3c,c3e-c44,c46-c48,c4a-c4d,c55-c56,c62-c63,c81-c83,cbc,cbe-cc4,cc6-cc8,cca-ccd,cd5-cd6,ce2-ce3,cf3,d00-d03,d3b-d3c,d3e-d44,d46-d48,d4a-d4d,d57,d62-d63,d81-d83,dca,dcf-dd4,dd6,dd8-ddf,df2-df3,e01-e3a,e40-e5b,e81-e82,e84,e86-e8a,e8c-ea3,ea5,ea7-ebd,ec0-ec4,ec6,ec8-ece,ed0-ed9,edc-edf,f18-f19,f35,f37,f39,f3e-f3f,f71-f84,f86-f87,f8d-f97,f99-fbc,fc6,1000-109f,135d-135f,1712-1715,1732-1734,1752-1753,1772-1773,1780-17dd,17e0-17e9,17f0-17f9,180b-180f,1885-1886,18a9,1920-192b,1930-193b,19da,19e0-19ff,1a17-1a1b,1a55-1a5e,1a60-1a7c,1a7f,1ab0-1add,1ae0-1aeb,1b00-1b04,1b34-1b44,1b6b-1b73,1b80-1b82,1ba1-1bad,1be6-1bf3,1c24-1c37,1cd0-1cd2,1cd4-1ce8,1ced,1cf4,1cf7-1cf9,1dc0-1dff,200b-200f,2018,2024,202a-202f,203f-2040,2044,2054,2060-2064,2066-206f,20d0-20f0,2cef-2cf1,2d7f,2de0-2dff,2e80-2e99,2e9b-2ef3,2f00-2fd5,3005,3007,3021-302f,3031-3035,3038-303b,3041-3096,3099-30fa,30fc-30ff,31f0-31ff,32d0-32fe,3300-3357,3400-4dbf,4e00-9fff,a66f-a672,a674-a67d,a69e-a69f,a6f0-a6f1,a708-a716,a720-a721,a789-a78a,a802,a806,a80b,a823-a827,a82c,a880-a881,a8b4-a8c5,a8e0-a8f1,a8ff,a926-a92d,a947-a953,a980-a983,a9b3-a9c0,a9e0-a9fe,aa29-aa36,aa43,aa4c-aa4d,aa60-aa7f,aab0,aab2-aab4,aab7-aab8,aabe-aabf,aac1,aaeb-aaef,aaf5-aaf6,ab5b,abe3-abea,abec-abed,f900-fa6d,fa70-fad9,fb1e,fe00-fe0f,fe13,fe20-fe2f,fe33-fe34,fe4d-fe50,fe52,fe54-fe55,feff,ff07,ff0c,ff0e,ff1a-ff1b,ff3f,ff66-ff9d,fff9-fffb,101fd,102e0,10376-1037a,10a01-10a03,10a05-10a06,10a0c-10a0f,10a38-10a3a,10a3f,10ae5-10ae6,10d24-10d27,10d69-10d6d,10eab-10eac,10efa-10eff,10f46-10f50,10f82-10f85,11000-11002,11038-11046,11070,11073-11074,1107f-11082,110b0-110ba,110bd,110c2,110cd,11100-11102,11127-11134,11145-11146,11173,11180-11182,111b3-111c0,111c9-111cc,111ce-111cf,1122c-11237,1123e,11241,112df-112ea,11300-11303,1133b-1133c,1133e-11344,11347-11348,1134b-1134d,11357,11362-11363,11366-1136c,11370-11374,113b8-113c0,113c2,113c5,113c7-113ca,113cc-113d0,113d2,113e1-113e2,11435-11446,1145e,114b0-114c3,115af-115b5,115b8-115c0,115dc-115dd,11630-11640,116ab-116b7,116d0-116e3,1171d-1172b,1182c-1183a,11930-11935,11937-11938,1193b-1193e,11940,11942-11943,119d1-119d7,119da-119e0,119e4,11a01-11a0a,11a33-11a39,11a3b-11a3e,11a47,11a51-11a5b,11a8a-11a99,11b60-11b67,11c2f-11c36,11c38-11c3f,11c92-11ca7,11ca9-11cb6,11d31-11d36,11d3a,11d3c-11d3d,11d3f-11d45,11d47,11d8a-11d8e,11d90-11d91,11d93-11d97,11ef3-11ef6,11f00-11f01,11f03,11f34-11f3a,11f3e-11f42,11f5a,13430-13440,13447-13455,1611e-1612f,16af0-16af4,16b30-16b36,16f4f,16f51-16f87,16f8f-16f92,16fe2-16fe4,16ff0-16ff6,1aff0-1aff3,1aff5-1affb,1affd-1affe,1b000-1b122,1b132,1b150-1b152,1b155,1b164-1b167,1bc9d-1bc9e,1bca0-1bca3,1cf00-1cf2d,1cf30-1cf46,1d165-1d169,1d16d-1d182,1d185-1d18b,1d1aa-1d1ad,1d242-1d244,1da00-1da36,1da3b-1da6c,1da75,1da84,1da9b-1da9f,1daa1-1daaf,1e000-1e006,1e008-1e018,1e01b-1e021,1e023-1e024,1e026-1e02a,1e08f,1e130-1e136,1e2ae,1e2ec-1e2ef,1e4ec-1e4ef,1e5ee-1e5ef,1e6e3,1e6e6,1e6ee-1e6ef,1e6f5,1e8d0-1e8d6,1e944-1e94a,1f200,20000-2a6df,2a700-2b81d,2b820-2cead,2ceb0-2ebe0,2ebf0-2ee5d,2f800-2fa1d,30000-3134a,31350-33479,e0001,e0020-e007f,e0100-e01ef"
)


def _decode_ranges(enc: str):
    import numpy as _np

    starts, ends = [], []
    for part in enc.split(","):
        a, _, b = part.partition("-")
        lo = int(a, 16)
        starts.append(lo)
        ends.append(int(b, 16) if b else lo)
    return _np.asarray(starts, dtype=_np.uint32), _np.asarray(ends, dtype=_np.uint32)


_DIV_STARTS, _DIV_ENDS = _decode_ranges(_DIVERGE_ENC)


def needs_full(text: str) -> bool:
    """True when this text may tokenize differently under the full UAX#29
    rules than under the fast pattern. Vectorized: utf-32 view + range
    searchsorted; Latin-1-only text short-circuits on two compares (the only
    divergent codepoints below U+02C2 are U+00AD and U+00B8)."""
    import numpy as _np

    arr = _np.frombuffer(text.encode("utf-32-le"), dtype=_np.uint32)
    if not len(arr):
        return False
    if int(arr.max()) < 0x2C2:
        return bool(_np.any((arr == 0xAD) | (arr == 0xB8)))
    idx = _np.searchsorted(_DIV_STARTS, arr, side="right")
    hit = idx > 0
    return bool(_np.any(hit & (arr <= _DIV_ENDS[_np.maximum(idx, 1) - 1])))


_fast_findall = TOKEN_RE.findall
_full_findall = TOKEN_FULL_RE.findall


def findall_tokens(text: str) -> list[str]:
    """Raw UAX#29 word tokens (no length cap), picking the fast path when it
    is provably identical to the full rules for this text."""
    if text.isascii() or not needs_full(text):
        return _fast_findall(text)
    return _full_findall(text)


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """UAX#29 word tokens, original case, over-long tokens split."""
    toks = findall_tokens(text)
    if any(len(t) > max_token_length for t in toks):
        out = []
        for t in toks:
            if len(t) <= max_token_length:
                out.append(t)
            else:
                out.extend(
                    t[i : i + max_token_length] for i in range(0, len(t), max_token_length)
                )
        return out
    return toks


def standard_analyze(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """``standard`` analyzer: tokenize then lowercase. Empty stopword set."""
    return [t.lower() for t in tokenize(text, max_token_length)]
