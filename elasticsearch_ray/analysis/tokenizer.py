"""Standard tokenizer — UAX#29 word-break + lowercase, max_token_length=255.

Reference: the default analyzer is ``standard`` with an EMPTY stopword set and
``max_token_length=255`` (``server/.../index/analysis/StandardAnalyzerProvider.java:21-28``,
registry default at ``index/analysis/AnalysisRegistry.java:634-646``). Its
Lucene-level semantics are the UAX#29 word-break rules followed by a
lowercase filter.

We implement the UAX#29 segmentation rules that matter for Latin-script /
numeric text as a single compiled regex (documented subset — full Unicode
class coverage for CJK/Hangul syllable types is out of scope for this corpus):

  - A token is a maximal run of word characters (Unicode letters, digits,
    underscore = ExtendNumLet, which joins freely: WB13a/WB13b).
  - MidLetter (:) / MidNumLet (. ') do not break letter·X·letter (WB6/WB7),
    so "can't", "john.doe", "a:b" are single tokens.
  - MidNum (, ;) / MidNumLet (. ') do not break digit·X·digit (WB11/WB12),
    so "3.14", "1,000" are single tokens.
  - Everything else (space, hyphen, @, /, …) breaks.

Tokens longer than ``max_token_length`` are split at that length (Lucene
StandardTokenizer behavior). Lowercasing is per-codepoint ``str.lower()``
(matches Lucene LowerCaseFilter for the scripts in scope).
"""

from __future__ import annotations

import re

MAX_TOKEN_LENGTH = 255

# \w with re.UNICODE = letters + digits + underscore (+ combining marks).
_LETTER = r"[^\W\d_]"
_DIGIT = r"\d"
TOKEN_RE = re.compile(
    rf"\w+"
    rf"(?:"
    rf"(?:(?<={_LETTER})[.':\u2019·״‧](?={_LETTER})"  # WB6/WB7 (’ = MidNumLet)
    rf"|(?<={_DIGIT})[.,'\u2019;٬](?={_DIGIT})"  # WB11/WB12
    rf")\w+"
    rf")*",
    re.UNICODE,
)


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """UAX#29-subset word tokens, original case, over-long tokens split."""
    toks = TOKEN_RE.findall(text)
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
