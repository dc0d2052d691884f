"""``annotated_text`` field type — inline entity annotations.

Reference semantics: ``plugins/mapper-annotated-text/.../
AnnotatedTextFieldMapper.java``:

- markdown-like syntax ``[visible text](value1&value2)``
  (``markdownPattern``, :158); values are URL-decoded, ``key=value``
  pairs rejected (:175-180), empty values dropped;
- the PLAIN text (markup stripped) is what the base analyzer tokenizes —
  offsets/positions line up with the visible text;
- each annotation value is injected as ONE token (spaces preserved) at
  the position of the FIRST token of its span (AnnotationsInjector:
  position increment 0), so phrases spanning the annotated words still
  match and the annotation itself is searchable as an exact term.

Divergences (documented):
- Lucene's norm discounts position-increment-0 tokens
  (``discountOverlaps``); this engine's field length counts every
  emitted token, so scores on annotated fields use the slightly larger
  dl consistently on both the engine and any oracle twin.
- segments are tokenized independently (the analyzer protocol carries no
  character offsets), so an annotation boundary falling MID-word splits
  that word into two tokens, where the reference tokenizes the
  reconstructed plain text; word-aligned annotations — the format's
  documented shape — behave identically. In-segment stopword holes are
  preserved; the hole BETWEEN two segments collapses to the segment
  boundary.

Registered as the ``annotated_text`` analyzer, so ``IndexSpec(
analyzer="annotated_text")`` (or a per-field analyzer) just works —
the token stream travels through the ordinary distributed build.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

from elasticsearch_ray.analysis.analyzers import Analyzer, register

_MARKDOWN = re.compile(r"\[([^]\[]*)]\(([^)(]*)\)")  # :158


def parse_annotations(text_plus_markup: str) -> tuple[str, list]:
    """AnnotatedText.parse: (plain_text, [(char_start, char_end,
    [values])]) with reference validation."""
    plain = []
    spans = []
    last = 0
    length = 0
    for m in _MARKDOWN.finditer(text_plus_markup):
        if m.start() > last:
            seg = text_plus_markup[last:m.start()]
            plain.append(seg)
            length += len(seg)
        start = length
        visible = m.group(1)
        plain.append(visible)
        length += len(visible)
        last = m.end()
        values = []
        for pair in m.group(2).split("&"):
            if "=" in pair:
                raise ValueError(
                    "key=value pairs are not supported in annotations")
            v = unquote(pair)
            if v:
                values.append(v)
        if values:
            spans.append((start, length, values))
    if last < len(text_plus_markup):
        plain.append(text_plus_markup[last:])
    return "".join(plain), spans


class AnnotatedTextAnalyzer(Analyzer):
    """Tokenize segment-by-segment with the base analyzer, injecting each
    span's annotation values at the span's first token position
    (increment 0). Spans with no surviving base tokens still occupy one
    position (the annotation token alone)."""

    def __init__(self, base: str = "standard"):
        from elasticsearch_ray.analysis.analyzers import get_analyzer

        self.base = get_analyzer(base)

    def __call__(self, text: str):
        plain, spans = parse_annotations(text or "")
        tokens: list[str] = []
        positions: list[int] = []
        pos = 0
        cursor = 0

        def emit(segment: str) -> int:
            """Run the base analyzer on one segment, PRESERVING its
            position holes (stopword gaps) offset by the running
            counter (review r5 #7); returns positions consumed."""
            nonlocal pos
            toks, p = self.base(segment)
            tokens.extend(toks)
            positions.extend(pos + int(x) for x in p)
            used = (int(p[-1]) + 1) if len(p) else 0
            pos += used
            return used

        for start, end, values in spans:
            if start > cursor:
                emit(plain[cursor:start])
            anchor = pos
            used = emit(plain[start:end])
            if used == 0:
                pos += 1  # empty span: the annotation takes one position
            for v in values:
                tokens.append(v)
                positions.append(anchor)
            cursor = end
        if cursor < len(plain):
            emit(plain[cursor:])
        return tokens, positions


register("annotated_text", AnnotatedTextAnalyzer)
