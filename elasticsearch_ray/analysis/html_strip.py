"""HTML-to-text extraction with Lucene ``HTMLStripCharFilter`` semantics.

Reference integration points:
  - ingest processor: ``modules/ingest-common/.../HtmlStripProcessor.java:27-44``
    (short-circuit: input lacking both '<' and '>' is returned unchanged,
    lines 29-31).
  - analysis char filter: ``modules/analysis-common/.../HtmlStripCharFilterFactory.java:24-40``
    (adds ``escaped_tags``).
  - golden fixture: ``modules/analysis-common/src/yamlRestTest/resources/
    rest-api-spec/test/analysis-common/50_char_filters.yml:3-14``:
    ``<html>test<yyy>foo</yyy></html>`` with escaped_tags [xxx, yyy]
    → ``"\ntest<yyy>foo</yyy>\n"``.

Semantics (Lucene 9.1 HTMLStripCharFilter, a JFlex scanner — re-expressed,
not transliterated):
  - A start/end/self-closing tag whose name is one of the HTML *inline*
    elements is deleted; any other tag (block-level, unknown, <br>) is
    replaced by a single "\n".
  - Tag names in ``escaped_tags`` pass through verbatim (attributes included).
  - <script>...</script> and <style>...</style> are removed wholesale and
    replaced by a single "\n" (their tag is non-inline).
  - Comments <!-- ... --> and <!...> declarations are deleted with no output.
  - <![CDATA[ ... ]]> markers are removed, content kept verbatim.
  - Character entities (&amp;, &#65;, &#x41;) are decoded. Named entities
    require the terminating ';' (we use the HTML5 table, a superset of the
    HTML4 table Lucene embeds — our corpus generator only emits HTML4 names).
  - All other characters, including whitespace, pass through unchanged
    (no collapsing, no trimming).

Implemented as a single compiled-regex scan (C-speed over the sparse special
constructs) rather than a char-at-a-time state machine.
"""

from __future__ import annotations

import html.entities
import re
from collections.abc import Iterable

import numpy as np
import pyarrow as pa

# Lucene HTMLStripCharFilter.jflex InlineElment set.
INLINE_ELEMENTS = frozenset(
    """a abbr acronym b basefont bdo big cite code dfn em font i img input kbd
    label q s samp select small span strike strong sub sup textarea tt u var""".split()
)

_SCANNER = re.compile(
    r"""
      (?P<comment><!--.*?(?:-->|$))
    | (?P<cdata><!\[CDATA\[(?P<cdata_body>.*?)(?:\]\]>|$))
    | (?P<decl><![^>]*>)
    | (?P<script><script\b[^>]*?>.*?(?:</script[^>]*>|$))
    | (?P<style><style\b[^>]*?>.*?(?:</style[^>]*>|$))
    | (?P<tag></?(?P<tagname>[a-zA-Z][a-zA-Z0-9:._-]*)(?:\s[^<>]*?)?/?>)
    | (?P<entity>&(?:\#(?P<dec>[0-9]{1,7});|\#[xX](?P<hex>[0-9a-fA-F]{1,6});|(?P<named>[a-zA-Z][a-zA-Z0-9]{1,30});))
    """,
    re.DOTALL | re.VERBOSE,
)

# HTML5 named entities that end in ';' (superset of Lucene's HTML4 table).
_ENTITIES = {k[:-1]: v for k, v in html.entities.html5.items() if k.endswith(";")}


def strip_html(text: str, escaped_tags: Iterable[str] = (), processor_mode: bool = False) -> str:
    """Strip HTML from one string per the semantics above.

    ``processor_mode=True`` reproduces the ingest-processor short-circuit
    (HtmlStripProcessor.java:29-31): input lacking '<' or '>' is returned
    unchanged, entities included. The analysis char filter (default) always
    decodes entities.
    """
    if "<" not in text or ">" not in text:
        if processor_mode or "&" not in text:
            return text
    escaped = {t.lower() for t in escaped_tags}

    inline = INLINE_ELEMENTS
    entities = _ENTITIES

    def repl(m: re.Match) -> str:
        # dispatch on lastgroup (the innermost matched name) — ONE attribute
        # read instead of probing every alternative's group (this callback
        # runs per construct and dominated build-time profiles)
        g = m.lastgroup
        if g == "tag":
            name = m.group("tagname").lower()
            if name in escaped:
                return m.group(0)
            return "" if name in inline else "\n"
        if g == "entity":
            dec = m.group("dec")
            if dec is not None:
                cp = int(dec)
                return chr(cp) if cp <= 0x10FFFF else "�"
            hx = m.group("hex")
            if hx is not None:
                cp = int(hx, 16)
                return chr(cp) if cp <= 0x10FFFF else "�"
            ent = entities.get(m.group("named"))
            return ent if ent is not None else m.group(0)
        if g == "comment" or g == "decl":
            return ""
        if g == "script" or g == "style":
            return "\n"
        if g == "cdata":
            return m.group("cdata_body")
        return m.group(0)  # pragma: no cover

    return _SCANNER.sub(repl, text)


class HtmlStripBatch:
    """Vectorized-over-batch html_strip: binary/string html column → text.

    Use as ``ds.map_batches(HtmlStripBatch(src="html", dst="text"),
    batch_format="pyarrow")``. Stateless but class-shaped so the compiled
    scanner and escaped-tag set are constructed once per worker.
    """

    def __init__(self, src: str = "html", dst: str = "text", escaped_tags: Iterable[str] = ()):
        self.src = src
        self.dst = dst
        self.escaped = tuple(escaped_tags)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.src]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = col.cast(pa.string())
        vals = col.to_pylist()
        esc = self.escaped
        out = pa.array([strip_html(v, esc) if v is not None else None for v in vals], pa.string())
        if self.dst in batch.column_names:
            batch = batch.drop_columns([self.dst])
        return batch.append_column(self.dst, out)
