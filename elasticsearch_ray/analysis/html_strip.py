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


def _strip_html_scanner(text: str, escaped_tags: Iterable[str] = ()) -> str:
    """Reference implementation: one scanner pass with a per-match callback.
    Kept as the semantics oracle and the fallback for inputs the split-walk
    fast path excludes (CDATA sections, NUL bytes)."""
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


# ---------------------------------------------------------------------------
# Split-walk fast path — byte-identical to the scanner (property-tested), but
# ~2.5-3x faster: one C-level str.split('<') replaces the scanner's per-
# position alternation, and per-tag classification is a dict hit after the
# first occurrence. This is the hottest UDF of the whole build pipeline
# (ds.stats(): tokenize ≈ strip_html + analyzer), so it's worth the care.
#
# Exactness notes (each mirrors a no-rescan property of re.sub):
#   - Entities are decoded PER SEGMENT (text between constructs), never
#     across a removed construct's junction: "&am<b>p;" must stay "&amp;"
#     undecoded, exactly like the scanner (which never rescans output).
#   - Comments/declarations are replaced by a \x00 sentinel first, so their
#     removal cannot join neighbors into new-looking tags or entities; the
#     sentinel is stripped at the very end. Inputs that already contain \x00
#     (or any CDATA section, whose body must pass through verbatim and
#     unparsed) fall back to the scanner.
#   - Tag validation excludes \x00 from attributes so a sentinel inside a
#     would-be tag (e.g. "<div <!--c--> x>") keeps it unparsed, like the
#     scanner, whose attr class [^<>] can never cross the comment's '<'.
# ---------------------------------------------------------------------------

_PRE = re.compile(
    r"""
      (?P<comment><!--.*?(?:-->|$))
    | (?P<decl><![^>]*>)
    | (?P<script><script\b[^>]*?>.*?(?:</script[^>]*>|$))
    | (?P<style><style\b[^>]*?>.*?(?:</style[^>]*>|$))
    """,
    re.DOTALL | re.VERBOSE,
)

_TAG_VALID = re.compile(r"/?([a-zA-Z][a-zA-Z0-9:._-]*)(?:\s[^<>\x00]*)?/?$")
_ENTITY_RE = re.compile(
    r"&(?:\#(?P<dec>[0-9]{1,7});|\#[xX](?P<hex>[0-9a-fA-F]{1,6});"
    r"|(?P<named>[a-zA-Z][a-zA-Z0-9]{1,30});)"
)


def _pre_repl(m: re.Match) -> str:
    g = m.lastgroup
    if g == "script" or g == "style":
        # the sentinel prefix stops a stray '<name' on the left from joining
        # with a '>' on the right into a tag the scanner never saw ('\n'
        # alone is valid inside tag attrs); stripped at the end, leaving '\n'
        return "\x00\n"
    return "\x00"  # comment / decl: deleted, sentinel blocks junctions


def _pre_pass(text: str) -> str:
    """Remove comment/decl/script/style blocks, locating candidates with
    C-level str.find and attempting the (anchored) regex only there — the
    full-regex scan over every document was the dominant cost of the sub()
    form. Leftmost-construct order is preserved by taking min() over the
    candidate starts, which is exactly the scanner's leftmost-match rule."""
    out = []
    ap = out.append
    find = text.find
    match = _PRE.match
    pos = 0
    n = len(text)
    while pos < n:
        nxt = -1
        for needle in ("<!", "<script", "<style"):
            k = find(needle, pos)
            if k >= 0 and (nxt < 0 or k < nxt):
                nxt = k
        if nxt < 0:
            break
        m = match(text, nxt)
        if m is None:
            # candidate prefix but the construct doesn't parse (e.g.
            # unterminated decl, <scripty>): keep the char, search onward —
            # exactly the scanner's advance-by-one on a failed position
            ap(text[pos : nxt + 1])
            pos = nxt + 1
            continue
        ap(text[pos:nxt])
        ap(_pre_repl(m))
        pos = m.end()
    ap(text[pos:])
    return "".join(out)


def _entity_repl(m: re.Match) -> str:
    dec = m.group("dec")
    if dec is not None:
        cp = int(dec)
        return chr(cp) if cp <= 0x10FFFF else "�"
    hx = m.group("hex")
    if hx is not None:
        cp = int(hx, 16)
        return chr(cp) if cp <= 0x10FFFF else "�"
    ent = _ENTITIES.get(m.group("named"))
    return ent if ent is not None else m.group(0)


_STRAY = object()  # cache value: not a tag — keep '<'+piece, entity-decode all
_KEEP = object()  # cache value: escaped tag — keep verbatim, no entity decode
_MISS = object()  # cache-miss marker
# {escaped_tags: {inner_tag_text: replacement}}; tag vocab is tiny in practice
_TAG_CACHE: dict[tuple, dict] = {}


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
        if "<" not in text:  # only entities can match
            return _ENTITY_RE.sub(_entity_repl, text)
        # '<' without '>': unterminated comments/CDATA can still match —
        # fall through to the general path
    if "\x00" in text or "<![CDATA[" in text:
        return _strip_html_scanner(text, escaped_tags)
    if "<!" in text or "<script" in text or "<style" in text:
        text = _pre_pass(text)
    if escaped_tags:
        esc_key = tuple(sorted({t.lower() for t in escaped_tags}))
    else:
        esc_key = ()
    cache = _TAG_CACHE.get(esc_key)
    if cache is None:
        cache = _TAG_CACHE[esc_key] = {}
    elif len(cache) > 65536:
        cache.clear()
    escaped, inline = esc_key, INLINE_ELEMENTS
    ent_sub, ent_repl = _ENTITY_RE.sub, _entity_repl
    cache_get, valid = cache.get, _TAG_VALID.fullmatch
    miss, stray, keep = _MISS, _STRAY, _KEEP

    parts = text.split("<")
    seg = parts[0]
    out = [ent_sub(ent_repl, seg) if "&" in seg else seg]
    ap = out.append
    for p in parts[1:]:
        j = p.find(">")
        if j >= 0:
            tag = p[:j]
            rep = cache_get(tag, miss)
            if rep is miss:
                m = valid(tag)
                if m is None:
                    rep = stray
                else:
                    name = m.group(1).lower()
                    rep = keep if name in escaped else ("" if name in inline else "\n")
                cache[tag] = rep
            if rep is stray:
                seg = "<" + p  # no construct: scanner keeps it, decodes inside
                ap(ent_sub(ent_repl, seg) if "&" in seg else seg)
            elif rep is keep:
                ap("<")
                ap(tag)
                ap(">")
                seg = p[j + 1:]
                ap(ent_sub(ent_repl, seg) if "&" in seg else seg)
            else:
                ap(rep)
                seg = p[j + 1:]
                ap(ent_sub(ent_repl, seg) if "&" in seg else seg)
        else:
            seg = "<" + p
            ap(ent_sub(ent_repl, seg) if "&" in seg else seg)
    s = "".join(out)
    return s.replace("\x00", "") if "\x00" in s else s


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
