"""Boilerplate removal (main-content extraction) for web-scale LLM
corpora — the jusText algorithm (Pomikálek, "Removing Boilerplate and
Duplicate Content from Web Corpora", PhD thesis 2011; the published
justext library's documented classifier), re-expressed as a streaming
``map_batches`` stage.

Algorithm (context-free pass, the thesis' §3.3 defaults):

1. Segment html into PARAGRAPHS at block-level tag boundaries
   (p/div/h1..h6/li/td/blockquote/pre + structural nav/header/footer/
   aside containers); script/style/comment content is dropped.
2. Per paragraph compute: text length (chars), stopword density (share
   of words in a small function-word list), link density (chars inside
   <a> / total chars).
3. Classify context-free:
   - link_density > MAX_LINK_DENSITY (0.2)            -> bad
   - len < LENGTH_LOW (70): bad if link_density > 0 else short
   - stopword density >= STOPWORDS_HIGH (0.32):
         len > LENGTH_HIGH (200) -> good, else near-good
   - stopword density >= STOPWORDS_LOW (0.30)         -> near-good
   - otherwise                                        -> bad
4. Context-sensitive pass: short/near-good paragraphs become good when
   an adjacent classified-good paragraph exists (the thesis' simplified
   neighbour rule), else bad. Paragraphs inside nav/header/footer/aside
   containers are bad outright (the library's -x structural rule).

Scale shape: pure per-row transform — one vectorized-per-batch
``map_batches`` (compiled regexes built once per worker via the module
constant), no shuffle, nothing materialized.
"""

from __future__ import annotations

import re

import pandas as pd

# a compact function-word list (the published justext English stoplist's
# highest-frequency entries — enough for density thresholds)
STOPWORDS = frozenset((
    "the a an and or but if then else of to in on at by for with from as "
    "is are was were be been being it its this that these those he she "
    "they we you i not no nor so too very can will just do does did has "
    "have had what which who whom where when why how all any both each "
    "few more most other some such only own same than").split())

LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_LINK_DENSITY = 0.2

_BLOCK_SPLIT = re.compile(
    r"(?is)<\s*/?\s*(?:p|div|h[1-6]|li|ul|ol|td|tr|table|blockquote|pre|"
    r"br|section|article|nav|header|footer|aside|body|html)\b[^>]*>")
_STRUCTURAL_OPEN = re.compile(r"(?is)<\s*(nav|header|footer|aside)\b[^>]*>")
_STRUCTURAL_CLOSE = re.compile(r"(?is)<\s*/\s*(nav|header|footer|aside)\s*>")
_DROP_CONTENT = re.compile(
    r"(?is)<\s*(script|style)\b[^>]*>.*?<\s*/\s*\1\s*>|<!--.*?-->")
_A_TEXT = re.compile(r"(?is)<\s*a\b[^>]*>(.*?)<\s*/\s*a\s*>")
_TAG = re.compile(r"(?s)<[^>]*>")
_WS = re.compile(r"\s+")


def _paragraphs(html: str) -> list[tuple[str, float, bool]]:
    """[(text, link_density, structural)] — segmentation at block tags,
    tracking whether the segment sits inside a nav/header/footer/aside
    container."""
    html = _DROP_CONTENT.sub(" ", html or "")
    out = []
    depth = 0
    pos = 0
    for m in _BLOCK_SPLIT.finditer(html):
        seg = html[pos:m.start()]
        out.append((seg, depth > 0))
        tag = m.group(0)
        if _STRUCTURAL_OPEN.match(tag):
            depth += 1
        elif _STRUCTURAL_CLOSE.match(tag):
            depth = max(depth - 1, 0)
        pos = m.end()
    out.append((html[pos:], depth > 0))
    paras = []
    for seg, structural in out:
        link_chars = sum(len(_WS.sub(" ", _TAG.sub(" ", t)).strip())
                         for t in _A_TEXT.findall(seg))
        text = _WS.sub(" ", _TAG.sub(" ", seg)).strip()
        if not text:
            continue
        paras.append((text, link_chars / max(len(text), 1), structural))
    return paras


def _classify(paras) -> list[str]:
    labels = []
    for text, link_density, structural in paras:
        if structural:
            labels.append("bad")
            continue
        words = text.lower().split()
        sw = (sum(1 for w in words if w in STOPWORDS) / len(words)
              if words else 0.0)
        if link_density > MAX_LINK_DENSITY:
            labels.append("bad")
        elif len(text) < LENGTH_LOW:
            labels.append("bad" if link_density > 0 else "short")
        elif sw >= STOPWORDS_HIGH:
            labels.append("good" if len(text) > LENGTH_HIGH else "neargood")
        elif sw >= STOPWORDS_LOW:
            labels.append("neargood")
        else:
            labels.append("bad")
    # context pass: short/neargood join an adjacent good block
    final = list(labels)
    for i, lab in enumerate(labels):
        if lab in ("short", "neargood"):
            prev_good = i > 0 and labels[i - 1] == "good"
            next_good = i + 1 < len(labels) and labels[i + 1] == "good"
            final[i] = "good" if (prev_good or next_good) else "bad"
    return final


def extract_content(html: str) -> str:
    """Main content of one page: the good paragraphs joined by newlines."""
    paras = _paragraphs(html)
    labels = _classify(paras)
    return "\n".join(p[0] for p, lab in zip(paras, labels) if lab == "good")


def paragraph_labels(html: str) -> list[tuple[str, str]]:
    """[(paragraph_text, label)] — the classifier's full verdict (debug /
    test surface)."""
    paras = _paragraphs(html)
    return [(p[0], lab) for p, lab in zip(paras, _classify(paras))]


def remove_boilerplate(ds, html_col: str = "html",
                       out_col: str = "content"):
    """Dataset stage: append the extracted main-content column."""
    def ex(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = [extract_content(h) for h in df[html_col]]
        return df

    return ds.map_batches(ex, batch_format="pandas")
