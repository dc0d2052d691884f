"""``_text_structure/find_structure`` API (x-pack text-structure:
``structurefinder/TextStructureFinderManager.java``,
``DelimitedTextStructureFinder.java``, ``NdJsonTextStructureFinder.java``,
``XmlTextStructureFinder.java``, ``LogTextStructureFinder.java``,
``TimestampFormatFinder.java``, ``FieldStatsCalculator.java``).

Determines the structure of a text sample by trying finder factories in
the reference's order:

1. **ndjson** — every non-blank line parses as a JSON object;
2. **xml** — sample starts with ``<`` and parses as (a sequence of)
   XML documents with a common root element;
3. **delimited** — candidate (delimiter, min columns) pairs in the
   reference's order: ``(',', 2) ('\\t', 2) (';', 4) ('|', 5)``; a
   candidate fits when every sample line splits (csv-quoted) into a
   consistent number >= min of columns. Header detection follows
   ``findHeaderFromSample``: duplicate non-empty first-row values →
   no header; < 3 rows → assume header; otherwise the first row is a
   header when it is UNUSUAL by the length test (outside the other
   rows' range ± range/10) or the fieldwise-Levenshtein test (first
   row's mean distance to others > 1.2 x others' mean pairwise
   distance, long fields masked out);
4. **semi_structured_text** (log) fallback — lines grouped into
   messages starting at timestamp hits.

Column mappings follow TextStructureUtils.guessMappings order
(boolean → long → double → date → keyword/text); timestamp detection
covers the common TimestampFormatFinder formats: ISO8601 (with/without
fraction and zone), ``yyyy-MM-dd HH:mm:ss[,SSS]``, apache
``dd/MMM/yyyy:HH:mm:ss Z``, syslog ``EEE MMM d HH:mm:ss yyyy``, and
UNIX / UNIX_MS epochs. ``field_stats`` mirrors FieldStatsCalculator:
count, cardinality, min/max for numerics, top-10 terms by count
(count desc, value asc).

This is a coordinator-side operation in the reference too (it reads
the first lines of an uploaded sample, never the whole index).
"""

from __future__ import annotations

import csv
import io
import json
import re

import pandas as pd

DELIMITER_CANDIDATES = [(",", 2), ("\t", 2), (";", 4), ("|", 5)]
LONG_FIELD_THRESHOLD = 100
MAX_LEVENSHTEIN_COMPARISONS = 100

TIMESTAMP_FORMATS = [
    ("ISO8601",
     r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d{1,9})?"
     r"(?:Z|[+-]\d{2}:?\d{2})?"),
    ("yyyy-MM-dd HH:mm:ss,SSS",
     r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}"),
    ("dd/MMM/yyyy:HH:mm:ss XX",
     r"\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}"),
    ("EEE MMM dd HH:mm:ss yyyy",
     r"[A-Z][a-z]{2} [A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2} \d{4}"),
    ("UNIX_MS", r"\d{13}"),
    ("UNIX", r"\d{10}"),
]
_TS_RES = [(name, re.compile(rx)) for name, rx in TIMESTAMP_FORMATS]
_TS_FULL = [(name, re.compile(rx + r"\Z")) for name, rx in TIMESTAMP_FORMATS]

_BOOL = {"true", "false"}


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fieldwise_distance(r1: list, r2: list, mask: list[bool]) -> int:
    n = max(len(r1), len(r2))
    total = 0
    for i in range(n):
        if i < len(mask) and not mask[i]:
            continue
        a = r1[i] if i < len(r1) else ""
        b = r2[i] if i < len(r2) else ""
        total += _levenshtein(a or "", b or "")
    return total


def timestamp_format_of(value: str) -> str | None:
    """Full-match timestamp format name of ``value``, if any."""
    v = value.strip()
    for name, rx in _TS_FULL:
        if rx.match(v):
            return name
    return None


def _detect_header(rows: list[list[str]]) -> bool:
    first = rows[0]
    non_empty = [v for v in first if v]
    if len(set(non_empty)) != len(non_empty):
        return False  # duplicate non-empty values -> not a header
    if len(rows) < 3:
        return True  # too little data - guess it is
    # length test
    first_len = len("".join(v or "" for v in first))
    other_lens = [len("".join(v or "" for v in r)) for r in rows[1:]]
    rng = max(other_lens) - min(other_lens)
    if first_len < min(other_lens) - rng / 10.0 \
            or first_len > max(other_lens) + rng / 10.0:
        return True
    # fieldwise Levenshtein test over short fields only
    width = max(len(r) for r in rows)
    mask = [all(len(r[i] or "") < LONG_FIELD_THRESHOLD
                for r in rows if i < len(r)) for i in range(width)]
    others = rows[1:]
    first_stats = [_fieldwise_distance(first, r, mask)
                   for r in others[:MAX_LEVENSHTEIN_COMPARISONS]]
    pair_stats = []
    for i in range(len(others)):
        if len(pair_stats) >= MAX_LEVENSHTEIN_COMPARISONS:
            break
        for j in range(i + 1, len(others)):
            if len(pair_stats) >= MAX_LEVENSHTEIN_COMPARISONS:
                break
            pair_stats.append(_fieldwise_distance(others[i], others[j],
                                                  mask))
    if first_stats and pair_stats:
        return (sum(first_stats) / len(first_stats)
                > 1.2 * (sum(pair_stats) / len(pair_stats)))
    return False


def guess_mapping(values: list[str]) -> str:
    """TextStructureUtils.guessMappings order: boolean, long, double,
    date, keyword (<= 256 chars) else text."""
    vals = [v for v in values if v not in (None, "")]
    if not vals:
        return "keyword"
    if all(v.strip().lower() in _BOOL for v in vals):
        return "boolean"
    try:
        for v in vals:
            int(v.strip())
        return "long"
    except ValueError:
        pass
    try:
        for v in vals:
            float(v.strip())
        return "double"
    except ValueError:
        pass
    fmts = {timestamp_format_of(v) for v in vals}
    if None not in fmts and len(fmts) == 1:
        return "date"
    if max(len(v) for v in vals) <= 256:
        return "keyword"
    return "text"


def _field_stats(values: list[str], mapping: str) -> dict:
    vals = [v for v in values if v not in (None, "")]
    stats = {"count": len(vals), "cardinality": len(set(vals))}
    if mapping in ("long", "double") and vals:
        nums = [float(v) for v in vals]
        stats["min_value"] = min(nums)
        stats["max_value"] = max(nums)
    top = pd.Series(vals).value_counts()
    # count desc, value asc — the reference's top_hits ordering
    items = sorted(top.items(), key=lambda kv: (-kv[1], str(kv[0])))[:10]
    stats["top_hits"] = [{"value": v, "count": int(c)} for v, c in items]
    return stats


def _try_ndjson(lines: list[str]):
    objs = []
    for ln in lines:
        try:
            o = json.loads(ln)
        except json.JSONDecodeError:
            return None
        if not isinstance(o, dict):
            return None
        objs.append(o)
    return objs if objs else None


def _try_xml(sample: str):
    if not sample.lstrip().startswith("<"):
        return None
    import xml.etree.ElementTree as ET

    docs = []
    # split the sample into top-level documents at >\n< boundaries
    try:
        root_names = set()
        for doc in re.split(r"(?<=>)\s*\n(?=<)", sample.strip()):
            el = ET.fromstring(doc)
            root_names.add(el.tag)
            docs.append(el)
        if not docs or len(root_names) != 1:
            return None
        return docs
    except ET.ParseError:
        return None


def _try_delimited(lines: list[str]):
    for delim, min_cols in DELIMITER_CANDIDATES:
        try:
            rows = list(csv.reader(io.StringIO("\n".join(lines)),
                                   delimiter=delim, quotechar='"'))
        except csv.Error:
            continue
        rows = [r for r in rows if r]
        if len(rows) < 2:
            continue
        widths = {len(r) for r in rows}
        if len(widths) == 1 and widths.pop() >= min_cols:
            return delim, rows
    return None


def find_structure(sample: str, line_limit: int = 1000,
                   timestamp_field: str | None = None) -> dict:
    """Analyze ``sample`` (the first ``line_limit`` lines are used, like
    the reference's TextStructureFinderManager) and return the
    structure: format, columns, mappings, timestamp info, field
    stats."""
    all_lines = [ln for ln in sample.splitlines() if ln.strip()]
    lines = all_lines[:line_limit]
    if not lines:
        raise ValueError("argument must contain data")

    objs = _try_ndjson(lines)
    if objs is not None:
        df = pd.DataFrame(objs)
        return _structure_from_frame(df, {"format": "ndjson",
                                          "num_lines_analyzed": len(lines)},
                                     timestamp_field)

    xml_docs = _try_xml("\n".join(lines))
    if xml_docs is not None:
        rows = [{c.tag: (c.text or "") for c in doc} for doc in xml_docs]
        df = pd.DataFrame(rows)
        return _structure_from_frame(
            df, {"format": "xml", "num_lines_analyzed": len(lines)},
            timestamp_field)

    delim = _try_delimited(lines)
    if delim is not None:
        delimiter, rows = delim
        has_header = _detect_header(rows)
        if has_header:
            names = [v if v else f"column{i + 1}"
                     for i, v in enumerate(rows[0])]
            data = rows[1:]
        else:
            names = [f"column{i + 1}" for i in range(len(rows[0]))]
            data = rows
        df = pd.DataFrame(data, columns=names)
        base = {"format": "delimited", "delimiter": delimiter,
                "quote": '"', "has_header_row": has_header,
                "column_names": names,
                "num_lines_analyzed": len(lines)}
        return _structure_from_frame(df, base, timestamp_field)

    # semi-structured log fallback: messages start at timestamp hits
    fmt_name, n_msgs, first_ts = None, 0, None
    for name, rx in _TS_RES:
        hits = [ln for ln in lines if rx.search(ln)]
        if len(hits) > n_msgs:
            fmt_name, n_msgs = name, len(hits)
            first_ts = rx.search(hits[0]).group(0)
    out = {"format": "semi_structured_text",
           "num_lines_analyzed": len(lines),
           "num_messages_analyzed": n_msgs or len(lines),
           "mappings": {"message": "text"}}
    if fmt_name:
        out["timestamp_field"] = "timestamp"
        out["java_timestamp_formats"] = [fmt_name]
        out["sample_timestamp"] = first_ts
        out["grok_pattern"] = _grok_for(fmt_name)
    return out


def _grok_for(fmt_name: str) -> str:
    # GrokPatternCreator subset: anchor on the detected timestamp only
    token = {"ISO8601": "%{TIMESTAMP_ISO8601:timestamp}",
             "UNIX": "%{NUMBER:timestamp}",
             "UNIX_MS": "%{NUMBER:timestamp}",
             "dd/MMM/yyyy:HH:mm:ss XX": "%{HTTPDATE:timestamp}",
             "EEE MMM dd HH:mm:ss yyyy": "%{DATESTAMP_OTHER:timestamp}",
             }.get(fmt_name, "%{TIMESTAMP_ISO8601:timestamp}")
    return f".*?{token}.*"


def _structure_from_frame(df: pd.DataFrame, base: dict,
                          timestamp_field: str | None) -> dict:
    mappings, stats = {}, {}
    for col in df.columns:
        # heterogeneous ndjson/xml keys surface as None OR float NaN
        # (pandas fill) — both are "absent", never the string 'nan'
        values = ["" if v is None or (isinstance(v, float) and v != v)
                  else str(v) for v in df[col].tolist()]
        mappings[col] = guess_mapping(values)
        stats[col] = _field_stats(values, mappings[col])
    base["mappings"] = mappings
    base["field_stats"] = stats
    ts_field = timestamp_field
    if ts_field is None:
        for col, m in mappings.items():
            if m == "date":
                ts_field = col
                break
    if ts_field is not None and mappings.get(ts_field) == "date":
        vals = [str(v) for v in df[ts_field].tolist() if str(v)]
        base["timestamp_field"] = ts_field
        base["java_timestamp_formats"] = [timestamp_format_of(vals[0])]
    return base
