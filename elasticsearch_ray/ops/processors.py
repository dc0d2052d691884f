"""Ingest processors — the per-record transform chain that runs before
indexing (SURVEY §2.2; registry ``modules/ingest-common/.../
IngestCommonPlugin.java:57-89``, executed by ``ingest/IngestService.java:603``).

Each processor is a vectorized batch transform (pandas DataFrame in/out for
string kernels); a ``Pipeline`` composes them and is applied with ONE
``ds.map_batches(pipeline, batch_format="pandas")`` stage preceding any index
build or sink — mirroring how the reference runs the whole processor chain on
a doc before it reaches the shard.

Implemented (name → reference processor): set, append, rename, remove,
lowercase, uppercase, trim, gsub, split, join, convert, json, kv, urldecode,
bytes, fingerprint, drop, date, uri_parts, registered_domain, html_strip,
dissect (subset), script (python callable = the Painless analog).
"""

from __future__ import annotations

import hashlib
import json as _json
import re
import urllib.parse

import numpy as np
import pandas as pd

from elasticsearch_ray.analysis.html_strip import strip_html

_REGISTRY: dict[str, type] = {}


def register(name):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


class Processor:
    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        raise NotImplementedError


@register("set")
class SetProcessor(Processor):
    def __init__(self, field, value):
        self.field, self.value = field, value

    def __call__(self, df):
        df[self.field] = self.value
        return df


@register("append")
class AppendProcessor(Processor):
    """Append to a list field (creates it if missing)."""

    def __init__(self, field, value):
        self.field, self.value = field, value

    def __call__(self, df):
        if self.field in df:
            df[self.field] = df[self.field].map(
                lambda v: (list(v) if isinstance(v, (list, np.ndarray)) else [v]) + [self.value]
            )
        else:
            df[self.field] = [[self.value]] * len(df)
        return df


@register("rename")
class RenameProcessor(Processor):
    def __init__(self, field, target_field):
        self.field, self.target = field, target_field

    def __call__(self, df):
        return df.rename(columns={self.field: self.target})


@register("remove")
class RemoveProcessor(Processor):
    def __init__(self, field):
        self.fields = [field] if isinstance(field, str) else list(field)

    def __call__(self, df):
        return df.drop(columns=[f for f in self.fields if f in df.columns])


@register("lowercase")
class LowercaseProcessor(Processor):
    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        df[self.field] = df[self.field].str.lower()
        return df


@register("uppercase")
class UppercaseProcessor(Processor):
    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        df[self.field] = df[self.field].str.upper()
        return df


@register("trim")
class TrimProcessor(Processor):
    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        df[self.field] = df[self.field].str.strip()
        return df


@register("gsub")
class GsubProcessor(Processor):
    def __init__(self, field, pattern, replacement):
        self.field, self.re, self.repl = field, re.compile(pattern), replacement

    def __call__(self, df):
        df[self.field] = df[self.field].str.replace(self.re, self.repl, regex=True)
        return df


@register("split")
class SplitProcessor(Processor):
    def __init__(self, field, separator):
        self.field, self.sep = field, separator

    def __call__(self, df):
        df[self.field] = df[self.field].str.split(self.sep)
        return df


@register("join")
class JoinProcessor(Processor):
    def __init__(self, field, separator):
        self.field, self.sep = field, separator

    def __call__(self, df):
        df[self.field] = df[self.field].str.join(self.sep)
        return df


@register("convert")
class ConvertProcessor(Processor):
    _types = {"integer": "int64", "long": "int64", "float": "float64", "double": "float64",
              "string": "string", "boolean": "bool"}

    def __init__(self, field, type):
        self.field, self.type = field, self._types[type]

    def __call__(self, df):
        df[self.field] = df[self.field].astype(self.type)
        return df


@register("json")
class JsonProcessor(Processor):
    """Parse a JSON string field into a dict (or expand into columns)."""

    def __init__(self, field, target_field=None, add_to_root=False):
        self.field, self.target, self.add_to_root = field, target_field, add_to_root

    def __call__(self, df):
        parsed = df[self.field].map(lambda s: _json.loads(s) if s else {})
        if self.add_to_root:
            expanded = pd.json_normalize(parsed)
            expanded.index = df.index
            for c in expanded.columns:
                df[c] = expanded[c]
        else:
            df[self.target or self.field] = parsed
        return df


@register("kv")
class KvProcessor(Processor):
    """key=value pair extraction (KeyValueProcessor)."""

    def __init__(self, field, field_split, value_split, target_field=None):
        self.field, self.fs, self.vs, self.target = field, field_split, value_split, target_field

    def __call__(self, df):
        def parse(s):
            out = {}
            for part in (s or "").split(self.fs):
                if self.vs in part:
                    k, v = part.split(self.vs, 1)
                    out[k] = v
            return out

        df[self.target or self.field] = df[self.field].map(parse)
        return df


@register("urldecode")
class UrlDecodeProcessor(Processor):
    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        df[self.field] = df[self.field].map(lambda s: urllib.parse.unquote(s) if s else s)
        return df


@register("bytes")
class BytesProcessor(Processor):
    """'1kb' → 1024 (BytesProcessor)."""

    _units = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}
    _re = re.compile(r"^\s*([\d.]+)\s*([a-zA-Z]+)\s*$")

    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        def conv(s):
            m = self._re.match(str(s))
            if not m:
                raise ValueError(f"cannot parse bytes {s!r}")
            return int(float(m.group(1)) * self._units[m.group(2).lower()])

        df[self.field] = df[self.field].map(conv)
        return df


@register("fingerprint")
class FingerprintProcessor(Processor):
    """Stable doc hash over selected fields (FingerprintProcessor)."""

    def __init__(self, fields, target_field="fingerprint"):
        self.fields, self.target = list(fields), target_field

    def __call__(self, df):
        joined = df[self.fields].astype(str).agg("\x1f".join, axis=1)
        df[self.target] = joined.map(lambda s: hashlib.sha1(s.encode()).hexdigest())
        return df


@register("drop")
class DropProcessor(Processor):
    """Conditional row drop — the one filtering processor (DropProcessor);
    condition is a vectorized pandas predicate."""

    def __init__(self, condition):
        self.condition = condition

    def __call__(self, df):
        return df[~self.condition(df)]


@register("date")
class DateProcessor(Processor):
    def __init__(self, field, target_field="@timestamp", format=None):
        self.field, self.target, self.fmt = field, target_field, format

    def __call__(self, df):
        df[self.target] = pd.to_datetime(df[self.field], format=self.fmt)
        return df


@register("date_index_name")
class DateIndexNameProcessor(Processor):
    """Route docs to time-bucketed index names (DateIndexNameProcessor):
    date field → '<prefix>-<rounded date>' per date_rounding (y/M/d/h)."""

    _fmt = {"y": "%Y", "M": "%Y-%m", "d": "%Y-%m-%d", "h": "%Y-%m-%d-%H"}

    def __init__(self, field, index_name_prefix, date_rounding="d",
                 target_field="_index"):
        self.field, self.prefix = field, index_name_prefix
        self.fmt = self._fmt[date_rounding]
        self.target = target_field

    def __call__(self, df):
        ts = pd.to_datetime(df[self.field])
        df[self.target] = self.prefix + "-" + ts.dt.strftime(self.fmt)
        return df


@register("uri_parts")
class UriPartsProcessor(Processor):
    def __init__(self, field, target_field="url"):
        self.field, self.target = field, target_field

    def __call__(self, df):
        parts = df[self.field].map(urllib.parse.urlparse)
        df[f"{self.target}.scheme"] = parts.map(lambda p: p.scheme)
        df[f"{self.target}.domain"] = parts.map(lambda p: p.netloc)
        df[f"{self.target}.path"] = parts.map(lambda p: p.path)
        df[f"{self.target}.query"] = parts.map(lambda p: p.query)
        return df


@register("registered_domain")
class RegisteredDomainProcessor(Processor):
    """eTLD+1 extraction — simplified public-suffix handling (two-label
    suffixes like co.uk, com.au hardcoded; full PSL out of scope)."""

    _two_label = {"co.uk", "com.au", "co.jp", "com.br", "co.in", "org.uk"}

    def __init__(self, field, target_field="registered_domain"):
        self.field, self.target = field, target_field

    def __call__(self, df):
        def etld1(host):
            labels = (host or "").split(".")
            if len(labels) >= 3 and ".".join(labels[-2:]) in self._two_label:
                return ".".join(labels[-3:])
            return ".".join(labels[-2:]) if len(labels) >= 2 else host

        df[self.target] = df[self.field].map(etld1)
        return df


@register("html_strip")
class HtmlStripProcessor(Processor):
    """HtmlStripProcessor.java:27-44 — processor-mode short circuit applies."""

    def __init__(self, field, target_field=None):
        self.field, self.target = field, target_field or field

    def __call__(self, df):
        df[self.target] = df[self.field].map(
            lambda s: strip_html(s, processor_mode=True) if isinstance(s, str) else s
        )
        return df


@register("dissect")
class DissectProcessor(Processor):
    """%{field} pattern extraction (subset of DissectProcessor)."""

    def __init__(self, field, pattern):
        self.field = field
        rx = re.escape(pattern)
        rx = re.sub(r"%\\\{(\w+)\\\}", r"(?P<\1>.*?)", rx) + "$"
        self.re = re.compile("^" + rx)

    def __call__(self, df):
        extracted = df[self.field].str.extract(self.re)
        for c in extracted.columns:
            df[c] = extracted[c]
        return df


@register("grok")
class GrokProcessor(Processor):
    """Simplified grok (GrokProcessor): %{PATTERN:field} syntax over a
    built-in pattern dictionary subset (the reference ships the full grok
    pattern bank + a watchdog; our corpus surface needs the common ones)."""

    _patterns = {
        "WORD": r"\w+",
        "NOTSPACE": r"\S+",
        "DATA": r".*?",
        "GREEDYDATA": r".*",
        "NUMBER": r"(?:[+-]?(?:[0-9]*\.)?[0-9]+)",
        "INT": r"[+-]?[0-9]+",
        "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
        "LOGLEVEL": r"(?:DEBUG|INFO|WARN|WARNING|ERROR|FATAL|TRACE)",
        "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    }

    def __init__(self, field, pattern):
        self.field = field

        def sub(m):
            pat, name = m.group(1), m.group(2)
            return f"(?P<{name}>{self._patterns[pat]})"

        self.re = re.compile(re.sub(r"%\{(\w+):(\w+)\}", sub, pattern))

    def __call__(self, df):
        extracted = df[self.field].str.extract(self.re)
        for c in extracted.columns:
            df[c] = extracted[c]
        return df


@register("foreach")
class ForeachProcessor(Processor):
    """Apply a sub-processor over each element of a list field
    (ForeachProcessor; the element is exposed as a scalar to the sub-op)."""

    def __init__(self, field, processor):
        (name, kwargs), = processor.items()
        kwargs = dict(kwargs)
        kwargs["field"] = "_ingest_item"
        self.field = field
        self.sub = _REGISTRY[name](**kwargs)

    def __call__(self, df):
        def apply(lst):
            if lst is None:
                return lst
            tmp = pd.DataFrame({"_ingest_item": list(lst)})
            return self.sub(tmp)["_ingest_item"].tolist()

        df[self.field] = df[self.field].map(apply)
        return df


@register("script")
class ScriptProcessor(Processor):
    """UDF hook — the Painless-script analog is a python callable df→df."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, df):
        return self.fn(df)


class Pipeline:
    """Ordered processor chain; apply with
    ``ds.map_batches(pipeline, batch_format="pandas")``."""

    def __init__(self, processors: list):
        self.processors = []
        for p in processors:
            if isinstance(p, Processor):
                self.processors.append(p)
            else:
                (name, kwargs), = p.items()
                self.processors.append(_REGISTRY[name](**kwargs))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        for p in self.processors:
            df = p(df)
        return df
