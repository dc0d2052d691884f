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
bytes, fingerprint, drop, date, date_index_name, uri_parts,
registered_domain, html_strip, dissect (subset), grok (subset), foreach,
fail, sort (array), dot_expander, csv, pipeline (composition),
network_direction, community_id, script (python callable = the Painless
analog).
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

    @staticmethod
    def _to_bool(v):
        # ConvertProcessor.Type.BOOLEAN semantics: parse "true"/"false"
        # (case-insensitive), error otherwise — astype('bool') would map the
        # non-empty string "false" to True
        if isinstance(v, (bool, np.bool_)):
            return bool(v)
        s = str(v).strip().lower()
        if s == "true":
            return True
        if s == "false":
            return False
        raise ValueError(f"[{v!r}] is not a boolean value")

    def __call__(self, df):
        if self.type == "bool":
            df[self.field] = df[self.field].map(self._to_bool)
        else:
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

    def __init__(self, condition=None):
        self.condition = condition

    def __call__(self, df):
        if self.condition is None:
            # bare drop — used with the step-level "if" (the reference
            # form: {"drop": {"if": "..."}} drops every matching doc)
            return df.iloc[0:0]
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
    """eTLD+1 extraction (RegisteredDomainProcessor in ingest-common,
    backed by the PUBLIC SUFFIX LIST, publicsuffix.org). Ships a curated
    subset of the public list: the high-traffic ccTLD second-level rules
    (ICANN section) plus the common private-registry suffixes; rule
    semantics follow the PSL algorithm — longest matching suffix wins,
    ``*.<tld>`` wildcard rules match any single label, ``!`` exceptions
    override wildcards. Hosts whose suffix is not listed fall back to the
    last-two-labels heuristic (documented partial vs the full list)."""

    # two-label public suffixes (PSL ICANN + common private sections)
    _two_label = {
        # UK / Ireland / Oceania
        "co.uk", "org.uk", "me.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk",
        "plc.uk", "sch.uk", "com.au", "net.au", "org.au", "edu.au",
        "gov.au", "asn.au", "id.au", "co.nz", "net.nz", "org.nz",
        "govt.nz", "ac.nz", "geek.nz",
        # Asia
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
        "gr.jp", "lg.jp", "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
        "ac.kr", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
        "ac.cn", "com.tw", "org.tw", "idv.tw", "edu.tw", "gov.tw",
        "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "co.in",
        "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
        "edu.in", "res.in", "gov.in", "nic.in", "com.sg", "org.sg",
        "net.sg", "edu.sg", "gov.sg", "com.my", "net.my", "org.my",
        "edu.my", "gov.my", "co.th", "in.th", "ac.th", "go.th", "or.th",
        "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "co.id",
        "or.id", "ac.id", "go.id", "web.id", "com.ph", "net.ph",
        "org.ph", "edu.ph", "gov.ph", "com.pk", "net.pk", "org.pk",
        "edu.pk", "gov.pk", "com.bd", "net.bd", "org.bd", "edu.bd",
        "gov.bd", "com.np", "org.np", "edu.np", "gov.np", "com.lk",
        "org.lk", "edu.lk", "gov.lk",
        # Middle East / Africa
        "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "gen.tr",
        "web.tr", "co.il", "org.il", "net.il", "ac.il", "gov.il",
        "muni.il", "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
        "med.sa", "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
        "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za",
        "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "com.ng", "net.ng",
        "org.ng", "edu.ng", "gov.ng", "com.gh", "org.gh", "edu.gh",
        "gov.gh", "co.tz", "or.tz", "ac.tz", "go.tz", "co.ug", "or.ug",
        "ac.ug", "go.ug", "com.ae", "net.ae", "org.ae", "ac.ae",
        "gov.ae", "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa",
        "com.kw", "net.kw", "org.kw", "edu.kw", "gov.kw",
        # Americas
        "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
        "adv.br", "ind.br", "inf.br", "com.mx", "net.mx", "org.mx",
        "edu.mx", "gob.mx", "com.ar", "net.ar", "org.ar", "edu.ar",
        "gob.ar", "int.ar", "com.co", "net.co", "org.co", "edu.co",
        "gov.co", "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
        "com.ve", "net.ve", "org.ve", "com.ec", "net.ec", "org.ec",
        "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "com.bo",
        "net.bo", "org.bo", "com.py", "net.py", "org.py", "com.do",
        "net.do", "org.do", "com.gt", "net.gt", "org.gt", "com.sv",
        "com.pa", "com.ni", "com.hn", "com.cu", "com.pr", "com.jm",
        "com.tt", "co.cr", "ac.cr", "go.cr", "qc.ca", "on.ca", "bc.ca",
        "ab.ca", "mb.ca", "ns.ca", "sk.ca",
        # Europe
        "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
        "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "com.es",
        "nom.es", "org.es", "gob.es", "edu.es", "com.gr", "net.gr",
        "org.gr", "edu.gr", "gov.gr", "com.ro", "org.ro", "nt.ro",
        "co.at", "or.at", "ac.at", "gv.at", "com.ua", "net.ua",
        "org.ua", "edu.ua", "gov.ua", "kiev.ua", "com.ru", "net.ru",
        "org.ru", "msk.ru", "spb.ru", "com.by", "org.by", "com.ge",
        "org.ge", "edu.ge", "gov.ge", "com.cy", "org.cy", "ltd.cy",
        "com.mt", "org.mt", "net.mt", "edu.mt", "com.is", "net.is",
        "org.is", "co.hu", "org.hu", "info.hu", "priv.no",
        # private-registry suffixes users hit constantly
        "github.io", "gitlab.io", "blogspot.com", "appspot.com",
        "herokuapp.com", "cloudfront.net", "amazonaws.com", "azurewebsites.net",
        "netlify.app", "vercel.app", "pages.dev", "web.app", "firebaseapp.com",
        "wordpress.com", "tumblr.com", "fastly.net",
    }
    # three-label public suffixes (PSL third-level rules)
    _three_label = {
        "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
        "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
        "s3.amazonaws.com", "co.uk.com",
    }
    # wildcard TLDs: *.<tld> — every second-level label is itself a suffix
    _wildcard_tld = {"ck", "er", "fj", "gu", "kh", "mm", "np", "pg"}
    # PSL '!' exceptions to the wildcards above
    _wildcard_exceptions = {"www.ck"}

    def __init__(self, field, target_field="registered_domain"):
        self.field, self.target = field, target_field

    def __call__(self, df):
        two, three = self._two_label, self._three_label
        wild, exc = self._wildcard_tld, self._wildcard_exceptions

        def etld1(host):
            labels = (host or "").lower().rstrip(".").split(".")
            n = len(labels)
            if n >= 4 and ".".join(labels[-4:]) in three:
                # a listed 3-label suffix needs a 4th label to register
                return ".".join(labels[-5:]) if n >= 5 else host
            if n >= 3 and ".".join(labels[-3:]) in three:
                return ".".join(labels[-4:]) if n >= 4 else host
            if n >= 2 and labels[-1] in wild:
                if ".".join(labels[-2:]) in exc:
                    return ".".join(labels[-2:])  # !exception: itself eTLD+1
                return ".".join(labels[-3:]) if n >= 3 else host
            if n >= 3 and ".".join(labels[-2:]) in two:
                return ".".join(labels[-3:])
            return ".".join(labels[-2:]) if n >= 2 else host

        df[self.target] = df[self.field].map(etld1)
        return df


@register("user_agent")
class UserAgentProcessor(Processor):
    """``user_agent`` ingest processor (modules/ingest-user-agent,
    UserAgentProcessor.java) — parse a User-Agent string into
    ``<target>.name`` / ``.version`` / ``.os.name`` / ``.os.version`` /
    ``.os.full`` / ``.device.name`` / ``.original``.

    The reference ships the ua-parser project's public regexes.yaml; this
    is a compact from-scratch subset of the same PUBLIC pattern family
    covering the mainstream engines (Edge before Chrome before Safari —
    Chromium UAs carry all three tokens, so match order is load-bearing),
    legacy IE, CLI clients and major crawlers. Vectorized: one compiled
    ``.str.extract`` per family over the whole batch, later families fill
    only still-unmatched rows."""

    # (name, regex with ONE version group) — first match wins
    _BROWSERS = [
        ("Edge", r"Edg(?:e|A|iOS)?/(\d+[\w.]*)"),
        ("Opera", r"OPR/(\d+[\w.]*)"),
        ("Opera", r"Opera[/ ](\d+[\w.]*)"),
        ("Samsung Internet", r"SamsungBrowser/(\d+[\w.]*)"),
        ("HeadlessChrome", r"HeadlessChrome/(\d+[\w.]*)"),
        ("Chrome Mobile", r"Chrome/(\d+[\w.]*) Mobile"),
        ("Chrome", r"Chrom(?:e|ium)/(\d+[\w.]*)"),
        ("Firefox", r"Firefox/(\d+[\w.]*)"),
        ("Mobile Safari", r"Version/(\d+[\w.]*).* Mobile/\w+ Safari/"),
        ("Safari", r"Version/(\d+[\w.]*).* Safari/"),
        ("IE", r"MSIE (\d+[\w.]*)"),
        ("IE", r"Trident/.*rv:(\d+[\w.]*)"),
        ("curl", r"curl/(\d+[\w.]*)"),
        ("Wget", r"Wget/(\d+[\w.]*)"),
        ("Python Requests", r"python-requests/(\d+[\w.]*)"),
        ("Googlebot", r"Googlebot/(\d+[\w.]*)"),
        ("bingbot", r"bingbot/(\d+[\w.]*)"),
    ]
    _OSES = [
        ("Windows", r"Windows NT (\d+[\w.]*)"),
        ("Android", r"Android (\d+[\w.]*)"),
        # iOS before Mac OS X: iPad/iPhone UAs contain "like Mac OS X"
        ("iOS", r"(?:iPhone|CPU) OS (\d+[_\d]*) like Mac OS X"),
        ("Mac OS X", r"Mac OS X (\d+[_\d]*)"),
        ("Chrome OS", r"CrOS \w+ (\d+[\w.]*)"),
        ("Linux", r"(Linux)"),
    ]
    _DEVICES = [("iPhone", r"iPhone"), ("iPad", r"iPad"),
                ("Mac", r"Macintosh"), ("Generic Smartphone", r"Android")]

    def __init__(self, field, target_field="user_agent",
                 ignore_missing=False):
        self.field, self.target = field, target_field
        self.ignore_missing = ignore_missing
        self._browsers = [(n, re.compile(p)) for n, p in self._BROWSERS]
        self._oses = [(n, re.compile(p)) for n, p in self._OSES]
        self._devices = [(n, re.compile(p)) for n, p in self._DEVICES]

    def __call__(self, df):
        ua = df[self.field].fillna("") if self.ignore_missing else df[self.field]
        t = self.target
        name = pd.Series("Other", index=df.index)
        version = pd.Series("", index=df.index)
        todo = pd.Series(True, index=df.index)
        for n, rx in self._browsers:
            if not todo.any():
                break
            m = ua.str.extract(rx, expand=False)
            hit = todo & m.notna()
            name[hit] = n
            version[hit] = m[hit]
            todo &= ~hit
        os_name = pd.Series("Other", index=df.index)
        os_version = pd.Series("", index=df.index)
        todo = pd.Series(True, index=df.index)
        for n, rx in self._oses:
            if not todo.any():
                break
            m = ua.str.extract(rx, expand=False)
            hit = todo & m.notna()
            os_name[hit] = n
            os_version[hit] = m[hit].str.replace("_", ".") if n != "Linux" else ""
            todo &= ~hit
        device = pd.Series("Other", index=df.index)
        todo = pd.Series(True, index=df.index)
        for n, rx in self._devices:
            hit = todo & ua.str.contains(rx)
            device[hit] = n
            todo &= ~hit
        df[f"{t}.name"] = name
        df[f"{t}.version"] = version
        df[f"{t}.os.name"] = os_name
        df[f"{t}.os.version"] = os_version
        df[f"{t}.os.full"] = (os_name + " " + os_version).str.strip()
        df[f"{t}.device.name"] = device
        df[f"{t}.original"] = ua
        return df


@register("geoip")
class GeoIpProcessor(Processor):
    """``geoip`` ingest processor (modules/ingest-geoip,
    GeoIpProcessor.java) as a CIDR-table lookup interface: the reference
    resolves IPs against a MaxMind database file; no database ships in
    this environment, so the lookup table is caller-provided —
    ``database`` is a list of ``(cidr, {prop: value})`` rows (or a path
    to a two-column csv ``cidr,json_props``). Lookup is vectorized:
    CIDRs become sorted (lo, hi) uint32 ranges once in __init__, each
    batch is one IPv4→uint32 conversion + one searchsorted. Most-specific
    (longest-prefix) match wins, like the MaxMind tree. IPv6 and
    unmatched IPs yield nulls (ignore_missing semantics)."""

    def __init__(self, field, database, target_field="geoip",
                 properties=("country_iso_code", "city_name", "location")):
        self.field, self.target = field, target_field
        self.properties = tuple(properties)
        if isinstance(database, str):
            import csv as _csv

            rows = []
            with open(database) as f:
                for cidr, props in _csv.reader(f):
                    rows.append((cidr, _json.loads(props)))
            database = rows
        lo, hi, plen, props = [], [], [], []
        for cidr, p in database:
            net, _, bits = cidr.partition("/")
            bits = int(bits or 32)
            base = self._ip_u32(net)
            if base is None:
                raise ValueError(f"bad CIDR {cidr!r}")
            mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
            lo.append(base & mask)
            hi.append((base & mask) | (~mask & 0xFFFFFFFF))
            plen.append(bits)
            props.append(p)
        # longest-prefix within equal lo: sort by (lo, prefix_len) so the
        # MOST specific row is the last one with lo <= ip; nested shorter
        # prefixes are checked by walking left until a range covers ip
        order = np.lexsort((np.array(plen), np.array(lo, np.uint32)))
        self._lo = np.array(lo, np.uint32)[order]
        self._hi = np.array(hi, np.uint32)[order]
        self._props = [props[i] for i in order]
        # CIDR ranges are LAMINAR (nested or disjoint), so any range
        # containing an ip also encloses the searchsorted candidate —
        # precompute each row's nearest ENCLOSING range once (stack sweep)
        # and the lookup walks the ancestor chain, O(nesting depth) per ip
        # instead of O(table) for unmatched ips (ADVICE r4)
        parent = np.full(len(self._lo), -1, np.int64)
        stack: list[int] = []
        for j in range(len(self._lo)):
            while stack and self._hi[stack[-1]] < self._hi[j]:
                stack.pop()
            parent[j] = stack[-1] if stack else -1
            stack.append(j)
        self._parent = parent

    @staticmethod
    def _ip_u32(s):
        parts = (s or "").split(".")
        if len(parts) != 4:
            return None
        try:
            o = [int(x) for x in parts]
        except ValueError:
            return None
        if any(x < 0 or x > 255 for x in o):
            return None
        return (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]

    def __call__(self, df):
        u = df[self.field].map(self._ip_u32)
        valid = u.notna()
        ips = u[valid].to_numpy(dtype=np.uint32) if valid.any() else \
            np.empty(0, np.uint32)
        idx = np.searchsorted(self._lo, ips, side="right") - 1
        out = {p: pd.Series([None] * len(df), index=df.index, dtype=object)
               for p in self.properties}
        vi = df.index[valid]
        for row, (ip, j) in zip(vi, zip(ips.tolist(), idx.tolist())):
            # ancestor chain, most-specific first (bounded by nesting depth)
            while j >= 0:
                if self._lo[j] <= ip <= self._hi[j]:
                    for p in self.properties:
                        if p in self._props[j]:
                            out[p][row] = self._props[j][p]
                    break
                j = int(self._parent[j])
        for p in self.properties:
            df[f"{self.target}.{p}"] = out[p]
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
    """%{field} pattern extraction with the reference's key modifiers
    (libs/dissect DissectParser): ``%{}``/``%{?skip}`` named-skip keys
    produce no output, ``%{field->}`` right-padding skips repeated trailing
    delimiter characters, ``%{+field}`` appends to a previous capture with
    ``append_separator`` between parts."""

    def __init__(self, field, pattern, append_separator: str = ""):
        self.field = field
        self.sep = append_separator
        keys = re.findall(r"%\{([^}]*)\}", pattern)
        parts = re.split(r"%\{[^}]*\}", pattern)
        rx = ""
        self.out_keys: list[str | None] = []   # group order → output key
        self.appends: list[bool] = []
        for i, key in enumerate(keys):
            rx += re.escape(parts[i])
            pad = key.endswith("->")
            if pad:
                key = key[:-2]
            app = key.startswith("+")
            if app:
                key = key[1:]
            skip = key == "" or key.startswith("?")
            if skip:
                rx += r"(?:.*?)"
                self.out_keys.append(None)
            else:
                rx += f"(?P<g{i}>.*?)"
                self.out_keys.append(key)
            self.appends.append(app)
            if pad and i + 1 < len(parts) and parts[i + 1]:
                # absorb REPEATED whole delimiters (DissectParser skips
                # repeats of the full delimiter, not just its first char)
                rx += "(?:" + re.escape(parts[i + 1]) + ")*"
        rx += re.escape(parts[-1])
        self.re = re.compile("^" + rx + "$")
        self.has_outputs = any(k is not None for k in self.out_keys)

    def __call__(self, df):
        if not self.has_outputs:  # skip-only pattern: structural assertion
            return df
        extracted = df[self.field].str.extract(self.re)
        matched = extracted.notna().any(axis=1)
        out: dict[str, object] = {}
        for i, key in enumerate(self.out_keys):
            if key is None:
                continue
            col = extracted[f"g{i}"]
            if self.appends[i] and key in out:
                out[key] = out[key].fillna("") + self.sep + col.fillna("")
            else:
                out[key] = col
        for key, col in out.items():
            # non-matching rows stay unset (the reference fails the doc; we
            # leave NaN), never separator-joined empties
            df[key] = col.where(matched)
        return df


@register("grok")
class GrokProcessor(Processor):
    """grok (GrokProcessor): %{PATTERN:field} syntax over the standard grok
    pattern bank (the public logstash/grok pattern definitions; recursive
    %{NAME} references between bank entries are resolved like the
    reference's Grok compiler). Named captures extract to columns."""

    _BANK = {
        "USERNAME": r"[a-zA-Z0-9._-]+",
        "USER": r"%{USERNAME}",
        "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
        "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
        "INT": r"[+-]?[0-9]+",
        "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
        "NUMBER": r"%{BASE10NUM}",
        "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
        "POSINT": r"[1-9][0-9]*",
        "NONNEGINT": r"[0-9]+",
        "WORD": r"\b\w+\b",
        "NOTSPACE": r"\S+",
        "SPACE": r"\s*",
        "DATA": r".*?",
        "GREEDYDATA": r".*",
        "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"]+)*\"|'(?:\\.|[^\\']+)*')",
        "QS": r"%{QUOTEDSTRING}",
        "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
        "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
        "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
        "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
        "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
        "IPV4": r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(?:\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}",
        "IPV6": r"(?:[0-9A-Fa-f]{1,4}:){1,7}[0-9A-Fa-f]{0,4}",
        "IP": r"(?:%{IPV6}|%{IPV4})",
        "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
        "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
        "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
        "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
        "WINPATH": r"(?:[A-Za-z]:|\\\\)(?:\\\\[^\\\\?*]*)+",
        "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
        "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/\w+)?",
        "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
        "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
        "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_-]*)+",
        "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
        "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
        "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
        "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
        "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
        "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
        "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
        "YEAR": r"(?:\d\d){1,2}",
        "HOUR": r"(?:2[0123]|[01]?[0-9])",
        "MINUTE": r"(?:[0-5][0-9])",
        "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
        "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
        "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
        "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
        "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
        "ISO8601_SECOND": r"%{SECOND}",
        "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
        "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
        "DATESTAMP": r"%{DATE}[- ]%{TIME}",
        "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
        "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
        "PROG": r"[\w._/%-]+",
        "SYSLOGPROG": r"%{PROG}(?:\[%{POSINT}\])?",
        "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
        "COMMONAPACHELOG": r'%{IPORHOST} %{USER} %{USER} \[%{HTTPDATE}\] "(?:%{WORD} %{NOTSPACE}(?: HTTP/%{NUMBER})?|%{DATA})" %{NUMBER} (?:%{NUMBER}|-)',
    }

    @classmethod
    def _resolve(cls, pattern: str, depth: int = 0) -> str:
        """Expand %{NAME:field} → named capture, %{NAME} → bare group,
        recursively through the bank (the grok compiler's behavior)."""
        if depth > 12:
            raise ValueError("grok pattern recursion too deep")

        def sub(m):
            pat, name = m.group(1), m.group(3)
            body = cls._resolve(cls._BANK[pat], depth + 1)
            if name:
                return f"(?P<{name}>{body})"
            return f"(?:{body})"

        return re.sub(r"%\{(\w+)(:(\w+))?\}", sub, pattern)

    def __init__(self, field, pattern):
        self.field = field
        self.re = re.compile(self._resolve(pattern))

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


@register("fail")
class FailProcessor(Processor):
    """FailProcessor: abort the pipeline with a message when any row matches
    ``where`` (a vectorized predicate df→bool Series; None = always)."""

    def __init__(self, message="fail processor triggered", where=None):
        self.message, self.where = message, where

    def __call__(self, df):
        if self.where is None:
            if len(df):
                raise ValueError(self.message)
        else:
            m = self.where(df)
            if bool(np.asarray(m).any()):
                raise ValueError(self.message)
        return df


@register("sort")
class SortProcessor(Processor):
    """SortProcessor: sort the elements of a LIST field in each doc."""

    def __init__(self, field, order="asc"):
        self.field, self.desc = field, order == "desc"

    def __call__(self, df):
        df[self.field] = df[self.field].map(
            lambda v: v if v is None else sorted(v, reverse=self.desc)
        )
        return df


@register("dot_expander")
class DotExpanderProcessor(Processor):
    """DotExpanderProcessor: our flat-column analog — a column literally
    named "a.b" becomes the nested-style pair (parent dict column untyped in
    the reference; here we rename to parent__child, the flattened layout)."""

    def __init__(self, field):
        self.field = field

    def __call__(self, df):
        if self.field in df.columns and "." in self.field:
            df = df.rename(columns={self.field: self.field.replace(".", "__")})
        return df


@register("csv")
class CsvProcessor(Processor):
    """CsvProcessor: parse a delimited field into target fields (quote-aware
    via the C csv reader applied column-wise)."""

    def __init__(self, field, target_fields, separator=",", quote='"', trim=False):
        self.field, self.targets = field, list(target_fields)
        self.sep, self.quote, self.trim = separator, quote, trim

    def __call__(self, df):
        import csv as _csv
        import io

        def parse(v):
            if v is None:
                return [None] * len(self.targets)
            row = next(_csv.reader(io.StringIO(v), delimiter=self.sep,
                                   quotechar=self.quote), [])
            row = [x.strip() if self.trim and x is not None else x for x in row]
            row += [None] * (len(self.targets) - len(row))
            return row[: len(self.targets)]

        parsed = df[self.field].map(parse)
        for i, tgt in enumerate(self.targets):
            df[tgt] = parsed.map(lambda r: r[i])
        return df


@register("pipeline")
class PipelineProcessor(Processor):
    """PipelineProcessor: execute another (inline) pipeline — pipeline
    composition within a chain."""

    def __init__(self, processors):
        self.sub = Pipeline(processors)

    def __call__(self, df):
        return self.sub(df)


@register("network_direction")
class NetworkDirectionProcessor(Processor):
    """NetworkDirectionProcessor: classify source/destination IPs against
    internal CIDR networks → inbound/outbound/internal/external."""

    def __init__(self, source_field="source_ip", dest_field="dest_ip",
                 internal_networks=("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"),
                 target_field="network_direction"):
        import ipaddress

        self.src, self.dst, self.tgt = source_field, dest_field, target_field
        self.nets = [ipaddress.ip_network(n) for n in internal_networks]

    def _internal(self, ip):
        import ipaddress

        if ip is None:
            return False
        try:
            a = ipaddress.ip_address(ip)
        except ValueError:
            return False
        return any(a in n for n in self.nets)

    def __call__(self, df):
        si = df[self.src].map(self._internal)
        di = df[self.dst].map(self._internal)
        out = np.where(si & di, "internal",
                       np.where(si, "outbound", np.where(di, "inbound", "external")))
        df[self.tgt] = out
        return df


@register("community_id")
class CommunityIdProcessor(Processor):
    """CommunityIdProcessor: the open Community ID flow hash v1
    (https://github.com/corelight/community-id-spec): seed + sorted
    (ip, port) endpoint tuple + protocol → base64(sha1)."""

    _PROTO = {"icmp": 1, "tcp": 6, "udp": 17, "sctp": 132}

    def __init__(self, source_ip="source_ip", source_port="source_port",
                 dest_ip="dest_ip", dest_port="dest_port", iana_number=None,
                 transport="transport", seed=0, target_field="community_id"):
        self.f = (source_ip, source_port, dest_ip, dest_port)
        self.transport, self.seed, self.tgt = transport, seed, target_field
        self.iana = iana_number

    def _one(self, sip, sport, dip, dport, proto):
        import base64
        import ipaddress
        import struct

        try:
            sa = ipaddress.ip_address(sip).packed
            da = ipaddress.ip_address(dip).packed
        except (ValueError, TypeError):
            return None
        p = int(proto)
        sp, dp = int(sport), int(dport)
        if (sa, sp) > (da, dp):
            sa, da, sp, dp = da, sa, dp, sp
        data = struct.pack("!H", self.seed) + sa + da + struct.pack("!BBHH", p, 0, sp, dp)
        return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()

    def __call__(self, df):
        if self.iana is not None:
            protos = df[self.iana]
        else:
            protos = df[self.transport].map(lambda t: self._PROTO.get(str(t).lower(), 0))
        df[self.tgt] = [
            self._one(a, b, c, d, pr)
            for a, b, c, d, pr in zip(df[self.f[0]], df[self.f[1]], df[self.f[2]],
                                      df[self.f[3]], protos)
        ]
        return df


@register("script")
class ScriptProcessor(Processor):
    """Script processor (IngestCommonPlugin ``script`` /
    ``ScriptProcessor.java``). Two spec forms:

    - ``{"script": {"fn": callable}}`` — a python df→df UDF hook;
    - ``{"script": {"source": "...", "lang": "painless", "params":
      {...}}}`` — the reference's inline-script form, executed by the
    sandboxed Painless subset (search/painless.py): each row is a
    mutable ``ctx`` map, mutations become columns."""

    def __init__(self, fn=None, source=None, lang="painless",
                 params=None):
        if fn is None and source is None:
            raise ValueError("script processor needs fn or source")
        if source is not None:
            if lang != "painless":
                raise ValueError(
                    f"script processor lang {lang!r} not supported "
                    "(painless only; expressions are numeric-only)")
            from elasticsearch_ray.search.painless import (
                painless_processor_fn,
            )

            fn = painless_processor_fn(source, params)
        self.fn = fn

    def __call__(self, df):
        return self.fn(df)


def execute_enrich_policy(ds, match_field: str, enrich_fields) -> pd.DataFrame:
    """Enrich-policy execution (x-pack/plugin/enrich —
    ``EnrichPolicyRunner.java``): project ``match_field`` + ``enrich_fields``
    from the policy's source into a compact keyed enrich table (the
    ``.enrich-*`` system-index analog).

    Ray-native shape: a column-pruned streaming pass over the source
    Dataset; the result is the SMALL side by design (enrich indices hold
    reference data — geo tables, user directories — not event streams) and
    is intended to ride inside the EnrichProcessor closure, which Ray
    broadcasts once per worker. Accepts a Ray Dataset, pandas DataFrame or
    pyarrow Table."""
    import pyarrow as pa

    cols = [match_field] + [f for f in enrich_fields if f != match_field]
    if isinstance(ds, pd.DataFrame):
        return ds[cols].reset_index(drop=True)
    if isinstance(ds, pa.Table):
        return ds.select(cols).to_pandas()
    import ray

    refs = ds.select_columns(cols).to_arrow_refs()
    return pa.concat_tables(
        [t for t in ray.get(refs) if t.num_rows], promote_options="default"
    ).to_pandas()


@register("inference")
class InferenceProcessor(Processor):
    """``inference`` ingest processor (x-pack ml —
    ``ml/inference/ingest/InferenceProcessor.java``): run a trained
    tree/ensemble model over each document's fields and write the result
    under ``target_field`` (reference default ``ml.inference``), flattened
    to dotted columns like the geoip/enrich precedent. ``model`` is either
    a model_id previously stored with
    :func:`elasticsearch_ray.ops.inference.put_trained_model` or an inline
    TrainedModelDefinition dict; the parsed model lives in the processor
    (broadcast once per worker), inference is fully vectorized per batch."""

    def __init__(self, model, field_map=None, target_field="ml.inference",
                 num_top_classes=0):
        from elasticsearch_ray.ops.inference import (
            TrainedModelDefinition,
            get_trained_model,
        )

        self.model = (get_trained_model(model) if isinstance(model, str)
                      else TrainedModelDefinition(model))
        self.model_id = model if isinstance(model, str) else None
        self.field_map = dict(field_map or {})
        self.target = target_field
        self.num_top_classes = int(num_top_classes)

    def __call__(self, df):
        src = df.rename(columns=self.field_map) if self.field_map else df
        res = self.model.infer(src, num_top_classes=self.num_top_classes)
        for k, v in res.items():
            df[f"{self.target}.{k}"] = (
                pd.Series(list(v), index=df.index)
                if k == "top_classes" else v)
        if self.model_id is not None:
            df[f"{self.target}.model_id"] = self.model_id
        return df


@register("enrich")
class EnrichProcessor(Processor):
    """``enrich`` ingest processor (x-pack/plugin/enrich —
    ``EnrichProcessorFactory.java``, ``MatchProcessor.java``): look up each
    document's ``field`` value in an enrich index and copy the matched
    source's fields onto the document.

    Reference shape: a term query against the ``.enrich-*`` index with up
    to ``max_matches`` (1..128) hits stored under ``target_field``. Here
    the enrich table (from :func:`execute_enrich_policy`) is held in the
    processor closure — broadcast once per worker by Ray, a broadcast hash
    join, never a shuffle. ``max_matches == 1`` lands flattened
    ``{target_field}.{col}`` columns via one vectorized reindex per field
    (columnar frames hold no nested objects — the geoip precedent);
    ``max_matches > 1`` stores a list of match dicts (first ``max_matches``
    in enrich-table order) under ``target_field``. Unmatched keys yield
    nulls / empty lists and, with ``override=False``, existing non-null
    target values are kept (the reference's override flag)."""

    def __init__(self, field, policy, target_field="enriched",
                 max_matches=1, override=True):
        if not 1 <= int(max_matches) <= 128:
            raise ValueError("max_matches must be in [1, 128]")
        if hasattr(policy, "to_pandas") and not isinstance(policy, pd.DataFrame):
            policy = policy.to_pandas()
        if not isinstance(policy, pd.DataFrame):
            raise TypeError("policy must be execute_enrich_policy output "
                            "(pandas/arrow table)")
        self.field, self.target = field, target_field
        self.max_matches = int(max_matches)
        self.override = bool(override)
        key = policy.columns[0]
        self._enrich_cols = [c for c in policy.columns if c != key]
        if self.max_matches == 1:
            first = policy.drop_duplicates(subset=[key], keep="first")
            frame = first.set_index(key)
            self._series = {c: frame[c] for c in self._enrich_cols}
        else:
            buckets: dict = {}
            for row in policy.itertuples(index=False):
                d = dict(zip(policy.columns, row))
                k = d.pop(key)
                lst = buckets.setdefault(k, [])
                if len(lst) < self.max_matches:
                    lst.append(d)
            self._buckets = buckets

    def __call__(self, df):
        keys = df[self.field]
        if self.max_matches == 1:
            for c in self._enrich_cols:
                name = f"{self.target}.{c}"
                vals = self._series[c].reindex(keys)
                vals.index = df.index
                if vals.dtype == object:
                    # misses surface as None (Arrow null), not float NaN
                    vals = vals.where(vals.notna(), None)
                if not self.override and name in df.columns:
                    vals = df[name].where(df[name].notna(), vals)
                df[name] = vals
        else:
            hits = keys.map(lambda k: self._buckets.get(k, []))
            if not self.override and self.target in df.columns:
                keep = df[self.target].map(
                    lambda v: isinstance(v, list) and len(v) > 0)
                hits = df[self.target].where(keep, hits)
            df[self.target] = hits
        return df


class _Step:
    """One pipeline step: the processor plus its COMMON config
    (``CompoundProcessor.java`` / ``ConfigurationUtils.readProcessor``):
    ``tag``, ``ignore_failure``, ``on_failure`` handler chain, and the
    per-document ``if`` condition (``ConditionalProcessor.java``: a
    Painless script over a read-only ``ctx``; the step runs only for
    documents where it returns true)."""

    __slots__ = ("proc", "type", "tag", "ignore_failure", "on_failure",
                 "condition")

    def __init__(self, proc, ptype, tag=None, ignore_failure=False,
                 on_failure=None, condition=None):
        self.proc = proc
        self.type = ptype
        self.tag = tag
        self.ignore_failure = bool(ignore_failure)
        self.on_failure = on_failure or []
        if condition is not None and not callable(condition):
            from elasticsearch_ray.search.painless import compile_painless

            script = compile_painless(condition)
            # conditions are usually bare boolean expressions — give
            # them the implicit last-expression return (the same
            # rewrite painless_execute applies for painless_test)
            stmts = script.ast[1]
            if stmts and stmts[-1][0] == "expr":
                stmts[-1] = ("return", stmts[-1][1])

            def cond(ctx, _s=script):
                return bool(_s.run({"ctx": ctx, "params": {}}))
            condition = cond
        self.condition = condition

    def mask(self, df) -> np.ndarray:
        """Per-document condition mask (the reference evaluates the
        ``if`` script once per IngestDocument too)."""
        if self.condition is None:
            return np.ones(len(df), bool)
        return np.fromiter(
            (self.condition({k: _py(v) for k, v in r.items()})
             for r in df.to_dict("records")),
            bool, len(df))

    def apply(self, df):
        """Run the processor honoring the condition: matching rows go
        through the processor, the rest pass through untouched; original
        document order is preserved (row-count-changing processors —
        drop — keep relative order via a positional key)."""
        if self.condition is None:
            return self.proc(df)
        m = self.mask(df)
        if m.all():
            return self.proc(df)
        if not m.any():
            return df
        pos = np.arange(len(df))
        hit = df[m].copy()
        hit["_cond_pos"] = pos[m]
        miss = df[~m].copy()
        miss["_cond_pos"] = pos[~m]
        done = self.proc(hit)
        allcols = list(dict.fromkeys(
            list(done.columns) + list(miss.columns)))
        out = pd.concat([done.reindex(columns=allcols),
                         miss.reindex(columns=allcols)],
                        ignore_index=True)
        return (out.sort_values("_cond_pos", kind="stable",
                                ignore_index=True)
                .drop(columns=["_cond_pos"]))


def _py(v):
    if isinstance(v, np.generic):
        return v.item()
    return v


_FAILURE_META = ["_ingest.on_failure_message",
                 "_ingest.on_failure_processor_type",
                 "_ingest.on_failure_processor_tag"]


class Pipeline:
    """Ordered processor chain; apply with
    ``ds.map_batches(pipeline, batch_format="pandas")``.

    Failure semantics (``CompoundProcessor.java:121-160``): processors are
    vectorized over the whole batch on the FAST path; if one raises and
    any failure handling is configured, the batch re-runs per document —
    a failing doc's step is skipped under ``ignore_failure``, or its
    ``on_failure`` chain runs with the ``_ingest.on_failure_*`` metadata
    fields visible (removed afterwards, like the reference's ingest
    metadata) and execution continues with the NEXT processor. A
    pipeline-level ``on_failure`` catches anything unhandled. Docs that
    still fail are dropped into ``failure_col`` (unprocessed source +
    error message, the bulk per-doc error analog) when it is set,
    otherwise the exception propagates."""

    def __init__(self, processors: list, on_failure: list | None = None,
                 failure_col: str | None = None):
        self.steps = [self._build(p) for p in processors]
        self.pipeline_on_failure = [self._build(p)
                                    for p in (on_failure or [])]
        self.failure_col = failure_col
        # legacy surface (simulate_pipeline and friends iterate these)
        self.processors = [s.proc for s in self.steps]

    @staticmethod
    def _build(p) -> "_Step":
        if isinstance(p, Processor):
            return _Step(p, getattr(p, "name", type(p).__name__))
        (name, kwargs), = p.items()
        kwargs = dict(kwargs)
        tag = kwargs.pop("tag", None)
        ignore = kwargs.pop("ignore_failure", False)
        condition = kwargs.pop("if", None)
        handlers = [Pipeline._build(h)
                    for h in kwargs.pop("on_failure", [])]
        return _Step(_REGISTRY[name](**kwargs), name, tag, ignore,
                     handlers, condition)

    def _handled(self) -> bool:
        return bool(self.pipeline_on_failure
                    or self.failure_col
                    or any(s.ignore_failure or s.on_failure
                           for s in self.steps))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self._handled():
            for s in self.steps:
                df = s.apply(df)
            return df
        # step-wise vectorized: each step tries the WHOLE current frame
        # first; only a step that actually fails degrades to per-row for
        # that step, and recovered rows rejoin the vectorized flow. Docs
        # whose handlers all fail exit to the failure bucket with their
        # in-flight state (CompoundProcessor passes the in-flight
        # IngestDocument to the pipeline on_failure chain, not the
        # original source).
        exited: list[pd.DataFrame] = []
        cur = df
        for s in self.steps:
            snap = cur.copy()
            try:
                cur = s.apply(cur)
                continue
            except Exception:
                pass
            ok_rows = []
            for i in range(len(snap)):
                row = snap.iloc[i: i + 1]
                try:
                    ok_rows.append(s.apply(row.copy()))
                    continue
                except Exception as e:
                    err, kept = e, row
                if s.ignore_failure:
                    ok_rows.append(kept)
                    continue
                if s.on_failure:
                    try:
                        out = self._run_chain(
                            s.on_failure, self._with_meta(kept.copy(),
                                                          err, s))
                        ok_rows.append(out.drop(columns=_FAILURE_META,
                                                errors="ignore"))
                        continue
                    except Exception as e2:
                        err = e2
                exited.append(self._rescue(kept, err))
            cur = (pd.concat(ok_rows, ignore_index=True)
                   if ok_rows else snap.iloc[0:0])
        if exited:
            return pd.concat([cur, *exited], ignore_index=True)
        return cur

    def _rescue(self, row: pd.DataFrame, e: Exception) -> pd.DataFrame:
        """Unhandled per-step failure: pipeline-level on_failure over the
        IN-FLIGHT row state, then the failure bucket."""
        if self.pipeline_on_failure:
            try:
                out = self._run_chain(self.pipeline_on_failure,
                                      self._with_meta(row.copy(), e, None))
                return out.drop(columns=_FAILURE_META, errors="ignore")
            except Exception as e2:
                e = e2
        return self._fail_row(row, e)

    def _run_chain(self, steps, df: pd.DataFrame) -> pd.DataFrame:
        for s in steps:
            try:
                df = s.apply(df)
            except Exception as e:
                if s.ignore_failure:
                    continue
                if s.on_failure:
                    df = self._run_chain(s.on_failure,
                                         self._with_meta(df, e, s))
                    df = df.drop(columns=_FAILURE_META, errors="ignore")
                    continue
                raise
        return df

    @staticmethod
    def _with_meta(df: pd.DataFrame, e: Exception, step) -> pd.DataFrame:
        df = df.copy()
        df[_FAILURE_META[0]] = str(e)
        df[_FAILURE_META[1]] = step.type if step else "pipeline"
        df[_FAILURE_META[2]] = (step.tag if step else None)
        return df

    def _fail_row(self, row: pd.DataFrame, e: Exception) -> pd.DataFrame:
        if self.failure_col is None:
            raise e
        row = row.copy()
        row[self.failure_col] = f"{type(e).__name__}: {e}"
        return row


def simulate_pipeline(processors: list, docs: list[dict],
                      verbose: bool = False) -> dict:
    """``_ingest/pipeline/_simulate`` (SimulatePipelineTransportAction /
    ``SimulateExecutionService.java``): run the pipeline over the given
    documents — a debugging API over a handful of docs, so each doc runs
    as its own frame with per-doc error isolation (one failing doc
    reports its error, others still process, like the reference).
    ``verbose`` returns per-processor intermediate states
    (SimulateProcessorResult)."""
    pipe = Pipeline(processors)
    out_docs = []
    for doc in docs:
        df = pd.DataFrame([doc])
        if not verbose:
            try:
                df = pipe(df)
                # a drop processor may remove the doc — report the
                # reference's dropped shape, not an IndexError
                # (review r5c #2)
                out_docs.append({"doc": None} if len(df) == 0 else
                                {"doc": {"_source":
                                         df.iloc[0].to_dict()}})
            except Exception as e:
                out_docs.append({"error": {"type": type(e).__name__,
                                           "reason": str(e)}})
            continue
        results = []
        failed = False
        for step in pipe.steps:
            if failed:
                break
            ptype = step.type
            if step.condition is not None and not step.mask(df).any():
                results.append({"processor_type": ptype,
                                "status": "skipped"})
                continue
            try:
                df = step.apply(df)
                if len(df) == 0:  # dropped — stop the chain here
                    results.append({"processor_type": ptype,
                                    "status": "dropped"})
                    break
                results.append({"processor_type": ptype,
                                "status": "success",
                                "doc": {"_source": df.iloc[0].to_dict()}})
                continue
            except Exception as e:
                err = e
            if step.ignore_failure:
                # SimulateProcessorResult renders ignored_error + the
                # unchanged doc and the chain continues
                results.append({"processor_type": ptype,
                                "status": "error_ignored",
                                "ignored_error": {
                                    "type": type(err).__name__,
                                    "reason": str(err)},
                                "doc": {"_source": df.iloc[0].to_dict()}})
                continue
            if step.on_failure:
                # verbose mode shows the failed step, then each
                # on_failure processor executing (the reference renders
                # the handler chain's own SimulateProcessorResults)
                results.append({"processor_type": ptype,
                                "status": "error",
                                "error": {"type": type(err).__name__,
                                          "reason": str(err)}})
                try:
                    h = Pipeline._with_meta(df.copy(), err, step)
                    for hs in step.on_failure:
                        h = hs.proc(h)
                        results.append({
                            "processor_type": hs.type,
                            "status": "success", "on_failure": True,
                            "doc": {"_source": h.drop(
                                columns=_FAILURE_META, errors="ignore")
                                .iloc[0].to_dict()}})
                    df = h.drop(columns=_FAILURE_META, errors="ignore")
                    continue
                except Exception as e2:
                    results.append({"processor_type": ptype,
                                    "status": "error", "on_failure": True,
                                    "error": {"type": type(e2).__name__,
                                              "reason": str(e2)}})
                    failed = True
                    continue
            results.append({"processor_type": ptype,
                            "status": "error",
                            "error": {"type": type(err).__name__,
                                      "reason": str(err)}})
            failed = True
        out_docs.append({"processor_results": results})
    return {"docs": out_docs}


@register("attachment")
class AttachmentProcessor(Processor):
    """ingest-attachment plugin (``plugins/ingest-attachment/.../
    AttachmentProcessor.java``, which wraps Apache Tika).

    REAL extraction for the formats this sandbox can parse without the
    Tika jars: ``text/plain`` (utf-8/latin-1 decode) and ``text/html``
    (the repo's own ``strip_html``). PDF (``%PDF``), OOXML/zip
    (``PK\\x03\\x04``), OLE2 (``\\xd0\\xcf\\x11\\xe0``) and RTF magics
    are DETECTED — ``content_type`` is set — but their content is not
    extracted (``attachment.error`` notes the unsupported type), a
    documented stub like the compressed-media codecs.

    Properties subset: content, content_type, content_length, language
    (tiny stopword-vote heuristic over en/de/fr/es — the reference's
    language detection is also optional). ``indexed_chars`` caps the
    extracted content (reference default 100000; -1 = unlimited);
    ``ignore_missing`` skips null sources.
    """

    _STOPS = {
        "en": {"the", "and", "of", "to", "in", "is", "that", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein"},
        "fr": {"le", "la", "et", "les", "des", "est", "une", "dans"},
        "es": {"el", "la", "los", "que", "y", "es", "una", "para"},
    }

    def __init__(self, field, target_field="attachment", properties=None,
                 indexed_chars=100000, ignore_missing=False):
        self.field = field
        self.target = target_field
        self.props = tuple(properties or
                           ("content", "content_type", "content_length",
                            "language"))
        self.cap = int(indexed_chars)
        self.ignore_missing = ignore_missing

    def _sniff(self, raw: bytes) -> str:
        if raw.startswith(b"%PDF"):
            return "application/pdf"
        if raw.startswith(b"PK\x03\x04"):
            return "application/zip"
        if raw.startswith(b"\xd0\xcf\x11\xe0"):
            return "application/x-ole-storage"
        if raw.startswith(b"{\\rtf"):
            return "application/rtf"
        head = raw[:1024].lower()
        if b"<html" in head or b"<!doctype html" in head:
            return "text/html"
        return "text/plain"

    def _language(self, text: str) -> str | None:
        toks = set(text.lower().split()[:200])
        votes = {lg: len(toks & st) for lg, st in self._STOPS.items()}
        best = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
        return best[0] if best[1] > 0 else None

    def __call__(self, df):
        import base64 as _b64

        outs: dict[str, list] = {p: [] for p in self.props}
        errs: list = []
        for raw in df[self.field]:
            if raw is None or (isinstance(raw, float) and pd.isna(raw)):
                if not self.ignore_missing:
                    raise ValueError(
                        f"field [{self.field}] is null, cannot parse.")
                for p in self.props:
                    outs[p].append(None)
                errs.append(None)
                continue
            data = _b64.b64decode(raw) if isinstance(raw, str) else bytes(raw)
            ctype = self._sniff(data)
            content, err = None, None
            if ctype == "text/html":
                try:
                    content = strip_html(data.decode("utf-8", "replace"))
                except Exception as e:  # malformed markup: record, go on
                    err = f"html parse failed: {e}"
            elif ctype == "text/plain":
                try:
                    content = data.decode("utf-8")
                except UnicodeDecodeError:
                    content = data.decode("latin-1")
            else:
                err = f"no extractor for [{ctype}] in this environment"
            if content is not None:
                content = content.strip()
                if self.cap >= 0:
                    content = content[:self.cap]
            for p in self.props:
                if p == "content":
                    outs[p].append(content)
                elif p == "content_type":
                    outs[p].append(ctype)
                elif p == "content_length":
                    outs[p].append(len(content) if content is not None
                                   else None)
                elif p == "language":
                    outs[p].append(self._language(content)
                                   if content else None)
                else:
                    outs[p].append(None)
            errs.append(err)
        for p in self.props:
            df[f"{self.target}.{p}"] = outs[p]
        # ALWAYS emit the error column (None-filled): a per-batch
        # presence decision gives different blocks different schemas,
        # which breaks Arrow-level downstream ops (review r5 #5)
        df[f"{self.target}.error"] = errs
        return df


def grok_patterns() -> dict:
    """``GET _ingest/processor/grok`` (RestGrokProcessorGetAction):
    expose the built-in grok pattern bank, sorted by pattern name like
    the reference's sorted response."""
    return {"patterns": dict(sorted(GrokProcessor._BANK.items()))}
