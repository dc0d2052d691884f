"""x-pack QL scalar-function layer — the string / date-time / conditional
function registry shared by the SQL and ES|QL surfaces.

Reference surfaces (all public):

- ``x-pack/plugin/sql/src/main/java/org/elasticsearch/xpack/sql/expression/
  function/scalar/string/`` — CONCAT, LEFT, RIGHT, LENGTH, CHAR_LENGTH,
  LCASE, UCASE, LTRIM, RTRIM, TRIM, REPLACE, REPEAT, SUBSTRING, LOCATE,
  INSERT, ASCII, CHAR, SPACE, BIT_LENGTH, OCTET_LENGTH, STARTS_WITH
  (``StringProcessor.java`` / ``BinaryStringStringProcessor.java`` operation
  enums). UPPER/LOWER are accepted as aliases of UCASE/LCASE so oracle
  statements stay runnable on stock SQL engines.
- ``.../scalar/datetime/`` — YEAR, MONTH, DAY, HOUR, MINUTE, SECOND,
  DAY_OF_YEAR, QUARTER, DAY_OF_WEEK (1 = Sunday, ``DateTimeProcessor``),
  ISO_DAY_OF_WEEK (1 = Monday), DATE_TRUNC, DATE_PART, DATE_DIFF, DATE_ADD.
  DATE_DIFF counts unit BOUNDARIES between the truncated operands (the
  same contract DuckDB's date_diff documents), a documented simplification
  of ``DateDiffProcessor``'s calendar arithmetic.
- ``.../predicate/conditional/`` — COALESCE, GREATEST, LEAST, NULLIF,
  IFNULL, ISNULL, IIF (``ConditionalProcessor.java`` families).

Math names fall through to the sandboxed lang-expression table
(``search/expressions.py`` FUNCTIONS) applied element-wise.

Grammar (recursive descent, all evaluation vectorized over a pandas
batch)::

    expr   := or
    or     := and (OR and)*
    and    := not (AND not)*
    not    := NOT not | cmp
    cmp    := add (('='|'=='|'!='|'<>'|'<'|'<='|'>'|'>=') add
               | IS [NOT] NULL)?
    add    := mul (('+'|'-'|'||') mul)*
    mul    := unary (('*'|'/'|'%') unary)*
    unary  := '-' unary | atom
    atom   := number | 'string' | "string" | NULL | TRUE | FALSE
            | NAME '(' args ')' | NAME | '(' expr ')'
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<sq>'(?:[^']|'')*')
    | (?P<dq>"(?:[^"\\]|\\.)*")
    | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op><>|!=|==|<=|>=|\|\||[-+*/%<>=(),])
    )""", re.VERBOSE)

_KEYWORDS = {"AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IS"}


class QlError(ValueError):
    pass


def tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise QlError(f"bad token at: {src[pos:pos + 20]!r}")
            break
        if m.group("sq") is not None:
            out.append(("str", m.group("sq")[1:-1].replace("''", "'")))
        elif m.group("dq") is not None:
            body = m.group("dq")[1:-1]
            out.append(("str", body.replace('\\"', '"')
                        .replace("\\\\", "\\")))
        elif m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("name") is not None:
            v = m.group("name")
            out.append(("kw", v.upper()) if v.upper() in _KEYWORDS
                       else ("name", v))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    return out


# ---------------------------------------------------------------- helpers

def _s(v):
    """String-dtype view (null-preserving) of a Series/scalar."""
    if isinstance(v, pd.Series):
        return v.astype("string")
    return v


def _utf8len(v):
    s = _s(v)
    if isinstance(s, pd.Series):
        return s.map(lambda x: len(str(x).encode("utf-8")),
                     na_action="ignore").astype("Int64")
    return len(str(s).encode("utf-8"))


def _dt(v):
    if isinstance(v, pd.Series):
        return pd.to_datetime(v)
    return pd.Timestamp(v)


_TRUNC_FLOOR = {"day": "D", "hour": "h", "minute": "min", "second": "s",
                "millisecond": "ms"}


def _date_trunc(unit, ts):
    u = str(unit).lower()
    t = _dt(ts)
    if u in _TRUNC_FLOOR:
        return t.dt.floor(_TRUNC_FLOOR[u])
    if u == "month":
        return t.dt.to_period("M").dt.start_time
    if u == "quarter":
        return t.dt.to_period("Q").dt.start_time
    if u == "year":
        return t.dt.to_period("Y").dt.start_time
    if u == "week":  # ISO Monday start (DuckDB date_trunc('week') too)
        return t.dt.to_period("W-SUN").dt.start_time
    raise QlError(f"DATE_TRUNC: unknown unit {unit!r}")


_PART = {
    "year": lambda t: t.dt.year, "month": lambda t: t.dt.month,
    "day": lambda t: t.dt.day, "hour": lambda t: t.dt.hour,
    "minute": lambda t: t.dt.minute, "second": lambda t: t.dt.second,
    "quarter": lambda t: t.dt.quarter, "doy": lambda t: t.dt.dayofyear,
    "isodow": lambda t: t.dt.dayofweek + 1,
}


def _date_part(unit, ts):
    u = str(unit).lower()
    if u not in _PART:
        raise QlError(f"DATE_PART: unknown unit {unit!r}")
    return _PART[u](_dt(ts)).astype("int64")


def _date_diff(unit, t1, t2):
    # boundaries crossed between the truncated operands
    a = _date_trunc(unit, t1) if not isinstance(t1, pd.Timestamp) else t1
    b = _date_trunc(unit, t2)
    u = str(unit).lower()
    if u in ("day", "hour", "minute", "second"):
        step = pd.Timedelta(1, {"day": "D", "hour": "h", "minute": "m",
                                "second": "s"}[u])
        return ((b - a) / step).astype("int64")
    if u == "month":
        return ((b.dt.year - _dt(t1).dt.year) * 12
                + (b.dt.month - _dt(t1).dt.month)).astype("int64")
    if u == "year":
        return (b.dt.year - _dt(t1).dt.year).astype("int64")
    raise QlError(f"DATE_DIFF: unknown unit {unit!r}")


def _date_add(unit, n, ts):
    u = str(unit).lower()
    t = _dt(ts)
    if u in ("day", "hour", "minute", "second", "millisecond"):
        return t + pd.to_timedelta(n, {"day": "D", "hour": "h",
                                       "minute": "m", "second": "s",
                                       "millisecond": "ms"}[u])
    if u == "month":
        return t + pd.DateOffset(months=int(n))
    if u == "year":
        return t + pd.DateOffset(years=int(n))
    raise QlError(f"DATE_ADD: unknown unit {unit!r}")


def _substring(s, start, length):
    s = _s(s)
    b = (np.maximum(np.asarray(start, dtype="int64") - 1, 0)
         if not np.isscalar(start) else max(int(start) - 1, 0))
    if isinstance(s, pd.Series):
        if np.isscalar(b):
            return s.str.slice(int(b), int(b) + int(length))
        return pd.Series([None if pd.isna(x) else
                          str(x)[bb:bb + int(length)]
                          for x, bb in zip(s, b)], index=s.index,
                         dtype="string")
    return str(s)[b:b + int(length)]


def _right(s, n):
    s = _s(s)
    n = int(n)
    if n <= 0:
        return s.str.slice(0, 0) if isinstance(s, pd.Series) else ""
    return s.str.slice(-n) if isinstance(s, pd.Series) else str(s)[-n:]


def _locate(pattern, source, start=1):
    src = _s(source)
    off = max(int(start) - 1, 0)
    if isinstance(src, pd.Series):
        return (src.str.find(str(pattern), off) + 1).astype("Int64")
    return str(source).find(str(pattern), off) + 1


def _insert(source, start, length, repl):
    src = _s(source)
    b = max(int(start) - 1, 0)

    def one(x):
        return x[:b] + str(repl) + x[b + int(length):]

    if isinstance(src, pd.Series):
        return src.map(one, na_action="ignore")
    return one(str(source))


def _coalesce(*args):
    out = None
    for a in args:
        if out is None:
            out = _s(a) if isinstance(a, pd.Series) else a
            continue
        if isinstance(out, pd.Series):
            out = out.fillna(a if not isinstance(a, pd.Series) else _s(a))
        elif pd.isna(out):
            out = a
    return out


def _iif(cond, a, b):
    c = np.asarray(cond, dtype=bool)
    if isinstance(a, pd.Series) or isinstance(b, pd.Series):
        idx = (a if isinstance(a, pd.Series) else b).index
        return pd.Series(np.where(c, a, b), index=idx)
    return np.where(c, a, b)


def _greatest(*args):
    out = args[0]
    for a in args[1:]:
        out = np.maximum(out, a)
    return out


def _least(*args):
    out = args[0]
    for a in args[1:]:
        out = np.minimum(out, a)
    return out


_CAST_TYPES = {
    "BIGINT": "int64", "LONG": "int64", "INTEGER": "int64", "INT": "int64",
    "SMALLINT": "int64", "DOUBLE": "float64", "FLOAT": "float64",
    "REAL": "float64", "VARCHAR": "string", "TEXT": "string",
    "STRING": "string", "KEYWORD": "string", "BOOLEAN": "bool",
    "TIMESTAMP": "datetime", "DATETIME": "datetime", "DATE": "datetime",
}


def _cast(v, type_name: str):
    """``CAST(expr AS type)`` (x-pack sql ``Cast.java`` / the ES|QL
    ``TO_*`` conversion family): SQL truncation-toward-zero for
    float→int (not numpy floor)."""
    t = _CAST_TYPES.get(str(type_name).upper())
    if t is None:
        raise QlError(f"CAST: unknown type {type_name!r}")
    if t == "datetime":
        return _dt(v)
    if isinstance(v, pd.Series):
        if t == "int64":
            if str(v.dtype) in ("string", "object"):
                return v.astype("string").astype("Float64").astype("Int64")
            return v.astype("float64").apply(
                lambda x: None if pd.isna(x) else int(x)).astype("Int64")
        if t == "string":
            return v.astype("string")
        return v.astype(t)
    if t == "int64":
        return int(float(v))
    if t == "float64":
        return float(v)
    if t == "string":
        return str(v)
    return bool(v)


def _nullif(a, b):
    a = _s(a) if isinstance(a, pd.Series) else a
    return a.mask(a == b) if isinstance(a, pd.Series) else \
        (None if a == b else a)


QL_FUNCTIONS = {
    # ---- string
    "CONCAT": lambda a, b: _s(a) + _s(b),
    "LEFT": lambda s, n: _s(s).str.slice(0, max(int(n), 0))
    if isinstance(s, pd.Series) else str(s)[:max(int(n), 0)],
    "RIGHT": _right,
    "LENGTH": lambda s: _s(s).str.len().astype("Int64")
    if isinstance(s, pd.Series) else len(str(s)),
    "CHAR_LENGTH": lambda s: QL_FUNCTIONS["LENGTH"](s),
    "LCASE": lambda s: _s(s).str.lower()
    if isinstance(s, pd.Series) else str(s).lower(),
    "UCASE": lambda s: _s(s).str.upper()
    if isinstance(s, pd.Series) else str(s).upper(),
    "LOWER": lambda s: QL_FUNCTIONS["LCASE"](s),
    "UPPER": lambda s: QL_FUNCTIONS["UCASE"](s),
    "LTRIM": lambda s: _s(s).str.lstrip()
    if isinstance(s, pd.Series) else str(s).lstrip(),
    "RTRIM": lambda s: _s(s).str.rstrip()
    if isinstance(s, pd.Series) else str(s).rstrip(),
    "TRIM": lambda s: _s(s).str.strip()
    if isinstance(s, pd.Series) else str(s).strip(),
    "REPLACE": lambda s, old, new: _s(s).str.replace(
        str(old), str(new), regex=False)
    if isinstance(s, pd.Series) else str(s).replace(str(old), str(new)),
    "REPEAT": lambda s, n: _s(s).str.repeat(max(int(n), 0))
    if isinstance(s, pd.Series) else str(s) * max(int(n), 0),
    "SUBSTRING": _substring,
    "LOCATE": _locate,
    "INSERT": _insert,
    "ASCII": lambda s: _s(s).str.slice(0, 1).map(
        lambda c: ord(c) if c else None, na_action="ignore").astype("Int64")
    if isinstance(s, pd.Series) else ord(str(s)[0]),
    "CHAR": lambda n: chr(int(n)),
    "SPACE": lambda n: " " * max(int(n), 0),
    "BIT_LENGTH": lambda s: _utf8len(s) * 8,
    "OCTET_LENGTH": _utf8len,
    "STARTS_WITH": lambda s, p: _s(s).str.startswith(str(p))
    if isinstance(s, pd.Series) else str(s).startswith(str(p)),
    # ---- date-time
    "YEAR": lambda t: _dt(t).dt.year.astype("int64"),
    "MONTH": lambda t: _dt(t).dt.month.astype("int64"),
    "DAY": lambda t: _dt(t).dt.day.astype("int64"),
    "HOUR": lambda t: _dt(t).dt.hour.astype("int64"),
    "MINUTE": lambda t: _dt(t).dt.minute.astype("int64"),
    "SECOND": lambda t: _dt(t).dt.second.astype("int64"),
    "DAY_OF_YEAR": lambda t: _dt(t).dt.dayofyear.astype("int64"),
    "QUARTER": lambda t: _dt(t).dt.quarter.astype("int64"),
    # DateTimeProcessor DAY_OF_WEEK: 1 = Sunday .. 7 = Saturday
    "DAY_OF_WEEK": lambda t: ((_dt(t).dt.dayofweek + 1) % 7 + 1)
    .astype("int64"),
    "ISO_DAY_OF_WEEK": lambda t: (_dt(t).dt.dayofweek + 1).astype("int64"),
    "DATE_TRUNC": _date_trunc,
    "DATE_PART": _date_part,
    "DATE_DIFF": _date_diff,
    "DATE_ADD": _date_add,
    # ---- type conversion (ES|QL TO_* family; CAST's `expr AS type` and
    # CONVERT's ODBC `expr, SQL_TYPE` forms are intercepted by the parser
    # before this table is consulted)
    "CAST": None,
    "CONVERT": None,
    "TO_LONG": lambda v: _cast(v, "BIGINT"),
    "TO_INTEGER": lambda v: _cast(v, "INTEGER"),
    "TO_DOUBLE": lambda v: _cast(v, "DOUBLE"),
    "TO_STRING": lambda v: _cast(v, "VARCHAR"),
    "TO_BOOLEAN": lambda v: _cast(v, "BOOLEAN"),
    "TO_DATETIME": lambda v: _cast(v, "TIMESTAMP"),
    # ---- conditional
    "COALESCE": _coalesce,
    "IFNULL": _coalesce,
    "ISNULL": _coalesce,
    "NULLIF": _nullif,
    "GREATEST": _greatest,
    "LEAST": _least,
    "IIF": _iif,
}

_QL_NAME_RE = re.compile(
    r"\b(" + "|".join(sorted(QL_FUNCTIONS, key=len, reverse=True))
    + r")\s*\(", re.IGNORECASE)


def has_ql_function(src: str) -> bool:
    """True when the expression calls a registered QL scalar function —
    the dispatch test EVAL/WHERE use to pick this layer over the numeric
    lang-expression engine."""
    return bool(_QL_NAME_RE.search(src))


# ----------------------------------------------------------------- parser

class _Parser:
    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self):
        return self.t[self.i] if self.i < len(self.t) else ("eof", "")

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.take()
        if k != kind or (val is not None and v != val):
            raise QlError(f"expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.or_()
        if self.peek()[0] != "eof":
            raise QlError(f"trailing tokens: {self.t[self.i:]}")
        return node

    def or_(self):
        node = self.and_()
        while self.peek() == ("kw", "OR"):
            self.take()
            rhs = self.and_()
            node = (lambda df, l=node, r=rhs:
                    np.asarray(l(df), bool) | np.asarray(r(df), bool))
        return node

    def and_(self):
        node = self.not_()
        while self.peek() == ("kw", "AND"):
            self.take()
            rhs = self.not_()
            node = (lambda df, l=node, r=rhs:
                    np.asarray(l(df), bool) & np.asarray(r(df), bool))
        return node

    def not_(self):
        if self.peek() == ("kw", "NOT"):
            self.take()
            inner = self.not_()
            return lambda df, x=inner: ~np.asarray(x(df), bool)
        return self.cmp()

    def cmp(self):
        node = self.add()
        k, v = self.peek()
        if (k, v) == ("kw", "IS"):
            self.take()
            neg = False
            if self.peek() == ("kw", "NOT"):
                self.take()
                neg = True
            self.expect("kw", "NULL")
            return (lambda df, x=node, n=neg:
                    ~pd.isna(x(df)) if n else pd.isna(x(df)))
        if k == "op" and v in ("=", "==", "!=", "<>", "<", "<=", ">", ">="):
            self.take()
            rhs = self.add()
            op = {"=": "eq", "==": "eq", "!=": "ne", "<>": "ne",
                  "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}[v]

            def c(df, l=node, r=rhs, op=op):
                a, b = l(df), r(df)
                f = {"eq": lambda x, y: x == y, "ne": lambda x, y: x != y,
                     "lt": lambda x, y: x < y, "le": lambda x, y: x <= y,
                     "gt": lambda x, y: x > y, "ge": lambda x, y: x >= y}
                return f[op](a, b)
            return c
        return node

    def add(self):
        node = self.mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-", "||"):
            _k, v = self.take()
            rhs = self.mul()
            if v == "+":
                node = lambda df, l=node, r=rhs: l(df) + r(df)
            elif v == "-":
                node = lambda df, l=node, r=rhs: l(df) - r(df)
            else:
                node = (lambda df, l=node, r=rhs:
                        _s(l(df)) + _s(r(df)))
        return node

    def mul(self):
        node = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _k, v = self.take()
            rhs = self.unary()
            if v == "*":
                node = lambda df, l=node, r=rhs: l(df) * r(df)
            elif v == "/":
                node = lambda df, l=node, r=rhs: l(df) / r(df)
            else:
                node = lambda df, l=node, r=rhs: l(df) % r(df)
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.take()
            inner = self.unary()
            return lambda df, x=inner: -x(df)
        return self.atom()

    def atom(self):
        k, v = self.take()
        if k == "num":
            val = float(v) if any(c in v for c in ".eE") else int(v)
            return lambda df, x=val: x
        if k == "str":
            return lambda df, x=v: x
        if (k, v) == ("kw", "NULL"):
            return lambda df: None
        if (k, v) == ("kw", "TRUE"):
            return lambda df: True
        if (k, v) == ("kw", "FALSE"):
            return lambda df: False
        if (k, v) == ("op", "("):
            node = self.or_()
            self.expect("op", ")")
            return node
        if k == "name":
            if v.upper() == "CONVERT" and self.peek() == ("op", "("):
                # ODBC CONVERT(expr, SQL_<TYPE>) — the reference's Cast
                # alias (sql/expression/function/scalar/Cast.java docs)
                self.take()
                inner = self.or_()
                self.expect("op", ",")
                tk, tv = self.take()
                if tk != "name":
                    raise QlError("CONVERT expects a type name")
                self.expect("op", ")")
                tname = tv.upper().removeprefix("SQL_")
                if tname not in _CAST_TYPES:
                    raise QlError(f"CONVERT: unknown type {tv!r}")
                return lambda df, x=inner, t=tname: _cast(x(df), t)
            if v.upper() == "CAST" and self.peek() == ("op", "("):
                self.take()
                inner = self.or_()
                ak, av = self.take()
                if ak != "name" or av.upper() != "AS":
                    raise QlError("CAST expects `expr AS type`")
                tk, tv = self.take()
                if tk != "name":
                    raise QlError("CAST expects a type name")
                self.expect("op", ")")
                if tv.upper() not in _CAST_TYPES:
                    raise QlError(f"CAST: unknown type {tv!r}")
                return lambda df, x=inner, t=tv: _cast(x(df), t)
            if self.peek() == ("op", "("):
                self.take()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_())
                    while self.peek() == ("op", ","):
                        self.take()
                        args.append(self.or_())
                self.expect("op", ")")
                fname = v.upper()
                if QL_FUNCTIONS.get(fname) is not None:
                    fn = QL_FUNCTIONS[fname]
                    return (lambda df, f=fn, a=args:
                            f(*(x(df) for x in a)))
                # math fallthrough: the lang-expression table, element-wise
                from elasticsearch_ray.search.expressions import FUNCTIONS

                if v.lower() in FUNCTIONS:
                    fn = FUNCTIONS[v.lower()]
                    return (lambda df, f=fn, a=args:
                            f(*(x(df) for x in a)))
                raise QlError(f"unknown function {v!r}")
            col = v
            return lambda df, c=col: df[c]
        raise QlError(f"unexpected token {v!r}")


def compile_ql(src: str):
    """Compile an expression into ``fn(pandas.DataFrame) -> Series``."""
    return _Parser(tokenize(src)).parse()


def add_ql_column(ds, name: str, expr: str):
    """EVAL with a QL scalar expression: one streaming map_batches stage
    appending the computed column (compute-on-scan, no shuffle)."""
    fn = compile_ql(expr)

    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = fn(df)
        if not isinstance(v, pd.Series):
            v = pd.Series([v] * len(df), index=df.index)
        df[name] = v
        return df

    return ds.map_batches(add, batch_format="pandas")


def ql_where(ds, expr: str):
    """WHERE with a QL scalar expression (boolean result)."""
    fn = compile_ql(expr)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        mask = fn(df)
        mask = np.asarray(pd.Series(mask).fillna(False), dtype=bool) \
            if isinstance(mask, pd.Series) else np.asarray(mask, bool)
        return df[mask]

    return ds.map_batches(keep, batch_format="pandas")
