"""x-pack SQL subset (``x-pack/plugin/sql`` — ``SqlParser.java``,
``TransportSqlQueryAction.java``, and the ``_sql/translate`` endpoint):
SQL compiled onto the SAME execution stages as ES|QL, mirroring the
reference design where both QL dialects lower to one logical-plan
layer (``x-pack/plugin/ql``).

Supported statement::

    SELECT [DISTINCT] item [, ...]
    FROM <table>
    [WHERE <condition>]
    [GROUP BY col [, ...]]
    [HAVING <condition>]
    [ORDER BY expr [ASC|DESC] [, ...]]
    [LIMIT n]

where ``item`` is a column, ``AGG(col|*)`` (COUNT/SUM/AVG/MIN/MAX/
COUNT_DISTINCT), a scalar arithmetic expression, or a scalar FUNCTION
call from the QL registry (string/date-time/conditional families —
``search/qlfuncs.py``, mirroring ``x-pack/plugin/sql/.../expression/
function/scalar``), each optionally ``AS alias``. Scalar functions are
also accepted in WHERE comparisons (compiled onto the QL layer's
vectorized predicate path). Conditions support
``= <> != > >= < <= IN (...) LIKE '%wild_card' IS [NOT] NULL`` joined
by AND/OR/NOT and parentheses (SQL ``%``/``_`` wildcards become the
pipe dialect's ``*``/``?``).

``sql_translate`` returns the compiled ES|QL pipe (the analog of
``_sql/translate`` returning the search DSL a statement compiles to);
``sql_query`` executes it via :func:`search.esql.esql`, so the
distributed shape (streaming WHERE, one map-side-combined STATS
shuffle, sort+limit) is exactly the ES|QL one.
"""

from __future__ import annotations

import re

_AGGS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "COUNT_DISTINCT", "MEDIAN",
         "PERCENTILE"}

_SQL_TOKEN = re.compile(r"""
    \s*(?:
      (?P<string>'(?:[^']|'')*')
    | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<op><>|!=|<=|>=|[(),*=<>+\-/%])
    )""", re.VERBOSE)

_CLAUSES = ("SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER",
            "LIMIT")


class SqlError(ValueError):
    pass


def _tokenize(sql: str):
    toks, pos = [], 0
    s = sql.strip().rstrip(";")
    while pos < len(s):
        m = _SQL_TOKEN.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip():
                raise SqlError(f"cannot tokenize SQL at: {s[pos:pos+20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "name" and val.upper() in {
                *_CLAUSES, "BY", "AS", "AND", "OR", "NOT", "IN", "LIKE",
                "IS", "NULL", "ASC", "DESC", "DISTINCT", *_AGGS}:
            toks.append(("kw", val.upper()))
        else:
            toks.append((kind, val))
    return toks


def _split_clauses(toks):
    """{clause: token list} in statement order."""
    out, cur, name = {}, [], None
    i = 0
    while i < len(toks):
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if t[0] == "kw" and t[1] in _CLAUSES:
            if t[1] in ("GROUP", "ORDER"):
                if nxt != ("kw", "BY"):
                    raise SqlError(f"{t[1]} must be followed by BY")
                i += 1
            if name is not None:
                out[name] = cur
            elif cur:
                raise SqlError("statement must start with SELECT")
            name, cur = t[1], []
        else:
            cur.append(t)
        i += 1
    if name is not None:
        out[name] = cur
    if "SELECT" not in out or "FROM" not in out:
        raise SqlError("statement needs SELECT ... FROM ...")
    return out


def _split_commas(toks):
    parts, cur, depth = [], [], 0
    for t in toks:
        if t == ("op", "(") :
            depth += 1
        elif t == ("op", ")"):
            depth -= 1
        if t == ("op", ",") and depth == 0:
            parts.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        parts.append(cur)
    return parts


def _parse_select_item(toks):
    """-> (kind, expr, alias): kind 'col', 'agg', or 'expr' (a scalar
    arithmetic expression, compiled onto an EVAL stage)."""
    alias = None
    if len(toks) >= 2 and toks[-2] == ("kw", "AS"):
        if toks[-1][0] != "name":
            raise SqlError("AS needs an alias name")
        alias = toks[-1][1]
        toks = toks[:-2]
    if len(toks) == 1 and toks[0][0] == "name":
        return "col", toks[0][1], alias or toks[0][1]
    if (len(toks) == 4 and toks[0][0] == "kw" and toks[0][1] in _AGGS
            and toks[1] == ("op", "(") and toks[-1] == ("op", ")")):
        fn = toks[0][1]
        if fn == "PERCENTILE":
            raise SqlError("PERCENTILE takes (col, percent)")
        arg = toks[2]
        if arg == ("op", "*"):
            if fn != "COUNT":
                raise SqlError(f"{fn}(*) is not valid SQL")
            argname = "*"
        elif arg[0] == "name":
            argname = arg[1]
        else:
            raise SqlError(f"{fn} takes a column (or * for COUNT)")
        default = f"{fn}({argname})"
        return "agg", (fn, argname), alias or default
    # PERCENTILE(col, pct) (x-pack sql .../aggregate/Percentile.java)
    if (len(toks) == 6 and toks[0] == ("kw", "PERCENTILE")
            and toks[1] == ("op", "(") and toks[2][0] == "name"
            and toks[3] == ("op", ",") and toks[4][0] == "number"
            and toks[5] == ("op", ")")):
        argname = f"{toks[2][1]}, {toks[4][1]}"
        return "agg", ("PERCENTILE", argname), alias or \
            f"PERCENTILE({argname})"
    # scalar expression item (e.g. value * 2 + 1 AS x): numeric
    # names/numbers/arithmetic only — rides the sandboxed expression
    # engine via an ES|QL EVAL stage; an alias is required (the
    # reference names computed columns after the source text, which the
    # pipe dialect has no room for)
    if toks and all(k in ("name", "number") or (k == "op" and
                    v in "()*/%+-")
                    for k, v in toks):
        if alias is None:
            raise SqlError(
                f"expression select items need AS <alias>: {toks}")
        src = " ".join(v for _k, v in toks)
        return "expr", src, alias
    # HISTOGRAM grouping function (x-pack sql expression/function/grouping/
    # Histogram.java): numeric HISTOGRAM(col, step) buckets at
    # floor(col/step)*step; date HISTOGRAM(col, INTERVAL 1 <unit>)
    # truncates to the unit. Must be grouped on its alias.
    if (len(toks) >= 4 and toks[0][0] == "name"
            and toks[0][1].upper() == "HISTOGRAM"):
        if toks[1] != ("op", "(") or toks[-1] != ("op", ")"):
            raise SqlError("HISTOGRAM takes (col, step | INTERVAL 1 unit)")
        if alias is None:
            raise SqlError("HISTOGRAM select items need AS <alias>")
        inner = toks[2:-1]
        if (len(inner) == 3 and inner[0][0] == "name"
                and inner[1] == ("op", ",") and inner[2][0] == "number"):
            return "hist", (inner[0][1], inner[2][1], None), alias
        if (len(inner) == 5 and inner[0][0] == "name"
                and inner[1] == ("op", ",")
                and inner[2] == ("name", "INTERVAL")
                and inner[3] == ("number", "1") and inner[4][0] == "name"):
            return "hist", (inner[0][1], None, inner[4][1].lower()), alias
        raise SqlError(f"unsupported HISTOGRAM arguments: {inner}")
    # scalar-function item (UCASE/SUBSTRING/YEAR/COALESCE/... — the QL
    # function registry, search/qlfuncs.py): compiles to the same EVAL
    # stage; strings re-quote to the pipe dialect's double quotes
    if toks and _has_scalar_call(toks):
        if alias is None:
            raise SqlError(
                f"function select items need AS <alias>: {toks}")
        return "expr", _item_src(toks), alias
    raise SqlError(f"unsupported select item: {toks}")


def _has_scalar_call(toks) -> bool:
    from elasticsearch_ray.search.qlfuncs import QL_FUNCTIONS

    return any(
        k == "name" and v.upper() in QL_FUNCTIONS
        and i + 1 < len(toks) and toks[i + 1] == ("op", "(")
        for i, (k, v) in enumerate(toks))


def _item_src(toks) -> str:
    """Token run -> pipe-dialect source text (SQL 'strings' become
    double-quoted)."""
    parts = []
    for k, v in toks:
        if k == "string":
            body = v[1:-1].replace("''", "'")
            parts.append('"' + body.replace("\\", "\\\\")
                         .replace('"', '\\"') + '"')
        else:
            parts.append(v)
    return " ".join(parts)


def _cond_to_pipe(toks) -> str:
    """SQL condition tokens -> the ES|QL condition dialect."""
    out = []
    i = 0
    while i < len(toks):
        kind, val = toks[i]
        if kind == "op" and val == "=":
            out.append("==")
        elif kind == "op" and val in ("<>", "!="):
            out.append("!=")
        elif kind == "string":
            body = val[1:-1].replace("''", "'")
            if (i >= 1 and toks[i - 1] == ("kw", "LIKE")):
                # SQL wildcards -> pipe-dialect wildcards
                body = body.replace("%", "*").replace("_", "?")
            out.append('"' + body.replace("\\", "\\\\")
                       .replace('"', '\\"') + '"')
        elif kind == "kw":
            out.append(val)
        else:
            out.append(val)
        i += 1
    return " ".join(out)


def sql_translate(sql: str) -> str:
    """Compile a SQL statement into the equivalent ES|QL pipe (the
    ``_sql/translate`` analog)."""
    clauses = _split_clauses(_tokenize(sql))
    sel = clauses["SELECT"]
    distinct = bool(sel) and sel[0] == ("kw", "DISTINCT")
    if distinct:
        sel = sel[1:]
    star = sel == [("op", "*")]
    items = [] if star else [_parse_select_item(p)
                             for p in _split_commas(sel)]
    frm = clauses["FROM"]
    if len(frm) != 1 or frm[0][0] != "name":
        raise SqlError("FROM takes one table name")
    table = frm[0][1]

    group_cols = []
    if "GROUP" in clauses and star:
        raise SqlError("SELECT * cannot be combined with GROUP BY")
    if "GROUP" in clauses:
        for p in _split_commas(clauses["GROUP"]):
            if len(p) != 1 or p[0][0] != "name":
                raise SqlError("GROUP BY takes column names")
            group_cols.append(p[0][1])

    aggs = [(expr, alias) for kind, expr, alias in items if kind == "agg"]
    plain = [(expr, alias) for kind, expr, alias in items if kind == "col"]
    exprs = [(expr, alias) for kind, expr, alias in items if kind == "expr"]
    hists = [(expr, alias) for kind, expr, alias in items if kind == "hist"]
    if exprs and (aggs or group_cols or distinct):
        # a scalar item may combine with GROUP BY when it IS a group key
        # (SELECT YEAR(ts) AS y, COUNT(*) ... GROUP BY y): its EVAL runs
        # before the STATS shuffle, exactly the HISTOGRAM shape
        if not all(alias in group_cols for _s, alias in exprs):
            raise SqlError(
                "expression select items must be grouped on their alias "
                "when combined with aggregates/GROUP BY/DISTINCT")
    for _e, alias in hists:
        if alias not in group_cols:
            raise SqlError(
                f"HISTOGRAM item {alias!r} must be grouped on its alias")

    pipe = [f"FROM {table}"]
    if "WHERE" in clauses:
        pipe.append("WHERE " + _cond_to_pipe(clauses["WHERE"]))
    if hists:
        # bucket-key columns computed before the STATS shuffle
        parts = []
        for (col, step, unit), alias in hists:
            if unit is None:
                parts.append(f"{alias} = floor({col} / {step}) * {step}")
            else:
                parts.append(f'{alias} = DATE_TRUNC("{unit}", {col})')
        pipe.append("EVAL " + ", ".join(parts))
    if exprs:
        pipe.append("EVAL " + ", ".join(f"{alias} = {src}"
                                        for src, alias in exprs))

    renames = []
    if aggs or group_cols:
        for expr, alias in plain:
            if expr not in group_cols:
                raise SqlError(
                    f"column {expr!r} must appear in GROUP BY or an "
                    f"aggregate function")
        stats = ", ".join(f"{alias} = {fn}({arg})"
                          for (fn, arg), alias in aggs)
        if not stats:
            # SELECT DISTINCT a, b / bare GROUP BY: a count that is
            # dropped by the final KEEP
            stats = "__cnt = COUNT(*)"
        by = f" BY {', '.join(group_cols)}" if group_cols else ""
        pipe.append(f"STATS {stats}{by}")
        renames = [(expr, alias) for expr, alias in plain
                   if alias != expr]
    elif distinct:
        cols = [expr for expr, _a in plain]
        if not cols:
            raise SqlError("SELECT DISTINCT needs columns")
        pipe.append(f"STATS __cnt = COUNT(*) BY {', '.join(cols)}")
        renames = [(expr, alias) for expr, alias in plain
                   if alias != expr]
    else:
        renames = [(expr, alias) for expr, alias in plain
                   if alias != expr]
    rename_map = dict(renames)
    if renames:
        pipe.append("RENAME " + ", ".join(f"{old} AS {new}"
                                          for old, new in renames))
    if "HAVING" in clauses:
        if not (aggs or group_cols):
            raise SqlError("HAVING needs GROUP BY / aggregates")
        # RENAME already ran — SQL allows HAVING/ORDER BY to use either
        # the original column name or its alias, so map originals forward
        having = [("name", rename_map.get(v, v)) if k == "name" else (k, v)
                  for k, v in clauses["HAVING"]]
        pipe.append("WHERE " + _cond_to_pipe(having))

    if "ORDER" in clauses:
        if not clauses["ORDER"]:
            raise SqlError("ORDER BY needs at least one key")
        keys = []
        for p in _split_commas(clauses["ORDER"]):
            d = ""
            if p and p[-1] in (("kw", "ASC"), ("kw", "DESC")):
                d = " " + p[-1][1]
                p = p[:-1]
            if len(p) != 1 or p[0][0] != "name":
                raise SqlError("ORDER BY takes column names")
            keys.append(rename_map.get(p[0][1], p[0][1]) + d)
        pipe.append("SORT " + ", ".join(keys))

    if "LIMIT" in clauses:
        lim = clauses["LIMIT"]
        if len(lim) != 1 or lim[0][0] != "number":
            raise SqlError("LIMIT takes one number")
        pipe.append(f"LIMIT {int(lim[0][1])}")

    if items:
        keep = [alias for _k, _e, alias in items]
        pipe.append("KEEP " + ", ".join(keep))
    return " | ".join(pipe)


def sql_query(sql: str, tables, enrich_policies: dict | None = None):
    """Execute a SQL statement over Ray Datasets (``tables`` as in
    :func:`search.esql.esql`). ``SHOW TABLES [LIKE 'pat%']`` and
    ``DESCRIBE <table>`` (``SysTables``/``SysColumns`` in the
    reference's command layer) answer from the table map / schema
    without scanning rows."""
    import fnmatch as _fn

    import pandas as pd

    s = sql.strip().rstrip(";")
    m = re.match(r"(?is)^SHOW\s+TABLES(?:\s+LIKE\s+'([^']*)')?$", s)
    if m:
        if callable(tables):
            # a resolver can't be enumerated (review r5 #9)
            raise SqlError(
                "SHOW TABLES needs a table MAP; a callable resolver "
                "cannot be enumerated")
        pat = (m.group(1) or "%").replace("%", "*").replace("_", "?")
        names = sorted(n for n in tables if _fn.fnmatch(n, pat))
        return pd.DataFrame({"name": names,
                             "type": ["TABLE"] * len(names)})
    m = re.match(r"(?is)^(?:DESCRIBE|DESC)\s+([A-Za-z_][A-Za-z0-9_]*)$", s)
    if m:
        name = m.group(1)
        if callable(tables):
            try:
                ds_t = tables(name)
            except Exception:
                raise SqlError(f"Unknown index [{name}]") from None
        elif name in tables:
            ds_t = tables[name]
        else:
            raise SqlError(f"Unknown index [{name}]")
        schema = ds_t.schema()
        # the reference's SysColumns type names for the common lanes
        type_map = {"int64": "BIGINT", "int32": "INTEGER",
                    "double": "DOUBLE", "float": "REAL",
                    "string": "VARCHAR", "large_string": "VARCHAR",
                    "bool": "BOOLEAN", "timestamp[us]": "TIMESTAMP",
                    "timestamp[ns]": "TIMESTAMP"}
        def tname(t) -> str:
            s = str(t)
            if s.startswith("<class"):  # pandas object lane
                return "VARCHAR"
            s = s.removeprefix("DataType(").removesuffix(")")
            return type_map.get(s, s.upper())

        return pd.DataFrame({
            "column": list(schema.names),
            "type": [tname(t) for t in schema.types],
        })
    from elasticsearch_ray.search.esql import esql

    return esql(sql_translate(sql), tables, enrich_policies)
