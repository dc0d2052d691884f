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

PIVOT (``plan/logical/Pivot.java`` + ``QueryFolder.FoldPivot``) is also
supported: ``SELECT * FROM (<child select>) PIVOT (AGG(col) FOR pcol IN
(lit [AS name], ...)) [ORDER BY ...] [LIMIT n]`` — one map-side-combined
STATS shuffle over ``grouping + pcol`` then a driver reshape of the
already-reduced frame (see :func:`_pivot_query`).

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


def _find_top_level_pivot(s: str) -> int:
    """Offset of a depth-0 ``PIVOT`` keyword outside string literals,
    or -1."""
    depth, i, n = 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n:
                if s[i] == "'" and not (i + 1 < n and s[i + 1] == "'"):
                    break
                i += 2 if s[i] == "'" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i:i + 5].upper() == "PIVOT" and \
                (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")) and \
                (i + 5 >= n or not (s[i + 5].isalnum() or s[i + 5] == "_")):
            return i
        i += 1
    return -1


def _parse_pivot(s: str):
    """``SELECT * FROM (<inner>) PIVOT (AGG(col) FOR pcol IN (lit [AS
    name], ...)) [ORDER BY ...] [LIMIT n]`` -> parsed parts.

    Mirrors ``x-pack/plugin/sql/.../plan/logical/Pivot.java``: the
    grouping set is the child's output minus the pivot column minus the
    aggregate's references (computed by the caller, which knows the
    child schema)."""
    at = _find_top_level_pivot(s)
    head = s[:at].rstrip()
    m = re.match(r"(?is)^SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<src>.*)$",
                 head)
    if m is None:
        raise SqlError("PIVOT needs SELECT ... FROM <source> PIVOT (...)")
    sel = m.group("sel").strip()
    src = m.group("src").strip()
    rest = s[at + 5:].lstrip()
    if not rest.startswith("("):
        raise SqlError("PIVOT needs a parenthesized body")
    depth, j = 0, 0
    while j < len(rest):
        if rest[j] == "(":
            depth += 1
        elif rest[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        raise SqlError("unbalanced parens in PIVOT body")
    body, tail = rest[1:j], rest[j + 1:].strip()
    bm = re.match(
        r"(?is)^\s*(?P<fn>[A-Za-z_]+)\s*\(\s*(?P<arg>\*|[A-Za-z_][\w.]*)"
        r"\s*\)(?:\s+AS\s+[A-Za-z_]\w*)?\s+FOR\s+(?P<pcol>[A-Za-z_][\w.]*)"
        r"\s+IN\s*\((?P<vals>.*)\)\s*$", body)
    if bm is None:
        raise SqlError(
            "PIVOT body must be AGG(col) FOR pcol IN (lit [AS name], ...)")
    fn = bm.group("fn").upper()
    if fn not in _AGGS:
        raise SqlError(f"unsupported PIVOT aggregate: {fn}")
    values = []
    for part in _split_commas(_tokenize(bm.group("vals"))):
        alias = None
        if len(part) >= 2 and part[-2] == ("kw", "AS"):
            if part[-1][0] != "name":
                raise SqlError("PIVOT value AS needs a name")
            alias = part[-1][1]
            part = part[:-2]
        if len(part) != 1 or part[0][0] not in ("string", "number"):
            raise SqlError(f"PIVOT IN takes literals: {part}")
        kind, lit = part[0]
        if kind == "string":
            val = lit[1:-1].replace("''", "'")
            values.append((val, alias or val, True))
        else:
            values.append((lit, alias or lit, False))
    if not values:
        raise SqlError("PIVOT IN needs at least one value")
    order, limit = [], None
    if tail:
        tm = re.match(
            r"(?is)^(?:ORDER\s+BY\s+(?P<ord>.*?))?"
            r"(?:\s*LIMIT\s+(?P<lim>\d+))?\s*$", tail)
        if tm is None or (tm.group("ord") is None
                          and tm.group("lim") is None):
            raise SqlError(f"unsupported tokens after PIVOT: {tail!r}")
        if tm.group("ord"):
            for key in tm.group("ord").split(","):
                key = key.strip()
                desc = False
                km = re.match(r"(?is)^(.*?)\s+(ASC|DESC)$", key)
                if km:
                    key, desc = km.group(1).strip(), \
                        km.group(2).upper() == "DESC"
                order.append((key, desc))
        if tm.group("lim"):
            limit = int(tm.group("lim"))
    return sel, src, (fn, bm.group("arg")), bm.group("pcol"), values, \
        order, limit


def _pivot_query(sql: str, tables, enrich_policies=None):
    """Execute a PIVOT statement (``Pivot.java`` +
    ``QueryFolder.FoldPivot``): the child select projects columns, the
    grouping set is child output minus the pivot column minus the
    aggregate argument, rows whose pivot value is outside the IN list
    are dropped, and each IN value becomes one output column holding
    the aggregate over its slice (absent combinations are null).

    Distributed shape: ONE map-side-combined STATS shuffle over
    ``grouping + pivot_col`` (the reference folds pivot onto its
    composite-agg grouping the same way); the reshape runs on the
    already-reduced frame (|groups| x |values| rows) on the driver.

    Divergence: rows with a null grouping value are dropped (the STATS
    stage, like a composite agg with ``missing_bucket=false``, has no
    null-group bucket; the reference's ``GroupByKey.java:70`` sets
    ``missingBucket(true)`` and would emit one).
    """
    import numpy as np
    import pandas as pd

    from elasticsearch_ray.search.esql import esql

    sel, src, (fn, arg), pcol, values, order, limit = _parse_pivot(
        sql.strip().rstrip(";"))
    if sel.strip() != "*":
        raise SqlError("PIVOT supports SELECT * over the pivoted output")
    if src.startswith("("):
        if not src.endswith(")"):
            raise SqlError("unbalanced parens around the PIVOT subquery")
        inner = _split_clauses(_tokenize(src[1:-1]))
        if set(inner) - {"SELECT", "FROM", "WHERE"}:
            raise SqlError(
                "the PIVOT subquery supports SELECT cols FROM t [WHERE]")
        items = [_parse_select_item(p)
                 for p in _split_commas(inner["SELECT"])] \
            if inner["SELECT"] != [("op", "*")] else None
        if items is not None and any(k != "col" for k, _e, _a in items):
            raise SqlError("the PIVOT subquery takes plain columns")
        frm = inner["FROM"]
        if len(frm) != 1 or frm[0][0] != "name":
            raise SqlError("FROM takes one table name")
        table = frm[0][1]
        where = _cond_to_pipe(inner["WHERE"]) if "WHERE" in inner else None
        child_cols = [a for _k, _e, a in items] if items is not None \
            else None
    else:
        if not re.match(r"^[A-Za-z_][\w.]*$", src):
            raise SqlError(f"unsupported PIVOT source: {src!r}")
        table, where, child_cols = src, None, None
    if child_cols is None:
        ds_t = tables(table) if callable(tables) else tables.get(table)
        if ds_t is None:
            raise SqlError(f"Unknown index [{table}]")
        child_cols = list(ds_t.schema().names)
    if pcol not in child_cols:
        raise SqlError(f"PIVOT column {pcol!r} not in the child output")
    group_cols = [c for c in child_cols if c != pcol and c != arg]
    if not group_cols:
        raise SqlError("PIVOT needs at least one grouping column")

    def _q(v: str) -> str:
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'

    in_list = ", ".join(_q(v) if is_s else v for v, _n, is_s in values)
    pipe = [f"FROM {table}"]
    if where:
        pipe.append(f"WHERE {where}")
    pipe.append(f"WHERE {pcol} IN ({in_list})")
    for g in group_cols:
        pipe.append(f"WHERE {g} IS NOT NULL")
    pipe.append(f"STATS __pv = {fn}({arg}) "
                f"BY {', '.join(group_cols)}, {pcol}")
    flat = esql(" | ".join(pipe), tables, enrich_policies)
    if not isinstance(flat, pd.DataFrame):
        flat = flat.to_pandas()
    if len(flat) == 0:
        wide = pd.DataFrame(columns=group_cols
                            + [n for _v, n, _s in values])
    else:
        wide = flat.pivot(index=group_cols, columns=pcol,
                          values="__pv").reset_index()
        wide.columns.name = None
        # IN-list order, absent combinations as nulls; numeric pivot
        # values may come back as int64/float column labels
        rename, keep = {}, []
        for v, name, is_s in values:
            key = v
            if not is_s:
                for cand in (v, int(float(v)) if float(v).is_integer()
                             else None, float(v)):
                    if cand is not None and cand in wide.columns:
                        key = cand
                        break
            if key in wide.columns:
                rename[key] = name
            else:
                wide[name] = np.nan
            keep.append(name)
        wide = wide.rename(columns=rename)[group_cols + keep]
    if order:
        cols, asc = [], []
        for key, desc in order:
            if key not in wide.columns:
                raise SqlError(f"unknown ORDER BY key {key!r}")
            cols.append(key)
            asc.append(not desc)
        wide = wide.sort_values(cols, ascending=asc, kind="mergesort")
    if limit is not None:
        wide = wide.head(limit)
    return wide.reset_index(drop=True)


# JDBC java.sql.Types ids + the reference's SysColumns/SysTypes type
# names for our Arrow lanes (DataTypes.java sqlType mapping)
_JDBC_TYPES = {
    "BIGINT": -5, "INTEGER": 4, "SMALLINT": 5, "TINYINT": -6,
    "DOUBLE": 8, "REAL": 7, "FLOAT": 6, "VARCHAR": 12, "BOOLEAN": 16,
    "TIMESTAMP": 93, "DATE": 91, "TIME": 92,
}
_TYPE_PRECISION = {
    "BIGINT": 19, "INTEGER": 10, "SMALLINT": 5, "TINYINT": 3,
    "DOUBLE": 15, "REAL": 7, "FLOAT": 15, "VARCHAR": 32766,
    "BOOLEAN": 1, "TIMESTAMP": 29, "DATE": 29, "TIME": 18,
}
# the CONDITIONAL bucket of SqlFunctionTypeRegistry; aggregates are
# AGGREGATE, HISTOGRAM is GROUPING, everything else in the QL registry
# is SCALAR
_CONDITIONAL_FNS = {"COALESCE", "NULLIF", "GREATEST", "LEAST", "IIF",
                    "IFNULL", "ISNULL"}


def _arrow_type_name(t) -> str:
    s = str(t)
    if s.startswith("<class"):
        return "VARCHAR"
    s = s.removeprefix("DataType(").removesuffix(")")
    return {"int64": "BIGINT", "int32": "INTEGER", "int16": "SMALLINT",
            "int8": "TINYINT", "double": "DOUBLE", "float": "REAL",
            "string": "VARCHAR", "large_string": "VARCHAR",
            "bool": "BOOLEAN", "timestamp[us]": "TIMESTAMP",
            "timestamp[ns]": "TIMESTAMP", "date32[day]": "DATE",
            }.get(s, s.upper())


def _like_match(pat: str | None, name: str) -> bool:
    import fnmatch
    if pat is None:
        return True
    return fnmatch.fnmatch(name,
                           pat.replace("%", "*").replace("_", "?"))


def _command_query(s: str, tables):
    """The SQL command layer (``plan/logical/command``): SHOW
    FUNCTIONS/CATALOGS/SCHEMAS and the ODBC-backing SYS
    TABLES/COLUMNS/TYPES — all answered from the registry / table map /
    schemas without scanning rows (the reference resolves them on the
    coordinator the same way). Returns None when ``s`` is not a
    command."""
    import pandas as pd

    m = re.match(r"(?is)^SHOW\s+FUNCTIONS(?:\s+LIKE\s+'([^']*)')?$", s)
    if m:
        from elasticsearch_ray.search.qlfuncs import QL_FUNCTIONS

        rows = [(n, "AGGREGATE") for n in _AGGS]
        rows.append(("HISTOGRAM", "GROUPING"))
        rows += [(n, "CONDITIONAL" if n in _CONDITIONAL_FNS else "SCALAR")
                 for n in QL_FUNCTIONS]
        rows = sorted((n, t) for n, t in rows if _like_match(m.group(1), n))
        return pd.DataFrame(rows, columns=["name", "type"])
    if re.match(r"(?is)^SHOW\s+CATALOGS$", s):
        return pd.DataFrame({"name": ["elasticsearch-ray"],
                             "type": ["local"]})
    if re.match(r"(?is)^SHOW\s+SCHEMAS$", s):
        return pd.DataFrame({"schema": pd.Series([], dtype="object")})
    m = re.match(r"(?is)^SYS\s+TABLES(?:\s+LIKE\s+'([^']*)')?$", s)
    if m:
        if callable(tables):
            raise SqlError("SYS TABLES needs a table MAP")
        names = sorted(n for n in tables if _like_match(m.group(1), n))
        return pd.DataFrame({
            "TABLE_CAT": ["elasticsearch-ray"] * len(names),
            "TABLE_SCHEM": [None] * len(names),
            "TABLE_NAME": names,
            "TABLE_TYPE": ["TABLE"] * len(names),
            "REMARKS": [""] * len(names),
        })
    m = re.match(r"(?is)^SYS\s+COLUMNS(?:\s+TABLE\s+LIKE\s+'([^']*)')?"
                 r"(?:\s+LIKE\s+'([^']*)')?$", s)
    if m:
        if callable(tables):
            raise SqlError("SYS COLUMNS needs a table MAP")
        rows = []
        for tname in sorted(tables):
            if not _like_match(m.group(1), tname):
                continue
            schema = tables[tname].schema()
            for pos, (col, typ) in enumerate(
                    zip(schema.names, schema.types), start=1):
                if not _like_match(m.group(2), col):
                    continue
                tn = _arrow_type_name(typ)
                rows.append(("elasticsearch-ray", None, tname, col,
                             _JDBC_TYPES.get(tn, 1111), tn, pos, "YES"))
        return pd.DataFrame(rows, columns=[
            "TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
            "DATA_TYPE", "TYPE_NAME", "ORDINAL_POSITION", "IS_NULLABLE"])
    if re.match(r"(?is)^SYS\s+TYPES$", s):
        rows = [(n, _JDBC_TYPES[n], _TYPE_PRECISION[n])
                for n in sorted(_JDBC_TYPES,
                                key=lambda n: (_JDBC_TYPES[n], n))]
        return pd.DataFrame(rows,
                            columns=["TYPE_NAME", "DATA_TYPE",
                                     "PRECISION"])
    return None


def sql_query(sql: str, tables, enrich_policies: dict | None = None):
    """Execute a SQL statement over Ray Datasets (``tables`` as in
    :func:`search.esql.esql`). ``SHOW TABLES [LIKE 'pat%']`` and
    ``DESCRIBE <table>`` (``SysTables``/``SysColumns`` in the
    reference's command layer) answer from the table map / schema
    without scanning rows."""
    import fnmatch as _fn

    import pandas as pd

    s = sql.strip().rstrip(";")
    cmd = _command_query(s, tables)
    if cmd is not None:
        return cmd
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
    if _find_top_level_pivot(s) >= 0:
        return _pivot_query(s, tables, enrich_policies)
    from elasticsearch_ray.search.esql import esql

    return esql(sql_translate(sql), tables, enrich_policies)
