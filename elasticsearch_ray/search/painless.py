"""Painless scripting — a sandboxed subset of the reference's primary
script language (``modules/lang-painless`` — ``PainlessScriptEngine.java``,
grammar ``PainlessParser.g4``; the public Painless language spec).

From-scratch lexer + recursive-descent parser + tree-walking interpreter.
No ``eval``/``exec``/Python-AST execution anywhere: the grammar below is
everything that can run, and receivers dispatch ONLY through the
per-type method whitelist (the analog of Painless's allowlist in
``spi/org.elasticsearch.painless.spi``).

Supported subset (documented deltas from the full language at bottom):

- statements: typed/``def`` declarations, expression statements,
  ``if``/``else``, ``while``, ``do``/``while``, classic ``for``,
  for-each (``for (def x : items)``), ``break``/``continue``,
  ``return``, blocks;
- expressions: ternary ``?:``, elvis ``?:``, ``||``/``&&``, equality,
  relational, additive/multiplicative with **Java numeric semantics**
  (int/int truncating division, Java ``%`` sign-of-dividend), unary
  ``!``/``-``/``+``, prefix/postfix ``++``/``--``, casts
  (``(int) x`` …), ``new`` (ArrayList/HashMap/HashSet/StringBuilder),
  list ``[a, b]`` / map ``['k': v]`` / empty-map ``[:]`` literals,
  null-safe ``?.``, string concatenation via ``+`` with Java
  ``toString`` rendering (``true``/``null``);
- script contexts: *score* (``doc['f'].value``, ``_score``,
  ``params``), *field / runtime field* (``emit(v)`` or ``return``),
  *ingest / update* (mutable ``ctx`` map);
- statics: ``Math`` (log is ln, ``round`` half-up to long),
  ``Integer``/``Long``/``Double``/``Float``/``Boolean`` parse +
  constants, ``String.valueOf``/``String.join``;
- instance methods: the String/List/Map/Set/StringBuilder whitelists
  below.

NOT in the subset (raise ``PainlessError`` at parse time): lambdas /
method references / ``instanceof`` / regex literals (``=~``, ``==~`` —
use ``String.matches``), bitwise + shift operators, try/catch, and
user-defined functions. ``Math.random`` raises at RUNTIME: scripts must
be deterministic so distributed retries/replays can't diverge.

Vectorized fast path: ``run_vectorized`` evaluates straight-line
numeric scripts (declarations + single return over doc values /
``_score`` / params and Math calls) directly on numpy arrays — the
script_score hot path stays columnar; anything else falls back to the
per-row interpreter (matching the reference's per-document execution
model).
"""

from __future__ import annotations

import math
import re

import numpy as np

__all__ = [
    "PainlessError",
    "PainlessScript",
    "compile_painless",
    "painless_script_field",
    "painless_processor_fn",
]


class PainlessError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_KEYWORDS = {
    "if", "else", "while", "do", "for", "return", "break", "continue",
    "new", "true", "false", "null", "in", "def",
}
# type names accepted in declarations, casts and `new`
_TYPES = {
    "def", "int", "long", "short", "byte", "float", "double", "boolean",
    "char", "String", "List", "ArrayList", "Map", "HashMap", "Set",
    "HashSet", "Object", "Number", "CharSequence", "StringBuilder",
}
_REJECTED = {
    "try": "try/catch", "catch": "try/catch", "throw": "throw",
    "instanceof": "instanceof",
}

_TOK = re.compile(r"""
    \s*(?:
      (?P<comment>//[^\n]*|/\*.*?\*/)
    | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?[fFdD]?|\.\d+(?:[eE][+-]?\d+)?[fFdD]?
             |\d+(?:[eE][+-]?\d+)?[fFdDlL]?)
    | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
    | (?P<name>[A-Za-z_]\w*)
    | (?P<op>\+\+|--|\+=|-=|\*=|/=|%=|==~|=~|==|!=|<=|>=|&&|\|\||\?\.|\?:
            |->|[-+*/%<>!?:;,.(){}\[\]=])
    )""", re.VERBOSE | re.DOTALL)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'",
            '"': '"', "0": "\0", "b": "\b", "f": "\f"}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(src):
        m = _TOK.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise PainlessError(f"bad token at: {src[pos:pos + 30]!r}")
            break
        pos = m.end()
        if m.group("comment") is not None:
            continue
        if m.group("num") is not None:
            t = m.group("num")
            if t[-1] in "lL":
                toks.append(("num", int(t[:-1])))
            elif t[-1] in "fFdD":
                toks.append(("num", float(t[:-1])))
            elif "." in t or "e" in t or "E" in t:
                toks.append(("num", float(t)))
            else:
                toks.append(("num", int(t)))
        elif m.group("str") is not None:
            toks.append(("str", _unescape(m.group("str")[1:-1])))
        elif m.group("name") is not None:
            name = m.group("name")
            if name in _REJECTED:
                raise PainlessError(
                    f"{_REJECTED[name]} is outside the Painless subset")
            toks.append(("kw" if name in _KEYWORDS else "name", name))
        else:
            op = m.group("op")
            if op in ("->", "=~", "==~"):
                what = {"->": "lambdas", "=~": "regex operators",
                        "==~": "regex operators"}[op]
                raise PainlessError(
                    f"{what} are outside the Painless subset")
            toks.append(("op", op))
    toks.append(("eof", ""))
    return toks


# --------------------------------------------------------------- parser
#
# AST: plain tuples, first element the node kind. Statements:
#   ('block', [s]) ('decl', type, [(name, init|None)]) ('expr', e)
#   ('if', c, s, s|None) ('while', c, s) ('do', s, c)
#   ('for', init|None, cond|None, update|None, s)
#   ('foreach', name, iter, s) ('return', e|None) ('break',) ('continue',)
# Expressions:
#   ('lit', v) ('var', n) ('list', [e]) ('map', [(k, v)])
#   ('ternary', c, a, b) ('elvis', a, b) ('bin', op, a, b) ('un', op, e)
#   ('assign', tgt, op, e) ('incdec', op, tgt, pre) ('cast', type, e)
#   ('index', recv, e) ('attr', recv, name, safe)
#   ('call', recv, name, [e], safe) ('fcall', name, [e]) ('new', type, [e])


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise PainlessError(f"expected {val or kind}, got {t[1]!r}")
        return t

    def at_op(self, *ops):
        t = self.peek()
        return t[0] == "op" and t[1] in ops

    def eat_op(self, *ops):
        if self.at_op(*ops):
            return self.next()[1]
        return None

    # ---- statements

    def parse_program(self):
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
        return ("block", stmts)

    def block(self):
        self.expect("op", "{")
        stmts = []
        while not self.at_op("}"):
            if self.peek()[0] == "eof":
                raise PainlessError("unterminated block")
            stmts.append(self.statement())
        self.next()
        return ("block", stmts)

    def _is_decl_start(self):
        t, v = self.peek()
        if t == "kw" and v == "def":
            return True
        if t == "name" and v in _TYPES:
            nxt = self.peek(1)
            return nxt[0] == "name"
        return False

    def statement(self):
        t, v = self.peek()
        if t == "op" and v == "{":
            return self.block()
        if t == "op" and v == ";":
            self.next()
            return ("block", [])
        if t == "kw":
            if v == "if":
                return self.if_stmt()
            if v == "while":
                self.next()
                self.expect("op", "(")
                cond = self.expression()
                self.expect("op", ")")
                return ("while", cond, self.statement())
            if v == "do":
                self.next()
                body = self.statement()
                self.expect("kw", "while")
                self.expect("op", "(")
                cond = self.expression()
                self.expect("op", ")")
                self.eat_op(";")
                return ("do", body, cond)
            if v == "for":
                return self.for_stmt()
            if v == "return":
                self.next()
                if self.at_op(";"):
                    self.next()
                    return ("return", None)
                e = self.expression()
                self.eat_op(";")
                return ("return", e)
            if v == "break":
                self.next()
                self.eat_op(";")
                return ("break",)
            if v == "continue":
                self.next()
                self.eat_op(";")
                return ("continue",)
        if self._is_decl_start():
            return self.declaration()
        e = self.expression()
        self.eat_op(";")
        return ("expr", e)

    def declaration(self):
        tname = self.next()[1]
        decls = []
        while True:
            name = self.expect("name")[1]
            init = None
            if self.eat_op("="):
                init = self.expression()
            decls.append((name, init))
            if not self.eat_op(","):
                break
        self.eat_op(";")
        return ("decl", tname, decls)

    def if_stmt(self):
        self.expect("kw", "if")
        self.expect("op", "(")
        cond = self.expression()
        self.expect("op", ")")
        then = self.statement()
        els = None
        if self.peek() == ("kw", "else"):
            self.next()
            els = self.statement()
        return ("if", cond, then, els)

    def for_stmt(self):
        self.expect("kw", "for")
        self.expect("op", "(")
        # for-each: `for (def x : expr)` / `for (String s : expr)`
        t0, v0 = self.peek()
        if ((t0 == "kw" and v0 == "def")
                or (t0 == "name" and v0 in _TYPES)) \
                and self.peek(1)[0] == "name" \
                and self.peek(2) == ("op", ":"):
            self.next()
            name = self.next()[1]
            self.next()  # ':'
            it = self.expression()
            self.expect("op", ")")
            return ("foreach", name, it, self.statement())
        init = None
        if not self.at_op(";"):
            init = (self.declaration() if self._is_decl_start()
                    else ("expr", self.expression()))
            if init[0] == "expr":
                self.expect("op", ";")
        else:
            self.next()
        if init is not None and init[0] == "decl":
            pass  # declaration already ate its ';'
        cond = None
        if not self.at_op(";"):
            cond = self.expression()
        self.expect("op", ";")
        update = None
        if not self.at_op(")"):
            update = self.expression()
        self.expect("op", ")")
        return ("for", init, cond, update, self.statement())

    # ---- expressions (Java precedence)

    def expression(self):
        return self.assignment()

    def assignment(self):
        left = self.ternary()
        if self.at_op("=", "+=", "-=", "*=", "/=", "%="):
            op = self.next()[1]
            if left[0] not in ("var", "index", "attr"):
                raise PainlessError("invalid assignment target")
            return ("assign", left, op, self.assignment())
        return left

    def ternary(self):
        cond = self.logical_or()
        if self.at_op("?:"):
            self.next()
            return ("elvis", cond, self.ternary())
        if self.at_op("?"):
            self.next()
            a = self.ternary()
            self.expect("op", ":")
            return ("ternary", cond, a, self.ternary())
        return cond

    def logical_or(self):
        e = self.logical_and()
        while self.at_op("||"):
            self.next()
            e = ("bin", "||", e, self.logical_and())
        return e

    def logical_and(self):
        e = self.equality()
        while self.at_op("&&"):
            self.next()
            e = ("bin", "&&", e, self.equality())
        return e

    def equality(self):
        e = self.relational()
        while self.at_op("==", "!="):
            op = self.next()[1]
            e = ("bin", op, e, self.relational())
        return e

    def relational(self):
        e = self.additive()
        while self.at_op("<", "<=", ">", ">="):
            op = self.next()[1]
            e = ("bin", op, e, self.additive())
        return e

    def additive(self):
        e = self.multiplicative()
        while self.at_op("+", "-"):
            op = self.next()[1]
            e = ("bin", op, e, self.multiplicative())
        return e

    def multiplicative(self):
        e = self.unary()
        while self.at_op("*", "/", "%"):
            op = self.next()[1]
            e = ("bin", op, e, self.unary())
        return e

    def unary(self):
        if self.at_op("!", "-", "+"):
            op = self.next()[1]
            return ("un", op, self.unary())
        if self.at_op("++", "--"):
            op = self.next()[1]
            tgt = self.unary()
            if tgt[0] not in ("var", "index", "attr"):
                raise PainlessError("++/-- needs a variable")
            return ("incdec", op, tgt, True)
        # cast: '(' TYPE ')' unary — only when TYPE is a known type name
        if (self.at_op("(") and self.peek(1)[0] in ("name", "kw")
                and self.peek(1)[1] in _TYPES
                and self.peek(2) == ("op", ")")):
            self.next()
            tname = self.next()[1]
            self.next()
            return ("cast", tname, self.unary())
        return self.postfix()

    def postfix(self):
        e = self.atom()
        while True:
            if self.at_op("."):
                self.next()
                name = self.next()[1]
                if self.eat_op("("):
                    e = ("call", e, name, self.args(), False)
                else:
                    e = ("attr", e, name, False)
            elif self.at_op("?."):
                self.next()
                name = self.next()[1]
                if self.eat_op("("):
                    e = ("call", e, name, self.args(), True)
                else:
                    e = ("attr", e, name, True)
            elif self.at_op("["):
                self.next()
                idx = self.expression()
                self.expect("op", "]")
                e = ("index", e, idx)
            elif self.at_op("++", "--"):
                op = self.next()[1]
                if e[0] not in ("var", "index", "attr"):
                    raise PainlessError("++/-- needs a variable")
                e = ("incdec", op, e, False)
            else:
                return e

    def args(self):
        out = []
        if self.at_op(")"):
            self.next()
            return out
        while True:
            out.append(self.expression())
            if self.eat_op(","):
                continue
            self.expect("op", ")")
            return out

    def atom(self):
        t, v = self.next()
        if t == "num":
            return ("lit", v)
        if t == "str":
            return ("lit", v)
        if t == "kw":
            if v == "true":
                return ("lit", True)
            if v == "false":
                return ("lit", False)
            if v == "null":
                return ("lit", None)
            if v == "new":
                tname = self.next()[1]
                if tname not in _TYPES:
                    raise PainlessError(f"cannot construct {tname!r}")
                self.expect("op", "(")
                return ("new", tname, self.args())
            raise PainlessError(f"unexpected keyword {v!r}")
        if t == "name":
            if self.at_op("("):
                self.next()
                return ("fcall", v, self.args())
            return ("var", v)
        if t == "op" and v == "(":
            e = self.expression()
            self.expect("op", ")")
            return e
        if t == "op" and v == "[":
            # list literal [a, b] / map literal ['k': v, ...] / [:]
            if self.at_op(":") and self.peek(1) == ("op", "]"):
                self.next()
                self.next()
                return ("map", [])
            if self.at_op("]"):
                self.next()
                return ("list", [])
            first = self.expression()
            if self.eat_op(":"):
                pairs = [(first, self.expression())]
                while self.eat_op(","):
                    k = self.expression()
                    self.expect("op", ":")
                    pairs.append((k, self.expression()))
                self.expect("op", "]")
                return ("map", pairs)
            elems = [first]
            while self.eat_op(","):
                elems.append(self.expression())
            self.expect("op", "]")
            return ("list", elems)
        raise PainlessError(f"unexpected token {v!r}")


# ---------------------------------------------------- runtime / sandbox


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


def _jdiv(a, b):
    """Java division: int/int truncates toward zero; anything float is
    IEEE. Division by integer zero is an error (Java ArithmeticException)."""
    if isinstance(a, bool) or isinstance(b, bool):
        raise PainlessError("arithmetic on booleans")
    if isinstance(a, int) and isinstance(b, int):
        if b == 0:
            raise PainlessError("integer division by zero")
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q
    if b == 0:  # IEEE like Java: ±Infinity / NaN, not an exception
        if a == 0:
            return math.nan
        return math.inf if a > 0 else -math.inf
    return a / b


def _jmod(a, b):
    if isinstance(a, int) and isinstance(b, int):
        if b == 0:
            raise PainlessError("integer modulo by zero")
        return a - _jdiv(a, b) * b
    return math.fmod(a, b)


def _jstr(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e16:
        return f"{v:.1f}"
    if isinstance(v, list):
        return "[" + ", ".join(_jstr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{_jstr(k)}={_jstr(x)}"
                               for k, x in v.items()) + "}"
    return str(v)


def _jround(x):
    """Java Math.round: floor(x + 0.5) as long (half-up, unlike Python's
    banker's rounding)."""
    return int(math.floor(float(x) + 0.5))


class _Static:
    """A whitelisted static class: attrs are constants, methods callables."""

    def __init__(self, name, consts, methods):
        self.name = name
        self.consts = consts
        self.methods = methods


def _no_random():
    raise PainlessError(
        "Math.random is disabled: scripts must be deterministic so "
        "distributed retries cannot diverge")


_STATICS = {
    "Math": _Static("Math", {"PI": math.pi, "E": math.e}, {
        "abs": abs, "max": max, "min": min,
        "log": math.log, "log10": math.log10, "exp": math.exp,
        "pow": math.pow, "sqrt": math.sqrt, "cbrt": lambda x: x ** (1 / 3),
        "floor": math.floor, "ceil": math.ceil, "round": _jround,
        "sin": math.sin, "cos": math.cos, "tan": math.tan,
        "asin": math.asin, "acos": math.acos, "atan": math.atan,
        "atan2": math.atan2, "sinh": math.sinh, "cosh": math.cosh,
        "tanh": math.tanh, "toDegrees": math.degrees,
        "toRadians": math.radians, "signum": lambda x: float(np.sign(x)),
        "random": _no_random,
    }),
    "Integer": _Static("Integer", {"MAX_VALUE": 2**31 - 1,
                                   "MIN_VALUE": -2**31}, {
        "parseInt": lambda s, base=10: int(s, base),
        "toString": _jstr, "valueOf": int,
    }),
    "Long": _Static("Long", {"MAX_VALUE": 2**63 - 1,
                             "MIN_VALUE": -2**63}, {
        "parseLong": lambda s, base=10: int(s, base),
        "toString": _jstr, "valueOf": int,
    }),
    "Double": _Static("Double", {
        "MAX_VALUE": 1.7976931348623157e308,
        "MIN_VALUE": 4.9e-324,
        "POSITIVE_INFINITY": math.inf, "NEGATIVE_INFINITY": -math.inf,
        "NaN": math.nan,
    }, {
        "parseDouble": float, "isNaN": lambda x: isinstance(x, float)
        and math.isnan(x), "valueOf": float, "toString": _jstr,
    }),
    "Float": _Static("Float", {}, {"parseFloat": float}),
    "Boolean": _Static("Boolean", {"TRUE": True, "FALSE": False}, {
        "parseBoolean": lambda s: s.strip().lower() == "true",
    }),
    "String": _Static("String", {}, {
        "valueOf": _jstr,
        "join": lambda sep, it: sep.join(_jstr(x) for x in it),
    }),
}

# instance-method whitelist keyed by python type
_STR_METHODS = {
    "length": lambda s: len(s),
    "substring": lambda s, a, b=None: s[a:] if b is None else s[a:b],
    "contains": lambda s, t: t in s,
    "startsWith": lambda s, t: s.startswith(t),
    "endsWith": lambda s, t: s.endswith(t),
    "indexOf": lambda s, t, f=0: s.find(t, f),
    "lastIndexOf": lambda s, t: s.rfind(t),
    "toLowerCase": lambda s: s.lower(),
    "toUpperCase": lambda s: s.upper(),
    "trim": lambda s: s.strip(),
    "strip": lambda s: s.strip(),
    "replace": lambda s, a, b: s.replace(a, b),
    "replaceAll": lambda s, p, r: re.sub(p, r, s),
    "replaceFirst": lambda s, p, r: re.sub(p, r, s, count=1),
    "split": lambda s, p: re.split(p, s),
    "splitOnToken": lambda s, t: s.split(t),
    "charAt": lambda s, i: s[i],
    "isEmpty": lambda s: len(s) == 0,
    "equals": lambda s, o: s == o,
    "equalsIgnoreCase": lambda s, o: isinstance(o, str)
    and s.lower() == o.lower(),
    "compareTo": lambda s, o: (s > o) - (s < o),
    "concat": lambda s, o: s + o,
    "matches": lambda s, p: re.fullmatch(p, s) is not None,
    "toString": lambda s: s,
    "hashCode": None,  # filled below (Java String.hashCode)
    "repeat": lambda s, n: s * n,
}


def _j_hash(s: str) -> int:
    """Java String.hashCode — s[0]*31^(n-1) + …, wrapped to int32."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


_STR_METHODS["hashCode"] = _j_hash

_LIST_METHODS = {
    "add": lambda l, *a: (l.insert(a[0], a[1]) if len(a) == 2
                          else l.append(a[0])) or True,
    "get": lambda l, i: l[i],
    "set": lambda l, i, v: l.__setitem__(i, v),
    "size": lambda l: len(l),
    "isEmpty": lambda l: len(l) == 0,
    "contains": lambda l, v: v in l,
    "indexOf": lambda l, v: l.index(v) if v in l else -1,
    "remove": lambda l, i: l.pop(i) if isinstance(i, int) else None,
    "clear": lambda l: l.clear(),
    "addAll": lambda l, o: l.extend(o) or True,
    "sort": lambda l, *a: l.sort(),
    "toString": _jstr,
    "hashCode": None,
}
_MAP_METHODS = {
    "get": lambda m, k: m.get(k),
    "put": lambda m, k, v: m.update({k: v}),
    "containsKey": lambda m, k: k in m,
    "containsValue": lambda m, v: v in m.values(),
    "keySet": lambda m: list(m.keys()),
    "values": lambda m: list(m.values()),
    "entrySet": lambda m: [{"key": k, "value": v} for k, v in m.items()],
    "size": lambda m: len(m),
    "isEmpty": lambda m: len(m) == 0,
    "remove": lambda m, k: m.pop(k, None),
    "getOrDefault": lambda m, k, d: m.get(k, d),
    "putIfAbsent": lambda m, k, v: m.setdefault(k, v),
    "clear": lambda m: m.clear(),
    "toString": _jstr,
}
_SET_METHODS = {
    "add": lambda s, v: (s.add(v), True)[1],
    "contains": lambda s, v: v in s,
    "size": lambda s: len(s),
    "isEmpty": lambda s: len(s) == 0,
    "remove": lambda s, v: s.discard(v),
    "addAll": lambda s, o: s.update(o),
}
_NUM_METHODS = {
    "intValue": lambda v: int(v),
    "longValue": lambda v: int(v),
    "doubleValue": lambda v: float(v),
    "floatValue": lambda v: float(v),
    "toString": _jstr,
    "compareTo": lambda v, o: (v > o) - (v < o),
    "equals": lambda v, o: v == o,
}


class _StringBuilder:
    def __init__(self, init=""):
        self.parts = [init] if init else []

    def append(self, v):
        self.parts.append(_jstr(v))
        return self

    def toString(self):
        return "".join(self.parts)

    def length(self):
        return sum(len(p) for p in self.parts)


_SB_METHODS = {
    "append": lambda sb, v: sb.append(v),
    "toString": lambda sb: sb.toString(),
    "length": lambda sb: sb.length(),
}


class _FieldValues:
    """``doc['field']`` receiver — ScriptDocValues: .value, .values,
    .size(), .empty, .length."""

    def __init__(self, values: list):
        self._v = values

    @property
    def value(self):
        if not self._v:
            raise PainlessError(
                "A document doesn't have a value for this field "
                "(use .size() != 0 to guard, like the reference)")
        return self._v[0]

    @property
    def values(self):
        return list(self._v)

    @property
    def empty(self):
        return not self._v

    @property
    def length(self):
        return len(self._v)

    def size(self):
        return len(self._v)

    def get(self, i):
        return self._v[i]

    def contains(self, v):
        return v in self._v


_FV_METHODS = {
    "size": lambda fv: fv.size(),
    "get": lambda fv, i: fv.get(i),
    "contains": lambda fv, v: fv.contains(v),
    "isEmpty": lambda fv: fv.empty,
}
_FV_ATTRS = {"value", "values", "empty", "length"}


class _Doc:
    """``doc`` receiver over a {col: scalar-or-list} row mapping."""

    def __init__(self, row: dict):
        self._row = row

    def __getitem__(self, key):
        if key not in self._row:
            raise PainlessError(f"No field found for [{key}] in mapping")
        v = self._row[key]
        if isinstance(v, list):
            return _FieldValues(v)
        return _FieldValues([] if v is None
                            or (isinstance(v, float) and math.isnan(v))
                            else [v])

    def containsKey(self, key):
        return key in self._row


_DOC_METHODS = {"containsKey": lambda d, k: d.containsKey(k)}


def _dispatch(recv, name, argv, node_src=""):
    """Sandboxed method dispatch — the Painless allowlist analog."""
    table = None
    if isinstance(recv, str):
        table = _STR_METHODS
    elif isinstance(recv, list):
        table = _LIST_METHODS
    elif isinstance(recv, dict):
        table = _MAP_METHODS
    elif isinstance(recv, set):
        table = _SET_METHODS
    elif isinstance(recv, bool):
        table = {"toString": _jstr, "equals": lambda v, o: v == o}
    elif isinstance(recv, (int, float)):
        table = _NUM_METHODS
    elif isinstance(recv, _StringBuilder):
        table = _SB_METHODS
    elif isinstance(recv, _FieldValues):
        table = _FV_METHODS
    elif isinstance(recv, _Doc):
        table = _DOC_METHODS
    elif isinstance(recv, _Static):
        fn = recv.methods.get(name)
        if fn is None:
            raise PainlessError(f"unknown static {recv.name}.{name}")
        return fn(*argv)
    if table is None or name not in table:
        raise PainlessError(
            f"method {name!r} is not in the allowlist for "
            f"{type(recv).__name__}")
    return table[name](recv, *argv)


_CASTS = {
    "int": lambda v: int(v), "long": lambda v: int(v),
    "short": lambda v: int(v), "byte": lambda v: int(v),
    "float": lambda v: float(v), "double": lambda v: float(v),
    "boolean": lambda v: bool(v), "String": _jstr, "char": lambda v: v,
}


class _Interp:
    def __init__(self, env: dict):
        self.scopes = [env, {}]

    def lookup(self, name):
        for s in reversed(self.scopes):
            if name in s:
                return s[name]
        if name in _STATICS:
            return _STATICS[name]
        raise PainlessError(f"unknown variable [{name}]")

    def set_var(self, name, value):
        for s in reversed(self.scopes):
            if name in s:
                s[name] = value
                return
        self.scopes[-1][name] = value

    # ---- statements

    def exec(self, node):
        kind = node[0]
        if kind == "block":
            self.scopes.append({})
            try:
                for s in node[1]:
                    self.exec(s)
            finally:
                self.scopes.pop()
        elif kind == "decl":
            for name, init in node[2]:
                self.scopes[-1][name] = (self.eval(init)
                                         if init is not None else
                                         _default_for(node[1]))
        elif kind == "expr":
            self.eval(node[1])
        elif kind == "if":
            if _truth(self.eval(node[1])):
                self.exec(node[2])
            elif node[3] is not None:
                self.exec(node[3])
        elif kind == "while":
            n = 0
            while _truth(self.eval(node[1])):
                try:
                    self.exec(node[2])
                except _Break:
                    break
                except _Continue:
                    pass
                n += 1
                if n > 1_000_000:
                    raise PainlessError("loop limit exceeded (1M)")
        elif kind == "do":
            n = 0
            while True:
                try:
                    self.exec(node[1])
                except _Break:
                    break
                except _Continue:
                    pass
                if not _truth(self.eval(node[2])):
                    break
                n += 1
                if n > 1_000_000:
                    raise PainlessError("loop limit exceeded (1M)")
        elif kind == "for":
            self.scopes.append({})
            try:
                init, cond, update, body = node[1], node[2], node[3], node[4]
                if init is not None:
                    self.exec(init)
                n = 0
                while cond is None or _truth(self.eval(cond)):
                    try:
                        self.exec(body)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if update is not None:
                        self.eval(update)
                    n += 1
                    if n > 1_000_000:
                        raise PainlessError("loop limit exceeded (1M)")
            finally:
                self.scopes.pop()
        elif kind == "foreach":
            it = self.eval(node[2])
            if isinstance(it, _FieldValues):
                it = it.values
            if isinstance(it, dict):
                it = list(it.keys())
            if not isinstance(it, (list, str, set)):
                raise PainlessError("for-each needs a List/Map/String")
            self.scopes.append({})
            try:
                for v in list(it):
                    self.scopes[-1][node[1]] = v
                    try:
                        self.exec(node[3])
                    except _Break:
                        break
                    except _Continue:
                        pass
            finally:
                self.scopes.pop()
        elif kind == "return":
            raise _Return(self.eval(node[1]) if node[1] is not None
                          else None)
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        else:
            raise PainlessError(f"unknown statement {kind!r}")

    # ---- expressions

    def eval(self, node):
        kind = node[0]
        if kind == "lit":
            return node[1]
        if kind == "var":
            return self.lookup(node[1])
        if kind == "list":
            return [self.eval(e) for e in node[1]]
        if kind == "map":
            return {self.eval(k): self.eval(v) for k, v in node[1]}
        if kind == "ternary":
            return (self.eval(node[2]) if _truth(self.eval(node[1]))
                    else self.eval(node[3]))
        if kind == "elvis":
            v = self.eval(node[1])
            return v if v is not None else self.eval(node[2])
        if kind == "bin":
            return self.binop(node[1], node[2], node[3])
        if kind == "un":
            v = self.eval(node[2])
            if node[1] == "!":
                return not _truth(v)
            if node[1] == "-":
                return -v
            return +v
        if kind == "assign":
            return self.assign(node[1], node[2], node[3])
        if kind == "incdec":
            old = self.eval(node[2])
            new = old + (1 if node[1] == "++" else -1)
            self.store(node[2], new)
            return new if node[3] else old
        if kind == "cast":
            fn = _CASTS.get(node[1], lambda v: v)
            v = self.eval(node[2])
            return None if v is None and node[1] not in _CASTS else fn(v)
        if kind == "index":
            recv = self.eval(node[1])
            idx = self.eval(node[2])
            if isinstance(recv, (_Doc,)):
                return recv[idx]
            if isinstance(recv, dict):
                return recv.get(idx)
            if isinstance(recv, (list, str)):
                return recv[idx]
            raise PainlessError(
                f"cannot index {type(recv).__name__}")
        if kind == "attr":
            recv = self.eval(node[1])
            if recv is None:
                if node[3]:
                    return None
                raise PainlessError(
                    f"null pointer: .{node[2]} on null")
            return self.attr(recv, node[2])
        if kind == "call":
            recv = self.eval(node[1])
            if recv is None:
                if node[4]:
                    return None
                raise PainlessError(
                    f"null pointer: .{node[2]}() on null")
            argv = [self.eval(a) for a in node[3]]
            return _dispatch(recv, node[2], argv)
        if kind == "fcall":
            fn = self.lookup(node[1])
            if not callable(fn):
                raise PainlessError(f"{node[1]!r} is not callable")
            return fn(*[self.eval(a) for a in node[2]])
        if kind == "new":
            argv = [self.eval(a) for a in node[2]]
            t = node[1]
            if t in ("ArrayList", "List"):
                return list(argv[0]) if argv else []
            if t in ("HashMap", "Map"):
                return dict(argv[0]) if argv else {}
            if t in ("HashSet", "Set"):
                return set(argv[0]) if argv else set()
            if t == "StringBuilder":
                return _StringBuilder(argv[0] if argv else "")
            raise PainlessError(f"cannot construct {t!r}")
        raise PainlessError(f"unknown expression {kind!r}")

    def attr(self, recv, name):
        if isinstance(recv, _Static):
            if name in recv.consts:
                return recv.consts[name]
            raise PainlessError(f"unknown static {recv.name}.{name}")
        if isinstance(recv, _FieldValues) and name in _FV_ATTRS:
            return getattr(recv, name)
        if isinstance(recv, dict):
            # painless shorthand: ctx.field / params.field → map get
            return recv.get(name)
        if isinstance(recv, _Doc):
            raise PainlessError("use doc['field'], not doc.field")
        if isinstance(recv, str) and name == "length":
            # Java arrays use .length; strings require .length() — allow
            # the common shorthand painless also accepts on arrays only
            raise PainlessError("use s.length() for String length")
        raise PainlessError(
            f"attribute {name!r} is not in the allowlist for "
            f"{type(recv).__name__}")

    def assign(self, target, op, expr):
        val = self.eval(expr)
        if op != "=":
            old = self.eval(target)
            bop = op[0]
            val = self.binop_values(bop, old, val)
        self.store(target, val)
        return val

    def store(self, target, val):
        kind = target[0]
        if kind == "var":
            self.set_var(target[1], val)
        elif kind == "index":
            recv = self.eval(target[1])
            idx = self.eval(target[2])
            if isinstance(recv, (dict, list)):
                recv[idx] = val
            else:
                raise PainlessError(
                    f"cannot assign into {type(recv).__name__}")
        elif kind == "attr":
            recv = self.eval(target[1])
            if isinstance(recv, dict):
                recv[target[2]] = val  # ctx.field = v
            else:
                raise PainlessError(
                    f"cannot assign attribute on {type(recv).__name__}")
        else:
            raise PainlessError("invalid assignment target")

    def binop(self, op, ln, rn):
        if op == "&&":
            return _truth(self.eval(ln)) and _truth(self.eval(rn))
        if op == "||":
            return _truth(self.eval(ln)) or _truth(self.eval(rn))
        return self.binop_values(op, self.eval(ln), self.eval(rn))

    @staticmethod
    def binop_values(op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return _jstr(a) + _jstr(b) if not (
                    isinstance(a, str) and isinstance(b, str)) else a + b
            if isinstance(a, list) and isinstance(b, list):
                return a + b
            _numcheck(a, b, op)
            return a + b
        if op == "-":
            _numcheck(a, b, op)
            return a - b
        if op == "*":
            _numcheck(a, b, op)
            return a * b
        if op == "/":
            _numcheck(a, b, op)
            return _jdiv(a, b)
        if op == "%":
            _numcheck(a, b, op)
            return _jmod(a, b)
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op in ("<", "<=", ">", ">="):
            if a is None or b is None:
                raise PainlessError("null in comparison")
            return {"<": a < b, "<=": a <= b,
                    ">": a > b, ">=": a >= b}[op]
        raise PainlessError(f"unknown operator {op!r}")


def _numcheck(a, b, op):
    for v in (a, b):
        if v is None:
            raise PainlessError(f"null operand for {op!r}")
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise PainlessError(
                f"{op!r} needs numbers, got {type(v).__name__}")


def _truth(v):
    if isinstance(v, bool):
        return v
    if v is None:
        raise PainlessError("condition evaluated to null")
    raise PainlessError(
        "conditions must be boolean (Java semantics — no truthiness)")


def _default_for(tname):
    return {"int": 0, "long": 0, "short": 0, "byte": 0,
            "float": 0.0, "double": 0.0, "boolean": False}.get(tname)


# ---------------------------------------------------- compiled script


_VECTOR_FUNCS = {
    "abs": np.abs, "log": np.log, "log10": np.log10, "exp": np.exp,
    "sqrt": np.sqrt, "floor": np.floor, "ceil": np.ceil,
    "pow": np.power, "max": np.maximum, "min": np.minimum,
    "sin": np.sin, "cos": np.cos, "tan": np.tan, "atan2": np.arctan2,
    "tanh": np.tanh, "signum": np.sign, "cbrt": np.cbrt,
    "toDegrees": np.degrees, "toRadians": np.radians,
}


class _Unvectorizable(Exception):
    pass


class PainlessScript:
    """A compiled Painless program. ``run(env)`` executes per-row;
    ``run_vectorized(columns, n, score, params)`` evaluates straight-line
    numeric scripts on whole numpy arrays (falls back by raising
    ``_Unvectorizable`` internally — callers use :meth:`score_many`)."""

    def __init__(self, source: str):
        self.source = source
        self.ast = _Parser(_tokenize(source)).parse_program()

    # -- per-row interpreter

    def run(self, env: dict):
        interp = _Interp(dict(env))
        try:
            interp.exec(self.ast)
        except _Return as r:
            return r.value
        except (_Break, _Continue):
            raise PainlessError("break/continue outside a loop")
        return None

    # -- vectorized straight-line evaluation

    def _vec_expr(self, node, env):
        kind = node[0]
        if kind == "lit":
            if isinstance(node[1], (int, float)) \
                    and not isinstance(node[1], bool):
                return node[1]
            raise _Unvectorizable()
        if kind == "var":
            if node[1] in env:
                return env[node[1]]
            raise _Unvectorizable()
        if kind == "index":
            # params['x'] → scalar; doc['field'] only under .value
            if node[1] == ("var", "params") and node[2][0] == "lit":
                key = "params:" + str(node[2][1])
                if key in env:
                    return env[key]
            raise _Unvectorizable()
        if kind == "attr":
            # doc['f'].value
            inner = node[1]
            if (node[2] == "value" and inner[0] == "index"
                    and inner[1] == ("var", "doc")
                    and inner[2][0] == "lit"
                    and isinstance(inner[2][1], str)):
                key = "doc:" + inner[2][1]
                if key in env:
                    return env[key]
            # params.x → scalar
            if node[1] == ("var", "params"):
                key = "params:" + node[2]
                if key in env:
                    return env[key]
            raise _Unvectorizable()
        if kind == "bin":
            op = node[1]
            a = self._vec_expr(node[2], env)
            b = self._vec_expr(node[3], env)
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                if isinstance(a, int) and isinstance(b, int):
                    return _jdiv(a, b)  # Java int division parity
                with np.errstate(divide="ignore", invalid="ignore"):
                    return a / b
            if op == "%":
                if isinstance(a, int) and isinstance(b, int):
                    return _jmod(a, b)
                return np.fmod(a, b)
            if op == "==":
                return a == b
            if op == "!=":
                return a != b
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            if op == ">=":
                return a >= b
            if op == "&&":
                return np.logical_and(a, b)
            if op == "||":
                return np.logical_or(a, b)
            raise _Unvectorizable()
        if kind == "un":
            v = self._vec_expr(node[2], env)
            if node[1] == "-":
                return -v
            if node[1] == "!":
                return np.logical_not(v)
            return v
        if kind == "ternary":
            c = self._vec_expr(node[1], env)
            a = self._vec_expr(node[2], env)
            b = self._vec_expr(node[3], env)
            return np.where(c, a, b)
        if kind == "call":
            if node[1] == ("var", "Math") and node[2] in _VECTOR_FUNCS:
                argv = [self._vec_expr(a, env) for a in node[3]]
                return _VECTOR_FUNCS[node[2]](*argv)
            raise _Unvectorizable()
        if kind == "cast":
            v = self._vec_expr(node[2], env)
            if node[1] in ("int", "long"):
                return np.trunc(v)
            if node[1] in ("double", "float"):
                return np.asarray(v, np.float64)
            raise _Unvectorizable()
        raise _Unvectorizable()

    def run_vectorized(self, columns: dict, n: int,
                       score=None, params=None):
        """columns: {field: ndarray}; returns float64 ndarray of length
        n. Raises ``_Unvectorizable`` for anything beyond straight-line
        numeric decls + single return."""
        env = {}
        for k, v in columns.items():
            env["doc:" + k] = np.asarray(v, np.float64)
        if score is not None:
            env["_score"] = np.asarray(score, np.float64)
        for k, v in (params or {}).items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                env["params:" + k] = v
        stmts = self.ast[1]
        for st in stmts[:-1]:
            if st[0] != "decl":
                raise _Unvectorizable()
            for name, init in st[2]:
                if init is None:
                    raise _Unvectorizable()
                env[name] = self._vec_expr(init, env)
        if not stmts or stmts[-1][0] != "return" or stmts[-1][1] is None:
            raise _Unvectorizable()
        out = self._vec_expr(stmts[-1][1], env)
        return np.broadcast_to(np.asarray(out, np.float64), (n,)).copy()

    # -- batch helpers

    def score_many(self, columns: dict, scores, params: dict | None = None
                   ) -> np.ndarray:
        """script_score over candidate rows: vector fast path, per-row
        interpreter fallback. ``columns``: {field: array}; ``scores``:
        the base-query ``_score`` array."""
        n = len(scores)
        try:
            return self.run_vectorized(columns, n, score=scores,
                                       params=params)
        except (_Unvectorizable, TypeError, ValueError):
            # ValueError/TypeError: non-numeric column in the float64
            # cast — the per-row interpreter handles those types
            pass
        out = np.empty(n, np.float64)
        cols = {k: np.asarray(v) for k, v in columns.items()}
        p = dict(params or {})
        for i in range(n):
            row = {k: _pyval(v[i]) for k, v in cols.items()}
            v = self.run({"doc": _Doc(row), "params": p,
                          "_score": float(scores[i])})
            if v is None:
                raise PainlessError(
                    "script_score script must return a number")
            out[i] = float(v)
        return out

    def field_many(self, rows: list[dict], params: dict | None = None
                   ) -> list:
        """script_fields / runtime-field context: per row, the script may
        ``return`` a value or call ``emit(v)`` (one value used; a list of
        emits yields the list, matching multi-valued runtime fields)."""
        p = dict(params or {})
        out = []
        for row in rows:
            emitted: list = []
            v = self.run({"doc": _Doc(row), "params": p,
                          "emit": emitted.append})
            if emitted:
                out.append(emitted[0] if len(emitted) == 1 else emitted)
            else:
                out.append(v)
        return out

    def ingest_one(self, ctx: dict, params: dict | None = None) -> dict:
        """ingest/update context: mutate ``ctx`` in place; returns it."""
        self.run({"ctx": ctx, "params": dict(params or {})})
        return ctx


def _pyval(v):
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [x.item() if isinstance(x, np.generic) else x for x in v]
    return v


def painless_doc_fields(script: "PainlessScript | str") -> list[str]:
    """Literal ``doc['field']`` references in the script, in first-use
    order — the column set the engine must materialize. A doc access
    with a non-literal key is a compile error here (the engine cannot
    plan column reads for dynamic field names)."""
    if isinstance(script, str):
        script = compile_painless(script)
    out: list[str] = []

    def walk(node):
        if not isinstance(node, tuple):
            return
        if node[0] == "index" and node[1] == ("var", "doc"):
            if node[2][0] == "lit" and isinstance(node[2][1], str):
                if node[2][1] not in out:
                    out.append(node[2][1])
            else:
                raise PainlessError(
                    "doc[...] needs a literal field name")
        if (node[0] == "call" and node[1] == ("var", "doc")
                and node[2] == "containsKey" and node[3]
                and node[3][0][0] == "lit"):
            if node[3][0][1] not in out:
                out.append(node[3][0][1])
        for child in node[1:]:
            _walk_any(child)

    def _walk_any(x):
        # children may be AST tuples, lists of them, or (name, init) /
        # (key, value) pairs — recurse into every tuple/list shape
        if isinstance(x, tuple):
            if x and isinstance(x[0], str) and x[0].isidentifier():
                walk(x)
            else:
                for y in x:
                    _walk_any(y)
        elif isinstance(x, list):
            for y in x:
                _walk_any(y)

    walk(script.ast)
    return out


def compile_painless(source: str) -> PainlessScript:
    """Parse + sandbox-check a Painless source once (per actor / per
    query — the PainlessScriptEngine compile-cache analog)."""
    return PainlessScript(source)


def painless_script_field(source: str, params: dict | None = None):
    """Adapter with the engine's script_fields contract: fn(src_table) →
    list of per-hit values."""
    script = compile_painless(source)

    def fn(tbl):
        rows = tbl.to_pylist()
        return script.field_many(rows, params)

    return fn


def painless_processor_fn(source: str, params: dict | None = None):
    """Adapter with the ingest ScriptProcessor contract: fn(df) → df.
    Each row becomes a mutable ``ctx`` map; new keys become columns
    (missing values null), removed keys become nulls."""
    script = compile_painless(source)
    p = dict(params or {})

    def fn(df):
        import pandas as pd

        recs = df.to_dict("records")
        out = []
        for r in recs:
            ctx = {k: _pyval(v) for k, v in r.items()}
            script.ingest_one(ctx, p)
            out.append(ctx)
        return pd.DataFrame(out)

    return fn
