"""Sandboxed scripting expressions — the reference's ``lang-expression``
module (`modules/lang-expression`, Lucene expressions: a compiled
JavaScript-like ARITHMETIC language over doc values; the safe subset
offered where full Painless is overkill or untrusted).

From-scratch recursive-descent parser + vectorized evaluator — no
``eval``, no Python AST execution: the grammar below is everything that
can run, and identifiers resolve ONLY against the provided column map.

Grammar (Lucene expressions JS subset):
  expr    := ternary
  ternary := or ('?' ternary ':' ternary)?
  or      := and ('||' and)*
  and     := cmp ('&&' cmp)*
  cmp     := add (('=='|'!='|'<'|'<='|'>'|'>=') add)?
  add     := mul (('+'|'-') mul)*
  mul     := unary (('*'|'/'|'%') unary)*
  unary   := ('-'|'!') unary | power    (so -x**2 == -(x**2), Python
                                         semantics; JS rejects the form)
  power   := atom ('**' unary)?         (right-associative)
  atom    := NUMBER | ident | func '(' args ')' | '(' expr ')'
  ident   := NAME | doc['NAME'].value | doc.NAME.value | _score

Everything is float64; comparisons/booleans produce 1.0/0.0 (the Lucene
expressions convention). Functions are the module's documented Math
bindings. Division by zero follows IEEE (inf/nan), like Lucene.

compile_expression(src) returns a callable over a {name: ndarray} map —
usable as a script_fields entry (engine.script_fields accepts the source
string directly), a function_score hook, or a Dataset stage
(add_expression_column)."""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<docref>doc\[\s*'(?P<q1>[^']+)'\s*\]\.value|doc\.(?P<q2>\w+)\.value)
    | (?P<name>[A-Za-z_]\w*)
    | (?P<op>\*\*|==|!=|<=|>=|&&|\|\||[-+*/%<>!?:(),])
    )""", re.VERBOSE)

FUNCTIONS = {
    "abs": np.abs, "ceil": np.ceil, "floor": np.floor, "exp": np.exp,
    "ln": np.log, "log10": np.log10, "sqrt": np.sqrt, "sin": np.sin,
    "cos": np.cos, "tan": np.tan, "asin": np.arcsin, "acos": np.arccos,
    "atan": np.arctan, "sinh": np.sinh, "cosh": np.cosh, "tanh": np.tanh,
    "min": np.minimum, "max": np.maximum, "pow": np.power,
    "atan2": np.arctan2, "signum": np.sign,
    # logn(base, v) — the expressions module's arbitrary-base log
    "logn": lambda base, v: np.log(v) / np.log(base),
}
_ARITY = {"min": 2, "max": 2, "pow": 2, "atan2": 2, "logn": 2}
CONSTANTS = {"PI": np.pi, "E": np.e, "NaN": np.nan, "Infinity": np.inf}


class ExpressionError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ExpressionError(f"bad token at: {src[pos:]!r}")
            break
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("docref") is not None:
            out.append(("name", m.group("q1") or m.group("q2")))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, op=None):
        kind, val = self.peek()
        if kind is None:
            raise ExpressionError("unexpected end of expression")
        if op is not None and (kind != "op" or val != op):
            raise ExpressionError(f"expected {op!r}, got {val!r}")
        self.i += 1
        return kind, val

    # each node compiles to fn(env) -> ndarray/scalar (float64)
    def parse(self):
        node = self.ternary()
        if self.peek()[0] is not None:
            raise ExpressionError(f"trailing input: {self.toks[self.i:]}")
        return node

    def ternary(self):
        cond = self.or_()
        if self.peek() == ("op", "?"):
            self.take("?")
            a = self.ternary()
            self.take(":")
            b = self.ternary()
            return lambda env: np.where(cond(env) != 0, a(env), b(env))
        return cond

    def or_(self):
        node = self.and_()
        while self.peek() == ("op", "||"):
            self.take("||")
            rhs = self.and_()
            node = (lambda l, r: lambda env:
                    (((l(env) != 0) | (r(env) != 0)) * 1.0))(node, rhs)
        return node

    def and_(self):
        node = self.cmp()
        while self.peek() == ("op", "&&"):
            self.take("&&")
            rhs = self.cmp()
            node = (lambda l, r: lambda env:
                    (((l(env) != 0) & (r(env) != 0)) * 1.0))(node, rhs)
        return node

    _CMP = {"==": np.equal, "!=": np.not_equal, "<": np.less,
            "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal}

    def cmp(self):
        node = self.add()
        kind, val = self.peek()
        if kind == "op" and val in self._CMP:
            self.take(val)
            rhs = self.add()
            fn = self._CMP[val]
            return (lambda l, r, f: lambda env:
                    f(l(env), r(env)) * 1.0)(node, rhs, fn)
        return node

    def add(self):
        node = self.mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.take()
            rhs = self.mul()
            f = np.add if op == "+" else np.subtract
            node = (lambda l, r, fn: lambda env: fn(l(env), r(env)))(node, rhs, f)
        return node

    def mul(self):
        node = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.take()
            rhs = self.unary()
            # fmod, not mod: JS/Lucene-expressions % is TRUNCATED remainder
            # (sign of the dividend), numpy's % is floored
            f = {"*": np.multiply, "/": np.divide, "%": np.fmod}[op]
            node = (lambda l, r, fn: lambda env: fn(l(env), r(env)))(node, rhs, f)
        return node

    def power(self):
        # '**' binds tighter than '*' and is RIGHT-associative:
        # 2**3**2 == 512, not 64 (ADVICE r4). Unary minus binds LOOSER
        # than '**' so -x**2 == -(x**2) (review r5 #4 — the old
        # unary-inside-power silently returned +x**2; JS rejects the
        # unparenthesized form outright, Python's reading is the least
        # surprising accept)
        node = self.atom()
        if self.peek()[0] == "op" and self.peek()[1] == "**":
            self.take()
            rhs = self.unary()
            node = (lambda l, r: lambda env: np.power(l(env), r(env)))(node, rhs)
        return node

    def unary(self):
        kind, val = self.peek()
        if kind == "op" and val == "-":
            self.take()
            inner = self.unary()
            return lambda env: -inner(env)
        if kind == "op" and val == "!":
            self.take()
            inner = self.unary()
            return lambda env: (inner(env) == 0) * 1.0
        return self.power()

    def atom(self):
        kind, val = self.peek()
        if kind == "num":
            self.take()
            x = float(val)
            return lambda env: x
        if kind == "op" and val == "(":
            self.take("(")
            node = self.ternary()
            self.take(")")
            return node
        if kind == "name":
            self.take()
            if self.peek() == ("op", "("):
                fn = FUNCTIONS.get(val)
                if fn is None:
                    raise ExpressionError(f"unknown function {val!r}; "
                                          f"allowed: {sorted(FUNCTIONS)}")
                self.take("(")
                args = [self.ternary()]
                while self.peek() == ("op", ","):
                    self.take(",")
                    args.append(self.ternary())
                self.take(")")
                want = _ARITY.get(val, 1)
                if len(args) != want:
                    raise ExpressionError(
                        f"{val}() takes {want} argument(s), got {len(args)}")
                return (lambda f, aa: lambda env:
                        f(*[a(env) for a in aa]))(fn, args)
            if val in CONSTANTS:
                c = CONSTANTS[val]
                return lambda env: c
            name = val
            def ref(env, name=name):
                if name not in env:
                    raise ExpressionError(
                        f"unknown variable {name!r}; available: {sorted(env)}")
                return env[name]
            return ref
        raise ExpressionError(f"unexpected token {val!r}")


def expression_variables(src: str) -> list[str]:
    """Variable identifiers an expression reads (doc columns + _score):
    name tokens that are neither function calls nor constants — what a
    scorer must fetch before evaluating."""
    toks = _tokenize(src)
    out = []
    for i, (kind, val) in enumerate(toks):
        if kind != "name" or val in CONSTANTS:
            continue
        if i + 1 < len(toks) and toks[i + 1] == ("op", "("):
            continue  # function call
        if val not in out:
            out.append(val)
    return out


def compile_expression(src: str):
    """Compile to ``fn(env: dict[str, np.ndarray], length=None) ->
    np.ndarray`` — columns arrive float64; booleans are 1.0/0.0. A scalar
    result (constant expression, or no numeric columns in the batch)
    broadcasts to ``length`` when given — callers that know the batch/hit
    count MUST pass it, or an all-string batch would yield a length-1
    column for an N-row table."""
    node = _Parser(_tokenize(src)).parse()

    def run(env: dict, length: int | None = None) -> np.ndarray:
        cast = {k: np.asarray(v, np.float64) for k, v in env.items()}
        with np.errstate(divide="ignore", invalid="ignore"):
            out = node(cast)
        if np.ndim(out) == 0:
            n = length if length is not None else max(
                (len(v) for v in cast.values() if np.ndim(v)), default=1)
            return np.full(n, float(out))
        return np.asarray(out, np.float64)

    run.source = src
    return run


def expression_script_field(src: str, columns: list[str] | None = None):
    """Adapter: expression source → a script_fields callable (receives the
    per-hit SOURCE pa.Table, returns the computed column)."""
    fn = compile_expression(src)

    def script(tbl):
        cols = columns or [c for c in tbl.column_names]
        env = {}
        for c in cols:
            try:
                env[c] = tbl[c].to_numpy(zero_copy_only=False).astype(np.float64)
            except (ValueError, TypeError):
                pass  # non-numeric columns are not expression-visible
        return fn(env, length=len(tbl))

    return script


def add_expression_column(ds, name: str, src: str):
    """Dataset stage: append a computed numeric column (runtime-field /
    ingest-script analog), vectorized per batch."""
    import pyarrow as pa

    fn = compile_expression(src)

    def stage(batch: pa.Table) -> pa.Table:
        env = {}
        for c in batch.column_names:
            try:
                env[c] = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            except (ValueError, TypeError):
                pass
        return batch.append_column(
            name, pa.array(fn(env, length=len(batch)), pa.float64()))

    return ds.map_batches(stage, batch_format="pyarrow")
