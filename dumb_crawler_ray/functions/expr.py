"""The URL expression DSL, compiled once and evaluated vectorized.

Reproduces the reference's config-driven expression language
(J/expression/ExpressionFunctions.java:25-71,
J/expression/URLExpressionEvaluator.java:17-62):

    functions  MATCHES(s, regex)   — Java ``String.matches`` = FULL match
               EXTRACT(s, regex)   — full match, returns named group ``value``
               ISRESOURCE(path)    — extension test over the fixed set
                                     (ExpressionFunctions.java:11-17)
               CONTAINSELEMENT(doc, css) — CSS selector non-empty (used by
                                     the content validator, SURVEY.md M7)
    operators  and / or / not (also && || !), == !=, parentheses
    variables  url protocol host path port query fragment contentType

Compilation happens once per config (driver side); evaluation is vectorized
per Arrow batch with ``pyarrow.compute`` regex kernels (RE2). Patterns RE2
cannot compile (lookaround, backrefs) transparently fall back to per-row
Python ``re``. Java named groups ``(?<g>…)`` are translated to ``(?P<g>…)``.

Null semantics match the reference: a null input or an unparseable URL makes
every boolean expression False (URLExpressionEvaluator.java:20-23 default).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

RESOURCE_EXTENSIONS = (
    "css", "js", "sass", "less", "ico", "jpeg", "jpg", "png", "webp",
    "pdf", "mpeg", "mpg", "mp3", "mp4", "avi", "ogg", "wav", "iso",
)
RESOURCE_REGEX = r".*\.(%s)$" % "|".join(RESOURCE_EXTENSIONS)

_JAVA_GROUP = re.compile(r"\(\?<([A-Za-z][A-Za-z0-9]*)>")


def java_regex_to_python(pattern: str) -> str:
    """Translate Java named groups ``(?<g>…)`` → Python/RE2 ``(?P<g>…)``."""
    return _JAVA_GROUP.sub(r"(?P<\1>", pattern)


def _anchor(pattern: str) -> str:
    """Java ``matches()`` is a full match; RE2/re ``search`` is not."""
    return r"^(?:%s)$" % pattern


class _CompiledRegex:
    """One regex usable both via pyarrow/RE2 kernels and python re."""

    def __init__(self, java_pattern: str):
        self.raw = java_pattern
        self.pattern = java_regex_to_python(java_pattern)
        self.anchored = _anchor(self.pattern)
        self.py = re.compile(self.anchored)
        try:  # probe RE2 compatibility once, at compile time
            pc.match_substring_regex(pa.array([], type=pa.string()),
                                     pattern=self.anchored)
            self.re2_ok = True
        except pa.ArrowException:
            self.re2_ok = False

    def full_match(self, arr: pa.Array) -> pa.BooleanArray:
        if self.re2_ok:
            return pc.match_substring_regex(arr, pattern=self.anchored)
        out = np.zeros(len(arr), dtype=bool)
        for i, v in enumerate(arr.to_pylist()):
            out[i] = v is not None and self.py.match(v) is not None
        return pa.array(out)

    def extract_group(self, arr: pa.Array, group: str) -> pa.Array:
        if self.re2_ok and ("(?P<" in self.anchored):
            try:
                struct = pc.extract_regex(arr, pattern=self.anchored)
                return pc.struct_field(struct, group)
            except pa.ArrowException:
                pass
        vals = []
        for v in arr.to_pylist():
            m = self.py.match(v) if v is not None else None
            vals.append(m.group(group) if m else None)
        return pa.array(vals, type=pa.string())


# ---------------------------------------------------------------- tokenizer

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)|
        (?P<op>==|!=|&&|\|\||!)|
        (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")|
        (?P<num>-?[0-9]+(?:\.[0-9]+)?)|
        (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"bad expression at {rest[:20]!r} in {text!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group(kind)))
    tokens.append(("eof", ""))
    return tokens


# ---------------------------------------------------------------- AST nodes

@dataclass
class _Var:
    name: str

    def eval(self, ctx):
        if self.name not in ctx:
            raise KeyError(f"unknown expression variable {self.name!r}")
        return ctx[self.name]


@dataclass
class _Lit:
    value: object

    def eval(self, ctx):
        return self.value


@dataclass
class _Not:
    child: object

    def eval(self, ctx):
        return pc.invert(_to_bool(self.child.eval(ctx)))


@dataclass
class _BoolOp:
    op: str
    left: object
    right: object

    def eval(self, ctx):
        l = _to_bool(self.left.eval(ctx))
        r = _to_bool(self.right.eval(ctx))
        return pc.and_kleene(l, r) if self.op == "and" else pc.or_kleene(l, r)


@dataclass
class _Cmp:
    op: str
    left: object
    right: object

    def eval(self, ctx):
        l, r = self.left.eval(ctx), self.right.eval(ctx)
        res = pc.equal(l, r) if self.op == "==" else pc.not_equal(l, r)
        return res


@dataclass
class _Matches:
    child: object
    rx: _CompiledRegex

    def eval(self, ctx):
        return self.rx.full_match(self.child.eval(ctx))


@dataclass
class _Extract:
    child: object
    rx: _CompiledRegex

    def eval(self, ctx):
        return self.rx.extract_group(self.child.eval(ctx), "value")


@dataclass
class _IsResource:
    child: object
    rx = None  # class-level shared compiled regex, built lazily

    def eval(self, ctx):
        if _IsResource.rx is None:
            _IsResource.rx = _CompiledRegex(RESOURCE_REGEX)
        return _IsResource.rx.full_match(self.child.eval(ctx))


@dataclass
class _ContainsElement:
    child: object
    selector: str

    def eval(self, ctx):
        from .links import css_select_exists

        docs = self.child.eval(ctx)
        out = [
            (css_select_exists(h, self.selector) if h is not None else None)
            for h in docs.to_pylist()
        ]
        return pa.array(out, type=pa.bool_())


def _to_bool(v):
    if isinstance(v, bool):
        return pa.scalar(v)
    if isinstance(v, (pa.Array, pa.ChunkedArray)) and pa.types.is_boolean(v.type):
        return v
    raise TypeError(f"expected boolean expression, got {v!r}")


# ------------------------------------------------------------------ parser

class _Parser:
    def __init__(self, text: str):
        self.tokens = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.tokens[self.i]

    def next(self):
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind, value=None):
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise ValueError(f"expected {value or kind}, got {v!r}")
        return v

    def parse(self):
        node = self.parse_or()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing tokens: {self.peek()[1]!r}")
        return node

    def parse_or(self):
        node = self.parse_and()
        while self._is_word("or") or self._is_op("||"):
            self.next()
            node = _BoolOp("or", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_not()
        while self._is_word("and") or self._is_op("&&"):
            self.next()
            node = _BoolOp("and", node, self.parse_not())
        return node

    def parse_not(self):
        if self._is_word("not") or self._is_op("!"):
            self.next()
            return _Not(self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self):
        node = self.parse_primary()
        k, v = self.peek()
        if k == "op" and v in ("==", "!="):
            self.next()
            node = _Cmp(v, node, self.parse_primary())
        return node

    def parse_primary(self):
        k, v = self.peek()
        if k == "lparen":
            self.next()
            node = self.parse_or()
            self.expect("rparen")
            return node
        if k == "str":
            self.next()
            return _Lit(_unquote(v))
        if k == "num":
            self.next()
            return _Lit(float(v) if "." in v else int(v))
        if k == "ident":
            self.next()
            low = v.lower()
            if self.peek()[0] == "lparen":
                return self.parse_call(low)
            if low == "true":
                return _Lit(True)
            if low == "false":
                return _Lit(False)
            return _Var(v)
        raise ValueError(f"unexpected token {v!r}")

    def parse_call(self, fname: str):
        self.expect("lparen")
        args = [self.parse_or()]
        while self.peek()[0] == "comma":
            self.next()
            args.append(self.parse_or())
        self.expect("rparen")
        if fname == "matches":
            return _Matches(args[0], _CompiledRegex(_lit_str(args[1])))
        if fname == "extract":
            return _Extract(args[0], _CompiledRegex(_lit_str(args[1])))
        if fname == "isresource":
            return _IsResource(args[0])
        if fname == "containselement":
            return _ContainsElement(args[0], _lit_str(args[1]))
        raise ValueError(f"unknown function {fname!r}")

    def _is_word(self, w):
        k, v = self.peek()
        return k == "ident" and v.lower() == w

    def _is_op(self, o):
        k, v = self.peek()
        return k == "op" and v == o


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _lit_str(node) -> str:
    if not isinstance(node, _Lit) or not isinstance(node.value, str):
        raise ValueError("regex/selector argument must be a string literal")
    return node.value


class CompiledExpression:
    """A compiled boolean expression evaluated over an Arrow column context.

    ``ctx`` maps variable name → pa.Array (as produced by
    ``urlparts.split_batch``); rows where ``valid`` is False are forced to
    False, matching the reference's null-URL behavior.
    """

    def __init__(self, text: str):
        self.text = text
        self.ast = _Parser(text).parse()

    def evaluate(self, ctx: dict[str, pa.Array]) -> np.ndarray:
        res = self.ast.eval(ctx)
        res = _to_bool(res)
        if isinstance(res, pa.Scalar):
            n = len(next(iter(ctx.values())))
            out = np.full(n, bool(res.as_py() or False))
        else:
            out = pc.fill_null(res, False).to_numpy(zero_copy_only=False)
        if "valid" in ctx:
            out = out & ctx["valid"].to_numpy(zero_copy_only=False)
        return out


def compile_expression(text: str) -> CompiledExpression:
    return CompiledExpression(text)
