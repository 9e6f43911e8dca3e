"""Recursive-descent parser for the PromQL subset (SURVEY.md §7.1 step 7).

Grammar scope = what the reference's interpreter consumes from the promql
crate (src/query.rs): scalar literals; vector selectors
``name{label op "value", ...}[range] offset dur`` with ops = != =~ !~;
function calls ``fn by (l1, l2) (args)`` / ``fn(args) by (l1)`` — plus the
full binary-expression grammar the promql crate parses but the reference's
interpreter rejects (src/query.rs:550-552, 577-579): arithmetic,
comparisons with ``bool``, set ops, ``on``/``ignoring`` +
``group_left``/``group_right`` vector matching, and unary minus.
Precedence and associativity follow PromQL (``^`` right-associative and
tighter than unary minus).
"""

from __future__ import annotations

import re
from functools import lru_cache

from prometheus_parquet_server_spark.durations import parse_duration
from prometheus_parquet_server_spark.labels import NAME_LABEL, LabelMatcher
from prometheus_parquet_server_spark.plans.ast import (
    AggMod,
    BinaryNode,
    FuncNode,
    Node,
    ScalarNode,
    SelectorNode,
    StringNode,
    SubqueryNode,
    UnaryNode,
    VectorMatching,
)


class PromQLError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(\.\d*)?([eE][-+]?\d+)?|\.\d+)
  | (?P<ident>[a-zA-Z_:][a-zA-Z0-9_:]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>=~|!~|!=|==|<=|>=|=|<|>|\{|\}|\(|\)|\[|\]|,|\+|-|\*|/|%|\^|@)
    """,
    re.VERBOSE,
)

_DURATION_RE = re.compile(r"[0-9][0-9a-zA-Z.]*")

AGG_ACTIONS = ("by", "without")


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def _skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str | None:
        self._skip_ws()
        if self.pos >= len(self.text):
            return None
        m = _TOKEN_RE.match(self.text, self.pos)
        if not m or m.lastgroup == "ws":
            raise PromQLError(f"lex error at {self.text[self.pos:self.pos+10]!r}")
        return m.group()

    def next(self) -> str | None:
        tok = self.peek()
        if tok is not None:
            self.pos += len(tok)
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise PromQLError(f"expected {tok!r}, got {got!r}")

    def eat_colon(self) -> bool:
        """Consume a raw ':' (subquery separator). Not a peek()-able token:
        the ident pattern legitimately allows ':' inside recording-rule
        names, so ':30s' would lex as one identifier."""
        self._skip_ws()
        if self.pos < len(self.text) and self.text[self.pos] == ":":
            self.pos += 1
            return True
        return False

    def next_duration(self) -> float:
        """Durations like ``5m``/``1h30m``/``300`` are not regular tokens —
        scan them raw inside brackets / after ``offset``."""
        self._skip_ws()
        m = _DURATION_RE.match(self.text, self.pos)
        if not m:
            raise PromQLError(f"expected duration at {self.text[self.pos:self.pos+10]!r}")
        self.pos = m.end()
        try:
            return parse_duration(m.group())
        except ValueError as e:
            # the lexing regex is looser than the semantic parser (e.g.
            # '0a' matches the token shape but is no duration) — malformed
            # input must surface as a QUERY error, never a raw ValueError
            # (found by tests/test_parser_fuzz.py)
            raise PromQLError(str(e)) from e


_ESCAPES = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r"}


def _unescape(text: str) -> str:
    """Resolve backslash escapes without round-tripping through
    unicode_escape (which mojibakes non-ASCII label values)."""
    out, i = [], 0
    while i < len(text):
        ch = text[i]
        if ch == "\\" and i + 1 < len(text):
            out.append(_ESCAPES.get(text[i + 1], text[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


@lru_cache(maxsize=512)
def parse_promql(query: str) -> Node:
    """Parse a PromQL string to its AST. Cached: every node type is a frozen
    dataclass, so the AST is safely shareable across queries — repeated
    dashboard panels skip re-parsing (errors are not cached by lru_cache)."""
    lex = _Lexer(query)
    node = _parse_expr(lex)
    if lex.peek() is not None:
        raise PromQLError(f"trailing input: {lex.peek()!r}")
    return node


#: PromQL operator precedence (higher binds tighter); ``^`` is handled
#: separately in :func:`_parse_power` (right-associative, tightest).
_BIN_PRECEDENCE = {
    "or": 1,
    "and": 2,
    "unless": 2,
    "==": 3,
    "!=": 3,
    "<=": 3,
    "<": 3,
    ">=": 3,
    ">": 3,
    "+": 4,
    "-": 4,
    "*": 5,
    "/": 5,
    "%": 5,
}

_COMP_OPS = ("==", "!=", ">", "<", ">=", "<=")
_SET_OPS = ("and", "or", "unless")


def _parse_bin_modifiers(
    lex: _Lexer, op: str
) -> tuple[bool, VectorMatching | None]:
    """``[bool] [on(...)|ignoring(...)] [group_left[(...)]|group_right[(...)]]``"""
    bool_mode = False
    if lex.peek() == "bool":
        lex.next()
        if op not in _COMP_OPS:
            raise PromQLError(f"'bool' modifier is only valid for comparisons, not {op!r}")
        bool_mode = True
    on: tuple[str, ...] | None = None
    ignoring: tuple[str, ...] = ()
    group: str | None = None
    include: tuple[str, ...] = ()
    if lex.peek() in ("on", "ignoring"):
        kind = lex.next()
        labels = _parse_agg_labels(lex)
        if kind == "on":
            on = labels
        else:
            ignoring = labels
    if lex.peek() in ("group_left", "group_right"):
        g = lex.next()
        if op in _SET_OPS:
            raise PromQLError(f"grouping modifier is not valid for {op!r}")
        group = "left" if g == "group_left" else "right"
        if lex.peek() == "(":
            include = _parse_agg_labels(lex)
    if on is None and not ignoring and group is None and not include:
        return bool_mode, None
    return bool_mode, VectorMatching(on, ignoring, group, include)


def _parse_expr(lex: _Lexer, min_prec: int = 1) -> Node:
    node = _parse_unary(lex)
    while True:
        tok = lex.peek()
        prec = _BIN_PRECEDENCE.get(tok) if tok is not None else None
        if prec is None or prec < min_prec:
            return node
        op = lex.next()
        bool_mode, matching = _parse_bin_modifiers(lex, op)
        rhs = _parse_expr(lex, prec + 1)  # all levels left-associative
        node = BinaryNode(op, node, rhs, bool_mode, matching)


def _parse_unary(lex: _Lexer) -> Node:
    if lex.peek() == "-":
        lex.next()
        operand = _parse_unary(lex)
        if isinstance(operand, ScalarNode):
            return ScalarNode(-operand.value)  # constant fold
        return UnaryNode(operand)
    if lex.peek() == "+":
        lex.next()
        return _parse_unary(lex)  # unary plus is a no-op
    return _parse_power(lex)


def _parse_power(lex: _Lexer) -> Node:
    node = _parse_primary(lex)
    if lex.peek() == "^":
        lex.next()
        bool_mode, matching = _parse_bin_modifiers(lex, "^")
        rhs = _parse_unary(lex)  # right-associative; unary allowed on rhs
        return BinaryNode("^", node, rhs, bool_mode, matching)
    return node


def _maybe_subquery(lex: _Lexer, node: Node) -> Node:
    """Postfix ``[range:step] [offset d] [@ t]`` on a non-selector
    expression (selectors handle their own bracket — range vector vs
    subquery)."""
    if lex.peek() != "[":
        return node
    lex.expect("[")
    rng = int(lex.next_duration())
    if not lex.eat_colon():
        raise PromQLError("range modifier is only valid on a selector")
    step = None if lex.peek() == "]" else int(lex.next_duration())
    lex.expect("]")
    offset_s, at_s = _parse_offset_at(lex)
    return SubqueryNode(node, rng, step, offset_s, at_s)


def _parse_offset_at(lex: _Lexer) -> tuple[int | None, float | str | None]:
    """Trailing ``offset d`` / ``@ t`` modifiers, any order, each at most
    once (Prometheus accepts both orders after subqueries and selectors)."""
    offset_s: int | None = None
    at_s: float | str | None = None
    while lex.peek() in ("offset", "@"):
        tok = lex.next()
        if tok == "offset":
            if offset_s is not None:
                raise PromQLError("duplicate offset modifier")
            offset_s = int(lex.next_duration())
        else:
            if at_s is not None:
                raise PromQLError("duplicate @ modifier")
            at_s = _parse_at(lex)
    return offset_s, at_s


def _parse_primary(lex: _Lexer) -> Node:
    tok = lex.peek()
    if tok is None:
        raise PromQLError("unexpected end of query")
    if tok == "(":
        lex.expect("(")
        inner = _parse_expr(lex)
        lex.expect(")")
        return _maybe_subquery(lex, inner)
    if re.fullmatch(r"\d.*|\.\d.*", tok):
        lex.next()
        return ScalarNode(float(tok))
    if tok[0] in "\"'":
        lex.next()
        return StringNode(_unescape(tok[1:-1]))
    if tok == "{":
        return _parse_selector(lex, name=None)
    # identifier: number word, function call, or metric selector
    ident = lex.next()
    if ident.lower() in ("inf", "nan"):
        # PromQL lexes inf/nan case-insensitively as number literals
        return ScalarNode(float(ident))
    nxt = lex.peek()
    if nxt == "(" or (nxt in AGG_ACTIONS and ident not in AGG_ACTIONS):
        return _maybe_subquery(lex, _parse_func(lex, ident))
    return _parse_selector(lex, name=ident)


def _parse_agg_labels(lex: _Lexer) -> tuple[str, ...]:
    lex.expect("(")
    labels: list[str] = []
    while lex.peek() != ")":
        labels.append(lex.next())
        if lex.peek() == ",":
            lex.next()
    lex.expect(")")
    return tuple(labels)


def _parse_func(lex: _Lexer, name: str) -> FuncNode:
    agg: AggMod | None = None
    if lex.peek() in AGG_ACTIONS:
        action = lex.next()
        agg = AggMod(action, _parse_agg_labels(lex))
    lex.expect("(")
    args: list[Node] = []
    while lex.peek() != ")":
        args.append(_parse_expr(lex))
        if lex.peek() == ",":
            lex.next()
    lex.expect(")")
    if agg is None and lex.peek() in AGG_ACTIONS:
        action = lex.next()
        agg = AggMod(action, _parse_agg_labels(lex))
    return FuncNode(name, tuple(args), agg)


def _parse_selector(lex: _Lexer, name: str | None) -> Node:
    matchers: list[LabelMatcher] = []
    if name is not None:
        matchers.append(LabelMatcher(NAME_LABEL, "=", name))
    if lex.peek() == "{":
        lex.expect("{")
        while lex.peek() != "}":
            label = lex.next()
            op = lex.next()
            if op not in ("=", "!=", "=~", "!~"):
                raise PromQLError(f"bad matcher operator {op!r}")
            raw = lex.next()
            if raw is None or raw[0] not in "\"'":
                raise PromQLError(f"expected quoted value, got {raw!r}")
            value = _unescape(raw[1:-1])
            matchers.append(LabelMatcher(label, op, value))
            if lex.peek() == ",":
                lex.next()
        lex.expect("}")
    if not matchers:
        raise PromQLError("empty selector")
    range_s: int | None = None
    offset_s: int | None = None
    if lex.peek() == "[":
        lex.expect("[")
        range_s = int(lex.next_duration())  # promql crate: integer seconds
        if lex.eat_colon():
            # subquery over the instant selector: m{}[30m:5m]
            step = None if lex.peek() == "]" else int(lex.next_duration())
            lex.expect("]")
            sq_offset, sq_at = _parse_offset_at(lex)
            return SubqueryNode(
                SelectorNode(tuple(matchers)), range_s, step, sq_offset, sq_at
            )
        lex.expect("]")
    offset_s, at_s = _parse_offset_at(lex)
    return SelectorNode(tuple(matchers), range_s, offset_s, at_s)


_AT_NUM = r"(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?"


def _parse_at(lex: _Lexer) -> float | str:
    """``@ <unix ts>`` / ``@ start()`` / ``@ end()``.

    Accepted after instant selectors, range-vector selectors
    (``rate(m[5m] @ t)``), and subqueries (``m[30m:5m] @ t``). Range and
    subquery anchors are honored by the consuming function
    (compiler._eval_func single-instant interception); an anchor with no
    consumer raises in the compiler rather than being ignored.
    """
    tok = lex.peek()
    if tok == "-":
        lex.next()
        num = lex.peek()
        if num is None or not re.fullmatch(_AT_NUM, num):
            raise PromQLError(f"expected timestamp after @ -, got {num!r}")
        return -float(lex.next())
    if tok in ("start", "end"):
        lex.next()
        lex.expect("(")
        lex.expect(")")
        return tok
    if tok is not None and re.fullmatch(_AT_NUM, tok):
        return float(lex.next())
    raise PromQLError(f"expected timestamp after @, got {tok!r}")
