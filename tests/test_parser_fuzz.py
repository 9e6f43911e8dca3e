"""Parser robustness fuzz (hypothesis, no Spark needed):

1. every expression produced by a grammar-directed generator parses;
2. arbitrary garbage either parses or raises PromQLError — never an
   uncontrolled exception (IndexError/KeyError/RecursionError leaking
   from the tokenizer or recursive-descent internals).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_parquet_server_spark.plans.parser import (
    PromQLError,
    parse_promql,
)

_name = st.sampled_from(["m", "http_requests_total", "m_bucket", "up"])
_label = st.sampled_from(["job", "env", "host"])
_op = st.sampled_from(["=", "!=", "=~", "!~"])
_value = st.sampled_from(["web", "web.*", "", "a b", "x\\\\y"])
_dur = st.sampled_from(["5m", "1h", "30s", "1h30m", "90s"])


@st.composite
def _selector(draw):
    name = draw(_name)
    n_m = draw(st.integers(0, 3))
    ms = ",".join(
        f'{draw(_label)}{draw(_op)}"{draw(_value)}"' for _ in range(n_m)
    )
    sel = f"{name}{{{ms}}}" if ms else name
    if draw(st.booleans()):
        sel += f"[{draw(_dur)}]"
        if draw(st.booleans()):
            sel += f" offset {draw(_dur)}"
    return sel


@st.composite
def _expr(draw, depth=0):
    if depth >= 3:
        return draw(_selector())
    kind = draw(st.integers(0, 5))
    if kind == 0:
        return draw(_selector())
    if kind == 1:
        inner = draw(_expr(depth=depth + 1))
        fn = draw(st.sampled_from(["rate", "irate", "sum", "avg", "max", "abs", "ceil"]))
        return f"{fn}({inner})"
    if kind == 2:
        inner = draw(_expr(depth=depth + 1))
        by = draw(_label)
        agg = draw(st.sampled_from(["sum", "min", "count"]))
        return f"{agg} by ({by}) ({inner})"
    if kind == 3:
        a = draw(_expr(depth=depth + 1))
        b = draw(_expr(depth=depth + 1))
        op = draw(st.sampled_from(["+", "-", "*", "/", ">", "<=", "and", "unless"]))
        return f"({a}) {op} ({b})"
    if kind == 4:
        return str(draw(st.floats(0, 100, allow_nan=False)))
    inner = draw(_selector())
    return f"-({inner})"


@settings(max_examples=300, deadline=None)
@given(q=_expr())
def test_wellformed_always_parses(q):
    parse_promql(q)  # must not raise


@settings(max_examples=500, deadline=None)
@given(q=st.text(
    alphabet=st.sampled_from(list('mabc_{}[]()"=!~,.+-*/ 0123456789:sohfrd')),
    min_size=0, max_size=40,
))
def test_garbage_never_crashes(q):
    """Malformed input is a user error (PromQLError), never an internal
    crash class."""
    try:
        parse_promql(q)
    except PromQLError:
        pass
    # any OTHER exception type propagates and fails the test


@settings(max_examples=100, deadline=None)
@given(q=_expr(), junk=st.sampled_from([")", "]", "}", "garbage", "@@", "[5m"]))
def test_trailing_junk_is_rejected_cleanly(q, junk):
    try:
        parse_promql(q + " " + junk)
    except PromQLError:
        pass
