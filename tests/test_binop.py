"""Binary operators, unary minus, instant queries, quantile/stddev aggs
(beyond-reference surface; the reference rejects Node::Operator and
Node::Negation, src/query.rs:550-552, 577-579)."""

import math

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.compiler import (
    run_instant_query,
    run_query,
)
from prometheus_parquet_server_spark.plans.parser import PromQLError
from tests.conftest import assert_close, long_frame


def fixture(spark):
    """Two metrics: req{host} a counter-ish series, lim{host} a flat limit.
    Plus m_bucket-style Le series for group_left ratios."""
    rows = []
    for ts in [0.0, 60.0, 120.0]:
        k = ts / 60.0
        rows += [
            ("req", {"host": "a"}, ts, 10.0 + k),
            ("req", {"host": "b"}, ts, 20.0 + 2 * k),
            ("lim", {"host": "a"}, ts, 12.0),
            ("lim", {"host": "b"}, ts, 40.0),
        ]
    return long_frame(spark, rows)


def run(spark, df, q, start=0.0, end=120.0, step=60.0):
    return run_query(spark, df, q, RegularTimeRange(start, end, step))


# ---------- scalar arithmetic / instant queries ----------

def test_instant_scalar_arithmetic(spark):
    df = fixture(spark)
    kind, val = run_instant_query(spark, df, "1+1", at=0.0)
    assert kind == "scalar" and val == 2.0  # the reference's dummy, for real
    kind, val = run_instant_query(spark, df, "2 ^ 3 ^ 2", at=0.0)
    assert val == 512.0  # right-associative
    kind, val = run_instant_query(spark, df, "-(3 - 5) * 2", at=0.0)
    assert val == 4.0
    kind, val = run_instant_query(spark, df, "7 % 4 + 1 / 2", at=0.0)
    assert val == 3.5
    kind, val = run_instant_query(spark, df, "1 / 0", at=0.0)
    assert math.isinf(val) and val > 0  # IEEE, not NULL
    kind, val = run_instant_query(spark, df, "0 / 0", at=0.0)
    assert math.isnan(val)
    kind, val = run_instant_query(spark, df, "2 > bool 1", at=0.0)
    assert val == 1.0
    kind, val = run_instant_query(spark, df, "1 / Inf", at=0.0)
    assert val == 0.0  # inf/nan lex as number literals
    with pytest.raises(QueryError, match="BOOL"):
        run_instant_query(spark, df, "2 > 1", at=0.0)  # PromQL parity


def test_instant_vector_query(spark):
    df = fixture(spark)
    kind, out = run_instant_query(spark, df, 'req{host="a"}', at=60.0)
    assert kind == "vector"
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["ts"] == 60.0 and rows[0]["value"] == 11.0


# ---------- vector ⊕ scalar ----------

def test_vector_scalar_arith(spark):
    df = fixture(spark)
    out = run(spark, df, 'req{host="a"} * 2').collect()
    got = {r["ts"]: r["value"] for r in out}
    assert got[60.0] == 22.0
    assert all(r["name"] is None for r in out)  # arithmetic drops the name
    # scalar on the left, non-commutative op
    out2 = run(spark, df, '100 - req{host="a"}').collect()
    got2 = {r["ts"]: r["value"] for r in out2}
    assert got2[0.0] == 90.0
    # unary minus
    neg = run(spark, df, '-req{host="a"}').collect()
    assert {r["value"] for r in neg} == {-10.0, -11.0, -12.0}


def test_vector_scalar_comparison_filter_and_bool(spark):
    df = fixture(spark)
    # filter mode keeps matching samples, name intact
    out = run(spark, df, 'req{} > 13').collect()
    assert all(r["value"] > 13 for r in out)
    assert all(r["name"] == "req" for r in out)
    assert all(r["labels"]["host"] == "b" for r in out)
    # scalar on the left: 13 < v ≡ v > 13
    out_l = run(spark, df, '13 < req{}').collect()
    assert {(r["ts"], r["value"]) for r in out_l} == {
        (r["ts"], r["value"]) for r in out
    }
    # bool mode: 0/1 values, name dropped
    b = run(spark, df, 'req{} >= bool 20').collect()
    vals = {(r["labels"]["host"], r["ts"]): r["value"] for r in b}
    assert vals[("a", 0.0)] == 0.0 and vals[("b", 0.0)] == 1.0
    assert all(r["name"] is None for r in b)


# ---------- vector ⊕ vector ----------

def test_vector_vector_arith_one_to_one(spark):
    df = fixture(spark)
    out = run(spark, df, 'req{} / lim{}').collect()
    got = {(r["labels"]["host"], r["ts"]): r["value"] for r in out}
    assert_close(got[("a", 0.0)], 10.0 / 12.0)
    assert_close(got[("b", 120.0)], 24.0 / 40.0)
    assert all(r["name"] is None for r in out)
    # explicit on(...) restricts the output label set to the on labels
    out_on = run(spark, df, 'req{} + on(host) lim{}').collect()
    assert all(set(r["labels"].keys()) == {"host"} for r in out_on)
    got_on = {(r["labels"]["host"], r["ts"]): r["value"] for r in out_on}
    assert got_on[("a", 60.0)] == 11.0 + 12.0


def test_vector_vector_comparison_filter(spark):
    df = fixture(spark)
    # req > lim: only host=b at no instant (20+2k vs 40) and host=a at none
    # (10+k vs 12)... make it interesting: req * 4 > lim
    out = run(spark, df, 'req{} * 4 > lim{}').collect()
    # host=a: 40+4k > 12 always; host=b: 80+8k > 40 always → all 6 rows
    assert len(out) == 6
    # lhs sample value is kept
    got = {(r["labels"]["host"], r["ts"]): r["value"] for r in out}
    assert got[("a", 0.0)] == 40.0


def test_group_left_ratio_to_aggregate(spark):
    df = fixture(spark)
    q = 'req{} / on() group_left sum(req{})'
    out = run(spark, df, q).collect()
    # share of each host in the total: a: (10+k)/(30+3k), b: 2/3
    got = {(r["labels"]["host"], r["ts"]): r["value"] for r in out}
    assert_close(got[("a", 0.0)], 10.0 / 30.0)
    assert_close(got[("b", 120.0)], 2.0 / 3.0)
    # many side keeps its full label set
    assert all(set(r["labels"].keys()) == {"host"} for r in out)


def test_set_ops(spark):
    df = fixture(spark)
    # and: req rows whose (host) matches a lim series — all of them
    both = run(spark, df, 'req{} and lim{}').collect()
    assert len(both) == 6 and all(r["name"] == "req" for r in both)
    # unless with a restricted rhs: drop host=a instants
    only_b = run(spark, df, 'req{} unless lim{host="a"}').collect()
    assert all(r["labels"]["host"] == "b" for r in only_b) and len(only_b) == 3
    # or: lhs wins on conflicts; rhs fills the gaps
    merged = run(spark, df, 'req{host="a"} or lim{}').collect()
    got = {(r["name"], r["labels"]["host"]) for r in merged}
    assert got == {("req", "a"), ("lim", "b")}
    assert len(merged) == 6


def test_duplicate_match_group_raises(spark):
    """Prometheus error parity: many-to-many (or an ambiguous one side)
    raises "found duplicate series for the match group" at evaluation
    instead of silently cross-producting."""
    df = fixture(spark)
    # on() collapses both sides into a single match group: 2×2 series
    with pytest.raises(Exception, match="duplicate series"):
        run(spark, df, 'req{} + on() lim{}').collect()
    # group_left with a non-unique "one" side (2 lim series in the group)
    with pytest.raises(Exception, match="duplicate series"):
        run(spark, df, 'req{} / on() group_left lim{}').collect()
    # group_right mirror: the lhs is now the ambiguous "one" side
    with pytest.raises(Exception, match="duplicate series"):
        run(spark, df, 'req{} / on() group_right lim{}').collect()
    # sanity: well-formed matches are unaffected by the guard
    ok = run(spark, df, 'req{} + on(host) lim{}').collect()
    assert len(ok) == 6
    ok_gl = run(spark, df, 'req{} / on() group_left sum(lim{})').collect()
    assert len(ok_gl) == 6


def test_binop_errors(spark):
    df = fixture(spark)
    with pytest.raises(QueryError, match="vector operands"):
        run(spark, df, 'req{} and 1')
    with pytest.raises(QueryError, match="matching"):
        run(spark, df, 'req{} + on(host) 1')
    with pytest.raises(PromQLError, match="bool"):
        run(spark, df, 'req{} + bool lim{}')


# ---------- quantile / stddev / stdvar ----------

def test_quantile_and_stddev_aggs(spark):
    df = fixture(spark)
    # two series at ts=0: values 10, 20 → median 15, stddev_pop 5, var 25
    q = run(spark, df, 'quantile(0.5, req{})').collect()
    got = {r["ts"]: r["value"] for r in q}
    assert_close(got[0.0], 15.0)
    sd = run(spark, df, 'stddev(req{})').collect()
    assert_close({r["ts"]: r["value"] for r in sd}[0.0], 5.0)
    sv = run(spark, df, 'stdvar(req{})').collect()
    assert_close({r["ts"]: r["value"] for r in sv}[0.0], 25.0)
    # by-modifier: groups of one pass through
    q1 = run(spark, df, 'quantile by (host) (0.9, req{})').collect()
    g = {(r["labels"]["host"], r["ts"]): r["value"] for r in q1}
    assert g[("a", 0.0)] == 10.0


# ---------- time() / scalar() / vector() (per-step scalars) ----------

def test_time_function(spark):
    df = fixture(spark)
    out = run(spark, df, "time()").collect()
    assert {(r["ts"], r["value"]) for r in out} == {(t, t) for t in [0.0, 60.0, 120.0]}
    assert all(dict(r["labels"]) == {} for r in out)
    # sample age: timestamp(v) - time() == 0 on grid-aligned frames
    age = run(spark, df, 'timestamp(req{host="a"}) - time()').collect()
    assert all(r["value"] == 0.0 for r in age)


def test_time_arithmetic_with_vector(spark):
    df = fixture(spark)
    # value plus the grid instant, per step
    out = run(spark, df, 'req{host="a"} + time()').collect()
    got = {r["ts"]: r["value"] for r in out}
    assert got[60.0] == 11.0 + 60.0
    # comparison filter against a per-step scalar
    flt = run(spark, df, 'req{} > time()').collect()
    assert all(r["value"] > r["ts"] for r in flt)


def test_scalar_function(spark):
    df = fixture(spark)
    # one matching series → its values as a per-step scalar series
    out = run(spark, df, 'scalar(req{host="a"}) * 2').collect()
    got = {r["ts"]: r["value"] for r in out}
    assert got[0.0] == 20.0 and dict(out[0]["labels"]) == {}
    # two matching series → NaN per step
    nan_out = run(spark, df, "scalar(req{})").collect()
    assert all(math.isnan(r["value"]) for r in nan_out)


def test_vector_function(spark):
    df = fixture(spark)
    out = run(spark, df, "vector(1)").collect()
    assert {r["value"] for r in out} == {1.0} and len(out) == 3
    # vector(time()) lifts the per-step scalar into a vector series
    vt = run(spark, df, "vector(time())").collect()
    assert all(r["value"] == r["ts"] for r in vt)


def test_instant_time(spark):
    from prometheus_parquet_server_spark.plans.compiler import run_instant_query

    df = fixture(spark)
    kind, val = run_instant_query(spark, df, "time()", at=1234.0)
    assert kind == "scalar" and val == 1234.0


def test_math_fns_on_per_step_scalar(spark):
    """floor(time()/3600)-style expressions: math/round/clamp applied to a
    GridScalar operate on its (ts, value) frame (ADVICE r1)."""
    df = fixture(spark)
    out = run(spark, df, "vector(floor(time() / 45) * 45)").collect()
    got = {r["ts"]: r["value"] for r in out}
    assert got == {0.0: 0.0, 60.0: 45.0, 120.0: 90.0}
    sq = run(spark, df, "vector(sqrt(time()))").collect()
    assert {r["ts"]: r["value"] for r in sq}[0.0] == 0.0
    rd = run(spark, df, "vector(round(time(), 50))").collect()
    assert {r["ts"]: r["value"] for r in rd} == {0.0: 0.0, 60.0: 50.0, 120.0: 100.0}
    cl = run(spark, df, "vector(clamp(time(), 30, 90))").collect()
    assert {r["ts"]: r["value"] for r in cl} == {0.0: 30.0, 60.0: 60.0, 120.0: 90.0}
    # min > max → empty (Prometheus special case), also through vector()
    assert run(spark, df, "vector(clamp(time(), 90, 30))").count() == 0
    # string argument → clean QueryError, not an AttributeError
    with pytest.raises((QueryError, PromQLError)):
        run(spark, df, 'floor("not a vector")')


def test_scalar_comparisons_require_bool(spark):
    df = fixture(spark)
    with pytest.raises(QueryError, match="BOOL"):
        run(spark, df, "time() > 100")
    with pytest.raises(QueryError, match="BOOL"):
        run(spark, df, 'scalar(req{host="a"}) > scalar(req{host="b"})')
    out = run(spark, df, "vector(time() > bool 100)").collect()
    assert {r["ts"]: r["value"] for r in out} == {0.0: 0.0, 60.0: 0.0, 120.0: 1.0}


def test_clamp_edge_cases(spark):
    df = fixture(spark)
    # min > max on a vector → empty vector
    assert run(spark, df, "clamp(req{}, 5, 1)").count() == 0
    # NaN bound → NaN for every sample (Go math.Max/Min semantics)
    nan_out = run(spark, df, "clamp(req{}, NaN, 10)").collect()
    assert len(nan_out) == 6 and all(math.isnan(r["value"]) for r in nan_out)
    nan_min = run(spark, df, "clamp_min(req{}, NaN)").collect()
    assert all(math.isnan(r["value"]) for r in nan_min)


def test_group_right_comparison_filter(spark):
    df = fixture(spark)
    # total > each part always holds; filter mode keeps the MANY (rhs) side
    out = run(spark, df, 'sum(req{}) > on() group_right req{}').collect()
    assert len(out) == 6
    assert all(r["name"] == "req" for r in out)
    got = {(r["labels"]["host"], r["ts"]): r["value"] for r in out}
    assert got[("a", 0.0)] == 10.0  # the rhs sample value is kept
