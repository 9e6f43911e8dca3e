"""Subqueries ``expr[range:step]`` (beyond-reference): inner expression on a
finer grid, consumed by outer range-vector functions."""

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.ast import SubqueryNode, SelectorNode
from prometheus_parquet_server_spark.plans.compiler import run_query
from prometheus_parquet_server_spark.plans.parser import PromQLError, parse_promql
from tests.conftest import assert_close, long_frame


def fixture(spark):
    # linear counter: value = ts/30, samples every 30s over [0, 240]
    rows = [("m", {"h": "a"}, t, t / 30.0) for t in range(0, 241, 30)]
    return long_frame(spark, [(n, l, float(t), v) for n, l, t, v in rows])


def run(spark, df, q, start=120.0, end=240.0, step=60.0):
    return run_query(spark, df, q, RegularTimeRange(start, end, step))


def test_parse_subquery_forms():
    n = parse_promql("rate(m{}[1m])[10m:30s]")
    assert isinstance(n, SubqueryNode)
    assert n.range_s == 600 and n.step_s == 30
    assert n.expr.name == "rate"
    # selector subquery (instant selector inside)
    s = parse_promql("m{}[10m:30s]")
    assert isinstance(s, SubqueryNode) and isinstance(s.expr, SelectorNode)
    assert s.expr.range_s is None
    # default step
    d = parse_promql("m{}[10m:]")
    assert d.step_s is None
    # range on a non-selector is still an error
    with pytest.raises(PromQLError, match="selector"):
        parse_promql("rate(m{}[1m])[5m]")


def test_max_over_time_of_subquery_selector(spark):
    df = fixture(spark)
    # inner: resample m on 30s grid; outer: max over [t-60, t]
    out = run(spark, df, "max_over_time(m{}[1m:30s])").collect()
    got = {r["ts"]: r["value"] for r in out}
    # at t=240: inner instants 180,210,240 → max = 240/30 = 8
    assert_close(got[240.0], 8.0)
    assert_close(got[120.0], 4.0)


def test_avg_over_time_of_rate_subquery(spark):
    df = fixture(spark)
    # rate of a linear counter (slope 1/30) is constant inside the range;
    # averaging it over any window stays 1/30
    out = run(spark, df, "avg_over_time(rate(m{}[1m])[2m:30s])").collect()
    got = {r["ts"]: r["value"] for r in out}
    assert_close(got[240.0], 1.0 / 30.0)


def test_rate_of_subquery(spark):
    df = fixture(spark)
    # rate over the resampled-inner series == rate over raw (linear data)
    out = run(spark, df, "rate(m{}[2m:30s])").collect()
    got = {r["ts"]: r["value"] for r in out}
    assert_close(got[240.0], 1.0 / 30.0)


def test_subquery_errors(spark):
    df = fixture(spark)
    with pytest.raises(QueryError, match="vector"):
        run(spark, df, "sum_over_time((1+1)[2m:30s])")


def test_parse_subquery_at_modifier():
    n = parse_promql("avg_over_time(m{}[2m:30s] @ 100.5)").args[0]
    assert isinstance(n, SubqueryNode) and n.at_s == 100.5
    # offset and @ compose in either order
    a = parse_promql("m{}[2m:30s] @ 120 offset 1m")
    b = parse_promql("m{}[2m:30s] offset 1m @ 120")
    assert a.at_s == b.at_s == 120.0 and a.offset_s == b.offset_s == 60
    assert parse_promql("m{}[2m:30s] @ start()").at_s == "start"
    assert parse_promql("rate(m{}[1m])[10m:30s] @ end()").at_s == "end"
    with pytest.raises(PromQLError, match="duplicate"):
        parse_promql("m{}[2m:30s] @ 120 @ 60")


def test_subquery_at_modifier(spark):
    """``f(e[r:s] @ t)`` pins the window: every grid step yields the value
    f would produce at t, i.e. a constant series."""
    df = fixture(spark)
    # max over inner instants 180,210,240 anchored at t=240 → 8 everywhere
    out = run(spark, df, "max_over_time(m{}[1m:30s] @ 240)").collect()
    assert {r["ts"] for r in out} == {120.0, 180.0, 240.0}
    assert all(r["value"] == 8.0 for r in out)
    # @ end() == @ 240 for this grid; @ start() == the unanchored t=120 value
    end = {r["ts"]: r["value"] for r in run(spark, df, "max_over_time(m{}[1m:30s] @ end())").collect()}
    assert set(end.values()) == {8.0}
    start = {r["ts"]: r["value"] for r in run(spark, df, "max_over_time(m{}[1m:30s] @ start())").collect()}
    assert set(start.values()) == {4.0}
    # anchored + offset: window slides back from the pin, still constant
    offs = run(spark, df, "max_over_time(m{}[1m:30s] @ 240 offset 1m)").collect()
    assert all(r["value"] == 6.0 for r in offs)  # max at inner 120..180 = 180/30
    # an omitted subquery step resolves from the OUTER grid increment, not
    # the synthetic single-instant grid: count over [240-120, 240] at the
    # 60s default step sees instants 120/180/240 → 3.0, same as the
    # unanchored query at t=240 (a 1.0s inherited step would give 121)
    cnt = run(spark, df, "count_over_time(m{}[2m:] @ 240)").collect()
    assert {r["value"] for r in cnt} == {3.0}
    base = {r["ts"]: r["value"] for r in run(spark, df, "count_over_time(m{}[2m:])").collect()}
    assert base[240.0] == 3.0
    # range-vector selector @ takes the same interception: a linear counter
    # has slope 1/30 anchored anywhere → constant 1/30 at every step
    rate_at = run(spark, df, "rate(m{}[2m] @ 240)").collect()
    assert len(rate_at) == 3
    for r in rate_at:
        assert_close(r["value"], 1.0 / 30.0)
    # a consumer that cannot take a range vector still errors (the anchor
    # never silently turns a range vector into something sum() accepts)
    with pytest.raises(QueryError):
        run(spark, df, "sum(m{}[2m:30s] @ 240)")
    # and an anchored subquery with NO consuming function is rejected
    with pytest.raises(QueryError, match="function argument"):
        run(spark, df, "m{}[2m:30s] @ 240")


def test_subquery_with_offset(spark):
    """The inner grid must extend offset seconds further back: the shifted
    result at t equals the unshifted result at t − offset."""
    df = fixture(spark)
    base = {r["ts"]: r["value"] for r in run(spark, df, "max_over_time(m{}[1m:30s])").collect()}
    shifted = {
        r["ts"]: r["value"]
        for r in run(spark, df, "max_over_time(m{}[1m:30s] offset 1m)").collect()
    }
    overlap = [t for t in shifted if t - 60.0 in base]
    assert overlap  # the comparison is non-vacuous
    for t in overlap:
        assert shifted[t] == base[t - 60.0], (t, shifted[t], base[t - 60.0])
