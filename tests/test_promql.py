"""PromQL parser + compiler end-to-end (reference src/query.rs, the de-facto
example corpus at src/main.rs:44-84)."""

import math

import pytest

from prometheus_parquet_server_spark.labels import NAME_LABEL
from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.ast import FuncNode, ScalarNode, SelectorNode
from prometheus_parquet_server_spark.plans.compiler import run_query
from prometheus_parquet_server_spark.plans.parser import PromQLError, parse_promql
from tests.conftest import assert_close, long_frame


# ---------- parser ----------

def test_parse_selector_full():
    n = parse_promql('m_bucket{timing="transport", host=~"web.*", env!=""}[5m] offset 1m')
    assert isinstance(n, SelectorNode)
    assert n.matchers[0].label == NAME_LABEL and n.matchers[0].value == "m_bucket"
    ops = [(m.label, m.op, m.value) for m in n.matchers[1:]]
    assert ops == [("timing", "=", "transport"), ("host", "=~", "web.*"), ("env", "!=", "")]
    assert n.range_s == 300 and n.offset_s == 60


def test_parse_flagship():
    n = parse_promql('histogram_quantile(0.95, sum by (Le, timing) (rate(m_bucket{t="x"}[5m])))')
    assert isinstance(n, FuncNode) and n.name == "histogram_quantile"
    assert isinstance(n.args[0], ScalarNode) and n.args[0].value == 0.95
    s = n.args[1]
    assert s.name == "sum" and s.agg.action == "by" and s.agg.labels == ("Le", "timing")
    r = s.args[0]
    assert r.name == "rate" and r.args[0].range_s == 300


def test_parse_agg_after_args():
    n = parse_promql('sum(rate(m{a="b"}[30s])) by (a)')
    assert n.name == "sum" and n.agg.action == "by" and n.agg.labels == ("a",)


def test_parse_scalar_and_errors():
    from prometheus_parquet_server_spark.plans.ast import BinaryNode, UnaryNode

    assert parse_promql("1.5") == ScalarNode(1.5)
    # binary ops / negation error in the reference (src/query.rs:550-552,
    # 577-579) but are implemented here, like sum without (SURVEY §2.5)
    n = parse_promql("1+1")
    assert isinstance(n, BinaryNode) and n.op == "+"
    neg = parse_promql("-foo")
    assert isinstance(neg, UnaryNode)
    assert parse_promql("-1.5") == ScalarNode(-1.5)  # constant fold
    with pytest.raises(PromQLError):
        parse_promql('m{a=}')
    # malformed @ timestamps raise PromQLError (not a bare ValueError),
    # both after '@' and after '@ -'
    with pytest.raises(PromQLError):
        parse_promql("m @ -foo")
    with pytest.raises(PromQLError):
        parse_promql("m @ nonsense")
    n = parse_promql("m @ -1.5e3")
    assert n.at_s == -1500.0


def test_parse_binary_precedence_and_modifiers():
    from prometheus_parquet_server_spark.plans.ast import BinaryNode

    # * binds tighter than +
    n = parse_promql("a + b * c")
    assert n.op == "+" and isinstance(n.rhs, BinaryNode) and n.rhs.op == "*"
    # ^ is right-associative
    p = parse_promql("2 ^ 3 ^ 2")
    assert p.op == "^" and isinstance(p.rhs, BinaryNode) and p.rhs.op == "^"
    # comparison with bool; matching + grouping clauses
    c = parse_promql('a > bool 5')
    assert c.op == ">" and c.bool_mode
    m = parse_promql('a / on(le, t) group_left(extra) b')
    assert m.matching.on == ("le", "t")
    assert m.matching.group == "left" and m.matching.include == ("extra",)
    i = parse_promql('a and ignoring(host) b')
    assert i.matching.ignoring == ("host",) and i.matching.on is None
    with pytest.raises(PromQLError, match="bool"):
        parse_promql("a + bool b")
    with pytest.raises(PromQLError, match="grouping"):
        parse_promql("a or group_left b")


# ---------- compiler ----------

def bucket_fixture(spark):
    rows = []
    for ts in [0.0, 60.0, 120.0]:
        k = ts / 60.0
        for timing in ["a", "b"]:
            mult = 1.0 if timing == "a" else 2.0
            rows += [
                ("m_bucket", {"Le": "0.5", "timing": timing}, ts, (1 + k) * mult),
                ("m_bucket", {"Le": "2.5", "timing": timing}, ts, (3 + 2 * k) * mult),
                ("m_bucket", {"Le": "+Inf", "timing": timing}, ts, (4 + 2 * k) * mult),
            ]
    return long_frame(spark, rows)


def run(spark, df, q, start=0.0, end=120.0, step=60.0):
    grid = RegularTimeRange(start, end, step)
    out = run_query(spark, df, q, grid)
    return out


def test_plain_selector_resamples(spark):
    df = bucket_fixture(spark)
    out = run(spark, df, 'm_bucket{timing="a"}').collect()
    assert len(out) == 9  # 3 Le series x 3 grid points
    got = {(r["labels"]["Le"], r["ts"]): r["value"] for r in out}
    assert got[("0.5", 60.0)] == 2.0
    assert all(r["name"] == "m_bucket" for r in out)


def test_rate_query(spark):
    df = bucket_fixture(spark)
    out = run(spark, df, 'rate(m_bucket{timing="a", Le="+Inf"}[1m])').collect()
    got = {r["ts"]: r["value"] for r in out}
    # counter 4,6,8 at 0,60,120 → slope 2/60 inside range
    assert_close(got[120.0], 2.0 / 60.0)


def test_sum_by_query(spark):
    df = bucket_fixture(spark)
    out = run(spark, df, 'sum by (Le) (m_bucket{})').collect()
    got = {(r["labels"]["Le"], r["ts"]): r["value"] for r in out}
    # a+b at ts=0: Le=0.5 → 1*1 + 1*2 = 3
    assert got[("0.5", 0.0)] == 3.0
    assert all(r["name"] is None for r in out)
    assert all(set(r["labels"].keys()) == {"Le"} for r in out)


def test_flagship_quantile_pipeline(spark):
    df = bucket_fixture(spark)
    q = 'histogram_quantile(0.5, sum by (Le, timing) (rate(m_bucket{}[1m])))'
    out = run(spark, df, q).collect()
    # rate of each bucket series is constant inside the range; quantile well-defined
    vals = {(r["labels"]["timing"], r["ts"]): r["value"] for r in out}
    assert ("a", 120.0) in vals and ("b", 120.0) in vals
    for v in vals.values():
        assert 0.0 <= v <= 2.5 or math.isnan(v)


def test_state_machine_errors(spark):
    df = bucket_fixture(spark)
    with pytest.raises(QueryError, match="resample a vectorized"):
        run(spark, df, 'm_bucket{timing="a"}[5m]')  # bare range vector
    with pytest.raises(QueryError, match="range vector"):
        run(spark, df, 'rate(m_bucket{timing="a"})')  # rate over instant
    with pytest.raises(QueryError, match="Unknown function"):
        run(spark, df, 'no_such_function(m_bucket{})')
    # formerly-unknown quantile_over_time is implemented now — its arity
    # error proves it dispatches, not falls through
    with pytest.raises(QueryError, match="2 arguments"):
        run(spark, df, 'quantile_over_time(m_bucket{})')
    with pytest.raises(QueryError, match="exactly one __name__"):
        run(spark, df, '{timing="a"}')
    with pytest.raises(QueryError, match="scalar"):
        run(spark, df, "42")


def test_avg_max_count_by(spark):
    # beyond-reference aggregations follow the same align-then-agg shape
    df = bucket_fixture(spark)
    avg = run(spark, df, 'avg by (Le) (m_bucket{})').collect()
    got = {(r["labels"]["Le"], r["ts"]): r["value"] for r in avg}
    assert got[("0.5", 0.0)] == 1.5  # (1*1 + 1*2)/2
    cnt = run(spark, df, 'count by (Le) (m_bucket{})').collect()
    assert {r["value"] for r in cnt} == {2}
    mx = run(spark, df, 'max(m_bucket{timing="a"}) by (timing)').collect()
    gm = {r["ts"]: r["value"] for r in mx}
    assert gm[0.0] == 4.0  # +Inf bucket count at ts=0 for timing=a


def test_offset_query(spark):
    df = bucket_fixture(spark)
    out = run(spark, df, 'm_bucket{timing="a", Le="+Inf"} offset 1m').collect()
    got = {r["ts"]: r["value"] for r in out}
    assert got[60.0] == 4.0  # value at 0s shown at 60s
    assert got[120.0] == 6.0


def test_topk_bottomk(spark):
    df = bucket_fixture(spark)
    top = run(spark, df, 'topk(2, m_bucket{Le="+Inf"})').collect()
    # per ts keep 2 largest; timing=b is 2x timing=a
    by_ts = {}
    for r in top:
        by_ts.setdefault(r["ts"], []).append(r["labels"]["timing"])
    assert all(sorted(v) == ["a", "b"] for v in by_ts.values())  # only 2 series exist
    bot = run(spark, df, 'bottomk(1, m_bucket{Le="+Inf"})').collect()
    assert all(r["labels"]["timing"] == "a" for r in bot)
    assert len(bot) == 3  # one per grid instant


def test_exact_sum_guards(spark):
    """exact_sum must never silently drop values: NaN poisons (float
    fallback), Inf saturates, and a finite value beyond DECIMAL(38,9)
    range (1e30) flips the same fallback instead of casting to NULL."""
    import math

    from pyspark.sql import functions as F

    from prometheus_parquet_server_spark.operators.aggregate import exact_sum

    df = spark.createDataFrame(
        [("nan", 1.0), ("nan", float("nan")),
         ("inf", 2.0), ("inf", float("inf")),
         ("big", 1e30), ("big", 3.0),
         ("ok", 1.25), ("ok", 2.5)],
        "k string, value double",
    )
    got = {r["k"]: r["s"] for r in df.groupBy("k").agg(exact_sum("value").alias("s")).collect()}
    assert math.isnan(got["nan"])
    assert got["inf"] == float("inf")
    assert got["big"] == 1e30 + 3.0  # float fallback, NOT 3.0 (silent drop)
    assert got["ok"] == 3.75
