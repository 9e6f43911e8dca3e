"""``*_over_time`` window aggregations, increase/delta, and elementwise
math functions (beyond-reference PromQL surface)."""

import math

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.over_time import over_time_to_grid
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.compiler import run_query
from tests.conftest import assert_close, long_frame


def fixture(spark):
    # one series, samples every 30s: value = ts/30
    rows = [("m", {"h": "a"}, t, t / 30.0) for t in [0.0, 30.0, 60.0, 90.0, 120.0]]
    # second series, sparse: only at ts=60
    rows += [("m", {"h": "b"}, 60.0, 100.0)]
    return long_frame(spark, rows)


def run(spark, df, q, start=0.0, end=120.0, step=60.0):
    return run_query(spark, df, q, RegularTimeRange(start, end, step))


# ---------- *_over_time ----------

def test_sum_count_avg_over_time(spark):
    df = fixture(spark)
    out = run(spark, df, 'sum_over_time(m{h="a"}[1m])').collect()
    got = {r["ts"]: r["value"] for r in out}
    # window [t-60, t] closed: at t=60 samples 0,30,60 → 0+1+2 = 3
    assert got[60.0] == 3.0
    assert got[0.0] == 0.0  # only the ts=0 sample
    assert got[120.0] == 2.0 + 3.0 + 4.0
    assert all(r["name"] is None for r in out)

    cnt = run(spark, df, 'count_over_time(m{h="a"}[1m])').collect()
    assert {r["ts"]: r["value"] for r in cnt}[60.0] == 3.0

    avg = run(spark, df, 'avg_over_time(m{h="a"}[1m])').collect()
    assert_close({r["ts"]: r["value"] for r in avg}[120.0], 3.0)


def test_min_max_last_over_time(spark):
    df = fixture(spark)
    mx = run(spark, df, 'max_over_time(m{h="a"}[2m])').collect()
    assert {r["ts"]: r["value"] for r in mx}[120.0] == 4.0
    mn = run(spark, df, 'min_over_time(m{h="a"}[2m])').collect()
    assert {r["ts"]: r["value"] for r in mn}[120.0] == 0.0
    last = run(spark, df, 'last_over_time(m{h="a"}[2m])').collect()
    assert {r["ts"]: r["value"] for r in last}[60.0] == 2.0
    assert all(r["name"] == "m" for r in last)  # last_over_time keeps name


def test_empty_windows_produce_no_rows(spark):
    df = fixture(spark)
    # series h=b has one sample at 60; window [t-30, t]: only t=60 grid
    # instants... step=60 grid: t=60 hits, t=0/120 miss
    out = run(spark, df, 'count_over_time(m{h="b"}[30s])').collect()
    assert [(r["ts"], r["value"]) for r in out] == [(60.0, 1.0)]


def test_over_time_errors(spark):
    df = fixture(spark)
    with pytest.raises(QueryError, match="range vector"):
        run(spark, df, 'sum_over_time(m{h="a"})')


# ---------- increase / delta ----------

def test_increase_matches_rate_times_range(spark):
    df = fixture(spark)
    inc = run(spark, df, 'increase(m{h="a"}[1m])').collect()
    got = {r["ts"]: r["value"] for r in inc}
    # linear series slope 1/30 → increase over 60s = 2 inside the range
    assert_close(got[120.0], 2.0)
    dlt = run(spark, df, 'delta(m{h="a"}[1m])').collect()
    assert_close({r["ts"]: r["value"] for r in dlt}[120.0], 2.0)


# ---------- math functions ----------

def test_math_functions(spark):
    df = long_frame(
        spark,
        [
            ("m", {"h": "a"}, 0.0, 4.0),
            ("m", {"h": "a"}, 60.0, -2.25),
            ("m", {"h": "a"}, 120.0, 0.0),
        ],
    )
    g = dict()
    for fn, expect in [
        ("abs", {0.0: 4.0, 60.0: 2.25, 120.0: 0.0}),
        ("ceil", {0.0: 4.0, 60.0: -2.0, 120.0: 0.0}),
        ("floor", {0.0: 4.0, 60.0: -3.0, 120.0: 0.0}),
        ("sqrt", {0.0: 2.0, 120.0: 0.0}),
        ("sgn", {0.0: 1.0, 60.0: -1.0, 120.0: 0.0}),
    ]:
        out = run(spark, df, f"{fn}(m{{}})").collect()
        g[fn] = {r["ts"]: r["value"] for r in out}
        for ts, v in expect.items():
            assert_close(g[fn][ts], v)
        assert all(r["name"] is None for r in out)
    assert math.isnan(g["sqrt"][60.0])  # sqrt of negative

    ln = {r["ts"]: r["value"] for r in run(spark, df, "ln(m{})").collect()}
    assert_close(ln[0.0], math.log(4.0))
    assert ln[120.0] == float("-inf")  # ln(0)
    assert math.isnan(ln[60.0])  # ln(negative)


def test_round_and_clamp(spark):
    df = long_frame(
        spark,
        [
            ("m", {"h": "a"}, 0.0, 1.26),
            ("m", {"h": "a"}, 60.0, 250.0),
            ("m", {"h": "a"}, 120.0, -5.0),
        ],
    )
    r = {r["ts"]: r["value"] for r in run(spark, df, "round(m{}, 0.1)").collect()}
    assert_close(r[0.0], 1.3, tol=1e-9)
    r1 = {r["ts"]: r["value"] for r in run(spark, df, "round(m{})").collect()}
    assert r1[0.0] == 1.0
    c = {r["ts"]: r["value"] for r in run(spark, df, "clamp(m{}, 0, 200)").collect()}
    assert c == {0.0: 1.26, 60.0: 200.0, 120.0: 0.0}
    cm = {r["ts"]: r["value"] for r in run(spark, df, "clamp_min(m{}, 2)").collect()}
    assert cm[120.0] == 2.0 and cm[60.0] == 250.0


def test_scalar_math(spark):
    from prometheus_parquet_server_spark.plans.compiler import run_instant_query

    df = fixture(spark)
    assert run_instant_query(spark, df, "sqrt(16)", at=0.0)[1] == 4.0
    assert run_instant_query(spark, df, "ln(1)", at=0.0)[1] == 0.0
    assert run_instant_query(spark, df, "sgn(0 - 3)", at=0.0)[1] == -1.0


def test_nested_composition(spark):
    df = fixture(spark)
    # math over an over_time aggregate over a filtered selector
    out = run(spark, df, 'sqrt(sum_over_time(m{h="a"}[1m]))').collect()
    got = {r["ts"]: r["value"] for r in out}
    assert_close(got[60.0], math.sqrt(3.0))


# ---------- deriv / predict_linear / changes / resets ----------

def test_deriv_and_predict_linear(spark):
    df = fixture(spark)  # h=a linear: value = ts/30 → slope 1/30
    d = run(spark, df, 'deriv(m{h="a"}[2m])').collect()
    got = {r["ts"]: r["value"] for r in d}
    assert_close(got[120.0], 1.0 / 30.0)
    assert all(r["name"] is None for r in d)
    # predict 60s ahead from t=120: value = 120/30 + 60/30 = 6
    p = run(spark, df, 'predict_linear(m{h="a"}[2m], 60)').collect()
    assert_close({r["ts"]: r["value"] for r in p}[120.0], 6.0)
    # single-sample windows (h=b) produce no deriv point
    assert run(spark, df, 'deriv(m{h="b"}[30s])').count() == 0


def test_changes_and_resets(spark):
    rows = [
        ("m", {"h": "c"}, 0.0, 1.0),
        ("m", {"h": "c"}, 30.0, 2.0),   # change (up)
        ("m", {"h": "c"}, 60.0, 2.0),   # no change
        ("m", {"h": "c"}, 90.0, 1.0),   # change (down) = reset
        ("m", {"h": "c"}, 120.0, 3.0),  # change (up)
    ]
    df = long_frame(spark, rows)
    ch = run(spark, df, 'changes(m{}[2m])').collect()
    got = {r["ts"]: r["value"] for r in ch}
    # window [0,120]: pairs at 30(up),60(eq),90(down),120(up) → 3 changes
    assert got[120.0] == 3.0
    assert got[0.0] == 0.0  # only one sample in window → 0, not absent
    rs = run(spark, df, 'resets(m{}[2m])').collect()
    assert {r["ts"]: r["value"] for r in rs}[120.0] == 1.0
