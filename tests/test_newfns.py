"""group / count_values / quantile_over_time / present_over_time /
date-part functions / sort (beyond-reference everyday-PromQL surface)."""

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.compiler import run_query
from tests.conftest import long_frame

GRID = RegularTimeRange(0.0, 120.0, 60.0)


def fixture(spark):
    rows = []
    for ts in [0.0, 60.0, 120.0]:
        rows += [
            ("m", {"h": "a"}, ts, 10.0),
            ("m", {"h": "b"}, ts, 10.0),
            ("m", {"h": "c"}, ts, 7.5),
        ]
    return long_frame(spark, rows)


def run(spark, df, q):
    return run_query(spark, df, q, GRID)


def test_group_aggregator(spark):
    df = fixture(spark)
    out = run(spark, df, "group by (h) (m{})").collect()
    assert len(out) == 9 and all(r["value"] == 1.0 for r in out)
    bare = run(spark, df, "group(m{})").collect()
    assert len(bare) == 3 and all(dict(r["labels"]) == {} for r in bare)


def test_count_values(spark):
    df = fixture(spark)
    out = run(spark, df, 'count_values("v", m{})').collect()
    got = {(r["labels"]["v"], r["ts"]): r["value"] for r in out}
    # integral floats format without a decimal point, like the envelope
    assert got[("10", 0.0)] == 2.0
    assert got[("7.5", 0.0)] == 1.0
    by = run(spark, df, 'count_values by (h) ("v", m{})').collect()
    assert all(set(r["labels"].keys()) == {"h", "v"} for r in by)
    assert all(r["value"] == 1.0 for r in by)
    with pytest.raises(QueryError, match="string"):
        run(spark, df, "count_values(1, m{})")


def test_quantile_and_present_over_time(spark):
    df = fixture(spark)
    q = run(spark, df, "quantile_over_time(0.5, m{}[90])").collect()
    got = {(r["labels"]["h"], r["ts"]): r["value"] for r in q}
    assert got[("a", 60.0)] == 10.0  # two samples, both 10
    p = run(spark, df, "present_over_time(m{}[90])").collect()
    assert all(r["value"] == 1.0 for r in p) and len(p) == 9


def test_date_part_functions(spark):
    df = fixture(spark)
    # epoch 0 = Thursday 1970-01-01 (dow 4, 0-based Sunday), January
    dow = run(spark, df, "day_of_week(timestamp(m{}))").collect()
    assert {r["value"] for r in dow} == {4.0}
    dim = run(spark, df, "days_in_month(timestamp(m{}))").collect()
    assert {r["value"] for r in dim} == {31.0}
    # zero-arg default = vector(time()); minute advances with the grid
    mins = run(spark, df, "minute(time() + 120)").collect()
    assert {(r["ts"], r["value"]) for r in mins} == {(0.0, 2.0), (60.0, 3.0), (120.0, 4.0)}
    yr = run(spark, df, "year()").collect()
    assert all(r["value"] == 1970.0 for r in yr)


def test_trig_and_pi(spark):
    import math

    from prometheus_parquet_server_spark.plans.compiler import run_instant_query

    df = fixture(spark)
    out = run(spark, df, "sin(m{} * 0)").collect()
    assert all(r["value"] == 0.0 for r in out)
    k, v = run_instant_query(spark, df, "deg(pi())", at=0.0)
    assert k == "scalar" and v == 180.0
    k, v = run_instant_query(spark, df, "acos(2)", at=0.0)
    assert math.isnan(v)  # domain error → NaN, not an exception
    k, v = run_instant_query(spark, df, "tanh(0)", at=0.0)
    assert v == 0.0
    # inverse hyperbolics: golden values + IEEE edge semantics
    k, v = run_instant_query(spark, df, "asinh(0)", at=0.0)
    assert v == 0.0
    k, v = run_instant_query(spark, df, "acosh(1)", at=0.0)
    assert v == 0.0
    k, v = run_instant_query(spark, df, "acosh(0.5)", at=0.0)
    assert math.isnan(v)  # domain error → NaN
    k, v = run_instant_query(spark, df, "atanh(1)", at=0.0)
    assert v == float("inf")
    k, v = run_instant_query(spark, df, "asinh(1)", at=0.0)
    assert abs(v - math.asinh(1.0)) == 0.0


def test_absent_over_time(spark):
    df = fixture(spark)
    out = run(spark, df, 'absent_over_time(m{h="nope"}[90])').collect()
    assert len(out) == 3
    assert all(r["value"] == 1.0 and dict(r["labels"]) == {"h": "nope"} for r in out)
    assert run(spark, df, "absent_over_time(m{}[90])").count() == 0


def test_at_modifier(spark):
    from prometheus_parquet_server_spark.plans.parser import PromQLError

    df = fixture(spark)
    # pin to the grid end: every step shows the final interpolated value
    out = run(spark, df, 'm{h="a"} @ end()').collect()
    assert {(r["ts"], r["value"]) for r in out} == {
        (0.0, 10.0), (60.0, 10.0), (120.0, 10.0)
    }
    # fixed literal timestamp + canonical ratio-to-pinned-instant compose
    ratio = run(spark, df, 'm{h="a"} / on() group_left sum(m{h="a"} @ 120)').collect()
    assert all(r["value"] == 1.0 for r in ratio)  # constant series / itself
    # range-vector @ is honored by the consuming function (constant series);
    # constant-valued fixture → rate 0 at every step
    rate_at = run(spark, df, 'rate(m{h="a"}[60] @ 120)').collect()
    assert len(rate_at) == 3 and all(r["value"] == 0.0 for r in rate_at)
    # ...but without a consumer the anchor has nowhere to apply → error
    with pytest.raises(QueryError, match="function argument"):
        run(spark, df, "m{}[60] @ 120")
    with pytest.raises(PromQLError, match="duplicate"):
        run(spark, df, "m{} @ 120 @ 60")


def test_holt_winters(spark):
    """Hand-computed double exponential smoothing: samples [10,12,11,14],
    sf=0.3, tf=0.2 → s1 seeds 10, b seeds 2, final s1 = 14.644."""
    rows = [("m", {"h": "a"}, ts, v)
            for ts, v in [(10.0, 10.0), (20.0, 12.0), (30.0, 11.0), (40.0, 14.0)]]
    df = long_frame(spark, rows)
    grid = RegularTimeRange(0.0, 60.0, 60.0)
    out = run_query(spark, df, "holt_winters(m{}[60], 0.3, 0.2)", grid).collect()
    assert [(r["ts"], round(r["value"], 6)) for r in out] == [(60.0, 14.644)]
    # alias + <2-sample windows produce no point + factor validation
    alias = run_query(
        spark, df, "double_exponential_smoothing(m{}[60], 0.3, 0.2)", grid
    ).collect()
    assert [round(r["value"], 6) for r in alias] == [14.644]
    assert run_query(spark, df, "holt_winters(m{}[15], 0.3, 0.2)", grid).count() == 0
    with pytest.raises(QueryError, match="smoothing factors"):
        run_query(spark, df, "holt_winters(m{}[60], 1.5, 0.2)", grid)


def test_idelta_and_mad_over_time(spark):
    rows = [("m", {"h": "a"}, ts, v)
            for ts, v in [(10.0, 10.0), (20.0, 12.0), (30.0, 11.0), (40.0, 17.0)]]
    df = long_frame(spark, rows)
    grid = RegularTimeRange(0.0, 60.0, 60.0)
    out = run_query(spark, df, "idelta(m{}[60])", grid).collect()
    assert [(r["ts"], r["value"]) for r in out] == [(60.0, 6.0)]  # 17 − 11
    # <2-sample windows emit nothing
    assert run_query(spark, df, "idelta(m{}[15])", grid).count() == 0
    # values 10,12,11,17 → median 11.5, |dev| sorted [0.5,0.5,1.5,5.5] → 1.0
    mad = run_query(spark, df, "mad_over_time(m{}[60])", grid).collect()
    assert [(r["ts"], r["value"]) for r in mad] == [(60.0, 1.0)]
    # single-sample window → deviation 0
    one = run_query(spark, df, "mad_over_time(m{}[12])", grid).collect()
    assert all(r["value"] == 0.0 for r in one)


def test_quantile_over_time_phi_out_of_range(spark):
    """Prometheus parity: φ > 1 → +Inf per window, φ < 0 → −Inf (not a
    Spark percentage-range error)."""
    import math

    df = fixture(spark)
    hi = run(spark, df, "quantile_over_time(1.5, m{}[90])").collect()
    assert len(hi) == 9 and all(math.isinf(r["value"]) and r["value"] > 0 for r in hi)
    lo = run(spark, df, "quantile_over_time(-0.5, m{}[90])").collect()
    assert all(math.isinf(r["value"]) and r["value"] < 0 for r in lo)


def test_at_modifier_respects_time_offset(spark):
    """Literal @ timestamps are user-clock values: with shift-to-midnight
    the pin must shift like the grid bounds do."""
    rows = [("m", {"h": "a"}, ts, v) for ts, v in [(0.0, 1.0), (60.0, 2.0), (120.0, 3.0)]]
    df = long_frame(spark, rows)
    # grid axis shifted by 1000: user-time 1120 = engine-time 120
    grid = RegularTimeRange(1000.0, 1120.0, 60.0, time_offset=1000.0)
    out = run_query(spark, df, "m{} @ 1120", grid).collect()
    assert {r["value"] for r in out} == {3.0}


def test_sort_is_series_identity(spark):
    df = fixture(spark)
    plain = {(r["ts"], r["value"]) for r in run(spark, df, "sum(m{})").collect()}
    srt = {(r["ts"], r["value"]) for r in run(spark, df, "sort_desc(sum(m{}))").collect()}
    assert plain == srt
