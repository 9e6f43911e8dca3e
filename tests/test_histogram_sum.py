"""histogram_quantile + sum parity (reference src/query.rs:259-356, 439-546)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from prometheus_parquet_server_spark.operators.aggregate import sum_over_series
from prometheus_parquet_server_spark.operators.histogram import histogram_quantile
from tests.conftest import assert_close, long_frame


def bucket_rows(ts, counts, timing="t1"):
    les = ["0.1", "0.5", "2.5", "+Inf"]
    return [
        ("m_bucket", {"Le": le, "timing": timing}, ts, c)
        for le, c in zip(les, counts)
    ]


def test_quantile_interpolates_within_bucket(spark):
    df = long_frame(spark, bucket_rows(100.0, [1.0, 3.0, 4.0, 4.0]))
    out = histogram_quantile(df, 0.5).collect()
    # cutoff = 2; first bucket cnt=1 < 2; second cnt=3 ≥ 2
    # q = 0.5 - (0.5-0.1)*(3-2)/(3-1) = 0.3
    assert len(out) == 1
    assert_close(out[0]["value"], 0.3)
    assert out[0]["labels"] == {"timing": "t1"}


def test_quantile_first_bucket_implicit_zero(spark):
    df = long_frame(spark, bucket_rows(100.0, [4.0, 4.0, 4.0, 4.0]))
    out = histogram_quantile(df, 0.5).collect()
    # cutoff=2, first bucket qualifies: q = 0.1 - (0.1-0)*(4-2)/(4-0) = 0.05
    assert_close(out[0]["value"], 0.05)


def test_quantile_cutoff_above_all_finite(spark):
    df = long_frame(spark, bucket_rows(100.0, [1.0, 3.0, 3.9, 4.0]))
    out = histogram_quantile(df, 1.0).collect()
    # cutoff=4 > every finite count → highest finite le
    assert_close(out[0]["value"], 2.5)


def test_quantile_groups_by_non_le_labels(spark):
    rows = bucket_rows(100.0, [1.0, 3.0, 4.0, 4.0], "a") + bucket_rows(
        100.0, [4.0, 4.0, 4.0, 4.0], "b"
    )
    df = long_frame(spark, rows)
    out = {r["labels"]["timing"]: r["value"] for r in histogram_quantile(df, 0.5).collect()}
    assert_close(out["a"], 0.3)
    assert_close(out["b"], 0.05)


def test_quantile_skips_series_without_le(spark):
    rows = bucket_rows(100.0, [1.0, 3.0, 4.0, 4.0]) + [
        ("m_sum", {"timing": "t1"}, 100.0, 99.0)
    ]
    df = long_frame(spark, rows)
    out = histogram_quantile(df, 0.5).collect()
    assert len(out) == 1
    assert_close(out[0]["value"], 0.3)


def test_quantile_missing_inf_bucket_errors(spark):
    rows = [
        ("m_bucket", {"Le": "0.1"}, 100.0, 1.0),
        ("m_bucket", {"Le": "0.5"}, 100.0, 3.0),
    ]
    df = long_frame(spark, rows)
    with pytest.raises(Exception, match="Inf bucket has finite value"):
        histogram_quantile(df, 0.5).collect()


def test_sum_by_retains_listed_labels(spark):
    rows = [
        ("m", {"le": "a", "host": "h1"}, 1.0, 1.0),
        ("m", {"le": "a", "host": "h2"}, 1.0, 2.0),
        ("m", {"le": "b", "host": "h1"}, 1.0, 5.0),
    ]
    out = sum_over_series(long_frame(spark, rows), by=["le", "nosuchlabel"]).collect()
    got = {r["labels"]["le"]: (r["name"], r["value"]) for r in out}
    assert got["a"] == (None, 3.0)
    assert got["b"] == (None, 5.0)  # group of one passes through


def test_sum_nan_poisons_group(spark):
    rows = [
        ("m", {"le": "a"}, 1.0, 1.0),
        ("m", {"le": "a", "host": "x"}, 1.0, float("nan")),
    ]
    out = sum_over_series(long_frame(spark, rows), by=["le"]).collect()
    assert math.isnan(out[0]["value"])


def test_sum_without_and_bare(spark):
    rows = [
        ("m", {"le": "a", "host": "h1"}, 1.0, 1.0),
        ("m", {"le": "b", "host": "h1"}, 1.0, 2.0),
        ("m", {"le": "b", "host": "h2"}, 2.0, 4.0),
    ]
    df = long_frame(spark, rows)
    wo = sum_over_series(df, without=["le"]).collect()
    got = {(r["labels"]["host"], r["ts"]): r["value"] for r in wo}
    assert got[("h1", 1.0)] == 3.0
    assert got[("h2", 2.0)] == 4.0
    bare = sum_over_series(df).collect()
    got = {r["ts"]: r["value"] for r in bare}
    assert got[1.0] == 3.0 and got[2.0] == 4.0
    assert all(r["name"] is None and r["labels"] == {} for r in bare)
