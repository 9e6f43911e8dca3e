"""range_join: containment semantics, bucket-width invariance, plan shape."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 5.0, "p1"), (1, 10.0, "p2"), (1, 20.0, "p3"), (2, 5.0, "p4")],
        "k long, ts double, name string",
    )
    intervals = spark.createDataFrame(
        [
            (1, 4.0, 10.0, "i1"),   # catches p1 and (inclusively) p2
            (1, 9.0, 25.0, "i2"),   # catches p2, p3
            (2, 6.0, 7.0, "i3"),    # catches nothing
            (1, 8.0, 3.0, "i4"),    # end < start → matches nothing
            (1, None, 9.0, "i5"),   # NULL bound → matches nothing
        ],
        "k long, start double, end double, iname string",
    )
    return points, intervals


def _pairs(df):
    return sorted((r["name"], r["iname"]) for r in df.collect())


def test_containment_and_edge_intervals(frames):
    points, intervals = frames
    got = _pairs(range_join(points, intervals, by=("k",), bucket_width=4.0))
    assert got == [("p1", "i1"), ("p2", "i1"), ("p2", "i2"), ("p3", "i2")]


def test_exclusive_end(frames):
    points, intervals = frames
    got = _pairs(
        range_join(
            points, intervals, by=("k",), bucket_width=4.0, inclusive_end=False
        )
    )
    assert got == [("p1", "i1"), ("p2", "i2"), ("p3", "i2")]


def test_bucket_width_invariance(frames):
    """The result must be identical for any bucket width — width only
    moves cost, never correctness."""
    points, intervals = frames
    expected = _pairs(range_join(points, intervals, by=("k",), bucket_width=4.0))
    for w in (0.5, 3.0, 100.0):
        assert _pairs(range_join(points, intervals, by=("k",), bucket_width=w)) == expected


def test_column_clash_and_bad_width(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(points, intervals, by=("k",), bucket_width=0)
    with pytest.raises(ValueError, match="clash"):
        range_join(
            points,
            intervals.withColumnRenamed("iname", "name"),
            by=("k",),
        )


def test_plan_has_no_nested_loop(spark, frames):
    points, intervals = frames
    df = range_join(points, intervals, by=("k",), bucket_width=4.0)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_huge_span_raises_instead_of_oom(spark, frames):
    """A FINITE interval spanning more buckets than
    max_buckets_per_interval (a bucket_width far below the interval scale)
    must fail with a clear error, not materialize billions of bucket
    elements (ADVICE r5); a non-finite sentinel bound is a silent
    no-match like NULL/NaN, not an abort."""
    points, _ = frames
    iv = spark.createDataFrame(
        [(1, 0.0, 1e18, "sentinel")], "k int, start double, end double, iname string"
    )
    with pytest.raises(Exception, match="spans too many buckets"):
        range_join(points, iv, by=("k",), bucket_width=1.0).count()
    inf = spark.createDataFrame(
        [(1, 0.0, float("inf"), "inf"), (1, float("-inf"), 20.0, "ninf")],
        "k int, start double, end double, iname string",
    )
    assert range_join(points, inf, by=("k",), bucket_width=1.0).count() == 0


def test_nan_bounds_match_nothing(spark, frames):
    points, _ = frames
    iv = spark.createDataFrame(
        [(1, float("nan"), 20.0, "n1"), (1, 0.0, float("nan"), "n2")],
        "k int, start double, end double, iname string",
    )
    assert range_join(points, iv, by=("k",), bucket_width=4.0).count() == 0
