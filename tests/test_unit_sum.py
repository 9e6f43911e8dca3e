"""The round-8 graded-sum contract (operators/aggregate.unit_sum and its
DuckDB twin driver_contract._sql_unit_sum): bit-stability across engines,
partitioning invariance, and the guard arms."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.driver_contract import _sql_unit_sum
from prometheus_parquet_server_spark.operators.aggregate import (
    LONG_SAFE,
    unit_avg,
    unit_sum,
)

pytestmark = pytest.mark.usefixtures("spark")


def _spark_sum(spark, rows, **kw):
    df = spark.createDataFrame([(g, v) for g, v in rows], "g string, v double")
    out = df.groupBy("g").agg(unit_sum("v", **kw).alias("s")).collect()
    return {r["g"]: r["s"] for r in out}


def _duck_sum(rows, scale=1e6, guarded=True):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(rows))
    sql = f"SELECT g, {_sql_unit_sum('v', scale, guarded=guarded)} AS s FROM t GROUP BY g"
    return dict(con.execute(sql).fetchall())


def _same(a, b):
    assert set(a) == set(b)
    for k in a:
        x, y = a[k], b[k]
        if x is None or y is None:
            assert x is y, (k, x, y)
        elif math.isnan(x) or math.isnan(y):
            assert math.isnan(x) and math.isnan(y), (k, x, y)
        else:
            assert x == y and repr(x) == repr(y), (k, x, y)


def test_engine_oracle_bit_parity_clean_and_dirty(spark):
    rows = [
        ("a", 1.25), ("a", 2.3333333), ("a", -0.0000005),
        ("b", float("nan")), ("b", 1.0),          # NaN poisons b
        ("c", None), ("c", 4.125),                 # NULL skipped
        ("d", None), ("d", None),                  # all-NULL -> NULL
        ("e", float("inf")),                       # Inf poisons e
        ("f", LONG_SAFE / 1e6 * 2),                # huge finite poisons f
    ]
    _same(_spark_sum(spark, rows), _duck_sum(rows))


def test_poison_semantics(spark):
    out = _spark_sum(spark, [("x", float("nan")), ("x", 5.0)])
    assert math.isnan(out["x"])
    out = _spark_sum(spark, [("x", None), ("x", None)])
    assert out["x"] is None


def test_unguarded_matches_guarded_on_finite(spark):
    rows = [("a", 1.005), ("a", 2.115), ("b", -3.25)]
    g = _spark_sum(spark, rows)
    u = _spark_sum(spark, rows, guarded=False)
    _same(g, u)
    _same(u, _duck_sum(rows, guarded=False))


def test_partitioning_invariance(spark):
    """The whole point: the sum is a pure function of the value multiset,
    identical bits under any partitioning / evaluation order."""
    import random

    rnd = random.Random(7)
    rows = [("k", rnd.uniform(-100, 100)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    vals = set()
    for parts in (1, 7, 32):
        out = (
            df.repartition(parts)
            .groupBy("g")
            .agg(unit_sum("v").alias("s"))
            .first()["s"]
        )
        vals.add(repr(out))
    assert len(vals) == 1, vals


def test_unit_avg_is_sum_over_count(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("a", None)], "g string, v double"
    )
    row = df.groupBy("g").agg(
        unit_avg("v").alias("m"), unit_sum("v").alias("s")
    ).first()
    assert row["m"] == row["s"] / 2  # count skips the NULL


def test_quantization_contract(spark):
    """Sum of per-row-rounded units, NOT rounded sum — pinned so nobody
    'fixes' it into the version-sensitive shape again."""
    rows = [("a", 0.0000004), ("a", 0.0000004)]
    out = _spark_sum(spark, rows)
    assert out["a"] == 0.0  # each row floors to 0 units before the sum
    _same(out, _duck_sum(rows))


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vals = st.lists(
    st.one_of(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        st.just(float("nan")),
        st.none(),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(vals=_vals, parts=st.integers(1, 8), groups=st.integers(1, 3))
def test_property_engine_oracle_bit_parity(spark, vals, parts, groups):
    """For ANY mix of finite values, NaNs and NULLs, any group split and
    any partitioning, the Spark unit_sum and the DuckDB _sql_unit_sum
    twin produce bit-identical per-group results."""
    rows = [(f"g{i % groups}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(parts)
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(unit_sum("v").alias("s")).collect()
    }
    _same(got, _duck_sum(rows))
