"""asof_join: directions, ties, tolerance, no-match nulls, payload carry."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 10.0, "b"), (1, 2.0, "c"), (2, 3.0, "d")],
        "k long, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4.0, 100.0), (1, 10.0, 200.0), (3, 1.0, 9.0)],
        "k long, ts double, value double",
    )
    return left, right


def _rows(df):
    return {
        (r["k"], r["ts"]): (r["tag"], r["value_asof"], r["ts_asof"])
        for r in df.collect()
    }


def test_backward_with_ties_and_nulls(frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="ts", by=("k",)))
    assert got[(1, 5.0)] == ("a", 100.0, 4.0)
    # exact-timestamp right row is taken (>= semantics, DuckDB ASOF parity)
    assert got[(1, 10.0)] == ("b", 200.0, 10.0)
    # left row before every right row → null match
    assert got[(1, 2.0)] == ("c", None, None)
    # key with no right rows at all → null match
    assert got[(2, 3.0)] == ("d", None, None)


def test_forward(frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="ts", by=("k",), direction="forward"))
    assert got[(1, 2.0)] == ("c", 100.0, 4.0)
    assert got[(1, 5.0)] == ("a", 200.0, 10.0)
    assert got[(1, 10.0)] == ("b", 200.0, 10.0)
    assert got[(2, 3.0)] == ("d", None, None)


def test_tolerance_nulls_stale_matches(frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="ts", by=("k",), tolerance=0.5))
    # gap 1.0 > 0.5 → nulled; exact match (gap 0) survives
    assert got[(1, 5.0)] == ("a", None, None)
    assert got[(1, 10.0)] == ("b", 200.0, 10.0)


def test_multiple_right_cols(spark):
    left = spark.createDataFrame([(1, 5.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 4.0, 10.0, "x")], "k long, ts double, v double, s string"
    )
    r = asof_join(left, right, on="ts", by=("k",), right_cols=("v", "s")).collect()[0]
    assert (r["v_asof"], r["s_asof"], r["ts_asof"]) == (10.0, "x", 4.0)


def test_bad_args(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right, tolerance=-1.0)


def test_asof_plan_single_exchange(spark, frames):
    """The scale contract: asof_join is ONE hash exchange on the by keys
    (the window's), regardless of carried columns — never a
    row-duplicating join plan."""
    left, right = frames
    df = asof_join(left, right, on="ts", by=("k",), right_cols=("value",))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_null_timestamps_match_nothing(spark):
    """NULL ts on either side must never produce a match (DuckDB ASOF
    parity) — regression for the NULL-sorts-first/last leak."""
    left = spark.createDataFrame(
        [(1, 5.0, "a"), (1, None, "b")], "k long, ts double, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 9.0), (1, 4.0, 100.0)], "k long, ts double, value double"
    )
    for direction in ("backward", "forward"):
        got = {
            r["tag"]: (r["value_asof"], r["ts_asof"])
            for r in asof_join(
                left, right, on="ts", by=("k",), direction=direction
            ).collect()
        }
        # NULL-ts left row matches nothing in either direction
        assert got["b"] == (None, None), direction
        # NULL-ts right row never supplies a value
        if direction == "backward":
            assert got["a"] == (100.0, 4.0)
        else:
            assert got["a"] == (None, None)


def test_output_name_clash_rejected(spark):
    left = spark.createDataFrame([(1, 5.0, 1.0)], "k long, ts double, value_asof double")
    right = spark.createDataFrame([(1, 4.0, 2.0)], "k long, ts double, value double")
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on="ts", by=("k",))


def test_null_payload_value_keeps_row_identity(spark):
    """A right row whose VALUE is NULL is still the as-of match — its NULL
    must be returned (DuckDB ASOF parity), not an older row's value paired
    with the newer timestamp."""
    left = spark.createDataFrame([(1, 3.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 1.0, 10.0), (1, 2.0, None)], "k long, ts double, value double"
    )
    r = asof_join(left, right, on="ts", by=("k",)).collect()[0]
    assert r["ts_asof"] == 2.0 and r["value_asof"] is None
    # and with tolerance 1.5 the (NULL, 2.0) match is within range
    r2 = asof_join(left, right, on="ts", by=("k",), tolerance=1.5).collect()[0]
    assert r2["ts_asof"] == 2.0 and r2["value_asof"] is None


def test_self_clashing_output_names_rejected(spark):
    left = spark.createDataFrame([(1, 5.0)], "k long, ts double")
    right = spark.createDataFrame([(1, 4.0, 2.0)], "k long, ts double, value double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="ts", by=("k",), right_cols=("ts", "value"))


def test_null_by_keys_match_nothing(spark):
    """DuckDB ASOF equality `l.k = r.k` is never true for NULL keys, but
    Window.partitionBy groups NULLs into one partition — NULL-keyed left
    rows must come back unmatched, not matched to NULL-keyed right rows
    (ADVICE r5)."""
    l = spark.createDataFrame(
        [(None, 5.0, 1.0), (1, 5.0, 2.0)], "k int, ts double, lv double"
    )
    r = spark.createDataFrame(
        [(None, 1.0, 9.0), (1, 1.0, 8.0)], "k int, ts double, value double"
    )
    rows = {row["lv"]: row["value_asof"] for row in asof_join(l, r, by=("k",)).collect()}
    assert rows[1.0] is None  # NULL key: no match even though a NULL-keyed right row exists
    assert rows[2.0] == 8.0


def test_chunked_asof_matches_unchunked(spark):
    """chunk_s is pure partitioning: results identical to the single-window
    path for ANY chunk width, both directions, with tolerance, NULLs and
    boundary-exact timestamps."""
    import random

    rnd = random.Random(7)
    lrows = [(rnd.randrange(3), float(rnd.randrange(0, 1000)), float(i))
             for i in range(300)]
    # include boundary-exact and NULL-ts rows
    lrows += [(0, 100.0, 991.0), (1, None, 992.0), (None, 50.0, 993.0)]
    rrows = [(rnd.randrange(3), float(rnd.randrange(0, 1000)) + 0.5, float(i))
             for i in range(150)]
    rrows += [(0, 100.0, 777.0), (2, None, 778.0), (None, 40.0, 779.0)]
    l = spark.createDataFrame(lrows, "k int, ts double, lv double")
    r = spark.createDataFrame(rrows, "k int, ts double, value double")

    def key(df):
        rows = [
            (row["k"], row["ts"], row["lv"], row["value_asof"], row["ts_asof"])
            for row in df.collect()
        ]
        return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))

    for direction in ("backward", "forward"):
        for tol in (None, 75.0):
            base = key(asof_join(l, r, by=("k",), direction=direction, tolerance=tol))
            for chunk in (10.0, 100.0, 250.0, 10000.0):
                got = key(
                    asof_join(
                        l, r, by=("k",), direction=direction,
                        tolerance=tol, chunk_s=chunk,
                    )
                )
                assert got == base, f"{direction} tol={tol} chunk={chunk}"


def test_chunked_asof_partitions_on_chunk(spark):
    """The skew contract: the main window's exchange must key on the time
    chunk too, so one hot key cannot serialize into a single task."""
    l = spark.createDataFrame([(1, 5.0, 1.0)], "k int, ts double, lv double")
    r = spark.createDataFrame([(1, 1.0, 9.0)], "k int, ts double, value double")
    df = asof_join(l, r, by=("k",), chunk_s=60.0)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "_chunk" in plan
    with pytest.raises(ValueError, match="chunk_s"):
        asof_join(l, r, by=("k",), chunk_s=0.0)
