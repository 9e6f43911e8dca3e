"""rate/irate parity (reference src/timeseries.rs:104-161)."""

from pyspark.sql import functions as F

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.rate import irate_to_grid, rate_to_grid
from tests.conftest import assert_close, long_frame

NAN = float("nan")
INC = [("m", {}, 100.0, 1.0), ("m", {}, 115.0, 2.0), ("m", {}, 120.0, 3.0)]
DEC = [("m", {}, 100.0, 3.0), ("m", {}, 115.0, 2.0), ("m", {}, 120.0, 1.0)]


def _run(spark, rows, fn, grid_pts, r, offset=0.0):
    samples = long_frame(spark, rows)
    grid = spark.createDataFrame([(float(t),) for t in grid_pts], "gts double")
    out = fn(samples, grid, series_cols=["name"], over_range=r, offset=offset)
    return {row["ts"]: row["value"] for row in out.collect()}


def test_rate_basic(spark):
    got = _run(spark, INC, rate_to_grid, [116.0], 10.0)
    # (interp(116) - interp(106)) / 10 = (2.2 - 1.4) / 10
    assert_close(got[116.0], 0.08)


def test_rate_clamped_outside(spark):
    got = _run(spark, INC, rate_to_grid, [90.0, 140.0, 125.0], 10.0)
    assert_close(got[90.0], 0.0)    # both endpoints clamp to first value
    assert_close(got[140.0], 0.0)   # both clamp to last
    # interp(125)=3 (clamp), interp(115)=2 → 0.1
    assert_close(got[125.0], 0.1)


def test_rate_linear_counter_is_slope(spark):
    rows = [("m", {}, float(t), 2.0 * t) for t in range(0, 200, 7)]
    got = _run(spark, rows, rate_to_grid, [50.0, 101.0, 150.0], 30.0)
    for t in got:
        assert_close(got[t], 2.0, tol=1e-9)


def test_rate_zero_range_nan(spark):
    got = _run(spark, INC, rate_to_grid, [116.0], 0.0)
    assert_close(got[116.0], NAN)


def test_rate_with_offset(spark):
    got = _run(spark, INC, rate_to_grid, [126.0], 10.0, offset=10.0)
    assert_close(got[126.0], 0.08)  # same as rate at 116


def test_irate_first_interval_increasing_is_nan(spark):
    # reference quirk: i==0 → delta_v = v[0]-v[1] < 0 → NaN (timeseries.rs:135-144)
    got = _run(spark, INC, irate_to_grid, [110.0], 300.0)
    assert_close(got[110.0], NAN)


def test_irate_first_interval_decreasing(spark):
    got = _run(spark, DEC, irate_to_grid, [110.0], 300.0)
    assert_close(got[110.0], (3.0 - 2.0) / 15.0)


def test_irate_general_case(spark):
    # t=116 in (115,120): swapped-weight interp = ((116-115)*2 + (120-116)*3)/5 = 2.8
    # dv = 2.8 - v[0]=1 → 1.8 ; dt = 116-100 = 16
    got = _run(spark, INC, irate_to_grid, [116.0], 300.0)
    assert_close(got[116.0], 1.8 / 16.0)


def test_irate_outside_range_nan(spark):
    got = _run(spark, INC, irate_to_grid, [99.0, 120.0, 130.0], 300.0)
    assert_close(got[99.0], NAN)    # Below
    assert_close(got[120.0], NAN)   # ts[last] <= t → Above
    assert_close(got[130.0], NAN)


def test_irate_negative_delta_nan(spark):
    # general case with decreasing series → dv < 0 → NaN
    got = _run(spark, DEC, irate_to_grid, [116.0], 300.0)
    assert_close(got[116.0], NAN)


def test_irate_slot_path_matches_window_path(spark):
    """The sort-free slot-explode irate must be value-identical (NaN-aware)
    to the union+window as-of path on irregular random series."""
    import math
    import random

    random.seed(7)
    rows = []
    for s in range(25):
        ts = sorted(random.sample(range(0, 2000), random.randint(1, 30)))
        for t in ts:
            rows.append((f"s{s}", float(t), random.uniform(-5, 50)))
    df = spark.createDataFrame(rows, "k string, ts double, value double")
    grid = RegularTimeRange(13.0, 1987.0, 21.0)
    gdf = grid.to_df(spark)
    slow = irate_to_grid(df, gdf, series_cols=["k"], over_range=60.0)
    fast = irate_to_grid(df, gdf, series_cols=["k"], over_range=60.0, grid=grid)
    a = {(r["k"], r["ts"]): r["value"] for r in slow.collect()}
    b = {(r["k"], r["ts"]): r["value"] for r in fast.collect()}
    assert set(a) == set(b)
    for key in a:
        x, y = a[key], b[key]
        if math.isnan(x):
            assert math.isnan(y), (key, x, y)
        else:
            assert x == y, (key, x, y)


def test_chunked_irate_bit_identical(spark):
    """_irate_slots(chunk_s=...) must match the uniform slot path bit for
    bit for any chunk width — including the two-sample carry-in across
    empty chunks (tp/vp from the previous non-empty chunk's LAST sample)
    and the first-interval / Below / Above NaN arms."""
    from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
    from prometheus_parquet_server_spark.operators.rate import irate_to_grid

    rows = (
        [("a", 10.0 + 500.0 * i, float((i * 7) % 13)) for i in range(8)]
        + [("b", 1000.0 + 3.0 * i, 7.0 + i) for i in range(5)]
        + [("c", 1700.0, 42.0)]  # single sample: all NaN
        + [("d", 100.0, 1.0), ("d", 130.0, None), ("d", 900.0, 5.0)]  # NULL value pair integrity
    )
    df = spark.createDataFrame(rows, "sid string, ts double, value double")
    grid = RegularTimeRange(0.0, 3600.0, 90.0)
    gdf = grid.to_df(spark)

    def got(**kw):
        out = irate_to_grid(
            df, gdf, series_cols=["sid"], over_range=300.0, grid=grid, **kw
        )
        return sorted((r["sid"], r["ts"], repr(r["value"])) for r in out.collect())

    base = got()
    for cs in (60.0, 777.0, 5000.0):
        assert got(chunk_s=cs) == base, f"chunk_s={cs} diverged"
    assert got(offset=120.0, chunk_s=60.0) == got(offset=120.0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="chunk_s"):
        irate_to_grid(df, gdf, series_cols=["sid"], over_range=300.0, grid=grid, chunk_s=0.0)
    with _pytest.raises(ValueError, match="slot path"):
        irate_to_grid(df, gdf, series_cols=["sid"], over_range=300.0, chunk_s=60.0)
