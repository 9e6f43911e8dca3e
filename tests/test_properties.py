"""Property-based tests (hypothesis) for the numeric core."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_parquet_server_spark.durations import parse_duration
from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.interpolate import interpolate_at_probes
from prometheus_parquet_server_spark.sources.store import shift_to_midnight_offset
from tests.conftest import long_frame


@given(
    h=st.integers(0, 99),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
    ms=st.integers(0, 999),
)
def test_duration_compose(h, m, s, ms):
    text = f"{h}h{m}m{s}s{ms}ms"
    assert parse_duration(text) == pytest.approx(h * 3600 + m * 60 + s + ms / 1000.0)


@given(
    start=st.floats(0, 1e9, allow_nan=False),
    steps=st.floats(0.0, 1000.0, allow_nan=False),
    step=st.floats(0.001, 1e5, allow_nan=False),
)
def test_grid_len_invariants(start, steps, step):
    span = steps * step  # bounded point count — instants() materializes
    g = RegularTimeRange(start, start + span, step)
    n = len(g)
    assert 1 <= n <= steps + 2
    inst = g.instants()
    assert len(inst) == n
    assert inst[0] == g.start
    # reference formula: never more than one step past end
    if n > 1:
        assert inst[-1] <= g.end + step


@settings(max_examples=15, deadline=None)
@given(
    # integer-separated timestamps: with ulp-adjacent samples np.interp's
    # slope form overflows to ±inf while the reference's weighted form stays
    # finite — both are "correct", so the property only holds away from
    # degenerate spacing
    data=st.lists(
        st.tuples(st.integers(0, 10000).map(float), st.floats(-100, 100)),
        min_size=2,
        max_size=12,
        unique_by=lambda tv: tv[0],
    ),
    probes=st.lists(st.floats(-100, 1.1e4), min_size=1, max_size=6),
)
def test_interpolation_matches_numpy_inside_range(spark, data, probes):
    """Inside the data range the reference's interpolation IS np.interp;
    outside it clamps to the boundary values (also np.interp behavior)."""
    data = sorted(data)
    ts = [t for t, _ in data]
    vs = [v for _, v in data]
    samples = long_frame(spark, [("m", {}, t, v) for t, v in data])
    probe_df = spark.createDataFrame([("m", float(p)) for p in probes], "name string, _pt double")
    out = interpolate_at_probes(samples, probe_df, ["name"])
    got = {r["_pt"]: r["value"] for r in out.collect()}
    for p in probes:
        expect = float(np.interp(p, ts, vs))
        assert got[float(p)] == pytest.approx(expect, rel=1e-9, abs=1e-9)


def test_midnight_offset(spark):
    df = long_frame(spark, [("m", {}, 1000.0, 1.0), ("m", {}, 2000.0, 2.0)])
    off = shift_to_midnight_offset(df, now=1704100000.0)  # 2024-01-01 UTC-ish
    # offset + min_ts lands exactly on a local midnight
    import time as _time

    shifted = _time.localtime(off + 1000.0)
    assert (shifted.tm_hour, shifted.tm_min, shifted.tm_sec) == (0, 0, 0)
