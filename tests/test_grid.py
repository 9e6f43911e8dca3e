"""Grid construction parity (reference src/timevectors.rs:377-418)."""

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange


def test_len_boundary_cases():
    # pinned by src/timevectors.rs:401-418
    assert len(RegularTimeRange(1.0, 1.9, 1.0)) == 1
    assert len(RegularTimeRange(1.0, 2.0, 1.0)) == 2
    assert len(RegularTimeRange(0.0, 10.0, 3.0)) == 4  # floor((10+3)/3)=4
    assert len(RegularTimeRange(5.0, 5.0, 1.0)) == 1


def test_instants_formula():
    g = RegularTimeRange(100.0, 130.0, 15.0)
    assert g.instants() == [100.0, 115.0, 130.0]


def test_offset_subtracted_at_construction():
    # src/timevectors.rs:184-188: shift-to-midnight offset
    g = RegularTimeRange(100.0, 130.0, 15.0, time_offset=50.0)
    assert g.instants() == [50.0, 65.0, 80.0]


def test_bad_args_rejected():
    with pytest.raises(ValueError):
        RegularTimeRange(0.0, 10.0, 0.0)
    with pytest.raises(ValueError):
        RegularTimeRange(0.0, 10.0, -1.0)
    with pytest.raises(ValueError):
        RegularTimeRange(10.0, 0.0, 1.0)


def test_to_df_matches_instants(spark):
    g = RegularTimeRange(1704067200.0, 1704074200.0, 15.0)
    vals = [r[0] for r in g.to_df(spark).collect()]
    assert vals == g.instants()
    assert len(vals) == 467
