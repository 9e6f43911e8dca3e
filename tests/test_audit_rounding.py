"""The rounding-boundary audit's SQL rewriter is load-bearing (it decides
which graded oracles are in the flake class) — pin its parsing."""

import sys

sys.path.insert(0, "scripts")

from audit_rounding import _boundary_dist, _find_rounds, _strip_rounds  # noqa: E402


def test_find_rounds_balanced_and_nested():
    sql = "SELECT ROUND(SUM(a), 6) AS x, ROUND(ROUND(SUM(f(b, c)), 6) / n, 2) AS y"
    spans = _find_rounds(sql)
    exprs = [(e.strip(), k) for (_, _, e, k) in spans]
    assert ("SUM(a)", 6) in exprs
    # outer of the nested pair: expr contains the inner ROUND, k=2
    assert any(k == 2 and e.startswith("ROUND(") for e, k in exprs)
    assert ("SUM(f(b, c))", 6) in exprs


def test_strip_rounds_targets_float_aggs_only():
    sql = (
        "SELECT ROUND(SUM(v), 6) AS a, ROUND(x + 1, 6) AS b, "
        "ROUND(SUM(CAST(v AS DECIMAL(38, 9))), 6) AS c"
    )
    out, digits = _strip_rounds(sql)
    assert digits == {6}
    assert "ROUND(SUM(v), 6)" not in out            # float agg stripped
    assert "ROUND(x + 1, 6)" in out                 # per-row round kept
    assert "DECIMAL" in out and "ROUND(SUM(CAST" in out  # decimal agg kept


def test_strip_rounds_unwraps_nested():
    sql = "SELECT ROUND(ROUND(SUM(v), 6) / COUNT(*), 6) AS avg_v"
    out, digits = _strip_rounds(sql)
    assert "ROUND" not in out
    assert digits == {6}


def test_boundary_dist():
    assert _boundary_dist(1.0000005, 6) < 1e-12     # exactly on the grid mid
    assert _boundary_dist(1.0000004, 6) > 5e-8      # well clear
    assert _boundary_dist(1e20, 6) == float("inf")  # beyond ulp resolution


def test_hq_sum_rate_boundary_floor():
    """hq_sum_rate is the ONLY graded row still riding ROUND over a float
    pipeline (quantile interpolation creates new tie classes, handled by
    the +1e-9 nudge in q_hq_sum_rate / SQL_HQ_SUM_RATE). The generic audit
    skips its ROUND (the rounded expr carries no aggregate token), so pin
    the floor here: run the UNROUNDED oracle at sf0.01 and assert every
    value clears its 6-dp rounding boundary by at least half the nudge.
    A fixture or code change that parks a value within ulp drift of a
    boundary fails THIS test instead of flaking the driver gate. Measured
    r9: min dist 9.999e-10 over 672 rows (the exact-tie population moved
    1e-9 off the boundary by the nudge, as designed)."""
    import math
    import os

    import duckdb
    import pytest

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 testdata not present")
    from prometheus_parquet_server_spark.driver_contract import ORACLES

    sql = ORACLES["hq_sum_rate"]
    spans = _find_rounds(sql)
    assert len(spans) == 1 and spans[0][3] == 6, (
        "hq_sum_rate oracle no longer has exactly one ROUND(..., 6) — "
        "update this audit alongside the contract change"
    )
    start, end, expr, _k = spans[0]
    raw = sql[:start] + "(" + expr + ")" + sql[end:]
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(raw).fetchall()
    assert len(rows) > 500  # fixture sanity: the full grid is populated
    dists = [
        _boundary_dist(v, 6)
        for _, v in rows
        if isinstance(v, float) and math.isfinite(v)
    ]
    assert min(dists) >= 5e-10, (
        f"hq_sum_rate min 6-dp boundary distance {min(dists):.3e} fell "
        f"below the pinned floor 5e-10 — a value now sits close enough to "
        f"a rounding boundary that cross-engine ulp drift could flip the "
        f"graded digit"
    )
