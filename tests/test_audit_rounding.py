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
