#!/usr/bin/env python
"""Rounding-boundary flake audit for the graded oracle rows.

The flake class (seen on events_sessionize in the round-6 driver run): a
graded hash passes through ``ROUND(<order-dependent float aggregate>, k)``
and the aggregate's true value sits within ~1 ulp of a k-dp rounding
boundary — Spark's partial-sum order then decides the rounded digit and the
hash flips run-to-run even though both engines are "correct".

This audit finds every such exposure BEFORE it flakes: for each graded
query whose oracle contains ``ROUND(<agg>, k)`` over a float aggregate
(SUM/AVG/STDDEV/VAR/...), it rewrites the rounding away (balanced-paren
rewrite, nested ROUNDs handled), re-runs the UNROUNDED oracle on DuckDB,
and measures how close every unrounded float lands to its k-dp boundary.

A value v is "near" the boundary when::

    dist = |frac(v * 10^k) - 0.5| / 10^k        (distance in value units)
    dist < max(|v| * REL_TOL, ABS_TOL)          -> FLAG

REL_TOL = 1e-12 (~4500 double ulps) is far wider than any realistic
partial-sum reordering error, so a clean report means the dataset cannot
flip a digit no matter how Spark schedules the shuffle. Flagged queries
must convert the aggregate to an exact DECIMAL(38,9) sum on BOTH sides
(the events_sessionize fix, streaming/sessions.py).

Aggregates already summed as DECIMAL are skipped (exact, order-free).

Usage: python scripts/audit_rounding.py [sf_dir] [query ...]
Exit 1 if any graded row is flagged.
"""

from __future__ import annotations

import math
import re
import sys

sys.path.insert(0, ".")

import duckdb

from prometheus_parquet_server_spark.driver_contract import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

REL_TOL = 1e-12
ABS_TOL = 1e-15

FLOAT_AGGS = re.compile(
    r"\b(SUM|AVG|MEAN|STDDEV|STDDEV_POP|STDDEV_SAMP|VARIANCE|VAR_POP|"
    r"VAR_SAMP|COVAR_POP|COVAR_SAMP|CORR)\s*\(",
    re.IGNORECASE,
)


def _find_rounds(sql: str) -> list[tuple[int, int, str, int]]:
    """All ROUND(expr, k) spans as (start, end_exclusive, inner_expr, k),
    outermost-first, with balanced-paren extraction."""
    out = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.IGNORECASE):
        depth = 1
        i = m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            continue
        body = sql[m.end() : i - 1]
        # split on the LAST top-level comma (expr may contain commas)
        depth2, split = 0, -1
        for j, ch in enumerate(body):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                split = j
        if split < 0:
            continue
        expr, karg = body[:split], body[split + 1 :].strip()
        try:
            k = int(karg)
        except ValueError:
            continue
        out.append((m.start(), i, expr, k))
    return out


def _strip_rounds(sql: str) -> tuple[str, set[int]]:
    """Remove every ROUND(expr, k) whose expr holds a float aggregate and
    is not already DECIMAL-summed; return (rewritten_sql, {k digits seen}).
    Re-scans after each rewrite so nested ROUNDs unwrap fully."""
    digits: set[int] = set()
    changed = True
    while changed:
        changed = False
        for start, end, expr, k in _find_rounds(sql):
            if not FLOAT_AGGS.search(expr):
                continue
            if re.search(r"\bDECIMAL\b", expr, re.IGNORECASE):
                continue  # exact order-free sum — not in the flake class
            if "bool_or(isnan" in sql[max(0, start - 240) : start].lower():
                # the guarded exact-sum pattern's FLOAT FALLBACK arm: it
                # only executes when the group holds a non-finite value,
                # and ROUND(NaN/Inf) is order-insensitive by construction
                # — not in the flake class either
                continue
            digits.add(k)
            sql = sql[:start] + "(" + expr + ")" + sql[end:]
            changed = True
            break
    return sql, digits


def _boundary_dist(v: float, k: int) -> float:
    scaled = v * (10.0**k)
    if abs(scaled) > 2**52:  # beyond ulp resolution of the grid — exact int
        return math.inf
    return abs((scaled - math.floor(scaled)) - 0.5) / (10.0**k)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--all"]
    all_rows = "--all" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    graded = list(QUERIES) if all_rows else list(QUERIES)[:50]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged = []
    for name in graded:
        if only and name not in only:
            continue
        sql = ORACLES.get(name)
        if not sql:
            continue
        raw_sql, digits = _strip_rounds(sql)
        if not digits:
            continue
        try:
            res = con.execute(raw_sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
        except Exception as e:  # pragma: no cover - audit tooling
            print(f"ERROR {name}: unrounded oracle failed: {str(e)[:160]}")
            flagged.append(name)
            continue
        worst = (math.inf, None, None, None)
        for r in rows:
            for c, v in zip(cols, r):
                if not isinstance(v, float) or not math.isfinite(v):
                    continue
                for k in digits:
                    d = _boundary_dist(v, k)
                    if d < worst[0]:
                        worst = (d, c, v, k)
        d, c, v, k = worst
        tol = max(abs(v or 0.0) * REL_TOL, ABS_TOL)
        status = "FLAG" if d < tol else "ok  "
        if status == "FLAG":
            flagged.append(name)
        print(
            f"{status} {name}: min boundary dist {d:.3e} "
            f"(col={c} v={v!r} k={k}, tol {tol:.1e}, {len(rows)} rows)"
        )

    print(f"\n{len(flagged)} flagged" + (f": {flagged}" if flagged else ""))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
