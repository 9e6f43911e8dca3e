"""Elementwise math functions over instant vectors (beyond-reference).

The reference's function set is rate/irate/histogram_quantile/sum
(/root/reference/src/query.rs:246-255); real PromQL also has per-sample
math. All of these map 1:1 onto JVM-side Column expressions — no UDFs, no
shuffle, fully inside whole-stage codegen.

IEEE parity notes (PromQL follows Go's math package):
- ``ln(0) = -inf``, ``ln(x<0) = NaN`` — Spark's ``log`` returns NULL for
  non-positive inputs, so those branches are explicit;
- ``sqrt(x<0) = NaN`` (Spark agrees);
- ``round(v, to_nearest)`` rounds to the nearest multiple with ties away
  from zero upward: ``floor(v/t + 0.5) * t`` (same expression an oracle can
  run verbatim);
- metric name is dropped (the sample no longer carries the original
  meaning), matching PromQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nan() -> Column:
    return F.lit(float("nan"))


def _neg_inf() -> Column:
    return F.lit(float("-inf"))


def _guarded_log(col: Column, log_fn) -> Column:
    return (
        F.when(F.isnan(col), _nan())
        .when(col > 0, log_fn(col))
        .when(col == 0, _neg_inf())
        .otherwise(_nan())
    )


def _finite_only(col: Column, expr: Column) -> Column:
    """Pass NaN/±inf through untouched (ceil/floor/round go via BIGINT in
    Spark, which NaN and inf would corrupt; Spark also orders NaN greatest,
    which breaks least/greatest-based clamps)."""
    return F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), col).otherwise(
        expr
    )


#: name → unary value expression
MATH_FNS = {
    "abs": lambda c: F.abs(c),
    "ceil": lambda c: _finite_only(c, F.ceil(c).cast("double")),
    "floor": lambda c: _finite_only(c, F.floor(c).cast("double")),
    "exp": lambda c: F.exp(c),
    "ln": lambda c: _guarded_log(c, F.log),
    "log2": lambda c: _guarded_log(c, F.log2),
    "log10": lambda c: _guarded_log(c, F.log10),
    "sqrt": lambda c: F.sqrt(c),
    "sgn": lambda c: F.signum(c),
    # trigonometric family (PromQL ≥ 2.31; Go math semantics = IEEE, which
    # Spark's JVM functions share: asin(|x|>1) → NaN, tan(π/2) → finite huge)
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    # inverse hyperbolics (PromQL ≥ 2.31): Go math = IEEE = Spark's JVM
    # twins — acosh(x<1) → NaN, atanh(±1) → ±Inf, atanh(|x|>1) → NaN
    "asinh": F.asinh,
    "acosh": F.acosh,
    "atanh": F.atanh,
    "rad": lambda c: F.radians(c),
    "deg": lambda c: F.degrees(c),
}


def _date_part(part) -> "callable":
    def expr(c: Column) -> Column:
        ts = F.timestamp_seconds(c)
        raw = part(ts).cast("double")
        # NaN/±inf epoch values → NaN (cast to timestamp NULLs them out)
        return F.when(F.isnan(c) | raw.isNull(), _nan()).otherwise(raw)

    return expr


#: PromQL date-part functions over epoch-second sample VALUES (UTC, like
#: Prometheus; the session timezone is pinned to UTC in session.py).
#: day_of_week is 0-based Sunday (Spark's dayofweek is 1-based Sunday).
DATE_FNS = {
    "minute": _date_part(F.minute),
    "hour": _date_part(F.hour),
    "day_of_week": _date_part(lambda t: F.dayofweek(t) - F.lit(1)),
    "day_of_month": _date_part(F.dayofmonth),
    "day_of_year": _date_part(F.dayofyear),
    "days_in_month": _date_part(lambda t: F.dayofmonth(F.last_day(t))),
    "month": _date_part(F.month),
    "year": _date_part(F.year),
}


def apply_math_fn(df: DataFrame, fn: str) -> DataFrame:
    """Apply a unary math function to every sample; name dropped."""
    expr = MATH_FNS[fn](F.col("value"))
    return df.select(
        F.lit(None).cast("string").alias("name"),
        "labels",
        "ts",
        expr.alias("value"),
    )


def round_expr(v: Column, to_nearest: float = 1.0) -> Column:
    """Value expression of PromQL ``round``: nearest multiple, ties up."""
    t = F.lit(float(to_nearest))
    return _finite_only(v, F.floor(v / t + F.lit(0.5)).cast("double") * t)


def clamp_expr(
    v: Column, lo: float | None = None, hi: float | None = None
) -> Column | None:
    """Value expression of PromQL ``clamp``/``clamp_min``/``clamp_max``.

    Returns ``None`` for the lo > hi case — Prometheus defines
    ``clamp(v, min, max)`` with min > max as the EMPTY vector, which the
    caller must express as a filter, not a value. A NaN bound propagates
    NaN to every sample (Go's math.Max/Min), short-circuited explicitly
    because Spark's least/greatest order NaN greatest instead."""
    import math

    if lo is not None and hi is not None and lo > hi:
        return None
    if (lo is not None and math.isnan(lo)) or (hi is not None and math.isnan(hi)):
        return _nan()
    expr = v
    if lo is not None:
        expr = F.greatest(expr, F.lit(float(lo)))
    if hi is not None:
        expr = F.least(expr, F.lit(float(hi)))
    # only NaN passes through (clamp of ±inf saturates like Go min/max)
    return F.when(F.isnan(v), v).otherwise(expr)


def apply_round(df: DataFrame, to_nearest: float = 1.0) -> DataFrame:
    """PromQL ``round(v, to_nearest)``: nearest multiple, ties round up."""
    expr = round_expr(F.col("value"), to_nearest)
    return df.select(
        F.lit(None).cast("string").alias("name"), "labels", "ts", expr.alias("value")
    )


def apply_clamp(
    df: DataFrame, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """``clamp(v, min, max)`` / ``clamp_min`` / ``clamp_max``."""
    expr = clamp_expr(F.col("value"), lo, hi)
    out_name = F.lit(None).cast("string").alias("name")
    if expr is None:  # min > max → empty vector (Prometheus special case)
        return df.select(out_name, "labels", "ts", "value").filter(F.lit(False))
    return df.select(out_name, "labels", "ts", expr.alias("value"))
