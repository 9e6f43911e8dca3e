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


def apply_round(df: DataFrame, to_nearest: float = 1.0) -> DataFrame:
    """PromQL ``round(v, to_nearest)``: nearest multiple, ties round up."""
    t = F.lit(float(to_nearest))
    v = F.col("value")
    expr = _finite_only(v, F.floor(v / t + F.lit(0.5)).cast("double") * t)
    return df.select(
        F.lit(None).cast("string").alias("name"), "labels", "ts", expr.alias("value")
    )


def apply_clamp(
    df: DataFrame, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """``clamp(v, min, max)`` / ``clamp_min`` / ``clamp_max``."""
    v = F.col("value")
    expr = v
    if lo is not None:
        expr = F.greatest(expr, F.lit(float(lo)))
    if hi is not None:
        expr = F.least(expr, F.lit(float(hi)))
    # only NaN passes through (clamp of ±inf saturates like Go min/max)
    expr = F.when(F.isnan(v), v).otherwise(expr)
    return df.select(
        F.lit(None).cast("string").alias("name"), "labels", "ts", expr.alias("value")
    )
