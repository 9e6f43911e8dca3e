"""``*_over_time`` range-vector aggregations (beyond-reference surface).

The reference consumes range vectors only via rate/irate
(/root/reference/src/query.rs:358-436); real PromQL also aggregates the raw
samples inside each window ``[t − r, t]``. Window membership here is the
closed interval ``gts − r <= ts <= gts`` (with the PromQL ``offset``
applied to the probe instant first).

Scale shape — the slot-explode trick from resample_slots
(operators/interpolate.py): for a REGULAR grid every sample can compute the
slot range it contributes to directly (``ceil``/``floor`` + one exact ±1
correction against the probe expression, so the boundaries match the
oracle's float comparisons ulp-for-ulp). The plan is then

    samples → explode(sequence(slot_lo, slot_hi)) → groupBy(series, slot)

one narrow shuffle keyed by (series, slot), no per-probe search, no
grid-sized sort, no driver-side state — the layout that survives 100 TB.
With windows r ≫ step each sample fans out to r/step slots; that is the
output's intrinsic size (same as Prometheus), not an artifact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.operators.interpolate import keyed_series

#: fn name (without the _over_time suffix) → aggregation over the window's
#: raw samples. Values are always DOUBLE (count casts).
OVER_TIME_FNS = {
    "sum": lambda: F.sum("value"),
    "avg": lambda: F.avg("value"),
    "min": lambda: F.min("value"),
    "max": lambda: F.max("value"),
    "count": lambda: F.count("value").cast("double"),
    "last": lambda: F.max_by("value", "ts"),
    "stddev": lambda: F.stddev_pop("value"),
    "stdvar": lambda: F.var_pop("value"),
}


def over_time_to_grid(
    samples: DataFrame,
    grid,
    fn: str,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
) -> DataFrame:
    """Aggregate raw samples per series over each grid window.

    ``samples``: canonical long frame (series_cols=None) or plain series
    columns. ``grid``: a RegularTimeRange. Grid instants whose window holds
    no samples produce no row (PromQL: empty range vector → no point).

    Output: (name, labels, ts, value) / series_cols + (ts, value).
    PromQL name semantics: every ``*_over_time`` drops the metric name
    except ``last_over_time``.
    """
    if fn not in OVER_TIME_FNS:
        raise ValueError(f"unknown over_time aggregation {fn!r}")
    r = float(over_range)
    n, start, step = len(grid), grid.start, grid.increment
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
    else:
        series = None
        key_cols = list(series_cols)

    def pt_of(slot: Column) -> Column:
        # identical float ops to grid_probes: (start + slot·step) − offset
        return (F.lit(start) + slot.cast("double") * F.lit(step)) - F.lit(
            float(offset)
        )

    t = F.col("ts")
    # smallest slot with pt(slot) >= ts
    lo = F.ceil((t + F.lit(float(offset)) - F.lit(start)) / F.lit(step)).cast("long")
    lo = F.when(pt_of(lo - 1) >= t, lo - 1).otherwise(lo)
    lo = F.when(pt_of(lo) < t, lo + 1).otherwise(lo)
    # largest slot with pt(slot) - r <= ts (exact predicate, not ts + r)
    hi = F.floor(
        (t + F.lit(r) + F.lit(float(offset)) - F.lit(start)) / F.lit(step)
    ).cast("long")
    hi = F.when(pt_of(hi + 1) - F.lit(r) <= t, hi + 1).otherwise(hi)
    hi = F.when(pt_of(hi) - F.lit(r) > t, hi - 1).otherwise(hi)

    lo = F.greatest(F.lit(0).cast("long"), lo)
    hi = F.least(F.lit(n - 1).cast("long"), hi)

    exploded = (
        samples.select(*key_cols, "ts", "value", lo.alias("_lo"), hi.alias("_hi"))
        .filter(F.col("_hi") >= F.col("_lo"))
        .select(
            *key_cols,
            "ts",
            "value",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_slot"),
        )
    )
    agg = OVER_TIME_FNS[fn]().alias("value")
    out = exploded.groupBy(*key_cols, "_slot").agg(agg)
    gts = (F.lit(start) + F.col("_slot").cast("double") * F.lit(step)).alias("ts")
    if series is not None:
        name_out = (
            F.col("name") if fn == "last" else F.lit(None).cast("string")
        )
        return out.join(series, "_skey").select(
            name_out.alias("name"), "labels", gts, "value"
        )
    return out.select(*key_cols, gts, "value")
