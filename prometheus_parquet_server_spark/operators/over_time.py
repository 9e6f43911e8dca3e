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
    # present_over_time: 1 for any window holding ≥1 sample (windows with
    # none produce no row at all, so the aggregate is a constant)
    "present": lambda: F.max(F.lit(1.0)),
}


def _slot_bounds(grid, over_range: float, offset: float, ts_expr: Column):
    """(lo, hi) slot range whose window ``[pt − r, pt]`` contains
    ``ts_expr`` — the shared boundary math (exact ±1 correction so the
    comparisons match an oracle's float predicates ulp-for-ulp)."""
    n, start, step = len(grid), grid.start, grid.increment
    r = float(over_range)

    def pt_of(slot: Column) -> Column:
        return (F.lit(start) + slot.cast("double") * F.lit(step)) - F.lit(
            float(offset)
        )

    t = ts_expr
    lo = F.ceil((t + F.lit(float(offset)) - F.lit(start)) / F.lit(step)).cast("long")
    lo = F.when(pt_of(lo - 1) >= t, lo - 1).otherwise(lo)
    lo = F.when(pt_of(lo) < t, lo + 1).otherwise(lo)
    hi = F.floor(
        (t + F.lit(r) + F.lit(float(offset)) - F.lit(start)) / F.lit(step)
    ).cast("long")
    hi = F.when(pt_of(hi + 1) - F.lit(r) <= t, hi + 1).otherwise(hi)
    hi = F.when(pt_of(hi) - F.lit(r) > t, hi - 1).otherwise(hi)
    lo = F.greatest(F.lit(0).cast("long"), lo)
    hi = F.least(F.lit(n - 1).cast("long"), hi)
    return lo, hi


def _keyed_window_explode(
    samples: DataFrame,
    grid,
    over_range: float,
    offset: float,
    series_cols: Sequence[str] | None,
):
    """Shared prologue for window aggregations: key the series (canonical
    mode), compute each sample's slot range, explode to (key, ts, value,
    _slot). Returns (exploded, series_frame_or_None, key_cols)."""
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
    else:
        series = None
        key_cols = list(series_cols)
    lo, hi = _slot_bounds(grid, over_range, offset, F.col("ts"))
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
    return exploded, series, key_cols


def over_time_to_grid(
    samples: DataFrame,
    grid,
    fn: str,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
    phi: float | None = None,
    unit_scale: float | None = None,
) -> DataFrame:
    """Aggregate raw samples per series over each grid window.

    ``samples``: canonical long frame (series_cols=None) or plain series
    columns. ``grid``: a RegularTimeRange. Grid instants whose window holds
    no samples produce no row (PromQL: empty range vector → no point).

    Output: (name, labels, ts, value) / series_cols + (ts, value).
    PromQL name semantics: every ``*_over_time`` drops the metric name
    except ``last_over_time``.
    """
    if fn not in OVER_TIME_FNS and fn != "quantile":
        raise ValueError(f"unknown over_time aggregation {fn!r}")
    start, step = grid.start, grid.increment
    exploded, series, key_cols = _keyed_window_explode(
        samples, grid, over_range, offset, series_cols
    )
    if fn == "quantile":
        # quantile_over_time(φ, v[r]): linear interpolation between order
        # statistics — exact percentile, same math as quantile_cont
        agg = F.percentile(F.col("value"), F.lit(float(phi))).alias("value")
    elif fn == "sum" and unit_scale is not None:
        # reproducible-results mode (see aggregate.unit_sum): the window
        # sum rides integer micro-units, so it is order-insensitive AND
        # bit-stable across engines — the graded-oracle contract; plain
        # float sum otherwise (PromQL semantics, fastest)
        from prometheus_parquet_server_spark.operators.aggregate import unit_sum

        agg = unit_sum("value", unit_scale).alias("value")
    else:
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


def idelta_to_grid(
    samples: DataFrame,
    grid,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
) -> DataFrame:
    """``idelta(v[r])`` (standard PromQL): difference of the LAST TWO raw
    samples inside each window. Windows with < 2 samples emit no point.
    One collect+sort per (series, slot) — the same shape as holt_winters,
    but only the top two order statistics matter."""
    start, step = grid.start, grid.increment
    exploded, series, key_cols = _keyed_window_explode(
        samples, grid, over_range, offset, series_cols
    )
    pts = F.array_sort(
        F.collect_list(F.struct(F.col("ts").alias("ts"), F.col("value").alias("v")))
    )
    collected = exploded.groupBy(*key_cols, "_slot").agg(pts.alias("_pts"))
    n = F.size(F.col("_pts"))
    val = (
        F.element_at(F.col("_pts"), -1)["v"] - F.element_at(F.col("_pts"), -2)["v"]
    )
    out = collected.filter(n >= 2)
    gts = (F.lit(start) + F.col("_slot").cast("double") * F.lit(step)).alias("ts")
    if series is not None:
        return out.join(series, "_skey").select(
            F.lit(None).cast("string").alias("name"), "labels", gts, val.alias("value")
        )
    return out.select(*key_cols, gts, val.alias("value"))


def mad_over_time_to_grid(
    samples: DataFrame,
    grid,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
) -> DataFrame:
    """``mad_over_time(v[r])``: median absolute deviation of each window's
    raw samples — median(|x − median(x)|), both medians with linear
    interpolation between order statistics (exact percentile, the same
    math as quantile_cont, so a SQL oracle replays it)."""
    start, step = grid.start, grid.increment
    exploded, series, key_cols = _keyed_window_explode(
        samples, grid, over_range, offset, series_cols
    )
    med = F.percentile(F.col("value"), F.lit(0.5))
    collected = exploded.groupBy(*key_cols, "_slot").agg(
        med.alias("_med"), F.collect_list("value").alias("_vals")
    )
    # median of deviations: sort |x − med| and interpolate the middle
    devs = F.array_sort(
        F.transform(F.col("_vals"), lambda v: F.abs(v - F.col("_med")))
    )
    n = F.size(devs)
    lo_idx = ((n + 1) / 2).cast("int")  # 1-based lower middle
    lo = F.element_at(devs, lo_idx)
    # 0-based NULL-safe get == 1-based lo_idx + 1; never constructs an
    # out-of-bounds index for odd-sized windows (ANSI-mode safe).
    hi = F.get(devs, lo_idx)
    mad = F.when(n % 2 == 1, lo).otherwise((lo + hi) / F.lit(2.0))
    gts = (F.lit(start) + F.col("_slot").cast("double") * F.lit(step)).alias("ts")
    out = collected.select(*key_cols, "_slot", mad.alias("value"))
    if series is not None:
        return out.join(series, "_skey").select(
            F.lit(None).cast("string").alias("name"), "labels", gts, "value"
        )
    return out.select(*key_cols, gts, "value")


def holt_winters_to_grid(
    samples: DataFrame,
    grid,
    over_range: float,
    sf: float,
    tf: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
) -> DataFrame:
    """``holt_winters(v[r], sf, tf)`` (Prometheus 3: ``double_exponential_
    smoothing``): per window, fold the ts-ordered raw samples through the
    smoothing recurrence

        s1 ← sf·x + (1−sf)·(s1 + b);  b ← tf·(s1' − s1) + (1−tf)·b

    seeded with s1 = x₀, b = x₁ − x₀ (the i=1 step is written with the
    same unsimplified expressions an oracle evaluates, so floats match
    term for term). Windows with < 2 samples produce no point.

    Plan shape: the slot groupBy collects each window's (ts, value) pairs
    once, sorts in-place (array_sort — deterministic, ts unique) and runs
    the fold as a single aggregate expression; no per-row Python, one
    shuffle keyed (series, slot)."""
    start, step = grid.start, grid.increment
    sfl, tfl = F.lit(float(sf)), F.lit(float(tf))
    exploded, series, key_cols = _keyed_window_explode(
        samples, grid, over_range, offset, series_cols
    )
    pts = F.array_sort(
        F.collect_list(F.struct(F.col("ts").alias("ts"), F.col("value").alias("v")))
    )

    init = F.struct(
        F.lit(0.0).alias("s1"), F.lit(0.0).alias("b"), F.lit(0).alias("n")
    )

    def fold(acc, e):
        x = e["v"]
        # i = 1: trend seeds to x1 − x0 BEFORE the update (written out, not
        # algebraically simplified, for bit-parity with the SQL oracle)
        s1_first = sfl * x + (F.lit(1.0) - sfl) * (acc["s1"] + (x - acc["s1"]))
        first = F.struct(
            s1_first.alias("s1"),
            (tfl * (s1_first - acc["s1"]) + (F.lit(1.0) - tfl) * (x - acc["s1"])).alias("b"),
            F.lit(2).alias("n"),
        )
        s1_gen = sfl * x + (F.lit(1.0) - sfl) * (acc["s1"] + acc["b"])
        general = F.struct(
            s1_gen.alias("s1"),
            (tfl * (s1_gen - acc["s1"]) + (F.lit(1.0) - tfl) * acc["b"]).alias("b"),
            (acc["n"] + 1).alias("n"),
        )
        seed = F.struct(x.alias("s1"), F.lit(0.0).alias("b"), F.lit(1).alias("n"))
        return (
            F.when(acc["n"] == 0, seed)
            .when(acc["n"] == 1, first)
            .otherwise(general)
        )

    collected = exploded.groupBy(*key_cols, "_slot").agg(pts.alias("_pts"))
    out = collected.select(
        *key_cols, "_slot", F.aggregate(F.col("_pts"), init, fold).alias("_hw")
    ).filter(F.col("_hw.n") >= 2)
    gts = (F.lit(start) + F.col("_slot").cast("double") * F.lit(step)).alias("ts")
    val = F.col("_hw.s1").alias("value")
    if series is not None:
        return out.join(series, "_skey").select(
            F.lit(None).cast("string").alias("name"), "labels", gts, val
        )
    return out.select(*key_cols, gts, val)


def deriv_to_grid(
    samples: DataFrame,
    grid,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
    predict_t: float | None = None,
) -> DataFrame:
    """``deriv(v[r])`` / ``predict_linear(v[r], t)``: simple least-squares
    over the window's raw samples (PromQL semantics).

    slope = covar_pop(ts, value) / var_pop(ts); predict_linear extrapolates
    the regression to ``pt + t`` seconds: ``avg(v) + slope·(pt + t −
    avg(ts))``. Windows with fewer than 2 samples produce no point
    (Prometheus requires two samples; it also sidesteps 0/0).

    Same slot-explode plan as over_time_to_grid — covar/var/avg are plain
    map-side-combining aggregates, so the only shuffle is the
    groupBy(series, slot).
    """
    start, step = grid.start, grid.increment
    exploded, series, key_cols = _keyed_window_explode(
        samples, grid, over_range, offset, series_cols
    )
    grouped = exploded.groupBy(*key_cols, "_slot").agg(
        F.covar_pop("ts", "value").alias("_cov"),
        F.var_pop("ts").alias("_var"),
        F.avg("ts").alias("_tbar"),
        F.avg("value").alias("_vbar"),
        F.count("value").alias("_n"),
    )
    grouped = grouped.filter((F.col("_n") >= 2) & (F.col("_var") > 0))
    gts = F.lit(start) + F.col("_slot").cast("double") * F.lit(step)
    slope = F.col("_cov") / F.col("_var")
    if predict_t is None:
        value = slope
    else:
        pt = gts - F.lit(float(offset))
        value = F.col("_vbar") + slope * (
            (pt + F.lit(float(predict_t))) - F.col("_tbar")
        )
    out = grouped.select(*key_cols, gts.alias("ts"), value.alias("value"))
    if series is not None:
        return out.join(series, "_skey").select(
            F.lit(None).cast("string").alias("name"), "labels", "ts", "value"
        )
    return out


def changes_to_grid(
    samples: DataFrame,
    grid,
    over_range: float,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
    resets: bool = False,
) -> DataFrame:
    """``changes(v[r])`` / ``resets(v[r])``: number of adjacent-sample value
    changes (decreases, for resets) whose BOTH endpoints lie in the window
    ``[pt − r, pt]``.

    Slot logic: pair (i−1, i) counts toward slots where ``pt >= ts[i]`` AND
    ``pt − r <= ts[i−1]`` — lower bound from the newer endpoint, upper from
    the older one. Every sample in the window also contributes a 0 so that
    windows with ≥1 sample but no qualifying pair still emit 0 (Prometheus
    emits 0, not nothing, when the series exists in the window).
    """
    start, step = grid.start, grid.increment
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
    else:
        series = None
        key_cols = list(series_cols)

    w = Window.partitionBy(*key_cols).orderBy("ts")
    s = samples.select(*key_cols, "ts", "value").withColumn(
        "_tp", F.lag("ts").over(w)
    ).withColumn("_vp", F.lag("value").over(w))

    # presence range: sample itself in window (contributes 0)
    p_lo, p_hi = _slot_bounds(grid, over_range, offset, F.col("ts"))
    # pair range: ts (newer) bounds below, _tp (older) bounds above
    q_lo, _ = _slot_bounds(grid, over_range, offset, F.col("ts"))
    _, q_hi = _slot_bounds(grid, over_range, offset, F.col("_tp"))
    if resets:
        # explicit NaN guard: Spark orders NaN greatest (x < NaN is true),
        # but Go/PromQL comparisons with NaN are always false
        event = (
            ~F.isnan("value") & ~F.isnan("_vp") & (F.col("value") < F.col("_vp"))
        )
    else:
        # Spark's NaN equality (NaN = NaN) happens to match Prometheus's
        # changes() rule: both-NaN is no change, NaN vs number is a change
        event = F.col("value") != F.col("_vp")
    contrib = F.array(
        F.struct(p_lo.alias("f"), p_hi.alias("u"), F.lit(0).alias("c")),
        F.struct(
            F.when(F.col("_tp").isNotNull() & event, q_lo).alias("f"),
            F.when(F.col("_tp").isNotNull() & event, q_hi).alias("u"),
            F.lit(1).alias("c"),
        ),
    )
    exploded = (
        s.select(*key_cols, F.explode(contrib).alias("_r"))
        .filter(F.col("_r.f").isNotNull() & (F.col("_r.u") >= F.col("_r.f")))
        .select(
            *key_cols,
            F.col("_r.c").alias("_c"),
            F.explode(F.sequence(F.col("_r.f"), F.col("_r.u"))).alias("_slot"),
        )
    )
    out = exploded.groupBy(*key_cols, "_slot").agg(
        F.sum("_c").cast("double").alias("value")
    )
    gts = (F.lit(start) + F.col("_slot").cast("double") * F.lit(step)).alias("ts")
    if series is not None:
        return out.join(series, "_skey").select(
            F.lit(None).cast("string").alias("name"), "labels", gts, "value"
        )
    return out.select(*key_cols, gts, "value")
