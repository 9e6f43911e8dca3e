"""rate() and irate() over range vectors (P1, P2 in SURVEY.md §2.4).

Reference parity:
- ``rate``  : /root/reference/src/timeseries.rs:70-85, 104-113 — per grid
  instant t (after `offset`): ``(interp(t) − interp(t−r)) / r`` using clamped
  linear interpolation; ``r == 0`` → NaN. No counter-reset logic.
- ``irate`` : /root/reference/src/timeseries.rs:87-102, 116-161 — faithfully
  replicated INCLUDING two reference quirks (readme.md:104 admits "irate
  logic needs work"); see irate_value() comments.

Spark strategy: both endpoints of every grid instant become probe rows in the
single-pass as-of window of interpolate.py (one shuffle on the series key),
then a groupBy(series, grid_ts) pairs the endpoints. Map-side partial
aggregation keeps the second exchange small; at cluster scale both exchanges
hash on the same series-dominated keys.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.operators.interpolate import (
    NAN,
    _asof_context,
    interp_value,
    keyed_series,
)


def _endpoint_probes(
    series: DataFrame,
    grid_df: DataFrame,
    series_cols: Sequence[str],
    over_range: float,
    offset: float,
) -> DataFrame:
    """Two probes per (series, grid instant): hi at ``t−offset`` and lo at
    ``t−offset−r`` (src/timeseries.rs:75-77)."""
    endpoints = F.array(
        F.struct(
            (F.col("gts") - F.lit(float(offset))).alias("pt"), F.lit(1).alias("hi")
        ),
        F.struct(
            (F.col("gts") - F.lit(float(offset)) - F.lit(float(over_range))).alias("pt"),
            F.lit(0).alias("hi"),
        ),
    )
    extra = [c for c in series.columns if c not in series_cols]
    return (
        series.crossJoin(F.broadcast(grid_df))
        .select(*series_cols, *extra, "gts", F.explode(endpoints).alias("_e"))
        .select(
            *series_cols,
            *extra,
            "gts",
            F.col("_e.pt").alias("_pt"),
            F.col("_e.hi").alias("_hi"),
        )
    )


def _lag_fast_path_applicable(grid, over_range: float, offset: float) -> bool:
    """The t−r endpoint coincides with an earlier grid slot when r is a
    whole number of steps AND all quantities are integral (integer doubles
    under 2^53 add/subtract exactly, so ``start + (i−k)·step`` is
    bit-identical to ``(start + i·step) − r`` — float-safe slot reuse)."""
    if grid is None or over_range <= 0.0:
        return False
    vals = (grid.start, grid.increment, over_range, offset)
    if not all(float(v).is_integer() for v in vals):
        return False
    return (over_range % grid.increment) == 0.0


def rate_to_grid(
    samples: DataFrame,
    grid_df: DataFrame,
    series_cols: Sequence[str] | None = None,
    over_range: float = 0.0,
    offset: float = 0.0,
    ts_col: str = "ts",
    out_col: str = "value",
    grid=None,
) -> DataFrame:
    """P1: ``rate(v[r])`` = (interp(t) − interp(t−r)) / r per grid instant.

    ``series_cols=None`` = canonical long-frame mode (name, labels, ts,
    value) in and out; explicit plain columns otherwise.

    Pass the :class:`RegularTimeRange` as ``grid`` to enable the lag fast
    path: one probe per extended-grid slot and a window ``lag(k)`` instead
    of two probes + a pairing shuffle (the lag window reuses the as-of
    window's partitioning/sort).
    """
    if _lag_fast_path_applicable(grid, over_range, offset):
        return _rate_lagged(
            samples, grid, series_cols, over_range, offset, ts_col, out_col
        )
    canonical = series_cols is None
    if canonical:
        # maps stay out of the wide shuffles — string key only, series
        # frame joined back at the end (AQE broadcasts it)
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
        probe_series = series.select("_skey")
    else:
        series = samples.select(*series_cols).distinct()
        key_cols = list(series_cols)
        probe_series = series
    if over_range == 0.0:
        # last_instant == first_instant → NaN everywhere (timeseries.rs:104-106)
        out = series.crossJoin(F.broadcast(grid_df))
        cols = ["name", "labels"] if canonical else key_cols
        return out.select(*cols, F.col("gts").alias(ts_col), NAN().alias(out_col))
    probes = _endpoint_probes(probe_series, grid_df, key_cols, over_range, offset)
    interp = interpolate_at_probes_raw(samples, probes, key_cols)
    hi = F.first(F.when(F.col("_hi") == 1, F.col("_iv")), ignorenulls=True)
    lo = F.first(F.when(F.col("_hi") == 0, F.col("_iv")), ignorenulls=True)
    agged = interp.groupBy(*key_cols, "gts").agg(
        ((hi - lo) / F.lit(float(over_range))).alias(out_col)
    )
    if canonical:
        agged = agged.join(series, "_skey")
    cols = ["name", "labels"] if canonical else key_cols
    return agged.select(*cols, F.col("gts").alias(ts_col), out_col)


def _rate_lagged(
    samples: DataFrame,
    grid,
    series_cols: Sequence[str] | None,
    over_range: float,
    offset: float,
    ts_col: str,
    out_col: str,
) -> DataFrame:
    """Lag fast path: sort-free slot resample onto the grid extended k slots
    backwards, then ``(v[i] − v[i−k]) / r`` per series ordered by slot."""
    from prometheus_parquet_server_spark.operators.interpolate import (
        resample_slots,
    )

    k = int(over_range / grid.increment)
    out, series, key_cols = resample_slots(
        samples, grid, series_cols, offset, slot_from=-k
    )
    w = Window.partitionBy(*key_cols).orderBy("_slot")
    res = (
        out.withColumn("_lo", F.lag("value", k).over(w))
        .filter(F.col("_slot") >= 0)
        .select(
            *key_cols,
            F.col("gts").alias(ts_col),
            ((F.col("value") - F.col("_lo")) / F.lit(float(over_range))).alias(out_col),
        )
    )
    if series is not None:
        res = res.join(series, "_skey").select("name", "labels", ts_col, out_col)
    return res


def rate_from_aligned(
    aligned_ext_sel: DataFrame,
    grid,
    over_range: float,
) -> DataFrame:
    """Serving fast path: rate over a store aligned to this grid EXTENDED
    ``pad`` steps backwards (see MetricsHTTPServer._aligned_for).

    ``interp(t)`` for every (extended-)grid instant is materialized in the
    aligned frame, and when r is a whole number of (integral) steps the
    t−r endpoint is exactly an earlier instant of the same frame (same
    float — see _lag_fast_path_applicable), so
    ``rate = (v[i] − v[i−k]) / r`` is ONE ``lag(k)`` window over the
    persisted frame — no slot explode, no raw scan, no edge case (the
    backward padding supplies the t−r endpoints of the first k instants;
    caller must check k ≤ pad).

    Bit-identical to rate_to_grid: identical interpolation feeds an
    identical (hi − lo)/r expression.

    Serving-scale trade: the single window shuffle carries the labels MAP
    directly (partitioned on the string series key) instead of the batch
    path's keyed_series split+join — one exchange instead of three on a
    frame that is panel-sized by construction. The batch operators keep
    maps out of wide shuffles; this path is only reachable through a
    server-provided aligned store.
    """
    from prometheus_parquet_server_spark.model import series_key_str

    k = int(over_range / grid.increment)
    w = Window.partitionBy(
        series_key_str(F.col("name"), F.col("labels"))
    ).orderBy("ts")
    return (
        aligned_ext_sel.withColumn("_lo", F.lag("value", k).over(w))
        .filter(F.col("ts") >= F.lit(float(grid.start)))
        .select(
            "name",
            "labels",
            "ts",
            ((F.col("value") - F.col("_lo")) / F.lit(float(over_range))).alias(
                "value"
            ),
        )
    )


def interpolate_at_probes_raw(
    samples: DataFrame,
    probes: DataFrame,
    series_cols: Sequence[str],
    carry_cols: Sequence[str] = ("gts", "_hi"),
) -> DataFrame:
    """interp value per probe, keeping the carry columns."""
    ctx = _asof_context(samples, probes, series_cols, carry_cols=list(carry_cols))
    return ctx.withColumn(
        "_iv", interp_value(F.col("_pt"), F.col("_prev"), F.col("_next"))
    )


def irate_value(pt: Column, prev: Column, nxt: Column) -> Column:
    """The irate_over_range() expression (src/timeseries.rs:116-161).

    With locate(t) = Between(i, i+1) (``ts[i] <= t < ts[i+1]``); any other
    locate result → NaN (Below/Above/NotFound, timeseries.rs:123-128), i.e.
    here: prev or next struct missing → NaN.

    Reference quirks replicated deliberately:
    - first-interval case (i == 0, timeseries.rs:135-144): ``delta_v =
      v[i] − v[i+1]`` — note the ORDER: lower-index minus upper-index value,
      so an increasing series yields a negative delta → NaN.
    - otherwise (timeseries.rs:146-148): the "interpolated" endpoint uses
      SWAPPED weights ``((t−ts[i])·v[i] + (ts[i+1]−t)·v[i+1]) / (ts[i+1]−ts[i])``
      (reverse interpolation), then ``delta_v = that − v[i−1]``,
      ``delta_t = t − ts[i−1]``; negative delta_v → NaN.
    """
    t0, v0, tp, vp = prev["t"], prev["v"], prev["tp"], prev["vp"]
    t1, v1 = nxt["t"], nxt["v"]
    first_pair = F.when((v0 - v1) < 0, NAN()).otherwise((v0 - v1) / (t1 - t0))
    interp_swapped = ((pt - t0) * v0 + (t1 - pt) * v1) / (t1 - t0)
    dv = interp_swapped - vp
    general = F.when(dv < 0, NAN()).otherwise(dv / (pt - tp))
    return (
        F.when(prev.isNull() | nxt.isNull(), NAN())
        .when(tp.isNull(), first_pair)
        .otherwise(general)
    )


def _irate_slots(
    samples: DataFrame,
    grid,
    series_cols: Sequence[str] | None,
    offset: float,
    ts_col: str,
    out_col: str,
    chunk_s: float | None = None,
) -> DataFrame:
    """Sort-free irate on a REGULAR grid (same slot-ownership trick as
    resample_slots): each adjacent sample pair (i, i+1) owns the slots with
    ``ts[i] <= pt < ts[i+1]`` — exactly locate()'s Between(i, i+1) — and
    carries its lagged predecessor (tp, vp) for the general-case formula.
    Slots before the first sample (Below) and at/after the last (Above) are
    NaN per timeseries.rs:123-128, so those ranges are never emitted; the
    consumer treats missing grid rows as NaN series points — but to keep
    the output shape identical to the window path we DO emit them with NaN.

    ``chunk_s`` is the hot-series escape hatch (the resample_slots
    pattern, with the TWO-sample carry-in irate needs): the window
    partitions on (key, floor(ts/chunk_s)); a per-chunk summary frame
    supplies each chunk BOTH its missing lead (next non-empty chunk's
    first sample) AND its missing lag pair tp/vp (previous non-empty
    chunk's LAST sample, feeding the reference's general-case formula,
    src/timeseries.rs:146-148). Identical expressions per pair →
    bit-identical output for any chunk width.
    """
    from prometheus_parquet_server_spark.operators.interpolate import keyed_series

    n = len(grid)
    start, step = grid.start, grid.increment
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
    else:
        series = None
        key_cols = list(series_cols)

    lo, hi = F.lit(0).cast("long"), F.lit(n).cast("long")

    def pt_of(slot):
        return (F.lit(start) + slot.cast("double") * F.lit(step)) - F.lit(
            float(offset)
        )

    def a_of(t: Column) -> Column:
        nc = F.ceil(
            (t + F.lit(float(offset)) - F.lit(start)) / F.lit(step)
        ).cast("long")
        nc = F.when(pt_of(nc - 1) >= t, nc - 1).otherwise(nc)
        nc = F.when(pt_of(nc) < t, nc + 1).otherwise(nc)
        return F.greatest(lo, F.least(hi, nc))

    a = a_of(F.col("ts"))

    if chunk_s is None:
        w = Window.partitionBy(*key_cols).orderBy("ts")
        s = (
            samples.select(*key_cols, "ts", "value")
            .withColumn("_a", a)
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_tp", F.lag("ts").over(w))
            .withColumn("_vp", F.lag("value").over(w))
            .withColumn("_nts", F.lead("ts").over(w))
            .withColumn("_nv", F.lead("value").over(w))
            .withColumn("_na", F.lead("_a").over(w))
        )
        series_first = F.col("_rn") == 1
    else:
        from prometheus_parquet_server_spark.operators.interpolate import (
            _chunked_slot_context,
        )

        s = _chunked_slot_context(
            samples.select(*key_cols, "ts", "value"),
            key_cols,
            chunk_s,
            a_of,
            with_prev=True,  # irate's tp/vp: previous chunk's LAST sample
        )
        series_first = F.col("_sfirst")
    # three slot ranges per sample row: Below (first sample only), the
    # Between range owned by pair (this, next), Above (last sample only)
    pair_to = F.when(F.col("_nts").isNull(), F.lit(None).cast("long")).otherwise(
        F.col("_na")
    )
    ranges = F.array(
        F.struct(
            F.col("_a").alias("f"),
            F.coalesce(pair_to, F.col("_a")).alias("u"),
            F.lit(0).alias("oob"),
        ),
        F.struct(
            F.when(series_first, lo).otherwise(F.lit(None).cast("long")).alias("f"),
            F.col("_a").alias("u"),
            F.lit(1).alias("oob"),  # Below → NaN
        ),
        F.struct(
            F.when(F.col("_nts").isNull(), F.col("_a")).otherwise(
                F.lit(None).cast("long")
            ).alias("f"),
            F.when(F.col("_nts").isNull(), hi).otherwise(F.lit(None).cast("long")).alias("u"),
            F.lit(1).alias("oob"),  # Above (pt >= last ts) → NaN
        ),
    )
    exploded = (
        s.select(
            *key_cols, "ts", "value", "_tp", "_vp", "_nts", "_nv",
            F.explode(ranges).alias("_r"),
        )
        .filter(F.col("_r.f").isNotNull() & (F.col("_r.u") > F.col("_r.f")))
        .select(
            *key_cols,
            "ts", "value", "_tp", "_vp", "_nts", "_nv",
            F.col("_r.oob").alias("_oob"),
            F.explode(F.sequence(F.col("_r.f"), F.col("_r.u") - 1)).alias("_slot"),
        )
    )
    gts = F.lit(start) + F.col("_slot").cast("double") * F.lit(step)
    pt = gts - F.lit(float(offset))
    prev = F.struct(
        F.col("ts").alias("t"), F.col("value").alias("v"),
        F.col("_tp").alias("tp"), F.col("_vp").alias("vp"),
    )
    nxt = F.struct(F.col("_nts").alias("t"), F.col("_nv").alias("v"))
    val = F.when(F.col("_oob") == 1, NAN()).otherwise(irate_value(pt, prev, nxt))
    out = exploded.select(
        *key_cols, gts.alias(ts_col), val.alias(out_col)
    )
    if series is not None:
        out = out.join(series, "_skey").select("name", "labels", ts_col, out_col)
    return out


def irate_to_grid(
    samples: DataFrame,
    grid_df: DataFrame,
    series_cols: Sequence[str] | None = None,
    over_range: float = 0.0,
    offset: float = 0.0,
    ts_col: str = "ts",
    out_col: str = "value",
    grid=None,
    chunk_s: float | None = None,
) -> DataFrame:
    """P2: ``irate(v[r])``. ``r`` only gates the r==0 → NaN check — its value
    is otherwise ignored by the math (src/timeseries.rs:117-121 uses only
    ``last_instant``).

    Pass the :class:`RegularTimeRange` as ``grid`` for the sort-free
    slot-explode plan (no probe union, samples-only window); ``chunk_s``
    (slot path only) is the hot-series escape hatch — see
    :func:`_irate_slots`."""
    if chunk_s is not None and grid is None:
        raise ValueError("chunk_s requires the slot path — pass grid=")
    if grid is not None and over_range != 0.0:
        return _irate_slots(
            samples, grid, series_cols, offset, ts_col, out_col, chunk_s=chunk_s
        )
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
        probe_series = series.select("_skey")
    else:
        series = samples.select(*series_cols).distinct()
        key_cols = list(series_cols)
        probe_series = series
    if over_range == 0.0:
        out = series.crossJoin(F.broadcast(grid_df))
        cols = ["name", "labels"] if canonical else key_cols
        return out.select(*cols, F.col("gts").alias(ts_col), NAN().alias(out_col))
    probes = probe_series.crossJoin(F.broadcast(grid_df)).withColumn(
        "_pt", F.col("gts") - F.lit(float(offset))
    )
    ctx = _asof_context(samples, probes, key_cols, carry_cols=["gts"])
    vals = ctx.select(
        *key_cols,
        F.col("gts").alias(ts_col),
        irate_value(F.col("_pt"), F.col("_prev"), F.col("_next")).alias(out_col),
    )
    if canonical:
        vals = vals.join(series, "_skey").select(
            "name", "labels", ts_col, out_col
        )
    return vals
