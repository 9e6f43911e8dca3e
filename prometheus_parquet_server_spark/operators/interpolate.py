"""As-of linear interpolation over labelled time series (T1–T3, T5).

Reference parity: ``interpolated_at`` + ``calculate_resampled_series``
(/root/reference/src/timeseries.rs:57-68, 164-191) and binary-search
``locate`` (/root/reference/src/timevectors.rs:111-148):

- probe before first sample  → first value (clamped extrapolation)
- probe at/after last sample → last value (``locate`` puts ``t == ts[last]``
  in ``Above``, src/timevectors.rs:130-132)
- between samples i, i+1 with ``ts[i] <= t < ts[i+1]`` →
  ``((t-t0)*v1 + (t1-t)*v0) / (t1-t0)``
- empty series → NaN

Spark strategy (scale note): the reference binary-searches per instant —
O(log n) per probe on one core. Here samples and probes are UNIONed and a
single window pass per series computes every probe's straddling samples in
one sort: one shuffle on the series key, then linear merge. This is the plan
that survives 100 TB — no per-probe lookups, no driver-side loops, and the
shuffle key (series) matches the downstream groupBy keys so AQE can coalesce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def NAN() -> Column:
    """NaN literal (lazy: F.lit needs an active SparkContext)."""
    return F.lit(float("nan"))


def _asof_context(
    samples: DataFrame,
    probes: DataFrame,
    series_cols: Sequence[str],
    carry_cols: Sequence[str],
) -> DataFrame:
    """Attach to every probe row the straddling-sample context.

    ``samples``: series_cols + (ts, value), strictly increasing ts per series
    (the reference's VecTimeRange invariant, src/timevectors.rs:71-97 — the
    caller dedupes).
    ``probes``: series_cols + ``_pt`` (probe instant) + carry_cols.

    Output: probes + ``_prev`` struct(t, v, tp, vp) = sample at
    ``max ts <= _pt`` plus its predecessor, and ``_next`` struct(t, v) =
    sample at ``min ts > _pt``; null structs when no such sample exists.
    """
    lagw = Window.partitionBy(*series_cols).orderBy("ts")
    sample_side = samples.select(
        *series_cols,
        F.col("ts").alias("_t"),
        F.lit(0).alias("_p"),
        F.struct(
            F.col("ts").alias("t"),
            F.col("value").alias("v"),
            F.lag("ts").over(lagw).alias("tp"),
            F.lag("value").over(lagw).alias("vp"),
        ).alias("_sv"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in carry_cols],
    )
    probe_side = probes.select(
        *series_cols,
        F.col("_pt").alias("_t"),
        F.lit(1).alias("_p"),
        F.lit(None).cast(sample_side.schema["_sv"].dataType).alias("_sv"),
        *carry_cols,
    )
    u = sample_side.unionByName(probe_side)
    # Samples sort before probes at equal _t (_p 0 < 1), so a sample at
    # exactly the probe instant lands in _prev (ts[i] <= t) and _next is
    # strictly greater — matching locate()'s Between/Above classification.
    #
    # BOTH windows are running (unboundedPreceding → currentRow) frames —
    # O(n) incremental evaluation. The naive (currentRow →
    # unboundedFollowing) frame for _next is O(n²) in Spark (the frame is
    # rescanned per row); ordering DESC and taking the running last() is the
    # same relation, measured ~6× faster end-to-end at sf0.1.
    wprev = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("_t").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Reversed order: rows preceding the probe here = rows strictly after it
    # in ascending order (at equal _t the probe, _p=1, comes first DESC).
    wnext_rev = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("_t").desc(), F.col("_p").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_prev", F.last("_sv", ignorenulls=True).over(wprev))
        .withColumn("_next", F.last("_sv", ignorenulls=True).over(wnext_rev))
        .filter(F.col("_p") == 1)
        .withColumnRenamed("_t", "_pt")
    )


def interp_value(pt: Column, prev: Column, nxt: Column) -> Column:
    """The interpolated_at() value expression (src/timeseries.rs:164-191)."""
    t0, v0 = prev["t"], prev["v"]
    t1, v1 = nxt["t"], nxt["v"]
    return (
        F.when(prev.isNull() & nxt.isNull(), NAN())  # NotFound → NaN
        .when(prev.isNull(), v1)  # Below → first value
        .when(nxt.isNull(), v0)  # Above → last value
        .otherwise(((pt - t0) * v1 + (t1 - pt) * v0) / (t1 - t0))
    )


def interpolate_at_probes(
    samples: DataFrame,
    probes: DataFrame,
    series_cols: Sequence[str],
    carry_cols: Sequence[str] = (),
    out_col: str = "value",
) -> DataFrame:
    """Evaluate interpolated_at(probe) for every probe row.

    Returns series_cols + carry_cols + ``_pt`` + ``out_col``.
    """
    ctx = _asof_context(samples, probes, series_cols, carry_cols)
    return ctx.select(
        *series_cols,
        *carry_cols,
        "_pt",
        interp_value(F.col("_pt"), F.col("_prev"), F.col("_next")).alias(out_col),
    )


def grid_probes(
    series_df: DataFrame, grid_df: DataFrame, offset: float = 0.0
) -> DataFrame:
    """Cross every distinct series with the (broadcast) grid.

    ``offset`` is the PromQL `offset` modifier (T5): the sampled instant is
    ``grid_ts - offset`` while the output keeps the grid timestamp
    (src/timeseries.rs:57-68).
    """
    return series_df.crossJoin(F.broadcast(grid_df)).withColumn(
        "_pt", F.col("gts") - F.lit(float(offset))
    )


def keyed_series(samples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Key a canonical long frame (name, labels, ts, value) by the string
    series identity (maps can't be window keys / deduped in Spark).

    Returns (keyed samples with ``_skey``, one-row-per-series frame with
    ``_skey, name, labels``).
    """
    from prometheus_parquet_server_spark.model import (
        canonical_labels_json,
        series_key_str,
    )

    # NULL labels coalesce to the empty map BEFORE canonicalization
    # (ADVICE r14): canonical_labels_json(NULL) is NULL, which made _skey
    # NULL via concat — the series frame then fragmented into one distinct
    # row per name and the _skey equi-join dropped those samples entirely.
    # With the coalesce a NULL-labels series is the ordinary empty-label
    # series on BOTH the keyed and series sides. (Known degenerate
    # limitation, unchanged: a metric literally named U+0000 shares an
    # _skey with a NULL-named series of the same labels — unreachable from
    # any real ingest path, where names are non-NUL strings.)
    labels_nn = F.coalesce(
        F.col("labels"),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ),
    )
    keyed = samples.withColumn("_skey", series_key_str(labels=labels_nn))
    # distinct-on-strings instead of groupBy(_skey).agg(first(labels))
    # (r14): `first` over a MAP column cannot use an UnsafeRow aggregation
    # buffer, so Spark planned a Sort + SortAggregate pair per series
    # frame — a per-row sort of the whole sample stream in every operator
    # that needs its series list. All-string distinct is one codegen'd
    # hash aggregate with map-side partials; the label map is rebuilt
    # from the SAME canonical sorted-entry JSON that _skey embeds, so one
    # _skey maps to exactly one distinct row and the rebuilt map holds
    # the identical entries (to_json/from_json is lossless for
    # map<string,string>).
    series = (
        keyed.select(
            "_skey",
            "name",
            canonical_labels_json(labels_nn).alias("_lj"),
        )
        .distinct()
        .select(
            "_skey",
            "name",
            F.from_json("_lj", "map<string,string>").alias("labels"),
        )
    )
    return keyed, series


def _chunked_slot_context(
    base: DataFrame,
    key_cols: Sequence[str],
    chunk_s: float,
    a_of,
    with_prev: bool = False,
):
    """Shared hot-series chunking machinery for the slot-explode operators
    (resample_slots and rate._irate_slots): window ``base`` (key_cols +
    ts + value) on (key, floor(ts/chunk_s)) and carry each chunk's missing
    neighbors in from a per-chunk summary frame (one row per non-empty
    chunk, windowed by chunk — so a pair spanning any number of EMPTY
    chunks still resolves).

    The lead is carried as ONE STRUCT (never per-column coalesce): a
    mid-chunk sample with a NULL value must keep its own ts/value pair —
    per-column ``coalesce(lead(value), carry.value)`` would pair the
    in-chunk lead's ts with the NEXT CHUNK's value and silently break the
    bit-identical contract. Same for the lagged pair when ``with_prev``
    (irate's tp/vp).

    Returns the windowed frame with ``_a``, ``_rn``, ``_nts/_nv/_na``
    (+ ``_tp/_vp`` when ``with_prev``) and ``_sfirst`` (true on the
    series' very first sample).
    """
    if chunk_s <= 0:
        raise ValueError(f"chunk_s must be > 0, got {chunk_s}")
    base = base.withColumn("_ch", F.floor(F.col("ts") / F.lit(float(chunk_s))))
    pair = F.struct(F.col("ts"), F.col("value"))
    aggs = [F.min_by(pair, F.col("ts")).alias("_fst")]
    if with_prev:
        aggs.append(F.max_by(pair, F.col("ts")).alias("_lst"))
    sw = Window.partitionBy(*key_cols).orderBy("_ch")
    sel = [
        *key_cols,
        "_ch",
        F.lead("_fst").over(sw).alias("_carry"),
        F.row_number().over(sw).alias("_chrn"),
    ]
    if with_prev:
        sel.append(F.lag("_lst").over(sw).alias("_prevlast"))
    summ = base.groupBy(*key_cols, "_ch").agg(*aggs).select(*sel)
    cw = Window.partitionBy(*key_cols, "_ch").orderBy("ts")
    s = (
        base.join(summ, [*key_cols, "_ch"])
        .withColumn("_a", a_of(F.col("ts")))
        .withColumn("_rn", F.row_number().over(cw))
        .withColumn("_nx", F.coalesce(F.lead(pair).over(cw), F.col("_carry")))
        .withColumn("_nts", F.col("_nx.ts"))
        .withColumn("_nv", F.col("_nx.value"))
        # _na via the same pure a_of the next chunk applies to its own
        # first sample — bit-identical to lead(_a) for in-chunk leads
        .withColumn(
            "_na",
            F.when(F.col("_nx").isNull(), F.lit(None).cast("long")).otherwise(
                a_of(F.col("_nx.ts"))
            ),
        )
        .withColumn("_sfirst", (F.col("_chrn") == 1) & (F.col("_rn") == 1))
    )
    if with_prev:
        s = (
            s.withColumn(
                "_pv", F.coalesce(F.lag(pair).over(cw), F.col("_prevlast"))
            )
            .withColumn("_tp", F.col("_pv.ts"))
            .withColumn("_vp", F.col("_pv.value"))
        )
    return s


def resample_slots(
    samples: DataFrame,
    grid,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
    slot_from: int = 0,
    chunk_s: float | None = None,
):
    """Sort-free interpolation onto a REGULAR grid.

    The union+window as-of path sorts (samples + probes) — at G grid points
    per series that is an O(S·G) shuffle+sort. For a regular grid the slots
    each adjacent sample pair covers are computable: pair (tᵢ, tᵢ₊₁) owns
    slots with ``tᵢ <= pt(slot) < tᵢ₊₁`` where ``pt(slot) = start +
    slot·step − offset``. So the output is produced directly by
    ``explode(sequence(aᵢ, aᵢ₊₁−1))`` per pair — only the SAMPLES are
    window-sorted (lead), the S·G output rows never shuffle. Measured ~2.5×
    faster at 147k series × 84 slots; the advantage grows with G.

    Bit-exactness: slot boundaries come from ``ceil((t+offset−start)/step)``
    then a ±1 correction comparing the exact probe expression against the
    sample timestamp — reproducing the window path's comparisons ulp-for-ulp.

    ``chunk_s`` is the hot-series escape hatch (the asof_join/sessionize
    carry-in pattern): the default window partitions on the series key
    alone, so one series holding most samples funnels its whole sort
    through one task. With ``chunk_s`` set, the window partitions on
    (key, floor(ts/chunk_s)) and each chunk's missing lead — the NEXT
    chunk's first sample — is carried in via a tiny per-chunk summary
    frame (one row per non-empty chunk) window-ordered by chunk, so a
    pair spanning any number of empty chunks still resolves. Every pair
    is computed exactly once with the SAME expressions, so results are
    bit-identical for any chunk width (pinned by tests and by the shared
    t3 oracle).

    Returns (df with key_cols + _slot + gts + value, series_frame_or_None,
    key_cols). ``slot_from`` may be negative (rate's extended grid).
    """
    n = len(grid)
    start, step = grid.start, grid.increment
    canonical = series_cols is None
    if canonical:
        samples, series = keyed_series(samples)
        key_cols = ["_skey"]
    else:
        series = None
        key_cols = list(series_cols)

    lo, hi = F.lit(slot_from).cast("long"), F.lit(n).cast("long")

    def pt_of(slot):
        # identical float ops to grid_probes: (start + slot·step) − offset
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
            .withColumn("_nts", F.lead("ts").over(w))
            .withColumn("_nv", F.lead("value").over(w))
            .withColumn("_na", F.lead("_a").over(w))
        )
        series_first = F.col("_rn") == 1
    else:
        s = _chunked_slot_context(
            samples.select(*key_cols, "ts", "value"), key_cols, chunk_s, a_of
        )
        series_first = F.col("_sfirst")
    pair_to = F.when(F.col("_nts").isNull(), hi).otherwise(F.col("_na"))
    ranges = F.array(
        F.struct(F.col("_a").alias("f"), pair_to.alias("u"), F.lit(0).alias("below")),
        F.struct(
            F.when(series_first, lo).otherwise(F.lit(None).cast("long")).alias("f"),
            F.col("_a").alias("u"),
            F.lit(1).alias("below"),
        ),
    )
    exploded = (
        s.select(*key_cols, "ts", "value", "_nts", "_nv", F.explode(ranges).alias("_r"))
        .filter(F.col("_r.f").isNotNull() & (F.col("_r.u") > F.col("_r.f")))
        .select(
            *key_cols,
            "ts",
            "value",
            "_nts",
            "_nv",
            F.col("_r.below").alias("_below"),
            F.explode(F.sequence(F.col("_r.f"), F.col("_r.u") - 1)).alias("_slot"),
        )
    )
    gts = F.lit(start) + F.col("_slot").cast("double") * F.lit(step)
    pt = gts - F.lit(float(offset))
    val = (
        F.when(F.col("_below") == 1, F.col("value"))  # Below → first value
        .when(F.col("_nts").isNull(), F.col("value"))  # Above → last value
        .otherwise(
            ((pt - F.col("ts")) * F.col("_nv") + (F.col("_nts") - pt) * F.col("value"))
            / (F.col("_nts") - F.col("ts"))
        )
    )
    out = exploded.select(*key_cols, "_slot", gts.alias("gts"), val.alias("value"))
    return out, series, key_cols


def resample_to_grid(
    samples: DataFrame,
    grid_df: DataFrame,
    series_cols: Sequence[str] | None = None,
    offset: float = 0.0,
    ts_col: str = "ts",
    out_col: str = "value",
    grid=None,
    chunk_s: float | None = None,
) -> DataFrame:
    """T3: align every series onto the regular grid via interpolation
    (src/timeseries.rs:57-68 driven by src/query.rs:109-124).

    With ``series_cols=None`` (default) operates on the canonical long frame
    (name, labels, ts, value) and returns the same shape on grid instants.
    With explicit ``series_cols`` (plain, non-map columns) returns
    series_cols + ``ts_col`` + ``out_col``.

    Pass the :class:`RegularTimeRange` as ``grid`` to use the sort-free
    slot-explode plan (bit-identical results, no wide shuffle of the
    grid-sized output). ``chunk_s`` (slot path only) is the hot-series
    escape hatch — see :func:`resample_slots`.
    """
    if chunk_s is not None and grid is None:
        raise ValueError("chunk_s requires the slot path — pass grid=")
    if grid is not None:
        out, series, key_cols = resample_slots(
            samples, grid, series_cols, offset, chunk_s=chunk_s
        )
        if series is not None:
            return out.join(series, "_skey").select(
                "name", "labels", F.col("gts").alias(ts_col), F.col("value").alias(out_col)
            )
        return out.select(
            *key_cols, F.col("gts").alias(ts_col), F.col("value").alias(out_col)
        )
    if series_cols is None:
        # Maps never enter the wide union/window/shuffle: only the string
        # series key rides along; (name, labels) come back via a join with
        # the small per-series frame (AQE turns it into a broadcast join).
        keyed, series = keyed_series(samples)
        probes = grid_probes(series.select("_skey"), grid_df, offset)
        out = interpolate_at_probes(
            keyed, probes, ["_skey"], carry_cols=["gts"], out_col=out_col
        )
        return out.join(series, "_skey").select(
            "name", "labels", F.col("gts").alias(ts_col), out_col
        )
    series = samples.select(*series_cols).distinct()
    probes = grid_probes(series, grid_df, offset)
    out = interpolate_at_probes(samples, probes, series_cols, carry_cols=["gts"], out_col=out_col)
    return out.select(*series_cols, F.col("gts").alias(ts_col), out_col)
