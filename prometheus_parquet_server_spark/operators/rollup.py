"""Multi-resolution time rollups (hypertable / continuous-aggregate
style): minute → hour → day levels where every level re-aggregates the
PREVIOUS level's partials, never the raw rows.

The scale point: at 100 TB the raw table is scanned exactly once (for the
finest level); each coarser level reads ``previous_rows / fanout`` partial
rows, so the whole cascade costs ~1 raw scan + ε, and any level can serve
queries at its own granularity. This only works for ASSOCIATIVE partials —
(count, sum, min, max) re-combine exactly; avg is derived at read time as
sum/count, never averaged-of-averages. The cascade is proven equal to
direct aggregation from raw by the oracle gate (the DuckDB oracle groups
the raw table straight to the coarsest level) and by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the associative partial set every level carries
_PARTIALS = ("n", "sum_v", "min_v", "max_v")


def time_bucket_partials(
    df: DataFrame,
    width_s: float,
    ts_col: str = "ts",
    value_col: str = "value",
    by: tuple[str, ...] = (),
    exact: bool = False,
    unit_scale: float | None = None,
) -> DataFrame:
    """Finest level: raw rows → (by…, bucket_ts, n, sum_v, min_v, max_v)
    with ``bucket_ts = floor(ts / width) · width`` (epoch seconds).

    ``unit_scale`` (mutually exclusive with ``exact``) accumulates
    ``sum_v`` as BIGINT integer units ``FLOOR(v·scale + 0.5)`` — exact,
    associative, AND bit-stable across engines (the graded-oracle
    contract; see operators.aggregate.unit_sum): the cascade recombines
    integer partials, and the serving layer rescales with one exact
    bigint→double cast + one IEEE division. Same loud-failure contract as
    exact mode: NaN or |v| ≥ LONG_SAFE/scale raises.

    ``exact=True`` accumulates ``sum_v`` as DECIMAL(38,9) — and keeps it
    decimal up the cascade — so the recombined sums are a pure function of
    the data, independent of partial-sum order (reproducible-results mode;
    float sums at a rounding boundary flip digits run-to-run). Exact mode
    REQUIRES finite in-range values: NaN/Inf (or |v| ≥ 1e29) would cast to
    decimal NULL and silently vanish from the sum, so the cast is guarded
    by a live ``raise_error`` — a dirty batch fails the job loudly instead
    of producing clean-looking wrong partials."""
    if width_s <= 0:
        raise ValueError(f"width_s must be > 0, got {width_s}")
    bucket = (F.floor(F.col(ts_col) / F.lit(width_s)) * F.lit(width_s)).alias(
        "bucket_ts"
    )
    if exact and unit_scale is not None:
        raise ValueError("pass at most one of exact / unit_scale")
    if unit_scale is not None:
        from prometheus_parquet_server_spark.operators.aggregate import LONG_SAFE

        sc = float(unit_scale)
        v = F.col(value_col)
        bad = v.isNotNull() & (F.isnan(v) | (F.abs(v) >= F.lit(LONG_SAFE / sc)))
        # raise INSIDE the summed expression (a dropped guard column would
        # be pruned as dead code by Catalyst) — same shape as exact mode
        sum_in = F.when(
            bad,
            F.raise_error(
                F.lit(
                    "rollup unit_scale requires finite values with "
                    "|v| < LONG_SAFE/scale; got NaN/Inf/overflow"
                )
            ).cast("long"),
        ).otherwise(F.floor(v * F.lit(sc) + F.lit(0.5)).cast("long"))
    elif exact:
        v = F.col(value_col)
        dec = v.cast(T.DecimalType(38, 9))
        # NaN/Inf/overflow all cast to decimal NULL — one comparison
        bad = v.isNotNull() & dec.isNull()
        # the raise lives INSIDE the summed expression (a projected-then-
        # dropped guard column would be pruned as dead code by Catalyst)
        sum_in = F.when(
            bad,
            F.raise_error(
                F.lit(
                    "rollup exact=True requires finite DECIMAL(38,9)-range "
                    "values; got NaN/Inf/overflow"
                )
            ).cast(T.DecimalType(38, 9)),
        ).otherwise(dec)
    else:
        sum_in = F.col(value_col)
    return df.groupBy(*by, bucket).agg(
        F.count("*").alias("n"),
        F.sum(sum_in).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def rollup_level(
    partials: DataFrame, width_s: float, by: tuple[str, ...] = ()
) -> DataFrame:
    """Coarser level FROM a finer level: re-bucket ``bucket_ts`` and
    combine partials (sum of counts/sums, min of mins, max of maxes).
    ``width_s`` must be a multiple of the finer width for exact nesting."""
    if width_s <= 0:
        raise ValueError(f"width_s must be > 0, got {width_s}")
    bucket = (
        F.floor(F.col("bucket_ts") / F.lit(width_s)) * F.lit(width_s)
    ).alias("bucket_ts")
    return partials.groupBy(*by, bucket).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_ingest(
    spark,
    store_path: str,
    df: DataFrame,
    width_s: float = 60.0,
    ts_col: str = "ts",
    value_col: str = "value",
    name_col: str = "event_type",
    txn: tuple[str, int] | None = None,
    unit_scale: float | None = None,
) -> int:
    """Continuous-aggregate maintenance: fold a NEW raw batch into the
    persisted finest-level partials WITHOUT rescanning history — the
    at-scale answer to "keep a day-level dashboard current over 100 TB of
    events" (only the new batch is aggregated; the store-side rewrite
    touches only the files whose name ranges intersect the batch, via
    :func:`snapshot_merge`'s commit protocol — crash-safe, time-travelable,
    retention via plain ``snapshot_expire`` manifest arithmetic).

    Partials are stored in the canonical (name, ts) key layout (``ts`` =
    bucket start) with the associative columns (n, sum_v decimal, min_v,
    max_v); decimal ``exact`` accumulation end-to-end makes N incremental
    ingests bit-equal to one shot over the union — certified by the
    rollup_incremental oracle row against direct DuckDB aggregation.
    Returns the committed snapshot version."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_merge,
    )

    # NaN ts would bucket to 0.0 (Spark floor(NaN)=0) BEFORE the snapshot
    # store's NaN-key rejection could see it — guard the raw key here so a
    # dirty batch fails loudly instead of folding into the epoch-0 bucket
    raw_ts = F.col(ts_col)
    guarded_ts = F.when(
        F.isnan(raw_ts),
        F.raise_error(F.lit("rollup_ingest: NaN ts in the raw batch")).cast(
            "double"
        ),
    ).otherwise(raw_ts)
    # unit_scale=None keeps the decimal-exact partial store; a unit store
    # (BIGINT partials, bit-stable serving — see time_bucket_partials)
    # records its scale as a store property so every later ingest and the
    # serving layer agree on the unit
    partials = time_bucket_partials(
        df.select(
            F.col(name_col).alias("name"),
            guarded_ts.alias("ts"),
            F.col(value_col).alias("value"),
        ),
        width_s,
        by=("name",),
        exact=unit_scale is None,
        unit_scale=unit_scale,
    ).select("name", F.col("bucket_ts").alias("ts"), "n", "sum_v", "min_v", "max_v")

    def _combine(existing: DataFrame | None, new: DataFrame) -> DataFrame:
        if existing is None:
            return new
        u = existing.select(*new.columns).unionByName(new)
        # associative recombination — the same partial algebra the cascade
        # levels use, so fold order never matters
        return u.groupBy("name", "ts").agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )

    # the ingest width is pinned as a store property: a second ingest at a
    # different width raises in snapshot_merge (mixing granularities would
    # silently corrupt every later read), and rollup_read validates its
    # requested serving width nests exactly in the recorded one
    return snapshot_merge(
        spark,
        store_path,
        partials,
        _combine,
        properties=(
            {"rollup_width_s": float(width_s)}
            if unit_scale is None
            else {
                "rollup_width_s": float(width_s),
                "rollup_unit_scale": float(unit_scale),
            }
        ),
        # (app_id, batch_version) → idempotent redelivery: a batch whose
        # version is already recorded in the manifest folds exactly once
        txn=txn,
    )


def rollup_read(
    spark,
    store_path: str,
    width_s: float | None = None,
    names: list[str] | None = None,
    ts_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Serve a rollup store written by :func:`rollup_ingest`: manifest
    pruning applies (names / ts_range hit the snapshot file stats before
    any footer opens), and ``width_s`` re-buckets the persisted finest
    partials up to any exactly-nesting coarser level — reading
    ``stored_rows / fanout`` partial rows, never raw events. The store's
    recorded ingest width (manifest property ``rollup_width_s``) is
    validated: a serving width that does not nest EXACTLY (``width ==
    k·stored`` bit-for-bit) raises instead of silently re-bucketing
    partials across misaligned boundaries (stores from before the
    property was recorded skip the check, documented legacy). Returns
    (name, bucket_ts, n, sum_v, min_v, max_v)."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
    )

    if width_s is not None:
        stored_w = snapshot_properties(spark, store_path).get("rollup_width_s")
        if stored_w is not None:
            k = round(width_s / stored_w)
            if k < 1 or stored_w * k != width_s:
                raise ValueError(
                    f"serving width {width_s} does not nest exactly in the "
                    f"store's ingest width {stored_w} (need width == "
                    f"k*stored exactly in float arithmetic)"
                )
    df = snapshot_read(spark, store_path, names=names, ts_range=ts_range)
    partials = df.select(
        "name", F.col("ts").alias("bucket_ts"), "n", "sum_v", "min_v", "max_v"
    )
    if width_s is None:
        return partials
    return rollup_level(partials, width_s, by=("name",))


def rollup_cascade(
    df: DataFrame,
    widths_s: tuple[float, ...] = (60.0, 3600.0, 86400.0),
    ts_col: str = "ts",
    value_col: str = "value",
    by: tuple[str, ...] = (),
    exact: bool = False,
    unit_scale: float | None = None,
) -> dict[float, DataFrame]:
    """Build every level, finest first; each ``widths_s[i+1]`` must nest
    exactly in ``widths_s[i]`` (``b == k·a`` bit-for-bit). Returns {width → level frame};
    read ``avg`` as ``sum_v / n`` at whichever level serves the query.
    ``exact``: decimal ``sum_v`` partials end-to-end (order-insensitive;
    see :func:`time_bucket_partials`) — re-summing a DECIMAL(38,9) column
    stays DECIMAL(38,9), so every cascade level keeps exactness.
    ``unit_scale``: BIGINT integer-unit partials instead (exact,
    associative, and bit-stable across engines — the graded contract);
    the caller rescales served sums by ``1/scale``."""
    if not widths_s:
        raise ValueError("need at least one rollup width")
    for a, b in zip(widths_s, widths_s[1:]):
        # exact-nesting check: b must equal k·a BIT-FOR-BIT, because the
        # buckets are floor(ts/width)·width — with an inexact quotient
        # (e.g. 0.1→0.3, where floor(0.3/0.1) is floor(2.999…) = 2) rows
        # silently migrate between coarse buckets and the cascade stops
        # equaling direct aggregation. Integer-second widths always pass.
        k = round(b / a)
        if k < 1 or a * k != b:
            raise ValueError(
                f"width {b} does not nest exactly in finer width {a} "
                f"(need b == k*a exactly in float arithmetic)"
            )
    levels: dict[float, DataFrame] = {}
    current = time_bucket_partials(
        df, widths_s[0], ts_col, value_col, by, exact=exact, unit_scale=unit_scale
    )
    levels[widths_s[0]] = current
    for w in widths_s[1:]:
        current = rollup_level(current, w, by)
        levels[w] = current
    return levels
