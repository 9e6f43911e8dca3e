"""Bucketed range join — point-in-interval joins without a nested loop.

Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` predicate (plus any
key equality) as BroadcastNestedLoopJoin or a cartesian product — O(n·m)
and the canonical 100 TB killer. The standard fix (the same trick behind
Databricks' range-join optimization and KDB's bucketed asof): quantize
time into ``bucket_width`` buckets, explode each interval onto every
bucket it covers, equi-join points to intervals on (keys…, bucket), and
re-check the exact predicate. Each point lives in exactly ONE bucket, so
a qualifying (point, interval) pair meets exactly once — no dedup pass.

Cost model: the shuffle keys on (by, bucket) — skew-free if intervals are
short relative to ``bucket_width`` × key cardinality; candidate pairs per
bucket ≈ points × intervals co-resident in that bucket, so pick
``bucket_width`` near the typical interval length (width ≫ intervals
re-creates the blowup bucket-locally; width ≪ intervals explodes interval
copies ≈ length/width per row — linear, bounded, and spread across the
cluster either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple[str, ...] = (),
    bucket_width: float = 3600.0,
    inclusive_end: bool = True,
    max_buckets_per_interval: int = 1_000_000,
) -> DataFrame:
    """All (point, interval) pairs with ``start ≤ ts ≤ end`` (or ``< end``
    with ``inclusive_end=False``) and equal ``by`` keys. Output carries
    every point column plus every interval column (names must not clash
    apart from the ``by`` keys). Intervals where ``end < start`` match
    nothing; NULL, NaN and ±Inf bounds match nothing (a non-finite
    sentinel would otherwise ask ``F.sequence`` to materialize unbounded
    bucket lists — callers using +Inf as an open-ended-interval sentinel
    get silent no-match, same as NULL, not a query abort). An interval
    spanning more than ``max_buckets_per_interval`` buckets — huge but
    FINITE — raises at execution rather than silently OOM-ing an executor;
    if that trips, the caller's ``bucket_width`` is far too small for
    their interval lengths.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    if max_buckets_per_interval < 1:
        raise ValueError(
            f"max_buckets_per_interval must be >= 1, got {max_buckets_per_interval}"
        )
    clash = (set(points.columns) & set(intervals.columns)) - set(by)
    if clash:
        raise ValueError(f"column name clash outside by keys: {sorted(clash)}")
    bw = F.lit(float(bucket_width))
    span_buckets = F.floor(F.col(end_col) / bw) - F.floor(F.col(start_col) / bw)
    inf = F.lit(float("inf"))
    i = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & ~F.isnan(F.col(start_col).cast("double"))
        & ~F.isnan(F.col(end_col).cast("double"))
        & (F.col(start_col).cast("double") > -inf)
        & (F.col(end_col).cast("double") < inf)
        & (F.col(end_col) >= F.col(start_col))
    )
    p = points.withColumn("_bucket", F.floor(F.col(ts_col) / bw))
    # the guard lives INSIDE the sequence's upper bound — as a separate
    # projected-then-dropped column Catalyst would prune it as dead code
    # and the error would never fire
    guarded_hi = F.when(
        span_buckets < F.lit(int(max_buckets_per_interval)),
        F.floor(F.col(end_col) / bw),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join: interval spans too many buckets "
                    f"(>= {max_buckets_per_interval}) at bucket_width="
                    f"{bucket_width}; interval ["
                ),
                F.col(start_col).cast("string"),
                F.lit(", "),
                F.col(end_col).cast("string"),
                F.lit("] — raise bucket_width or drop sentinel bounds"),
            )
        ).cast("long")
    )
    i = i.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col(start_col) / bw), guarded_hi)),
    )
    upper = (
        F.col(ts_col) <= F.col(end_col)
        if inclusive_end
        else F.col(ts_col) < F.col(end_col)
    )
    return (
        p.join(i, [*by, "_bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & upper)
        .drop("_bucket")
    )
