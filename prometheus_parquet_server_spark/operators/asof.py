"""General as-of join — the temporal join Spark's DataFrame API lacks.

For every left row, attach the most recent right row at-or-before its
timestamp (``direction="backward"``; ``"forward"`` takes the earliest
at-or-after), matching within ``by`` key groups, optionally bounded by a
``tolerance`` window. The same locate-last-sample-before-t primitive the
PromQL resampler uses internally (operators/interpolate.py `_asof_context`),
exposed as a standalone relational operator.

Implementation — union + one window, not a range join: both sides are
unioned with a side tag, and one ``last(..., ignorenulls=True)`` window
per right column, ordered by ``(on, side)`` within ``by`` partitions,
carries the latest right values forward onto left rows. Equal timestamps
order the right row first, so an exact-timestamp match is taken (the same
tie rule as DuckDB's ``ASOF JOIN ... ON l.t >= r.t`` oracle).

Scale shape: ONE shuffle — the window's hash exchange on ``by`` — and a
per-partition sort, regardless of how many right columns are carried
(all ``last`` calls share the window frame). A broadcast-range-join
formulation would duplicate right rows per left row and re-aggregate;
a per-left-row binary search would be a driver loop. If both inputs are
bucketed/sorted by ``by`` the exchange vanishes entirely (EXPLAIN.md §5).

Determinism: when several right rows share (by, on), "the" as-of row is
ambiguous — callers should pre-aggregate the right side to unique
(by, on) keys (the oracle queries dedupe with MAX, the house rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = ("value",),
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_asof",
    chunk_s: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns, plus ``<c><suffix>`` for each of
    ``right_cols`` and ``<on><suffix>`` (the matched right timestamp) —
    NULL where no right row qualifies (or the match falls outside
    ``tolerance``, measured in ``on`` units). Rows with a NULL timestamp
    match nothing on either side — the DuckDB ASOF comparison semantics.

    ``chunk_s`` is the hot-key escape hatch: the default single window
    partitions on ``by`` alone, so ONE key holding billions of rows
    funnels through one task — the classic skew wall. With ``chunk_s``
    set, rows partition on ``(by, floor(on / chunk_s))`` instead, every
    partition is bounded by the chunk's row count, and correctness is
    restored by seeding each chunk with a carry-in row: the last (first,
    for ``forward``) right row of all earlier (later) chunks, computed on
    the tiny per-(key, chunk) seed frame and cascaded with one cheap
    window there. Costs two extra small shuffles (distinct chunk keys +
    the seed cascade); identical results to the unchunked path for any
    chunk width (pinned by tests).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if chunk_s is not None and chunk_s <= 0:
        raise ValueError(f"chunk_s must be > 0, got {chunk_s}")
    bys = list(by)
    payload = [c for c in left.columns if c not in bys and c != on]
    out_cols = [f"{c}{suffix}" for c in right_cols]
    on_out = f"{on}{suffix}"
    outs = [on_out, *out_cols]
    if len(set(outs)) != len(outs):
        raise ValueError(
            f"asof output names collide among themselves: {outs} "
            f"(right_cols must not contain the on column or duplicates)"
        )
    clash = set(left.columns) & ({*outs, "_side", "_r", "_chunk"})
    if clash:
        raise ValueError(
            f"left columns clash with asof output/helper names: {sorted(clash)} "
            f"(rename them or pass a different suffix)"
        )
    import pyspark.sql.types as T

    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)
    # the matched right row travels as ONE struct so its (timestamp,
    # values) stay a unit — per-column last(ignorenulls) would skip a
    # NULL payload value and pair an OLDER row's value with a newer
    # row's timestamp (DuckDB ASOF returns the newest row's NULL as-is)
    rstruct = T.StructType(
        [T.StructField(on_out, rtypes[on])]
        + [T.StructField(o, rtypes[c]) for c, o in zip(right_cols, out_cols)]
    )
    l = left.select(
        *bys,
        F.col(on),
        *payload,
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct).alias("_r"),
    )
    # NULL-timestamp right rows can never be "the most recent at-or-before"
    # anything (DuckDB ASOF `l.ts >= r.ts` matches nothing for NULL) — and
    # under the window ordering they would sort FIRST and leak their
    # payload into every match, so drop them before the union. NULL `by`
    # keys likewise: the ASOF equality `l.k = r.k` is never true for NULL,
    # but Window.partitionBy groups NULLs into one partition and would
    # match NULL-keyed left rows to NULL-keyed right rows — drop the
    # latter so NULL-keyed left rows come back unmatched, like the oracle
    right_keep = F.col(on).isNotNull()
    for b in bys:
        right_keep = right_keep & F.col(b).isNotNull()
    ltypes = dict((f.name, f.dataType) for f in left.schema.fields)
    r = right.filter(right_keep).select(
        *bys,
        F.col(on),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in payload],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).alias(on_out),
            *[F.col(c).alias(o) for c, o in zip(right_cols, out_cols)],
        ).alias("_r"),
    )
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    backward = direction == "backward"
    if chunk_s is None:
        union = l.unionByName(r)
        w = (
            Window.partitionBy(*bys)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # hot-key mode: partition on (by, time chunk) so no single key
        # serializes, and seed each chunk with the carry-in right row
        # (the winner of all earlier chunks) computed on the tiny
        # per-(key, chunk) seed frame
        ck = F.floor(F.col(on) / F.lit(float(chunk_s)))
        l = l.withColumn("_chunk", ck)
        r = r.withColumn("_chunk", ck)
        seed_pick = (
            F.max_by("_r", F.col(on)) if backward else F.min_by("_r", F.col(on))
        )
        seeds = r.groupBy(*bys, "_chunk").agg(seed_pick.alias("_seed"))
        chunks = (
            l.select(*bys, "_chunk")
            .filter(F.col("_chunk").isNotNull())
            .unionByName(r.select(*bys, "_chunk"))
            .distinct()
        )
        corder = F.col("_chunk").asc() if backward else F.col("_chunk").desc()
        cw = (
            Window.partitionBy(*bys)
            .orderBy(corder)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            chunks.join(seeds, [*bys, "_chunk"], "left")
            .withColumn("_carry", F.last("_seed", ignorenulls=True).over(cw))
            .filter(F.col("_carry").isNotNull())
        )
        # the pseudo row's `on` is ONLY a sort key placing it before every
        # real row of its chunk (the true matched timestamp rides inside
        # the struct); a real right row exactly on the boundary wins via
        # the side tie-break (-1 sorts first, last() keeps the later row)
        boundary = (
            (F.col("_chunk") * F.lit(float(chunk_s)))
            if backward
            else ((F.col("_chunk") + 1) * F.lit(float(chunk_s)))
        )
        pseudo = carry.select(
            *bys,
            boundary.cast(ltypes[on]).alias(on),
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in payload],
            F.lit(-1).alias("_side"),
            F.col("_carry").alias("_r"),
            "_chunk",
        )
        union = l.unionByName(r).unionByName(pseudo)
        w = (
            Window.partitionBy(*bys, "_chunk")
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = union.select(
        *bys,
        on,
        *payload,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    # a NULL-timestamp LEFT row matches nothing either (it would sort last
    # under the forward/desc ordering and spuriously pick up the earliest
    # right row); tolerance additionally nulls stale matches
    matched_ts = F.col("_r").getField(on_out)
    within = F.col(on).isNotNull() & F.col("_r").isNotNull()
    if tolerance is not None:
        gap = (
            F.col(on) - matched_ts
            if direction == "backward"
            else matched_ts - F.col(on)
        )
        within = within & (gap <= F.lit(tolerance))
    return out.select(
        *bys,
        on,
        *payload,
        *[F.when(within, F.col("_r").getField(o)).alias(o) for o in out_cols],
        F.when(within, matched_ts).alias(on_out),
    )
