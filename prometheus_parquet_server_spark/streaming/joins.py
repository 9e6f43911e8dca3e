"""Watermarked stream-stream interval join.

The last core Structured Streaming surface the engine exposes: enrich one
event stream with the other's recent history — every left row pairs with
the right rows of the same key whose event time falls in
``[left_time - range_s, left_time]``. This is Spark's canonical
stream-stream join shape (event-time range condition + watermarks on BOTH
sides), which is exactly what bounds the join state: a right-side row can
be dropped from state once the watermark passes ``right_time + range_s``,
a left-side row once it passes ``left_time`` (inner) or after the outer
grace (leftOuter).

Batch parity is free: ``withWatermark`` is a no-op on batch frames, so the
SAME function serves the graded oracle row (batch input, DuckDB interval
join as the oracle) and the streaming drain (availableNow parity test in
tests/test_streaming_server.py). The reference has no streaming surface
(SURVEY.md §2.7) — this is north-star scope, same as the rest of this
package.

At 100 TB/day the file source becomes Kafka; the join itself shuffles both
sides on the key — uniform user-style keys need no salting, and state per
key is bounded by ``range_s`` × arrival rate, not by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_time: str = "left_time",
    right_time: str = "right_time",
    range_s: float = 21600.0,
    watermark: str | None = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` with the ``right`` rows of the same ``on`` key whose
    ``right_time`` lies in ``[left_time - range_s, left_time]``.

    Time columns must be distinct names (they both survive into the
    output); all other non-key columns pass through. ``watermark`` is
    applied to each side's own time column — required for streaming state
    cleanup (and mandatory for ``leftOuter``, where Spark refuses to plan
    the join without it); pass None only for ad-hoc batch use.
    ``how``: ``inner`` or ``leftOuter`` (unmatched left rows emit once the
    watermark passes their join horizon).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    if range_s < 0:
        raise ValueError(f"range_s must be >= 0, got {range_s}")
    if left_time == right_time:
        raise ValueError("left_time and right_time must be distinct names")
    la = (left.withWatermark(left_time, watermark) if watermark else left).alias(
        "__ivl"
    )
    ra = (right.withWatermark(right_time, watermark) if watermark else right).alias(
        "__ivr"
    )
    lt, rt = F.col(f"__ivl.{left_time}"), F.col(f"__ivr.{right_time}")
    if left.schema[left_time].dataType.typeName().startswith("timestamp"):
        lower = lt - F.make_dt_interval(secs=F.lit(float(range_s)))
    else:  # numeric epoch seconds (batch convenience)
        lower = lt - F.lit(float(range_s))
    cond = (
        (F.col(f"__ivl.{on}") == F.col(f"__ivr.{on}"))
        & (rt >= lower)
        & (rt <= lt)
    )
    return la.join(ra, cond, how).drop(F.col(f"__ivr.{on}"))
