"""Label-manipulation and presence functions (beyond-reference surface).

The reference has no label functions (its 4-function set:
/root/reference/src/query.rs:246-255). PromQL semantics implemented:

- ``label_replace(v, dst, replacement, src, regex)`` — the regex is FULLY
  ANCHORED (``^(?:re)$``, Prometheus wraps it the same way); an absent src
  label matches as the empty string; ``$1``-style group references in the
  replacement (Java regex and RE2 agree on ``$n``); an empty result removes
  the dst label.
- ``label_join(v, dst, sep, src...)`` — absent source labels join as empty
  strings; empty result removes dst.
- ``absent(v)`` — one all-labels-empty series valued 1.0 at every grid
  instant where the operand has NO samples (grid-aligned frames carry every
  instant for every series, so absence is per-selection, computed with one
  anti-join against the tiny distinct-ts frame).
- ``timestamp(v)`` — each sample's value becomes its grid timestamp.

All are narrow Column transforms except absent's anti-join (broadcast of a
≤ grid-length frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.labels import NAME_LABEL


def _label_get(src: str) -> Column:
    """Label value with PromQL absent-as-empty semantics; ``__name__`` reads
    the name column."""
    v = F.col("name") if src == NAME_LABEL else F.col("labels").getItem(src)
    return F.coalesce(v, F.lit(""))


def _with_label(labels: Column, dst: str, value: Column) -> Column:
    """labels with dst set to value (removed when value is empty)."""
    without = F.map_filter(labels, lambda k, _: k != F.lit(dst))
    return F.when(value == "", without).otherwise(
        F.map_concat(without, F.create_map(F.lit(dst), value))
    )


def label_replace(
    df: DataFrame, dst: str, replacement: str, src: str, regex: str
) -> DataFrame:
    anchored = f"^(?:{regex})$"
    srcv = _label_get(src)
    matched = srcv.rlike(anchored)
    newv = F.regexp_replace(srcv, anchored, replacement)
    if dst == NAME_LABEL:
        name_out = F.when(~matched, F.col("name")).otherwise(
            F.when(newv == "", F.lit(None).cast("string")).otherwise(newv)
        )
        return df.select(
            name_out.alias("name"), "labels", "ts", "value"
        )
    labels_out = F.when(~matched, F.col("labels")).otherwise(
        _with_label(F.col("labels"), dst, newv)
    )
    return df.select("name", labels_out.alias("labels"), "ts", "value")


def label_join(df: DataFrame, dst: str, sep: str, srcs: list[str]) -> DataFrame:
    joined = F.concat_ws(sep, *[_label_get(s) for s in srcs])
    if dst == NAME_LABEL:
        name_out = F.when(joined == "", F.lit(None).cast("string")).otherwise(joined)
        return df.select(name_out.alias("name"), "labels", "ts", "value")
    return df.select(
        "name", _with_label(F.col("labels"), dst, joined).alias("labels"), "ts", "value"
    )


def absent_over_grid(
    df: DataFrame, grid_df: DataFrame, eq_labels: dict[str, str] | None = None
) -> DataFrame:
    """Grid instants with no samples in the selection → value 1.0.

    ``eq_labels``: the selector's equality matchers (Prometheus derives the
    absent() result labels from them — ``absent(up{job="api"})`` yields
    ``{job="api"}``; regex/negative matchers and ``__name__`` contribute
    nothing). Absence is per-selection (our frames are grid-aligned: a
    matched series has a row — possibly NaN — at every instant), so the
    result is non-empty only when the selector matched no series at all;
    see COVERAGE.md."""
    present = df.select(F.col("ts").alias("gts")).distinct()
    if eq_labels:
        ks, vs = zip(*sorted(eq_labels.items()))
        out_labels = F.map_from_arrays(
            F.array(*[F.lit(k) for k in ks]), F.array(*[F.lit(v) for v in vs])
        )
    else:
        out_labels = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    return grid_df.join(F.broadcast(present), "gts", "anti").select(
        F.lit(None).cast("string").alias("name"),
        out_labels.alias("labels"),
        F.col("gts").alias("ts"),
        F.lit(1.0).alias("value"),
    )


def timestamp_of(df: DataFrame) -> DataFrame:
    """``timestamp(v)``: value := sample timestamp (name dropped)."""
    return df.select(
        F.lit(None).cast("string").alias("name"),
        "labels",
        "ts",
        F.col("ts").alias("value"),
    )
