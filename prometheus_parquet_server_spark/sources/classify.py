"""Schema probe + metric-type classification (S2, S3 in SURVEY.md §2.1).

Reference parity: /root/reference/src/metricstore.rs:104-187 (column
classification) and :389-436 (TaggedMetricType from value-column names).

Column rules (by Spark type, mirroring the parquet-physical-type rules):
- numeric (or timestamp — parquet stores those as INT64/INT96) named
  ``time`` / ``timestamp`` / ``__time__`` → THE time column (exactly one);
- any other numeric → value column;
- string/binary → label column;
- boolean → hard error (metricstore.rs:138-141).

Metric typing from the set of value-column names (metricstore.rs:389-436):
- exactly one value column → SingleColumn;
- ≥1 column matching the ``Le…`` bucket regex and every other value column
  in {count, sum, max} → Histogram; a mixture with anything else → error;
- several value columns, none bucket-like → MultiColumn.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T

from prometheus_parquet_server_spark.labels import LE_COLUMN_RE

TIME_COLUMN_NAMES = ("time", "timestamp", "__time__")
HISTOGRAM_AUX = ("count", "sum", "max")


class IngestError(ValueError):
    """Schema/typing rejection, mirroring the reference's ingest errors."""


class MetricType(Enum):
    SINGLE = "single"
    MULTI = "multi"
    HISTOGRAM = "histogram"


@dataclass(frozen=True)
class ColumnClassification:
    time_column: str
    value_columns: tuple[str, ...]
    label_columns: tuple[str, ...]
    metric_type: MetricType


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, (T.NumericType, T.TimestampType, T.TimestampNTZType, T.DateType))


def classify_columns(schema: T.StructType) -> ColumnClassification:
    """S2: classify a wide DataFrame's columns (metricstore.rs:104-187)."""
    time_cols: list[str] = []
    value_cols: list[str] = []
    label_cols: list[str] = []
    for field in schema.fields:
        if isinstance(field.dataType, T.BooleanType):
            raise IngestError(f"boolean column {field.name!r} is not supported")
        if _is_numeric(field.dataType):
            if field.name in TIME_COLUMN_NAMES:
                time_cols.append(field.name)
            else:
                value_cols.append(field.name)
        elif isinstance(field.dataType, (T.StringType, T.BinaryType)):
            label_cols.append(field.name)
        else:
            raise IngestError(
                f"column {field.name!r} has unsupported type {field.dataType.simpleString()}"
            )
    if len(time_cols) != 1:
        raise IngestError(
            f"expected exactly one time column from {TIME_COLUMN_NAMES}, got {time_cols}"
        )
    if not value_cols:
        raise IngestError("no value columns found")
    return ColumnClassification(
        time_column=time_cols[0],
        value_columns=tuple(value_cols),
        label_columns=tuple(label_cols),
        metric_type=classify_metric_type(value_cols),
    )


def classify_metric_type(value_columns: list[str]) -> MetricType:
    """S3: SingleColumn / MultiColumn / Histogram (metricstore.rs:389-436)."""
    buckets = [c for c in value_columns if LE_COLUMN_RE.match(c)]
    if buckets:
        others = [c for c in value_columns if not LE_COLUMN_RE.match(c)]
        bad = [c for c in others if c not in HISTOGRAM_AUX]
        if bad:
            raise IngestError(
                f"histogram metric mixes bucket columns with non-histogram columns {bad}"
            )
        return MetricType.HISTOGRAM
    if len(value_columns) == 1:
        return MetricType.SINGLE
    return MetricType.MULTI
