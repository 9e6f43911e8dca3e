"""Canonical-store sink/source (S10 in SURVEY.md §2.1).

Reference parity: ``TimeSeriesCollection`` (src/timeseries.rs:396-445) — a
name-keyed in-memory map with a global min/max-time index. Here the store IS
the long table written ``partitionBy("name")``: the reference's name-hash
probe becomes Catalyst partition pruning, and min/max come from a one-line
aggregate (parquet footer statistics make it a metadata-only scan).

Scale: partitioning by metric name bounds every selector scan to one
partition tree; within a partition, files are sorted by the series key so
per-series windows mostly avoid wide shuffles (AQE handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.model import series_key_str


def write_store(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the canonical long frame partitioned by metric name."""
    (
        df.withColumn("_sk", series_key_str())
        .sortWithinPartitions("_sk", "ts")
        .drop("_sk")
        .write.mode(mode)
        .partitionBy("name")
        .parquet(path)
    )


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_store_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist the store bucketed+sorted by the series key.

    At cluster scale this is the difference between every per-series window
    (resample/rate/irate) starting with a full shuffle of the samples and
    starting from pre-clustered files: Spark's bucketing metadata lets the
    planner skip the Exchange when the window partitions on the bucket
    column. Requires a managed/external table (bucket metadata lives in the
    catalog, not in plain parquet)."""
    writer = (
        df.withColumn("_skey", series_key_str())
        .write.mode("overwrite")
        .bucketBy(buckets, "_skey")
        .sortBy("_skey", "ts")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_store_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed store; the ``_skey`` column is the pre-computed
    series identity operators key on."""
    return spark.table(table)


def time_range(df: DataFrame) -> tuple[float, float]:
    """Global MinMaxTime (src/timeseries.rs:423-445)."""
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    return row["lo"], row["hi"]


def shift_to_midnight_offset(df: DataFrame, now: float | None = None) -> float:
    """``--shift_to_midnight`` (reference src/main.rs:207-226 +
    src/timeseries.rs:410-417): query_time_offset = today's local midnight −
    the store's min timestamp. Queries subtract it from their grid
    (RegularTimeRange.time_offset) and serialization adds it back per point
    (json_out.matrix_result time_offset) — so recorded test data appears to
    start "today" in Grafana."""
    import time as _time

    now = _time.time() if now is None else now
    local = _time.localtime(now)
    midnight = _time.mktime(
        (local.tm_year, local.tm_mon, local.tm_mday, 0, 0, 0, -1, -1, -1)
    )
    min_ts, _ = time_range(df)
    return float(midnight) - float(min_ts)
