"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship PromQL pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
family from SURVEY.md §2 plus the training-data pipeline operators, each
checked against a DuckDB oracle (see
prometheus_parquet_server_spark/driver_contract.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> None:
    """Apply the engine's semantic configs to a driver-provided session
    (nanosecond parquet timestamps, IEEE division, map dedup)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    if spark.sparkContext.master.startswith("local"):
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full PromQL stack over /root/testdata/sf0.001 — parse,
    compile, rate over a range vector, sum across series on a regular grid."""
    _configure(spark)
    from prometheus_parquet_server_spark.driver_contract import q_promql_sum_rate

    return q_promql_sum_rate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from prometheus_parquet_server_spark.driver_contract import QUERIES

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from prometheus_parquet_server_spark.driver_contract import ORACLES

    return dict(ORACLES)
