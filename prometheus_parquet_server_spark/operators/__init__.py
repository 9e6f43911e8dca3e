from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.interpolate import (
    interpolate_at_probes,
    resample_to_grid,
)
from prometheus_parquet_server_spark.operators.rate import irate_to_grid, rate_to_grid
from prometheus_parquet_server_spark.operators.histogram import histogram_quantile
from prometheus_parquet_server_spark.operators.aggregate import sum_over_series
from prometheus_parquet_server_spark.operators.asof import asof_join
from prometheus_parquet_server_spark.operators.range_join import range_join
from prometheus_parquet_server_spark.operators.rollup import (
    rollup_cascade,
    rollup_level,
    time_bucket_partials,
)

__all__ = [
    "RegularTimeRange",
    "asof_join",
    "range_join",
    "rollup_cascade",
    "rollup_level",
    "time_bucket_partials",
    "interpolate_at_probes",
    "resample_to_grid",
    "rate_to_grid",
    "irate_to_grid",
    "histogram_quantile",
    "sum_over_series",
]
