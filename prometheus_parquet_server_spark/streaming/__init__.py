from prometheus_parquet_server_spark.streaming.sessions import (
    sessionize,
    sessionize_batch,
    sessionize_batch_native,
    stream_sessionize_native,
)
from prometheus_parquet_server_spark.streaming.ingest import (
    stream_events_as_metrics,
    stream_windowed_counts,
    stream_windowed_rate,
    run_available_now,
)
from prometheus_parquet_server_spark.streaming.joins import (
    stream_interval_join,
)
from prometheus_parquet_server_spark.streaming.heavy import (
    stream_heavy_hitter_grams,
)

__all__ = [
    "stream_events_as_metrics",
    "stream_windowed_counts",
    "stream_windowed_rate",
    "run_available_now",
    "sessionize",
    "sessionize_batch",
    "sessionize_batch_native",
    "stream_sessionize_native",
    "stream_interval_join",
    "stream_heavy_hitter_grams",
]
