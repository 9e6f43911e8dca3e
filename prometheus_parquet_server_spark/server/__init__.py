from prometheus_parquet_server_spark.server.app import MetricsHTTPServer

__all__ = ["MetricsHTTPServer"]
