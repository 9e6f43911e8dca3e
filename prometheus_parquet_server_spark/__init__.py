"""prometheus_parquet_server_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of grainednoise/prometheus-parquet-server.

The reference (/root/reference) is a single-process Rust interpreter over an
in-memory time-series store; this package re-expresses every capability as
idiomatic Spark DataFrame plans over a canonical long table:

    metrics(name STRING, labels MAP<STRING,STRING>, ts DOUBLE, value DOUBLE)

Subpackages
-----------
- ``sources``   : wide-Parquet → canonical long table ingest (reference
                  src/metricstore.rs), zip source, re-tag YAML, store sink.
- ``operators`` : grid / resample / rate / irate / histogram_quantile /
                  sum-by / selection / metadata (reference src/timeseries.rs,
                  src/timevectors.rs, src/query.rs).
- ``plans``     : PromQL-subset parser + AST→DataFrame compiler replicating the
                  reference's QueryResult state machine (src/query.rs:41-124).
- ``pipeline``  : large-scale training-data operators beyond the reference
                  surface (dedup, similarity search, text analysis, multimodal).
- ``streaming`` : Structured Streaming ingest of the same canonical model.
"""

from prometheus_parquet_server_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
