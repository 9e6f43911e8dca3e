from prometheus_parquet_server_spark.plans.parser import parse_promql
from prometheus_parquet_server_spark.plans.compiler import run_query

__all__ = ["parse_promql", "run_query"]
