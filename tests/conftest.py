import math
import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from prometheus_parquet_server_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark("prometheus-parquet-server-spark-tests")


METRIC_SCHEMA = "name string, labels map<string,string>, ts double, value double"


def long_frame(spark, rows):
    """rows: list of (name, labels_dict, ts, value)."""
    return spark.createDataFrame(
        [(n, l, float(t), float(v)) for n, l, t, v in rows], METRIC_SCHEMA
    )


def assert_close(actual, expected, tol=1e-12):
    if isinstance(expected, float) and math.isnan(expected):
        assert isinstance(actual, float) and math.isnan(actual), f"{actual} != NaN"
    else:
        assert actual == pytest.approx(expected, abs=tol), f"{actual} != {expected}"
