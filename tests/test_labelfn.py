"""label_replace / label_join / absent / timestamp (beyond-reference)."""

import pytest

from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.select import QueryError
from prometheus_parquet_server_spark.plans.compiler import run_query
from tests.conftest import long_frame


def fixture(spark):
    return long_frame(
        spark,
        [
            ("m", {"host": "web-01", "env": "prod"}, 0.0, 1.0),
            ("m", {"host": "db-02", "env": "dev"}, 0.0, 2.0),
        ],
    )


def run(spark, df, q):
    return run_query(spark, df, q, RegularTimeRange(0.0, 0.0, 60.0))


def test_label_replace_basic(spark):
    df = fixture(spark)
    out = run(spark, df, r'label_replace(m{}, "role", "$1", "host", "(\\w+)-\\d+")')
    rows = {r["labels"]["host"]: r["labels"].get("role") for r in out.collect()}
    assert rows == {"web-01": "web", "db-02": "db"}


def test_label_replace_no_match_keeps_labels(spark):
    df = fixture(spark)
    out = run(spark, df, r'label_replace(m{}, "role", "$1", "host", "(xyz)")')
    rows = [r["labels"] for r in out.collect()]
    assert all("role" not in labels for labels in rows)


def test_label_replace_anchored(spark):
    df = fixture(spark)
    # "web" alone must NOT match host=web-01 (regex is fully anchored)
    out = run(spark, df, r'label_replace(m{}, "role", "x", "host", "web")')
    rows = {r["labels"]["host"]: r["labels"].get("role") for r in out.collect()}
    assert rows["web-01"] is None


def test_label_replace_empty_removes_and_name_dst(spark):
    df = fixture(spark)
    # overwrite env with empty → removed
    out = run(spark, df, r'label_replace(m{}, "env", "", "host", ".*")')
    assert all("env" not in r["labels"] for r in out.collect())
    # dst = __name__ rewrites the metric name
    out2 = run(spark, df, r'label_replace(m{}, "__name__", "metric_$1", "env", "(.*)")')
    assert {r["name"] for r in out2.collect()} == {"metric_prod", "metric_dev"}


def test_label_join(spark):
    df = fixture(spark)
    out = run(spark, df, r'label_join(m{}, "hostenv", "/", "host", "env", "missing")')
    got = {r["labels"]["host"]: r["labels"]["hostenv"] for r in out.collect()}
    assert got == {"web-01": "web-01/prod/", "db-02": "db-02/dev/"}


def test_absent(spark):
    df = fixture(spark)
    out = run(spark, df, 'absent(m{host="nope"})').collect()
    # Prometheus derives result labels from the selector's '=' matchers
    assert [(r["ts"], r["value"], dict(r["labels"])) for r in out] == [
        (0.0, 1.0, {"host": "nope"})
    ]
    # regex / negative matchers and __name__ contribute nothing
    out2 = run(spark, df, 'absent(m{host=~"nope.*", env!="x"})').collect()
    assert all(dict(r["labels"]) == {} for r in out2) and len(out2) > 0
    # non-empty selection → no absent rows
    assert run(spark, df, 'absent(m{})').count() == 0


def test_timestamp(spark):
    df = fixture(spark)
    out = run(spark, df, "timestamp(m{})").collect()
    assert all(r["value"] == r["ts"] for r in out)
    assert all(r["name"] is None for r in out)


def test_string_arg_errors(spark):
    df = fixture(spark)
    with pytest.raises(QueryError, match="strings"):
        run(spark, df, 'label_replace(m{}, 1, "a", "b", "c")')
    with pytest.raises(QueryError, match="matrix"):
        run(spark, df, '"just a string"')
