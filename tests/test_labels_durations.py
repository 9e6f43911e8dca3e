"""Name legalization, Le regex, matcher semantics, duration parsing
(reference src/labels.rs:400-416, src/metricstore.rs:661-716, src/web.rs:165-215)."""

import pytest

from prometheus_parquet_server_spark.durations import parse_duration, parse_timestamp
from prometheus_parquet_server_spark.labels import (
    LE_COLUMN_RE,
    LabelMatcher,
    le_bound,
    legalize_metric_name,
    suffixed_metric_name,
)


def test_legalize_golden():
    assert legalize_metric_name("a*") == "a_"
    assert legalize_metric_name("42") == "_42"
    assert legalize_metric_name("s-s-s-[_]??/.") == "s_s_s________"
    assert legalize_metric_name("ok_name9") == "ok_name9"


def test_suffix_relegalizes():
    assert suffixed_metric_name("m", "bucket") == "m_bucket"
    assert suffixed_metric_name("m", "a.b") == "m_a_b"


@pytest.mark.parametrize(
    "col,bound",
    [("Le0", "0"), ("Le0.0", "0.0"), ("Le1.0E-4", "1.0E-4"), ("Le+Inf", "+Inf"), ("Le+inf", "+inf")],
)
def test_le_regex_accepts(col, bound):
    m = LE_COLUMN_RE.match(col)
    assert m and m.group(1) == bound


@pytest.mark.parametrize("col", ["LeX", "le0.5", "Le0.5x", "count", "Le-1"])
def test_le_regex_rejects(col):
    assert LE_COLUMN_RE.match(col) is None


def test_le_bound():
    assert le_bound("+Inf") == float("inf")
    assert le_bound("1.0E-4") == 1e-4


def test_matcher_absent_label_fails_all_ops():
    # src/labels.rs:300-303: missing label fails even != / !~
    for op in ["=", "!=", "=~", "!~"]:
        assert LabelMatcher("h", op, "x").matches_value(None) is False


def test_matcher_ops():
    assert LabelMatcher("h", "=", "x").matches_value("x")
    assert not LabelMatcher("h", "=", "x").matches_value("y")
    assert LabelMatcher("h", "!=", "x").matches_value("y")
    assert LabelMatcher("h", "=~", "we.*go").matches_value("awebmangoz")  # unanchored
    assert LabelMatcher("h", "!~", "^x$").matches_value("y")


def test_durations_golden():
    assert parse_duration("1s500ms") == 1.5
    assert parse_duration("2m1s500ms") == 121.5
    assert parse_duration("1h2m1s500ms") == 3721.5
    assert parse_duration("90") == 90.0
    assert parse_duration("1.5") == 1.5
    assert parse_duration("1w") == 7 * 86400.0
    assert parse_duration("1y") == 365 * 86400.0


@pytest.mark.parametrize("bad", ["1..5", "1x", "1s3", "", "s5"])
def test_durations_invalid(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


def test_timestamps():
    assert parse_timestamp("1704067200") == 1704067200.0
    assert parse_timestamp("2024-01-01T00:00:00Z") == 1704067200.0
    assert parse_timestamp("2024-01-01T00:00:00+00:00") == 1704067200.0
