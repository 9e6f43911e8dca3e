"""Ingest pipeline tests against the FIXTURES.md §1 wide tables
(reference src/metricstore.rs:104-187, 389-519)."""

import os
import zipfile

import pandas as pd
import pytest

from prometheus_parquet_server_spark.sources import (
    IngestError,
    MetricType,
    classify_metric_type,
    ingest_zip,
    read_mapping,
    wide_to_long,
)
from prometheus_parquet_server_spark.sources.classify import classify_columns
from prometheus_parquet_server_spark.sources.ingest import check_monotonic
from prometheus_parquet_server_spark.sources.retag import member_prefix
from prometheus_parquet_server_spark.sources.store import time_range, write_store
from prometheus_parquet_server_spark.sources.zipsource import metric_base_name


def gauge_pdf():
    return pd.DataFrame(
        {
            "time": [1.0, 2.0, 3.0, 1.0, 2.0],
            "host": ["a", "a", "a", "b", "b"],
            "env": ["prod"] * 5,
            "gauge_value": [1.0, 2.0, 3.0, 10.0, 20.0],
        }
    )


def multi_pdf():
    return pd.DataFrame(
        {
            "timestamp": [1.0, 2.0],
            "region": ["eu", "eu"],
            "value": [5.0, 6.0],
            "errors": [1.0, None],
            "retries": [0.0, 2.0],
        }
    )


def histo_pdf(with_inf=True, with_count=False):
    d = {
        "__time__": [1.0, 2.0],
        "timing": ["transport", "transport"],
        "Le0.1": [1.0, 2.0],
        "Le0.5": [3.0, 4.0],
        "Le1.0E1": [5.0, 6.0],
        "sum": [9.9, 11.1],
        "max": [0.4, 9.0],
    }
    if with_inf:
        d["Le+Inf"] = [6.0, 7.0]
    if with_count:
        d["count"] = [6.0, 7.0]
    return pd.DataFrame(d)


def test_classify_metric_types():
    assert classify_metric_type(["v"]) == MetricType.SINGLE
    assert classify_metric_type(["value", "errors"]) == MetricType.MULTI
    assert classify_metric_type(["Le0.5", "Le+Inf", "count", "sum"]) == MetricType.HISTOGRAM
    with pytest.raises(IngestError, match="mixes"):
        classify_metric_type(["Le0.5", "other"])


def test_classify_columns_rules(spark):
    c = classify_columns(spark.createDataFrame(gauge_pdf()).schema)
    assert c.time_column == "time"
    assert c.value_columns == ("gauge_value",)
    assert set(c.label_columns) == {"host", "env"}

    with pytest.raises(IngestError, match="boolean"):
        classify_columns(
            spark.createDataFrame([(1.0, True)], "time double, flag boolean").schema
        )
    with pytest.raises(IngestError, match="exactly one time"):
        classify_columns(
            spark.createDataFrame([(1.0, 2.0, 3.0)], "time double, timestamp double, v double").schema
        )


def test_single_column_ingest(spark):
    out = wide_to_long(spark.createDataFrame(gauge_pdf()), "m_gauge").collect()
    assert len(out) == 5
    assert {r["name"] for r in out} == {"m_gauge"}
    byhost = {(r["labels"]["host"], r["ts"]): r["value"] for r in out}
    assert byhost[("a", 2.0)] == 2.0 and byhost[("b", 2.0)] == 20.0
    assert all(r["labels"]["env"] == "prod" for r in out)


def test_multi_column_ingest_naming_and_nan(spark):
    out = wide_to_long(spark.createDataFrame(multi_pdf()), "m_requests").collect()
    names = {r["name"] for r in out}
    # 'value' keeps the bare name (metricstore.rs:446-462)
    assert names == {"m_requests", "m_requests_errors", "m_requests_retries"}
    nan_rows = [r for r in out if r["name"] == "m_requests_errors" and r["ts"] == 2.0]
    import math

    assert math.isnan(nan_rows[0]["value"])  # NULL → NaN (metricstore.rs:203-233)


def test_histogram_ingest_with_inf_synthesizes_count(spark):
    out = wide_to_long(spark.createDataFrame(histo_pdf(with_inf=True)), "m_duration").collect()
    names = {r["name"] for r in out}
    assert names == {"m_duration_bucket", "m_duration_sum", "m_duration_max", "m_duration_count"}
    buckets = {r["labels"]["Le"] for r in out if r["name"] == "m_duration_bucket"}
    assert buckets == {"0.1", "0.5", "1.0E1", "+Inf"}
    count = {r["ts"]: r["value"] for r in out if r["name"] == "m_duration_count"}
    assert count == {1.0: 6.0, 2.0: 7.0}  # synthesized from Le+Inf
    assert all(
        r["labels"].get("Le") is None
        for r in out
        if r["name"] != "m_duration_bucket"
    )


def test_histogram_ingest_count_synthesizes_inf(spark):
    out = wide_to_long(
        spark.createDataFrame(histo_pdf(with_inf=False, with_count=True)), "m_duration"
    ).collect()
    inf_rows = {
        r["ts"]: r["value"]
        for r in out
        if r["name"] == "m_duration_bucket" and r["labels"]["Le"] == "+Inf"
    }
    assert inf_rows == {1.0: 6.0, 2.0: 7.0}  # synthesized from count


def test_fixed_labels_and_row_override(spark):
    out = wide_to_long(
        spark.createDataFrame(gauge_pdf()), "m_gauge", {"dc": "ams", "env": "fixed"}
    ).collect()
    # row-level env overrides the fixed one; dc applies everywhere
    assert all(r["labels"]["dc"] == "ams" for r in out)
    assert all(r["labels"]["env"] == "prod" for r in out)


def test_check_monotonic_rejects_duplicates(spark):
    df = wide_to_long(
        spark.createDataFrame(
            pd.DataFrame({"time": [1.0, 1.0], "host": ["a", "a"], "v": [1.0, 2.0]})
        ),
        "m",
    )
    with pytest.raises(IngestError, match="duplicate timestamp"):
        check_monotonic(df)
    check_monotonic(wide_to_long(spark.createDataFrame(gauge_pdf()), "m"))


def test_zip_ingest_with_retag(spark, tmp_path):
    gauge_pdf().to_parquet(tmp_path / "m_gauge.parquet")
    multi_pdf().to_parquet(tmp_path / "m_requests.parquet")
    zpath = tmp_path / "data.parquet.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(tmp_path / "m_gauge.parquet", "runA/m-gauge.parquet")
        z.write(tmp_path / "m_requests.parquet", "m_requests.parquet")
        z.writestr("skipped/other.parquet", b"not really parquet")
    ypath = tmp_path / "retag.yaml"
    ypath.write_text(
        "config:\n  skip-unmapped: true\n"
        "mapping:\n  runA:\n    tags:\n      run: A\n  __root__:\n    tags: {}\n"
    )
    mapping = read_mapping(ypath)
    assert mapping == {"runA": {"run": "A"}, "__root__": {}}
    assert member_prefix("runA/m-gauge.parquet") == "runA"
    assert member_prefix("m_requests.parquet") == "__root__"
    assert metric_base_name("runA/m-gauge.parquet") == "m_gauge"  # legalized

    out = ingest_zip(spark, zpath, mapping, scratch_dir=str(tmp_path / "scratch"))
    rows = out.collect()
    names = {r["name"] for r in rows}
    # 'skipped/' prefix is unmapped → member skipped; bad parquet would be
    # skipped non-fatally anyway
    assert names == {"m_gauge", "m_requests", "m_requests_errors", "m_requests_retries"}
    assert all(r["labels"]["run"] == "A" for r in rows if r["name"] == "m_gauge")


def test_store_roundtrip(spark, tmp_path):
    df = wide_to_long(spark.createDataFrame(gauge_pdf()), "m_gauge")
    write_store(df, str(tmp_path / "store"))
    from prometheus_parquet_server_spark.sources.store import read_store

    back = read_store(spark, str(tmp_path / "store"))
    assert back.count() == 5
    assert time_range(back) == (1.0, 3.0)
    assert set(back.columns) == {"name", "labels", "ts", "value"}
    # partition pruning by name: the name=... directory exists
    assert (tmp_path / "store" / "name=m_gauge").exists()


def test_timestamp_time_column(spark):
    # parquet TIMESTAMP / TIMESTAMP_NTZ time columns are numeric per the
    # reference's physical-type rule (INT64/INT96) → epoch-seconds doubles
    import datetime

    pdf = pd.DataFrame(
        {
            "time": pd.to_datetime(["2024-01-01T00:00:00", "2024-01-01T00:01:00"]),
            "host": ["a", "a"],
            "v": [1.0, 2.0],
        }
    )
    out = wide_to_long(spark.createDataFrame(pdf), "m").collect()
    ts = sorted(r["ts"] for r in out)
    assert ts == [1704067200.0, 1704067260.0]


def test_bucketed_store_shuffle_free_windows(spark, tmp_path):
    # the 100TB layout: bucketBy(series) + sortBy lets per-series windows
    # plan with ZERO shuffle exchanges
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prometheus_parquet_server_spark.sources.store import (
        read_store_bucketed,
        write_store_bucketed,
    )

    df = wide_to_long(spark.createDataFrame(gauge_pdf()), "m_gauge")
    table = "t_bucketed_store_test"
    write_store_bucketed(df, table, buckets=4, path=str(tmp_path / "mb"))
    try:
        b = read_store_bucketed(spark, table)
        assert b.count() == 5
        w = Window.partitionBy("_skey").orderBy("ts")
        plan = (
            b.withColumn("lag", F.lag("value").over(w))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_store_merges_small_files(spark, tmp_path):
    """Fragmented partitions compact to fewer files with identical data;
    partitions already at target shape are left byte-untouched."""
    from pathlib import Path

    from prometheus_parquet_server_spark.sources.store import (
        compact_store,
        read_store,
        store_file_stats,
        write_store,
    )

    def mk(name, n):
        return spark.createDataFrame(
            [(name, {"h": str(i % 3)}, float(i), float(i) * 2) for i in range(n)],
            "name string, labels map<string,string>, ts double, value double",
        )

    store = str(tmp_path / "store")
    write_store(mk("frag", 40), store)
    # fragment the 'frag' partition with 5 tiny appends; 'ok' stays whole
    for i in range(5):
        mk("frag", 4).write.mode("append").parquet(f"{store}/name=frag")
    mk("ok", 10).coalesce(1).write.mode("append").parquet(f"{store}/name=ok")
    before = {r["name"]: r["n_files"] for r in store_file_stats(spark, store).collect()}
    assert before["frag"] > 5
    rows_before = sorted(
        (r["ts"], r["value"], r["name"]) for r in read_store(spark, store).collect()
    )
    ok_files_before = sorted(
        f.name for f in Path(f"{store}/name=ok").glob("*.parquet")
    )

    compacted = compact_store(spark, store, target_file_bytes=1 << 30)
    assert compacted == ["frag"]
    after = {r["name"]: r["n_files"] for r in store_file_stats(spark, store).collect()}
    assert after["frag"] == 1
    assert sorted(
        f.name for f in Path(f"{store}/name=ok").glob("*.parquet")
    ) == ok_files_before
    rows_after = sorted(
        (r["ts"], r["value"], r["name"]) for r in read_store(spark, store).collect()
    )
    assert rows_after == rows_before

    import pytest as _pytest
    with _pytest.raises(ValueError):
        compact_store(spark, store, target_file_bytes=0)


def test_expire_store_retention(spark, tmp_path):
    from pathlib import Path

    from prometheus_parquet_server_spark.sources.store import (
        expire_store,
        read_store,
        write_store,
    )

    df = spark.createDataFrame(
        [("old", {}, 10.0, 1.0), ("old", {}, 20.0, 2.0),
         ("mix", {}, 10.0, 3.0), ("mix", {}, 100.0, 4.0),
         ("new", {}, 200.0, 5.0)],
        "name string, labels map<string,string>, ts double, value double",
    )
    store = str(tmp_path / "store")
    write_store(df, store)
    new_files = sorted(f.name for f in Path(f"{store}/name=new").glob("*.parquet"))

    dropped = expire_store(spark, store, min_ts=50.0)
    assert dropped == {"old": 2, "mix": 1}
    # fully-expired partition removed; untouched partition byte-identical
    assert not Path(f"{store}/name=old").exists()
    assert sorted(f.name for f in Path(f"{store}/name=new").glob("*.parquet")) == new_files
    left = sorted((r["name"], r["ts"]) for r in read_store(spark, store).collect())
    assert left == [("mix", 100.0), ("new", 200.0)]


def test_maintenance_unescapes_hive_partition_names(spark, tmp_path):
    """Recording-rule names contain ':' which Hive escapes to %3A in the
    partition dir — census/compaction/expiry must report the REAL name."""
    from prometheus_parquet_server_spark.sources.store import (
        compact_store,
        expire_store,
        store_file_stats,
        write_store,
    )

    df = spark.createDataFrame(
        [("job:rate5m", {}, float(i), 1.0) for i in range(8)],
        "name string, labels map<string,string>, ts double, value double",
    )
    store = str(tmp_path / "store")
    write_store(df, store)
    for _ in range(2):
        df.limit(2).drop("name").write.mode("append").parquet(
            f"{store}/name=job%3Arate5m"
        )
    names = [r["name"] for r in store_file_stats(spark, store).collect()]
    assert names == ["job:rate5m"]
    assert compact_store(spark, store, target_file_bytes=1 << 30) == ["job:rate5m"]
    # 8 original rows (ts 0–7) + two appends of 2 rows each (ts 0, 1):
    # cutoff 4.0 drops ts 0–3 (4 rows) plus all 4 appended rows
    assert expire_store(spark, store, min_ts=4.0) == {"job:rate5m": 8}


def test_upsert_store_updates_win_and_append(spark, tmp_path):
    from prometheus_parquet_server_spark.sources.store import (
        read_store,
        upsert_store,
        write_store,
    )

    base = spark.createDataFrame(
        [("m", {"h": "a"}, 1.0, 10.0), ("m", {"h": "a"}, 2.0, 20.0),
         ("other", {}, 1.0, 99.0)],
        "name string, labels map<string,string>, ts double, value double",
    )
    store = str(tmp_path / "store")
    write_store(base, store)
    updates = spark.createDataFrame(
        [("m", {"h": "a"}, 2.0, 21.0),   # replaces existing (series, ts)
         ("m", {"h": "b"}, 2.0, 5.0),    # new series, same ts — appends
         ("m", {"h": "a"}, 3.0, 30.0),   # new ts — appends
         ("brand_new", {}, 1.0, 7.0)],   # new metric partition
        "name string, labels map<string,string>, ts double, value double",
    )
    touched = upsert_store(spark, store, updates)
    assert sorted(touched) == ["brand_new", "m"]
    rows = {
        (r["name"], r["labels"].get("h"), r["ts"]): r["value"]
        for r in read_store(spark, store).collect()
    }
    assert rows[("m", "a", 2.0)] == 21.0      # update won
    assert rows[("m", "a", 1.0)] == 10.0      # untouched sample kept
    assert rows[("m", "b", 2.0)] == 5.0       # new series appended
    assert rows[("m", "a", 3.0)] == 30.0      # new ts appended
    assert rows[("brand_new", None, 1.0)] == 7.0
    assert rows[("other", None, 1.0)] == 99.0  # untouched partition
    assert len(rows) == 6


def test_store_manifest_detects_tampering(spark, tmp_path):
    from prometheus_parquet_server_spark.sources.store import (
        compact_store,
        store_manifest,
        upsert_store,
        verify_store_manifest,
        write_store,
    )

    mk = lambda rows: spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts double, value double"
    )
    store = str(tmp_path / "store")
    write_store(mk([("a", {}, 1.0, 1.0), ("a", {}, 2.0, 2.0), ("b", {}, 1.0, 3.0)]), store)
    # materialize to literal rows (as a persisted manifest would be) —
    # keeping it as a live plan over the same path would let Spark's
    # cache-plan matching serve stale data to BOTH sides of the diff
    manifest = spark.createDataFrame(
        store_manifest(spark, store).collect(),
        "name string, n_rows long, content_hash decimal(20,0)",
    )

    # intact store → empty diff; re-layout (compaction) must NOT trip it
    for _ in range(2):
        mk([("a", {}, 9.0, 9.0)]).drop("name").write.mode("append").parquet(
            f"{store}/name=a"
        )
    upsert_store(spark, store, mk([("a", {}, 9.0, 9.0)]))  # dedupe the appends
    compact_store(spark, store, target_file_bytes=1 << 30)
    diff = verify_store_manifest(spark, store, manifest).collect()
    # 'a' genuinely changed (new ts=9 sample); 'b' intact and absent
    assert [(r["name"], r["status"]) for r in diff] == [("a", "changed")]

    # value flip detected even at identical row count
    upsert_store(spark, store, mk([("b", {}, 1.0, 999.0)]))
    diff2 = {r["name"]: r["status"] for r in
             verify_store_manifest(spark, store, manifest).collect()}
    assert diff2["b"] == "changed"


def test_upsert_dedupes_duplicate_updates_deterministically(spark, tmp_path):
    from prometheus_parquet_server_spark.sources.store import (
        read_store,
        upsert_store,
        write_store,
    )

    mk = lambda rows: spark.createDataFrame(
        rows, "name string, labels map<string,string>, ts double, value double"
    )
    store = str(tmp_path / "store")
    write_store(mk([("m", {}, 1.0, 0.0)]), store)
    # duplicate (series, ts) WITHIN the update batch → max value wins
    upsert_store(spark, store, mk([("m", {}, 1.0, 21.0), ("m", {}, 1.0, 22.0)]))
    rows = read_store(spark, store).collect()
    assert [(r["ts"], r["value"]) for r in rows] == [(1.0, 22.0)]


def test_metric_type_map_serving_types(spark):
    """ingest.metric_type_map: the histogram family reports "histogram"
    for every derived name; scalar tables report "unknown" (the Le-regex
    knows bucket structure, never counter-vs-gauge)."""
    from prometheus_parquet_server_spark.sources.ingest import metric_type_map

    hdf = spark.createDataFrame(histo_pdf(with_inf=True))
    tm = metric_type_map(hdf.schema, "m_duration")
    assert tm == {
        "m_duration_bucket": "histogram",
        "m_duration_sum": "histogram",
        "m_duration_max": "histogram",
        "m_duration_count": "histogram",
    }
    sdf = spark.createDataFrame([(1.0, 2.0)], "time double, value double")
    assert metric_type_map(sdf.schema, "m_plain") == {"m_plain": "unknown"}
