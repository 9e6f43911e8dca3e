"""CSV / JSON-lines file sources feed the SAME classify→unpivot pipeline as
parquet — format parity is checked by ingesting identical data through all
three readers and comparing canonical rows."""

import json

import pytest

from prometheus_parquet_server_spark.sources.classify import IngestError
from prometheus_parquet_server_spark.sources.filesource import (
    file_base_name,
    infer_format,
    ingest_directory,
    ingest_file,
)

ROWS = [
    (1.5, 10.0, "a"),
    (2.5, 20.0, "b"),
    (3.5, 30.0, "a"),
]


def _write_inputs(tmp_path):
    csv = tmp_path / "cpu_load.csv"
    csv.write_text(
        "time,value,host\n" + "\n".join(f"{t},{v},{h}" for t, v, h in ROWS)
    )
    jl = tmp_path / "cpu_load.jsonl"
    jl.write_text(
        "\n".join(
            json.dumps({"time": t, "value": v, "host": h}) for t, v, h in ROWS
        )
    )
    return csv, jl


def _canonical(df):
    return sorted(
        ((r["name"], dict(r["labels"]), r["ts"], r["value"]) for r in df.collect()),
        key=lambda x: (x[0], x[2], sorted(x[1].items())),
    )


def test_csv_json_parquet_parity(spark, tmp_path):
    csv, jl = _write_inputs(tmp_path)
    pq = tmp_path / "cpu_load.parquet"
    spark.createDataFrame(ROWS, "time double, value double, host string").coalesce(
        1
    ).write.parquet(str(pq))

    got_csv = _canonical(ingest_file(spark, csv))
    got_json = _canonical(ingest_file(spark, jl))
    got_pq = _canonical(ingest_file(spark, pq))
    assert got_csv == got_json == got_pq
    # single value column named 'value' → bare base name; labels per row
    assert got_csv[0] == ("cpu_load", {"host": "a"}, 1.5, 10.0)
    assert len(got_csv) == 3


def test_fixed_labels_and_explicit_schema(spark, tmp_path):
    csv, _ = _write_inputs(tmp_path)
    out = ingest_file(
        spark,
        csv,
        fixed_labels={"dc": "eu"},
        schema="time double, value double, host string",
    )
    rows = _canonical(out)
    hosts = {1.5: "a", 2.5: "b", 3.5: "a"}
    assert len(rows) == 3
    for name, labels, ts, _value in rows:
        assert name == "cpu_load"
        assert labels == {"dc": "eu", "host": hosts[ts]}


def test_directory_union_skips_bad_files(spark, tmp_path):
    _write_inputs(tmp_path)
    # a schema-invalid member (no time, no value columns) must be skipped,
    # not fatal (zip-source parity)
    (tmp_path / "broken.csv").write_text("host,note\na,b")
    out = ingest_directory(spark, tmp_path)
    # csv + jsonl of the same data → 6 rows, one metric name
    assert out.count() == 6
    assert [r["name"] for r in out.select("name").distinct().collect()] == ["cpu_load"]


def test_format_inference_and_errors(tmp_path):
    assert infer_format("x/metrics.csv") == "csv"
    assert infer_format("m.ndjson") == "json"
    assert file_base_name("/tmp/9cpu load.csv") == "_9cpu_load"
    with pytest.raises(IngestError, match="cannot infer"):
        infer_format("metrics.avro")


def test_orc_parity(spark, tmp_path):
    """ORC goes through the same classify→unpivot pipeline as parquet."""
    csv, _ = _write_inputs(tmp_path)
    orc = tmp_path / "cpu_load.orc"
    spark.createDataFrame(ROWS, "time double, value double, host string").coalesce(
        1
    ).write.orc(str(orc))
    assert _canonical(ingest_file(spark, orc)) == _canonical(ingest_file(spark, csv))


def test_quarantine_captures_corrupt_rows(spark, tmp_path):
    from prometheus_parquet_server_spark.sources.filesource import (
        read_wide_quarantine,
    )

    jl = tmp_path / "m.jsonl"
    jl.write_text(
        '{"time": 1.0, "value": 2.0, "host": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"time": 2.0, "value": 3.0, "host": "b"}\n'
        '{"time": "also-bad"\n'
    )
    q = str(tmp_path / "quarantine")
    good = read_wide_quarantine(
        spark, jl, "time double, value double, host string", q
    )
    assert sorted((r["time"], r["host"]) for r in good.collect()) == [
        (1.0, "a"),
        (2.0, "b"),
    ]
    bad = spark.read.parquet(q).collect()
    assert len(bad) == 2
    assert {r["raw_record"] for r in bad} == {"THIS IS NOT JSON", '{"time": "also-bad"'}
    assert all(r["format"] == "json" and r["source_file"].endswith("m.jsonl") for r in bad)

    import pytest as _pytest
    from prometheus_parquet_server_spark.sources import IngestError

    with _pytest.raises(IngestError, match="quarantine"):
        read_wide_quarantine(spark, tmp_path / "x.parquet", "a int", q)


def test_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    import pyspark.sql.types as T

    from prometheus_parquet_server_spark.sources.filesource import (
        read_wide_quarantine,
    )

    jl = tmp_path / "m.jsonl"
    jl.write_text('{"time": 1.0, "value": 2.0}\nBAD\n')
    schema = T.StructType.fromDDL("time double, value double")
    n_before = len(schema.fields)
    good = read_wide_quarantine(spark, jl, schema, str(tmp_path / "q"))
    assert len(schema.fields) == n_before  # caller's object untouched
    assert good.columns == ["time", "value"]
    assert good.count() == 1
