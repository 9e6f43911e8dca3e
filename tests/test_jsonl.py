"""JSONL source: lossless round-trip, quarantine fidelity, failfast."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)

SCHEMA = "doc_id bigint, text string, n bigint"


def test_round_trip_and_quarantine(spark, tmp_path):
    rows = [
        (1, "plain text", 10),
        (2, "crlf\r\nembedded", 20),
        (3, "unicode Привет 你好", 30),
        (4, None, 0),            # NULL text: field omitted on write
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = f"file://{tmp_path}/docs"
    write_jsonl(df, path)
    dirty = [
        '{"doc_id": 5, "text": "no close',
        "utterly not json",
        '{"doc_id": "seven", "n": {}}',
    ]
    with open(f"{tmp_path}/docs/zz_bad.json", "w") as fh:
        fh.write("\n".join(dirty) + "\n\n")  # plus a blank line (skipped)

    good, bad = read_jsonl(spark, path, SCHEMA)
    got = sorted((r["doc_id"], r["text"], r["n"]) for r in good.collect())
    assert got == sorted(rows)
    # quarantine keeps the raw lines byte-exactly
    qlines = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert qlines == sorted(dirty)


def test_failfast_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1)], SCHEMA)
    path = f"file://{tmp_path}/ff"
    write_jsonl(df, path)
    with open(f"{tmp_path}/ff/zz_bad.json", "w") as fh:
        fh.write("broken\n")
    good, bad = read_jsonl(spark, path, SCHEMA, mode="failfast")
    assert bad.count() == 0  # empty BY CONSTRUCTION in failfast mode
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        good.collect()


def test_schema_object_not_mutated(spark, tmp_path):
    """StructType.add mutates its receiver — read_jsonl must not corrupt
    the caller's schema object (review-found; a second call with the same
    object used to raise)."""
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, "x", 1)], SCHEMA)
    p1, p2 = f"file://{tmp_path}/a", f"file://{tmp_path}/b"
    write_jsonl(df, p1)
    write_jsonl(df, p2)
    schema = T.StructType.fromDDL(SCHEMA)
    n_before = len(schema.fields)
    good1, _ = read_jsonl(spark, p1, schema)
    assert len(schema.fields) == n_before
    assert [f.name for f in good1.schema.fields] == ["doc_id", "text", "n"]
    good2, _ = read_jsonl(spark, p2, schema)  # same object, second call
    assert good2.count() == 1


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="mode"):
        read_jsonl(spark, f"file://{tmp_path}/x", SCHEMA, mode="lenient")
    with pytest.raises(ValueError, match=CORRUPT_COL):
        read_jsonl(
            spark, f"file://{tmp_path}/x",
            f"doc_id bigint, {CORRUPT_COL} string",
        )
