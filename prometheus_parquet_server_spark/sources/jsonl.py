"""JSONL document ingestion with corrupt-line quarantine — the standard
arrival format of crawled / vendor-delivered text corpora (one JSON doc
per line, dirty lines interleaved), as a first-class source next to the
reference's zip ingest.

Spark-first, with one deliberate deviation: quarantine mode parses via a
TEXT scan + ``from_json`` rather than the native JSON reader. The native
reader's corrupt-record column carries a hard restriction — ANY query
that prunes down to only the corrupt column raises
UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, and that includes
the innocent ``good.count()`` (count prunes every output column, leaving
just the corrupt-IS-NULL filter). ``from_json`` is an ordinary
expression with no such restriction; for line-delimited JSON the two
parse identically, and Catalyst still prunes the parsed struct to the
referenced fields. The split into (good, quarantine) is two filters over
one text scan — no Python anywhere.

A quarantined line keeps its byte-exact raw text so it can be re-parsed
after a schema fix — the Delta "badRecordsPath" idea expressed as a
DataFrame instead of a side directory. ``mode='failfast'`` uses the
native reader's FAILFAST (first malformed line raises; the quarantine
frame is empty by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_line"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "quarantine",
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON at ``path`` against an EXPLICIT
    ``schema`` (inference over a dirty corpus is nondeterministic —
    callers must say what they expect). Returns ``(good, quarantine)``:

    - ``good``: rows parsed to the schema;
    - ``quarantine``: one row per malformed line, ``(CORRUPT_COL raw
      text)`` — re-parseable later.

    ``mode='failfast'`` raises on the first malformed line instead (the
    quarantine frame is empty by construction). Whitespace-only lines are
    skipped, matching the native JSON reader.
    """
    if mode not in ("quarantine", "failfast"):
        raise ValueError(f"mode must be quarantine|failfast, got {mode}")
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {CORRUPT_COL}")
    bad_schema = T.StructType([T.StructField(CORRUPT_COL, T.StringType())])
    if mode == "failfast":
        good = (
            spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        )
        return good, spark.createDataFrame([], bad_schema)
    # a fresh StructType — StructType.add MUTATES the receiver, which
    # would corrupt the caller's schema object (found in review)
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path).filter(F.trim("value") != "")
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    staged = raw.select(parsed.alias("_r"))
    good = (
        staged.filter(F.col("_r")[CORRUPT_COL].isNull())
        .select("_r.*")
        .drop(CORRUPT_COL)
    )
    bad = raw.filter(
        parsed.getField(CORRUPT_COL).isNotNull()
    ).select(F.col("value").alias(CORRUPT_COL))
    return good, bad


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a frame as newline-delimited JSON (distributed, one file per
    partition). Null fields are omitted per line (Spark's JSON writer
    contract); readers with an explicit schema null-fill them back."""
    df.write.mode("overwrite").json(path)
