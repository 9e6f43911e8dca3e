"""JSONL document ingestion with corrupt-line quarantine — the standard
arrival format of crawled / vendor-delivered text corpora (one JSON doc
per line, dirty lines interleaved), as a first-class source next to the
reference's zip ingest.

Spark-first: the built-in JSON reader in PERMISSIVE mode with
``columnNameOfCorruptRecord`` does the parse, so malformed lines become
rows carrying their raw text instead of failing the job (FAILFAST is one
option away for pipelines that prefer to stop). The split into
(good, quarantine) is two filters over one scan — no Python in the
parse path, full predicate/column pushdown on the good side.

A quarantined line keeps its byte-exact raw text so it can be re-parsed
after a schema fix — the Delta "badRecordsPath" idea expressed as a
DataFrame instead of a side directory.
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

    - ``good``: rows parsed to the schema, corrupt column dropped;
    - ``quarantine``: one row per malformed line, ``(CORRUPT_COL raw
      text)`` — re-parseable later.

    ``mode='failfast'`` raises on the first malformed line instead
    (quarantine frame is empty by construction). A row whose JSON parses
    but where every schema field is NULL is treated as corrupt only if
    the parser flagged it (Spark's PERMISSIVE contract).
    """
    if mode not in ("quarantine", "failfast"):
        raise ValueError(f"mode must be quarantine|failfast, got {mode}")
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not define {CORRUPT_COL}")
    full = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    reader = (
        spark.read.schema(full)
        .option("mode", "FAILFAST" if mode == "failfast" else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(path)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # the quarantine frame cannot come from the same scan: Spark refuses
    # queries referencing ONLY the corrupt column of a JSON source
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    # documented cache() workaround leaks a persisted frame from a
    # library call). Instead the quarantine is a TEXT scan + from_json
    # probe — byte-exact raw lines, same line-splitting rules, blank
    # lines skipped exactly as the JSON reader skips them.
    raw = spark.read.text(path).filter(F.trim("value") != "")
    probe = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    bad = raw.filter(
        probe.getField(CORRUPT_COL).isNotNull()
    ).select(F.col("value").alias(CORRUPT_COL))
    return good, bad


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a frame as newline-delimited JSON (distributed, one file per
    partition). Null fields are omitted per line (Spark's JSON writer
    contract); readers with an explicit schema null-fill them back."""
    df.write.mode("overwrite").json(path)
