"""Plain-file sources: CSV / JSON-lines / Parquet → canonical long table.

The reference ingests only zip-of-Parquet (src/metricstore.rs:29-102); this
module extends the same schema-probe → classify → unpivot pipeline
(sources.classify / sources.ingest — S2-S8 semantics unchanged) to the file
formats a lake actually contains. Everything after the reader is shared
code, so CSV/JSON inherit the histogram synthesis, numeric coercion, and
label rules verbatim.

Scale notes:
- CSV/JSON are splittable text sources — a directory of files scans in
  parallel with no shim (unlike the zip path, which must extract first).
- ``inferSchema`` (CSV) / schema inference (JSON) cost one extra pass and
  can mis-type digit-only label columns as values; at scale pass an
  explicit ``schema`` instead — it is forwarded to the reader untouched.
"""

from __future__ import annotations

import logging
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.labels import legalize_metric_name
from prometheus_parquet_server_spark.sources.classify import IngestError
from prometheus_parquet_server_spark.sources.ingest import wide_to_long

log = logging.getLogger(__name__)

#: extension → Spark reader format
EXT_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


def infer_format(path: str | Path) -> str:
    ext = Path(path).suffix.lower()
    fmt = EXT_FORMATS.get(ext)
    if fmt is None:
        raise IngestError(
            f"cannot infer source format from {Path(path).name!r}; "
            f"supported extensions: {sorted(EXT_FORMATS)}"
        )
    return fmt


def file_base_name(path: str | Path) -> str:
    """File stem → legal metric name (same rule as the zip member names)."""
    return legalize_metric_name(Path(path).stem)


def read_wide(
    spark: SparkSession, path: str | Path, fmt: str | None = None, schema=None
) -> DataFrame:
    """Read one file/directory as a wide frame, format by extension unless
    given. ``schema`` (DDL string or StructType) skips inference."""
    fmt = fmt or infer_format(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(str(path))
    if fmt == "csv":
        if schema is None:
            reader = reader.option("inferSchema", True)
        return reader.option("header", True).csv(str(path))
    if fmt == "json":
        return reader.json(str(path))
    if fmt == "orc":
        return reader.orc(str(path))
    raise IngestError(f"unsupported source format {fmt!r}")


def ingest_file(
    spark: SparkSession,
    path: str | Path,
    fmt: str | None = None,
    fixed_labels: dict[str, str] | None = None,
    base_name: str | None = None,
    schema=None,
) -> DataFrame:
    """One file → canonical (name, labels, ts, value); metric base name
    from the file stem unless given."""
    wide = read_wide(spark, path, fmt, schema)
    return wide_to_long(wide, base_name or file_base_name(path), fixed_labels or {})


def ingest_directory(
    spark: SparkSession,
    directory: str | Path,
    fixed_labels: dict[str, str] | None = None,
) -> DataFrame:
    """Every supported file directly under ``directory`` → one canonical
    frame (union). Per-file failures are logged and skipped, matching the
    zip source's non-fatal member semantics (metricstore.rs:556-565)."""
    frames: list[DataFrame] = []
    for p in sorted(Path(directory).iterdir()):
        # Spark-written outputs are DIRECTORIES named *.parquet / *.csv —
        # accept them alongside plain files; suffix decides the format
        if p.suffix.lower() not in EXT_FORMATS or not (p.is_file() or p.is_dir()):
            continue
        try:
            frames.append(ingest_file(spark, p, fixed_labels=fixed_labels))
        except Exception as exc:  # per-file failure is non-fatal
            log.warning("skipping %s: %s", p.name, exc)
    if not frames:
        return spark.createDataFrame(
            [], "name string, labels map<string,string>, ts double, value double"
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


def read_wide_quarantine(
    spark: SparkSession,
    path: str | Path,
    schema,
    quarantine_path: str,
    fmt: str | None = None,
) -> DataFrame:
    """Schema-enforced CSV/JSON read with a dead-letter channel: rows that
    fail the schema land in ``quarantine_path`` (with their raw text)
    instead of silently becoming all-NULL rows or failing the whole file —
    the record-level complement of ``ingest_directory``'s file-level skip.

    Mechanics: PERMISSIVE mode + a ``_corrupt_record`` column captures the
    raw text of every unparsable row; good rows flow on with the column
    dropped, bad rows are appended (raw text + source file + format) to
    the quarantine parquet for later inspection/replay. Requires an
    explicit ``schema`` — corrupt-record capture is undefined under
    inference. One read, one filtered write — map-only on both sides.
    """
    import pyspark.sql.types as T

    fmt = fmt or infer_format(path)
    if fmt not in ("csv", "json"):
        raise IngestError(
            f"quarantine reads support csv/json text sources, not {fmt!r}"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # StructType.add MUTATES self — build the corrupt-capture schema on a
    # COPY so the caller's schema object doesn't silently grow a field
    capture = T.StructType(list(schema.fields))
    if "_corrupt_record" not in [f.name for f in capture.fields]:
        capture = capture.add("_corrupt_record", T.StringType())

    def _read(reader):
        return (
            reader.option("header", True).csv(str(path))
            if fmt == "csv"
            else reader.json(str(path))
        )

    # Quarantine side: PERMISSIVE + corrupt-record capture. Spark refuses
    # a query whose only referenced source column is the corrupt record,
    # so the frame is cached (InMemoryRelation — the standard workaround)
    # for exactly the duration of the quarantine write, then released.
    raw = _read(
        spark.read.schema(capture)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    ).cache()
    try:
        bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
            F.col("_corrupt_record").alias("raw_record"),
            F.lit(str(path)).alias("source_file"),
            F.lit(fmt).alias("format"),
        )
        bad.write.mode("append").parquet(quarantine_path)
    finally:
        raw.unpersist()
    # Good side: an independent DROPMALFORMED read with the ORIGINAL
    # schema — the same surviving row set, but no corrupt column anywhere
    # in the plan (so any downstream shape, including count(), prunes
    # freely) and no cache the caller would have to release.
    return _read(spark.read.schema(schema).option("mode", "DROPMALFORMED"))
