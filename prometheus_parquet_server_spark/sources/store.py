"""Canonical-store sink/source (S10 in SURVEY.md §2.1).

Reference parity: ``TimeSeriesCollection`` (src/timeseries.rs:396-445) — a
name-keyed in-memory map with a global min/max-time index. Here the store IS
the long table written ``partitionBy("name")``: the reference's name-hash
probe becomes Catalyst partition pruning, and min/max come from a one-line
aggregate (parquet footer statistics make it a metadata-only scan).

Scale: partitioning by metric name bounds every selector scan to one
partition tree; within a partition, files are sorted by the series key so
per-series windows mostly avoid wide shuffles (AQE handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.model import series_key_str


def write_store(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the canonical long frame partitioned by metric name."""
    (
        df.withColumn("_sk", series_key_str())
        .sortWithinPartitions("_sk", "ts")
        .drop("_sk")
        .write.mode(mode)
        .partitionBy("name")
        .parquet(path)
    )


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_store_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist the store bucketed+sorted by the series key.

    At cluster scale this is the difference between every per-series window
    (resample/rate/irate) starting with a full shuffle of the samples and
    starting from pre-clustered files: Spark's bucketing metadata lets the
    planner skip the Exchange when the window partitions on the bucket
    column. Requires a managed/external table (bucket metadata lives in the
    catalog, not in plain parquet)."""
    writer = (
        df.withColumn("_skey", series_key_str())
        .write.mode("overwrite")
        .bucketBy(buckets, "_skey")
        .sortBy("_skey", "ts")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_store_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed store; the ``_skey`` column is the pre-computed
    series identity operators key on."""
    return spark.table(table)


def time_range(df: DataFrame) -> tuple[float, float]:
    """Global MinMaxTime (src/timeseries.rs:423-445)."""
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    return row["lo"], row["hi"]


def shift_to_midnight_offset(df: DataFrame, now: float | None = None) -> float:
    """``--shift_to_midnight`` (reference src/main.rs:207-226 +
    src/timeseries.rs:410-417): query_time_offset = today's local midnight −
    the store's min timestamp. Queries subtract it from their grid
    (RegularTimeRange.time_offset) and serialization adds it back per point
    (json_out.matrix_result time_offset) — so recorded test data appears to
    start "today" in Grafana."""
    import time as _time

    now = _time.time() if now is None else now
    local = _time.localtime(now)
    midnight = _time.mktime(
        (local.tm_year, local.tm_mon, local.tm_mday, 0, 0, 0, -1, -1, -1)
    )
    min_ts, _ = time_range(df)
    return float(midnight) - float(min_ts)


def _partition_dirs(path: str):
    """(dir, unescaped metric name) per ``name=`` partition — Hive escapes
    special chars in partition values (':' → '%3A'), so the directory name
    must be unquoted before it can be compared with real metric names."""
    from pathlib import Path
    from urllib.parse import unquote

    for part in sorted(Path(path).glob("name=*")):
        yield part, unquote(part.name.split("=", 1)[1])


def _trash_dir(part_path) -> "Path":
    """Dot-prefixed sibling trash dir: ``name=X`` → ``.trash_name=X``.
    The dot prefix matters — a ``name=X.trash`` sibling would itself be
    partition-discovered as a metric literally named ``X.trash`` (and
    double-count rows mid-swap); Spark ignores dot-prefixed dirs."""
    from pathlib import Path

    part_path = Path(part_path)
    return part_path.parent / f".trash_{part_path.name}"


def _swap_partition_dir(part_path, tmp: str) -> None:
    """Replace the live partition dir with ``tmp`` via rename-aside: the
    live dir is renamed out of the way BEFORE the new one moves in, so a
    crash at any step leaves either the old or the new data discoverable —
    never a window where the partition is simply gone, and never a
    half-deleted partition visible to readers."""
    import shutil
    from pathlib import Path

    part_path = Path(part_path)
    trash = _trash_dir(part_path)
    if trash.exists():
        shutil.rmtree(trash)
    part_path.rename(trash)
    try:
        Path(tmp).rename(part_path)
    except BaseException:
        trash.rename(part_path)  # roll back — old data stays live
        raise
    shutil.rmtree(trash)


def _remove_partition_dir(part_path) -> None:
    """Crash-safe partition removal: rename aside (atomic — readers see
    the partition fully present or fully gone), then delete the trash; a
    crash mid-rmtree leaves only an ignored dot-dir behind."""
    import shutil

    trash = _trash_dir(part_path)
    if trash.exists():
        shutil.rmtree(trash)
    import pathlib

    pathlib.Path(part_path).rename(trash)
    shutil.rmtree(trash)


def store_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition file census of a name-partitioned store:
    (name, n_files, total_bytes, avg_file_bytes) — the signal compaction
    decisions read. Metadata-only (directory listing, no data scan)."""
    rows = []
    for part, name in _partition_dirs(path):
        files = [f for f in part.rglob("*.parquet") if f.is_file()]
        if not files:
            continue
        total = sum(f.stat().st_size for f in files)
        rows.append((name, len(files), total, total // len(files)))
    return spark.createDataFrame(
        rows, "name string, n_files long, total_bytes long, avg_file_bytes long"
    )


def compact_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> list[str]:
    """Small-file compaction — the lake-maintenance pass a long-running
    100 TB store needs: streaming/incremental ingest leaves each partition
    littered with tiny files, and every query then pays per-file open/
    footer-read/task-schedule overhead. Rewrites each over-fragmented
    ``name=`` partition into ``ceil(bytes / target)`` sorted files.

    Partition-at-a-time (not whole-store): only fragmented partitions are
    rewritten, each swapped in via rename-aside (old dir renamed away, new
    dir renamed in — a crash leaves old or new data live, never neither),
    so an interrupted compaction leaves every other partition untouched.
    Returns the (unescaped) metric names compacted.

    At real scale the same loop runs as N independent jobs (one per
    partition, embarrassingly parallel across a workflow scheduler);
    within one partition the rewrite is a narrow coalesce — no shuffle.
    """
    if target_file_bytes < 1:
        raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
    compacted: list[str] = []
    for part, name in _partition_dirs(path):
        files = [f for f in part.rglob("*.parquet") if f.is_file()]
        total = sum(f.stat().st_size for f in files)
        if len(files) < min_files_to_compact or not files:
            continue
        if total // len(files) >= target_file_bytes:
            continue
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        # sort AFTER coalesce: sorting the small input splits first would
        # leave each output file a concatenation of sorted runs, silently
        # breaking the store's files-sorted-by-series-key invariant
        out = (
            spark.read.parquet(str(part))
            .withColumn("_sk", series_key_str(name=F.lit(name)))
            .coalesce(n_out)
            .sortWithinPartitions("_sk", "ts")
            .drop("_sk")
        )
        tmp = f"{path}/.compact_tmp_name={part.name.split('=', 1)[1]}"
        out.write.mode("overwrite").parquet(tmp)
        _swap_partition_dir(part, tmp)
        compacted.append(name)
    return compacted


def expire_store(
    spark: SparkSession,
    path: str,
    min_ts: float,
) -> dict[str, int]:
    """Retention pass — drop every sample older than ``min_ts`` (epoch
    seconds), the other half of lake maintenance beside
    :func:`compact_store`. Partition-at-a-time with the same rename-aside
    swap; the per-partition min(ts)/count probe is a ts-only column-pruned
    scan (cheap relative to a rewrite — footer-stat pushdown would need
    ``spark.sql.parquet.aggregatePushDown``, which this repo does not
    assume), so partitions with nothing to expire pay one narrow read and
    are left byte-untouched; a fully-expired partition is removed
    outright (rename-aside first, so readers never see it half-deleted).
    Returns {unescaped name: rows_dropped}.
    """
    dropped: dict[str, int] = {}
    for part, name in _partition_dirs(path):
        df = spark.read.parquet(str(part))
        row = df.agg(F.min("ts").alias("lo"), F.count("*").alias("n")).first()
        if row["n"] == 0 or row["lo"] is None or row["lo"] >= min_ts:
            continue  # nothing to expire — partition untouched
        kept = df.filter(F.col("ts") >= min_ts)
        n_kept = kept.count()
        if n_kept == 0:
            _remove_partition_dir(part)
            dropped[name] = row["n"]
            continue
        tmp = f"{path}/.expire_tmp_name={part.name.split('=', 1)[1]}"
        kept.write.mode("overwrite").parquet(tmp)
        _swap_partition_dir(part, tmp)
        dropped[name] = row["n"] - n_kept
    return dropped


def upsert_store(spark: SparkSession, path: str, updates: DataFrame) -> list[str]:
    """Upsert into the partitioned store: an update row REPLACES any
    existing sample with the same (series key, ts); new (series, ts)
    pairs append. Completes the store lifecycle (write → upsert →
    compact → expire) without a table format: only the ``name=``
    partitions actually touched by ``updates`` are rewritten, each via
    the same crash-safe rename-aside swap as compaction, so a backfill
    of one metric never rewrites — or risks — the rest of the store.

    The merge itself is one union + one window per touched partition:
    updates tagged priority 0, existing rows 1, ``row_number() over
    (partition by (series key, ts) order by priority, value desc)`` keeps
    the winner — the value tie-break makes duplicate (series, ts) rows
    WITHIN the update batch resolve deterministically (max value wins,
    the house MAX-dedupe rule) instead of by shuffle layout.
    Returns the (unescaped) metric names rewritten.
    """
    # cache: the updates lineage is otherwise re-executed once for the
    # name collect plus once per touched partition
    updates = updates.cache()
    try:
        names = [r["name"] for r in updates.select("name").distinct().collect()]
        existing_dirs = {n: p for p, n in _partition_dirs(path)}
        touched: list[str] = []
        for name in sorted(names):
            upd = updates.filter(F.col("name") == name).drop("name")
            part = existing_dirs.get(name)
            if part is None:
                # brand-new metric: no merge needed, but keep the store's
                # sorted-by-series-key file layout like every other writer
                (
                    upd.withColumn("name", F.lit(name))
                    .withColumn("_sk", series_key_str(name=F.lit(name)))
                    .sortWithinPartitions("_sk", "ts")
                    .drop("_sk")
                    .write.mode("append")
                    .partitionBy("name")
                    .parquet(path)
                )
                touched.append(name)
                continue
            merged = (
                upd.withColumn("_prio", F.lit(0))
                .unionByName(
                    spark.read.parquet(str(part)).withColumn("_prio", F.lit(1))
                )
                .withColumn("_sk", series_key_str(name=F.lit(name)))
            )
            w = Window.partitionBy("_sk", "ts").orderBy(
                "_prio", F.col("value").desc()
            )
            out = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_prio", "_rn")
                .sortWithinPartitions("_sk", "ts")
                .drop("_sk")
            )
            tmp = f"{path}/.upsert_tmp_name={part.name.split('=', 1)[1]}"
            out.write.mode("overwrite").parquet(tmp)
            _swap_partition_dir(part, tmp)
            touched.append(name)
        return touched
    finally:
        updates.unpersist()


def store_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Integrity manifest: (name, n_rows, content_hash) per partition,
    where ``content_hash`` is the bit-XOR of each row's
    ``xxhash64(series key, ts, value)`` — order-insensitive, so any
    re-layout of the same rows (compaction, upsert no-op, replication)
    hashes identically, while one flipped value, lost row, or duplicated
    row changes it. The scan is embarrassingly parallel (map-side partial
    XOR, one tiny shuffle of per-partition partials).
    """
    df = read_store(spark, path)
    return (
        df.withColumn("_sk", series_key_str())
        .groupBy("name")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(xxhash64(_sk, ts, value))").alias("content_hash"),
        )
    )


def verify_store_manifest(
    spark: SparkSession, path: str, manifest: DataFrame
) -> DataFrame:
    """Diff the live store against a previously-recorded manifest:
    returns (name, status) rows for every discrepancy — ``changed``
    (hash or count differs), ``missing`` (in manifest, not on disk),
    ``unexpected`` (on disk, not in manifest). Empty result = intact.

    ``manifest`` must be MATERIALIZED data (rows read back from wherever
    the manifest was persisted), not a live/cached :func:`store_manifest`
    plan over the same path — Spark's cache-plan matching would serve the
    identical cached plan to BOTH sides of the diff and report an intact
    store no matter what changed (pinned by the tampering test).
    """
    live = store_manifest(spark, path)
    m = manifest.select(
        F.col("name"),
        F.col("n_rows").alias("_m_rows"),
        F.col("content_hash").alias("_m_hash"),
    )
    joined = live.join(m, "name", "full_outer")
    return joined.select(
        "name",
        F.when(F.col("n_rows").isNull(), F.lit("missing"))
        .when(F.col("_m_rows").isNull(), F.lit("unexpected"))
        .when(
            (F.col("n_rows") != F.col("_m_rows"))
            | ~F.col("content_hash").eqNullSafe(F.col("_m_hash")),
            F.lit("changed"),
        )
        .alias("status"),
    ).filter(F.col("status").isNotNull())
