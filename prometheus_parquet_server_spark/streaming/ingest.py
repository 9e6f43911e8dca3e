"""Structured Streaming mirror of the batch metrics model.

The reference has no streaming surface (SURVEY.md §2.7) — it batch-loads at
startup. This module is the forward-looking path the north star asks for: the
same canonical long model fed incrementally, with event-time watermarks for
late data and windowed aggregations standing in for grid-aligned queries.

Patterns used (all stock Structured Streaming):
- file source with schema pinning (streams can't infer);
- event-time watermark → bounded state;
- tumbling/sliding window aggregations (counts, per-window rate proxy);
- ``availableNow`` trigger for batch-parity testing: drain everything
  currently in the source, then stop — the result must equal the batch
  computation over the same files.

At scale the file source becomes Kafka/queue; nothing below changes except
``readStream`` options — the transformations are source-agnostic.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_events_as_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table → canonical metrics stream
    (name, labels, event_time, value)."""
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from prometheus_parquet_server_spark.sources.ingest import epoch_micros

    # NULL-ts ingest rule (round 12, twin of the batch _metrics_flat
    # guard): a sample has a MANDATORY event time. Spark's windowed aggs
    # silently drop NULL event times anyway — the explicit filter makes
    # the contract visible and keeps the DuckDB oracles' `WHERE ts IS NOT
    # NULL` the same rule rather than an engine accident.
    return stream.where(F.col("ts").isNotNull()).select(
        F.col("event_type").alias("name"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("labels"),
        F.timestamp_micros(epoch_micros(stream)).alias("event_time"),
        "value",
    )


def stream_windowed_counts(
    metrics_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-(window, name) sample counts with a late-data watermark."""
    return (
        metrics_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("name"))
        .agg(F.count("*").alias("n_samples"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "name",
            "n_samples",
            "sum_value",
        )
    )


def stream_windowed_rate(
    metrics_stream: DataFrame,
    window: str = "6 hours",
    slide: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding-window per-series increase/seconds — the streaming stand-in
    for ``rate()``: (max-min value delta across the window) / window span.

    Uses (first/last by event-time) via max_by/min_by — incremental-friendly
    aggregates, no per-series sort state.
    """
    win = F.window("event_time", window, slide)
    span = F.col("window.end").cast("double") - F.col("window.start").cast("double")
    return (
        metrics_stream.withWatermark("event_time", watermark)
        .groupBy(win, F.col("name"))
        .agg(
            F.max_by("value", "event_time").alias("_last"),
            F.min_by("value", "event_time").alias("_first"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "name",
            ((F.col("_last") - F.col("_first")) / span).alias("rate"),
            "n",
        )
    )


def stream_txn_append(
    stream: DataFrame,
    checkpoint_location: str,
    app_id: str,
    ingest_fn,
) -> StreamingQuery:
    """The SHARED foreachBatch transactional-append scaffold behind the
    ``stream_*_ingest`` twins (rollup, IVF, IVF-PQ, hybrid index):
    skip empty micro-batches, call ``ingest_fn(batch_df, txn)`` with
    ``txn = (app_id, batch_id)`` so the store's marker makes redelivered
    batches version-preserving no-ops, drain with ``availableNow``, and
    checkpoint at the given location. The mechanics live ONCE here so a
    fix to any of them (as with round 10's side-scoped app_id) cannot
    miss a twin. One writer per app_id/checkpoint; batch ids restart at
    0 on a checkpoint reset, so pass a NEW app_id whenever the
    checkpoint is reset or relocated (the stream_ivf_ingest caveat).
    Twins with EXTRA per-batch behavior (minhash/dedup compaction
    cadence, the DSIR drift hook) keep their own bodies by design."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_fn(batch_df, (app_id, int(batch_id)))

    return (
        stream.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )


def stream_rollup_ingest(
    events_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    width_s: float = 60.0,
    ts_col: str = "ts",
    value_col: str = "value",
    name_col: str = "event_type",
) -> StreamingQuery:
    """Streaming continuous aggregate: every micro-batch folds into the
    persisted rollup-partial snapshot store via ``foreachBatch`` →
    :func:`operators.rollup.rollup_ingest` — the standard Structured
    Streaming pattern for sinks with their own transactional protocol.
    Exactly-once comes from the COMBINATION: the snapshot commit is atomic
    (a crashed fold before its manifest publish is invisible, the
    restarted batch re-folds), the fold is deterministic, and the
    remaining at-least-once hazard — a batch that COMMITTED but whose
    streaming offsets didn't, which foreachBatch then REDELIVERS — is
    closed by the ``txn=(app_id, batch_id)`` marker riding the same
    manifest as the folded data (snapshot_merge skips any batch id ≤ the
    recorded one; the Delta txnAppId/txnVersion pattern). One writer per
    app_id/checkpoint, which is Structured Streaming's model anyway — a
    concurrent same-app writer loses the manifest CAS and errors rather
    than double-folding. Returns the started query (caller awaits
    termination)."""
    from prometheus_parquet_server_spark.operators.rollup import rollup_ingest

    def _fold(batch_df: DataFrame, txn: tuple[str, int]) -> None:
        rollup_ingest(
            spark,
            store_path,
            batch_df,
            width_s=width_s,
            ts_col=ts_col,
            value_col=value_col,
            name_col=name_col,
            txn=txn,
        )

    return stream_txn_append(
        events_stream,
        f"{store_path}/_stream_checkpoint",
        "stream_rollup_ingest",
        _fold,
    )


def run_available_now(
    df: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink and
    return the materialized result (batch-parity execution of a streaming
    plan).

    Mode semantics matter for the bounded-state claim: ``complete`` retains
    every window's state for re-emission (full batch parity, but state
    grows with history — fine for a finite drain, not for run-forever);
    ``append``/``update`` are the production modes where the watermark
    actually evicts state and append only emits watermark-closed windows
    (exercised in tests/test_streaming_server.py)."""
    sink = f"stream_sink_{uuid.uuid4().hex[:8]}"
    q: StreamingQuery = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
