"""Cross-batch exact deduplication backed by the snapshot store.

The batch dedup family (pipeline/dedup.py) answers "which documents in
THIS corpus are duplicates"; ``dropDuplicatesWithinWatermark``
(streaming/dedup.py) suppresses copies arriving within a bounded time
horizon. A continuously-fed training corpus needs the third shape:
**exact first-occurrence dedup against ALL history** — a new crawl batch
must be checked against every fingerprint ever ingested, not just the
watermark window, and the seen-set must survive restarts. The natural
home for that seen-set is the repo's own table format
(sources/snapshot_store.py): fingerprints are committed as ``name`` keys,
so they ride the store's atomic CAS manifests, compaction and time travel
for free.

Scale shape (the part that matters at 100 TB):

- the seen-store scan is **one pass over a single 32-byte column**
  (``name``), column-pruned at the parquet reader — document text never
  lives in the store;
- membership is resolved with TWO broadcast joins and ZERO shuffles of
  the store: ``store LEFT SEMI broadcast(batch-keys)`` streams the store
  once and emits only the (≤ batch-sized) intersection, then
  ``batch LEFT ANTI broadcast(intersection)`` filters the batch
  map-side. The obvious one-join spelling — ``batch LEFT ANTI store`` —
  must shuffle (or broadcast) the STORE side; on local[32] that shuffle
  is cheap enough to win at tens of millions of keys
  (scripts/stress_dedup_store.py records both honestly), but it moves
  the ENTIRE seen-set over the network per batch, which is the cost
  that explodes at a billion keys on a real cluster — the broadcast
  shape's store-side Exchange count is 0 by construction;
- within-batch first-wins is a ``min_by`` hash aggregate (map-side
  partial combine), not a per-key window sort — a batch containing 10⁸
  copies of one boilerplate page reduces in parallel instead of sorting
  one executor's world;
- the commit is a pure **append**: first-wins never modifies an existing
  row, so new fingerprints land as new files via ``snapshot_write`` and
  old files carry over by manifest reference. (A ``snapshot_merge`` fold
  was measured and rejected: merge rewrites every name-range-intersecting
  file, and uniform md5 keys intersect EVERYTHING — each batch rewrote
  the whole store, 30.9 s at 20 M keys and unbounded at scale. The
  append commit is O(new fingerprints) regardless of store size.);
- replay safety needs no txn marker: a redelivered batch recomputes its
  survivors against a store that already contains them, gets an empty
  frame, emits nothing and appends nothing. Single writer per store
  (Structured Streaming's model); concurrent writers could both admit
  the same fingerprint — the same caveat the merge path had;
- per-file Bloom sidecars were MEASURED AND RETIRED (round 9,
  scripts/stress_bloom_sidecar.py; numbers in EXPLAIN.md §31): at 20 M
  stored keys / 256 files and a 200 k mostly-new batch, every file holds
  at least one true batch key — an IDEAL (fpp=0) filter prunes 0/256
  files, and a real bloom does strictly worse (each of the ~190 k new
  keys probes every file's filter at the fpp, so P(prune) ≈ e^(−fpp·B)
  ≈ 0 for any practical fpp). Blooms only start pruning when batches
  shrink below ~1/fpp keys (~700 at fpp=1e-3) — not this operator's
  crawl-batch regime, and the measured membership wall at 20 M keys is
  already 2.1 s. Min/max name-range pruning cannot help either (uniform
  md5 keys intersect every range).

Reference parity: the reference engine has no dedup surface at all
(SURVEY.md §2.7) — this module is part of the training-data pipeline
extension the brief asks for, composing fingerprint identity
(pipeline/text.py fingerprint, shared with dedup_exact_fp and the
streaming dedup so all three agree on what "same document" means) with
the store's commit protocol.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from prometheus_parquet_server_spark.pipeline.text import fingerprint

__all__ = ["dedup_ingest", "stream_dedup_ingest"]


def dedup_ingest(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    on_survivors: Callable[[DataFrame], None] | None = None,
    txn: tuple[str, int] | None = None,
) -> DataFrame:
    """Ingest ``batch`` against the fingerprint store at ``store_path``:
    returns the batch's NEW documents (first occurrence of each content
    fingerprint, within-batch ties broken by smallest ``id_col``) and
    appends their fingerprints so later batches see them. Rows with NULL
    ``text_col`` have no content identity and are dropped (the store
    rejects NULL names by contract).

    The returned frame carries the batch's original columns (winners
    only). The store rows are ``(name=fingerprint, ts=0.0, doc_id)`` —
    ``ts`` is the snapshot store's required clustering key, pinned to a
    constant because fingerprint identity has no meaningful event time;
    files therefore cluster purely on the md5 ``name`` axis.

    ``on_survivors`` (optional) is called with the survivor frame AFTER
    it is computed but BEFORE the fingerprints commit — the hook a
    streaming sink needs for at-least-once emission: a crash between the
    emit and the commit replays the batch with the same survivors; a
    crash after the commit replays it as zero survivors (the recomputed
    anti-join filters everything). The store is exactly-once either way
    under the single-writer model.
    """
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    if "_fp" in batch.columns:
        raise ValueError("dedup_ingest: batch already has a _fp column")
    keyed = batch.withColumn("_fp", fingerprint(F.col(text_col))).filter(
        F.col("_fp").isNotNull()
    )
    # within-batch first-wins: min_by keeps the whole winner row in ONE
    # skew-proof hash aggregate (no per-key sort, no second join). Cached:
    # its subtree feeds BOTH membership joins (the broadcast key frame and
    # the anti-join left side), and column pruning makes the two exchanges
    # non-identical so ReuseExchange cannot dedupe them.
    payload = [c for c in batch.columns]
    batch_first = (
        keyed.groupBy("_fp")
        .agg(F.min_by(F.struct(*payload), F.col(id_col)).alias("_row"))
        .select("_fp", "_row.*")
        .cache()
    )

    if snapshot_version(spark, store_path) is not None:
        # store scan is name-column-only; both joins broadcast the small side
        seen = snapshot_read(spark, store_path).select(F.col("name").alias("_fp"))
        present = seen.join(
            F.broadcast(batch_first.select("_fp")), "_fp", "left_semi"
        )
        new_docs = batch_first.join(F.broadcast(present), "_fp", "left_anti")
    else:
        new_docs = batch_first
    # the RETURNED frame is the cached one, so a caller's .unpersist()
    # actually releases it (caching an internal frame and returning a
    # projection would leak: CacheManager matches by plan identity).
    # Recompute after the caller unpersists stays version-pinned because
    # snapshot_read resolved the manifest file list eagerly above.
    out = new_docs.drop("_fp").cache()
    if on_survivors is not None:
        on_survivors(out)

    # fingerprints recompute from the cached survivors (a cheap md5 per
    # NEW doc) so the commit rides `out`'s cache, not the join plan
    commit_rows = out.select(
        fingerprint(F.col(text_col)).alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("doc_id"),
    )
    # pure append: first-wins never touches an existing row, so the commit
    # cost is O(new fingerprints) — never a rewrite of intersecting files.
    # An all-duplicates batch commits nothing at all.
    if not commit_rows.isEmpty():
        # txn (optional) rides snapshot_write's append marker — belt and
        # braces on top of recompute-empty replay safety, and it lets a
        # streaming caller skip redelivered batches without the store scan
        snapshot_write(spark, store_path, commit_rows, mode="append", txn=txn)
    else:
        out.count()  # populate out's cache fully before dropping batch_first
    batch_first.unpersist()
    return out


def stream_dedup_ingest(
    docs_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    output_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_every: int | None = 64,
    vacuum_keep_last: int | None = None,
) -> StreamingQuery:
    """Streaming wrapper: each micro-batch's survivors are appended to
    ``output_path`` (parquet) and their fingerprints committed. Emission
    happens BEFORE the commit (the ``on_survivors`` hook), so the output
    is at-least-once — a crash between emit and commit replays the batch
    and re-appends the same survivors — while the STORE stays
    exactly-once; a batch redelivered AFTER its commit recomputes empty
    survivors, so it emits nothing and appends nothing. Replay safety
    here is deliberately CONTENT-BASED, not marker-based: a txn marker is
    only valid within one checkpoint lineage (reset the checkpoint and
    batch ids restart at 0 below the recorded marker — a marker check
    would then silently DROP genuinely new batches), while the
    recompute-empty anti-join is correct under any lineage. Downstream
    readers needing exactly-once files dedupe the output by fingerprint,
    or read the store, which is always clean.

    ``compact_every``: the flip side of pure-append commits is one small
    file per batch — after 10⁵ micro-batches the membership scan is
    10⁵ footer opens. Every ``compact_every``-th batch therefore runs
    :func:`snapshot_compact` (size-aware: rewrites only the small-file
    debt, never the whole store; identical rows, time travel unaffected)
    so the file count stays ~O(store bytes / target file size) instead of
    O(batches). None disables (caller owns maintenance).

    ``vacuum_keep_last``: compaction leaves superseded files on disk for
    time travel — a forever-stream also needs reclamation, so when set,
    each compaction is followed by :func:`snapshot_vacuum(keep_last=N)`
    (age-guarded: only files older than the in-flight window delete, so
    a concurrent staged-but-uncommitted writer is never broken). None
    (default) keeps full history — the conservative choice."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        survivors = dedup_ingest(
            spark,
            store_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            on_survivors=lambda df: df.write.mode("append").parquet(output_path),
        )
        survivors.unpersist()
        if compact_every is not None and (int(batch_id) + 1) % compact_every == 0:
            from prometheus_parquet_server_spark.sources.snapshot_store import (
                snapshot_compact,
                snapshot_vacuum,
            )

            snapshot_compact(spark, store_path)
            if vacuum_keep_last is not None:
                snapshot_vacuum(spark, store_path, keep_last=vacuum_keep_last)

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{store_path}/_stream_checkpoint")
        .start()
    )
