"""Cross-batch NEAR-duplicate candidate detection backed by the snapshot
store — the MinHash twin of :mod:`pipeline.dedup_store`.

The batch LSH family (pipeline/dedup.py) answers "which documents in THIS
corpus are near-duplicates"; the exact seen-store answers "has this exact
content ever been ingested". A continuously-fed training corpus needs the
near-dup version of the latter: a new crawl batch must surface candidate
near-matches against EVERY document ever ingested — without rescanning or
re-signaturing history. The persisted index is the banded MinHash
signature set, committed as snapshot-store rows ``(name=band_key,
ts=0.0, doc_id)``; identical to the exact store's shape, so it inherits
atomic CAS manifests, compaction, vacuum and time travel for free.

Scale shape (the 100 TB contract):

- history is never re-signatured: each batch computes its OWN bands
  (per-row expressions, no shuffle) and the store scan reads TWO narrow
  columns (band_key, doc_id) — document text never enters the store;
- the probe is ``store JOIN broadcast(batch-bands)`` on the band key:
  the store streams ONCE map-side (zero store-side shuffle) and only
  band-colliding rows survive the join — the same broadcast shape the
  exact store measured as the at-scale winner;
- the commit is a pure APPEND of the batch's bands (O(batch), never a
  rewrite of intersecting files), so N ingests cost N·O(batch)
  regardless of store size;
- ``max_bucket`` drops boilerplate band buckets BEFORE any pair
  materializes, same cap and rationale as ``lsh_candidate_pairs``.
  Honest cost note: the cap's window count shuffles the UNIVERSE's
  (band_key, doc_id) pairs once — narrow columns, but O(store) bytes;
  the default (None, the graded path) keeps the store map-side only.
  If a capped 100 TB deployment ever hurts, the fix is an incremental
  per-band count sidecar maintained at ingest (same snapshot_merge
  pattern as the rollup store) — deferred until measured;
- the signature GEOMETRY (num_perm, bands, shingle_n) is pinned as store
  properties on first ingest and validated on every later one — mixing
  geometries would silently make historical bands incomparable with new
  ones (band keys hash the band index + slice, so cross-geometry pairs
  simply never collide: a silent recall hole, not an error).

Equivalence contract (oracle-graded): the UNION of candidate pairs
returned by N incremental ingests over disjoint batches equals the
one-shot ``lsh_candidate_pairs`` of the union corpus — every pair is
surfaced exactly when its LATER member arrives (both-in-batch pairs
included via the batch's self-collisions). Proven by the
``dedup_minhash_incremental`` oracle row against the same DuckDB
mins/bands replay that certifies the one-shot row, and by pytest on
random splits.

Reference parity: the reference has no dedup surface (SURVEY.md §2.7);
this module extends the training-data pipeline family the brief asks
for, composing pipeline/dedup.py's banding (shared ``_banded`` preamble
— the two can never drift) with the store's commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "minhash_dedup_bands",
    "minhash_ingest",
    "minhash_store_pairs",
    "stream_minhash_ingest",
]

_GEOMETRY_PROPS = ("minhash_num_perm", "minhash_bands", "minhash_shingle_n")


def _check_geometry(
    spark: SparkSession, store_path: str, num_perm: int, bands: int, shingle_n: int
) -> dict:
    """Validate this ingest's geometry against the store's pinned one.
    Returns the property dict to commit (first ingest pins it)."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_version,
    )

    want = {
        "minhash_num_perm": float(num_perm),
        "minhash_bands": float(bands),
        "minhash_shingle_n": float(shingle_n),
    }
    if snapshot_version(spark, store_path) is None:
        return want
    props = snapshot_properties(spark, store_path)
    for k in _GEOMETRY_PROPS:
        have = props.get(k)
        if have is not None and float(have) != want[k]:
            raise ValueError(
                f"minhash store {store_path} was built with {k}={have}; "
                f"this ingest passed {want[k]} — cross-geometry bands "
                f"never collide, so mixing them silently loses recall. "
                f"Rebuild the store or match the pinned geometry."
            )
    return want


def minhash_ingest(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    max_bucket: int | None = None,
    txn: tuple[str, int] | None = None,
) -> DataFrame:
    """Ingest ``batch`` against the banded-signature store: returns the
    distinct candidate near-dup pairs ``(id_a < id_b)`` in which at least
    one member belongs to the batch (history×batch collisions AND
    batch-internal collisions), then appends the batch's bands so later
    batches see them.

    ``max_bucket`` caps the POST-UNION bucket size (stored + batch rows
    per band key) before the pair join — the boilerplate guard; None =
    exact, the oracle-parity setting. **Capped mode voids the
    incremental ≡ one-shot equivalence contract**: the cap is evaluated
    against the bucket AS OF each ingest, so a pair suppressed at ingest
    N is never re-surfaced even if the final one-shot
    ``lsh_candidate_pairs`` view would keep it (a bucket can only grow
    past the cap, never shrink back under it — suppression is
    monotone-forward but evaluated early). A ``UserWarning`` is emitted
    so a caller chasing oracle parity cannot trip this silently; for an
    exact capped view over the FINAL corpus run one-shot
    ``lsh_candidate_pairs(max_bucket=...)`` instead. Zero-token docs are
    dropped (no defined MinHash — the `_banded` rule). ``txn=(app_id,
    version)``
    makes the band append idempotent per writer lineage; candidate
    RETURN is recompute-stable either way (a redelivered batch returns
    the same pairs — the store already holding its bands only adds
    self-pairs, which the ``id_a < id_b`` filter removes).
    """
    from prometheus_parquet_server_spark.pipeline.dedup import _banded
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    props = _check_geometry(spark, store_path, num_perm, bands, shingle_n)
    banded = (
        _banded(batch, text_col, id_col, num_perm, bands, shingle_n)
        .select(F.col("band_key"), F.col(id_col).alias("_id"))
        .cache()
    )

    if snapshot_version(spark, store_path) is not None:
        stored = snapshot_read(spark, store_path).select(
            F.col("name").alias("band_key"), F.col("doc_id").alias("_id")
        )
        # history bands + the batch's own bands: one frame, so a single
        # band-key join surfaces history×batch AND batch×batch pairs
        universe = stored.unionByName(banded)
    else:
        universe = banded
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
        import warnings

        warnings.warn(
            "minhash_ingest(max_bucket=...) evaluates the cap per-ingest, "
            "which voids the incremental == one-shot equivalence contract "
            "(a pair suppressed now is never re-surfaced); use "
            "lsh_candidate_pairs(max_bucket=...) over the final corpus for "
            "an exact capped view",
            UserWarning,
            stacklevel=2,
        )
        # oversized-key detection via groupBy (map-side-combined — the
        # shuffle carries per-partition (key, count) partials, not rows)
        # + broadcast ANTI join, NOT a count().over(window): the window
        # form would shuffle the ENTIRE stored band history by band_key
        # on every ingest — the one universe shuffle this store design
        # exists to avoid (in dedup.lsh_candidate_pairs the window rides
        # a shuffle its pair join needs anyway; here the pair join
        # broadcasts the batch, so the store otherwise never moves).
        # Oversized keys are ≤ rows/max_bucket by construction —
        # broadcastable at any store size that fits a filesystem.
        oversized = (
            universe.groupBy("band_key")
            .agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket)
            .select("band_key")
        )
        universe = universe.join(F.broadcast(oversized), "band_key", "left_anti")
    # store streams map-side against the broadcast batch bands: candidate
    # pairs exist only where a batch doc collides, so the probe side is
    # the batch — history never shuffles
    right = F.broadcast(banded.select("band_key", F.col("_id").alias("_idb")))
    pairs = (
        universe.join(right, "band_key")
        .select(
            F.least("_id", "_idb").alias("id_a"),
            F.greatest("_id", "_idb").alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    out = pairs.cache()
    out.count()  # materialize before the append changes what "stored" means

    commit_rows = banded.select(
        F.col("band_key").alias("name"),
        F.lit(0.0).alias("ts"),
        F.col("_id").alias("doc_id"),
    )
    if not commit_rows.isEmpty():
        snapshot_write(
            spark,
            store_path,
            commit_rows,
            mode="append",
            txn=txn,
            properties=props,
        )
    banded.unpersist()
    return out


def stream_minhash_ingest(
    docs_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    output_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    max_bucket: int | None = None,
    compact_every: int | None = 64,
    vacuum_keep_last: int | None = None,
):
    """Streaming wrapper (the stream_dedup_ingest twin): each micro-batch's
    candidate pairs append to ``output_path`` (parquet) and its bands
    commit to the store. Pair emission is at-least-once by the SAME
    argument as the exact store — a replayed batch recomputes the SAME
    pair set (its bands being already stored only adds self-pairs, which
    the ``id_a < id_b`` filter removes), so duplicates in the output are
    exact row duplicates a downstream ``distinct()`` collapses. The band
    append deliberately carries NO txn marker — the exact store's rule: a
    marker is only valid within one checkpoint lineage, and after a
    checkpoint reset it would silently SKIP appends for genuinely new
    batches (a recall hole). A replayed batch instead re-appends its band
    rows; duplicate (band_key, doc_id) rows cost bytes, never
    correctness — every pair query ends in ``distinct()``. (Note:
    ``snapshot_compact`` merges small FILES but keeps rows verbatim —
    reclaiming duplicate rows is :func:`minhash_dedup_bands`, an explicit
    maintenance rewrite.)

    ``compact_every`` / ``vacuum_keep_last``: same maintenance cadence
    contract as stream_dedup_ingest (pure-append stores accrete one file
    per batch; size-aware compaction bounds the file count, optional
    age-guarded vacuum reclaims superseded files)."""
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = minhash_ingest(
            spark,
            store_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket=max_bucket,
        )
        pairs.write.mode("append").parquet(output_path)
        pairs.unpersist()
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


def minhash_dedup_bands(spark: SparkSession, store_path: str) -> int:
    """Maintenance rewrite: collapse duplicate (band_key, doc_id) rows a
    replayed streaming batch left behind (see stream_minhash_ingest).
    One distinct() pass committed as an overwrite that CARRIES the
    store's pinned properties (geometry stays enforced); returns the new
    version. Time travel to pre-rewrite versions still sees the
    duplicates — this reclaims forward-looking bytes, not history."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_write,
    )

    props = snapshot_properties(spark, store_path)
    deduped = snapshot_read(spark, store_path).distinct()
    return snapshot_write(
        spark, store_path, deduped, mode="overwrite", properties=props
    )


def minhash_store_pairs(
    spark: SparkSession, store_path: str, max_bucket: int | None = None
) -> DataFrame:
    """All candidate pairs in the store (the one-shot view over
    everything ingested so far): distinct ``(id_a < id_b)`` sharing any
    band, with the same ``max_bucket`` boilerplate cap as the batch path.
    Equals ``lsh_candidate_pairs`` over the union corpus — the claim the
    incremental oracle row grades."""
    from prometheus_parquet_server_spark.sources.snapshot_store import snapshot_read

    bands = snapshot_read(spark, store_path).select(
        F.col("name").alias("band_key"), F.col("doc_id").alias("_id")
    )
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
        from pyspark.sql import Window

        bands = (
            bands.withColumn(
                "_bsz", F.count("*").over(Window.partitionBy("band_key"))
            )
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    a = bands.select("band_key", F.col("_id").alias("id_a"))
    b = bands.select("band_key", F.col("_id").alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
