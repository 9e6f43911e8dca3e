"""Streaming deduplication for the training-data pipeline.

Batch dedup (pipeline/dedup.py) answers "which documents in this corpus are
duplicates"; a continuously-fed corpus needs the streaming complement:
emit each NEW document once, suppressing later copies, with bounded state.

Stock Structured Streaming building blocks:
- content fingerprint (the batch ``pipeline.text.fingerprint`` — md5 of
  normalized text — so batch and stream agree on identity);
- ``dropDuplicatesWithinWatermark`` keyed on the fingerprint: exactly-once
  emission per fingerprint while the state store only retains keys inside
  the watermark horizon — the property that makes this run forever at
  100 TB/day (a plain ``dropDuplicates`` would grow state without bound);
- ``availableNow`` parity: draining a static corpus through the stream
  must emit exactly one row per distinct fingerprint (asserted in
  tests/test_streaming_server.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import fingerprint


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents table with event-time from created_at
    (synthesized deterministically from doc_id when absent)."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    cols = set(static.columns)
    if "created_at" in cols:
        event_time = F.col("created_at").cast("timestamp")
    else:
        # deterministic synthetic event time — keeps the watermark machinery
        # honest without a wall clock
        event_time = F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("doc_id"), F.lit(86400))
        )
    return stream.withColumn("event_time", event_time)


def stream_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    watermark: str = "2 days",
) -> DataFrame:
    """Exact streaming dedup: first occurrence of each content fingerprint
    passes through; duplicates arriving within the watermark horizon are
    dropped; state for fingerprints older than the horizon is evicted.
    """
    fp = fingerprint(F.col(text_col)).alias("fingerprint")
    return (
        docs_stream.select("doc_id", "event_time", F.col(text_col), fp)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def stream_dedup_near(
    docs_stream: DataFrame,
    text_col: str = "text",
    watermark: str = "2 days",
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """NEAR-duplicate streaming dedup, stage 1 of 2: per-band-bucket
    first-wins.

    Same MinHash signatures/banding as the batch path (pipeline/dedup.py),
    so batch and stream agree on candidate identity. Each document emits
    ``bands`` band keys; ``dropDuplicatesWithinWatermark`` on the band key
    keeps only the FIRST claimant of each bucket inside the watermark
    horizon — bounded state (one entry per live bucket), exactly one
    stateful operator. Output: the surviving (doc_id, event_time,
    band_key) rows.

    Consolidation to per-document keep/drop (a doc survives iff it kept
    ALL its bands — a later near-dup shares ≥1 bucket with an earlier doc
    and loses it) is :func:`consolidate_near_dedup`, a plain aggregation
    the consumer runs on the drained/sunk rows. It is NOT chained into the
    stream: Spark's multi-stateful support does not include
    dedup-followed-by-aggregation — the chained form silently emits
    nothing in append mode (observed, Spark 4.1).

    FALSE-DROP TRADE-OFF (vs the batch path): the batch LSH pipeline
    similarity-verifies every candidate pair before declaring a duplicate;
    this stream stage does not — a document losing ANY band bucket is
    dropped at consolidation, so (a) chance band collisions between
    dissimilar documents cause false drops at a rate that grows with
    corpus size per bucket-collision probability, and (b) an early
    claimant that itself lost other bands still poisons the buckets it
    won, so stream and batch keep-sets diverge beyond candidate identity.
    Run :func:`verify_near_dedup` over the drained rows to resurrect
    documents dropped only by dissimilar claimants."""
    from prometheus_parquet_server_spark.pipeline.dedup import (
        minhash_bands,
        minhash_signature,
    )

    sig = minhash_signature(F.col(text_col), num_perm=num_perm)
    keyed = docs_stream.select(
        "doc_id",
        "event_time",
        F.explode(minhash_bands(sig, bands, num_perm // bands)).alias("band_key"),
    ).withWatermark("event_time", watermark)
    return keyed.dropDuplicatesWithinWatermark(["band_key"])


def consolidate_near_dedup(kept_bands: DataFrame, bands: int = 4) -> DataFrame:
    """Stage 2 (batch, over the drained stage-1 rows): documents that kept
    every band — no bucket was claimed by an earlier document."""
    return (
        kept_bands.groupBy("doc_id")
        .agg(F.count("*").alias("_n_kept"), F.min("event_time").alias("event_time"))
        .filter(F.col("_n_kept") == bands)
        .select("doc_id", "event_time")
    )


def verify_near_dedup(
    docs: DataFrame,
    kept_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Stage 3 (optional, batch): resurrect false drops.

    Re-derives each document's band keys (signatures are deterministic, so
    batch recomputation agrees with what the stream hashed), finds the
    buckets a dropped document LOST, joins the claimant that won each such
    bucket, and estimates similarity as the fraction of agreeing MinHash
    signature slots (an unbiased Jaccard estimator). A dropped document
    whose every claimant is below ``threshold`` was dropped by a chance
    band collision and is returned for resurrection.

    Scale shape: one equi-join on band_key (bucket-sized, not corpus²),
    one broadcast-friendly join for claimant signatures, per-row zip_with
    for the slot agreement — no all-pairs stage. Residual approximation:
    similarity is judged against the bucket CLAIMANT only; a claimant that
    was itself dropped still vetoes (mirrors the stream's first-wins
    semantics, documented in :func:`stream_dedup_near`).

    Returns (doc_id,) rows to ADD back to :func:`consolidate_near_dedup`'s
    keep set.
    """
    from prometheus_parquet_server_spark.pipeline.dedup import (
        minhash_bands,
        minhash_signature,
    )

    rows_per_band = num_perm // bands
    with_sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(F.col(text_col), num_perm=num_perm).alias("_sig"),
    )
    all_bands = with_sig.select(
        "doc_id",
        "_sig",
        F.explode(minhash_bands(F.col("_sig"), bands, rows_per_band)).alias(
            "band_key"
        ),
    )
    claimants = kept_bands.select(
        "band_key", F.col("doc_id").alias("_claimant")
    )
    # a band was LOST iff its bucket's claimant is a different document
    lost = (
        all_bands.join(claimants, "band_key")
        .filter(F.col("_claimant") != F.col("doc_id"))
    )
    claimant_sig = with_sig.select(
        F.col("doc_id").alias("_claimant"), F.col("_sig").alias("_csig")
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sig"), F.col("_csig"), lambda a, b: a == b),
            lambda x: x,
        )
    ) / F.lit(float(num_perm))
    sims = lost.join(claimant_sig, "_claimant").select(
        "doc_id", agree.alias("_sim")
    )
    # dropped docs = lost ≥1 band; resurrect those all of whose claimants
    # are dissimilar (max estimated Jaccard below threshold)
    return (
        sims.groupBy("doc_id")
        .agg(F.max("_sim").alias("_max_sim"))
        .filter(F.col("_max_sim") < F.lit(threshold))
        .select("doc_id")
    )
