"""Incremental banded-MinHash signature store (pipeline/minhash_store.py):
N disjoint ingests must surface exactly the one-shot candidate pair set,
geometry is pinned, and redelivery is stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.dedup import lsh_candidate_pairs
from prometheus_parquet_server_spark.pipeline.minhash_store import (
    minhash_ingest,
    minhash_store_pairs,
)

pytestmark = pytest.mark.usefixtures("spark")

GEO = dict(num_perm=4, bands=2, shingle_n=1)


def _docs(spark, n=60, dup_every=5):
    """Synthetic docs with deliberate near/exact duplicates."""
    rows = []
    for i in range(n):
        base = i // dup_every if i % dup_every == 0 else i
        words = [f"w{(base * 7 + k) % 23}" for k in range(8)]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _pairs(df):
    return sorted((r.id_a, r.id_b) for r in df.collect())


def test_incremental_equals_one_shot(spark, tmp_path):
    docs = _docs(spark)
    store = f"file://{tmp_path}/mh"
    returned = []
    for band in range(3):
        out = minhash_ingest(
            spark, store, docs.filter(F.pmod("doc_id", F.lit(3)) == band), **GEO
        )
        returned.extend(_pairs(out))
        out.unpersist()
    one_shot = _pairs(lsh_candidate_pairs(docs, **GEO))
    # the store's one-shot view equals batch LSH over the union corpus
    assert _pairs(minhash_store_pairs(spark, store)) == one_shot
    # and the UNION of per-ingest returns covers every pair exactly
    # (each pair surfaces when its later member arrives)
    assert sorted(set(returned)) == one_shot


def test_per_ingest_return_covers_history_and_batch(spark, tmp_path):
    docs = _docs(spark, n=20, dup_every=2)
    store = f"file://{tmp_path}/mh"
    first = docs.filter(F.col("doc_id") < 10)
    second = docs.filter(F.col("doc_id") >= 10)
    p1 = _pairs(minhash_ingest(spark, store, first, **GEO))
    p2 = _pairs(minhash_ingest(spark, store, second, **GEO))
    one_shot = set(_pairs(lsh_candidate_pairs(docs, **GEO)))
    # ingest 1: only batch-internal pairs; ingest 2: its internal pairs
    # PLUS every cross pair against history
    assert set(p1) == {p for p in one_shot if p[0] < 10 and p[1] < 10}
    assert set(p1) | set(p2) == one_shot
    cross = {p for p in one_shot if p[0] < 10 <= p[1]}
    assert cross <= set(p2)


def test_geometry_pinned(spark, tmp_path):
    docs = _docs(spark, n=10)
    store = f"file://{tmp_path}/mh"
    minhash_ingest(spark, store, docs, **GEO).unpersist()
    with pytest.raises(ValueError, match="geometry|minhash_"):
        minhash_ingest(spark, store, docs, num_perm=8, bands=2, shingle_n=1)


def test_redelivery_is_stable(spark, tmp_path):
    """A redelivered batch returns the SAME pairs (its own bands already
    in the store add only self-pairs, removed by id_a < id_b), and with a
    txn marker the band append is skipped so the store does not bloat."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )

    docs = _docs(spark, n=20, dup_every=2)
    store = f"file://{tmp_path}/mh"
    p1 = _pairs(minhash_ingest(spark, store, docs, txn=("app", 1), **GEO))
    n_rows = snapshot_read(spark, store).count()
    p2 = _pairs(minhash_ingest(spark, store, docs, txn=("app", 1), **GEO))
    assert p1 == p2
    assert snapshot_read(spark, store).count() == n_rows


def test_empty_and_zero_token_docs_dropped(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "a b c")],
        "doc_id bigint, text string",
    )
    store = f"file://{tmp_path}/mh"
    out = minhash_ingest(spark, store, docs, **GEO)
    assert _pairs(out) == [(1, 4)]


def test_stream_ingest_drains_to_one_shot(spark, tmp_path):
    """availableNow drain through stream_minhash_ingest: the distinct()
    of the emitted pair stream equals one-shot batch LSH over the corpus."""
    from prometheus_parquet_server_spark.pipeline.minhash_store import (
        stream_minhash_ingest,
    )

    docs = _docs(spark, n=40, dup_every=4)
    src = f"{tmp_path}/src"
    docs.repartition(4).write.parquet(src)  # several files -> several batches
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = f"file://{tmp_path}/mh"
    out = f"{tmp_path}/pairs"
    q = stream_minhash_ingest(
        stream, spark, store, out, compact_every=None, **GEO
    )
    q.awaitTermination(180)
    got = sorted(
        (r.id_a, r.id_b)
        for r in spark.read.parquet(out).distinct().collect()
    )
    assert got == _pairs(lsh_candidate_pairs(docs, **GEO))


def test_dedup_bands_maintenance(spark, tmp_path):
    """Replayed-append duplicates collapse under minhash_dedup_bands; the
    pinned geometry survives the rewrite and pairs are unchanged."""
    from prometheus_parquet_server_spark.pipeline.minhash_store import (
        minhash_dedup_bands,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
    )

    docs = _docs(spark, n=20, dup_every=2)
    store = f"file://{tmp_path}/mh"
    minhash_ingest(spark, store, docs, **GEO).unpersist()
    minhash_ingest(spark, store, docs, **GEO).unpersist()  # replay, no txn
    n_dup = snapshot_read(spark, store).count()
    before = _pairs(minhash_store_pairs(spark, store))
    minhash_dedup_bands(spark, store)
    assert snapshot_read(spark, store).count() == n_dup // 2
    assert _pairs(minhash_store_pairs(spark, store)) == before
    # geometry still pinned post-rewrite
    props = snapshot_properties(spark, store)
    assert float(props["minhash_num_perm"]) == GEO["num_perm"]
    with pytest.raises(ValueError, match="geometry|minhash_"):
        minhash_ingest(spark, store, docs, num_perm=8, bands=2, shingle_n=1)


def test_max_bucket_caps_boilerplate_without_store_shuffle(spark, tmp_path):
    """A boilerplate band bucket (many identical docs) is dropped by
    max_bucket BEFORE the pair join — across ingests (stored + batch
    rows count toward the cap) — and the capped probe plan still has no
    store-side Exchange (the cap uses a groupBy-count + broadcast
    anti-join, not a window over the universe)."""
    from prometheus_parquet_server_spark.pipeline.minhash_store import (
        minhash_ingest,
    )

    import warnings

    store = f"file://{tmp_path}/mh"
    boiler = [(i, "accept all cookies now") for i in range(4)]
    uniq = [(100 + i, f"unique body {i} text piece") for i in range(3)]
    b1 = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    # capped ingest mode voids the one-shot equivalence contract and must
    # say so loudly (per-ingest cap evaluation is monotone-forward)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        p1 = minhash_ingest(
            spark, store, b1, num_perm=4, bands=1, shingle_n=2, max_bucket=3
        )
    assert any(
        "equivalence contract" in str(w.message) for w in caught
    ), "capped ingest must warn that it voids the one-shot equivalence"
    got1 = {(r["id_a"], r["id_b"]) for r in p1.collect()}
    # the 4-doc boilerplate bucket exceeds the cap -> no pairs from it
    assert got1 == set()

    # second ingest: one more boilerplate copy; cap counts stored+batch
    b2 = spark.createDataFrame(
        [(200, "accept all cookies now"), (201, "unique body 1 text piece")],
        "doc_id long, text string",
    )
    p2 = minhash_ingest(
        spark, store, b2, num_perm=4, bands=1, shingle_n=2, max_bucket=3
    )
    got2 = {(r["id_a"], r["id_b"]) for r in p2.collect()}
    assert (101, 201) in got2  # the unique near-dup still surfaces
    assert all(not (a in (0, 1, 2, 3, 200) and b in (0, 1, 2, 3, 200))
               for a, b in got2)  # capped bucket emits nothing

    # exact parity: uncapped run on a fresh store DOES return the
    # boilerplate pairs (the cap is the only difference)
    store2 = f"file://{tmp_path}/mh2"
    p3 = minhash_ingest(spark, store2, b1, num_perm=4, bands=1, shingle_n=2)
    assert {(r["id_a"], r["id_b"]) for r in p3.collect()} >= {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }

    # plan shape: no Exchange on the stored-parquet side of the capped
    # probe (the only sort/shuffle inputs are the tiny count agg and the
    # batch-side broadcast)
    plan = p2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
