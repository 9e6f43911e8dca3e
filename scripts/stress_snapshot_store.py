#!/usr/bin/env python
"""Snapshot-store stress: the commit-protocol table format under a
realistic lifecycle at scale — initial load, incremental appends, a
narrow upsert, manifest-arithmetic retention, and a pruned read. Each
timing answers: is the table-format overhead (stats job + manifest
commit) acceptable, and does pruning actually cut the read?

Usage: python scripts/stress_snapshot_store.py [N] [store_dir]
(default 20_000_000 rows into a temp dir)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.sources.snapshot_store import (
    snapshot_compact,
    snapshot_expire,
    snapshot_read,
    snapshot_upsert,
    snapshot_version,
    snapshot_write,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    store = f"file://{root}/snapstress"
    spark = get_spark("stress-snapshot")
    metrics = 200

    def gen(lo, hi, tag):
        d = spark.range(lo, hi)
        return d.select(
            F.concat(F.lit("m"), (F.col("id") % metrics).cast("string")).alias("name"),
            F.create_map(F.lit("src"), F.lit(tag)).alias("labels"),
            (F.col("id").cast("double") / 100.0).alias("ts"),
            (F.xxhash64("id") % 10_000).cast("double").alias("value"),
        )

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s")
        return out

    nm = n // 1_000_000
    timed(f"initial load ({nm}M rows, {metrics} metrics)",
          lambda: snapshot_write(spark, store, gen(0, n, "base"), mode="overwrite"))
    timed(f"append ({nm // 10}M rows)",
          lambda: snapshot_write(spark, store, gen(n, n + n // 10, "inc")))
    # narrow upsert: 1% of rows, 2 metrics — must NOT rewrite the store
    upd = gen(0, n // 100, "fix").filter(F.col("name").isin("m0", "m1"))
    timed("upsert (2 of 200 metrics, <=1% of rows)",
          lambda: snapshot_upsert(spark, store, upd))
    # size-aware compaction: only the small files from the append/upsert
    # commits rewrite; the initial load's full-size files carry over
    timed("compact (small-file debt only)",
          lambda: snapshot_compact(spark, store, target_file_bytes=8 << 20))
    timed("expire (drop oldest ~50% by manifest arithmetic)",
          lambda: snapshot_expire(spark, store, min_ts=n / 200.0))
    t0 = time.time()
    full = snapshot_read(spark, store).count()
    t_full = time.time() - t0
    t0 = time.time()
    pruned = snapshot_read(spark, store, names=["m42"]).count()
    t_pruned = time.time() - t0
    print(f"read full: {t_full:.1f}s ({full} rows); "
          f"read one metric (manifest-pruned): {t_pruned:.1f}s ({pruned} rows)")
    print(f"final version: {snapshot_version(spark, store)}")


if __name__ == "__main__":
    main()
