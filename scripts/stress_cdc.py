#!/usr/bin/env python
"""Change-feed catch-up stress: many-commit backlog through the paced
pps_snapshot stream.

Shape under test (the 100 TB story): a store accumulates a burst of
commits (a backfill, a producer catching up); a downstream stream must
ingest the backlog in bounded micro-batches without re-reading the
backlog's manifests every trigger (the memoized delta cache) and
without losing or duplicating a single row across commit boundaries.

Usage: python scripts/stress_cdc.py [n_commits] [rows_per_commit]
Prints one JSON line with wall times and exactness checks.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.sources.pyds import (
    register_snapshot_source,
)
from prometheus_parquet_server_spark.sources.snapshot_store import (
    snapshot_write,
)


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("stress-cdc")
    register_snapshot_source(spark)
    work = tempfile.mkdtemp(prefix="stress_cdc_")
    store = f"file://{work}/store"

    def batch_df(c):
        return spark.range(c * rows, (c + 1) * rows).select(
            F.lit(f"m{c % 7}").alias("name"),
            F.col("id").cast("double").alias("ts"),
            F.col("id").alias("row_id"),
            (F.col("id") * 0.5).alias("value"),
        )

    snapshot_write(spark, store, batch_df(0), mode="overwrite")

    # the realistic producer/consumer shape: the stream starts against a
    # one-commit store (the first — deliberately uncapped — trigger takes
    # it), then the producer bursts the remaining commits while the
    # stream runs, and admission control paces the catch-up
    seen = []
    t0 = time.time()
    q = (
        spark.readStream.format("pps_snapshot")
        .option("max_files_per_trigger", 2)
        .load(store)
        .writeStream.foreachBatch(
            # ONE aggregate pass per micro-batch (count + checksum), not
            # two actions re-reading the batch's files
            lambda df, bid: seen.append(
                (int(bid),)
                + tuple(df.agg(F.count("*"), F.sum("row_id")).first())
            )
        )
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    while not seen:
        if q.exception() is not None or not q.isActive:
            raise RuntimeError(f"stream died before first batch: {q.exception()}")
        time.sleep(0.2)  # first (uncapped) trigger has taken v1
    t_first = time.time() - t0

    t0 = time.time()
    for c in range(1, n_commits):
        snapshot_write(spark, store, batch_df(c))
    t_ingest = time.time() - t0

    n_expected_rows = n_commits * rows
    deadline = time.time() + 600
    while time.time() < deadline and sum(n for _, n, _ in seen) < n_expected_rows:
        if q.exception() is not None or not q.isActive:
            raise RuntimeError(f"stream died mid-drain: {q.exception()}")
        time.sleep(0.5)
    q.stop()
    t_drain = time.time() - t0 + t_first

    total_rows = sum(n for _, n, _ in seen)
    total_sum = sum(s or 0 for _, _, s in seen)
    expected_sum = n_expected_rows * (n_expected_rows - 1) // 2
    print(
        json.dumps(
            {
                "n_commits": n_commits,
                "rows_per_commit": rows,
                "ingest_s": round(t_ingest, 1),
                "drain_s": round(t_drain, 1),
                "micro_batches": len(seen),
                "rows_exact": total_rows == n_expected_rows,
                "sum_exact": total_sum == expected_sum,
            }
        )
    )
    return 0 if total_rows == n_expected_rows and total_sum == expected_sum else 1


if __name__ == "__main__":
    sys.exit(main())
