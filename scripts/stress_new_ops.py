#!/usr/bin/env python
"""Scale stress for the round-5 relational/temporal operators: 20M
synthetic events across 100k users (generated with spark.range — no I/O
bias), timing asof_join, range_join, sessionize_batch, and the rollup
cascade. The question each timing answers: does the operator's single
planned shuffle actually carry a 20M-row load on local[32], i.e. is the
plan shape the one that survives a 100× scale-up (EXPLAIN.md round-5
section records the numbers).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.operators.asof import asof_join
from prometheus_parquet_server_spark.operators.range_join import range_join
from prometheus_parquet_server_spark.operators.rollup import rollup_cascade
from prometheus_parquet_server_spark.streaming.sessions import sessionize_batch

N = 20_000_000
USERS = 100_000


def main() -> None:
    spark = get_spark("stress-new-ops")
    ev = (
        spark.range(N)
        .select(
            (F.col("id") % USERS).alias("user_id"),
            # deterministic pseudo-times: spread over ~30 days, jittered
            (
                (F.col("id") % 2_592_000).cast("double")
                + (F.xxhash64("id") % 1000).cast("double") / 1000.0
            ).alias("ts"),
            (F.xxhash64("id", F.lit(1)) % 10_000).cast("double").alias("value"),
            F.when(F.col("id") % 5 == 0, "purchase").otherwise("click").alias("kind"),
        )
        .cache()
    )
    ev.count()  # materialize the cache outside the timings

    def timed(name, df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        print(f"{name}: {time.time() - t0:.1f}s")

    clicks = ev.filter(F.col("kind") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("kind") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    timed(
        f"asof_join ({N // 1_000_000}M rows, {USERS // 1000}k keys)",
        asof_join(clicks, purchases, on="ts", by=("user_id",), right_cols=("pv",)),
    )
    # deterministic map-side predicate, NOT limit(): a GlobalLimit funnels
    # the interval side through one task and would distort the timing
    windows = purchases.filter(F.col("user_id") % 2 == 0).select(
        "user_id", F.col("ts").alias("start"), (F.col("ts") + 300.0).alias("end")
    )
    timed(
        "range_join (16M points x 2M intervals, 300s windows)",
        range_join(clicks, windows, by=("user_id",), bucket_width=300.0),
    )
    timed(
        "sessionize_batch (20M rows)",
        sessionize_batch(
            ev.select("user_id", F.col("ts").alias("ts_s"), "value"), gap_s=60.0
        ),
    )
    levels = rollup_cascade(
        ev.select(F.col("kind").alias("event_type"), "ts", "value"),
        (60.0, 3600.0, 86400.0),
        by=("event_type",),
    )
    timed("rollup_cascade day level (20M rows)", levels[86400.0])


if __name__ == "__main__":
    main()
