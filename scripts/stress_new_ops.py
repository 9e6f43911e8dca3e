#!/usr/bin/env python
"""Scale stress for the relational/temporal operators: N synthetic events
across N/200 users (generated with spark.range — no I/O bias), timing
asof_join, range_join (uniform AND deliberately skewed), sessionize_batch,
and the rollup cascade. The question each timing answers: does the
operator's single planned shuffle actually carry the load on local[32],
i.e. is the plan shape the one that survives a 100x scale-up. Each op also
reports its physical Exchange count — the shuffle budget the docstrings
claim. BASELINE.md's stress table records the numbers.

Usage: python scripts/stress_new_ops.py [N]   (default 20_000_000; the
round-6 run used 100_000_000)
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    users = max(1000, n // 200)
    spark = get_spark("stress-new-ops")
    ev = (
        spark.range(n)
        .select(
            (F.col("id") % users).alias("user_id"),
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

    def timed(name, df, rows_in):
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        exchanges = plan.count("Exchange")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        print(
            f"{name}: {dt:.1f}s  {rows_in / dt / 1e6:.1f}M rows/s  "
            f"exchanges={exchanges}"
        )

    clicks = ev.filter(F.col("kind") == "click").select("user_id", "ts", "value")
    purchases = ev.filter(F.col("kind") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    nm = n // 1_000_000
    timed(
        f"asof_join ({nm}M rows, {users // 1000}k keys)",
        asof_join(clicks, purchases, on="ts", by=("user_id",), right_cols=("pv",)),
        n,
    )
    # deterministic map-side predicate, NOT limit(): a GlobalLimit funnels
    # the interval side through one task and would distort the timing
    windows = purchases.filter(F.col("user_id") % 2 == 0).select(
        "user_id", F.col("ts").alias("start"), (F.col("ts") + 300.0).alias("end")
    )
    timed(
        f"range_join ({nm * 4 // 5}M points x {nm // 10}M intervals, 300s windows)",
        range_join(clicks, windows, by=("user_id",), bucket_width=300.0),
        n,
    )
    # skew: ONE user owns every 10th interval — a hot key that a plain
    # (user, bucket) shuffle must survive. The bucket component of the join
    # key spreads the hot user across time buckets, which is exactly the
    # built-in salt the docstring claims; this timing proves it.
    hot = purchases.select(
        F.when(F.col("user_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")).alias("user_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + 300.0).alias("end"),
    )
    hot_clicks = clicks.withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    timed(
        f"range_join SKEWED (hot key holds ~10% of both sides)",
        range_join(hot_clicks, hot, by=("user_id",), bucket_width=300.0),
        n,
    )
    timed(
        f"sessionize_batch ({nm}M rows)",
        sessionize_batch(
            ev.select("user_id", F.col("ts").alias("ts_s"), "value"), gap_s=60.0
        ),
        n,
    )
    # worst-case skew: EVERY row under one key — the chunked modes must
    # hold where the plain per-key windows serialize (BASELINE.md table)
    one = ev.select(F.lit(1).alias("user_id"), "ts", "value", "kind")
    oc = one.filter(F.col("kind") == "click").select("user_id", "ts", "value")
    op = one.filter(F.col("kind") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    timed(
        f"asof_join CHUNKED 3600s ({nm}M rows, ONE key)",
        asof_join(
            oc, op, on="ts", by=("user_id",), right_cols=("pv",), chunk_s=3600.0
        ),
        n,
    )
    timed(
        f"sessionize_batch CHUNKED 3600s ({nm}M rows, ONE user)",
        sessionize_batch(
            one.select("user_id", F.col("ts").alias("ts_s"), "value"),
            gap_s=60.0,
            chunk_s=3600.0,
        ),
        n,
    )
    # resampler hot series: EVERY sample in ONE series — the per-series
    # slot window serializes without chunking (the last §2-core serial
    # window); chunk_s partitions it on (key, 6h-chunk) with carry-in
    # seeds and must hold where the uniform path walls
    from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
    from prometheus_parquet_server_spark.operators.interpolate import (
        resample_to_grid,
    )

    ser = (
        one.select(F.lit("s").alias("sid"), "ts", "value")
        .groupBy("sid", "ts")
        .agg(F.max("value").alias("value"))
        .cache()
    )
    n_ser = ser.count()  # materialize outside the timings
    grid = RegularTimeRange(0.0, 2_592_000.0, 3600.0)  # 721 slots, 30 days
    gdf = grid.to_df(spark)
    timed(
        f"resample_to_grid ({n_ser // 1_000_000}M samples, ONE series)",
        resample_to_grid(ser, gdf, series_cols=["sid"], grid=grid),
        n_ser,
    )
    timed(
        f"resample_to_grid CHUNKED 21600s ({n_ser // 1_000_000}M samples, ONE series)",
        resample_to_grid(
            ser, gdf, series_cols=["sid"], grid=grid, chunk_s=21600.0
        ),
        n_ser,
    )
    ser.unpersist()
    levels = rollup_cascade(
        ev.select(F.col("kind").alias("event_type"), "ts", "value"),
        (60.0, 3600.0, 86400.0),
        by=("event_type",),
    )
    timed(f"rollup_cascade day level ({nm}M rows)", levels[86400.0], n)


if __name__ == "__main__":
    main()
