#!/usr/bin/env python
"""High-cardinality scale-shape stress (not part of bench.py's headline
suite): build a ~150k-series metrics frame from sf0.1 lineitem and time the
core operator family. The point is the SHAPE — per-series work must scale
linearly in series count with no single-partition skew wall and no
driver-side state — measured at the largest local size.

Usage: python scripts/stress_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
from prometheus_parquet_server_spark.operators.interpolate import resample_to_grid
from prometheus_parquet_server_spark.operators.over_time import over_time_to_grid
from prometheus_parquet_server_spark.operators.rate import rate_to_grid
from prometheus_parquet_server_spark.operators.binop import vector_vector_op
from prometheus_parquet_server_spark.operators.aggregate import topk_over_series


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # one series per order; sample instants from ship dates (deduped)
    m = (
        li.select(
            F.col("l_orderkey").cast("string").alias("okey"),
            F.unix_timestamp(F.col("l_shipdate").cast("timestamp")).cast("double").alias("ts"),
            F.col("l_quantity").cast("double").alias("value"),
        )
        .groupBy("okey", "ts")
        .agg(F.max("value").alias("value"))
        .cache()
    )
    n_series = m.select("okey").distinct().count()
    n_samples = m.count()
    tmin, tmax = m.agg(F.min("ts"), F.max("ts")).first()
    # ~84-slot grid with an INTEGRAL step (like real dashboard queries —
    # integral step + r ≡ k·step enables rate's lag fast path)
    step = float(math.ceil((tmax - tmin) / 83.0))
    grid = RegularTimeRange(tmin, tmin + 83 * step, step)
    gdf = grid.to_df(spark)

    def run(label, df):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return label, round(time.time() - t0, 2)

    results = dict(
        [
            run("resample", resample_to_grid(m, gdf, series_cols=["okey"], grid=grid)),
            run(
                "rate",
                rate_to_grid(
                    m, gdf, series_cols=["okey"], over_range=step * 2, grid=grid
                ),
            ),
            run(
                "sum_over_time",
                over_time_to_grid(
                    m, grid, "sum", over_range=step * 2, series_cols=["okey"]
                ),
            ),
        ]
    )
    # canonical-frame ops (labels map): binop join + topk at full cardinality
    canon = m.select(
        F.lit("li").alias("name"),
        F.create_map(F.lit("okey"), F.col("okey")).alias("labels"),
        "ts",
        "value",
    )
    aligned = resample_to_grid(canon, gdf, grid=grid)
    results.update(
        [
            run(
                "binop_self_join",
                vector_vector_op(aligned, aligned, "+"),
            ),
            run("topk100", topk_over_series(aligned, 100)),
        ]
    )
    print(
        json.dumps(
            {
                "series": n_series,
                "samples": n_samples,
                "grid_points": len(grid),
                "timings_s": results,
            }
        )
    )


if __name__ == "__main__":
    main()
