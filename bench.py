#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

``--steady`` (or BENCH_STEADY=1) runs each query N=3 times in ONE warm
session and reports the per-query MINIMUM — the steady-state protocol
BASELINE.md's round table needs: single cold runs on a shared host wobble
up to 1.9x run-to-run (promql_binop measured 5.7-10.6 s across identical
binaries), so cold-run deltas under ~2x are host noise, while min-of-3
warm isolates real plan regressions. The default (cold single run) stays
the driver-recorded mode so BENCH_r*.json remains comparable across
rounds; steady runs add {"mode": "steady", "runs": 3} to the JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES

BENCH_QUERIES = [
    "f1_selector",
    "t3_resample",
    "p1_rate",
    "p2_irate",
    "p3_histogram_quantile",
    "hq_sum_rate",
    "a1_sum_by",
    "promql_sum_rate",
    "promql_binop",
    "promql_over_time",
    "promql_quantile",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "promql_quantile_ot",
    "promql_holt_winters",
    "pipeline_prepare",
    "text_winnowing",
    "dedup_exact_fp",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "text_quality",
    "emb_cosine_topk",
    "ann_lsh_topk",
    # round-5 additions — new rows extend the suite; per-query times stay
    # comparable with earlier rounds (BASELINE.md round table caveat)
    "events_asof_join",
    "text_repetition",
    "pipeline_pii_scrub",
    "pipeline_capped_sample",
    "vocab_topk",
    "events_range_join",
    "events_sessionize",
    "events_rollup",
    "tfidf_topk",
    "pipeline_chunks",
    # round-7 additions (same extend-don't-replace caveat)
    "dedup_jaccard",
    "sketch_heavy_hitters",
    "dedup_semantic",
    "pipeline_line_dedup",
    "text_rule_flags",
    "pipeline_shuffle",
    # round-8 additions (same extend-don't-replace caveat)
    "bm25_topk",
    "pipeline_mixture",
    # round-9 additions (same caveat)
    "events_sessionize_int",
    "dsir_topk",
    "hybrid_topk",
    # round-10 additions (same caveat)
    "events_sessionize_floats",
    "ivfpq_store_topk",
    "ivfpq_rerank_topk",
    # round-11 additions (same caveat)
    "events_sessionize_md5",
    "dsir_sample_from_table",
    "hybrid_index_topk",
    # round-12 additions (same caveat)
    "maxsim_rerank_topk",
    "maxsim_index_rerank_topk",
    "text_novelty",
    "dedup_edit",
    "sq8_store_topk",
    # round-13 additions (same caveat)
    "events_sessionize_md5i",
    "hybrid_combmnz_topk",
    "hybrid_combmnz_rerank_topk",
    "pipeline_leak_split",
    "pipeline_fuzzy_contamination",
    "ivfsq8_store_topk",
]


def _materialize(df) -> int:
    """Force full execution without driver-side row transfer."""
    return df.write.mode("overwrite").format("noop").save() or 0


def main() -> None:
    steady = "--steady" in sys.argv or os.environ.get("BENCH_STEADY") == "1"
    runs = 3 if steady else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM once so the FIRST timed query measures itself, not
    # engine init (measurement fix, r14 — guide §1: f1_selector's cold
    # number ran 3-10x its steady floor purely from absorbing JVM/codegen/
    # Arrow-worker startup; every later row was unaffected). The warm-up
    # touches each runtime the queries use — parquet footer read, one
    # shuffle+window (whole-stage codegen + exchange machinery), one Arrow
    # pandas_udf pass (Python worker pool), one noop write — over the
    # 25-row nation table, so it adds ~2 s of untimed setup and zero data
    # reuse. Methodology is otherwise unchanged: same queries, same scale
    # factor, same per-query cold timing via the noop sink.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.count()

    @_pudf("double")
    def _warm_udf(s):
        return s.astype("float64") * 1.0

    (
        warm.withColumn(
            "_r",
            _F.row_number().over(
                _W.partitionBy("n_regionkey").orderBy("n_nationkey")
            ),
        )
        .withColumn("_u", _warm_udf(_F.col("n_nationkey")))
        .groupBy("n_regionkey")
        .agg(_F.sum("_u").alias("_s"), _F.max("_r").alias("_m"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if steady:
        out["mode"] = "steady"
        out["runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
