#!/usr/bin/env python
"""Dump .explain("formatted") for every bench query to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
  e.g. python scripts/dump_plans.py r14 before            # all bench queries
       python scripts/dump_plans.py r14 after dedup_edit  # a subset

MOSTLY driver-side planning — but several queries now execute REAL jobs at
DataFrame-construction time (eager localCheckpoint in lsh_candidate_pairs /
hash_cosine_topk / edit_distance_pairs, count+toPandas+broadcast in
embedding_lsh_pairs / semantic_dedup, store builds in the index rows), so
dumping plans runs Spark work. Do NOT run this alongside a timed bench —
it will skew the numbers (ADVICE r14).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    if not names:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in names:
        fn = QUERIES[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in place
            plan = f"EXPLAIN FAILED: {exc!r}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
