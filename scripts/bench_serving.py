#!/usr/bin/env python
"""Serving-latency benchmark: sequential /api/v1/query_range handler calls
over a cached sf0.01 store on the BASELINE.md grid (7000 s range, 15 s step,
467 points). Reports cold p50/p95 (first evaluation per query, aligned store
pre-built), warm p50 (response-cache hits), and the aligned-store build cost.

Usage: python scripts/bench_serving.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import _metrics_canonical
from prometheus_parquet_server_spark.server.app import (
    MetricsHTTPServer,
    prepare_collection_for_serving,
)

PANEL_QUERIES = [
    'click{user_id="13"}',
    "sum(rate(click{}[5m]))",
    "sum by (user_id) (click{})",
    "avg(view{})",
    "topk(5, sum by (user_id) (click{}))",
    "view{} + click{}",
    "max_over_time(click{}[10m])",
    'quantile(0.9, click{})',
]

START, END, STEP = 1704067200.0, 1704074200.0, 15.0  # 467 points


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bench-serving")
    coll = prepare_collection_for_serving(_metrics_canonical(spark, sf_dir))
    coll.count()  # materialize the cache before measuring
    srv = MetricsHTTPServer(spark, coll)

    from prometheus_parquet_server_spark.operators.grid import RegularTimeRange

    t0 = time.time()
    srv._aligned_for(RegularTimeRange(START, END, STEP))
    align_s = time.time() - t0

    def run_at(q: str, end: float) -> float:
        params = {
            "query": q,
            "start": str(START),
            "end": str(end),
            "step": f"{int(STEP)}s",
        }
        t = time.time()
        status, payload = srv.handle_query_range(params)
        dt = time.time() - t
        assert status == 200, payload
        return dt

    cold = [run_at(q, END) for q in PANEL_QUERIES]
    # steady state: a NEW grid (zoomed end) → response cache misses, plans
    # rebuilt, but JVM codegen is warm and the aligned store prefix-reuses
    steady = [run_at(q, END - STEP) for q in PANEL_QUERIES]
    steady2 = [run_at(q, END - 2 * STEP) for q in PANEL_QUERIES]
    steady = [min(a, b) for a, b in zip(steady, steady2)]
    warm = [run_at(q, END) for q in PANEL_QUERIES]

    print(f"aligned-store build: {align_s:.2f}s (once per grid anchor)")
    for q, dt, dt2 in zip(PANEL_QUERIES, cold, steady):
        print(f"  cold {dt * 1000:7.1f} ms   steady {dt2 * 1000:7.1f} ms  {q}")
    for label, xs in (("cold", cold), ("steady", steady)):
        xs_sorted = sorted(xs)
        print(
            f"{label} p50 = {statistics.median(xs) * 1000:.0f} ms, "
            f"p95 = {xs_sorted[int(0.95 * (len(xs_sorted) - 1))] * 1000:.0f} ms"
        )
    print(f"hit p50 = {statistics.median(warm) * 1000:.2f} ms (response cache)")


if __name__ == "__main__":
    main()
