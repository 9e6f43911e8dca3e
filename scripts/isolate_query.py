#!/usr/bin/env python
"""Time one or more bench queries in a fresh cold session (diagnostic).

Usage: python scripts/isolate_query.py q1 [q2 ...]   — honors the bench env.
Runs each query once, cold, after the bench warm-up, printing walls.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
