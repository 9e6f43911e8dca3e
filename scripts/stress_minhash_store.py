#!/usr/bin/env python
"""Scale stress for the incremental MinHash signature store
(pipeline/minhash_store): per-ingest cost must stay ~O(batch) as the
store grows — the 100 TB claim — and the probe must never shuffle the
stored band set.

Protocol: K successive batches of N_BATCH synthetic docs (each batch
contains near-dup "template" docs colliding with earlier batches, so the
probe returns real cross-batch pairs) fold into one store; per-ingest
wall, returned-pair count and store row count are printed. A flat wall
across ingests while the store grows K× is the O(batch) evidence. The
final ingest's probe plan is checked for store-side Exchange nodes (the
broadcast shape puts the exchange on the BATCH side only).

Usage: python scripts/stress_minhash_store.py [N_BATCH] [K]
(defaults 100_000 / 4).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.minhash_store import (
    minhash_ingest,
)
from prometheus_parquet_server_spark.sources.snapshot_store import snapshot_read


def synth(spark, n, batch_no):
    """Docs with per-batch unique bodies plus 1-in-10 drawn from a shared
    1000-template pool (collides across batches)."""
    base = spark.range(n).select(
        (F.col("id") + batch_no * n).alias("doc_id"), F.col("id").alias("_i")
    )
    tpl = F.when(F.col("_i") % 10 == 0, F.col("_i") % 1000).otherwise(
        F.col("doc_id") + 10_000_000
    )
    word = lambda k: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(tpl, F.lit(k)), F.lit(30000)).cast("string")
    )
    return base.select(
        "doc_id", F.concat_ws(" ", *[word(k) for k in range(12)]).alias("text")
    )


def main() -> None:
    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("stress-minhash-store")
    spark.sparkContext.setLogLevel("ERROR")
    store = f"file://{tempfile.mkdtemp(prefix='stress_mh_')}/mh"

    out = []
    last_pairs = None
    for b in range(k):
        docs = synth(spark, n_batch, b)
        t0 = time.time()
        pairs = minhash_ingest(
            spark, store, docs, num_perm=8, bands=2, shingle_n=2,
            max_bucket=2000,
        )
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 2)
        store_rows = snapshot_read(spark, store).count()
        out.append(
            {"batch": b, "wall_s": wall, "pairs": n_pairs,
             "store_rows": store_rows}
        )
        print(out[-1], flush=True)
        last_pairs = pairs

    # plan shape: the stored side must not be exchanged (broadcast is on
    # the batch bands); count Exchange nodes below the parquet store scan
    plan = last_pairs._jdf.queryExecution().executedPlan().toString()
    n_ex = sum(
        1
        for l in plan.splitlines()
        if l.strip().lstrip("+-: *(0123456789)").startswith("Exchange")
    )
    n_bc = plan.count("BroadcastExchange")
    walls = [o["wall_s"] for o in out]
    print(
        json.dumps(
            {
                "per_ingest_walls": walls,
                "wall_growth_last_vs_first": round(walls[-1] / walls[0], 2),
                "store_growth": round(out[-1]["store_rows"] / out[0]["store_rows"], 1),
                "exchanges_final_probe": n_ex,
                "broadcasts_final_probe": n_bc,
            }
        )
    )


if __name__ == "__main__":
    main()
