#!/usr/bin/env python
"""Decide the Bloom-sidecar ledger item with a measurement (VERDICT r8
Next #4): would per-file Bloom filters in the seen-store manifest prune
the membership scan under the regime the ledger says they pay in — a
mostly-NEW batch against a large store?

Method. A Bloom filter can only ever prune a file that an IDEAL (fpp=0)
filter would prune, and an ideal filter prunes file F iff F contains
ZERO batch keys — so the exact per-file batch-key intersection is a hard
UPPER BOUND on any sidecar's pruning, measured directly on a real store
built through snapshot_write. A REAL bloom does strictly worse: a file
survives pruning if ANY of the batch's B probes hits, and new keys
(uniform md5) hit with the filter's false-positive rate f, so
P(prune) = (1-f)^B_new ~= exp(-f*B_new) EVEN IF the file shares no true
key with the batch. The script reports both: the measured ideal bound
and the analytic real-bloom prune probability for standard fpp choices.

Usage: python scripts/stress_bloom_sidecar.py [N_SEEN] [N_BATCH] [DUP_FRAC]
(defaults 20_000_000 / 200_000 / 0.05). Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.sources.snapshot_store import (
    snapshot_read,
    snapshot_write,
)


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    spark = get_spark("stress-bloom-sidecar")
    spark.sparkContext.setLogLevel("ERROR")

    store = f"file://{tempfile.mkdtemp(prefix='stress_bloom_')}/seen"
    chunks = 8
    chunk = n_seen // chunks
    t0 = time.time()
    for i in range(chunks):
        rows = spark.range(i * chunk, (i + 1) * chunk).select(
            F.md5(F.col("id").cast("string")).alias("name"),
            F.lit(0.0).alias("ts"),
            F.col("id").alias("doc_id"),
        )
        snapshot_write(spark, store, rows, mode="overwrite" if i == 0 else "append")
    build_s = time.time() - t0

    # batch: dup_frac already-seen keys (uniform over the store's id space,
    # i.e. uniform over files — the crawl-batch model), rest brand new
    n_dup = int(n_batch * dup_frac)
    dups = spark.range(n_dup).select(
        F.md5((F.col("id") * (n_seen // max(n_dup, 1))).cast("string")).alias("_fp")
    )
    news = spark.range(n_batch - n_dup).select(
        F.md5(
            F.concat((F.col("id") + 2 * n_seen).cast("string"), F.lit("_new"))
        ).alias("_fp")
    )
    batch_keys = dups.unionByName(news).cache()
    batch_keys.count()

    # measured ideal bound: files holding >= 1 TRUE batch key (per-file
    # exact intersection via input_file_name) vs total data files
    seen = snapshot_read(spark, store).select(
        F.col("name").alias("_fp"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("_file"),
    )
    t0 = time.time()
    hit_files = (
        seen.join(F.broadcast(batch_keys), "_fp", "left_semi")
        .select("_file")
        .distinct()
        .count()
    )
    probe_s = time.time() - t0
    n_files = seen.select("_file").distinct().count()

    # current membership wall (the shape dedup_ingest runs): store scanned
    # once, LEFT SEMI broadcast(batch), then batch LEFT ANTI intersection
    t0 = time.time()
    present = seen.select("_fp").join(F.broadcast(batch_keys), "_fp", "left_semi")
    survivors = batch_keys.join(F.broadcast(present), "_fp", "left_anti").count()
    membership_s = time.time() - t0

    # analytic real-bloom prune probability per file: every NEW key probes
    # every file's bloom independently at the filter's fpp
    b_new = n_batch - n_dup
    analytic = {
        f"fpp_{f}": {
            "p_prune_per_file": math.exp(-f * b_new),
            "sidecar_mib_per_file": round(
                # m = -n ln f / (ln 2)^2 bits for n keys per file
                (-(n_seen / n_files) * math.log(f) / (math.log(2) ** 2)) / 8 / 2**20,
                2,
            ),
        }
        for f in (0.01, 0.001, 0.0001)
    }
    # batch size at which a real fpp=0.001 bloom prunes half the files
    b_crossover = int(math.log(2) / 0.001)

    print(json.dumps({
        "n_seen": n_seen,
        "n_batch": n_batch,
        "dup_frac": dup_frac,
        "n_files": n_files,
        "files_with_true_hits": hit_files,
        "ideal_bloom_prunable_files": n_files - hit_files,
        "membership_wall_s": round(membership_s, 2),
        "probe_measure_s": round(probe_s, 2),
        "store_build_s": round(build_s, 2),
        "survivors": survivors,
        "analytic_real_bloom": analytic,
        "batch_size_where_fpp_0.001_prunes_half": b_crossover,
    }))


if __name__ == "__main__":
    main()
