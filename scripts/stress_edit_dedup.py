#!/usr/bin/env python
"""Scale stress for edit-distance fuzzy dedup (pipeline/dedup.py
edit_distance_pairs — round 12), at the PRODUCTION geometry with the
max_bucket cap the graded row's exact oracle leaves off (the graded
row runs bigram shingles / 4 bands UNCAPPED — sf-stable pair counts,
measured in BASELINE — per the dedup_jaccard exact-oracle convention).

Claims under test:

1. **Planted literal-edit near-dups are recovered end-to-end**: docs
   n..n+T−1 are byte-edited copies of docs 0..T−1 (a handful of token
   substitutions — the OCR/boilerplate class); the LSH candidates must
   surface each planted pair and the verifier must keep it under
   max_dist.
2. **The verify stage is pair-bounded, not corpus-bounded**: wall
   tracks the candidate-pair count (reported), and the DP runs spread
   across tasks (the round-12 single-task trap is fixed — a regression
   here would show as a near-serial wall).

Prints one JSON line for BASELINE.md.

Usage: python scripts/stress_edit_dedup.py [N_SMALL] [N_LARGE]
(defaults 100_000 / 1_000_000).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.dedup import (
    edit_distance_pairs,
    lsh_candidate_pairs,
)

N_TWINS = 50


def corpus(spark, n):
    """Deterministic ~30-token docs (the stress_hybrid vocabulary shape)
    + N_TWINS planted near-dups: doc n+i is doc i with its LAST token
    replaced (one ~8-byte edit — well under max_dist, and 29/30 shared
    tokens keeps the MinHash signatures collision-prone)."""
    tok = F.concat(
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.col("id"), F.col("pos")),
            F.when(F.col("pos") < 10, F.lit(500)).otherwise(F.lit(50000)),
        ).cast("string"),
    )
    base = (
        spark.range(n)
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("pos"))
        .select("id", tok.alias("t"))
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("text"))
        .select(F.col("id").alias("doc_id"), "text")
    )
    twins = (
        base.filter(F.col("doc_id") < N_TWINS)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(
                F.regexp_replace(F.col("text"), r"\s+\S+$", ""),
                F.lit(" edited!"),
            ).alias("text"),
        )
    )
    return base.unionByName(twins)


def run(spark, n):
    docs = corpus(spark, n).localCheckpoint()
    t0 = time.time()
    pairs = lsh_candidate_pairs(
        docs, num_perm=16, bands=4, shingle_n=2, max_bucket=64
    ).localCheckpoint()
    n_pairs = pairs.count()
    t_cand = round(time.time() - t0, 2)
    t0 = time.time()
    verified = edit_distance_pairs(docs, pairs, max_dist=40).localCheckpoint()
    n_kept = verified.count()
    t_verify = round(time.time() - t0, 2)
    # planted recovery: (i, n+i) kept for every twin
    kept = {
        (r["id_a"], r["id_b"]) for r in verified.select("id_a", "id_b").collect()
    }
    recovered = sum(1 for i in range(N_TWINS) if (i, n + i) in kept)
    return {
        "n_docs": n,
        "candidate_pairs": n_pairs,
        "verified_pairs": n_kept,
        "walls_s": {"candidates": t_cand, "verify": t_verify},
        "planted_recovered": recovered,
        "planted_total": N_TWINS,
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("stress-edit-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"small": run(spark, n_small), "large": run(spark, n_large)}
    for stage in ("candidates", "verify"):
        s = out["small"]["walls_s"][stage]
        l = out["large"]["walls_s"][stage]
        out.setdefault("scale_ratio", {})[stage] = round(l / max(s, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
