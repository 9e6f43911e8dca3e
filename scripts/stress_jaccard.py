#!/usr/bin/env python
"""Scale-shape evidence for the n-gram Jaccard dedup pipeline under the
pathological-bucket skew the max_bucket cap exists for: a corpus where one
boilerplate page repeats B times. Uncapped, that single LSH bucket emits
B·(B−1)/2 candidate pairs (10⁸ docs of boilerplate → ~5·10¹⁵ pairs — the
job that never finishes); with max_bucket the bucket is dropped BEFORE the
self-join and the pipeline's cost tracks the HONEST near-dup pairs only.

The capped run still verifies every surviving candidate through
ngram_jaccard_pairs, so this measures the full two-stage pipeline.

Usage: python scripts/stress_jaccard.py [n_docs] [boiler_copies]
       (default 20000 5000)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.dedup import (
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)

WORDS = [f"w{i}" for i in range(2000)]


def make_corpus(spark, n: int, boiler: int):
    """boiler copies of one page + (n - boiler) mostly-unique docs with a
    5% planted near-dup rate (one word swapped from the previous doc)."""
    rng = random.Random(99)
    boiler_text = " ".join(WORDS[:40])
    rows = [(i, boiler_text) for i in range(boiler)]
    prev = None
    for i in range(boiler, n):
        if prev is not None and i % 20 == 19:
            toks = prev.split()
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
            text = " ".join(toks)
        else:
            text = " ".join(rng.choice(WORDS) for _ in range(30))
        rows.append((i, text))
        prev = text
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    boiler = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_spark("stress-jaccard")
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_corpus(spark, n, boiler).cache()
    docs.count()

    t0 = time.time()
    # cache the candidate stage: without it, pairs.count() and the
    # verified count would each execute the whole LSH pipeline, and the
    # reported wall-clock would measure stage 1 twice
    pairs = lsh_candidate_pairs(
        docs, num_perm=8, bands=2, shingle_n=2, max_bucket=64
    ).cache()
    verified = ngram_jaccard_pairs(docs, pairs, shingle_n=2)
    n_pairs = pairs.count()
    n_dups = verified.filter("jaccard >= 0.8").count()
    pairs.unpersist()
    wall = time.time() - t0

    report = {
        "n_docs": n,
        "boiler_copies": boiler,
        "uncapped_boiler_pairs": boiler * (boiler - 1) // 2,
        "capped_candidate_pairs": n_pairs,
        "verified_dups_j08": n_dups,
        "wall_s_capped_full_pipeline": round(wall, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
