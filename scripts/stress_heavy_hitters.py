#!/usr/bin/env python
"""Scale-shape evidence for heavy_hitter_grams: gram cardinality that
tracks corpus size is exactly where the exact-groupBy twin's shuffle
becomes the wall, and where the Misra-Gries candidate pass's shuffle
stays O(partitions x capacity) by construction.

Corpus: n_docs documents of tokens_per_doc pseudo-random tokens drawn
from a vocab**2-sized bigram space (xxhash64 on (doc_id, position) -
deterministic, no driver-side generation), with a 4-token boilerplate
phrase planted on every 20th document. The three boilerplate bigrams are
the only true heavy hitters; every random bigram is ~unique. Both paths
must return exactly those three rows with identical exact counts.

Reported shuffle-rows proxies: the exact path's aggregate keys on every
DISTINCT gram (its partial-agg shuffle rows track cardinality); the MG
path shuffles nothing gram-shaped at all - it collects at most
partitions x (capacity + 1) summary rows to the driver, then counts only
the InSet-filtered candidates.

Usage: python scripts/stress_heavy_hitters.py [n_docs] [tokens_per_doc]
       (default 100000 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.sketch import (
    _gram_array,
    heavy_hitter_grams,
)

from pyspark.sql import functions as F

BOILER = "all rights reserved worldwide"
VOCAB = 2_000_000
FRAC = 3e-4


def make_corpus(spark, n_docs: int, tokens_per_doc: int):
    base = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(tokens_per_doc)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(VOCAB))
            ),
        ),
        " ",
    )
    text = F.when(
        F.col("id") % 20 == 0, F.concat(base, F.lit(" " + BOILER))
    ).otherwise(base)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    tokens_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("stress-heavy-hitters")
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_corpus(spark, n_docs, tokens_per_doc).cache()
    docs.count()

    grams = docs.select(F.explode(_gram_array("text", 2)).alias("gram"))
    t0 = time.time()
    stats = grams.agg(
        F.count("*").alias("n"), F.countDistinct("gram").alias("nd")
    ).first()
    n_grams, distinct_grams = stats["n"], stats["nd"]
    wall_cardinality_scan = time.time() - t0

    # exact twin: the unbounded GROUP BY whose shuffle keys on every
    # distinct gram
    t0 = time.time()
    exact = sorted(
        (r["gram"], r["n_occ"])
        for r in grams.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= F.lit(float(n_grams) * FRAC))
        .collect()
    )
    wall_exact = time.time() - t0

    t0 = time.time()
    mg = sorted(
        (r["gram"], r["n_occ"])
        for r in heavy_hitter_grams(docs, n=2, threshold_frac=FRAC).collect()
    )
    wall_mg = time.time() - t0

    cap = int(2.0 / FRAC) + 1
    parts = docs.rdd.getNumPartitions()
    report = {
        "n_docs": n_docs,
        "n_grams": n_grams,
        "distinct_grams": distinct_grams,
        "exact_shuffle_keys": distinct_grams,
        "mg_summary_rows_bound": parts * (cap + 1),
        "wall_s_exact_groupby": round(wall_exact, 2),
        "wall_s_mg_two_pass": round(wall_mg, 2),
        "wall_s_cardinality_scan": round(wall_cardinality_scan, 2),
        "outputs_equal": mg == exact,
        "heavy_hitters_found": len(mg),
        "expected_boiler_bigrams": 3,
    }
    print(json.dumps(report))
    docs.unpersist()


if __name__ == "__main__":
    main()
