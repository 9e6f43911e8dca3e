#!/usr/bin/env python
"""Scale-shape evidence for the LSH near-dup path: time LSH-bucketed
candidate generation + verify vs the all-pairs O(n²) baseline it replaced,
on synthetic corpora of growing size (deterministic vectors, planted
near-dup pairs). The point is the CURVE: the all-pairs BNLJ cost grows
~n², the bucket-first path grows with the candidate count (bounded per
bucket) and never plans a nested-loop join.

Usage: python scripts/stress_lsh_dedup.py [sizes ...]   (default 2000 8000)
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.similarity import (
    cosine_similarity_col,
    embedding_lsh_pairs,
)

DIM = 64


def make_corpus(spark, n: int):
    """Deterministic corpus: 95% random unit vectors + 5% near-dup copies
    (small perturbation of an earlier row)."""
    rng = random.Random(1234)

    def unit(v):
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    rows = []
    for i in range(n):
        if i % 20 == 19 and i > 0:  # 5%: perturbation of row i-1
            base = rows[i - 1][1]
            rows.append((i, unit([x + rng.gauss(0, 0.05) for x in base])))
        else:
            rows.append((i, unit([rng.gauss(0, 1) for _ in range(DIM)])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000]
    spark = get_spark("stress-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in sizes:
        emb = make_corpus(spark, n).cache()
        emb.count()

        t0 = time.time()
        lsh = embedding_lsh_pairs(emb, threshold=0.8)
        n_lsh = lsh.count()
        t_lsh = time.time() - t0
        plan = lsh._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan

        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        t0 = time.time()
        allp = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 6).alias("c"),
            )
            .filter(F.col("c") >= 0.8)
        )
        n_all = allp.count()
        t_all = time.time() - t0

        out[n] = {
            "lsh_s": round(t_lsh, 1),
            "allpairs_s": round(t_all, 1),
            "lsh_pairs": n_lsh,
            "true_pairs": n_all,
            "recall": round(n_lsh / n_all, 3) if n_all else None,
        }
        print(f"n={n}: {json.dumps(out[n])}")
        emb.unpersist()
    print(json.dumps({"metric": "lsh_vs_allpairs", "results": out}))


if __name__ == "__main__":
    main()
