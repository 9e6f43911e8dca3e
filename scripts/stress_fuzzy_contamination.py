#!/usr/bin/env python
"""Scale stress for fuzzy benchmark decontamination
(pipeline/split.py fuzzy_contamination — round 13).

Claim under test: the operator is one O(corpus tokens) gram scan plus
a HIT-BOUNDED pair stage — the benchmark's distinct-shingle stream
broadcasts, a (doc, bench) pair exists only where the gram equi-join
finds >=1 shared shingle, and set sizes ride as map-only columns. 10x
documents should cost ~scan-x wall, and the pair stage should be
driven by hit counts, never |corpus|x|bench|.

Synthesizes N docs (~30 zipf-ish tokens, the stress_hybrid corpus
shape), a 200-doc benchmark with DISTINCTIVE vocabulary, and plants a
one-token-edited copy of benchmark doc (i % 200) on every corpus doc
with id % 1000 == 7 (so 0.1% of the corpus is true fuzzy
contamination). Recovery = every planted doc flagged against its
source benchmark doc at tau=0.5. Prints one JSON line for BASELINE.md.

Usage: python scripts/stress_fuzzy_contamination.py [N_SMALL] [N_LARGE]
(defaults 100_000 / 1_000_000).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.split import fuzzy_contamination

N_BENCH = 200
TAU = 0.5


def benchmark(spark):
    """200 benchmark docs over a DISTINCTIVE vocabulary (tokens the
    zipf corpus generator never emits), ~20 tokens each."""
    tok = F.concat(
        F.lit("bench"),
        F.pmod(F.xxhash64(F.col("id"), F.col("pos")), F.lit(3000)).cast(
            "string"
        ),
    )
    return (
        spark.range(N_BENCH)
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("pos"))
        .select("id", tok.alias("t"))
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("text"))
        .select(F.col("id").alias("doc_id"), "text")
    )


def corpus(spark, n, bench_df):
    """N zipf-ish docs; id % 1000 == 7 docs are the benchmark doc
    (id/1000 % 200) with ONE token replaced — a true fuzzy near-copy
    (bigram jaccard ~ (k-3)/(k+1) ~ 0.76 for k=19 shared bigrams)."""
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
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("body"))
    )
    bench_texts = bench_df.select(
        F.col("doc_id").alias("_bid"), F.col("text").alias("_btext")
    )
    planted = (
        base.where(F.pmod(F.col("id"), F.lit(1000)) == 7)
        .withColumn(
            "_bid", F.pmod((F.col("id") / F.lit(1000)).cast("long"), F.lit(N_BENCH))
        )
        .join(F.broadcast(bench_texts), "_bid")
        # replace the SECOND token with an edit marker: one-token edit
        .select(
            "id",
            F.concat_ws(
                " ",
                F.slice(F.split(F.col("_btext"), " "), 1, 1),
                F.lit("edited"),
                F.slice(F.split(F.col("_btext"), " "), 3, 100),
            ).alias("text"),
        )
    )
    clean = base.where(F.pmod(F.col("id"), F.lit(1000)) != 7).select(
        "id", F.col("body").alias("text")
    )
    return clean.unionByName(planted).select(
        F.col("id").alias("doc_id"), "text"
    )


def run(spark, n):
    bench = benchmark(spark).localCheckpoint()
    docs = corpus(spark, n, bench).localCheckpoint()  # measure the op, not synthesis
    n_planted = docs.where(F.pmod(F.col("doc_id"), F.lit(1000)) == 7).count()
    t0 = time.time()
    hits = fuzzy_contamination(docs, bench, shingle_n=2, tau=TAU)
    rows = hits.collect()
    wall = round(time.time() - t0, 2)
    flagged = {(r["doc_id"], r["bench_id"]) for r in rows}
    recovered = sum(
        1
        for d, b in flagged
        if d % 1000 == 7 and (d // 1000) % N_BENCH == b
    )
    return {
        "n_docs": n,
        "n_planted": n_planted,
        "wall_s": wall,
        "pairs_flagged": len(flagged),
        "planted_recovered": recovered,
        "false_pairs": len(flagged) - recovered,
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("stress-fuzzy-contamination")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"small": run(spark, n_small), "large": run(spark, n_large)}
    out["scale_ratio"] = round(
        out["large"]["wall_s"] / max(out["small"]["wall_s"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
