#!/usr/bin/env python
"""Scale stress for DSIR data selection (pipeline/dsir.py): the claim
under test is that corpus size bounds ONLY the scans — the feature
distributions are m-bounded aggregates, the log-ratio table broadcasts,
and scoring is one explode → broadcast-join → per-doc hash aggregate.
10× documents should therefore cost ~10× scan time and nothing
superlinear (no growing shuffle key space, no driver growth).

Synthesizes N docs (~30 tokens each, zipf-ish vocabulary, a planted
target-flavored 10% slice), fits the table against the slice, scores
every doc, and times each stage at two sizes. Prints one JSON line.

Usage: python scripts/stress_dsir.py [N_SMALL] [N_LARGE]
(defaults 100_000 / 1_000_000).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.dsir import (
    dsir_logratio_table,
    dsir_score,
    dsir_topk,
)


def corpus(spark, n):
    # deterministic synthetic text: 30 tokens/doc from a 50k-word zipf-ish
    # vocabulary; docs with id%10==0 lean on a 'target' sub-vocabulary
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.when(
                        (F.col("id") % 10 == 0) & (F.lit(i) % 3 == 0),
                        F.lit("tgt"),
                    ).otherwise(F.lit("w")),
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.col("id"), F.lit(i))), 1, 5
                        ),
                        16,
                        10,
                    ).cast("long") % F.lit(50_000),
                )
                for i in range(30)
            ],
        ).alias("text"),
    )


def run(spark, n):
    docs = corpus(spark, n).localCheckpoint()
    target = docs.filter(F.col("doc_id") % 10 == 0)
    t0 = time.time()
    tbl = dsir_logratio_table(docs, target, m=4096)
    tbl_rows = tbl.count()
    t_table = time.time() - t0
    t0 = time.time()
    n_scored = dsir_score(docs, tbl, m=4096).count()
    t_score = time.time() - t0
    t0 = time.time()
    top = dsir_topk(docs, target, k=100, m=4096)
    target_like = sum(
        1 for r in top.collect() if r["doc_id"] % 10 == 0
    )
    t_topk = time.time() - t0
    return {
        "n_docs": n,
        "table_rows": tbl_rows,
        "table_s": round(t_table, 2),
        "score_s": round(t_score, 2),
        "scored": n_scored,
        "topk_s": round(t_topk, 2),
        "top100_target_like": target_like,
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("stress-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    small = run(spark, n_small)
    large = run(spark, n_large)
    print(json.dumps({
        "small": small,
        "large": large,
        "scale_factor": n_large / n_small,
        "score_wall_ratio": round(large["score_s"] / max(small["score_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
