#!/usr/bin/env python
"""Scale stress for the in-cluster quality classifier
(pipeline/classifier.py): the training loop must scan the TEXT once
(feature materialization), after which per-iteration cost is a pass over
the narrow persisted feature frame — so wall should scale ~linearly in
corpus size for featurization and per-iteration cost should be a small
constant, independent of document length.

Protocol: N synthetic docs (planted signal: label 1 docs draw from a
'clean' vocabulary, label 0 docs mix in noise tokens), hash_embed
features, ITERS GD passes. Reports featurize wall, per-iteration walls,
final train accuracy. Usage:
python scripts/stress_classifier.py [N_DOCS] [ITERS] (defaults 1_000_000 / 10).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.classifier import (
    score_quality,
    train_quality_classifier,
)
from prometheus_parquet_server_spark.pipeline.similarity import hash_embed


def synth(spark, n):
    """Half the docs draw 12 tokens from a 'clean' pool, half replace the
    tail with 'junk' tokens — a learnable planted signal."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).cast("double").alias("label"),
    )
    def word(k):
        pool = F.when(
            (F.col("label") == 1.0) | (F.lit(k) < 6),
            F.concat(F.lit("w"), F.pmod(F.xxhash64("doc_id", F.lit(k)), F.lit(500)).cast("string")),
        ).otherwise(
            F.concat(F.lit("junk"), F.pmod(F.xxhash64("doc_id", F.lit(k + 100)), F.lit(50)).cast("string"))
        )
        return pool
    return base.select(
        "doc_id", "label",
        F.concat_ws(" ", *[word(k) for k in range(12)]).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress-classifier")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth(spark, n)
    t0 = time.time()
    feats = hash_embed(docs, dim=64).join(
        docs.select("doc_id", "label"), "doc_id"
    ).persist()
    n_rows = feats.count()  # forces featurization ONCE
    t_feat = round(time.time() - t0, 2)

    walls = []
    import numpy as np

    w = None
    hist = None
    t0 = time.time()
    w, hist = train_quality_classifier(
        feats, feat_col="embedding", dim=64, iters=iters, lr=2.0
    )
    t_train = round(time.time() - t0, 2)

    t0 = time.time()
    scored = score_quality(feats, w, feat_col="embedding")
    acc = scored.select(
        F.avg(
            ((F.col("quality_score") > 0.5).cast("double") == F.col("label"))
            .cast("double")
        ).alias("acc")
    ).first()["acc"]
    t_score = round(time.time() - t0, 2)

    print(json.dumps({
        "n_docs": n_rows,
        "featurize_s": t_feat,
        "train_s_total": t_train,
        "train_s_per_iter": round(t_train / iters, 2),
        "score_s": t_score,
        "loss_first_last": [round(hist[0], 4), round(hist[-1], 4)],
        "train_accuracy": round(float(acc), 4),
    }))


if __name__ == "__main__":
    main()
