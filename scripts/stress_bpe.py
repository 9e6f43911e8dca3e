#!/usr/bin/env python
"""Scale stress for the BPE trainer (pipeline/bpe.py): training cost
must be ONE corpus-sized job (the word count) plus merge iterations over
the VOCAB-sized frame — so going 10x on docs while holding vocabulary
fixed should barely move per-merge cost.

Usage: python scripts/stress_bpe.py [N_DOCS ...] (default 100000 1000000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.bpe import train_bpe


def synth(spark, n):
    """12-word docs over a fixed 5000-word vocabulary (vocab does not
    grow with n — the natural-language shape)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    word = lambda k: F.concat(
        F.lit("w"), F.pmod(F.xxhash64("doc_id", F.lit(k)), F.lit(5000)).cast("string")
    )
    return base.select(
        "doc_id", F.concat_ws(" ", *[word(k) for k in range(12)]).alias("text")
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    merges = 20
    spark = get_spark("stress-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in sizes:
        docs = synth(spark, n)
        t0 = time.time()
        learned = train_bpe(docs, num_merges=merges)
        wall = round(time.time() - t0, 2)
        out[n] = {"wall_s": wall, "merges": len(learned),
                  "s_per_merge": round(wall / max(len(learned), 1), 2)}
        print(f"n={n}: {out[n]}", flush=True)
    ks = sorted(out)
    if len(ks) >= 2:
        print(f"scaling: {ks[-1]//ks[0]}x docs -> "
              f"{out[ks[-1]]['wall_s']/out[ks[0]]['wall_s']:.1f}x wall")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
