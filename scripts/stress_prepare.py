#!/usr/bin/env python
"""Capstone scale proof: the prepare_v3 curation composition (line
boilerplate strip → rule-flag gate → exact dedup → deterministic
shuffle/shard) at stress scale — 100k and 1M synthetic docs — recording
wall time and the EXCHANGE COUNT of the executed plan.

The claim under test (round-7 verdict #8): the composed plan keeps text
in a single shuffle (the line explode/re-aggregate); every later stage
moves hashes, flags, and ids only — so wall scales ~linearly in docs and
the exchange count is FLAT across scales (no hidden per-stage shuffle
that multiplies at 100 TB).

Synthetic corpus: ~40-token docs from a seeded hash mix; 1-in-8 docs is
an exact duplicate of a template (dedup bites), every doc carries two
shared banner lines (line-dedup bites), 1-in-50 is a too-short doc (the
rule gate bites).

Usage: python scripts/stress_prepare.py [n_docs ...]   (default: 100000 1000000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import (
    _MIXTURE_WEIGHTS,
    prepare_v3_pipeline,
    prepare_v4_pipeline,
)


def synth_docs(spark, n: int):
    """Deterministic (doc_id, text): multi-line docs with shared banner
    lines, duplicate bodies every 8th doc, short docs every 50th."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # body tokens from a seeded hash mix; duplicates share id % 8 == 0 → template id/8 % 1000
    tpl = F.when(F.col("doc_id") % 8 == 0, (F.col("doc_id") / 8).cast("long") % 1000).otherwise(
        F.col("doc_id") + 1_000_000
    )
    word = lambda k: F.concat(F.lit("w"), F.pmod(F.xxhash64(tpl, F.lit(k)), F.lit(5000)).cast("string"))
    body = F.concat_ws(" ", *[word(k) for k in range(40)])
    short = F.col("doc_id") % 50 == 1
    text = F.when(short, F.lit("tiny")).otherwise(
        F.concat(
            F.lit("ACCEPT ALL COOKIES\nSITE NAV | HOME | ABOUT\n"),
            body,
            F.lit("\n(c) 2024 example corp all rights reserved"),
        )
    )
    return base.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 5).cast("string")).alias("source"),
        text.alias("text"),
    )


def exchange_count(df) -> tuple[int, int]:
    """(exchange nodes, exchange nodes whose row carries text) in the
    final adaptive plan — counted on Exchange NODE lines only (substring
    counting double-counts ReusedExchange references)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = [
        l
        for l in plan.splitlines()
        if l.strip().lstrip("+-: *(0123456789)").startswith("Exchange")
    ]
    text = [l for l in nodes if "text" in l or "line#" in l]
    return len(nodes), len(text)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--v4"]
    v4 = "--v4" in sys.argv
    sizes = [int(a) for a in args] or [100_000, 1_000_000]
    spark = get_spark("stress-prepare")
    out = {}
    for n in sizes:
        docs = synth_docs(spark, n)
        t0 = time.time()
        result = (
            prepare_v4_pipeline(docs, _MIXTURE_WEIGHTS)
            if v4
            else prepare_v3_pipeline(docs)
        )
        result.write.mode("overwrite").format("noop").save()
        wall = round(time.time() - t0, 2)
        ex, ex_text = exchange_count(result)
        kept = result.count()
        out[n] = {"wall_s": wall, "exchanges": ex,
                  "text_exchanges": ex_text, "kept": kept}
        print(
            f"n={n}: wall={wall}s exchanges={ex} "
            f"(text-carrying {ex_text}) kept={kept}",
            flush=True,
        )
    if len(out) >= 2:
        ks = sorted(out)
        ratio = out[ks[-1]]["wall_s"] / max(out[ks[0]]["wall_s"], 1e-9)
        scale = ks[-1] / ks[0]
        print(
            f"scaling: {scale:.0f}x docs -> {ratio:.1f}x wall "
            f"(linear bound {scale:.0f}x); exchanges "
            f"{[out[k]['exchanges'] for k in ks]}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
