#!/usr/bin/env python
"""Scale stress for hybrid retrieval (pipeline/stats.py bm25_topk +
hash_cosine_topk + rrf_fuse — the round-9 judge read the plan as
100 TB-sound; this measures it, the stress_dsir pattern).

Claim under test: both modalities cost O(tokens) scans with
candidate-bounded everything downstream — the lexical side explodes
only QUERY-TERM hits (term filter before any aggregate), the dense side
is one (doc, bucket) hash aggregate joined against a broadcast of query
weights, and RRF fuses two k-bounded rankings. 10x documents should
cost ~scan-x on the walls and nothing superlinear.

Synthesizes N docs (~30 tokens, zipf-ish vocabulary with planted
query-flavored slices), runs the three stages separately and the fused
query end-to-end at two sizes, prints one JSON line for BASELINE.md.

Usage: python scripts/stress_hybrid.py [N_SMALL] [N_LARGE]
(defaults 100_000 / 1_000_000).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.pipeline.stats import (
    bm25_topk,
    hash_cosine_topk,
    hybrid_topk,
)

QUERIES = {
    "q_engine": ["engine", "piston", "torque"],
    "q_ocean": ["ocean", "tide", "coral"],
    "q_ledger": ["ledger", "audit", "balance"],
}


def corpus(spark, n):
    """Deterministic synthetic docs: 30 zipf-ish tokens each; docs with
    id%10==0/1/2 lean on one planted query vocabulary so each query has
    a real signal slice to find."""
    flavors = {
        0: "engine piston torque",
        1: "ocean tide coral",
        2: "ledger audit balance",
    }
    tok = F.concat(
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.col("id"), F.col("pos")),
            # zipf-ish: small vocab for low positions, long tail above
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
    flavor = F.element_at(
        F.create_map(
            *[x for kk, v in flavors.items() for x in (F.lit(kk), F.lit(v))]
        ),
        F.pmod(F.col("id"), F.lit(10)).cast("int"),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(flavor.isNotNull(), F.concat_ws(" ", flavor, F.col("body")))
        .otherwise(F.col("body"))
        .alias("text"),
    )


def run(spark, n):
    import tempfile

    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_build,
        hybrid_index_topk,
    )

    docs = corpus(spark, n).localCheckpoint()  # pin: measure ops, not synthesis
    walls = {}
    t0 = time.time()
    r_lex = bm25_topk(docs, QUERIES, k=20)
    n_lex = r_lex.count()
    walls["bm25_topk"] = round(time.time() - t0, 2)
    t0 = time.time()
    r_dense = hash_cosine_topk(docs, QUERIES, k=20)
    n_dense = r_dense.count()
    walls["hash_cosine_topk"] = round(time.time() - t0, 2)
    t0 = time.time()
    fused = hybrid_topk(docs, QUERIES, k=10, candidates=20)
    rows = fused.collect()
    walls["hybrid_end_to_end"] = round(time.time() - t0, 2)
    # late interaction (round 11): O(tokens·(2w+1)) window rows → one
    # hash aggregate → broadcast-join dots — should scale at scan rate
    from prometheus_parquet_server_spark.pipeline.stats import maxsim_topk

    t0 = time.time()
    n_late = maxsim_topk(docs, QUERIES, k=20).count()
    walls["maxsim_topk"] = round(time.time() - t0, 2)
    # candidate-served MaxSim (round 12, VERDICT r11 Next #2): candidates
    # from the lexical+dense legs, isin-prune BELOW the token-window
    # explode — late-interaction cost bounded by the candidate count, so
    # the wall should go FLAT in corpus size where the scan form is 4.2x
    from prometheus_parquet_server_spark.pipeline.stats import (
        maxsim_rerank_topk,
    )

    t0 = time.time()
    n_rerank = maxsim_rerank_topk(docs, QUERIES, k=20, candidates=20).count()
    walls["maxsim_rerank_topk"] = round(time.time() - t0, 2)
    # candidate-served CombMNZ (round 13, VERDICT r12 Next #3): the
    # score-fusion serving twin — BM25 scores ⊕ candidate-served MaxSim
    # scores under min–max + hit-count fusion; like maxsim_rerank its
    # late leg is candidate-bounded, so the wall should track the two
    # candidate legs' scans, never the scan-maxsim shape
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_combmnz_rerank_topk,
    )

    t0 = time.time()
    n_combmnz = hybrid_combmnz_rerank_topk(
        docs, QUERIES, k=10, candidates=20
    ).count()
    walls["hybrid_combmnz_rerank_topk"] = round(time.time() - t0, 2)
    # index-served dense side (VERDICT r10 Next #4): one offline build,
    # then the query-time dense cost is probed-cell codes + k_adc raw
    # joins instead of the full O(tokens) embed+scan
    store = f"file://{tempfile.mkdtemp(prefix='stress_hybrid_idx_')}/idx"
    t0 = time.time()
    hybrid_index_build(
        spark, store, docs, dim=64, n_cells=32, n_probe_default=8,
        m=8, k_codes=16, coarse_iterations=1, pq_iterations=1,
    )
    walls["index_build_once"] = round(time.time() - t0, 2)
    t0 = time.time()
    idx_rows = hybrid_index_topk(
        spark, docs, store, QUERIES, k=10, candidates=20, k_adc=40,
        n_probe=8,
    ).collect()
    walls["hybrid_index_end_to_end"] = round(time.time() - t0, 2)
    # the full ColBERT serving stack (round 12): BM25 + INDEX candidates,
    # MaxSim only on candidates — no stage scans corpus token windows and
    # the dense leg is served from codes, so this is the shape whose wall
    # should stay near-flat where even maxsim_rerank's cosine leg scans
    from prometheus_parquet_server_spark.pipeline.stats import (
        maxsim_index_rerank_topk,
    )

    t0 = time.time()
    n_idx_rerank = maxsim_index_rerank_topk(
        spark, docs, store, QUERIES, k=20, candidates=20, k_adc=40,
        n_probe=8,
    ).count()
    walls["maxsim_index_rerank_topk"] = round(time.time() - t0, 2)
    # planted-signal check: each query's fused top-10 should be dominated
    # by its flavor slice (doc_id % 10 == flavor index)
    slice_of = {"q_engine": 0, "q_ocean": 1, "q_ledger": 2}

    def hits(rws):
        hit = {q: 0 for q in QUERIES}
        for r in rws:
            if r["doc_id"] % 10 == slice_of[r["query_id"]]:
                hit[r["query_id"]] += 1
        return hit

    return {
        "n_docs": n,
        "walls_s": walls,
        "rows": [n_lex, n_dense, len(rows), len(idx_rows), n_late, n_rerank,
                 n_idx_rerank, n_combmnz],
        "fused_top10_in_planted_slice": hits(rows),
        "index_fused_top10_in_planted_slice": hits(idx_rows),
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("stress-hybrid")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"small": run(spark, n_small), "large": run(spark, n_large)}
    for stage in out["small"]["walls_s"]:
        s, l = out["small"]["walls_s"][stage], out["large"]["walls_s"][stage]
        out.setdefault("scale_ratio", {})[stage] = round(l / max(s, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
