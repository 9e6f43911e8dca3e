#!/usr/bin/env python
"""Physical-plan antipattern audit over the graded query registry.

Per-operator plan-shape guards (exchange counts, pushed filters) live in
the unit tests; this is the GLOBAL backstop: build every registry query
at the given sf_dir and flag physical plans containing

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the path (the
  house rule is Arrow or bust: ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas are fine);
- ``CartesianProduct`` — an unbounded all-pairs join;
- ``BroadcastNestedLoopJoin`` — usually a missing equi-condition. Some
  queries legitimately cross-join a ONE-ROW side (PromQL scalar fixup,
  corpus-stats broadcast-back): those carry an EXPECTED OCCURRENCE
  COUNT in the allowlist below (each entry documents why) — a SECOND
  nested loop appearing in an allowlisted query still fails, and an
  entry whose pattern disappeared flags as stale instead of lingering
  to mask a reintroduction.

A query that fails to BUILD raises — an unbuildable registry entry is
an audit failure, never a silent skip. Usage:
``python scripts/audit_plans.py [sf_dir] [name ...]``
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES

#: query -> pattern -> (expected occurrence count, reason). Every entry
#: is a deliberately non-equi join whose BUILD side is one row or
#: probe-sized — the broadcast nested loop is the intended plan, not a
#: missing key. Counts are exact: one more occurrence fails, zero flags
#: the entry as stale.
ALLOW: dict[str, dict[str, tuple[int, str]]] = {
    "tfidf_topk": {
        "BroadcastNestedLoopJoin": (1, "corpus-N (one row) broadcast back")
    },
    "bm25_topk": {
        "BroadcastNestedLoopJoin": (1, "corpus (N, avgdl) one-row broadcast back")
    },
    "hybrid_topk": {
        "BroadcastNestedLoopJoin": (
            1,
            "the bm25 side's allowlisted corpus (N, avgdl) one-row "
            "broadcast; the dense and fusion stages add equi-joins only",
        )
    },
    "dsir_topk": {
        "BroadcastNestedLoopJoin": (
            2,
            "one-row broadcasts: (Np x Nq) totals cross (two 1-row aggs) "
            "+ totals back onto the m-row log-ratio table",
        )
    },
    "dsir_sample": {
        "BroadcastNestedLoopJoin": (
            2,
            "same shape as dsir_topk (shared table/score stages); the "
            "Gumbel keying adds per-row expressions only",
        )
    },
    "dsir_incremental": {
        "BroadcastNestedLoopJoin": (
            2,
            "same one-row totals crosses as dsir_topk — the shared "
            "_table_from_counts core, fed from the persisted counts "
            "store instead of a corpus scan",
        )
    },
    "dsir_sample_from_table": {
        "BroadcastNestedLoopJoin": (
            2,
            "same one-row totals crosses as dsir_incremental (the shared "
            "_table_from_counts core under the shared Gumbel scaffold)",
        )
    },
    "hybrid_index_topk": {
        "BroadcastNestedLoopJoin": (
            1,
            "the bm25 side's allowlisted corpus (N, avgdl) one-row "
            "broadcast (the hybrid_topk shape); the index dense side is "
            "equi-joins + the candidate-bounded broadcast re-rank",
        )
    },
    "hybrid_combmnz_topk": {
        "BroadcastNestedLoopJoin": (
            1,
            "the bm25 leg's allowlisted corpus (N, avgdl) one-row cross "
            "broadcast (the hybrid_topk shape); the maxsim leg and the "
            "CombMNZ fuse add equi-joins and windows only",
        )
    },
    "hybrid_rrf3_topk": {
        "BroadcastNestedLoopJoin": (
            1,
            "the bm25 side's allowlisted corpus (N, avgdl) one-row "
            "broadcast (the hybrid_topk shape); the cosine and maxsim "
            "legs add bucket equi-joins only",
        )
    },
    "dsir_drift": {
        "BroadcastNestedLoopJoin": (
            2,
            "the same one-row totals crosses (N_old x N_new single-row "
            "aggs cross-joined, then broadcast back onto the m-row base)",
        )
    },
    "cluster_topics": {
        "BroadcastNestedLoopJoin": (1, "cell-count (one row) broadcast back")
    },
    "text_perplexity": {
        "BroadcastNestedLoopJoin": (1, "corpus-level cutpoint row broadcast back")
    },
    "quality_classifier": {
        "BroadcastNestedLoopJoin": (
            3,
            "one-row broadcasts: perplexity teacher's corpus stats (2, its "
            "own allowlisted shape scored twice: label + final score pass) "
            "+ the median-cut row",
        )
    },
    "pipeline_curriculum": {
        "BroadcastNestedLoopJoin": (1, "percentile cutpoints (one row) broadcast back")
    },
    "promql_at_modifier": {
        "BroadcastNestedLoopJoin": (1, "@-pinned scalar instant onto the grid")
    },
    "emb_cosine_topk": {
        "BroadcastNestedLoopJoin": (1, "exact baseline: probes x corpus by design")
    },
    "emb_knn_label": {
        "BroadcastNestedLoopJoin": (1, "kNN probes x corpus, exact-baseline shape")
    },
}

PATTERNS = ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged: dict[str, list[str]] = {}
    checked = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        # no exception guard: an unbuildable registry query IS the bug
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        checked += 1
        hits = []
        for pat in PATTERNS:
            n = plan.count(pat)
            expected = ALLOW.get(name, {}).get(pat, (0, ""))[0]
            if n > expected:
                hits.append(f"{pat} x{n} (allowed {expected})")
            elif n < expected:
                hits.append(f"STALE-ALLOWLIST {pat}: expected {expected}, found {n}")
        if hits:
            flagged[name] = hits
    print(json.dumps({"checked": checked, "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
