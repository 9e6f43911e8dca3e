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
  corpus-stats broadcast-back): those are allowed via the explicit
  allowlist below, every entry of which documents why.

Exit 1 when an un-allowlisted hit appears. Usage:
``python scripts/audit_plans.py [sf_dir] [name ...]``
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from prometheus_parquet_server_spark import get_spark
from prometheus_parquet_server_spark.driver_contract import QUERIES

#: query -> patterns allowed there, each with a reason. Every entry is a
#: deliberately non-equi join whose BUILD side is one row or probe-sized
#: — the broadcast nested loop is the intended plan, not a missing key.
ALLOW: dict[str, dict[str, str]] = {
    "tfidf_topk": {
        "BroadcastNestedLoopJoin": "corpus-N (one row) broadcast back to every doc"
    },
    "text_perplexity": {
        "BroadcastNestedLoopJoin": "corpus-level cutpoint row broadcast back"
    },
    "pipeline_curriculum": {
        "BroadcastNestedLoopJoin": "percentile cutpoints (one row) broadcast back"
    },
    "promql_at_modifier": {
        "BroadcastNestedLoopJoin": "@-pinned scalar instant cross-joined onto the grid"
    },
    "emb_cosine_topk": {
        "BroadcastNestedLoopJoin": "exact baseline: probes x corpus scored by design"
    },
    "emb_knn_label": {
        "BroadcastNestedLoopJoin": "kNN probes x corpus, same exact-baseline shape"
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
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only entries can't be planned here
            print(f"SKIP {name}: {type(e).__name__}", file=sys.stderr)
            continue
        checked += 1
        hits = [
            p
            for p in PATTERNS
            if p in plan and p not in ALLOW.get(name, {})
        ]
        if hits:
            flagged[name] = hits
    print(json.dumps({"checked": checked, "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
