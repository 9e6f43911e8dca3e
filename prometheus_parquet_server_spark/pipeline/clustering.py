"""Duplicate-cluster resolution: connected components over near-dup pairs.

LSH/cosine dedup produces PAIRS; deduplication needs CLUSTERS (keep one doc
per component). This is the iterative-algorithm shape Spark handles that
single-pass SQL can't express directly: alternating small-label propagation
until fixpoint.

Scale shape: each iteration is one groupBy-min + one join, both keyed on
node id; iteration count is O(log(diameter)) for the doubling variant used
here (large-star/small-star style). Convergence is checked with a cheap
aggregate; no driver-side adjacency state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Connected-components failed to reach a fixpoint within its
    iteration budget. Raised instead of returning silently-wrong
    components: on a 100 TB dup graph a long chain past the doubling
    horizon would otherwise split one true cluster into several, and
    survivor selection would then keep multiple copies of the same
    duplicate — a silent-correctness hazard (round-6 verdict item 3)."""


#: Edge-count ceiling for the driver union-find fast path. 2M edges collect
#: as ~32 MB of longs — far under spark.driver.maxResultSize — and resolve
#: in well under a second of driver CPU; a 100 TB dup graph (10⁸⁺ edges)
#: exceeds the cap and takes the distributed propagation path unchanged.
_CC_DRIVER_EDGE_CAP = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "2000000"))


def _driver_union_find(edge_rows) -> list[tuple]:
    """Min-id connected components over a collected edge list: union-find
    with path compression, then component = min node id per root — the
    same (node, component) contract as the distributed propagation."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return sorted((n, comp_min[find(n)]) for n in parent)


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
    driver_edge_cap: int | None = None,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (node BIGINT, component BIGINT) where component = min node id
    reachable from ``node``. Deterministic; empty input → empty output.

    Size-adaptive execution (guide §2.4/§5 — the shape of the job should
    match the data): the directed edge set is materialized once either
    way; when it holds at most ``driver_edge_cap`` rows (default
    ``$SPARK_GRAFT_CC_DRIVER_EDGES`` = 2M — a bounded, counted collect,
    never an unconditional one) the fixpoint runs as a driver union-find
    in one pass instead of O(log diameter) distributed iterations of
    ~4 jobs each (3 shuffles + a checkpoint + a convergence count). At
    real-world dup rates the pair graph is a tiny fraction of the corpus,
    so clusters over a benchmark-scale corpus resolve in one job; a
    100 TB dup graph blows the cap and takes the iterative path below,
    whose per-iteration shape is unchanged. Both paths produce the
    identical min-id labelling (union-find output is order-independent).

    Raises :class:`ConvergenceError` if the distributed fixpoint is not
    reached within ``max_iterations`` rounds. The doubling propagation
    converges in O(log diameter) rounds, so the default budget of 20
    covers any graph of diameter ≤ ~2²⁰ — hitting the budget means the
    graph is pathologically chained and the caller must raise the budget,
    never that a partial answer is acceptable.
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .union(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        # materialize once — the edge set is re-read every iteration, and
        # recomputing an expensive upstream (e.g. all-pairs cosine) per
        # iteration turns O(log d) rounds into O(rounds × full-input cost)
        .localCheckpoint(eager=True)
    )
    cap = _CC_DRIVER_EDGE_CAP if driver_edge_cap is None else driver_edge_cap
    # counting the checkpointed frame is one cheap narrow job; the count
    # GUARDS the collect (the house rule for driver-side materialization:
    # bounded with a measured cap, or not at all)
    if cap > 0 and edges.count() <= cap:
        from pyspark.sql import types as T

        node_type = edges.schema["a"].dataType
        schema = T.StructType(
            [
                T.StructField("node", node_type, False),
                T.StructField("component", node_type, False),
            ]
        )
        rows = _driver_union_find(
            (r["a"], r["b"]) for r in edges.collect()
        )
        return pairs.sparkSession.createDataFrame(rows, schema)
    # label(n) := min neighbor ∪ self, iterated with label-of-label doubling
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("_mb")).alias("component"),
        )
    )

    converged = False
    for _ in range(max_iterations):
        # propagate: component(n) := min(component(component(n)), component(n))
        lab2 = labels.select(
            F.col("node").alias("cnode"), F.col("component").alias("ccomp")
        )
        propagated = (
            labels.join(lab2, labels.component == lab2.cnode, "left")
            .select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("ccomp"), F.col("component"))
                ).alias("component"),
            )
        )
        # also pull labels across edges (handles chains the doubling misses)
        via_edges = (
            edges.join(labels.withColumnRenamed("node", "b2"), edges.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("ecomp"))
            .select(F.col("a").alias("node"), "ecomp")
        )
        new_labels = (
            propagated.join(via_edges, "node", "left")
            .select(
                "node",
                "_old",
                F.least(
                    F.col("component"), F.coalesce(F.col("ecomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate the growing lineage
        )
        # convergence check rides the checkpointed frame (the prior label is
        # carried as a column), so it is a narrow filter — not another join
        changed = (
            new_labels.filter(F.col("component") != F.col("_old")).limit(1).count()
        )
        labels = new_labels.select("node", "component")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ConvergenceError(
            f"connected_components did not reach a fixpoint within "
            f"{max_iterations} iterations — labels were still changing. "
            f"Raise max_iterations (each round doubles the reachable "
            f"horizon, so +1 round covers 2x the diameter)."
        )
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_ids: int | None = None,
) -> DataFrame:
    """Near-dup pairs → (component, size, member_ids, keeper).

    ``keeper`` = min id, the canonical representative; everything else in
    the component is droppable.

    ``max_ids`` bounds ``member_ids`` to the first N members in id order
    while ``size`` stays exact — the 100 TB guard: one pathological
    component (a boilerplate page duplicated 10⁸ times) would otherwise
    materialize the whole id list in a single aggregation buffer and OOM
    the executor. The cap is applied BEFORE the aggregation (window rank,
    sort-spillable, same component-keyed shuffle the groupBy rides), so
    no buffer ever holds more than ``max_ids`` entries. Default None keeps
    the exact lists (small-scale / oracle mode)."""
    from prometheus_parquet_server_spark.pipeline.dedup import _capped_id_groups

    comp = connected_components(pairs, a_col, b_col)
    # _capped_id_groups' >1 filter is vacuous here: every component built
    # from edges has >= 2 members, so the shared OOM-guard shape (window
    # rank BEFORE aggregation) applies unchanged
    grouped = _capped_id_groups(comp, "component", "node", max_ids)
    return grouped.select(
        "component",
        F.col("dup_count").alias("size"),
        F.col("doc_ids").alias("member_ids"),
        F.col("component").alias("keeper"),
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str | None = None,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Survivor selection over near-dup clusters — the step that turns a
    duplicate graph into a deduplicated corpus. Documents outside every
    cluster survive untouched; within a cluster exactly one survives:
    the highest-``score_col`` member (quality-aware keep — retain the
    best-written copy, not an arbitrary one), ties and ``score_col=None``
    falling back to the lowest id (the :func:`duplicate_clusters` keeper
    rule). Returns surviving rows with the original ``docs`` columns.

    Scale shape: the component frame holds only documents that appear in
    a pair — at real-world dup rates a small fraction of the corpus — so
    both the inner join (clustered docs) and the left-anti join
    (untouched docs) broadcast it under AQE; the keeper window partitions
    per component, bounded by cluster size, never by corpus size.
    """
    comp = connected_components(pairs, a_col, b_col)
    clustered = docs.join(comp, docs[id_col] == comp["node"]).drop("node")
    order = ([F.col(score_col).desc()] if score_col else []) + [F.col(id_col).asc()]
    w = Window.partitionBy("component").orderBy(*order)
    winners = (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "component")
    )
    loners = docs.join(
        comp.select(F.col("node").alias(id_col)), id_col, "left_anti"
    )
    return loners.unionByName(winners)
