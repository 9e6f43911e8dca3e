"""Deterministic dataset sampling: per-group caps and stratified
fractions — the balancing passes a training-data pipeline runs after
dedup/quality filtering (cap any one domain/source's share, down-sample
over-represented strata) without RNG state, so every rerun and every
engine agrees document-for-document.

Randomness is replaced by the md5-band construction shared with
``split.split_bucket``: ordering / keeping decisions are pure functions
of ``(id, seed)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.split import (
    SPLIT_BUCKETS,
    split_bucket,
)


def _shuffle_key(id_col: str, seed: int):
    """The shared md5 'deterministic random order' key — ``md5(id ':' seed)``.
    One definition so every sampler (and the DuckDB oracle replays) stays
    byte-identical."""
    return F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))


def capped_sample(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
    seed: int = 42,
    presample_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by md5-shuffled order
    (deterministic 'random' sample), with ``sample_rank`` in [1, cap].

    Scale shape: a naive single window rank would sort EVERY row of a hot
    group on one task — the classic skew wall. Instead rank twice:
    stage 1 partitions by ``(group, salt)`` (``presample_salts`` md5-derived
    salts) and keeps the per-salt top-``cap``, bounding any group to
    ``cap × presample_salts`` surviving rows regardless of skew; stage 2
    ranks those survivors per group for the final top-``cap``. Both stages
    order by ``(md5(id:seed), id)`` — a total order — so the two-phase
    result is row-identical to the single-window form the oracle replays
    (every final top-``cap`` row is necessarily its salt's top-``cap``).
    """
    key = _shuffle_key(id_col, seed)
    salt = split_bucket(F.col(id_col), seed + 1) % presample_salts
    staged = df.withColumn("_key", key).withColumn("_salt", salt)
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_key", id_col)
    w2 = Window.partitionBy(group_col).orderBy("_key", id_col)
    return (
        staged.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= cap)
        .drop("_key", "_salt", "_r1")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Keep each group's documents, in deterministic md5-shuffled order,
    until the group's cumulative token count reaches ``budget_tokens`` —
    mixture design by TOKENS rather than document counts. A document is
    kept iff the tokens BEFORE it are under budget (so the boundary
    document that crosses the budget is kept, and every group with any
    documents keeps at least one). Adds ``n_tokens`` and ``cum_tokens``.

    Scale shape: one window per group ordered by the md5 key (running
    token sum). Unlike :func:`capped_sample` the cutoff depends on a
    running SUM, so a salt-and-merge two-phase rank cannot shortcut it;
    a hot group's sort is the price of an exact token boundary — callers
    with pathological skew should pre-thin with :func:`capped_sample` or
    :func:`stratified_sample` first.
    """
    from prometheus_parquet_server_spark.pipeline.text import tokens_col

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    clash = {"n_tokens", "cum_tokens"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns clash with token_budget_sample outputs: {sorted(clash)} "
            f"(rename them first — silently overwriting would apply the budget "
            f"to the wrong token metric)"
        )
    key = _shuffle_key(id_col, seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(key, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.withColumn("n_tokens", F.size(tokens_col(F.col(text_col))))
    return (
        staged.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    max_epochs: int = 100,
) -> DataFrame:
    """Training-mixture materialization: allocate ``total_budget_tokens``
    across sources proportionally to ``weights`` and emit each source's
    documents REPEATED for as many epochs as its allocation requires —
    upsampling (weight above natural share ⇒ ``epoch`` 0..e) and
    downsampling (below ⇒ partial epoch 0 only) in one pass, the
    LLaMA/DoReMi-style mixture step after dedup/quality filtering.

    Per source: target ``T = floor(total·w/Σw + 0.5)`` (ONE float
    multiply/divide quantized immediately — all arithmetic after is exact
    integer, so every engine replays the same plan), available tokens
    ``A = Σ n_tokens``; ``floor(T/A)`` full epochs plus a partial epoch
    of the md5-shuffle-ordered prefix reaching ``T mod A`` tokens (the
    boundary document is kept, same contract as
    :func:`token_budget_sample`; a zero remainder keeps none). Sources
    absent from ``weights`` get weight 0 (dropped); sources with no
    token mass emit nothing. Output adds ``epoch``, ``n_tokens``,
    ``target_tokens``.

    Scale shape: per-source availability is a tiny broadcast agg;
    full-epoch replication is a map-side ``explode(sequence(...))``; the
    one sort is the per-source partial-epoch running-sum window —
    :func:`token_budget_sample`'s price, paid once for the partial copy
    only. ``max_epochs`` bounds the replication fan-out: a mixture
    demanding more repetition than that is almost certainly mis-specified
    and RAISES rather than silently exploding output volume.
    """
    from prometheus_parquet_server_spark.pipeline.text import tokens_col

    if total_budget_tokens < 1:
        raise ValueError(
            f"total_budget_tokens must be >= 1, got {total_budget_tokens}"
        )
    if not weights:
        raise ValueError("weights must be non-empty")
    wsum = float(sum(weights.values()))
    if wsum <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    # outputs AND internal working columns: an input already carrying one
    # (e.g. _w) would make the weight/plan joins ambiguous or silently wrong
    reserved = {
        "epoch", "n_tokens", "target_tokens",
        "_w", "_avail", "_target", "_full", "_rem", "_cum",
    }
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns clash with mixture_sample outputs/internals: "
            f"{sorted(clash)}"
        )

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, float(w)) for g, w in sorted(weights.items())],
        f"{group_col} string, _w double",
    )
    staged = df.withColumn(
        "n_tokens", F.size(tokens_col(F.col(text_col)))
    ).join(F.broadcast(wdf), group_col)
    avail = staged.groupBy(group_col, "_w").agg(
        F.sum("n_tokens").alias("_avail")
    )
    # ONE quantized float op; everything downstream is exact integers
    target = F.floor(
        F.lit(float(total_budget_tokens)) * F.col("_w") / F.lit(wsum) + F.lit(0.5)
    ).cast("long")
    plan_rows = (
        avail.select(
            group_col,
            target.alias("_target"),
            F.col("_avail"),
        )
        .filter((F.col("_avail") > 0) & (F.col("_target") > 0))
        .select(
            group_col,
            "_target",
            # exact integer division (Spark `div` ≡ DuckDB `//`) — a double
            # division + cast would round vs truncate differently per engine
            F.expr("_target div _avail").alias("_full"),
            (F.col("_target") % F.col("_avail")).alias("_rem"),
        )
        # ONE driver materialization of the per-source plan (≤ one row per
        # source): the guard validates it AND the broadcast join reuses the
        # collected rows — without this the guard's action and the output
        # action would each recompute the staged→avail corpus aggregation
        # (review finding: a full extra tokenize+scan per call)
        .collect()
    )
    over = sorted(r[group_col] for r in plan_rows if r["_full"] >= max_epochs)
    if over:
        raise ValueError(
            f"mixture demands >= {max_epochs} full epochs for {over} — "
            f"raise max_epochs explicitly if this replication is intended"
        )
    plan = spark.createDataFrame(
        [(r[group_col], r["_target"], r["_full"], r["_rem"]) for r in plan_rows],
        f"{group_col} string, _target long, _full long, _rem long",
    )

    src = staged.join(F.broadcast(plan), group_col)
    full = src.filter(F.col("_full") > 0).withColumn(
        "epoch",
        F.explode(F.sequence(F.lit(0), (F.col("_full") - 1).cast("int"))),
    )
    key = _shuffle_key(id_col, seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(key, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        src.filter(F.col("_rem") > 0)
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") - F.col("n_tokens") < F.col("_rem"))
        .withColumn("epoch", F.col("_full").cast("int"))
        .drop("_cum")
    )
    out_cols = [
        c for c in df.columns if c not in ("n_tokens",)
    ] + ["epoch", "n_tokens"]
    return (
        full.unionByName(partial)
        .withColumn("target_tokens", F.col("_target"))
        .select(*out_cols, "target_tokens")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ``fractions[group]`` share of each group
    (groups absent from the map keep ``default_fraction``).

    The keep decision is ``split_bucket(id) < fraction × 10 000`` — a pure
    per-row predicate: zero shuffle, exact integer band comparison, and
    any engine replays the same kept-set. Map-side only at any scale.
    """
    for g, frac in {**fractions, "": default_fraction}.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g or 'default'} must be in [0,1], got {frac}")
    bucket = split_bucket(F.col(id_col), seed)
    threshold = F.lit(round(default_fraction * SPLIT_BUCKETS))
    for g, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(group_col) == g, F.lit(round(frac * SPLIT_BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)
