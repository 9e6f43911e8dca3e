"""Language-model perplexity scoring — the CCNet-style quality filter,
self-contained: fit a character-bigram model ON THE CORPUS ITSELF (or any
reference frame), then score each document's cross-entropy under it.
High-entropy documents (gibberish, binary spill, wrong language) float to
the top for removal; no external model artifact needed.

Fully declarative, two aggregation passes:

1. **Fit** — explode each document's normalized character bigrams, one
   ``groupBy(bigram)`` hash count (map-side combinable; the model is at
   most |alphabet|² ≈ 1.4k rows for the a–z/0–9/space alphabet).
2. **Score** — explode per-doc bigrams, broadcast-join the tiny model,
   per-doc average negative log-probability. Add-one smoothing over the
   fixed alphabet² event space keeps unseen bigrams finite and makes the
   probabilities an exact closed form both engines compute identically:
   ``p(b) = (count(b) + 1) / (total + |alphabet|²)``.

Scores are exact rational arithmetic until the final ``ln`` — rounded to
6 so the DuckDB oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: normalized alphabet: lowercase alphanumerics + space (37 symbols)
ALPHABET_SIZE = 37


def bigram_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(bigram, count) over the normalized corpus — the fitted model."""
    return (
        _bigram_rows(df, text_col, id_col)
        .groupBy("bigram")
        .agg(F.count("*").alias("count"))
    )


def _bigram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exploded (id, bigram) rows of the normalized text (lowercased,
    non-[a-z0-9] runs collapsed to single spaces, trimmed); documents
    shorter than 2 normalized chars contribute nothing."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    staged = df.select(F.col(id_col), norm.alias("_norm"))
    n = F.length("_norm")
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.col("_norm").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(id_col, F.explode(grams).alias("bigram"))


def perplexity_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit_scale: float | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_neg_logp) — per-document cross-entropy under
    the (supplied or self-fitted) bigram model with add-one smoothing.
    Documents with no bigrams are excluded (no events to score).

    Scale shape: the model is ≤ alphabet² rows → broadcast; the per-doc
    aggregate is one hash ``groupBy(id)``. Fitting on the corpus itself
    costs one extra count pass over the same exploded rows.

    ``unit_scale`` (round 14, the graded-output contract): emit
    ``avg_neg_logp_u6`` — each −ln term FLOOR-quantized to BIGINT
    micro-units, summed EXACTLY (integer addition is order-free, so
    Spark's partial-sum schedule cannot move the value the way a float
    SUM can), then one IEEE division by the count and one floor. Replaces
    the ``ROUND(AVG(..), 6)`` double, whose rounding mode is
    engine-version-sensitive (EXPLAIN §51/§54) and whose float sum is
    order-dependent in the last ulps."""
    if model is None:
        model = bigram_model(docs, text_col, id_col)
    total = model.agg(F.sum("count").alias("_total"))
    rows = _bigram_rows(docs, text_col, id_col)
    v = ALPHABET_SIZE * ALPHABET_SIZE
    scored = (
        rows.join(F.broadcast(model), "bigram", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("count"), F.lit(0)) + 1)
                    / (F.col("_total") + F.lit(v))
                )
            ).alias("_nlp"),
        )
    )
    if unit_scale is None:
        return scored.groupBy(id_col).agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("_nlp"), 6).alias("avg_neg_logp"),
        )
    unit = F.floor(
        F.col("_nlp") * F.lit(float(unit_scale)) + F.lit(0.5)
    ).cast("long")
    return (
        scored.select(F.col(id_col), unit.alias("_u"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("_u").alias("_su"))
        .select(
            id_col,
            "n_bigrams",
            F.floor(F.col("_su").cast("double") / F.col("n_bigrams") + F.lit(0.5))
            .cast("long")
            .alias("avg_neg_logp_u6"),
        )
    )


def curriculum_stages(
    scores: DataFrame,
    n_stages: int = 4,
    score_col: str = "avg_neg_logp",
    ascending: bool = True,
    exact: bool = True,
) -> DataFrame:
    """Curriculum-learning stage assignment: band rows into ``n_stages``
    quantile stages of ``score_col`` (stage 1 = easiest/lowest score when
    ``ascending``). Adds a ``stage`` column.

    Scale shape: a global ``ntile`` would sort the whole corpus on one
    axis; instead the ``n_stages − 1`` exact interpolated cutpoints are
    computed by ONE tiny aggregate, broadcast, and applied as a per-row
    banding expression — map-only after a constant-size reduction.
    Cutpoints are rounded to 6 (like the scores they cut) so the banding
    is engine-replayable; boundary rows (score == cutpoint) go to the
    LOWER stage (``<=`` banding).

    ``exact=True`` (the oracle-pinned default) uses ``percentile``, which
    buffers every value of the corpus on one reducer to interpolate — fine
    to ~10^8 rows, an executor-memory cliff at 10^11. ``exact=False``
    switches the cutpoint aggregate to ``percentile_approx`` (GK sketch,
    bounded memory, mergeable partials — the 100 TB path); stage
    boundaries then shift by at most the sketch's rank error (≤1/10000
    of the corpus at the accuracy used here), and only rows within that
    sliver of a cutpoint can band differently.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    if n_stages == 1:
        return scores.withColumn("stage", F.lit(1))
    qs = [i / n_stages for i in range(1, n_stages)]
    pct = "percentile" if exact else "percentile_approx"
    acc = "" if exact else ", 10000"
    cuts_row = scores.agg(
        *[
            F.round(F.expr(f"{pct}({score_col}, {q!r}{acc})"), 6).alias(f"c{i}")
            for i, q in enumerate(qs)
        ]
    ).first()
    cuts = [cuts_row[f"c{i}"] for i in range(len(qs))]
    ordered = cuts if ascending else list(reversed(cuts))
    expr = F.lit(n_stages)
    for stage in range(n_stages - 1, 0, -1):
        cut = ordered[stage - 1]
        cond = (
            F.col(score_col) <= F.lit(cut)
            if ascending
            else F.col(score_col) >= F.lit(cut)
        )
        expr = F.when(cond, F.lit(stage)).otherwise(expr)
    return scores.withColumn("stage", expr)
