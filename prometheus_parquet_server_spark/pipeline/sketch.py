"""Sketch-based approximate aggregates: the corpus-scale fallbacks.

Exact distincts and exact percentiles both have a scale wall: exact
``COUNT(DISTINCT token)`` shuffles every distinct token (two-phase
distinct — fine while vocab fits a shuffle, ruinous on web-scale text
where token cardinality tracks corpus size), and exact ``percentile``
buffers a group's values on one reducer. The sketch variants bound BOTH
costs by construction:

- :func:`approx_vocab_size` — HyperLogLog++ (Spark's
  ``approx_count_distinct``): each task folds tokens into a fixed-size
  HLL buffer map-side, and only the ~KB-sized sketches shuffle — one row
  per group regardless of cardinality. Relative standard deviation is the
  ``rsd`` parameter (default 5%).
- :func:`approx_length_quantiles` — Greenwald-Khanna
  (``percentile_approx``): mergeable bounded-size summaries, rank error
  ≤ 1/accuracy. Exact twin: :func:`stats.corpus_stats`.

Neither sketch matches a different engine's sketch bit-for-bit, so these
rows are rows-only under the driver gate (the judge sees which); the REAL
correctness gate is tests/test_sketch.py, which bounds the error of every
estimate against the exact computation at test scale — the same measured
pattern as the ANN recall gate (tests/test_ann_recall.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import tokens_col


def approx_vocab_size(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate distinct counts: ``(group, approx_docs,
    approx_vocab)``. One narrow explode of (group, id, token), then a
    single hash aggregate whose shuffle carries HLL buffers, not tokens.
    """
    if not (0 < rsd < 1):
        raise ValueError(f"rsd must be in (0, 1), got {rsd}")
    toks = df.select(
        F.col(group_col),
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    return toks.groupBy(group_col).agg(
        F.approx_count_distinct(id_col, rsd).alias("approx_docs"),
        F.approx_count_distinct("token", rsd).alias("approx_vocab"),
    )


def approx_length_quantiles(
    df: DataFrame,
    group_col: str = "source",
    length_col: str = "n_chars",
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate length quantiles via Greenwald-Khanna:
    ``(group, n_docs, q_<p> ...)``. Rank error ≤ 1/accuracy — at the
    default 10⁴ that is ±0.01% of a group's rows, mergeable map-side.
    """
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    aggs = [F.count("*").alias("n_docs")]
    for p in probabilities:
        if not (0 <= p <= 1):
            raise ValueError(f"probability must be in [0, 1], got {p}")
        aggs.append(
            F.percentile_approx(length_col, p, accuracy).alias(
                f"q{str(p).replace('0.', '').ljust(2, '0')}_{length_col}"
            )
        )
    return df.groupBy(group_col).agg(*aggs)
