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

:func:`heavy_hitter_grams` is the third family and the odd one out: the
sketch (Misra-Gries) only GENERATES candidates; a second exact pass
verifies them, so the result is exactly correct and rides the full
value-hash oracle gate like any deterministic operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import ngrams_col, tokens_col


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


def _gram_array(text_col: str, n: int):
    """Token n-grams of ``text_col`` as an array of SPACE-JOINED strings —
    the same tokenization and join convention as
    :func:`dedup.cross_doc_ngrams` (which hashes them; here the text is
    kept because only a bounded candidate set ever shuffles). Window
    construction lives in :func:`text.ngrams_col`."""
    return ngrams_col(tokens_col(F.col(text_col)), n)


def mg_fold(counters: dict[str, int], pairs, cap: int) -> None:
    """Weighted Misra-Gries ingest: fold ``(item, weight)`` pairs into the
    capacity-``cap`` ``counters`` summary IN PLACE. Every decrement round
    subtracts ``m`` from all ``|counters|`` entries AND from the incoming
    weight (the implicit cap+1th counter), destroying ≤ m·(cap+1) mass;
    total destroyed mass ≤ N, so any item's stored count satisfies
    ``c − N/(cap+1) ≤ ĉ ≤ c`` [Misra & Gries 1982; Agarwal et al.,
    "Mergeable Summaries", PODS 2012]. Shared by the batch sketch
    (:func:`heavy_hitter_grams`) and the streaming stateful operator
    (streaming/heavy.py) so the two cannot drift."""
    for g, w in pairs:
        c = counters.get(g)
        if c is not None:
            counters[g] = c + int(w)
            continue
        w = int(w)
        while w > 0:
            if len(counters) < cap:
                counters[g] = w
                break
            m = min(w, min(counters.values()))
            dead = []
            for k in counters:
                c2 = counters[k] - m
                if c2 == 0:
                    dead.append(k)
                else:
                    counters[k] = c2
            for k in dead:
                del counters[k]
            w -= m


def heavy_hitter_grams(
    df: DataFrame,
    n: int = 2,
    threshold_frac: float = 0.001,
    capacity: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Exact heavy hitters over token n-grams: every gram whose occurrence
    count is ``>= threshold_frac`` of ALL gram occurrences, with its exact
    count — boilerplate/template detection without a full-cardinality
    shuffle.

    Two passes, both bounded:

    1. **Candidates (Misra-Gries).** Each partition streams its grams
       through a Misra-Gries summary of ``capacity`` counters
       (``mapInPandas`` — the canonical decrement sketch is imperative
       per-item state no builtin expresses; a production engine would
       register it as a JVM UDAF, the Arrow path is the honest Python
       stand-in). Only the summaries shuffle: ≤ partitions × capacity
       short rows, never the gram stream. Summed MG counters understate
       true counts by at most N/(capacity+1) [Misra & Gries 1982;
       Agarwal et al., "Mergeable Summaries", PODS 2012], so with
       ``capacity >= 2/threshold_frac`` (the default) every true heavy
       hitter survives with a positive merged count above the slack
       line — zero false negatives, and the candidate set is at most
       ~2/threshold_frac grams.
    2. **Exact verify.** One more scan counts ONLY the candidates (the
       candidate set broadcasts; the join filters map-side), then the
       exact threshold applies. False positives from pass 1 die here, so
       the output is exactly the grams an unbounded GROUP BY would
       produce — which is precisely how the DuckDB oracle replays it.

    Returns ``(gram, n_occ)``; no approximate column leaks out.

    Honest crossover (scripts/stress_heavy_hitters.py, 9.9 M distinct
    grams): on a single node the exact GROUP BY twin wins the wall clock
    (its in-memory shuffle is cheap; the MG pass pays Arrow transfer of
    the gram stream into Python). Use the exact twin while cardinality
    fits a shuffle — this path is for when it doesn't: its gram-shaped
    shuffle volume is zero regardless of cardinality.
    """
    if not (0 < threshold_frac < 1):
        raise ValueError(f"threshold_frac must be in (0, 1), got {threshold_frac}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if capacity is None:
        capacity = int(2.0 / threshold_frac) + 1
    if capacity < int(1.0 / threshold_frac) + 1:
        # below 1/f + 1 the merged-summary guarantee breaks: a true heavy
        # hitter could be decremented to zero in every partition summary
        raise ValueError(
            f"capacity {capacity} cannot guarantee recall at threshold "
            f"{threshold_frac}; need >= {int(1.0 / threshold_frac) + 1}"
        )
    grams = df.select(_gram_array(text_col, n).alias("_g"))
    cap = capacity

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # WEIGHTED Misra-Gries via the shared mg_fold kernel: each Arrow
        # batch is pre-counted with a vectorized value_counts, and the
        # sketch ingests (gram, weight) pairs — Python-loop work drops
        # from per-occurrence to per-unique-per-batch.
        import numpy as np

        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            arrs = [a for a in pdf["_g"] if a is not None and len(a)]
            if not arrs:
                continue
            flat = np.concatenate(arrs)
            total += len(flat)
            mg_fold(counters, pd.Series(flat).value_counts(sort=False).items(), cap)
        out = list(counters.items())
        out.append((None, total))  # per-partition stream length rides along
        yield pd.DataFrame(out, columns=["gram", "cnt"])

    spark = df.sparkSession
    # ONE job collects the summaries — they are bounded by construction
    # (≤ partitions × capacity gram rows + one total row per partition),
    # the same deliberately-small driver materialization as the IVF
    # centroid seed. The candidate set itself is ≤ ~2/threshold_frac
    # entries, so it ships back to the executors as an InSet literal —
    # pass 2 filters map-side with no join at all.
    rows = grams.mapInPandas(_mg, "gram string, cnt long").collect()
    total_n = sum(r["cnt"] for r in rows if r["gram"] is None)
    if total_n == 0:
        return spark.createDataFrame([], "gram string, n_occ long")
    # merged MG count c_hat satisfies c - N/(cap+1) <= c_hat <= c, so
    # keeping c_hat > N*f - N/(cap+1) loses no true heavy hitter
    floor_cnt = total_n * threshold_frac - total_n / (cap + 1)
    merged: dict[str, int] = {}
    for r in rows:
        if r["gram"] is not None:
            merged[r["gram"]] = merged.get(r["gram"], 0) + r["cnt"]
    candidates = [g for g, c in merged.items() if c > floor_cnt]
    if not candidates:
        return spark.createDataFrame([], "gram string, n_occ long")
    return (
        df.select(F.explode(_gram_array(text_col, n)).alias("gram"))
        .filter(F.col("gram").isin(candidates))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= F.lit(float(total_n) * threshold_frac))
    )
