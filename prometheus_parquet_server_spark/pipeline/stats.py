"""Corpus statistics: token/vocabulary frequencies and per-group document
distributions — the reporting pass that precedes tokenizer training and
mixture design (vocab coverage, length budgets, per-source weights).

Everything is hash-aggregation over narrow exploded rows; means and exact
interpolated percentiles round to 6 decimals so the DuckDB oracle
(``quantile_cont`` ≡ Spark's exact ``percentile``) hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import tokens_col


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide per-token stats: ``(token, tf, df)`` — total occurrences
    (term frequency) and number of distinct documents containing the token
    (document frequency).

    Scale shape: one narrow explode of (doc, token) rows, then a single
    ``groupBy(token)`` hash aggregate. ``count`` combines map-side;
    ``count(DISTINCT doc)`` is Spark's standard two-phase expand — both
    shuffles carry (token, id/count) pairs only, never text. Vocabulary
    cardinality (≲ millions) keeps the final agg small at any corpus size.
    """
    rows = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    return rows.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("_doc").alias("df"),
    )


def vocab_topk(
    df: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The ``k`` most frequent tokens (ties → lexicographically first),
    with term and document frequencies and ``rank``.

    ``orderBy(...).limit(k)`` compiles to TakeOrdered — per-partition
    top-``k`` then a driver merge of ``partitions × k`` rows; the full
    vocabulary is never globally sorted.
    """
    stats = token_stats(df, text_col, id_col)
    ranked = stats.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(k)
    # rank re-derived deterministically from (tf, token) so the output is
    # self-describing; the window runs over k rows only
    from pyspark.sql import Window

    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    return ranked.select("token", "tf", "df", F.row_number().over(w).alias("rank"))


def tfidf_topk(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` keywords per document by smoothed tf-idf:
    ``(id, token, tf, score, rank)`` with
    ``score = tf · (ln((N + 1)/(df + 1)) + 1)`` (ties → token asc).

    Plan shape: the corpus is exploded and aggregated ONCE — the
    per-(doc, token) term-count frame is reused to derive document
    frequencies (one row per distinct (doc, token) already exists, so
    ``df`` is a plain count, no second scan and no count-distinct
    expand); the tiny token→df frame and the 1-row corpus count come
    back via broadcast joins, and the only window runs per-doc over that
    doc's distinct tokens. The text column itself never shuffles.
    """
    from pyspark.sql import Window

    # NULL-id documents are excluded up front: they would form a counted
    # _doc=NULL group in docfreq while countDistinct(id) excludes them
    # from N — inconsistent idf denominators
    valid = df.filter(F.col(id_col).isNotNull())
    rows = valid.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    tf = rows.groupBy("_doc", "token").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))
    total = valid.agg(F.countDistinct(id_col).alias("_N"))
    scored = (
        tf.join(F.broadcast(docfreq), "token")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("_doc").alias(id_col),
            "token",
            "tf",
            F.round(
                F.col("tf") * (F.log((F.col("_N") + 1) / (F.col("_df") + 1)) + 1), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def corpus_stats(
    df: DataFrame,
    group_col: str = "source",
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-group document-length distribution: ``(group, n_docs,
    mean_chars, p50_chars, p90_chars, max_chars)`` with exact interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``).

    One hash aggregate keyed by group. Exact percentiles buffer each
    group's values on the final reducer — correct up to billions of docs
    per group; swap in ``percentile_approx`` only if a group's row count
    itself stops fitting (the oracle gate pins the exact variant).
    """
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(length_col), 6).alias("mean_chars"),
        F.round(F.expr(f"percentile({length_col}, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr(f"percentile({length_col}, 0.9)"), 6).alias("p90_chars"),
        F.max(length_col).alias("max_chars"),
    )
