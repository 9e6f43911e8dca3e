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


def bm25_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` documents per query, scored
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with the
    Robertson/Lucene smoothed ``idf = ln(1 + (N−df+0.5)/(df+0.5))``;
    ties → ``doc_id`` asc. Output ``(query_id, doc_id, score, rank)``.

    Scale shape: document length ``dl = size(tokens)`` is a per-row
    projection that rides the exploded (doc, token) stream, which is
    filtered to the union of query terms BEFORE its first aggregate —
    every shuffle after the scan carries only rows matching some query
    term, so corpus size bounds the scan and query size bounds everything
    else; no doc-keyed join exists anywhere in the plan. Document
    frequencies, the query-term table, and the 1-row (N, avgdl) frame
    come back as broadcasts; per-(query, doc) scores are one hash
    aggregate. Top-k is TWO-STAGE: a partial top-k per (query,
    hash-salt bucket) window, then the final top-k over the surviving
    ``salt_buckets × k`` rows per query — no single partition ever sorts
    a query's full candidate list (with a handful of queries, a plain
    per-query window would funnel the whole corpus through
    len(queries) partitions).

    Scores ride the integer-unit sum contract (:func:`...aggregate.unit_sum`,
    unguarded — contributions are finite by construction: ``idf ≤
    ln(1+2N)``, ``tf``-term < ``k1+1``) so the per-query sum over matched
    terms is order-insensitive and cross-engine bit-stable; the per-term
    contribution itself is pure IEEE double arithmetic identical on any
    engine up to libm ``ln`` (same exposure as the graded tfidf row;
    audited by scripts/audit_rounding.py).
    """
    from pyspark.sql import Window

    from prometheus_parquet_server_spark.operators.aggregate import unit_sum

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not queries:
        raise ValueError("queries must be non-empty")
    qterms = [
        (qid, t)
        for qid, terms in sorted(queries.items())
        for t in sorted({w.lower() for w in terms})
    ]
    if not qterms:
        raise ValueError("every query has an empty term list")
    spark = df.sparkSession
    qdf = spark.createDataFrame(qterms, ["query_id", "token"])
    all_terms = sorted({t for _, t in qterms})

    valid = df.filter(F.col(id_col).isNotNull())
    docs = valid.select(
        F.col(id_col).alias("_doc"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    lengths = docs.select("_doc", F.size("_toks").alias("dl"))
    corpus = lengths.agg(
        F.count("*").alias("_N"),
        # exact BIGINT sum / exact int→double casts / one IEEE division —
        # bit-stable avgdl on any engine
        (F.sum("dl").cast("double") / F.count("*")).alias("_avgdl"),
    )
    # dl rides the exploded rows (functionally dependent on _doc, so it
    # joins the grouping key for free) — NO doc-keyed length join exists
    # anywhere in the plan
    rows = docs.select(
        "_doc",
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("token"),
    ).filter(F.col("token").isin(all_terms))
    tf = rows.groupBy("_doc", "dl", "token").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("_N") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)

    scored = (
        tf.join(F.broadcast(docfreq), "token")
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(qdf), "token")
        .groupBy("query_id", "_doc")
        .agg(unit_sum(contrib, 1e6, guarded=False).alias("score"))
    )
    order = [F.col("score").desc(), F.col("_doc").asc()]
    w_part = Window.partitionBy(
        "query_id", F.pmod(F.hash("_doc"), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = scored.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= k
    )
    w_final = Window.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("_doc").alias(id_col), "score", "rank")
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
