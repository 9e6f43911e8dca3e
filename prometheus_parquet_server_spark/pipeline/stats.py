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
    unit_scale: float | None = None,
) -> DataFrame:
    """Per-group document-length distribution: ``(group, n_docs,
    mean_chars, p50_chars, p90_chars, max_chars)`` with exact interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``).

    One hash aggregate keyed by group. Exact percentiles buffer each
    group's values on the final reducer — correct up to billions of docs
    per group; swap in ``percentile_approx`` only if a group's row count
    itself stops fitting (the oracle gate pins the exact variant).

    ``unit_scale`` (round 14, the graded-output contract): emit the three
    derived statistics as ``FLOOR(x·scale + 0.5)`` BIGINT micro-units
    (``*_u6`` at the default 1e6) instead of ``ROUND(x, 6)`` doubles.
    ROUND-on-double is engine-version-sensitive (HALF_UP on BigDecimal vs
    a C library's tie-break — the events_sessionize saga, EXPLAIN §51/§54)
    while FLOOR of an IEEE multiply/add is bit-stable everywhere; the mean
    is derived from the exact integer SUM/COUNT so both engines divide the
    same two numbers."""
    if unit_scale is None:
        return df.groupBy(group_col).agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(length_col), 6).alias("mean_chars"),
            F.round(F.expr(f"percentile({length_col}, 0.5)"), 6).alias("p50_chars"),
            F.round(F.expr(f"percentile({length_col}, 0.9)"), 6).alias("p90_chars"),
            F.max(length_col).alias("max_chars"),
        )

    def unit(col):  # FLOOR-quantized micro-units, the bit-stable contract
        return F.floor(col * F.lit(float(unit_scale)) + F.lit(0.5)).cast("long")

    mean = F.sum(length_col).cast("double") / F.count("*")
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        unit(mean).alias("mean_chars_u6"),
        unit(F.expr(f"percentile({length_col}, 0.5)")).alias("p50_chars_u6"),
        unit(F.expr(f"percentile({length_col}, 0.9)")).alias("p90_chars_u6"),
        F.max(length_col).alias("max_chars"),
    )


def _query_hash_weights(terms: list[str], dim: int) -> list[tuple[int, int]]:
    """Pure-Python hash-embed of a query's term list — IDENTICAL md5
    bucket/sign math to :func:`similarity.hash_embed` (and its DuckDB
    oracle), computed driver-side so both engines receive the same tiny
    literal weight rows. Returns sorted (bucket, weight) with zero
    weights dropped."""
    import hashlib

    acc: dict[int, int] = {}
    for t in terms:
        h = hashlib.md5(t.encode()).hexdigest()
        b = int(h[:8], 16) % dim
        s = -1 if h[8] in "89abcdef" else 1
        acc[b] = acc.get(b, 0) + s
    return sorted((b, w) for b, w in acc.items() if w != 0)


def hash_cosine_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Dense-side retrieval over feature-hashed embeddings: each query's
    term list hash-embeds to a ``dim``-bucket signed-count vector
    (driver-side, tiny), documents embed via
    :func:`similarity.hash_embed`'s integer long form, and candidates
    rank by cosine. CANDIDATES are the documents sharing at least one
    nonzero bucket with the query (retrieval semantics — a
    no-overlap document has cosine exactly 0 and is not returned), so
    the only join is bucket-equi against a broadcast of the query
    weights. Dot products and squared norms are EXACT integers (signed
    counts); ranking applies ROUND(cosine, 9) with ties → ``id_col``
    (the ANN-family convention). Returns ``(query_id, id_col, rank)``.
    """
    from pyspark.sql import Window


    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not queries:
        raise ValueError("queries must be non-empty")
    spark = df.sparkSession
    qrows = [
        (qid, b, w)
        for qid, terms in sorted(queries.items())
        for b, w in _query_hash_weights(sorted({t.lower() for t in terms}), dim)
    ]
    if not qrows:
        raise ValueError("every query hash-embeds to the zero vector")
    qdf = spark.createDataFrame(qrows, "query_id string, bucket long, qw long")
    qnorm = qdf.groupBy("query_id").agg(F.sum(F.col("qw") * F.col("qw")).alias("_qn2"))

    # the long form DIRECTLY: explode tokens → md5 bucket/sign per token →
    # one (doc, bucket) hash aggregate — O(tokens) work. Materializing the
    # dense vector via hash_embed's O(tokens·dim) interpreted HOF fold and
    # posexploding it back produced identical rows at ~6× the wall
    # (measured at sf0.1: hybrid 6.0 s → 2.1 s steady). Bucket/sign math
    # is hash_embed's exact convention, pinned by the parity test.
    tok = F.explode(tokens_col(F.col(text_col))).alias("_t")
    long = (
        # NULL-id docs are dropped up front (the tfidf_topk/bm25_topk rule,
        # and what both the lexical side and the DuckDB hybrid oracle's
        # docs CTE already do) — otherwise the dense side could rank a
        # NULL-id candidate and shift every lower rank / fused RRF score.
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), tok)
        .select(
            id_col,
            (F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long")
             % F.lit(dim)).alias("bucket"),
            F.when(
                F.substring(F.md5("_t"), 9, 1).isin(*"89abcdef"), F.lit(-1)
            ).otherwise(F.lit(1)).alias("_s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").alias("w"))
        .filter(F.col("w") != 0)
        # pin ONCE (r14): `long` feeds BOTH the norms and the dots
        # aggregates below, and Spark reuses no non-exchange subplan
        # within a query — without this the token explode + md5 + first
        # hash aggregate (the O(corpus tokens) work) run twice. The
        # materialized frame is narrow: ≤ dim rows per doc of
        # (id, bucket, w), no text.
        .localCheckpoint()
    )
    norms = long.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w")).alias("_n2"))
    dots = (
        long.join(F.broadcast(qdf), "bucket")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("w") * F.col("qw")).alias("_dot"))
    )
    cos = (
        dots.join(norms, id_col)
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("_dot")
                / (F.sqrt(F.col("_n2").cast("double"))
                   * F.sqrt(F.col("_qn2").cast("double"))),
                9,
            ).alias("_cos"),
        )
    )
    order = [F.col("_cos").desc(), F.col(id_col).asc()]
    w_part = Window.partitionBy(
        "query_id", F.pmod(F.hash(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = cos.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= k
    )
    w_final = Window.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    top_k: int = 10,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """Reciprocal Rank Fusion [Cormack, Clarke & Büttcher, SIGIR 2009]:
    fuse N per-query rankings by ``score(d) = Σ_r 1/(k_const +
    rank_r(d))`` over the union of candidates (a document absent from a
    ranking simply contributes nothing — the published convention). Each
    reciprocal is quantized ONCE to BIGINT micro-units (a pure function
    of the integer rank), so fused scores are exact integer sums —
    order-free and engine-replayable. Output ``(group_col, id_col,
    score_u, rank)``, ties → ``id_col``."""
    from functools import reduce

    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k_const < 1:
        raise ValueError(f"k_const must be >= 1, got {k_const}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    unit = F.floor(
        F.lit(float(unit_scale)) / (F.lit(k_const) + F.col(rank_col)) + F.lit(0.5)
    ).cast("long")
    sides = [
        r.select(group_col, id_col, unit.alias("_u")) for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), sides)
        .groupBy(group_col, id_col)
        .agg(F.sum("_u").alias("score_u"))
    )
    order = [F.col("score_u").desc(), F.col(id_col).asc()]
    w_part = Window.partitionBy(
        group_col, F.pmod(F.hash(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = fused.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= top_k
    )
    w_final = Window.partitionBy(group_col).orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= top_k)
        .select(group_col, id_col, "score_u", "rank")
    )


def combmnz_fuse(
    scored: list[DataFrame],
    top_k: int = 10,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """CombMNZ score fusion [Fox & Shaw 1994; Lee 1997, public
    knowledge] — the canonical SCORE-based complement to rank-based
    :func:`rrf_fuse`: per (leg, query) scores min–max normalize to
    [0, 1], and ``fused(d) = |legs hitting d| · Σ normalized`` — the
    multiply-by-hit-count is what separates CombMNZ from CombSUM and
    rewards cross-leg agreement. Each normalized score quantizes ONCE
    to BIGINT micro-units (floor(norm·scale + 0.5) — IEEE ops every
    engine replays identically), so fused scores are exact integers:
    ``score_u = n_hits · Σ units``. A leg whose per-query scores are
    all equal normalizes to 1.0 (everything is the max — the
    single-candidate convention). Output ``(group_col, id_col,
    score_u, rank)``, ties → ``id_col``.

    Scale shape: per-leg normalization is one per-query window min/max
    over k-bounded candidate rows; the fuse is one hash aggregate over
    the bounded union — nothing rescans a corpus."""
    from functools import reduce

    from pyspark.sql import Window

    if not scored:
        raise ValueError("scored must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    sides = []
    for leg in scored:
        w = Window.partitionBy(group_col)
        sv = F.col(score_col).cast("double")
        mn, mx = F.min(sv).over(w), F.max(sv).over(w)
        norm = F.when(mx > mn, (sv - mn) / (mx - mn)).otherwise(F.lit(1.0))
        unit = F.floor(norm * F.lit(float(unit_scale)) + F.lit(0.5)).cast(
            "long"
        )
        sides.append(leg.select(group_col, id_col, unit.alias("_u")))
    fused = (
        reduce(lambda a, b: a.unionByName(b), sides)
        .groupBy(group_col, id_col)
        .agg(
            (F.count("*") * F.sum("_u")).alias("score_u"),
        )
    )
    order = [F.col("score_u").desc(), F.col(id_col).asc()]
    w_part = Window.partitionBy(
        group_col, F.pmod(F.hash(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = fused.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= top_k
    )
    w_final = Window.partitionBy(group_col).orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= top_k)
        .select(group_col, id_col, "score_u", "rank")
    )


def hybrid_combmnz_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ⊕ MaxSim under CombMNZ — the score-based sibling of the RRF
    hybrids, fusing the two score-bearing legs (both emit exact-integer
    scores, so the min–max normalization inputs are engine-identical).
    Each leg contributes its top ``candidates`` per query; agreement
    doubles (hit count 2). Returns ``(query_id, id_col, score_u,
    rank)``, exact integers.

    Scale note: the late leg here is the SCAN-form :func:`maxsim_topk`
    (O(corpus tokens · (2·window+1)) per query batch — measured 46.3 s
    at 1M docs, BASELINE round-12). Like :func:`maxsim_topk` itself this
    form is the diagnostic baseline; serve with
    :func:`hybrid_combmnz_rerank_topk`, whose late leg is candidate-
    bounded."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    late = maxsim_topk(
        df, queries, k=candidates, dim=dim, window=window,
        text_col=text_col, id_col=id_col,
    )
    return combmnz_fuse(
        [
            lex.select("query_id", id_col, "score"),
            late.select(
                "query_id", id_col, F.col("score_u").alias("score")
            ),
        ],
        top_k=k, id_col=id_col,
    )


def hybrid_combmnz_rerank_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidate_ids: int = 100_000,
) -> DataFrame:
    """CombMNZ with the late leg CANDIDATE-SERVED — the serving twin of
    :func:`hybrid_combmnz_topk` (the scan form stays as the diagnostic
    baseline, the :func:`maxsim_topk` convention): the MaxSim leg
    re-scores ONLY the lexical∪dense candidate union through the shared
    :func:`_maxsim_rerank_scores` chain (isin-pruned below the token-
    window explode), then the BM25 scores and the reranked late scores
    fuse under the unchanged :func:`combmnz_fuse`. The dense leg is
    candidate generation only — the fusion stays 2-leg (lex ⊕ late),
    exactly the scan form's legs. At 100 TB this is the only affordable
    score-fusion shape: every post-candidate stage is bounded by
    ``|queries| · candidates``, not the corpus (the measured near-flat
    geometry of maxsim_index_rerank_topk, BASELINE round-12).

    Semantics note (why this is its OWN oracle-paired row, not a
    replay of the scan form): the reranked late leg ranks every
    candidate pair — a no-overlap pair scores exactly 0 and can enter
    the leg's top-``candidates``, which shifts that query's min–max
    normalization window. Both legs still emit exact integers, so the
    fused scores grade bit-exact against a full SQL replay."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if not queries:
        raise ValueError("queries must be non-empty")
    from pyspark.sql import Window as W

    # pin ONLY the lex leg: the candidate union AND the fusion both read
    # it (the hybrid_rrf3_rerank_topk recompute lesson, round 12); the
    # dense leg feeds candidate generation alone — the fusion here is
    # 2-leg (lex ⊕ late) — so it is read exactly once, inside
    # _maxsim_rerank_scores' own cand checkpoint, and pinning it would
    # add a blocking materialization for no recompute saving
    lex = bm25_topk(
        df, queries, k=candidates, text_col=text_col, id_col=id_col
    ).localCheckpoint()
    dense = hash_cosine_topk(
        df, queries, k=candidates, dim=dim, text_col=text_col, id_col=id_col
    )
    reranked = _maxsim_rerank_scores(
        df, queries, lex, dense, dim, window, text_col, id_col,
        max_candidate_ids,
    )
    w_late = W.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), F.col(id_col).asc()
    )
    late = (
        reranked.withColumn("rank", F.row_number().over(w_late))
        .filter(F.col("rank") <= candidates)
    )
    return combmnz_fuse(
        [
            lex.select("query_id", id_col, "score"),
            late.select(
                "query_id", id_col, F.col("score_u").alias("score")
            ),
        ],
        top_k=k, id_col=id_col,
    )


def hybrid_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    k_const: int = 60,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval: lexical BM25 and hash-embedding cosine rankings
    fused by RRF — the standard two-tower-free hybrid (sparse ⊕ dense)
    used to mine training data. Each side contributes its top
    ``candidates``; RRF keeps the agreement structure and the fused
    top-``k`` emerges with exact integer scores. All three stages are
    individually oracle-replayable, so the composition grades bit-exact.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    dense = hash_cosine_topk(
        df, queries, k=candidates, dim=dim, text_col=text_col, id_col=id_col
    )
    return rrf_fuse(
        [lex.select("query_id", id_col, "rank"), dense],
        k_const=k_const,
        top_k=k,
        id_col=id_col,
    )


def _hash_embed_corpus(
    df: DataFrame, dim: int, text_col: str, id_col: str
) -> DataFrame:
    """The SHARED dense corpus for index-backed hybrid retrieval: raw
    (unnormalized) signed-count hash embeddings of every non-NULL-id
    document, renamed to the index family's (vec_id, embedding)
    convention. Shared by :func:`hybrid_index_build` and
    :func:`hybrid_index_topk` so the vectors the index encodes and the
    vectors the exact re-rank joins back CANNOT drift (ivfpq_rerank's
    completeness gate would raise on any mismatch)."""
    from prometheus_parquet_server_spark.pipeline.similarity import hash_embed

    return hash_embed(
        df.filter(F.col(id_col).isNotNull()),
        text_col=text_col,
        id_col=id_col,
        dim=dim,
        normalize=False,
    ).select(F.col(id_col).alias("vec_id"), "embedding")


def _query_hash_vec(terms: list[str], dim: int) -> list[float]:
    """Driver-side dense query vector: the sparse
    :func:`_query_hash_weights` densified to ``dim`` doubles — the same
    signed-count space the corpus embeds into."""
    vec = [0.0] * dim
    for b, w in _query_hash_weights(sorted({t.lower() for t in terms}), dim):
        vec[b] = float(w)
    return vec


def hybrid_index_build(
    spark,
    store_path: str,
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    **build_kw,
):
    """Build the persisted IVF-PQ index over the hash-embed corpus of a
    document table — the offline half of :func:`hybrid_index_topk`
    (``build_kw`` forwards to :func:`pipeline.pq.ivfpq_build`:
    n_cells/m/k_codes/iterations/opq). At 100 TB this runs once per
    corpus version; queries then touch m-byte codes in probed cells
    instead of re-embedding and scanning every document."""
    from prometheus_parquet_server_spark.pipeline.pq import ivfpq_build

    # localCheckpoint: ivfpq_build applies its cell/residual Python UDF on
    # the vector column, and stacking that on the hash-embed HOF fold
    # makes Spark inline the UDF into an interpreted projection it cannot
    # evaluate (INTERNAL_ERROR: Cannot evaluate expression ... PythonUDF).
    # Materializing the embedded corpus first gives the UDF a plain
    # column — and the build reads the corpus twice anyway (codebook
    # training + encoding), so the checkpoint also dedupes the fold.
    corpus = _hash_embed_corpus(df, dim, text_col, id_col).localCheckpoint()
    _guard_nonnegative_ids(corpus, "hybrid_index_build")
    return ivfpq_build(spark, store_path, corpus, dim=dim, **build_kw)


def _guard_nonnegative_ids(corpus: DataFrame, op: str) -> None:
    """The hybrid-index family maps query probes to NEGATIVE longs
    (−1−index), so corpus doc ids MUST be non-negative — a corpus doc at
    id −1−i would collide with probe i: the ADC self-exclusion would
    silently drop it from that probe's results and the probe_id→query_id
    join could mislabel rows (ADVICE r11). One cheap agg over the batch
    being indexed (already materialized); raises loudly."""
    row = corpus.agg(F.min("vec_id").alias("lo")).first()
    if row["lo"] is not None and row["lo"] < 0:
        raise ValueError(
            f"{op}: corpus contains negative doc id {row['lo']} — the "
            f"hybrid index reserves negative longs for query probe ids; "
            f"remap document ids to non-negative before indexing"
        )


def hybrid_index_topk(
    spark,
    df: DataFrame,
    store_path: str,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    k_adc: int = 30,
    n_probe: int | None = None,
    k_const: int = 60,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: int | None = None,
) -> DataFrame:
    """Hybrid retrieval with the dense side served from the persisted
    IVF-PQ index (VERDICT r10 Next #4): BM25 stays the lexical side; the
    dense side embeds each query's term list driver-side (the house
    hash-embed signed counts), searches the index — ADC over m-byte
    residual codes, manifest-pruned probed cells — takes the ADC
    top-``k_adc``, exact-reranks them against the raw hash-embed corpus
    (:func:`pipeline.pq.ivfpq_rerank`, candidate-bounded broadcast
    join), and the two rankings fuse under the same RRF as
    :func:`hybrid_topk`.

    Scale contrast with the scan-based hybrid: hash_cosine_topk's dense
    side is O(corpus tokens) per query batch; here the per-query dense
    cost is ``n_probe/n_cells`` of the CODES (m bytes/vector) plus
    ``k_adc`` raw-vector joins — the billion-document serving shape.
    Ranking metric differs by design (index family = L2 on raw signed
    counts; scan hybrid = cosine): RRF consumes only ranks, and the
    agreement structure is what the fusion keeps.

    Probe ids are mapped to NEGATIVE longs (−1−index in sorted query
    order) so the ADC kernel's typed (long) probe ids can never collide
    with corpus ids — document ids must be non-negative. Returns
    ``(query_id, id_col, score_u, rank)``, all-integer scores."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    if k_adc < candidates:
        raise ValueError(
            f"k_adc ({k_adc}) must be >= candidates ({candidates}) — the "
            f"exact re-rank can only return what the ADC stage surfaced"
        )
    if not queries:
        raise ValueError("queries must be non-empty")

    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    dense = _index_dense_ranks(
        spark, df, store_path, queries, candidates, k_adc, n_probe,
        dim, text_col, id_col, version,
    )
    return rrf_fuse(
        [lex.select("query_id", id_col, "rank"), dense],
        k_const=k_const, top_k=k, id_col=id_col,
    )


def _index_dense_ranks(
    spark,
    df: DataFrame,
    store_path: str,
    queries: dict[str, list[str]],
    candidates: int,
    k_adc: int,
    n_probe: int | None,
    dim: int,
    text_col: str,
    id_col: str,
    version: int | None,
) -> DataFrame:
    """The index-served dense leg shared by :func:`hybrid_index_topk` and
    :func:`maxsim_index_rerank_topk`: driver-side query hash-embeds as
    NEGATIVE-long probes (−1−index in sorted query order, so the typed
    probe ids can never collide with non-negative corpus ids), ADC over
    the persisted codes in probed cells, exact re-rank of the ADC
    top-``k_adc`` — ``(query_id, id_col, rank ≤ candidates)``."""
    from prometheus_parquet_server_spark.pipeline.pq import ivfpq_rerank

    qids = sorted(queries)
    probes = spark.createDataFrame(
        [(-1 - i, _query_hash_vec(queries[qid], dim)) for i, qid in enumerate(qids)],
        "vec_id long, embedding array<double>",
    )
    corpus = _hash_embed_corpus(df, dim, text_col, id_col)
    dense = ivfpq_rerank(
        spark, store_path, probes, corpus, k=candidates, k_adc=k_adc,
        n_probe=n_probe, version=version,
    )
    mapping = spark.createDataFrame(
        [(-1 - i, qid) for i, qid in enumerate(qids)],
        "probe_id long, query_id string",
    )
    return dense.join(F.broadcast(mapping), "probe_id").select(
        "query_id", F.col("neighbor_id").alias(id_col), "rank"
    )


def _maxsim_scores(
    df: DataFrame,
    queries: dict[str, list[str]],
    dim: int,
    window: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The MaxSim scoring chain shared by :func:`maxsim_topk` (full-corpus
    scan) and :func:`maxsim_rerank_topk` (candidate-served): windowed
    hash-embed token vectors on both sides, exact integer dots / maxima /
    sums — ``(query_id, id_col, score_u)``. ONE definition so the scan
    form and the serving form cannot drift in scoring semantics."""
    spark = df.sparkSession

    # query windows, driver-side (tiny): same construction as the doc
    # side — position i's vector sums signed one-hots of tokens
    # i−window … i+window of the ORDERED term list
    import hashlib

    qrows = []
    for qid, terms in sorted(queries.items()):
        toks = [t.lower() for t in terms if t]
        n = len(toks)
        acc: dict[tuple[int, int], int] = {}
        for j, t in enumerate(toks):
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            s = -1 if h[8] in "89abcdef" else 1
            for d in range(-window, window + 1):
                i = j + d
                if 0 <= i < n:
                    acc[(i, b)] = acc.get((i, b), 0) + s
        qrows.extend(
            (qid, i, b, w) for (i, b), w in sorted(acc.items()) if w != 0
        )
    if not qrows:
        raise ValueError("every query embeds to zero at every position")
    qdf = spark.createDataFrame(
        qrows, "query_id string, qpos int, bucket long, qw long"
    )

    # Doc side, reordered for shuffle-byte economy (guide §2.3, r14):
    # hash each TOKEN once — not each of its (2·window+1) window-membership
    # rows, which tripled the md5 work — and drop tokens whose bucket no
    # query window carries BEFORE the window explode: a (doc, wpos, bucket)
    # group with bucket ∉ query buckets can never survive the qdf equi-join
    # below, and its membership for bucket ∈ Q is unchanged by dropping
    # other buckets' tokens, so the post-aggregate frame is IDENTICAL.
    # Both the explode multiplier and the first (biggest) hash aggregate
    # now see only query-bucket tokens. The token array is staged through
    # its own projection so tokenization runs once per row (CollapseProject
    # keeps a non-cheap alias referenced twice staged).
    qbuckets = sorted({b for (_qid, _i, b, _w) in qrows})
    staged = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    tok = staged.select(
        id_col, F.size("_toks").alias("_n"),
        F.posexplode("_toks").alias("pos", "_t"),
    )
    tokb = tok.select(
        id_col,
        "pos",
        "_n",
        (F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long")
         % F.lit(dim)).alias("bucket"),
        F.when(
            F.substring(F.md5("_t"), 9, 1).isin(*"89abcdef"), F.lit(-1)
        ).otherwise(F.lit(1)).alias("_s"),
    ).filter(F.col("bucket").isin(qbuckets))
    offsets = F.sequence(F.lit(-window), F.lit(window))
    wrows = tokb.select(
        id_col,
        "bucket",
        "_s",
        F.explode(
            F.filter(
                F.transform(offsets, lambda d: F.col("pos") + d),
                lambda p: (p >= 0) & (p < F.col("_n")),
            )
        ).alias("wpos"),
    )
    dwin = (
        wrows.groupBy(id_col, "wpos", "bucket")
        .agg(F.sum("_s").alias("w"))
        .filter(F.col("w") != 0)
    )
    dots = (
        dwin.join(F.broadcast(qdf), "bucket")
        .groupBy("query_id", id_col, "wpos", "qpos")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("_dot"))
    )
    contrib = (
        dots.groupBy("query_id", id_col, "qpos")
        .agg(F.greatest(F.lit(0).cast("long"), F.max("_dot")).alias("_c"))
    )
    return (
        contrib.groupBy("query_id", id_col)
        .agg(F.sum("_c").alias("score_u"))
    )


def maxsim_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Late-interaction retrieval — MaxSim [Khattab & Zaharia, SIGIR
    2020 (ColBERT), public knowledge]: instead of one vector per
    document, every TOKEN POSITION gets a representation, and
    ``score(q, d) = Σ_{query positions} max_{doc positions}
    sim(q_i, d_j)`` — the query keeps its token-level structure, so a
    document matching all query aspects at different places outranks one
    repeating a single aspect (the failure mode of bag-of-features
    cosine).

    Token representations here are WINDOWED hash embeddings: position
    j's vector is the signed-count hash-embed of tokens
    ``j−window … j+window`` (clamped at the edges). Single-token one-hot
    vectors would make sim degenerate to same-bucket tests; the window
    gives each position local context while keeping every weight an
    EXACT integer. sim = the raw integer dot product; per-(query
    position) maxima and the final sum are exact integer ops, so the
    output is all-integer and engine-replayable. Convention: token
    pairs sharing no bucket have dot 0, so each query position
    contributes ``greatest(0, max observed dot)`` and documents with no
    bucket overlap at all are not returned (retrieval semantics, the
    hash_cosine_topk rule).

    Scale shape: tokens explode to ``(2·window+1)`` window-membership
    rows — O(tokens) with a constant factor — then ONE hash aggregate
    to per-position sparse weights (text leaves the scan only as md5
    buckets), a bucket-equi join against a BROADCAST of the query
    windows (query side is tiny), and two more bounded aggregates
    (per-pair dot, per-position max). No doc×doc work, no dense
    vectors, salted two-stage top-k. Returns ``(query_id, id_col,
    score_u, rank)``.

    CAVEAT (measured, BASELINE round-11): this form scans EVERY corpus
    token window per query batch — 4.2× wall at 10× docs at 1M. For
    serving at scale use :func:`maxsim_rerank_topk`, the
    candidate-served ColBERT shape (VERDICT r11 Next #2)."""
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if not queries:
        raise ValueError("queries must be non-empty")
    scores = _maxsim_scores(df, queries, dim, window, text_col, id_col)
    order = [F.col("score_u").desc(), F.col(id_col).asc()]
    w_part = W.partitionBy(
        "query_id", F.pmod(F.hash(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = scores.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= k
    )
    w_final = W.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_u", "rank")
    )


def hybrid_rrf3_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    k_const: int = 60,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tri-modal hybrid retrieval: BM25 ⊕ bag-of-features cosine ⊕
    MaxSim late interaction under ONE Reciprocal Rank Fusion — the
    standard production shape when a corpus serves queries with both
    topical (bag) and positional/aspect (late-interaction) structure;
    RRF's rank-only fusion is exactly what makes a third modality a
    drop-in (Cormack et al. 2009 fuses any number of rankings). Each
    side contributes its top ``candidates``; fused scores are exact
    integer sums of the quantized reciprocals, so the composition grades
    bit-exact like its 2-way siblings. Same scale shape as the parts:
    three O(tokens)-bounded scans, candidate-bounded everything after.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    dense = hash_cosine_topk(
        df, queries, k=candidates, dim=dim, text_col=text_col, id_col=id_col
    )
    late = maxsim_topk(
        df, queries, k=candidates, dim=dim, window=window,
        text_col=text_col, id_col=id_col,
    )
    return rrf_fuse(
        [
            lex.select("query_id", id_col, "rank"),
            dense,
            late.select("query_id", id_col, "rank"),
        ],
        k_const=k_const, top_k=k, id_col=id_col,
    )


def maxsim_rerank_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidate_ids: int = 100_000,
) -> DataFrame:
    """Candidate-served MaxSim — the ColBERT SERVING shape [Khattab &
    Zaharia, SIGIR 2020 run late interaction only over a candidate set
    from a cheap first stage]: candidates come from the lexical
    (:func:`bm25_topk`) and dense (:func:`hash_cosine_topk`) legs (top
    ``candidates`` each, per query), and the late-interaction scoring
    touches ONLY those documents. The corpus is pruned BELOW the
    token-window explode with a driver-collected candidate-id ``isin``
    filter — the exact pattern that made the persisted-index re-rank
    flat in corpus size (pipeline/pq.py ivfpq_rerank, EXPLAIN §43):
    the filter reaches the parquet scan (PushedFilters: In), so the
    O(tokens·(2·window+1)) explode that makes :func:`maxsim_topk` a
    scan-shaped operator (measured 4.2× wall at 10× docs, BASELINE
    round-11) runs over ≤ |queries|·2·``candidates`` documents
    regardless of corpus size.

    Re-rank semantics: every candidate PAIR gets a MaxSim score —
    a candidate with no bucket overlap at any position scores exactly
    0 and still ranks (tie-broken by id), unlike the scan form's
    retrieval convention which never surfaces it. Scores are the same
    exact integers as :func:`maxsim_topk` (the literally-shared
    :func:`_maxsim_scores` chain), so the row grades bit-exact against
    a full SQL replay. Returns ``(query_id, id_col, score_u, rank)``,
    rank ≤ ``k`` per query.

    ``max_candidate_ids`` bounds the driver-side id collect and the
    literal In filter (the ivfpq_rerank ADVICE lesson: an unbounded
    probe collect is a driver-memory cliff and a 100k-literal In bloats
    the Catalyst plan) — raise the bound consciously, don't remove it.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the reranked "
            f"top-k draws from the candidate pool"
        )
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if not queries:
        raise ValueError("queries must be non-empty")

    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    dense = hash_cosine_topk(
        df, queries, k=candidates, dim=dim, text_col=text_col, id_col=id_col
    )
    reranked = _maxsim_rerank_scores(
        df, queries, lex, dense, dim, window, text_col, id_col,
        max_candidate_ids,
    )
    return _rank_candidates(reranked, k, id_col)


def _rank_candidates(reranked: DataFrame, k: int, id_col: str) -> DataFrame:
    """The ONE rerank ranking contract (score_u desc, id asc, rank ≤ k)
    shared by the scan-served and index-served serving shapes — a
    tie-break or cap change lands in both or neither. Candidate-bounded
    input (≤ |Q|·2·candidates rows): plain per-query window, no salting
    needed."""
    from pyspark.sql import Window as W

    w_final = W.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), F.col(id_col).asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_u", "rank")
    )


def _maxsim_rerank_scores(
    df: DataFrame,
    queries: dict[str, list[str]],
    lex: DataFrame,
    dense: DataFrame,
    dim: int,
    window: int,
    text_col: str,
    id_col: str,
    max_candidate_ids: int,
) -> DataFrame:
    """The candidate-union → isin-prune → MaxSim-score core shared by
    :func:`maxsim_rerank_topk` and :func:`hybrid_rrf3_rerank_topk`
    (which builds the legs ONCE for both candidate generation and its
    own fusion): ``(query_id, id_col, score_u)`` for every candidate
    pair, no-overlap pairs scoring exactly 0."""
    # pin the candidate pairs ONCE and feed BOTH the id-prune and the
    # final pair join from the pinned frame (the r11 ivfpq_rerank ADVICE
    # pattern) — the legs are deterministic integer contracts, so this is
    # a recompute saving, not a correctness need
    cand = (
        lex.select("query_id", id_col)
        .unionByName(dense.select("query_id", id_col))
        .distinct()
        .localCheckpoint()
    )
    ids = sorted(r[0] for r in cand.select(id_col).distinct().collect())
    if len(ids) > max_candidate_ids:
        raise ValueError(
            f"maxsim_rerank_topk: {len(ids)} candidate ids exceed "
            f"max_candidate_ids={max_candidate_ids} — lower `candidates`/"
            f"query count or raise the bound consciously"
        )
    # prune BELOW the window explode: the In filter pushes to the scan,
    # so tokenization/explode/hashing only ever see candidate documents
    pruned = df.filter(F.col(id_col).isin(ids))
    late = _maxsim_scores(pruned, queries, dim, window, text_col, id_col)
    return cand.join(late, ["query_id", id_col], "left").select(
        "query_id",
        id_col,
        F.coalesce(F.col("score_u"), F.lit(0).cast("long")).alias("score_u"),
    )


def hybrid_rrf3_rerank_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    k_const: int = 60,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidate_ids: int = 100_000,
) -> DataFrame:
    """Tri-modal RRF with the late leg CANDIDATE-SERVED: the serving twin
    of :func:`hybrid_rrf3_topk`. BM25 and hash-cosine rank as before
    (O(tokens)-bounded scans); the MaxSim leg re-scores only the
    lexical∪dense candidate union (:func:`maxsim_rerank_topk`'s pruned
    chain) instead of scanning every corpus token window, and the three
    rankings fuse under the same exact-integer RRF. At 100 TB this is
    the only affordable tri-modal shape — the late leg's cost is bounded
    by the candidate count, not the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the fused "
            f"top-k draws from each side's candidate pool"
        )
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if not queries:
        raise ValueError("queries must be non-empty")
    # pin BOTH legs once: _maxsim_rerank_scores materializes the
    # candidate union from them AND rrf_fuse consumes their rankings —
    # without the checkpoint the full-corpus bm25/cosine scans run TWICE
    # (review finding, round 12)
    lex = bm25_topk(
        df, queries, k=candidates, text_col=text_col, id_col=id_col
    ).localCheckpoint()
    dense = hash_cosine_topk(
        df, queries, k=candidates, dim=dim, text_col=text_col, id_col=id_col
    ).localCheckpoint()
    from pyspark.sql import Window as W

    reranked = _maxsim_rerank_scores(
        df, queries, lex, dense, dim, window, text_col, id_col,
        max_candidate_ids,
    )
    w_late = W.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), F.col(id_col).asc()
    )
    late = (
        reranked.withColumn("rank", F.row_number().over(w_late))
        .filter(F.col("rank") <= candidates)
    )
    return rrf_fuse(
        [
            lex.select("query_id", id_col, "rank"),
            dense,
            late.select("query_id", id_col, "rank"),
        ],
        k_const=k_const, top_k=k, id_col=id_col,
    )


def maxsim_index_rerank_topk(
    spark,
    df: DataFrame,
    store_path: str,
    queries: dict[str, list[str]],
    k: int = 10,
    candidates: int = 20,
    k_adc: int = 30,
    n_probe: int | None = None,
    dim: int = 64,
    window: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: int | None = None,
    max_candidate_ids: int = 100_000,
) -> DataFrame:
    """The full ColBERT serving STACK at corpus scale: candidates from
    BM25 (term-filtered explode — never more than query-term hits) and
    the PERSISTED IVF-PQ index (ADC on probed-cell codes + exact re-rank,
    the :func:`hybrid_index_topk` dense leg), late-interaction MaxSim
    re-scoring ONLY those candidates through the shared pruned chain.
    Unlike :func:`maxsim_rerank_topk` (whose hash-cosine candidate leg
    still scans O(corpus tokens) per batch), EVERY stage here is either
    term-filtered, index-served, or candidate-bounded — the measured
    near-flat shape (scripts/stress_hybrid.py, BASELINE round-12).
    Returns ``(query_id, id_col, score_u, rank)``, all-integer scores."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}) — the reranked "
            f"top-k draws from the candidate pool"
        )
    if k_adc < candidates:
        raise ValueError(
            f"k_adc ({k_adc}) must be >= candidates ({candidates}) — the "
            f"exact re-rank can only return what the ADC stage surfaced"
        )
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    if not queries:
        raise ValueError("queries must be non-empty")

    lex = bm25_topk(df, queries, k=candidates, text_col=text_col, id_col=id_col)
    dense = _index_dense_ranks(
        spark, df, store_path, queries, candidates, k_adc, n_probe,
        dim, text_col, id_col, version,
    )
    reranked = _maxsim_rerank_scores(
        df, queries, lex, dense, dim, window, text_col, id_col,
        max_candidate_ids,
    )
    return _rank_candidates(reranked, k, id_col)


def hybrid_index_append(
    spark,
    store_path: str,
    new_docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    txn: tuple[str, int] | None = None,
) -> int:
    """Fold NEW documents into the persisted hybrid index — the growing-
    corpus half of :func:`hybrid_index_build`: the batch hash-embeds
    through the SHARED ``_hash_embed_corpus`` construction and appends
    via :func:`pipeline.pq.ivfpq_append` (encode against the frozen
    version-pinned quantizers — rotated through the pinned R if the
    index is OPQ — O(new) commit, CAS-pinned against racing rebuilds,
    ``txn`` idempotence). A crawl's hybrid index stays fresh without
    re-embedding history; quantizer drift until the next rebuild is the
    standard Faiss ``add`` trade. Returns the new version."""
    from prometheus_parquet_server_spark.pipeline.pq import ivfpq_append
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
    )

    # geometry guard, the index family's loud driver-side convention: a
    # mismatched dim would otherwise surface only as an executor-side
    # numpy shape error inside the encode kernel
    pinned_dim = int(snapshot_properties(spark, store_path)["pq_dim"])
    if pinned_dim != dim:
        raise ValueError(
            f"hybrid_index_append: dim={dim} does not match the index's "
            f"pinned pq_dim={pinned_dim} at {store_path}"
        )
    corpus = _hash_embed_corpus(
        new_docs, dim, text_col, id_col
    ).localCheckpoint()
    _guard_nonnegative_ids(corpus, "hybrid_index_append")
    return ivfpq_append(spark, store_path, corpus, txn=txn)


def stream_hybrid_index_ingest(
    doc_stream: DataFrame,
    spark,
    store_path: str,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "stream_hybrid_index_ingest",
):
    """Streaming twin of :func:`hybrid_index_append` (the
    stream_ivfpq_ingest pattern): each micro-batch of documents
    hash-embeds and appends with ``txn=(app_id, batch_id)`` so a
    committed-but-unacknowledged batch replays as a version-preserving
    no-op; :func:`hybrid_index_topk` serves the growing index at every
    commit. Requires an existing index; one writer per checkpoint; new
    app_id on checkpoint reset (the stream_ivf_ingest caveat)."""

    from prometheus_parquet_server_spark.streaming.ingest import (
        stream_txn_append,
    )

    def _append(batch_df: DataFrame, txn: tuple[str, int]) -> None:
        hybrid_index_append(
            spark, store_path, batch_df, dim=dim, text_col=text_col,
            id_col=id_col, txn=txn,
        )

    return stream_txn_append(
        doc_stream, f"{store_path}/_stream_checkpoint_docs", app_id, _append
    )
