"""Corpus statistics: tf/df correctness, top-k tie-break, exact percentiles."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.stats import (
    corpus_stats,
    token_stats,
    vocab_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a", "s1", 5),
            (2, "b c", "s1", 3),
            (3, "a", "s2", 1),
            (4, "", "s2", 0),
        ],
        "doc_id long, text string, source string, n_chars long",
    )


def test_token_stats_tf_df(docs):
    got = {r["token"]: (r["tf"], r["df"]) for r in token_stats(docs).collect()}
    assert got == {"a": (3, 2), "b": (2, 2), "c": (1, 1)}


def test_vocab_topk_rank_and_tiebreak(docs):
    rows = vocab_topk(docs, k=2).collect()
    assert [(r["rank"], r["token"], r["tf"]) for r in rows] == [
        (1, "a", 3),
        (2, "b", 2),
    ]


def test_vocab_topk_tie_lexicographic(spark):
    df = spark.createDataFrame([(1, "z y z y")], "doc_id long, text string")
    rows = vocab_topk(df, k=1).collect()
    assert rows[0]["token"] == "y"  # tf tie (2 == 2) → lexicographically first


def test_corpus_stats_exact_percentiles(docs):
    got = {r["source"]: r for r in corpus_stats(docs).collect()}
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["mean_chars"] == 4.0
    assert got["s1"]["p50_chars"] == 4.0  # interpolated midpoint of (3, 5)
    assert got["s1"]["p90_chars"] == 4.8  # 3 + 0.9*(5-3)
    assert got["s2"]["max_chars"] == 1


def test_tfidf_topk_golden(spark):
    import math

    from prometheus_parquet_server_spark.pipeline.stats import tfidf_topk

    df = spark.createDataFrame(
        [(1, "rare rare common"), (2, "common other"), (3, "common")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["rank"]): (r["token"], r["score"])
            for r in tfidf_topk(df, k=2).collect()}
    # N=3; 'rare' df=1 → idf = ln(4/2)+1; tf=2 in doc 1 beats 'common'
    assert rows[(1, 1)][0] == "rare"
    assert rows[(1, 1)][1] == round(2 * (math.log(4 / 2) + 1), 6)
    # 'common' appears in every doc → idf = ln(4/4)+1 = 1 → score = tf
    assert rows[(3, 1)] == ("common", 1.0)
    # doc 2: 'other' (df=1) outscores 'common' (df=3)
    assert rows[(2, 1)][0] == "other"


def test_perplexity_scores_golden(spark):
    import math

    from prometheus_parquet_server_spark.pipeline.lm_score import (
        ALPHABET_SIZE,
        bigram_model,
        perplexity_scores,
    )

    df = spark.createDataFrame(
        [(1, "ababab"), (2, "ab"), (3, "x")],  # doc 3: too short, excluded
        "doc_id long, text string",
    )
    model = {r["bigram"]: r["count"] for r in bigram_model(df).collect()}
    # "ababab" → ab,ba,ab,ba,ab ; "ab" → ab  ⇒ ab:4, ba:2
    assert model == {"ab": 4, "ba": 2}
    got = {r["doc_id"]: r for r in perplexity_scores(df).collect()}
    assert set(got) == {1, 2}
    v = ALPHABET_SIZE * ALPHABET_SIZE
    p_ab = (4 + 1) / (6 + v)
    p_ba = (2 + 1) / (6 + v)
    want1 = round(-(3 * math.log(p_ab) + 2 * math.log(p_ba)) / 5, 6)
    assert got[1]["n_bigrams"] == 5 and abs(got[1]["avg_neg_logp"] - want1) < 1e-9
    # the rarer-bigram doc scores HIGHER entropy than the common-bigram doc
    assert got[2]["avg_neg_logp"] == round(-math.log(p_ab), 6)
    # gibberish (unseen bigrams) scores higher than in-distribution text
    probe = spark.createDataFrame(
        [(10, "ababab"), (11, "zq zq zq")], "doc_id long, text string"
    )
    scored = {r["doc_id"]: r["avg_neg_logp"]
              for r in perplexity_scores(probe, model=bigram_model(df)).collect()}
    assert scored[11] > scored[10]


def test_curriculum_stages_banding(spark):
    from prometheus_parquet_server_spark.pipeline.lm_score import curriculum_stages

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "doc_id long, avg_neg_logp double"
    )
    got = {r["doc_id"]: r["stage"] for r in curriculum_stages(df, 4).collect()}
    # exact quartile cutpoints of 1..8 are 2.75/4.5/6.25 → 2-2-2-2 split
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}
    desc = {r["doc_id"]: r["stage"]
            for r in curriculum_stages(df, 4, ascending=False).collect()}
    assert desc == {8: 1, 7: 1, 6: 2, 5: 2, 4: 3, 3: 3, 2: 4, 1: 4}
    one = curriculum_stages(df, 1).collect()
    assert all(r["stage"] == 1 for r in one)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curriculum_stages(df, 0)


def test_curriculum_approx_bands_nearly_identically(spark):
    """The percentile_approx escape hatch (the 100 TB path — bounded
    memory, mergeable sketch) must band >=99% of rows identically to the
    exact oracle-pinned default at sf0.01 scale (VERDICT r5 #4)."""
    from prometheus_parquet_server_spark.pipeline.lm_score import (
        curriculum_stages,
        perplexity_scores,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    scores = perplexity_scores(docs).select("doc_id", "avg_neg_logp")
    exact = curriculum_stages(scores, 4).select("doc_id", "stage")
    approx = curriculum_stages(scores, 4, exact=False).select(
        "doc_id", F.col("stage").alias("stage_a")
    )
    joined = exact.join(approx, "doc_id")
    total = joined.count()
    same = joined.filter(F.col("stage") == F.col("stage_a")).count()
    assert total > 0
    assert same / total >= 0.99, f"only {same}/{total} rows band identically"


def test_bm25_topk_golden(spark):
    """Hand-computed BM25 on a 3-doc corpus: idf ordering, length
    normalization, tie-break, missing-term and NULL-text handling."""
    import math

    from prometheus_parquet_server_spark.pipeline.stats import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common other longer doc with many extra tokens here"),
            (3, "common"),
            (4, None),  # NULL text: 0 tokens, counted in N/avgdl, never matches
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(
        df, {"q": ["rare", "common", "ghost"]}, k=10, salt_buckets=4
    ).collect()
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in rows}
    # NULL-text doc matches nothing
    assert set(got) == {1, 2, 3}

    # independent reference computation (floats, then the unit contract)
    N, avgdl = 4, (3 + 9 + 1 + 0) / 4.0
    k1, b = 1.2, 0.75

    def idf(dfreq):
        return math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))

    def contrib(dfreq, tf, dl):
        u = idf(dfreq) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return math.floor(u * 1e6 + 0.5)

    exp = {
        1: (contrib(1, 1, 3) + contrib(3, 2, 3)) / 1e6,  # rare + common
        2: contrib(3, 1, 9) / 1e6,
        3: contrib(3, 1, 1) / 1e6,
    }
    for d in exp:
        assert got[d][1] == exp[d], (d, got[d], exp[d])
    # doc 1 carries the rare term -> top; doc 3 (short) beats doc 2 (long)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert order == [1, 3, 2]


def test_bm25_topk_tiebreak_and_k(spark):
    from prometheus_parquet_server_spark.pipeline.stats import bm25_topk

    df = spark.createDataFrame(
        [(i, "same text") for i in range(5)], "doc_id long, text string"
    )
    rows = bm25_topk(df, {"q": ["same"]}, k=3, salt_buckets=2).collect()
    # identical scores -> doc_id asc tie-break, k rows exactly
    assert [(r["doc_id"], r["rank"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [(0, 1), (1, 2), (2, 3)]


def test_bm25_topk_validates(spark):
    from prometheus_parquet_server_spark.pipeline.stats import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, {}, k=1)
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": ["a"]}, k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": []})
