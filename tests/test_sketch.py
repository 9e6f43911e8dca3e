"""Measured error gates for the sketch aggregates (the ANN-recall-gate
pattern: sketches can't hash-match another engine, so the gate is a
bound on |approx − exact| against the exact computation at test scale)."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline import (
    approx_length_quantiles,
    approx_vocab_size,
    heavy_hitter_grams,
)
from prometheus_parquet_server_spark.pipeline.text import tokens_col

SF = "/root/testdata/sf0.01"


def test_approx_vocab_within_hll_bound(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    approx = {
        r["source"]: (r["approx_docs"], r["approx_vocab"])
        for r in approx_vocab_size(docs, rsd=0.05).collect()
    }
    exact = {
        r["source"]: (r["nd"], r["nv"])
        for r in (
            docs.select(
                "source", "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
            )
            .groupBy("source")
            .agg(
                F.countDistinct("doc_id").alias("nd"),
                F.countDistinct("tok").alias("nv"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact) and len(exact) >= 2
    for src, (nd, nv) in exact.items():
        ad, av = approx[src]
        # HLL++ rsd=5%: 4 sigma ≈ 20% relative — a loose, stable gate
        assert abs(ad - nd) <= max(2, 0.2 * nd), (src, ad, nd)
        assert abs(av - nv) <= max(2, 0.2 * nv), (src, av, nv)


def test_approx_quantiles_within_rank_bound(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["source"]: (r["n_docs"], r["q50_n_chars"], r["q90_n_chars"], r["q99_n_chars"])
        for r in approx_length_quantiles(docs, accuracy=10000).collect()
    }
    for src, (n, q50, q90, q99) in got.items():
        vals = sorted(
            r["n_chars"]
            for r in docs.filter(F.col("source") == src).select("n_chars").collect()
        )
        # GK guarantee: the estimate is an ACTUAL element whose rank is
        # within n/accuracy of the target rank
        for p, q in ((0.5, q50), (0.9, q90), (0.99, q99)):
            import bisect

            lo = bisect.bisect_left(vals, q)
            hi = bisect.bisect_right(vals, q) - 1
            target = p * (n - 1)
            tol = max(1.0, n / 10000)
            assert lo - tol <= target <= hi + tol, (src, p, q, lo, hi, target)
        assert q50 <= q90 <= q99


def test_sketch_validation_errors(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    with pytest.raises(ValueError):
        approx_vocab_size(docs, rsd=0.0)
    with pytest.raises(ValueError):
        approx_length_quantiles(docs, accuracy=0)
    with pytest.raises(ValueError):
        approx_length_quantiles(docs, probabilities=(1.5,))


def _exact_hh(spark, df, n, frac):
    from prometheus_parquet_server_spark.pipeline.sketch import _gram_array

    grams = df.select(F.explode(_gram_array("text", n)).alias("gram"))
    total = grams.count()
    return {
        (r["gram"], r["n_occ"])
        for r in grams.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= F.lit(float(total) * frac))
        .collect()
    }


def test_heavy_hitters_exact_vs_unbounded_groupby(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["gram"], r["n_occ"])
        for r in heavy_hitter_grams(docs, n=2, threshold_frac=0.001).collect()
    }
    want = _exact_hh(spark, docs, 2, 0.001)
    assert got == want and len(want) > 100


def test_heavy_hitters_tight_capacity_still_exact(spark):
    # a skewed stream with capacity at the theoretical floor (1/f + 1):
    # the MG merge guarantee, not slack, must carry recall. 20 heavy
    # words at ~4% each (well above f=2%), 400 distinct light words,
    # shuffled deterministically across 8 partitions.
    import random

    rng = random.Random(7)
    words = [f"hot{i}" for i in range(20)] * 40 + [f"cold{i}" for i in range(400)]
    rng.shuffle(words)
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::16])) for i in range(16)],
        "doc_id long, text string",
    ).repartition(8)
    frac = 0.02
    floor_cap = int(1.0 / frac) + 1
    got = {
        (r["gram"], r["n_occ"])
        for r in heavy_hitter_grams(
            docs, n=1, threshold_frac=frac, capacity=floor_cap
        ).collect()
    }
    want = _exact_hh(spark, docs, 1, frac)
    assert got == want and len(want) == 20
    # capacity BELOW the floor can lose true heavy hitters — reject it
    with pytest.raises(ValueError):
        heavy_hitter_grams(docs, threshold_frac=frac, capacity=floor_cap - 1)
    with pytest.raises(ValueError):
        heavy_hitter_grams(docs, threshold_frac=0.0)
    with pytest.raises(ValueError):
        heavy_hitter_grams(docs, n=0)


def test_heavy_hitters_empty_and_null_text(spark):
    empty = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = heavy_hitter_grams(empty, n=2, threshold_frac=0.1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["gram", "n_occ"]


def test_ngrams_col_null_contract_every_n(spark):
    # the documented contract: fewer than n tokens -> EMPTY array, never
    # NULL — including NULL text at n=1 (the n>=2 arm converts through
    # its when(); the n=1 arm must coalesce)
    from prometheus_parquet_server_spark.pipeline.text import ngrams_col, tokens_col

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one"), (4, "a b c")], "i long, text string"
    )
    for n in (1, 2, 3):
        rows = df.select(
            "i", ngrams_col(tokens_col(F.col("text")), n).alias("g")
        ).collect()
        by_i = {r["i"]: r["g"] for r in rows}
        assert all(g is not None for g in by_i.values()), (n, by_i)
        assert by_i[1] == [] and by_i[2] == []
        assert by_i[4] == (
            ["a", "b", "c"] if n == 1 else ["a b", "b c"] if n == 2 else ["a b c"]
        )
    with pytest.raises(ValueError):
        ngrams_col(tokens_col(F.col("text")), 0)
