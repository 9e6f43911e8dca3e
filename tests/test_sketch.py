"""Measured error gates for the sketch aggregates (the ANN-recall-gate
pattern: sketches can't hash-match another engine, so the gate is a
bound on |approx − exact| against the exact computation at test scale)."""

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline import (
    approx_length_quantiles,
    approx_vocab_size,
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
