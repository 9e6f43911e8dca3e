"""Guard: the LSH dedup / ANN plans must stay compilable by Janino.

Round 3 shipped a flat-SQL unit-vector expression (~8k nodes) whose
generated method blew the JVM 64 KB limit; Spark silently fell back to
interpreted evaluation and `dedup_embedding` regressed 13.9 s -> 142.9 s.
With ``spark.sql.codegen.fallback=false`` that silent fallback becomes a
hard error, so any future expression blowup fails HERE instead of only
showing up as a 10x bench regression.
"""

import math

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.similarity import (
    embedding_lsh_pairs,
    lsh_bucketed_topk,
)

DIM = 64


def _emb_frame(spark, n=48):
    rows = [
        (i, [math.sin(i * 0.37 + j * 0.11) for j in range(DIM)]) for i in range(n)
    ]
    # a couple of exact duplicates so the verify stage has >= 1 surviving pair
    rows.append((1000, rows[3][1]))
    rows.append((1001, rows[7][1]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


@pytest.fixture()
def strict_codegen(spark):
    old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", old)


def test_lsh_pairs_compile_under_strict_codegen(strict_codegen):
    spark = strict_codegen
    emb = _emb_frame(spark)
    rows = embedding_lsh_pairs(emb, threshold=0.35, dim=DIM).collect()
    by_pair = {(r.id_a, r.id_b): r.cosine for r in rows}
    # the planted exact duplicates must be found AND verify at cosine 1.0 —
    # an independent check on the normalize+dot math, not just the filter
    assert by_pair.get((3, 1000)) == 1.0
    assert by_pair.get((7, 1001)) == 1.0


def test_ann_bucketed_compile_under_strict_codegen(strict_codegen):
    spark = strict_codegen
    emb = _emb_frame(spark)
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    rows = lsh_bucketed_topk(emb, probes, k=5, num_planes=4, dim=DIM).collect()
    assert len(rows) > 0
    assert all(r.rank <= 5 for r in rows)
