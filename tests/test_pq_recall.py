"""PQ-family quality gate: measured recall@10 vs exact brute force
(VERDICT r9 Next #3 — the one ANN family that had exactness/parity tests
but no retrieval-quality measurement; ADC is an approximation and needs a
floor like tests/test_ann_recall.py's IVF/LSH/int8 gates).

Truth is the exact squared-L2 top-10 (ties → neighbor id asc, self
excluded) — the PQ family ranks by L2, so cosine truth would conflate
metric mismatch with quantization loss. All quantizer training here is
deterministic (pq_train's ordered init + decimal-exact Lloyd), so the
measured numbers reproduce exactly on a given corpus; floors sit under
the measurement only to absorb testdata regeneration across rounds.

Measured on the sf0.01 embeddings (500 vectors, dim 64 — recorded in
EXPLAIN.md §37):

  pq    m=8 k=16 iter=0 (graded)   0.204
  pq    m=8 k=16 iter=2            0.276
  pq    m∈{4,8,16} k=16 iter=2     0.188 / 0.276 / 0.404  (monotone in m)
  pq    m=8 k=64 iter=2            0.394
  opq   m=8 k=16 iter=2 (graded)   0.284  (vs plain PQ 0.276)
  opq   m=8 k=64 iter=2            0.404  (vs plain PQ 0.394)
  ivfpq graded (iter=0, probe=2)   0.054  (oracle-replayable degenerate init)
  ivfpq trained probe=2/4/8        0.218 / 0.240 / 0.244  (monotone in probe)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.pq import (
    ivfpq_topk,
    opq_topk,
    opq_train,
    pq_topk,
    pq_train,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


@pytest.fixture(scope="module")
def probes(emb):
    # the pq family takes probes in corpus schema (id_col, vec_col)
    return emb.orderBy("vec_id").limit(50).cache()


@pytest.fixture(scope="module")
def truth_l2(emb, probes):
    """Exact squared-L2 top-10 per probe — the metric pq_topk approximates."""
    p = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    d2 = (
        "aggregate(zip_with(probe_vec, embedding,"
        " (x,y)->(cast(x as double)-cast(y as double))"
        "*(cast(x as double)-cast(y as double))),"
        " cast(0 as double), (a,v)->a+v)"
    )
    scored = emb.join(F.broadcast(p), F.col("probe_id") != F.col("vec_id")).select(
        "probe_id", F.col("vec_id").alias("neighbor_id"), F.expr(d2).alias("_d2")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_d2").asc(), F.col("neighbor_id").asc()
    )
    return {
        (r["probe_id"], r["neighbor_id"])
        for r in scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 10)
        .collect()
    }


def _recall(df, truth):
    got = {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}
    return len(got & truth) / len(truth)


def test_pq_recall_graded_and_trained(emb, probes, truth_l2):
    """The graded iterations=0 geometry must clear a floor, and Lloyd
    training must IMPROVE recall (that's what the iterations buy)."""
    cb0 = pq_train(emb, m=8, k=16, iterations=0, dim=64)
    r0 = _recall(pq_topk(emb, probes, cb0, k=10), truth_l2)
    cb2 = pq_train(emb, m=8, k=16, iterations=2, dim=64)
    r2 = _recall(pq_topk(emb, probes, cb2, k=10), truth_l2)
    assert r0 >= 0.15, f"pq graded (iter=0) recall@10 = {r0:.3f}"
    assert r2 >= 0.22, f"pq trained (iter=2) recall@10 = {r2:.3f}"
    assert r2 > r0, "Lloyd rounds must improve recall over the ordered init"


def test_pq_recall_monotone_in_m(emb, probes, truth_l2):
    """More subspaces = finer quantization = better recall — the code-size
    vs quality lever the 100 TB design dials (m bytes per vector at rest).
    Measured 0.188 / 0.276 / 0.404 at m = 4 / 8 / 16."""
    rs = {}
    for m in (4, 8, 16):
        cb = pq_train(emb, m=m, k=16, iterations=2, dim=64)
        rs[m] = _recall(pq_topk(emb, probes, cb, k=10), truth_l2)
    assert rs[16] > rs[8] > rs[4], f"recall not monotone in m: {rs}"


def test_ivfpq_recall_trained_and_probe_monotone(emb, probes, truth_l2):
    """The graded ivfpq row runs the oracle-replayable degenerate
    quantizers (iterations=0 — recall 0.054, determinism not quality);
    the QUALITY claim lives at trained settings: trained recall must
    clear a floor, beat the degenerate setting decisively, and not lose
    neighbors as n_probe grows."""
    r_graded = _recall(
        ivfpq_topk(emb, probes, k=10, n_cells=8, n_probe=2, m=8, k_codes=8,
                   coarse_iterations=0, pq_iterations=0, dim=64),
        truth_l2,
    )
    rs = {}
    for n_probe in (2, 8):
        rs[n_probe] = _recall(
            ivfpq_topk(emb, probes, k=10, n_cells=8, n_probe=n_probe, m=8,
                       k_codes=8, coarse_iterations=2, pq_iterations=2, dim=64),
            truth_l2,
        )
    assert rs[2] >= 0.17, f"ivfpq trained probe=2 recall@10 = {rs[2]:.3f}"
    assert rs[2] >= 2 * r_graded, (
        f"training must decisively beat the degenerate init: "
        f"trained {rs[2]:.3f} vs graded {r_graded:.3f}"
    )
    assert rs[8] >= rs[2], "probing more cells must not lose neighbors"


def test_opq_recall_not_below_pq(emb, probes, truth_l2):
    """OPQ's claim (Ge et al. 2013): the learned rotation aligns subspaces
    with the data's correlation structure, so recall must not fall below
    plain PQ at the same (m, k) budget. On this corpus the gain is small
    but consistent (+0.008 at k=16, +0.010 at k=64 — the synthetic
    embeddings are only mildly correlated across the fixed subspace
    split); the reconstruction-error reduction is pinned separately in
    test_pq.py."""
    cb = pq_train(emb, m=8, k=16, iterations=2, dim=64)
    r_pq = _recall(pq_topk(emb, probes, cb, k=10), truth_l2)
    R, cbo = opq_train(emb, m=8, k=16, iterations=2, pq_iterations=1, dim=64)
    r_opq = _recall(opq_topk(emb, probes, R, cbo, k=10), truth_l2)
    assert r_opq >= r_pq, f"opq {r_opq:.3f} must not lose to pq {r_pq:.3f}"
    assert r_opq >= 0.22, f"opq recall@10 = {r_opq:.3f}"


def test_ivfpq_exact_rerank_lifts_recall(spark, emb, probes, truth_l2, tmp_path):
    """The IVFADC+R refinement (pq.py ivfpq_rerank): exact re-ranking of
    the ADC top-k_adc against the raw vectors must lift recall well
    above ADC-only (measured 0.218 → 0.392/0.460/0.520 at k_adc =
    30/50/100, trained quantizers, probe 2 of 8 cells — the residual
    gap to 1.0 is cell routing, which n_probe buys) and be monotone in
    the candidate budget."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_rerank,
        ivfpq_search,
    )

    store = f"file://{tmp_path}/rerank_idx"
    ivfpq_build(spark, store, emb, n_cells=8, n_probe_default=2, m=8,
                k_codes=8, coarse_iterations=2, pq_iterations=2, dim=64)
    r_adc = _recall(
        ivfpq_search(spark, store, probes, k=10, n_probe=2), truth_l2
    )
    r30 = _recall(
        ivfpq_rerank(spark, store, probes, emb, k=10, k_adc=30, n_probe=2),
        truth_l2,
    )
    r100 = _recall(
        ivfpq_rerank(spark, store, probes, emb, k=10, k_adc=100, n_probe=2),
        truth_l2,
    )
    assert r30 >= r_adc + 0.10, f"rerank {r30:.3f} must lift ADC {r_adc:.3f}"
    assert r100 >= r30, "a bigger candidate budget must not lose neighbors"
    assert r100 >= 0.45, f"rerank k_adc=100 recall@10 = {r100:.3f}"


def test_ivfpq_production_geometry_k256_recall(spark, tmp_path):
    """The PRODUCTION code-width (k_codes=256, one byte per code — the
    geometry EXPLAIN §37 flagged as untrainable on the 500-vector
    fixture): trained on a clustered synthetic corpus that CAN train it
    (4k vectors, 256 codewords per subspace), stored with
    code_type='binary', searched through the persisted index. On a
    clustered corpus exact top-10 membership among ~125 near-equidistant
    cluster members is partly tie noise, so the gate pins what code
    width actually controls: recall must be MONOTONE in k_codes
    (measured 0.080 → 0.340 for k=16 → k=256 on this deterministic
    corpus) and the production geometry must clear an absolute floor of
    0.3 — 4× the k=16 number. (The tie-aware planted-twin metric at 1M
    vectors reaches 1.0 at this geometry: scripts/stress_ivfpq.py,
    BASELINE.md round-11 table.)"""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_search,
    )

    dim, n, n_clusters = 64, 4000, 32
    cid = F.pmod(F.col("id"), F.lit(n_clusters))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(cid, i), F.lit(2000)) - 1000)
        / F.lit(1000.0)
        + (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 1000)
        / F.lit(20000.0),
    )
    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), comp.alias("embedding"))
        .cache()
    )
    probes = corpus.filter(F.col("vec_id") < 5).cache()

    def build_and_search(k_codes, code_type):
        store = f"file://{tmp_path}/prod_idx_{k_codes}"
        ivfpq_build(
            spark, store, corpus, n_cells=8, n_probe_default=4, m=8,
            k_codes=k_codes, coarse_iterations=1, pq_iterations=1, dim=dim,
            code_type=code_type,
        )
        return ivfpq_search(spark, store, probes, k=10, n_probe=4)

    got_k16 = build_and_search(16, "int")
    got_k256 = build_and_search(256, "binary")

    p = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    d2 = (
        "aggregate(zip_with(probe_vec, embedding,"
        " (x,y)->(x-y)*(x-y)), cast(0 as double), (a,v)->a+v)"
    )
    scored = corpus.join(
        F.broadcast(p), F.col("probe_id") != F.col("vec_id")
    ).select(
        "probe_id", F.col("vec_id").alias("neighbor_id"), F.expr(d2).alias("_d2")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_d2").asc(), F.col("neighbor_id").asc()
    )
    truth = {
        (r["probe_id"], r["neighbor_id"])
        for r in scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 10)
        .collect()
    }
    r16, r256 = _recall(got_k16, truth), _recall(got_k256, truth)
    assert r256 > r16, (r16, r256)
    assert r256 >= 0.3, r256
