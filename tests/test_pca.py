"""Distributed PCA: exact parity with a single-machine numpy PCA over the
same rows, variance ordering, sign reproducibility, dirty-row handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.pca import (
    embedding_pca,
    pca_components,
    pca_project,
)

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _numpy_reference(rows, k):
    x = np.stack(rows)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, evals[order]


def test_components_match_numpy(spark, emb):
    rows = [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    mu_ref, comps_ref, ev_ref = _numpy_reference(rows, k=4)
    mu, comps, ev = pca_components(emb, k=4, dim=DIM)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ev, ev_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(comps, comps_ref, rtol=1e-6, atol=1e-8)


def test_explained_variance_descending(emb):
    _, _, ev = pca_components(emb, k=6, dim=DIM)
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert (ev > 0).all()


def test_projection_matches_numpy(spark, emb):
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    mu, comps, _ = pca_components(emb, k=3, dim=DIM)
    got = {r["vec_id"]: r["pca"] for r in embedding_pca(emb, k=3).collect()}
    assert set(got) == set(rows)
    for vid, vec in rows.items():
        np.testing.assert_allclose(
            got[vid], (vec - mu) @ comps.T, rtol=1e-9, atol=1e-11
        )


def test_partitioning_invariance(emb):
    """Sufficient-statistic aggregation must not depend on partitioning."""
    mu1, c1, e1 = pca_components(emb.repartition(16), k=2, dim=DIM)
    mu2, c2, e2 = pca_components(emb.coalesce(1), k=2, dim=DIM)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(e1, e2, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(c1, c2, rtol=1e-6, atol=1e-9)


def test_null_and_wrong_length_rows(spark):
    good = [(i, [float(i + j) for j in range(DIM)]) for i in range(8)]
    df = spark.createDataFrame(
        good + [(100, None), (101, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["pca"] for r in embedding_pca(df, k=2, dim=DIM).collect()}
    assert out[100] is None and out[101] is None
    assert all(out[i] is not None for i in range(8))


def test_bad_k(emb):
    with pytest.raises(ValueError):
        pca_components(emb, k=0, dim=DIM)
    with pytest.raises(ValueError):
        pca_components(emb, k=DIM + 1, dim=DIM)
