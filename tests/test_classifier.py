"""Quality classifier: numpy parity of the exact update rule, planted
signal separation, partition-count invariance, dirty-row handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.classifier import (
    rule_label,
    score_quality,
    train_quality_classifier,
)

DIM = 8


def _numpy_train(X, y, iters, lr, l2):
    """Single-machine replay of the identical update rule."""
    def sig(z):
        out = np.empty_like(z)
        pos = z >= 0
        out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
        ez = np.exp(z[~pos])
        out[~pos] = ez / (1.0 + ez)
        return out

    w = np.zeros(DIM + 1)
    for _ in range(iters):
        p = sig(X @ w[:DIM] + w[DIM])
        r = p - y
        g = np.concatenate((X.T @ r, [r.sum()])) / len(y)
        reg = np.concatenate((w[:DIM], [0.0]))
        w = w - lr * (g + l2 * reg)
    return w


def _planted(n=400, seed=7):
    """Labels depend on feature 0 with margin — linearly separable-ish."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n, DIM)
    y = (X[:, 0] + 0.3 * rng.randn(n) > 0).astype(float)
    return X, y


@pytest.fixture(scope="module")
def planted_df(spark):
    X, y = _planted()
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(len(y))]
    return spark.createDataFrame(
        rows, "id long, features array<double>, label double"
    )


def test_numpy_parity(spark, planted_df):
    X, y = _planted()
    w_np = _numpy_train(X, y, iters=10, lr=1.0, l2=1e-3)
    w_sp, hist = train_quality_classifier(
        planted_df, dim=DIM, iters=10, lr=1.0, l2=1e-3
    )
    # identical update rule; only float partial-sum order differs
    assert np.allclose(w_sp, w_np, atol=1e-9)
    assert len(hist) == 10
    assert hist[-1] < hist[0]  # loss decreases


def test_planted_signal_separates(spark, planted_df):
    w, _ = train_quality_classifier(planted_df, dim=DIM, iters=60, lr=2.0)
    scored = score_quality(planted_df, w).select("label", "quality_score").collect()
    pos = [r["quality_score"] for r in scored if r["label"] == 1.0]
    neg = [r["quality_score"] for r in scored if r["label"] == 0.0]
    # strong separation on the planted margin feature
    assert np.mean(pos) > 0.8 and np.mean(neg) < 0.2
    acc = (sum(s > 0.5 for s in pos) + sum(s <= 0.5 for s in neg)) / len(scored)
    assert acc > 0.9


def test_partition_count_invariance(spark, planted_df):
    w1, _ = train_quality_classifier(
        planted_df.repartition(1), dim=DIM, iters=8, lr=1.0
    )
    w32, _ = train_quality_classifier(
        planted_df.repartition(32), dim=DIM, iters=8, lr=1.0
    )
    assert np.allclose(w1, w32, atol=1e-9)


def test_dirty_rows_excluded_and_score_null(spark):
    X, y = _planted(n=60)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(60)]
    dirty = rows + [
        (100, None, 1.0),           # NULL features
        (101, [1.0, 2.0], 0.0),     # wrong length
        (102, X[0].tolist(), None), # NULL label
    ]
    df = spark.createDataFrame(
        dirty, "id long, features array<double>, label double"
    )
    clean = spark.createDataFrame(
        rows, "id long, features array<double>, label double"
    )
    w_d, _ = train_quality_classifier(df, dim=DIM, iters=5, lr=1.0)
    w_c, _ = train_quality_classifier(clean, dim=DIM, iters=5, lr=1.0)
    assert np.allclose(w_d, w_c, atol=1e-12)  # dirty rows contribute nothing
    got = {r["id"]: r["quality_score"] for r in score_quality(df, w_d).collect()}
    assert got[100] is None and got[101] is None
    assert got[102] is not None  # NULL label still scores


def test_all_dirty_raises(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0)], "id long, features array<double>, label double"
    )
    with pytest.raises(ValueError, match="no trainable rows"):
        train_quality_classifier(df, dim=DIM, iters=1)


def test_validation(spark, planted_df):
    with pytest.raises(ValueError):
        train_quality_classifier(planted_df, dim=DIM, iters=0)
    with pytest.raises(ValueError):
        train_quality_classifier(planted_df, dim=DIM, lr=0.0)
    with pytest.raises(ValueError):
        train_quality_classifier(planted_df, dim=DIM, l2=-1.0)


def test_rule_label_never_null(spark):
    df = spark.createDataFrame(
        [
            (1, "a perfectly ordinary sentence with enough plain words here"),
            (2, None),
            (3, ""),
            (4, "# # # # # # #"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["y"] for r in
           df.select("doc_id", rule_label(F.col("text")).alias("y")).collect()}
    assert got[1] == 1
    assert got[2] == 0 and got[3] == 0 and got[4] == 0
    assert all(v is not None for v in got.values())


def test_streaming_scoring_matches_batch(spark, tmp_path):
    """score_quality is a pure Arrow projection, so it applies to a
    structured stream unchanged — a drained stream of the feature frame
    scores bit-identically to the batch pass (model serving on live
    ingest needs no second code path)."""
    from prometheus_parquet_server_spark.streaming.ingest import (
        run_available_now,
    )

    X, y = _planted(n=80)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    w, _ = train_quality_classifier(df, dim=DIM, iters=10, lr=1.0)

    src = f"{tmp_path}/feat"
    df.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {
        r["id"]: r["quality_score"]
        for r in run_available_now(
            score_quality(stream, w), spark, output_mode="append"
        ).collect()
    }
    want = {r["id"]: r["quality_score"] for r in score_quality(static, w).collect()}
    assert got == want  # bit-identical, every row scored exactly once


def test_cluster_topics_shape_and_determinism(spark):
    """Planted two-topic corpus: with enough centroids and iterations,
    each topic's distinctive vocabulary labels its own cluster; output is
    stable across runs (deterministic seeding + exact aggregation)."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        cluster_topics,
    )

    rows = []
    for i in range(30):
        rows.append((i, "apple banana fruit juice sweet " + f"f{i % 3}"))
    for i in range(30, 60):
        rows.append((i, "engine piston torque diesel motor " + f"m{i % 3}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = cluster_topics(df, n_clusters=2, k_terms=3, kmeans_iterations=2)
    rows1 = sorted(map(tuple, out1.collect()))
    rows2 = sorted(map(tuple, cluster_topics(
        df, n_clusters=2, k_terms=3, kmeans_iterations=2).collect()))
    assert rows1 == rows2  # deterministic end-to-end
    by_cell = {}
    for cell, n_docs, rank, token, score in rows1:
        by_cell.setdefault(cell, []).append(token)
        assert n_docs == 30
    assert len(by_cell) == 2
    vocab_a = {"apple", "banana", "fruit", "juice", "sweet"}
    vocab_b = {"engine", "piston", "torque", "diesel", "motor"}
    tops = [set(v) for v in by_cell.values()]
    assert any(t <= vocab_a for t in tops) and any(t <= vocab_b for t in tops)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        cluster_topics(df, n_clusters=0)
    with _pytest.raises(ValueError):
        cluster_topics(df, k_terms=0)
