"""SQ8 scalar-quantized ANN (pipeline/sq.py — Faiss SQ8 shape)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 16


def _vecs(n, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, DIM)).astype(np.float64)


def _frame(spark, mat, offset=0):
    return spark.createDataFrame(
        [(offset + i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def test_sq8_codes_match_reference_and_self_probe_is_nearest(spark, tmp_path):
    """Stored codes equal a pure-Python replay of the shared quantization
    formula (per-dim min/max scales, floor((x−mn)/sp·255+0.5) clamped);
    a probe drawn from the corpus quantizes to its OWN stored codes, so
    its nearest neighbor under code distance is its true duplicate; a
    constant dimension codes to 0 everywhere."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        sq8_build,
        sq8_topk,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )

    mat = _vecs(20, seed=5)
    mat[:, 3] = 1.25  # constant dimension → span 0 → code 0
    mat[11] = mat[2]  # planted exact duplicate
    df = _frame(spark, mat)
    store = f"file://{tmp_path}/sq8"
    v = sq8_build(spark, store, df, dim=DIM)
    assert v == 1

    got = {
        r["vec_id"]: list(r["code"])
        for r in snapshot_read(spark, store, names=["sq"]).collect()
    }
    mins = mat.min(axis=0)
    spans = mat.max(axis=0) - mins
    import math

    want = {}
    for i, row in enumerate(mat):
        cs = []
        for x, mn, sp in zip(row, mins, spans):
            if sp > 0:
                cs.append(int(min(max(
                    math.floor((x - mn) / sp * 255.0 + 0.5), 0.0), 255.0)))
            else:
                cs.append(0)
        want[i] = cs
    assert got == want
    assert all(c[3] == 0 for c in got.values())

    out = sq8_topk(spark, store, df.filter(F.col("vec_id") == 2), k=3)
    by_rank = {r["rank"]: (r["neighbor_id"], r["dist_u"])
               for r in out.collect()}
    # the planted duplicate is rank 1 at distance 0 (self excluded)
    assert by_rank[1] == (11, 0)


def test_sq8_rerank_equals_exact_l2_when_candidates_cover(spark, tmp_path):
    """With k_adc = corpus size the rerank stage sees every vector, so
    its top-k must equal the exact 9-dp L2 brute force — quantization
    error cannot survive the refinement (the IVFADC+R property)."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        sq8_build,
        sq8_rerank_topk,
    )

    mat = _vecs(24, seed=7)
    df = _frame(spark, mat)
    store = f"file://{tmp_path}/sq8rr"
    sq8_build(spark, store, df, dim=DIM)
    probes = df.filter(F.col("vec_id") < 3)
    out = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in sq8_rerank_topk(
            spark, store, probes, df, k=5, k_adc=23
        ).collect()
    }
    for pid in range(3):
        d = np.round(((mat - mat[pid]) ** 2).sum(axis=1), 9)
        order = sorted((dd, i) for i, dd in enumerate(d) if i != pid)
        for rk, (_, nid) in enumerate(order[:5], 1):
            assert out[(pid, rk)] == nid, (pid, rk)

    with pytest.raises(ValueError, match="k_adc"):
        sq8_rerank_topk(spark, store, probes, df, k=5, k_adc=3)


def test_sq8_guards_and_dim_pinning(spark, tmp_path):
    from prometheus_parquet_server_spark.pipeline.sq import (
        _load_scales,
        sq8_build,
        sq8_topk,
    )

    df = _frame(spark, _vecs(8, seed=9))
    store = f"file://{tmp_path}/sq8g"
    with pytest.raises(ValueError, match="dim"):
        sq8_build(spark, store, df, dim=DIM + 1)
    sq8_build(spark, store, df, dim=DIM)
    with pytest.raises(ValueError, match="dim"):
        _load_scales(spark, store, None, DIM + 2)
    with pytest.raises(ValueError, match="k must be"):
        sq8_topk(spark, store, df.limit(1), k=0)
    with pytest.raises(ValueError, match="probes is empty"):
        sq8_topk(spark, store, df.filter(F.col("vec_id") < 0), k=2)
    with pytest.raises(FileNotFoundError):
        sq8_topk(spark, f"file://{tmp_path}/nowhere", df.limit(1), k=2)


def test_sq8_append_oneshot_equivalence_txn_and_cas(spark, tmp_path):
    """The growing-index contract (the ivfpq_append rules): an append
    encodes with the FROZEN scales, so search(build(b1) + append(b2))
    == search(build(b1 ∪ b2)) whenever b2 stays inside b1's per-dim
    range (frozen-scale clamping is the documented out-of-range trade);
    a txn-marked replay is a version-preserving no-op — batch and
    streaming alike (the CAS race itself is exercised by the shared
    snapshot-store require_parent tests; sq8_append passes the pinned
    version straight through)."""
    import shutil

    from prometheus_parquet_server_spark.pipeline.sq import (
        sq8_append,
        sq8_build,
        sq8_topk,
        stream_sq8_ingest,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_version,
    )

    mat = _vecs(30, seed=11)
    # b2 strictly inside b1's envelope: shrink toward zero (normal data
    # spans both signs, so scaled copies stay in [min, max] per dim)
    b1 = _frame(spark, mat[:20])
    b2 = _frame(spark, mat[:10] * 0.25, offset=20)
    store = f"file://{tmp_path}/sq8app"
    v1 = sq8_build(spark, store, b1, dim=DIM)
    v2 = sq8_append(spark, store, b2, txn=("app", 1))
    assert v2 == v1 + 1
    # txn replay: version unchanged
    assert sq8_append(spark, store, b2, txn=("app", 1)) == v2

    # one-shot twin: build on the UNION — b2 is strictly inside b1's
    # per-dim envelope, so the union's min/max scales EQUAL b1's and the
    # frozen-scale append must encode identically
    store2 = f"file://{tmp_path}/sq8one"
    sq8_build(spark, store2, b1.unionByName(b2), dim=DIM)
    probes = b1.filter(F.col("vec_id") < 3)
    a = sorted(tuple(r) for r in sq8_topk(spark, store, probes, k=5).collect())
    b = sorted(tuple(r) for r in sq8_topk(spark, store2, probes, k=5).collect())
    assert a == b

    with pytest.raises(FileNotFoundError):
        sq8_append(spark, f"file://{tmp_path}/empty", b2)

    # streaming twin: drain b2 as a stream into a fresh b1 index; the
    # result equals the batch append (shared scaffold, txn no-ops)
    src = f"{tmp_path}/sq8_stream_src"
    b2.write.mode("overwrite").parquet(src)
    store3 = f"file://{tmp_path}/sq8stream"
    sq8_build(spark, store3, b1, dim=DIM)
    stream = spark.readStream.schema(b2.schema).parquet(src)
    q = stream_sq8_ingest(stream, spark, store3)
    q.awaitTermination(120)
    c = sorted(tuple(r) for r in sq8_topk(spark, store3, probes, k=5).collect())
    assert c == a
    # replay after checkpoint wipe: txn marker makes it a no-op
    tip = snapshot_version(spark, store3)
    shutil.rmtree(f"{tmp_path}/sq8stream/_stream_checkpoint_sq8")
    q2 = stream_sq8_ingest(stream, spark, store3)
    q2.awaitTermination(120)
    assert snapshot_version(spark, store3) == tip


def test_sq8_rerank_guard_rails_match_ivfpq(spark, tmp_path):
    """Round-12 review findings: the refinement stage carries
    ivfpq_rerank's guard rails — a corpus missing indexed candidate ids
    raises (membership, not count-delta), duplicate ids raise their own
    error, the probe batch is collected once under a loud cap, and a
    NULL/ragged vector can never reach the persisted index."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        sq8_append,
        sq8_build,
        sq8_rerank_topk,
    )

    mat = _vecs(20, seed=13)
    df = _frame(spark, mat)
    store = f"file://{tmp_path}/sq8guard"
    sq8_build(spark, store, df, dim=DIM)
    probes = df.filter(F.col("vec_id") < 2)

    with pytest.raises(ValueError, match="missing"):
        sq8_rerank_topk(
            spark, store, probes, df.filter(F.col("vec_id") % 2 == 0),
            k=3, k_adc=8,
        )
    with pytest.raises(ValueError, match="duplicate"):
        sq8_rerank_topk(
            spark, store, probes, df.unionByName(df), k=3, k_adc=8,
        )
    with pytest.raises(ValueError, match="max_probes"):
        sq8_rerank_topk(spark, store, probes, df, k=2, k_adc=4, max_probes=1)
    # the flat serving path carries the same cap (VERDICT r12 #3: the
    # direct sq8_topk collect was the one uncontracted driver collect)
    from prometheus_parquet_server_spark.pipeline.sq import sq8_topk

    with pytest.raises(ValueError, match="max_probes"):
        sq8_topk(spark, store, probes, k=2, max_probes=1)
    ok = sq8_topk(spark, store, probes, k=2, max_probes=2)
    assert ok.count() > 0

    # dirty batches never reach the store (poisoned index class)
    nullvec = spark.createDataFrame(
        [(100, None)], "vec_id long, embedding array<double>"
    )
    ragged = spark.createDataFrame(
        [(101, [1.0] * (DIM - 1))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="clean the batch"):
        sq8_append(spark, store, nullvec)
    with pytest.raises(ValueError, match="clean the batch"):
        sq8_append(spark, store, ragged)
    with pytest.raises(ValueError, match="clean the batch"):
        sq8_build(spark, f"file://{tmp_path}/sq8dirty", nullvec, dim=DIM)


def test_ivfsq8_full_probe_equals_flat_and_prunes(spark, tmp_path):
    """IVF-SQ8 (round 13 — the celled variant closing the flat index's
    one scale caveat): with n_probe == n_cells the celled search returns
    EXACTLY the flat sq8_topk answer (celling is pure pruning at full
    probe — same codes, same kernel, same ties); with n_probe=1 every
    returned neighbor shares the probe's own cell under the build's
    assignment kernel; deterministic; the two store kinds cross-guard;
    bounds raise."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        centroid_cells_udf,
        kmeans_centroids,
    )
    from prometheus_parquet_server_spark.pipeline.sq import (
        ivfsq8_build,
        ivfsq8_topk,
        sq8_build,
        sq8_topk,
    )

    mat = _vecs(60, seed=21)
    df = _frame(spark, mat)
    flat = f"file://{tmp_path}/sq8flat"
    celled = f"file://{tmp_path}/sq8cells"
    sq8_build(spark, flat, df, dim=DIM)
    v = ivfsq8_build(
        spark, celled, df, n_cells=4, n_probe_default=2,
        kmeans_iterations=0, dim=DIM,
    )
    assert v == 1
    probes = df.filter(F.col("vec_id") < 3)

    def key(frame):
        return sorted(
            (r["probe_id"], r["neighbor_id"], r["dist_u"], r["rank"])
            for r in frame.collect()
        )

    # full probe ≡ flat: pruning only, never a different answer
    assert key(ivfsq8_topk(spark, celled, probes, k=5, n_probe=4)) == key(
        sq8_topk(spark, flat, probes, k=5)
    )

    # n_probe=1: every neighbor lives in the probe's own best cell
    cents = kmeans_centroids(df, 4, 0, DIM)
    cells = {
        r["vec_id"]: r["c"][0]
        for r in df.select(
            "vec_id", centroid_cells_udf(cents, 1)(F.col("embedding")).alias("c")
        ).collect()
    }
    narrow = ivfsq8_topk(spark, celled, probes, k=5, n_probe=1).collect()
    assert narrow, "n_probe=1 returned nothing"
    for r in narrow:
        assert cells[r["neighbor_id"]] == cells[r["probe_id"]], (
            r, cells[r["neighbor_id"]], cells[r["probe_id"]]
        )

    # deterministic
    assert key(ivfsq8_topk(spark, celled, probes, k=5, n_probe=2)) == key(
        ivfsq8_topk(spark, celled, probes, k=5, n_probe=2)
    )

    # cross-guards: each search refuses the other store kind, loudly
    with pytest.raises(ValueError, match="celled IVF-SQ8"):
        sq8_topk(spark, celled, probes, k=2)
    with pytest.raises(ValueError, match="FLAT SQ8"):
        ivfsq8_topk(spark, flat, probes, k=2)
    # bounds
    with pytest.raises(ValueError, match="n_probe"):
        ivfsq8_topk(spark, celled, probes, k=2, n_probe=5)
    with pytest.raises(ValueError, match="max_probes"):
        ivfsq8_topk(spark, celled, probes, k=2, max_probes=1)
    with pytest.raises(ValueError, match="9999"):
        ivfsq8_build(spark, f"file://{tmp_path}/x", df, n_cells=10_000, dim=DIM)
    with pytest.raises(ValueError, match="clean the batch"):
        ivfsq8_build(
            spark,
            f"file://{tmp_path}/y",
            spark.createDataFrame(
                [(1, None)], "vec_id long, embedding array<double>"
            ),
            dim=DIM,
        )


def test_ivfsq8_append_oneshot_equivalence_and_guards(spark, tmp_path):
    """ivfsq8_append (the family's growing half): a batch strictly
    inside the build's per-dim envelope, at ids ABOVE every build id,
    appends to EXACTLY the one-shot union build — union scales equal
    the build's (envelope) and union centroids equal the build's
    (lowest-id contract) — so the celled search over build+append is
    bit-identical to a rebuild; txn replay is a version-preserving
    no-op; a flat store refuses the celled append."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        ivfsq8_append,
        ivfsq8_build,
        ivfsq8_topk,
        sq8_build,
    )

    mat = _vecs(40, seed=31)
    b1 = _frame(spark, mat[:30])
    b2 = _frame(spark, mat[:8] * 0.25, offset=30)
    store = f"file://{tmp_path}/ivfsq8app"
    v1 = ivfsq8_build(
        spark, store, b1, n_cells=4, n_probe_default=2,
        kmeans_iterations=0, dim=DIM,
    )
    v2 = ivfsq8_append(spark, store, b2, txn=("app", 1))
    assert v2 == v1 + 1
    assert ivfsq8_append(spark, store, b2, txn=("app", 1)) == v2  # replay

    one = f"file://{tmp_path}/ivfsq8one"
    ivfsq8_build(
        spark, one, b1.unionByName(b2), n_cells=4, n_probe_default=2,
        kmeans_iterations=0, dim=DIM,
    )
    probes = b1.filter(F.col("vec_id") < 3)

    def key(frame):
        return sorted(tuple(r) for r in frame.collect())

    assert key(ivfsq8_topk(spark, store, probes, k=5, n_probe=4)) == key(
        ivfsq8_topk(spark, one, probes, k=5, n_probe=4)
    )

    flat = f"file://{tmp_path}/flatguard"
    sq8_build(spark, flat, b1, dim=DIM)
    with pytest.raises(ValueError, match="FLAT SQ8"):
        ivfsq8_append(spark, flat, b2)
    with pytest.raises(FileNotFoundError):
        ivfsq8_append(spark, f"file://{tmp_path}/nowhere", b2)
    # the fourth cross-guard corner (round-13 review): a flat append
    # into a celled store would commit rows under name='sq' that no
    # search ever scans — must refuse loudly, not lose data silently
    from prometheus_parquet_server_spark.pipeline.sq import sq8_append

    with pytest.raises(ValueError, match="celled IVF-SQ8"):
        sq8_append(spark, store, b2)


def test_ivfsq8_small_corpus_pins_actual_cell_count(spark, tmp_path):
    """ADVICE r13: a corpus smaller than n_cells yields fewer centroids —
    the pinned sq_cells property must equal the COMMITTED centroid rows
    (len(centroids)), not the requested n_cells, so the [1, sq_cells]
    n_probe validation range never overstates the real geometry."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        ivfsq8_build,
        ivfsq8_topk,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
    )

    df = _frame(spark, _vecs(3, seed=9))  # 3 vectors, 8 requested cells
    store = f"file://{tmp_path}/small"
    ivfsq8_build(spark, store, df, n_cells=8, n_probe_default=2, dim=DIM)
    props = snapshot_properties(spark, store)
    assert int(props["sq_cells"]) == 3
    probes = df.filter(F.col("vec_id") < 2)
    # full probe at the REAL cell count works...
    assert ivfsq8_topk(spark, store, probes, k=2, n_probe=3).count() > 0
    # ...and the stale requested count is now correctly out of range
    with pytest.raises(ValueError, match="n_probe"):
        ivfsq8_topk(spark, store, probes, k=2, n_probe=4)


def test_ivfsq8_append_refuses_centroidless_store(spark, tmp_path):
    """ADVICE r13: a store carrying the sq_cells property but missing its
    _centroid rows (partial corruption) must fail ivfsq8_append with the
    same loud FileNotFoundError as ivfsq8_topk — not an opaque numpy
    shape error deep inside the routing UDF."""
    from prometheus_parquet_server_spark.pipeline.sq import (
        _scale_rows,
        ivfsq8_append,
        ivfsq8_topk,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_write,
    )

    schema = (
        "name string, ts double, vec_id long, embedding array<double>, "
        "code array<int>"
    )
    store = f"file://{tmp_path}/corrupt"
    snapshot_write(
        spark,
        store,
        _scale_rows(spark, [0.0] * DIM, [1.0] * DIM, schema),
        mode="overwrite",
        properties={"sq_dim": DIM, "sq_cells": 4, "sq_n_probe_default": 2},
    )
    batch = _frame(spark, _vecs(2, seed=3))
    with pytest.raises(FileNotFoundError, match="no IVF-SQ8 index"):
        ivfsq8_append(spark, store, batch)
    with pytest.raises(FileNotFoundError, match="no IVF-SQ8 index"):
        ivfsq8_topk(spark, store, batch, k=1)
