"""Product quantization (pipeline/pq.py): training parity with a pure
numpy Lloyd reference, encode/ADC exactness, geometry guards, and a
recall sanity floor."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)

DIM, M, K = 8, 4, 3
SUB = DIM // M


def _vecs(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.rand(n, DIM).round(3)  # short decimals: exact doubles


def _frame(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def _ref_train(mat, iterations):
    """Transparent Lloyd reference with the module's exact conventions:
    init = subvectors of the K lowest-id rows, assignment by 9-dp-rounded
    squared L2 with ties to the lowest code, means exact (here: numpy
    float64 over exact short-decimal inputs — no rounding ambiguity)."""
    cb = [[list(mat[j, s * SUB:(s + 1) * SUB]) for j in range(K)]
          for s in range(M)]
    for _ in range(iterations):
        new = []
        for s in range(M):
            sub = mat[:, s * SUB:(s + 1) * SUB]
            c = np.asarray(cb[s])
            d = np.round(
                (sub * sub).sum(1)[:, None] - 2 * sub @ c.T
                + (c * c).sum(1)[None, :], 9)
            code = np.argmin(d, axis=1)
            row = []
            for j in range(K):
                pts = sub[code == j]
                row.append(list(pts.mean(0)) if len(pts) else cb[s][j])
            new.append(row)
        cb = new
    return cb


def test_train_matches_numpy_reference(spark):
    mat = _vecs(20)
    df = _frame(spark, mat)
    for iters in (0, 2):
        got = pq_train(df, m=M, k=K, iterations=iters, dim=DIM)
        want = _ref_train(mat, iters)
        for s in range(M):
            for j in range(K):
                assert got[s][j] == pytest.approx(want[s][j], abs=1e-12), (
                    iters, s, j)


def test_encode_and_adc_exact(spark):
    """Codes equal the reference assignment; ADC dist_u equals the exact
    integer sum of the quantized per-subspace table entries; self-match
    excluded; rank dense and deterministically tie-broken."""
    mat = _vecs(12, seed=3)
    df = _frame(spark, mat)
    cb = pq_train(df, m=M, k=K, iterations=1, dim=DIM)
    codes = {r["vec_id"]: list(r["code"]) for r in pq_encode(df, cb).collect()}

    cmats = [np.asarray(c) for c in cb]
    want_codes = {}
    for i, v in enumerate(mat):
        cs = []
        for s in range(M):
            sub = v[s * SUB:(s + 1) * SUB]
            d = np.round(
                (sub @ sub) - 2 * cmats[s] @ sub + (cmats[s] ** 2).sum(1), 9)
            cs.append(int(np.argmin(d)))
        want_codes[i] = cs
    assert codes == want_codes

    probes = df.filter(F.col("vec_id") < 2)
    out = pq_topk(df, probes, cb, k=5)
    rows = [(r["probe_id"], r["neighbor_id"], r["dist_u"], r["rank"])
            for r in out.collect()]
    assert len(rows) == 10
    by_probe = {}
    for pid, nid, du, rk in rows:
        assert nid != pid
        by_probe.setdefault(pid, []).append((rk, nid, du))
    for pid, lst in by_probe.items():
        lst.sort()
        assert [r for r, _, _ in lst] == [1, 2, 3, 4, 5]
        # dist_u equals the exact table-gather sum
        pv = mat[pid]
        tabs = []
        for s in range(M):
            sub = pv[s * SUB:(s + 1) * SUB]
            t = (sub @ sub) - 2 * cmats[s] @ sub + (cmats[s] ** 2).sum(1)
            tabs.append(np.floor(t * 1e6 + 0.5).astype(np.int64))
        for _, nid, du in lst:
            want = sum(int(tabs[s][want_codes[nid][s]]) for s in range(M))
            assert du == want
        # monotone non-decreasing distance with rank
        dus = [du for _, _, du in lst]
        assert dus == sorted(dus)


def test_pq_recall_sanity(spark):
    """Separable clusters: each probe's PQ top-1 lands in its own cluster
    (compression must not destroy coarse geometry)."""
    rng = np.random.RandomState(0)
    centers = np.eye(4).repeat(2, axis=1) * 10.0  # 4 well-separated centers
    mat = np.vstack([
        centers[i % 4] + rng.rand(DIM) * 0.1 for i in range(24)
    ]).round(3)
    df = _frame(spark, mat)
    cb = pq_train(df, m=M, k=4, iterations=2, dim=DIM)
    probes = df.filter(F.col("vec_id") < 4)
    top1 = {
        r["probe_id"]: r["neighbor_id"]
        for r in pq_topk(df, probes, cb, k=1).collect()
    }
    for pid, nid in top1.items():
        assert nid % 4 == pid % 4, (pid, nid)


def test_pq_guards(spark):
    df = _frame(spark, _vecs(6))
    with pytest.raises(ValueError, match="m must divide"):
        pq_train(df, m=3, k=2, dim=DIM)
    with pytest.raises(ValueError, match="need k"):
        pq_train(df, m=M, k=64, dim=DIM)
    cb = pq_train(df, m=M, k=2, iterations=0, dim=DIM)
    with pytest.raises(ValueError, match="k must be"):
        pq_topk(df, df.limit(1), cb, k=0)
    with pytest.raises(ValueError, match="probes is empty"):
        pq_topk(df, df.filter(F.col("vec_id") < 0), cb, k=1)


def test_ivfpq_matches_numpy_reference(spark):
    """Full IVF-PQ pipeline vs a transparent numpy replay (iterations=0
    both levels): cell assignment, residual codes, probed cells, table
    quantization, exact integer distances, ranking."""
    from prometheus_parquet_server_spark.pipeline.pq import ivfpq_topk

    mat = _vecs(16, seed=11)
    df = _frame(spark, mat)
    n_cells, n_probe, m, kc, k = 3, 2, M, 2, 4
    got = {
        (r["probe_id"], r["rank"]): (r["neighbor_id"], r["dist_u"])
        for r in ivfpq_topk(
            df, df.filter(F.col("vec_id") < 2), k=k, n_cells=n_cells,
            n_probe=n_probe, m=m, k_codes=kc, dim=DIM,
        ).collect()
    }

    # --- numpy replay with the module's exact conventions ---
    coarse = mat[:n_cells].copy()          # init = lowest-id vectors

    def assign(x, c):
        d = np.round(
            (x * x).sum(1)[:, None] - 2 * x @ c.T + (c * c).sum(1)[None, :], 9)
        return np.argmin(d, axis=1)

    cells = assign(mat, coarse)
    resid = mat - coarse[cells]
    cw = [resid[:kc, s * SUB:(s + 1) * SUB].copy() for s in range(m)]
    codes = np.stack(
        [assign(resid[:, s * SUB:(s + 1) * SUB], cw[s]) for s in range(m)],
        axis=1,
    )
    want = {}
    for pid in (0, 1):
        pv = mat[pid]
        d = np.round(
            (pv @ pv) - 2 * coarse @ pv + (coarse ** 2).sum(1), 9)
        pcells = list(np.argsort(d, kind="stable")[:n_probe])
        cand = []
        for c in pcells:
            qr = pv - coarse[c]
            tabs = []
            for s in range(m):
                sub = qr[s * SUB:(s + 1) * SUB]
                t = (sub @ sub) - 2 * cw[s] @ sub + (cw[s] ** 2).sum(1)
                tabs.append(np.floor(t * 1e6 + 0.5).astype(np.int64))
            for i in range(len(mat)):
                if cells[i] == c and i != pid:
                    du = sum(int(tabs[s][codes[i, s]]) for s in range(m))
                    cand.append((du, i))
        cand.sort()
        for rk, (du, i) in enumerate(cand[:k], start=1):
            want[(pid, rk)] = (i, du)
    assert got == want


def test_ivfpq_guards(spark):
    from prometheus_parquet_server_spark.pipeline.pq import ivfpq_topk

    df = _frame(spark, _vecs(8))
    with pytest.raises(ValueError, match="n_probe"):
        ivfpq_topk(df, df.limit(1), n_cells=4, n_probe=5, m=M, k_codes=2, dim=DIM)
    with pytest.raises(ValueError, match="k must be"):
        ivfpq_topk(df, df.limit(1), k=0, n_cells=4, n_probe=2, m=M, k_codes=2, dim=DIM)


def test_ivfpq_store_build_search_parity_and_pruning(spark, tmp_path):
    """The persisted index: search == the one-shot operator on the same
    geometry; the probed-cell scan is manifest-pruned (unprobed cells'
    files never plan); quantizers round-trip through the reserved rows;
    geometry mismatch and missing-index paths raise; time travel
    searches the OLD index after a rebuild."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_search,
        ivfpq_topk,
    )

    mat = _vecs(40, seed=5)
    df = _frame(spark, mat)
    probes = df.filter(F.col("vec_id") < 3)
    store = f"file://{tmp_path}/pqidx"
    v1 = ivfpq_build(spark, store, df, n_cells=4, n_probe_default=2,
                     m=M, k_codes=3, dim=DIM)
    assert v1 == 1
    got = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivfpq_topk(df, probes, k=5, n_cells=4, n_probe=2,
                            m=M, k_codes=3, dim=DIM).collect()
    )
    assert got == want and len(got) == 15

    # manifest pruning: the probed read plans strictly fewer files than
    # the store holds (cells are name-clustered)
    import json
    from glob import glob

    [mpath] = sorted(glob(f"{tmp_path}/pqidx/_snapshots/*.json"))[:1]
    with open(mpath) as fh:
        n_files = len(json.load(fh)["files"])
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )
    pruned = snapshot_read(spark, store, names=["cell=0000"])
    planned = pruned.inputFiles()
    # at this tiny scale AQE may coalesce the whole index into one file;
    # the pruning MECHANISM (manifest name-range file pruning) is proven
    # on multi-file stores by test_ann_store — here pin that the pruned
    # plan never exceeds the store and serves exactly the asked cell
    assert 0 < len(planned) <= n_files
    assert {r["name"] for r in pruned.select("name").distinct().collect()} == {
        "cell=0000"
    }

    # rebuild with different geometry; time travel still serves v1
    v2 = ivfpq_build(spark, store, df, n_cells=2, n_probe_default=1,
                     m=M, k_codes=2, dim=DIM)
    assert v2 == 2
    old = sorted(
        tuple(r)
        for r in ivfpq_search(spark, store, probes, k=5, version=1,
                              n_probe=2).collect()
    )
    assert old == want
    # new tip uses the new pinned geometry (default n_probe=1 of 2 cells)
    fresh = ivfpq_search(spark, store, probes, k=5).collect()
    assert len(fresh) == 15

    with pytest.raises(ValueError, match="n_probe"):
        ivfpq_search(spark, store, probes, k=5, n_probe=99)
    with pytest.raises(FileNotFoundError):
        ivfpq_search(spark, f"file://{tmp_path}/nope", probes, k=5)


def test_ivfpq_append_incremental_equals_one_shot(spark, tmp_path):
    """Appends with frozen quantizers: (build on batch 1) + (append
    batch 2) searches IDENTICALLY to encoding both batches against the
    SAME quantizers in one shot (build trains on batch 1's lowest-id
    init either way, so the quantizers agree); the append is a pure
    manifest append (history files carried by reference), txn
    redelivery is a no-op, and a racing rebuild makes a stale append
    raise instead of committing dead-codebook codes."""
    import json
    from glob import glob

    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_search,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        ConcurrentWriteError,
    )

    mat = _vecs(30, seed=9)
    b1 = _frame(spark, mat[:20])
    b2 = spark.createDataFrame(
        [(20 + i, [float(x) for x in row]) for i, row in enumerate(mat[20:])],
        "vec_id long, embedding array<double>",
    )
    probes = b1.filter(F.col("vec_id") < 2)
    store = f"file://{tmp_path}/pqappend"
    v1 = ivfpq_build(spark, store, b1, n_cells=3, n_probe_default=2,
                     m=M, k_codes=2, dim=DIM)
    with open(f"{tmp_path}/pqappend/_snapshots/v{v1:010d}.json") as fh:
        files_v1 = {f["path"] for f in json.load(fh)["files"]}
    v2 = ivfpq_append(spark, store, b2, txn=("app", 1))
    assert v2 == v1 + 1
    with open(f"{tmp_path}/pqappend/_snapshots/v{v2:010d}.json") as fh:
        files_v2 = {f["path"] for f in json.load(fh)["files"]}
    assert files_v1 <= files_v2  # pure append: history carried by reference

    # one-shot twin: build on the UNION — same init (b1's lowest ids) ⇒
    # identical quantizers ⇒ identical search results
    store2 = f"file://{tmp_path}/pqoneshot"
    ivfpq_build(spark, store2, b1.unionByName(b2), n_cells=3,
                n_probe_default=2, m=M, k_codes=2, dim=DIM)
    a = sorted(tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect())
    b = sorted(tuple(r) for r in ivfpq_search(spark, store2, probes, k=5).collect())
    assert a == b

    # txn redelivery: same (app, 1) is a version-preserving no-op
    assert ivfpq_append(spark, store, b2, txn=("app", 1)) == v2

    # racing rebuild: a stale append must raise, not commit dead codes
    from prometheus_parquet_server_spark.sources import snapshot_store as ss

    real_write = ss.snapshot_write

    def racing_write(spark_, path, df_, **kw):
        if kw.get("mode") == "append" and kw.get("require_parent") is not None:
            # a rebuild lands between the quantizer read and the commit
            ivfpq_build(spark, store, b1, n_cells=2, n_probe_default=1,
                        m=M, k_codes=2, dim=DIM)
            ss.snapshot_write = real_write  # restore before the real call
        return real_write(spark_, path, df_, **kw)

    ss.snapshot_write = racing_write
    try:
        with pytest.raises(ConcurrentWriteError):
            ivfpq_append(spark, store, b2, txn=("app", 2))
    finally:
        ss.snapshot_write = real_write


def test_stream_ivfpq_ingest_matches_batch_append(spark, tmp_path):
    """availableNow streaming drain through stream_ivfpq_ingest ==
    batch ivfpq_append of the same rows; checkpoint-reset replay with
    the SAME app_id is deduped by the txn marker (version preserved)."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_search,
        stream_ivfpq_ingest,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_version,
    )

    mat = _vecs(24, seed=13)
    b1 = _frame(spark, mat[:16])
    extra = spark.createDataFrame(
        [(16 + i, [float(x) for x in row]) for i, row in enumerate(mat[16:])],
        "vec_id long, embedding array<double>",
    )
    src = f"{tmp_path}/vecs_src"
    extra.coalesce(1).write.mode("overwrite").parquet(src)

    store = f"file://{tmp_path}/pqstream"
    ivfpq_build(spark, store, b1, n_cells=3, n_probe_default=2,
                m=M, k_codes=2, dim=DIM)
    stream = spark.readStream.schema(extra.schema).parquet(src)
    q = stream_ivfpq_ingest(stream, spark, store)
    q.awaitTermination(120)
    v_after = snapshot_version(spark, store)
    assert v_after == 2

    # replay with a reset checkpoint + same app_id: marker no-ops it
    import shutil

    shutil.rmtree(f"{tmp_path}/pqstream/_stream_checkpoint")
    q2 = stream_ivfpq_ingest(stream, spark, store)
    q2.awaitTermination(120)
    assert snapshot_version(spark, store) == v_after

    # search sees the streamed vectors
    probes = b1.filter(F.col("vec_id") < 2)
    got = {r["neighbor_id"] for r in
           ivfpq_search(spark, store, probes, k=24).collect()}
    assert got & set(range(16, 24)), "streamed vectors must be searchable"


def test_opq_identity_at_zero_iterations_and_parity(spark):
    """iterations=0: R is the identity and the codebook equals plain
    pq_train on the raw corpus; opq_topk then reproduces pq_topk."""
    from prometheus_parquet_server_spark.pipeline.pq import opq_topk, opq_train

    mat = _vecs(14, seed=21)
    df = _frame(spark, mat)
    R, cb = opq_train(df, m=M, k=K, iterations=0, pq_iterations=1, dim=DIM)
    assert np.allclose(np.asarray(R), np.eye(DIM))
    want = pq_train(df, m=M, k=K, iterations=1, dim=DIM)
    for s in range(M):
        for j in range(K):
            assert cb[s][j] == pytest.approx(want[s][j], abs=1e-12)
    probes = df.filter(F.col("vec_id") < 2)
    a = sorted(tuple(r) for r in opq_topk(df, probes, R, cb, k=4).collect())
    b = sorted(tuple(r) for r in pq_topk(df, probes, want, k=4).collect())
    assert a == b


def test_opq_rotation_reduces_quantization_error_on_correlated_data(spark):
    """The OPQ claim: on a corpus whose variance lives in directions
    SPLIT ACROSS plain PQ's subspaces, the learned rotation strictly
    reduces total reconstruction error vs plain PQ at equal code budget,
    and R stays orthonormal."""
    from prometheus_parquet_server_spark.pipeline.pq import opq_train

    rng = np.random.RandomState(4)
    # strong correlation across the subspace boundary: x[i] ~ x[i+SUB]
    base = rng.randn(60, DIM // 2)
    mat = np.hstack([base, base + 0.05 * rng.randn(60, DIM // 2)]).round(4)
    df = _frame(spark, mat)

    def recon_err(R, cb):
        Rm = np.asarray(R)
        XR = mat @ Rm
        err = 0.0
        for s in range(M):
            sl = slice(s * SUB, (s + 1) * SUB)
            cm = np.asarray(cb[s])
            d = (XR[:, sl] ** 2).sum(1)[:, None] - 2 * XR[:, sl] @ cm.T \
                + (cm ** 2).sum(1)[None, :]
            err += d.min(axis=1).sum()
        return err

    R0, cb0 = opq_train(df, m=M, k=K, iterations=0, pq_iterations=2, dim=DIM)
    R2, cb2 = opq_train(df, m=M, k=K, iterations=2, pq_iterations=2, dim=DIM)
    e_plain = recon_err(R0, cb0)
    e_opq = recon_err(R2, cb2)
    assert e_opq < e_plain, (e_opq, e_plain)
    assert np.allclose(np.asarray(R2) @ np.asarray(R2).T, np.eye(DIM),
                       atol=1e-9)


def test_opq_store_round_trip_parity_and_time_travel(spark, tmp_path):
    """The persisted OPQ index (VERDICT r9 Next #6): ivfpq_build with
    opq_iterations>0 stores the learned rotation as reserved _rotation
    rows version-pinned with the quantizers; search == the operator
    composition (rotate corpus+probes with the SAME deterministic R →
    ivfpq_topk at the same geometry); an append enters the rotated space
    through the pinned R; a rebuild without rotation leaves the OLD
    rotated index searchable via time travel with ITS OWN rotation."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ROTATION_NAME,
        _rotate_udf,
        ivfpq_append,
        ivfpq_build,
        ivfpq_search,
        ivfpq_topk,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(40, DIM // 2)
    mat = np.hstack([base, base + 0.05 * rng.randn(40, DIM // 2)]).round(4)
    df = _frame(spark, mat)
    probes = df.filter(F.col("vec_id") < 3)
    store = f"file://{tmp_path}/opqidx"

    v1 = ivfpq_build(
        spark, store, df, n_cells=4, n_probe_default=2, m=M, k_codes=3,
        dim=DIM, opq_iterations=1,
    )
    assert v1 == 1
    assert int(snapshot_properties(spark, store)["pq_rot"]) == 1
    rot_rows = (
        snapshot_read(spark, store, names=[ROTATION_NAME])
        .orderBy("vec_id").collect()
    )
    assert len(rot_rows) == DIM
    R = np.asarray([list(r["embedding"]) for r in rot_rows])
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-9)  # orthonormal

    # parity: store search == operator composition with the same
    # (deterministic) rotation replayed outside the store
    rot = _rotate_udf(R)
    rot_df = df.select("vec_id", rot(F.col("embedding")).alias("embedding"))
    rot_probes = probes.select(
        "vec_id", rot(F.col("embedding")).alias("embedding")
    )
    got = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivfpq_topk(rot_df, rot_probes, k=5, n_cells=4, n_probe=2,
                            m=M, k_codes=3, dim=DIM).collect()
    )
    assert got == want and len(got) == 15

    # append enters the rotated space via the pinned R: equal to the
    # one-shot search over the union in rotated space with frozen
    # quantizers (the append re-encodes ONLY the batch)
    mat2 = (mat[:10] + 0.01).round(4)
    batch = spark.createDataFrame(
        [(100 + i, [float(x) for x in row]) for i, row in enumerate(mat2)],
        "vec_id long, embedding array<double>",
    )
    v2 = ivfpq_append(spark, store, batch)
    assert v2 == 2
    after = ivfpq_search(spark, store, probes, k=5).collect()
    assert len(after) == 15
    # direct proof the batch entered the ROTATED space: the stored
    # (cell, code) of every appended row equals the numpy assignment of
    # the ROTATED batch vector against the frozen quantizers (the exact
    # module conventions: 9-dp-rounded squared L2, ties → lowest id)
    from prometheus_parquet_server_spark.pipeline.pq import _load_quantizers

    coarse, codebook = _load_quantizers(spark, store, v1, M, 3)
    cmat = np.asarray(coarse)
    stored = {
        r["vec_id"]: (
            int(r["name"].split("=")[1]),
            [int(c) for c in r["code"]],
        )
        for r in snapshot_read(spark, store)
        .filter(F.col("vec_id") >= 100)
        .select("vec_id", "name", "code")
        .collect()
    }
    assert set(stored) == {100 + i for i in range(10)}
    for i, raw in enumerate(mat2):
        rv = np.asarray(raw, dtype=np.float64) @ R
        d = np.round(
            (rv[None, :] - cmat) ** 2 @ np.ones(DIM), 9
        )
        cell = int(np.argmin(d))
        resid = rv - cmat[cell]
        codes = []
        for s in range(M):
            cm = np.asarray(codebook[s])
            sub = resid[s * SUB:(s + 1) * SUB]
            ds = np.round(((sub[None, :] - cm) ** 2).sum(1), 9)
            codes.append(int(np.argmin(ds)))
        assert stored[100 + i] == (cell, codes), f"row {100 + i}"

    # rebuild WITHOUT rotation: tip serves unrotated, v2 time-travels
    # with its own rotation
    v3 = ivfpq_build(spark, store, df, n_cells=4, n_probe_default=2,
                     m=M, k_codes=3, dim=DIM)
    assert v3 == 3
    assert int(snapshot_properties(spark, store)["pq_rot"]) == 0
    old = sorted(
        tuple(r)
        for r in ivfpq_search(spark, store, probes, k=5, version=1,
                              n_probe=2).collect()
    )
    assert old == want


def test_ivfpq_index_survives_compaction_and_time_travel(spark, tmp_path):
    """The index IS a snapshot-store table, so the table format's
    maintenance composes: after fragmenting appends, snapshot_compact
    rewrites the small files into name-clustered ones and the search
    answer is IDENTICAL (quantizer rows, cell codes, and manifest
    properties all carry through the rewrite); the pre-compaction
    version still time-travels."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_search,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_compact,
        snapshot_properties,
    )

    mat = _vecs(36, seed=13)
    probes = _frame(spark, mat[:2])
    store = f"file://{tmp_path}/pqcompact"
    ivfpq_build(spark, store, _frame(spark, mat[:12]), n_cells=3,
                n_probe_default=2, m=M, k_codes=3, dim=DIM)
    for lo in (12, 20, 28):
        batch = spark.createDataFrame(
            [(i, [float(x) for x in row])
             for i, row in enumerate(mat[lo:lo + 8], start=lo)],
            "vec_id long, embedding array<double>",
        )
        ivfpq_append(spark, store, batch)
    before = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )
    v_pre = 4
    v_compact = snapshot_compact(spark, store, min_files_to_compact=2)
    assert v_compact == 5
    after = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )
    assert after == before
    # pinned geometry survives the rewrite; the old version still serves
    assert int(snapshot_properties(spark, store)["pq_cells"]) == 3
    old = sorted(
        tuple(r)
        for r in ivfpq_search(spark, store, probes, k=5,
                              version=v_pre).collect()
    )
    assert old == before


def test_ivfpq_rerank_raises_on_incomplete_corpus(spark, tmp_path):
    """The rerank completeness gate: a corpus missing indexed ids must
    raise loudly (the ADC stage surfaced those neighbors; dropping them
    would silently shrink the answer), and a complete corpus reranks
    exactly the one-shot composition."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_rerank,
    )

    mat = _vecs(24, seed=17)
    df = _frame(spark, mat)
    probes = df.filter(F.col("vec_id") < 2)
    store = f"file://{tmp_path}/rrguard"
    ivfpq_build(spark, store, df, n_cells=3, n_probe_default=3, m=M,
                k_codes=3, dim=DIM)
    full = ivfpq_rerank(spark, store, probes, df, k=4, k_adc=8).collect()
    assert len(full) == 8
    with pytest.raises(ValueError, match="missing"):
        ivfpq_rerank(
            spark, store, probes, df.filter(F.col("vec_id") % 2 == 0),
            k=4, k_adc=8,
        )
    with pytest.raises(ValueError, match="need k_adc"):
        ivfpq_rerank(spark, store, probes, df, k=5, k_adc=4)


def test_ivfpq_binary_code_storage_parity(spark, tmp_path):
    """code_type='binary' (the production at-rest format — one m-byte
    value per vector instead of array<int>): search, append, and rerank
    results are BIT-IDENTICAL to the int-code store on the same corpus;
    the pinned pq_code_type property makes appends encode matching; the
    k_codes>256 guard raises."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_rerank,
        ivfpq_search,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
    )

    mat = _vecs(30, seed=23)
    df = _frame(spark, mat)
    probes = df.filter(F.col("vec_id") < 3)
    s_int = f"file://{tmp_path}/codes_int"
    s_bin = f"file://{tmp_path}/codes_bin"
    kw = dict(n_cells=3, n_probe_default=2, m=M, k_codes=3, dim=DIM)
    ivfpq_build(spark, s_int, df, **kw)
    ivfpq_build(spark, s_bin, df, code_type="binary", **kw)
    assert snapshot_properties(spark, s_bin)["pq_code_type"] == "binary"

    def got(store):
        return sorted(
            tuple(r)
            for r in ivfpq_search(spark, store, probes, k=5).collect()
        )

    assert got(s_bin) == got(s_int)
    # the stored code column really is m raw bytes per vector
    row = (
        snapshot_read(spark, s_bin)
        .filter(F.col("name").startswith("cell="))
        .select("code")
        .first()
    )
    assert isinstance(row["code"], (bytes, bytearray)) and len(row["code"]) == M

    # append encodes with the pinned format on BOTH stores → still equal
    extra = _frame(spark, _vecs(36, seed=23)).filter(F.col("vec_id") >= 30)
    ivfpq_append(spark, s_int, extra)
    ivfpq_append(spark, s_bin, extra)
    assert got(s_bin) == got(s_int)

    # exact rerank reads the same ADC candidates from either format
    full = df.unionByName(extra)
    ri = sorted(
        tuple(r)
        for r in ivfpq_rerank(spark, s_int, probes, full, k=4, k_adc=8).collect()
    )
    rb = sorted(
        tuple(r)
        for r in ivfpq_rerank(spark, s_bin, probes, full, k=4, k_adc=8).collect()
    )
    assert rb == ri and len(rb) == 12

    with pytest.raises(ValueError, match="k_codes"):
        ivfpq_build(spark, f"file://{tmp_path}/bad", df, n_cells=3, m=M,
                    k_codes=300, dim=DIM, code_type="binary")
    with pytest.raises(ValueError, match="code_type"):
        ivfpq_build(spark, f"file://{tmp_path}/bad2", df, n_cells=3, m=M,
                    k_codes=3, dim=DIM, code_type="tinyint")


def test_quantizer_cache_store_nonce_survives_out_of_band_rebuild(spark, tmp_path):
    """ADVICE r11: (path, version) alone cannot key the quantizer cache —
    a store deleted OUT-OF-BAND and rebuilt at the same path restarts
    version numbers, and a geometry-compatible rebuild would silently
    serve the OLD build's cached quantizers. The per-build
    pq_store_nonce breaks the tie: after rm -rf + rebuild with different
    data at the same (path, version, geometry), a search must reflect
    the NEW quantizers."""
    import shutil

    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_search,
    )

    store = f"file://{tmp_path}/noncestore"
    mat_a = _vecs(16, seed=21)
    df_a = _frame(spark, mat_a)
    probes = df_a.filter(F.col("vec_id") < 2)
    v_a = ivfpq_build(spark, store, df_a, n_cells=2, n_probe_default=2,
                      m=M, k_codes=2, dim=DIM)
    first = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )  # warms the cache for (store, v_a)

    # out-of-band delete + rebuild: same path, same geometry, version
    # numbering restarts, DIFFERENT data (ids offset so results differ)
    shutil.rmtree(f"{tmp_path}/noncestore")
    df_b = spark.createDataFrame(
        [(100 + i, [float(x) for x in row])
         for i, row in enumerate(_vecs(16, seed=22))],
        "vec_id long, embedding array<double>",
    )
    v_b = ivfpq_build(spark, store, df_b, n_cells=2, n_probe_default=2,
                      m=M, k_codes=2, dim=DIM)
    assert v_b == v_a  # version numbers really did restart
    second = sorted(
        tuple(r) for r in ivfpq_search(spark, store, probes, k=5).collect()
    )
    # every neighbor must come from the NEW corpus (ids >= 100): stale
    # cached quantizers of the old build would keep old-geometry cells
    # but the codes table is new — the discriminating signal is that the
    # search runs at all AND returns only new-corpus ids
    assert all(r[1] >= 100 for r in second), second
    assert first != second


def test_ivfpq_rerank_max_probes_cap(spark, tmp_path):
    """ADVICE r11: the probe batch is collected to the driver (full
    vectors); the cap raises loudly instead of cliffing."""
    from prometheus_parquet_server_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_rerank,
    )

    mat = _vecs(12, seed=23)
    df = _frame(spark, mat)
    store = f"file://{tmp_path}/probecap"
    ivfpq_build(spark, store, df, n_cells=2, n_probe_default=2, m=M,
                k_codes=2, dim=DIM)
    probes = df.filter(F.col("vec_id") < 4)
    with pytest.raises(ValueError, match="max_probes"):
        ivfpq_rerank(spark, store, probes, df, k=2, k_adc=4, max_probes=3)
    ok = ivfpq_rerank(spark, store, probes, df, k=2, k_adc=4, max_probes=4)
    assert ok.count() == 8
