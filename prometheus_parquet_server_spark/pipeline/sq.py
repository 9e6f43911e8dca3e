"""SQ8 scalar quantization — the third compressed-at-rest ANN family
beside IVF-PQ and OPQ [Faiss's ``SQ8`` / ``IndexScalarQuantizer``,
public knowledge]: every dimension is quantized INDEPENDENTLY to one
8-bit code against per-dimension corpus min/max, so a 64-dim float64
vector stores as 64 small ints (parquet bit-packs ≤255 int lists to
~1 byte/code — the EXPLAIN §44 measurement) instead of 512 bytes.
Where PQ buys compression with a trained codebook (k-means, subspace
structure), SQ8 is training-free and deterministic: two exact MIN/MAX
aggregates ARE the "codebook", which makes the whole index — build,
encode, search — replayable in plain SQL with zero iteration pinning.

Quantization stays JVM-side (one higher-order ``transform`` against
literal scale arrays — no UDF); the search's distance stage is an
Arrow-batched numpy kernel (the similarity.py matmul-kernel
convention) that emits only per-batch top-k rows — the position-
explode SQL form was built first and MEASURED at 92.8 s/1M vectors
(dim·N shuffled rows; scripts/stress_sq8.py round 12), the kernel
replaces it at identical integer semantics. The optional refinement
stage is the IVFADC+R shape — approximate candidates, exact 9-dp L2
re-rank against the raw vectors.

Store layout (the ann_store/ivfpq conventions,
sources/snapshot_store.py): code rows under ``name='sq'`` with the
codes as an ``array<int>`` payload; the per-dimension minima and
spans as reserved ``_sq_min`` / ``_sq_span`` rows (vec_id 0, the
arrays in the ``embedding`` column); geometry pinned as the
``sq_dim`` manifest property. Rebuild = overwrite commit; time travel
searches an old index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SQ_NAME = "sq"
SQ_MIN_NAME = "_sq_min"
SQ_SPAN_NAME = "_sq_span"


def sq8_quantize_expr(vec, mins: list[float], spans: list[float]):
    """The ONE quantization definition (build + probe sides share it):
    ``code_i = clamp(floor((x_i − min_i) / span_i · 255 + 0.5), 0, 255)``,
    zero where the dimension is constant (span 0). Left-to-right IEEE
    double ops only — identical in DuckDB written the same way, so the
    oracle replays codes bit-exactly without any rounding contract."""
    mins_lit = F.array(*[F.lit(float(v)) for v in mins])
    spans_lit = F.array(*[F.lit(float(v)) for v in spans])
    return F.transform(
        vec,
        lambda x, i: F.when(
            F.element_at(spans_lit, i + 1) > 0.0,
            F.least(
                F.greatest(
                    F.floor(
                        (x.cast("double") - F.element_at(mins_lit, i + 1))
                        / F.element_at(spans_lit, i + 1)
                        * F.lit(255.0)
                        + F.lit(0.5)
                    ),
                    F.lit(0.0),
                ),
                F.lit(255.0),
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )


def _load_scales(spark, store_path: str, version: int | None, dim: int):
    """Version-pinned driver-side load of the reserved scale rows."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )

    rows = {
        r["name"]: list(r["embedding"])
        for r in snapshot_read(
            spark, store_path, version=version,
            names=[SQ_MIN_NAME, SQ_SPAN_NAME],
        ).collect()
    }
    if set(rows) != {SQ_MIN_NAME, SQ_SPAN_NAME}:
        raise FileNotFoundError(
            f"no SQ8 index (missing scale rows) at {store_path}"
        )
    mins, spans = rows[SQ_MIN_NAME], rows[SQ_SPAN_NAME]
    if len(mins) != dim or len(spans) != dim:
        raise ValueError(
            f"SQ8 index at {store_path} has dim {len(mins)}; caller "
            f"expected {dim} — foreign or truncated store"
        )
    return mins, spans


def _guard_clean_vectors(
    corpus: DataFrame, dim: int, id_col: str, vec_col: str, op: str
) -> None:
    """A NULL id, NULL vector, or wrong-arity vector must never reach the
    persisted index (the snapshot store's clean-keys spirit): a NULL
    vector would commit a NULL code array that crashes every later
    search batch in the numpy kernel — poisoning the store until a
    rebuild — and the SQL oracle simply emits no rows for it (a silent
    engine/oracle divergence class). One cheap limit-1 probe; loud."""
    bad = corpus.where(
        F.col(id_col).isNull()
        | F.col(vec_col).isNull()
        | (F.size(F.col(vec_col)) != dim)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"{op}: corpus contains a NULL {id_col}/{vec_col} or a vector "
            f"whose length differs from dim={dim} (e.g. {id_col}="
            f"{bad[0][id_col]!r}) — clean the batch before indexing"
        )


def _corpus_scales(corpus: DataFrame, dim: int, vec_col: str, op: str):
    """The ONE per-dimension scale computation (flat and celled builds
    share it — a NaN-handling or message change lands in both or
    neither): two exact MIN/MAX aggregates over the exploded elements —
    order-free, no sums, so bit-stable on any engine. Returns
    ``(mins, spans)``."""
    elems = corpus.select(
        F.posexplode(F.col(vec_col)).alias("i", "x")
    ).select("i", F.col("x").cast("double").alias("x"))
    stats = {
        r["i"]: (r["mn"], r["mx"])
        for r in elems.groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    }
    if len(stats) != dim:
        raise ValueError(
            f"{op}: corpus vectors have {len(stats)} dimensions; "
            f"dim={dim} expected"
        )
    mins = [stats[i][0] for i in range(dim)]
    spans = [stats[i][1] - stats[i][0] for i in range(dim)]
    return mins, spans


def _scale_rows(spark, mins, spans, schema):
    """The reserved (_sq_min, _sq_span) rows both builds commit."""
    return spark.createDataFrame(
        [
            (SQ_MIN_NAME, 0.0, 0, [float(v) for v in mins], None),
            (SQ_SPAN_NAME, 0.0, 0, [float(v) for v in spans], None),
        ],
        schema,
    )


def sq8_build(
    spark,
    store_path: str,
    corpus: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Quantize the corpus and commit the SQ8 index. Two exact
    aggregates (the shared :func:`_corpus_scales`), one HOF
    quantization pass, one snapshot commit. Returns the version."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_write,
    )

    _guard_clean_vectors(corpus, dim, id_col, vec_col, "sq8_build")
    mins, spans = _corpus_scales(corpus, dim, vec_col, "sq8_build")

    rows = corpus.select(
        F.lit(SQ_NAME).alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
        sq8_quantize_expr(F.col(vec_col), mins, spans).alias("code"),
    )
    schema = (
        "name string, ts double, vec_id long, embedding array<double>, "
        "code array<int>"
    )
    return snapshot_write(
        spark,
        store_path,
        rows.unionByName(_scale_rows(spark, mins, spans, schema)),
        mode="overwrite",
        properties={"sq_dim": dim},
    )


def _quantize_probe(vec, mins, spans):
    """Driver-side probe quantization — the same IEEE double ops as
    :func:`sq8_quantize_expr` (floor((x−mn)/sp·255+0.5) clamped), so a
    probe drawn from the corpus gets its exact stored codes."""
    import math

    out = []
    for x, mn, sp in zip(vec, mins, spans):
        if sp > 0.0:
            c = math.floor((float(x) - mn) / sp * 255.0 + 0.5)
            out.append(int(min(max(c, 0.0), 255.0)))
        else:
            out.append(0)
    return out


def _code_topk_kernel(pids, pcodes, k: int, probe_cells=None, n_cells=0):
    """The ONE SQ8 distance kernel (flat and celled search share it —
    a tie-break or masking change lands in both or neither): per Arrow
    batch, ‖q−c‖² for all probes in one vectorized pass via the
    (q−c)² = q·q − 2q·c + c·c expansion (exact in int64: codes ≤ 255),
    per-batch top-``k`` per probe emitted — the global top-k of
    per-batch top-ks is exact, so the shuffle carries
    O(batches·probes·k) rows instead of probes·N. Self-matches excluded
    (the pq_topk rule). ``probe_cells`` (celled mode, with ``n_cells``)
    maps probe id → int64 array of its probed cells; the batch frame
    then must carry a ``cell`` column and each probe scores ONLY rows
    in its own probed cells — membership via one dense (P × n_cells)
    boolean lookup fancy-indexed per batch, NOT a per-probe ``isin``
    (O(P·B) total instead of O(P·B·log n_probe); the difference is the
    whole celled win at large probe batches)."""
    import numpy as np

    allowed = None
    if probe_cells is not None:
        allowed = np.zeros((len(pids), n_cells), dtype=bool)
        for pi, pid in enumerate(pids):
            allowed[pi, probe_cells[int(pid)]] = True

    def _batch_topk(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            C = np.asarray(list(pdf["code"]), dtype="int64")
            allow_b = None
            if allowed is not None:
                cells = pdf["cell"].to_numpy(dtype="int64")
                allow_b = allowed[:, cells]  # (P, B) in one gather
            # (P, B) distances via the dot expansion
            d = (
                (pcodes * pcodes).sum(axis=1)[:, None]
                - 2 * (pcodes @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            out_p, out_n, out_d = [], [], []
            for pi in range(len(pids)):
                mask = ids != pids[pi]  # self-exclusion (the pq_topk rule)
                if allow_b is not None:
                    mask &= allow_b[pi]
                di, ii = d[pi][mask], ids[mask]
                if not len(di):
                    continue
                # tie-stable selection: order by (dist, id) — lexsort keys
                # are last-key-primary
                sel = np.lexsort((ii, di))[:k]
                out_p.extend([pids[pi]] * len(sel))
                out_n.extend(ii[sel])
                out_d.extend(di[sel])
            yield pd.DataFrame(
                {"probe_id": out_p, "neighbor_id": out_n, "dist_u": out_d}
            ).astype({"probe_id": "int64", "neighbor_id": "int64",
                      "dist_u": "int64"})

    return _batch_topk


def sq8_topk(
    spark,
    store_path: str,
    probes: DataFrame,
    k: int = 10,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probes: int = 10_000,
) -> DataFrame:
    """Approximate top-``k`` per probe from the SQ8 index: probes
    quantize driver-side against the version-pinned scales, distances
    are EXACT BIGINT sums of squared code deltas computed by an
    Arrow-batched numpy kernel (one pass over each code row, per-batch
    top-k emitted — the global top-k of per-batch top-ks is exact, so
    the shuffle carries O(batches·probes·k) rows, never probes·N),
    ranked ``(dist_u, neighbor_id)``. Self-matches excluded (the
    pq_topk rule). Returns ``(probe_id, neighbor_id, dist_u, rank)``,
    all-integer and oracle-replayable (the kernel is integer-exact).

    Probes are collected to the driver (full vectors — they quantize
    against the pinned scales and broadcast into the kernel closure),
    so the batch size is a driver-memory bound, not a cluster bound:
    ``max_probes`` caps it with a loud error (the pq.py ivfpq_rerank
    contract, ADVICE r11 / VERDICT r12 #3). Serving batches are
    typically 10s–1000s of probes; raise the cap consciously for
    offline sweeps — don't remove it."""
    from pyspark.sql import Window

    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_version,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if version is None:
        version = snapshot_version(spark, store_path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {store_path}")
    props = snapshot_properties(spark, store_path, version=version)
    if "sq_cells" in props:
        # a celled store keeps its codes under cell=NNNN names, not
        # SQ_NAME — this scan would silently return zero rows
        raise ValueError(
            f"sq8_topk: {store_path} is a celled IVF-SQ8 index "
            f"(sq_cells={props['sq_cells']}) — search it with ivfsq8_topk"
        )
    dim = int(props["sq_dim"])
    mins, spans = _load_scales(spark, store_path, version, dim)

    probe_rows = probes.select(id_col, vec_col).limit(max_probes + 1).collect()
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"sq8_topk: probe batch exceeds max_probes={max_probes} — "
            f"probes are collected to the driver (full vectors) to "
            f"quantize against the pinned scales; split the batch or "
            f"raise the cap consciously"
        )
    if not probe_rows:
        raise ValueError("probes is empty")
    import numpy as np

    pids = np.asarray([r[id_col] for r in probe_rows], dtype=np.int64)
    pcodes = np.asarray(
        [_quantize_probe(list(r[vec_col]), mins, spans) for r in probe_rows],
        dtype=np.int64,
    )

    # distance stage: Arrow-batched numpy kernel (the similarity.py
    # matmul-kernel convention), NOT a position explode — the explode
    # form shuffles dim·N narrow rows and MEASURED 92.8 s at 1M vectors
    # (scripts/stress_sq8.py, round 12); the shared _code_topk_kernel
    # reads each code row once and emits only per-batch top-k rows.
    codes = snapshot_read(
        spark, store_path, version=version, names=[SQ_NAME]
    ).select("vec_id", "code")
    dists = codes.mapInPandas(
        _code_topk_kernel(pids, pcodes, k),
        "probe_id long, neighbor_id long, dist_u long",
    )
    order = [F.col("dist_u").asc(), F.col("neighbor_id").asc()]
    w_final = Window.partitionBy("probe_id").orderBy(*order)
    return (
        dists.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "dist_u", "rank")
    )


def sq8_rerank_topk(
    spark,
    store_path: str,
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    k_adc: int = 50,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probes: int = 10_000,
) -> DataFrame:
    """The refinement shape (IVFADC+R, Jégou et al. 2011 §V — the same
    contract as :func:`pq.ivfpq_rerank`, including its guard rails):
    SQ8-approximate top-``k_adc`` candidates, raw vectors joined back
    from the lake, exact squared-L2 re-rank on the 9-dp grid, ties →
    neighbor id. Candidate-bounded: the exact stage touches
    ``probes × k_adc`` raw rows, isin-pruned below the corpus
    projection. Probes are pinned ONCE (collected, ``max_probes``-capped
    — the ivfpq_rerank rules) and the SAME pinned rows drive the
    approximate cut and the exact join, so a non-deterministic probes
    plan cannot rank candidates against vectors that never produced
    them; the shared completeness gate raises on a corpus missing
    indexed candidates or on duplicate ids."""
    from pyspark.sql import Window

    from prometheus_parquet_server_spark.pipeline.pq import _rerank_gate

    if k < 1 or k_adc < k:
        raise ValueError(f"need k_adc >= k >= 1, got k={k} k_adc={k_adc}")
    probes_proj = probes.select(id_col, vec_col)
    probe_rows = probes_proj.limit(max_probes + 1).collect()
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"sq8_rerank_topk: probe batch exceeds max_probes={max_probes} "
            f"— probes are collected to the driver (full vectors) to pin "
            f"one evaluation for both stages; split the batch or raise "
            f"the cap consciously"
        )
    pinned = spark.createDataFrame(probe_rows, schema=probes_proj.schema)
    cand = sq8_topk(
        spark, store_path, pinned, k=k_adc, version=version,
        id_col=id_col, vec_col=vec_col, max_probes=max_probes,
    ).select("probe_id", "neighbor_id").localCheckpoint()
    cand_rows = cand.collect()
    n_cand = len(cand_rows)
    cand_ids = sorted({r["neighbor_id"] for r in cand_rows})

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    pv = pinned.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    if len(cand_ids) <= 100_000:
        nv = nv.filter(F.col("neighbor_id").isin(cand_ids))
    d = F.round(
        _dot(F.col("_pv"), F.col("_pv"))
        - F.lit(2.0) * _dot(F.col("_pv"), F.col("_nv"))
        + _dot(F.col("_nv"), F.col("_nv")),
        9,
    )
    exact = (
        F.broadcast(cand.join(F.broadcast(pv), "probe_id"))
        .join(nv, "neighbor_id")
        .select("probe_id", "neighbor_id", d.alias("_d"))
    ).localCheckpoint()
    _rerank_gate(exact, cand_ids, n_cand, op="sq8_rerank_topk", id_col=id_col)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank")
    )


def sq8_append(
    spark,
    store_path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incrementally index ``new_vectors`` with the FROZEN per-dimension
    scales (read at one pinned version) — the growing-corpus half of
    the family, O(new) commit cost with history carried by manifest
    reference. The standard trade (the ivfpq_append / Faiss ``add``
    rule): a new vector outside the build-time [min, max] range CLAMPS
    to the boundary code until the next :func:`sq8_build` rebuild (an
    atomic overwrite). ``txn=(app_id, batch_id)`` idempotence; the
    commit is CAS-pinned (``require_parent``) to the version the scales
    were read at, so a racing rebuild raises ``ConcurrentWriteError``
    instead of committing codes quantized against dead scales. Returns
    the new version."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_version,
        snapshot_write,
    )

    version = snapshot_version(spark, store_path)
    if version is None:
        raise FileNotFoundError(
            f"no SQ8 index at {store_path} — sq8_build first"
        )
    props = snapshot_properties(spark, store_path, version=version)
    if "sq_cells" in props:
        # the fourth corner of the flat/celled cross-guard (round-13
        # review): this append would commit rows under name='sq' that
        # NO search on a celled store ever scans — silent data loss
        raise ValueError(
            f"sq8_append: {store_path} is a celled IVF-SQ8 index — "
            f"append with ivfsq8_append"
        )
    dim = int(props["sq_dim"])
    mins, spans = _load_scales(spark, store_path, version, dim)
    _guard_clean_vectors(new_vectors, dim, id_col, vec_col, "sq8_append")
    rows = new_vectors.select(
        F.lit(SQ_NAME).alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
        sq8_quantize_expr(F.col(vec_col), mins, spans).alias("code"),
    )
    return snapshot_write(
        spark,
        store_path,
        rows,
        mode="append",
        txn=txn,
        require_parent=version,
    )


def stream_sq8_ingest(
    vec_stream: DataFrame,
    spark,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    app_id: str = "stream_sq8_ingest",
):
    """Streaming vector ingest into the persisted SQ8 index — the
    stream_ivfpq_ingest twin on the SHARED ``stream_txn_append``
    scaffold: each micro-batch quantizes against the frozen scales and
    appends with ``txn=(app_id, batch_id)`` (redelivered batches are
    version-preserving no-ops); a racing rebuild raises on the CAS pin
    and Structured Streaming's retry re-reads the NEW scales. Requires
    an existing index; one writer per checkpoint; new app_id on
    checkpoint reset."""
    from prometheus_parquet_server_spark.streaming.ingest import (
        stream_txn_append,
    )

    def _append(batch_df: DataFrame, txn: tuple[str, int]) -> None:
        sq8_append(
            spark, store_path, batch_df, id_col=id_col, vec_col=vec_col,
            txn=txn,
        )

    return stream_txn_append(
        vec_stream, f"{store_path}/_stream_checkpoint_sq8", app_id, _append
    )


#: reserved centroid row name in a CELLED SQ8 index — literally the
#: ann_store constant (sorts apart from cell=NNNN, prunes to its own
#: files); single-sourced so the cross-family reserved-name convention
#: cannot drift (round-13 review)
from prometheus_parquet_server_spark.pipeline.ann_store import (  # noqa: E402
    CENTROID_NAME as IVFSQ_CENTROID_NAME,
)


def ivfsq8_build(
    spark,
    store_path: str,
    corpus: DataFrame,
    n_cells: int = 16,
    n_probe_default: int = 4,
    kmeans_iterations: int = 0,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """IVF-SQ8 — the CELLED variant of the flat SQ8 index [Faiss's
    ``IVF..,SQ8`` factory composition, public knowledge]: the flat
    index's one deliberate scale caveat is its O(N) code scan per probe
    batch (EXPLAIN §49 / VERDICT r12 — "IVF-PQ remains the celled
    answer"); this closes it INSIDE the SQ8 family. Coarse Voronoi
    cells come from the proven IVF machinery
    (:func:`similarity.kmeans_centroids` — ``kmeans_iterations=0`` is
    the fully-SQL-replayable lowest-id-vectors contract the graded
    ivf/ivf_store rows pin; assignment through the same
    ``centroid_cells_udf`` Arrow kernel with its ROUND(cos, 9) + lowest
    cell-id tie-break), while the per-vector payload stays the
    training-free SQ8 codes quantized against GLOBAL per-dimension
    MIN/MAX scales — so the whole index (cells + codes) still replays
    in plain SQL with zero iteration pinning beyond the centroid
    convention, unlike IVF-PQ's trained codebooks.

    Store layout (the ann_store/ivfpq conventions): code rows under
    ``name='cell=NNNN'`` — ``_write_data_files`` range-clusters by
    name, so a search probing ``n_probe`` cells prunes the scan AT THE
    MANIFEST to ~that fraction of index files before any footer opens;
    centroids as reserved ``_centroid`` data rows (vec_id = cell id,
    full embedding); scales as the family's ``_sq_min``/``_sq_span``
    rows; geometry pinned as ``sq_dim``/``sq_cells``/
    ``sq_n_probe_default`` properties. Rebuild = overwrite commit; time
    travel searches an old index. Returns the committed version."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        centroid_cells_udf,
        kmeans_centroids,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_write,
    )

    if n_cells > 9999:
        raise ValueError("ivfsq8_build: cell names are %04d — n_cells <= 9999")
    _guard_clean_vectors(corpus, dim, id_col, vec_col, "ivfsq8_build")
    centroids = kmeans_centroids(
        corpus, n_cells, kmeans_iterations, dim, id_col, vec_col
    )
    mins, spans = _corpus_scales(corpus, dim, vec_col, "ivfsq8_build")

    cell = F.format_string(
        "cell=%04d", centroid_cells_udf(centroids, 1)(F.col(vec_col))[0]
    )
    rows = corpus.select(
        cell.alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
        sq8_quantize_expr(F.col(vec_col), mins, spans).alias("code"),
    )
    schema = (
        "name string, ts double, vec_id long, embedding array<double>, "
        "code array<int>"
    )
    cent_rows = spark.createDataFrame(
        [
            (IVFSQ_CENTROID_NAME, 0.0, i, [float(x) for x in c], None)
            for i, c in enumerate(centroids)
        ],
        schema,
    )
    reserved = _scale_rows(spark, mins, spans, schema).unionByName(cent_rows)
    return snapshot_write(
        spark,
        store_path,
        rows.unionByName(reserved),
        mode="overwrite",
        properties={
            "sq_dim": dim,
            # len(centroids), NOT n_cells: a corpus smaller than n_cells
            # yields fewer centroids, and the pinned geometry (the
            # [1, sq_cells] n_probe validation range) must match the
            # committed _centroid rows exactly (ADVICE r13)
            "sq_cells": len(centroids),
            "sq_n_probe_default": n_probe_default,
        },
    )


def ivfsq8_topk(
    spark,
    store_path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe: int | None = None,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probes: int = 10_000,
) -> DataFrame:
    """Approximate top-``k`` per probe from the CELLED SQ8 index: probes
    pin once (collected under the family's ``max_probes`` contract),
    assign to their ``n_probe`` best cells through the SAME
    ``centroid_cells_udf`` kernel the build used (ROUND(cos, 9), lowest
    cell-id ties — the graded-ivf convention, so the oracle replays the
    probe routing too), the corpus scan is MANIFEST-PRUNED to the union
    of probed cells, and the shared :func:`_code_topk_kernel` scores
    each probe ONLY against rows in its own probed cells (exact BIGINT
    code distances, ties → neighbor id, self excluded). Per-probe work
    is ~``n_probe / n_cells`` of the flat scan — the celled serving
    shape — at the usual IVF recall trade (a true neighbor in an
    unprobed cell is invisible; raise ``n_probe`` toward ``n_cells`` to
    recover the flat index's answer EXACTLY, which the tests pin).
    Returns ``(probe_id, neighbor_id, dist_u, rank)``, all-integer."""
    from pyspark.sql import Window

    from prometheus_parquet_server_spark.pipeline.similarity import (
        _centroid_unit_matrix,
        centroid_cells_numpy,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_version,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if version is None:
        version = snapshot_version(spark, store_path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {store_path}")
    props = snapshot_properties(spark, store_path, version=version)
    if "sq_cells" not in props:
        raise ValueError(
            f"ivfsq8_topk: {store_path} is a FLAT SQ8 index (no sq_cells "
            f"property) — search it with sq8_topk"
        )
    dim = int(props["sq_dim"])
    n_cells = int(props["sq_cells"])
    if n_probe is None:
        n_probe = int(props["sq_n_probe_default"])
    if not (1 <= n_probe <= n_cells):
        raise ValueError(
            f"n_probe must be in [1, {n_cells}], got {n_probe}"
        )
    mins, spans = _load_scales(spark, store_path, version, dim)
    cent_rows = (
        snapshot_read(
            spark, store_path, version=version, names=[IVFSQ_CENTROID_NAME]
        )
        .orderBy("vec_id")
        .collect()
    )
    if not cent_rows:
        raise FileNotFoundError(
            f"no IVF-SQ8 index (no {IVFSQ_CENTROID_NAME} rows) at {store_path}"
        )
    centroids = [list(r["embedding"]) for r in cent_rows]

    probes_proj = probes.select(id_col, vec_col)
    probe_rows = probes_proj.limit(max_probes + 1).collect()
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"ivfsq8_topk: probe batch exceeds max_probes={max_probes} — "
            f"probes are collected to the driver (full vectors) to "
            f"quantize and route; split the batch or raise the cap "
            f"consciously"
        )
    if not probe_rows:
        raise ValueError("probes is empty")
    import numpy as np

    pids = np.asarray([r[id_col] for r in probe_rows], dtype=np.int64)
    pcodes = np.asarray(
        [_quantize_probe(list(r[vec_col]), mins, spans) for r in probe_rows],
        dtype=np.int64,
    )
    # probe routing through the literally-shared assignment core —
    # DRIVER-SIDE (the vectors are already collected; spinning a Spark
    # job + two Arrow round-trips to run one tiny matmul was a round-13
    # review finding): same ROUND(cos, 9) + lowest-cell-id math the
    # build's Arrow UDF runs, so routing and the SQL replay cannot drift
    cunit = _centroid_unit_matrix(centroids)
    pvecs = np.asarray(
        [list(r[vec_col]) for r in probe_rows], dtype=np.float64
    )
    order = centroid_cells_numpy(pvecs, cunit, n_probe)
    probe_cells = {
        int(pid): np.asarray(sorted(int(c) for c in row), dtype=np.int64)
        for pid, row in zip(pids, order)
    }
    probed_names = sorted(
        {f"cell={c:04d}" for cs in probe_cells.values() for c in cs}
    )

    codes = snapshot_read(
        spark, store_path, version=version, names=probed_names
    ).select(
        "vec_id",
        "code",
        F.regexp_extract("name", r"cell=(\d+)", 1).cast("long").alias("cell"),
    )
    dists = codes.mapInPandas(
        _code_topk_kernel(
            pids, pcodes, k, probe_cells=probe_cells, n_cells=n_cells
        ),
        "probe_id long, neighbor_id long, dist_u long",
    )
    order = [F.col("dist_u").asc(), F.col("neighbor_id").asc()]
    w_final = Window.partitionBy("probe_id").orderBy(*order)
    return (
        dists.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "dist_u", "rank")
    )


def ivfsq8_append(
    spark,
    store_path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incrementally index ``new_vectors`` into the CELLED SQ8 store —
    the growing-corpus half of the ivfsq8 family (every index family
    here has one: ivf_append, ivfpq_append, sq8_append): the batch
    encodes with the FROZEN per-dimension scales and routes through the
    FROZEN centroids (both read at one pinned version), O(new) commit
    cost. The standard frozen-quantizer trades (the Faiss ``add``
    rule): out-of-range values CLAMP to boundary codes, and cell
    geometry drifts from the true Voronoi optimum until the next
    :func:`ivfsq8_build` rebuild. ``txn=(app_id, batch_id)``
    idempotence; the commit is CAS-pinned (``require_parent``) to the
    version the quantizers were read at, so a racing rebuild raises
    instead of committing codes against dead scales/centroids. Returns
    the new version."""
    from prometheus_parquet_server_spark.pipeline.similarity import (
        centroid_cells_udf,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    version = snapshot_version(spark, store_path)
    if version is None:
        raise FileNotFoundError(
            f"no IVF-SQ8 index at {store_path} — ivfsq8_build first"
        )
    props = snapshot_properties(spark, store_path, version=version)
    if "sq_cells" not in props:
        raise ValueError(
            f"ivfsq8_append: {store_path} is a FLAT SQ8 index — append "
            f"with sq8_append"
        )
    dim = int(props["sq_dim"])
    mins, spans = _load_scales(spark, store_path, version, dim)
    cent_rows = (
        snapshot_read(
            spark, store_path, version=version, names=[IVFSQ_CENTROID_NAME]
        )
        .orderBy("vec_id")
        .collect()
    )
    if not cent_rows:
        # mirror ivfsq8_topk's guard (ADVICE r13): a store with the
        # sq_cells property but missing _centroid rows (partial
        # corruption) must fail loudly here, not with an opaque numpy
        # shape error deep inside the routing UDF
        raise FileNotFoundError(
            f"no IVF-SQ8 index (no {IVFSQ_CENTROID_NAME} rows) at {store_path}"
        )
    centroids = [list(r["embedding"]) for r in cent_rows]
    _guard_clean_vectors(new_vectors, dim, id_col, vec_col, "ivfsq8_append")
    cell = F.format_string(
        "cell=%04d", centroid_cells_udf(centroids, 1)(F.col(vec_col))[0]
    )
    rows = new_vectors.select(
        cell.alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
        sq8_quantize_expr(F.col(vec_col), mins, spans).alias("code"),
    )
    return snapshot_write(
        spark,
        store_path,
        rows,
        mode="append",
        txn=txn,
        require_parent=version,
    )
