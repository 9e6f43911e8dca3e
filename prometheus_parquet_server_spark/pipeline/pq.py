"""Product quantization (PQ) for embedding compression + ADC search.

Published method (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011 — public knowledge): split
each ``dim``-vector into ``m`` subvectors, train a ``k``-codeword
Euclidean codebook per subspace, store each vector as ``m`` small codes
(m bytes at k=256 — a 32× compression of a float64[64] embedding), and
answer queries by Asymmetric Distance Computation: one (m × k) lookup
table per probe, each candidate scored by ``m`` table lookups instead
of a ``dim``-wide dot product. The memory path that keeps a billion
vectors searchable per executor; composes with the IVF cell pruning in
similarity.py (IVF-PQ is exactly these two stacked).

The reference engine has no vector surface at all (SURVEY.md §2.7);
this extends the repo's ANN family (brute / LSH / IVF / int8) with the
compressed-domain tier.

Determinism/grading contract (the house rules):

- codebook init = subvectors of the ``k`` lowest-id corpus vectors
  (TakeOrdered — reproducible, and the oracle can replay iterations=0
  exactly, the kmeans_centroids/cluster_topics convention);
- Lloyd means are exact DECIMAL sums (order-free) normalized once;
- code assignment ranks on squared L2 ROUNDED TO 9 DP with ties to the
  lowest code id (the centroid-kernel convention — cross-engine ulp
  drift cannot flip an assignment off the 1e-9 grid);
- ADC distances are per-subspace terms quantized to BIGINT micro-units
  and summed as exact integers (the unit-sum contract), so the graded
  output is integer-exact given the codes.

Scale shape: training touches the corpus once per iteration (one
mapInPandas assignment + one (m·k)-bounded hash aggregate of decimal
partials); encoding is one Arrow pass, zero shuffle; ADC search
broadcasts the probes' lookup tables and scans codes map-side, with the
salted two-stage top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "pq_topk", "ivfpq_topk", "ivfpq_build", "ivfpq_search", "ivfpq_append", "stream_ivfpq_ingest", "opq_train", "opq_topk"]


def _check_geometry(dim: int, m: int, k: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim: dim={dim}, m={m}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return dim // m


def _sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared L2 from each row of x to each row of c, via the
    dot-product expansion (|x|² − 2x·c + |c|²) — the same decomposition
    the DuckDB oracle evaluates with list_dot_product, so the two agree
    far below the 1e-9 assignment grid."""
    return (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )


def _assign_codes_udf(
    codebook: list[list[list[float]]], sub_dim: int, as_binary: bool = False
):
    """Arrow kernel: embedding → m codes (argmin squared L2 per subspace,
    9-dp rounded, ties to the lowest code id). ``as_binary`` emits the
    codes as ONE m-byte binary value instead of array<int> (requires
    k_codes ≤ 256). NOTE the measurement went AGAINST the obvious
    intuition: parquet dictionary/bit-packs int-list code values to
    ~1 byte already, and BYTE_ARRAY cells pay per-value length overhead,
    so binary codes measured 1.136× LARGER at rest at 1M vectors
    (scripts/stress_ivfpq.py production_geometry; BASELINE.md round-11)
    — which is why ``int`` remains the store default and binary is an
    opt-in, result-identical variant."""
    from pyspark.sql.functions import pandas_udf

    cmats = [np.asarray(cb, dtype=np.float64) for cb in codebook]

    def _argmins(v: pd.Series) -> np.ndarray:
        mat = np.array([np.asarray(x, dtype=np.float64) for x in v])
        out = np.empty((len(mat), len(cmats)), dtype=np.int64)
        for s, cm in enumerate(cmats):
            sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
            d = np.round(_sq_dists(sub, cm), 9)
            out[:, s] = np.argmin(d, axis=1)  # first occurrence = lowest id
        return out

    if as_binary:

        @pandas_udf("binary")
        def _codes_bin(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            out = _argmins(v)
            return pd.Series([bytes(row.astype(np.uint8)) for row in out])

        return _codes_bin

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        out = _argmins(v)
        return pd.Series([[int(c) for c in row] for row in out])

    return _codes


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the per-subspace Euclidean codebooks: ``codebook[s][j]`` is
    the j-th codeword of subspace s (a list of ``dim/m`` floats).
    ``iterations=0`` returns the deterministic init (the oracle-replayable
    state); each Lloyd round is one corpus pass — an Arrow assignment plus
    a single (m·k)-row-bounded decimal-mean aggregate over the exploded
    (subspace, code) keys. Empty cells keep their previous codeword."""
    sub_dim = _check_geometry(dim, m, k)
    init = [
        list(r[vec_col])
        for r in corpus.orderBy(F.col(id_col).asc()).limit(k).collect()
    ]
    if len(init) < k:
        raise ValueError(f"corpus has {len(init)} vectors; k={k} codewords need k")
    codebook = [
        [v[s * sub_dim : (s + 1) * sub_dim] for v in init] for s in range(m)
    ]

    for _ in range(max(0, iterations)):
        codes = corpus.withColumn(
            "_codes", _assign_codes_udf(codebook, sub_dim)(F.col(vec_col))
        )
        # explode to (subspace, code, subvector) and take exact decimal
        # means — ONE shuffle of m·k × sub_dim decimal partials per round
        sub_rows = codes.select(
            F.posexplode("_codes").alias("_s", "_c"),
            F.col(vec_col).alias("_v"),
        ).select(
            "_s",
            "_c",
            *[
                F.element_at(
                    "_v", (F.col("_s") * sub_dim + i + 1).cast("int")
                ).cast("double").alias(f"x{i}")
                for i in range(sub_dim)
            ],
        )
        aggs = []
        for i in range(sub_dim):
            c = F.col(f"x{i}")
            dec = c.cast("decimal(38,18)")
            aggs.append(F.sum(dec).alias(f"c{i}"))
            aggs.append(F.count(F.when(c.isNull() | dec.isNull(), 1)).alias(f"b{i}"))
        rows = sub_rows.groupBy("_s", "_c").agg(F.count(F.lit(1)).alias("_n"), *aggs).collect()
        if any(r[f"b{i}"] for r in rows for i in range(sub_dim)):
            raise ValueError(
                "pq_train: NULL, short-array or non-finite embedding "
                "component — clean the corpus before training"
            )
        new: dict[tuple[int, int], list[float]] = {}
        for r in rows:
            new[(r["_s"], r["_c"])] = [
                float(r[f"c{i}"]) / r["_n"] for i in range(sub_dim)
            ]
        codebook = [
            [new.get((s, j), codebook[s][j]) for j in range(k)] for s in range(m)
        ]
    return codebook


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress: ``(id_col, code array<int> of length m)`` — one Arrow
    pass, zero shuffle. The codes column is the store format (m bytes per
    vector at k ≤ 256 when persisted as tinyint)."""
    m = len(codebook)
    sub_dim = len(codebook[0][0])
    return corpus.select(
        F.col(id_col),
        _assign_codes_udf(codebook, sub_dim)(F.col(vec_col)).alias("code"),
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """Asymmetric Distance Computation search: for each probe, the ``k``
    nearest corpus vectors by PQ-approximated squared L2 (ties →
    neighbor id asc; the probe itself excluded when ids collide).

    Per probe a (m × k_codes) table of per-subspace squared distances is
    quantized to BIGINT micro-units; each candidate's distance is the
    EXACT integer sum of its m table entries (order-free, the unit-sum
    contract), so output ``dist_u`` is all-integer. Probes and tables
    broadcast inside the Arrow kernel closure; the corpus codes stream
    map-side; top-k is the salted two-stage pattern.

    Returns ``(probe_id, neighbor_id, dist_u, rank)``."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = len(codebook)
    sub_dim = len(codebook[0][0])
    cmats = [np.asarray(cb, dtype=np.float64) for cb in codebook]
    probe_rows = probes.select(id_col, vec_col).collect()
    if not probe_rows:
        raise ValueError("probes is empty")
    probe_ids = [r[id_col] for r in probe_rows]
    # per-probe (m × k_codes) unit tables: floor(d·scale + 0.5) as int64
    tables = []
    for r in probe_rows:
        pv = np.asarray(r[vec_col], dtype=np.float64)
        t = np.stack(
            [
                _sq_dists(pv[s * sub_dim : (s + 1) * sub_dim][None, :], cmats[s])[0]
                for s in range(m)
            ]
        )
        tables.append(np.floor(t * float(unit_scale) + 0.5).astype(np.int64))

    codes = pq_encode(corpus, codebook, id_col=id_col, vec_col=vec_col)

    out_schema = "probe_id long, neighbor_id long, dist_u long"

    def _adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            code_mat = np.array([np.asarray(c, dtype=np.int64) for c in pdf["code"]])
            ids = pdf[id_col].to_numpy()
            frames = []
            for pid, tab in zip(probe_ids, tables):
                # gather: dist_u[i] = Σ_s tab[s, code[i, s]] — exact int64
                d = tab[np.arange(m)[None, :], code_mat].sum(axis=1)
                keep = ids != pid  # self-match excluded
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": ids[keep],
                            "dist_u": d[keep],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(_adc, out_schema)
    order = [F.col("dist_u").asc(), F.col("neighbor_id").asc()]
    w_part = Window.partitionBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(salt_buckets))
    ).orderBy(*order)
    partial = scored.withColumn("_pr", F.row_number().over(w_part)).filter(
        F.col("_pr") <= k
    )
    w_final = Window.partitionBy("probe_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "dist_u", "rank")
    )


def _cells_and_residuals_udf(coarse: list[list[float]]):
    """Arrow kernel: embedding → struct(cell int, resid array<double>) —
    nearest coarse centroid by 9-dp-rounded squared L2 (ties → lowest
    cell id) and the residual x − c_cell, in one pass."""
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(coarse, dtype=np.float64)

    @pandas_udf("struct<cell: int, resid: array<double>>")
    def _cr(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cell": [], "resid": []})
        mat = np.array([np.asarray(x, dtype=np.float64) for x in v])
        d = np.round(_sq_dists(mat, cmat), 9)
        cells = np.argmin(d, axis=1)
        resid = mat - cmat[cells]
        return pd.DataFrame(
            {
                "cell": cells.astype(np.int32),
                "resid": [[float(x) for x in row] for row in resid],
            }
        )

    return _cr


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    k_codes: int = 8,
    coarse_iterations: int = 0,
    pq_iterations: int = 0,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """IVF-PQ: the two scale levers stacked, exactly as published
    [Jégou et al. 2011 §IV] — an L2 coarse quantizer prunes the corpus to
    ``n_probe`` of ``n_cells`` Voronoi cells per probe, and within cells
    candidates are scored by ADC over RESIDUAL codes (``PQ(x − c_cell)``
    — residual energy is far below raw energy, so the same code budget
    quantizes much finer). This is the canonical billion-vector serving
    shape: memory per vector is ``m`` code bytes + a cell id, and a query
    touches ``n_probe/n_cells`` of the corpus with table lookups only.

    Determinism: the coarse quantizer is :func:`pq_train` with ``m=1``
    (one subspace = whole vector — the same decimal-exact Lloyd);
    residual codebooks come from :func:`pq_train` on the residual frame;
    assignments rank on the 9-dp grid; ADC terms are BIGINT micro-units
    summed exactly. ``*_iterations=0`` is the oracle-replayable setting.

    Returns ``(probe_id, neighbor_id, dist_u, rank)`` (all-integer
    distances; ties → neighbor id; self-matches excluded)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (1 <= n_probe <= n_cells):
        raise ValueError(f"n_probe must be in [1, {n_cells}], got {n_probe}")
    coarse = pq_train(
        corpus, m=1, k=n_cells, iterations=coarse_iterations, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )[0]

    cr = corpus.select(
        F.col(id_col),
        _cells_and_residuals_udf(coarse)(F.col(vec_col)).alias("_cr"),
    ).select(id_col, F.col("_cr.cell").alias("cell"), F.col("_cr.resid").alias("resid"))
    # localCheckpoint, not cache(): the residual frame feeds two passes
    # (codebook training + encoding), and a cache entry would sit in the
    # CacheManager forever — this function has no safe point to unpersist
    # (the returned lazy plan still reads it). The checkpointed RDD is
    # instead released by the ContextCleaner once the caller drops the
    # result, so repeated calls in a long-lived session stay bounded.
    cr = cr.localCheckpoint()
    codebook = pq_train(
        cr, m=m, k=k_codes, iterations=pq_iterations, dim=dim,
        id_col=id_col, vec_col="resid",
    )
    sub_dim = dim // m
    codes = cr.select(
        F.col(id_col),
        "cell",
        _assign_codes_udf(codebook, sub_dim)(F.col("resid")).alias("code"),
    )

    probe_rows = probes.select(id_col, vec_col).collect()
    if not probe_rows:
        raise ValueError("probes is empty")
    probed_cells, tables = _probe_cell_tables(
        probe_rows, coarse, codebook, n_probe, unit_scale, id_col, vec_col
    )
    return _ivfpq_rank(
        codes, probed_cells, tables, m=m, k=k,
        salt_buckets=salt_buckets, id_col=id_col,
    )


def _probe_cell_tables(
    probe_rows,
    coarse: list[list[float]],
    codebook: list[list[list[float]]],
    n_probe: int,
    unit_scale: float,
    id_col: str,
    vec_col: str,
):
    """Per probe: the ``n_probe`` nearest coarse cells (9-dp grid, stable
    ties) and, per probed cell, the residual-query (m × k_codes) ADC
    table quantized to BIGINT micro-units. Shared by the one-shot
    operator and the persisted-index search so probing cannot drift."""
    cmat = np.asarray(coarse, dtype=np.float64)
    cmats = [np.asarray(cb, dtype=np.float64) for cb in codebook]
    m = len(codebook)
    sub_dim = len(codebook[0][0])
    tables: dict[tuple[int, int], np.ndarray] = {}
    probed_cells: dict[int, list[int]] = {}
    for r in probe_rows:
        pid = r[id_col]
        pv = np.asarray(r[vec_col], dtype=np.float64)
        d = np.round(_sq_dists(pv[None, :], cmat)[0], 9)
        order = np.argsort(d, kind="stable")[:n_probe]
        probed_cells[pid] = [int(c) for c in order]
        for c in probed_cells[pid]:
            qr = pv - cmat[c]
            t = np.stack(
                [
                    _sq_dists(
                        qr[s * sub_dim : (s + 1) * sub_dim][None, :],
                        cmats[s],
                    )[0]
                    for s in range(m)
                ]
            )
            tables[(pid, c)] = np.floor(
                t * float(unit_scale) + 0.5
            ).astype(np.int64)
    return probed_cells, tables


def _ivfpq_rank(
    codes: DataFrame,
    probed_cells: dict,
    tables: dict,
    m: int,
    k: int,
    salt_buckets: int,
    id_col: str,
    binary_codes: bool = False,
) -> DataFrame:
    """The shared ADC ranking half of IVF-PQ: PRECOMPUTED probe tables
    (one collect, done by the caller — ivfpq_search prunes the code scan
    with the same probe set it ranks, so a non-deterministic probes plan
    cannot drift between the two) broadcast in the kernel closure,
    (id, cell, code) rows scanned map-side, exact integer distances,
    salted two-stage top-k."""
    from pyspark.sql import Window

    out_schema = "probe_id long, neighbor_id long, dist_u long"
    midx = np.arange(m)

    def _adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            if binary_codes:
                # production at-rest format: one m-byte value per vector
                code_mat = np.frombuffer(
                    b"".join(pdf["code"]), dtype=np.uint8
                ).reshape(len(pdf), m).astype(np.int64)
            else:
                code_mat = np.array(
                    [np.asarray(c, dtype=np.int64) for c in pdf["code"]]
                )
            frames = []
            for pid, pcells in probed_cells.items():
                for c in pcells:
                    mask = (cells == c) & (ids != pid)
                    if not mask.any():
                        continue
                    tab = tables[(pid, c)]
                    d = tab[midx[None, :], code_mat[mask]].sum(axis=1)
                    frames.append(
                        pd.DataFrame(
                            {
                                "probe_id": pid,
                                "neighbor_id": ids[mask],
                                "dist_u": d,
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(_adc, out_schema)
    order_by = [F.col("dist_u").asc(), F.col("neighbor_id").asc()]
    w_part = Window.partitionBy(
        "probe_id", F.pmod(F.hash("neighbor_id"), F.lit(salt_buckets))
    ).orderBy(*order_by)
    partial = scored.withColumn(
        "_pr", F.row_number().over(w_part)
    ).filter(F.col("_pr") <= k)
    w_final = Window.partitionBy("probe_id").orderBy(*order_by)
    return (
        partial.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "dist_u", "rank")
    )


#: reserved names in the persisted index — never legal cell names
COARSE_NAME = "_coarse"
CODEBOOK_NAME = "_codebook"
ROTATION_NAME = "_rotation"


def ivfpq_build(
    spark,
    store_path: str,
    corpus: DataFrame,
    n_cells: int = 8,
    n_probe_default: int = 2,
    m: int = 8,
    k_codes: int = 8,
    coarse_iterations: int = 0,
    pq_iterations: int = 0,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    opq_iterations: int = 0,
    opq_pq_iterations: int = 1,
    code_type: str = "int",
) -> int:
    """Persist the IVF-PQ index in the snapshot store (the ann_store
    pattern — cells are the ``name`` axis, quantizers are data rows):

    - corpus rows ``(name="cell=NNNN", ts=0.0, vec_id, embedding=NULL,
      code)`` — the per-vector payload is ONLY the m small codes (the
      raw embedding column is deliberately not stored; at k_codes ≤ 256
      that is m bytes + a cell id per vector, the compressed-at-rest
      serving shape);
    - coarse centroids under the reserved name ``_coarse`` (vec_id =
      cell id, full embedding) and residual codewords under
      ``_codebook`` (vec_id = subspace·k_codes + code id, the sub_dim
      codeword as the embedding column);
    - geometry pinned as manifest properties (``pq_m``, ``pq_k``,
      ``pq_cells``, ``pq_dim``) — a search with mismatched expectations
      reads the pinned values instead of guessing.

    ``_write_data_files`` range-clusters by name, so a search probing
    ``n_probe`` cells prunes the scan at the MANIFEST to roughly that
    fraction of the index files. Rebuild = overwrite commit; time travel
    searches an old index. Returns the committed version.

    ``opq_iterations > 0`` builds the OPQ-pretransformed variant (the
    Faiss ``OPQ..,IVF..,PQ..`` factory composition — public knowledge):
    an orthonormal rotation is learned on the corpus
    (:func:`opq_train`), the ENTIRE index is built in the rotated space
    (rotation preserves L2, so coarse geometry is unchanged while the
    residual subspace split aligns with the data), and the rotation
    matrix persists as reserved ``_rotation`` data rows beside
    ``_coarse``/``_codebook`` — version-pinned with the quantizers, so
    the learned-rotation index survives build→search round trips and
    time travel searches an old index with ITS OWN rotation
    (VERDICT r9 Next #6). :func:`ivfpq_search` rotates probes
    driver-side; :func:`ivfpq_append` rotates new vectors with the
    pinned R before encoding."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_write,
    )

    if n_cells > 9999:
        raise ValueError("ivfpq_build: cell names are %04d — n_cells <= 9999")
    if code_type not in ("int", "binary"):
        raise ValueError(
            f"code_type must be 'int' or 'binary', got {code_type!r}"
        )
    if code_type == "binary" and k_codes > 256:
        raise ValueError(
            f"code_type='binary' stores one byte per code — k_codes must "
            f"be <= 256, got {k_codes}"
        )
    rotation = None
    if opq_iterations > 0:
        rotation, _ = opq_train(
            corpus, m=m, k=k_codes, iterations=opq_iterations,
            pq_iterations=opq_pq_iterations, dim=dim,
            id_col=id_col, vec_col=vec_col,
            final_fit=False,  # residual books retrain below; skip the
            # flat-codebook pairing pass (one full Lloyd over the corpus)
        )
        corpus = corpus.select(
            F.col(id_col),
            _rotate_udf(np.asarray(rotation, dtype=np.float64))(
                F.col(vec_col)
            ).alias(vec_col),
        )
    coarse = pq_train(
        corpus, m=1, k=n_cells, iterations=coarse_iterations, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )[0]
    cr = corpus.select(
        F.col(id_col),
        _cells_and_residuals_udf(coarse)(F.col(vec_col)).alias("_cr"),
    ).select(
        id_col, F.col("_cr.cell").alias("cell"), F.col("_cr.resid").alias("resid")
    ).localCheckpoint()
    codebook = pq_train(
        cr, m=m, k=k_codes, iterations=pq_iterations, dim=dim,
        id_col=id_col, vec_col="resid",
    )
    sub_dim = dim // m
    as_binary = code_type == "binary"
    rows = cr.select(
        F.format_string("cell=%04d", F.col("cell")).alias("name"),
        F.lit(0.0).alias("ts"),
        F.col(id_col).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
        _assign_codes_udf(codebook, sub_dim, as_binary=as_binary)(
            F.col("resid")
        ).alias("code"),
    )
    schema = (
        "name string, ts double, vec_id long, embedding array<double>, "
        f"code {'binary' if as_binary else 'array<int>'}"
    )
    cent = spark.createDataFrame(
        [(COARSE_NAME, 0.0, i, [float(x) for x in c], None)
         for i, c in enumerate(coarse)],
        schema,
    )
    cw = spark.createDataFrame(
        [
            (CODEBOOK_NAME, 0.0, s * k_codes + j, [float(x) for x in w], None)
            for s, sub in enumerate(codebook)
            for j, w in enumerate(sub)
        ],
        schema,
    )
    # a rebuild resets history (overwrite) but must NOT reset redelivery
    # protection: carry txn_* markers forward (the ivf_build rule) or a
    # committed-but-unacknowledged streaming ivfpq_append replayed after
    # the rebuild would find no marker and index its batch twice
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_version,
    )

    carried = {}
    if snapshot_version(spark, store_path) is not None:
        carried = {
            kk: v
            for kk, v in snapshot_properties(spark, store_path).items()
            if kk.startswith("txn_")
        }
    import uuid

    carried.update(
        pq_m=m, pq_k=k_codes, pq_cells=n_cells,
        pq_dim=dim, pq_n_probe_default=n_probe_default,
        pq_rot=1 if rotation is not None else 0,
        pq_code_type=code_type,
        # per-BUILD identity for the quantizer cache (ADVICE r11): a
        # store deleted out-of-band and rebuilt at the same path restarts
        # version numbering, so (path, version) alone could serve the OLD
        # build's quantizers from cache; the nonce changes every rebuild
        pq_store_nonce=uuid.uuid4().hex,
    )
    out = rows.unionByName(cent).unionByName(cw)
    if rotation is not None:
        rot_rows = spark.createDataFrame(
            [(ROTATION_NAME, 0.0, i, [float(x) for x in row], None)
             for i, row in enumerate(rotation)],
            schema,
        )
        out = out.unionByName(rot_rows)
    return snapshot_write(
        spark,
        store_path,
        out,
        mode="overwrite",
        properties=carried,
    )


def ivfpq_search(
    spark,
    store_path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe: int | None = None,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """Search the persisted IVF-PQ index: quantizers load from their
    pruned reserved-name slices (tiny), probe tables compute driver-side
    via the SAME ``_probe_cell_tables`` as the one-shot operator, and
    the code scan is manifest-pruned to the union of probed cells —
    unprobed cells' files never open. Result-identical to
    :func:`ivfpq_topk` on the same corpus/geometry (pinned by test and
    by the shared oracle row). ``version`` time-travels to an older
    index."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_version,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # pin ONE version for every read (quantizers + codes): a rebuild
    # committing mid-search must not mix index generations
    if version is None:
        version = snapshot_version(spark, store_path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {store_path}")
    props = snapshot_properties(spark, store_path, version=version)
    m, k_codes = int(props["pq_m"]), int(props["pq_k"])
    n_cells = int(props["pq_cells"])
    if n_probe is None:
        n_probe = int(props.get("pq_n_probe_default", 1))
    if not (1 <= n_probe <= n_cells):
        raise ValueError(f"n_probe must be in [1, {n_cells}], got {n_probe}")

    coarse, codebook = _load_quantizers(
        spark, store_path, version, m, k_codes,
        nonce=str(props.get("pq_store_nonce", "")),
    )

    # probes collect ONCE: the same collected rows drive cell pruning AND
    # ranking (a non-deterministic probes plan re-collected would prune
    # for one probe set and rank another — silent truncation)
    probe_rows = probes.select(id_col, vec_col).collect()
    if not probe_rows:
        raise ValueError("probes is empty")
    if int(props.get("pq_rot", 0)):
        # OPQ index: rotate the collected probes driver-side with the
        # version-pinned rotation (probes are already in hand; one tiny
        # numpy matmul — the corpus-side rotation happened at build)
        R = _load_rotation(
            spark, store_path, version, int(props["pq_dim"]),
            nonce=str(props.get("pq_store_nonce", "")),
        )
        probe_rows = [
            {id_col: r[id_col],
             vec_col: (np.asarray(r[vec_col], dtype=np.float64) @ R).tolist()}
            for r in probe_rows
        ]
    probed_cells, tables = _probe_cell_tables(
        probe_rows, coarse, codebook, n_probe, unit_scale, id_col, vec_col
    )
    probed_names = sorted(
        {f"cell={c:04d}" for cells in probed_cells.values() for c in cells}
    )
    codes = snapshot_read(
        spark, store_path, version=version, names=probed_names
    ).select(
        F.col("vec_id").alias(id_col),
        F.regexp_extract("name", r"cell=(\d+)", 1).cast("int").alias("cell"),
        "code",
    )
    return _ivfpq_rank(
        codes, probed_cells, tables, m=m, k=k,
        salt_buckets=salt_buckets, id_col=id_col,
        binary_codes=props.get("pq_code_type", "int") == "binary",
    )


#: serving-path cache for the version-pinned quantizers/rotation: a
#: committed version's content is immutable (rebuilds COMMIT a NEW
#: version — overwrite is itself a version bump, verified monotonic),
#: so (app, store, version, build-nonce) identifies the bytes; the
#: pq_store_nonce component (read from the FRESH per-search properties,
#: so it costs no extra driver job) covers the one hole version pinning
#: leaves — a store deleted OUT-OF-BAND and rebuilt at the same path
#: restarts version numbers, and a geometry-compatible rebuild would
#: otherwise silently serve the old build's quantizers (ADVICE r11).
#: Caching cuts two driver collects off every search against a warm
#: index. Bounded FIFO so long sessions touching many stores stay flat.
_QUANTIZER_CACHE: dict[tuple, tuple] = {}
_QUANTIZER_CACHE_MAX = 32


def _cache_get(spark, kind: str, store_path: str, version: int, nonce: str):
    return _QUANTIZER_CACHE.get(
        (spark.sparkContext.applicationId, kind, store_path, version, nonce)
    )


def _cache_put(spark, kind: str, store_path: str, version: int, nonce: str, value):
    if len(_QUANTIZER_CACHE) >= _QUANTIZER_CACHE_MAX:
        _QUANTIZER_CACHE.pop(next(iter(_QUANTIZER_CACHE)))
    _QUANTIZER_CACHE[
        (spark.sparkContext.applicationId, kind, store_path, version, nonce)
    ] = value
    return value


def _load_quantizers(
    spark, store_path: str, version: int, m: int, k_codes: int,
    nonce: str = "",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Version-pinned load of the persisted quantizers (shared by search
    and append so the reconstruction cannot drift): coarse centroids from
    the ``_coarse`` slice, residual codewords from ``_codebook`` with the
    ``vec_id = s·k_codes + j`` layout validated against the pinned
    geometry before any positional indexing. Cached per committed
    version (immutable — see _QUANTIZER_CACHE)."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )

    cached = _cache_get(spark, "q", store_path, version, nonce)
    if cached is not None and len(cached[1]) == m and all(
        len(sub) == k_codes for sub in cached[1]
    ):
        return cached

    cent_rows = (
        snapshot_read(spark, store_path, version=version, names=[COARSE_NAME])
        .orderBy("vec_id")
        .collect()
    )
    if not cent_rows:
        raise FileNotFoundError(
            f"no IVF-PQ index (no {COARSE_NAME} rows) at {store_path}"
        )
    coarse = [list(r["embedding"]) for r in cent_rows]
    cw_rows = (
        snapshot_read(spark, store_path, version=version, names=[CODEBOOK_NAME])
        .orderBy("vec_id")
        .collect()
    )
    if len(cw_rows) != m * k_codes:
        raise ValueError(
            f"IVF-PQ index at {store_path} v{version} holds {len(cw_rows)} "
            f"codeword rows; pinned geometry pq_m={m} × pq_k={k_codes} "
            f"requires {m * k_codes} — truncated or foreign store"
        )
    codebook = [
        [list(cw_rows[s * k_codes + j]["embedding"]) for j in range(k_codes)]
        for s in range(m)
    ]
    return _cache_put(spark, "q", store_path, version, nonce, (coarse, codebook))


def _rerank_gate(exact, cand_ids, n_cand: int, op: str, id_col: str) -> None:
    """The refinement-stage completeness gate shared by every
    approximate-then-exact family (ivfpq_rerank, sq.sq8_rerank_topk):
    the index holds ids encoded at build/append time — a stale or
    filtered corpus missing some of them would silently shrink the
    answer below k (the approximate stage surfaced those neighbors;
    dropping them is a wrong answer, not a re-rank). Missing is
    measured by MEMBERSHIP, not a count delta (duplicate ids fan the
    joins OUT, so the row count can exceed the candidate count and a
    delta check would misblame the corpus — or pass while emitting
    duplicate ranks if the two effects offset); duplicates get their
    own error. ONE aggregate collects both signals."""
    gate = exact.agg(
        F.count("*").alias("_n"),
        F.collect_set("neighbor_id").alias("_ids"),
    ).first()
    n_exact, exact_ids = gate["_n"], set(gate["_ids"])
    missing = [i for i in cand_ids if i not in exact_ids][:10]
    if missing:
        raise ValueError(
            f"{op}: corpus is missing candidate rows the index "
            f"encoded (e.g. {id_col} in {missing}) — the supplied corpus "
            f"must cover every vector the searched index version holds"
        )
    if n_exact != n_cand:
        raise ValueError(
            f"{op}: duplicate {id_col} values in corpus/probes fan "
            f"the re-rank join out ({n_exact} exact rows vs {n_cand} "
            f"candidates) — deduplicate the inputs; ids must be unique"
        )


def ivfpq_rerank(
    spark,
    store_path: str,
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    k_adc: int = 50,
    n_probe: int | None = None,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
    max_probes: int = 10_000,
) -> DataFrame:
    """Exact re-ranking of IVF-PQ candidates — the refinement stage of
    the published pipeline [Jégou et al. 2011 §V, IVFADC+R; Faiss's
    refine wrapper]: ADC resolution is m codes per vector, so
    sub-resolution neighbors tie with everything sharing their codes
    (measured: scripts/stress_ivfpq.py's planted twins tie into the
    top-10 but cannot win it under ADC alone). The fix is a second
    stage: take the ADC top-``k_adc`` per probe from the compressed
    index, join the RAW vectors back from the lake (``corpus`` — the
    index deliberately stores only codes; raw embeddings live in the
    source table), and re-rank by exact squared L2 on the 9-dp grid
    (ties → neighbor id, the family convention).

    Cost shape at scale: the index answers from m-byte codes with
    manifest-pruned cells; the re-rank join touches ``probes × k_adc``
    rows of the raw table — a candidate-bounded broadcast-hash join
    (the candidate side broadcasts; the corpus is scanned once, column-
    pruned to (id, vector)). Returns ``(probe_id, neighbor_id, rank)``.

    The probe set is COLLECTED to the driver (full vectors — that is
    what pins one probe evaluation for both stages), so its size is a
    driver-memory bound, not a cluster bound: ``max_probes`` caps it
    with a loud error (ADVICE r11). Serving batches are typically
    10s–1000s of probes; raise the cap consciously for offline sweeps.
    The downstream candidate-id prune already degrades gracefully (the
    isin pushdown is skipped above 100k distinct candidate ids rather
    than bloating the Catalyst plan).
    """
    from pyspark.sql import Window

    if k < 1 or k_adc < k:
        raise ValueError(f"need k_adc >= k >= 1, got k={k} k_adc={k_adc}")
    # pin the probes ONCE and feed the same pinned frame to BOTH stages:
    # ivfpq_search collects internally for the ADC cut, but the exact
    # re-rank joins `pv` below — a non-deterministic probes plan evaluated
    # twice could re-rank against different vectors than the ones that
    # produced the candidates (or shrink the pv join so the completeness
    # gate misblames the corpus)
    probes_proj = probes.select(id_col, vec_col)
    probe_rows = probes_proj.limit(max_probes + 1).collect()
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"ivfpq_rerank: probe batch exceeds max_probes={max_probes} — "
            f"probes are collected to the driver (full vectors) to pin one "
            f"evaluation for both stages; split the batch or raise the cap "
            f"consciously"
        )
    pinned = spark.createDataFrame(probe_rows, schema=probes_proj.schema)
    # candidates are tiny (probes × k_adc) — pin them so the
    # completeness check below and the re-rank join share one result
    cand = ivfpq_search(
        spark, store_path, pinned, k=k_adc, n_probe=n_probe, version=version,
        id_col=id_col, vec_col=vec_col, unit_scale=unit_scale,
        salt_buckets=salt_buckets,
    ).select("probe_id", "neighbor_id").localCheckpoint()

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
    # candidate-prune the corpus side BEFORE the join: the join itself
    # only keeps candidate rows, but Spark still evaluates the corpus
    # projection (which may be an expensive computed vector — the
    # hybrid_index hash-embed fold) for EVERY row to probe it. The
    # distinct candidate-id set is bounded by probes × k_adc, so an
    # isin filter pushes below the projection (and into a parquet scan
    # as PushedFilters: In) and the re-rank becomes candidate-bounded
    # for real — measured 48 s → 7.6 s end-to-end at 1M docs in
    # scripts/stress_hybrid.py. The completeness/duplicate gates below
    # are unaffected: pruning keeps exactly the ids they inspect.
    # (cand is localCheckpointed and bounded by probes × k_adc — one
    # collect serves the prune list AND the completeness gate below, so
    # the serving path pays one driver action here, not three)
    cand_rows = cand.collect()
    n_cand = len(cand_rows)
    cand_ids = sorted({r["neighbor_id"] for r in cand_rows})
    if len(cand_ids) <= 100_000:
        nv = nv.filter(F.col("neighbor_id").isin(cand_ids))
    # the same dot-expansion decomposition as the DuckDB oracle's _sql_l2
    # (a·a − 2ab + b·b) so the 9-dp grid agrees bit-exactly
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
    _rerank_gate(exact, cand_ids, n_cand, op="ivfpq_rerank", id_col=id_col)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank")
    )


def _load_rotation(
    spark, store_path: str, version: int, dim: int, nonce: str = ""
) -> np.ndarray:
    """Version-pinned load of the persisted OPQ rotation (``_rotation``
    reserved rows, vec_id = row index) — shared by search and append so
    probe/vector rotation cannot drift from the build's corpus rotation.
    Cached per committed version (immutable — see _QUANTIZER_CACHE)."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
    )

    cached = _cache_get(spark, "r", store_path, version, nonce)
    if cached is not None and cached.shape == (dim, dim):
        return cached

    rows = (
        snapshot_read(spark, store_path, version=version, names=[ROTATION_NAME])
        .orderBy("vec_id")
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(
            f"OPQ index at {store_path} v{version} holds {len(rows)} rotation "
            f"rows; pinned pq_dim={dim} requires {dim} — truncated or foreign "
            f"store"
        )
    return _cache_put(
        spark, "r", store_path, version, nonce,
        np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64),
    )


def ivfpq_append(
    spark,
    store_path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incrementally index ``new_vectors`` into the persisted IVF-PQ
    index: assign coarse cells and residual codes with the FROZEN
    quantizers (read at one pinned version), append — history carries by
    manifest reference, commit cost O(new vectors). The standard trade
    (Faiss ``add``): quantizers drift as the corpus grows until the next
    :func:`ivfpq_build` rebuild (an atomic overwrite — searchers never
    see a half-built index). ``txn=(app_id, batch_id)`` makes the append
    idempotent per writer lineage; the commit is CAS-pinned
    (``require_parent``) to the version the quantizers were read at, so
    a racing rebuild raises ``ConcurrentWriteError`` instead of
    committing codes encoded against a dead codebook. Returns the new
    version."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    version = snapshot_version(spark, store_path)
    if version is None:
        raise FileNotFoundError(
            f"no IVF-PQ index at {store_path} — ivfpq_build first"
        )
    props = snapshot_properties(spark, store_path, version=version)
    m, k_codes = int(props["pq_m"]), int(props["pq_k"])
    coarse, codebook = _load_quantizers(
        spark, store_path, version, m, k_codes,
        nonce=str(props.get("pq_store_nonce", "")),
    )
    sub_dim = len(codebook[0][0])
    if int(props.get("pq_rot", 0)):
        # OPQ index: new vectors must enter the SAME rotated space the
        # frozen quantizers live in (version-pinned R, Arrow matmul)
        R = _load_rotation(
            spark, store_path, version, int(props["pq_dim"]),
            nonce=str(props.get("pq_store_nonce", "")),
        )
        new_vectors = new_vectors.select(
            F.col(id_col), _rotate_udf(R)(F.col(vec_col)).alias(vec_col)
        )
    # the store's pinned at-rest code format — appended rows must match
    # the build's schema or the union scan would see mixed types
    as_binary = props.get("pq_code_type", "int") == "binary"
    rows = (
        new_vectors.select(
            F.col(id_col),
            _cells_and_residuals_udf(coarse)(F.col(vec_col)).alias("_cr"),
        )
        .select(
            F.format_string("cell=%04d", F.col("_cr.cell")).alias("name"),
            F.lit(0.0).alias("ts"),
            F.col(id_col).alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding"),
            _assign_codes_udf(codebook, sub_dim, as_binary=as_binary)(
                F.col("_cr.resid")
            ).alias("code"),
        )
    )
    return snapshot_write(
        spark,
        store_path,
        rows,
        mode="append",
        txn=txn,
        require_parent=version,
    )


def stream_ivfpq_ingest(
    vec_stream,
    spark,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    app_id: str = "stream_ivfpq_ingest",
):
    """Streaming vector ingest into the persisted IVF-PQ index: each
    micro-batch encodes against the frozen quantizers and appends via
    :func:`ivfpq_append` with ``txn=(app_id, batch_id)`` — a
    committed-but-unacknowledged batch replays as a version-preserving
    no-op (the marker rides the same atomic manifest as the codes, and
    :func:`ivfpq_build` carries markers through rebuilds). Requires an
    existing index; one writer per checkpoint. A racing rebuild makes
    the in-flight batch raise (CAS pin) — Structured Streaming retries
    the batch, which then re-reads the NEW quantizers. Returns the
    started query. The txn marker is tied to ONE checkpoint lineage
    (the stream_ivf_ingest caveat: new app_id on checkpoint reset)."""

    from prometheus_parquet_server_spark.streaming.ingest import (
        stream_txn_append,
    )

    def _append(batch_df: DataFrame, txn: tuple[str, int]) -> None:
        ivfpq_append(
            spark, store_path, batch_df,
            id_col=id_col, vec_col=vec_col, txn=txn,
        )

    return stream_txn_append(
        vec_stream, f"{store_path}/_stream_checkpoint", app_id, _append
    )


def _rotate_udf(R: np.ndarray):
    """Arrow kernel: embedding → embedding @ R (one matmul per batch)."""
    from pyspark.sql.functions import pandas_udf

    Rm = np.asarray(R, dtype=np.float64)

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(x, dtype=np.float64) for x in v])
        out = mat @ Rm
        return pd.Series([[float(x) for x in row] for row in out])

    return _rot


def opq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    pq_iterations: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    final_fit: bool = True,
) -> tuple[list[list[float]], list[list[list[float]]] | None]:
    """Optimized Product Quantization [Ge, He, Ke, Sun, CVPR 2013 —
    public knowledge]: learn an orthonormal rotation ``R`` jointly with
    the PQ codebooks so the subspace split aligns with the data's
    principal structure — the standard upgrade when embedding dimensions
    are correlated (plain PQ's fixed coordinate split quantizes
    correlated subspaces poorly). Alternating minimization:

    1. fix R: train/assign PQ codebooks on the rotated corpus
       (:func:`pq_train` — the same decimal-exact Lloyd);
    2. fix codes: the optimal R for ``min ‖XR − X̂‖²`` is the orthogonal
       Procrustes solution ``R = U Vᵀ`` from ``SVD(Xᵀ X̂)``, where
       ``X̂`` is the codeword reconstruction of the rotated corpus.

    The cross-covariance ``Xᵀ X̂`` is a (dim × dim) sufficient statistic
    accumulated in ONE distributed pass (per-partition numpy partials,
    the pca.py pattern — ~33 KB per partition regardless of rows); the
    SVD runs driver-side on the 64×64 matrix. Deterministic given the
    corpus (LAPACK SVD on identical input; sign ambiguity is immaterial
    — any Procrustes optimum is equally valid and re-runs on one
    platform reproduce bit-identically; like emb_pca this is therefore
    a rows-only registry citizen, pinned by numpy-parity tests).

    Returns ``(R, codebook)`` — search by rotating probes and corpus
    with R, then :func:`pq_topk` / :func:`ivfpq_*` as usual
    (:func:`opq_topk` wires it)."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    _check_geometry(dim, m, k)
    R = np.eye(dim)
    # each round: fit codebooks under the current R, then re-solve R for
    # those codes; the FINAL codebook fit below runs after the last R
    # update so the returned pair is mutually consistent (an alternating
    # loop that ends on the R step would pair the new rotation with
    # codebooks trained under the old one)
    for _ in range(max(0, iterations)):
        rotated = corpus.select(
            F.col(id_col), _rotate_udf(R)(F.col(vec_col)).alias("_rv")
        )
        codebook = pq_train(
            rotated, m=m, k=k, iterations=pq_iterations, dim=dim,
            id_col=id_col, vec_col="_rv",
        )
        # cross-covariance of the ORIGINAL vectors with the codeword
        # reconstruction of their rotated images: one pass, dim² partials
        cmats = [np.asarray(cb, dtype=np.float64) for cb in codebook]
        sub_dim = dim // m
        Rm = R.copy()

        def _partials(batches):
            acc = np.zeros((dim, dim), dtype=np.float64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = np.array(
                    [np.asarray(x, dtype=np.float64) for x in pdf["_x"]]
                )
                XR = X @ Rm
                Xhat = np.empty_like(XR)
                for s, cm in enumerate(cmats):
                    sl = slice(s * sub_dim, (s + 1) * sub_dim)
                    d = np.round(_sq_dists(XR[:, sl], cm), 9)
                    Xhat[:, sl] = cm[np.argmin(d, axis=1)]
                acc += X.T @ Xhat
            if seen:
                yield pd.DataFrame({"partial": [acc.ravel().tolist()]})

        rows = corpus.select(F.col(vec_col).alias("_x")).mapInPandas(
            _partials, schema="partial array<double>"
        ).collect()
        if not rows:
            raise ValueError("opq_train: empty corpus")
        C = np.sum(
            [np.asarray(r["partial"]).reshape(dim, dim) for r in rows], axis=0
        )
        U, _, Vt = np.linalg.svd(C)
        R = U @ Vt
    R_out = [[float(x) for x in row] for row in R]
    if not final_fit:
        # rotation-only mode (review r10 #3): callers that retrain their
        # own codebooks against the final R (ivfpq_build trains RESIDUAL
        # books in the rotated space) skip the full-corpus Lloyd pass
        # whose only purpose is pairing R with a consistent flat codebook
        return R_out, None
    rotated = corpus.select(
        F.col(id_col), _rotate_udf(R)(F.col(vec_col)).alias("_rv")
    )
    codebook = pq_train(
        rotated, m=m, k=k, iterations=pq_iterations, dim=dim,
        id_col=id_col, vec_col="_rv",
    )
    return R_out, codebook


def opq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    R: list[list[float]],
    codebook: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unit_scale: float = 1e6,
    salt_buckets: int = 32,
) -> DataFrame:
    """ADC search in the rotated space: rotation preserves L2 distances
    (R orthonormal), so ranking rotated probes against rotated-space
    codes is exactly PQ search with the OPQ-aligned subspaces. One
    Arrow rotation pass each side, then :func:`pq_topk`'s machinery."""
    Rm = np.asarray(R, dtype=np.float64)
    rot_corpus = corpus.select(
        F.col(id_col), _rotate_udf(Rm)(F.col(vec_col)).alias(vec_col)
    )
    rot_probes = probes.select(
        F.col(id_col), _rotate_udf(Rm)(F.col(vec_col)).alias(vec_col)
    )
    return pq_topk(
        rot_corpus, rot_probes, codebook, k=k, id_col=id_col,
        vec_col=vec_col, unit_scale=unit_scale, salt_buckets=salt_buckets,
    )
