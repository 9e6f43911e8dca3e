"""Persisted IVF index on the snapshot store: build once, search many.

:func:`pipeline.similarity.ivf_topk` recomputes centroids and cell
assignments on every call — right for one-shot queries, wasteful for the
production shape where one corpus serves many probe batches. This module
persists the index in the repo's own table format
(sources/snapshot_store.py) so the two flagship subsystems compose:

- **cells are the ``name`` axis**: every corpus vector is written under
  ``name = "cell=NNNN"``, and ``_write_data_files`` range-clusters files
  by name — so the per-file min/max name ranges in the manifest make
  "read only the probed cells" a DRIVER-SIDE file-pruning decision, the
  same machinery that prunes metric selectors (snapshot_select). A probe
  batch touching ``n_probe`` of ``n_centroids`` cells plans a scan over
  roughly that fraction of the index files — before any footer opens;
- **centroids are data, not metadata**: k rows under the reserved name
  ``_centroid`` (sorts apart from the cells, prunes to its own file
  neighborhood). Keeping them in the data plane means rebuild is a plain
  ``snapshot_write(mode="overwrite")``, time travel serves "search
  yesterday's index" for free, and nothing oversized rides the manifest;
- the index inherits the store's whole lifecycle: atomic CAS commits,
  compaction, vacuum, version/as-of reads.

Determinism: build with ``kmeans_iterations=0`` is fully replayable
(centroids = lowest-id vectors — the ivf_topk graded contract); Lloyd
rounds are order-insensitive too since kmeans_centroids sums in decimal.

Reference parity: the reference has no vector surface (SURVEY.md §2.7);
this is the training-pipeline extension's ANN path made index-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.similarity import (
    centroid_cells_udf,
    cosine_similarity_col,
    kmeans_centroids,
)

__all__ = ["ivf_append", "ivf_build", "ivf_search", "stream_ivf_ingest"]

#: reserved name for centroid rows — never a legal cell name
CENTROID_NAME = "_centroid"


def _cell_name(cell_col):
    return F.format_string("cell=%04d", cell_col)




def _assign_rows(
    df: DataFrame,
    centroids: list[list[float]],
    quantized: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Store-row projection shared by build and append: cell name via one
    Arrow pass, then either the float arm or the int8 arm. Everything is
    per-row expressions — NO self-join, so duplicate ids stay row-for-row
    (a join on id would cross-pair duplicates and inflate the index).
    The int8 arm is the same per-vector symmetric math as
    ``pipeline.similarity.quantize_embeddings`` (scale = max|x|/127,
    q = round(x/scale)) inlined for the projection shape — keep the two
    in sync."""
    cell = _cell_name(centroid_cells_udf(centroids, 1)(F.col(vec_col))[0])
    if not quantized:
        return df.select(
            cell.alias("name"),
            F.lit(0.0).alias("ts"),
            F.col(id_col).alias("vec_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "embedding"
            ),
            F.lit(None).cast("array<tinyint>").alias("qvec"),
            F.lit(None).cast("float").alias("scale"),
        )
    scale = F.expr(
        f"aggregate({vec_col}, cast(0 as double),"
        f" (a, v) -> greatest(a, abs(cast(v as double)))) / 127.0"
    )
    staged = df.select(
        cell.alias("name"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        scale.alias("_scale"),
    )
    return staged.select(
        "name",
        F.lit(0.0).alias("ts"),
        "vec_id",
        F.lit(None).cast("array<double>").alias("embedding"),
        F.expr(
            "case when _scale > 0 then"
            " transform(_v, v -> cast(round(cast(v as double) / _scale) as tinyint))"
            " else transform(_v, v -> cast(0 as tinyint)) end"
        ).alias("qvec"),
        F.col("_scale").cast("float").alias("scale"),
    )


def ivf_build(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame,
    n_centroids: int = 16,
    kmeans_iterations: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> int:
    """Build (or REBUILD — overwrite commit) the IVF index for ``corpus``
    at ``store_path``. Returns the committed snapshot version.

    Store rows: ``(name, ts=0.0, vec_id, embedding, qvec, scale)`` where
    name is ``cell=NNNN`` for corpus vectors and ``_centroid`` for the k
    centroid rows (vec_id = centroid id). One Arrow matmul pass assigns
    cells; the write range-clusters by name so each cell's vectors land
    in name-contiguous files with tight manifest ranges.

    ``quantize=True`` stores the corpus as per-vector symmetric int8
    (``pipeline.similarity.quantize_embeddings``): the dominant probe-
    path scan shrinks ~4× and — cosine being scale-invariant — search
    runs DIRECTLY on the quantized arrays, no dequantization. Centroids
    stay float64 (assignment precision), so the row schema carries
    nullable (embedding | qvec+scale) arms; the mode is pinned as the
    manifest property ``ivf_quantized`` and inherited by appends. The
    price is quantization noise in the ranking — gated by a measured
    recall floor in tests/test_ann_store.py, the ANN-recall-gate house
    pattern.
    """
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_write,
    )

    if n_centroids > 9999:
        raise ValueError("ivf_build: cell names are %04d — n_centroids ≤ 9999")
    centroids = kmeans_centroids(
        corpus, n_centroids, kmeans_iterations, dim, id_col, vec_col
    )
    assigned = _assign_rows(corpus, centroids, quantize, id_col, vec_col)
    cent_rows = spark.createDataFrame(
        [(CENTROID_NAME, 0.0, i, c, None, None) for i, c in enumerate(centroids)],
        "name string, ts double, vec_id long, embedding array<double>, "
        "qvec array<tinyint>, scale float",
    )
    # a rebuild resets history (overwrite) but must NOT reset redelivery
    # protection: carry the txn_* markers forward, or a committed-but-
    # unacknowledged streaming batch replayed after the rebuild would
    # find no marker and duplicate its vectors
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
        snapshot_version,
    )

    carried = {}
    if snapshot_version(spark, store_path) is not None:
        carried = {
            k: v
            for k, v in snapshot_properties(spark, store_path).items()
            if k.startswith("txn_")
        }
    carried["ivf_quantized"] = bool(quantize)
    return snapshot_write(
        spark,
        store_path,
        assigned.unionByName(cent_rows),
        mode="overwrite",
        properties=carried,
    )


def ivf_search(
    spark: SparkSession,
    store_path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    version: int | None = None,
) -> DataFrame:
    """Search the persisted index: centroids load from their pruned
    ``_centroid`` slice (k tiny rows), each probe explodes to its
    ``n_probe`` best cells, and the corpus scan is manifest-pruned to the
    UNION of probed cells — unprobed cells' files never open. Scoring and
    ranking match :func:`pipeline.similarity.ivf_topk` exactly
    (ROUND(cosine, 6), ties by neighbor id). ``version`` searches an
    older index snapshot (time travel).
    """
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
        snapshot_version,
    )

    # pin ONE version for both reads: a rebuild committing between the
    # centroid load and the corpus scan would otherwise mix indexes
    # (v1 centroids addressing v2's differently-clustered cells)
    if version is None:
        version = snapshot_version(spark, store_path)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {store_path}")
    cent_rows = (
        snapshot_read(spark, store_path, version=version, names=[CENTROID_NAME])
        .orderBy("vec_id")
        .collect()
    )
    if not cent_rows:
        raise FileNotFoundError(f"no IVF index (no {CENTROID_NAME} rows) at {store_path}")
    centroids = [list(r["embedding"]) for r in cent_rows]

    p = (
        probes.withColumn(
            "_cell",
            F.explode(centroid_cells_udf(centroids, n_probe)(F.col(probe_vec_col))),
        )
        .withColumn("name", _cell_name(F.col("_cell")))
        .drop("_cell")
    )
    # evaluated twice (the distinct-cells collect and the broadcast join
    # side): localCheckpoint runs the probe plan + Arrow assignment ONCE;
    # blocks free when the frame is GC'd
    p = p.localCheckpoint(eager=True)
    # the probed-cell union is ≤ n_centroids values — a legal driver round
    # trip that buys manifest-level file pruning on the big side
    probed = sorted(
        r["name"] for r in p.select("name").distinct().collect()
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
    )

    quantized = bool(
        snapshot_properties(spark, store_path, version=version).get("ivf_quantized")
    )
    vec_arm = "qvec" if quantized else "embedding"
    corpus = snapshot_read(
        spark, store_path, version=version, names=probed
    ).select("name", F.col("vec_id").alias("neighbor_id"), F.col(vec_arm).alias("_corp"))

    # cosine is scale-invariant, so a quantized corpus compares directly
    # against FLOAT probes: cos(a, q_b) = cos(a, b/s_b) = cos(a, b) up to
    # int8 rounding noise (recall-gated in tests)
    sim = cosine_similarity_col(F.col(probe_vec_col), F.col("_corp"))
    scored = (
        corpus.join(F.broadcast(p), "name")
        .filter(F.col(probe_id_col) != F.col("neighbor_id"))
        .select(
            probe_id_col,
            "neighbor_id",
            F.round(sim, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def ivf_append(
    spark: SparkSession,
    store_path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incrementally index ``new_vectors``: assign cells with the
    EXISTING centroids (one Arrow matmul pass) and append — history
    carries over by manifest reference, commit cost O(new vectors). The
    standard IVF maintenance trade (what Faiss ``add`` does): centroids
    drift as the corpus grows, so recall slowly degrades until the next
    :func:`ivf_build` rebuild — which is an atomic overwrite commit, so
    searchers never see a half-built index. ``txn=(app_id, batch_id)``
    makes the append idempotent per writer (snapshot_write's marker) —
    without it a redelivered foreachBatch micro-batch would DUPLICATE its
    vectors in the index. The commit is CAS-pinned to the version the
    centroids were read at (``require_parent``): if a rebuild lands in
    between, the append raises ``ConcurrentWriteError`` instead of
    committing rows clustered under stale centroids — cells the new
    index would never probe. Retry by calling again (re-reads the new
    centroids). Returns the new version."""
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    version = snapshot_version(spark, store_path)
    if version is None:
        raise FileNotFoundError(f"no IVF index at {store_path} — ivf_build first")
    cent_rows = (
        snapshot_read(spark, store_path, version=version, names=[CENTROID_NAME])
        .orderBy("vec_id")
        .collect()
    )
    if not cent_rows:
        raise FileNotFoundError(f"no {CENTROID_NAME} rows at {store_path}")
    centroids = [list(r["embedding"]) for r in cent_rows]
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
    )

    # properties read at the SAME pinned version as the centroids (the
    # one-version-pin rule): a rebuild racing in between must not make
    # this append build the wrong arm against the old centroids
    quantized = bool(
        snapshot_properties(spark, store_path, version=version).get("ivf_quantized")
    )
    assigned = _assign_rows(new_vectors, centroids, quantized, id_col, vec_col)
    return snapshot_write(
        spark,
        store_path,
        assigned,
        mode="append",
        txn=txn,
        require_parent=version,
    )


def stream_ivf_ingest(
    vec_stream,
    spark: SparkSession,
    store_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    app_id: str = "stream_ivf_ingest",
):
    """Streaming vector ingest: each micro-batch appends to the persisted
    index via :func:`ivf_append` with ``txn=(app_id, batch_id)`` — a
    committed-but-unacknowledged batch replays as a version-preserving
    no-op instead of duplicating its vectors (the marker rides the same
    atomic manifest as the data, and a rebuild carries it forward).
    Requires an existing index (:func:`ivf_build` first); one writer per
    checkpoint, Structured Streaming's model. Returns the started query.

    **The marker is tied to ONE checkpoint lineage** (the Delta
    txnAppId contract): batch ids restart at 0 when the checkpoint is
    reset, so a reset against a store that remembers higher ids would
    silently skip genuinely new batches — pass a NEW ``app_id`` whenever
    you reset or relocate the checkpoint."""

    from prometheus_parquet_server_spark.streaming.ingest import (
        stream_txn_append,
    )

    def _append(batch_df: DataFrame, txn: tuple[str, int]) -> None:
        ivf_append(
            spark, store_path, batch_df,
            id_col=id_col, vec_col=vec_col, txn=txn,
        )

    return stream_txn_append(
        vec_stream, f"{store_path}/_stream_checkpoint", app_id, _append
    )
