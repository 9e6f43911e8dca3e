"""Distributed PCA over an embedding column — dimensionality reduction
for training-data curation (cheap near-dup pre-filters, visualization,
whitening before clustering).

Spark-first factorization of the classic algorithm:

1. **Sufficient statistics in one distributed pass** — per Arrow batch a
   numpy kernel accumulates ``(count, Σx, XᵀX)``; per PARTITION exactly one
   (1 + dim + dim²)-length partial row is emitted (``mapInPandas`` is fed
   whole-partition iterators, so the kernel folds every batch into one
   partial before yielding). The driver sums the per-partition partials —
   equivalent to ``treeAggregate`` at these sizes: for dim = 64 each
   partial is ~33 KB, so even 10⁵ partitions of a 100 TB corpus collect
   ~3 GB driver-side worst case, and a two-level Spark aggregation of the
   flattened vector is the drop-in escalation if dim grows.
2. **Eigendecomposition driver-side** — the dim × dim covariance is tiny;
   ``numpy.linalg.eigh`` (deterministic for a fixed matrix). Components
   are sign-normalized (largest-|coefficient| entry made positive, lowest
   index on ties) so the basis is reproducible run-to-run.
3. **Projection as an Arrow kernel** — (batch × dim) @ (dim × k), the same
   dense-matmul shape as similarity.banded_buckets_udf: no shuffle, no
   codegen ceiling, embarrassingly parallel.

Not SQL-expressible (eigendecomposition), so the registry entry has no
DuckDB oracle — correctness is pinned by pytest parity against a
single-machine numpy PCA of the same rows (tests/test_pca.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _suffstats(df: DataFrame, vec_col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One pass: global (n, Σx, XᵀX) from per-partition numpy partials.

    Each partition emits ONE flattened ``array<double>`` of length
    ``1 + dim + dim²`` ([n, Σx…, XᵀX…]) — a single Arrow list value, so
    driver-side reassembly is ``np.asarray`` per partition + one vectorized
    sum, not per-field Row lookups (which would be partitions × dim² hash
    probes). If partition counts ever make even this collect heavy, the
    drop-in escalation is summing the array column with one Spark
    ``aggregate`` before collecting.
    """
    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        c = np.zeros((dim, dim))
        for b in batches:
            rows = [
                np.asarray(x, dtype=np.float64)
                for x in b[vec_col]
                if x is not None and len(x) == dim
            ]
            if not rows:
                continue
            m = np.stack(rows)
            n += m.shape[0]
            s += m.sum(axis=0)
            c += m.T @ m
        flat = np.concatenate(([float(n)], s, c.ravel()))
        yield pd.DataFrame({"partial": [flat.tolist()]})

    rows = df.select(vec_col).mapInPandas(
        _partials, schema="partial array<double>"
    ).collect()
    total = np.sum(
        [np.asarray(r["partial"], dtype=np.float64) for r in rows], axis=0
    )
    n = int(total[0])
    s = total[1 : 1 + dim]
    c = total[1 + dim :]
    return n, s, c.reshape(dim, dim)


def pca_components(
    df: DataFrame, k: int = 4, vec_col: str = "embedding", dim: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit: returns (mean [dim], components [k × dim], explained_variance
    [k]), components ordered by descending eigenvalue and sign-normalized.
    """
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    n, s, xtx = _suffstats(df, vec_col, dim)
    if n < 2:
        raise ValueError(f"need at least 2 valid vectors to fit PCA, got {n}")
    mean = s / n
    # covariance from sufficient stats: (XᵀX − n·μμᵀ) / (n − 1)
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × dim
    # reproducible sign: make the largest-|coeff| entry positive (ties →
    # lowest index, numpy argmax convention)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Transform: (id, [k projections]) via one Arrow matmul per batch;
    NULL/wrong-length vectors project to NULL."""
    from pyspark.sql.functions import pandas_udf

    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64).T  # dim × k
    dim = w.shape[0]

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        rows = [
            np.asarray(x, dtype=np.float64)
            if x is not None and len(x) == dim
            else None
            for x in v
        ]
        valid = [r for r in rows if r is not None]
        if valid:
            proj = (np.stack(valid) - mu) @ w
        out, vi = [], 0
        for r in rows:
            if r is None:
                out.append(None)
                continue
            out.append([float(x) for x in proj[vi]])
            vi += 1
        return pd.Series(out)

    return df.select(F.col(id_col), _proj(F.col(vec_col)).alias(out_col))


def embedding_pca(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Fit + transform in one call: (id, pca array<double>[k])."""
    mean, comps, _ = pca_components(df, k, vec_col, dim)
    return pca_project(df, mean, comps, id_col, vec_col)
