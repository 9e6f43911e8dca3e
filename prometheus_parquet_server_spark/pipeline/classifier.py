"""In-cluster quality classifier: a fastText-style LINEAR model over
hashed text features, trained by full-batch gradient descent — the
weak-supervision loop of a large-scale curation pipeline (public
pattern: CCNet / LLaMA quality filtering — train a cheap classifier on
rule-labeled or reference-corpus examples, score everything, keep the
high-scoring tail).

Spark-first factorization, the same shape as :mod:`.pca`:

1. **Gradient as sufficient statistics** — per training pass, each
   partition folds its Arrow batches into ONE ``(2 + dim)``-length
   partial ``[n, Σ log-loss, Σ∇…]`` (``mapInPandas`` hands the kernel a
   whole-partition iterator); the driver sums partials and takes one
   step. Collect budget: dim = 65 → ~0.5 KB per partition per pass —
   the treeAggregate escalation is never needed below ~10⁶ partitions.
2. **The text is scanned once** — features (hash_embed vectors) and
   labels are materialized and persisted BEFORE the loop; ``iters``
   passes re-scan the narrow cached feature frame, never the corpus.
3. **Scoring is one Arrow matmul per batch** — weights broadcast via
   closure, ``σ(Xw + b)``, no shuffle, NULL/wrong-length rows score
   NULL.

Not SQL-expressible (an iterative optimizer), so the registry row is
rows-only, like emb_pca; correctness is pinned by pytest parity against
a single-machine numpy implementation of the identical update rule,
plus a planted-signal separation gate and partition-count invariance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable both tails
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _grad_pass(
    feats: DataFrame, w: np.ndarray, dim: int, feat_col: str, label_col: str
) -> tuple[int, float, np.ndarray]:
    """One distributed full-batch pass: (n, Σ log-loss, Σ gradient) of the
    UNregularized objective at ``w`` (dim weights + trailing bias)."""
    wb = w.copy()  # capture by value — the closure ships one (dim+1) array

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        loss = 0.0
        g = np.zeros(dim + 1)
        for b in batches:
            # NULL labels surface as NaN in a pandas double column, not
            # None — pd.isna catches both encodings
            keep = [
                i
                for i, (x, y) in enumerate(zip(b[feat_col], b[label_col]))
                if x is not None and len(x) == dim and not pd.isna(y)
            ]
            if not keep:
                continue
            m = np.stack([np.asarray(b[feat_col].iloc[i], dtype=np.float64) for i in keep])
            y = np.asarray([float(b[label_col].iloc[i]) for i in keep])
            z = m @ wb[:dim] + wb[dim]
            p = _sigmoid(z)
            # log-loss with clamped probabilities (planted-separable data
            # drives p to exact 0/1 in float)
            pc = np.clip(p, 1e-12, 1 - 1e-12)
            loss += float(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)).sum())
            r = p - y
            g[:dim] += m.T @ r
            g[dim] += r.sum()
            n += m.shape[0]
        yield pd.DataFrame({"partial": [np.concatenate(([float(n), loss], g)).tolist()]})

    rows = feats.select(feat_col, label_col).mapInPandas(
        _partials, schema="partial array<double>"
    ).collect()
    total = np.sum([np.asarray(r["partial"], dtype=np.float64) for r in rows], axis=0)
    return int(total[0]), float(total[1]), total[2:]


def train_quality_classifier(
    df: DataFrame,
    feat_col: str = "features",
    label_col: str = "label",
    dim: int = 64,
    iters: int = 50,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[np.ndarray, list[float]]:
    """Fit logistic regression ``σ(x·w + b)`` by full-batch gradient
    descent: ``w ← w − lr·(∇/n + l2·w_no_bias)``. Returns ``(weights
    [dim+1, bias last], mean-log-loss history [iters])``.

    ``df`` must carry ``feat_col`` (``array<float/double>`` length
    ``dim``) and a 0/1 ``label_col``; NULL / wrong-length / NULL-label
    rows are excluded from the objective. The input is persisted for the
    loop and unpersisted after."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    feats = df.select(feat_col, label_col).persist()
    try:
        w = np.zeros(dim + 1)
        history: list[float] = []
        for _ in range(iters):
            n, loss, g = _grad_pass(feats, w, dim, feat_col, label_col)
            if n == 0:
                raise ValueError(
                    "no trainable rows: every row has NULL/wrong-length "
                    f"features or a NULL {label_col}"
                )
            history.append(loss / n)
            reg = np.concatenate((w[:dim], [0.0]))  # bias unregularized
            w = w - lr * (g / n + l2 * reg)
        return w, history
    finally:
        feats.unpersist()


def score_quality(
    df: DataFrame,
    weights: np.ndarray,
    feat_col: str = "features",
    out_col: str = "quality_score",
) -> DataFrame:
    """Append ``σ(x·w + b)`` as ``out_col`` — one Arrow matmul per batch
    (the pca_project kernel shape); NULL / wrong-length rows get NULL."""
    from pyspark.sql.functions import pandas_udf

    wv = np.asarray(weights, dtype=np.float64)
    dim = wv.shape[0] - 1

    @pandas_udf("double")
    def _score(col: pd.Series) -> pd.Series:
        out = np.full(len(col), np.nan)
        keep = [
            i
            for i, x in enumerate(col)
            if x is not None and len(x) == dim
        ]
        if keep:
            m = np.stack([np.asarray(col.iloc[i], dtype=np.float64) for i in keep])
            out[np.asarray(keep)] = _sigmoid(m @ wv[:dim] + wv[dim])
        s = pd.Series(out)
        return s.where(~s.isna(), None)

    return df.withColumn(out_col, _score(F.col(feat_col)))


def rule_label(text: Column) -> Column:
    """Weak-supervision label from the Gopher rule flags: 1 iff the
    document trips NO flag (int, never NULL — the flags are themselves
    NULL-proofed). The standard bootstrap when no hand-labeled quality
    set exists."""
    from prometheus_parquet_server_spark.pipeline.lines import rule_flags

    flags = rule_flags(text)
    clean = None
    for c in flags.values():
        clean = ~c if clean is None else clean & ~c
    return clean.cast("int")
