"""Document chunking: split long documents into fixed-token windows with
overlap — the preprocessing step that turns variable-length documents into
training-context-sized pieces while preserving boundary context.

Pure per-row expression work (tokenize once, then one ``explode`` of the
per-document chunk list): zero shuffles, whole-stage pipelineable, output
rows flow straight into dedup/packing. Deterministic and replayed exactly
by the DuckDB oracle (whitespace tokens, space re-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import tokens_col


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, n_chunk_tokens, chunk_text): consecutive windows of
    ``max_tokens`` whitespace tokens starting every ``max_tokens −
    overlap`` tokens; the final window is the remainder (shorter, never
    empty). Documents at or under ``max_tokens`` yield one chunk; empty
    documents yield none.

    Chunk count is exact: ``1 + ceil((n − max_tokens) / stride)`` for
    ``n > max_tokens`` — the same closed form as the reference's regular
    grid length (src/timevectors.rs:44-57): last-start must be the
    smallest multiple of stride with ``start + max_tokens ≥ n``.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap} for {max_tokens}"
        )
    stride = max_tokens - overlap
    base = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_t"))
    t, n = F.col("_t"), F.size(F.col("_t"))
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        (n - F.lit(max_tokens) + F.lit(stride - 1)) / F.lit(stride) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(t, i * stride + 1, max_tokens).alias("_toks"),
        ),
    )
    return (
        base.filter(n > 0)
        .select(id_col, F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.size("_c._toks").alias("n_chunk_tokens"),
            F.array_join("_c._toks", " ").alias("chunk_text"),
        )
    )
