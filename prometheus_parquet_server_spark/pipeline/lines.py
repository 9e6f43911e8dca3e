"""Line-level boilerplate dedup and rule-based quality flags.

Two published pre-training cleanup steps the document-level pipeline
(pipeline/dedup.py, pipeline/text.py) doesn't cover:

* **Line-level dedup** (the RefinedWeb/C4 pattern): a line repeated
  across many documents — cookie banners, nav bars, license footers —
  is boilerplate even when the documents around it are unique. Detect
  by corpus-wide line frequency and strip lines above a threshold.
* **Rule flags** (the Gopher-style heuristic battery): per-document
  boolean flags for the symbol/bullet/ellipsis/alpha-word heuristics,
  alongside the soft ``quality_features`` score — rule filters are
  reproducible and auditable, which corpus curation needs more than
  cleverness.

Scale shape: line dedup is one explode → one hash aggregate on
md5(line) (the 32-byte hash shuffles, the line text never does) →
one broadcast-back join of the SMALL frequent-line set; stripping is
then a per-row filter over each doc's lines. Rule flags are pure
Column expressions (zero shuffle, whole-stage codegen).

All arithmetic is engine-replayable (md5, exact int ratios), so both
operators grade under the DuckDB oracle (``pipeline_line_dedup``,
``text_rule_flags``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import tokens_col


def _lines_col(text: Column) -> Column:
    """Non-empty, whitespace-trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def frequent_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(line_hash, n_docs) for every line occurring in at least
    ``min_docs`` DISTINCT documents. Distinct-per-doc before counting,
    so a line repeated inside one document doesn't fake corpus-wide
    boilerplate."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    per_doc = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.array_distinct(_lines_col(F.col(text_col)))).alias(
            "_line"
        ),
    ).select("_doc", F.md5("_line").alias("line_hash"))
    return (
        per_doc.groupBy("line_hash")
        .agg(F.count_distinct("_doc").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove corpus-boilerplate lines from every document: lines found
    in ≥ ``min_docs`` distinct docs are dropped, the rest re-join with
    a newline. The frequent-line set is tiny relative to the corpus
    (bounded by distinct boilerplate, not by rows), so it broadcasts;
    the document text itself never shuffles."""
    freq = frequent_lines(df, min_docs, text_col, id_col)
    bad = freq.agg(
        F.coalesce(
            F.collect_set("line_hash"), F.array().cast("array<string>")
        ).alias("_bad")
    )
    return (
        df.crossJoin(F.broadcast(bad))
        .withColumn(
            out_col,
            F.array_join(
                F.filter(
                    _lines_col(F.col(text_col)),
                    lambda s: ~F.array_contains(F.col("_bad"), F.md5(s)),
                ),
                "\n",
            ),
        )
        .drop("_bad")
    )


def rule_flags(text: Column) -> dict[str, Column]:
    """Gopher-style per-document rule flags (exact int/ratio arithmetic,
    thresholds fixed so the oracle replays them):

    - ``flag_too_short`` / ``flag_too_long``: token count outside
      [5, 100000];
    - ``flag_symbol_heavy``: (# of '#' + '…' + '...') / tokens > 0.1;
    - ``flag_bullet_heavy``: > 90% of lines start with a bullet;
    - ``flag_ellipsis_heavy``: > 30% of lines end with an ellipsis;
    - ``flag_low_alpha``: < 80% of tokens contain a letter.
    """
    toks = tokens_col(text)
    n_tok = F.size(toks)
    lines = _lines_col(text)
    n_line = F.size(lines)
    n_sym = (
        F.length(text)
        - F.length(F.regexp_replace(text, "#", ""))
        + (
            F.length(text)
            - F.length(F.regexp_replace(text, "\\.\\.\\.", ""))
        )
        / F.lit(3)
        + F.length(text)
        - F.length(F.regexp_replace(text, "…", ""))
    )
    n_bullet = F.size(
        F.filter(lines, lambda s: s.rlike("^[-*•‣▪]"))
    )
    n_ell = F.size(F.filter(lines, lambda s: s.rlike("(\\.\\.\\.|…)$")))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return {
        "flag_too_short": n_tok < 5,
        "flag_too_long": n_tok > 100_000,
        "flag_symbol_heavy": F.when(
            n_tok > 0, n_sym / n_tok > 0.1
        ).otherwise(F.lit(True)),
        "flag_bullet_heavy": F.when(
            n_line > 0, n_bullet / n_line > 0.9
        ).otherwise(F.lit(False)),
        "flag_ellipsis_heavy": F.when(
            n_line > 0, n_ell / n_line > 0.3
        ).otherwise(F.lit(False)),
        "flag_low_alpha": F.when(
            n_tok > 0, n_alpha / n_tok < 0.8
        ).otherwise(F.lit(True)),
    }
