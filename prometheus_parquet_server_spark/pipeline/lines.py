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

Scale shape: line dedup explodes to (doc, pos, line) rows once; the
frequency aggregate moves only md5 hashes of whitespace-normalized
lines, membership is a LEFT ANTI equi-join (broadcast when the
boilerplate set is small, shuffle when it isn't — never a single
collected array), and survivors re-aggregate in position order. Rule
flags are pure Column expressions (zero shuffle, whole-stage codegen).

All arithmetic is engine-replayable (md5, exact int ratios), so both
operators grade under the DuckDB oracle (``pipeline_line_dedup``,
``text_rule_flags``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.text import tokens_col


def _norm_line(s: Column) -> Column:
    """Whitespace-normalize one line: strip LEADING/TRAILING whitespace of
    every kind (F.trim strips only ASCII spaces — a CRLF corpus would
    otherwise hash 'BANNER\r' differently from 'BANNER' and boilerplate
    would never reach min_docs)."""
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def _lines_col(text: Column) -> Column:
    """Non-empty, whitespace-normalized lines of a document (split on
    LF or CRLF)."""
    return F.filter(
        F.transform(F.split(text, "\r?\n"), _norm_line),
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
    """Remove corpus-boilerplate lines from every document: a line whose
    WHITESPACE-NORMALIZED form occurs in ≥ ``min_docs`` distinct docs is
    dropped; everything else — including blank lines and original
    indentation — passes through byte-identical, so paragraph structure
    survives (matching happens on the normalized form, output keeps the
    original line). Scale shape: lines explode to (doc, pos, line) rows
    once, the frequency aggregate moves only md5 hashes, membership is a
    LEFT ANTI equi-join on the hash (broadcast when the boilerplate set
    is small, shuffle when it isn't — never a single collected array),
    and survivors re-join in position order."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    lines = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias(
            "_i", "_line"
        ),
    ).withColumn("_h", F.md5(_norm_line(F.col("_line"))))
    freq = (
        lines.filter(_norm_line(F.col("_line")) != "")
        .select("_doc", "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    kept = (
        lines.join(freq, "_h", "left_anti")
        .groupBy("_doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_line"))),
                    lambda st: st["_line"],
                ),
                "\n",
            ).alias(out_col)
        )
    )
    return df.join(
        kept.withColumnRenamed("_doc", id_col), id_col, "left"
    ).withColumn(out_col, F.coalesce(out_col, F.lit("")))


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
    # \\p{L} (any Unicode letter, supported by both Java regex and RE2):
    # ASCII [a-z] would flag every non-Latin-script document as low-alpha
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("\\p{L}")))
    return {
        # NULL text → NULL n_tok; the emptiest document must FLAG as too
        # short, not slip a NULL past a boolean filter
        "flag_too_short": F.coalesce(n_tok < 5, F.lit(True)),
        "flag_too_long": F.coalesce(n_tok > 100_000, F.lit(False)),
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
