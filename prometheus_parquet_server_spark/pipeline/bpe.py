"""In-cluster BPE tokenizer training — the classic byte-pair-encoding
merge-learning loop (Sennrich, Haddow & Birch 2016, public algorithm)
factored for Spark's execution model.

The key published structure: BPE trains on the WORD-FREQUENCY TABLE, not
the corpus. The corpus is scanned ONCE to count words (a vocab-sized
aggregate — the same shape as stats.token_stats); every merge iteration
then runs over that small frame:

1. pair counts: explode each word's adjacent symbol pairs, weighted by
   the word's count — a hash aggregate over at most
   Σ(len(word)−1) distinct pairs (alphabet²-bounded in practice);
2. best pair: deterministic top-1 by (count desc, pair asc) — a tiny
   TakeOrdered, broadcast back;
3. merge application: one Arrow pass rewriting each word's symbol array
   (words are short; the Python loop is per-word-per-merge over a
   vocab-sized frame, never the corpus).

``iters`` merge rounds = ``iters`` small jobs over the persisted word
frame. The one corpus-sized job is the initial word count. At 100 TB the
word table still fits a few executors (natural-language vocabulary
growth is sublinear), and every stage above is a plain shuffle-once
aggregate.

Not SQL-expressible (an iterative fixpoint), so the registry row is
rows-only like emb_pca / quality_classifier; correctness is pinned by
EXACT parity with a transparent single-machine reference implementation
of the same tie-break (tests/test_bpe.py).

``bpe_encode`` applies a learned merge list to any text column (greedy
in merge-priority order — the standard BPE encoder), enabling
learned-vocab token counting downstream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_WORD = "</w>"  # end-of-word marker, the Sennrich convention


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the ONE corpus-sized job."""
    from prometheus_parquet_server_spark.pipeline.text import tokens_col

    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _apply_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Merge every non-overlapping (a, b) adjacency, left to right."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list ``[(a, b), ...]`` (merge i has priority i). Stops
    early when no pair reaches ``min_pair_count``. Ties on pair count
    break lexicographically on (a, b) — fully deterministic, and the
    exact rule the pure-Python test reference replays."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")

    words = _word_counts(df, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # per-character array
            F.array(F.lit(END_WORD)),
        ),
    ).select("syms", "n").persist()
    try:
        words.count()  # materialize once; iterations rewrite from here
        merges: list[tuple[str, str]] = []
        current = words
        for _ in range(num_merges):
            pairs = (
                current.select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), 1, F.size("syms") - 1),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda x, y: F.struct(
                                x.alias("a"), y.alias("b")
                            ),
                        )
                    ).alias("p"),
                    "n",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
            )
            best = (
                pairs.orderBy(
                    F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_pair_count:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))

            def _merge_batch(
                batches: Iterator[pd.DataFrame], _a=a, _b=b
            ) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["syms"] = [
                        _apply_merge(list(s), _a, _b) for s in pdf["syms"]
                    ]
                    yield pdf

            # localCheckpoint, not persist: each round's frame must
            # TRUNCATE lineage, or 30 stacked mapInPandas plans blow the
            # driver heap just printing the tree (measured OOM at 30
            # merges) — the same rule as the connected-components loop
            current = current.mapInPandas(
                _merge_batch, schema="syms array<string>, n long"
            ).localCheckpoint()
        return merges
    finally:
        words.unpersist()


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encoding of one word: repeatedly apply the
    LOWEST-RANK (earliest-learned) applicable merge — the standard BPE
    inference rule, shared by the Spark encoder and the test reference."""
    syms = list(word) + [END_WORD]
    while len(syms) > 1:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        _r, i = min(cand)
        a, b = syms[i], syms[i + 1]
        # apply ALL adjacencies of that merge left-to-right (matches the
        # training-side _apply_merge sweep)
        syms = _apply_merge(syms, a, b)
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode every document with a learned merge list: ``(id, out_col
    array<string>, n_bpe_tokens)``. One Arrow pass, no shuffle; the merge
    table ships in the closure (vocab-sized). NULL text encodes to []."""
    from prometheus_parquet_server_spark.pipeline.text import tokens_col

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for toks in pdf["_toks"]:
                doc: list[str] = []
                for w in toks if toks is not None else []:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    doc.extend(enc)
                out.append(doc)
            yield pd.DataFrame(
                {"_id": pdf["_id"], out_col: out}
            )

    staged = df.select(
        F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    id_ddl = df.schema[id_col].dataType.simpleString()
    enc = staged.mapInPandas(
        _enc, schema=f"_id {id_ddl}, {out_col} array<string>"
    )
    return enc.select(
        F.col("_id").alias(id_col),
        out_col,
        F.size(out_col).alias("n_bpe_tokens"),
    )
