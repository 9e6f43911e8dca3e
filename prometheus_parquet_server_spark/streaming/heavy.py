"""Streaming heavy-hitter n-grams: a second custom STATEFUL operator on
``applyInPandasWithState`` (the sessionize pattern, streaming/sessions.py)
— boilerplate/template detection that keeps up with an arriving corpus
instead of rescanning it.

Design: gram occurrences shard by ``pmod(xxhash64(gram), shards)``, so
every occurrence of a gram meets in ONE state group; each shard's state
is a capacity-bounded weighted Misra-Gries summary (the SAME
``sketch.mg_fold`` kernel as the batch sketch — the two cannot drift),
folded once per micro-batch. State is ≤ ``shards × capacity`` counters
total, FOREVER — independent of stream length and gram cardinality —
and the only shuffle is the gram→shard exchange of each micro-batch
(never history). Per-shard MG bound: after any prefix of the stream, a
gram with ``count > shard_total/(capacity+1)`` is guaranteed present in
its shard's summary with ``count − shard_total/(capacity+1) ≤ est ≤
count`` — sharding by the gram itself makes the per-shard bound a
GLOBAL guarantee (a gram's shard_total ≤ stream total).

Each trigger emits the updated shards' full summaries
``(shard, gram, est, shard_total)`` (outputMode=update); ``shard_total``
is monotone per shard, so a consumer keeps the rows with each shard's
max as the current candidate set. The exact-verify pass of the batch
operator (pipeline/sketch.py heavy_hitter_grams) applies downstream
whenever exact counts are needed: candidates are few, so the verify is a
broadcast-filtered scan of whatever corpus snapshot exists.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("gram", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("shard_total", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("grams", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)


def stream_heavy_hitter_grams(
    docs_stream: DataFrame,
    n: int = 2,
    capacity: int = 256,
    shards: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Streaming Misra-Gries candidates over token ``n``-grams of
    ``docs_stream`` (a streaming DataFrame with ``text_col``). Returns
    the streaming frame of per-trigger summary emissions — see module
    docstring for state/shuffle bounds and the recovery rule."""
    from prometheus_parquet_server_spark.pipeline.sketch import (
        _gram_array,
        mg_fold,
    )

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    grams = docs_stream.select(
        F.explode(_gram_array(text_col, n)).alias("gram")
    ).select(
        F.pmod(F.xxhash64("gram"), F.lit(shards)).cast("int").alias("_shard"),
        "gram",
    )

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            g, c, total = state.get
            counters = dict(zip(g, c))
        else:
            counters, total = {}, 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        s = pd.concat(frames, ignore_index=True)["gram"]
        total += len(s)
        mg_fold(counters, s.value_counts(sort=False).items(), capacity)
        state.update((list(counters.keys()), [int(v) for v in counters.values()], total))
        yield pd.DataFrame(
            [(shard, g2, int(c2), total) for g2, c2 in counters.items()],
            columns=["shard", "gram", "est", "shard_total"],
        )

    return grams.groupBy("_shard").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_heavy_grams(
    docs: DataFrame,
    summaries: DataFrame,
    n: int = 2,
    threshold_frac: float = 0.001,
    capacity: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Pass-2 exact verify for a DRAINED stream of summary emissions —
    the streaming twin of ``heavy_hitter_grams``'s second pass, so a
    finite availableNow drain ends in exactly the batch operator's
    output (``(gram, n_occ)`` for every gram with ``n_occ >=
    threshold_frac`` of all gram occurrences).

    ``summaries`` is the collected update-mode output of
    :func:`stream_heavy_hitter_grams`: per shard, the emission with the
    max ``shard_total`` is the final state (totals are strictly
    increasing per emitting trigger). Candidate pruning uses the
    per-shard MG bound — a true heavy hitter's estimate is at least
    ``f·N − shard_total/(capacity+1)`` (kept with ``>=``, the
    recall-safe side of the boundary) — then one exact count over the
    finite corpus applies the true threshold, killing false positives.
    The collect is bounded by shards × capacity rows (the same
    deliberately-small driver materialization as the batch pass)."""
    from pyspark.sql import Window

    from prometheus_parquet_server_spark.pipeline.sketch import _gram_array

    spark = docs.sparkSession
    empty = spark.createDataFrame([], "gram string, n_occ long")
    w = Window.partitionBy("shard")
    final = summaries.withColumn(
        "_mx", F.max("shard_total").over(w)
    ).filter(F.col("shard_total") == F.col("_mx"))
    rows = final.select("shard", "gram", "est", "shard_total").collect()
    shard_totals: dict[int, int] = {}
    for r in rows:
        shard_totals[r["shard"]] = r["shard_total"]
    total_n = sum(shard_totals.values())
    if total_n == 0:
        return empty
    cut = float(total_n) * threshold_frac
    candidates = [
        r["gram"]
        for r in rows
        if r["est"] >= cut - r["shard_total"] / (capacity + 1)
    ]
    if not candidates:
        return empty
    return (
        docs.select(F.explode(_gram_array(text_col, n)).alias("gram"))
        .filter(F.col("gram").isin(candidates))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= F.lit(cut))
    )
