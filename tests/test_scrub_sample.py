"""PII scrubbing, repetition metrics, and deterministic sampling —
edge-case coverage the sf0.01 oracle harness can't see (empty text,
overlap precedence, skew equivalence of the two-phase cap)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.sample import (
    capped_sample,
    stratified_sample,
)
from prometheus_parquet_server_spark.pipeline.scrub import pii_counts, scrub_pii
from prometheus_parquet_server_spark.pipeline.text import repetition_metrics


def _scrub_one(spark, text):
    counts = pii_counts(F.col("t"))
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            scrub_pii(F.col("t")).alias("clean"),
            *[c.alias(k) for k, c in counts.items()],
        )
        .collect()[0]
    )
    return row


def test_scrub_all_kinds(spark):
    r = _scrub_one(
        spark,
        "mail a.b+c@sub.example.org, host 192.168.0.1, call +44 (0)20-7946-0958.",
    )
    assert r["clean"] == "mail <EMAIL>, host <IP>, call <PHONE>."
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)


def test_scrub_no_false_positives(spark):
    # bare digit runs, version strings with <4 octets, and @-less hosts stay
    r = _scrub_one(spark, "version 1.2.3 of pkg at example.com port 8080")
    assert r["clean"] == "version 1.2.3 of pkg at example.com port 8080"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)


def test_scrub_overlap_counts_once(spark):
    # the host part of an email contains an IP-shaped substring: the email
    # pattern wins (applied first) and the IP counter must NOT also fire
    r = _scrub_one(spark, "x user@10.0.0.7.example.com y")
    assert r["clean"] == "x <EMAIL> y"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 0, 0)


def test_repetition_metrics_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # run of 3, top bigram 'a a' ×2 of 3
            (2, "x y x y"),          # no run >1, 'x y' ×2 of 3
            (3, "unique words only"),
            (4, ""),                 # empty text edge
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rows[1]["max_run"] == 3
    assert rows[1]["top_bigram_count"] == 2
    assert rows[1]["dup_word_frac"] == 0.5  # 4 words, 2 distinct
    assert rows[2]["max_run"] == 1
    assert rows[2]["top_bigram_count"] == 2
    assert rows[3]["max_run"] == 1
    assert rows[3]["top_bigram_count"] == 1
    assert rows[3]["dup_word_frac"] == 0.0
    assert rows[4]["n_words"] == 0
    assert rows[4]["max_run"] == 0
    assert rows[4]["top_bigram_count"] == 0
    assert rows[4]["top_bigram_frac"] == 0.0


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot group (200 rows) + many small groups — the shape the
    # two-phase rank exists for
    return spark.range(260).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 6).cast("string")))
        .alias("source"),
    )


def test_capped_sample_matches_single_window(skewed):
    """The skew-proof two-phase rank must be row-identical to the naive
    single-window form for every presample_salts setting."""
    key = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("42")))
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    naive = (
        skewed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 7)
    )
    expected = sorted(
        (r["doc_id"], r["source"], r["sample_rank"]) for r in naive.collect()
    )
    for salts in (1, 4, 16):
        got = sorted(
            (r["doc_id"], r["source"], r["sample_rank"])
            for r in capped_sample(
                skewed, "source", cap=7, presample_salts=salts
            ).collect()
        )
        assert got == expected, f"salts={salts}"


def test_capped_sample_caps_and_keeps_small_groups(skewed):
    out = capped_sample(skewed, "source", cap=7).groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in out}
    assert by_src["hot"] == 7
    # small groups (10 rows each) keep all 7; none exceed the cap
    assert all(c <= 7 for c in by_src.values())


def test_stratified_sample_deterministic_and_banded(skewed):
    kept = stratified_sample(
        skewed, {"hot": 0.1}, group_col="source", default_fraction=1.0
    )
    again = stratified_sample(
        skewed, {"hot": 0.1}, group_col="source", default_fraction=1.0
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == sorted(r["doc_id"] for r in again.collect())
    by_src = {
        r["source"]: r["count"] for r in kept.groupBy("source").count().collect()
    }
    # default 1.0 keeps every row of the small groups
    assert sum(v for k, v in by_src.items() if k != "hot") == 60
    # ~10% of the hot group survives the md5 band (exact count is fixed)
    assert 0 < by_src.get("hot", 0) < 60


def test_stratified_sample_rejects_bad_fraction(skewed):
    with pytest.raises(ValueError):
        stratified_sample(skewed, {"hot": 1.5})


def test_repetition_plan_shape(spark):
    """Scale contract: the wide text column never shuffles — the only
    exchanges carry (id, bigram, count) aggregates, and the aggregated
    side comes back via broadcast, not a sort-merge join."""
    from prometheus_parquet_server_spark.driver_contract import QUERIES

    df = QUERIES["text_repetition"](spark, "/root/testdata/sf0.001")
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_scrub_and_stratified_plans_are_map_only(spark):
    from prometheus_parquet_server_spark.pipeline.sample import stratified_sample
    from prometheus_parquet_server_spark.pipeline.scrub import scrub_pii

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        docs.select(scrub_pii(F.col("text")).alias("c")),
        stratified_sample(docs, {"src0": 0.5}),
    ):
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "Exchange" not in plan


def test_chunk_documents_golden(spark):
    from prometheus_parquet_server_spark.pipeline.chunk import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 tokens: max=4, overlap=1 → stride 3
            (2, "x y"),            # fits in one chunk
            (3, ""),               # no chunks
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
    )
    assert rows == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),
        (2, 0, 2, "x y"),
    ]
    # exact boundary: 4 tokens → single chunk; 5 tokens → two chunks
    five = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    got = chunk_documents(five, max_tokens=4, overlap=1).collect()
    assert sorted(r["chunk_text"] for r in got) == ["a b c d", "d e"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)


def test_token_budget_sample(spark):
    from prometheus_parquet_server_spark.pipeline.sample import token_budget_sample

    df = spark.createDataFrame(
        [(i, "w " * 10, "g") for i in range(20)] + [(100, "a b c", "tiny")],
        "doc_id long, text string, source string",
    )
    kept = token_budget_sample(df, budget_tokens=35, group_col="source")
    by = {r["source"]: r for r in kept.groupBy("source")
          .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t")).collect()}
    # 10-token docs: 3 fit under 35 before the boundary; the 4th starts at
    # 30 < 35 so it is kept too (boundary doc), the 5th starts at 40 — cut
    assert by["g"]["n"] == 4 and by["g"]["t"] == 40
    # a group smaller than the budget keeps everything
    assert by["tiny"]["n"] == 1 and by["tiny"]["t"] == 3
    # determinism: same kept set on rerun
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in token_budget_sample(df, budget_tokens=35, group_col="source").collect()
    )
    assert ids1 == ids2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        token_budget_sample(df, budget_tokens=0)


def test_token_budget_rejects_clobbering(spark):
    from prometheus_parquet_server_spark.pipeline.sample import token_budget_sample

    df = spark.createDataFrame(
        [(1, "a b", "g", 99)], "doc_id long, text string, source string, n_tokens long"
    )
    with pytest.raises(ValueError, match="clash"):
        token_budget_sample(df, budget_tokens=10, group_col="source")


def test_mixture_rejects_internal_column_clash(spark):
    """The clash guard covers working columns too, not just outputs —
    an input `_w` would otherwise make the weight join ambiguous."""
    from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

    df = spark.createDataFrame(
        [(1, "a b", "g", 0.5)], "doc_id long, text string, source string, _w double"
    )
    with pytest.raises(ValueError, match="clash.*_w"):
        mixture_sample(df, weights={"g": 1.0}, total_budget_tokens=10)


def test_strip_markup_golden(spark):
    from prometheus_parquet_server_spark.pipeline.scrub import strip_markup
    from pyspark.sql import functions as F

    cases = [
        # script/style bodies vanish, tags vanish, whitespace collapses
        ("<html><body><p>Hello  <b>world</b></p>"
         "<script>var x = 1 < 2;</script><style>p{color:red}</style></body></html>",
         "Hello world"),
        # comments vanish; entities decode exactly one level
        ("<!-- c -->A &amp; B &lt;tag&gt; &amp;lt;kept&amp;gt; &#39;q&#39;",
         "A & B <tag> &lt;kept&gt; 'q'"),
        # plain prose is untouched (modulo whitespace collapse)
        ("just   prose, 1 < 2 stays", "just prose, 1 < 2 stays"),
        # unterminated tag-ish junk: '<' not followed by a letter stays
        ("a < b and a <= b", "a < b and a <= b"),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], "i long, t string")
    got = {r["i"]: r["c"] for r in df.select("i", strip_markup(F.col("t")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# Deterministic global shuffle / shard assignment (pipeline/shuffle.py)
# ---------------------------------------------------------------------------


def test_global_shuffle_deterministic_and_total(spark):
    from prometheus_parquet_server_spark.pipeline.shuffle import global_shuffle

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    ).repartition(7)
    a = [r["doc_id"] for r in global_shuffle(df, seed=3).collect()]
    b = [r["doc_id"] for r in global_shuffle(df.repartition(3), seed=3).collect()]
    assert a == b  # same seed: bit-stable across partitionings and runs
    assert sorted(a) == list(range(500))  # a permutation, nothing lost
    c = [r["doc_id"] for r in global_shuffle(df, seed=4).collect()]
    assert a != c  # different seed: different order


def test_global_shuffle_plan_is_range_partitioned(spark):
    from prometheus_parquet_server_spark.pipeline.shuffle import global_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    )
    plan = global_shuffle(df)._jdf.queryExecution().executedPlan().toString()
    # total sort compiles to a range exchange (parallel), never a
    # single-partition sort
    assert "rangepartitioning" in plan.lower()
    assert "singlepartition" not in plan.lower()


def test_shard_assign_balanced_and_in_range(spark):
    from prometheus_parquet_server_spark.pipeline.shuffle import shard_assign

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i,) for i in range(4000)], "doc_id long"
    )
    counts = {
        r["shard"]: r["n"]
        for r in shard_assign(df, n_shards=8, seed=1)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == set(range(8))  # every shard hit, all in range
    assert max(counts.values()) < 2 * min(counts.values())  # binomial-flat
    with pytest.raises(ValueError, match="positive"):
        shard_assign(df, n_shards=0)


class TestMixtureSample:
    def _docs(self, spark):
        # a: 4 docs x 2 tokens = 8 tokens; b: 2 docs x 3 tokens = 6 tokens
        rows = [(i, "t t", "a") for i in range(4)] + [
            (10, "x y z", "b"),
            (11, "p q r", "b"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_upsample_epochs_and_partial(self, spark):
        from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

        docs = self._docs(spark)
        # total 20, weights 3:1 -> a target 15, b target 5
        out = mixture_sample(docs, {"a": 3.0, "b": 1.0}, 20).collect()
        a = [r for r in out if r["source"] == "a"]
        b = [r for r in out if r["source"] == "b"]
        # a: avail 8 -> 1 full epoch (4 docs) + partial reaching rem=7
        # (md5 order; boundary doc kept -> all 4 docs again since
        # cum-n < 7 holds for docs at cum 2,4,6,8)
        assert sorted(r["epoch"] for r in a) == [0, 0, 0, 0, 1, 1, 1, 1]
        assert all(r["target_tokens"] == 15 for r in a)
        # b: avail 6 -> 0 full epochs, partial rem=5 -> both docs
        # (cum-n = 0 and 3, both < 5), epoch 0
        assert sorted(r["epoch"] for r in b) == [0, 0]
        assert all(r["target_tokens"] == 5 for r in b)

    def test_exact_epoch_boundary_no_partial(self, spark):
        from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

        docs = self._docs(spark)
        # a only: target = avail*2 exactly -> 2 full epochs, rem 0 -> no partial
        out = mixture_sample(docs, {"a": 1.0}, 16).collect()
        assert sorted(r["epoch"] for r in out) == [0] * 4 + [1] * 4

    def test_unweighted_source_dropped_and_zero_avail(self, spark):
        from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

        docs = self._docs(spark).union(
            spark.createDataFrame(
                [(20, None, "c"), (21, "", "c")],
                "doc_id long, text string, source string",
            )
        )
        # b unweighted -> dropped; c weighted but zero token mass -> nothing
        out = mixture_sample(docs, {"a": 1.0, "c": 5.0}, 8).collect()
        assert {r["source"] for r in out} == {"a"}

    def test_max_epochs_guard(self, spark):
        import pytest as _pytest

        from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

        docs = self._docs(spark)
        with _pytest.raises(ValueError, match="full epochs"):
            mixture_sample(docs, {"a": 1.0}, 10_000, max_epochs=100)

    def test_validation(self, spark):
        import pytest as _pytest

        from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

        docs = self._docs(spark)
        with _pytest.raises(ValueError):
            mixture_sample(docs, {}, 10)
        with _pytest.raises(ValueError):
            mixture_sample(docs, {"a": -1.0}, 10)
        with _pytest.raises(ValueError):
            mixture_sample(docs, {"a": 1.0}, 0)
        with _pytest.raises(ValueError):
            mixture_sample(docs.withColumn("epoch", docs.doc_id), {"a": 1.0}, 10)


def test_total_order_rank_exact_and_partition_independent(spark):
    """total_order_rank equals a driver-side sorted enumeration, for any
    partition count (offsets must compose correctly across range
    partitions), and never funnels through a single-partition global
    window."""
    from prometheus_parquet_server_spark.pipeline.shuffle import total_order_rank

    rows = [(i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double")
    want = {
        i: rk
        for rk, (i, _) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0])), start=1
        )
    }
    for parts in (1, 4, 32):
        got = {
            r["id"]: r["rank"]
            for r in total_order_rank(
                df, [F.col("score").desc(), F.col("id").asc()],
                n_partitions=parts,
            ).collect()
        }
        assert got == want, parts
