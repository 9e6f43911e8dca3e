"""Dataset split assignment + benchmark contamination (pipeline/split.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from prometheus_parquet_server_spark.pipeline.split import (
    SPLIT_BUCKETS,
    assign_split,
    contamination_hits,
    word_ngram_hashes,
)


def test_assign_split_deterministic_and_banded(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    out = assign_split(df, seed=42)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # ~98/1/1 split; bands are exact so rerun is bit-identical
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 1900
    again = {r["doc_id"]: r["split"] for r in assign_split(df, seed=42).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again
    # engine-replayable: the bucket is plain md5 — python agrees
    for doc_id, split in list(first.items())[:50]:
        bucket = int(hashlib.md5(f"{doc_id}:42".encode()).hexdigest()[:8], 16) % SPLIT_BUCKETS
        expected = "train" if bucket < 9800 else ("val" if bucket < 9900 else "test")
        assert split == expected, (doc_id, bucket, split, expected)
    # a different seed shuffles membership
    other = {r["doc_id"]: r["split"] for r in assign_split(df, seed=7).collect()}
    assert other != first


def test_assign_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(df, weights=(("train", 0.5), ("val", 0.1)))


def test_word_ngram_hashes_short_docs_empty(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "one two three four five")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngram_hashes(F.col("text"), 4).alias("g")).collect()
    }
    assert rows[1] == []  # 3 tokens < n=4
    assert len(rows[2]) == 2  # two 4-grams


def test_pack_assignments_boundaries(spark):
    from prometheus_parquet_server_spark.pipeline.split import pack_assignments

    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens, starts at 0  -> pack 0
            (2, "a b c d"),        # 4 tokens, starts at 3  -> pack 0
            (3, "a b c d e"),      # 5 tokens, starts at 7  -> pack 1
        ],
        "doc_id bigint, text string",
    )
    # n_buckets=1 collapses to pure id-ordered packing
    out = {
        r["doc_id"]: (r["pack_bucket"], r["pack_seq"], r["n_tokens"])
        for r in pack_assignments(docs, budget_tokens=6, n_buckets=1).collect()
    }
    assert out == {1: (0, 0, 3), 2: (0, 0, 4), 3: (0, 1, 5)}


def test_contamination_hits_finds_shared_grams(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words here nothing shared"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_contaminated_grams"] for r in contamination_hits(docs, bench, n=5).collect()}
    # doc 1 shares exactly one 5-gram ("alpha beta gamma delta epsilon")
    assert got == {1: 1}


def test_novelty_counts_matches_set_model(spark):
    """novelty_counts vs a pure-Python set model: distinct-bigram totals
    and never-in-reference tallies exact; short docs emit no row; an
    all-reference doc scores zero novel; NULL ids dropped."""
    from prometheus_parquet_server_spark.pipeline.split import novelty_counts

    ref = spark.createDataFrame(
        [(90, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),        # both bigrams in ref
            (2, "alpha beta zeta omega"),   # 1 of 3 in ref
            (3, "totally new words here"),  # all novel
            (4, "single"),                  # < n tokens: no row
            (None, "alpha beta"),           # NULL id: dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in novelty_counts(docs, ref, n=2).collect()
    }

    def bigrams(t):
        w = t.lower().split()
        return {f"{a} {b}" for a, b in zip(w, w[1:])}

    rset = bigrams("alpha beta gamma delta")
    want = {}
    for did, text in ((1, "alpha beta gamma"), (2, "alpha beta zeta omega"),
                      (3, "totally new words here")):
        g = bigrams(text)
        want[did] = (len(g), len(g - rset))
    assert got == want
    assert got[1][1] == 0 and got[3][0] == got[3][1]


def test_leakage_safe_split_pairs_never_straddle(spark):
    """leakage_safe_split: every near-dup pair lands in ONE split (the
    property assign_split cannot give); loners band exactly like
    assign_split; the whole cluster inherits the MIN-id representative's
    bucket (python md5 replay); zero pairs degenerates to assign_split;
    deterministic."""
    from prometheus_parquet_server_spark.pipeline.split import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    # three clusters, incl. a chain (transitive closure) and a far pair
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 1999), (100, 200), (200, 300)],
        "id_a bigint, id_b bigint",
    )
    out = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 2000
    for a, b in [(0, 1), (1, 2), (0, 2), (5, 1999), (100, 200), (200, 300)]:
        assert out[a] == out[b], (a, b, out[a], out[b])

    # cluster members band on the representative's (min id) bucket
    def band_of(key):
        bucket = int(
            hashlib.md5(f"{key}:42".encode()).hexdigest()[:8], 16
        ) % SPLIT_BUCKETS
        return "train" if bucket < 9800 else ("val" if bucket < 9900 else "test")

    for member, rep in [(0, 0), (1, 0), (2, 0), (5, 5), (1999, 5),
                        (100, 100), (200, 100), (300, 100)]:
        assert out[member] == band_of(rep), (member, rep)

    # loners are untouched assign_split
    plain = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    clustered = {0, 1, 2, 5, 1999, 100, 200, 300}
    for did, s in out.items():
        if did not in clustered:
            assert s == plain[did]

    # zero pairs == assign_split exactly
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    degenerate = {r["doc_id"]: r["split"]
                  for r in leakage_safe_split(docs, empty).collect()}
    assert degenerate == plain

    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(docs, pairs).collect()}
    assert again == out


def test_fuzzy_contamination_matches_set_model(spark):
    """fuzzy_contamination: (n_inter, n_union, jaccard) equal a pure-
    Python shingle-set replay for every emitted pair; pairs below tau
    and zero-overlap pairs never emit; an exact copy scores 1.0 (the
    paraphrase-leakage case contamination_hits' exact n-gram test
    misses at n above the shared run); tau guard raises."""
    from prometheus_parquet_server_spark.pipeline.split import (
        fuzzy_contamination,
    )

    bench_rows = [
        (290, "the quick brown fox jumps over the lazy dog tonight"),
        (580, "completely different benchmark prompt about ledgers"),
    ]
    corpus_rows = [
        # exact copy of bench 290 → jaccard 1.0
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        # light edit (one word) → high jaccard, not 1.0
        (2, "the quick brown fox jumps over the lazy cat tonight"),
        # shares only a 2-token run → far below tau
        (3, "quick brown paint drying on a wall somewhere else"),
        # no overlap at all → never even a candidate pair
        (4, "zzz yyy xxx www vvv uuu ttt sss"),
    ]
    docs = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string")
    out = {(r["doc_id"], r["bench_id"]): (r["n_inter"], r["n_union"], r["jaccard"])
           for r in fuzzy_contamination(docs, bench, tau=0.5).collect()}

    def sh(text):
        t = text.lower().split()
        return set(
            " ".join(t[i:i + 2]) for i in range(len(t) - 1)
        ) if len(t) >= 2 else {" ".join(t)}

    bsets = {bid: sh(tx) for bid, tx in bench_rows}
    want = {}
    for did, tx in corpus_rows:
        s = sh(tx)
        for bid, bs in bsets.items():
            inter = len(s & bs)
            union = len(s | bs)
            if inter and inter / union >= 0.5:
                want[(did, bid)] = (inter, union, inter / union)
    assert out == want, (out, want)
    assert (1, 290) in out and out[(1, 290)][2] == 1.0
    assert (2, 290) in out and out[(2, 290)][2] < 1.0
    assert all(did not in (3, 4) for did, _ in out)

    with pytest.raises(ValueError, match="tau"):
        fuzzy_contamination(docs, bench, tau=0.0)


def test_eval_safe_split_report_partitions_and_guards(spark):
    """Capstone v6 composition: the release manifest partitions the
    corpus exactly (kept splits + dropped = every doc, token totals
    conserved); a fuzzy benchmark copy is dropped BEFORE splitting; a
    near-dup pair never straddles splits (both members carry the
    representative's split); zero pairs + zero hits degenerates to
    plain assign_split totals."""
    from prometheus_parquet_server_spark.pipeline.split import (
        assign_split,
        eval_safe_split_report,
    )

    bench = spark.createDataFrame(
        [(9001, "the quick brown fox jumps over the lazy dog today")],
        "doc_id bigint, text string",
    )
    # doc 1: verbatim benchmark copy -> jaccard 1.0 -> dropped.
    # docs 2/3: a near-dup pair (pairs frame) with different sources.
    # docs 4..23: unique filler.
    rows = [(1, "s0", "the quick brown fox jumps over the lazy dog today"),
            (2, "s0", "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "s1", "alpha beta gamma delta epsilon zeta eta iota")]
    rows += [(i, f"s{i % 2}", f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(4, 24)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    pairs = spark.createDataFrame([(2, 3)], "id_a bigint, id_b bigint")

    rep = eval_safe_split_report(docs, bench, pairs, tau=0.5).collect()
    by = {(r["split"], r["source"]): (r["n_docs"], r["n_tokens"]) for r in rep}
    # doc 1 dropped with its exact token count
    assert by.get(("dropped", "s0"), (0, 0))[0] == 1
    assert by[("dropped", "s0")][1] == 10
    # manifest partitions the corpus: kept + dropped == all 23 docs
    assert sum(n for n, _ in by.values()) == 23
    tok_total = sum(len(t.split()) for _, _, t in rows)
    assert sum(t for _, t in by.values()) == tok_total

    # the pair moves as one unit: both members carry doc 2's (the
    # representative's) own-id split, whatever plain assign_split
    # would have given doc 3
    rep_split = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.select("doc_id")).collect()
    }
    kept = {
        s: n for (s, src), (n, _) in by.items() if s != "dropped" and src == "s1"
    }
    # doc 3 (source s1) must land in doc 2's bucket band
    assert kept.get(rep_split[2], 0) >= 1
    # with no pairs and no benchmark overlap, the report reduces to
    # assign_split totals over the same corpus
    none_bench = spark.createDataFrame(
        [(9002, "completely disjoint vocabulary here")],
        "doc_id bigint, text string",
    )
    no_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    rep2 = eval_safe_split_report(docs, none_bench, no_pairs, tau=0.5).collect()
    assert sum(r["n_docs"] for r in rep2) == 23
    assert all(r["split"] != "dropped" for r in rep2)
    src_of = {d: sc for d, sc, _ in rows}
    want = {}
    for did, s in rep_split.items():
        want[(s, src_of[did])] = want.get((s, src_of[did]), 0) + 1
    got = {(r["split"], r["source"]): r["n_docs"] for r in rep2}
    assert got == want, (got, want)
