"""BPE trainer: exact merge-list parity with a transparent pure-Python
reference (same tie-break), encoding round-trip, early stop, NULL text."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from prometheus_parquet_server_spark.pipeline.bpe import (
    END_WORD,
    bpe_encode,
    encode_word,
    train_bpe,
)


def _py_bpe(word_counts: dict[str, int], num_merges: int, min_pair: int = 2):
    """Single-machine Sennrich BPE with the identical tie-break:
    (count desc, a asc, b asc)."""
    vocab = {w: list(w) + [END_WORD] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            n = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in vocab:
            syms = vocab[w]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


CORPUS = [
    (1, "low low low lower lower newest newest newest newest widest"),
    (2, "newest widest widest low lowest"),
    (3, "the newest the lowest the low"),
]


def test_merge_list_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    # reference word counts = whitespace tokens of the same corpus
    wc: dict[str, int] = {}
    for _, t in CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    expect = _py_bpe(wc, num_merges=12)
    got = train_bpe(df, num_merges=12)
    assert got == expect
    assert len(got) == 12  # this corpus supports 12 productive merges


def test_early_stop_when_no_frequent_pair(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once -> min_pair_count=2 stops immediately
    assert train_bpe(df, num_merges=10, min_pair_count=2) == []


def test_encode_round_trip_and_counts(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(df, num_merges=8)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # every word reconstructs exactly from its encoded symbols
    for w in ["low", "lowest", "newest", "widest", "the", "unseenword"]:
        syms = encode_word(w, ranks)
        assert "".join(syms).replace(END_WORD, "") == w

    enc = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
           for r in bpe_encode(df, merges).collect()}
    for doc_id, text in CORPUS:
        toks, n = enc[doc_id]
        assert n == len(toks)
        # concatenated doc reconstruction (strip end-of-word markers)
        assert "".join(toks).replace(END_WORD, "") == text.replace(" ", "")
    # learned merges compress: fewer symbols than characters
    assert enc[1][1] < len(CORPUS[0][1].replace(" ", "")) + len(CORPUS[0][1].split())


def test_null_text_encodes_empty(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa"), (2, None)], "doc_id long, text string"
    )
    merges = train_bpe(df, num_merges=2)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert got[2] == 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bpe(df, num_merges=0)
    with pytest.raises(ValueError):
        train_bpe(df, num_merges=1, min_pair_count=0)
