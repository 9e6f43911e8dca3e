"""Property-based tests (hypothesis) for the round-5 relational/text
operators, each checked against a transparent pure-Python reference."""

from __future__ import annotations

import bisect
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_parquet_server_spark.operators.asof import asof_join
from prometheus_parquet_server_spark.operators.rollup import rollup_cascade
from prometheus_parquet_server_spark.pipeline.chunk import chunk_documents

_words = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=40
)


@settings(max_examples=12, deadline=None)
@given(words=_words, max_tokens=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunks_reconstruct_the_document(spark, words, max_tokens, overlap):
    """Dropping each non-first chunk's overlapping prefix and concatenating
    must reproduce the original token stream exactly — no token lost or
    duplicated by the windowing, for ANY (max_tokens, overlap)."""
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(
            df, max_tokens=max_tokens, overlap=overlap
        ).collect()
    )
    rebuilt: list[str] = []
    for cid, ctext in chunks:
        toks = ctext.split(" ") if ctext else []
        rebuilt.extend(toks if cid == 0 else toks[overlap:])
    assert rebuilt == words


_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=30
)


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events)
def test_asof_matches_python_reference(spark, left, right):
    """Backward as-of against a bisect-based reference (unique right
    (key, ts) per the operator's determinism contract)."""
    rmap: dict[int, dict[int, float]] = {}
    for k, t in right:
        rmap.setdefault(k, {})[t] = float(k * 1000 + t)
    l_df = spark.createDataFrame(
        [(k, float(t)) for k, t in left], "k long, ts double"
    )
    r_df = spark.createDataFrame(
        [(k, float(t), v) for k, ts in rmap.items() for t, v in ts.items()],
        "k long, ts double, value double",
    )
    got = {
        (r["k"], r["ts"]): (r["value_asof"], r["ts_asof"])
        for r in asof_join(l_df, r_df, on="ts", by=("k",)).collect()
    }
    for k, t in set(left):
        ts_sorted = sorted(rmap.get(k, {}))
        i = bisect.bisect_right(ts_sorted, t)
        want = (
            (rmap[k][ts_sorted[i - 1]], float(ts_sorted[i - 1]))
            if i > 0
            else (None, None)
        )
        assert got[(k, float(t))] == want, (k, t)


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 500), st.integers(-100, 100)),
        min_size=1,
        max_size=40,
    )
)
def test_rollup_cascade_matches_direct_python(spark, data):
    """Day-level cascade totals equal a pure-Python direct aggregation."""
    df = spark.createDataFrame(
        [("m", float(t), float(v)) for t, v in data],
        "event_type string, ts double, value double",
    )
    day = rollup_cascade(df, (10.0, 50.0, 100.0), by=("event_type",))[100.0]
    got = {
        r["bucket_ts"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in day.collect()
    }
    want: dict[float, list] = {}
    for t, v in data:
        b = math.floor(t / 100.0) * 100.0
        acc = want.setdefault(b, [0, 0.0, float("inf"), float("-inf")])
        acc[0] += 1
        acc[1] += float(v)
        acc[2] = min(acc[2], float(v))
        acc[3] = max(acc[3], float(v))
    assert set(got) == set(want)
    for b, (n, s, mn, mx) in want.items():
        gn, gs, gmn, gmx = got[b]
        assert gn == n and gmn == mn and gmx == mx
        assert math.isclose(gs, s, rel_tol=1e-12, abs_tol=1e-9)


_samples = st.lists(
    st.tuples(
        st.integers(0, 2),            # series id
        st.integers(0, 400),          # ts (seconds; deduped per series)
        st.integers(-50, 50),         # value
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(samples=_samples, chunk_deci=st.integers(1, 60), offset=st.integers(0, 30))
def test_chunked_slot_ops_equal_uniform(spark, samples, chunk_deci, offset):
    """For ANY data, chunk width and offset, the chunked slot operators
    (resample + irate) must be bit-identical to their uniform twins —
    the carry-in across (possibly empty) chunks is pure partitioning."""
    from prometheus_parquet_server_spark.operators.grid import RegularTimeRange
    from prometheus_parquet_server_spark.operators.interpolate import (
        resample_to_grid,
    )
    from prometheus_parquet_server_spark.operators.rate import irate_to_grid

    dedup = {}
    for sid, ts, v in samples:
        dedup[(sid, ts)] = float(v)
    rows = [(str(s), float(t), v) for (s, t), v in sorted(dedup.items())]
    df = spark.createDataFrame(rows, "sid string, ts double, value double")
    grid = RegularTimeRange(0.0, 450.0, 30.0)
    gdf = grid.to_df(spark)
    cs = chunk_deci * 7.5  # widths incommensurate with both grid and data
    off = float(offset)

    def snap(fn, **kw):
        out = fn(df, gdf, series_cols=["sid"], grid=grid, offset=off, **kw)
        return sorted((r["sid"], r["ts"], repr(r["value"])) for r in out.collect())

    assert snap(resample_to_grid, chunk_s=cs) == snap(resample_to_grid)

    def irate(frame, g, **kw):
        return irate_to_grid(frame, g, over_range=120.0, **kw)

    assert snap(irate, chunk_s=cs) == snap(irate)


_doc_texts = st.lists(
    st.sampled_from(["alpha beta", "Alpha  BETA!", "gamma", "delta?", "Delta", "x"]),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(texts=_doc_texts, n_batches=st.integers(1, 3))
def test_dedup_ingest_batches_equal_first_occurrence(spark, texts, n_batches):
    """For ANY corpus and ANY batch split, sequential dedup_ingest emits
    exactly the first-occurrence winners (batch order, then id) a pure-
    Python reference computes, and the store holds one fingerprint per
    distinct normalized text."""
    import re
    import tempfile

    from prometheus_parquet_server_spark.pipeline.dedup_store import dedup_ingest

    docs = list(enumerate(texts))  # ids 0..n-1 in arrival order
    batches = [docs[i::n_batches] for i in range(n_batches)]

    def norm(t):
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    # reference: first occurrence by (batch index, doc_id)
    expect = {}
    for b, batch in enumerate(batches):
        for i, t in sorted(batch):
            expect.setdefault(norm(t), (b, i))
    want = sorted(i for _, i in expect.values())

    store = f"file://{tempfile.mkdtemp(prefix='prop_seen_')}/s"
    got = []
    for batch in batches:
        if not batch:
            continue
        df = spark.createDataFrame(
            [(i, t) for i, t in batch], "doc_id long, text string"
        )
        out = dedup_ingest(spark, store, df)
        got.extend(r["doc_id"] for r in out.collect())
        out.unpersist()
    assert sorted(got) == want


_mix_docs = st.lists(
    st.tuples(
        st.integers(0, 999),                      # doc id (deduped below)
        st.integers(0, 6),                        # token count
        st.sampled_from(["a", "b", "c"]),         # source
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)
_mix_weights = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.floats(0.1, 8.0, allow_nan=False),
    min_size=1,
    max_size=3,
)


@settings(max_examples=15, deadline=None)
@given(docs=_mix_docs, weights=_mix_weights, budget=st.integers(1, 300))
def test_mixture_sample_matches_python_model(spark, docs, weights, budget):
    """mixture_sample vs a transparent reference: identical (doc, epoch)
    multiset for ANY corpus/weights/budget — epochs, remainder prefix,
    boundary-doc rule, zero-mass and unweighted-source drops."""
    import hashlib
    import math as _math

    from prometheus_parquet_server_spark.pipeline.sample import mixture_sample

    rows = [(i, " ".join(["t"] * n), s) for i, n, s in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # pure-Python model of the documented contract
    wsum = sum(weights.values())
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, n, s in docs:
        if s in weights:
            by_src.setdefault(s, []).append((i, n))
    expected: set[tuple[int, int]] = set()
    guard_trips = False
    for s, items in by_src.items():
        avail = sum(n for _, n in items)
        target = _math.floor(float(budget) * weights[s] / wsum + 0.5)
        if avail == 0 or target == 0:
            continue
        full, rem = target // avail, target % avail
        if full >= 100:
            guard_trips = True
            continue
        for i, _n in items:
            for e in range(full):
                expected.add((i, e))
        if rem > 0:
            order = sorted(
                items,
                key=lambda t: (
                    hashlib.md5(f"{t[0]}:42".encode()).hexdigest(),
                    t[0],
                ),
            )
            cum = 0
            for i, n in order:
                if cum < rem:
                    expected.add((i, full))
                cum += n

    if guard_trips:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="full epochs"):
            mixture_sample(df, weights, budget).collect()
        return
    got = {
        (r["doc_id"], r["epoch"])
        for r in mixture_sample(df, weights, budget).collect()
    }
    assert got == expected


_bm25_docs = st.lists(
    st.tuples(
        st.integers(0, 99),
        st.lists(st.sampled_from(["q1", "q2", "zz", "ww"]), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(docs=_bm25_docs, k=st.integers(1, 5))
def test_bm25_matches_python_model(spark, docs, k):
    """bm25_topk vs a transparent reference for ANY tiny corpus: idf,
    length norm, integer-unit score quantization, tie-break, top-k cut."""
    import math as _math

    from prometheus_parquet_server_spark.pipeline.stats import bm25_topk

    rows = [(i, " ".join(toks)) for i, toks in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    query = {"q": ["q1", "q2", "ghost"]}

    N = len(docs)
    avgdl = sum(len(t) for _, t in docs) / N
    k1, b = 1.2, 0.75
    dfreq = {
        t: sum(1 for _, toks in docs if t in toks) for t in ("q1", "q2")
    }
    scores = {}
    for i, toks in docs:
        dl = len(toks)
        units = 0
        for t in ("q1", "q2"):
            tf = toks.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = _math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            units += _math.floor(c * 1e6 + 0.5)
        if units or any(t in toks for t in ("q1", "q2")):
            scores[i] = units / 1e6
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    expected = {
        (i, s, r + 1) for r, (i, s) in enumerate(ranked)
    }

    got = {
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(df, query, k=k, salt_buckets=3).collect()
    }
    assert got == expected
