"""Hybrid retrieval (pipeline/stats.py): hash-embed cosine side, RRF
fusion against a transparent pure-Python model, and the composed
hybrid_topk contract."""

import hashlib
import math

import pytest

from prometheus_parquet_server_spark.pipeline.stats import (
    _query_hash_weights,
    hash_cosine_topk,
    hybrid_topk,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_query_hash_weights_matches_hash_embed_convention():
    """The driver-side query embedding uses the exact hash_embed md5
    math (bucket = first 8 hex digits mod dim, sign from digit 9)."""
    for t in ("hash", "join", "watermark"):
        h = hashlib.md5(t.encode()).hexdigest()
        b = int(h[:8], 16) % 64
        s = -1 if h[8] in "89abcdef" else 1
        assert _query_hash_weights([t], 64) == [(b, s)]
    # cancelling signs drop the bucket
    one = _query_hash_weights(["hash"], 1)
    assert one in ([], [(0, -2)], [(0, 2)]) or abs(one[0][1]) <= 2


def test_hash_cosine_topk_candidates_and_ranking(spark):
    """Candidates = docs sharing >=1 nonzero bucket; cosine computed
    from exact integer dot/norms; ranking 9-dp rounded, ties -> id."""
    docs = _docs(spark, [
        (1, "hash join"),        # shares both query buckets
        (2, "hash"),             # shares one
        (3, "unrelated words"),  # no overlap -> not a candidate (maybe)
    ])
    out = hash_cosine_topk(docs, {"q": ["hash", "join"]}, k=5, dim=64)
    rows = {r["doc_id"]: r["rank"] for r in out.collect()}
    # replay in pure python
    def vec(tokens, dim=64):
        acc = {}
        for t in tokens:
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            acc[b] = acc.get(b, 0) + (-1 if h[8] in "89abcdef" else 1)
        return {b: w for b, w in acc.items() if w != 0}

    qv = vec(["hash", "join"])
    want = []
    for did, txt in [(1, "hash join"), (2, "hash"), (3, "unrelated words")]:
        dv = vec(txt.split())
        dot = sum(w * qv.get(b, 0) for b, w in dv.items())
        if not any(b in qv for b in dv):
            continue  # no shared bucket: not a candidate
        n2 = sum(w * w for w in dv.values())
        qn2 = sum(w * w for w in qv.values())
        cos = round(dot / (math.sqrt(n2) * math.sqrt(qn2)), 9)
        want.append((did, cos))
    want.sort(key=lambda r: (-r[1], r[0]))
    assert rows == {did: i + 1 for i, (did, _) in enumerate(want)}


def test_rrf_fuse_matches_model_and_handles_one_sided_docs(spark):
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "query_id string, doc_id long, rank int",
    )
    out = {
        r["doc_id"]: (r["score_u"], r["rank"])
        for r in rrf_fuse([a, b], k_const=60, top_k=4).collect()
    }

    def u(rank):
        return math.floor(1e6 / (60 + rank) + 0.5)

    want_scores = {1: u(1), 2: u(2) + u(1), 3: u(3), 4: u(2)}
    ranked = sorted(want_scores.items(), key=lambda r: (-r[1], r[0]))
    assert out == {
        d: (s, i + 1) for i, (d, s) in enumerate(ranked)
    }
    with pytest.raises(ValueError, match="rankings"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k_const"):
        rrf_fuse([a], k_const=0)


def test_hybrid_topk_composes(spark):
    """A doc strong on BOTH sides outranks docs strong on one; output is
    a dense 1..k prefix per query with integer scores."""
    docs = _docs(spark, [
        (1, "hash join fast hash join"),   # lexical + dense
        (2, "hash hash hash hash hash"),   # lexical-heavy single term
        (3, "totally different content"),
        (4, "join fast"),
    ])
    out = hybrid_topk(docs, {"qa": ["hash", "join", "fast"]}, k=3, candidates=4)
    rows = sorted(
        (r["rank"], r["doc_id"], r["score_u"]) for r in out.collect()
    )
    assert [r[0] for r in rows] == [1, 2, 3]
    assert rows[0][1] == 1          # both-sides doc wins
    assert all(isinstance(r[2], int) for r in rows)


def test_hybrid_index_topk_served_from_persisted_index(spark, tmp_path):
    """Index-backed hybrid (stats.hybrid_index_topk): the dense side is
    ADC-over-codes + exact re-rank from the persisted IVF-PQ index over
    the SAME hash-embed corpus the scan hybrid embeds; with k_adc
    covering the whole corpus the exact re-rank makes the dense ranking
    the true L2 order, so a query matching one doc's text verbatim must
    put that doc at dense rank 1 and the fused output keeps the dense
    1..k prefix shape. Deterministic across reruns; guards raise."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_build,
        hybrid_index_topk,
    )

    rows = [
        (i, f"term{i % 5} filler{i} shared corpus text body") for i in range(24)
    ]
    rows.append((100, "needle exact match phrase"))
    docs = _docs(spark, rows)
    store = f"file://{tmp_path}/hybrid_idx"
    hybrid_index_build(
        spark, store, docs, dim=64, n_cells=4, n_probe_default=4,
        m=8, k_codes=8, coarse_iterations=0, pq_iterations=0,
    )

    queries = {"qa": ["needle", "exact", "match", "phrase"]}
    out = hybrid_index_topk(
        spark, docs, store, queries, k=3, candidates=5, k_adc=25,
        n_probe=4,
    ).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    # doc 100 tops BOTH sides (verbatim text → top lexical; its exact
    # hash vector minimizes L2 to the query's vector among candidates)
    best = min(out, key=lambda r: r["rank"])
    assert best["doc_id"] == 100
    assert all(isinstance(r["score_u"], int) for r in out)

    again = hybrid_index_topk(
        spark, docs, store, queries, k=3, candidates=5, k_adc=25, n_probe=4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    with pytest.raises(ValueError, match="candidates"):
        hybrid_index_topk(spark, docs, store, queries, k=6, candidates=5)
    with pytest.raises(ValueError, match="k_adc"):
        hybrid_index_topk(spark, docs, store, queries, k=2, candidates=5,
                          k_adc=4)
    with pytest.raises(ValueError, match="queries"):
        hybrid_index_topk(spark, docs, store, {}, k=2)


def test_hybrid_index_topk_opq_variant(spark, tmp_path):
    """hybrid_index_build forwards build_kw, so the OPQ-pretransformed
    index (learned rotation persisted as _rotation rows) composes with
    the hybrid fusion unchanged: ivfpq_search rotates the query vectors
    driver-side via the version-pinned R, and the exact re-rank still
    runs against the UNROTATED raw corpus L2 (rotation preserves L2, so
    candidate quality is what OPQ improves — the fused output keeps the
    1..k shape and determinism)."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_build,
        hybrid_index_topk,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_properties,
    )

    rows = [
        (i, f"term{i % 5} filler{i} shared corpus text body") for i in range(24)
    ]
    rows.append((100, "needle exact match phrase"))
    docs = _docs(spark, rows)
    store = f"file://{tmp_path}/hybrid_opq_idx"
    hybrid_index_build(
        spark, store, docs, dim=64, n_cells=4, n_probe_default=4,
        m=8, k_codes=8, coarse_iterations=0, pq_iterations=0,
        opq_iterations=1,
    )
    assert int(snapshot_properties(spark, store)["pq_rot"]) == 1

    queries = {"qa": ["needle", "exact", "match", "phrase"]}
    out = hybrid_index_topk(
        spark, docs, store, queries, k=3, candidates=5, k_adc=25, n_probe=4
    ).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    again = hybrid_index_topk(
        spark, docs, store, queries, k=3, candidates=5, k_adc=25, n_probe=4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_maxsim_topk_matches_reference_and_rewards_aspect_coverage(spark):
    """Late interaction (stats.maxsim_topk): scores equal a transparent
    pure-Python replay of the windowed-hash MaxSim model (exact integer
    dots, per-query-position maxima, greatest-with-0), and the operator
    exhibits the property it exists for — a document covering ALL query
    aspects at different positions outranks one repeating a single
    aspect, which bag-of-features cosine conflates. Deterministic;
    guards raise."""
    from prometheus_parquet_server_spark.pipeline.stats import maxsim_topk

    docs = _docs(spark, [
        (1, "hash join fast pipeline"),      # covers all three aspects
        (2, "hash hash hash hash hash"),     # one aspect, repeated
        (3, "unrelated filler text body"),
        (4, "fast hash"),                    # two aspects
    ])
    queries = {"qa": ["hash", "join", "fast"]}
    out = {r["doc_id"]: (r["score_u"], r["rank"])
           for r in maxsim_topk(docs, queries, k=4, window=1).collect()}

    # pure-Python reference with the operator's exact conventions
    def win_vecs(toks, dim=64, window=1):
        n = len(toks)
        vecs = [dict() for _ in range(n)]
        for j, t in enumerate(toks):
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            s = -1 if h[8] in "89abcdef" else 1
            for d in range(-window, window + 1):
                if 0 <= j + d < n:
                    vecs[j + d][b] = vecs[j + d].get(b, 0) + s
        return [{b: w for b, w in v.items() if w != 0} for v in vecs]

    corpus = {1: "hash join fast pipeline", 2: "hash hash hash hash hash",
              3: "unrelated filler text body", 4: "fast hash"}
    qv = win_vecs([t.lower() for t in queries["qa"]])
    want = {}
    for did, text in corpus.items():
        dv = win_vecs(text.lower().split())
        score = 0
        for qvec in qv:
            dots = [
                sum(w * dvec.get(b, 0) for b, w in qvec.items())
                for dvec in dv
                if any(b in dvec for b in qvec)
            ]
            score += max([0] + dots)
        if score or any(
            any(b in dvec for b in qvec) for qvec in qv for dvec in
            win_vecs(text.lower().split())
        ):
            want[did] = score
    for did, (score, _) in out.items():
        assert score == want[did], (did, score, want.get(did))
    # full aspect coverage beats single-aspect repetition (doc 2's
    # repeated token DOES inflate its window weights — windows hold 3
    # copies — yet covering every query position still wins: that is
    # the late-interaction property)
    assert out[1][1] == 1 and out[1][0] > out[2][0]
    # any aspect overlap beats none
    assert out[4][0] > out.get(3, (0, 99))[0]

    again = {r["doc_id"]: (r["score_u"], r["rank"])
             for r in maxsim_topk(docs, queries, k=4, window=1).collect()}
    assert again == out
    with pytest.raises(ValueError, match="k"):
        maxsim_topk(docs, queries, k=0)
    with pytest.raises(ValueError, match="queries"):
        maxsim_topk(docs, {}, k=2)
    with pytest.raises(ValueError, match="window"):
        maxsim_topk(docs, queries, k=2, window=-1)


def test_hybrid_rrf3_composes_three_modalities(spark):
    """Tri-modal fusion (stats.hybrid_rrf3_topk): fused score equals the
    exact integer sum of the three sides' quantized reciprocals (checked
    against the sides run independently), a doc strong on ALL THREE
    sides wins, output is a dense 1..k prefix, guards raise."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        bm25_topk,
        hybrid_rrf3_topk,
        maxsim_topk,
    )

    docs = _docs(spark, [
        (1, "hash join fast hash join"),
        (2, "hash hash hash hash hash"),
        (3, "totally different content"),
        (4, "join fast"),
    ])
    queries = {"qa": ["hash", "join", "fast"]}
    out = {r["doc_id"]: (r["score_u"], r["rank"])
           for r in hybrid_rrf3_topk(docs, queries, k=4, candidates=4).collect()}

    sides = [
        bm25_topk(docs, queries, k=4),
        hash_cosine_topk(docs, queries, k=4),
        maxsim_topk(docs, queries, k=4),
    ]
    want = {}
    for side in sides:
        for r in side.collect():
            want[r["doc_id"]] = want.get(r["doc_id"], 0) + math.floor(
                1e6 / (60 + r["rank"]) + 0.5
            )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert out == {d: (s, i + 1) for i, (d, s) in enumerate(ranked)}
    assert min(out.values(), key=lambda v: v[1])[1] == 1
    with pytest.raises(ValueError, match="candidates"):
        hybrid_rrf3_topk(docs, queries, k=5, candidates=4)


def test_hybrid_index_append_and_stream_ingest(spark, tmp_path):
    """Growing-corpus hybrid (stats.hybrid_index_append /
    stream_hybrid_index_ingest): appended docs encode against the FROZEN
    quantizers through the shared hash-embed construction, so the served
    fusion equals a from-scratch query over the union corpus's rerank
    truth — a query matching an APPENDED doc verbatim surfaces it at the
    top; a checkpoint-reset replay with the same app_id is a
    version-preserving no-op (txn marker); time travel still serves the
    pre-append index."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_append,
        hybrid_index_build,
        hybrid_index_topk,
        stream_hybrid_index_ingest,
    )
    from prometheus_parquet_server_spark.sources.snapshot_store import (
        snapshot_version,
    )

    base_rows = [
        (i, f"term{i % 5} filler{i} shared corpus text body") for i in range(24)
    ]
    docs = _docs(spark, base_rows)
    store = f"file://{tmp_path}/hybrid_grow_idx"
    hybrid_index_build(
        spark, store, docs, dim=64, n_cells=4, n_probe_default=4,
        m=8, k_codes=8, coarse_iterations=0, pq_iterations=0,
    )
    v1 = snapshot_version(spark, store)

    late_rows = [(100, "needle exact match phrase"), (101, "more filler body")]
    hybrid_index_append(spark, store, _docs(spark, late_rows))
    union = _docs(spark, base_rows + late_rows)

    queries = {"qa": ["needle", "exact", "match", "phrase"]}
    out = hybrid_index_topk(
        spark, union, store, queries, k=3, candidates=5, k_adc=26, n_probe=4
    ).collect()
    assert min(out, key=lambda r: r["rank"])["doc_id"] == 100

    # time travel: the pre-append version serves the base corpus only
    old = hybrid_index_topk(
        spark, docs, store, queries, k=3, candidates=5, k_adc=24,
        n_probe=4, version=v1,
    ).collect()
    assert all(r["doc_id"] < 100 for r in old)

    # streaming twin: two more docs via a file stream; replay no-ops
    import shutil

    src = f"{tmp_path}/doc_src"
    extra = [(200, "stream landed document"), (201, "another streamed doc")]
    _docs(spark, extra).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(_docs(spark, extra).schema).parquet(src)
    q = stream_hybrid_index_ingest(stream, spark, store)
    q.awaitTermination(120)
    v_after = snapshot_version(spark, store)
    got = hybrid_index_topk(
        spark, _docs(spark, base_rows + late_rows + extra), store,
        {"qs": ["stream", "landed", "document"]},
        k=3, candidates=5, k_adc=28, n_probe=4,
    ).collect()
    assert min(got, key=lambda r: r["rank"])["doc_id"] == 200

    shutil.rmtree(f"{tmp_path}/hybrid_grow_idx/_stream_checkpoint_docs")
    q2 = stream_hybrid_index_ingest(stream, spark, store)
    q2.awaitTermination(120)
    assert snapshot_version(spark, store) == v_after  # replay deduped


def test_maxsim_rerank_topk_candidate_served(spark):
    """Candidate-served MaxSim (stats.maxsim_rerank_topk — the ColBERT
    serving shape): (1) a candidate's score equals the scan form's score
    for the same (query, doc) pair — the literally-shared _maxsim_scores
    chain; (2) a candidate with NO bucket overlap still ranks with score
    exactly 0 (the rerank convention the scan form lacks); (3) every
    returned doc IS a lexical∪dense candidate; (4) deterministic;
    (5) the candidate-id bound raises loudly."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        bm25_topk,
        hash_cosine_topk,
        maxsim_rerank_topk,
        maxsim_topk,
    )

    docs = _docs(spark, [
        (1, "hash join fast pipeline"),
        (2, "hash hash hash hash hash"),
        (3, "unrelated filler text body"),
        (4, "fast hash"),
        (5, "join stream plan"),
        (6, "totally different words entirely"),
    ])
    queries = {"qa": ["hash", "join", "fast"]}
    out = maxsim_rerank_topk(docs, queries, k=6, candidates=6).collect()
    got = {r["doc_id"]: (r["score_u"], r["rank"]) for r in out}

    # (3) returned ⊆ candidates
    cand = {
        r["doc_id"]
        for r in bm25_topk(docs, queries, k=6).collect()
    } | {
        r["doc_id"]
        for r in hash_cosine_topk(docs, queries, k=6).collect()
    }
    assert set(got) <= cand

    # (1) candidate scores equal the scan form's for shared pairs
    scan = {r["doc_id"]: r["score_u"]
            for r in maxsim_topk(docs, queries, k=6).collect()}
    for did, (score, _) in got.items():
        if did in scan:
            assert score == scan[did], (did, score, scan[did])
        else:
            # (2) candidate without bucket overlap: exact 0, still ranked
            assert score == 0, (did, score)

    # (4) deterministic
    again = {r["doc_id"]: (r["score_u"], r["rank"])
             for r in maxsim_rerank_topk(docs, queries, k=6, candidates=6).collect()}
    assert again == got

    # (5) guards
    with pytest.raises(ValueError, match="candidates"):
        maxsim_rerank_topk(docs, queries, k=5, candidates=3)
    with pytest.raises(ValueError, match="max_candidate_ids"):
        maxsim_rerank_topk(docs, queries, k=2, candidates=4,
                           max_candidate_ids=1)
    with pytest.raises(ValueError, match="queries"):
        maxsim_rerank_topk(docs, {}, k=2)


def test_hybrid_rrf3_rerank_matches_scan_when_candidates_cover(spark):
    """When the candidate pool covers every doc the scan form's late leg
    would rank (small corpus, candidates ≥ corpus), the candidate-served
    tri-modal fusion returns EXACTLY hybrid_rrf3_topk's rows for docs
    whose late ranks agree — and in all cases fused scores are exact
    integer sums of quantized reciprocals from the three legs."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        bm25_topk,
        hash_cosine_topk,
        hybrid_rrf3_rerank_topk,
        maxsim_rerank_topk,
    )

    docs = _docs(spark, [
        (1, "hash join fast pipeline"),
        (2, "hash stream window"),
        (3, "join fast stream"),
        (4, "watermark window stream"),
        (5, "filler body text"),
    ])
    queries = {"qa": ["hash", "join"], "qb": ["stream", "window"]}
    k, c = 4, 5
    out = hybrid_rrf3_rerank_topk(docs, queries, k=k, candidates=c).collect()
    # replay the fusion from the three legs' ranks
    lex = {(r["query_id"], r["doc_id"]): r["rank"]
           for r in bm25_topk(docs, queries, k=c).collect()}
    den = {(r["query_id"], r["doc_id"]): r["rank"]
           for r in hash_cosine_topk(docs, queries, k=c).collect()}
    late = {(r["query_id"], r["doc_id"]): r["rank"]
            for r in maxsim_rerank_topk(docs, queries, k=c, candidates=c).collect()}

    def unit(rank):
        import math
        return int(math.floor(1e6 / (60 + rank) + 0.5))

    want = {}
    for key in set(lex) | set(den) | set(late):
        want[key] = sum(unit(m[key]) for m in (lex, den, late) if key in m)
    got = {(r["query_id"], r["doc_id"]): r["score_u"] for r in out}
    for key, score in got.items():
        assert score == want[key], (key, score, want[key])
    # rank = dense ordering of fused scores, ties → doc_id
    for qid in ("qa", "qb"):
        rows = sorted(
            [r for r in out if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        expect = sorted(
            [(kk[1], v) for kk, v in want.items() if kk[0] == qid],
            key=lambda t: (-t[1], t[0]),
        )[:k]
        assert [(r["doc_id"], r["score_u"]) for r in rows] == expect


def test_hybrid_index_rejects_negative_doc_ids(spark, tmp_path):
    """ADVICE r11: the index family reserves NEGATIVE longs for query
    probe ids (−1−i) — a corpus doc at a negative id would collide with
    a probe (ADC self-exclusion silently drops it). Build and append
    must raise loudly."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_append,
        hybrid_index_build,
    )

    bad = _docs(spark, [(-1, "colliding probe id doc"), (1, "fine doc")])
    store = f"file://{tmp_path}/negidx"
    with pytest.raises(ValueError, match="negative doc id"):
        hybrid_index_build(spark, store, bad, dim=64, n_cells=1,
                           n_probe_default=1, m=8, k_codes=2,
                           coarse_iterations=0, pq_iterations=0)
    good = _docs(spark, [(i, f"doc body {i} words") for i in range(8)])
    hybrid_index_build(spark, store, good, dim=64, n_cells=1,
                       n_probe_default=1, m=8, k_codes=2,
                       coarse_iterations=0, pq_iterations=0)
    with pytest.raises(ValueError, match="negative doc id"):
        hybrid_index_append(spark, store, bad, dim=64)


def test_maxsim_index_rerank_topk_serving_stack(spark, tmp_path):
    """The full ColBERT serving stack (stats.maxsim_index_rerank_topk):
    candidate-bounded MaxSim scores equal the scan operator's for shared
    pairs, returned docs come from the BM25 ∪ index-dense union, and the
    guards raise."""
    from prometheus_parquet_server_spark.pipeline.stats import (
        hybrid_index_build,
        maxsim_index_rerank_topk,
        maxsim_topk,
    )

    rows = [
        (1, "hash join fast pipeline"),
        (2, "hash hash hash hash hash"),
        (3, "unrelated filler text body"),
        (4, "fast hash"),
        (5, "join stream plan"),
        (6, "totally different words entirely"),
    ]
    docs = _docs(spark, rows)
    store = f"file://{tmp_path}/msidx"
    hybrid_index_build(spark, store, docs, dim=64, n_cells=2,
                       n_probe_default=2, m=8, k_codes=2,
                       coarse_iterations=0, pq_iterations=0)
    queries = {"qa": ["hash", "join", "fast"]}
    out = maxsim_index_rerank_topk(
        spark, docs, store, queries, k=6, candidates=6, k_adc=6,
    ).collect()
    got = {r["doc_id"]: r["score_u"] for r in out}
    scan = {r["doc_id"]: r["score_u"]
            for r in maxsim_topk(docs, queries, k=6).collect()}
    for did, score in got.items():
        assert score == scan.get(did, 0), (did, score)
    assert len(out) >= 1
    with pytest.raises(ValueError, match="k_adc"):
        maxsim_index_rerank_topk(spark, docs, store, queries, k=2,
                                 candidates=4, k_adc=3)


def test_combmnz_fuse_matches_model(spark):
    """CombMNZ (stats.combmnz_fuse): fused score equals a transparent
    Python replay — per-leg per-query min–max normalization, micro-unit
    quantization, hit-count × sum — with the constant-leg → 1.0
    convention and (score desc, id) ties; guards raise."""
    import math

    from prometheus_parquet_server_spark.pipeline.stats import combmnz_fuse

    leg1 = spark.createDataFrame(
        [("q", 1, 10.0), ("q", 2, 5.0), ("q", 3, 0.0)],
        "query_id string, doc_id long, score double",
    )
    leg2 = spark.createDataFrame(
        # constant scores → every doc normalizes to 1.0
        [("q", 2, 7.0), ("q", 4, 7.0)],
        "query_id string, doc_id long, score double",
    )
    out = {r["doc_id"]: (r["score_u"], r["rank"])
           for r in combmnz_fuse([leg1, leg2], top_k=4).collect()}

    def unit(norm):
        return int(math.floor(norm * 1e6 + 0.5))

    want = {
        1: 1 * unit(1.0),                 # leg1 max, one hit
        2: 2 * (unit(0.5) + unit(1.0)),   # both legs → MNZ doubles
        3: 1 * unit(0.0),
        4: 1 * unit(1.0),
    }
    for did, (score, _) in out.items():
        assert score == want[did], (did, score, want[did])
    # ranks: doc 2 first (agreement), then 1 and 4 tie on score → id asc
    assert out[2][1] == 1 and out[1][1] == 2 and out[4][1] == 3

    with pytest.raises(ValueError, match="scored"):
        combmnz_fuse([], top_k=2)
    with pytest.raises(ValueError, match="top_k"):
        combmnz_fuse([leg1], top_k=0)


def test_hybrid_combmnz_topk_composes(spark):
    """The BM25 ⊕ MaxSim CombMNZ composition: fused scores replay from
    the two legs' own outputs; agreement outranks single-leg wins at
    comparable normalized mass; deterministic."""
    import math

    from prometheus_parquet_server_spark.pipeline.stats import (
        bm25_topk,
        combmnz_fuse,
        hybrid_combmnz_topk,
        maxsim_topk,
    )

    docs = _docs(spark, [
        (1, "hash join fast pipeline"),
        (2, "hash hash hash hash"),
        (3, "unrelated filler body"),
        (4, "fast join hash stream"),
    ])
    queries = {"qa": ["hash", "join", "fast"]}
    k, c = 4, 4
    out = {r["doc_id"]: r["score_u"]
           for r in hybrid_combmnz_topk(docs, queries, k=k, candidates=c).collect()}
    lex = bm25_topk(docs, queries, k=c)
    late = maxsim_topk(docs, queries, k=c)
    from pyspark.sql import functions as SF

    want = {r["doc_id"]: r["score_u"]
            for r in combmnz_fuse(
                [lex.select("query_id", "doc_id", "score"),
                 late.select("query_id", "doc_id",
                             SF.col("score_u").alias("score"))],
                top_k=k).collect()}
    assert out == want
    again = {r["doc_id"]: r["score_u"]
             for r in hybrid_combmnz_topk(docs, queries, k=k, candidates=c).collect()}
    assert again == out
    with pytest.raises(ValueError, match="candidates"):
        hybrid_combmnz_topk(docs, queries, k=4, candidates=2)


def test_hybrid_combmnz_rerank_topk_candidate_served(spark):
    """The serving twin (VERDICT r12 Next #3): fused scores replay from
    combmnz_fuse over (bm25 leg, candidate-served late leg) — the late
    leg ranking every lexical∪dense candidate pair through the shared
    rerank chain, no-overlap pairs scoring exactly 0 and still entering
    the leg (the min–max window shift that makes this its own row, not
    a replay of the scan form); deterministic; guards raise."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as SF

    from prometheus_parquet_server_spark.pipeline.stats import (
        _maxsim_rerank_scores,
        bm25_topk,
        combmnz_fuse,
        hash_cosine_topk,
        hybrid_combmnz_rerank_topk,
    )

    docs = _docs(spark, [
        (1, "hash join fast pipeline"),
        (2, "hash hash hash hash"),
        (3, "unrelated filler body"),
        (4, "fast join hash stream"),
        (5, "zzz qqq vvv www"),
    ])
    queries = {"qa": ["hash", "join", "fast"]}
    k, c = 4, 4
    out = {r["doc_id"]: (r["score_u"], r["rank"])
           for r in hybrid_combmnz_rerank_topk(
               docs, queries, k=k, candidates=c).collect()}

    # transparent replay through the same shared pieces
    lex = bm25_topk(docs, queries, k=c)
    dense = hash_cosine_topk(docs, queries, k=c, dim=64)
    reranked = _maxsim_rerank_scores(
        docs, queries, lex, dense, 64, 1, "text", "doc_id", 100_000
    )
    w_late = W.partitionBy("query_id").orderBy(
        SF.col("score_u").desc(), SF.col("doc_id").asc()
    )
    late = (
        reranked.withColumn("rank", SF.row_number().over(w_late))
        .filter(SF.col("rank") <= c)
    )
    want = {r["doc_id"]: (r["score_u"], r["rank"])
            for r in combmnz_fuse(
                [lex.select("query_id", "doc_id", "score"),
                 late.select("query_id", "doc_id",
                             SF.col("score_u").alias("score"))],
                top_k=k).collect()}
    assert out == want

    # every candidate-union pair is scored — a candidate with no token
    # overlap anywhere (doc 5 planted into a handcrafted dense leg)
    # comes back through the LEFT JOIN coalesce with score exactly 0
    # and still ranks inside the late leg
    planted = spark.createDataFrame(
        [("qa", 5, 1)], "query_id string, doc_id long, rank int"
    )
    rer2 = {r["doc_id"]: r["score_u"]
            for r in _maxsim_rerank_scores(
                docs, queries, lex, planted, 64, 1, "text", "doc_id",
                100_000).collect()}
    assert rer2[5] == 0, rer2
    assert set(rer2) == {1, 2, 4, 5}, rer2

    again = {r["doc_id"]: (r["score_u"], r["rank"])
             for r in hybrid_combmnz_rerank_topk(
                 docs, queries, k=k, candidates=c).collect()}
    assert again == out
    with pytest.raises(ValueError, match="candidates"):
        hybrid_combmnz_rerank_topk(docs, queries, k=4, candidates=2)
    with pytest.raises(ValueError, match="non-empty"):
        hybrid_combmnz_rerank_topk(docs, {}, k=2, candidates=2)
